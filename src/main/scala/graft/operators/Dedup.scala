package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, TextExprs => TX}

/** Deduplication operators for large-scale text corpora — the LLM-pipeline
  * extension of SURVEY.md §7.5, designed scale-first:
  *
  * - exact: one hash-shuffle on the normalized text (group-by, no pairwise).
  * - MinHash+LSH: signature is a narrow projection (k longs per doc);
  *   banding turns near-dup search into an equi-join on band keys — no
  *   O(n²) pair enumeration ever materializes. At 100 TB the band join is
  *   the only shuffle and it is keyed on short strings with tunable
  *   selectivity (bands × rows trade recall vs. join fan-out).
  * - SimHash: 32-bit fingerprint per doc; Hamming-adjacent buckets can be
  *   probed by prefix. Computed via explode + partial-aggregable sums.
  *
  * All hashes are engine-portable integer arithmetic (see TextExprs) so the
  * DuckDB oracle reproduces them bit-for-bit.
  */
object Dedup {
  private implicit val d: Dialect = Dialect(spark = true)

  /** Exact dedup on canonical text: one row per distinct normalized text
    * with the smallest doc id as canonical.
    *
    * The group key is (length, polyhash, md5) of the normalized text, NOT
    * the text itself: at corpus scale, shuffling full documents as the
    * aggregation key writes the whole corpus to the shuffle — the triple is
    * constant-width (int + long + 32-char hex) with a jointly negligible
    * collision probability. Callers needing certainty can re-verify the
    * rare multi-copy groups against the raw text afterwards. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol), expr(TX.norm(textCol)).as("__nt"))
      .groupBy(length(col("__nt")).as("__len"),
        expr("graft_polyhash(__nt)").as("__ph"), md5(col("__nt")).as("__md5"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select("canonical_id", "n_copies")
  }

  /** (id, sh) rows of word-n-gram shingle hashes — the shared front end
    * of every shingle-stream consumer (contamination, repetition, span
    * census, and the portable signature references). The whole per-doc
    * computation is one codegen'd array expression
    * (graft.functions.ShingleHashes), so this is explode-of-a-projection:
    * no posexplode row blowup through a shuffle, no window sort. Order
    * and multiplicity match the windowed pipeline exactly
    * ([[shingleHashRowsWindowed]], kept as the independently-derived
    * reference that MinHashSpec proves this equal to). */
  def shingleHashRows(docs: DataFrame, textCol: String, idCol: String,
                      shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol),
      explode(expr(s"graft_shingle_hashes(`$textCol`, $shingleN)")).as("sh"))
  }

  /** [[shingleHashRows]] deduplicated PER DOCUMENT in the scan projection
    * (`array_distinct` before the explode) — callers that need the per-doc
    * shingle SET get it without the cross-partition `.distinct()` shuffle
    * the row-level form would need. Cross-document duplicates remain (they
    * are different (id, sh) rows). */
  def shingleHashRowsDistinct(docs: DataFrame, textCol: String, idCol: String,
                              shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol),
      explode(expr(s"array_distinct(graft_shingle_hashes(`$textCol`, $shingleN))")).as("sh"))
  }

  /** The posexplode → window-lead shingle pipeline — the portable
    * reference [[shingleHashRows]]'s native expression is proven against.
    *
    * Rejected shapes (measured at sf0.1): k array-min columns over a shared
    * shingle-hash array lets ProjectCollapse inline the hashing into every
    * column (k× recompute, ~180 s); explode of char-hashed shingle strings
    * hashes ~20 chars per shingle instead of ~6 per word (~30 s). */
  def shingleHashRowsWindowed(docs: DataFrame, textCol: String, idCol: String,
                              shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs.select(col(idCol),
      posexplode(expr(TX.tokens(textCol))).as(Seq("pos", "w")))
    val tokh = tok.select(col(idCol), col("pos"), expr(TX.polyHashAuto("w")).as("h"))
    val w = Window.partitionBy(idCol).orderBy("pos")
    val sh = (1 until shingleN).foldLeft(col("h")) { (acc, j) =>
      (acc * lit(8191L) + lead(col("h"), j).over(w)) % lit(TX.P)
    }
    tokh.withColumn("sh", sh)
      .filter(col("sh").isNotNull)
      .select(col(idCol), col("sh"))
  }

  def minhashSignature(docs: DataFrame, textCol: String, idCol: String,
                       k: Int, shingleN: Int): DataFrame = {
    // the whole front end (tokenize → token hashes → shingles → k minima)
    // is ONE codegen'd expression — a pure scan projection, no explode, no
    // window sort, no doc-keyed shuffle (graft.functions.MinHashDoc;
    // MinHashSpec proves it row-identical to the exploded k-MIN pipeline).
    // Short docs are dropped by the CHEAP count walk, not by
    // filter(isNotNull(__d)): the optimizer pushes a filter through the
    // project by substituting the alias, which would evaluate the full
    // signature expression twice per row (once in the pushed filter, once
    // in the projection). After the count gate, __d is never null.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .filter(expr(s"graft_token_count(`$textCol`) >= $shingleN"))
      .select(col(idCol),
        expr(s"graft_minhash_doc(`$textCol`, $k, $shingleN)").as("__d"))
      .select(col(idCol) +:
        (0 until k).map(i => col("__d.sig").getItem(i).as(f"mh$i%02d")): _*)
  }

  /** The exploded/windowed signature pipeline — the portable reference
    * implementation [[minhashSignature]]'s native expression is proven
    * against (MinHashSpec), and the shape the DuckDB oracle mirrors. */
  def minhashSignatureExploded(docs: DataFrame, textCol: String, idCol: String,
                               k: Int, shingleN: Int): DataFrame = {
    // no distinct: MIN over a multiset equals MIN over its set, so the
    // dedup shuffle would be pure waste — one doc-id-keyed agg is the plan
    val shingled = shingleHashRowsWindowed(docs, textCol, idCol, shingleN)
    val minCols = (0 until k).map(i =>
      min(expr(s"(${TX.aK(i)}*sh + ${TX.bK(i)}) % ${TX.P}")).as(f"mh$i%02d"))
    shingled.groupBy(idCol).agg(minCols.head, minCols.tail: _*)
  }

  /** Typed-aggregator variant of the signature: one sketch buffer of k
    * minima via graft.functions.MinHashAggregator (SURVEY §7.3's custom
    * Aggregator surface) instead of k MIN expressions. Proven equal to
    * minhashSignature in MinHashSpec; columns mh00..mh(k-1). */
  def minhashSignatureTyped(docs: DataFrame, textCol: String, idCol: String,
                            k: Int, shingleN: Int): DataFrame = {
    // udaf() lifts the typed Aggregator into an untyped aggregate column,
    // so the id keeps its own type/schema (a cast-to-long groupByKey would
    // silently null-collapse non-numeric ids)
    val mh = udaf(new graft.functions.MinHashAggregator(k))
    val sig = shingleHashRowsWindowed(docs, textCol, idCol, shingleN)
      .groupBy(idCol).agg(mh(col("sh")).as("sig"))
    val cols = (0 until k).map(i => element_at(col("sig"), i + 1).as(f"mh$i%02d"))
    sig.select((col(idCol) +: cols): _*)
  }

  /** (id, band_id, band_key) rows from a MinHash signature frame — the
    * shared banding front end of minhashBands and nearDupPipeline: one
    * band-struct array + a single explode, NOT a union of nBands
    * projections (which would recompute the signature plan per band). */
  /** The per-band (band_id, band_key) struct array over mh00..mh(k-1). */
  private def bandArray(k: Int, rowsPerBand: Int) = {
    val bandStructs = (0 until k / rowsPerBand).map { b =>
      val keyCols = (0 until rowsPerBand).map(r => col(f"mh${b * rowsPerBand + r}%02d"))
      struct(lit(b.toLong).as("band_id"),
        concat_ws("|", keyCols.map(_.cast("string")): _*).as("band_key"))
    }
    array(bandStructs: _*)
  }

  private def bandedRows(sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    requireBands(k, rowsPerBand)
    sig.select(col(idCol), explode(bandArray(k, rowsPerBand)).as("bk"))
      .select(col(idCol), col("bk.band_id").as("band_id"), col("bk.band_key").as("band_key"))
  }

  /** LSH banding over a MinHash signature: emit (band_id, band_key) per doc;
    * docs sharing a band key are near-dup candidates. Returns buckets with
    * ≥ 2 docs. The band key is a short string — the join/group shuffles on
    * it directly. Requires rowsPerBand | k. */
  def minhashBands(sig: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame =
    bandedRows(sig, idCol, k, rowsPerBand)
      .groupBy("band_id", "band_key")
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("min_doc"))
      .filter(col("n_docs") >= 2)

  /** SimHash 32-bit fingerprint — one codegen'd expression per doc
    * (graft.functions.SimHashDoc): a pure scan projection, no token
    * explode, no 32-CASE-sum aggregation, no shuffle.
    * [[simhashExploded]] keeps the independently-derived pipeline the
    * native form is proven against (MinHashSpec). */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // count gate, not filter(isNotNull) — see minhashSignature
    docs
      .filter(expr(s"graft_token_count(`$textCol`) >= 1"))
      .select(col(idCol), expr(s"graft_simhash(`$textCol`)").as("simhash"))
  }

  /** SimHash via explode + sign-sum per bit (partial-aggregable 32
    * CASE-sums) — the portable reference for [[simhash]]. */
  def simhashExploded(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs.select(col(idCol),
      explode(expr(TX.tokens(textCol))).as("w"))
    val h2 = tok.withColumn("h2", expr(TX.mix32(TX.polyHashAuto("w"))))
    val bitSums = (0 until 32).map(j =>
      sum(when(expr(s"(h2 div ${1L << j}) % 2") === 1, 1).otherwise(-1)).as(s"s$j"))
    val agg = h2.groupBy(idCol).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 32).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), fp.cast("long").as("simhash"))
  }

  /** The full near-dup pipeline, end to end: MinHash signatures → LSH band
    * buckets → candidate pairs (docs sharing ≥1 band) → exact word-shingle
    * Jaccard verify → keep/drop decision (smaller doc id survives).
    *
    * This is the canonical 100 TB text-dedup shape: the only unbounded
    * shuffles are doc-id/band-keyed; exact Jaccard runs ONLY on the
    * band-collision candidates (bounded by LSH selectivity), never on the
    * corpus cross product. */
  def nearDupPipeline(docs: DataFrame, textCol: String, idCol: String,
                      k: Int, shingleN: Int, rowsPerBand: Int,
                      threshold: Double): DataFrame = {
    requireBands(k, rowsPerBand) // validate BEFORE persist registers a cache entry
    // Cache lifecycle: the per-doc intermediate stays persisted until
    // Spark's ContextCleaner collects the plan (or the caller clears the
    // cache). Callers embedding this in long-lived sessions should use
    // nearDupPipelineScoped and consume the result inside its closure.
    nearDupPlan(perDocAggregate(docs, textCol, idCol, k, shingleN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      idCol, k, rowsPerBand, threshold)
  }

  /** nearDupPipeline with a bounded cache scope: persists the shared
    * per-doc intermediate, hands the finished plan to `use`, and
    * unpersists when `use` RETURNS — so `use` must fully consume the plan
    * (collect/write/count) before returning. Returning the lazy DataFrame
    * out of the closure silently forfeits the one-pass guarantee: later
    * actions would recompute the per-doc aggregate per consumer. */
  def nearDupPipelineScoped[T](docs: DataFrame, textCol: String, idCol: String,
                               k: Int, shingleN: Int, rowsPerBand: Int,
                               threshold: Double)(use: DataFrame => T): T = {
    requireBands(k, rowsPerBand)
    val perDoc = perDocAggregate(docs, textCol, idCol, k, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try use(nearDupPlan(perDoc, idCol, k, rowsPerBand, threshold))
    finally { perDoc.unpersist(); () }
  }

  private def requireBands(k: Int, rowsPerBand: Int): Unit =
    require(k % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide the signature length k=$k " +
        "(a remainder would silently drop trailing signature columns and degrade recall)")

  /** ONE pass over the corpus: the whole front end (tokenize → token
    * hashes → shingles → k minima + DISTINCT hash set) is one codegen'd
    * expression (graft.functions.MinHashDoc) — a pure scan projection.
    * The per-doc result (k longs + hash set) is narrow; persisting it
    * lets the banding self-join and the two verify joins all reuse one
    * computation, and NOTHING shuffles until the band join. */
  private def perDocAggregate(docs: DataFrame, textCol: String, idCol: String,
                              k: Int, shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // cheap count gate instead of filter(isNotNull(__d)) — see
    // minhashSignature: a pushed-through null filter would re-evaluate
    // the whole signature expression in the scan
    docs
      .filter(expr(s"graft_token_count(`$textCol`) >= $shingleN"))
      .select(col(idCol),
        expr(s"graft_minhash_doc(`$textCol`, $k, $shingleN)").as("__d"))
      .select(col(idCol) +:
        ((0 until k).map(i => col("__d.sig").getItem(i).as(f"mh$i%02d"))
          :+ col("__d.sh").as("sh")): _*)
  }

  private def nearDupPlan(perDoc: DataFrame, idCol: String,
                          k: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val banded = bandedRows(perDoc, idCol, k, rowsPerBand)
    // candidate pairs: same (band_id, band_key), deduped across bands
    val l = banded.select(col("band_id"), col("band_key"), col(idCol).as("doc_a"))
    val r = banded.select(col("band_id").as("band_id_r"), col("band_key").as("band_key_r"),
      col(idCol).as("doc_b"))
    val candidates = l.join(r,
        col("band_id") === col("band_id_r") && col("band_key") === col("band_key_r")
          && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    // verify stage: exact Jaccard over the shingle HASH sets on candidates
    // only — reuses the native-hash front end instead of rebuilding shingle
    // strings (interpreted concat per shingle: measured 15× slower). Hash
    // collisions (~|set|²/2P per doc) shift Jaccard negligibly and the
    // oracle mirrors the same definition.
    val sets = perDoc.select(col(idCol), col("sh"))
    val verified = candidates
      .join(sets.select(col(idCol).as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col(idCol).as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("union_size",
        size(array_distinct(concat(col("sh_a"), col("sh_b")))).cast("long"))
      .withColumn("inter_size",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("union_size"))
      .withColumn("jaccard",
        col("inter_size").cast("double") / col("union_size").cast("double"))
    verified
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter_size"), col("union_size"),
        col("jaccard"),
        col("doc_a").as("keep_id"), col("doc_b").as("drop_id"))
  }

  /** SimHash near-dup candidate search — the Hamming-space analog of LSH
    * banding. The 32-bit fingerprint splits into 4 byte bands; by
    * pigeonhole, any pair within Hamming distance 3 agrees on AT LEAST one
    * whole band, so a (band_id, band_value) equi-join finds every such
    * pair with zero false negatives. The exact Hamming distance
    * (bit_count of xor) then verifies candidates only — no pair
    * enumeration beyond band collisions, same contract as MinHash banding.
    * `maxHamming` must stay < the band count (4) for the recall
    * guarantee. */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame =
    hammingNearDups(simhash(docs, textCol, idCol), idCol, "simhash",
      hashBits = 32, nBands = 4, maxHamming = maxHamming)

  /** Hamming-ball near-dup pairs over ANY integer fingerprint column via
    * band-bucket pigeonhole (the qx37 machinery generalized): split the
    * `hashBits`-bit hash into `nBands` equal bands; any pair within
    * Hamming distance < nBands must agree exactly on ≥1 band, so the
    * band equi-join has FULL recall for maxHamming < nBands — no
    * all-pairs comparison anywhere. Bands extract with an unsigned shift
    * so a 64-bit fingerprint with the sign bit set still buckets
    * correctly. Consumers: SimHash text fingerprints (32-bit),
    * perceptual image hashes (Multimodal.phash64, 64-bit). */
  def hammingNearDups(hashes: DataFrame, idCol: String, hashCol: String,
                      hashBits: Int, nBands: Int, maxHamming: Int): DataFrame = {
    require(hashBits > 0 && hashBits <= 64 && hashBits % nBands == 0,
      s"hashBits=$hashBits must be in (0,64] and divisible by nBands=$nBands")
    require(maxHamming >= 0 && maxHamming < nBands,
      s"maxHamming=$maxHamming breaks the $nBands-band pigeonhole recall guarantee")
    val bandBits = hashBits / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val bandStructs = (0 until nBands).map(b =>
      struct(lit(b.toLong).as("band_id"),
        expr(s"shiftrightunsigned(`$hashCol`, ${b * bandBits}) & ${mask}L")
          .as("band_val")))
    val banded = hashes.select(col(idCol), col(hashCol),
      explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol), col(hashCol),
        col("bk.band_id").as("band_id"), col("bk.band_val").as("band_val"))
    val l = banded.select(col("band_id"), col("band_val"),
      col(idCol).as("doc_a"), col(hashCol).as("sim_a"))
    val r = banded.select(col("band_id").as("band_id_r"), col("band_val").as("band_val_r"),
      col(idCol).as("doc_b"), col(hashCol).as("sim_b"))
    l.join(r, col("band_id") === col("band_id_r")
        && col("band_val") === col("band_val_r") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", expr("CAST(bit_count(sim_a ^ sim_b) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Global dedup groups: near-dup PAIRS closed into connected COMPONENTS.
    *
    * Pairwise keep/drop is not a corpus-level decision — if A~B and B~C but
    * not A~C, per-pair rules keep A and C yet drop B's whole cluster
    * inconsistently. The canonical-per-component closure (smallest doc id in
    * each component survives) is what a 100 TB dedup actually ships:
    * one row per grouped doc with its group id and size; docs with no
    * near-dup don't appear (they all survive trivially).
    *
    * The pair set is materialized once (Graph.connectedComponents persists
    * its symmetrized edge list before iterating), so the MinHash/verify
    * front end runs exactly once regardless of CC round count — and since
    * CC fully consumes the pairs before returning (its result is
    * checkpoint-backed and never re-reads them), the pipeline's per-doc
    * cache is released deterministically via the scoped variant instead of
    * lingering until ContextCleaner. */
  def dedupGroups(docs: DataFrame, textCol: String, idCol: String,
                  k: Int, shingleN: Int, rowsPerBand: Int,
                  threshold: Double): DataFrame =
    nearDupPipelineScoped(docs, textCol, idCol, k, shingleN, rowsPerBand,
        threshold) { pairsPlan =>
      val cc = Graph.connectedComponents(
        pairsPlan.select("doc_a", "doc_b"), "doc_a", "doc_b")
      // Scope-escape invariant: the frame built below LEAVES this closure,
      // which nearDupPipelineScoped's contract forbids for plans that still
      // reference `pairsPlan` (the per-doc cache is unpersisted on return).
      // It is safe ONLY because connectedComponents fully consumed the pairs
      // and returned a checkpoint-backed frame whose lineage no longer
      // reaches them. Assert that truncation here so a future change to
      // CC's materialization fails loudly instead of silently recomputing
      // the unpersisted per-doc aggregate on every downstream action.
      assert(cc.queryExecution.logical
          .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD] ||
        cc.queryExecution.logical
          .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
        "connectedComponents must return a checkpoint-backed or driver-" +
          "local frame (lineage truncated); dedupGroups returns its " +
          "derivation out of the scoped-cache closure and relies on it")
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("group_size"))
      cc.join(sizes, "component")
        .select(col("id").as(idCol), col("component").as("group_id"),
          col("group_size"))
    }

  /** Incremental near-dup: match a NEW batch of docs against an EXISTING
    * corpus without recomputing the corpus — the daily-ingest shape at
    * 100 TB, where re-running the full pipeline per batch would scan
    * petabytes to admit gigabytes.
    *
    * The existing side arrives pre-indexed as (id, band_id, band_key, sh)
    * — the narrow banded+set frame [[indexForIncremental]] builds once per
    * corpus version and a production store persists as a bucketed table
    * keyed on (band_id, band_key). Per batch, only the NEW docs run the
    * shingle front end; candidates come from the band equi-join, and the
    * exact-Jaccard verify touches candidate pairs only. Output mirrors
    * nearDupPipeline with new-doc ids in `doc_new`. */
  def incrementalNearDups(newDocs: DataFrame, corpusIndex: DataFrame,
                          textCol: String, idCol: String,
                          k: Int, shingleN: Int, rowsPerBand: Int,
                          threshold: Double): DataFrame =
    incrementalNearDupsFromIndex(
      indexForIncremental(newDocs, textCol, idCol, k, shingleN, rowsPerBand),
      corpusIndex, idCol, threshold)

  /** [[incrementalNearDups]] for callers that ALREADY built the new side's
    * band index (e.g. the streaming ingest loop, which must also append it
    * to the store — building it once serves both uses). Both inputs are
    * indexForIncremental-shaped: (id, band_id, band_key, sh). */
  def incrementalNearDupsFromIndex(newIndex: DataFrame, corpusIndex: DataFrame,
                                   idCol: String, threshold: Double): DataFrame = {
    // the new batch's verify set rides its band rows through the join
    // (same one-pass shape as indexForIncremental) — the per-doc aggregate
    // has exactly ONE consumer, so nothing needs persisting and repeated
    // per-batch calls leak no cache entries
    val newBanded = newIndex
      .select(col(idCol).as("doc_new"), col("band_id"), col("band_key"),
        col("sh").as("sh_new"))
    val corpusBands = corpusIndex
      .select(col(idCol).as("doc_old"), col("band_id"), col("band_key"))
    val candidates = newBanded.join(corpusBands, Seq("band_id", "band_key"))
      .filter(col("doc_new") =!= col("doc_old"))
      .groupBy("doc_new", "doc_old")
      .agg(first(col("sh_new")).as("sh_new")) // constant per doc_new
    // the index carries sh once per (doc, band): restrict to CANDIDATE
    // docs first (semi-join against the tiny candidate set), THEN dedupe
    // by id — the dedup shuffle is candidate-sized, not corpus-sized,
    // which is what keeps per-batch cost flat in the streaming ingest loop
    val oldSets = corpusIndex.select(col(idCol).as("doc_old"), col("sh").as("sh_old"))
      .join(candidates.select("doc_old").distinct(), Seq("doc_old"), "left_semi")
      .dropDuplicates("doc_old")
    candidates
      .join(oldSets, "doc_old")
      .withColumn("union_size",
        size(array_distinct(concat(col("sh_new"), col("sh_old")))).cast("long"))
      .withColumn("inter_size",
        (size(col("sh_new")) + size(col("sh_old"))).cast("long") - col("union_size"))
      .withColumn("jaccard",
        col("inter_size").cast("double") / col("union_size").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_new"), col("doc_old"), col("inter_size"),
        col("union_size"), col("jaccard"))
  }

  /** The persistent corpus-side index for [[incrementalNearDups]]: banded
    * keys + the verify set, one row per (doc, band). Built once per corpus
    * version; incremental batches join against it instead of rescanning
    * the corpus. */
  def indexForIncremental(docs: DataFrame, textCol: String, idCol: String,
                          k: Int, shingleN: Int, rowsPerBand: Int): DataFrame = {
    requireBands(k, rowsPerBand)
    // one pass: bands and the verify set are projections of the same
    // per-doc row — explode after carrying `sh`, never a self-join on id
    perDocAggregate(docs, textCol, idCol, k, shingleN)
      .select(col(idCol), col("sh"), explode(bandArray(k, rowsPerBand)).as("bk"))
      .select(col(idCol), col("bk.band_id").as("band_id"),
        col("bk.band_key").as("band_key"), col("sh"))
  }

  /** Exact pairwise n-gram Jaccard over a *bounded candidate set* (e.g. the
    * LSH candidates, or a capped id range). Never call on an unbounded
    * corpus — this is the verify stage after banding, not the search. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // STRING shingles (not hashes): the verify contract — and qx05's
    // oracle — is exact Jaccard over shingle strings, immune to hash
    // collisions; only the tokenizer inside is the native walk
    val withSet = docs.select(col(idCol).as("doc_id"),
      expr(d.adistinct(TX.shingles(TX.tokensAuto(textCol), shingleN))).as("sh"))
    val a = withSet.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = withSet.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(col("sh_a")) + size(col("sh_b"))
          - size(array_distinct(concat(col("sh_a"), col("sh_b"))))).cast("long").as("inter_size"),
        size(array_distinct(concat(col("sh_a"), col("sh_b")))).cast("long").as("union_size"))
      .withColumn("jaccard",
        col("inter_size").cast("double") / col("union_size").cast("double"))
  }

  /** Exact-substring span REMOVAL — the rewrite step behind
    * [[duplicatedSpanCensus]] (Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better", at shingle granularity): a token
    * position is excised when it falls inside ANY `shingleN`-gram that
    * also occurs in a DIFFERENT document; the survivors are re-joined
    * into `clean_text`. Within-doc repeats deliberately do NOT count
    * (same contract as the census): the target is boilerplate shared
    * ACROSS documents, not a doc's own refrain.
    *
    * Plan: one tokenize pass fans into the positional rolling-hash
    * stream (the [[shingleHashRowsWindowed]] formula, positions kept);
    * the cross-doc dup set is a distinct-(sh, doc) aggregate; coverage
    * is a bounded window frame (`shingleN−1 PRECEDING`) over the
    * doc-keyed stream — start flags propagate to every covered position
    * without a range self-join; reconstruction is one per-doc sorted
    * collect. Shuffles: token stream on sh (dup-flag join; AQE
    * broadcasts the dup set when small) then on doc id — the
    * decontamination topology. The per-doc collect_list is bounded by
    * document length, the same bound tokenization itself already
    * carries.
    *
    * Output: one row per input doc — (idCol, n_tokens, n_removed,
    * clean_text), empty docs kept with empty text. */
  def removeDuplicatedSpans(docs: DataFrame, textCol: String, idCol: String,
                            shingleN: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs.select(col(idCol),
      posexplode(expr(TX.tokensAuto(textCol))).as(Seq("pos", "w")))
    val tokh = tok.withColumn("h", expr(TX.polyHashAuto("w")))
    val win = Window.partitionBy(idCol).orderBy("pos")
    val sh = (1 until shingleN).foldLeft(col("h")) { (acc, j) =>
      (acc * lit(8191L) + lead(col("h"), j).over(win)) % lit(TX.P)
    }
    val withSh = tokh.withColumn("sh", sh)
    val dup = withSh.filter(col("sh").isNotNull)
      .select(col("sh"), col(idCol)).distinct()
      .groupBy("sh").agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= 2).select(col("sh"), lit(1).as("__dupflag"))
    val covFrame = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(shingleN - 1), Window.currentRow)
    val covered = withSh.join(dup, Seq("sh"), "left")
      .withColumn("__st", coalesce(col("__dupflag"), lit(0)))
      .withColumn("covered", max(col("__st")).over(covFrame))
    val agg = covered.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("covered")).cast("long").as("n_removed"),
        array_sort(collect_list(struct(col("pos"), col("covered"), col("w"))))
          .as("__a"))
      .withColumn("clean_text",
        array_join(expr("transform(filter(__a, x -> x.covered = 0), x -> x.w)"), " "))
      .select(col(idCol), col("n_tokens"), col("n_removed"), col("clean_text"))
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Semantic (embedding-space) deduplication — the SemDeDup recipe
    * (Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
    * nearest k-means centroid, then compare pairs ONLY within a cluster
    * and drop a member when a higher-priority cluster-mate sits within
    * cosine `tau` of it. Priority = closer to the centroid (the paper's
    * keep-the-representative rule), rounded to 6dp with the id as
    * tie-break, so the keep set is deterministic in any engine.
    *
    * Scale shape: the quadratic step is fenced inside clusters — cost is
    * Σ|cluster|², never n². At corpus scale the centroid count is chosen
    * so clusters stay bounded (SemDeDup uses k≈110k on LAION; here k
    * comes from the caller's `centroids`), which simultaneously bounds
    * the pair join's skew: the join is keyed on cluster id, so the
    * largest cluster is the critical path. Centroid assignment itself is
    * a broadcast cross-join with a partial-aggregable argmax
    * ([[Clustering.kmeansAssign]]) — the corpus never shuffles to be
    * assigned; only the within-cluster pair join shuffles, keyed on
    * cluster.
    *
    * Output: one row per nonzero-norm vector — (id, cluster,
    * centroid_cosine, kept 1/0, dup_of = smallest dominating neighbor id
    * within tau, NULL when kept). */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
                    centroids: DataFrame, cidCol: String, cvecCol: String,
                    tau: Double): DataFrame = {
    graft.functions.GraftFunctions.register(vectors.sparkSession)
    val assign = Clustering.kmeansAssign(
      vectors, idCol, vecCol, centroids, cidCol, cvecCol)
    // carry each vector + its norm2 alongside the assignment (norm > 0
    // guaranteed: kmeansAssign drops zero-norm rows)
    val v = vectors.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
      .withColumn("__n2", expr(TX.norm2Auto("__vec")))
    val a = assign.join(v, assign(idCol) === col("__vid")).drop("__vid")
    val left = a.select(col(idCol).as("__i"), col("cluster").as("__ci"),
      col("cosine").as("__pi"), col("__vec").as("__vi"), col("__n2").as("__ni"))
    val right = a.select(col(idCol).as("__j"), col("cluster").as("__cj"),
      col("cosine").as("__pj"), col("__vec").as("__vj"), col("__n2").as("__nj"))
    // equi-join on cluster; the priority predicate (strictly closer to
    // the centroid, id-tiebroken on the 6dp-rounded cosine) and the
    // cosine-threshold test run as post-join filters on co-located rows
    val dominated = left.join(right,
        col("__ci") === col("__cj") &&
          (col("__pj") > col("__pi") ||
            (col("__pj") === col("__pi") && col("__j") < col("__i"))))
      .filter(round(
        expr(TX.dotAuto("__vi", "__vj"))
          / (sqrt(col("__ni")) * sqrt(col("__nj"))), 6) >= tau)
      .groupBy(col("__i")).agg(min(col("__j")).as("dup_of"))
    assign.join(dominated, assign(idCol) === col("__i"), "left")
      .select(col(idCol), col("cluster"),
        col("cosine").as("centroid_cosine"),
        when(col("dup_of").isNull, 1L).otherwise(0L).as("kept"),
        col("dup_of"))
  }

  /** Cross-document duplicated-span census: per doc, the fraction of its
    * n-gram positions whose shingle also occurs in ANOTHER doc — the
    * corpus-level "how much of this document is copied text" signal
    * (substring-level duplication à la exact-substring training-data
    * dedup, at shingle granularity; complements the within-doc repetition
    * score, which this census deliberately does NOT count: a shingle must
    * appear in ≥ 2 distinct docs to mark its positions duplicated).
    *
    * Single scan of the tokenize+hash front end (the qx14 lesson): the
    * per-(shingle, doc) aggregate feeds BOTH the distinct-doc count (a
    * shingle-keyed window over already-aggregated rows) and the per-doc
    * rollup — no second pass, nothing persisted. All shuffles are keyed
    * on shingle hash or doc id; output is one row per doc with spans. */
  def duplicatedSpanCensus(docs: DataFrame, textCol: String, idCol: String,
                           shingleN: Int): DataFrame = {
    val perShDoc = shingleHashRows(docs, textCol, idCol, shingleN)
      .groupBy(col("sh"), col(idCol))
      .agg(count(lit(1)).as("occ"))
    // docs-per-shingle, windowed over the aggregate (one row per (sh, doc)
    // — the window partition is the shingle's DOC list, already collapsed)
    val nd = Window.partitionBy("sh")
    perShDoc.withColumn("nd", count(lit(1)).over(nd))
      .groupBy(col(idCol))
      .agg(sum(col("occ")).as("n_spans"),
        sum(when(col("nd") >= 2, col("occ")).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_fraction",
        round(col("dup_spans").cast("double") / col("n_spans").cast("double"), 6))
  }

  /** ASYMMETRIC near-dup: containment pairs — the "short document quoted
    * inside a long one" case Jaccard banding structurally MISSES (a 40-
    * shingle doc fully contained in a 400-shingle doc has Jaccard 0.1;
    * no LSH band tuned for 0.5-Jaccard twins will ever collide them).
    * Candidates come from the shingle-hash equi-join itself, and
    * containment(a,b) = |A∩B| / min(|A|,|B|) decides.
    *
    * The quadratic fence: a shingle shared by df documents contributes
    * df·(df−1)/2 candidate pairs, so BOILERPLATE shingles (present in a
    * large fraction of the corpus) would go quadratic. Shingles with
    * document frequency > `maxDf` are dropped BEFORE the self-join — the
    * standard common-gram cut: a shingle that appears in more than maxDf
    * documents is boilerplate evidence, not containment evidence. The cut
    * is part of the operator's CONTRACT (containment is measured over the
    * rare-shingle subset, both in the numerator and the |A|,|B| sizes),
    * which keeps the semantics engine-reproducible — the oracle applies
    * the identical cut. Per-shingle candidate work is then ≤ maxDf² and
    * the join stays an ordinary skew-splittable equi-join. */
  def containmentPairs(docs: DataFrame, textCol: String, idCol: String,
                       shingleN: Int, minContainment: Double,
                       maxDf: Long): DataFrame = {
    require(minContainment > 0 && minContainment <= 1,
      s"minContainment must be in (0,1]: $minContainment")
    require(maxDf >= 2, s"maxDf < 2 can never form a pair: $maxDf")
    val s = shingleHashRowsDistinct(docs, textCol, idCol, shingleN)
    val df = s.groupBy("sh").agg(count(lit(1)).as("__df"))
    val rare = s.join(df.filter(col("__df") <= maxDf), "sh")
      .select(col(idCol), col("sh"))
    val sizes = rare.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val a = rare.select(col(idCol).as("doc_a"), col("sh"))
    val b = rare.select(col(idCol).as("doc_b"), col("sh"))
    a.join(b, "sh").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col(idCol).as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col(idCol).as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("__raw",
        col("n_shared").cast("double") / least(col("n_a"), col("n_b")).cast("double"))
      .filter(col("__raw") >= minContainment) // threshold on RAW, round for display
      .withColumn("containment", round(col("__raw"), 6))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("containment"))
  }

  /** Exact shared-shingle overlap edges: (u, v, shared) for every doc
    * pair sharing ≥ `minShared` distinct `shingleN`-gram shingles, with
    * boilerplate shingles cut at df > `maxDf` — containmentPairs'
    * candidate stage promoted to a graph primitive (the quadratic is the
    * same Σ df² fence). The undirected edge list feeds the graph
    * operators: connectedComponents for dedup groups,
    * pageRankFixedPoint for centrality-based canonical selection. */
  def overlapEdges(docs: DataFrame, textCol: String, idCol: String,
                   shingleN: Int, maxDf: Long, minShared: Long): DataFrame = {
    require(maxDf >= 2, s"maxDf < 2 can never form a pair: $maxDf")
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    val s = shingleHashRowsDistinct(docs, textCol, idCol, shingleN)
    val df = s.groupBy("sh").agg(count(lit(1)).as("__df"))
    val rare = s.join(df.filter(col("__df") <= maxDf), "sh")
      .select(col(idCol), col("sh"))
    val a = rare.select(col(idCol).as("u"), col("sh"))
    val b = rare.select(col(idCol).as("v"), col("sh"))
    a.join(b, "sh").filter(col("u") < col("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
