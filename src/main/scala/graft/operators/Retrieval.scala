package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}

/** Lexical (BM25) retrieval and hybrid rank fusion.
  *
  * The one-shot [[bm25TopK]] pays TWO postings-scale exchanges: the
  * (term, doc_id, tf) census itself, and the per-term document-frequency
  * aggregation over that census (and the lazy census tokenizes once per
  * consuming branch — the branches run concurrently, which measures ~2×
  * faster than serializing them behind a checkpoint; see [[bm25Index]]).
  * Everything query-side — the query terms, df restricted to those
  * terms, the corpus scalars (N, avgdl) — is planning-scale metadata
  * that broadcasts, and scoring joins candidates off the census by
  * broadcast, so the corpus is scanned, never re-exchanged, there.
  * The DEPLOYMENT answer to both exchanges is the durable store below:
  * postings AND per-term df are persisted at build, so serving pays a
  * bucket-pruned scan of each and zero corpus-scale aggregation.
  *
  * Determinism discipline (the DuckDB oracle hash-compares results): tf,
  * df, dl, N are integers; idf and the length normalization are single
  * IEEE operation chains over those integers. The JVM's `ln` and
  * DuckDB's libm are not correctly-rounded, so the chains are identical
  * up to 1 ulp — a divergence would only surface if a score landed
  * within an ulp of a .5 micro-unit boundary of the floor(x·10⁶ + 0.5)
  * quantization below (never observed across the gated SFs; the gate
  * itself re-verifies the assumption on real data every run). Each
  * per-term score is quantized to integer micro-units BEFORE the
  * per-document sum, so the reduction is an exact long sum:
  * order-independent, and ~3× cheaper per row than the round+DECIMAL
  * cast it replaces. Ties break on doc_id ascending.
  *
  * Reference analog: the reference serves keyword lookups over company
  * facts via substring label match (financial_analyzer.py label search,
  * F6/qx13's semantic); BM25 generalizes that to ranked free-text
  * retrieval over the documents corpus — the lexical half of a
  * training-data / RAG retrieval stack (Robertson & Zaragoza 2009).
  */
object Retrieval {

  /** Okapi BM25 defaults (Robertson & Zaragoza 2009 §3.3). */
  val K1 = 1.2
  val B = 0.75
  /** Reciprocal-rank-fusion constant (Cormack, Clarke & Buettcher 2009). */
  val RRF_K0 = 60

  /** Inverted-index build: postings (doc_id, term, tf, dl) with ZERO
    * exchanges — the census is a scan-side projection. (doc, term)
    * statistics are doc-local, so `graft_term_freqs(text)`
    * ([[graft.functions.TermFreqs]]) computes each document's whole
    * census inside the scan in one tokenizer pass, returning
    * `struct(dl, terms)` — dl rides along in the same walk, so there is
    * no second tokenize and no doc-keyed aggregation+join a naive
    * Lucene-norms translation would pay. The earlier formulation
    * (explode → groupBy(doc_id, term)) exploded one row per token
    * occurrence into a hash aggregate and paid a full census-sized
    * exchange (map-side partial aggregation combined same-(doc, term)
    * occurrences before the wire — for the POSITIONAL variant the
    * partial collect_list buffers still carried every position, i.e.
    * occurrence-sized bytes) — the largest write-side exchange of the
    * store lifecycle at 100 TB; this one ships nothing before the
    * consumer's own keying (bucket placement for stores, candidate join
    * for the one-shot scorer). Precondition (unchanged in spirit, now
    * explicit):
    * `idCol` is unique per document — the old groupBy silently merged
    * duplicate ids, which was accidental, not semantics.
    *
    * The census is returned LAZY, not checkpointed: bm25TopK's two
    * consumers (candidate postings, df census) plan as structurally
    * different subtrees (per-branch column pruning defeats
    * ReuseExchange), so the census computes once per branch — but the
    * branches are independent stages of one DAG and run CONCURRENTLY,
    * which measures ~2× faster end-to-end than a localCheckpoint that
    * serializes the whole plan behind an eager materialization (profiled
    * at sf0.1: 1.2 s vs 2.1 s). At 100 TB the one-shot form pays one
    * extra tokenize pass; the deployment answer is the durable store
    * ([[writeBm25Store]]), which persists this table AND its df census
    * so serving re-aggregates neither. */
  def bm25Index(corpus: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(col(idCol).as("doc_id"),
        expr(s"graft_term_freqs($textCol)").as("__s"))
      .select(col("doc_id"), col("__s.dl").as("dl"),
        explode(col("__s.terms")).as("ts"))
      .select(col("doc_id"), col("ts.term").as("term"),
        col("ts.tf").as("tf"), col("dl"))
  }

  /** [[bm25Index]] with POSITIONS: each (doc, term) row additionally
    * carries the sorted 1-based token positions of the term — the
    * Lucene-postings-with-positions shape, what [[phraseTopKFromStore]]'s
    * adjacency intersection needs. This is the census the durable store
    * persists (round 10): positions are a WRITE-side cost only — every
    * scoring read selects (doc_id, term, tf, dl) and parquet column
    * pruning never materializes the arrays (PlanAuditSpec pins the
    * serving ReadSchema). Same zero-exchange scan-projection shape as
    * [[bm25Index]] (`graft_term_stats` emits positions already sorted
    * ascending — they are appended in tokenizer order — so the old
    * collect_list + sort_array aggregation, which fell back to
    * sort-based aggregation on real key counts, disappears entirely);
    * tf = size(pos) by construction. */
  def bm25IndexPositional(corpus: DataFrame, textCol: String, idCol: String)
      : DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    corpus
      .select(col(idCol).as("doc_id"),
        expr(s"graft_term_stats($textCol)").as("__s"))
      .select(col("doc_id"), col("__s.dl").as("dl"),
        explode(col("__s.terms")).as("ts"))
      .select(col("doc_id"), col("ts.term").as("term"),
        col("ts.tf").as("tf"), col("dl"), col("ts.pos").as("pos"))
  }

  /** BM25 top-k: score every query (set-of-terms semantics, distinct
    * query tokens) against the corpus; return the k best docs per query.
    *
    * Plan shape: the corpus pays the census shuffle plus the df
    * aggregation over it (see the object doc — the persisted store
    * amortizes both away). The per-term df ∩ query-terms table and the
    * 1-row corpus scalars broadcast; the scalars branch off the scan so
    * their broadcast builds concurrently with the census shuffle.
    * Scoring is a map-side broadcast join over the census plus one
    * (query_id, doc_id)-keyed aggregation of the candidate rows —
    * bounded by the summed df of the query terms, never the corpus. */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, textCol: String,
               idCol: String, k: Int, k1: Double = K1, b: Double = B,
               maxQueryTerms: Int = Int.MaxValue): DataFrame = {
    val postings = bm25Index(corpus, textCol, idCol)
    // Corpus scalars (N = docs with ≥1 token, total token mass) branch
    // off the SCAN, not the census — the broadcast builds concurrently
    // with the postings shuffle instead of behind it.
    val sparkD = Dialect(spark = true)
    val stats = corpus
      .select(expr(TX.tokenCountAuto(textCol)(sparkD)).as("dl"))
      .filter(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len"))
    val dfreq = postings.groupBy("term").agg(count(lit(1)).as("df"))
    scoreBm25(postings,
      queryTerms(queries, textCol, idCol, maxQueryTerms), stats, dfreq, k, k1, b)
  }

  /** One scored field of a BM25F corpus: the text column, its weight, and
    * its length-normalization slope (per-field b is the point of BM25F —
    * titles usually want weaker normalization than bodies). */
  final case class Bm25Field(textCol: String, weight: Double, b: Double = B)

  /** BM25F top-k (Robertson & Zaragoza 2009 §3.5 "simple BM25F";
    * Zaragoza et al., TREC-13 2004): fielded documents score with
    * per-field soft length normalization FIRST, then one saturation —
    * NOT a weighted sum of per-field BM25 scores (that would saturate tf
    * per field and over-reward a term spread thinly across fields).
    *
    *   wtf(t, d) = Σ_f  w_f · tf_f(t,d) / (1 − b_f + b_f · dl_f(d)/avgdl_f)
    *   score(q, d) = Σ_t idf(t) · wtf / (k1 + wtf)
    *
    * Conventions (mirrored verbatim by the DuckDB oracle):
    * n_docs = docs with ≥ 1 token in ANY field; avgdl_f = Σ dl_f /
    * n_docs; df(t) = docs where wtf > 0 (any field); idf is [[idfSql]]'s
    * Robertson form; term scores land in integer micro-units (floor(x·1e6
    * + 0.5)) before the per-doc sum, like every retrieval gate here.
    * Double determinism: wtf sums one double per field carrying the term
    * — with ≤ 2 fields the sum is order-exact (IEEE addition is
    * commutative); beyond that the micro-unit floor absorbs ordering ulps
    * exactly as the idf 1-ulp note in the object doc.
    *
    * Plan shape: one zero-exchange [[bm25Index]]-style census per field
    * (union'd), ONE (doc, term)-keyed exchange to merge fields, a
    * census-sized df aggregate, broadcast stats/query joins, one
    * (query, doc) aggregation — the bm25TopK shape plus the single merge
    * exchange fielded scoring fundamentally needs. */
  def bm25fTopK(corpus: DataFrame, fields: Seq[Bm25Field], idCol: String,
                queries: DataFrame, queryTextCol: String, k: Int,
                k1: Double = K1,
                maxQueryTerms: Int = Int.MaxValue): DataFrame = {
    require(fields.nonEmpty, "bm25fTopK needs at least one field")
    GraftFunctions.register(corpus.sparkSession)
    val sparkD = Dialect(spark = true)
    // corpus scalars: per-field token mass + the any-field doc count,
    // branching off the scan like bm25TopK's stats
    val lens = corpus.select(fields.zipWithIndex.map { case (f, i) =>
      coalesce(expr(TX.tokenCountAuto(f.textCol)(sparkD)), lit(0L)).as(s"l_$i")
    }: _*)
    val stats = lens
      .filter(fields.indices.map(i => col(s"l_$i")).reduce(_ + _) > 0)
      .agg(count(lit(1)).as("n_docs"),
        fields.indices.map(i => sum(col(s"l_$i")).as(s"len_$i")): _*)
    // per-field census → weighted, field-normalized contribution per
    // (doc, term, field) row; avgdl_f comes from the broadcast stats so
    // the whole DAG stays lazy.
    //
    // Round-14 (guide §1.2): ONE corpus scan for ALL fields. The old
    // per-field `bm25Index(corpus, f) union …` shape scanned the corpus
    // once per field, and when the fields are themselves DERIVED from a
    // tokenized base column (the qx118 title/body split) each scan
    // re-tokenized the base text — nFields full regex passes plus
    // nFields scans for one census. Now a single projection computes
    // every field's graft_term_freqs struct, one explode over the field
    // ordinals and one over the terms yields the same (doc, term, field)
    // rows, and the per-field constants (weight, b, len_i) resolve by a
    // CASE on the field ordinal. Per-row contribution values are the
    // identical expression per field; the (doc, term) merge sums ≤
    // nFields doubles exactly as before (order-exact for ≤ 2 fields,
    // micro-unit floor beyond — see the operator doc), so the result is
    // byte-identical while the census costs one scan instead of nFields.
    val statCols = fields.zipWithIndex.map { case (f, i) =>
      expr(s"graft_term_freqs(${f.textCol})").as(s"__s$i")
    }
    val fieldStructs = fields.indices.map(i =>
      s"named_struct('fi', $i, 'dl', __s$i.dl, 'terms', __s$i.terms)")
    val avgdlCase = fields.indices.map(i =>
      s"WHEN $i THEN CAST(len_$i AS DOUBLE)").mkString(
      "(CASE fi ", " ", " END / CAST(n_docs AS DOUBLE))")
    val contribCase = fields.zipWithIndex.map { case (f, i) =>
      s"WHEN $i THEN (CAST(${f.weight} AS DOUBLE) * CAST(tf AS DOUBLE))" +
        s" / (1.0 - CAST(${f.b} AS DOUBLE) + CAST(${f.b} AS DOUBLE)" +
        s" * (CAST(dl AS DOUBLE) / $avgdlCase))"
    }.mkString("(CASE fi ", " ", " END)")
    val contribs = corpus
      .select(col(idCol).as("doc_id") +: statCols: _*)
      .select(col("doc_id"),
        explode(expr(fieldStructs.mkString("array(", ", ", ")"))).as("__f"))
      .select(col("doc_id"), col("__f.fi").as("fi"), col("__f.dl").as("dl"),
        explode(col("__f.terms")).as("ts"))
      .select(col("doc_id"), col("fi"), col("dl"),
        col("ts.term").as("term"), col("ts.tf").as("tf"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), expr(contribCase).as("contrib"))
    // THE field-merge exchange: wtf per (doc, term)
    val merged = contribs.groupBy("doc_id", "term")
      .agg(sum("contrib").as("wtf"))
    scoreBm25f(merged, queryTerms(queries, queryTextCol, idCol, maxQueryTerms),
      stats.select(col("n_docs")), k, k1)
  }

  /** The BM25F scoring tail over a merged fielded census (doc_id, term,
    * wtf) — shared by the one-shot and the store-served paths so the
    * two cannot drift. df counts docs per term in `merged` itself: the
    * one-shot passes the full census; the served path passes the pruned
    * live union, which is term-complete for every scored term, so the
    * values agree. */
  private def scoreBm25f(merged: DataFrame, qterms: DataFrame,
                         ndocs: DataFrame, k: Int, k1: Double,
                         allowed: Option[DataFrame] = None): DataFrame = {
    // df BEFORE the allow-list: corpus-global statistics, fenced candidates
    val dfreq = merged.groupBy("term").agg(count(lit(1)).as("df"))
    val cand = allowed.fold(merged) { a =>
      val ids = a.select(col(a.columns.head).as("doc_id")).distinct()
      merged.join(broadcast(ids), Seq("doc_id"), "leftsemi")
    }
    val qstat = dfreq.join(broadcast(qterms), "term")
    val scored = cand.join(broadcast(qstat), "term")
      .crossJoin(broadcast(ndocs))
      .withColumn("term_score",
        expr(s"CAST(floor($idfSql * (${bm25fSatSql(k1)})" +
          " * 1000000.0 + 0.5) AS BIGINT)"))
    val perDoc = scored.groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score_u"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_u").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_u").cast("double") / lit(1000000.0), 6).as("score"))
  }

  /** BM25F per-field contribution over integer columns tf/dl and the
    * stats columns n_docs/`lenCol` (SQL text, both dialects):
    * w · tf / (1 − b + b · dl/avgdl_f), avgdl_f = lenCol/n_docs. */
  def bm25fContribSql(weight: Double, b: Double, lenCol: String): String =
    s"(CAST($weight AS DOUBLE) * CAST(tf AS DOUBLE))" +
      s" / (1.0 - CAST($b AS DOUBLE) + CAST($b AS DOUBLE)" +
      s" * (CAST(dl AS DOUBLE) / (CAST($lenCol AS DOUBLE) / CAST(n_docs AS DOUBLE))))"

  /** BM25F saturation over the double column wtf (SQL text, both
    * dialects): wtf / (k1 + wtf). */
  def bm25fSatSql(k1: Double): String =
    s"(wtf / (CAST($k1 AS DOUBLE) + wtf))"

  /** Distinct (query_id, term) rows, capped at the first `maxQueryTerms`
    * tokens of each query text.
    *
    * Driver-local query frames (the serving shape: one request row built
    * from the call's arguments) are tokenized ON THE DRIVER with the
    * SAME JVM function the codegen'd `graft_tokens` calls
    * ([[graft.functions.MinHashDoc.tokens]]), capped and de-duplicated
    * identically, and returned as a LocalRelation — so every downstream
    * broadcast/collect of the terms (the bucket-literal planning, the
    * scoring joins) is jobless instead of a scheduling barrier per use.
    * Corpus-backed query frames keep the distributed explode/distinct
    * plan verbatim. */
  def queryTerms(queries: DataFrame, textCol: String, idCol: String,
                 maxQueryTerms: Int): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    DriverPlan.localRows(queries.select(col(idCol), col(textCol))) match {
      case Some(rows) =>
        val idField = queries.select(col(idCol)).schema.head
        val seen = new scala.collection.mutable.LinkedHashSet[(Any, String)]
        rows.foreach { r =>
          val txt = r.get(1)
          if (txt != null) {
            val arr = graft.functions.MinHashDoc.tokens(
              org.apache.spark.unsafe.types.UTF8String.fromString(txt.toString))
            val n =
              if (maxQueryTerms == Int.MaxValue) arr.numElements()
              else math.min(maxQueryTerms, arr.numElements())
            var i = 0
            while (i < n) {
              seen.add((r.get(0), arr.getUTF8String(i).toString)); i += 1
            }
          }
        }
        DriverPlan.localFrame(queries.sparkSession,
          seen.toSeq.map { case (id, t) => org.apache.spark.sql.Row(id, t) },
          org.apache.spark.sql.types.StructType(Seq(
            idField.copy(name = "query_id"),
            org.apache.spark.sql.types.StructField("term",
              org.apache.spark.sql.types.StringType, nullable = false))))
      case None =>
        val sparkD = Dialect(spark = true)
        val qtok = expr(TX.tokensAuto(textCol)(sparkD))
        val qtokCapped =
          if (maxQueryTerms == Int.MaxValue) qtok else slice(qtok, 1, maxQueryTerms)
        queries.select(col(idCol).as("query_id"), explode(qtokCapped).as("term"))
          .distinct()
    }
  }

  /** Per-slot query tokens (query_id, slot, term), slot 1-based,
    * duplicates kept, capped at the first `maxTerms` tokens — the phrase
    * query shape. Driver-local query frames evaluate on the driver into
    * a LocalRelation (same tokenizer as [[queryTerms]]'s driver twin, so
    * every downstream broadcast/bucket-collect is jobless); distributed
    * frames keep the posexplode plan verbatim. */
  private def querySlotTokens(queries: DataFrame, textCol: String,
                              idCol: String, maxTerms: Int): DataFrame = {
    GraftFunctions.register(queries.sparkSession)
    DriverPlan.localRows(queries.select(col(idCol), col(textCol))) match {
      case Some(rows) =>
        val idField = queries.select(col(idCol)).schema.head
        val out = rows.toSeq.flatMap { r =>
          val txt = r.get(1)
          if (txt == null) Seq.empty
          else {
            val arr = graft.functions.MinHashDoc.tokens(
              org.apache.spark.unsafe.types.UTF8String.fromString(txt.toString))
            val n = if (maxTerms == Int.MaxValue) arr.numElements()
                    else math.min(maxTerms, arr.numElements())
            (0 until n).map(i => org.apache.spark.sql.Row(
              r.get(0), i + 1, arr.getUTF8String(i).toString))
          }
        }
        DriverPlan.localFrame(queries.sparkSession, out,
          org.apache.spark.sql.types.StructType(Seq(
            idField.copy(name = "query_id"),
            org.apache.spark.sql.types.StructField("slot",
              org.apache.spark.sql.types.IntegerType, nullable = false),
            org.apache.spark.sql.types.StructField("term",
              org.apache.spark.sql.types.StringType, nullable = false))))
      case None =>
        val sparkD = Dialect(spark = true)
        val qtok0 = queries.select(col(idCol).as("query_id"),
          posexplode(expr(TX.tokensAuto(textCol)(sparkD))).as(Seq("qp0", "term")))
        (if (maxTerms == Int.MaxValue) qtok0
         else qtok0.filter(col("qp0") < maxTerms))
          .select(col("query_id"), (col("qp0") + 1).as("slot"), col("term"))
    }
  }

  /** Per-query row counts of a token/term frame as (query_id, `name`) —
    * driver-evaluated into a LocalRelation when the frame is local (the
    * serving shape), so broadcasting the counts is jobless; the ordinary
    * groupBy otherwise. */
  private def queryCounts(qtok: DataFrame, name: String): DataFrame =
    DriverPlan.localRows(qtok.select(col("query_id"))) match {
      case Some(rows) =>
        val idField = qtok.select(col("query_id")).schema.head
        val counts = scala.collection.mutable.LinkedHashMap[Any, Long]()
        rows.foreach(r => counts(r.get(0)) = counts.getOrElse(r.get(0), 0L) + 1L)
        DriverPlan.localFrame(qtok.sparkSession,
          counts.toSeq.map { case (id, n) => org.apache.spark.sql.Row(id, n) },
          org.apache.spark.sql.types.StructType(Seq(idField,
            org.apache.spark.sql.types.StructField(name,
              org.apache.spark.sql.types.LongType, nullable = false))))
      case None => qtok.groupBy("query_id").agg(count(lit(1)).as(name))
    }

  /** The BM25 scoring tail over a postings table (doc_id, term, tf, dl) —
    * shared by the one-shot and the persisted-store paths, so the store
    * search cannot drift from the gated formula. `stats` is the 1-row
    * (n_docs, total_len) frame of the live indexed corpus; `dfreq` the
    * (term, df) table over the same live corpus — computed from the
    * census one-shot, read back pruned from the store. */
  private def scoreBm25(postings: DataFrame, qterms: DataFrame,
                        stats: DataFrame, dfreq: DataFrame,
                        k: Int, k1: Double, b: Double,
                        requireAll: Boolean = false): DataFrame = {
    // per-(query, term) planning row: df for the query's terms only — tiny
    val qstat = dfreq.join(broadcast(qterms), "term")
    val scored = postings.join(broadcast(qstat), "term")
      .crossJoin(broadcast(stats))
    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    val idf = log(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))
    val termScore = floor(idf * tfNorm * lit(1000000.0) + lit(0.5)).cast("long")
    // one scored row per (query, doc, term) by construction (postings
    // are (doc, term)-unique, qterms (query, term)-distinct), so the
    // group count IS the number of distinct matched terms
    val perDoc0 = scored
      .withColumn("term_score", termScore)
      .groupBy("query_id", "doc_id")
      .agg(sum("term_score").as("score_u"), count(lit(1)).as("matched"))
    val perDoc =
      if (!requireAll) perDoc0.drop("matched")
      else {
        // CONJUNCTIVE (boolean-AND) semantics: only docs matching EVERY
        // query term rank; survivors keep their ordinary BM25 scores (a
        // conjunctive result is a subset of the OR result, same values)
        val qlens = queryCounts(qterms, "nterms")
        perDoc0.join(broadcast(qlens), "query_id")
          .filter(col("matched") === col("nterms"))
          .drop("matched", "nterms")
      }
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_u").desc, col("doc_id").asc)
    perDoc.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score_u").cast("double") / lit(1000000.0), 6).as("score"))
  }

  // ------------------------------------------------------------------
  // Durable BM25 store v2 — the lexical twin of the IVF-PQ store
  // family, with the full maintenance lifecycle (append / delete /
  // compact / rebucket) and idempotent, crash-recoverable writes.
  //
  // Layout under `path/`:
  //   postings/bucket=B/epoch=E/  (doc_id, term, tf, dl) — term-hash
  //     bucket partitions for pruned serving; epoch sub-partitions so
  //     every append is a DYNAMIC PARTITION OVERWRITE: retrying a
  //     failed append with the same epoch REPLACES the batch's
  //     partitions instead of double-appending its postings.
  //   df/bucket=B/epoch=E/        (term, cnt) per-epoch document-
  //     frequency DELTAS (append epochs positive from the batch census,
  //     delete epochs negative from the deleted docs' postings). The
  //     live df of a term is THE SUM of its deltas — derived-on-read
  //     over the query's pruned buckets (vocabulary-of-bucket ×
  //     epochs rows, planning scale), so serving never aggregates
  //     postings AND appends never re-read the standing buckets to
  //     refresh a materialized census (which would be a postings-scale
  //     cost per batch with any realistic vocabulary).
  //   tombstones/epoch=E/         (doc_id) retracted ids; dynamic
  //     overwrite per epoch makes deletes retry-idempotent too. Delete
  //     epochs are stored NEGATED across all three tables: appends (and
  //     stream batches) own the positive space, so the two writers'
  //     replace-don't-append tricks can never clobber each other's rows.
  //   epochs/epoch=E/             1 row (n_docs_delta, total_len_delta,
  //     n_buckets); the corpus scalars are THE SUM of these deltas
  //     (append epochs add, delete epochs subtract) — derived-on-read,
  //     so no ordering of a stats overwrite can ever disagree with the
  //     postings. n_buckets rides every row (constant per store) so one
  //     tiny read serves both the scalars and the bucket geometry.
  //
  // Caller contract: single writer per store (schedule mutations; each
  // takes the store's StoreLock and fails loudly on contention), append
  // epochs are >= 1 and unique per logical batch (re-using an epoch ==
  // declaring a retry of that batch), and appended ids are new to the
  // store. A failed mutation is healed by RE-RUNNING IT with the same
  // epoch: every write lands in the partitions the (deterministic)
  // batch derivation names, so the rerun converges.
  // ------------------------------------------------------------------

  private def postingsPath(path: String) = s"$path/postings"
  private def dfPath(path: String) = s"$path/df"
  private def epochsPath(path: String) = s"$path/epochs"
  private def storeTombstonesPath(path: String) = s"$path/tombstones"
  private def compactBakPath(path: String) = s"$path/compact-bak"
  private def compactNewPath(path: String) = s"$path/compact-new"
  private def docsPath(path: String) = s"$path/docs"

  /** True iff the tombstones directory holds at least one epoch
    * partition — compaction clears partitions one by one (round 12), so
    * an existing-but-dataless directory (just _SUCCESS) must read as
    * "no tombstones", not as a schema-inference crash. */
  private def hasTombstoneData(fs: org.apache.hadoop.fs.FileSystem,
                               path: String): Boolean = {
    val tp = new org.apache.hadoop.fs.Path(storeTombstonesPath(path))
    fs.exists(tp) && fs.listStatus(tp)
      .exists(_.getPath.getName.startsWith("epoch="))
  }

  private def bucketCol(nBuckets: Int): Column =
    expr(s"graft_polyhash(term) % $nBuckets")

  /** The serving plan's partition literals: the DISTINCT term-hash
    * buckets of a (…, term) frame — ≤ min(|terms|, nBuckets) longs
    * collected to the driver (planning metadata). The ONE idiom every
    * pruned lexical read starts from; shared so the serving, phrase,
    * proximity and snippet paths cannot drift. */
  private def termBuckets(terms: DataFrame, nBuckets: Long): Seq[Long] =
    DriverPlan.localRows(terms.select(col("term"))) match {
      case Some(rows) =>
        // jobless twin for LocalRelation term frames (the serving shape,
        // from queryTerms' driver branch): the SAME JVM hash the
        // codegen'd graft_polyhash calls, same modulus
        rows.map(r => graft.functions.PolyHash.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))
          % nBuckets).distinct.toSeq
      case None =>
        terms.select(expr(s"graft_polyhash(term) % $nBuckets").as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
    }

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** FileSystem-metadata fingerprint of `paths`: md5 over each path's
    * DIRECT children's (name, mtime, length) triples — one listStatus
    * per path, no Spark job. Every store write creates or replaces
    * children under one of these roots (parquet part files carry fresh
    * random names, and a partition directory's mtime updates when files
    * land inside it), so any LANDED mutation changes the fingerprint.
    * Versions the driver-side scalar memo below and the serve layer's
    * result-cache keys. NOTE: object stores without real directory
    * mtimes (S3) weaken the signal to "top-level children changed";
    * cache TTLs bound the staleness window there — local/HDFS
    * deployments get exact invalidation. */
  private[graft] def fsFingerprint(spark: SparkSession,
                                   paths: Seq[String]): String = {
    val parts = paths.flatMap { p =>
      val fs = fsFor(spark, p)
      val hp = new org.apache.hadoop.fs.Path(p)
      if (!fs.exists(hp)) Seq(s"$p#absent")
      else s"$p#dir" +: fs.listStatus(hp).map(st =>
        s"${st.getPath.getName}#${st.getModificationTime}#${st.getLen}")
        .sorted.toSeq
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private final case class EpochsInfo(nDocs: Long, totalLen: Long,
                                      idHash: Option[Long], nBuckets: Int,
                                      fieldNames: Option[Seq[String]],
                                      lenSums: Option[Seq[Long]],
                                      epochs: Seq[Long])

  // One epochs-table row, driver-side (one row per epoch — planning
  // scale by construction).
  private final case class EpochRow(epoch: Long, nd: Long, tl: Long,
                                    ih: Option[Long],
                                    nBuckets: Int,
                                    fieldNames: Option[Seq[String]],
                                    lens: Option[Seq[Long]])

  // Driver-side memo of the PER-EPOCH delta rows, keyed by the epochs
  // directory's fingerprint: a serving request pays ONE listStatus
  // instead of a Spark read for the commit log it folds its snapshot
  // from. Any epoch write (append/delete/build/rebucket) changes the
  // child set — new part names at minimum — so the next request
  // recomputes; compaction never touches the epochs table and correctly
  // keeps the memo. Bounded LRU (access-order), shared across stores.
  private val epochsMemo =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Seq[EpochRow]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Seq[EpochRow]]): Boolean = size() > 256
      })

  private def epochRows(spark: SparkSession, path: String): Seq[EpochRow] = {
    val key = fsFingerprint(spark, Seq(epochsPath(path)))
    val hit = epochsMemo.get(key)
    if (hit != null) hit
    else {
      val ep = spark.read.parquet(epochsPath(path))
      val hasSig = ep.columns.contains("id_hash_delta")
      val fielded = ep.columns.contains("field_names")
      val cols = Seq(col("epoch").cast("long"), col("n_docs_delta"),
        col("total_len_delta"),
        (if (hasSig) col("id_hash_delta") else lit(0L)).as("ih"),
        col("n_buckets")) ++
        (if (fielded) Seq(col("field_names"), col("len_deltas")) else Seq.empty)
      val rows = ep.select(cols: _*).collect().toSeq.map { r =>
        EpochRow(r.getLong(0), r.getLong(1), r.getLong(2),
          if (hasSig) Some(r.getLong(3)) else None, r.getInt(4),
          if (fielded) Some(r.getSeq[String](5).toSeq) else None,
          if (fielded) Some(r.getSeq[Long](6).toSeq) else None)
      }
      epochsMemo.put(key, rows)
      rows
    }
  }

  /** The store's COMMITTED SNAPSHOT, folded driver-side from the epochs
    * table (the store's COMMIT LOG) — the consistency spine of every
    * serving read (round 12).
    *
    * One uniform commit rule: EVERY mutation lands its epochs row LAST
    * (append/build: postings → df → epochs row; delete: df → tombstones
    * → epochs row), so an epoch is COMMITTED iff its epochs row exists,
    * and everything a reader touches — postings, df deltas, scalar
    * folds, TOMBSTONES — filters to the committed epoch set. A
    * half-landed mutation, in flight or crashed, is therefore INVISIBLE
    * (the reader serves the pre-state until the retry lands the commit
    * row), which closes the delete path's previously documented
    * stats-vs-docs transient AND a latent rebucket hazard (folding a
    * crashed delete's deltas while keeping its un-tombstoned docs). The
    * uniform rule is also what keeps the serve layer's LOGICAL cache
    * token (the epochs-table fingerprint) exact: an answer can only
    * change when the commit log changes. Cross-source races within one
    * request (stats read before a commit landed, postings after) are
    * the serve layer's optimistic physical-token bracket's job — this
    * fold makes every AT-REST state exact. */
  private def epochsInfo(spark: SparkSession, path: String): EpochsInfo = {
    val rows = epochRows(spark, path)
    val committed = rows
    val hasSig = rows.forall(_.ih.nonEmpty) && rows.nonEmpty
    val fielded = committed.exists(_.fieldNames.nonEmpty)
    val fLens = if (!fielded) None else Some(
      committed.flatMap(_.lens).foldLeft(Seq.empty[Long]) { (acc, l) =>
        if (acc.isEmpty) l
        else acc.zipAll(l, 0L, 0L).map { case (a, b) => a + b }
      })
    EpochsInfo(
      committed.map(_.nd).sum, committed.map(_.tl).sum,
      if (hasSig) Some(committed.map(_.ih.get).foldLeft(0L)(_ ^ _)) else None,
      rows.map(_.nBuckets).maxOption.getOrElse(
        throw new IllegalStateException(
          s"store $path has an empty epochs table — no committed build")),
      if (!fielded) None
      else committed.flatMap(_.fieldNames).headOption,
      fLens,
      committed.map(_.epoch))
  }

  /** Serving guard: a pre-signature store (epochs table without
    * id_hash_delta) fails ACTIONABLY — the migration-era contract the
    * snapshot fold must keep (liveStatsAndBuckets used to carry it). */
  private def requireSignature(path: String, snap: EpochsInfo): EpochsInfo = {
    if (snap.idHash.isEmpty)
      throw new IllegalArgumentException(
        s"store $path predates the doc-set-signature schema (epochs table " +
          "has no id_hash_delta column) — rebuild the store with " +
          "writeBm25Store (rebucket reads the signature fold itself and " +
          "cannot migrate past this)")
    snap
  }

  /** Guard: `op` is a single-text-column operation and must not touch a
    * FIELDED store ([[writeBm25fStore]] layout) — its postings carry a
    * field column and its epochs carry per-field length deltas that the
    * unfielded writers would not maintain (and the unfielded servers
    * would mis-score: a (doc, term) pair has one row PER FIELD). */
  private def requireUnfielded(spark: SparkSession, path: String,
                               op: String): Unit =
    if (epochsInfo(spark, path).fieldNames.nonEmpty)
      throw new IllegalArgumentException(
        s"$op: store $path is a FIELDED store (fields: " +
          s"${epochsInfo(spark, path).fieldNames.get.mkString(", ")}) — " +
          "use the bm25f* store entry points (appendBm25fStore/" +
          "deleteFromBm25fStore/bm25fTopKFromStore/rebucketBm25fStore)")

  private def readMeta(spark: SparkSession, path: String): Int =
    epochsInfo(spark, path).nBuckets

  /** True iff the store carries the FIELDED ([[writeBm25fStore]])
    * layout — the routing predicate maintenance schedulers need to pick
    * the bm25f lifecycle entry points (one O(1) memoized epochs read). */
  def isFieldedStore(spark: SparkSession, path: String): Boolean =
    epochsInfo(spark, path).fieldNames.nonEmpty

  /** The lexical store's result-cache version token: the epochs-table
    * fingerprint. Every answer-changing mutation writes an epoch row
    * (append/delete/build/rebucket), so the token changes with the
    * answers; COMPACTION never touches the epochs table, so cached
    * results deliberately survive it (compaction moves filtering cost,
    * never the answer — including include_text, whose tombstone guard
    * and sidecar vacuum cancel out visibly). Strictly stronger than the
    * doc-set signature alone: a rebuild with the same ids but EDITED
    * texts changes the fingerprint (fresh part files) where the id-XOR
    * signature would collide. One listStatus. */
  private[graft] def storeVersion(spark: SparkSession, path: String): String =
    fsFingerprint(spark, Seq(epochsPath(path)))

  /** The lexical store's PHYSICAL version: fingerprint over every
    * directory a serving read lists (postings, df, epochs, tombstones,
    * docs). Unlike [[storeVersion]] (the result-cache key, deliberately
    * compaction-invariant), this token moves with ANY file change —
    * including compaction's bucket swaps — so the serve layer's
    * optimistic bracket (token before compute == token after ⇒ no
    * mutation landed mid-request) can catch in-flight physical rewrites
    * the committed-epoch snapshot cannot order around. A few listStatus
    * calls, no Spark job. */
  private[graft] def physicalVersion(spark: SparkSession, path: String): String =
    fsFingerprint(spark, Seq(postingsPath(path), dfPath(path),
      epochsPath(path), storeTombstonesPath(path), docsPath(path)))

  /** Every directory a lexical serving read can list — the tracked set
    * for the serve layer's rewrite-detection bracket. */
  private[graft] def physicalPaths(path: String): Seq[String] =
    Seq(postingsPath(path), dfPath(path), epochsPath(path),
      storeTombstonesPath(path), docsPath(path))

  /** RECURSIVE file-level listing of `paths` (regular files only —
    * directory mtimes move on ADDITIVE writes into them and must not
    * count): one entry per file, `relPath#mtime#len`. The serve layer's
    * optimistic bracket compares two of these with SUBSET semantics —
    * "every file the request could have planned still exists unchanged"
    * — so additive mutations (appends/deletes landing NEW epoch files,
    * which the committed-epoch snapshot already isolates) never force a
    * recompute, while a rewrite/removal (compact/rebucket/recell/split
    * installs, or any cross-process writer) still does. */
  private[graft] def fsFileListing(spark: SparkSession,
                                   paths: Seq[String]): Set[String] = {
    val out = scala.collection.mutable.HashSet.empty[String]
    // hidden/staging entries (_temporary, _SUCCESS, .crc, staging dirs)
    // are invisible to every Spark read — a plan never lists them — and
    // an in-flight additive write creates-then-renames them, so tracking
    // them would fail the subset check during every commit window for
    // files no request can read. Judged RELATIVE to the tracked root
    // (round-14 ADVICE fix): judging the absolute path would empty the
    // listing for any store deployed under a dot/underscore ancestor
    // (/data/_warehouse/…, ~/.cache/…), silently disabling the bracket.
    def hiddenRel(rel: String): Boolean =
      rel.split('/').exists(seg => seg.startsWith("_") || seg.startsWith("."))
    paths.foreach { p =>
      val uri = new java.net.URI(p)
      if (uri.getScheme == null || uri.getScheme == "file") {
        // NIO fast path: Hadoop's local listFiles loads per-file
        // permission info (shell-outs) — ~750 ms per store walk measured;
        // BasicFileAttributes stat the same mtime+len in ~1 ms
        val root = java.nio.file.Paths.get(
          if (uri.getScheme == null) p else uri.getPath)
        if (java.nio.file.Files.exists(root)) {
          // walkFileTree, NOT Files.walk (round 14, found by the
          // cross-process ServeMutation probe): hidden subtrees
          // (_temporary staging of a concurrent writer — possibly in
          // ANOTHER process) are skipped WITHOUT descending, and entries
          // that vanish mid-walk (a racing rename/delete inside such a
          // window) are tolerated instead of throwing
          // NoSuchFileException out of the stream — their files were
          // hidden/untracked either way
          import java.nio.file.{FileVisitResult, Files, Path}
          import java.nio.file.attribute.BasicFileAttributes
          Files.walkFileTree(root, new java.nio.file.SimpleFileVisitor[Path] {
            override def preVisitDirectory(d: Path,
                attrs: BasicFileAttributes): FileVisitResult = {
              val rel = root.relativize(d).toString
              if (rel.nonEmpty && hiddenRel(rel)) FileVisitResult.SKIP_SUBTREE
              else FileVisitResult.CONTINUE
            }
            override def visitFile(f: Path,
                attrs: BasicFileAttributes): FileVisitResult = {
              if (attrs.isRegularFile && !hiddenRel(root.relativize(f).toString))
                out += s"${f.toString}#${attrs.lastModifiedTime.toMillis}#${attrs.size}"
              FileVisitResult.CONTINUE
            }
            override def visitFileFailed(f: Path,
                e: java.io.IOException): FileVisitResult =
              FileVisitResult.CONTINUE // vanished mid-walk: not trackable
          })
        }
      } else {
        val fs = fsFor(spark, p)
        val hp = new org.apache.hadoop.fs.Path(p)
        if (fs.exists(hp)) {
          val rootPath = fs.makeQualified(hp).toUri.getPath.stripSuffix("/")
          val it = fs.listFiles(hp, true)
          while (it.hasNext) {
            val st = it.next()
            val abs = st.getPath.toUri.getPath
            val rel = if (abs.startsWith(rootPath + "/"))
              abs.substring(rootPath.length + 1) else abs
            if (!hiddenRel(rel))
              out += s"$abs#${st.getModificationTime}#${st.getLen}"
          }
        }
      }
    }
    out.toSet
  }

  /** Migration guard for MUTATIONS onto stores written before the
    * doc-set-signature epochs schema (id_hash_delta) and, for appends,
    * before positional postings (pos). Landing new-schema rows beside
    * old ones would not fail — it would be silently wrong: the epochs
    * fold reads old rows' hashes as null, so the live-set signature the
    * BM25F field-complete gate compares can false-pass AND false-fail;
    * mixed postings read old rows' pos as null, so pre-positional docs
    * vanish from phrase/proximity/snippet instead of erroring. Rebuild
    * (writeBm25Store) is the migration — rebucket cannot migrate past
    * the signature (it reads the fold itself via
    * [[liveStatsAndBuckets]], which carries the same check). Schema-only
    * reads (parquet footers), no data jobs. */
  private def requireCurrentSchema(spark: SparkSession, path: String,
                                   op: String, checkPos: Boolean): Unit = {
    if (!spark.read.parquet(epochsPath(path)).columns.contains("id_hash_delta"))
      throw new IllegalArgumentException(
        s"$op: store $path predates the doc-set-signature schema (epochs " +
          "table has no id_hash_delta column) — new epochs would mix " +
          "signed and unsigned rows and the live doc-set signature would " +
          "be silently wrong. Rebuild the store with writeBm25Store.")
    if (checkPos &&
        !spark.read.parquet(postingsPath(path)).columns.contains("pos"))
      throw new IllegalArgumentException(
        s"$op: store $path predates positional postings (postings have " +
          "no 'pos' column) — appending positional rows would leave a " +
          "mixed store whose pre-positional docs silently vanish from " +
          "phrase/proximity/snippet results instead of erroring. Rebuild " +
          "the store with writeBm25Store.")
  }

  // --------------------------------------------------------------------
  // Raw-TEXT sidecar (`<store>/docs`) — the lexical twin of the IVF-PQ
  // store's `.vectors` sidecar (round 10). Retrieval returns ids; a RAG
  // pipeline needs the passage back, and a retraction pipeline needs the
  // text to pay batch cost — the sidecar closes both without a lake
  // pointer riding the serving call. Contract, mirroring the vector one:
  //  - sidecar = live ids' texts (build initializes with storeDocs=true,
  //    append ALWAYS maintains it when present — the batch has the text
  //    by definition, so there is no bare-append hazard to refuse).
  //  - deletes never touch it: a tombstoned id is unreachable (every
  //    reader inner-joins live candidates); rebucket is the vacuum that
  //    rewrites it to the folded postings' survivors.
  //  - layout (doc_id, text) partitioned by (dbucket, epoch) with
  //    dbucket = pmod(xxhash64(doc_id), nBuckets): reads prune to the
  //    requested ids' literal dbucket list (batch cost), and writes are
  //    per-epoch dynamic overwrites — the SAME idempotent-retry
  //    discipline as the postings (append retries replace, never dup).
  //    A doc re-ingested after a delete has rows at two epochs; readers
  //    take max_by(text, epoch) — the latest ingest wins.
  //  - it lives INSIDE the store directory, so compact/rebucket's
  //    rename-swap installs and recovery carry it with zero extra moves.
  // --------------------------------------------------------------------

  /** True iff the store persists its raw document texts
    * ([[writeBm25Store]] with `storeDocs = true`). */
  def hasDocsSidecar(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new org.apache.hadoop.fs.Path(docsPath(path)))

  private def docsBucketCol(nBuckets: Int): Column =
    pmod(xxhash64(col("doc_id")), lit(nBuckets.toLong))

  private def writeDocsSidecar(batch: DataFrame, textCol: String,
                               idCol: String, path: String, epoch: Long,
                               nBuckets: Int, replaceAll: Boolean): Unit = {
    val w = batch
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .dropDuplicates("doc_id")
      .withColumn("dbucket", docsBucketCol(nBuckets))
      .withColumn("epoch", lit(epoch))
      .repartition(col("dbucket")) // co-locate: one file per dbucket
      .write.mode("overwrite").partitionBy("dbucket", "epoch")
    // mode pinned per-write in both branches — see writeDfDelta
    w.option("partitionOverwriteMode", if (replaceAll) "static" else "dynamic")
      .parquet(docsPath(path))
  }

  /** Texts of the requested LIVE ids from the store's own sidecar, at
    * batch cost: the ids' dbucket hashes become a literal partition
    * filter (planning metadata — ≤ min(|ids|, nBuckets) longs on the
    * driver), the id set broadcasts, and a doc re-ingested after a
    * delete resolves to its LATEST epoch's text. Caller passes live ids
    * (serving shortlists are live by construction; the delete path
    * anti-joins tombstones before calling). Fails loudly without a
    * sidecar. */
  def readStoreDocs(spark: SparkSession, path: String,
                    ids: DataFrame): DataFrame = {
    require(hasDocsSidecar(spark, path),
      s"store $path has no raw-text sidecar (${docsPath(path)} missing) — " +
        "build it with writeBm25Store(..., storeDocs = true)")
    readStoreDocsAt(spark, path, ids, readMeta(spark, path))
  }

  /** [[readStoreDocs]] with the bucket geometry already in hand (the
    * delete path read the epochs table for it anyway). */
  private def readStoreDocsAt(spark: SparkSession, path: String,
                              ids: DataFrame, nBuckets: Int): DataFrame = {
    val want = ids.select(col(ids.columns.head).as("doc_id")).distinct()
    val buckets = want.select(docsBucketCol(nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    DriverPlan.memoRelation(spark, s"docs#$path#" +
        fsFingerprint(spark, Seq(docsPath(path), epochsPath(path))))(
        spark.read.parquet(docsPath(path)))
      .filter(col("dbucket").isInCollection(buckets))
      .join(broadcast(want), Seq("doc_id"), "leftsemi")
      .groupBy("doc_id").agg(expr("max_by(text, epoch)").as("text"))
  }

  /** The snippet window fragment, dialect-parametric so the qx121 oracle
    * evaluates the SAME string: a fixed-width (2·window+1)-token slice of
    * `toks` starting at max(1, anchor − window), joined with spaces. */
  def snippetSql(toks: String, anchor: String, window: Int)
                (implicit d: graft.functions.Dialect): String =
    d.ajoin(d.slice(toks, s"greatest(1, ($anchor) - $window)",
      2 * window + 1), "' '")

  /** Refuse to mutate a store carrying a leftover `compact-bak` from an
    * interrupted compaction. In that state some bucket directories have
    * been MOVED OUT of postings/ — an append would re-derive df deltas
    * against a postings set missing live buckets, and a rebucket would
    * fold that incomplete set into a fresh epoch 0, permanently losing
    * the backed-up rows while the folded scalars (from liveStats) still
    * count them. compactBm25Store has carried this guard since v2; every
    * other mutator gets the same refusal so no path can compound the
    * damage before [[recoverBm25Compaction]] restores the buckets. */
  private def requireNoCompactBak(fs: org.apache.hadoop.fs.FileSystem,
                                  path: String, op: String): Unit = {
    val bak = new org.apache.hadoop.fs.Path(compactBakPath(path))
    if (fs.exists(bak))
      throw new java.io.IOException(
        s"refusing to $op $path: backup $bak exists from an interrupted " +
          "compaction — run Retrieval.recoverBm25Compaction first")
  }

  /** Live corpus scalars + doc-set signature + bucket geometry in ONE
    * tiny read: the exact integer sum of the per-epoch deltas, the XOR
    * fold of the per-epoch id-hash deltas (= XOR of xxhash64 over the
    * LIVE doc ids — appends XOR ids in, deletes XOR the same hashes
    * back out), and the constant n_buckets. The signature identifies
    * the live document SET, not just its size: two stores agree on it
    * iff they hold the same ids (up to a 2⁻⁶⁴ hash collision). */
  private[graft] def liveStatsAndBuckets(spark: SparkSession, path: String)
      : (Long, Long, Long, Int) = {
    val i = epochsInfo(spark, path)
    i.idHash match {
      case Some(h) => (i.nDocs, i.totalLen, h, i.nBuckets)
      case None => throw new IllegalArgumentException(
        s"store $path predates the doc-set-signature schema (epochs table " +
          "has no id_hash_delta column) — rebuild the store with " +
          "writeBm25Store (rebucket reads the signature fold itself and " +
          "cannot migrate past this)")
    }
  }

  /** Live corpus scalars, derived on read: the exact integer sum of the
    * per-epoch deltas. 1 row (n_docs, total_len). */
  def liveStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(epochsPath(path))
      .agg(coalesce(sum("n_docs_delta"), lit(0L)).as("n_docs"),
        coalesce(sum("total_len_delta"), lit(0L)).as("total_len"))

  // Driver-side memo of BOUNDED tombstone sets, keyed by the tombstones
  // directory's fingerprint (one listStatus — no job): serving anti-joins
  // broadcast the retracted-id set anyway, so holding the same rows in
  // the memo costs nothing extra, and serving them as a LocalRelation
  // makes the broadcast build jobless. A landed delete/compaction changes
  // the fingerprint, so entries are superseded, never stale. Oversized
  // sets (> 64k ids) stay distributed.
  private val tombMemo = new DriverPlan.TableMemo(maxEntries = 64, maxRows = 65536)

  /** The postings relation for SERVING reads, resolution (schema
    * inference + leaf listing — two per-request scheduling barriers)
    * memoized by the postings+epochs fingerprint: postings-root child
    * mtimes catch appends/compaction/rebucket; the epochs fingerprint
    * additionally catches a RETRIED append that only replaced part files
    * inside an existing bucket/epoch directory (the bucket dir's mtime
    * does not move, but the epoch row rewrite does). */
  private def servingPostings(spark: SparkSession, path: String): DataFrame =
    DriverPlan.memoRelation(spark, s"post#$path#" +
      fsFingerprint(spark, Seq(postingsPath(path), epochsPath(path))))(
      spark.read.parquet(postingsPath(path)))

  /** The df sidecar relation for SERVING reads — same memo discipline as
    * [[servingPostings]] (df deltas land bucket/epoch-partitioned too). */
  private def servingDf(spark: SparkSession, path: String): DataFrame =
    DriverPlan.memoRelation(spark, s"df#$path#" +
      fsFingerprint(spark, Seq(dfPath(path), epochsPath(path))))(
      spark.read.parquet(dfPath(path)))

  /** The COMMITTED retracted-doc set for SERVING reads: tombstone rows
    * of epochs the commit log carries (an in-flight or crashed delete's
    * tombstones are invisible until its epochs row lands — the uniform
    * commit rule, see [[epochsInfo]]); an empty LocalRelation when no
    * tombstones exist, the fingerprint-memoized LocalRelation twin when
    * bounded, the distributed read otherwise. */
  private def servingTombstones(spark: SparkSession, path: String,
                                docIdField: org.apache.spark.sql.types.StructField): DataFrame = {
    val fs = fsFor(spark, path)
    val tp = new org.apache.hadoop.fs.Path(storeTombstonesPath(path))
    if (!hasTombstoneData(fs, path))
      DriverPlan.localFrame(spark, Seq.empty,
        org.apache.spark.sql.types.StructType(Seq(docIdField.copy(name = "doc_id"))))
    else {
      val committed = epochRows(spark, path).map(_.epoch).filter(_ < 0)
      tombMemo.localized(spark,
        fsFingerprint(spark, Seq(storeTombstonesPath(path), epochsPath(path))))(
        spark.read.parquet(tp.toString)
          .filter(col("epoch").isInCollection(committed))
          .select("doc_id").distinct())
    }
  }

  /** The standing COMMITTED retracted-doc set (distinct, across all
    * delete epochs whose commit row landed); empty frame with the
    * store's doc_id type when none. */
  def readBm25Tombstones(spark: SparkSession, path: String): DataFrame =
    servingTombstones(spark, path,
      servingPostings(spark, path).schema.apply("doc_id"))

  /** Tombstones from every epoch EXCEPT `storedEpoch` — the prior-set a
    * delete de-duplicates against. Excluding the current epoch is what
    * makes delete retries converge: a crashed delete's own half-written
    * epoch must not hide its ids from the rerun. */
  private def priorTombstones(spark: SparkSession, path: String,
                              storedEpoch: Long): DataFrame = {
    val fs = fsFor(spark, path)
    val tp = new org.apache.hadoop.fs.Path(storeTombstonesPath(path))
    if (hasTombstoneData(fs, path)) {
      // COMMITTED prior deletes only: another delete's crashed (row-less)
      // tombstones must not hide its ids from this one — treating them
      // as live re-derives their deltas here, and the crashed epoch's
      // own retry then skips them (they are committed by us), so nothing
      // double-decrements
      val committed = epochRows(spark, path).map(_.epoch)
        .filter(e => e < 0 && e != storedEpoch)
      spark.read.parquet(tp.toString)
        .filter(col("epoch").isInCollection(committed))
        .select("doc_id").distinct()
    } else readBm25Tombstones(spark, path) // empty frame w/ correct type
  }

  /** Write one epoch's per-term df DELTA rows: `counted` is a
    * (bucket, term, cnt) frame — the batch census's term counts on
    * append, the deleted docs' negated postings counts on delete. A
    * dynamic overwrite of (bucket, epoch) partitions: deterministically
    * derived, so a retry with the same epoch replaces, never
    * double-counts. `replaceAll` at build truncates stale epochs. */
  private def writeDfDelta(counted: DataFrame, path: String, epoch: Long,
                           replaceAll: Boolean): Unit = {
    val w = counted.withColumn("epoch", lit(epoch))
      .repartition(col("bucket")) // co-locate: one file per bucket, not one per task
      .write.mode("overwrite").partitionBy("bucket", "epoch")
    // the mode is pinned per-write in BOTH branches: replaceAll must
    // truncate stale epochs even under a session (GraftSession.create)
    // whose default partitionOverwriteMode is dynamic
    w.option("partitionOverwriteMode", if (replaceAll) "static" else "dynamic")
      .parquet(dfPath(path))
  }

  /** One scalar-delta epoch row (n_buckets rides along — constant per
    * store). `idHashDelta` is the XOR of xxhash64 over the epoch's doc
    * ids — the SAME value whether the epoch adds or retracts them (XOR
    * is self-inverse), so the fold-by-XOR of all epochs is always the
    * live doc-set signature. Static `overwrite=false` callers use
    * dynamic overwrite (replace this epoch only); the build replaces
    * the whole table. */
  private def writeEpochDelta(spark: SparkSession, path: String, epoch: Long,
                              nDocsDelta: Long, totalLenDelta: Long,
                              idHashDelta: Long,
                              nBuckets: Int, replaceAll: Boolean): Unit = {
    import spark.implicits._
    val w = Seq((epoch, nDocsDelta, totalLenDelta, idHashDelta, nBuckets))
      .toDF("epoch", "n_docs_delta", "total_len_delta", "id_hash_delta",
        "n_buckets")
      .coalesce(1).write.mode("overwrite").partitionBy("epoch")
    // pinned per-write in both branches — see writeDfDelta
    w.option("partitionOverwriteMode", if (replaceAll) "static" else "dynamic")
      .parquet(epochsPath(path))
  }

  /** Corpus scalars OF ONE WRITTEN EPOCH, derived from its postings
    * partitions (epoch-pruned, column-pruned read — never a second
    * tokenize of the batch): n_docs = docs with ≥1 posting, total_len =
    * Σ per-doc dl (dl repeats on every posting row of a doc). Docs whose
    * text tokenized empty have no postings and correctly don't count. */
  private def epochScalars(spark: SparkSession, path: String,
                           epoch: Long): (Long, Long, Long) = {
    val r = spark.read.parquet(postingsPath(path))
      .filter(col("epoch") === epoch)
      .groupBy("doc_id").agg(max("dl").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum("dl"), lit(0L)).as("total_len"),
        coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("id_hash"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Build + persist the inverted index as epoch 0. Postings land in
    * `graft_polyhash(term) % nBuckets` partitions, so a query's
    * candidate postings are a LITERAL partition filter at search time —
    * the store serves keyword queries at pruned-scan cost, the same
    * file-skipping shape as the IVF store's probed cells. The per-term
    * df census is persisted beside them (epoch-0 delta rows, from one
    * column-pruned read-back of the written postings — never a second
    * tokenize), so serving never re-aggregates postings. */
  def writeBm25Store(corpus: DataFrame, textCol: String, idCol: String,
                     path: String, nBuckets: Int = 64,
                     storeDocs: Boolean = false): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val spark = corpus.sparkSession
    graft.sources.StoreLock.withLock(spark, path, "bm25-build") {
      // raw-text sidecar FIRST (postings-visible ⇒ text present — the
      // same append ordering discipline the vector sidecar uses), or
      // cleared: a rebuild without storeDocs must not leave a prior
      // life's sidecar serving stale passages
      if (storeDocs)
        writeDocsSidecar(corpus, textCol, idCol, path, 0L, nBuckets,
          replaceAll = true)
      else
        fsFor(spark, path).delete(
          new org.apache.hadoop.fs.Path(docsPath(path)), true)
      // repartition by bucket before the partitionBy write: without it
      // every census task drops a file into every bucket dir (tasks ×
      // buckets tiny files — listing/footer cost on every later read);
      // with it each bucket's postings co-locate into few files. At
      // cluster scale pair with spark.sql.files.maxRecordsPerFile to
      // bound file size; bucket skew re-splits under AQE.
      // The static mode is pinned per-write: rebuilding over an existing
      // path must TRUNCATE all stale epochs even under a session
      // (GraftSession.create) whose default overwrite mode is dynamic —
      // a dynamic rebuild would keep old epoch>=1 partitions, so
      // liveStats would sum stale deltas and serving would resurrect
      // retired docs.
      bm25IndexPositional(corpus, textCol, idCol)
        .withColumn("bucket", bucketCol(nBuckets))
        .withColumn("epoch", lit(0L))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket", "epoch")
        .option("partitionOverwriteMode", "static")
        .parquet(postingsPath(path))
      writeDfDelta(spark.read.parquet(postingsPath(path))
          .groupBy(col("bucket").cast("long").as("bucket"), col("term"))
          .agg(count(lit(1)).as("cnt")),
        path, 0L, replaceAll = true)
      val (nd, tl, ih) = epochScalars(spark, path, 0L)
      writeEpochDelta(spark, path, 0L, nd, tl, ih, nBuckets, replaceAll = true)
      // A rebuild is a NEW store at an old address: clear every piece of
      // prior-life state, not just tombstones. A stale _graft_stream_id
      // would pin the fresh store to a dead stream's checkpoint (a new
      // stream adoption gets refused with a misleading identity error),
      // and leftover compact-bak/compact-new debris would make the next
      // compaction refuse a store that was never interrupted.
      val fs = fsFor(spark, path)
      fs.delete(new org.apache.hadoop.fs.Path(storeTombstonesPath(path)), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        path.stripSuffix("/") + "/_graft_stream_id"), false)
      fs.delete(new org.apache.hadoop.fs.Path(compactBakPath(path)), true)
      fs.delete(new org.apache.hadoop.fs.Path(compactNewPath(path)), true)
    }
  }

  /** Grow the store at batch cost: census only the new docs, land their
    * postings under `epoch` via dynamic partition overwrite (retrying a
    * failed append with the same epoch REPLACES, never duplicates —
    * the same exactly-once discipline as the streaming ingest paths),
    * add the batch's per-term df delta rows, and one scalar-delta epoch
    * row — both derived from an epoch-pruned read-back of the written
    * postings, never a second tokenize. Untouched partitions' files are
    * never rewritten and NOTHING re-reads the standing corpus (the
    * df-delta design exists for exactly this: a materialized live-df
    * census would need the standing buckets re-aggregated per batch).
    * Gate: search-after-append ≡ one-shot store over the union
    * (RetrievalSpec + the qx105 oracle). */
  def appendBm25Store(batch: DataFrame, textCol: String, idCol: String,
                      path: String, epoch: Long): Unit = {
    require(epoch >= 1, s"append epochs start at 1 (0 is the build): $epoch")
    val spark = batch.sparkSession
    graft.sources.StoreLock.withLock(spark, path, "bm25-append") {
      requireNoCompactBak(fsFor(spark, path), path, "append to")
      requireCurrentSchema(spark, path, "appendBm25Store", checkPos = true)
      requireUnfielded(spark, path, "appendBm25Store")
      val nBuckets = readMeta(spark, path)
      // sidecar BEFORE postings (postings-visible ⇒ text present; a
      // crash in between leaves unreachable rows the same-epoch retry
      // replaces)
      if (hasDocsSidecar(spark, path))
        writeDocsSidecar(batch, textCol, idCol, path, epoch, nBuckets,
          replaceAll = false)
      bm25IndexPositional(batch, textCol, idCol)
        .withColumn("bucket", bucketCol(nBuckets))
        .withColumn("epoch", lit(epoch))
        .repartition(col("bucket")) // co-locate (see writeBm25Store)
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy("bucket", "epoch")
        .parquet(postingsPath(path))
      writeDfDelta(spark.read.parquet(postingsPath(path))
          .filter(col("epoch") === epoch)
          .groupBy(col("bucket").cast("long").as("bucket"), col("term"))
          .agg(count(lit(1)).as("cnt")),
        path, epoch, replaceAll = false)
      val (nd, tl, ih) = epochScalars(spark, path, epoch)
      writeEpochDelta(spark, path, epoch, nd, tl, ih, nBuckets,
        replaceAll = false)
    }
  }

  /** Retract documents from the store — the lexical analog of
    * [[Quantize.addTombstones]] + scalar roll-back, mirroring the
    * reference's delete path (data_manager.py:393-424) for the corpus
    * side. Cost: ONE postings scan pruned to (bucket, doc_id, term, dl)
    * with the delete set broadcast, zero bucket rewrites: the present
    * ids land in a tombstone epoch (searches anti-join them), the
    * scalars get a NEGATIVE delta row for exactly those docs, and the
    * df sidecar gets the NEGATED per-term counts of their postings —
    * so summed-on-read df rolls back exactly. Ids absent from the
    * store are no-ops; ids already tombstoned by an earlier epoch are
    * skipped, so nothing is ever double-decremented. Retrying a failed
    * delete with the same epoch converges (all three writes are
    * per-epoch dynamic overwrites of deterministically derived data —
    * the prior-tombstone set deliberately EXCLUDES the current epoch so
    * a crashed attempt's own half-written epoch can't hide its ids from
    * the rerun).
    *
    * Delete epochs are stored NEGATED (`-epoch`): append and stream
    * epochs own the positive space (a stream batch B lands at B+1), and
    * a delete whose epoch number a LATER stream batch happened to reuse
    * would otherwise have its scalar/df delta rows silently REPLACED by
    * that batch's dynamic overwrite — the epoch spaces must be disjoint
    * for the two writers' idempotency tricks to compose. Callers still
    * pass positive epochs; retries of the same delete still converge.
    * Returns the number of docs actually retracted.
    *
    * SCALE NOTE: the derivation scan is column-pruned but store-sized
    * (a doc's terms span arbitrary buckets — partition pruning cannot
    * help a delete). When the caller still has the retracted docs' TEXT
    * (a curation pipeline always does), prefer the text overload below:
    * it recomputes the same deltas at BATCH cost by re-tokenization and
    * never opens the standing postings. */
  def deleteFromBm25Store(spark: SparkSession, path: String,
                          ids: DataFrame, epoch: Long): Long = {
    require(epoch >= 1, s"delete epochs start at 1 (0 is the build): $epoch")
    val storedEpoch = -epoch
    graft.sources.StoreLock.withLock(spark, path, "bm25-delete") {
      requireNoCompactBak(fsFor(spark, path), path, "delete from")
      requireCurrentSchema(spark, path, "deleteFromBm25Store", checkPos = false)
      requireUnfielded(spark, path, "deleteFromBm25Store")
      val want = ids.select(col(ids.columns.head).as("doc_id")).distinct()
      val newIds = want.join(
        broadcast(priorTombstones(spark, path, storedEpoch)),
        Seq("doc_id"), "left_anti")
      // COMMITTED SNAPSHOT fence (round 13): every derivation scan below
      // filters to the committed epoch set, exactly like the serving
      // reads and rebucket. Without it, deleting an id present ONLY in a
      // crashed append's orphan postings would derive -df/-n_docs/id-hash
      // deltas for a doc the committed log never counted — permanently
      // understating stats (and driving shared terms' df negative) unless
      // that append were later retried. With the fence the delete sees
      // exactly what committed readers see: orphan-only ids no-op.
      val committedPost = epochsInfo(spark, path).epochs.filter(_ >= 0)
      // AUTO-ROUTE (round 10): a store carrying the raw-text sidecar
      // serves its own O(batch) delete — texts of the retracted ids read
      // behind their literal dbucket filter, deltas from re-tokenization,
      // the standing postings touched only by the pruned LIVENESS PROBE
      // below. RetrievalSpec cross-gates this route against the scan
      // path, store state for store state, including the
      // delete→compact→re-delete sequence.
      val hits = (if (hasDocsSidecar(spark, path)) {
        val nBuckets = readMeta(spark, path)
        val texts = readStoreDocsAt(spark, path, newIds, nBuckets)
        val census = bm25Index(texts, "text", "doc_id")
          .withColumn("bucket", bucketCol(nBuckets))
          .localCheckpoint() // batch-sized; reused by the probe + deltas
        // LIVENESS PROBE — deletes never touch the sidecar, and though
        // compact and rebucket both vacuum retracted texts out of it,
        // the sidecar-⊇-live invariant is only eventually maintained
        // (a compact that crashed mid-vacuum leaves stale texts behind
        // standing tombstones). Re-deleting a retracted id must be a
        // no-op, exactly like the scan path: without this check a
        // stale text would re-derive deltas and double-decrement
        // df/n_docs/total_len (and corrupt the id_hash signature). A
        // doc's postings land and vanish ATOMICALLY across its terms
        // (append writes them in one epoch, delete tombstones the doc,
        // compact purges the doc), so ONE deterministic bucket per doc
        // decides liveness: probe each candidate's MIN term bucket —
        // ≤|batch| literal partitions, a (bucket, doc_id) column-pruned
        // read, never the store.
        val probeBuckets = census.groupBy("doc_id")
          .agg(min(col("bucket")).as("b"))
          .select("b").distinct().collect().map(_.getLong(0)).toSeq
        val liveIds = spark.read.parquet(postingsPath(path))
          .filter(col("bucket").isInCollection(probeBuckets) &&
            col("epoch").isInCollection(committedPost))
          .select("doc_id")
          .join(broadcast(newIds), Seq("doc_id"), "leftsemi")
          .distinct()
        census.join(broadcast(liveIds), Seq("doc_id"), "leftsemi")
          .select(col("bucket"), col("doc_id"), col("term"), col("dl"))
      } else {
        spark.read.parquet(postingsPath(path))
          .filter(col("epoch").isInCollection(committedPost))
          .select(col("bucket").cast("long").as("bucket"),
            col("doc_id"), col("term"), col("dl"))
          .join(broadcast(newIds), Seq("doc_id"))
      }).localCheckpoint() // eager: bounded by the deleted docs' postings
      commitBm25Delete(spark, path, hits, storedEpoch)
    }
  }

  /** O(batch) retraction — [[deleteFromBm25Store]] with the deleted docs'
    * TEXT supplied, so the df/scalar deltas come from re-tokenizing the
    * batch instead of scanning the standing postings. The id-only
    * overload's one column-pruned scan is correct but store-sized: a
    * doc's terms span arbitrary buckets, so no partition pruning can
    * help it, and at a 100 TB postings store every retraction batch pays
    * a full narrow scan. A curation pipeline retracting docs always HAS
    * their text (it just decided to drop them) — handing it over makes
    * the delete batch-cost, the exact mirror of the append's
    * never-re-read-the-standing-corpus discipline.
    *
    * CALLER CONTRACT (this is the price of skipping the scan): every
    * supplied doc must be IN the store with exactly this text — the
    * deltas are derived from the text, so a doc that was never ingested
    * (or was ingested with different text) would corrupt df/scalars
    * where the scan path would have no-op'd. Ids already tombstoned by
    * an earlier epoch are still skipped (that guard is metadata-cheap),
    * so delete retries and re-deletes stay safe. Same commit tail,
    * crash contract, and negated epoch space as the scan path —
    * RetrievalSpec cross-gates the two paths' equality, store state for
    * store state. */
  def deleteFromBm25Store(spark: SparkSession, path: String,
                          deletedDocs: DataFrame, textCol: String,
                          idCol: String, epoch: Long): Long = {
    require(epoch >= 1, s"delete epochs start at 1 (0 is the build): $epoch")
    val storedEpoch = -epoch
    graft.sources.StoreLock.withLock(spark, path, "bm25-delete") {
      requireNoCompactBak(fsFor(spark, path), path, "delete from")
      requireCurrentSchema(spark, path, "deleteFromBm25Store", checkPos = false)
      requireUnfielded(spark, path, "deleteFromBm25Store")
      val nBuckets = readMeta(spark, path)
      val newDocs = deletedDocs
        .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
        .dropDuplicates("doc_id")
        .join(broadcast(priorTombstones(spark, path, storedEpoch)),
          Seq("doc_id"), "left_anti")
      // the same census the append wrote for these docs — identical
      // tokenizer, identical (doc, term) row shape, so the negated
      // counts roll back exactly what the ingest added
      val hits = bm25Index(newDocs, "__text", "doc_id")
        .withColumn("bucket", bucketCol(nBuckets))
        .select(col("bucket"), col("doc_id"), col("term"), col("dl"))
        .localCheckpoint() // eager: batch-sized
      commitBm25Delete(spark, path, hits, storedEpoch)
    }
  }

  /** The delete's shared commit tail over the doomed postings census
    * (bucket, doc_id, term, dl) — one row per live (doc, term) pair of
    * the retracted docs, derived from the postings scan (id-only path)
    * or from re-tokenization (text path): the two cannot drift. */
  private def commitBm25Delete(spark: SparkSession, path: String,
                               hits: DataFrame, storedEpoch: Long): Long = {
    val perDoc = hits.groupBy("doc_id").agg(max("dl").as("dl"))
    val stats = perDoc
      .agg(count(lit(1)).as("nd"), coalesce(sum("dl"), lit(0L)).as("tl"),
        coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("ih"))
      .collect().head
    val (nd, tl) = (stats.getLong(0), stats.getLong(1))
    // XOR is self-inverse: the delete's id-hash delta is the XOR of the
    // retracted ids' hashes UN-negated — folding it with the epochs that
    // added those docs cancels them out of the live signature
    val ih = stats.getLong(2)
    if (nd == 0L) 0L
    else {
      // Write order is the crash contract (round 12, uniform commit
      // rule): df deltas → tombstones → THE EPOCHS ROW LAST. The epochs
      // row is every mutation's commit point, so readers folding the
      // committed snapshot (epochsInfo) never see this delete's deltas
      // OR its tombstones until all of it is on disk — no torn window,
      // and the serve layer's logical cache token (the epochs-table
      // fingerprint) moves exactly when answers can. Crash convergence:
      // a crashed attempt's row-less df/tombstone partitions are
      // invisible to serving AND to compaction (which purges only
      // COMMITTED tombstones — the round-10 poison state of a compact
      // swallowing a half-landed delete cannot recur), and the
      // same-epoch retry still sees the doomed postings, re-derives
      // identical deltas, and dynamically overwrites its own
      // partitions: convergent from every crash point.
      writeDfDelta(hits.groupBy("bucket", "term")
          .agg((-count(lit(1))).as("cnt")),
        path, storedEpoch, replaceAll = false)
      perDoc.select("doc_id").withColumn("epoch", lit(storedEpoch))
        .coalesce(1).write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy("epoch")
        .parquet(storeTombstonesPath(path))
      writeEpochDelta(spark, path, storedEpoch, -nd, -tl, ih,
        readMeta(spark, path), replaceAll = false)
      nd
    }
  }

  /** Physically remove tombstoned postings, rewriting ONLY the buckets
    * that contain them — the maintenance step that bounds the dead-row
    * fraction, mirroring [[Quantize.deleteFromIvfPqIndex]]'s
    * surgery-plus-rename-swap discipline. Because a bucket can be far
    * larger than an IVF cell, survivors are WRITTEN TO A SIBLING first
    * (`compact-new`) and the swap is pure directory renames — no
    * bucket's rows are ever held in memory. Crash at any point is
    * recoverable: before the swap nothing moved; during it the backup
    * (`compact-bak`) is the marker [[recoverBm25Compaction]] restores
    * from; after it the remaining tombstones match no postings (their
    * docs are gone), so searches stay exact and re-running converges by
    * just clearing them. The df deltas and the scalar epochs are NOT
    * touched: both already sum to the live corpus (the delete wrote
    * their negative rows) — compaction only moves the filtering cost,
    * never the answer.
    *
    * The raw-text sidecar is VACUUMED in the same window (strictly
    * BEFORE the tombstones clear): serving's include_text guard
    * anti-joins exactly these tombstones, so the purged ids' texts must
    * leave the sidecar when the tombstones do — otherwise a doc
    * retracted from the lex store but still answered by the vector leg
    * would be served its retracted full text the moment compaction
    * empties the guard. Batch-cost: the tombstoned ids' dbuckets prune
    * the sidecar read, only (dbucket, epoch) partitions holding a
    * doomed row are rewritten (dynamic overwrite), and a partition left
    * EMPTY by the purge is deleted explicitly (dynamic overwrite never
    * touches a partition absent from its output). Crash anywhere leaves
    * the tombstones standing — the guard holds and the retry re-vacuums
    * to a no-op.
    * Returns the number of posting rows removed. */
  def compactBm25Store(spark: SparkSession, path: String): Long =
    graft.sources.StoreLock.withLock(spark, path, "bm25-compact") {
      val fs = fsFor(spark, path)
      requireNoCompactBak(fs, path, "compact")
      val bak = new org.apache.hadoop.fs.Path(compactBakPath(path))
      val tp = new org.apache.hadoop.fs.Path(storeTombstonesPath(path))
      if (!hasTombstoneData(fs, path)) 0L
      else {
      val tomb = readBm25Tombstones(spark, path)
      val hits = spark.read.parquet(postingsPath(path))
        .select(col("bucket").cast("long").as("bucket"), col("doc_id"))
        .join(broadcast(tomb), Seq("doc_id"), "leftsemi")
        .groupBy("bucket").agg(count(lit(1)).as("doomed"))
        .collect()
      val affected = hits.map(_.getLong(0)).toSeq
      val removed = hits.map(_.getLong(1)).sum
      if (affected.nonEmpty) {
        val tmp = new org.apache.hadoop.fs.Path(compactNewPath(path))
        fs.delete(tmp, true)
        // Survivors of the affected buckets (all epochs), written beside
        // the store: the main postings stay intact and serving-correct
        // until the rename swap below.
        spark.read.parquet(postingsPath(path))
          .filter(col("bucket").isInCollection(affected))
          .join(broadcast(tomb), Seq("doc_id"), "left_anti")
          .repartition(col("bucket")) // co-locate (see writeBm25Store)
          .write.mode("overwrite").partitionBy("bucket", "epoch")
          .parquet(tmp.toString)
        val root = new org.apache.hadoop.fs.Path(postingsPath(path))
        // INSTALL window: reader-visible renames only (the survivor write
        // above ran in the sibling) — in-flight serving reads drain first
        graft.sources.StoreGate.writeLocked(path) {
          fs.mkdirs(bak)
          affected.foreach { b =>
            val dir = new org.apache.hadoop.fs.Path(root, s"bucket=$b")
            if (fs.exists(dir) && !fs.rename(dir,
                new org.apache.hadoop.fs.Path(bak, s"bucket=$b")))
              throw new java.io.IOException(
                s"compact swap failed moving bucket $b to $bak — " +
                  "run Retrieval.recoverBm25Compaction to restore")
          }
          fs.listStatus(tmp).filter(st => st.isDirectory &&
              st.getPath.getName.startsWith("bucket=")).foreach { st =>
            if (!fs.rename(st.getPath,
                new org.apache.hadoop.fs.Path(root, st.getPath.getName)))
              throw new java.io.IOException(
                s"compact swap failed installing ${st.getPath.getName} — " +
                  "run Retrieval.recoverBm25Compaction to restore")
          }
          if (!fs.delete(bak, true))
            throw new java.io.IOException(s"failed to remove compact backup $bak")
          fs.delete(tmp, true)
        }
      }
      // Sidecar vacuum — see the scaladoc. Unconditional on `affected`
      // (a retry after a crash that already swapped the postings finds
      // no doomed postings but may still find doomed texts), and
      // strictly before the tombstone clear below.
      if (hasDocsSidecar(spark, path)) {
        val nBuckets = readMeta(spark, path)
        val tombBuckets = tomb.select(docsBucketCol(nBuckets).as("b"))
          .distinct().collect().map(_.getLong(0)).toSeq
        if (tombBuckets.nonEmpty) {
          val pruned = spark.read.parquet(docsPath(path))
            .filter(col("dbucket").isInCollection(tombBuckets))
          val doomedParts = pruned
            .join(broadcast(tomb), Seq("doc_id"), "leftsemi")
            .select(col("dbucket").cast("long"), col("epoch").cast("long"))
            .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
          if (doomedParts.nonEmpty) {
            // survivors of the doomed partitions, lineage cut before the
            // overwrite reads-from-writes-to the same path
            val survivors = pruned.filter(doomedParts.map { case (b, e) =>
                col("dbucket") === b && col("epoch") === e }.reduce(_ || _))
              .join(broadcast(tomb), Seq("doc_id"), "left_anti")
              .select("doc_id", "text", "dbucket", "epoch")
              .localCheckpoint()
            val kept = survivors
              .select(col("dbucket").cast("long"), col("epoch").cast("long"))
              .distinct().collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
            graft.sources.StoreGate.writeLocked(path) {
              if (kept.nonEmpty)
                survivors.repartition(col("dbucket"))
                  .write.mode("overwrite").partitionBy("dbucket", "epoch")
                  // mode pinned per-write in both branches — see writeDfDelta
                  .option("partitionOverwriteMode", "dynamic")
                  .parquet(docsPath(path))
              doomedParts.filterNot(kept).foreach { case (b, e) =>
                fs.delete(new org.apache.hadoop.fs.Path(
                  docsPath(path) + s"/dbucket=$b/epoch=$e"), true)
              }
            }
          }
        }
      }
      // Last: retire the COMMITTED tombstones their postings no longer
      // exist for — partition by partition, so a crashed delete's
      // row-less tombstone partition (invisible to every reader, owned
      // by that delete's retry) survives untouched. A crash before this
      // line leaves committed tombstones as harmless no-op filters.
      // (Between the gated windows the store is consistent: purged
      // postings + standing tombstones double-filter to the same answer.)
      val committedNeg = epochRows(spark, path).map(_.epoch).filter(_ < 0)
      graft.sources.StoreGate.writeLocked(path) {
        committedNeg.foreach { e =>
          fs.delete(new org.apache.hadoop.fs.Path(tp, s"epoch=$e"), true)
        }
        if (fs.exists(tp) && fs.listStatus(tp).isEmpty) fs.delete(tp, true)
      }
      removed
      }
    }

  /** Restore a store from an interrupted [[compactBm25Store]]: every
    * bucket directory in `compact-bak` replaces its (possibly missing
    * or half-installed) counterpart, returning the postings to their
    * exact pre-compaction state — tombstones were still standing, so
    * searches were correct throughout. Re-run the compaction after.
    * Returns true when a backup existed and was restored. */
  def recoverBm25Compaction(spark: SparkSession, path: String): Boolean = {
    val fs = fsFor(spark, path)
    val bak = new org.apache.hadoop.fs.Path(compactBakPath(path))
    if (!fs.exists(bak)) return false
    val root = new org.apache.hadoop.fs.Path(postingsPath(path))
    fs.listStatus(bak).foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(root, st.getPath.getName)
      if (fs.exists(dst) && !fs.delete(dst, true))
        throw new java.io.IOException(s"recover: failed to clear $dst")
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(s"recover: failed to restore $dst")
    }
    if (!fs.delete(bak, true))
      throw new java.io.IOException(s"recover: failed to remove $bak")
    fs.delete(new org.apache.hadoop.fs.Path(compactNewPath(path)), true)
    true
  }

  /** Rewrite the store at a new bucket count — the escape hatch for a
    * store whose sustained appends have outgrown its build-time bucket
    * geometry (fat buckets → coarse pruning), without losing the append
    * history: the lexical analog of [[Quantize.compactIvfPqIndex]]'s
    * full-rebalance role. Rebucketing at the SAME count is the store's
    * epoch-fold DEFRAG: a long-lived stream-fed store accumulates one
    * (bucket, epoch) directory per micro-batch, and folding them back to
    * epoch 0 collapses the file/listing overhead in one maintenance
    * window. The stream marker survives the swap so ingest can resume —
    * but the stream must be STOPPED with its last batch COMMITTED to
    * the checkpoint first: folding voids per-epoch replay idempotency,
    * so an uncommitted batch replayed after the fold would double-land
    * (the in-body comment states the hazard precisely). One full-store pass by design: live postings
    * (tombstones dropped) re-hash into `newBuckets` partitions folded to
    * epoch 0, df and meta are rebuilt, and the scalar epochs fold to one
    * row of the current live totals. The new store is built COMPLETE at
    * a sibling path, then installed by two renames behind a backup
    * marker — [[recoverBm25Rebucket]] resolves any crash, and the live
    * store serves unchanged until the swap instant. Gate (RetrievalSpec):
    * search-after-rebucket ≡ before, at the asked bucket count. */
  def rebucketBm25Store(spark: SparkSession, path: String,
                        newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1: $newBuckets")
    requireUnfielded(spark, path, "rebucketBm25Store")
    graft.sources.StoreLock.withLock(spark, path, "bm25-rebucket") {
      GraftFunctions.register(spark)
      val fs = fsFor(spark, path)
      requireNoCompactBak(fs, path, "rebucket")
      val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".rebucket-bak")
      if (fs.exists(bak))
        throw new java.io.IOException(
          s"refusing to rebucket $path: backup $bak exists from an " +
            "interrupted rebucket — run Retrieval.recoverBm25Rebucket first")
      val tmp = path.stripSuffix("/") + ".rebucket-new"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val tomb = readBm25Tombstones(spark, path)
      // fold ONLY the committed snapshot (round 12): a crashed append's
      // orphan postings (rows without their epochs-row commit) must not
      // be folded into epoch 0 while the snapshot-folded scalars below
      // exclude them — that would permanently disagree. The orphans drop
      // out here exactly as serving already ignores them.
      val snap = requireSignature(path, epochsInfo(spark, path))
      val post = spark.read.parquet(postingsPath(path))
        .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      // positions (and any future data column) travel with the row; only
      // the partition bookkeeping is re-derived
      val dataCols = post.columns.filterNot(c => c == "bucket" || c == "epoch")
      post.select(dataCols.map(col).toIndexedSeq: _*)
        .join(broadcast(tomb), Seq("doc_id"), "left_anti")
        .withColumn("bucket", bucketCol(newBuckets))
        .withColumn("epoch", lit(0L))
        .repartition(col("bucket")) // co-locate (see writeBm25Store)
        .write.mode("overwrite").partitionBy("bucket", "epoch")
        .parquet(postingsPath(tmp))
      writeDfDelta(spark.read.parquet(postingsPath(tmp))
          .groupBy(col("bucket").cast("long").as("bucket"), col("term"))
          .agg(count(lit(1)).as("cnt")),
        tmp, 0L, replaceAll = true)
      writeEpochDelta(spark, tmp, 0L, snap.nDocs, snap.totalLen,
        snap.idHash.get, newBuckets, replaceAll = true)
      // raw-text sidecar: rebucket is its VACUUM — rewrite it to exactly
      // the folded postings' survivors (tombstoned docs and any
      // abandoned-epoch orphans drop out), one row per doc at epoch 0,
      // re-hashed to the new dbucket geometry. Deriving the survivor set
      // from the written postings (not the sidecar) keeps the invariant
      // sidecar = live ids exact.
      if (hasDocsSidecar(spark, path)) {
        val survivors = spark.read.parquet(postingsPath(tmp))
          .select("doc_id").distinct()
        val live = spark.read.parquet(docsPath(path))
          .groupBy("doc_id").agg(expr("max_by(text, epoch)").as("text"))
          .join(survivors, Seq("doc_id"), "leftsemi")
        writeDocsSidecar(live, "text", "doc_id", tmp, 0L, newBuckets,
          replaceAll = true)
      }
      // a stream-pinned store keeps its checkpoint identity across the
      // rebucket: the marker travels to the new image, otherwise the
      // next micro-batch would refuse the store. QUIESCENCE CONTRACT
      // (stronger than compaction's): the stream must be STOPPED with
      // its final batch COMMITTED to the checkpoint before rebucketing.
      // Folding epochs to 0 voids the per-epoch replay idempotency — a
      // batch whose append landed but whose checkpoint commit didn't
      // would be REPLAYED after the fold and double-land its docs
      // (its old epoch partition no longer exists to be replaced).
      val marker = new org.apache.hadoop.fs.Path(
        path.stripSuffix("/"), "_graft_stream_id")
      if (fs.exists(marker))
        org.apache.hadoop.fs.FileUtil.copy(fs, marker, fs,
          new org.apache.hadoop.fs.Path(tmp, "_graft_stream_id"),
          false, spark.sparkContext.hadoopConfiguration)
      // Install: old store → backup, new store → path, drop backup —
      // gated so in-flight serving reads drain before the swap.
      val main = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
      graft.sources.StoreGate.writeLocked(path) {
        if (!fs.rename(main, bak))
          throw new java.io.IOException(s"rebucket: failed to move $main aside")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), main))
          throw new java.io.IOException(
            s"rebucket: failed to install $tmp — run recoverBm25Rebucket")
        if (!fs.delete(bak, true))
          throw new java.io.IOException(s"rebucket: failed to remove $bak")
      }
    }
  }

  /** Resolve an interrupted [[rebucketBm25Store]]. If the store path
    * exists the install completed — the backup is just dropped; if it
    * is missing the backup is renamed back. Either way the store is the
    * complete pre- or post-rebucket image, never a mix. Returns true
    * when there was a backup to resolve. */
  def recoverBm25Rebucket(spark: SparkSession, path: String): Boolean = {
    val fs = fsFor(spark, path)
    val main = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
    val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".rebucket-bak")
    if (!fs.exists(bak)) return false
    if (!fs.exists(main) && !fs.rename(bak, main))
      throw new java.io.IOException(s"recover: failed to restore $main from $bak")
    if (fs.exists(main) && fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"recover: failed to remove $bak")
    fs.delete(new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".rebucket-new"), true)
    true
  }

  /** Serve BM25 top-k from the persisted store. The bucket set of the
    * query's terms (≤ min(query-term count, nBuckets) — planning
    * metadata) becomes a literal `bucket IN (...)` partition filter on
    * BOTH pruned reads: the postings candidates AND the df sidecar —
    * no postings-scale aggregation exists anywhere in the serving plan
    * (PlanAuditSpec pins the only term-keyed aggregate onto the df
    * sidecar scan: vocabulary-of-bucket × epochs rows, planning scale).
    * Tombstoned docs are anti-joined off the pruned candidates
    * (broadcast — retraction metadata, not corpus data), and the corpus
    * scalars are the summed epoch deltas, so the result is identical to
    * a store rebuilt without the retracted docs. Identical scoring tail
    * to [[bm25TopK]]. */
  def bm25TopKFromStore(spark: SparkSession, path: String,
                        queries: DataFrame, textCol: String, idCol: String,
                        k: Int, k1: Double = K1, b: Double = B,
                        maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25(spark, path, queries, textCol, idCol, k, k1, b,
      maxQueryTerms, allowed = None)

  /** Metadata-predicated store serving — the lexical twin of the
    * filtered ANN search (qx76): only docs in `allowedDocs` (an id
    * allow-list: ACLs, source filters, freshness windows) may appear in
    * the top-k, enforced BEFORE ranking so the k results are k SURVIVORS,
    * never a post-filtered shorter list. Scoring statistics stay
    * CORPUS-GLOBAL (idf from the full live df, avgdl from the full live
    * scalars) — the standard filtered-retrieval semantics (a Lucene
    * filter query doesn't reweight idf); the filter fences candidates
    * only. The allow-list broadcasts: it is predicate metadata, not
    * corpus data. */
  def bm25TopKFromStoreFiltered(spark: SparkSession, path: String,
                                queries: DataFrame, allowedDocs: DataFrame,
                                textCol: String, idCol: String,
                                k: Int, k1: Double = K1, b: Double = B,
                                maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25(spark, path, queries, textCol, idCol, k, k1, b,
      maxQueryTerms, allowed = Some(allowedDocs))

  /** CONJUNCTIVE (boolean-AND) store serving: only documents matching
    * EVERY query term may rank — the other standard lexical query mode
    * beside [[bm25TopKFromStore]]'s OR semantics. Survivors keep their
    * ordinary BM25 scores (the conjunctive top-k is a subset of the OR
    * ranking with identical values), and the matched-term count falls
    * out of the scoring aggregate the OR path already runs — same
    * pruned scans, ONE extra broadcast of the per-query term counts,
    * zero additional corpus work. */
  def bm25TopKFromStoreConjunctive(spark: SparkSession, path: String,
                                   queries: DataFrame, textCol: String,
                                   idCol: String, k: Int, k1: Double = K1,
                                   b: Double = B,
                                   maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25(spark, path, queries, textCol, idCol, k, k1, b,
      maxQueryTerms, allowed = None, requireAll = true)

  /** [[bm25TopKFromStoreConjunctive]] under an id allow-list (the
    * qx111 fence semantics: candidates only, statistics corpus-global). */
  def bm25TopKFromStoreConjunctiveFiltered(spark: SparkSession, path: String,
                                           queries: DataFrame,
                                           allowedDocs: DataFrame,
                                           textCol: String, idCol: String,
                                           k: Int, k1: Double = K1,
                                           b: Double = B,
                                           maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25(spark, path, queries, textCol, idCol, k, k1, b,
      maxQueryTerms, allowed = Some(allowedDocs), requireAll = true)

  /** [[bm25TopKFromStore]] returning the PASSAGE, not just the id — the
    * serving shape a RAG pipeline actually consumes, deployable from the
    * store path alone (requires the raw-text sidecar,
    * `writeBm25Store(..., storeDocs = true)`). Each hit carries a
    * deterministic snippet: the fixed-width (2·window+1)-token slice of
    * the doc's tokens starting at max(1, anchor − window), where anchor
    * is the FIRST position of any matched query term (min over matched
    * terms of the term's first occurrence — the positional store already
    * persists first positions, so no text re-scan computes anchors).
    *
    * Plan shape: the ranking is [[bm25TopKFromStore]] verbatim (both
    * serving scans behind the literal bucket filter). Anchors read the
    * SAME pruned postings buckets once more selecting (doc_id, term,
    * pos[1]) — k-bounded after the semi-join with the ranked list — and
    * the texts read the sidecar behind the ranked ids' literal dbucket
    * filter. Everything that joins is top-k metadata; no corpus-sized
    * frame moves. */
  def snippetTopKFromStore(spark: SparkSession, path: String,
                           queries: DataFrame, textCol: String, idCol: String,
                           k: Int, window: Int, k1: Double = K1,
                           b: Double = B,
                           maxQueryTerms: Int = Int.MaxValue): DataFrame =
    snippetImpl(spark, path, queries, textCol, idCol, k, window, k1, b,
      maxQueryTerms, allowed = None)

  /** [[snippetTopKFromStore]] under an id allow-list — the ranking is
    * [[bm25TopKFromStoreFiltered]] (candidates fenced before ranking,
    * statistics corpus-global); the snippet assembly is unchanged. */
  def snippetTopKFromStoreFiltered(spark: SparkSession, path: String,
                                   queries: DataFrame, allowedDocs: DataFrame,
                                   textCol: String, idCol: String,
                                   k: Int, window: Int, k1: Double = K1,
                                   b: Double = B,
                                   maxQueryTerms: Int = Int.MaxValue): DataFrame =
    snippetImpl(spark, path, queries, textCol, idCol, k, window, k1, b,
      maxQueryTerms, allowed = Some(allowedDocs))

  private def snippetImpl(spark: SparkSession, path: String,
                          queries: DataFrame, textCol: String, idCol: String,
                          k: Int, window: Int, k1: Double, b: Double,
                          maxQueryTerms: Int,
                          allowed: Option[DataFrame]): DataFrame = {
    require(window >= 0, s"window must be >= 0: $window")
    GraftFunctions.register(spark)
    val queriesL = DriverPlan.localize(queries)
    val ranked = servedBm25(spark, path, queriesL, textCol, idCol,
      k, k1, b, maxQueryTerms, allowed)
      .localCheckpoint() // k-bounded; reused thrice
    val qterms = queryTerms(queriesL, textCol, idCol, maxQueryTerms)
    val snap = requireSignature(path, epochsInfo(spark, path))
    val buckets = termBuckets(qterms, snap.nBuckets.toLong)
    val post = servingPostings(spark, path)
    require(post.columns.contains("pos"),
      s"store $path has no positional postings — it predates the " +
        "positional schema; rebuild (or rebucket) it to enable snippet serving")
    val anchors = post
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      .select(col("doc_id"), col("term"),
        element_at(col("pos"), 1).as("first_pos"))
      .join(broadcast(qterms.select("query_id", "term")), Seq("term"))
      .join(broadcast(ranked.select("query_id", "doc_id")),
        Seq("query_id", "doc_id"), "leftsemi")
      .groupBy("query_id", "doc_id").agg(min("first_pos").as("anchor"))
    val texts = readStoreDocs(spark, path, ranked.select("doc_id"))
    implicit val d: graft.functions.Dialect =
      graft.functions.Dialect(spark = true)
    ranked
      .join(broadcast(anchors), Seq("query_id", "doc_id"))
      .join(broadcast(texts), Seq("doc_id"))
      .withColumn("snippet",
        expr(snippetSql("graft_tokens(text)", "anchor", window)))
      .select("query_id", "rank", "doc_id", "score", "snippet")
  }

  /** Attach snippets to an EXTERNAL k-bounded hit list — the RAG passage
    * fetch for HYBRID/VECTOR rankings (round 11; [[snippetImpl]] covers
    * the lexical ranking, which re-ranks as it snips). The ranking is
    * untouched: every input row comes back with one added `snippet`
    * column. Anchor policy: a hit that also matched lexically anchors at
    * its first matched query-term position (the [[snippetTopKFromStore]]
    * anchor, from the positional postings behind the query terms'
    * literal bucket filter); a hit the lexical leg never matched (pure
    * vector recall) gets the LEADING window (anchor 1) — there is no
    * term to center on, and the document head is the best passage prior.
    * A lexically-RETRACTED doc gets snippet = null, mirroring the
    * include_text tombstone guard: never the stale passage. All joins
    * are k-bounded broadcasts; the only scans are the pruned postings
    * anchors and the hits' literal-dbucket sidecar texts. */
  def attachSnippets(spark: SparkSession, path: String, hits: DataFrame,
                     queries: DataFrame, textCol: String, idCol: String,
                     window: Int,
                     maxQueryTerms: Int = Int.MaxValue): DataFrame = {
    require(window >= 0, s"window must be >= 0: $window")
    requireUnfielded(spark, path, "attachSnippets")
    GraftFunctions.register(spark)
    val h = hits.localCheckpoint() // k-bounded; feeds three joins
    val qterms = queryTerms(queries, textCol, idCol, maxQueryTerms)
    val snap = requireSignature(path, epochsInfo(spark, path))
    val buckets = termBuckets(qterms, snap.nBuckets.toLong)
    val post = servingPostings(spark, path)
    require(post.columns.contains("pos"),
      s"store $path has no positional postings — it predates the " +
        "positional schema; rebuild (or rebucket) it to enable snippet serving")
    val anchors = post
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      .select(col("doc_id"), col("term"),
        element_at(col("pos"), 1).as("first_pos"))
      .join(broadcast(qterms.select("query_id", "term")), Seq("term"))
      .join(broadcast(h.select("query_id", "doc_id")),
        Seq("query_id", "doc_id"), "leftsemi")
      .groupBy("query_id", "doc_id").agg(min("first_pos").as("anchor"))
    val texts = readStoreDocs(spark, path, h.select("doc_id"))
      .join(broadcast(readBm25Tombstones(spark, path)),
        Seq("doc_id"), "left_anti")
    implicit val d: graft.functions.Dialect =
      graft.functions.Dialect(spark = true)
    h.join(broadcast(anchors), Seq("query_id", "doc_id"), "left")
      .join(broadcast(texts), Seq("doc_id"), "left")
      .withColumn("__anchor", coalesce(col("anchor"), lit(1)))
      .withColumn("snippet",
        when(col("text").isNotNull,
          expr(snippetSql("graft_tokens(text)", "__anchor", window))))
      .drop("text", "anchor", "__anchor")
  }

  /** The one serving core (filtered and unfiltered cannot drift): one
    * tiny epochs read yields scalars AND bucket geometry (the scalars
    * become a driver-LOCAL 1-row frame), postings and the df sidecar
    * both read behind the literal bucket filter, tombstones anti-joined,
    * the optional allow-list semi-joined — then the shared scoring
    * tail. */
  private def servedBm25(spark: SparkSession, path: String,
                         queries: DataFrame, textCol: String, idCol: String,
                         k: Int, k1: Double, b: Double, maxQueryTerms: Int,
                         allowed: Option[DataFrame],
                         requireAll: Boolean = false): DataFrame = {
    requireUnfielded(spark, path, "bm25TopKFromStore")
    // one bounded collect localizes a corpus-backed query frame so every
    // planning-scale use below is jobless (DriverPlan.localize doc)
    val queriesL = DriverPlan.localize(queries)
    val snap = requireSignature(path, epochsInfo(spark, path))
    import spark.implicits._
    val stats = Seq((snap.nDocs, snap.totalLen)).toDF("n_docs", "total_len")
    val qterms = queryTerms(queriesL, textCol, idCol, maxQueryTerms)
    val (postings, buckets) =
      servedLivePostings(spark, path, qterms, snap, allowed)
    // live df = summed deltas of the pruned buckets AND the committed
    // snapshot (a half-landed mutation's delta rows are invisible); a
    // term whose count summed to 0 has no live postings either, so it
    // never scores
    val dfreq = servingDf(spark, path)
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs))
      .groupBy("term").agg(sum("cnt").as("df"))
    scoreBm25(postings, qterms, stats, dfreq, k, k1, b, requireAll)
  }

  /** The serving scan every lexical store query class starts from:
    * postings behind the literal `bucket IN` filter of the query terms
    * AND the committed snapshot's `epoch IN` filter (both partition
    * literals — pure pruning), tombstones anti-joined, the optional
    * allow-list semi-joined. Returns the pruned live postings AND the
    * bucket list (the caller's df sidecar read prunes on the same
    * literals plus the same epoch snapshot). */
  private def servedLivePostings(spark: SparkSession, path: String,
                                 qterms: DataFrame, snap: EpochsInfo,
                                 allowed: Option[DataFrame],
                                 cols: Seq[String] =
                                   Seq("doc_id", "term", "tf", "dl"))
      : (DataFrame, Seq[Long]) = {
    val buckets = termBuckets(qterms, snap.nBuckets.toLong)
    val post = servingPostings(spark, path)
    // absent-tombstone case reuses post's already-resolved schema — no
    // second listing of the postings directory
    val tomb = servingTombstones(spark, path, post.schema.apply("doc_id"))
    val live = post
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      .select(cols.head, cols.tail: _*)
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    val out = allowed.fold(live) { a =>
      val ids = a.select(col(a.columns.head).as("doc_id")).distinct()
      live.join(broadcast(ids), Seq("doc_id"), "leftsemi")
    }
    (out, buckets)
  }

  /** One scored field of a STORE-SERVED BM25F corpus: the field's own
    * durable BM25 store (each field indexes, appends, deletes, compacts
    * and rebuckets independently through the ordinary store lifecycle),
    * its weight, and its length-normalization slope. */
  final case class Bm25StoreField(path: String, weight: Double, b: Double = B)

  /** [[bm25fTopK]] served from durable stores — one store per field, so
    * fielded retrieval composes with the whole store lifecycle instead
    * of being a one-shot-only scorer. Serving reads each store behind
    * its own literal `bucket IN` filter (query terms are planning
    * metadata), anti-joins its tombstones, semi-joins the candidates to
    * the query terms, merges the per-field contributions with one
    * (doc, term) exchange, and scores with [[bm25fTopK]]'s exact tail —
    * so a store-served result equals the one-shot over the same fielded
    * corpus, which is what the qx119 oracle (qx118's formula verbatim)
    * gates.
    *
    * df comes from the pruned LIVE postings union (count of docs whose
    * merged wtf > 0), not the per-store df sidecars: fielded df is a
    * cross-field union the sidecars cannot express, and for the scored
    * terms the pruned scan already holds every live posting, so the
    * count is exact and candidate-bounded.
    *
    * Precondition (checked loudly): the stores are FIELD-COMPLETE — the
    * same live document SET in every field store, because BM25F's
    * n_docs and avgdl_f share one document universe. The gate compares
    * each store's live doc-set signature (XOR of xxhash64 over live
    * ids, folded from the epoch scalars — an O(1) read, never a
    * postings scan), so BOTH failure shapes are caught: a partial
    * retraction (even one where counts coincide — doc 3 dropped from
    * titles, doc 4 from bodies) and a doc whose text tokenized EMPTY in
    * one field (it has no postings there, so that store's universe
    * excludes it — BM25F fields must be total: give empty fields a
    * placeholder token or exclude the doc from all fields). Up to a
    * 2⁻⁶⁴ hash collision, a passing gate means one shared universe;
    * failures raise instead of silently reweighting. */
  def bm25fTopKFromStores(spark: SparkSession, fields: Seq[Bm25StoreField],
                          queries: DataFrame, textCol: String, idCol: String,
                          k: Int, k1: Double = K1,
                          maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25f(spark, fields, queries, textCol, idCol, k, k1,
      maxQueryTerms, allowed = None)

  /** [[bm25fTopKFromStores]] with an id allow-list fencing candidates
    * only (corpus-global statistics, the qx111/qx114 filtered-serving
    * semantics). */
  def bm25fTopKFromStoresFiltered(spark: SparkSession,
                                  fields: Seq[Bm25StoreField],
                                  queries: DataFrame, allowedDocs: DataFrame,
                                  textCol: String, idCol: String,
                                  k: Int, k1: Double = K1,
                                  maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25f(spark, fields, queries, textCol, idCol, k, k1,
      maxQueryTerms, allowed = Some(allowedDocs))

  private def servedBm25f(spark: SparkSession, fields: Seq[Bm25StoreField],
                          queries: DataFrame, textCol: String, idCol: String,
                          k: Int, k1: Double, maxQueryTerms: Int,
                          allowed: Option[DataFrame]): DataFrame = {
    require(fields.nonEmpty, "bm25fTopKFromStores needs at least one field")
    GraftFunctions.register(spark)
    import spark.implicits._
    val qterms = queryTerms(DriverPlan.localize(queries), textCol, idCol,
      maxQueryTerms)
    val snaps = fields.map(f => epochsInfo(spark, f.path))
    // (count, set-signature) pairs: counts alone would wave through a
    // SYMMETRIC partial retraction (equal sizes, different members) and
    // the coinciding-counts empty-field case — the signature catches both
    val universes = snaps.map(s => (s.nDocs, s.idHash.getOrElse(
      throw new IllegalArgumentException(
        s"a field store predates the doc-set-signature schema — rebuild " +
          s"with writeBm25Store (stores: ${fields.map(_.path).mkString(", ")})")
    ))).distinct
    require(universes.size == 1,
      s"bm25fTopKFromStores requires field-complete stores (one shared " +
        s"document universe); live (doc count, set signature) differ: " +
        fields.map(_.path).zip(snaps.map(s => (s.nDocs, s.idHash.get)))
          .mkString(", ") +
        " — retract docs from ALL fields or none, and ensure no doc " +
        "tokenizes empty in any field")
    val qtermsOnly = qterms.select("term").distinct()
    // the allow-list is NOT applied to the scan: df must stay
    // corpus-global (the qx111/qx114 filtered-serving semantics — a
    // filter fences candidates, it never reweights idf), so it fences
    // inside the scoring tail instead
    val contribs = fields.zip(snaps).zipWithIndex.map {
      case ((f, snap), i) =>
        val (nd, tl) = (snap.nDocs, snap.totalLen)
        val (live, _) =
          servedLivePostings(spark, f.path, qterms, snap, allowed = None)
        live
          .join(broadcast(qtermsOnly), Seq("term"), "leftsemi")
          .crossJoin(broadcast(Seq((nd, tl)).toDF("n_docs", s"len_$i")))
          .select(col("doc_id"), col("term"),
            expr(bm25fContribSql(f.weight, f.b, s"len_$i")).as("contrib"))
    }.reduce(_ unionByName _)
    val merged = contribs.groupBy("doc_id", "term")
      .agg(sum("contrib").as("wtf"))
    scoreBm25f(merged, qterms, Seq(universes.head._1).toDF("n_docs"), k, k1,
      allowed)
  }

  // --------------------------------------------------------------------
  // FIELDED BM25F store (round 11) — ONE store for all fields, the
  // deployment shape that retires the multi-store form's two structural
  // costs: the field-complete gate (N stores can drift into different
  // doc universes; one store has one universe BY CONSTRUCTION) and the
  // N× serving jobs (one pruned scan answers every field — qx119's
  // serving tail was the suite's largest measured constant precisely
  // because it scaled with the schema's field count).
  //
  // Layout — the standard store with two deltas:
  //  - postings rows carry a `field` index column (bucket hash is still
  //    the TERM only, so all of a term's candidates across fields live
  //    in the same pruned partitions) and `dl` is the doc's FIELD length;
  //  - the epochs table carries `len_deltas` (per-field total-length
  //    deltas, array-typed) and `field_names` beside the standard
  //    columns, so readMeta/the signature fold/the migration guards all
  //    work unchanged;
  //  - NO df sidecar: BM25F's df is a cross-field doc count the served
  //    path derives from the pruned live candidates (term-complete by
  //    bucketing — the same derivation the multi-store path documents).
  // Lifecycle: build/append/delete/rebucket below; compactBm25Store and
  // recoverBm25Compaction/recoverBm25Rebucket are layout-agnostic and
  // shared; the unfielded writers/servers refuse fielded stores loudly
  // (requireUnfielded) and vice versa. The multi-store form stays as the
  // composition proof (independent per-field stores remain a legitimate
  // deployment when fields genuinely live in different pipelines).
  // --------------------------------------------------------------------

  /** Serve-time parameters for one stored field: its build-time name
    * (a text column of [[writeBm25fStore]]'s corpus), the query-time
    * weight, and the per-field length-normalization slope. Weights/b are
    * deliberately NOT store state: ranking can be re-tuned per query
    * without touching the index, exactly like the one-shot
    * [[bm25fTopK]]. */
  final case class Bm25fField(name: String, weight: Double, b: Double = B)

  /** Build the FIELDED store as epoch 0: one positional census per field
    * column (tagged with the field index), unioned into one postings
    * table. Same bucket geometry, debris clearing, and static-overwrite
    * rebuild discipline as [[writeBm25Store]]. */
  def writeBm25fStore(corpus: DataFrame, fieldCols: Seq[String],
                      idCol: String, path: String,
                      nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    require(fieldCols.nonEmpty, "writeBm25fStore needs at least one field")
    require(fieldCols.distinct == fieldCols,
      s"duplicate field columns: ${fieldCols.mkString(", ")}")
    val spark = corpus.sparkSession
    graft.sources.StoreLock.withLock(spark, path, "bm25-build") {
      fieldedCensus(corpus, fieldCols, idCol, nBuckets)
        .withColumn("epoch", lit(0L))
        .repartition(col("bucket")) // co-locate (see writeBm25Store)
        .write.mode("overwrite").partitionBy("bucket", "epoch")
        .option("partitionOverwriteMode", "static")
        .parquet(postingsPath(path))
      writeFieldedEpoch(spark, path, 0L, fieldCols, nBuckets,
        replaceAll = true)
      val fs = fsFor(spark, path)
      fs.delete(new org.apache.hadoop.fs.Path(storeTombstonesPath(path)), true)
      fs.delete(new org.apache.hadoop.fs.Path(docsPath(path)), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        path.stripSuffix("/") + "/_graft_stream_id"), false)
      fs.delete(new org.apache.hadoop.fs.Path(compactBakPath(path)), true)
      fs.delete(new org.apache.hadoop.fs.Path(compactNewPath(path)), true)
    }
  }

  /** Grow the fielded store at batch cost — [[appendBm25Store]]'s
    * discipline (per-epoch dynamic overwrite, idempotent retries,
    * nothing re-reads the standing corpus), for all fields in ONE
    * write. The batch must carry the store's exact field columns. */
  def appendBm25fStore(batch: DataFrame, idCol: String, path: String,
                       epoch: Long): Unit = {
    require(epoch >= 1, s"append epochs start at 1 (0 is the build): $epoch")
    val spark = batch.sparkSession
    graft.sources.StoreLock.withLock(spark, path, "bm25-append") {
      requireNoCompactBak(fsFor(spark, path), path, "append to")
      val info = epochsInfo(spark, path)
      val fieldCols = info.fieldNames.getOrElse(throw new IllegalArgumentException(
        s"appendBm25fStore: store $path is not a fielded store — " +
          "build it with writeBm25fStore (or append with appendBm25Store)"))
      fieldCols.foreach(c => require(batch.columns.contains(c),
        s"appendBm25fStore: batch lacks stored field column '$c' " +
          s"(stored fields: ${fieldCols.mkString(", ")})"))
      fieldedCensus(batch, fieldCols, idCol, info.nBuckets)
        .withColumn("epoch", lit(epoch))
        .repartition(col("bucket"))
        .write.option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").partitionBy("bucket", "epoch")
        .parquet(postingsPath(path))
      writeFieldedEpoch(spark, path, epoch, fieldCols, info.nBuckets,
        replaceAll = false)
    }
  }

  /** Retract documents from the fielded store — [[deleteFromBm25Store]]'s
    * tombstone semantics with the per-field length roll-back the fielded
    * epochs need (one negative `len_deltas` array instead of one scalar).
    * Same negated-epoch space, prior-tombstone skip, tombstones-last
    * crash contract. The derivation scan is column-pruned but
    * store-sized, like the unfielded id-only path. */
  def deleteFromBm25fStore(spark: SparkSession, path: String,
                           ids: DataFrame, epoch: Long): Long = {
    require(epoch >= 1, s"delete epochs start at 1 (0 is the build): $epoch")
    val storedEpoch = -epoch
    graft.sources.StoreLock.withLock(spark, path, "bm25-delete") {
      requireNoCompactBak(fsFor(spark, path), path, "delete from")
      val info = epochsInfo(spark, path)
      val fieldCols = info.fieldNames.getOrElse(throw new IllegalArgumentException(
        s"deleteFromBm25fStore: store $path is not a fielded store"))
      val want = ids.select(col(ids.columns.head).as("doc_id")).distinct()
      val newIds = want.join(
        broadcast(priorTombstones(spark, path, storedEpoch)),
        Seq("doc_id"), "left_anti")
      // committed-snapshot fence, same rationale as the unfielded path:
      // the delta derivation must only see docs the committed log counts
      val hits = spark.read.parquet(postingsPath(path))
        .filter(col("epoch").isInCollection(info.epochs.filter(_ >= 0)))
        .select("doc_id", "field", "dl")
        .join(broadcast(newIds), Seq("doc_id"))
        .groupBy("field", "doc_id").agg(max("dl").as("dl"))
        .localCheckpoint() // bounded by deleted docs × fields
      val docs = hits.select("doc_id").distinct()
        .agg(count(lit(1)).as("nd"),
          coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("ih"))
        .collect().head
      val nd = docs.getLong(0)
      if (nd == 0L) 0L
      else {
        val perField = hits.groupBy("field").agg(sum("dl").as("l"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val negLens = fieldCols.indices.map(i => -perField.getOrElse(i, 0L))
        // tombstones first, THE EPOCHS ROW LAST — the commitBm25Delete
        // uniform-commit contract (the row commits the delete)
        hits.select("doc_id").distinct()
          .withColumn("epoch", lit(storedEpoch))
          .coalesce(1).write.option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").partitionBy("epoch")
          .parquet(storeTombstonesPath(path))
        writeFieldedEpochRow(spark, path, storedEpoch, -nd, negLens,
          docs.getLong(1), info.nBuckets, fieldCols, replaceAll = false)
        nd
      }
    }
  }

  /** Rewrite the fielded store at a new bucket count / fold its epochs —
    * [[rebucketBm25Store]]'s role and rename-swap discipline (crashes
    * resolve through the same [[recoverBm25Rebucket]]); the epochs table
    * is rebuilt with the per-field length arrays the fielded serving
    * needs. No stream-marker carry: fielded stores are not
    * stream-adoptable (no fielded streaming ingest exists). */
  def rebucketBm25fStore(spark: SparkSession, path: String,
                         newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1: $newBuckets")
    graft.sources.StoreLock.withLock(spark, path, "bm25-rebucket") {
      GraftFunctions.register(spark)
      val fs = fsFor(spark, path)
      requireNoCompactBak(fs, path, "rebucket")
      val info = epochsInfo(spark, path)
      val fieldCols = info.fieldNames.getOrElse(throw new IllegalArgumentException(
        s"rebucketBm25fStore: store $path is not a fielded store — " +
          "use rebucketBm25Store"))
      val bak = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".rebucket-bak")
      if (fs.exists(bak))
        throw new java.io.IOException(
          s"refusing to rebucket $path: backup $bak exists from an " +
            "interrupted rebucket — run Retrieval.recoverBm25Rebucket first")
      val tmp = path.stripSuffix("/") + ".rebucket-new"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val tomb = readBm25Tombstones(spark, path)
      // committed-snapshot fold — see rebucketBm25Store
      val post = spark.read.parquet(postingsPath(path))
        .filter(col("epoch").isInCollection(info.epochs.filter(_ >= 0)))
      val dataCols = post.columns.filterNot(c => c == "bucket" || c == "epoch")
      post.select(dataCols.map(col).toIndexedSeq: _*)
        .join(broadcast(tomb), Seq("doc_id"), "left_anti")
        .withColumn("bucket", bucketCol(newBuckets))
        .withColumn("epoch", lit(0L))
        .repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket", "epoch")
        .parquet(postingsPath(tmp))
      writeFieldedEpoch(spark, tmp, 0L, fieldCols, newBuckets,
        replaceAll = true)
      val main = new org.apache.hadoop.fs.Path(path.stripSuffix("/"))
      graft.sources.StoreGate.writeLocked(path) {
        if (!fs.rename(main, bak))
          throw new java.io.IOException(s"rebucket: failed to move $main aside")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), main))
          throw new java.io.IOException(
            s"rebucket: failed to install $tmp — run recoverBm25Rebucket")
        if (!fs.delete(bak, true))
          throw new java.io.IOException(s"rebucket: failed to remove $bak")
      }
    }
  }

  /** [[bm25fTopK]] served from ONE fielded store: one `bucket IN` pruned
    * scan yields every requested field's live candidates, a broadcast
    * field-stats join attaches (weight, b, avgdl_f), one (doc, term)
    * exchange merges the contributions, and [[bm25fTopK]]'s exact tail
    * scores — so the result equals the one-shot over the same fielded
    * corpus (the qx123 gate is qx118's oracle verbatim), at the
    * SINGLE-store serving constant regardless of field count. Fields
    * absent from `fields` are excluded from scoring (weight 0 by
    * omission); every requested name must exist in the store.
    *
    * SUBSET-FIELDS CONTRACT (what "equals the one-shot" means when
    * `fields` names fewer fields than the store holds): the served
    * result is DEFINED over the store's document universe — n_docs and
    * the per-field avgdl_f are the store's all-stored-fields live
    * scalars, and df counts candidate docs from the pruned live
    * postings of the scored terms. A one-shot [[bm25fTopK]] over ONLY
    * the requested field columns instead derives n_docs from docs
    * non-empty in those fields — so the two can diverge on a corpus
    * where some doc is empty in every requested field (and a true
    * weight-0 one-shot differs again: its df still counts weight-0
    * matches). Under the build-time field-totality contract (the
    * field-complete gate: every doc non-empty in EVERY field — pad or
    * exclude) all three agree exactly, which is the deployment shape
    * the store writer enforces. The store-universe semantics is the
    * deliberate choice: it matches the filtered-serving discipline
    * (statistics corpus-global, scoring scoped), and a field-weight
    * change never silently reweights idf. */
  def bm25fTopKFromStore(spark: SparkSession, path: String,
                         fields: Seq[Bm25fField], queries: DataFrame,
                         textCol: String, idCol: String, k: Int,
                         k1: Double = K1,
                         maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25fStore(spark, path, fields, queries, textCol, idCol, k, k1,
      maxQueryTerms, allowed = None)

  /** [[bm25fTopKFromStore]] with an id allow-list fencing candidates
    * only (corpus-global statistics, the qx111/qx114 semantics). */
  def bm25fTopKFromStoreFiltered(spark: SparkSession, path: String,
                                 fields: Seq[Bm25fField], queries: DataFrame,
                                 allowedDocs: DataFrame,
                                 textCol: String, idCol: String, k: Int,
                                 k1: Double = K1,
                                 maxQueryTerms: Int = Int.MaxValue): DataFrame =
    servedBm25fStore(spark, path, fields, queries, textCol, idCol, k, k1,
      maxQueryTerms, allowed = Some(allowedDocs))

  private def servedBm25fStore(spark: SparkSession, path: String,
                               fields: Seq[Bm25fField], queries: DataFrame,
                               textCol: String, idCol: String, k: Int,
                               k1: Double, maxQueryTerms: Int,
                               allowed: Option[DataFrame]): DataFrame = {
    require(fields.nonEmpty, "bm25fTopKFromStore needs at least one field")
    GraftFunctions.register(spark)
    import spark.implicits._
    val info = epochsInfo(spark, path)
    val names = info.fieldNames.getOrElse(throw new IllegalArgumentException(
      s"bm25fTopKFromStore: store $path is not a FIELDED store — build it " +
        "with writeBm25fStore, or serve unfielded with bm25TopKFromStore"))
    val lens = info.lenSums.get
    val idx = names.zipWithIndex.toMap
    fields.foreach(f => require(idx.contains(f.name),
      s"field '${f.name}' is not in store $path " +
        s"(stored fields: ${names.mkString(", ")})"))
    val qterms = queryTerms(DriverPlan.localize(queries), textCol, idCol,
      maxQueryTerms)
    // the allow-list is NOT applied to the scan: df/avgdl corpus-global
    // (qx111/qx114 semantics) — it fences inside the scoring tail
    val (live, _) = servedLivePostings(spark, path, qterms,
      info, allowed = None,
      cols = Seq("doc_id", "term", "tf", "dl", "field"))
    val fstats = fields
      .map(f => (idx(f.name), f.weight, f.b, lens(idx(f.name))))
      .toDF("field", "w", "b", "len_f")
    val contribs = live
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "leftsemi")
      .join(broadcast(fstats), Seq("field")) // drops unrequested fields
      .select(col("doc_id"), col("term"),
        (col("w") * col("tf").cast("double") /
          (lit(1.0) - col("b") + col("b") *
            (col("dl").cast("double") /
              (col("len_f").cast("double") / lit(info.nDocs).cast("double")))))
          .as("contrib"))
    val merged = contribs.groupBy("doc_id", "term")
      .agg(sum("contrib").as("wtf"))
    scoreBm25f(merged, qterms, Seq(info.nDocs).toDF("n_docs"), k, k1, allowed)
  }

  /** One positional census per field, tagged and unioned — the fielded
    * build/append's shared write shape. */
  private def fieldedCensus(corpus: DataFrame, fieldCols: Seq[String],
                            idCol: String, nBuckets: Int): DataFrame =
    fieldCols.zipWithIndex.map { case (c, i) =>
      bm25IndexPositional(corpus, c, idCol).withColumn("field", lit(i))
    }.reduce(_ unionByName _)
      .withColumn("bucket", bucketCol(nBuckets))

  /** Derive one written epoch's fielded scalars from an epoch-pruned
    * read-back of the postings (never a second tokenize) and land the
    * epochs row: n_docs = docs with ≥1 posting in ANY field, len_deltas
    * = per-field Σ of per-doc field lengths, id_hash = XOR over the
    * epoch's doc ids. */
  private def writeFieldedEpoch(spark: SparkSession, path: String,
                                epoch: Long, fieldCols: Seq[String],
                                nBuckets: Int,
                                replaceAll: Boolean): Unit = {
    val perFd = spark.read.parquet(postingsPath(path))
      .filter(col("epoch") === epoch)
      .groupBy("field", "doc_id").agg(max("dl").as("dl"))
      .localCheckpoint() // two planning-scale aggregates read it
    val docs = perFd.select("doc_id").distinct()
      .agg(count(lit(1)).as("nd"),
        coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("ih"))
      .collect().head
    val perField = perFd.groupBy("field").agg(sum("dl").as("l"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    writeFieldedEpochRow(spark, path, epoch, docs.getLong(0),
      fieldCols.indices.map(i => perField.getOrElse(i, 0L)),
      docs.getLong(1), nBuckets, fieldCols, replaceAll)
  }

  /** One fielded scalar-delta epoch row — the standard columns (so
    * readMeta / the signature fold / migration guards work unchanged)
    * plus `len_deltas` and `field_names`. */
  private def writeFieldedEpochRow(spark: SparkSession, path: String,
                                   epoch: Long, nDocsDelta: Long,
                                   lenDeltas: Seq[Long], idHashDelta: Long,
                                   nBuckets: Int, fieldNames: Seq[String],
                                   replaceAll: Boolean): Unit = {
    import spark.implicits._
    val w = Seq((epoch, nDocsDelta, lenDeltas.sum, lenDeltas, idHashDelta,
        nBuckets, fieldNames))
      .toDF("epoch", "n_docs_delta", "total_len_delta", "len_deltas",
        "id_hash_delta", "n_buckets", "field_names")
      .coalesce(1).write.mode("overwrite").partitionBy("epoch")
    // pinned per-write in both branches — see writeDfDelta
    w.option("partitionOverwriteMode", if (replaceAll) "static" else "dynamic")
      .parquet(epochsPath(path))
  }

  /** PHRASE query over the positional store — the first query class a
    * Lucene-shaped user asks of a lexical index that tf-only postings
    * cannot answer (round 10; the store has persisted positions since
    * [[bm25IndexPositional]]). Each query's first `maxPhraseTerms` tokens
    * form the phrase IN ORDER (duplicates kept — "to be or not to be" is
    * a 6-term phrase); a document matches where the exact consecutive
    * sequence occurs, and ranks by occurrence count (desc, doc_id asc
    * ties), rank capped at `k`.
    *
    * Plan shape — the standard positional-intersection trick made
    * relational: a phrase starts at position s iff for EVERY phrase slot
    * i (1-based), the slot's term occurs at s+i-1. Each candidate
    * posting's position array explodes to (slot, p) rows, normalized to
    * the implied start s = p − slot + 1; a (query, doc, s) group holding
    * ALL `plen` slots is one occurrence. Cost is candidate-bounded:
    * postings AND the serving path's whole candidate set come from the
    * SAME literal `bucket IN` pruned scan as BM25 serving (the phrase's
    * terms are planning metadata; the position arrays are read ONLY for
    * the pruned candidates), tombstones anti-join off, the query table
    * broadcasts, and every aggregation is keyed by (query, doc[, s]) —
    * never corpus-global. Occurrence arithmetic is integer-exact, so the
    * qx115 oracle reproduces it bit-for-bit. */
  def phraseTopKFromStore(spark: SparkSession, path: String,
                          queries: DataFrame, textCol: String, idCol: String,
                          k: Int, maxPhraseTerms: Int = Int.MaxValue): DataFrame =
    phraseImpl(spark, path, queries, textCol, idCol, k, maxPhraseTerms,
      allowed = None)

  /** [[phraseTopKFromStore]] under an id allow-list — same candidate
    * fence as [[bm25TopKFromStoreFiltered]]: only allowed docs may
    * appear, enforced BEFORE ranking so the k results are k survivors.
    * (Phrase counts are per-document — there are no corpus-global
    * statistics to preserve — so the fence is pure candidate pruning.) */
  def phraseTopKFromStoreFiltered(spark: SparkSession, path: String,
                                  queries: DataFrame, allowedDocs: DataFrame,
                                  textCol: String, idCol: String,
                                  k: Int, maxPhraseTerms: Int = Int.MaxValue): DataFrame =
    phraseImpl(spark, path, queries, textCol, idCol, k, maxPhraseTerms,
      allowed = Some(allowedDocs))

  private def phraseImpl(spark: SparkSession, path: String,
                         queries: DataFrame, textCol: String, idCol: String,
                         k: Int, maxPhraseTerms: Int,
                         allowed: Option[DataFrame]): DataFrame = {
    requireUnfielded(spark, path, "phraseTopKFromStore")
    GraftFunctions.register(spark)
    val snap = requireSignature(path, epochsInfo(spark, path))
    val qtok = querySlotTokens(DriverPlan.localize(queries), textCol, idCol,
      maxPhraseTerms)
    val qlen = queryCounts(qtok, "plen")
    val buckets = termBuckets(qtok, snap.nBuckets.toLong)
    val post = servingPostings(spark, path)
    require(post.columns.contains("pos"),
      s"store $path has no positional postings — it predates the " +
        "positional schema; rebuild (or rebucket) it to enable phrase queries")
    val tomb = servingTombstones(spark, path, post.schema.apply("doc_id"))
    val cand0 = post
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      .select("doc_id", "term", "pos")
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    val cand = allowed.fold(cand0) { a =>
      val ids = a.select(col(a.columns.head).as("doc_id")).distinct()
      cand0.join(broadcast(ids), Seq("doc_id"), "leftsemi")
    }
    // (query, doc, slot, p) rows are unique by construction (a term's
    // positions are distinct), so the per-start slot count is a plain
    // count — a start s holding all plen slots is one phrase occurrence
    val starts = cand.join(broadcast(qtok), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("slot"),
        explode(col("pos")).as("p"))
      .withColumn("s", col("p") - col("slot") + 1)
    val occ = starts.groupBy("query_id", "doc_id", "s")
      .agg(count(lit(1)).as("hit"))
      .join(broadcast(qlen), Seq("query_id"))
      .filter(col("hit") === col("plen"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("phrase_count").desc, col("doc_id").asc)
    occ.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("phrase_count"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "phrase_count")
  }

  /** PROXIMITY query over the positional store — [[phraseTopKFromStore]]'s
    * unordered sibling, completing the phrase/proximity pair a positional
    * index exists for. The query's first `maxQueryTerms` tokens yield its
    * DISTINCT term set; a document scores one occurrence per anchor
    * position `a` (any position of any query term in the doc) whose
    * window `[a, a + window − 1]` contains ALL the query's terms, in any
    * order (the windowed-proximity count of MinDist-style proximity
    * models — order-free where the phrase operator is order-exact).
    * Ranks by occurrence count (desc, doc_id asc ties), capped at `k`.
    *
    * Plan shape: candidates come from the SAME literal `bucket IN`
    * pruned scan as BM25/phrase serving, tombstones anti-join off, and
    * the window test is a SELF-join of the per-candidate hit rows keyed
    * by (query, doc) — per-pair cost is quadratic in the query-terms'
    * occurrence count within one document (the standard positional-
    * scoring bound), never corpus-global; all aggregation keys carry
    * (query, doc[, anchor]). Integer-exact, so the oracle reproduces it
    * bit-for-bit. */
  def proximityTopKFromStore(spark: SparkSession, path: String,
                             queries: DataFrame, textCol: String, idCol: String,
                             k: Int, window: Int,
                             maxQueryTerms: Int = Int.MaxValue): DataFrame =
    proximityImpl(spark, path, queries, textCol, idCol, k, window,
      maxQueryTerms, allowed = None)

  /** [[proximityTopKFromStore]] under an id allow-list — the same pure
    * candidate fence as [[phraseTopKFromStoreFiltered]]. */
  def proximityTopKFromStoreFiltered(spark: SparkSession, path: String,
                                     queries: DataFrame, allowedDocs: DataFrame,
                                     textCol: String, idCol: String,
                                     k: Int, window: Int,
                                     maxQueryTerms: Int = Int.MaxValue): DataFrame =
    proximityImpl(spark, path, queries, textCol, idCol, k, window,
      maxQueryTerms, allowed = Some(allowedDocs))

  private def proximityImpl(spark: SparkSession, path: String,
                            queries: DataFrame, textCol: String, idCol: String,
                            k: Int, window: Int, maxQueryTerms: Int,
                            allowed: Option[DataFrame]): DataFrame = {
    require(window >= 1, s"window=$window must be >= 1")
    requireUnfielded(spark, path, "proximityTopKFromStore")
    GraftFunctions.register(spark)
    val snap = requireSignature(path, epochsInfo(spark, path))
    // distinct (query_id, term) of the first maxQueryTerms tokens —
    // exactly queryTerms' contract (posexplode+cap+distinct ≡
    // explode(slice)+distinct), so the serving path shares its
    // driver-evaluated LocalRelation fast path
    val qterms = queryTerms(DriverPlan.localize(queries), textCol, idCol,
      maxQueryTerms)
    val qlen = queryCounts(qterms, "nterms")
    val buckets = termBuckets(qterms, snap.nBuckets.toLong)
    val post = servingPostings(spark, path)
    require(post.columns.contains("pos"),
      s"store $path has no positional postings — it predates the " +
        "positional schema; rebuild (or rebucket) it to enable proximity queries")
    val tomb = servingTombstones(spark, path, post.schema.apply("doc_id"))
    val cand0 = post
      .filter(col("bucket").isInCollection(buckets))
      .filter(col("epoch").isInCollection(snap.epochs.filter(_ >= 0)))
      .select("doc_id", "term", "pos")
      .join(broadcast(tomb), Seq("doc_id"), "left_anti")
    val cand = allowed.fold(cand0) { a =>
      val ids = a.select(col(a.columns.head).as("doc_id")).distinct()
      cand0.join(broadcast(ids), Seq("doc_id"), "leftsemi")
    }
    // (query, doc, term) rows with the term's full position ARRAY — one
    // row per matched posting, not one per occurrence
    val termPos = cand.join(broadcast(qterms), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term"), col("pos"))
    // every query-term occurrence anchors one window; a term occurring
    // twice inside a window still counts once.
    //
    // Round-14 restructure (guide §1.2 "the distributed algorithm"): the
    // old form exploded positions into per-occurrence rows and SELF-joined
    // them on (query, doc) with a range filter — O(m²) pairs per (query,
    // doc) in the query-terms' occurrence count m, then a countDistinct
    // aggregate over them. A window test only needs, per (anchor, term),
    // "does the term occur in [a, a+w−1]?" — which the posting's sorted
    // position array answers directly: anchors join back to the nBlocks…
    // nterms TERM rows of the same (query, doc) — O(m·nterms) pairs — and
    // arrays_overlap(pos, sequence(a, a+w−1)) (both codegen'd) replaces
    // the per-occurrence explode; a term "got" is counted once however
    // many of its occurrences land in the window, so the plain count over
    // (query, doc, a, term) rows equals the old countDistinct over
    // occurrence pairs. Anchor set, per-anchor verdicts, and the ranking
    // are unchanged — the oracle re-proves it bit-for-bit.
    val anchors = termPos
      .select(col("query_id"), col("doc_id"), explode(col("pos")).as("a"))
      .distinct()
    val occ = anchors.join(termPos, Seq("query_id", "doc_id"))
      .filter(arrays_overlap(col("pos"),
        sequence(col("a"), col("a") + lit(window - 1))))
      .groupBy("query_id", "doc_id", "a")
      .agg(count(lit(1)).as("got"))
      .join(broadcast(qlen), Seq("query_id"))
      .filter(col("got") === col("nterms"))
    val wRank = Window.partitionBy("query_id")
      .orderBy(col("prox_count").desc, col("doc_id").asc)
    occ.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("prox_count"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "prox_count")
  }

  /** STORE-SERVED hybrid retrieval — the production RAG serving shape as
    * ONE operator (what qx107 gates): lexical candidates from the BM25
    * store's bucket-pruned postings + df sidecar, vector candidates from
    * the self-contained IVF-PQ store's probed cells with the
    * exact-rescore refine, each contributing its top-`depth` list,
    * fused to the final top-`k` by [[rrfFuse]] on planning-scale
    * candidates. `queries` carries id + text + vector columns;
    * `rescoreCorpus` is the exact-vector table the refine rescores from
    * (the store holds only codes). Both stores serve PRUNED —
    * PlanAuditSpec pins the bucket IN and probed-cell filters on the
    * fused plan. */
  def hybridTopKFromStores(spark: SparkSession, lexPath: String,
                           vecPath: String, queries: DataFrame,
                           textCol: String, vecCol: String, idCol: String,
                           k: Int, depth: Int, nProbe: Int, rerankDepth: Int,
                           rescoreCorpus: DataFrame, rescoreVecCol: String,
                           k0: Int = RRF_K0,
                           maxQueryTerms: Int = Int.MaxValue): DataFrame =
    hybridFromStores(spark, lexPath, vecPath, queries, textCol, vecCol,
      idCol, k, depth, nProbe, rerankDepth,
      Some((rescoreCorpus, rescoreVecCol)), k0, maxQueryTerms, allowed = None)

  /** [[hybridTopKFromStores]] with NO rescore corpus — the exact vectors
    * come from the IVF-PQ store's own `.vectors` sidecar
    * ([[Quantize.searchSelfContainedRefinedStored]]), so the whole RAG
    * serving composition is deployable from the two store paths alone —
    * no lake pointer rides the serving call. Requires the vector store
    * built with `storeVectors = true` (fails loudly otherwise). */
  def hybridTopKFromStoresStored(spark: SparkSession, lexPath: String,
                                 vecPath: String, queries: DataFrame,
                                 textCol: String, vecCol: String, idCol: String,
                                 k: Int, depth: Int, nProbe: Int, rerankDepth: Int,
                                 k0: Int = RRF_K0,
                                 maxQueryTerms: Int = Int.MaxValue): DataFrame =
    hybridFromStores(spark, lexPath, vecPath, queries, textCol, vecCol,
      idCol, k, depth, nProbe, rerankDepth, rescore = None,
      k0, maxQueryTerms, allowed = None)

  /** [[hybridTopKFromStoresStored]] under an id allow-list —
    * [[hybridTopKFromStoresFiltered]]'s two-sided candidate fence with
    * the sidecar rescore. */
  def hybridTopKFromStoresStoredFiltered(spark: SparkSession, lexPath: String,
                                         vecPath: String, queries: DataFrame,
                                         allowedDocs: DataFrame,
                                         textCol: String, vecCol: String,
                                         idCol: String,
                                         k: Int, depth: Int, nProbe: Int,
                                         rerankDepth: Int,
                                         k0: Int = RRF_K0,
                                         maxQueryTerms: Int = Int.MaxValue): DataFrame =
    hybridFromStores(spark, lexPath, vecPath, queries, textCol, vecCol,
      idCol, k, depth, nProbe, rerankDepth, rescore = None,
      k0, maxQueryTerms, allowed = Some(allowedDocs))

  /** [[hybridTopKFromStores]] under an id allow-list — the production
    * "ACL-scoped RAG" composition (qx114): BOTH retrievers fence their
    * candidates before ranking ([[bm25TopKFromStoreFiltered]] on the
    * lexical side, [[Quantize.searchSelfContainedRefinedFiltered]] on the
    * vector side), so each contributes depth-deep lists of ALLOWED
    * survivors and the fusion ranks only docs the caller may see.
    * Scoring statistics stay corpus-global on both sides (standard
    * filtered-retrieval semantics), the stores still serve
    * partition-pruned, and the allow-list broadcasts twice as predicate
    * metadata. */
  def hybridTopKFromStoresFiltered(spark: SparkSession, lexPath: String,
                                   vecPath: String, queries: DataFrame,
                                   allowedDocs: DataFrame,
                                   textCol: String, vecCol: String, idCol: String,
                                   k: Int, depth: Int, nProbe: Int, rerankDepth: Int,
                                   rescoreCorpus: DataFrame, rescoreVecCol: String,
                                   k0: Int = RRF_K0,
                                   maxQueryTerms: Int = Int.MaxValue): DataFrame =
    hybridFromStores(spark, lexPath, vecPath, queries, textCol, vecCol,
      idCol, k, depth, nProbe, rerankDepth,
      Some((rescoreCorpus, rescoreVecCol)), k0, maxQueryTerms,
      allowed = Some(allowedDocs))

  /** The one hybrid-serving core (filtered/unfiltered and corpus/sidecar
    * rescore cannot drift): `rescore = Some((corpus, vecCol))` refines
    * from the caller's lake table, `None` from the store's `.vectors`
    * sidecar. */
  private def hybridFromStores(spark: SparkSession, lexPath: String,
                               vecPath: String, queries: DataFrame,
                               textCol: String, vecCol: String, idCol: String,
                               k: Int, depth: Int, nProbe: Int, rerankDepth: Int,
                               rescore: Option[(DataFrame, String)],
                               k0: Int, maxQueryTerms: Int,
                               allowed: Option[DataFrame]): DataFrame = {
    val (lex, vec) = hybridLegs(spark, lexPath, vecPath, queries, textCol,
      vecCol, idCol, depth, nProbe, rerankDepth, rescore, maxQueryTerms,
      allowed)
    rrfFuse(lex, vec, k0, k)
  }

  /** The two retriever legs every hybrid composition fuses — each a
    * depth-deep (query_id, rank, doc_id, ...) ranking over its own
    * pruned store scan. */
  private def hybridLegs(spark: SparkSession, lexPath: String,
                         vecPath: String, queries: DataFrame,
                         textCol: String, vecCol: String, idCol: String,
                         depth: Int, nProbe: Int, rerankDepth: Int,
                         rescore: Option[(DataFrame, String)],
                         maxQueryTerms: Int,
                         allowed: Option[DataFrame]): (DataFrame, DataFrame) = {
    // localize ONCE: both legs' planning-scale uses (term explode, probe
    // cells, small-side gates) then hit the jobless driver twins
    val queriesLoc = DriverPlan.localize(queries)
    val lexQ = queriesLoc.select(col(idCol), col(textCol))
    val lex = allowed match {
      case Some(a) => bm25TopKFromStoreFiltered(spark, lexPath, lexQ, a,
        textCol, idCol, depth, maxQueryTerms = maxQueryTerms)
      case None => bm25TopKFromStore(spark, lexPath, lexQ, textCol, idCol,
        depth, maxQueryTerms = maxQueryTerms)
    }
    val vecQ = queriesLoc.select(col(idCol), col(vecCol))
    val vec = ((rescore, allowed) match {
      case (Some((corpus, cv)), Some(a)) =>
        Quantize.searchSelfContainedRefinedFiltered(spark,
          vecPath, vecQ, idCol, vecCol, a, corpus, cv,
          depth, nProbe, rerankDepth)
      case (Some((corpus, cv)), None) =>
        Quantize.searchSelfContainedRefined(spark, vecPath,
          vecQ, idCol, vecCol, corpus, cv, depth, nProbe, rerankDepth)
      case (None, Some(a)) =>
        Quantize.searchSelfContainedRefinedStoredFiltered(spark, vecPath,
          vecQ, idCol, vecCol, a, depth, nProbe, rerankDepth)
      case (None, None) =>
        Quantize.searchSelfContainedRefinedStored(spark, vecPath,
          vecQ, idCol, vecCol, depth, nProbe, rerankDepth)
    }).select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    (lex, vec)
  }

  // The served hybrid's leg-collect pool: two short-lived collect actions
  // per request, daemon threads, shared across requests (cached pool —
  // idle threads are reclaimed).
  private lazy val hybridLegPool =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, "graft-hybrid-leg"); t.setDaemon(true); t
        }
      })

  /** The hybrid store composition re-shaped for SERVING: the two
    * retriever legs run as CONCURRENT collect actions (the request's
    * critical path becomes max(leg walls), not their sum — ServeFloor
    * measures the difference), and the RRF fusion + final ranking runs
    * on the DRIVER over the two depth-bounded lists with [[rrfFuse]]'s
    * EXACT arithmetic: floor(1e9/(k0+rank)+0.5) integer nano-unit
    * contributions summed as longs, rrf desc / doc_id asc ties, HALF_UP
    * 9-digit score render — RetrievalServingParitySpec asserts
    * row-for-row equality against the plan-side fusion. Returns a
    * LocalRelation (the fused list is k-bounded), so downstream
    * consumers (snippet attachment, include_text joins, the JSON render)
    * plan joblessly over the fused rows. Falls back to the single-plan
    * fusion when the id type has no replicated driver ordering. */
  def hybridTopKFromStoresServed(spark: SparkSession, lexPath: String,
                                 vecPath: String, queries: DataFrame,
                                 textCol: String, vecCol: String, idCol: String,
                                 k: Int, depth: Int, nProbe: Int,
                                 rerankDepth: Int,
                                 rescore: Option[(DataFrame, String)] = None,
                                 allowed: Option[DataFrame] = None,
                                 k0: Int = RRF_K0,
                                 maxQueryTerms: Int = Int.MaxValue): DataFrame = {
    val (lex, vec) = hybridLegs(spark, lexPath, vecPath, queries, textCol,
      vecCol, idCol, depth, nProbe, rerankDepth, rescore, maxQueryTerms,
      allowed)
    val lexSel = lex.select(col("query_id"), col("doc_id"), col("rank"))
    val vecSel = vec.select(col("query_id"), col("doc_id"), col("rank"))
    val docIdType = lexSel.schema.apply("doc_id").dataType
    val qIdField = lexSel.schema.apply("query_id")
    DriverPlan.idOrdering(docIdType) match {
      case None => rrfFuse(lex, vec, k0, k)
      case Some(ord) =>
        val sc = spark.sparkContext
        val callerPool = sc.getLocalProperty("spark.scheduler.pool")
        def collectLeg(df: DataFrame) = hybridLegPool.submit(
          new java.util.concurrent.Callable[Array[org.apache.spark.sql.Row]] {
            override def call(): Array[org.apache.spark.sql.Row] = {
              // local properties are thread-local: re-tag the pool thread
              // so leg jobs stay in the caller's FAIR pool
              sc.setLocalProperty("spark.scheduler.pool", callerPool)
              df.collect()
            }
          })
        val fLex = collectLeg(lexSel)
        val fVec = collectLeg(vecSel)
        val lexRows = fLex.get()
        val vecRows = fVec.get()
        // full-outer merge on (query_id, doc_id), rrfFuse's arithmetic
        final class Acc { var lexRank: java.lang.Long = null
                          var vecRank: java.lang.Long = null }
        val accs = new java.util.LinkedHashMap[(Any, Any), Acc]
        def accFor(qid: Any, did: Any): Acc = {
          val key = (qid, did)
          var a = accs.get(key)
          if (a == null) { a = new Acc; accs.put(key, a) }
          a
        }
        lexRows.foreach(r => accFor(r.get(0), r.get(1)).lexRank = r.getLong(2))
        vecRows.foreach(r => accFor(r.get(0), r.get(1)).vecRank = r.getLong(2))
        def contrib(rank: java.lang.Long): Long =
          if (rank == null) 0L
          else math.floor(1.0 / (k0.toDouble + rank.doubleValue)
            * 1000000000.0 + 0.5).toLong
        val byQuery = new java.util.LinkedHashMap[Any,
          scala.collection.mutable.ArrayBuffer[(Any, Long, java.lang.Long, java.lang.Long)]]
        accs.forEach { (key, a) =>
          var buf = byQuery.get(key._1)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            byQuery.put(key._1, buf)
          }
          buf += ((key._2, contrib(a.lexRank) + contrib(a.vecRank),
            a.lexRank, a.vecRank))
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        byQuery.forEach { (qid, buf) =>
          val ranked = buf.sortWith { case ((da, ua, _, _), (db, ub, _, _)) =>
            if (ua != ub) ua > ub else ord.lt(da, db)
          }
          var i = 0
          while (i < ranked.length && i < k) {
            val (did, u, lr, vr) = ranked(i)
            // round(u/1e9, 9) — Spark's Round is HALF_UP over
            // BigDecimal.valueOf of the already-divided double
            val score = java.math.BigDecimal.valueOf(u.toDouble / 1.0e9)
              .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
            out += org.apache.spark.sql.Row(qid, (i + 1).toLong, did, score,
              lr, vr)
            i += 1
          }
        }
        DriverPlan.localFrame(spark, out.toSeq,
          org.apache.spark.sql.types.StructType(Seq(
            qIdField,
            org.apache.spark.sql.types.StructField("rank",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("doc_id", docIdType,
              nullable = lexSel.schema.apply("doc_id").nullable),
            org.apache.spark.sql.types.StructField("rrf_score",
              org.apache.spark.sql.types.DoubleType, nullable = false),
            org.apache.spark.sql.types.StructField("lex_rank",
              org.apache.spark.sql.types.LongType, nullable = true),
            org.apache.spark.sql.types.StructField("vec_rank",
              org.apache.spark.sql.types.LongType, nullable = true))))
    }
  }

  /** Reciprocal rank fusion of two rankings (Cormack et al. 2009):
    * rrf(d) = Σ_r 1/(k0 + rank_r(d)) over the rankings that retrieved d.
    * Each reciprocal is quantized to integer nano-units —
    * floor(x·10⁹ + 0.5) as BIGINT — and summed as longs, so the fused
    * ordering is exact and engine-portable. Both inputs carry
    * (query_id, doc_id, rank); candidates are the union of the two
    * top-lists — both are k-bounded per query, so the fusion join is
    * planning-scale (no corpus data moves here). */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k0: Int, topK: Int): DataFrame = {
    val l = lex.select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val v = vec.select(col("query_id"), col("doc_id"), col("rank").as("vec_rank"))
    def contrib(rank: Column): Column =
      when(rank.isNotNull,
          floor(lit(1.0) / (lit(k0).cast("double") + rank.cast("double"))
            * lit(1000000000.0) + lit(0.5)).cast("long"))
        .otherwise(lit(0L))
    val fused = l.join(v, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_u", contrib(col("lex_rank")) + contrib(col("vec_rank")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_u").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf_u").cast("double") / lit(1000000000.0), 9).as("rrf_score"),
        col("lex_rank"), col("vec_rank"))
  }

  // ------------------------------------------------------------------
  // Dialect-parametric SQL fragments shared with the DuckDB oracle —
  // one source of truth for the arithmetic on both sides.
  // ------------------------------------------------------------------

  /** BM25 idf of integer columns n_docs/df (SQL text, both dialects). */
  val idfSql: String =
    "ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)" +
      " / (CAST(df AS DOUBLE) + 0.5) + 1.0)"

  /** BM25 tf normalization of integer columns tf/dl with avgdl double. */
  def tfNormSql(k1: Double, b: Double): String =
    s"(CAST(tf AS DOUBLE) * CAST(${k1 + 1.0} AS DOUBLE))" +
      s" / (CAST(tf AS DOUBLE) + CAST($k1 AS DOUBLE)" +
      s" * (1.0 - CAST($b AS DOUBLE) + CAST($b AS DOUBLE)" +
      " * (CAST(dl AS DOUBLE) / avgdl)))"
}
