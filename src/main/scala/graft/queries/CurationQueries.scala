package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.TextAnalysis

/** Round-4 curation batch: importance-weighted data selection (DSIR) and
  * quality-aware canonical selection inside near-dup groups — the two
  * steps that turn "we found the duplicates / we scored the docs" into
  * "this is the corpus we train on". Both oracle-gated (the DuckDB SQL is
  * generated from the same TextExprs definitions the Spark plans run). */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Feature-hash space for qx58 — small enough that the census always
    * broadcasts, large enough that bucket collisions stay rare on the
    * synthetic vocabulary. */
  private[queries] val DSIR_BUCKETS = 4096

  /** qx60's context window (same as the qx43 packer). */
  private val PACK_CONTEXT = 128L

  /** qx61's quantized resampling schedule over the 6dp-rounded DSIR
    * weight (the rounding is what makes the thresholds engine-portable:
    * qx58's hash gate proves both engines produce the identical rounded
    * double, so >= comparisons agree). Chosen so every step bites at
    * sf0.01: target docs span the 0/-3 boundaries, source docs span
    * -3/-8/floor. */
  private val DSIR_RATES = Seq(0.0 -> 1000L, -3.0 -> 600L, -8.0 -> 300L)
  private val DSIR_FLOOR_RATE = 100L

  /** qx63 PQ geometry: 64-dim embeddings → 4 blocks of 16 dims, 4-entry
    * codebook seeded from the first vectors. */
  private val PQ_DIMS = 64
  private val PQ_BLOCKS = 4
  private val PQ_CODES = 4
  private val PQ_QUERY_SET = 20
  private val PQ_K = 3

  /** qx67 coarse quantizer: 8 IVF cells, 2 probed per query (same dials
    * as the standalone multi-probe qx49, so recall deltas between the
    * float path and the PQ path are attributable to the codes alone). */
  private val IVFPQ_CENTROIDS = 8
  private val IVFPQ_NPROBE = 2

  /** qx69's residual codebook is seeded from vectors 100..103: seeding
    * from 0..3 would make every entry the zero vector (those vectors ARE
    * centroids — self-assigned, zero residual). */
  private val RESCB_SEED_FROM = 100

  /** qx70's shortlist depth: 4× the final k, so the exact rescore has
    * real displacement room (at depth == k it would be a no-op ranking). */
  private val REFINE_DEPTH = 12

  /** qx113 recell geometry: the retrained store's cell count is
    * deliberately NOT the seeded 8 (new geometry is the point), and the
    * serving probe budget covers EVERY cell with the refine depth past
    * every candidate — kmeans-trained centroids are not SQL-expressible,
    * so the cross-engine gate fences what IS closed-form: the LIVE SET
    * and the serving path (tombstones cleared by the recell, the
    * re-appended formerly-deleted slice landed and served, the retrained
    * quantizers drive probe/encode/rescore end-to-end = exact kNN). The
    * recell ≡ from-scratch-rebuild equality at PARTIAL probes — the
    * geometry itself — is gated in BatchingOpsSpec, where both sides run
    * the same deterministic trainer. */
  private val RECELL_CELLS = 11
  private val RECELL_CODES = 13
  private val RECELL_COARSE_ITER = 4
  private val RECELL_PQ_ITER = 2

  /** qx72 drift monitor dials: a hash space small enough that both
    * snapshot censuses always broadcast, topK sized like a report. */
  private val DRIFT_BUCKETS = 2048
  private val DRIFT_TOP = 20

  private def duckD = Dialect(spark = false)
  private def sparkD = Dialect(spark = true)

  // ---- Vector-store chain steps (round 13) -------------------------------
  // Durable IVF-PQ store constructions run as StoreMemo chains (see
  // StoreMemo's scaladoc): built once per (JVM, dataset, chain prefix),
  // shared across bench reps and across queries with signature-identical
  // chains — e.g. qx116's build+append+tombstone prefix is qx124's, and
  // qx74/qx82 share one full-corpus index build. Self-contained stores
  // live at `<work>/store`, raw ivfPq indexes at `<work>/index`.

  private def scBuild(s: SparkSession, sliceSig: String,
                      slice: => DataFrame, cents: DataFrame,
                      codebook: DataFrame, storeVectors: Boolean = false) =
    StoreMemo.step(s"vec.buildSC|$sliceSig|c=$IVFPQ_CENTROIDS|cb=$PQ_CODES|" +
      s"d=$PQ_DIMS|bl=$PQ_BLOCKS|res=false|sv=$storeVectors")(w =>
      graft.operators.Quantize.buildSelfContained(s, slice, "vec_id",
        "embedding", cents, "centroid_id", "cen_emb",
        codebook, "code_id", "cb_emb", PQ_DIMS, PQ_BLOCKS,
        residual = false, s"$w/store", storeVectors = storeVectors))

  private def scAppend(s: SparkSession, sliceSig: String, slice: => DataFrame) =
    StoreMemo.step(s"vec.appendSC|$sliceSig")(w =>
      graft.operators.Quantize.appendSelfContained(s, s"$w/store",
        slice, "embedding"))

  private def scTombstone(s: SparkSession, sliceSig: String, ids: => DataFrame) =
    StoreMemo.step(s"vec.tomb|$sliceSig")(w =>
      graft.operators.Quantize.addTombstones(s, s"$w/store", ids, "vec_id"))

  private def idxBuild(sliceSig: String, slice: => DataFrame,
                       cents: DataFrame, codebook: DataFrame) =
    StoreMemo.step(s"vec.buildIdx|$sliceSig|c=$IVFPQ_CENTROIDS|cb=$PQ_CODES|" +
      s"d=$PQ_DIMS|bl=$PQ_BLOCKS")(w =>
      graft.operators.Quantize.writeIvfPqIndex(
        graft.operators.Quantize.ivfPqIndex(slice, "vec_id", "embedding",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS), s"$w/index"))

  private def idxAppend(sliceSig: String, slice: => DataFrame,
                        cents: DataFrame, codebook: DataFrame) =
    StoreMemo.step(s"vec.appendIdx|$sliceSig")(w =>
      graft.operators.Quantize.appendToIvfPqIndex(slice, "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
        PQ_DIMS, PQ_BLOCKS, s"$w/index"))

  def queries: Map[String, Q] = Map(

    // ---- DSIR importance weights: score docs toward a target domain ----
    // (target slice = English docs; the weight says how much more likely
    //  the doc is under the target's hashed-bigram LM than the source's)
    "qx58_dsir_weights" -> ((s, dir) =>
      TextAnalysis.dsirWeights(t(s, dir, "documents"), "text", "doc_id",
          col("lang") === "en", DSIR_BUCKETS)
        .orderBy("doc_id")),

    // ---- Pack manifest: the artifact the training loader consumes -------
    // (one row per (window, doc): which token slice of which doc fills
    //  which context window; straddlers appear once per touched window)
    "qx60_pack_manifest" -> ((s, dir) => {
      val d = sparkD
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        expr(TX.tokenCountAuto("text")(d)).as("n_tokens"))
      graft.operators.Packing.packManifest(docs, "doc_id", "n_tokens", PACK_CONTEXT)
        .orderBy("pack", "doc_id")
    }),

    // ---- DSIR resampling APPLIED: quantized-rate hash sampling ----------
    // (the selection step after qx58's scoring: per-doc keep rate from the
    //  rounded weight, deterministic salted-hash keep decision, per-lang
    //  census — corpus mixing you can re-run byte-identically)
    "qx61_dsir_resample" -> ((s, dir) => {
      val d = sparkD
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val w = TextAnalysis.dsirWeights(docs, "text", "doc_id",
        col("lang") === "en", DSIR_BUCKETS)
      val rate = DSIR_RATES.foldRight(
          when(col("log_weight").isNotNull, DSIR_FLOOR_RATE).otherwise(0L)) {
        case ((thr, r), elseExpr) => when(col("log_weight") >= thr, r).otherwise(elseExpr)
      }
      docs.select("doc_id", "lang")
        .join(w.select(col("doc_id"), col("log_weight")), Seq("doc_id"), "left")
        .withColumn("rate", rate)
        .withColumn("keep",
          (expr(s"${TX.polyHashAuto("concat('dsir', CAST(`doc_id` AS STRING))")(d)} % 1000")
            < col("rate")).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("log_weight").isNotNull, 1L).otherwise(0L)).as("n_scored"),
          sum(col("keep")).as("n_kept"),
          min(when(col("keep") === 1L, col("doc_id"))).as("min_kept_doc"))
        .orderBy("lang")
    }),

    // ---- Token-budget split: exact token counts, not doc counts ---------
    // (training-data splits are budgeted in TOKENS; the doc-id-ordered
    //  tape is cut at 80%/90% of the total token mass via the distributed
    //  prefix sum — integer cross-multiplication, so both engines cut at
    //  identical rows. The 1-row total broadcasts.)
    "qx62_token_budget_split" -> ((s, dir) => {
      val d = sparkD
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents").select(col("doc_id"),
          expr(TX.tokenCountAuto("text")(d)).as("n_tokens"))
        .filter(col("n_tokens") > 0)
      val cum = graft.operators.Packing.prefixSum(
        docs, "doc_id", "n_tokens", "cum_tokens")
      val tot = docs.agg(sum(col("n_tokens")).as("total"))
      cum.crossJoin(broadcast(tot))
        .withColumn("split",
          when(col("cum_tokens") * 100 <= col("total") * 80, "train")
            .when(col("cum_tokens") * 100 <= col("total") * 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("split")
    }),

    // ---- Product-quantization encode: per-block code assignment ---------
    // (the PQ compression step after int8: 64 floats → 4 codes + a shared
    //  codebook; broadcast codebook, bounded nBlocks× explode, grouped
    //  argmin — see Quantize.pqEncode)
    "qx63_pq_encode" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
      graft.operators.Quantize.pqEncode(emb, "vec_id", "embedding",
          codebook, "code_id", "c_emb", PQ_DIMS, PQ_BLOCKS)
        .orderBy("vec_id", "block")
    }),

    // ---- PQ ADC search: code-only scoring against the lookup table ------
    // (the payoff of qx63: approximate top-k where the corpus side touches
    //  only its nBlocks codes; decimal-exact cross-block sums make the
    //  ranking order-independent and engine-portable)
    "qx64_pq_adc_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
      val codes = graft.operators.Quantize.pqEncode(t(s, dir, "embeddings"), "vec_id", "embedding",
        codebook, "code_id", "c_emb", PQ_DIMS, PQ_BLOCKS)
      graft.operators.Quantize.pqSearch(
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
          codes, "vec_id", codebook, "code_id", "c_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- DSIR score-online, THROUGH the streaming runtime ----------------
    // (qx58 proves the formula; StreamingMultimodalSpec proves batch≡stream
    //  on a fixture. This row puts the REAL deployment shape under the
    //  oracle: documents replayed as a file stream one file per
    //  micro-batch, each batch scored against the static broadcast model
    //  in foreachBatch and APPENDED to a parquet store — score-on-ingest
    //  exactly as production runs it. The final store hash-matches the
    //  all-at-once batch formula in DuckDB: per-doc scores depend only on
    //  the doc and the frozen model, so batch boundaries must not show.)
    "qx68_dsir_stream_scores" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val work = StoreMemo.materialize(dir, Seq(
        StoreMemo.step(s"dsir.streamScores|docs|b=$DSIR_BUCKETS|files=4")(w => {
          val model = TextAnalysis.dsirModel(docs, "text",
            col("lang") === "en", DSIR_BUCKETS).persist()
          val totals = TextAnalysis.dsirTotals(model) // action: pins the model
          val outDir = s"$w/scores"
          // stage a LANDING DIRECTORY (file streams monitor directories;
          // the testdata table is a single file): 4 files = 4 arrivals
          val landing = s"$w/landing"
          docs.select("doc_id", "text").repartition(4).write.parquet(landing)
          val q = s.readStream
            .schema(s.read.parquet(landing).schema)
            .option("maxFilesPerTrigger", 1) // one arrival per micro-batch
            .parquet(landing)
            .writeStream
            .foreachBatch { (batch: DataFrame, _: Long) =>
              TextAnalysis.dsirScore(batch, "text", "doc_id",
                  model, totals, DSIR_BUCKETS)
                .write.mode("append").parquet(outDir)
            }
            .option("checkpointLocation", s"$w/ckpt")
            .start()
          try q.processAllAvailable() finally { q.stop(); model.unpersist(); () }
        })))
      s.read.parquet(s"$work/scores").orderBy("doc_id")
    }),

    // ---- IVF+PQ: the composed production index ---------------------------
    // (qx22's cell probing × qx64's ADC scoring in ONE index — probe the
    //  query's nProbe nearest cells, ADC-score only the codes filed there;
    //  FAISS-IVFPQ shape: broadcast probes + lookup table, cell equi-join,
    //  decimal-exact cross-block sums keep the top-k engine-portable)
    "qx67_ivfpq_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      graft.operators.Quantize.ivfPqSearch(
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
          t(s, dir, "embeddings"), "vec_id", "embedding",
          cents, "centroid_id", "cen_emb",
          codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Batch ADC search: the WHOLE corpus queries the PQ index ---------
    // (qx67's search without the broadcast-query-side gate: probe cells
    //  come from the map-side single-row-centroid-array expression, the
    //  per-(query,block,code) ADC lookup table — which could never
    //  broadcast at |Q| = corpus — is replaced by per-candidate distances
    //  computed in place from the query vector riding the probe row, and
    //  the decimal cross-block sums keep the output byte-identical to the
    //  broadcast path. This is corpus-scale batch scoring against the
    //  production index: the store's codes are read, the corpus floats
    //  are not re-encoded.)
    "qx87_ivfpq_batch_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val embS = emb
      val index = graft.operators.Quantize.ivfPqIndex(embS, "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
        PQ_DIMS, PQ_BLOCKS)
      graft.operators.Quantize.ivfPqSearchAll(embS, "vec_id", "embedding",
          index, "vec_id", cents, "centroid_id", "cen_emb",
          codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Batch residual ADC search: qx88 = qx87 for the SHIPPED encoding -
    // (the high-recall default is a residual store; here the whole corpus
    //  batch-scores against the residual-coded index — probe rows pick up
    //  their cell centroid's vector from the broadcast table and carry the
    //  per-cell query residual into the candidate join; output
    //  byte-identical to the broadcast residual search.)
    "qx88_ivfpq_batch_residual" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val seeds = emb.filter(
        col("vec_id") >= RESCB_SEED_FROM && col("vec_id") < RESCB_SEED_FROM + PQ_CODES)
      val resCodebook = graft.operators.Similarity.ivfAssign(
          seeds, "vec_id", "embedding", cents, "centroid_id", "cen_emb")
        .join(broadcast(cents), "centroid_id")
        .withColumn("c_emb", expr(
          "zip_with(embedding, cen_emb, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
        .select(col("vec_id").as("code_id"), col("c_emb"))
      val embS = emb
      val index = graft.operators.Quantize.ivfPqIndexResidual(embS, "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", resCodebook, "code_id", "c_emb",
        PQ_DIMS, PQ_BLOCKS)
      graft.operators.Quantize.ivfPqSearchAllResidual(embS, "vec_id", "embedding",
          index, "vec_id", cents, "centroid_id", "cen_emb",
          resCodebook, "code_id", "c_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Incremental IVF-PQ append: grow the stored index at batch cost --
    // (the ingest shape for a growing corpus: the base index is built once
    //  and persisted; a new batch is assigned+encoded ALONE against the
    //  frozen build-time quantizers and appended to its cell partitions.
    //  The probed search over the appended store must equal qx67's
    //  one-shot full-corpus search — that equality IS the oracle.)
    "qx73_ivfpq_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // every-10th split: the batch lands in many different cells, so the
      // append exercises multi-cell partition appends, not one directory
      val base = emb.filter(col("vec_id") % 10 =!= 7)
      val batch = emb.filter(col("vec_id") % 10 === 7)
      val work = StoreMemo.materialize(dir, Seq(
        idxBuild("emb%10!=7", base, cents, codebook),
        idxAppend("emb%10=7", batch, cents, codebook)))
      graft.operators.Quantize.ivfPqSearchStored(s, s"$work/index",
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding", "vec_id",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- IVF-PQ compaction: defragment cells, answers unchanged ----------
    // (the store is built fragmented — an initial write plus two appends
    //  put multiple files in most cells — then compacted; the oracle is
    //  qx67's full-corpus search verbatim, so the gate proves compaction
    //  moves BYTES and never rows: probe-pruned search over the rewritten
    //  cells must hash-match the formula exactly)
    "qx77_ivfpq_compact" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val work = StoreMemo.materialize(dir, Seq(
        idxBuild("emb%3=0", emb.filter(col("vec_id") % 3 === 0),
          cents, codebook),
        idxAppend("emb%3=1", emb.filter(col("vec_id") % 3 === 1),
          cents, codebook),
        idxAppend("emb%3=2", emb.filter(col("vec_id") % 3 === 2),
          cents, codebook),
        StoreMemo.step("vec.compactIdx|maxRec=1000000")(w =>
          { graft.operators.Quantize.compactIvfPqIndex(s, s"$w/index",
              maxRecordsPerFile = 1000000L); () })))
      graft.operators.Quantize.ivfPqSearchStored(s, s"$work/index",
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding", "vec_id",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Tombstoned retraction + retention sweep -------------------------
    // (the deferred-delete lifecycle: retractions append to a tombstone
    //  side table at O(1) cost, searches anti-join it after the probe-
    //  pruned scan, and a threshold-driven sweep physically rewrites only
    //  the cells whose dead fraction crossed the line — leaving a MIXED
    //  store (some cells swept, some still carrying tombstones). The
    //  oracle is qx74's exact-delete contract: however the sweep split
    //  the cells, filtered search over the partially-swept store must
    //  equal the search over an index BUILT without the retracted ids.)
    "qx82_ivfpq_retention" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // shares the full-corpus index build with qx74
      val work = StoreMemo.materialize(dir, Seq(
        idxBuild("emb", emb, cents, codebook),
        StoreMemo.step("vec.tombIdx|emb%5=2")(w =>
          graft.operators.Quantize.addTombstones(s, s"$w/index",
            emb.filter(col("vec_id") % 5 === 2).select("vec_id"), "vec_id")),
        StoreMemo.step("vec.sweepIdx|frac=0.2")(w =>
          { graft.operators.Quantize.retentionSweep(s, s"$w/index", "vec_id",
              maxTombstoneFraction = 0.2); () })))
      graft.operators.Quantize.ivfPqSearchStoredRetained(s, s"$work/index",
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding", "vec_id",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- High-recall deployment search under the oracle ------------------
    // (round 8's shipped configuration end-to-end: SELF-CONTAINED store
    //  build, O(1) tombstoned retraction, then the REFINED stored search
    //  `searchSelfContainedRefined` — tombstone-filtered ADC shortlist,
    //  exact rescore over the (deliberately UNfiltered) corpus frame. The
    //  oracle is qx70's refine formula over an index built WITHOUT the
    //  retracted ids: a hash match proves both the exact-delete contract
    //  AND that retracted ids cannot re-enter through the rescore.)
    "qx83_searchref_retained" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // shares the full-corpus self-contained build with qx93
      val work = StoreMemo.materialize(dir, Seq(
        scBuild(s, "emb", emb, cents, codebook),
        scTombstone(s, "emb%9=4",
          emb.filter(col("vec_id") % 9 === 4).select("vec_id"))))
      // exec under the SERVING session conf (round 14; see
      // ServingSessions) - plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        graft.operators.Quantize.searchSelfContainedRefined(s, s"$work/store",
            emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
            emb, "embedding", PQ_K, IVFPQ_NPROBE, REFINE_DEPTH)
          .withColumnRenamed("rank", "knn_rank")
          .orderBy("query_id", "knn_rank"))
    }),

    // ---- Quantizer retrain (recell) under the oracle ---------------------
    // (the round-10 lifecycle closer: build → append → tombstone → RECELL
    //  — the store's coarse cells and PQ codebook are RETRAINED from the
    //  live corpus and swapped in crash-safely, tombstones cleared — then
    //  a slice of the formerly-deleted ids is RE-APPENDED (legal only
    //  because the recell really dropped their tombstones, the qx109
    //  trick) and the store serves through the RETRAINED quantizers at
    //  full probe + full refine depth, which makes the served ranking
    //  the closed-form exact kNN over the live set. A hash match proves
    //  the whole maintenance chain end-to-end; the retrained geometry's
    //  rebuild-equality at partial probes is BatchingOpsSpec's gate.)
    "qx113_ivfpq_recell" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val isAppend = col("vec_id") % 4 === 1
      val isDel = col("vec_id") % 9 === 4
      val isReadd = col("vec_id") % 2 === 0
      val work = StoreMemo.materialize(dir, Seq(
        scBuild(s, "emb%4!=1", emb.filter(!isAppend), cents, codebook),
        scAppend(s, "emb%4=1", emb.filter(isAppend)),
        scTombstone(s, "emb%9=4", emb.filter(isDel).select("vec_id")),
        StoreMemo.step(s"vec.recell|cells=$RECELL_CELLS|codes=$RECELL_CODES|" +
          s"ci=$RECELL_COARSE_ITER|pi=$RECELL_PQ_ITER")(w =>
          graft.operators.Quantize.recellIvfPqStore(s, s"$w/store", emb,
            "embedding", RECELL_CELLS, RECELL_CODES, retrainCodebook = true,
            coarseMaxIter = RECELL_COARSE_ITER, pqMaxIter = RECELL_PQ_ITER)),
        scAppend(s, "emb%9=4&%2=0", emb.filter(isDel && isReadd))))
      // exec under the SERVING session conf (round 14; see
      // ServingSessions) - plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        graft.operators.Quantize.searchSelfContainedRefined(s, s"$work/store",
            emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
            emb, "embedding", PQ_K, RECELL_CELLS, 1000000)
          .withColumnRenamed("rank", "knn_rank")
          .orderBy("query_id", "knn_rank"))
    }),

    // ---- Fully self-contained store lifecycle under the oracle -----------
    // (qx113 with the lake pointer REMOVED: the store is built with the
    //  raw-vector SIDECAR, so the recell retrains from the store's own
    //  `.vectors` (recellIvfPqStoreFromSidecar) and the final serving is
    //  the sidecar-rescored searchSelfContainedRefinedStored — no corpus
    //  frame appears after the build. The sidecar must survive the append
    //  (it follows), the delete (dead rows unreachable), the recell (it is
    //  rewritten to survivors under the retrained cells) and the
    //  re-append after it — a hash match against qx113's closed-form
    //  exact-kNN oracle proves the store is autonomous end-to-end.)
    "qx116_sidecar_lifecycle" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val isAppend = col("vec_id") % 4 === 1
      val isDel = col("vec_id") % 9 === 4
      val isReadd = col("vec_id") % 2 === 0
      // build+append+tombstone prefix shared verbatim with qx124 — the
      // two maintenance strategies (full recell vs cell split) fork from
      // one cached store state
      val work = StoreMemo.materialize(dir, Seq(
        scBuild(s, "emb%4!=1", emb.filter(!isAppend), cents, codebook,
          storeVectors = true),
        scAppend(s, "emb%4=1", emb.filter(isAppend)),
        scTombstone(s, "emb%9=4", emb.filter(isDel).select("vec_id")),
        StoreMemo.step(s"vec.recellSidecar|cells=$RECELL_CELLS|" +
          s"codes=$RECELL_CODES|ci=$RECELL_COARSE_ITER|pi=$RECELL_PQ_ITER")(w =>
          graft.operators.Quantize.recellIvfPqStoreFromSidecar(s, s"$w/store",
            RECELL_CELLS, RECELL_CODES, retrainCodebook = true,
            coarseMaxIter = RECELL_COARSE_ITER, pqMaxIter = RECELL_PQ_ITER)),
        scAppend(s, "emb%9=4&%2=0", emb.filter(isDel && isReadd))))
      // exec under the SERVING session conf (round 14; see
      // ServingSessions) - plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        graft.operators.Quantize.searchSelfContainedRefinedStored(s, s"$work/store",
            emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
            PQ_K, RECELL_CELLS, 1000000)
          .withColumnRenamed("rank", "knn_rank")
          .orderBy("query_id", "knn_rank"))
    }),

    // ---- INCREMENTAL recell (cell split) under the oracle ----------------
    // (round 11: qx116's lifecycle with the full-store recell replaced by
    //  splitDriftedCells — only the overfull cells retrain sub-centroids
    //  from their own sidecar vectors and rewrite; cold cells keep their
    //  build-time files. The threshold is set low so the natural
    //  occupancy skew of the 8 seeded cells genuinely exercises the
    //  split at every SF. Serving at FULL probe + FULL refine makes the
    //  changed geometry cancel out of the formula — the same closed-form
    //  exact-kNN oracle as qx113/qx116, which is exactly the point:
    //  partial recell must be invisible to answers.)
    "qx124_ivfpq_cell_split" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val isAppend = col("vec_id") % 4 === 1
      val isDel = col("vec_id") % 9 === 4
      val isReadd = col("vec_id") % 2 === 0
      // first three steps are qx116's chain verbatim — the split forks
      // from the cached post-tombstone store state
      val work = StoreMemo.materialize(dir, Seq(
        scBuild(s, "emb%4!=1", emb.filter(!isAppend), cents, codebook,
          storeVectors = true),
        scAppend(s, "emb%4=1", emb.filter(isAppend)),
        scTombstone(s, "emb%9=4", emb.filter(isDel).select("vec_id")),
        StoreMemo.step("vec.cellSplit|over=1.05|ways=2")(w =>
          { graft.operators.Quantize.splitDriftedCells(s, s"$w/store",
              overshoot = 1.05, splitWays = 2); () }),
        // the split vacuums tombstoned rows only inside the cells it
        // rewrites; the sweep purges the rest and clears the tombstone set
        // (orphans included), which is what makes the re-append legal —
        // the same contract qx113 exercises through the full recell
        StoreMemo.step("vec.sweep|frac=1e-9")(w =>
          { graft.operators.Quantize.retentionSweep(s, s"$w/store", "vec_id",
              maxTombstoneFraction = 1e-9); () }),
        scAppend(s, "emb%9=4&%2=0", emb.filter(isDel && isReadd))))
      // exec under the SERVING session conf (round 14; see
      // ServingSessions) - plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        graft.operators.Quantize.searchSelfContainedRefinedStored(s, s"$work/store",
            emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
            PQ_K, 1000000, 1000000)
          .withColumnRenamed("rank", "knn_rank")
          .orderBy("query_id", "knn_rank"))
    }),

    // ---- Streaming vector ingest under the oracle ------------------------
    // (the qx68 precedent for the ANN store: embeddings arrive as a FILE
    //  stream, one landing file per micro-batch, each batch encoded
    //  against the frozen quantizers and landed in its (cell, batch)
    //  partitions; the probed search over the stream-fed store must
    //  hash-match qx67's one-shot full-corpus formula — batch boundaries
    //  provably invisible to queries)
    "qx78_ivfpq_stream_ingest" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      val work = StoreMemo.materialize(dir, Seq(
        StoreMemo.step(s"vec.streamIdx|emb|c=$IVFPQ_CENTROIDS|cb=$PQ_CODES|" +
          s"d=$PQ_DIMS|bl=$PQ_BLOCKS|files=4")(w => {
          val landing = s"$w/landing"
          emb.select("vec_id", "embedding").repartition(4).write.parquet(landing)
          val q = graft.streaming.StreamingVectorIngest.start(
            s.readStream.schema(s.read.parquet(landing).schema)
              .option("maxFilesPerTrigger", 1).parquet(landing),
            "vec_id", "embedding",
            cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
            PQ_DIMS, PQ_BLOCKS, s"$w/index", s"$w/ckpt")
          try q.processAllAvailable() finally q.stop()
        })))
      graft.streaming.StreamingVectorIngest.searchIngested(s, s"$work/index",
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding", "vec_id",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Streaming vector SEARCH under the oracle ------------------------
    // (qx78's twin, closing the retrieval loop: the QUERIES are the
    //  stream. A self-contained store is built once; query vectors arrive
    //  as a file stream, each micro-batch is answered through the batch
    //  deployment path and landed in its own retry-idempotent result
    //  partition. The accumulated result log must hash-match qx67's
    //  one-shot full-corpus search formula — micro-batch boundaries
    //  provably invisible to answers.)
    "qx93_stream_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // step 1 is qx83's full-corpus build signature verbatim — the query
      // stream replays against the shared cached store
      val work = StoreMemo.materialize(dir, Seq(
        scBuild(s, "emb", emb, cents, codebook),
        StoreMemo.step(s"vec.streamSearch|emb<$PQ_QUERY_SET|k=$PQ_K|" +
          s"np=$IVFPQ_NPROBE|files=4")(w => {
          val landing = s"$w/queries"
          emb.filter(col("vec_id") < PQ_QUERY_SET).select("vec_id", "embedding")
            .repartition(4).write.parquet(landing)
          val q = graft.streaming.StreamingVectorSearch.start(
            s.readStream.schema(s.read.parquet(landing).schema)
              .option("maxFilesPerTrigger", 1).parquet(landing),
            "vec_id", "embedding",
            s"$w/store", s"$w/out", s"$w/ckpt", PQ_K, IVFPQ_NPROBE)
          try q.processAllAvailable() finally q.stop()
        })))
      graft.streaming.StreamingVectorSearch.results(s, s"$work/out")
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- IVF-PQ retraction: shrink the stored index at cell cost ---------
    // (the other half of index maintenance: dedup/decontamination RETRACT
    //  documents, and their vectors must leave the inverted lists without
    //  a rebuild. Build the full index, delete every vec_id % 7 == 3 —
    //  a set that includes centroid- and codebook-source ids, which is
    //  the point: the frozen quantizers keep those VECTORS as build-time
    //  artifacts even after the corpus rows leave — then probe-search the
    //  shrunk store. The oracle is the full search formula over only the
    //  surviving corpus: delete-then-search ≡ built-without-them.)
    "qx74_ivfpq_delete" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // shares the full-corpus index build with qx82
      val work = StoreMemo.materialize(dir, Seq(
        idxBuild("emb", emb, cents, codebook),
        StoreMemo.step("vec.delIdx|emb%7=3")(w =>
          graft.operators.Quantize.deleteFromIvfPqIndex(s, s"$w/index",
            emb.filter(col("vec_id") % 7 === 3).select("vec_id"), "vec_id"))))
      graft.operators.Quantize.ivfPqSearchStored(s, s"$work/index",
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding", "vec_id",
          cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Corpus drift monitor: vocabulary movers between snapshots -------
    // (two corpus slices stand in for yesterday's and today's crawl; the
    //  hashed-unigram distributions are compared under add-1 smoothing and
    //  the top movers by |log ratio| surface. Each corpus scans once into
    //  a <= buckets-row census; nothing corpus-sized shuffles)
    "qx72_vocab_drift" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      TextAnalysis.vocabDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", DRIFT_BUCKETS, DRIFT_TOP)
    }),

    // ---- IVF+PQ with exact-rescore refinement -----------------------------
    // (the FAISS refine pattern: ADC produces a 12-deep shortlist without
    //  touching corpus floats; one broadcast-shortlist pass over the corpus
    //  rescores exactly and re-ranks to top-3 — quantization error decides
    //  who makes the shortlist, never the final order)
    "qx70_ivfpq_refine" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < PQ_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      graft.operators.Quantize.ivfPqSearchRefined(
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
          t(s, dir, "embeddings"), "vec_id", "embedding",
          cents, "centroid_id", "cen_emb",
          codebook, "code_id", "cb_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE, REFINE_DEPTH)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Residual IVF+PQ: encode (vector − cell centroid) ----------------
    // (FAISS's by_residual refinement of qx67: same routing, but the codes
    //  quantize residuals, so reconstruction = centroid + code. Codebook =
    //  residuals of four mid-corpus seed vectors w.r.t. their own assigned
    //  cells — residual-space by construction, computed identically in
    //  both engines. float→double subtraction is exact, dots are the
    //  sequential folds, cross-block sums decimal: fully hash-portable.)
    "qx69_ivfpq_residual" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < IVFPQ_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val seeds = emb.filter(
        col("vec_id") >= RESCB_SEED_FROM && col("vec_id") < RESCB_SEED_FROM + PQ_CODES)
      val resCodebook = graft.operators.Similarity.ivfAssign(
          seeds, "vec_id", "embedding", cents, "centroid_id", "cen_emb")
        .join(broadcast(cents), "centroid_id")
        .withColumn("c_emb", expr(
          "zip_with(embedding, cen_emb, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
        .select(col("vec_id").as("code_id"), col("c_emb"))
      graft.operators.Quantize.ivfPqSearchResidual(
          emb.filter(col("vec_id") < PQ_QUERY_SET), "vec_id", "embedding",
          t(s, dir, "embeddings"), "vec_id", "embedding",
          cents, "centroid_id", "cen_emb",
          resCodebook, "code_id", "c_emb",
          PQ_DIMS, PQ_BLOCKS, PQ_K, IVFPQ_NPROBE)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- Flagship composition v2: the modern curation pipeline ----------
    // Gopher rule pack ∩ best-of-group near-dup canonical ∩ DSIR
    // resample → token-budget split → per-split census. Every stage is an
    // operator proven alone (qx57/qx59/qx61/qx62); this gates their
    // COMPOSITION end to end, the way qx34 gates the round-2 stages.
    "qx65_curation_v2" -> ((s, dir) => {
      val d = sparkD
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      // gate 1: rule pack + non-empty, one tokenize in the scan filter
      val keepExpr = TextAnalysis.gopherSignalSelect("text", "__toks",
        PipelineQueries.GOPHER_MIN_TOKENS, PipelineQueries.GOPHER_MAX_TOKENS,
        PipelineQueries.GOPHER_MIN_AVG_LEN, PipelineQueries.GOPHER_MAX_AVG_LEN,
        PipelineQueries.GOPHER_MAX_SYMBOL_RATIO,
        PipelineQueries.GOPHER_MIN_STOP_HITS)(d)
        .find(_._2 == "keep").get._1
      val gated = docs
        .withColumn("__toks", expr(TX.tokensAuto("text")(d)))
        .withColumn("n_tokens", expr(s"CAST(${d.size("__toks")} AS BIGINT)"))
        .filter(expr(keepExpr) === 1L && col("n_tokens") > 0)
        .select("doc_id", "n_tokens")
      // gate 2: within each near-dup group only the best member survives
      val groups = graft.operators.Dedup.dedupGroups(docs, "text", "doc_id",
        k = ExtensionQueries.MINHASH_K, shingleN = ExtensionQueries.SHINGLE_N,
        rowsPerBand = ExtensionQueries.ROWS_PER_BAND,
        threshold = PipelineQueries.NEARDUP_JACCARD)
      val quality = docs.select(col("doc_id"),
        expr(TX.tokenCountAuto("text")(d)).as("q_tokens"))
      val keepers = groups.join(quality, "doc_id")
        .groupBy("group_id")
        .agg(min_by(col("doc_id"),
          struct((-col("q_tokens")).as("q"), col("doc_id").as("tb"))).as("keep_id"))
        .select(col("keep_id").as("doc_id"))
      val dropped = groups.select("doc_id")
        .join(keepers, Seq("doc_id"), "left_anti")
      // gate 3: DSIR resample keep decision (qx61's schedule)
      val w = TextAnalysis.dsirWeights(docs, "text", "doc_id",
        col("lang") === "en", DSIR_BUCKETS)
      val rate = DSIR_RATES.foldRight(
          when(col("log_weight").isNotNull, DSIR_FLOOR_RATE).otherwise(0L)) {
        case ((thr, r), elseExpr) => when(col("log_weight") >= thr, r).otherwise(elseExpr)
      }
      val dsirKeep = docs.select("doc_id")
        .join(w.select(col("doc_id"), col("log_weight")), Seq("doc_id"), "left")
        .withColumn("rate", rate)
        .filter(expr(s"${TX.polyHashAuto("concat('dsir', CAST(`doc_id` AS STRING))")(d)} % 1000")
          < col("rate"))
        .select("doc_id")
      val survivors = gated
        .join(dropped, Seq("doc_id"), "left_anti")
        .join(dsirKeep, Seq("doc_id"), "left_semi")
      // split the surviving tape at exact token-mass fractions, census
      val cum = graft.operators.Packing.prefixSum(
        survivors, "doc_id", "n_tokens", "cum_tokens")
      val tot = survivors.agg(sum(col("n_tokens")).as("total"))
      cum.crossJoin(broadcast(tot))
        .withColumn("split",
          when(col("cum_tokens") * 100 <= col("total") * 80, "train")
            .when(col("cum_tokens") * 100 <= col("total") * 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("min_doc"))
        .orderBy("split")
    }),

    // ---- Verified-pair Jaccard histogram: the threshold-tuning census ---
    // (run the near-dup pipeline with NO threshold and bucket every
    //  verified candidate pair by similarity decile — the diagnostic that
    //  tells you where to set the dedup threshold and how selective the
    //  banding is. Integer cross-multiplied buckets: no float compares.)
    "qx66_jaccard_histogram" -> ((s, dir) =>
      graft.operators.Dedup.nearDupPipeline(t(s, dir, "documents"), "text", "doc_id",
          k = ExtensionQueries.MINHASH_K, shingleN = ExtensionQueries.SHINGLE_N,
          rowsPerBand = ExtensionQueries.ROWS_PER_BAND, threshold = 0.0)
        .withColumn("bucket", expr("(inter_size * 10) div union_size"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"),
          min(col("jaccard")).as("min_j"), max(col("jaccard")).as("max_j"),
          min(col("doc_a")).as("min_doc"))
        .orderBy("bucket")),

    // ---- Quality-canonical selection within near-dup groups -------------
    // (production keeps the BEST duplicate, not the arbitrary smallest id:
    //  per group, the doc with the most tokens wins, ties to smaller id —
    //  an argmax via partial-aggregable min_by, no window over the corpus)
    "qx59_group_canonical" -> ((s, dir) => {
      val d = sparkD
      graft.functions.GraftFunctions.register(s)
      val docs = t(s, dir, "documents")
      val groups = graft.operators.Dedup.dedupGroups(docs, "text", "doc_id",
        k = ExtensionQueries.MINHASH_K, shingleN = ExtensionQueries.SHINGLE_N,
        rowsPerBand = ExtensionQueries.ROWS_PER_BAND,
        threshold = PipelineQueries.NEARDUP_JACCARD)
      val quality = docs.select(col("doc_id"),
        expr(TX.tokenCountAuto("text")(d)).as("n_tokens"))
      groups.join(quality, "doc_id")
        .groupBy("group_id")
        .agg(count(lit(1)).as("group_size"),
          min_by(
            struct(col("doc_id").as("keep_id"), col("n_tokens").as("keep_tokens")),
            struct((-col("n_tokens")).as("q"), col("doc_id").as("tb"))).as("__w"))
        .select(col("group_id"), col("group_size"),
          col("__w.keep_id").as("keep_id"), col("__w.keep_tokens").as("keep_tokens"))
        .orderBy("group_id")
    })
  )

  /** Shared CTE prefix of qx58/qx61: hashed-bigram features, the
    * target/source census, and corpus totals. */
  private def dsirCtes: String = {
    val d = duckD
    val B = DSIR_BUCKETS
    s"""td AS (SELECT doc_id, (lang = 'en') AS tgt,
       |        ${TX.tokens("text")(d)} AS __toks FROM documents),
       |inst AS (SELECT doc_id, tgt, unnest(${TX.shingles("__toks", 2)(d)}) AS sh
       |         FROM td),
       |f AS (SELECT doc_id, tgt, (${TX.polyHash("sh")(d)}) % $B AS f FROM inst),
       |census AS (SELECT f,
       |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
       |    CAST(SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_s
       |  FROM f GROUP BY f),
       |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
       |               CAST(SUM(c_s) AS BIGINT) AS n_s FROM census)""".stripMargin
  }

  /** The per-doc weight select shared by both DSIR oracles (identical
    * grouping in both, so the 6dp rounding sees the same sums). */
  private def dsirWeightSelect: String = {
    val B = DSIR_BUCKETS
    s"""SELECT doc_id, tgt AS is_target, COUNT(*) AS n_features,
       |  ROUND(SUM(ln(CAST(c.c_t + 1 AS DOUBLE) / CAST(n_t + $B AS DOUBLE))
       |          - ln(CAST(c.c_s + 1 AS DOUBLE) / CAST(n_s + $B AS DOUBLE))), 6)
       |    AS log_weight
       |FROM f JOIN census c USING (f) CROSS JOIN tot
       |GROUP BY doc_id, tgt""".stripMargin
  }


  /** qx69's residual IVF+PQ search oracle, with the query set as a
    * parameter: Some(m) restricts queries to vec_id < m (the broadcast
    * search's small set); None runs EVERY corpus vector as a query (the
    * qx88 batch search). */
  private def ivfPqResidualOracle(querySetMax: Option[Int]): String = {
    val d = duckD
    val w = PQ_DIMS / PQ_BLOCKS
    // residual sub-vector for block `block` of vector V against centroid
    // C: element-by-element double subtraction over the block's window —
    // value-identical to the Spark side's zip_with-then-slice
    def resSub(v: String, c: String): String =
      d.map(d.seq("1", w.toString), "i",
        s"CAST(${d.el(v, s"block * $w + i")} AS DOUBLE) - " +
        s"CAST(${d.el(c, s"block * $w + i")} AS DOUBLE)")
    val csub = d.slice("cv", s"block * $w + 1", w)
    s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")(d)} AS norm2 FROM embeddings),
         |cen AS (SELECT vec_id AS centroid_id, embedding AS c_vec, norm2 AS c_norm2
         |        FROM n WHERE vec_id < $IVFPQ_CENTROIDS),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT n.vec_id, cen.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |        (CASE WHEN n.norm2 > 0 AND c_norm2 > 0
         |              THEN ${TX.dot("n.embedding", "c_vec")(d)} / (sqrt(n.norm2) * sqrt(c_norm2)) END)
         |        DESC NULLS LAST, centroid_id) AS rn
         |    FROM n CROSS JOIN cen)
         |  WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, centroid_id, CAST(rn AS BIGINT) AS probe_rank FROM (
         |    SELECT q.vec_id AS query_id, cen.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
         |        COALESCE(CASE WHEN q.norm2 > 0 AND c_norm2 > 0
         |              THEN ${TX.dot("q.embedding", "c_vec")(d)} / (sqrt(q.norm2) * sqrt(c_norm2)) END, -2.0)
         |        DESC, centroid_id ASC) AS rn
         |    FROM n q CROSS JOIN cen${querySetMax.map(m => s" WHERE q.vec_id < $m").getOrElse("")})
         |  WHERE rn <= $IVFPQ_NPROBE),
         |b AS (SELECT CAST(unnest(generate_series(0, ${PQ_BLOCKS - 1})) AS BIGINT) AS block),
         |rcb AS (
         |  SELECT e.vec_id AS code,
         |    ${d.map(d.seq("1", PQ_DIMS.toString), "i",
               s"CAST(${d.el("e.embedding", "i")} AS DOUBLE) - CAST(${d.el("c.c_vec", "i")} AS DOUBLE)")} AS cv
         |  FROM assigned a JOIN embeddings e ON a.vec_id = e.vec_id
         |  JOIN cen c ON a.centroid_id = c.centroid_id
         |  WHERE e.vec_id >= $RESCB_SEED_FROM AND e.vec_id < ${RESCB_SEED_FROM + PQ_CODES}),
         |cs AS (SELECT code, block, $csub AS csub FROM rcb CROSS JOIN b),
         |es AS (
         |  SELECT e.vec_id, a.centroid_id, block, ${resSub("e.embedding", "c.c_vec")} AS sub
         |  FROM embeddings e JOIN assigned a ON e.vec_id = a.vec_id
         |  JOIN cen c ON a.centroid_id = c.centroid_id CROSS JOIN b),
         |scored AS (
         |  SELECT vec_id, centroid_id, es.block AS block, code,
         |    ${TX.dot("sub", "sub")(d)} - 2.0 * ${TX.dot("sub", "csub")(d)}
         |      + ${TX.dot("csub", "csub")(d)} AS d2
         |  FROM es JOIN cs ON es.block = cs.block),
         |codes AS (SELECT vec_id, centroid_id, block, code
         |          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, block
         |                  ORDER BY d2 ASC, code ASC) AS rn FROM scored)
         |          WHERE rn = 1),
         |qs AS (
         |  SELECT p.query_id, p.centroid_id, p.probe_rank, block,
         |    ${resSub("q.embedding", "c.c_vec")} AS qsub
         |  FROM probes p JOIN embeddings q ON q.vec_id = p.query_id
         |  JOIN cen c ON p.centroid_id = c.centroid_id CROSS JOIN b),
         |tbl AS (SELECT query_id, centroid_id, probe_rank, qs.block AS block, code,
         |    CAST(${TX.dot("qsub", "qsub")(d)} - 2.0 * ${TX.dot("qsub", "csub")(d)}
         |      + ${TX.dot("csub", "csub")(d)} AS DECIMAL(30,12)) AS pd2
         |  FROM qs JOIN cs ON qs.block = cs.block),
         |summed AS (SELECT t.query_id AS query_id, codes.vec_id AS vec_id,
         |    SUM(pd2) AS d2,
         |    MIN(codes.centroid_id) AS centroid_id, MIN(t.probe_rank) AS probe_rank
         |  FROM codes
         |  JOIN tbl t ON codes.centroid_id = t.centroid_id
         |    AND codes.block = t.block AND codes.code = t.code
         |  WHERE t.query_id <> codes.vec_id
         |  GROUP BY t.query_id, codes.vec_id)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS knn_rank,
         |  ROUND(CAST(d2 AS DOUBLE), 6) AS dist2, centroid_id, probe_rank
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY d2 ASC, vec_id ASC) AS rn FROM summed)
         |WHERE rn <= $PQ_K ORDER BY query_id, knn_rank""".stripMargin
  }

  /** qx67's full IVF+PQ search oracle, optionally restricted to a surviving
    * corpus. `corpusFilter` is a predicate over a bare `vec_id` column; it
    * bites ONLY on the corpus side (`assigned` routing and `es` code
    * derivation) — queries, centroids, and the codebook are build-time
    * artifacts that keep seeing every vector, exactly the state
    * [[graft.operators.Quantize.deleteFromIvfPqIndex]] leaves the store in
    * (deleted vectors leave the inverted lists; the frozen quantizers and
    * the query set don't change). */
  private def ivfPqSearchOracle(corpusFilter: Option[String],
                                querySetMax: Option[Int] = Some(PQ_QUERY_SET)): String = {
    val d = duckD
    val w = PQ_DIMS / PQ_BLOCKS
    val sub = d.slice("embedding", s"block * $w + 1", w)
    val csub = d.slice("cv", s"block * $w + 1", w)
    val qsub = d.slice("embedding", s"block * $w + 1", w)
    val esWhere = corpusFilter.map(f => s" WHERE $f").getOrElse("")
    val asgWhere = corpusFilter.map(f => s" WHERE n.$f").getOrElse("")
    s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")(d)} AS norm2 FROM embeddings),
       |cen AS (SELECT vec_id AS centroid_id, embedding AS c_vec, norm2 AS c_norm2
       |        FROM n WHERE vec_id < $IVFPQ_CENTROIDS),
       |assigned AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT n.vec_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        (CASE WHEN n.norm2 > 0 AND c_norm2 > 0
       |              THEN ${TX.dot("n.embedding", "c_vec")(d)} / (sqrt(n.norm2) * sqrt(c_norm2)) END)
       |        DESC NULLS LAST, centroid_id) AS rn
       |    FROM n CROSS JOIN cen$asgWhere)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id, CAST(rn AS BIGINT) AS probe_rank FROM (
       |    SELECT q.vec_id AS query_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        COALESCE(CASE WHEN q.norm2 > 0 AND c_norm2 > 0
       |              THEN ${TX.dot("q.embedding", "c_vec")(d)} / (sqrt(q.norm2) * sqrt(c_norm2)) END, -2.0)
       |        DESC, centroid_id ASC) AS rn
       |    FROM n q CROSS JOIN cen${querySetMax.map(m => s" WHERE q.vec_id < $m").getOrElse("")})
       |  WHERE rn <= $IVFPQ_NPROBE),
       |b AS (SELECT unnest(generate_series(0, ${PQ_BLOCKS - 1})) AS block),
       |es AS (SELECT vec_id, CAST(block AS BIGINT) AS block, $sub AS sub
       |       FROM embeddings CROSS JOIN b$esWhere),
       |cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings
       |       WHERE vec_id < $PQ_CODES),
       |cs AS (SELECT code, CAST(block AS BIGINT) AS block, $csub AS csub
       |       FROM cb CROSS JOIN b),
       |scored AS (
       |  SELECT vec_id, es.block AS block, code,
       |    ${TX.dot("sub", "sub")(d)} - 2.0 * ${TX.dot("sub", "csub")(d)}
       |      + ${TX.dot("csub", "csub")(d)} AS d2
       |  FROM es JOIN cs ON es.block = cs.block),
       |codes AS (SELECT vec_id, block, code
       |          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, block
       |                  ORDER BY d2 ASC, code ASC) AS rn FROM scored)
       |          WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, CAST(block AS BIGINT) AS block,
       |         $qsub AS qsub
       |       FROM embeddings CROSS JOIN b${querySetMax.map(m => s" WHERE vec_id < $m").getOrElse("")}),
       |tbl AS (SELECT query_id, qs.block AS block, code,
       |    CAST(${TX.dot("qsub", "qsub")(d)} - 2.0 * ${TX.dot("qsub", "csub")(d)}
       |      + ${TX.dot("csub", "csub")(d)} AS DECIMAL(30,12)) AS pd2
       |  FROM qs JOIN cs ON qs.block = cs.block),
       |summed AS (SELECT p.query_id AS query_id, codes.vec_id AS vec_id,
       |    SUM(pd2) AS d2,
       |    MIN(a.centroid_id) AS centroid_id, MIN(p.probe_rank) AS probe_rank
       |  FROM codes
       |  JOIN assigned a ON codes.vec_id = a.vec_id
       |  JOIN probes p ON a.centroid_id = p.centroid_id AND p.query_id <> codes.vec_id
       |  JOIN tbl ON tbl.query_id = p.query_id
       |    AND codes.block = tbl.block AND codes.code = tbl.code
       |  GROUP BY p.query_id, codes.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS knn_rank,
       |  ROUND(CAST(d2 AS DOUBLE), 6) AS dist2, centroid_id, probe_rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY d2 ASC, vec_id ASC) AS rn FROM summed)
       |WHERE rn <= $PQ_K ORDER BY query_id, knn_rank""".stripMargin
  }

  /** [[ivfPqSearchOracle]]'s REFINED twin (the qx70 formula): probe-pruned
    * ADC shortlist to REFINE_DEPTH, then exact-rescore re-rank to PQ_K.
    * `corpusFilter` excludes retracted ids from the CORPUS side only
    * (assignment + codes), exactly like the delete/retention oracles —
    * queries, centroids, and codebook stay build-time artifacts. The
    * rescore side needs no extra filter: it joins the already-filtered
    * shortlist, which is precisely the "tombstoned ids cannot re-enter
    * through the refine" contract. */
  private def ivfPqRefineOracle(corpusFilter: Option[String]): String = {
    val d = duckD
    val w = PQ_DIMS / PQ_BLOCKS
    val sub = d.slice("embedding", s"block * $w + 1", w)
    val csub = d.slice("cv", s"block * $w + 1", w)
    val qsub = d.slice("embedding", s"block * $w + 1", w)
    val esWhere = corpusFilter.map(f => s" WHERE $f").getOrElse("")
    val asgWhere = corpusFilter.map(f => s" WHERE n.$f").getOrElse("")
    s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")(d)} AS norm2 FROM embeddings),
       |cen AS (SELECT vec_id AS centroid_id, embedding AS c_vec, norm2 AS c_norm2
       |        FROM n WHERE vec_id < $IVFPQ_CENTROIDS),
       |assigned AS (
       |  SELECT vec_id, centroid_id FROM (
       |    SELECT n.vec_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
       |        (CASE WHEN n.norm2 > 0 AND c_norm2 > 0
       |              THEN ${TX.dot("n.embedding", "c_vec")(d)} / (sqrt(n.norm2) * sqrt(c_norm2)) END)
       |        DESC NULLS LAST, centroid_id) AS rn
       |    FROM n CROSS JOIN cen$asgWhere)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.vec_id AS query_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        COALESCE(CASE WHEN q.norm2 > 0 AND c_norm2 > 0
       |              THEN ${TX.dot("q.embedding", "c_vec")(d)} / (sqrt(q.norm2) * sqrt(c_norm2)) END, -2.0)
       |        DESC, centroid_id ASC) AS rn
       |    FROM n q CROSS JOIN cen WHERE q.vec_id < $PQ_QUERY_SET)
       |  WHERE rn <= $IVFPQ_NPROBE),
       |b AS (SELECT unnest(generate_series(0, ${PQ_BLOCKS - 1})) AS block),
       |es AS (SELECT vec_id, CAST(block AS BIGINT) AS block, $sub AS sub
       |       FROM embeddings CROSS JOIN b$esWhere),
       |cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings
       |       WHERE vec_id < $PQ_CODES),
       |cs AS (SELECT code, CAST(block AS BIGINT) AS block, $csub AS csub
       |       FROM cb CROSS JOIN b),
       |scored AS (
       |  SELECT vec_id, es.block AS block, code,
       |    ${TX.dot("sub", "sub")(d)} - 2.0 * ${TX.dot("sub", "csub")(d)}
       |      + ${TX.dot("csub", "csub")(d)} AS d2
       |  FROM es JOIN cs ON es.block = cs.block),
       |codes AS (SELECT vec_id, block, code
       |          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, block
       |                  ORDER BY d2 ASC, code ASC) AS rn FROM scored)
       |          WHERE rn = 1),
       |qs AS (SELECT vec_id AS query_id, CAST(block AS BIGINT) AS block,
       |         $qsub AS qsub
       |       FROM embeddings CROSS JOIN b WHERE vec_id < $PQ_QUERY_SET),
       |tbl AS (SELECT query_id, qs.block AS block, code,
       |    CAST(${TX.dot("qsub", "qsub")(d)} - 2.0 * ${TX.dot("qsub", "csub")(d)}
       |      + ${TX.dot("csub", "csub")(d)} AS DECIMAL(30,12)) AS pd2
       |  FROM qs JOIN cs ON qs.block = cs.block),
       |summed AS (SELECT p.query_id AS query_id, codes.vec_id AS vec_id, SUM(pd2) AS d2
       |  FROM codes
       |  JOIN assigned a ON codes.vec_id = a.vec_id
       |  JOIN probes p ON a.centroid_id = p.centroid_id AND p.query_id <> codes.vec_id
       |  JOIN tbl ON tbl.query_id = p.query_id
       |    AND codes.block = tbl.block AND codes.code = tbl.code
       |  GROUP BY p.query_id, codes.vec_id),
       |short AS (SELECT query_id, vec_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY d2 ASC, vec_id ASC) AS rn FROM summed)
       |  WHERE rn <= $REFINE_DEPTH),
       |resc AS (SELECT s.query_id, s.vec_id,
       |    ${TX.dot("q.embedding", "q.embedding")(d)}
       |      - 2.0 * ${TX.dot("q.embedding", "c.embedding")(d)}
       |      + ${TX.dot("c.embedding", "c.embedding")(d)} AS d2x
       |  FROM short s
       |  JOIN embeddings q ON q.vec_id = s.query_id
       |  JOIN embeddings c ON c.vec_id = s.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS knn_rank,
       |  ROUND(d2x, 6) AS dist2
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY d2x ASC, vec_id ASC) AS rn FROM resc)
       |WHERE rn <= $PQ_K ORDER BY query_id, knn_rank""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    val m = oracleSqlBase
    m ++ Map(
      // qx73's contract IS qx67's result: a batch appended to a stored base
      // index must reproduce the one-shot full-corpus index exactly, so the
      // full-corpus IVF-PQ search is its oracle, verbatim.
      "qx73_ivfpq_append" -> m("qx67_ivfpq_search"),
      // qx77/qx78: compaction and stream-fed ingest both promise "the
      // stored index IS the one-shot full-corpus index" — same oracle,
      // verbatim.
      "qx77_ivfpq_compact" -> m("qx67_ivfpq_search"),
      "qx78_ivfpq_stream_ingest" -> m("qx67_ivfpq_search"),
      // qx93: streamed QUERIES against the stored index answer exactly
      // like the one-shot search — same oracle, verbatim.
      "qx93_stream_search" -> m("qx67_ivfpq_search"),
      // qx74's contract: after deleting ids from the stored index, a probed
      // search must behave as if the index had been BUILT without them —
      // the same search oracle with the deleted ids filtered off the
      // corpus side only.
      "qx74_ivfpq_delete" -> ivfPqSearchOracle(Some(s"vec_id % 7 <> 3")),
      // qx82's contract: tombstoned retraction + threshold sweep is exact
      // delete semantics WHENEVER the sweep runs and WHEREVER it drew the
      // swept/unswept line — same oracle shape as qx74, with the
      // retracted set filtered off the corpus side.
      "qx82_ivfpq_retention" -> ivfPqSearchOracle(Some(s"vec_id % 5 <> 2")),
      // qx83's contract: the round-8 HIGH-RECALL deployment search —
      // tombstone-filtered stored ADC shortlist, then exact rescore —
      // equals the refined search over an index BUILT without the
      // retracted ids. Same refine oracle as qx70 with the retracted set
      // filtered off the corpus side; the rescore corpus the Spark side
      // passes is UNfiltered, so a hash match also proves retracted ids
      // cannot re-enter through the refine.
      "qx83_searchref_retained" -> ivfPqRefineOracle(Some(s"vec_id % 9 <> 4")),
      // qx113's contract: after the recell (retrained quantizers, cleared
      // tombstones) + the re-append of a formerly-deleted slice, serving
      // at FULL probe + FULL refine depth is the closed-form exact kNN
      // over the live set — (all \ deleted) ∪ re-added — with the
      // self-match excluded. The retrained geometry cancels out of the
      // formula BY CONSTRUCTION (every cell probed, every candidate
      // rescored exactly), which is precisely what makes a kmeans-trained
      // store oracle-able at all.
      "qx113_ivfpq_recell" -> exactKnnRecellOracle,
      // qx116 re-runs qx113's lifecycle with ZERO lake access after the
      // build — sidecar-sourced recell, sidecar-rescored serving — and
      // must land on the SAME closed form: the live set is identical and
      // full probe + full refine makes the retrained geometry (and the
      // sidecar plumbing) cancel out of the formula entirely.
      "qx116_sidecar_lifecycle" -> exactKnnRecellOracle,
      // qx124 is qx113's lifecycle with the full recell replaced by the
      // INCREMENTAL one (splitDriftedCells + sweep): the live set is
      // identical and full probe + full refine makes the partially-
      // changed geometry cancel out — same closed form, proving partial
      // recell invisible to answers.
      "qx124_ivfpq_cell_split" -> exactKnnRecellOracle)
  }

  /** qx113: exact kNN over the post-recell live set — see the entry above. */
  private def exactKnnRecellOracle: String = {
    val d = duckD
    s"""WITH live AS (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % 9 <> 4 OR vec_id % 2 = 0),
       |resc AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
       |    ${TX.dot("q.embedding", "q.embedding")(d)}
       |      - 2.0 * ${TX.dot("q.embedding", "c.embedding")(d)}
       |      + ${TX.dot("c.embedding", "c.embedding")(d)} AS d2x
       |  FROM embeddings q CROSS JOIN live c
       |  WHERE q.vec_id < $PQ_QUERY_SET AND c.vec_id <> q.vec_id)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS knn_rank,
       |  ROUND(d2x, 6) AS dist2
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY d2x ASC, vec_id ASC) AS rn FROM resc)
       |WHERE rn <= $PQ_K ORDER BY query_id, knn_rank""".stripMargin
  }

  private def oracleSqlBase: Map[String, String] = Map(

    "qx58_dsir_weights" ->
      s"""WITH $dsirCtes
         |$dsirWeightSelect ORDER BY doc_id""".stripMargin,

    // same formula as qx58 minus the is_target tag (dsirScore scores any
    // document set; target membership is a training-time concept)
    "qx68_dsir_stream_scores" ->
      s"""WITH $dsirCtes
         |SELECT doc_id, COUNT(*) AS n_features,
         |  ROUND(SUM(ln(CAST(c.c_t + 1 AS DOUBLE) / CAST(n_t + $DSIR_BUCKETS AS DOUBLE))
         |          - ln(CAST(c.c_s + 1 AS DOUBLE) / CAST(n_s + $DSIR_BUCKETS AS DOUBLE))), 6)
         |    AS log_weight
         |FROM f JOIN census c USING (f) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "qx60_pack_manifest" -> {
      val d = duckD
      val toks = TX.tokens("text")(d)
      val C = PACK_CONTEXT
      s"""WITH base AS (
         |  SELECT doc_id, CAST(${d.size(toks)} AS BIGINT) AS n_tokens
         |  FROM documents),
         |nz AS (SELECT * FROM base WHERE n_tokens > 0),
         |cum AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
         |  FROM nz),
         |sp AS (
         |  SELECT doc_id, n_tokens, c - n_tokens AS start_off,
         |    unnest(generate_series(${d.idiv("(c - n_tokens)", s"$C")},
         |                           ${d.idiv("(c - 1)", s"$C")})) AS pack
         |  FROM cum)
         |SELECT pack, doc_id,
         |  GREATEST(CAST(0 AS BIGINT), pack*$C - start_off) AS slice_start,
         |  LEAST(n_tokens, (pack+1)*$C - start_off)
         |    - GREATEST(CAST(0 AS BIGINT), pack*$C - start_off) AS slice_len
         |FROM sp ORDER BY pack, doc_id""".stripMargin
    },

    "qx62_token_budget_split" -> {
      val d = duckD
      val toks = TX.tokens("text")(d)
      s"""WITH base AS (
         |  SELECT doc_id, CAST(${d.size(toks)} AS BIGINT) AS n_tokens
         |  FROM documents),
         |nz AS (SELECT * FROM base WHERE n_tokens > 0),
         |cum AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
         |  FROM nz),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM nz),
         |sp AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN c * 100 <= total * 80 THEN 'train'
         |         WHEN c * 100 <= total * 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM cum CROSS JOIN tot)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
         |FROM sp GROUP BY split ORDER BY split""".stripMargin
    },

    "qx63_pq_encode" -> {
      val d = duckD
      val w = PQ_DIMS / PQ_BLOCKS
      val sub = d.slice("embedding", s"block * $w + 1", w)
      val csub = d.slice("cv", s"block * $w + 1", w)
      s"""WITH b AS (SELECT unnest(generate_series(0, ${PQ_BLOCKS - 1})) AS block),
         |es AS (SELECT vec_id, CAST(block AS BIGINT) AS block, $sub AS sub
         |       FROM embeddings CROSS JOIN b),
         |cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings
         |       WHERE vec_id < $PQ_CODES),
         |cs AS (SELECT code, CAST(block AS BIGINT) AS block, $csub AS csub
         |       FROM cb CROSS JOIN b),
         |scored AS (
         |  SELECT vec_id, es.block AS block, code,
         |    ${TX.dot("sub", "sub")(d)} - 2.0 * ${TX.dot("sub", "csub")(d)}
         |      + ${TX.dot("csub", "csub")(d)} AS d2
         |  FROM es JOIN cs ON es.block = cs.block)
         |SELECT vec_id, block, code, ROUND(d2, 6) AS dist2
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, block
         |        ORDER BY d2 ASC, code ASC) AS rn FROM scored)
         |WHERE rn = 1 ORDER BY vec_id, block""".stripMargin
    },

    "qx66_jaccard_histogram" -> {
      val d = duckD
      val uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)"
      val inter = s"CAST(len(sa.sh) + len(sb.sh) AS BIGINT) - $uni"
      val nBands = ExtensionQueries.MINHASH_K / ExtensionQueries.ROWS_PER_BAND
      s"""WITH ${ExtensionQueries.sigCtes},
         |sig AS (SELECT doc_id, ${ExtensionQueries.sigSelect} FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until nBands).map(b =>
             s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${ExtensionQueries.bandKey(b)} AS band_key FROM sig")
             .mkString("\n UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS sh FROM t4 GROUP BY doc_id),
         |verified AS (
         |  SELECT doc_a, doc_b, $inter AS inter_size, $uni AS union_size
         |  FROM cand JOIN sets sa ON doc_a = sa.doc_id JOIN sets sb ON doc_b = sb.doc_id)
         |SELECT ${d.idiv("(inter_size * 10)", "union_size")} AS bucket,
         |  COUNT(*) AS n_pairs,
         |  MIN(CAST(inter_size AS DOUBLE)/CAST(union_size AS DOUBLE)) AS min_j,
         |  MAX(CAST(inter_size AS DOUBLE)/CAST(union_size AS DOUBLE)) AS max_j,
         |  MIN(doc_a) AS min_doc
         |FROM verified GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    "qx65_curation_v2" -> {
      val d = duckD
      val uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)"
      val inter = s"CAST(len(sa.sh) + len(sb.sh) AS BIGINT) - $uni"
      val nBands = ExtensionQueries.MINHASH_K / ExtensionQueries.ROWS_PER_BAND
      val gopherKeep = TextAnalysis.gopherSignalSelect("text", "__toks",
        PipelineQueries.GOPHER_MIN_TOKENS, PipelineQueries.GOPHER_MAX_TOKENS,
        PipelineQueries.GOPHER_MIN_AVG_LEN, PipelineQueries.GOPHER_MAX_AVG_LEN,
        PipelineQueries.GOPHER_MAX_SYMBOL_RATIO,
        PipelineQueries.GOPHER_MIN_STOP_HITS)(d)
        .find(_._2 == "keep").get._1
      val rateCase = DSIR_RATES.map { case (thr, r) =>
        s"WHEN log_weight >= $thr THEN $r"
      }.mkString("CASE ", " ", s" WHEN log_weight IS NOT NULL THEN $DSIR_FLOOR_RATE ELSE 0 END")
      val keepHash = TX.polyHash("concat('dsir', CAST(doc_id AS VARCHAR))")(d)
      s"""WITH RECURSIVE ${ExtensionQueries.sigCtes},
         |sig AS (SELECT doc_id, ${ExtensionQueries.sigSelect} FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until nBands).map(b =>
             s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${ExtensionQueries.bandKey(b)} AS band_key FROM sig")
             .mkString("\n UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS sh FROM t4 GROUP BY doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sets sa ON doc_a = sa.doc_id JOIN sets sb ON doc_b = sb.doc_id
         |  WHERE CAST($inter AS DOUBLE)/CAST($uni AS DOUBLE) >= ${PipelineQueries.NEARDUP_JACCARD}),
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM sym),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.id),
         |comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
         |tokc AS (SELECT doc_id, CAST(${d.size(TX.tokens("text")(d))} AS BIGINT)
         |           AS q_tokens FROM documents),
         |sel AS (SELECT comp.group_id, comp.id AS doc_id,
         |          ROW_NUMBER() OVER (PARTITION BY comp.group_id
         |            ORDER BY q_tokens DESC, comp.id ASC) AS rn
         |        FROM comp JOIN tokc ON comp.id = tokc.doc_id),
         |dropped AS (SELECT doc_id FROM sel WHERE rn > 1),
         |gtd AS (SELECT doc_id, text, ${TX.tokens("text")(d)} AS __toks
         |        FROM documents),
         |gk AS (SELECT doc_id, CAST(len(__toks) AS BIGINT) AS n_tokens FROM gtd
         |       WHERE $gopherKeep = 1 AND len(__toks) > 0),
         |$dsirCtes,
         |wts AS ($dsirWeightSelect),
         |rated AS (SELECT dd.doc_id, w.log_weight, $rateCase AS rate
         |          FROM documents dd LEFT JOIN wts w USING (doc_id)),
         |dkeep AS (SELECT doc_id FROM rated WHERE ($keepHash) % 1000 < rate),
         |surv AS (SELECT gk.doc_id, gk.n_tokens FROM gk
         |         WHERE gk.doc_id NOT IN (SELECT doc_id FROM dropped)
         |           AND gk.doc_id IN (SELECT doc_id FROM dkeep)),
         |cum AS (SELECT doc_id, n_tokens,
         |          CAST(SUM(n_tokens) OVER (ORDER BY doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
         |        FROM surv),
         |gtot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM surv),
         |sp AS (SELECT doc_id, n_tokens,
         |         CASE WHEN c * 100 <= total * 80 THEN 'train'
         |              WHEN c * 100 <= total * 90 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM cum CROSS JOIN gtot)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, MIN(doc_id) AS min_doc
         |FROM sp GROUP BY split ORDER BY split""".stripMargin
    },

    "qx64_pq_adc_search" -> {
      val d = duckD
      val w = PQ_DIMS / PQ_BLOCKS
      val sub = d.slice("embedding", s"block * $w + 1", w)
      val csub = d.slice("cv", s"block * $w + 1", w)
      val qsub = d.slice("embedding", s"block * $w + 1", w)
      s"""WITH b AS (SELECT unnest(generate_series(0, ${PQ_BLOCKS - 1})) AS block),
         |es AS (SELECT vec_id, CAST(block AS BIGINT) AS block, $sub AS sub
         |       FROM embeddings CROSS JOIN b),
         |cb AS (SELECT vec_id AS code, embedding AS cv FROM embeddings
         |       WHERE vec_id < $PQ_CODES),
         |cs AS (SELECT code, CAST(block AS BIGINT) AS block, $csub AS csub
         |       FROM cb CROSS JOIN b),
         |scored AS (
         |  SELECT vec_id, es.block AS block, code,
         |    ${TX.dot("sub", "sub")(d)} - 2.0 * ${TX.dot("sub", "csub")(d)}
         |      + ${TX.dot("csub", "csub")(d)} AS d2
         |  FROM es JOIN cs ON es.block = cs.block),
         |codes AS (SELECT vec_id, block, code
         |          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, block
         |                  ORDER BY d2 ASC, code ASC) AS rn FROM scored)
         |          WHERE rn = 1),
         |qs AS (SELECT vec_id AS query_id, CAST(block AS BIGINT) AS block,
         |         $qsub AS qsub
         |       FROM embeddings CROSS JOIN b WHERE vec_id < $PQ_QUERY_SET),
         |tbl AS (SELECT query_id, qs.block AS block, code,
         |    CAST(${TX.dot("qsub", "qsub")(d)} - 2.0 * ${TX.dot("qsub", "csub")(d)}
         |      + ${TX.dot("csub", "csub")(d)} AS DECIMAL(30,12)) AS pd2
         |  FROM qs JOIN cs ON qs.block = cs.block),
         |summed AS (SELECT query_id, codes.vec_id AS vec_id, SUM(pd2) AS d2
         |  FROM codes JOIN tbl ON codes.block = tbl.block AND codes.code = tbl.code
         |  GROUP BY query_id, codes.vec_id)
         |SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS knn_rank,
         |  ROUND(CAST(d2 AS DOUBLE), 6) AS dist2
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY d2 ASC, vec_id ASC) AS rn FROM summed)
         |WHERE rn <= $PQ_K ORDER BY query_id, knn_rank""".stripMargin
    },

    "qx67_ivfpq_search" -> ivfPqSearchOracle(None),
    "qx87_ivfpq_batch_search" -> ivfPqSearchOracle(None, querySetMax = None),

    "qx72_vocab_drift" -> {
      val d = duckD
      val B = DRIFT_BUCKETS
      s"""WITH ta AS (SELECT ${TX.tokens("text")(d)} AS toks FROM documents WHERE doc_id % 2 = 0),
         |tb AS (SELECT ${TX.tokens("text")(d)} AS toks FROM documents WHERE doc_id % 2 = 1),
         |ia AS (SELECT unnest(toks) AS t FROM ta),
         |ib AS (SELECT unnest(toks) AS t FROM tb),
         |ca AS (SELECT (${TX.polyHash("t")(d)}) % $B AS f, COUNT(*) AS c_a FROM ia GROUP BY 1),
         |cb AS (SELECT (${TX.polyHash("t")(d)}) % $B AS f, COUNT(*) AS c_b FROM ib GROUP BY 1),
         |j AS (SELECT COALESCE(ca.f, cb.f) AS f,
         |        CAST(COALESCE(c_a, 0) AS BIGINT) AS c_a,
         |        CAST(COALESCE(c_b, 0) AS BIGINT) AS c_b
         |      FROM ca FULL OUTER JOIN cb ON ca.f = cb.f),
         |tot AS (SELECT CAST(SUM(c_a) AS BIGINT) AS n_a,
         |               CAST(SUM(c_b) AS BIGINT) AS n_b FROM j)
         |SELECT f, c_a, c_b,
         |  ROUND(ln(CAST(c_a + 1 AS DOUBLE) / CAST(n_a + $B AS DOUBLE))
         |      - ln(CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $B AS DOUBLE)), 6) AS log_ratio
         |FROM j CROSS JOIN tot
         |ORDER BY abs(ROUND(ln(CAST(c_a + 1 AS DOUBLE) / CAST(n_a + $B AS DOUBLE))
         |      - ln(CAST(c_b + 1 AS DOUBLE) / CAST(n_b + $B AS DOUBLE)), 6)) DESC, f ASC
         |LIMIT $DRIFT_TOP""".stripMargin
    },

    "qx70_ivfpq_refine" -> ivfPqRefineOracle(None),

    "qx69_ivfpq_residual" -> ivfPqResidualOracle(Some(PQ_QUERY_SET)),
    "qx88_ivfpq_batch_residual" -> ivfPqResidualOracle(None),

    "qx61_dsir_resample" -> {
      val d = duckD
      val rateCase = DSIR_RATES.map { case (thr, r) =>
        s"WHEN log_weight >= $thr THEN $r"
      }.mkString("CASE ", " ", s" WHEN log_weight IS NOT NULL THEN $DSIR_FLOOR_RATE ELSE 0 END")
      val keepHash = TX.polyHash("concat('dsir', CAST(doc_id AS VARCHAR))")(d)
      s"""WITH $dsirCtes,
         |wts AS ($dsirWeightSelect),
         |rated AS (
         |  SELECT dd.doc_id, dd.lang, w.log_weight, $rateCase AS rate
         |  FROM documents dd LEFT JOIN wts w USING (doc_id)),
         |k AS (SELECT *, CASE WHEN ($keepHash) % 1000 < rate THEN 1 ELSE 0 END AS keep
         |      FROM rated)
         |SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN log_weight IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
         |  CAST(SUM(keep) AS BIGINT) AS n_kept,
         |  MIN(CASE WHEN keep = 1 THEN doc_id END) AS min_kept_doc
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin
    },

    "qx59_group_canonical" -> {
      val uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)"
      val inter = s"CAST(len(sa.sh) + len(sb.sh) AS BIGINT) - $uni"
      val d = duckD
      s"""WITH RECURSIVE ${ExtensionQueries.sigCtes},
         |sig AS (SELECT doc_id, ${ExtensionQueries.sigSelect} FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until ExtensionQueries.MINHASH_K / ExtensionQueries.ROWS_PER_BAND).map(b =>
             s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${ExtensionQueries.bandKey(b)} AS band_key FROM sig")
             .mkString("\n UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS sh FROM t4 GROUP BY doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sets sa ON doc_a = sa.doc_id JOIN sets sb ON doc_b = sb.doc_id
         |  WHERE CAST($inter AS DOUBLE)/CAST($uni AS DOUBLE) >= ${PipelineQueries.NEARDUP_JACCARD}),
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM sym),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.id),
         |comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
         |tokc AS (SELECT doc_id, CAST(${d.size(TX.tokens("text")(d))} AS BIGINT)
         |           AS n_tokens FROM documents),
         |sel AS (SELECT comp.group_id, comp.id AS doc_id, n_tokens,
         |          ROW_NUMBER() OVER (PARTITION BY comp.group_id
         |            ORDER BY n_tokens DESC, comp.id ASC) AS rn,
         |          COUNT(*) OVER (PARTITION BY comp.group_id) AS group_size
         |        FROM comp JOIN tokc ON comp.id = tokc.doc_id)
         |SELECT group_id, group_size, doc_id AS keep_id, n_tokens AS keep_tokens
         |FROM sel WHERE rn = 1 ORDER BY group_id""".stripMargin
    }
  )
}
