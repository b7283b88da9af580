package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-ingest latency evidence for the ANN store: replay the qx78
  * pipeline (embedding firehose → per-micro-batch PQ-encode against the
  * frozen quantizers → dynamic-overwrite landing in the cell-partitioned
  * store) and report what the correctness gate deliberately does not —
  * per-micro-batch wall and throughput, from Spark's OWN progress
  * instrument (`StreamingQuery.recentProgress`: batch wall is
  * `durationMs.triggerExecution`, rows from `numInputRows`), not ad-hoc
  * timers around the engine.
  *
  * The lifecycle is already correctness-proven (qx78's oracle: a streamed
  * store answers searches identically to a batch-built one); this main
  * gives it a THROUGHPUT number, committed as STREAMLAT.md/.json. The
  * per-batch cost claim to check in the output: batch walls track the
  * BATCH (flat across batches, first batch higher on codegen warmup),
  * never the standing store — the append-shaped plan, not a rebuild.
  *
  * Usage: runMain graft.StreamLatency [sfDir] [outDir] [nBatches]
  */
object StreamLatency {

  private val Dims = 64
  private val NBlocks = 4
  private val NCents = 8
  private val NCodes = 4

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "."
    val nBatches = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.t(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val nVec = emb.count()
    val cents = emb.filter(col("vec_id") < NCents)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
    val codebook = emb.filter(col("vec_id") < NCodes)
      .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))

    def ingest(batches: Int): Seq[(Long, Long, Long, Long, Double)] = {
      val work = java.nio.file.Files.createTempDirectory("streamlat-").toString
      val landing = s"$work/landing"
      // one landing file per micro-batch (maxFilesPerTrigger=1), so
      // the batch count is exact and batches are near-equal corpus slices
      emb.repartition(batches).write.parquet(landing)
      val q = graft.streaming.StreamingVectorIngest.start(
        spark.readStream.schema(spark.read.parquet(landing).schema)
          .option("maxFilesPerTrigger", 1).parquet(landing),
        "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
        Dims, NBlocks, s"$work/index", s"$work/ckpt")
      try q.processAllAvailable() finally q.stop()
      // progress rows with actual input only (the tail empty trigger that
      // processAllAvailable drains reports 0 rows — not a measurement)
      val progress = q.recentProgress.toSeq
        .filter(_.numInputRows > 0)
        .sortBy(_.batchId)
      require(progress.nonEmpty, "stream reported no non-empty batches")
      // the store must hold every streamed vector before the numbers count
      val stored = spark.read.parquet(s"$work/index")
        .select(countDistinct(col("vec_id"))).collect().head.getLong(0)
      require(stored == nVec,
        s"streamed store holds $stored vectors, corpus has $nVec — refusing " +
          "to report throughput for an incomplete ingest")
      progress.map { p =>
        val wallMs = Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).getOrElse(0L)
        val addMs = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
        val rps = if (wallMs > 0) p.numInputRows * 1000.0 / wallMs else -1.0
        (p.batchId, p.numInputRows, wallMs, addMs, rps)
      }
    }

    val rows = ingest(nBatches)
    rows.foreach { case (id, n, wall, add, rps) =>
      println(f"[streamlat] batch=$id%2d rows=$n%6d wall=${wall}%5d ms " +
        f"(addBatch=${add}%5d ms) rows/sec=${rps}%9.0f")
    }

    val totalRows = rows.map(_._2).sum
    val totalMs = rows.map(_._3).sum
    val steady = rows.drop(1) // first batch carries codegen warmup
    val steadyRps =
      if (steady.nonEmpty && steady.map(_._3).sum > 0)
        steady.map(_._2).sum * 1000.0 / steady.map(_._3).sum
      else totalRows * 1000.0 / math.max(1L, totalMs)
    println(f"[streamlat] total: $totalRows rows in ${totalMs / 1000.0}%.1f s " +
      f"across ${rows.size} batches; steady-state ${steadyRps}%.0f rows/sec")

    // batch-size sensitivity: same corpus in 4× fewer (4× larger) batches.
    // Per-batch wall is fixed-cost dominated (micro-batch scheduling +
    // dynamic-overwrite commit), so larger batches amortize it — the
    // steady-state rows/sec ratio between the two configs quantifies how
    // much of the wall is fixed vs per-row.
    val bigBatches = math.max(2, nBatches / 4)
    val rowsBig = ingest(bigBatches)
    val steadyBig = rowsBig.drop(1)
    val steadyBigRps =
      if (steadyBig.nonEmpty && steadyBig.map(_._3).sum > 0)
        steadyBig.map(_._2).sum * 1000.0 / steadyBig.map(_._3).sum
      else -1.0
    val steadyWall = if (steady.nonEmpty) steady.map(_._3).sum / steady.size else 0L
    val steadyBigWall = if (steadyBig.nonEmpty) steadyBig.map(_._3).sum / steadyBig.size else 0L
    println(f"[streamlat] batch-size sensitivity: ${rows.size} batches -> " +
      f"avg steady wall $steadyWall ms, ${steadyRps}%.0f rows/sec; " +
      f"$bigBatches batches -> avg steady wall $steadyBigWall ms, ${steadyBigRps}%.0f rows/sec")

    // ---- Query-path latency (the qx93 pipeline): a self-contained store
    // built once, the whole corpus streamed AS QUERIES, each micro-batch
    // answered through the batch deployment search into its own
    // retry-idempotent result partition. Same instrument, same
    // completeness-before-numbers discipline.
    val searchRows: Seq[(Long, Long, Long, Long, Double)] = {
      val work = java.nio.file.Files.createTempDirectory("streamlat-q-").toString
      graft.operators.Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
        Dims, NBlocks, residual = false, s"$work/index")
      val landing = s"$work/queries"
      emb.repartition(nBatches).write.parquet(landing)
      val q = graft.streaming.StreamingVectorSearch.start(
        spark.readStream.schema(spark.read.parquet(landing).schema)
          .option("maxFilesPerTrigger", 1).parquet(landing),
        "vec_id", "embedding",
        s"$work/index", s"$work/out", s"$work/ckpt", k = 3, nProbe = 2)
      try q.processAllAvailable() finally q.stop()
      val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0).sortBy(_.batchId)
      require(progress.nonEmpty, "search stream reported no non-empty batches")
      val answered = graft.streaming.StreamingVectorSearch
        .results(spark, s"$work/out")
        .select(countDistinct(col("query_id"))).collect().head.getLong(0)
      require(answered == nVec,
        s"result log answers $answered queries, corpus streamed $nVec — " +
          "refusing to report latency for an incomplete search run")
      progress.map { p =>
        val wallMs = Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).getOrElse(0L)
        val addMs = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
        val qps = if (wallMs > 0) p.numInputRows * 1000.0 / wallMs else -1.0
        (p.batchId, p.numInputRows, wallMs, addMs, qps)
      }
    }
    searchRows.foreach { case (id, n, wall, add, qps) =>
      println(f"[streamlat] search batch=$id%2d queries=$n%6d wall=${wall}%5d ms " +
        f"(addBatch=${add}%5d ms) queries/sec=${qps}%9.0f")
    }
    val steadySearch = searchRows.drop(1)
    val steadyQps =
      if (steadySearch.nonEmpty && steadySearch.map(_._3).sum > 0)
        steadySearch.map(_._2).sum * 1000.0 / steadySearch.map(_._3).sum
      else -1.0
    println(f"[streamlat] search steady-state ${steadyQps}%.0f queries/sec " +
      f"over ${searchRows.size} batches")

    // ---- Lexical-ingest latency (the qx110 pipeline): documents stream
    // into a pre-built BM25 store, one epoch-addressed append per
    // micro-batch. Same instrument, same completeness-before-numbers
    // discipline: the store's live n_docs must equal the corpus before
    // any wall is reported. The expected shape is the ANN ingest's:
    // per-batch cost tracks the BATCH (census + df/scalar deltas of its
    // own partitions), so walls stay flat while the store grows.
    val bm25Rows: Seq[(Long, Long, Long, Long, Double)] = {
      import graft.functions.{Dialect, TextExprs => TX}
      graft.functions.GraftFunctions.register(spark)
      val docsT = Tables.t(spark, sfDir, "documents").select("doc_id", "text")
      val isBase = col("doc_id") % 101 === 0
      val nLive = docsT.filter(
        expr(TX.tokenCountAuto("text")(Dialect(spark = true))) > 0).count()
      val work = java.nio.file.Files.createTempDirectory("streamlat-b-").toString
      graft.operators.Retrieval.writeBm25Store(docsT.filter(isBase),
        "text", "doc_id", s"$work/store", 64)
      val landing = s"$work/landing"
      docsT.filter(!isBase).repartition(nBatches).write.parquet(landing)
      val q = graft.streaming.StreamingBm25Ingest.start(
        spark.readStream.schema(spark.read.parquet(landing).schema)
          .option("maxFilesPerTrigger", 1).parquet(landing),
        "text", "doc_id", s"$work/store", s"$work/ckpt")
      try q.processAllAvailable() finally q.stop()
      val progress = q.recentProgress.toSeq.filter(_.numInputRows > 0).sortBy(_.batchId)
      require(progress.nonEmpty, "bm25 stream reported no non-empty batches")
      val stored = graft.operators.Retrieval.liveStats(spark, s"$work/store")
        .collect().head.getLong(0)
      require(stored == nLive,
        s"streamed BM25 store holds $stored live docs, corpus has $nLive — " +
          "refusing to report throughput for an incomplete ingest")
      progress.map { p =>
        val wallMs = Option(p.durationMs.get("triggerExecution"))
          .map(_.toLong).getOrElse(0L)
        val addMs = Option(p.durationMs.get("addBatch")).map(_.toLong).getOrElse(-1L)
        val dps = if (wallMs > 0) p.numInputRows * 1000.0 / wallMs else -1.0
        (p.batchId, p.numInputRows, wallMs, addMs, dps)
      }
    }
    bm25Rows.foreach { case (id, n, wall, add, dps) =>
      println(f"[streamlat] bm25 batch=$id%2d docs=$n%6d wall=${wall}%5d ms " +
        f"(addBatch=${add}%5d ms) docs/sec=${dps}%9.0f")
    }
    val steadyBm25 = bm25Rows.drop(1)
    val steadyDps =
      if (steadyBm25.nonEmpty && steadyBm25.map(_._3).sum > 0)
        steadyBm25.map(_._2).sum * 1000.0 / steadyBm25.map(_._3).sum
      else -1.0
    println(f"[streamlat] bm25 steady-state ${steadyDps}%.0f docs/sec " +
      f"over ${bm25Rows.size} batches")

    val md = new StringBuilder
    md.append("# Streaming ANN-ingest latency (qx78 pipeline)\n\n")
    md.append(s"Generated by `runMain graft.StreamLatency` on `$sfDir` ")
    md.append(s"($nVec vectors, dim $Dims, $NBlocks-block PQ; one landing ")
    md.append(s"file per micro-batch, ${rows.size} batches; walls are Spark's own ")
    md.append("`StreamingQueryProgress.durationMs.triggerExecution`).\n\n")
    md.append("| batch | rows | wall ms | addBatch ms | rows/sec |\n")
    md.append("|---|---|---|---|---|\n")
    for ((id, n, wall, add, rps) <- rows)
      md.append(f"| $id | $n | $wall | $add | ${rps}%.0f |\n")
    md.append(f"\nTotal: $totalRows rows in ${totalMs / 1000.0}%.1f s; ")
    md.append(f"steady-state (excl. batch 0's codegen warmup) ${steadyRps}%.0f rows/sec.\n\n")
    md.append(f"Batch-size sensitivity (same corpus, $bigBatches batches of ")
    md.append(f"${nVec / bigBatches} rows): avg steady wall $steadyBigWall ms vs ")
    md.append(f"$steadyWall ms at ${nVec / math.max(1, rows.size)} rows/batch — ")
    md.append(f"${steadyBigRps}%.0f vs ${steadyRps}%.0f rows/sec. ")
    md.append("""The wall is dominated by FIXED micro-batch cost
(scheduling + dynamic-overwrite commit, ~0.6-0.7 s at local[8]); the
per-row encode cost is small, so throughput scales nearly linearly with
batch size until rows dominate — size the trigger for latency, not
throughput.

Reading the table: per-batch walls are flat after batch 0 —
per-batch cost tracks the BATCH (assign + encode + write its own
(cell, batch) partitions via dynamic overwrite), never the standing
store, which is what makes the ingest sustainable: the store grows
every batch while the wall does not. Batch 0 additionally pays the
pipeline's whole-stage-codegen compile. The ingested store answers
searches identically to a batch-built one (qx78's oracle row and
StreamingMultimodalSpec gate that equality); completeness is asserted
above before any number is reported.
""")
    md.append("\n## Streaming ANN-search latency (qx93 pipeline)\n\n")
    md.append(s"The query-side twin: a self-contained store built once over the ")
    md.append(s"same $nVec vectors, then the whole corpus streamed AS QUERIES ")
    md.append(s"(${searchRows.size} micro-batches, k=3, nProbe=2), each batch answered ")
    md.append("through `searchSelfContained` into its own retry-idempotent ")
    md.append("result partition. Completeness asserted (every query answered) ")
    md.append("before any number below.\n\n")
    md.append("| batch | queries | wall ms | addBatch ms | queries/sec |\n")
    md.append("|---|---|---|---|---|\n")
    for ((id, n, wall, add, qps) <- searchRows)
      md.append(f"| $id | $n | $wall | $add | ${qps}%.0f |\n")
    md.append(f"\nSteady-state (excl. batch 0's codegen warmup) ${steadyQps}%.0f ")
    md.append("""queries/sec. Per-batch walls are flat: each batch pays its own
probed-cell scan + broadcast-query ADC join + one result-partition
commit — the standing store is read cell-pruned per batch and never
rewritten, so search latency does not degrade as the ingest side grows
the store.
""")
    md.append("\n## Streaming BM25-ingest latency (qx110 pipeline)\n\n")
    md.append("The lexical ingest twin: documents stream into a pre-built ")
    md.append("BM25 store, one EPOCH-ADDRESSED append per micro-batch — ")
    md.append("postings census + df delta + scalar delta of the batch's own ")
    md.append("partitions, exactly-once on the store's dynamic overwrites. ")
    md.append("Completeness asserted (live n_docs == corpus) before any ")
    md.append("number below.\n\n")
    md.append("| batch | docs | wall ms | addBatch ms | docs/sec |\n")
    md.append("|---|---|---|---|---|\n")
    for ((id, n, wall, add, dps) <- bm25Rows)
      md.append(f"| $id | $n | $wall | $add | ${dps}%.0f |\n")
    md.append(f"\nSteady-state (excl. batch 0's codegen warmup) ${steadyDps}%.0f ")
    md.append("""docs/sec. Per-batch walls are flat while the standing store
grows every batch: the append derives everything it writes from the
batch's own epoch partitions — the delta-df design means NO re-read of
standing buckets exists anywhere in the per-batch path (SCALE.md's
round-9 section records why the materialized-df alternative would have
made this probe grow linearly).
""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/STREAMLAT.md"), md.toString)
    val bm25Json = bm25Rows.map { case (id, n, wall, add, dps) =>
      s"""{"batch":$id,"docs":$n,"wall_ms":$wall,"add_batch_ms":$add,""" +
        f""""docs_per_sec":${dps}%.0f}"""
    }.mkString("[", ",", "]")
    val searchJson = searchRows.map { case (id, n, wall, add, qps) =>
      s"""{"batch":$id,"queries":$n,"wall_ms":$wall,"add_batch_ms":$add,""" +
        f""""queries_per_sec":${qps}%.0f}"""
    }.mkString("[", ",", "]")
    val json = rows.map { case (id, n, wall, add, rps) =>
      s"""{"batch":$id,"rows":$n,"wall_ms":$wall,"add_batch_ms":$add,""" +
        f""""rows_per_sec":${rps}%.0f}"""
    }.mkString(
      s"""{"sf":"$sfDir","n_vectors":$nVec,"n_batches":${rows.size},""" +
        f""""steady_rows_per_sec":${steadyRps}%.0f,""" +
        f""""big_batch_config":{"n_batches":$bigBatches,""" +
        f""""steady_rows_per_sec":${steadyBigRps}%.0f,""" +
        f""""avg_steady_wall_ms":$steadyBigWall},""" +
        f""""search":{"steady_queries_per_sec":${steadyQps}%.0f,""" +
        s""""batches":$searchJson},""" +
        f""""bm25_ingest":{"steady_docs_per_sec":${steadyDps}%.0f,""" +
        s""""batches":$bm25Json},"batches":[""",
      ",", "]}\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/STREAMLAT.json"), json)
    println(s"[streamlat] wrote $outDir/STREAMLAT.md and $outDir/STREAMLAT.json")
    spark.stop()
  }
}
