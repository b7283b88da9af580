package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

/** Stream-stream interval join: batch/stream parity plus the state-bound
  * proof (watermarks on both sides + a two-ended time range → Spark
  * derives a state watermark and evicts buffered rows). */
class StreamJoinSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  test("batch mode matches the oracle-gated range-join shape (qx28)") {
    // the rangeJoin reference works in whole seconds — truncate the
    // interval-join inputs to the same precision, or a same-second
    // boundary pair makes the comparison diverge on sub-second fractions
    val e = Tables.events(spark, sfDir)
      .withColumn("ts", expr("timestamp_micros((unix_micros(ts) div 1000000) * 1000000)"))
    val purchases = e.filter(col("event_type") === "purchase")
    val errors = e.filter(col("event_type") === "error")
    val got = EventStreams.errorsNearPurchases(purchases, errors)
      .groupBy("purchase_id").agg(count(lit(1)).as("n"))
    // independent reference: the binned batch range join
    val p = purchases.select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 1000000").as("start_secs"))
      .withColumn("end_secs", col("start_secs") + 3600L)
    val err = errors.select(col("user_id"),
      expr("unix_micros(ts) div 1000000").as("err_secs"))
    val expected = graft.operators.Relational.rangeJoin(
        err, p, "user_id", "err_secs", "start_secs", "end_secs", 3600L)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
    val gotM = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expM = expected.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotM == expM && gotM.nonEmpty)
  }

  test("stream-static enrichment: broadcast dim join keeps all stream rows") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Long)] // (event_id, user_id)
    val events = mem.toDF().toDF("event_id", "user_id")
    val q = EventStreams.enrichedEvents(events, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 7L), (2L, 9L)) // user 9 has no dim row
      q.processAllAvailable()
      val got = spark.table("enrich_out").select("user_id", "tier")
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got == Map(7L -> Some("gold"), 9L -> None))
    } finally q.stop()
  }

  test("streaming near-dup-on-ingest: later batches flag dups against the growing index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snd").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val other = "completely different words about spark catalyst plans and shuffles here"
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingNearDup.start(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$dir/index", s"$dir/dups", s"$dir/ckpt", threshold = 0.5)
    try {
      mem.addData((1L, base), (2L, other)) // first batch: nothing to match against
      q.processAllAvailable()
      // a batch with zero dups writes no partition at all (dynamic
      // overwrite of an empty frame) — the dups store holds no data yet
      def dupsCount: Long =
        try spark.read.parquet(s"$dir/dups").count()
        catch {
          case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
               e.getCondition == "UNABLE_TO_INFER_SCHEMA" => 0L
        }
      assert(dupsCount == 0)
      assert(spark.read.parquet(s"$dir/index").select("doc_id").distinct().count() == 2)
      // batch 2: one cross-batch near-dup (10~1) AND an intra-batch pair
      // (12~13 arrive together — the self-match must catch them)
      mem.addData((10L, near), (11L, "fresh unrelated text with novel content entirely"),
        (12L, "same batch twin documents must still be caught by the gate one"),
        (13L, "same batch twin documents must still be caught by the gate two"))
      q.processAllAvailable()
      val dups = spark.read.parquet(s"$dir/dups")
        .select("doc_new", "doc_old").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups == Set((10L, 1L), (13L, 12L)))
      assert(spark.read.parquet(s"$dir/index").select("doc_id").distinct().count() == 6)
      // both sinks carry the at-least-once dedupe key
      assert(spark.read.parquet(s"$dir/dups").columns.contains("batch_id"))
      assert(spark.read.parquet(s"$dir/index").columns.contains("batch_id"))
    } finally q.stop()
  }

  test("streaming vector ingest: streamed store answers queries identically to the batch build; retry idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Quantize
    import graft.streaming.StreamingVectorIngest
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val all = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dir = java.nio.file.Files.createTempDirectory("svi").toString
    val mem = MemoryStream[(Long, Seq[Float])]
    val slices = all.grouped(200).toSeq // 500 vectors → 3 micro-batches
    val q = StreamingVectorIngest.start(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      s"$dir/index", s"$dir/ckpt")
    try {
      slices.foreach { g => mem.addData(g.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    // the gate: a store fed vector-by-stream answers EXACTLY like the
    // one-shot in-memory search over the same corpus — batch boundaries
    // are invisible to queries
    val queries = emb.filter(col("vec_id") < 10)
    def streamedSearch = StreamingVectorIngest.searchIngested(
        spark, s"$dir/index", queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet
    val inMem = Quantize.ivfPqSearch(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet
    val streamed = streamedSearch
    assert(streamed.nonEmpty && streamed == inMem,
      "stream-ingested store must answer identically to the in-memory full-corpus search")
    // at-least-once retry: re-running the LAST batch under its own id
    // replaces its partitions — row count and answers unchanged (an
    // append-shaped retry would double the batch's vectors)
    val before = spark.read.parquet(s"$dir/index").count()
    val last = slices.last.toSeq.toDF("vec_id", "embedding")
    StreamingVectorIngest.processBatch(last, (slices.size - 1).toLong,
      "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, s"$dir/index", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/index").count() == before,
      "retried batch must replace its partitions, not append a second copy")
    assert(streamedSearch == inMem)
    // cross-batch re-delivery (a source VIOLATING the replayable/unique-id
    // contract): the same vectors land again under a NEW batchId, which
    // dynamic overwrite cannot collapse — the store now carries duplicate
    // (id, block) rows, but searchIngested's read-time dedup keeps the
    // rankings exact
    StreamingVectorIngest.processBatch(last, 999L,
      "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, s"$dir/index", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/index").count() > before,
      "fixture: the misdelivered batch must actually duplicate store rows")
    assert(streamedSearch == inMem,
      "searchIngested must dedup cross-batch duplicates — a doubled ADC " +
        "distance would corrupt the ranking")
    // SELF-CONTAINED streaming: save quantizers beside a fresh store path,
    // stream into it with no quantizer frames — answers identical again;
    // a residual-flagged store refuses the raw-encoding stream loudly
    val sc = s"$dir/index-sc"
    Quantize.saveQuantizers(spark, sc, cents, "cid", "cv",
      codebook, "code_id", "c_emb",
      Quantize.StoreParams(64, 4, residual = false, "vec_id"))
    val mem2 = MemoryStream[(Long, Seq[Float])]
    val q2 = StreamingVectorIngest.startSelfContained(
      mem2.toDF().toDF("vec_id", "embedding"), "embedding", sc, s"$dir/ckpt-sc")
    try {
      slices.foreach { g => mem2.addData(g.toSeq: _*); q2.processAllAvailable() }
    } finally q2.stop()
    assert(StreamingVectorIngest.searchIngested(
        spark, sc, queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet == inMem,
      "self-contained streamed store must answer like the in-memory search")
    // RESIDUAL self-contained streaming (round 8): the stored residual
    // flag picks the batch encode — the trained high-recall configuration
    // (a residual store) stream-ingests with no flag for a caller to get
    // wrong — and the stream-fed store answers exactly like the in-memory
    // residual search over the same corpus
    val resSc = s"$dir/index-res"
    Quantize.saveQuantizers(spark, resSc, cents, "cid", "cv",
      codebook, "code_id", "c_emb",
      Quantize.StoreParams(64, 4, residual = true, "vec_id"))
    val mem3 = MemoryStream[(Long, Seq[Float])]
    val q3 = StreamingVectorIngest.startSelfContained(
      mem3.toDF().toDF("vec_id", "embedding"), "embedding",
      resSc, s"$dir/ckpt-res")
    try {
      slices.foreach { g => mem3.addData(g.toSeq: _*); q3.processAllAvailable() }
    } finally q3.stop()
    val inMemRes = Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet
    assert(StreamingVectorIngest.searchIngestedResidual(
        spark, resSc, queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet == inMemRes,
      "residual stream-fed store must answer like the in-memory residual search")
    def scSearch = StreamingVectorIngest.searchIngestedSelfContained(
      spark, resSc, queries, "vec_id", "embedding", 3, 2)
    assert(scSearch.collect().map(_.toString).toSet == inMemRes,
      "self-contained ingested search must pick the residual formula from the stored params")
    // tombstoned retraction is honored by the self-contained ingested
    // search: retract an id that provably appears, it must vanish
    val someNeighbor = scSearch.select("neighbor_id").head().getLong(0)
    Quantize.addTombstones(spark, resSc,
      emb.filter(col("vec_id") === someNeighbor).select("vec_id"), "vec_id")
    assert(scSearch.filter(col("neighbor_id") === someNeighbor).collect().isEmpty,
      "retracted id must not appear in the self-contained ingested search")
    // LAYOUT hand-off: single-level lifecycle ops refuse the stream-fed
    // (cell, batch) layout loudly — their cell rewrites would demote
    // batch_id into a data column for touched cells only — and FLATTEN
    // promotes it, after which they apply unchanged and the stored
    // search answers exactly as before
    val streamedStore = s"$dir/index" // the raw streamed store from above
    val twoLevelErr = intercept[IllegalStateException] {
      Quantize.deleteFromIvfPqIndex(spark, streamedStore,
        emb.filter(col("vec_id") === 3L).select("vec_id"), "vec_id")
    }
    assert(twoLevelErr.getMessage.contains("flatten"))
    intercept[IllegalStateException] {
      Quantize.compactIvfPqIndex(spark, streamedStore, 1000000L)
    }
    intercept[IllegalStateException] {
      Quantize.appendToIvfPqIndex(last, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, streamedStore)
    }
    val nFlat = Quantize.flattenIngestedStore(spark, streamedStore, "vec_id")
    assert(nFlat == emb.count() * 4,
      s"flatten must collapse the misdelivered duplicates to nBlocks rows/vector, got $nFlat")
    assert(Quantize.flattenIngestedStore(spark, streamedStore, "vec_id") == -1L,
      "second flatten must be a no-op on the cell layout")
    assert(Quantize.ivfPqSearchStored(spark, streamedStore,
        queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet == inMem,
      "flattened store must answer like the one-shot build through the stored search")
    // and the previously-refused lifecycle op now works: delete an id,
    // the stored search equals the built-without-it reference
    Quantize.deleteFromIvfPqIndex(spark, streamedStore,
      emb.filter(col("vec_id") === 499L).select("vec_id"), "vec_id")
    assert(spark.read.parquet(streamedStore)
      .filter(col("vec_id") === 499L).count() == 0,
      "post-flatten delete must remove the id's code rows")
  }

  test("streaming execution: interval join runs append-mode with bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(minute: Long) = minute * 60L // seconds
    val pMem = MemoryStream[(Long, Long, Long)] // (event_id, user_id, secs)
    val eMem = MemoryStream[(Long, Long)]       // (user_id, secs)
    val purchases = pMem.toDF().toDF("event_id", "user_id", "secs")
      .withColumn("ts", expr("timestamp_micros(secs * 1000000)"))
    val errors = eMem.toDF().toDF("user_id", "secs")
      .withColumn("ts", expr("timestamp_micros(secs * 1000000)"))
    val q = EventStreams.errorsNearPurchases(purchases, errors)
      .writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      // user 7: purchase at t=10min; errors at 20min (inside 1h) and 80min (outside)
      pMem.addData((100L, 7L, ts(10)))
      eMem.addData((7L, ts(20)), (7L, ts(80)))
      // user 8: error with no purchase
      eMem.addData((8L, ts(15)))
      q.processAllAvailable()
      val got = spark.table("sj_out")
        .select("purchase_id", "user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((100L, 7L)))
      // the executed plan is a genuine stateful stream-stream join
      val progress = q.lastProgress
      assert(progress != null && progress.stateOperators.nonEmpty &&
        progress.stateOperators.exists(_.operatorName.contains("symmetricHashJoin")),
        Option(progress).map(_.json).getOrElse("no progress"))
    } finally q.stop()
  }

  test("near-dup ingest retry: idempotent — no self-matching, no duplicate rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sndr").toString
    val twinA = "same batch twin documents must still be caught by the gate one"
    val twinB = "same batch twin documents must still be caught by the gate two"
    val batch = Seq((12L, twinA), (13L, twinB)).toDF("doc_id", "text")
    def run() = graft.streaming.StreamingNearDup.processBatch(
      batch, batchId = 0L, "text", "doc_id",
      s"$dir/index", s"$dir/dups", k = 16, shingleN = 3, rowsPerBand = 4,
      threshold = 0.5, streamTag = s"$dir/ckpt")
    // attempt 1 completes both writes, then the epoch commit "fails" and
    // foreachBatch re-runs the SAME batchId — the at-least-once contract
    run(); run()
    // dynamic partition overwrite: the retry REPLACED its batch partition,
    // so exactly one canonical-orientation pair row exists — never
    // (12,13)+(13,12), never two copies
    val dups = spark.read.parquet(s"$dir/dups")
      .select(col("doc_new"), col("doc_old"), col("batch_id").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(dups == Seq((13L, 12L, 0L)), s"got $dups")
    // the index holds ONE copy of each (doc, band) row despite the re-run
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() == idx.dropDuplicates("doc_id", "band_id").count())
  }

  test("near-dup ingest: restart from the SAME checkpoint continues the index seamlessly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sndrs").toString
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    def start(mem: MemoryStream[(Long, String)]) =
      graft.streaming.StreamingNearDup.start(
        mem.toDF().toDF("doc_id", "text"), "text", "doc_id",
        s"$dir/index", s"$dir/dups", s"$dir/ckpt", threshold = 0.5)
    // run 1: ingest the base doc, stop
    val mem1 = MemoryStream[(Long, String)]
    val q1 = start(mem1)
    try { mem1.addData((1L, base)); q1.processAllAvailable() } finally q1.stop()
    // run 2: SAME checkpoint — the marker admits it; the near-dup of doc 1
    // must be flagged against run 1's index rows
    val mem2 = MemoryStream[(Long, String)]
    mem2.addData((1L, base)) // replayed source prefix (memory streams restart at 0)
    val q2 = start(mem2)
    try {
      mem2.addData((10L, near))
      q2.processAllAvailable()
      val dups = spark.read.parquet(s"$dir/dups")
        .select("doc_new", "doc_old").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(dups.contains((10L, 1L)), s"cross-run match lost: $dups")
    } finally q2.stop()
  }

  test("near-dup ingest: attaching a fresh checkpoint to an existing index fails loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sndg").toString
    val batch = Seq((1L, "some document text that is long enough to shingle properly here"))
      .toDF("doc_id", "text")
    def run(tag: String) = graft.streaming.StreamingNearDup.processBatch(
      batch, batchId = 0L, "text", "doc_id",
      s"$dir/index", s"$dir/dups", k = 16, shingleN = 3, rowsPerBand = 4,
      threshold = 0.5, streamTag = tag)
    run(s"$dir/ckpt1")
    val e = intercept[IllegalArgumentException] { run(s"$dir/ckpt2") }
    assert(e.getMessage.contains("ckpt1") && e.getMessage.contains("fresh"),
      e.getMessage)
    // and an index built OUTSIDE the gate (no marker) is refused outright
    val foreign = java.nio.file.Files.createTempDirectory("sndf").toString
    spark.range(1).write.parquet(s"$foreign/index")
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingNearDup.processBatch(
        batch, 0L, "text", "doc_id", s"$foreign/index", s"$foreign/dups",
        16, 3, 4, 0.5, streamTag = s"$foreign/ckpt")
    }
    assert(e2.getMessage.contains("without a stream marker"), e2.getMessage)
  }
}
