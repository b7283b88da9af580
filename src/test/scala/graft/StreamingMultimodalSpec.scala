package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._

class StreamingMultimodalSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  test("streaming windowed agg equals the batch q24 result (stream/batch parity)") {
    import spark.implicits._
    // batch side
    val batchEvents = Tables.events(spark, sfDir)
    val expected = EventStreams.windowedAgg(batchEvents)
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("val_cents"))
      .orderBy("ws", "event_type").collect()

    // streaming side: same parquet as a file stream → memory sink, complete mode
    val stream = EventStreams.readStream(spark, sfDir)
    val q = EventStreams.windowedAgg(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("val_cents"))
        .orderBy("ws", "event_type").collect()
      assert(got.toSeq === expected.toSeq)
      assert(got.length > 0)
    } finally q.stop()
  }

  test("gopher rule pack on a stream: stateless projection, streaming equals batch row-for-row") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "the cat sat on the mat again"),
      (2L, ""), (3L, "a@# b$% c^&"), (4L, "the of and to in is extra words here")
    )
    val expected = graft.operators.TextAnalysis.gopherRules(
        docs.toDF("doc_id", "text"), "text", "doc_id",
        3L, 8L, 2.0, 4.0, 0.2, 1L)
      .orderBy("doc_id").collect().map(_.toSeq)
    // same rule pack applied to a stream — a per-row projection needs no
    // state, no watermark, no output-mode gymnastics: curation-on-ingest
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.TextAnalysis.gopherRules(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        3L, 8L, 2.0, 4.0, 0.2, 1L)
      .writeStream.format("memory").queryName("gopher_stream")
      .outputMode("append").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("gopher_stream")
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(got.toSeq === expected.toSeq && got.length === 4)
    } finally q.stop()
  }

  test("DSIR score-on-ingest: stream-static join against the trained census equals batch scoring") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 200)
    // train offline: census + totals are the persisted model
    val model = graft.operators.TextAnalysis.dsirModel(
        corpus, "text", col("lang") === "en", 4096)
      .persist()
    val totals = graft.operators.TextAnalysis.dsirTotals(model)
    try {
      // the incoming batch: scored in batch mode...
      val incoming = Tables.t(spark, sfDir, "documents")
        .filter(col("doc_id").between(200, 249))
        .select("doc_id", "text")
      val expected = graft.operators.TextAnalysis.dsirScore(
          incoming, "text", "doc_id", model, totals, 4096)
        .orderBy("doc_id").collect().map(_.toSeq)
      assert(expected.length > 0)
      // ...and as a stream (same rows through MemoryStream)
      val in = MemoryStream[(Long, String)]
      val q = graft.operators.TextAnalysis.dsirScore(
          in.toDF().toDF("doc_id", "text"), "text", "doc_id",
          model, totals, 4096)
        .writeStream.format("memory").queryName("dsir_stream")
        .outputMode("complete").start()
      try {
        in.addData(incoming.collect().map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
        q.processAllAvailable()
        val got = spark.table("dsir_stream")
          .orderBy("doc_id").collect().map(_.toSeq)
        assert(got.toSeq === expected.toSeq)
      } finally q.stop()
    } finally { model.unpersist(); () }
  }

  test("stateful user sessions close on gap and batch flushes trailing open sessions") {
    import spark.implicits._
    def ev(id: Long, uid: Long, minute: Long, v: Double) =
      EventStreams.Event(id, new java.sql.Timestamp(minute * 60000L), uid, "click", v)
    // user 1: two bursts separated by >30min → one gap-closed session plus
    // the trailing burst as an open (closed=false) residual; user 2: one
    // burst → one open residual. Batch output is COMPLETE — the timeout
    // that closes idle sessions only exists in streaming execution.
    val events = Seq(
      ev(1, 1, 0, 1.0), ev(2, 1, 5, 2.0), ev(3, 1, 60, 10.0),
      ev(4, 2, 0, 5.0), ev(5, 2, 10, 5.0)).toDS()
    val out = EventStreams.userSessions(events).collect()
      .sortBy(s => (s.user_id, s.n_events))
    assert(out.length === 3)
    val closed = out.filter(_.closed)
    assert(closed.length === 1)
    assert(closed(0).user_id === 1 && closed(0).n_events === 2 && closed(0).total_value === 3.0)
    val open = out.filterNot(_.closed).sortBy(_.user_id)
    assert(open(0).user_id === 1 && open(0).n_events === 1 && open(0).total_value === 10.0)
    assert(open(1).user_id === 2 && open(1).n_events === 2 && open(1).total_value === 10.0)
  }

  test("streaming dedup drops watermark-window duplicates with bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val events = mem.toDF().toDF("event_id", "tsl", "event_type")
      .withColumn("ts", expr("timestamp_micros(tsl * 1000000)"))
    val q = EventStreams.dedupedEvents(events, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // same event_id delivered three times across two batches → one row
      mem.addData((1L, 10L, "click"), (1L, 10L, "click"), (2L, 20L, "view"))
      q.processAllAvailable()
      mem.addData((1L, 11L, "click"), (3L, 30L, "click"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L))
    } finally q.stop()
    // batch mode: same operator degrades to plain dropDuplicates
    val batch = Seq((1L, 10L, "click"), (1L, 10L, "click"), (2L, 20L, "view"))
      .toDF("event_id", "tsl", "event_type")
      .withColumn("ts", expr("timestamp_micros(tsl * 1000000)"))
    assert(EventStreams.dedupedEvents(batch, Seq("event_id")).count() === 2)
  }

  test("multimodal: batch feature extraction over binary payloads") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, MediaMeta("image", 64, 64, 0, 0L), Array[Byte](0, 1, 2, 3, 0, 0)),
      MediaRow(2L, MediaMeta("audio", 0, 0, 16000, 1200L), Array.fill[Byte](256)(7)),
      MediaRow(3L, MediaMeta("video", 640, 480, 0, 5000L), Array.tabulate[Byte](1024)(i => (i % 251).toByte))
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.byte_len).toSeq === Seq(6L, 256L, 1024L))
    assert(feats.forall(_.features.length == 16))
    // none of these payloads is a readable image → every row is the stub
    // path, metadata dims passed through
    assert(feats.forall(!_.decoded))
    assert(feats(0).width === 64 && feats(0).height === 64)
    // histogram semantics: payload of all-7s → all mass in bin 0
    assert(math.abs(feats(1).features(0) - 1.0f) < 1e-6)
    // determinism: same payload → same sha
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.sha).toSeq === again.map(_.sha).toSeq)
  }

  test("multimodal: a real PNG decodes through javax.imageio — true dims + luminance histogram") {
    import spark.implicits._
    // 8×4 PNG: left half pure black (luminance 0 → bin 0), right half
    // pure white (255 → bin 15) — generated, written, decoded, no codecs
    // beyond the JDK
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos), "JDK must ship a PNG writer")
    val png = bos.toByteArray
    val media = Seq(
      // metadata LIES about the dims (99×99): the decoder must report the
      // real ones, proving the bytes were actually parsed
      MediaRow(1L, MediaMeta("image", 99, 99, 0, 0L), png),
      // corrupt payload under the image modality → stub fallback, not a crash
      MediaRow(2L, MediaMeta("image", 10, 10, 0, 0L), Array[Byte](1, 2, 3, 4)),
      // a real PNG under a non-image modality stays on the stub path
      MediaRow(3L, MediaMeta("video", 0, 0, 0, 0L), png)
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val real = feats(0)
    assert(real.decoded && real.width === 8 && real.height === 4,
      s"expected a real 8x4 decode, got $real")
    assert(math.abs(real.features(0) - 0.5f) < 1e-6, "half the pixels are black")
    assert(math.abs(real.features(15) - 0.5f) < 1e-6, "half the pixels are white")
    assert((1 to 14).forall(b => real.features(b) == 0f))
    assert(!feats(1).decoded && feats(1).width === 10, "corrupt image falls back to stub")
    assert(!feats(2).decoded, "non-image modality never image-decodes")
    // direct kernel check: same answer without the Spark plumbing
    val direct = Multimodal.decodeImage(png)
    assert(direct.exists { case (w, h, hist) =>
      w == 8 && h == 4 && math.abs(hist(0) - 0.5f) < 1e-6 })
  }

  test("multimodal: a real WAV decodes through javax.sound — true rate/duration + amplitude histogram") {
    import spark.implicits._
    // 8 kHz mono 16-bit WAV, 4000 frames: first half silence (bin 0),
    // second half constant amplitude 30000 (30000 >> 11 = bin 14) —
    // generated, written, decoded, JDK only
    val format = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](4000 * 2)
    for (i <- 2000 until 4000) {
      pcm(2 * i) = (30000 & 0xFF).toByte
      pcm(2 * i + 1) = ((30000 >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), format, 4000),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val media = Seq(
      // metadata LIES (44.1 kHz, 9s): the decoder must report 8 kHz/500ms,
      // proving the container was actually parsed
      MediaRow(1L, MediaMeta("audio", 0, 0, 44100, 9000L), wav),
      // corrupt payload under the audio modality → stub fallback
      MediaRow(2L, MediaMeta("audio", 0, 0, 8000, 1L), Array[Byte](9, 9, 9)),
      // a real WAV under a non-audio modality stays on the stub path
      MediaRow(3L, MediaMeta("video", 0, 0, 0, 0L), wav)
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val real = feats(0)
    assert(real.decoded && real.sample_rate_hz === 8000 && real.duration_ms === 500L,
      s"expected a real 8kHz/500ms decode, got $real")
    assert(math.abs(real.features(0) - 0.5f) < 1e-6, "half the samples are silence")
    assert(math.abs(real.features(14) - 0.5f) < 1e-6, "half sit at amplitude 30000")
    assert(!feats(1).decoded && feats(1).sample_rate_hz === 8000,
      "corrupt audio falls back to stub with metadata passed through")
    assert(!feats(2).decoded, "non-audio modality never audio-decodes")
    // direct kernel check: same answer without the Spark plumbing
    assert(Multimodal.decodeAudio(wav).exists { case (sr, ms, hist) =>
      sr == 8000 && ms == 500L && math.abs(hist(14) - 0.5f) < 1e-6 })
  }

  test("multimodal: MP3 frame walk recovers real rate/duration without a PCM decoder") {
    import spark.implicits._
    // Hand-assembled MPEG1 Layer III headers (ISO 11172-3): 44.1 kHz,
    // 128 kbps (bitrate index 9) → frame length 144*128000/44100 = 417
    // bytes, 1152 samples/frame. Zero-filled frame bodies can't false-sync.
    def frame(brIdx: Int, len: Int): Array[Byte] = {
      val f = new Array[Byte](len)
      f(0) = 0xFF.toByte; f(1) = 0xFB.toByte // sync + MPEG1 + Layer III
      f(2) = ((brIdx << 4) | 0).toByte       // bitrate idx, 44.1 kHz, no pad
      f
    }
    val cbr = Array.fill(20)(frame(9, 417)).flatten
    // 20 frames * floor(1152e6/44100) µs = 522440 µs → 522 ms
    assert(Multimodal.parseMp3Meta(cbr).contains((44100, 522L)),
      s"CBR walk: got ${Multimodal.parseMp3Meta(cbr)}")
    // VBR: alternating 128/64 kbps (frame lengths 417/208) — the walk hops
    // by each frame's OWN bitrate; samples per frame are constant
    val vbr = (0 until 10).flatMap(i =>
      if (i % 2 == 0) frame(9, 417) else frame(5, 208)).toArray
    assert(Multimodal.parseMp3Meta(vbr).contains((44100, 261L)),
      s"VBR walk: got ${Multimodal.parseMp3Meta(vbr)}")
    // ID3v2 prefix (syncsafe size 100) is skipped, not parsed as audio
    val id3 = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100) ++ cbr
    assert(Multimodal.parseMp3Meta(id3).contains((44100, 522L)), "ID3v2 skip")
    // ID3v2.4 footer flag (0x10): the syncsafe size excludes the 10-byte
    // footer, so the skip must add it or land 10 bytes short of the sync
    val id3f = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 100) ++
      new Array[Byte](110) ++ cbr
    assert(Multimodal.parseMp3Meta(id3f).contains((44100, 522L)), "ID3v2.4 footer skip")
    // zero padding between tag end and first frame is tolerated (writers
    // pad for in-place tag growth); zeros can never start a frame header
    val id3p = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](164) ++ cbr
    assert(Multimodal.parseMp3Meta(id3p).contains((44100, 522L)), "post-tag padding skip")
    // one lone sync in garbage must NOT fabricate metadata (< 2 frames)
    assert(Multimodal.parseMp3Meta(frame(9, 100)).isEmpty, "single frame rejected")
    assert(Multimodal.parseMp3Meta(Array[Byte](1, 2, 3, 4)).isEmpty)
    // end-to-end: an MP3 payload under the audio modality gets REAL
    // metadata from the frame walk but stays decoded=false (PCM is out of
    // scope without a codec) with the deterministic stub features
    val media = Seq(
      MediaRow(1L, MediaMeta("audio", 0, 0, 8000, 1L), cbr)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(!f.decoded && f.sample_rate_hz === 44100 && f.duration_ms === 522L,
      s"MP3 metadata path: got $f")
    assert(math.abs(f.features.sum - 1f) < 1e-5, "stub histogram is L1-normalized")
  }

  test("multimodal: metadata scan does not read payload bytes (column pruning)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    Seq(
      MediaRow(1L, MediaMeta("image", 64, 64, 0, 0L), Array[Byte](1, 2)),
      MediaRow(2L, MediaMeta("video", 640, 480, 0, 5000L), Array[Byte](1))
    ).toDS().write.mode("overwrite").parquet(dir)
    val scan = Multimodal.metaSummary(spark.read.parquet(dir))
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("ReadSchema") && !physical.contains("payload"),
      s"payload must be pruned from the scan:\n$physical")
    assert(scan.count() === 2)
  }

  test("multimodal: frame sampling emits deterministic offsets for video only") {
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, MediaMeta("video", 0, 0, 0, 0L), Array.fill[Byte](100)(1)),
      MediaRow(2L, MediaMeta("image", 0, 0, 0, 0L), Array.fill[Byte](100)(1))
    ).toDF().as[MediaRow]
    val frames = Multimodal.sampleFrames(media.toDF()).collect()
    assert(frames.map(_.getAs[Long]("media_id")).distinct.toSeq === Seq(1L))
    assert(frames.map(_.getAs[Long]("byte_offset")).toSeq === Seq(0L, 25L, 50L, 75L))
  }

  test("qx17 sliding-window arithmetic equals Spark's built-in window() generator") {
    val e = Tables.events(spark, sfDir)
    val builtin = graft.streaming.EventStreams.slidingRates(e)
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val arith = graft.queries.ExtraQueries.queries("qx17_sliding_windows")(spark, sfDir)
      .select("window_start", "event_type", "n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(builtin.toSeq === arith.toSeq)
  }
}
