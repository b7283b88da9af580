package graft

import org.apache.spark.sql.functions._
import graft.operators.Quantize
import graft.streaming.StreamingVectorSearch

/** The streaming ANN query path: micro-batched queries against the
  * self-contained store must answer byte-identically to the one-shot
  * batch deployment search, replace-not-append on retry, and refuse a
  * foreign checkpoint's result log. */
class StreamingSearchSpec extends SparkSpec {

  private def fixture() = {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("svs").toString
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, s"$dir/index")
    (emb, dir)
  }

  test("streamed search equals the one-shot batch search; retries replace their own answers; refined tail streams too") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val (emb, dir) = fixture()
    val queries = emb.filter(col("vec_id") < 30)
    val qRows = queries.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val mem = MemoryStream[(Long, Seq[Float])]
    val slices = qRows.grouped(10).toSeq // 30 queries → 3 micro-batches
    val q = StreamingVectorSearch.start(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$dir/index", s"$dir/out", s"$dir/ckpt", k = 3, nProbe = 2)
    try {
      slices.foreach { g => mem.addData(g.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    def streamed = StreamingVectorSearch.results(spark, s"$dir/out")
      .collect().map(_.toString).toSet
    val oneShot = Quantize.searchSelfContained(spark, s"$dir/index",
        queries, "vec_id", "embedding", 3, 2)
      .collect().map(_.toString).toSet
    val first = streamed
    assert(first.nonEmpty && first == oneShot,
      "micro-batch boundaries must be invisible: streamed answers == one-shot")
    // at-least-once retry under the SAME batchId: the batch's result
    // partition is replaced, not appended — counts and answers unchanged
    val before = spark.read.parquet(s"$dir/out").count()
    val last = slices.last.toSeq.toDF("vec_id", "embedding")
    StreamingVectorSearch.processBatch(last, (slices.size - 1).toLong,
      "vec_id", "embedding", s"$dir/index", s"$dir/out", 3, 2,
      refineWith = None, rerankDepth = 0, streamTag = s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == before,
      "retried batch must replace its result partition, not double it")
    assert(streamed == oneShot, "retry must leave answers unchanged")
    // a FOREIGN checkpoint may not write into this result log (its batch
    // ids restart at 0 and dynamic overwrite would clobber old answers)
    val ex = intercept[IllegalArgumentException] {
      StreamingVectorSearch.processBatch(last, 0L,
        "vec_id", "embedding", s"$dir/index", s"$dir/out", 3, 2,
        refineWith = None, rerankDepth = 0, streamTag = s"$dir/other-ckpt")
    }
    assert(ex.getMessage.contains("belongs to stream checkpoint"),
      s"foreign checkpoint must be refused: ${ex.getMessage}")
    // refined variant: streamed exact-rescore == one-shot refined search
    val memR = MemoryStream[(Long, Seq[Float])]
    val qr = StreamingVectorSearch.start(
      memR.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$dir/index", s"$dir/outR", s"$dir/ckptR", k = 3, nProbe = 2,
      refineWith = Some((emb, "embedding")), rerankDepth = 10)
    try {
      slices.foreach { g => memR.addData(g.toSeq: _*); qr.processAllAvailable() }
    } finally qr.stop()
    val streamedR = StreamingVectorSearch.results(spark, s"$dir/outR")
      .collect().map(_.toString).toSet
    val oneShotR = Quantize.searchSelfContainedRefined(spark, s"$dir/index",
        queries, "vec_id", "embedding", emb, "embedding", 3, 2, 10)
      .collect().map(_.toString).toSet
    assert(streamedR.nonEmpty && streamedR == oneShotR,
      "streamed refined answers must equal the one-shot refined search")
  }

  test("streaming search rejects a refined config whose rerank depth is under k") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (emb, dir) = fixture()
    val mem = MemoryStream[(Long, Seq[Float])]
    val ex = intercept[IllegalArgumentException] {
      StreamingVectorSearch.start(
        mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        s"$dir/index", s"$dir/out2", s"$dir/ckpt2", k = 5, nProbe = 2,
        refineWith = Some((emb, "embedding")), rerankDepth = 3)
    }
    assert(ex.getMessage.contains("rerankDepth"), ex.getMessage)
  }
}
