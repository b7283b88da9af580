package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Quantize

/** Streaming ANN QUERY path — the query-side twin of
  * [[StreamingVectorIngest]], closing the retrieval loop: vectors stream
  * INTO the durable store ([[StreamingVectorIngest]]), and query vectors
  * now stream AGAINST it, each micro-batch answered with the store state
  * at that batch and appended to a durable result log. This is the
  * "embed → retrieve neighbors → act" serving shape a training-data
  * pipeline runs continuously (novelty screening of a crawl firehose,
  * online near-dup triage, retrieval-augmented labeling).
  *
  * Per micro-batch: [[Quantize.searchSelfContained]] against the stored
  * quantizers (the store's persisted residual flag picks the ADC formula,
  * tombstones filter retracted ids — EXACTLY the batch deployment path, so
  * the batch≡stream equivalence is structural, and the spec gates it), or
  * the [[Quantize.searchSelfContainedRefined]] exact-rescore tail when a
  * corpus frame is supplied — the RECALL.md high-recall configuration,
  * streaming.
  *
  * At-least-once → exactly-once results: foreachBatch may re-run a batch
  * under the SAME batchId after a partial failure, so the result log is
  * partitioned by batch_id and written with DYNAMIC partition overwrite —
  * a retry REPLACES its own partition instead of appending duplicate
  * answer rows. The `_graft_stream_id` marker pins the result log to its
  * checkpoint (batch ids restart at 0 under a fresh checkpoint, which
  * would make dynamic overwrite DELETE an unrelated old batch's answers).
  *
  * Scale shape: every micro-batch pays probed-cells cost only — the
  * store prunes to the batch's probe cells at the FILE level and the
  * query side of every join is the (bounded) micro-batch, broadcast. The
  * standing store is never scanned whole and never shuffles.
  */
object StreamingVectorSearch {

  /** Start the streaming search: each micro-batch of `queries` is
    * answered against the self-contained store at `indexPath` and
    * appended to the result log at `outPath` under its batch_id.
    * `refineWith` = Some((corpus, vecCol)) switches every batch to the
    * exact-rescore tail at `rerankDepth` (must then be >= k). */
  def start(queries: DataFrame, qIdCol: String, qVecCol: String,
            indexPath: String, outPath: String, checkpoint: String,
            k: Int, nProbe: Int,
            refineWith: Option[(DataFrame, String)] = None,
            rerankDepth: Int = 0): StreamingQuery = {
    require(refineWith.isEmpty || rerankDepth >= k,
      s"refined streaming search needs rerankDepth >= k: $rerankDepth < $k")
    queries.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, qIdCol, qVecCol, indexPath, outPath,
          k, nProbe, refineWith, rerankDepth, streamTag = checkpoint)
      }
      .start()
  }

  /** One micro-batch: search, stamp, replace-not-append the batch's own
    * result partition. Public so retry semantics are testable outside a
    * streaming query. */
  def processBatch(batch: DataFrame, batchId: Long,
                   qIdCol: String, qVecCol: String,
                   indexPath: String, outPath: String,
                   k: Int, nProbe: Int,
                   refineWith: Option[(DataFrame, String)],
                   rerankDepth: Int, streamTag: String): Unit = {
    val spark = batch.sparkSession
    StreamingNearDup.guardStreamIdentity(spark, outPath, streamTag)
    // The search tail consumes the query side several times (size guard,
    // probe-cell collect, the candidate join) — without a cache each
    // action re-reads the micro-batch from the SOURCE. The batch is
    // bounded by the trigger, so caching it is cheap and makes the
    // per-batch wall pay the source scan once.
    val cached = batch.persist()
    try {
      val answered = refineWith match {
        case Some((corpus, corpusVecCol)) =>
          Quantize.searchSelfContainedRefined(spark, indexPath, cached,
            qIdCol, qVecCol, corpus, corpusVecCol, k, nProbe, rerankDepth)
        case None =>
          Quantize.searchSelfContained(spark, indexPath, cached,
            qIdCol, qVecCol, k, nProbe)
      }
      answered
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(outPath)
    } finally cached.unpersist()
  }

  /** The accumulated result log, bookkeeping dropped — what a downstream
    * consumer joins on. Explicit schema read: batch_id pinned long (the
    * hive-inference trap does not bite a long, but the read should not
    * depend on inference being right either). */
  def results(spark: org.apache.spark.sql.SparkSession,
              outPath: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dataFields = spark.read.parquet(outPath).schema.fields
      .filterNot(_.name == "batch_id")
    val schema = StructType(dataFields :+ StructField("batch_id", LongType))
    spark.read.schema(schema).parquet(outPath).drop("batch_id")
  }
}
