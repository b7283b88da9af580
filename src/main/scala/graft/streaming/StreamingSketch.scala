package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.TextAnalysis

/** Count-min sketch ON INGEST: the streaming face of qx102. Each
  * micro-batch of the document firehose folds into its own PARTIAL
  * sketch (depth×width int64 cells — the batch's fixed-size census), and
  * the standing sketch is the cell-wise SUM of the partials. The
  * mergeability the batch operator spec-gates IS the streaming
  * correctness argument: addition is associative and commutative, so
  * batch boundaries are invisible to the merged cells by construction,
  * and the accumulated sketch equals the one-shot
  * [[TextAnalysis.countMinSketch]] over the replayed corpus cell-for-cell
  * (the qx106 oracle gates exactly that, through the real runtime).
  *
  * At-least-once → exactly-once cells: partials land partitioned by
  * batch_id with dynamic partition overwrite — a retried batch REPLACES
  * its own partial instead of double-counting it (the
  * [[StreamingVectorIngest]] discipline); `_graft_stream_id` pins the
  * log to its checkpoint so a foreign checkpoint's restarted batch ids
  * cannot silently collide.
  *
  * Per-batch cost is the batch's token scan plus a bounded shuffle
  * (≤ depth×width rows per partition leave the map side); the standing
  * corpus is never re-read. Readers pay one cell-keyed aggregation over
  * ≤ nBatches×depth×width partial rows — compact the log by rewriting
  * the merged sketch as a new base whenever that bound matters.
  */
object StreamingSketch {

  /** Start folding the document stream into the sketch log. */
  def start(docs: DataFrame, textCol: String, depth: Int, width: Int,
            outPath: String, checkpoint: String): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, depth, width, outPath,
          streamTag = checkpoint)
      }
      .start()
  }

  /** One micro-batch: the batch's partial sketch into its own
    * replace-not-append partition. Public so retry semantics are
    * testable outside a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
                   depth: Int, width: Int, outPath: String,
                   streamTag: String): Unit = {
    StreamingNearDup.guardStreamIdentity(batch.sparkSession, outPath, streamTag)
    TextAnalysis.countMinSketch(batch, textCol, depth, width)
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(outPath)
  }

  /** The standing sketch: cell-wise sum of the batch partials. */
  def sketch(spark: org.apache.spark.sql.SparkSession,
             outPath: String): DataFrame =
    spark.read.parquet(outPath)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
}
