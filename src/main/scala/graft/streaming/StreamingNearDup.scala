package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.operators.Dedup

/** Streaming near-dup-on-ingest: the production dedup gate for a document
  * firehose. Each micro-batch:
  *
  *  1. builds its band+set index ONCE ([[Dedup.indexForIncremental]]);
  *  2. matches it against the PERSISTENT corpus index (band equi-join +
  *     exact-Jaccard verify on candidates only — no corpus rescan, the
  *     same math as qx35) and appends flagged pairs to `dupsPath`;
  *  3. appends its own index rows to `indexPath`, so every later batch
  *     dedups against everything ingested so far.
  *
  * State lives in PARQUET, not the state store: the index is narrow
  * (k-min bands + hash sets per doc), queryable offline, and shared by
  * the batch pipeline (the same files serve qx35-style batch jobs).
  * foreachBatch gives at-least-once semantics for these external writes —
  * a retried batch can re-append; consumers dedupe on (doc id, batch) or
  * compact the index periodically, the standard contract for
  * foreachBatch sinks.
  */
object StreamingNearDup {

  /** The index schema (indexForIncremental output) for the empty
    * first-batch case. */
  private def emptyIndex(spark: SparkSession, idCol: String): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField(idCol, LongType), StructField("band_id", LongType),
        StructField("band_key", StringType),
        StructField("sh", ArrayType(LongType)))))

  def start(docs: DataFrame, textCol: String, idCol: String,
            indexPath: String, dupsPath: String, checkpoint: String,
            k: Int = 16, shingleN: Int = 3, rowsPerBand: Int = 4,
            threshold: Double = 0.5): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newIndex = Dedup.indexForIncremental(batch, textCol, idCol,
            k, shingleN, rowsPerBand)
          .persist() // two consumers: the match and the index append
        try {
          val stored =
            try spark.read.parquet(indexPath)
            catch { case _: Exception => emptyIndex(spark, idCol) }
          Dedup.incrementalNearDupsFromIndex(newIndex, stored, idCol, threshold)
            .write.mode("append").parquet(dupsPath)
          newIndex.write.mode("append").parquet(indexPath)
        } finally { newIndex.unpersist(); () }
      }
      .start()
  }
}
