package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
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
  * a retried batch can re-append, so both sinks carry `batch_id`:
  * consumers dedupe on (ids, batch_id) and index compaction keeps the
  * latest row per (doc, band, batch) — the standard foreachBatch sink
  * contract, made implementable by actually writing the key.
  */
object StreamingNearDup {

  def start(docs: DataFrame, textCol: String, idCol: String,
            indexPath: String, dupsPath: String, checkpoint: String,
            k: Int = 16, shingleN: Int = 3, rowsPerBand: Int = 4,
            threshold: Double = 0.5): StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, indexPath, dupsPath,
          k, shingleN, rowsPerBand, threshold)
      }
      .start()
  }

  /** One micro-batch of the ingest-dedup gate — public so the retry
    * semantics are testable outside a streaming query (foreachBatch may
    * re-run a batch under the SAME batchId after a partial failure). */
  def processBatch(batch: DataFrame, batchId: Long,
                   textCol: String, idCol: String,
                   indexPath: String, dupsPath: String,
                   k: Int, shingleN: Int, rowsPerBand: Int,
                   threshold: Double): Unit = {
    val spark = batch.sparkSession
    val newIndex = Dedup.indexForIncremental(batch, textCol, idCol,
        k, shingleN, rowsPerBand)
      .persist() // three consumers: cross-match, self-match, append
    try {
      // ONLY path-not-found falls back to the empty first-batch index
      // (schema-correct: derived from this batch's own index plan) —
      // any other read failure must fail the batch so it retries,
      // or the misses would be permanent and invisible.
      // The batch_id filter closes the at-least-once retry hole: a batch
      // that failed AFTER the index append re-runs with the same batchId
      // and would otherwise read its own rows back as "stored", emitting
      // every intra-batch pair in both orientations under one batch_id —
      // which the (ids, batch_id) consumer dedupe cannot collapse.
      // Excluding rows stamped with the current batchId leaves intra-batch
      // pairs solely to the canonicalized self-match below.
      val stored =
        (try spark.read.parquet(indexPath)
        catch {
          case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
              newIndex.limit(0).withColumn("batch_id", lit(-1L))
        }).filter(col("batch_id") =!= lit(batchId))
      // near-dups vs everything ingested so far, PLUS within this very
      // batch (same-batch arrivals would otherwise never be compared;
      // the self-match keeps one direction of each pair)
      val cross = Dedup.incrementalNearDupsFromIndex(newIndex, stored,
        idCol, threshold)
      val intra = Dedup.incrementalNearDupsFromIndex(newIndex, newIndex,
          idCol, threshold)
        .filter(col("doc_new") > col("doc_old"))
      cross.unionByName(intra)
        .withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(dupsPath)
      newIndex.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(indexPath)
    } finally { newIndex.unpersist(); () }
  }
}
