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
  *     same math as qx35) and writes flagged pairs to `dupsPath`;
  *  3. writes its own index rows to `indexPath`, so every later batch
  *     dedups against everything ingested so far.
  *
  * State lives in PARQUET, not the state store: the index is narrow
  * (k-min bands + hash sets per doc), queryable offline, and shared by
  * the batch pipeline (the same files serve qx35-style batch jobs).
  *
  * At-least-once hardening (foreachBatch may re-run a batch under the
  * SAME batchId after a partial failure):
  *  - both sinks partition by `batch_id` and write with DYNAMIC partition
  *    overwrite, so a retry REPLACES its own partition instead of
  *    appending a second copy — the stores never hold duplicate rows;
  *  - the cross-match excludes index rows stamped with the current
  *    batchId, so a retry that already appended never reads its own rows
  *    back as "stored" (which would emit intra-batch pairs in both
  *    orientations); intra-batch pairs come solely from the canonicalized
  *    self-match;
  *  - batchIds are per-checkpoint, so `indexPath` and the checkpoint form
  *    a UNIT: a `_graft_stream_id` marker pins the index to its
  *    checkpoint, and attaching a fresh checkpoint (batch ids restart at
  *    0) to an existing index fails LOUDLY instead of silently skipping
  *    cross-matches against same-numbered old batches.
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
          k, shingleN, rowsPerBand, threshold, streamTag = checkpoint)
      }
      .start()
  }

  private def markerPath(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath, "_graft_stream_id")

  /** Pin `indexPath` to the stream identified by `streamTag` (its
    * checkpoint). Checked every micro-batch (one tiny marker read) so a
    * foreign index can't be attached mid-stream either. */
  private[streaming] def guardStreamIdentity(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, streamTag: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val m = markerPath(indexPath)
    if (fs.exists(m)) {
      val in = fs.open(m)
      val existing = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      require(existing == streamTag,
        s"indexPath $indexPath belongs to stream checkpoint '$existing' but " +
          s"this query runs checkpoint '$streamTag'. Batch ids restart at 0 " +
          "under a fresh checkpoint, and the retry guard would then silently " +
          "skip cross-matching against the old stream's same-numbered " +
          "batches. Reuse the original checkpoint with this index, or start " +
          "a fresh index directory (compact the old index into a batch-side " +
          "base first if its contents should still be matched against).")
    } else if (fs.exists(new org.apache.hadoop.fs.Path(indexPath))) {
      throw new IllegalArgumentException(
        s"indexPath $indexPath already exists without a stream marker — it " +
          "was built by something other than this streaming gate (e.g. the " +
          "batch indexer). Point the stream at a fresh directory and feed " +
          "pre-existing indexes through the batch incremental path instead.")
    } else {
      val out = fs.create(m, false)
      try out.write(streamTag.getBytes("UTF-8")) finally out.close()
    }
  }

  /** One micro-batch of the ingest-dedup gate — public so the retry
    * semantics are testable outside a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long,
                   textCol: String, idCol: String,
                   indexPath: String, dupsPath: String,
                   k: Int, shingleN: Int, rowsPerBand: Int,
                   threshold: Double, streamTag: String): Unit = {
    val spark = batch.sparkSession
    guardStreamIdentity(spark, indexPath, streamTag)
    val newIndex = Dedup.indexForIncremental(batch, textCol, idCol,
        k, shingleN, rowsPerBand)
      .persist() // three consumers: cross-match, self-match, append
    try {
      // ONLY this-store-is-empty conditions fall back to the empty
      // first-batch index (schema-correct: derived from this batch's own
      // index plan) — any other read failure must fail the batch so it
      // retries, or the misses would be permanent and invisible.
      // UNABLE_TO_INFER_SCHEMA covers the marker-only directory (batch 0
      // wrote the identity marker before any data).
      // (partition-column inference types batch_id as int — cast back to
      // the written long so consumers see one canonical type)
      val stored =
        (try spark.read.parquet(indexPath)
            .withColumn("batch_id", col("batch_id").cast("long"))
        catch {
          case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" ||
               e.getCondition == "UNABLE_TO_INFER_SCHEMA" =>
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
      // dynamic overwrite keyed on batch_id: a retried batch REPLACES its
      // partition — both sinks stay duplicate-free under at-least-once
      cross.unionByName(intra)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(dupsPath)
      newIndex.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(indexPath)
    } finally { newIndex.unpersist(); () }
  }
}
