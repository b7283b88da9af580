package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Retrieval

/** Streaming BM25-store ingest: the lexical twin of
  * [[StreamingVectorIngest]], completing the durable BM25 store's
  * lifecycle (build → append → delete → compact → rebucket →
  * STREAM-INGEST). A document firehose lands in the inverted index as
  * it arrives: each micro-batch runs [[Retrieval.appendBm25Store]] at
  * epoch `batchId + 1` — per-batch cost tracks the batch (census +
  * df/scalar deltas from the batch's own partitions), never the
  * standing store.
  *
  * Exactly-once falls out of the store's epoch design with NO extra
  * machinery: foreachBatch may re-run a batch under the same batchId
  * after a partial failure, and an epoch-addressed append REPLACES its
  * own (bucket, epoch) postings partitions, df-delta partitions, and
  * scalar-delta row — the idempotent-retry contract the batch API
  * already gates (RetrievalSpec), now exercised by the streaming
  * engine's own retries.
  *
  * The `_graft_stream_id` marker pins the store to its checkpoint
  * exactly as in [[StreamingNearDup]]: batch ids restart at 0 under a
  * fresh checkpoint, and without the guard a restarted stream's dynamic
  * overwrites would silently REPLACE unrelated old epochs. Same source
  * contract as every ingest twin: replayable source, doc ids new to the
  * store (epoch 0 is the build; stream batches own every epoch ≥ 1 —
  * don't interleave manual appends into a stream-pinned store).
  *
  * Serving needs nothing new: [[Retrieval.bm25TopKFromStore]] reads the
  * same layout batch appends produce — batch boundaries are invisible
  * to queries, which is qx110's oracle (the plain BM25 formula over the
  * whole corpus, identical to qx105's). */
object StreamingBm25Ingest {

  def start(docs: DataFrame, textCol: String, idCol: String,
            storePath: String, checkpoint: String): StreamingQuery = {
    adopt(docs.sparkSession, storePath, checkpoint)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, storePath,
          streamTag = checkpoint)
      }
      .start()
  }

  /** Pin a BATCH-BUILT store to this stream's checkpoint. Unlike the
    * ingest twins that create their own store directory, the BM25
    * stream feeds a store [[Retrieval.writeBm25Store]] already built —
    * so adoption is explicit, and it refuses a store that carries
    * batch-appended epochs ≥ 1: stream batch ids start at 0 → epoch 1,
    * and a dynamic overwrite there would silently REPLACE the manual
    * append's postings. Remedies the error message names: rebucket
    * (folds history to epoch 0) or a fresh build. A store already
    * marked just passes through to the per-batch identity check. */
  private[graft] def adopt(spark: org.apache.spark.sql.SparkSession,
                           storePath: String, streamTag: String): Unit = {
    import org.apache.spark.sql.functions._
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(storePath),
      spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(storePath, "_graft_stream_id")
    if (!fs.exists(m)) {
      val maxEpoch = spark.read.parquet(s"$storePath/epochs")
        .agg(max(col("epoch").cast("long"))).collect().head.getLong(0)
      require(maxEpoch == 0L,
        s"store $storePath carries batch-appended epochs up to $maxEpoch; " +
          "stream batch ids restart at 0 and would collide with (and " +
          "silently replace) them — rebucketBm25Store folds history to " +
          "epoch 0, or start from a fresh build")
      val out = fs.create(m, false)
      try out.write(streamTag.getBytes("UTF-8")) finally out.close()
    }
  }

  /** One micro-batch: epoch-addressed append. Public so retry semantics
    * are testable outside a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
                   idCol: String, storePath: String, streamTag: String): Unit = {
    StreamingNearDup.guardStreamIdentity(batch.sparkSession, storePath, streamTag)
    Retrieval.appendBm25Store(batch, textCol, idCol, storePath,
      epoch = batchId + 1)
  }
}
