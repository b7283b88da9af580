package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Quantize

/** Streaming ANN-index ingest: the vector-side twin of
  * [[StreamingNearDup]], completing the durable IVF-PQ store's lifecycle
  * (build → append → delete → compact → STREAM-INGEST). An embedding
  * firehose lands in the index as it arrives: each micro-batch is
  * assigned + PQ-encoded against the FROZEN build-time quantizers — the
  * [[Quantize.appendToIvfPqIndex]] math, per-batch cost tracks the batch,
  * never the standing store — and written to its cells.
  *
  * At-least-once hardening (foreachBatch may re-run a batch under the
  * SAME batchId after a partial failure): the store is partitioned
  * two-level, centroid_id then batch_id, and written with DYNAMIC partition
  * overwrite, so a retry REPLACES its own (cell, batch) partitions
  * instead of appending a second copy — `mode("append")` here would
  * silently double every retried batch's vectors, corrupting ADC scores
  * with duplicate rows. The `_graft_stream_id` marker pins the store to
  * its checkpoint exactly as in [[StreamingNearDup]] (batch ids restart
  * at 0 under a fresh checkpoint, which would make dynamic overwrite
  * DELETE an unrelated old batch's partitions).
  *
  * Search-time: [[searchIngested]] reads the store with an explicit
  * schema (centroid_id pinned to the centroid frame's id type — the
  * hive-inference trap — and batch_id pinned long), prunes to probed
  * cells at the FILE level (cell is still the leading partition
  * directory), drops the bookkeeping column, and runs the standard
  * search tail — so streamed stores answer queries identically to
  * batch-built ones, which the spec gates against
  * [[Quantize.ivfPqSearch]] over the same corpus.
  */
object StreamingVectorIngest {

  /** Source contract: at-least-once hardening covers re-runs of the SAME
    * batchId only (that is the guarantee foreachBatch gives over a
    * replayable source). The source must be replayable and vector ids
    * unique across the stream — the [[Quantize.appendToIvfPqIndex]]
    * ids-must-be-new contract. A source that re-delivers an id in a
    * DIFFERENT micro-batch lands duplicate (id, block) code rows in
    * different batch partitions, which dynamic overwrite cannot collapse;
    * [[searchIngested]] defends at read time by deduping the probe-pruned
    * slice on (id, block), so rankings stay correct even then, but the
    * store itself carries the dead weight until a delete+re-append or
    * compaction cycle. */
  def start(vectors: DataFrame, idCol: String, vecCol: String,
            centroids: DataFrame, cenIdCol: String, cenVecCol: String,
            codebook: DataFrame, cbIdCol: String, cbVecCol: String,
            dims: Int, nBlocks: Int,
            indexPath: String, checkpoint: String,
            residual: Boolean = false): StreamingQuery = {
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol,
          centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
          dims, nBlocks, indexPath, streamTag = checkpoint, residual = residual)
      }
      .start()
  }

  /** [[start]] against STORED quantizers ([[Quantize.saveQuantizers]] /
    * [[Quantize.buildSelfContained]] must have run for `indexPath`) — the
    * streaming half of the self-contained store: no quantizer frames to
    * pass stale across a long-running ingest deployment, and no encoding
    * flag to pass wrong either — the store's persisted `residual` param
    * picks the batch encode ([[Quantize.ivfPqIndexResidual]] vs
    * [[Quantize.ivfPqIndex]]), so the TRAINED high-recall configuration
    * (a residual store) stream-ingests with the same frozen-quantizer
    * math its batch appends use. Mixing encodings is impossible by
    * construction: the flag travels with the store, never the caller. */
  def startSelfContained(vectors: DataFrame, vecCol: String,
                         indexPath: String, checkpoint: String): StreamingQuery = {
    val (cents, cb, p) =
      Quantize.loadQuantizers(vectors.sparkSession, indexPath)
    start(vectors, p.idCol, vecCol, cents, "centroid_id", "cen_emb",
      cb, "code", "c_emb", p.dims, p.nBlocks, indexPath, checkpoint,
      residual = p.residual)
  }

  /** One micro-batch: encode ONLY the batch, replace-not-append its own
    * (cell, batch) partitions. Public so retry semantics are testable
    * outside a streaming query. */
  def processBatch(batch: DataFrame, batchId: Long,
                   idCol: String, vecCol: String,
                   centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                   codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                   dims: Int, nBlocks: Int,
                   indexPath: String, streamTag: String,
                   residual: Boolean = false): Unit = {
    // stream batches land CODES only — a raw-vector sidecar would not be
    // maintained, and streamed ids would silently vanish from
    // searchSelfContainedRefinedStored's rescore. Same invariant guard as
    // the bare-index appends: refuse loudly, direct to batch appends.
    // Checked BEFORE the identity guard, which ADOPTS an unclaimed store
    // (writes its marker) as a side effect.
    if (Quantize.hasVectorSidecar(batch.sparkSession, indexPath))
      throw new IllegalStateException(
        s"stream ingest does not maintain the raw-vector sidecar of " +
          s"$indexPath — ingest through appendSelfContained batches, or " +
          "build the store without storeVectors")
    StreamingNearDup.guardStreamIdentity(batch.sparkSession, indexPath, streamTag)
    val encoded =
      if (residual)
        Quantize.ivfPqIndexResidual(batch, idCol, vecCol,
          centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
          dims, nBlocks)
      else
        Quantize.ivfPqIndex(batch, idCol, vecCol,
          centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
          dims, nBlocks)
    encoded
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("centroid_id", "batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(indexPath)
  }

  /** The probe-pruned, (id, block)-deduped slice of a stream-ingested
    * store both ingested searches run on. Dedup AFTER the cell pruning:
    * a misbehaving source that re-delivered an id across micro-batches
    * (see [[start]]'s source contract) would otherwise double that
    * vector's ADC distance — the per-block partials SUM over the probed
    * slice. Duplicate rows are bit-identical (frozen quantizers: same
    * vector → same cell, same code), so dropping any copy is exact; cost
    * is bounded by the probed cells' rows, never the store. */
  private def prunedIngestedSlice(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String,
                                  queries: DataFrame, qIdCol: String, qVecCol: String,
                                  idCol: String,
                                  centroids: DataFrame, cenIdCol: String,
                                  cenVecCol: String, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val cells = Quantize.probeCells(queries, qIdCol, qVecCol,
        centroids, cenIdCol, cenVecCol, nProbe)
      .select("centroid_id").distinct().collect().map(_.get(0)).toSeq
    val cenType = centroids.schema.apply(cenIdCol).dataType
    val dataFields = spark.read.parquet(indexPath).schema.fields
      .filterNot(f => f.name == "centroid_id" || f.name == "batch_id")
    val storeSchema = StructType(dataFields
      :+ StructField("centroid_id", cenType)
      :+ StructField("batch_id", LongType))
    spark.read.schema(storeSchema).parquet(indexPath)
      .filter(col("centroid_id").isInCollection(cells))
      .drop("batch_id")
      .dropDuplicates(idCol, "block")
  }

  /** Probed search over a stream-ingested store — identical results to
    * [[Quantize.ivfPqSearchStored]] over a batch-built store of the same
    * corpus (and hence to the in-memory [[Quantize.ivfPqSearch]]). */
  def searchIngested(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     idCol: String,
                     centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                     codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                     dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    graft.operators.Similarity.requireSmallQuerySide(queries, "searchIngested")
    val pruned = prunedIngestedSlice(spark, indexPath, queries, qIdCol, qVecCol,
      idCol, centroids, cenIdCol, cenVecCol, nProbe)
    Quantize.ivfPqSearchOn(pruned, queries, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)
  }

  /** [[searchIngested]] for a RESIDUAL stream-fed store: same pruned +
    * deduped slice, the residual ADC tail — identical results to the
    * in-memory [[Quantize.ivfPqSearchResidual]] over the same corpus. */
  def searchIngestedResidual(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String,
                             queries: DataFrame, qIdCol: String, qVecCol: String,
                             idCol: String,
                             centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                             codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                             dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    graft.operators.Similarity.requireSmallQuerySide(queries, "searchIngestedResidual")
    val pruned = prunedIngestedSlice(spark, indexPath, queries, qIdCol, qVecCol,
      idCol, centroids, cenIdCol, cenVecCol, nProbe)
    Quantize.ivfPqSearchResidualOn(pruned, queries, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)
  }

  /** Tombstone-aware search over a stream-fed SELF-CONTAINED store: the
    * stored quantizers pick the frames AND the ADC formula (the residual
    * flag), retractions are honored exactly as in
    * [[Quantize.searchSelfContained]] — the one entry point a deployment
    * that streams into a [[Quantize.buildSelfContained]] store needs. */
  def searchIngestedSelfContained(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String,
                                  queries: DataFrame, qIdCol: String, qVecCol: String,
                                  k: Int, nProbe: Int): DataFrame = {
    graft.operators.Similarity.requireSmallQuerySide(queries,
      "searchIngestedSelfContained")
    val (cents, cb, p) = Quantize.loadQuantizers(spark, indexPath)
    val slice = prunedIngestedSlice(spark, indexPath, queries, qIdCol, qVecCol,
      p.idCol, cents, "centroid_id", "cen_emb", nProbe)
    val tomb = Quantize.readTombstones(spark, indexPath, p.idCol)
    val live = slice.join(broadcast(tomb),
      slice(p.idCol) === tomb(p.idCol), "leftanti")
    if (p.residual)
      Quantize.ivfPqSearchResidualOn(live, queries, qIdCol, qVecCol, p.idCol,
        cents, "centroid_id", "cen_emb", cb, "code", "c_emb",
        p.dims, p.nBlocks, k, nProbe)
    else
      Quantize.ivfPqSearchOn(live, queries, qIdCol, qVecCol, p.idCol,
        cents, "centroid_id", "cen_emb", cb, "code", "c_emb",
        p.dims, p.nBlocks, k, nProbe)
  }
}
