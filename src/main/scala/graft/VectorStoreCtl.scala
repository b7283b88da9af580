package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Quantize

/** The deployable ANN-store entry point — [[EtlDaemon]]'s counterpart for
  * the vector side: every lifecycle operation the library implements
  * (build / append / tombstone / sweep / delete / compact / recell /
  * search / status), drivable from a scheduler against a SELF-CONTAINED
  * store
  * (quantizers persisted beside the cells by `Quantize.saveQuantizers`,
  * so no invocation can pass the wrong frozen frames). Mutating
  * subcommands rely on the same `StoreLock` interlock the operators
  * already take (sweep) or document (append/delete/compact single-writer
  * contract).
  *
  * Subcommands (first arg; parquet paths for data args):
  *  - `build <corpus> <idCol> <vecCol> <centroids> <cenId> <cenVec>
  *           <codebook> <cbId> <cbVec> <dims> <nBlocks> <residual> <store>
  *           [vectors]` — trailing `vectors` also persists the raw-vector
  *    sidecar, making `searchref`/`recell` runnable with `sidecar` in
  *    place of a corpus path (no lake pointer rides the invocation)
  *  - `append <batch> <vecCol> <store>`        — frozen stored quantizers
  *  - `tombstone <ids> <store>`                — O(1) deferred retraction
  *  - `sweep <store> <maxDeadFraction>`        — threshold retention sweep
  *  - `delete <ids> <store>`                   — immediate cell surgery
  *  - `compact <store> [maxRecordsPerFile]`    — defragment cells
  *  - `flatten <store>`                        — promote a stream-fed
  *    (cell, batch) store to the canonical cell layout (the hand-off
  *    from ingesting to maintained; single-level ops refuse until run)
  *  - `recell <store> <corpus> <vecCol> [nCells|auto] [nCodes|keep]
  *            [retrainCodebook]`               — retrain the quantizer
  *    geometry from the live corpus (the lake table holding the exact
  *    vectors, or the literal `sidecar` to retrain from the store's own
  *    `.vectors` — vecCol is then ignored, pass `-`); `auto` = HighRecall
  *    √N cells, `keep` = current codebook size. Crash-safe rename-swap
  *    install; tombstones cleared.
  *  - `recover <store>`                        — restore interrupted delete
  *  - `recover-recell <store>`                 — resolve interrupted recell
  *  - `search <queries> <qIdCol> <qVecCol> <k> <nProbe|auto> <store> [out]`
  *  - `searchref <queries> <qIdCol> <qVecCol> <k> <nProbe|auto>
  *               <depth|auto> <corpus> <vecCol> <store> [out]`
  *    — the HIGH-RECALL configuration (RECALL.md): stored ADC search at
  *    `depth`, then one exact-rescore pass over `corpus` (or the literal
  *    `sidecar` to rescore from the store's own `.vectors`; vecCol is
  *    then ignored, pass `-`). `auto` resolves both budgets via
  *    `Quantize.HighRecall` (nProbe = ceil(cells/3),
  *    depth = max(100, 10k)) — the measured recall@10 >= 0.9 default.
  *  - `maintain <store> <maxDeadFraction>`     — sweep, then compact if
  *                                               cells fragmented
  *  - `daemon <store> <maxDeadFraction> <hours>` — loop maintain cycles
  *                                               with jittered sleep
  *  - `status <store>`                         — cells/rows/tombstones/params
  */
object VectorStoreCtl {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  private val usage =
    "usage: build|append|tombstone|sweep|delete|compact|flatten|recell|" +
      "recover|recover-recell|search|searchref|maintain|daemon|status ..."

  /** `auto` probe budget: the store's persisted serving hints when a
    * drift policy has written any (StoreCtl's query-drift adaptivity),
    * else [[Quantize.HighRecall.nProbe]] over the store's actual cell
    * count (its persisted centroid frame). */
  private def resolveNProbe(spark: SparkSession, store: String, arg: String): Int =
    if (arg == "auto")
      Quantize.servingHints(spark, store).map(_._1).getOrElse(
        Quantize.HighRecall.nProbe(
          Quantize.loadQuantizers(spark, store)._1.count()))
    else arg.toInt

  final case class MaintainReport(sweep: Quantize.SweepStats,
                                  compact: Option[graft.sources.Compaction.Stats])

  /** One maintenance cycle: retention sweep, then — only when the sweep
    * (or prior appends) left more files than `maxFilesPerCell` per live
    * cell on average — a compaction. Both operations take the store lock
    * themselves; the caller schedules, the operators interlock. */
  def maintain(spark: SparkSession, store: String, maxDeadFraction: Double,
               maxFilesPerCell: Double = 4.0,
               maxRecordsPerFile: Long = 1000000L): MaintainReport = {
    val sweep = Quantize.retentionSweep(spark, store,
      Quantize.loadQuantizers(spark, store)._3.idCol, maxDeadFraction)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    val cells = fs.listStatus(new org.apache.hadoop.fs.Path(store))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("centroid_id="))
    val files = cells.map(c => fs.listStatus(c.getPath)
      .count(f => f.getPath.getName.endsWith(".parquet")).toLong).sum
    val compact =
      if (cells.nonEmpty && files.toDouble / cells.length > maxFilesPerCell)
        Some(Quantize.compactIvfPqIndex(spark, store, maxRecordsPerFile))
      else None
    MaintainReport(sweep, compact)
  }

  /** Maintenance daemon: loop [[maintain]] cycles with jittered sleep —
    * [[EtlDaemon.runDaemon]]'s shape for the vector store. A locked store
    * (a concurrent append window or another maintainer) is a SKIP, not a
    * crash: the dead rows are still dead next interval. Injectable
    * sleep/log so the policy is spec-testable without real time. */
  def runMaintenanceDaemon(spark: SparkSession, store: String,
                           maxDeadFraction: Double, intervalMs: Long,
                           maxCycles: Long = Long.MaxValue,
                           sleep: Long => Unit = ms => Thread.sleep(ms),
                           log: String => Unit = println): Long = {
    require(intervalMs > 0, "intervalMs must be positive")
    var cycles = 0L
    while (cycles < maxCycles) {
      try {
        val r = maintain(spark, store, maxDeadFraction)
        log(s"[vec] cycle ${cycles + 1}: swept ${r.sweep.cellsSwept} cells, " +
          s"${r.sweep.rowsRemoved} rows removed, " +
          s"${r.sweep.tombstonesRemaining} tombstones pending" +
          r.compact.map(c => s"; compacted ${c.filesBefore} -> ${c.filesAfter} files")
            .getOrElse(""))
      } catch {
        case e: graft.sources.StoreLock.StoreLockedException =>
          log(s"[vec] cycle ${cycles + 1} skipped: ${e.getMessage}")
      }
      cycles += 1
      if (cycles < maxCycles) {
        val h = scala.util.hashing.MurmurHash3.stringHash(s"graft-vec-$cycles")
        val frac = (h.toLong & 0xffffL).toDouble / 0xffffL * 2.0 - 1.0
        sleep(math.max(0L, intervalMs + (intervalMs * 0.1 * frac).toLong))
      }
    }
    cycles
  }

  /** Dispatch split out of main so specs can drive subcommands on a test
    * session without forking a JVM. */
  def run(spark: SparkSession, args: Array[String]): Unit = args(0) match {
    case "build" =>
      val Array(_, corpus, idCol, vecCol, cents, cenId, cenVec,
        cb, cbId, cbVec, dims, nBlocks, residual, store) = args.take(14)
      val withVecs = args.lift(14).contains("vectors")
      Quantize.buildSelfContained(spark,
        spark.read.parquet(corpus), idCol, vecCol,
        spark.read.parquet(cents), cenId, cenVec,
        spark.read.parquet(cb), cbId, cbVec,
        dims.toInt, nBlocks.toInt, residual.toBoolean, store,
        storeVectors = withVecs)
      println(s"built $store (residual=$residual) with persisted quantizers" +
        (if (withVecs) " and the raw-vector sidecar" else ""))
    case "append" =>
      val Array(_, batch, vecCol, store) = args
      Quantize.appendSelfContained(spark, store,
        spark.read.parquet(batch), vecCol)
      println(s"appended $batch into $store against stored quantizers")
    case "tombstone" =>
      val Array(_, ids, store) = args
      val p = Quantize.loadQuantizers(spark, store)._3
      val n = Quantize.addTombstones(spark, store,
        spark.read.parquet(ids), p.idCol)
      println(s"tombstoned $n ids in $store (deferred; sweep to reclaim)")
    case "sweep" =>
      val Array(_, store, frac) = args
      val p = Quantize.loadQuantizers(spark, store)._3
      val s = Quantize.retentionSweep(spark, store, p.idCol, frac.toDouble)
      println(s"swept $store: ${s.cellsSwept} cells rewritten, " +
        s"${s.rowsRemoved} rows removed, ${s.tombstonesPurged} tombstones " +
        s"purged, ${s.tombstonesRemaining} remaining")
    case "delete" =>
      val Array(_, ids, store) = args
      val p = Quantize.loadQuantizers(spark, store)._3
      val n = Quantize.deleteFromIvfPqIndex(spark, store,
        spark.read.parquet(ids), p.idCol)
      println(s"deleted $n code rows from $store")
    case "compact" =>
      val store = args(1)
      val maxRec = args.lift(2).flatMap(_.toLongOption).getOrElse(1000000L)
      val s = Quantize.compactIvfPqIndex(spark, store, maxRec)
      println(s"compacted $store: ${s.filesBefore} -> ${s.filesAfter} files")
    case "flatten" =>
      val store = args(1)
      val p = Quantize.loadQuantizers(spark, store)._3
      val n = Quantize.flattenIngestedStore(spark, store, p.idCol)
      println(if (n < 0) s"$store already has the canonical cell layout"
              else s"flattened $store to the cell layout ($n code rows)")
    case "recell" =>
      val Array(_, store, corpus, vecCol) = args.take(4)
      val nCells = args.lift(4).filterNot(_ == "auto")
        .flatMap(_.toIntOption).getOrElse(-1)
      val nCodes = args.lift(5).filterNot(_ == "keep")
        .flatMap(_.toIntOption).getOrElse(-1)
      val retrainCb = args.lift(6).forall(_.toBoolean)
      val (nLive, cells) =
        if (corpus == "sidecar")
          Quantize.recellIvfPqStoreFromSidecar(spark, store,
            nCells, nCodes, retrainCb)
        else Quantize.recellIvfPqStore(spark, store,
          spark.read.parquet(corpus), vecCol, nCells, nCodes, retrainCb)
      println(s"recelled $store: $nLive live vectors re-encoded into " +
        s"$cells cells (codebook ${if (retrainCb) "retrained" else "kept"})")
    case "recover" =>
      val store = args(1)
      val did = Quantize.recoverDeleteBackup(spark, store)
      println(if (did) s"restored $store from interrupted delete backup"
              else s"nothing to recover for $store")
    case "recover-recell" =>
      val store = args(1)
      val did = Quantize.recoverIvfPqRecell(spark, store)
      println(if (did) s"resolved interrupted recell of $store"
              else s"nothing to recover for $store")
    case "search" =>
      val Array(_, queries, qIdCol, qVecCol, k, nProbe, store) = args.take(7)
      val res = Quantize.searchSelfContained(spark, store,
        spark.read.parquet(queries), qIdCol, qVecCol, k.toInt,
        resolveNProbe(spark, store, nProbe))
        .orderBy("query_id", "rank")
      args.lift(7) match {
        case Some(out) =>
          res.coalesce(1).write.mode("overwrite").parquet(out)
          println(s"wrote search results to $out")
        case None => res.show(100, truncate = false)
      }
    case "searchref" =>
      val Array(_, queries, qIdCol, qVecCol, k, nProbe, depth, corpus,
        vecCol, store) = args.take(10)
      val kk = k.toInt
      // `auto` depth: the drift policy's hints only ever RAISE the budget
      // above the HighRecall floor — hints are written from adaptK (default
      // 10, so ~100-150); taking them verbatim would silently LOWER depth
      // for k above the hint's calibration (k=50 -> depth 150 instead of
      // 500, and for k > hint the shortlist could not even fill k rows).
      val dep = if (depth == "auto")
        math.max(
          Quantize.servingHints(spark, store).map(_._2).getOrElse(0),
          Quantize.HighRecall.rerankDepth(kk))
        else depth.toInt
      val res = (if (corpus == "sidecar")
          Quantize.searchSelfContainedRefinedStored(spark, store,
            spark.read.parquet(queries), qIdCol, qVecCol, kk,
            resolveNProbe(spark, store, nProbe), dep)
        else Quantize.searchSelfContainedRefined(spark, store,
          spark.read.parquet(queries), qIdCol, qVecCol,
          spark.read.parquet(corpus), vecCol, kk,
          resolveNProbe(spark, store, nProbe), dep))
        .orderBy("query_id", "rank")
      args.lift(10) match {
        case Some(out) =>
          res.coalesce(1).write.mode("overwrite").parquet(out)
          println(s"wrote refined search results to $out")
        case None => res.show(100, truncate = false)
      }
    case "maintain" =>
      val Array(_, store, frac) = args.take(3)
      val r = maintain(spark, store, frac.toDouble)
      println(s"maintained $store: swept ${r.sweep.cellsSwept} cells, " +
        s"${r.sweep.rowsRemoved} rows removed" +
        r.compact.map(c => s", compacted ${c.filesBefore} -> ${c.filesAfter} files")
          .getOrElse(""))
    case "daemon" =>
      val Array(_, store, frac, hours) = args.take(4)
      val maxCycles = sys.env.get("GRAFT_MAX_CYCLES")
        .flatMap(_.toLongOption).getOrElse(Long.MaxValue)
      runMaintenanceDaemon(spark, store, frac.toDouble,
        (hours.toDouble * 3600 * 1000).toLong, maxCycles)
    case "status" =>
      val store = args(1)
      val (cents, cb, p) = Quantize.loadQuantizers(spark, store)
      // Explicit-schema scan, same discipline as the search/delete paths:
      // hive partition-type inference would re-type numeric-looking string
      // centroid ids ("01" -> 1) and misreport the cell census. The
      // partition column is pinned to the STORED centroid frame's id type
      // (what the directory names were written from); data columns keep
      // their parquet-embedded types.
      val cenType = cents.schema.apply("centroid_id").dataType
      val dataFields = spark.read.parquet(store).schema.fields
        .filterNot(_.name == "centroid_id")
      val storeSchema = org.apache.spark.sql.types.StructType(
        dataFields :+ org.apache.spark.sql.types.StructField("centroid_id", cenType))
      val scan = spark.read.schema(storeSchema).parquet(store)
      val stats = scan.agg(count(lit(1)).as("rows"),
          countDistinct(col("centroid_id")).as("cells"),
          countDistinct(col(p.idCol)).as("vectors"))
        .collect().head
      val nRows = stats.getLong(0)
      val nCells = stats.getLong(1)
      val nVec = stats.getLong(2)
      val nTomb = Quantize.readTombstones(spark, store, p.idCol).count()
      // counted vectors, not nRows / nBlocks: a cell holding partial rows
      // (torn write) would silently skew the quotient — count ids and say
      // so loudly when the block arithmetic disagrees.
      val integrity =
        if (nRows == nVec * p.nBlocks) ""
        else s" [WARNING: $nRows code rows != $nVec vectors x ${p.nBlocks} blocks" +
          " — store may hold partial vectors]"
      println(s"store $store: params=$p, ${cents.count()} centroids, " +
        s"${cb.count()} codes, $nCells live cells, $nRows code rows " +
        s"($nVec vectors), $nTomb pending tombstones$integrity")
    case other =>
      System.err.println(s"unknown subcommand '$other' — $usage")
      sys.exit(2)
  }
}
