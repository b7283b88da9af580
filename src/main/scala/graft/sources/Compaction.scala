package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File-size governance for parquet stores — the small-file problem.
  *
  * Long-lived stores written by incremental jobs (the streaming near-dup
  * index, per-batch ingest appends, dynamic partition overwrites) decay
  * into thousands of KB-sized files; at 100 TB that is the difference
  * between a scan planning 10^4 splits and 10^7 (driver listing time,
  * task-launch overhead, row-group fragmentation all scale with file
  * count). Compaction rewrites a directory into bounded-size files:
  *
  *  - `REBALANCE` hint → AQE sizes output partitions at runtime
  *    (`spark.sql.adaptive.advisoryPartitionSizeInBytes`), splitting
  *    skewed partitions AND coalescing small ones — the right primitive,
  *    vs a hand-guessed `repartition(n)` that re-skews as data drifts;
  *  - `maxRecordsPerFile` caps any single file regardless.
  *
  * The rewrite goes to a sibling temp dir, then swaps via two renames
  * (HDFS-atomic each; the swap window itself is not transactional — a
  * production deployment wraps this in a table format's commit protocol,
  * which is exactly what Delta/Iceberg OPTIMIZE is; the data motion below
  * is the same either way).
  *
  * CONTRACT — the path must be QUIESCENT for the whole call: no writers
  * (a concurrent append lands in the directory that becomes
  * `.compact-bak` and its rows vanish with the backup), and readers must
  * tolerate the swap window (between the two renames the live directory
  * briefly does not exist — and on object stores "rename" is a copy, so
  * the window is as wide as the copy; racing readers get FileNotFound,
  * not a torn version). Schedule compaction in the same maintenance
  * window as retention, or wrap it in a table-format commit when one is
  * available. `keepBackup = true` retains `.compact-bak` (the complete
  * pre-compaction directory) for the caller to inspect and delete after
  * validating the rewrite, instead of dropping it immediately. A retained
  * backup lives until the caller deletes it: the next compactParquet on
  * the same path REFUSES to run while `.compact-bak` exists, so a backup
  * is never silently destroyed mid-validation.
  */
object Compaction {

  final case class Stats(filesBefore: Long, filesAfter: Long,
                         bytesBefore: Long, bytesAfter: Long)

  private def dataFiles(fs: FileSystem, dir: Path): Seq[(Path, Long)] = {
    val it = fs.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Path, Long)]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith("."))
        out += ((f.getPath, f.getLen))
    }
    out.toSeq
  }

  /** Compact a parquet directory in place. `partitionCols` preserves an
    * existing hive-style partition layout (compaction happens within
    * partitions); empty compacts to a flat layout. */
  def compactParquet(spark: SparkSession, path: String,
                     maxRecordsPerFile: Long,
                     partitionCols: Seq[String] = Nil,
                     keepBackup: Boolean = false): Stats = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(path)
    val before = dataFiles(fs, dir)
    val tmp = new Path(path + ".compact-tmp")
    val bak = new Path(path + ".compact-bak")
    // A leftover backup is a previous rewrite's pre-image that the caller
    // asked to keep and has not yet released — deleting it here would
    // destroy it while they may still be validating. Make them decide.
    if (fs.exists(bak))
      throw new java.io.IOException(
        s"refusing to compact: backup $bak already exists from a previous " +
        "keepBackup run — validate and delete it (or restore it) first")
    fs.delete(tmp, true)
    val writer = spark.read.parquet(path)
      .hint("rebalance")
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(tmp.toString)
    // swap: old → bak, new → live. Readers racing the swap see either
    // full version, except during the two renames themselves (see the
    // quiescence contract above).
    if (!fs.rename(dir, bak))
      throw new java.io.IOException(s"compaction swap failed: $dir -> $bak")
    if (!fs.rename(tmp, dir)) {
      fs.rename(bak, dir) // restore
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $dir")
    }
    if (!keepBackup) fs.delete(bak, true)
    val after = dataFiles(fs, dir)
    Stats(before.size, after.size, before.map(_._2).sum, after.map(_._2).sum)
  }
}
