package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Advisory mutual exclusion between store-mutating maintenance
  * operations — the interlock that makes [[Compaction]]'s quiescence
  * contract ENFORCED rather than documented. An ingest cycle appending
  * partitions and a compaction rewriting the directory must never
  * interleave on the same store: the concurrent append would land in the
  * directory that becomes `.compact-bak` and its rows would vanish with
  * the backup.
  *
  * Mechanism: a sibling `<store>.lock` file created atomically, so
  * exactly one of two racing operations wins; the loser gets a loud
  * IOException naming the holder (operation, timestamp, pid) instead of
  * silently corrupting the store. On HDFS, `FileSystem.create(path,
  * overwrite = false)` is the atomic namenode-arbitrated primitive. On
  * the LOCAL filesystem Hadoop's RawLocal/ChecksumFileSystem implements
  * that call as a non-atomic exists()-then-create, so local paths use
  * `java.nio.file.Files.createFile` instead — O_CREAT|O_EXCL at the OS
  * level, genuinely atomic, closing the window where a daemon cycle and
  * a concurrent compact could both think they acquired the lock. Advisory: writers must opt in ([[graft.EtlDaemon]]'s cycle
  * and compact subcommands both do), which is the standard posture for
  * filesystem stores without a table-format commit protocol (Delta and
  * Iceberg solve this with optimistic commits; on a plain directory the
  * lock file is the honest equivalent).
  *
  * A crashed holder leaves the lock behind — deliberately: the operator
  * must inspect and `release` (or delete) it, because the alternative
  * (TTL auto-expiry) re-admits exactly the race this exists to prevent
  * if the "stale" holder is actually alive and slow. The holder line in
  * the error message says who to look for.
  */
object StoreLock {

  /** Typed refusal so callers can tell "the store is busy" (retryable —
    * the daemon skips the cycle and tries again next interval) from a
    * genuine I/O failure (not). */
  final class StoreLockedException(message: String, cause: Throwable)
    extends java.io.IOException(message, cause)

  private def fsFor(spark: SparkSession, base: String): FileSystem =
    FileSystem.get(new java.net.URI(base),
      spark.sparkContext.hadoopConfiguration)

  def lockPath(base: String): Path = new Path(base.stripSuffix("/") + ".lock")

  /** Acquire the store's maintenance lock or throw. The failure message
    * names the current holder so the loser of a race knows what it lost
    * to. */
  def acquire(spark: SparkSession, base: String, op: String): Path = {
    val fs = fsFor(spark, base)
    val lock = lockPath(base)
    if (lock.getParent != null) fs.mkdirs(lock.getParent)
    val holderLine =
      s"$op since=${java.time.Instant.ofEpochMilli(System.currentTimeMillis())} " +
        s"pid=${ProcessHandle.current().pid()}"
    def locked(cause: Throwable): Nothing = {
      val holder =
        try {
          val in = fs.open(lock)
          try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        } catch { case _: Exception => "<unreadable>" }
      throw new StoreLockedException(
        s"store $base is locked by [$holder] — refusing to start '$op'. " +
          "If the holder crashed, inspect and delete " + lock, cause)
    }
    val scheme = fs.getUri.getScheme
    if (scheme == null || scheme == "file") {
      // Local FS: Hadoop's create(path, overwrite=false) here is
      // exists()-then-create (NOT atomic); go through the OS primitive.
      val nio = java.nio.file.Paths.get(lock.toUri.getPath)
      try {
        java.nio.file.Files.createFile(nio) // O_CREAT|O_EXCL
        java.nio.file.Files.writeString(nio, holderLine)
        lock
      } catch {
        case e: java.nio.file.FileAlreadyExistsException => locked(e)
      }
    } else {
      try {
        val out = fs.create(lock, false) // atomic on HDFS (namenode-arbitrated)
        try out.write(holderLine.getBytes("UTF-8")) finally out.close()
        lock
      } catch {
        case e: java.io.IOException if fs.exists(lock) => locked(e)
      }
    }
  }

  def release(spark: SparkSession, base: String): Boolean =
    fsFor(spark, base).delete(lockPath(base), false)

  /** Run `body` holding the store lock; always releases, even on failure
    * inside `body` (the lock guards interleaving, not crash recovery —
    * a failed compaction's own swap logic handles its cleanup). */
  def withLock[T](spark: SparkSession, base: String, op: String)(body: => T): T = {
    acquire(spark, base, op)
    try body finally release(spark, base)
  }
}
