package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{EdgarIngest, FactStore}
import java.time.LocalDate

/** The deployable ETL entry point — the piece that turns the ingest
  * policies (T1 staleness tiers, T2 skip-unchanged, T3 job lifecycle,
  * T4 full refresh) into a long-running service a user would actually
  * schedule, mirroring the reference's cron-driven CLI
  * ((/root/reference)/scripts/run_etl.py:40-172 subcommands,
  * docker-compose.yml:33-44 daily cron).
  *
  * Subcommands (first arg):
  *  - `fetch TICKER...`  — on-demand fetch, unconditional (run_etl.py fetch)
  *  - `incremental [T,..]` — one due-gated cycle (run_etl.py incremental/daily)
  *  - `full [T,..]`      — refetch everything, no skip gate (full_refresh)
  *  - `status`           — job stats + per-ticker freshness (run_etl.py status)
  *  - `daemon [hours]`   — loop incremental cycles with jittered sleep
  *                         (the crond replacement; docker-compose.yml:33-44)
  *  - `compact [maxRecordsPerFile]` — maintenance-window small-file
  *                         compaction of the store (Compaction contract:
  *                         run it while no daemon cycle is writing)
  *
  * Everything effectful is injected (fetch function, clock, sleep), so the
  * scheduling policy itself is spec-tested without a network or a real
  * clock — the container has zero egress; in production bind an HTTP
  * client as `fetch`.
  *
  * Scale notes: the per-cycle work is one freshness aggregate over the
  * store (columnar scan of two columns, map-side combinable), one tiny
  * last-fetch metadata read (O(tickers) rows), and one ingest of only the
  * DUE tickers. The metadata table is upserted by union+argmax rather than
  * read-modify-write per ticker, and stays O(universe of tickers) forever.
  */
object EtlDaemon {

  final case class CycleReport(due: Seq[String], jobs: Seq[EdgarIngest.EtlJob]) {
    def completed: Int = jobs.count(_.status == EdgarIngest.Completed)
    def failed: Int = jobs.count(_.status == EdgarIngest.Failed)
  }

  /** Last-fetch metadata: (ticker, fetched_at_ms). Missing file = never
    * fetched (dueForRefresh treats absent tickers as always due). If the
    * live table is missing but a `.old` copy exists, a [[recordFetched]]
    * swap crashed between its two renames — recover from the copy rather
    * than declaring every ticker due (refetch storm). Only path-not-found
    * maps to "never fetched"; corruption or I/O errors propagate so they
    * are distinguishable from an empty store. */
  def readLastFetch(spark: SparkSession, metaPath: String): DataFrame = {
    import spark.implicits._
    def missing(t: Throwable): Boolean = t match {
      case _: java.io.FileNotFoundException => true
      case e: org.apache.spark.sql.AnalysisException =>
        val m = Option(e.getMessage).getOrElse("")
        m.contains("PATH_NOT_FOUND") || m.contains("Path does not exist")
      case _ => false
    }
    try spark.read.parquet(metaPath)
    catch { case t: Throwable if missing(t) =>
      try spark.read.parquet(metaPath + ".old")
      catch { case t2: Throwable if missing(t2) =>
        Seq.empty[(String, Long)].toDF("ticker", "fetched_at_ms") }
    }
  }

  /** Upsert fetch timestamps: newest wins per ticker. The table is tiny
    * (one row per ticker ever fetched) — rewritten crash-safely via
    * rename+rename: the live table moves aside to `.old` BEFORE the new
    * one moves in, so a crash at any point leaves either the old table
    * live or a recoverable `.old` copy ([[readLastFetch]] falls back to
    * it) — never a window where all last-fetch history is gone and every
    * ticker looks due. */
  def recordFetched(spark: SparkSession, metaPath: String,
                    tickers: Seq[String], nowMs: Long): Unit = {
    if (tickers.isEmpty) return
    import spark.implicits._
    val fresh = tickers.map((_, nowMs)).toDF("ticker", "fetched_at_ms")
    val merged = readLastFetch(spark, metaPath).union(fresh)
      .groupBy("ticker")
      .agg(max(col("fetched_at_ms")).as("fetched_at_ms"))
    val tmp = metaPath + ".tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(metaPath), spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(metaPath)
    val old = new org.apache.hadoop.fs.Path(metaPath + ".old")
    fs.delete(old, true) // previous round's backup has served its purpose
    if (fs.exists(live) && !fs.rename(live, old))
      throw new java.io.IOException(s"last-fetch metadata swap failed: $live -> $old")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), live))
      throw new java.io.IOException(s"last-fetch metadata swap failed: $tmp -> $live")
    fs.delete(old, true) // swap complete; drop the fallback copy
  }

  /** Which of `tickers` are due right now: tickers absent from the store
    * are always due; stored tickers go through the T1 staleness tiers
    * (EdgarIngest.needsRefresh) against their last filing date and last
    * fetch time. */
  def dueTickers(spark: SparkSession, base: String, metaPath: String,
                 tickers: Seq[String], today: LocalDate, nowMs: Long): Seq[String] = {
    val stored = try Some(FactStore.read(spark, base)) catch { case _: Throwable => None }
    stored match {
      case None => tickers
      case Some(facts) =>
        val mine = facts.filter(col("ticker").isInCollection(tickers))
        val known = mine.select("ticker").distinct()
          .collect().map(_.getString(0)).toSet
        val fresh = FactStore.freshness(mine)
        val lastFetch = readLastFetch(spark, metaPath)
          .withColumn("hours_since_fetch",
            ((lit(nowMs) - col("fetched_at_ms")) / lit(3600000L)).cast("long"))
          .select("ticker", "hours_since_fetch")
        val dueStored = EdgarIngest.dueForRefresh(fresh, lastFetch, today)
          .collect().map(_.getString(0)).toSet
        // stable order: the configured ticker order is the fetch order
        tickers.filter(t => !known.contains(t) || dueStored.contains(t))
    }
  }

  /** One incremental cycle: due-gate → ingest (skip-unchanged) → record
    * fetch times. A cycle with nothing due does no fetch work at all.
    * The MUTATING phase runs under the store's maintenance lock
    * ([[graft.sources.StoreLock]]), so a cycle and a concurrent
    * `compact` on the same store can never interleave — the loser fails
    * loudly instead of the append's rows vanishing with the compaction
    * backup. */
  def cycle(spark: SparkSession, base: String, metaPath: String,
            tickers: Seq[String], fetch: String => String,
            today: LocalDate, nowMs: Long,
            tracker: EdgarIngest.JobTracker = new EdgarIngest.JobTracker(),
            skipUnchanged: Boolean = true): CycleReport = {
    val due = dueTickers(spark, base, metaPath, tickers, today, nowMs)
    if (due.isEmpty) return CycleReport(Nil, Nil)
    graft.sources.StoreLock.withLock(spark, base, "cycle") {
      val jobs = EdgarIngest.ingest(spark, due, fetch, base, tracker, skipUnchanged)
      recordFetched(spark, metaPath,
        jobs.filter(_.status == EdgarIngest.Completed).map(_.ticker), nowMs)
      CycleReport(due, jobs)
    }
  }

  /** Small-file compaction of the store, under the same maintenance lock
    * as [[cycle]] — this pairing is what turns Compaction.scala's
    * documented quiescence contract into an enforced one. */
  def compactStore(spark: SparkSession, base: String, maxRecordsPerFile: Long,
                   partitionCols: Seq[String] = Seq("ticker", "period_type", "fiscal_year"))
      : graft.sources.Compaction.Stats =
    graft.sources.StoreLock.withLock(spark, base, "compact") {
      graft.sources.Compaction.compactParquet(spark, base, maxRecordsPerFile,
        partitionCols)
    }

  /** The crond replacement: incremental cycles forever (or `maxCycles`),
    * sleeping `intervalMs` ± deterministic jitter between them. Jitter
    * desynchronizes a fleet of daemons that all restarted together —
    * without it every instance hits the upstream at the same instant
    * every interval. Clock and sleep are injectable for tests. */
  def runDaemon(spark: SparkSession, base: String, metaPath: String,
                tickers: Seq[String], fetch: String => String,
                intervalMs: Long, maxCycles: Long = Long.MaxValue,
                tracker: EdgarIngest.JobTracker = new EdgarIngest.JobTracker(),
                nowMs: () => Long = () => System.currentTimeMillis(),
                sleep: Long => Unit = ms => Thread.sleep(ms),
                jitterFraction: Double = 0.1,
                log: String => Unit = println): Long = {
    require(intervalMs > 0, "intervalMs must be positive")
    var cycles = 0L
    while (cycles < maxCycles) {
      val t = nowMs()
      val today = java.time.Instant.ofEpochMilli(t)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      // A locked store (a compaction window, or another daemon's cycle)
      // is a SKIP, not a crash: the due work is still due next interval,
      // and a daemon that dies because maintenance was running defeats
      // the point of the interlock. Any other failure still propagates.
      val report =
        try cycle(spark, base, metaPath, tickers, fetch, today, t, tracker)
        catch {
          case e: graft.sources.StoreLock.StoreLockedException =>
            log(s"[etl] cycle ${cycles + 1} skipped: ${e.getMessage}")
            CycleReport(Nil, Nil)
        }
      log(s"[etl] cycle ${cycles + 1}: ${report.due.size} due, " +
        s"${report.completed} completed, ${report.failed} failed")
      cycles += 1
      if (cycles < maxCycles) {
        // deterministic jitter: hash of the cycle index, ±jitterFraction
        val h = scala.util.hashing.MurmurHash3.stringHash(s"graft-etl-$cycles")
        val frac = (h.toLong & 0xffffL).toDouble / 0xffffL * 2.0 - 1.0
        sleep(math.max(0L, intervalMs + (intervalMs * jitterFraction * frac).toLong))
      }
    }
    cycles
  }

  private def splitTickers(arg: Option[String], config: Seq[String]): Seq[String] =
    arg.map(_.split(',').map(_.trim.toUpperCase).filter(_.nonEmpty).toSeq)
      .getOrElse(config)

  def main(args: Array[String]): Unit = {
    val cmd = args.headOption.getOrElse("status")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = sys.env.get("GRAFT_CONFIG")
      .map(p => graft.serve.GraftConfig.load(p))
      .getOrElse(graft.serve.GraftConfig.fromString(""))
    val base = cfg.storageBasePath.getOrElse(
      sys.env.getOrElse("GRAFT_DATA_DIR", "data/facts"))
    val metaPath = base.stripSuffix("/") + "_meta/last_fetch"
    val tickers = splitTickers(args.lift(1).filter(_ != "--"), cfg.sp500Tickers)
    // Zero-egress container: no default HTTP client is bound here. A
    // deployment provides one via GRAFT_FETCH_CMD (a shell command given
    // the ticker as $1 that prints the CompanyFacts JSON) — keeping this
    // main network-free by default while staying driveable end to end.
    val fetch: String => String = sys.env.get("GRAFT_FETCH_CMD") match {
      case Some(cmdLine) => (ticker: String) => {
        val p = new ProcessBuilder("sh", "-c", cmdLine + " \"$1\"", "sh", ticker)
          .redirectErrorStream(false).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        if (p.waitFor() != 0) throw EdgarIngest.Retryable(s"fetch rc!=0 for $ticker")
        out
      }
      case None => (ticker: String) =>
        throw EdgarIngest.Fatal(s"no fetch backend configured for $ticker " +
          "(set GRAFT_FETCH_CMD)")
    }
    val tracker = new EdgarIngest.JobTracker()
    def printJobs(jobs: Seq[EdgarIngest.EtlJob]): Unit = {
      val done = jobs.count(_.status == EdgarIngest.Completed)
      val failed = jobs.filter(_.status == EdgarIngest.Failed)
      println(s"jobs: ${jobs.size} total, $done completed, ${failed.size} failed")
      failed.foreach(j => println(s"  ${j.ticker}: ${j.error.getOrElse("?")}"))
    }
    cmd match {
      case "fetch" =>
        val ts = args.drop(1).map(_.toUpperCase).toSeq
        require(ts.nonEmpty, "usage: fetch TICKER...")
        printJobs(EdgarIngest.ingest(spark, ts, fetch, base, tracker))
      case "incremental" =>
        val now = System.currentTimeMillis()
        val report = cycle(spark, base, metaPath, tickers, fetch,
          LocalDate.now(java.time.ZoneOffset.UTC), now, tracker)
        println(s"due: ${report.due.mkString(",")}")
        printJobs(report.jobs)
      case "full" =>
        printJobs(EdgarIngest.ingest(spark, tickers, fetch, base, tracker,
          skipUnchanged = false))
      case "daemon" =>
        val hours = args.lift(1).flatMap(_.toDoubleOption).getOrElse(24.0)
        val maxCycles = sys.env.get("GRAFT_MAX_CYCLES")
          .flatMap(_.toLongOption).getOrElse(Long.MaxValue)
        runDaemon(spark, base, metaPath, tickers, fetch,
          (hours * 3600 * 1000).toLong, maxCycles, tracker)
      case "compact" =>
        val maxRecords = args.lift(1).flatMap(_.toLongOption).getOrElse(1000000L)
        val stats = compactStore(spark, base, maxRecords)
        println(s"compacted $base: ${stats.filesBefore} -> ${stats.filesAfter} files, " +
          s"${stats.bytesBefore} -> ${stats.bytesAfter} bytes")
      case "status" =>
        val (done, failed, rate) = tracker.stats
        println(s"jobs this process: $done completed, $failed failed, $rate% success")
        try {
          val facts = FactStore.read(spark, base)
          println(s"store: ${facts.select("ticker").distinct().count()} tickers, " +
            s"${facts.count()} facts")
          FactStore.freshness(facts).orderBy("ticker").show(50, truncate = false)
        } catch { case _: Throwable => println(s"store: empty ($base)") }
      case other =>
        System.err.println(s"unknown subcommand '$other' " +
          "(expected fetch|incremental|full|daemon|compact|status)")
        sys.exit(2)
    }
    spark.stop()
  }
}
