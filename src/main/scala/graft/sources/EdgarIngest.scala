package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate
import java.util.UUID

/** Ingest hardening — the reference's client-side machinery (SURVEY §2.1
  * S3-S5, §2.9 T1-T4) in distributable Scala. The HTTP layer is an
  * injectable `fetch: String => String` so every policy is testable without
  * a network (this container has zero egress; in production bind a real
  * client here).
  *
  * Distribution model (ref runs a Semaphore(5) in one process,
  * sec_client.py:282-313): tickers become a DataFrame repartitioned to
  * `concurrency` partitions; each task runs the rate-limited, retrying
  * fetch for its slice via mapPartitions. Task parallelism IS the
  * semaphore, and the per-task limiter divides the global budget so the
  * aggregate stays under the SEC's 10 req/s regardless of executor count.
  */
object EdgarIngest {

  /** S3: token-interval rate limiter (ref: sec_client.py:20-39).
    * `permitsPerSecond` is the PER-TASK budget — callers divide the global
    * cap by the fetch parallelism. */
  final class RateLimiter(permitsPerSecond: Double,
                          nanoTime: () => Long = System.nanoTime,
                          sleep: Long => Unit = ms => Thread.sleep(ms)) {
    private val intervalNanos = (1e9 / permitsPerSecond).toLong
    // anchor to the clock's arbitrary origin (nanoTime may be negative)
    private var nextFree = nanoTime()
    def acquire(): Long = synchronized {
      val now = nanoTime()
      val waitNanos = math.max(0L, nextFree - now)
      nextFree = math.max(now, nextFree) + intervalNanos
      if (waitNanos > 0) sleep(waitNanos / 1000000L)
      waitNanos
    }
  }

  /** S4: retry with exponential backoff (ref: sec_client.py:83-116 —
    * 3 attempts, base 1 s, retry on throttle/transient, fail fast on
    * not-found). Returns Right(result) or Left(last error). */
  final case class Retryable(message: String) extends RuntimeException(message)
  final case class Fatal(message: String) extends RuntimeException(message)

  def retry[T](attempts: Int = 3, backoffBaseMs: Long = 1000,
               sleep: Long => Unit = ms => Thread.sleep(ms))(op: () => T): Either[Throwable, T] = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return Right(op())
      catch {
        case f: Fatal => return Left(f)
        case e: Throwable =>
          last = e
          i += 1
          if (i < attempts) sleep(backoffBaseMs * (1L << (i - 1)))
      }
    }
    Left(last)
  }

  /** S2+S5: bounded-concurrency batch fetch with per-item failure isolation
    * (ref: sec_client.py:282-313): N tickers → `concurrency` partitions →
    * per-task rate-limited retrying fetch → (ticker, json, error) rows.
    * A failed ticker yields an error row, never a job abort. */
  def fetchCompanyFacts(spark: SparkSession, tickers: Seq[String],
                        fetch: String => String,
                        concurrency: Int = 5,
                        globalPermitsPerSecond: Double = 10.0,
                        attempts: Int = 3,
                        backoffBaseMs: Long = 1000): DataFrame = {
    import spark.implicits._
    val perTask = globalPermitsPerSecond / math.max(1, concurrency)
    tickers.toDF("ticker")
      .repartition(concurrency)
      .mapPartitions { it =>
        val limiter = new RateLimiter(perTask)
        it.map { row =>
          val ticker = row.getString(0)
          limiter.acquire()
          retry(attempts, backoffBaseMs)(() => fetch(ticker)) match {
            case Right(json) => (ticker, json, null: String)
            case Left(err)   => (ticker, null: String, err.getMessage)
          }
        }
      }.toDF("ticker", "json", "error")
  }

  /** T1: staleness tiers (ref: pipeline.py:222-242): refresh cadence by
    * days since the last filing — recent filers refresh daily, quiet ones
    * weekly. Pure function over the freshness aggregate (A7). */
  def needsRefresh(daysSinceFiling: Long, hoursSinceFetch: Long): Boolean =
    if (daysSinceFiling < 30) hoursSinceFetch > 24
    else if (daysSinceFiling < 90) hoursSinceFetch > 72
    else hoursSinceFetch > 168

  /** T1 over the store: join freshness with last-fetch metadata and keep
    * tickers due for refresh. */
  def dueForRefresh(freshness: DataFrame, lastFetch: DataFrame,
                    today: LocalDate): DataFrame = {
    val needs = udf((d: java.sql.Date, h: Long) =>
      // no known filing date → cadence unknown → always due
      if (d == null) true
      else needsRefresh(
        java.time.temporal.ChronoUnit.DAYS.between(d.toLocalDate, today), h))
    freshness.join(lastFetch, Seq("ticker"), "left")
      .withColumn("hours_since_fetch", coalesce(col("hours_since_fetch"), lit(Long.MaxValue / 4)))
      .filter(needs(col("latest_date"), col("hours_since_fetch")))
      .select("ticker")
  }

  /** T3: job lifecycle (ref: models.py:200-226, pipeline.py:59-73) —
    * pending → running → completed/failed with UUID ids; history capped. */
  sealed trait JobStatus
  case object Pending extends JobStatus
  case object Running extends JobStatus
  case object Completed extends JobStatus
  case object Failed extends JobStatus

  final case class EtlJob(id: String, ticker: String, status: JobStatus,
                          error: Option[String] = None)

  final class JobTracker(historyLimit: Int = 100) {
    private var jobs = Vector.empty[EtlJob]
    def create(ticker: String): EtlJob = synchronized {
      val j = EtlJob(UUID.randomUUID().toString, ticker, Pending)
      jobs = (jobs :+ j).takeRight(historyLimit)
      j
    }
    def transition(id: String, status: JobStatus, error: Option[String] = None): Unit =
      synchronized {
        jobs = jobs.map(j => if (j.id == id) j.copy(status = status, error = error) else j)
      }
    def history: Seq[EtlJob] = synchronized(jobs)
    /** A4 pipeline stats: success rate + counts over the last-N window. */
    def stats: (Int, Int, Double) = synchronized {
      val done = jobs.count(_.status == Completed)
      val failed = jobs.count(_.status == Failed)
      val total = done + failed
      (done, failed, if (total == 0) 0.0 else done.toDouble / total * 100)
    }
  }

  /** T2+T4 orchestration: fetch → flatten → skip-unchanged gate → dynamic
    * partition upsert (full refresh = same call; the overwrite only touches
    * partitions present in the batch).
    *
    * The fetched batch is persisted before its two consumers (the write and
    * the status collect) — without it the lazy mapPartitions fetch would
    * run TWICE (double network load, and statuses could disagree with the
    * data actually written). */
  def ingest(spark: SparkSession, tickers: Seq[String], fetch: String => String,
             base: String, tracker: JobTracker = new JobTracker(),
             skipUnchanged: Boolean = false): Seq[EtlJob] = {
    val raw = fetchCompanyFacts(spark, tickers, fetch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ok = raw.filter(col("error").isNull).select("ticker", "json")
      val facts = CompanyFacts.flatten(ok)
      val sigCols = Seq("ticker", "concept", "value", "fiscal_year", "fiscal_period")
      val write =
        if (!skipUnchanged) true
        else {
          // T2 gate: compare signatures over the refreshed tickers only
          val stored = try {
            FactStore.read(spark, base)
              .filter(col("ticker").isInCollection(tickers))
              .select(sigCols.map(col): _*)
          } catch { case _: Throwable => null }
          stored == null || !FactStore.unchanged(facts.select(sigCols.map(col): _*), stored)
        }
      if (write) FactStore.write(facts, base)
      val fetched = raw.select("ticker", "error").collect()
      fetched.map { r =>
        val j = tracker.create(r.getString(0))
        val status = if (r.getString(1) == null) Completed else Failed
        tracker.transition(j.id, status, Option(r.getString(1)))
        tracker.history.find(_.id == j.id).get
      }.toSeq
    } finally raw.unpersist()
  }
}
