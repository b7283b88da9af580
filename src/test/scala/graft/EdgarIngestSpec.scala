package graft

import graft.sources.EdgarIngest
import graft.sources.EdgarIngest._
import org.apache.spark.sql.functions._
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger

class EdgarIngestSpec extends SparkSpec {

  test("rate limiter spaces permits at the configured interval") {
    var clock = 0L
    var slept = Vector.empty[Long]
    val rl = new RateLimiter(10.0, () => clock, ms => slept :+= ms)
    rl.acquire()            // t=0: free
    rl.acquire()            // next slot at 100ms → sleeps
    assert(slept.nonEmpty && slept.head >= 99)
    clock = 500 * 1000000L  // advance past the backlog
    val w = rl.acquire()
    assert(w === 0L)        // no wait after idle period
  }

  test("retry: backs off exponentially on transient, fails fast on fatal") {
    var sleeps = Vector.empty[Long]
    val calls = new AtomicInteger
    val r = retry(attempts = 3, backoffBaseMs = 100, sleep = sleeps :+= _) { () =>
      if (calls.incrementAndGet() < 3) throw Retryable("429") else "ok"
    }
    assert(r === Right("ok") && calls.get === 3)
    assert(sleeps === Vector(100L, 200L))

    val fatalCalls = new AtomicInteger
    val f = retry(attempts = 3, backoffBaseMs = 1, sleep = _ => ()) { () =>
      fatalCalls.incrementAndGet(); throw Fatal("404")
    }
    assert(f.isLeft && fatalCalls.get === 1)

    val exhausted = retry(attempts = 3, backoffBaseMs = 1, sleep = _ => ()) { () =>
      throw Retryable("always")
    }
    assert(exhausted.isLeft)
  }

  test("batch fetch isolates per-ticker failures as error rows") {
    val out = fetchCompanyFacts(spark, Seq("AAA", "BAD", "CCC"),
      fetch = t => if (t == "BAD") throw Fatal("404 not found") else s"""{"t":"$t"}""",
      concurrency = 2, globalPermitsPerSecond = 1000.0, backoffBaseMs = 1)
      .collect().map(r => (r.getString(0), r.getString(1) == null, r.getString(2))).sortBy(_._1)
    assert(out.length === 3)
    assert(out(1)._1 === "BAD" && out(1)._2 && out(1)._3.contains("404"))
    assert(!out(0)._2 && !out(2)._2) // AAA/CCC succeeded
  }

  test("staleness tiers follow the reference cadence") {
    assert(needsRefresh(10, 25) && !needsRefresh(10, 23))   // <30d: daily
    assert(needsRefresh(60, 73) && !needsRefresh(60, 71))   // <90d: 3-daily
    assert(needsRefresh(200, 169) && !needsRefresh(200, 100)) // else weekly
  }

  test("dueForRefresh joins freshness with fetch metadata; unseen tickers are due") {
    import spark.implicits._
    val freshness = Seq(
      ("AAA", java.sql.Date.valueOf("2026-08-01")),  // 11 days ago: tier-1
      ("BBB", java.sql.Date.valueOf("2025-01-01"))   // old filer: tier-3
    ).toDF("ticker", "latest_date")
    val lastFetch = Seq(("AAA", 30L), ("BBB", 100L)).toDF("ticker", "hours_since_fetch")
    val due = dueForRefresh(freshness, lastFetch, LocalDate.of(2026, 8, 12))
      .collect().map(_.getString(0)).sorted
    assert(due.toSeq === Seq("AAA")) // AAA stale at 30h; BBB fine at 100h
    // missing fetch metadata → treated as never fetched → due
    val due2 = dueForRefresh(freshness, Seq(("AAA", 1L)).toDF("ticker", "hours_since_fetch"),
      LocalDate.of(2026, 8, 12)).collect().map(_.getString(0)).sorted
    assert(due2.toSeq === Seq("BBB"))
  }

  test("job tracker: lifecycle transitions, history cap, stats") {
    val t = new JobTracker(historyLimit = 3)
    val ids = (1 to 5).map(i => t.create(s"T$i").id)
    assert(t.history.size === 3) // capped
    t.transition(ids(3), Completed)
    t.transition(ids(4), Failed, Some("boom"))
    val (done, failed, rate) = t.stats
    assert(done === 1 && failed === 1 && math.abs(rate - 50.0) < 1e-9)
  }

  test("EtlDaemon: two simulated cycles — first ingests everything, second fetches nothing") {
    val base = java.nio.file.Files.createTempDirectory("daemon").toString + "/facts"
    val meta = base + "_meta/last_fetch"
    // a CURRENT filing date puts both tickers in tier 1 (refresh after 24h)
    val json =
      """{"cik": 1, "entityName": "Daemon Co", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [{"start":"2026-01-01","end":"2026-08-01","val":10,
        |    "fy":2026,"fp":"Q2","form":"10-Q"}]}}}}}""".stripMargin
    // closures are task-serialized even in local mode — a captured
    // AtomicInteger would increment a copy; an accumulator reports back
    val fetches = spark.sparkContext.longAccumulator("fetches")
    val fetch = (_: String) => { fetches.add(1); json }
    val tickers = Seq("AAA", "BBB")
    val today = LocalDate.of(2026, 8, 12)
    val t0 = 1000000000000L
    // cycle 1: empty store → everything due → both fetched and stored
    val c1 = EtlDaemon.cycle(spark, base, meta, tickers, fetch, today, t0)
    assert(c1.due.toSet === Set("AAA", "BBB"))
    assert(c1.completed === 2 && c1.failed === 0)
    assert(fetches.value === 2)
    assert(graft.sources.FactStore.read(spark, base)
      .select("ticker").distinct().count() === 2)
    // cycle 2 an hour later: fresh store + fresh fetch metadata → nothing
    // due → the fetch function is never called
    val c2 = EtlDaemon.cycle(spark, base, meta, tickers, fetch,
      today, t0 + 3600L * 1000)
    assert(c2.due.isEmpty && c2.jobs.isEmpty)
    assert(fetches.value === 2, "second cycle must not fetch anything")
    // cycle 3 past the tier-1 cadence (25h): due again, skip-unchanged
    // sees identical content and still records the fetch
    val c3 = EtlDaemon.cycle(spark, base, meta, tickers, fetch,
      today.plusDays(2), t0 + 50L * 3600 * 1000)
    assert(c3.due.toSet === Set("AAA", "BBB") && c3.completed === 2)
    assert(fetches.value === 4)
    // a NEW ticker joins the universe: only it is due mid-cadence
    val c4 = EtlDaemon.cycle(spark, base, meta, tickers :+ "CCC", fetch,
      today.plusDays(2), t0 + 51L * 3600 * 1000)
    assert(c4.due === Seq("CCC") && fetches.value === 5)
  }

  test("EtlDaemon: a failed fetch is not recorded — the ticker stays due next cycle") {
    val base = java.nio.file.Files.createTempDirectory("daemonf").toString + "/facts"
    val meta = base + "_meta/last_fetch"
    val json =
      """{"cik": 2, "entityName": "Flaky Co", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [{"start":"2026-01-01","end":"2026-08-01","val":5,
        |    "fy":2026,"fp":"Q2","form":"10-Q"}]}}}}}""".stripMargin
    val today = LocalDate.of(2026, 8, 12)
    val t0 = 1000000000000L
    // BBB's upstream is down for cycle 1
    val c1 = EtlDaemon.cycle(spark, base, meta, Seq("AAA", "BBB"),
      t => if (t == "BBB") throw Fatal("404") else json, today, t0)
    assert(c1.completed === 1 && c1.failed === 1)
    // an hour later: AAA is fresh (recorded), BBB was never recorded and
    // has no stored facts → it alone is due, and this time it succeeds
    val c2 = EtlDaemon.cycle(spark, base, meta, Seq("AAA", "BBB"),
      _ => json, today, t0 + 3600L * 1000)
    assert(c2.due === Seq("BBB"), s"only the failed ticker retries: ${c2.due}")
    assert(c2.completed === 1 && c2.failed === 0)
    // now both are fresh → nothing due
    val c3 = EtlDaemon.cycle(spark, base, meta, Seq("AAA", "BBB"),
      _ => json, today, t0 + 2 * 3600L * 1000)
    assert(c3.due.isEmpty)
  }

  test("EtlDaemon: last-fetch swap is crash-safe — a mid-swap crash leaves a recoverable .old copy") {
    val meta = java.nio.file.Files.createTempDirectory("daemonmeta").toString + "/last_fetch"
    EtlDaemon.recordFetched(spark, meta, Seq("AAA", "BBB"), 1000L)
    // simulate a crash between recordFetched's two renames: live moved
    // aside to .old, the new table never arrived
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(meta), spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(meta),
      new org.apache.hadoop.fs.Path(meta + ".old")))
    val recovered = EtlDaemon.readLastFetch(spark, meta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(recovered === Map("AAA" -> 1000L, "BBB" -> 1000L),
      s"a mid-swap crash must not lose fetch history (refetch storm): $recovered")
    // the next successful record heals: merges the recovered history,
    // installs a fresh live table, and drops the .old copy
    EtlDaemon.recordFetched(spark, meta, Seq("BBB"), 2000L)
    val healed = EtlDaemon.readLastFetch(spark, meta)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(healed === Map("AAA" -> 1000L, "BBB" -> 2000L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(meta + ".old")),
      "completed swap must drop the fallback copy")
  }

  test("StoreLock: racing acquires on the local filesystem admit exactly one winner") {
    import graft.sources.StoreLock
    // The local-FS path must go through an OS-level O_CREAT|O_EXCL (Hadoop's
    // RawLocalFileSystem create(overwrite=false) is exists-then-create, a
    // TOCTOU window): 32 threads hammering acquire on a fresh lock must
    // produce exactly one winner, every loser a StoreLockedException.
    val base = java.nio.file.Files.createTempDirectory("lockrace").toString + "/store"
    val winners = new java.util.concurrent.atomic.AtomicInteger(0)
    val losers = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val threads = (1 to 32).map { i =>
      new Thread(() => {
        gate.await()
        try { StoreLock.acquire(spark, base, s"racer-$i"); winners.incrementAndGet() }
        catch { case _: StoreLock.StoreLockedException => losers.incrementAndGet() }
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(winners.get() == 1, s"exactly one acquire must win, got ${winners.get()}")
    assert(losers.get() == 31)
    StoreLock.release(spark, base)
  }

  test("EtlDaemon: cycle and compact cannot interleave on the same store — the loser fails loudly") {
    import graft.sources.StoreLock
    val base = java.nio.file.Files.createTempDirectory("daemonlock").toString + "/facts"
    val meta = base + "_meta/last_fetch"
    val json =
      """{"cik": 3, "entityName": "Lock Co", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [{"start":"2026-01-01","end":"2026-08-01","val":7,
        |    "fy":2026,"fp":"Q2","form":"10-Q"}]}}}}}""".stripMargin
    val today = LocalDate.of(2026, 8, 12)
    // populate the store with one clean cycle (takes and releases the lock)
    val c1 = EtlDaemon.cycle(spark, base, meta, Seq("AAA"), _ => json, today, 1000000000000L)
    assert(c1.completed === 1)
    // a cycle is mid-write (holds the lock) → compact must refuse, loudly
    StoreLock.acquire(spark, base, "cycle")
    val e1 = intercept[java.io.IOException] { EtlDaemon.compactStore(spark, base, 1000L) }
    assert(e1.getMessage.contains("locked") && e1.getMessage.contains("cycle"),
      s"loser must name the holder: ${e1.getMessage}")
    StoreLock.release(spark, base)
    // and the reverse: compaction holds the lock → a due cycle must refuse
    StoreLock.acquire(spark, base, "compact")
    val e2 = intercept[java.io.IOException] {
      EtlDaemon.cycle(spark, base, meta, Seq("AAA"), _ => json,
        today.plusDays(2), 1000000000000L + 50L * 3600 * 1000)
    }
    assert(e2.getMessage.contains("locked") && e2.getMessage.contains("compact"),
      s"loser must name the holder: ${e2.getMessage}")
    StoreLock.release(spark, base)
    // once released, both proceed: compact runs clean on the real store
    val stats = EtlDaemon.compactStore(spark, base, 1000L)
    assert(stats.filesAfter > 0)
    assert(!new java.io.File(StoreLock.lockPath(base).toString.stripPrefix("file:")).exists(),
      "lock must not outlive the operation")
    // and a later due cycle still works after compaction
    val c2 = EtlDaemon.cycle(spark, base, meta, Seq("AAA"), _ => json,
      today.plusDays(2), 1000000000000L + 50L * 3600 * 1000)
    assert(c2.completed === 1)
  }

  test("EtlDaemon.runDaemon survives a locked store: cycles are skipped, not fatal, and resume after release") {
    import graft.sources.StoreLock
    val base = java.nio.file.Files.createTempDirectory("daemonskip").toString + "/facts"
    val meta = base + "_meta/last_fetch"
    val json =
      """{"cik": 4, "entityName": "Skip Co", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [{"start":"2026-01-01","end":"2026-08-01","val":9,
        |    "fy":2026,"fp":"Q2","form":"10-Q"}]}}}}}""".stripMargin
    // a maintenance window holds the lock for the daemon's whole run
    StoreLock.acquire(spark, base, "compact")
    var logs = Vector.empty[String]
    var clock = 1000000000000L
    val n = EtlDaemon.runDaemon(spark, base, meta, Seq("AAA"), _ => json,
      intervalMs = 1000L, maxCycles = 2,
      nowMs = () => { clock += 60000; clock },
      sleep = _ => (), log = logs :+= _)
    assert(n === 2, "the daemon must outlive locked cycles")
    assert(logs.count(_.contains("skipped")) === 2, logs.toString)
    assert(EtlDaemon.readLastFetch(spark, meta).count() === 0L,
      "skipped cycles must not record fetches")
    // once maintenance releases, the next cycle does the skipped work
    StoreLock.release(spark, base)
    val c = EtlDaemon.cycle(spark, base, meta, Seq("AAA"), _ => json,
      LocalDate.of(2026, 8, 12), clock)
    assert(c.completed === 1)
  }

  test("EtlDaemon.runDaemon: jittered sleeps between cycles, bounded by maxCycles") {
    val base = java.nio.file.Files.createTempDirectory("daemonloop").toString + "/facts"
    var slept = Vector.empty[Long]
    var clock = 1000000000000L
    val n = EtlDaemon.runDaemon(spark, base, base + "_meta/last_fetch",
      Seq.empty, _ => "", intervalMs = 1000L, maxCycles = 3,
      nowMs = () => { clock += 60000; clock },
      sleep = ms => slept :+= ms, log = _ => ())
    assert(n === 3)
    assert(slept.size === 2, "no sleep after the final cycle")
    // jitter stays within ±10% and differs between cycles
    assert(slept.forall(ms => ms >= 900 && ms <= 1100), slept.toString)
    assert(slept.distinct.size === slept.size, s"jitter must vary: $slept")
  }

  test("end-to-end ingest: fetch -> flatten -> partitioned store with failure isolation") {
    val base = java.nio.file.Files.createTempDirectory("ingest").toString
    val goodJson =
      """{"cik": 1, "entityName": "Good Co", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [{"start":"2021-01-01","end":"2021-12-31","val":10,
        |    "fy":2021,"fp":"FY","form":"10-K"}]}}}}}""".stripMargin
    val jobs = ingest(spark, Seq("GOOD", "BAD"),
      fetch = t => if (t == "BAD") throw Fatal("404") else goodJson, base)
    assert(jobs.map(j => (j.ticker, j.status)).toMap ===
      Map("GOOD" -> Completed, "BAD" -> Failed))
    val stored = graft.sources.FactStore.read(spark, base)
    assert(stored.filter(col("ticker") === "GOOD").count() === 1)
  }
}
