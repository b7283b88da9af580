package graft
import org.apache.spark.sql.SparkSession

/** The bench's regression-flag decision, factored out of the measurement
  * loop so the gate itself is spec-testable against the observed
  * false-flag classes (BenchGateSpec replays round 7's three noise flags
  * and a genuine regression). */
object BenchGate {
  val RatioThreshold = 2.0
  val DuckFloorSec = 0.05
  val SparkFloorSec = 0.5
  val MinSpread = 1.25

  /** Flag iff BOTH: the spark/duck ratio breached 2× the committed ratio
    * (with materiality floors), AND the Spark wall exceeds the committed
    * run's own observed ceiling (committed min × committed spread,
    * spread floored — a wall the committed run itself reached cannot be
    * a plan regression). Any missing committed datum → no flag (new
    * queries establish a baseline, they don't diff against nothing). */
  def regressed(sparkNow: Double, duckNow: Option[Double],
                prevRatio: Option[Double], prevMin: Option[Double],
                prevSpread: Option[Double]): Boolean =
    (for {
      dn <- duckNow
      pr <- prevRatio
      if dn >= DuckFloorSec && sparkNow >= SparkFloorSec && pr > 0 &&
        sparkNow / dn > RatioThreshold * pr
      pm <- prevMin
      sp = math.max(prevSpread.getOrElse(1.0), MinSpread)
      if sparkNow > pm * sp
    } yield true).getOrElse(false)
}

object Bench {

  private def fmt(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Minimal extraction of `"name":number` pairs from a committed bench
    * artifact's "queries" object — enough to diff without a JSON lib.
    * Returns empty when the artifact was measured at a DIFFERENT SF dir
    * than `sfDir`: cross-SF deltas are all noise (a local sf0.001 probe
    * run must not flag "regressions" against the official sf0.1 round,
    * or vice versa). */
  private def priorQueryTimes(path: String, sfDir: String): Map[String, Double] =
    priorObject(path, sfDir, "queries")

  /** Same extraction for the prior round's per-query spark/duckdb ratios
    * (the `"ratios"` object inside BENCH_FULL.json's duckdb block). These
    * are the drift-proof regression baseline: a ratio compares Spark to a
    * DuckDB measurement taken in the SAME run, so machine-load swings that
    * move both engines ±20% cancel instead of flagging. */
  private def priorRatios(path: String, sfDir: String): Map[String, Double] =
    priorObject(path, sfDir, "ratios")

  private def priorObject(path: String, sfDir: String, key: String): Map[String, Double] = {
    try {
      val src = scala.io.Source.fromFile(path)
      val text = try src.mkString finally src.close()
      // whitespace-tolerant: BENCH_FULL.json is compact, but the DuckDB
      // baseline is python-pretty-printed ("sf": "..." with a space)
      val sfRec = ("\"sf\":\\s*\"([^\"]+)\"").r.findFirstMatchIn(text).map(_.group(1))
      if (!sfRec.contains(sfDir)) return Map.empty
      val qm = ("\"" + key + "\":\\s*\\{").r.findFirstMatchIn(text).getOrElse(return Map.empty)
      val body = text.substring(qm.end)
      val obj = body.substring(0, body.indexOf('}'))
      """"([^"]+)":\s*(-?[0-9.]+)""".r.findAllMatchIn(obj)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  /** Top-level numeric field from a committed bench artifact, SF-gated
    * like [[priorObject]]. For the memo-off A/B embed. */
  private def priorScalar(path: String, sfDir: String, key: String): Option[Double] =
    try {
      val src = scala.io.Source.fromFile(path)
      val text = try src.mkString finally src.close()
      val sfRec = ("\"sf\":\\s*\"([^\"]+)\"").r.findFirstMatchIn(text).map(_.group(1))
      if (!sfRec.contains(sfDir)) None
      else ("\"" + key + "\":\\s*(-?[0-9.]+)").r.findFirstMatchIn(text)
        .map(_.group(1).toDouble)
    } catch { case _: Throwable => None }

  /** 1-minute load average from /proc/loadavg (linux; -1 elsewhere). */
  private def loadAvg(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
    } catch { case _: Throwable => -1.0 }

  /** Environment pinning: wait (bounded) for the machine to quiet down
    * before measuring, and record the load we actually measured under.
    * A concurrent sbt compile or driver job inflates a whole run ~25%;
    * recording the load makes a hot run self-identifying instead of
    * masquerading as a plan regression. */
  private def waitForQuiet(maxWaitSec: Int, threshold: Double): (Double, Int) = {
    var waited = 0
    var l = loadAvg()
    while (l > threshold && waited < maxWaitSec) {
      Thread.sleep(15000); waited += 15; l = loadAvg()
    }
    (l, waited)
  }

  /** JSON string escaping, same discipline as Verify. */
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracleJson(dir: java.nio.file.Path): java.nio.file.Path = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(dir.resolve("oracle_sql.json"), json)
  }

  /** Long-lived DuckDB measurement coprocess (round 14): Bench times a
    * query's Spark reps and then immediately asks this process to time
    * the SAME query's DuckDB reps — per-query temporal adjacency, so
    * both engines see identical machine conditions and the ratio is
    * load-invariant by construction. The round-13 two-halves design
    * (full Spark suite, then full DuckDB suite) let a load swing land on
    * one engine only: the DuckDB denominator moved 125.5→172.1 s between
    * rounds on identical queries. Protocol: one query name per stdin
    * line → one JSON reply line; see tools/duckdb_serve.py. */
  private final class DuckCoprocess(sfDir: String, reps: Int) {
    private val tmp = java.nio.file.Files.createTempDirectory("graft_duck_serve")
    private val oraclePath = writeOracleJson(tmp)
    private val pb = new ProcessBuilder("python3", "tools/duckdb_serve.py",
      sfDir, oraclePath.toString, reps.toString)
    pb.redirectErrorStream(false)
    pb.directory(new java.io.File("."))
    private val proc = pb.start()
    private val toChild = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream,
        java.nio.charset.StandardCharsets.UTF_8), true)
    private val fromChild = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream,
        java.nio.charset.StandardCharsets.UTF_8))
    // drain stderr so the child can't block on a full pipe
    new Thread(() => {
      try {
        val err = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getErrorStream))
        while (err.readLine() != null) {}
      } catch { case _: Throwable => }
    }, "duck-serve-stderr").start()

    /** Bounded readLine: null on timeout/death (caller falls back). */
    private def readLineBounded(timeoutMs: Long): String = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (!fromChild.ready() && proc.isAlive &&
          System.nanoTime() < deadline) Thread.sleep(20)
      if (fromChild.ready()) fromChild.readLine() else null
    }

    /** Handshake: the child prints a ready line once views are built. */
    val ready: Boolean =
      try {
        val line = readLineBounded(120000)
        line != null && line.contains("\"ready\": true")
      } catch { case _: Throwable => false }

    private def field(line: String, name: String): Option[Double] =
      ("\"" + name + "\":\\s*(-?[0-9.]+)").r.findFirstMatchIn(line)
        .map(_.group(1).toDouble)

    /** Time one query in DuckDB now. Returns (bestSec, childLoadavg);
      * None on SQL error, protocol break, or child death. */
    def measure(name: String): Option[(Double, Double)] =
      try {
        if (!proc.isAlive) return None
        toChild.println(name)
        val line = readLineBounded(120000)
        if (line == null) None
        else field(line, "best").map(b => (b, field(line, "loadavg").getOrElse(-1.0)))
      } catch { case _: Throwable => None }

    def alive: Boolean = proc.isAlive

    def close(): Unit = {
      try toChild.println("__exit__") catch { case _: Throwable => }
      try { if (!proc.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)) proc.destroy() }
      catch { case _: Throwable => }
    }
  }

  /** Measure DuckDB over the oracle suite IN THIS RUN (same machine
    * conditions as the Spark numbers above it) by shelling to the repo's
    * baseline tool with a temp output path. Child output is captured so
    * the stdout contract line stays the process's final line. Returns
    * (perQueryTimes, sourceTag). Falls back to the committed
    * BASELINE_DUCKDB.json when python/duckdb is unavailable. Kept as the
    * fallback for the interleaved coprocess path. */
  private def sameRunDuck(sfDir: String, reps: Int): (Map[String, Double], String) = {
    import scala.sys.process._
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_bench_duck")
      writeOracleJson(tmp)
      val outPath = tmp.resolve("duck_now.json").toString
      val log = new StringBuilder
      val logger = ProcessLogger(s => log.append(s).append('\n'), s => log.append(s).append('\n'))
      val p = Process(Seq("python3", "tools/bench_duckdb.py", sfDir, tmp.toString,
        reps.toString, outPath), new java.io.File(".")).run(logger)
      val deadlineNs = System.nanoTime() + 20L * 60 * 1000000000L
      while (p.isAlive() && System.nanoTime() < deadlineNs) Thread.sleep(500)
      if (p.isAlive()) { p.destroy(); return (committedDuck(sfDir), "committed_fallback_timeout") }
      p.exitValue() // bench_duckdb exits 1 on per-query SQL errors; partial timings still usable
      val m = priorQueryTimes(outPath, sfDir)
      if (m.nonEmpty) (m, "same_run")
      else (committedDuck(sfDir), "committed_fallback_empty")
    } catch { case _: Throwable => (committedDuck(sfDir), "committed_fallback_error") }
  }

  private def committedDuck(sfDir: String): Map[String, Double] =
    priorQueryTimes("BASELINE_DUCKDB.json", sfDir)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Diff baselines from the previous committed round, read BEFORE this
    // run overwrites BENCH_FULL.json. Regression flagging keys off the
    // RATIOS (spark / same-run-duckdb); the absolute walls are kept in the
    // artifact for context only.
    val prevRatios = priorRatios("BENCH_FULL.json", sfDir)
    val prior = priorQueryTimes("BENCH_FULL.json", sfDir)
    // Prior per-query spread (max/min over the committed run's reps): the
    // committed run's own observed ceiling. A query whose wall now sits
    // INSIDE what the committed run itself measured cannot be a plan
    // regression — sub-second queries triple on JIT/GC state alone
    // (observed spreads >3x on unchanged plans, three rounds of false
    // flags), and a DuckDB-side speedup moves the ratio without moving
    // Spark at all. The flag gate below requires the Spark wall to exceed
    // the committed run's own max (min x spread) before a ratio breach
    // counts.
    val prevSpread = priorObject("BENCH_FULL.json", sfDir, "spread_max_over_min")
    // Environment pinning: bounded wait for background load to drain, then
    // record the load the measurement actually ran under.
    val quietThreshold = math.max(4.0, cpus.toDouble / 4.0)
    val (loadStart, loadWaited) = waitForQuiet(maxWaitSec = 180, threshold = quietThreshold)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the driver captures only the last ~2 KB of output, and
    // any stray WARN after the contract line (or between it and process exit)
    // evicts the JSON from that window — round 4's artifact was unparseable
    // for exactly this reason.
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session outside any per-query measurement: one pass of the
    // full suite at sf0.001 compiles every query's whole-stage-codegen unit
    // (Janino compiles are 100-500 ms each and cache on generated source,
    // which is scale-independent), then a footer/row-count touch of each
    // bench-SF table primes file listings. The measured loop is then
    // steady-state engine throughput — the regime that matters at scale —
    // not JVM cold-start. Run in stable name order.
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir // custom datasets: warm on the bench data itself
    var warmFailures = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => warmFailures += 1 }
    }
    if (warmFailures > 0)
      System.err.println(s"[bench] WARNING: $warmFailures warmup queries failed on $warmDir — " +
        "measured numbers include codegen compile time for those queries")
    Tables.AllTables.foreach { name =>
      try Tables.t(spark, sfDir, name).count() catch { case _: Throwable => }
    }
    spark.catalog.clearCache() // warmup must not donate cached data
    // Per-query time = MIN over `reps` identical runs (cache cleared
    // between runs, so no run reads a predecessor's intermediates). The
    // min is the steady-state engine cost — the regime that matters at
    // scale — with single-run noise (GC pauses, page-cache misses, JIT
    // recompiles) excluded; single-run numbers on this suite vary ±40%.
    // The max is kept alongside so the artifact records how noisy each
    // query's measurement was (spread = max/min).
    //
    // One UNTIMED full pass at the BENCH SF before any measurement:
    // first-touch costs that survive the sf0.001 warmup (bench-SF file
    // listings, page-cache fill, sf-specific JIT recompiles) land here
    // instead of in the first measured queries. The round-5 artifacts
    // flagged the three alphabetically-first queries >2× their prior
    // mins for exactly this leak — the suite head paid all of its
    // back-to-back reps before the engine settled at the bench SF.
    // (Interleaving the reps as suite-wide passes was tried and
    // rejected: it cools each query's codegen/page cache between its
    // own reps and inflates every min ~20%, breaking cross-round
    // comparability; the untimed pass fixes the head without changing
    // what the measured number means.)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => }
      spark.catalog.clearCache()
    }
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_REPS").flatMap(_.toIntOption).getOrElse(3))
    // Interleaved DuckDB coprocess (round 14): each query's DuckDB reps
    // run immediately after its Spark reps, so both engines share the
    // machine conditions of the same moment. SPARK_GRAFT_DUCK_MODE=post
    // restores the round-13 suite-after-suite measurement;
    // SPARK_GRAFT_SAMERUN_DUCK=0 still pins the committed baseline.
    val duckReps = math.max(1,
      sys.env.get("SPARK_GRAFT_DUCK_REPS").flatMap(_.toIntOption).getOrElse(2))
    val duckMode = sys.env.getOrElse("SPARK_GRAFT_DUCK_MODE", "interleaved")
    val coproc: Option[DuckCoprocess] =
      if (duckMode == "interleaved" &&
          !sys.env.get("SPARK_GRAFT_SAMERUN_DUCK").contains("0"))
        try {
          val c = new DuckCoprocess(sfDir, duckReps)
          if (c.ready) Some(c) else { c.close(); None }
        } catch { case _: Throwable => None }
      else None
    val duckNow = scala.collection.mutable.Map.empty[String, Double]
    val duckLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    // One rep, split at the construct/execute boundary: `construct` is the
    // lambda invocation — plan construction, plus for the store-lifecycle
    // queries the EAGER harness work their semantics require (build +
    // write + mutate a durable index before the measured search exists);
    // `execute` is the count() — the query the suite actually measures.
    // For ordinary queries construct is plan-building milliseconds; for
    // lifecycle queries it is the harness cost DuckDB's formula-only
    // oracle never pays, so materiality below is computed on the execute
    // tail while the construct cost stays visible for trend.
    def repOnce(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): (Double, Double) = {
      val t0 = System.nanoTime()
      var tc = t0
      try {
        val df = fn(spark, sfDir)
        tc = System.nanoTime()
        df.count()
      } catch { case _: Throwable => if (tc == t0) tc = System.nanoTime() }
      val t2 = System.nanoTime()
      // drop anything the query persisted so no run's timing borrows
      // (or pays eviction for) cached intermediates
      spark.catalog.clearCache()
      ((tc - t0) / 1e9, (t2 - tc) / 1e9)
    }
    // Per-query: min/max of the FULL wall (construct+execute, the
    // cross-round comparable number) plus component mins (each component
    // min'd independently across reps — the steady-state cost of that
    // component; their sum can undercut the full min, which is fine for
    // the materiality split they exist for).
    final case class QT(name: String, mn: Double, mx: Double,
                        cons: Double, exec: Double)
    val timings = ordered.map { case (name, fn) =>
      val ds = (1 to reps).map(_ => repOnce(fn))
      // the interleave point: this query's DuckDB reps, now — the child
      // runs while the Spark JVM is idle (sequential, no CPU contention)
      coproc.foreach { c =>
        c.measure(name).foreach { case (best, load) =>
          duckNow(name) = best
          if (load >= 0) duckLoads += load
        }
      }
      QT(name, ds.map(d => d._1 + d._2).min, ds.map(d => d._1 + d._2).max,
        ds.map(_._1).min, ds.map(_._2).min)
    }
    // survived the whole loop ⇒ any missing entries are per-query SQL
    // errors (absent from the baseline, same as the post-hoc tool's
    // behavior), not lost measurements
    val coprocSurvived = coproc.exists(_.alive)
    coproc.foreach(_.close())
    // DuckDB baseline resolution: interleaved coprocess numbers when they
    // cover every oracle-backed query (the load-robust basis); the
    // round-13 suite-after-suite measurement when the coprocess was
    // unavailable or died mid-run; the committed baseline on request.
    val (duck, duckSource) =
      if (sys.env.get("SPARK_GRAFT_SAMERUN_DUCK").contains("0"))
        (committedDuck(sfDir), "committed_by_request")
      else if (coprocSurvived && duckNow.nonEmpty)
        (duckNow.toMap, "interleaved")
      else if (coproc.isDefined) {
        // coprocess died mid-run: a partial interleaved basis would skew
        // the totals, so re-measure the whole suite post-hoc instead
        val (m, tag) = sameRunDuck(sfDir, duckReps)
        (m, tag + "_after_interleave_died")
      } else sameRunDuck(sfDir, duckReps)
    // Regression flag — RATIO mode with a WALL CEILING gate (round-8
    // change): a query is flagged only when BOTH hold —
    //  (1) its spark/duckdb ratio (both sides measured in the SAME run)
    //      exceeds 2× the prior committed round's ratio, with materiality
    //      floors on both engines' absolute walls; and
    //  (2) its Spark wall exceeds the committed run's OWN observed
    //      ceiling for that query (committed min × committed spread,
    //      spread floored at 1.25) — a wall the committed run itself
    //      reached cannot be a plan regression.
    // (1) alone flagged three kinds of noise across rounds 5–7: absolute
    // walls move ±20% with machine load (rounds 5–6), sub-second queries
    // triple on JIT/GC state with in-run spreads >3× on unchanged plans
    // (qx60/qx63, round 7), and a DuckDB-side SPEEDUP doubles the ratio
    // without Spark moving at all (qx59, round 7). A genuine plan
    // regression raises Spark's wall past anything the committed run saw
    // and still trips (2).
    def regressed(name: String, mn: Double): Boolean =
      BenchGate.regressed(mn, duck.get(name), prevRatios.get(name),
        prior.get(name), prevSpread.get(name))
    // Transient-flag kill (round-7): a sub-second query can triple on one
    // run's JIT/GC state alone (observed back-to-back full runs: qx62 at
    // 0.32 s and 1.17 s under load_ok=1 both times). Each PROVISIONALLY
    // flagged query is re-measured fresh at the end of the run, mins
    // folded in: a genuine plan regression reproduces; a transient
    // evaporates — the committed artifact flags plans, not moments.
    val provisional = timings.collect {
      case t if regressed(t.name, t.mn) => t.name }.toSet
    val queryByName = ordered.toMap
    val finalTimings =
      if (provisional.isEmpty) timings
      else timings.map { t =>
        if (!provisional(t.name)) t
        else {
          val again = (1 to reps).map(_ => repOnce(queryByName(t.name)))
          QT(t.name,
            math.min(t.mn, again.map(d => d._1 + d._2).min),
            math.max(t.mx, again.map(d => d._1 + d._2).max),
            math.min(t.cons, again.map(_._1).min),
            math.min(t.exec, again.map(_._2).min))
        }
      }
    val loadEnd = loadAvg()
    val results = finalTimings.map(t => (t.name, t.mn))
    val total = results.map(_._2).sum
    val regressions = finalTimings.flatMap { t =>
      if (!regressed(t.name, t.mn)) None
      else Some(
        s"""{"query":"${t.name}","prev_ratio":${fmt(prevRatios(t.name))},""" +
          s""""now_ratio":${fmt(t.mn / duck(t.name))},""" +
          s""""spark_now":${fmt(t.mn)},"duck_now":${fmt(duck(t.name))},""" +
          s""""prev_spark_wall":${fmt(prior.getOrElse(t.name, -1.0))},""" +
          s""""prev_wall_ceiling":${fmt(prior.get(t.name).map(pm =>
            pm * math.max(prevSpread.getOrElse(t.name, 1.0), 1.25)).getOrElse(-1.0))}}""")
    }
    // an A/B or probe run redirected via SPARK_GRAFT_BENCH_OUT must not
    // clobber the primary regression artifact (its prev-ratio baseline is
    // the memo-ON run's — every flag would be noise)
    val primaryRun =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json") == "BENCH_FULL.json"
    try if (primaryRun) {
      val w = new java.io.PrintWriter("BENCH_DELTA.json")
      try w.println(regressions.mkString(
        s"""{"mode":"ratio_vs_same_run_duckdb+wall_ceiling","duck_source":"$duckSource",""" +
          s""""prev_ratio_baseline_n":${prevRatios.size},"flagged":${regressions.size},""" +
          s""""threshold":2.0,"floors":{"duck_sec":0.05,"spark_sec":0.5},""" +
          s""""wall_ceiling":"prev_min_x_max(prev_spread,1.25)","regressions":[""",
        ",", "]}"))
      finally w.close()
    } catch { case _: Throwable => }
    // Full per-query detail goes to a file; the stdout contract line must
    // stay well under the driver's 2 KB tail-capture window (the round-2
    // 86-entry line overflowed it and the driver recorded parsed:null), so
    // it carries only the slowest 20 queries.
    // vs-DuckDB block: per-query spark/duckdb ratios over the shared query
    // set (qx47's estimator query has no oracle SQL → no DuckDB side;
    // absent = not compared)
    val duckCovered = results.filter { case (k, _) => duck.contains(k) }
    val duckTotal = duckCovered.map { case (k, _) => duck(k) }.sum
    val sparkOnDuckSet = duckCovered.map(_._2).sum
    val ratioJson =
      if (duck.isEmpty) """"duckdb":null"""
      else {
        val ratios = duckCovered.map { case (k, v) =>
          s"\"" + k + "\":" + fmt(if (duck(k) > 0) v / duck(k) else -1.0) }.mkString(",")
        val over2x = duckCovered.count { case (k, v) => duck(k) > 0 && v > 2.0 * duck(k) }
        // Ratio floors: below ~50 ms of DuckDB work / ~500 ms of Spark
        // work, the per-query ratio measures Spark's FIXED per-job cost
        // (scheduling + codegen, ~0.1-0.2 s — amortized to nothing on a
        // real cluster workload) against a millisecond in-process
        // aggregate, not engine throughput. "Material" over-2× entries
        // are the ones where both engines do real work — those get a
        // plan note or a fix.
        // Materiality on the MEASURED (execute) tail: the lifecycle
        // queries spend seconds of construct-phase harness (store build/
        // write/mutate) their formula-only DuckDB oracle never pays;
        // counting that cost as "the query is >2× DuckDB" misread the
        // harness as the engine for three rounds. The full-wall variant
        // is kept alongside for cross-round trend.
        val execByName = finalTimings.map(t => t.name -> t.exec).toMap
        val over2xMaterial = duckCovered.count { case (k, _) =>
          duck(k) >= 0.05 && execByName(k) >= 0.5 && execByName(k) > 2.0 * duck(k) }
        val over2xMaterialFull = duckCovered.count { case (k, v) =>
          duck(k) >= 0.05 && v >= 0.5 && v > 2.0 * duck(k) }
        // the measured-basis headline (round 12): Spark's EXECUTE time on
        // the shared set over the same-run DuckDB total — the construct
        // phase is store-build/lifecycle harness the closed-form oracles
        // never pay, and SCALE.md's narrative cites this committed number
        // instead of hand-summing construct_sec
        val sparkExecOnDuckSet = duckCovered.map { case (k, _) => execByName(k) }.sum
        // duck-side load exposure (interleaved mode): the child reports
        // /proc/loadavg with every reply, so the artifact records the
        // conditions the DENOMINATOR ran under, next to loadavg_start
        val duckLoadJson =
          if (duckLoads.isEmpty) ""
          else s""""duck_loadavg_mean":${fmt(duckLoads.sum / duckLoads.size)},""" +
            s""""duck_loadavg_max":${fmt(duckLoads.max)},"""
        s""""duckdb":{"source":"$duckSource",$duckLoadJson"total":${fmt(duckTotal)},""" +
          s""""spark_total_on_shared":${fmt(sparkOnDuckSet)},""" +
          s""""spark_measured_on_shared":${fmt(sparkExecOnDuckSet)},""" +
          s""""ratio_total":${fmt(if (duckTotal > 0) sparkOnDuckSet / duckTotal else -1.0)},""" +
          s""""ratio_total_measured":${fmt(if (duckTotal > 0) sparkExecOnDuckSet / duckTotal else -1.0)},""" +
          // self-describing bases (round 13): the measured ratio divides
          // Spark execute-only time by DuckDB's same-run TOTAL — the
          // excluded construct phase includes the store/index builds the
          // measured queries then serve from, so the measured ratio must
          // always be cited ALONGSIDE ratio_total, never instead of it.
          """"basis_note":"ratio_total = full Spark wall (construct+execute) / duckdb total; """ +
          """ratio_total_measured = execute-only / duckdb total — construct (store-build/lifecycle """ +
          """harness, memoized once per JVM since r13) excluded, so cite with ratio_total",""" +
          s""""n_shared":${duckCovered.size},"n_over_2x":$over2x,""" +
          s""""n_over_2x_material":$over2xMaterial,""" +
          s""""n_over_2x_material_full":$over2xMaterialFull,"ratios":{$ratios}}"""
      }
    val fullJson = {
      val mins = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString(",")
      val spreads = finalTimings.map(t =>
        s"\"" + t.name + "\":" + fmt(if (t.mn > 0) t.mx / t.mn else 1.0)).mkString(",")
      // harness/measured split, emitted only where the construct phase is
      // material (>= 250 ms — ordinary queries spend 60-180 ms of
      // SF-independent schema/file-listing in the lambda; the lifecycle
      // queries' store builds run 1-4 s): absent = the query's wall IS
      // its execution. Materiality above uses exec for EVERY query
      // regardless of this emission filter.
      val harness = finalTimings.filter(_.cons >= 0.25)
      val consJson = harness.map(t =>
        s"\"" + t.name + "\":" + fmt(t.cons)).mkString(",")
      val execJson = harness.map(t =>
        s"\"" + t.name + "\":" + fmt(t.exec)).mkString(",")
      // committed totals for the harness/measured split over ALL queries
      // (the per-query maps below stay filtered to material construct):
      // full wall = construct_total + measured_total up to per-component
      // min skew
      val constructTotal = finalTimings.map(_.cons).sum
      val measuredTotal = finalTimings.map(_.exec).sum
      // memo A/B: this run's memo state, plus — when a committed memo-off
      // run exists for the same SF — its totals, so the memo's
      // contribution is a recorded number in the primary artifact rather
      // than a suspicion. Produce the A/B row with
      //   GRAFT_STORE_MEMO=0 SPARK_GRAFT_BENCH_OUT=BENCH_MEMO_OFF.json
      val memoOn = !sys.env.get("GRAFT_STORE_MEMO").contains("0")
      val memoOffAb = (for {
        t <- priorScalar("BENCH_MEMO_OFF.json", sfDir, "total")
        c <- priorScalar("BENCH_MEMO_OFF.json", sfDir, "construct_total")
      } yield s""""memo_off_ab":{"total":${fmt(t)},"construct_total":${fmt(c)},""" +
        s""""source":"BENCH_MEMO_OFF.json"},""").getOrElse("")
      s"""{"total":${fmt(total)},"queries":{$mins},"spread_max_over_min":{$spreads},""" +
        s""""construct_total":${fmt(constructTotal)},"measured_total":${fmt(measuredTotal)},""" +
        s""""construct_sec":{$consJson},"measured_sec":{$execJson},""" +
        s""""store_memo":${if (memoOn) 1 else 0},$memoOffAb""" +
        s""""reps":$reps,"regressions_vs_prev":${regressions.size},"sf":"$sfDir",""" +
        s""""loadavg_start":${fmt(loadStart)},"loadavg_end":${fmt(loadEnd)},""" +
        s""""load_wait_sec":$loadWaited,"load_ok":${if (loadStart >= 0 && loadStart <= quietThreshold) 1 else 0},""" +
        s"""$ratioJson,"n_queries":${results.size}}"""
    }
    try {
      val w = new java.io.PrintWriter(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json"))
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => }
    val top = results.sortBy(-_._2).take(20).sortBy(_._1)
    val topJson = top.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val spreadByName = finalTimings.map(t => t.name -> (if (t.mn > 0) t.mx / t.mn else 1.0)).toMap
    val topSpread = top.map { case (k, _) =>
      s"\"" + k + "\":" + BigDecimal(spreadByName(k)).setScale(2, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    val duckLine =
      if (duck.isEmpty || duckTotal <= 0) ""
      else s""""duckdb_total":${fmt(duckTotal)},"vs_duckdb":${fmt(sparkOnDuckSet / duckTotal)},"""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$topJson,""" +
      s""""spread":$topSpread,"reps":$reps,"regressions_vs_prev":${regressions.size},""" +
      s"""$duckLine"sf":"$sfDir","n_queries":${results.size}}""")
    spark.stop()
  }
}
