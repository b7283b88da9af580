package graft
import org.apache.spark.sql.SparkSession

object Bench {

  private def fmt(v: Double): String =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString

  /** Minimal extraction of `"name":number` pairs from a committed bench
    * artifact's "queries" object — enough to diff without a JSON lib.
    * Returns empty when the artifact was measured at a DIFFERENT SF dir
    * than `sfDir`: cross-SF deltas are all noise (a local sf0.001 probe
    * run must not flag "regressions" against the official sf0.1 round,
    * or vice versa). */
  private def priorQueryTimes(path: String, sfDir: String): Map[String, Double] = {
    try {
      val src = scala.io.Source.fromFile(path)
      val text = try src.mkString finally src.close()
      // whitespace-tolerant: BENCH_FULL.json is compact, but the DuckDB
      // baseline is python-pretty-printed ("sf": "..." with a space)
      val sfRec = """"sf":\s*"([^"]+)"""".r.findFirstMatchIn(text).map(_.group(1))
      if (!sfRec.contains(sfDir)) return Map.empty
      val qm = """"queries":\s*\{""".r.findFirstMatchIn(text).getOrElse(return Map.empty)
      val body = text.substring(qm.end)
      val obj = body.substring(0, body.indexOf('}'))
      """"([^"]+)":\s*([0-9.]+)""".r.findAllMatchIn(obj)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Diff baseline: the committed BENCH_FULL.json from the previous round,
    // read BEFORE this run overwrites it.
    val prior = priorQueryTimes("BENCH_FULL.json", sfDir)
    // Per-query DuckDB baseline (committed by tools/bench_duckdb.py at the
    // official SF) — lets the artifact carry spark/duckdb ratios per query,
    // so the "within 2x of the reference baseline" bar is checkable per
    // query, not just on suite totals.
    val duck = priorQueryTimes("BASELINE_DUCKDB.json", sfDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
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
    val timings = ordered.map { case (name, fn) =>
      val ds = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val d = (System.nanoTime() - t0) / 1e9
        // drop anything the query persisted so no run's timing borrows
        // (or pays eviction for) cached intermediates
        spark.catalog.clearCache()
        d
      }
      (name, ds.min, ds.max)
    }
    val results = timings.map { case (n, mn, _) => (n, mn) }
    val total = results.map(_._2).sum
    // Regression flag: any query whose steady-state min more than doubled
    // vs the previous committed round. Written to its own artifact so a
    // real plan regression is distinguishable from run-to-run VM noise
    // (which the min-of-N already absorbs).
    val regressions = timings.flatMap { case (name, mn, _) =>
      prior.get(name).collect {
        case p if p > 0.05 && mn > 2.0 * p => // sub-50ms priors are all noise
          s"""{"query":"$name","prev":${fmt(p)},"now":${fmt(mn)},"ratio":${fmt(mn / p)}}"""
      }
    }
    try {
      val w = new java.io.PrintWriter("BENCH_DELTA.json")
      try w.println(regressions.mkString(
        s"""{"prev_queries":${prior.size},"flagged":${regressions.size},"threshold":2.0,"regressions":[""",
        ",", "]}"))
      finally w.close()
    } catch { case _: Throwable => }
    // Full per-query detail goes to a file; the stdout contract line must
    // stay well under the driver's 2 KB tail-capture window (the round-2
    // 86-entry line overflowed it and the driver recorded parsed:null), so
    // it carries only the slowest 20 queries.
    // vs-DuckDB block: per-query spark/duckdb ratios over the shared query
    // set (qx47 has no oracle → no DuckDB side; absent = not compared)
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
        val over2xMaterial = duckCovered.count { case (k, v) =>
          duck(k) >= 0.05 && v >= 0.5 && v > 2.0 * duck(k) }
        s""""duckdb":{"total":${fmt(duckTotal)},"spark_total_on_shared":${fmt(sparkOnDuckSet)},""" +
          s""""ratio_total":${fmt(if (duckTotal > 0) sparkOnDuckSet / duckTotal else -1.0)},""" +
          s""""n_shared":${duckCovered.size},"n_over_2x":$over2x,""" +
          s""""n_over_2x_material":$over2xMaterial,"ratios":{$ratios}}"""
      }
    val fullJson = {
      val mins = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString(",")
      val spreads = timings.map { case (k, mn, mx) =>
        s"\"" + k + "\":" + fmt(if (mn > 0) mx / mn else 1.0) }.mkString(",")
      s"""{"total":${fmt(total)},"queries":{$mins},"spread_max_over_min":{$spreads},""" +
        s""""reps":$reps,"regressions_vs_prev":${regressions.size},"sf":"$sfDir",""" +
        s"""$ratioJson,"n_queries":${results.size}}"""
    }
    try {
      val w = new java.io.PrintWriter("BENCH_FULL.json")
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => }
    val top = results.sortBy(-_._2).take(20).sortBy(_._1)
    val topJson = top.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val spreadByName = timings.map { case (k, mn, mx) => k -> (if (mn > 0) mx / mn else 1.0) }.toMap
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
