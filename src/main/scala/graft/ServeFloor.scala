package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-floor anatomy (round 11): the concurrency probe says the
  * UNCACHED engine saturates near ~0.45 req/s regardless of client
  * count — this main measures WHERE a single request's time goes, so
  * the committed floor analysis is numbers, not guesses. Per serving
  * mode it reports, over warm repeated calls: wall p50, Spark JOBS per
  * call, TASKS per call, and summed task time per call — the gap
  * between wall and task time is pure driver/scheduling constant, and
  * the jobs column is the count of sequential scheduling barriers a
  * request pays.
  *
  * Usage: runMain graft.ServeFloor [sfDir] [outDir] [scale]
  * With the literal arg `scale`, the floor anatomy is measured at
  * 1×/4×/16× inflated corpus instead and the table lands in SCALE.md —
  * the round-13 proof that the serving JOB COUNT is scale-flat and only
  * the pruned-scan task time grows.
  */
object ServeFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "."
    val scaleMode = args.contains("scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.t(spark, sfDir, "documents")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val corpus1x = hybrid.filter(!isQuery)

    /** Build both stores over `corpus` and mount the uncached api. */
    def mount(corpus: org.apache.spark.sql.DataFrame): graft.serve.SearchApi = {
      val work = java.nio.file.Files.createTempDirectory("serve-floor-").toString
      graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
        "text", "doc_id", s"$work/lex", 64)
      graft.operators.Quantize.buildSelfContained(spark,
        corpus.select("doc_id", "embedding"), "doc_id", "embedding",
        emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
        "centroid_id", "cen_emb",
        emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
        "code_id", "cb_emb", 64, 4, residual = false, s"$work/vec",
        storeVectors = true)
      val conf = graft.serve.SearchApi.RetrievalConf(s"$work/lex", s"$work/vec",
        corpusPath = None, idCol = "doc_id", textCol = "text",
        vecCol = "embedding", depth = 20, nProbe = 2, rerankDepth = 100,
        maxQueryTerms = 6, maxK = 100)
      new graft.serve.SearchApi(spark, conf) // no cache: the floor
    }
    val api = mount(corpus1x)

    val qRow = hybrid.filter(isQuery).select("text", "embedding")
      .limit(1).collect().head
    val qText = qRow.getString(0).split("\\s+").take(6).mkString(" ")
    val qVec = qRow.getSeq[Float](1)

    // job/task accounting listener
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        taskMs.addAndGet(t.taskInfo.duration)
      }
    })

    def call(a: graft.serve.SearchApi, mode: String): Unit = {
      val vec = if (mode == "vector" || mode == "hybrid") qVec else Seq.empty[Float]
      val r = a.search(qText, vec, 10, mode, Seq.empty)
      require(r.status == 200, s"$mode failed: ${r.body.take(150)}")
    }
    val reps = 5
    def measure(a: graft.serve.SearchApi, tag: String)
        : Seq[(String, Double, Double, Double, Double)] =
      Seq("lexical", "vector", "hybrid").map { mode =>
        call(a, mode); call(a, mode) // warm: codegen + footers
        Thread.sleep(200)
        val (j0, t0, m0) = (jobs.get, tasks.get, taskMs.get)
        val walls = (0 until reps).map { _ =>
          val w0 = System.nanoTime(); call(a, mode); (System.nanoTime() - w0) / 1e6
        }.sorted
        Thread.sleep(300) // let task-end events drain
        val (j, t, m) = ((jobs.get - j0) / reps.toDouble,
          (tasks.get - t0) / reps.toDouble, (taskMs.get - m0) / reps.toDouble)
        val p50 = walls(reps / 2)
        println(f"[floor] $tag $mode%-8s p50=${p50}%7.0f ms  jobs/call=$j%5.1f  " +
          f"tasks/call=$t%6.1f  task_time/call=$m%7.0f ms")
        (mode, p50, j, t, m)
      }

    if (scaleMode) {
      // ---- round 13: the floor anatomy at 1×/4×/16× corpus -------------
      // (the 13-job/956 ms anatomy was measured at sf0.1 only; this
      // proves which columns are scale-flat)
      val scaleRows = Seq(1, 4, 16).map { mult =>
        val corpus =
          if (mult == 1) corpus1x
          else (0 until mult).map(i => corpus1x.select(
              (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
              col("text"), col("embedding")))
            .reduce(_ unionByName _)
        mult -> measure(mount(corpus), s"${mult}x")
      }
      val marker = "## Serving floor at scale"
      val path = java.nio.file.Paths.get(s"$outDir/SCALE.md")
      val existing =
        if (java.nio.file.Files.exists(path))
          new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
        else ""
      val (kept, keptAfter) = existing.indexOf(marker) match {
        case -1 => (existing, "")
        case i =>
          val rest = existing.substring(i + marker.length)
          val next = rest.indexOf("\n## ")
          (existing.substring(0, i), if (next == -1) "" else rest.substring(next))
      }
      val md = new StringBuilder(kept)
      md.append(s"""$marker (round 13)

`runMain graft.ServeFloor $sfDir . scale` — the ServeFloor anatomy
(uncached request: median wall of $reps, jobs/tasks/summed task time per
call) with the corpus inflated 1×/4×/16× and a FIXED query, fresh stores
per scale. The serving design's scale claim is that the JOB COUNT (the
scheduling-barrier floor) is a constant of the plan shape, and only the
pruned-scan task time grows with the probed buckets'/cells' bytes.

| corpus | mode | p50 wall | jobs/call | tasks/call | summed task time |
|---|---|---|---|---|---|
""")
      for ((mult, rws) <- scaleRows; (mode, p50, j, t, m) <- rws)
        md.append(f"| ${mult}× | $mode | ${p50}%.0f ms | $j%.1f | $t%.1f | $m%.0f ms |\n")
      val jobsByMode = Seq("lexical", "vector", "hybrid").map { mode =>
        mode -> scaleRows.map { case (_, rws) =>
          rws.find(_._1 == mode).get._3 }
      }
      md.append("\nJob counts across 16× growth: " + jobsByMode.map {
        case (mode, js) => f"$mode ${js.map(j => f"$j%.0f").mkString("→")}"
      }.mkString(", ") + ".\n")
      md.append(keptAfter)
      java.nio.file.Files.writeString(path, md.toString)
      println(s"[floor] appended scale section to $outDir/SCALE.md")
      spark.stop()
      return
    }

    val rows = measure(api, "1x")

    val marker = "## Serving floor anatomy"
    val path = java.nio.file.Paths.get(s"$outDir/STREAMLAT.md")
    val existing =
      if (java.nio.file.Files.exists(path))
        new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      else ""
    // replace ONLY this main's section: keep everything before the
    // marker AND every sibling section after it (this file is shared by
    // StreamLatency, ServeConcurrency and ServeFloor — a re-run of one
    // must not delete the others'). keptAfter keeps its leading newline
    // so the blank line before the next heading survives the splice.
    val (kept, keptAfter) = existing.indexOf(marker) match {
      case -1 => (existing, "")
      case i =>
        val rest = existing.substring(i + marker.length)
        val next = rest.indexOf("\n## ")
        (existing.substring(0, i), if (next == -1) "" else rest.substring(next))
    }
    val md = new StringBuilder(kept)
    md.append(s"""$marker (round 12)

`runMain graft.ServeFloor $sfDir` — one warm uncached request per mode,
median of $reps, with a listener counting Spark jobs/tasks and summing
task time. The WALL minus the task-time column is pure driver-side
constant: job/stage scheduling barriers, per-request plan construction
and optimization, and collect round-trips.

| mode | p50 wall | jobs/call | tasks/call | summed task time |
|---|---|---|---|---|
""")
    for ((mode, p50, j, t, m) <- rows)
      md.append(f"| $mode | ${p50}%.0f ms | $j%.1f | $t%.1f | $m%.0f ms |\n")
    val (_, _, hj, _, _) = rows.last
    md.append(f"""
Round 11 measured this anatomy at 45 jobs per hybrid request (15
lexical / 30 vector) and ~62 ms of scheduling barrier per job — the
floor was the JOB COUNT, not compute. Round 12 cut the chain
structurally, to ~${hj}%.0f jobs per hybrid call here: (1) driver-side
twins for every planning-scale subplan whose inputs are LocalRelations
— query terms/buckets via the same JVM functions the codegen'd
expressions call, probed cells via the same IEEE dot fold — so those
collects stopped being jobs (DriverPlan, parity spec-gated); (2)
fingerprint-keyed memos serving quantizers, tombstones, and resolved
parquet relations as LocalRelations, so their broadcasts and schema
reads are jobless and re-resolve only after a landed mutation; (3) AQE
off on the serving session — every serving stage is k-bounded, so
per-exchange re-planning jobs were pure barrier; (4) the hybrid legs
run as two CONCURRENT actions with the RRF fusion computed exactly on
the driver (rrfFuse's integer arithmetic, spec-gated equality), so the
critical path is max(leg walls), not their sum. What remains per
uncached request: ~150-250 ms of plan construction+optimization (fresh
literals per query — not cacheable for real traffic) and a handful of
genuine pruned-scan jobs. The levers that remain, in order: the result
cache for repeat traffic (the cached table above is the measured
number — three orders of magnitude over the engine path), then plan
simplification. A sub-100 ms uncached single query is a different
architecture (point-lookup serving, not Spark jobs) — deliberately out
of scope: the engine's job is corpus-scale batch retrieval.
""")
    md.append(keptAfter)
    java.nio.file.Files.writeString(path, md.toString)
    println(s"[floor] appended section to $outDir/STREAMLAT.md")
    spark.stop()
  }
}
