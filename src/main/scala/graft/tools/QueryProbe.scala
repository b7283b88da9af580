package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-query anatomy probe under the EXACT bench regime (local[4],
  * shuffle.partitions=4, warm codegen, min-of-3 with cache cleared
  * between reps): prints construct/execute walls plus the job / stage /
  * task-time counts of the best rep, so a tail query's cost can be
  * attributed to scheduling barriers vs real compute before touching
  * its plan.
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <queryName>...
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val (confArgs, rest) = args.partition(_.startsWith("--conf="))
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = rest.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = confArgs.map(_.stripPrefix("--conf=").split("=", 2))
      .foldLeft(b0)((b, kv) => b.config(kv(0), kv(1)))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val dumpStages = sys.env.get("PROBE_STAGES").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val tm = s.stageInfo.taskMetrics
        taskMs.addAndGet(tm.executorRunTime)
        if (dumpStages && tm.executorRunTime > 100)
          println(f"    stage ${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
            f"run=${tm.executorRunTime}%6dms cpu=${tm.executorCpuTime / 1000000}%6dms " +
            f"gc=${tm.jvmGCTime}%5dms deser=${tm.executorDeserializeTime}%5dms " +
            s"[${s.stageInfo.name.takeWhile(_ != '\n').take(60)}]")
        ()
      }
    })

    val all = graft.SparkEntry.queries
    val picked = if (names.isEmpty) all.toSeq.sortBy(_._1) else names.map(n => n -> all(n))

    // same two-tier warmup as Bench: codegen at sf0.001, then untimed at sfDir
    val warmDir = if (new java.io.File("/root/testdata/sf0.001").isDirectory)
      "/root/testdata/sf0.001" else sfDir
    picked.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    println(f"${"query"}%-32s ${"cons"}%8s ${"exec"}%8s ${"jobs"}%5s ${"stg"}%5s ${"taskS"}%7s")
    picked.foreach { case (name, fn) =>
      val reps = (1 to 3).map { _ =>
        // settle listener counters, then snapshot around one rep
        Thread.sleep(300)
        val (j0, s0, t0) = (jobs.get(), stages.get(), taskMs.get())
        val c0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val c1 = System.nanoTime()
        df.count()
        val c2 = System.nanoTime()
        Thread.sleep(300)
        spark.catalog.clearCache()
        ((c1 - c0) / 1e9, (c2 - c1) / 1e9,
          jobs.get() - j0, stages.get() - s0, (taskMs.get() - t0) / 1e3)
      }
      val best = reps.minBy(r => r._1 + r._2)
      println(f"$name%-32s ${best._1}%8.3f ${best._2}%8.3f ${best._3}%5d ${best._4}%5d ${best._5}%7.2f")
    }
    spark.stop()
  }
}
