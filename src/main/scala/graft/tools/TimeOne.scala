package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: runMain graft.tools.TimeOne <name> <sfDir> [reps] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: TimeOne <queryName> [sfDir] [reps]")
      sys.exit(2)
    }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory) "/root/testdata/sf0.001"
      else sfDir
    fn(spark, warmDir).count() // codegen warm
    // job/task accounting per rep (round 14): the scheduling-barrier count
    // is the serving-floor lever, so print it next to the wall
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val jobSites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val names = j.stageInfos.map(_.name.split('\n').head.take(70))
        jobSites.add(s"stages=${j.stageIds.size} [${names.mkString(" | ")}]")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet(); taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val dumpJobs = sys.env.get("TIMEONE_JOBS").contains("1")
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      jobs.set(0); tasks.set(0); taskMs.set(0); jobSites.clear()
      val t0 = System.nanoTime()
      val constructed = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val n = constructed.count()
      val t2 = System.nanoTime()
      Thread.sleep(300) // listener drain
      println(f"[timeone] $name rep$i: ${(t2 - t0) / 1e9}%.2f s " +
        f"(construct ${(t1 - t0) / 1e9}%.2f + exec ${(t2 - t1) / 1e9}%.2f; " +
        f"$n rows, jobs=${jobs.get()}, tasks=${tasks.get()}, task_ms=${taskMs.get()})")
      if (dumpJobs && i == reps) {
        import scala.jdk.CollectionConverters._
        jobSites.asScala.foreach(s => println(s"[timeone]   job: $s"))
      }
    }
    spark.stop()
  }
}
