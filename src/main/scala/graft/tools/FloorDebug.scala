package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the hybrid serving plan (round 12): per-stage
  * task-time breakdown + formatted plan, to find where the fused plan's
  * summed task time goes. Not part of the library surface. */
object FloorDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.t(spark, sfDir, "documents")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val corpus = hybrid.filter(!isQuery)
    val work = java.nio.file.Files.createTempDirectory("floor-debug-").toString
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
      maxQueryTerms = 6, maxK = 100,
      servingShufflePartitions =
        sys.env.getOrElse("FLOOR_DEBUG_PARTS", "8").toInt)
    val api = new graft.serve.SearchApi(spark, conf)

    val qRow = hybrid.filter(isQuery).select("text", "embedding")
      .limit(1).collect().head
    val qText = qRow.getString(0).split("\\s+").take(6).mkString(" ")
    val qVec = qRow.getSeq[Float](1)

    // stage-level accounting
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        stageInfo.merge(t.stageId, (t.taskType, 1L, t.taskInfo.duration),
          (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
      }
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val cur = stageInfo.get(si.stageId)
        if (cur != null)
          stageInfo.put(si.stageId, (si.name.split('\n').head.take(120), cur._2, cur._3))
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val cs = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobLog.add(s"job ${j.jobId} t=${System.currentTimeMillis()} stages=${j.stageIds.size} at $cs")
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobLog.add(s"job ${j.jobId} END t=${System.currentTimeMillis()}")
    })

    def call(mode: String): Unit = {
      val vec = if (mode == "vector" || mode == "hybrid") qVec else Seq.empty[Float]
      val r = api.search(qText, vec, 10, mode, Seq.empty)
      require(r.status == 200, s"$mode failed: ${r.body.take(200)}")
    }
    val mode = sys.env.getOrElse("FLOOR_DEBUG_MODE", "hybrid")
    call(mode); call(mode) // warm
    Thread.sleep(500)
    stageInfo.clear(); jobLog.clear()
    val w0 = System.nanoTime()
    call(mode)
    val wall = (System.nanoTime() - w0) / 1e6
    Thread.sleep(800)
    println(f"[debug] $mode wall=${wall}%.0f ms; per-stage (tasks, summed ms, name):")
    import scala.jdk.CollectionConverters._
    stageInfo.asScala.toSeq.sortBy(-_._2._3).foreach { case (sid, (name, n, ms)) =>
      println(f"[debug]   stage $sid%4d  tasks=$n%4d  task_ms=$ms%7d  $name")
    }
    println("[debug] job timeline:")
    jobLog.asScala.foreach(l => println(s"[debug]   $l"))

    // planning-phase anatomy of the vector search plan (fresh per call)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    for (i <- 1 to 3) {
      val qdf = spark.createDataFrame(
        java.util.Arrays.asList(Row(Long.MinValue, qVec)),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("embedding", ArrayType(FloatType)))))
      val t0 = System.nanoTime()
      val df = graft.operators.Quantize.searchSelfContainedRefinedStored(
        spark, s"$work/vec", qdf, "doc_id", "embedding", 10, 2, 100)
      val tBuild = System.nanoTime()
      df.queryExecution.executedPlan // force analysis→physical planning
      val tPlan = System.nanoTime()
      val n = df.collect().length
      val tExec = System.nanoTime()
      val phases = df.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${v.endTimeMs - v.startTimeMs}ms" }
        .mkString(" ")
      println(f"[debug] planning[$i] build=${(tBuild - t0) / 1e6}%.0f ms " +
        f"plan=${(tPlan - tBuild) / 1e6}%.0f ms exec=${(tExec - tPlan) / 1e6}%.0f ms " +
        s"rows=$n phases: $phases")
    }
    spark.stop()
  }
}
