package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: where do concurrent uncached serving requests
  * spend their time? Fires N threads at SearchApi.search (no HTTP) and
  * samples all thread stacks, aggregating the top frames of RUNNABLE
  * request threads — driver-side contention shows up as a dominant
  * shared frame (a lock, a synchronized memo, a Catalyst phase). */
object ServeHotspot {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nThreads = sys.env.getOrElse("HOTSPOT_THREADS", "8").toInt
    val seconds = sys.env.getOrElse("HOTSPOT_SECONDS", "40").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.t(spark, sfDir, "documents")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val corpus = hybrid.filter(!isQuery)
    val work = java.nio.file.Files.createTempDirectory("serve-hot-").toString
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
    val api = new graft.serve.SearchApi(spark, conf) // no cache

    val qRows = hybrid.filter(isQuery).select("text", "embedding")
      .limit(8).collect()
    val payloads = qRows.map(r =>
      (r.getString(0).split("\\s+").take(6).mkString(" "), r.getSeq[Float](1)))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val reqThreads = (0 until nThreads).map { c =>
      val t = new Thread(() => {
        var i = c
        while (!stop.get()) {
          val (txt, vec) = payloads(i % payloads.length)
          val r = api.search(txt, vec, 10, "hybrid", Seq.empty)
          require(r.status == 200, r.body.take(120))
          done.incrementAndGet(); i += nThreads
        }
      }, s"hot-req-$c")
      t.setDaemon(true); t
    }
    // warm
    payloads.take(2).foreach { case (txt, vec) =>
      api.search(txt, vec, 10, "hybrid", Seq.empty) }

    val agg = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val blocked = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampler = new Thread(() => {
      while (!stop.get()) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("hot-req-") && st.nonEmpty) {
            // first in-repo or catalyst frame gives the phase
            val frame = st.find(f =>
              f.getClassName.startsWith("graft.") ||
                f.getClassName.contains("catalyst") ||
                f.getClassName.contains("spark.sql.execution") ||
                f.getClassName.contains("hadoop.fs"))
              .map(f => s"${f.getClassName.split('.').takeRight(2).mkString(".")}.${f.getMethodName}")
              .getOrElse(st.head.getClassName.split('.').takeRight(2).mkString(".") +
                "." + st.head.getMethodName)
            val key = s"${t.getState}: $frame"
            agg.merge(key, 1, (a, b) => a + b)
            if (t.getState == Thread.State.BLOCKED) {
              val top = st.take(4).map(f =>
                f.getClassName.split('.').takeRight(2).mkString(".") + "." +
                  f.getMethodName).mkString(" <- ")
              blocked.merge(top, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    val t0 = System.nanoTime()
    reqThreads.foreach(_.start()); sampler.start()
    Thread.sleep(seconds * 1000L)
    stop.set(true); Thread.sleep(300)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[hotspot] $nThreads threads, ${done.get()} requests in $wall%.1f s = ${done.get() / wall}%.2f req/s")
    import scala.jdk.CollectionConverters._
    println("[hotspot] top sampled frames (request threads):")
    agg.asScala.toSeq.sortBy(-_._2.toInt).take(25).foreach { case (k, n) =>
      println(f"[hotspot]   $n%6d  $k")
    }
    println("[hotspot] top BLOCKED stacks:")
    blocked.asScala.toSeq.sortBy(-_._2.toInt).take(10).foreach { case (k, n) =>
      println(f"[hotspot]   $n%6d  $k")
    }
    spark.stop()
  }
}
