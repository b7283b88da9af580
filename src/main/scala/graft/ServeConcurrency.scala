package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Concurrent-serving latency probe (round 10): the reference claims
  * "100+ concurrent queries" for its serving layer (README_MCP.md:420);
  * this measures OURS instead of asserting it. Real HTTP POST /search
  * (hybrid mode — both stores, RRF fusion) against a live [[graft.serve
  * .ApiServer]], N client threads in closed loop, p50/p95/max per
  * request + aggregate throughput per concurrency level, appended to
  * STREAMLAT.md as a marker-delimited section (re-running replaces it;
  * StreamLatency owns the rest of the file).
  *
  * What the numbers mean: each request is a multi-job Spark plan
  * (bucket collect + pruned scans + fusion), so the single-request
  * latency floor is Spark's scheduling constant (~1 s local), NOT a
  * per-row cost — and concurrency is where a Spark serving tier earns
  * its keep: independent requests schedule their jobs concurrently
  * across the executor cores, so throughput rises with N until cores
  * saturate. The probe reports the measured saturation point.
  *
  * Usage: runMain graft.ServeConcurrency [sfDir] [outDir]
  */
object ServeConcurrency {

  private val Levels = Seq(1, 4, 8, 16, 32)
  private val RequestsPerLevel = 64
  private val DistinctQueries = 8
  private val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "."
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR lets short concurrent serving jobs share the cores instead
      // of queueing whole-job FIFO behind each other — the serving-tier
      // scheduler choice (jobs are submitted from N handler threads)
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // qx107's deployment shape: hybrid corpus → BM25 store + seeded
    // self-contained IVF-PQ store + the exact-vector corpus parquet
    val docs = Tables.t(spark, sfDir, "documents")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val corpus = hybrid.filter(!isQuery)
    val work = java.nio.file.Files.createTempDirectory("serve-conc-").toString
    graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$work/lex", 64)
    graft.operators.Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
      "centroid_id", "cen_emb",
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
      "code_id", "cb_emb", 64, 4, residual = false, s"$work/vec")
    corpus.write.parquet(s"$work/corpus")
    val cfg = graft.serve.GraftConfig.fromString(
      s"""retrieval:
         |  lex_store: "$work/lex"
         |  vec_store: "$work/vec"
         |  corpus_path: "$work/corpus"
         |  depth: 20
         |  n_probe: 2
         |  rerank_depth: 100
         |  max_query_terms: 6
         |  cache_size: 0
         |""".stripMargin, env = Map.empty)
    // cache_size 0: THIS probe measures the ENGINE's concurrent serving —
    // with the default result cache on, every repeat of the 8 payloads
    // would be a sub-ms map lookup. The cached path gets its own
    // section below (the reference's "<500 ms cached" claim).
    val search = graft.serve.SearchApi.fromConfig(spark, cfg).get
    import spark.implicits._
    val cache = new graft.serve.ResultCache(10, 60)
    val api = new graft.serve.FinancialApi(spark,
      () => Seq.empty[(String, String)].toDF("ticker", "x"), cache)
    val server = new graft.serve.ApiServer(api, 0, cfg, Some(search)).start()
    val port = server.boundPort

    // distinct query payloads (rotated round-robin so no two in-flight
    // requests are byte-identical)
    val qRows = hybrid.filter(isQuery)
      .select("text", "embedding").limit(DistinctQueries).collect()
    val payloads = qRows.map { r =>
      val txt = graft.sources.Serve.jsonEscape(
        r.getString(0).split("\\s+").take(6).mkString(" "))
      val vec = r.getSeq[Float](1).mkString("[", ",", "]")
      s"""{"text":"$txt","vector":$vec,"k":$K,"mode":"hybrid"}"""
    }
    val client = java.net.http.HttpClient.newHttpClient()
    // admission control (round 14): past saturation the server sheds with
    // 429 + Retry-After instead of queueing unboundedly — a probe client
    // honors the header like a production client would (bounded retries),
    // and the shed count is REPORTED, not crashed on
    def fire(i: Int): (Long, Int) = {
      val t0 = System.nanoTime()
      var shed = 0
      var r = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          payloads(i % payloads.length))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      while (r.statusCode == 429 && shed < 10) {
        shed += 1
        Thread.sleep(Option(r.headers.firstValue("Retry-After").orElse("1"))
          .flatMap(_.toLongOption).getOrElse(1L) * 1000L)
        r = client.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/search"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            payloads(i % payloads.length))).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      require(r.statusCode == 200, s"search failed: ${r.body.take(200)}")
      ((System.nanoTime() - t0) / 1000000L, shed)
    }

    // warmup: codegen + store footers, excluded from every measurement
    (0 until 3).foreach(fire)

    def pct(sorted: Seq[Long], p: Double): Long =
      sorted(math.min(sorted.size - 1, math.ceil(p * sorted.size).toInt - 1).max(0))

    val rows = Levels.map { n =>
      val reqs = RequestsPerLevel
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val sheds = new java.util.concurrent.atomic.AtomicInteger(0)
      val lat = java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.lang.Long]())
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          var i = counter.getAndIncrement()
          while (i < reqs) {
            val (ms, sh) = fire(i)
            lat.add(ms); sheds.addAndGet(sh)
            i = counter.getAndIncrement()
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val sorted = lat.asScala.map(_.toLong).toSeq.sorted
      val row = (n, pct(sorted, 0.50), pct(sorted, 0.95), sorted.last,
        reqs / wall, sheds.get())
      println(f"[serve-conc] n=$n%3d  p50=${row._2}%5d ms  p95=${row._3}%5d ms  " +
        f"max=${row._4}%5d ms  throughput=${row._5}%5.2f req/s " +
        f"($reqs reqs, ${row._6} sheds)")
      row
    }
    server.stop()

    // ---- cached-hit pass: the deployment-default SearchApi (result
    // cache ON, mutation-exact version-token keys) serving REPEATED
    // queries — the reference's "<500 ms (cached)" headline measured on
    // ours. First hit per payload pays the engine; every repeat pays a
    // key build (a few listStatus calls for the version tokens) + a map
    // lookup + the HTTP hop.
    val cachedCfg = graft.serve.GraftConfig.fromString(
      s"""retrieval:
         |  lex_store: "$work/lex"
         |  vec_store: "$work/vec"
         |  corpus_path: "$work/corpus"
         |  depth: 20
         |  n_probe: 2
         |  rerank_depth: 100
         |  max_query_terms: 6
         |""".stripMargin, env = Map.empty)
    val cachedSearch = graft.serve.SearchApi.fromConfig(spark, cachedCfg).get
    val cachedServer = new graft.serve.ApiServer(api, 0, cachedCfg,
      Some(cachedSearch)).start()
    val cachedPort = cachedServer.boundPort
    def fireCached(i: Int): Long = {
      val t0 = System.nanoTime()
      val r = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$cachedPort/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          payloads(i % payloads.length))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      require(r.statusCode == 200, s"cached search failed: ${r.body.take(200)}")
      (System.nanoTime() - t0) / 1000000L
    }
    payloads.indices.foreach(fireCached) // populate: one engine pass each
    val cachedRows = Seq(1, 32).map { n =>
      val reqs = RequestsPerLevel
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val lat = java.util.Collections.synchronizedList(
        new java.util.ArrayList[java.lang.Long]())
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        new Thread(() => {
          var i = counter.getAndIncrement()
          while (i < reqs) { lat.add(fireCached(i)); i = counter.getAndIncrement() }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val sorted = lat.asScala.map(_.toLong).toSeq.sorted
      val row = (n, pct(sorted, 0.50), pct(sorted, 0.95), sorted.last, reqs / wall)
      println(f"[serve-conc] CACHED n=$n%3d  p50=${row._2}%5d ms  " +
        f"p95=${row._3}%5d ms  max=${row._4}%5d ms  throughput=${row._5}%7.2f req/s")
      row
    }
    cachedServer.stop()

    // marker-delimited section appended to (or replaced in) STREAMLAT.md
    val marker = "## Concurrent serving latency"
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

`runMain graft.ServeConcurrency $sfDir` — real HTTP POST `/search`
(hybrid mode: BM25 store + IVF-PQ store + RRF fusion, k=$K) against a
live ApiServer on Spark local[$cpus] with the FAIR scheduler; N closed-loop
client threads, $RequestsPerLevel requests per level over $DistinctQueries
distinct query payloads, warmup excluded. p95/max over $RequestsPerLevel
samples — read max as the tail indicator.

| concurrent clients | p50 | p95 | max | throughput | 429 sheds |
|---|---|---|---|---|---|
""")
    for ((n, p50, p95, mx, thr, shed) <- rows)
      md.append(f"| $n | $p50 ms | $p95 ms | $mx ms | $thr%.2f req/s | $shed |\n")
    md.append("""
Cached-hit path — the deployment default (`retrieval.cache_size` > 0):
REPEATED queries served from the mutation-exact result cache (version
tokens in the key: a store mutation changes the key, so staleness is
impossible on mtime-bearing filesystems; the rows above are the
cache-OFF engine numbers).

| concurrent clients | p50 | p95 | max | throughput |
|---|---|---|---|---|
""")
    for ((n, p50, p95, mx, thr) <- cachedRows)
      md.append(f"| $n (cached) | $p50 ms | $p95 ms | $mx ms | $thr%.2f req/s |\n")
    val thr1 = rows.head._5
    val best = rows.maxBy(_._5)
    md.append(f"""
Reading it: a single request is a multi-job Spark plan, so its latency
floor is the engine's scheduling constant, not a per-row cost — the
serving question is how far CONCURRENCY multiplies throughput before
the cores saturate. Here throughput rises from ${thr1}%.2f req/s at
n=1 to ${best._5}%.2f req/s at n=${best._1} (${best._5 / thr1}%.1fx), with p50
degrading as in-flight requests share the executor cores; past the
saturation point extra clients buy queueing, not throughput. The
reference's "100+ concurrent queries" is a connection-count claim (its
per-request work is a pandas lookup); ours is measured end-to-end
through both persisted stores' pruned scans and the fusion — at a
${thr1 * 60}%.0f-queries-per-minute single-client floor, a deployment
needing more QPS adds executors (each request's jobs parallelize over
the cluster) or fronts the store with the T6 result cache for repeated
queries.
""")
    md.append(keptAfter)
    java.nio.file.Files.writeString(path, md.toString)
    println(s"[serve-conc] appended section to $outDir/STREAMLAT.md")
    spark.stop()
  }
}
