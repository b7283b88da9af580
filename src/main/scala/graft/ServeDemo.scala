package graft

import org.apache.spark.sql.SparkSession
import graft.serve.{ApiServer, FinancialApi, GraftConfig, McpTools}
import graft.sources.{CompanyFacts, FactStore}

/** End-to-end serving drive: YAML config → session conf → ingest a canned
  * company → partitioned store → REST facade over real HTTP → MCP tool
  * dispatch — the composition a user of the reference's FastAPI + MCP
  * surfaces would run. `runMain graft.ServeDemo`. */
object ServeDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // S13: config file governs cache sizing + engine conf
    val cfg = GraftConfig.fromString(
      """cache:
        |  ttl: 600
        |  max_size: 500
        |spark:
        |  spark.sql.adaptive.enabled: "true"
        |""".stripMargin)
    cfg.applyTo(spark)

    // store: one canned company through the real flatten + partitioned sink
    val out = java.nio.file.Files.createTempDirectory("graft-serve-demo").toString
    val json =
      """{"cik": 320193, "entityName": "Demo Corp", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [
        |    {"start":"2019-01-01","end":"2019-12-31","val":100,"fy":2019,"fp":"FY","form":"10-K"},
        |    {"start":"2020-01-01","end":"2020-12-31","val":120,"fy":2020,"fp":"FY","form":"10-K"},
        |    {"start":"2021-01-01","end":"2021-12-31","val":150,"fy":2021,"fp":"FY","form":"10-K"}]}},
        |"NetIncomeLoss": {"label": "Net Income (Loss)", "description": "",
        |  "units": {"USD": [
        |    {"start":"2021-01-01","end":"2021-12-31","val":30,"fy":2021,"fp":"FY","form":"10-K"}]}}
        |}}}""".stripMargin
    FactStore.write(CompanyFacts.flatten(Seq(("DEMO", json)).toDF("ticker", "json")),
      s"$out/facts")
    def facts() = FactStore.read(spark, s"$out/facts")

    // REST facade on an ephemeral port, T6 cache from config, T5 trigger logged
    val cache = cfg.buildCache()
    val api = new FinancialApi(spark, () => facts(), cache,
      onMiss = t => println(s"[serve-demo] background fetch triggered for $t"))
    val server = new ApiServer(api, port = 0).start()
    val port = server.boundPort
    val client = java.net.http.HttpClient.newHttpClient()
    def hit(method: String, path: String): (Int, String) = {
      val b = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port$path"))
      val req = (if (method == "POST")
        b.POST(java.net.http.HttpRequest.BodyPublishers.ofString("")) else b.GET()).build()
      val r = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    try {
      println(s"[serve-demo] listening on :$port")
      val (s1, b1) = hit("GET", "/status")
      println(s"[serve-demo] GET /status -> $s1 ${b1.take(80)}")
      val (s2, b2) = hit("GET", "/financials/DEMO/revenue?period=annual&years=5")
      println(s"[serve-demo] GET /financials/DEMO/revenue -> $s2 ${b2.take(120)}...")
      val (s3, _) = hit("GET", "/financials/DEMO/revenue?period=annual&years=5")
      println(s"[serve-demo] repeat -> $s3 (cache hits: ${cache.stats("hits")})")
      val (s4, b4) = hit("GET", "/financials/NOPE/revenue")
      println(s"[serve-demo] GET /financials/NOPE/revenue -> $s4 ${b4.take(80)} (202-on-miss)")

      // MCP dispatch over the same store
      val tools = new McpTools(spark, () => facts())
      println(s"[serve-demo] MCP tools: ${tools.toolNames.mkString(", ")}")
      val trend = tools.callJson("analyze_financial_trends",
        """{"ticker":"DEMO","metrics":["revenue"]}""")
      println(s"[serve-demo] analyze_financial_trends -> ${trend.take(160)}...")
    } finally server.stop()

    // retrieval layer (round 10): persisted BM25 + IVF-PQ stores served
    // over /search and the search_corpus MCP tool
    import org.apache.spark.sql.functions.col
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding"))
    graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$out/lex", 8)
    graft.operators.Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
      "centroid_id", "cen_emb",
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
      "code_id", "cb_emb", 64, 4, residual = false, s"$out/vec")
    corpus.write.parquet(s"$out/corpus")
    val sCfg = GraftConfig.fromString(
      s"""retrieval:
         |  lex_store: "$out/lex"
         |  vec_store: "$out/vec"
         |  corpus_path: "$out/corpus"
         |""".stripMargin)
    val searchApi = graft.serve.SearchApi.fromConfig(spark, sCfg)
    val sServer = new ApiServer(api, 0, sCfg, searchApi).start()
    try {
      val q = corpus.select("text", "embedding").limit(1).collect().head
      val qText = graft.sources.Serve.jsonEscape(
        q.getString(0).split(' ').take(4).mkString(" "))
      val body = s"""{"text":"$qText",""" +
        s""""vector":${q.getSeq[Float](1).mkString("[", ",", "]")},"k":5,"mode":"hybrid"}"""
      val req = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${sServer.boundPort}/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      val r = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      println(s"[serve-demo] POST /search (hybrid) -> ${r.statusCode()} ${r.body().take(160)}...")
      val sTools = new McpTools(spark, () => facts(), Some(sCfg), searchApi)
      println(s"[serve-demo] MCP tools with retrieval: ${sTools.toolNames.mkString(", ")}")
    } finally sServer.stop()
    spark.stop()
  }
}
