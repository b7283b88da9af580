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
    spark.stop()
  }
}
