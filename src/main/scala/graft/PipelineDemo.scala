package graft

import org.apache.spark.sql.SparkSession
import graft.sources.{CompanyFacts, FactStore}
import graft.queries.Financials

/** End-to-end SEC pipeline drive (SURVEY §3 paths) on a canned CompanyFacts
  * document: ingest-flatten → partitioned store → serve-path metric series →
  * statements → ratios → trends. `runMain graft.PipelineDemo [outDir]`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val json =
      """{"cik": 320193, "entityName": "Demo Corp", "facts": {"us-gaap": {
        |"Revenues": {"label": "Revenues", "description": "",
        |  "units": {"USD": [
        |    {"start":"2019-01-01","end":"2019-12-31","val":100,"fy":2019,"fp":"FY","form":"10-K"},
        |    {"start":"2020-01-01","end":"2020-12-31","val":120,"fy":2020,"fp":"FY","form":"10-K"},
        |    {"start":"2021-01-01","end":"2021-12-31","val":150,"fy":2021,"fp":"FY","form":"10-K"},
        |    {"start":"2021-01-01","end":"2021-03-31","val":35,"fy":2021,"fp":"Q1","form":"10-Q"}]}},
        |"NetIncomeLoss": {"label": "Net Income (Loss)", "description": "",
        |  "units": {"USD": [
        |    {"start":"2021-01-01","end":"2021-12-31","val":30,"fy":2021,"fp":"FY","form":"10-K"}]}},
        |"Assets": {"label": "Assets", "description": "",
        |  "units": {"USD": [
        |    {"instant":"2021-12-31","val":500,"fy":2021,"fp":"FY","form":"10-K"}]}},
        |"Liabilities": {"label": "Liabilities", "description": "",
        |  "units": {"USD": [
        |    {"instant":"2021-12-31","val":200,"fy":2021,"fp":"FY","form":"10-K"}]}},
        |"StockholdersEquity": {"label": "Stockholders Equity", "description": "",
        |  "units": {"USD": [
        |    {"instant":"2021-12-31","val":300,"fy":2021,"fp":"FY","form":"10-K"}]}}
        |}}}""".stripMargin

    // 1. ingest through the full hardened path: rate-limited bounded-
    //    concurrency fetch (fake HTTP here) → flatten → partitioned store,
    //    with per-ticker failure isolation and job lifecycle tracking
    val tracker = new graft.sources.EdgarIngest.JobTracker()
    val jobs = graft.sources.EdgarIngest.ingest(spark, Seq("DEMO", "MISSING"),
      fetch = t => if (t == "MISSING")
        throw graft.sources.EdgarIngest.Fatal("404 unknown ticker") else json,
      base = s"$out/facts", tracker = tracker)
    println(s"[demo] ingest jobs: ${jobs.map(j => s"${j.ticker}=${j.status}").mkString(", ")}")
    val (done, failed, rate) = tracker.stats
    println(s"[demo] pipeline stats: $done ok, $failed failed, $rate%% success")
    val facts = CompanyFacts.flatten(Seq(("DEMO", json)).toDF("ticker", "json"))
    println(s"[demo] flattened facts: ${facts.count()}")
    val stored = FactStore.read(spark, s"$out/facts", Some("DEMO"))
    println(s"[demo] stored+read rows: ${stored.count()}")
    FactStore.freshness(stored).show(truncate = false)

    // 3. serve path (3.1): metric series
    Financials.metricSeries(stored, "revenue", "annual", 5).show(truncate = false)

    // 4. analytics path (3.3): statement pivot + ratios + trends
    Financials.incomeStatement(stored).show(truncate = false)
    Financials.ratios(stored).show(truncate = false)
    Financials.trends(stored, "revenue").show(truncate = false)

    // 5. MCP-parity composition: full text report from the same plans
    println(Financials.report(stored, "DEMO"))

    spark.stop()
  }
}
