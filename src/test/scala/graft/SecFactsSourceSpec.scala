package graft

import graft.sources.CompanyFacts
import org.apache.spark.sql.functions._

/** DataSource V2 connector vs the from_json flatten: same rows from the
  * same documents, plus the connector-only scale behaviors — file-level
  * cik pruning, parse-time fiscal_year filtering, column pruning. */
class SecFactsSourceSpec extends SparkSpec {

  private lazy val fixture = new CompanyFactsSpec().fixtureJson

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("secfacts")
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(d.resolve(name), text.getBytes("UTF-8"))
    write("CIK0000320193.json", fixture)
    write("CIK0000000099.json",
      """{"cik": 99, "entityName": "Tiny Corp", "facts": {"us-gaap": {
        |  "Assets": {"label": "Assets", "description": "d", "units": {"USD": [
        |    {"instant": "2021-12-31", "val": 5000, "fy": 2021, "fp": "FY", "form": "10-K"},
        |    {"instant": "2022-12-31", "val": 7000, "fy": 2022, "fp": "FY", "form": "10-K"}
        |  ]}}}}}""".stripMargin)
    write("notes.txt", "not a filing") // non-json ignored
    d.toString
  }

  private def connector = spark.read.format("secfacts").load(dir)

  test("connector rows ≡ CompanyFacts.flatten on the same documents") {
    import spark.implicits._
    val raw = Seq(("AAPL", fixture),
      ("TINY", new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "CIK0000000099.json")), "UTF-8")))
      .toDF("ticker", "json")
    val want = CompanyFacts.flatten(raw).drop("ticker")
    val cols = want.columns.sorted.map(col).toIndexedSeq
    val a = connector.select(cols: _*).collect().map(_.toString).sorted
    val b = want.select(cols: _*).collect().map(_.toString).sorted
    assert(a.nonEmpty && (a sameElements b),
      s"connector=${a.mkString("\n")}\nflatten=${b.mkString("\n")}")
  }

  test("cik equality prunes files before read; plan advertises it") {
    val q = connector.filter(col("cik") === "0000000099")
    assert(q.count() == 2)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("files=1/2"), plan)
    assert(plan.contains("EqualTo(cik,0000000099)"), plan)
  }

  test("fiscal_year range applies during parse; column pruning shows in the scan") {
    val q = connector.filter(col("fiscal_year") >= 2022)
      .select("cik", "concept", "value")
    val got = q.collect()
    assert(got.length == 6, got.mkString(";")) // 5 AAPL facts fy>=2022 + 1 TINY
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(fiscal_year,2022)"), plan)
    // 4, not 3: Spark keeps fiscal_year in the read schema for its residual
    // isnotnull filter — the range itself was pushed, the rest still pruned
    assert(plan.contains("columns=4/15"), plan)
  }

  test("a filename disagreeing with its document's cik fails loudly, not silently") {
    // CIK0000000777.json wrapping the cik-99 document: a cik-filtered scan
    // would prune this file by name and silently lose the 99 rows — so any
    // scan that reads it must surface the broken naming invariant instead
    val d3 = java.nio.file.Files.createTempDirectory("secfacts3")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "CIK0000000099.json"),
      d3.resolve("CIK0000000777.json"))
    val e = intercept[Exception] {
      spark.read.format("secfacts").load(d3.toString).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("naming invariant")), e.toString)
  }

  test("non-conforming filenames are read, never wrongly skipped by cik pruning") {
    // copy the tiny filing under a name with no cik — a cik filter must
    // still read it (pruning is an optimization, not a correctness gate)
    val d2 = java.nio.file.Files.createTempDirectory("secfacts2")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "CIK0000000099.json"),
      d2.resolve("mystery.json"))
    val q = spark.read.format("secfacts").load(d2.toString)
      .filter(col("cik") === "0000000099")
    assert(q.count() == 2)
  }
}
