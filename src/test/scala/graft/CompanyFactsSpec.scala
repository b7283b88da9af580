package graft

import graft.sources.CompanyFacts
import org.apache.spark.sql.functions._

/** S6 flatten over the FIXTURES.md §1 CompanyFacts document: duration +
  * instant facts, unknown unit → null, unknown form → null, null-value
  * drop, CIK zero-padding, multi-taxonomy walk. */
class CompanyFactsSpec extends SparkSpec {

  val fixtureJson: String =
    """{
      |  "cik": 320193,
      |  "entityName": "Apple Inc.",
      |  "facts": {
      |    "us-gaap": {
      |      "RevenueFromContractWithCustomerExcludingAssessedTax": {
      |        "label": "Revenue from Contract with Customer, Excluding Assessed Tax",
      |        "description": "Amount of revenue ...",
      |        "units": {"USD": [
      |          {"start": "2021-09-26", "end": "2022-09-24", "val": 394328000000,
      |           "fy": 2022, "fp": "FY", "form": "10-K", "frame": "CY2022"},
      |          {"start": "2022-09-25", "end": "2022-12-31", "val": 117154000000,
      |           "fy": 2023, "fp": "Q1", "form": "10-Q"},
      |          {"start": "2020-09-27", "end": "2021-09-25", "val": 365817000000,
      |           "fy": 2021, "fp": "FY", "form": "10-K/A"},
      |          {"start": "2019-09-29", "end": "2020-09-26",
      |           "fy": 2020, "fp": "FY", "form": "10-K"}
      |        ]}
      |      },
      |      "Assets": {
      |        "label": "Assets", "description": "...",
      |        "units": {"USD": [
      |          {"instant": "2022-09-24", "val": 352755000000, "fy": 2022, "fp": "FY", "form": "10-K"}
      |        ]}
      |      },
      |      "EarningsPerShareDiluted": {
      |        "label": "Earnings Per Share, Diluted", "description": "...",
      |        "units": {"USD/shares": [
      |          {"start": "2021-09-26", "end": "2022-09-24", "val": 6.11, "fy": 2022, "fp": "FY", "form": "10-K"}
      |        ]}
      |      }
      |    },
      |    "dei": {
      |      "EntityCommonStockSharesOutstanding": {
      |        "label": "Entity Common Stock, Shares Outstanding", "description": "...",
      |        "units": {"shares": [
      |          {"instant": "2022-10-14", "val": 15908118000, "fy": 2022, "fp": "FY", "form": "10-K"}
      |        ]}
      |      }
      |    }
      |  }
      |}""".stripMargin

  lazy val flat = {
    import spark.implicits._
    CompanyFacts.flatten(Seq(("AAPL", fixtureJson)).toDF("ticker", "json")).cache()
  }

  test("flatten walks all taxonomies/concepts/units and drops null-value entries") {
    // 4 revenue entries (1 null val dropped → 3) + 1 assets + 1 eps + 1 dei = 6
    assert(flat.count() === 6)
    assert(flat.filter(col("taxonomy") === "dei").count() === 1)
  }

  test("unknown unit and unknown form map to null") {
    val eps = flat.filter(col("concept") === "EarningsPerShareDiluted").collect()(0)
    assert(eps.getAs[String]("unit") == null) // USD/shares not in enum
    val amended = flat.filter(col("fiscal_year") === 2021).collect()(0)
    assert(amended.getAs[String]("form") == null) // 10-K/A not in enum
  }

  test("duration vs instant dates land in the right columns") {
    val rev = flat.filter(col("concept").startsWith("RevenueFrom") && col("fiscal_year") === 2022).collect()(0)
    assert(rev.getAs[java.sql.Date]("end_date").toString == "2022-09-24")
    assert(rev.getAs[java.sql.Date]("instant_date") == null)
    val assets = flat.filter(col("concept") === "Assets").collect()(0)
    assert(assets.getAs[java.sql.Date]("instant_date").toString == "2022-09-24")
  }

  test("CIK zero-padded to 10 digits") {
    assert(flat.select("cik").distinct().collect()(0).getString(0) === "0000320193")
  }

  test("ticker map parses both wire formats with normalization invariants") {
    val indexed = CompanyFacts.parseTickerMap(spark,
      """{"0": {"cik_str": 320193, "ticker": "aapl", "title": "Apple Inc."},
        | "1": {"cik_str": 789019, "ticker": "MSFT", "title": "MICROSOFT CORP"}}""".stripMargin)
    val rows = indexed.orderBy("ticker").collect()
    assert(rows.map(_.getAs[String]("ticker")).toSeq === Seq("AAPL", "MSFT"))
    assert(rows(0).getAs[String]("cik") === "0000320193")

    val columnar = CompanyFacts.parseTickerMap(spark,
      """{"fields": ["cik", "name", "ticker", "exchange"],
        | "data": [[320193, "Apple Inc.", "AAPL", "Nasdaq"]]}""".stripMargin)
    assert(columnar.collect()(0).getAs[String]("cik") === "0000320193")
  }

  test("ticker format validation accepts BRK.B, rejects garbage") {
    import spark.implicits._
    val df = Seq("brk.b", "AAPL", "toolongticker", "bad ticker").toDF("t")
      .select(CompanyFacts.normalizeTicker(col("t")).as("n"))
    val out = df.collect().map(r => Option(r.getString(0)))
    assert(out(0).contains("BRK.B") && out(1).contains("AAPL"))
    assert(out(2).isEmpty && out(3).isEmpty)
  }
}
