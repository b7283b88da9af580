package graft

import graft.model.FactModel.Fact
import graft.queries.Financials
import org.apache.spark.sql.functions._

/** FIXTURES.md §3 fact-table fixture: 2 tickers × 3 years with the edge
  * cases the reference's semantics demand — duplicate (fy,fp) with distinct
  * |value| (A1), tag fallback company (F5), zero revenue/equity years
  * (C1-C3 guards), missing metric (J3). */
class FinancialsSpec extends SparkSpec {

  def d(s: String): Option[java.sql.Date] = Some(java.sql.Date.valueOf(s))

  def fact(ticker: String, concept: String, label: String, v: Double, fy: Int,
           fp: String = "FY", unit: String = "USD", end: String = "2022-12-31"): Fact =
    Fact(ticker, Some(s"$ticker Inc"), Some("0000000001"), Some("us-gaap"),
      Some(concept), Some(label), None, Some(v), Option(unit),
      None, d(end), None, Some("10-K"), Some(fy), Option(fp), None)

  lazy val facts = {
    import spark.implicits._
    Seq(
      // ALFA: has the preferred revenue tag, 3 years + a duplicate 2022 row
      fact("ALFA", "RevenueFromContractWithCustomerExcludingAssessedTax",
        "Revenue from Contract with Customer", 100.0, 2020),
      fact("ALFA", "RevenueFromContractWithCustomerExcludingAssessedTax",
        "Revenue from Contract with Customer", 121.0, 2021),
      fact("ALFA", "RevenueFromContractWithCustomerExcludingAssessedTax",
        "Revenue from Contract with Customer", 150.0, 2022),
      fact("ALFA", "RevenueFromContractWithCustomerExcludingAssessedTax",
        "Revenue from Contract with Customer", 144.0, 2022, end = "2022-06-30"), // dup, smaller |v|
      fact("ALFA", "NetIncomeLoss", "Net Income (Loss)", 30.0, 2022),
      fact("ALFA", "Assets", "Assets", 300.0, 2022),
      fact("ALFA", "Liabilities", "Liabilities", 180.0, 2022),
      fact("ALFA", "StockholdersEquity", "Stockholders Equity", 120.0, 2022),
      // quarterly rows (F2: must be excluded from annual)
      fact("ALFA", "RevenueFromContractWithCustomerExcludingAssessedTax",
        "Revenue from Contract with Customer", 40.0, 2022, fp = "Q1"),
      // BETA: lacks the preferred tag → fallback to Revenues (F5);
      // zero revenue 2021 (C1 guard), zero equity (C2/C3 guard)
      fact("BETA", "Revenues", "Revenues", 50.0, 2021),
      fact("BETA", "Revenues", "Revenues", 0.0, 2020),
      fact("BETA", "Revenues", "Revenues", 60.0, 2022),
      fact("BETA", "NetIncomeLoss", "Net Income (Loss)", 6.0, 2022),
      fact("BETA", "Assets", "Assets", 100.0, 2022),
      fact("BETA", "Liabilities", "Liabilities", 100.0, 2022),
      fact("BETA", "StockholdersEquity", "Stockholders Equity", 0.0, 2022)
    ).toDF().cache()
  }

  test("metricSeries: F6 alias match + F2 annual filter + A1 argmax dedup + cap") {
    val s = Financials.metricSeries(facts, "revenue", "annual", 5)
      .filter(col("ticker") === "ALFA").collect()
    // 3 annual years, dup 2022 resolved to |150| not |144|, Q1 excluded
    assert(s.length === 3)
    assert(s.head.getAs[Int]("fiscal_year") === 2022)
    assert(s.head.getAs[Double]("value") === 150.0)
  }

  test("resolveMetrics: F5 company-wide tag fallback (BETA uses Revenues)") {
    val m = Financials.resolveMetrics(facts, Seq("revenue"))
    val beta = m.filter(col("ticker") === "BETA").orderBy("fiscal_year").collect()
    assert(beta.map(_.getAs[Double]("value")).toSeq === Seq(0.0, 50.0, 60.0))
    val alfa2022 = m.filter(col("ticker") === "ALFA" && col("fiscal_year") === 2022).collect()
    assert(alfa2022.length === 1 && alfa2022(0).getAs[Double]("value") === 150.0)
  }

  test("statement: pivot years ascending with stable metric order") {
    val st = Financials.incomeStatement(facts)
    val alfa = st.filter(col("ticker") === "ALFA").collect()
    assert(alfa.map(_.getAs[String]("metric")).toSeq === Seq("revenue", "net_income"))
    val revRow = alfa(0)
    assert(revRow.getAs[Double]("2021") === 121.0 && revRow.getAs[Double]("2022") === 150.0)
  }

  test("ratios: formulas with zero-denominator guards") {
    val r = Financials.ratios(facts)
    val alfa = r.filter(col("ticker") === "ALFA" && col("fiscal_year") === 2022).collect()(0)
    assert(math.abs(alfa.getAs[Double]("net_margin") - 20.0) < 1e-9)
    assert(math.abs(alfa.getAs[Double]("roe") - 25.0) < 1e-9)
    assert(math.abs(alfa.getAs[Double]("debt_to_equity") - 1.5) < 1e-9)
    assert(alfa.getAs[String]("leverage_class") === "high") // 60% debt/assets
    val beta2020 = r.filter(col("ticker") === "BETA" && col("fiscal_year") === 2020).collect()(0)
    assert(beta2020.getAs[Any]("net_margin") == null) // zero revenue guard
    val beta2022 = r.filter(col("ticker") === "BETA" && col("fiscal_year") === 2022).collect()(0)
    assert(beta2022.getAs[Any]("roe") == null)        // zero equity guard
    assert(beta2022.getAs[Any]("debt_to_equity") == null)
  }

  test("compare: single-pass pivot, tickers as columns") {
    val c = Financials.compare(facts, "revenue", Seq("ALFA", "BETA")).collect()
    val y2022 = c.find(_.getAs[Int]("fiscal_year") == 2022).get
    assert(y2022.getAs[Double]("ALFA") === 150.0 && y2022.getAs[Double]("BETA") === 60.0)
  }

  test("trends: CAGR/volatility/direction per ticker") {
    val t = Financials.trends(facts, "revenue")
    val alfa = t.filter(col("ticker") === "ALFA").collect()(0)
    // 100 → 150 over 2 periods: cagr = sqrt(1.5)-1 ≈ 0.224745
    assert(math.abs(alfa.getAs[Double]("cagr") - 0.224745) < 1e-6)
    assert(alfa.getAs[String]("direction") === "increasing")
    assert(alfa.getAs[Long]("n_periods") === 3)
  }

  test("F1 vs F2 period-filter divergence is preserved") {
    import spark.implicits._
    val probe = Seq(
      Fact("X", None, None, None, None, None, None, Some(1.0), None,
        None, None, None, None, Some(2022), None, None), // null fp
      Fact("X", None, None, None, None, None, None, Some(2.0), None,
        None, None, None, None, Some(2022), Some("H1"), None) // odd period
    ).toDF()
    // F2 annual admits null fp; F1 does not
    assert(probe.filter(Financials.periodFilter("annual")).count() === 1)
    assert(probe.filter(Financials.periodFilterLegacy("annual")).count() === 0)
    // F1 quarterly admits H1; F2 does not
    assert(probe.filter(Financials.periodFilterLegacy("quarterly")).count() === 2)
    assert(probe.filter(Financials.periodFilter("quarterly")).count() === 0)
  }

  test("sector averages: one aggregate over the ratio table") {
    val avg = Financials.sectorAverages(facts, Seq("ALFA", "BETA"), 2022).collect()(0)
    // ALFA net margin 20, BETA 10 → avg 15
    assert(math.abs(avg.getAs[Double]("avg_net_margin") - 15.0) < 1e-9)
    assert(avg.getAs[Long]("n_companies") === 2)
  }

  test("report composition assembles all surfaces") {
    val r = Financials.report(facts, "ALFA")
    assert(r.contains("Income statement") && r.contains("Ratios") && r.contains("Revenue trend"))
    assert(r.contains("150.0")) // 2022 revenue appears
  }
}
