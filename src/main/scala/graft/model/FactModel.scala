package graft.model

import org.apache.spark.sql.types._

/** Canonical data model of the engine — the reference's FinancialFact
  * (ref: src/core/models.py:33-52) plus serving identity columns
  * (ref: src/api/data_service.py:204-216) and the `concept` (XBRL tag)
  * column the tag-fallback lookup needs (ref: main.py:183-188 works on
  * concept keys; the reference keeps them as dict keys, we keep a column).
  */
object FactModel {

  /** Fixed schema for the flat fact table — supplied to every reader so
    * nothing is ever inferred (SURVEY §1.4). */
  val factSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("company_name", StringType, nullable = true),
    StructField("cik", StringType, nullable = true),          // zero-padded to 10
    StructField("taxonomy", StringType, nullable = true),     // us-gaap | dei | ...
    StructField("concept", StringType, nullable = true),      // XBRL tag
    StructField("label", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("unit", StringType, nullable = true),         // USD|shares|pure|null
    StructField("start_date", DateType, nullable = true),
    StructField("end_date", DateType, nullable = true),
    StructField("instant_date", DateType, nullable = true),
    StructField("form", StringType, nullable = true),         // 10-K|10-Q|8-K|null
    StructField("fiscal_year", IntegerType, nullable = true),
    StructField("fiscal_period", StringType, nullable = true),// FY|Q1..Q4|null
    StructField("frame", StringType, nullable = true)))

  /** Typed view of a fact row. */
  final case class Fact(
      ticker: String, company_name: Option[String], cik: Option[String],
      taxonomy: Option[String], concept: Option[String], label: Option[String],
      description: Option[String], value: Option[Double], unit: Option[String],
      start_date: Option[java.sql.Date], end_date: Option[java.sql.Date],
      instant_date: Option[java.sql.Date], form: Option[String],
      fiscal_year: Option[Int], fiscal_period: Option[String], frame: Option[String])

  /** Company dimension (ref: models.py:55-74) — broadcast-sized (~10k rows). */
  final case class CompanyInfo(
      cik: String, ticker: String, name: String,
      industry: Option[String] = None, sector: Option[String] = None,
      exchange: Option[String] = None)

  /** Nested CompanyFacts JSON shape (ref: sec_client.py:211-249):
    * {cik, entityName, facts: {taxonomy: {concept: {label, description,
    * units: {unit: [ {val,start,end,instant,fy,fp,form,frame} ]}}}}}. */
  val companyFactsSchema: StructType = {
    val entry = StructType(Seq(
      StructField("val", DoubleType), StructField("start", StringType),
      StructField("end", StringType), StructField("instant", StringType),
      StructField("fy", IntegerType), StructField("fp", StringType),
      StructField("form", StringType), StructField("frame", StringType)))
    val concept = StructType(Seq(
      StructField("label", StringType), StructField("description", StringType),
      StructField("units", MapType(StringType, ArrayType(entry)))))
    StructType(Seq(
      StructField("cik", LongType), StructField("entityName", StringType),
      StructField("facts", MapType(StringType, MapType(StringType, concept)))))
  }

  /** Units the reference's enum admits; anything else → null unit
    * (ref: sec_client.py:223-228). */
  val KnownUnits: Seq[String] = Seq("USD", "shares", "pure")
  /** Unit preference for F7 resolution — USD > shares > pure > other
    * (ref: financial_analyzer.py:146-153; the canonicalized variant). */
  val UnitPriority: Map[String, Int] = Map("USD" -> 0, "shares" -> 1, "pure" -> 2)

  /** Forms the reference's enum admits; unknown forms → null
    * (ref: sec_client.py:264-275). */
  val KnownForms: Seq[String] = Seq("10-K", "10-Q", "8-K")
}

/** The metric catalogs — the engine's two lookup semantics (SURVEY §2 F5/F6):
  * tag-exact fallback lists for the analytics surface, and case-insensitive
  * label substrings for the serving surface. Representative subset of the
  * reference's tables (ref: main.py:32-130, 56 metrics; data_service.py:26-38).
  */
object MetricCatalog {

  /** F5: friendly metric → ordered XBRL tag fallback list; first tag present
    * in a company's data wins for the whole company (ref: main.py:183-188). */
  val tagFallback: Map[String, Seq[String]] = Map(
    "revenue" -> Seq(
      "RevenueFromContractWithCustomerExcludingAssessedTax", "Revenues",
      "SalesRevenueNet"),
    "cost_of_revenue" -> Seq("CostOfGoodsAndServicesSold", "CostOfRevenue"),
    "gross_profit" -> Seq("GrossProfit"),
    "operating_income" -> Seq("OperatingIncomeLoss"),
    "net_income" -> Seq("NetIncomeLoss",
      "NetIncomeLossAvailableToCommonStockholdersBasic"),
    "eps_diluted" -> Seq("EarningsPerShareDiluted", "EarningsPerShareBasic"),
    "assets" -> Seq("Assets"),
    "liabilities" -> Seq("Liabilities"),
    "equity" -> Seq("StockholdersEquity",
      "StockholdersEquityIncludingPortionAttributableToNoncontrollingInterest"),
    "cash" -> Seq("CashAndCashEquivalentsAtCarryingValue"),
    "operating_cash_flow" -> Seq("NetCashProvidedByUsedInOperatingActivities"),
    "shares_outstanding" -> Seq("EntityCommonStockSharesOutstanding",
      "CommonStockSharesOutstanding"))

  /** Stable presentation order for statement pivots (P1). */
  val statementOrder: Seq[String] = Seq(
    "revenue", "cost_of_revenue", "gross_profit", "operating_income",
    "net_income", "eps_diluted", "assets", "liabilities", "equity",
    "cash", "operating_cash_flow", "shares_outstanding")

  /** F6: serving-path metric → label substrings, matched case-insensitively
    * against the fact label (ref: data_service.py:26-38, 112-124). */
  val labelAliases: Map[String, Seq[String]] = Map(
    "revenue" -> Seq("revenue", "revenues", "net sales"),
    "net_income" -> Seq("net income"),
    "assets" -> Seq("assets"),
    "liabilities" -> Seq("liabilities"),
    "equity" -> Seq("stockholders equity", "shareholders equity"),
    "eps" -> Seq("earnings per share"),
    "cash" -> Seq("cash and cash equivalents"),
    "shares" -> Seq("shares outstanding"))
}
