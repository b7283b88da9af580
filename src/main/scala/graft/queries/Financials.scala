package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.{FactModel, MetricCatalog}
import graft.operators.Relational

/** The reference's four query surfaces over the canonical fact table
  * (SURVEY §3): metric series (REST path 3.1), statements + ratios
  * (analytics path 3.3), comparison, and trend analysis (MCP path).
  *
  * All pure DataFrame → DataFrame; every multi-company operation is a
  * single pass over the long table (the reference loops companies serially
  * — SURVEY §4 flags that as the anti-optimization we remove).
  */
object Financials {

  // ---------------------------------------------------------------------
  // Period filters: F2 is canonical (serving semantics); F1 documented
  // divergence (its quarterly admits non-Q periods) — SURVEY §7.4.
  // ---------------------------------------------------------------------

  /** F2 period filter (ref: data_service.py:133-140): annual = null or FY;
    * quarterly = starts with Q. */
  def periodFilter(period: String): Column = period match {
    case "annual"    => col("fiscal_period").isNull || col("fiscal_period") === "FY"
    case "quarterly" => col("fiscal_period").startsWith("Q")
    case _           => lit(true)
  }

  /** F1 variant (ref: main.py:219-227): annual = startswith FY; quarterly =
    * NOT startswith FY. Kept for parity tests of the documented divergence. */
  def periodFilterLegacy(period: String): Column = period match {
    case "annual"    => col("fiscal_period").startsWith("FY")
    // Python's `fp and fp.startswith("FY")` is falsy for None → a null
    // period IS admitted by F1-quarterly (unlike F2) — SQL needs the
    // explicit isNull arm or three-valued logic silently drops it.
    case "quarterly" => col("fiscal_period").isNull || !col("fiscal_period").startsWith("FY")
    case _           => lit(true)
  }

  /** Canonical period key for dedup/grouping: F2's annual admits both null
    * and 'FY' for the same logical period — collapse them so one fiscal
    * year never yields two rows (which would corrupt pivots via arbitrary
    * first() and trends via duplicate lag keys). */
  private def canonPeriod(period: String): Column =
    if (period == "annual") lit("FY") else col("fiscal_period")

  // ---------------------------------------------------------------------
  // 3.1 serving path: alias filter → dedup → sort → limit
  // ---------------------------------------------------------------------

  /** Metric series (ref: data_service.py:112-186): F6 label-substring match,
    * F2 period filter, F4 null-fy drop, A1 argmax-|value| dedup per (fy,fp),
    * O1 sort desc + row cap. One narrow scan + one tiny keyed shuffle. */
  def metricSeries(facts: DataFrame, metric: String, period: String = "annual",
                   years: Int = 5): DataFrame = {
    val aliases = MetricCatalog.labelAliases.getOrElse(metric, Seq(metric))
    val aliasMatch = aliases.map(a => lower(col("label")).contains(a.toLowerCase))
      .reduce(_ || _)
    val filtered = facts
      .filter(aliasMatch)
      .filter(periodFilter(period))
      .filter(col("fiscal_year").isNotNull)
      // F2 treats null fp and 'FY' as the SAME annual period — canonicalize
      // before dedup or one fiscal year yields two rows (null + FY keys)
      .withColumn("fiscal_period", canonPeriod(period))
    val deduped = Relational.dedupArgmax(filtered, Seq("ticker", "fiscal_year", "fiscal_period"),
      Seq(abs(col("value")).desc, col("end_date").desc_nulls_last, col("concept").asc))
    val cap = years * (if (period == "quarterly") 4 else 1)
    val w = Window.partitionBy("ticker")
      .orderBy(col("fiscal_year").desc, col("fiscal_period").desc)
    deduped
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= cap).drop("__rn")
      .select("ticker", "company_name", "fiscal_year", "fiscal_period",
        "label", "value", "unit", "end_date", "instant_date", "form")
      .orderBy(col("ticker"), col("fiscal_year").desc, col("fiscal_period").desc)
  }

  // ---------------------------------------------------------------------
  // 3.3 analytics path: tag fallback → unit preference → statement pivot
  // ---------------------------------------------------------------------

  /** F5 + F7 + A1: resolve each friendly metric to one value per
    * (ticker, fiscal_year[, fiscal_period]) using the tag-priority
    * fallback — the first tag PRESENT for the company wins company-wide
    * (not per-row coalesce; ref: main.py:183-188).
    *
    * Single pass: facts ⨝ broadcast(tag dim) → per-company best priority
    * (window min) → keep only winning-tag rows → unit preference → dedup.
    */
  def resolveMetrics(facts: DataFrame, metrics: Seq[String], period: String = "annual"): DataFrame = {
    val tagDim = metrics.flatMap { m =>
      MetricCatalog.tagFallback.getOrElse(m, Nil).zipWithIndex.map {
        case (tag, pri) => (m, tag, pri)
      }
    }
    val spark = facts.sparkSession
    import spark.implicits._
    val tags = tagDim.toDF("metric", "tag", "priority")

    val joined = facts
      .filter(periodFilter(period) && col("fiscal_year").isNotNull)
      .withColumn("fiscal_period", canonPeriod(period))
      .join(broadcast(tags), col("concept") === col("tag"))
    // company-wide winning priority per metric (F5)
    val wBest = Window.partitionBy("ticker", "metric")
    val best = joined.withColumn("__best_pri", min(col("priority")).over(wBest))
      .filter(col("priority") === col("__best_pri"))
    // F7 unit preference then A1 dedup within (ticker, metric, fy, fp)
    val unitPri = FactModel.UnitPriority.foldLeft(lit(99)) {
      case (acc, (u, p)) => when(col("unit") === u, p).otherwise(acc)
    }
    Relational.dedupArgmax(
      best.withColumn("__unit_pri", unitPri),
      Seq("ticker", "metric", "fiscal_year", "fiscal_period"),
      Seq(col("__unit_pri").asc, abs(col("value")).desc,
        col("end_date").desc_nulls_last, col("concept").asc))
      .select("ticker", "metric", "fiscal_year", "fiscal_period", "value", "unit")
  }

  /** P1/P5 statement pivot: rows = metric (stable catalog order), cols =
    * fiscal years ascending (ref: main.py:383-387). Long-form compute,
    * pivot last. `lastN` keeps only each ticker's N most recent fiscal
    * years (the REST `years` parameter) — a dense_rank in long form, so
    * the pivot never materializes columns that get dropped. */
  def statement(facts: DataFrame, metrics: Seq[String], period: String = "annual",
                years: Option[Seq[Int]] = None, lastN: Option[Int] = None): DataFrame = {
    val resolved = resolveMetrics(facts, metrics, period)
    val long = lastN match {
      case Some(n) =>
        val w = Window.partitionBy("ticker").orderBy(col("fiscal_year").desc)
        resolved.withColumn("__yr_rank", dense_rank().over(w))
          .filter(col("__yr_rank") <= n).drop("__yr_rank")
      case None => resolved
    }
    // resolveMetrics guarantees one row per (ticker, metric, fy, fp), so
    // the pivot key must carry the quarter for quarterly data — pivoting
    // quarterly rows on the year alone would pick an arbitrary quarter via
    // first(). Annual keeps bare year columns (fp canonicalized to FY).
    val keyed =
      if (period == "quarterly")
        long.withColumn("__period",
          concat_ws("-", col("fiscal_year"), col("fiscal_period")))
      else long.withColumn("__period", col("fiscal_year"))
    val yearVals: Seq[Any] = years.map(_.map(_.asInstanceOf[Any]))
      .getOrElse(Seq.empty)
    val pivoted =
      if (yearVals.nonEmpty && period != "quarterly")
        keyed.groupBy("ticker", "metric").pivot("__period", yearVals).agg(first("value"))
      else keyed.groupBy("ticker", "metric").pivot("__period").agg(first("value"))
    // stable metric ordering from the catalog
    val order = metrics.zipWithIndex.toMap
    val orderCol = order.foldLeft(lit(999)) { case (acc, (m, i)) =>
      when(col("metric") === m, i).otherwise(acc)
    }
    pivoted.withColumn("__ord", orderCol).orderBy("ticker", "__ord").drop("__ord")
  }

  def incomeStatement(facts: DataFrame, period: String = "annual"): DataFrame =
    statement(facts, Seq("revenue", "cost_of_revenue", "gross_profit",
      "operating_income", "net_income", "eps_diluted"), period)

  def balanceSheet(facts: DataFrame, period: String = "annual"): DataFrame =
    statement(facts, Seq("assets", "liabilities", "equity", "cash"), period)

  // ---------------------------------------------------------------------
  // Ratios (J2 + C1-C3 + P3)
  // ---------------------------------------------------------------------

  /** Financial ratios (ref: main.py:490-565): income ⨝ balance on
    * (ticker, fiscal_year) — J2's year intersection IS the inner join —
    * then guarded ratio formulas. Output long: one row per (ticker, year). */
  def ratios(facts: DataFrame): DataFrame = {
    val m = resolveMetrics(facts,
      Seq("revenue", "gross_profit", "operating_income", "net_income",
        "assets", "liabilities", "equity"))
    val wide = m.groupBy("ticker", "fiscal_year")
      .pivot("metric", Seq("revenue", "gross_profit", "operating_income",
        "net_income", "assets", "liabilities", "equity"))
      .agg(first("value"))
    def pct(n: Column, dv: Column): Column = when(dv > 0, n / dv * 100)
    wide.select(
      col("ticker"), col("fiscal_year"),
      pct(col("gross_profit"), col("revenue")).as("gross_margin"),
      pct(col("operating_income"), col("revenue")).as("operating_margin"),
      pct(col("net_income"), col("revenue")).as("net_margin"),
      pct(col("net_income"), col("assets")).as("roa"),
      pct(col("net_income"), col("equity")).as("roe"),
      when(col("equity") > 0, col("liabilities") / col("equity")).as("debt_to_equity"),
      pct(col("liabilities"), col("assets")).as("debt_to_assets"))
      .withColumn("leverage_class",
        when(col("debt_to_assets").isNull, null)
          .when(col("debt_to_assets") > 50, "high")
          .when(col("debt_to_assets") > 25, "moderate")
          .otherwise("low"))
      .orderBy("ticker", "fiscal_year")
  }

  // ---------------------------------------------------------------------
  // Comparison (J4/P2): one pass + pivot, not N serial scans
  // ---------------------------------------------------------------------

  /** Multi-company comparison (ref loops tickers serially, main.py:730-757;
    * here: single scan → pivot tickers to columns). `lastN` caps to the N
    * most recent fiscal years present across the compared set. */
  def compare(facts: DataFrame, metric: String, tickers: Seq[String],
              period: String = "annual", lastN: Option[Int] = None): DataFrame = {
    val long = resolveMetrics(facts.filter(col("ticker").isInCollection(tickers)),
      Seq(metric), period)
    // quarterly rows are unique per (fy, fp) — the row key must include the
    // quarter or first() would serve an arbitrary quarter as the year
    val keyCols = if (period == "quarterly") Seq("fiscal_year", "fiscal_period")
                  else Seq("fiscal_year")
    val wide = long.groupBy(keyCols.map(col): _*).pivot("ticker", tickers)
      .agg(first("value"))
    val capped = lastN match {
      case Some(n) =>
        // cap by distinct fiscal YEARS in both modes (the API's `years`);
        // post-pivot frame is tiny (years × ≤4 rows)
        wide.withColumn("__yr_rank",
            dense_rank().over(Window.orderBy(col("fiscal_year").desc)))
          .filter(col("__yr_rank") <= n).drop("__yr_rank")
      case None => wide
    }
    capped.orderBy(keyCols.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // Trends (W1-W5)
  // ---------------------------------------------------------------------

  /** A8 sector averages (ref: financial_analysis_examples.py:174-182):
    * mean ratios over a ticker set — one aggregate over the ratios table,
    * not a per-company loop. */
  def sectorAverages(facts: DataFrame, tickers: Seq[String], fiscalYear: Int): DataFrame =
    ratios(facts.filter(col("ticker").isInCollection(tickers)))
      .filter(col("fiscal_year") === fiscalYear)
      .agg(
        round(avg(col("net_margin")), 6).as("avg_net_margin"),
        round(avg(col("roe")), 6).as("avg_roe"),
        round(avg(col("roa")), 6).as("avg_roa"),
        count(lit(1)).as("n_companies"))

  /** MCP report composition (ref: sec_mcp/server.py:499-619): one text
    * report assembled from the query surfaces — statements + ratios +
    * trends for a ticker. Engine work stays distributed; only the final
    * capped rows are collected for rendering. */
  def report(facts: DataFrame, ticker: String): String = {
    val own = facts.filter(col("ticker") === ticker)
    val sb = new StringBuilder
    sb.append(s"=== Financial report: $ticker ===\n\n")
    sb.append("-- Income statement (annual) --\n")
    sb.append(graft.sources.Serve.toCsvString(incomeStatement(own))).append("\n\n")
    sb.append("-- Ratios --\n")
    sb.append(graft.sources.Serve.toCsvString(ratios(own))).append("\n\n")
    sb.append("-- Revenue trend --\n")
    sb.append(graft.sources.Serve.toCsvString(trends(own, "revenue"))).append("\n")
    sb.toString
  }

  /** Trend analysis block (ref: sec_mcp/server.py:386-439): YoY series,
    * CAGR, volatility, direction — per (ticker, metric). */
  def trends(facts: DataFrame, metric: String): DataFrame = {
    val series = resolveMetrics(facts, Seq(metric))
    val grown = Relational.growthPct(series, Seq("ticker", "metric"),
      col("fiscal_year"), col("value"))
    val agg = grown.groupBy("ticker", "metric").agg(
      min_by(col("value"), col("fiscal_year")).as("first_value"),
      max_by(col("value"), col("fiscal_year")).as("last_value"),
      countDistinct(col("fiscal_year")).as("n_periods"),
      max_by(col("value"), col("fiscal_year")).as("latest"),
      avg(col("value")).as("mean_value"),
      round(stddev(col("growth_pct")), 6).as("volatility"))
    agg.withColumn("cagr",
        when(col("n_periods") > 1 && col("first_value") =!= 0,
          round(pow(col("last_value") / col("first_value"),
            lit(1.0) / (col("n_periods") - 1)) - 1, 6)))
      .withColumn("direction",
        when(col("cagr") > 0, "increasing")
          .when(col("cagr") < 0, "decreasing")
          .otherwise("stable"))
      .orderBy("ticker")
  }
}
