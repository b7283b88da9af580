package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, cents, net1e4}
import graft.operators.Relational

/** SURVEY.md §2 operator inventory instantiated on the driver's TPC-H-ish
  * testdata tables, each with a DuckDB-equivalent oracle SQL.
  *
  * Determinism contract with the oracle (see Tables.scala): money sums in
  * exact integer cents/1e-4 units; derived ints cast to BIGINT on both
  * sides (DuckDB year()/count() are BIGINT, Spark year() is INT); float
  * outputs are single IEEE op chains or rounded; every query has a total
  * deterministic ORDER BY with a unique tiebreaker.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    // ---- A-class aggregations -------------------------------------------
    // TPC-H Q1-shaped pricing summary: grouped sums/avg/count (A3/A4-class).
    "q01_pricing_summary" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(net1e4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_1e4"),
          (sum(cents(col("l_extendedprice"))).cast("double") / lit(100.0) / count(lit(1)))
            .as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- F-class filters / projections (F1-F4, F9; pushdown audit target)
    "q02_filter_project" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp")
          && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- J1 broadcast-dim join chain (regional revenue) ------------------
    "q03_regional_revenue" -> ((s, dir) => {
      val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA"
          && o("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && o("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(n("n_name"))
        .agg(sum(net1e4(col("l_extendedprice"), col("l_discount"))).as("revenue_1e4"))
        .orderBy(col("revenue_1e4").desc, col("n_name"))
    }),

    // ---- O1/O4 top-k (TakeOrderedAndProject, no full sort) ---------------
    "q04_topk_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Relational.topK(
        o.select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_cents")),
        Seq(col("price_cents").desc, col("o_orderkey").asc), 10)
    }),

    // ---- J5/W6 latest-row-per-group --------------------------------------
    "q05_latest_order_per_customer" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      // (date desc, orderkey desc) is already larger-is-preferred on both
      // fields — the single-aggregate argmax applies with no reorientation
      Relational.dedupArgmaxAgg(o, Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .orderBy("o_custkey")
    }),

    // ---- A1 argmax dedup --------------------------------------------------
    "q06_dedup_argmax_line" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .withColumn("net_1e4", net1e4(col("l_extendedprice"), col("l_discount")))
      // linenumber-ascending tiebreak reoriented by negation (int, non-null)
      Relational.dedupArgmaxAgg(li, Seq("l_orderkey"),
          Seq(col("net_1e4"), -col("l_linenumber")))
        .select("l_orderkey", "l_linenumber", "net_1e4")
        .orderBy("l_orderkey")
    }),

    // ---- W1 YoY growth ----------------------------------------------------
    "q07_yoy_revenue" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val yearly = o.groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"))
      Relational.growthPct(yearly, Seq.empty, col("order_year"), col("revenue_cents"))
        .orderBy("order_year")
    }),

    // ---- W3 CAGR ----------------------------------------------------------
    "q08_cagr_by_segment" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val yearly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"))
      Relational.cagr(yearly, Seq("c_mktsegment"), col("order_year"), col("revenue_cents"))
        .select("c_mktsegment", "first_value", "last_value", "n_periods", "cagr")
        .orderBy("c_mktsegment")
    }),

    // ---- W4 volatility (stddev of YoY growth) -----------------------------
    "q09_volatility_by_segment" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val yearly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), year(col("o_orderdate")).cast("long").as("order_year"))
        .agg(sum(cents(col("o_totalprice"))).as("revenue_cents"))
      Relational.volatility(yearly, Seq("c_mktsegment"), col("order_year"), col("revenue_cents"))
        .orderBy("c_mktsegment")
    }),

    // ---- P1 pivot (rows=returnflag, cols=linestatus) ----------------------
    "q10_pivot_flag_status" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      Relational.pivotWide(li, Seq("l_returnflag"), "l_linestatus", Seq("F", "O"),
          sum(col("l_quantity")))
        .orderBy("l_returnflag")
    }),

    // ---- P2/J4 comparison pivot (rows=year, cols=region) ------------------
    "q11_pivot_year_region" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(year(col("o_orderdate")).cast("long").as("order_year"),
          col("r_name"), cents(col("o_totalprice")).as("pc"))
      Relational.pivotWide(j, Seq("order_year"), "r_name",
          Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"), sum(col("pc")))
        .orderBy("order_year")
    }),

    // ---- F5 tag-priority fallback -----------------------------------------
    "q12_tag_fallback" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val prio = s.createDataFrame(Seq(
        ("AUTOMOBILE", 1), ("BUILDING", 2), ("MACHINERY", 3),
        ("FURNITURE", 4), ("HOUSEHOLD", 5))).toDF("alias", "priority")
      val seg = c.groupBy("c_nationkey", "c_mktsegment").agg(count(lit(1)).as("cnt"))
      seg.join(broadcast(prio), col("c_mktsegment") === col("alias"))
        .groupBy("c_nationkey")
        .agg(min_by(col("c_mktsegment"), col("priority")).as("best_segment"),
          min_by(col("cnt"), col("priority")).as("n_cust"))
        .orderBy("c_nationkey")
    }),

    // ---- F6 label substring match -----------------------------------------
    "q13_label_substring" -> ((s, dir) => {
      val p = t(s, dir, "part")
      val aliases = s.createDataFrame(Seq(
        Tuple1("red"), Tuple1("blue"), Tuple1("small"), Tuple1("hot"), Tuple1("gear")))
        .toDF("alias")
      p.crossJoin(broadcast(aliases))
        .filter(col("p_name").contains(col("alias")))
        .groupBy("alias")
        .agg(count(lit(1)).as("n_parts"), sum(cents(col("p_retailprice"))).as("sum_retail_cents"))
        .orderBy("alias")
    }),

    // ---- J3/E2 full-outer year union with zero-fill -----------------------
    "q14_year_union" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val e = t(s, dir, "events")
      val oy = o.groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      val ey = e.groupBy(year(col("ts")).cast("long").as("yr"))
        .agg(sum(cents(col("value"))).as("ev_cents"))
      oy.join(ey, Seq("yr"), "full_outer")
        .select(col("yr"), coalesce(col("rev_cents"), lit(0L)).as("rev_cents"),
          coalesce(col("ev_cents"), lit(0L)).as("ev_cents"))
        .orderBy("yr")
    }),

    // ---- E1 intersect -----------------------------------------------------
    // (INTERSECT semantics, hand-lowered: Spark plans .intersect as a
    //  shuffled join of two full-width distinct aggregates; both sides
    //  here reduce map-side to a handful of years, so distinct + a
    //  BROADCAST semi join gets the same rows with the lineitem-side
    //  exchange carrying ~7 rows and no shuffled join at all. Dates are
    //  non-null in this schema, so null-equality — the one place
    //  INTERSECT and a semi join disagree — never arises; the hash gate
    //  would catch it if the data changed.)
    "q15_intersect_years" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      val oy = o.select(year(col("o_orderdate")).cast("long").as("yr")).distinct()
      val ly = li.select(year(col("l_shipdate")).cast("long").as("yr")).distinct()
      oy.join(broadcast(ly), Seq("yr"), "leftsemi").orderBy("yr")
    }),

    // ---- A7 freshness aggregate -------------------------------------------
    "q16_freshness" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val j = o.join(c, o("o_custkey") === c("c_custkey"))
      Relational.freshness(j, Seq("c_mktsegment"), col("o_orderdate"),
          year(col("o_orderdate")).cast("long"))
        .orderBy("c_mktsegment")
    }),

    // ---- A3 global stats --------------------------------------------------
    "q17_global_stats" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("total_cents"),
        (sum(cents(col("o_totalprice"))).cast("double") / lit(100.0) / count(lit(1)))
          .as("avg_price"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
    }),

    // ---- Running total window (rowsBetween) -------------------------------
    "q18_running_total" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val monthly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      val w = Window.partitionBy("c_mktsegment").orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly.withColumn("running_cents", sum(col("rev_cents")).over(w))
        .orderBy("c_mktsegment", "month")
    }),

    // ---- P4/C7 quarter key build + extract --------------------------------
    "q19_quarter_key" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
          concat(year(col("o_orderdate")).cast("string"), lit("-Q"),
            quarter(col("o_orderdate")).cast("string")).as("qkey"),
          cents(col("o_totalprice")).as("pc"))
        .groupBy("qkey")
        .agg(count(lit(1)).as("n_orders"), sum(col("pc")).as("rev_cents"))
        .withColumn("qnum", substring_index(col("qkey"), "Q", -1).cast("long"))
        .orderBy("qkey")
    }),

    // ---- C4/W5 conditional classification ---------------------------------
    "q20_price_class" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("pc", cents(col("o_totalprice")))
        .withColumn("price_class",
          when(col("pc") > 20000000L, "high")
            .when(col("pc") > 10000000L, "moderate")
            .otherwise("low"))
        .groupBy("price_class")
        .agg(count(lit(1)).as("n_orders"), sum(col("pc")).as("sum_cents"))
        .orderBy("price_class")
    }),

    // ---- C10 canonical row hash -------------------------------------------
    "q21_row_hash" -> ((s, dir) => {
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"),
          md5(concat_ws("|", col("n_nationkey").cast("string"), col("n_name"), col("r_name")))
            .as("row_md5"))
        .orderBy("n_nationkey")
    }),

    // ---- C9/F10 date max/greatest + render --------------------------------
    "q22_date_render" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      o.filter(col("o_orderkey") % 100 === 0)
        .join(li, o("o_orderkey") === li("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(max(col("l_shipdate")).as("latest_ship"))
        .select(col("o_orderkey"),
          date_format(col("latest_ship"), "yyyy-MM-dd").as("ship_str"),
          date_format(greatest(col("o_orderdate"), col("latest_ship")), "yyyy-MM-dd")
            .as("latest_activity"))
        .orderBy("o_orderkey")
    }),

    // ---- F2-analog null-safe prefix filter --------------------------------
    "q23_event_type_filter" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.filter(col("event_type").isNull || col("event_type").startsWith("s")
          || col("event_type") === "purchase")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("val_cents"))
        .orderBy("event_type")
    }),

    // ---- Tumbling-window batch analog of the streaming agg ----------------
    "q24_event_windows" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(date_trunc("hour", col("ts")).as("hour_window"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("val_cents"))
        .orderBy("hour_window", "event_type")
    }),

    // ---- Left-anti (J1 unknown-key error path) ----------------------------
    "q25_customers_without_orders" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // ---- Left-semi (EXISTS) -----------------------------------------------
    "q26_active_customers_1996" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val o96 = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      c.join(o96, c("c_custkey") === o96("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active"))
        .orderBy("c_mktsegment")
    })
  )

  private val cents_o = "CAST(ROUND(o_totalprice*100) AS BIGINT)"
  private val cents_l = "CAST(ROUND(l_extendedprice*100) AS BIGINT)"
  private val net_l = "CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)"
  private val cents_v = "CAST(ROUND(value*100) AS BIGINT)"

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  SUM(l_quantity) AS sum_qty,
         |  CAST(SUM($cents_l) AS BIGINT) AS sum_base_cents,
         |  CAST(SUM($net_l) AS BIGINT) AS sum_disc_1e4,
         |  CAST(SUM($cents_l) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity, $cents_l AS price_cents
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND l_returnflag = 'R'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_regional_revenue" ->
      s"""SELECT n_name, CAST(SUM($net_l) AS BIGINT) AS revenue_1e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY revenue_1e4 DESC, n_name""".stripMargin,

    "q04_topk_orders" ->
      s"""SELECT o_orderkey, o_custkey, $cents_o AS price_cents
         |FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""".stripMargin,

    "q05_latest_order_per_customer" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
         |FROM (SELECT *, ROW_NUMBER() OVER
         |        (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |      FROM orders) WHERE rn = 1
         |ORDER BY o_custkey""".stripMargin,

    "q06_dedup_argmax_line" ->
      s"""SELECT l_orderkey, l_linenumber, net_1e4
         |FROM (SELECT l_orderkey, l_linenumber, $net_l AS net_1e4, ROW_NUMBER() OVER
         |        (PARTITION BY l_orderkey ORDER BY $net_l DESC, l_linenumber) AS rn
         |      FROM lineitem) WHERE rn = 1
         |ORDER BY l_orderkey""".stripMargin,

    "q07_yoy_revenue" ->
      s"""WITH yearly AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |         CAST(SUM($cents_o) AS BIGINT) AS revenue_cents
         |  FROM orders GROUP BY 1)
         |SELECT order_year, revenue_cents,
         |  CASE WHEN lag(revenue_cents) OVER (ORDER BY order_year) IS NOT NULL
         |        AND lag(revenue_cents) OVER (ORDER BY order_year) <> 0
         |       THEN (CAST(revenue_cents AS DOUBLE) /
         |             CAST(lag(revenue_cents) OVER (ORDER BY order_year) AS DOUBLE) - 1) * 100
         |  END AS growth_pct
         |FROM yearly ORDER BY order_year""".stripMargin,

    "q08_cagr_by_segment" ->
      s"""WITH yearly AS (
         |  SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |         CAST(SUM($cents_o) AS BIGINT) AS revenue_cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2)
         |SELECT c_mktsegment,
         |  min_by(revenue_cents, order_year) AS first_value,
         |  max_by(revenue_cents, order_year) AS last_value,
         |  COUNT(DISTINCT order_year) AS n_periods,
         |  CASE WHEN COUNT(DISTINCT order_year) > 1 AND min_by(revenue_cents, order_year) <> 0
         |       THEN ROUND(POW(CAST(max_by(revenue_cents, order_year) AS DOUBLE) /
         |                      CAST(min_by(revenue_cents, order_year) AS DOUBLE),
         |                      1.0/(COUNT(DISTINCT order_year)-1)) - 1, 6)
         |  END AS cagr
         |FROM yearly GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q09_volatility_by_segment" ->
      s"""WITH yearly AS (
         |  SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |         CAST(SUM($cents_o) AS BIGINT) AS revenue_cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         |growth AS (
         |  SELECT c_mktsegment,
         |    CASE WHEN lag(revenue_cents) OVER w IS NOT NULL AND lag(revenue_cents) OVER w <> 0
         |         THEN (CAST(revenue_cents AS DOUBLE)/CAST(lag(revenue_cents) OVER w AS DOUBLE) - 1)*100
         |    END AS growth_pct
         |  FROM yearly WINDOW w AS (PARTITION BY c_mktsegment ORDER BY order_year))
         |SELECT c_mktsegment, ROUND(stddev_samp(growth_pct), 6) AS volatility
         |FROM growth GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q10_pivot_flag_status" ->
      """SELECT l_returnflag,
        |  SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
        |  SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q11_pivot_year_region" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
         |  CAST(SUM(CASE WHEN r_name = 'AFRICA' THEN $cents_o END) AS BIGINT) AS "AFRICA",
         |  CAST(SUM(CASE WHEN r_name = 'AMERICA' THEN $cents_o END) AS BIGINT) AS "AMERICA",
         |  CAST(SUM(CASE WHEN r_name = 'ASIA' THEN $cents_o END) AS BIGINT) AS "ASIA",
         |  CAST(SUM(CASE WHEN r_name = 'EUROPE' THEN $cents_o END) AS BIGINT) AS "EUROPE",
         |  CAST(SUM(CASE WHEN r_name = 'MIDDLE EAST' THEN $cents_o END) AS BIGINT) AS "MIDDLE EAST"
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY 1 ORDER BY order_year""".stripMargin,

    "q12_tag_fallback" ->
      """WITH prio(alias, priority) AS (VALUES
        |  ('AUTOMOBILE', 1), ('BUILDING', 2), ('MACHINERY', 3),
        |  ('FURNITURE', 4), ('HOUSEHOLD', 5)),
        |seg AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
        |        FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey,
        |  min_by(c_mktsegment, priority) AS best_segment,
        |  min_by(cnt, priority) AS n_cust
        |FROM seg JOIN prio ON c_mktsegment = alias
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q13_label_substring" ->
      """WITH aliases(alias) AS (VALUES ('red'), ('blue'), ('small'), ('hot'), ('gear'))
        |SELECT alias, COUNT(*) AS n_parts,
        |  CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS BIGINT) AS sum_retail_cents
        |FROM part CROSS JOIN aliases
        |WHERE contains(p_name, alias)
        |GROUP BY alias ORDER BY alias""".stripMargin,

    "q14_year_union" ->
      s"""WITH oy AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |              CAST(SUM($cents_o) AS BIGINT) AS rev_cents FROM orders GROUP BY 1),
         |     ey AS (SELECT CAST(year(ts) AS BIGINT) AS yr,
         |              CAST(SUM($cents_v) AS BIGINT) AS ev_cents FROM events GROUP BY 1)
         |SELECT COALESCE(oy.yr, ey.yr) AS yr,
         |  COALESCE(rev_cents, 0) AS rev_cents, COALESCE(ev_cents, 0) AS ev_cents
         |FROM oy FULL OUTER JOIN ey ON oy.yr = ey.yr ORDER BY yr""".stripMargin,

    "q15_intersect_years" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr FROM orders
        |INTERSECT
        |SELECT CAST(year(l_shipdate) AS BIGINT) AS yr FROM lineitem
        |ORDER BY yr""".stripMargin,

    "q16_freshness" ->
      """WITH j AS (SELECT c_mktsegment, o_orderdate,
        |             CAST(CAST(year(o_orderdate) AS BIGINT) AS VARCHAR) AS y
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |d AS (SELECT c_mktsegment, MAX(o_orderdate) AS latest_date FROM j GROUP BY 1),
        |p AS (SELECT c_mktsegment, string_agg(y, ',' ORDER BY y) AS periods
        |      FROM (SELECT DISTINCT c_mktsegment, y FROM j) GROUP BY 1)
        |SELECT d.c_mktsegment, latest_date, periods
        |FROM d JOIN p ON d.c_mktsegment = p.c_mktsegment
        |ORDER BY d.c_mktsegment""".stripMargin,

    "q17_global_stats" ->
      s"""SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders,
         |  CAST(SUM($cents_o) AS BIGINT) AS total_cents,
         |  CAST(SUM($cents_o) AS DOUBLE)/100.0/COUNT(*) AS avg_price,
         |  MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
         |FROM orders""".stripMargin,

    "q18_running_total" ->
      s"""WITH monthly AS (
         |  SELECT c_mktsegment, date_trunc('month', o_orderdate) AS month,
         |         CAST(SUM($cents_o) AS BIGINT) AS rev_cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2)
         |SELECT c_mktsegment, month, rev_cents,
         |  CAST(SUM(rev_cents) OVER (PARTITION BY c_mktsegment ORDER BY month
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
         |FROM monthly ORDER BY c_mktsegment, month""".stripMargin,

    "q19_quarter_key" ->
      s"""SELECT CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
         |       CAST(quarter(o_orderdate) AS VARCHAR) AS qkey,
         |  COUNT(*) AS n_orders, CAST(SUM($cents_o) AS BIGINT) AS rev_cents,
         |  CAST(quarter(ANY_VALUE(o_orderdate)) AS BIGINT) AS qnum
         |FROM orders GROUP BY 1 ORDER BY qkey""".stripMargin,

    "q20_price_class" ->
      s"""SELECT CASE WHEN $cents_o > 20000000 THEN 'high'
         |            WHEN $cents_o > 10000000 THEN 'moderate'
         |            ELSE 'low' END AS price_class,
         |  COUNT(*) AS n_orders, CAST(SUM($cents_o) AS BIGINT) AS sum_cents
         |FROM orders GROUP BY 1 ORDER BY price_class""".stripMargin,

    "q21_row_hash" ->
      """SELECT n_nationkey,
        |  md5(CAST(n_nationkey AS VARCHAR) || '|' || n_name || '|' || r_name) AS row_md5
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |ORDER BY n_nationkey""".stripMargin,

    "q22_date_render" ->
      """SELECT o_orderkey,
        |  strftime(MAX(l_shipdate), '%Y-%m-%d') AS ship_str,
        |  strftime(GREATEST(o_orderdate, MAX(l_shipdate)), '%Y-%m-%d') AS latest_activity
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey % 100 = 0
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY o_orderkey""".stripMargin,

    "q23_event_type_filter" ->
      s"""SELECT event_type, COUNT(*) AS n, CAST(SUM($cents_v) AS BIGINT) AS val_cents
         |FROM events
         |WHERE event_type IS NULL OR event_type LIKE 's%' OR event_type = 'purchase'
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q24_event_windows" ->
      s"""SELECT date_trunc('hour', ts) AS hour_window, event_type,
         |  COUNT(*) AS n, CAST(SUM($cents_v) AS BIGINT) AS val_cents
         |FROM events GROUP BY 1, 2 ORDER BY hour_window, event_type""".stripMargin,

    "q25_customers_without_orders" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q26_active_customers_1996" ->
      """SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
