package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic relational operators re-expressing the reference's hand-written
  * pandas/dict semantics (SURVEY.md §2) as declarative Spark plans.
  *
  * Everything here is `DataFrame => DataFrame`, shuffle-aware, and
  * collect-free so it scales from sf0.001 to a 1000-executor cluster:
  * dedup/latest are single-shuffle window ranks on the group keys; top-k is
  * a global sort-limit (Spark plans TakeOrderedAndProject — no full sort);
  * pivots aggregate in long form first and widen last.
  */
object Relational {

  /** A1 argmax-|value| dedup (ref: src/api/data_service.py:126-176): within
    * each key group keep the single row maximizing `order` columns.
    * Ties MUST be broken by a unique column for determinism — pass it as the
    * last ordering column. One shuffle on `keys`. */
  def dedupArgmax(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** A1 argmax dedup as ONE hash aggregate — the shape that wins at scale
    * over [[dedupArgmax]]'s window: `max_by(row, ordering)` partially
    * aggregates map-side, so the shuffle carries ONE candidate row per
    * (partition, key) instead of every row, and the whole pipeline stays
    * inside whole-stage codegen (WindowExec is neither partial nor
    * codegen'd — on a 100 TB fact table that is the difference between
    * shuffling the table and shuffling the keys).
    *
    * Caller contract (narrower than the window version, which is why
    * both exist): `maxOrd` columns must be oriented larger-is-preferred
    * (negate a numeric to prefer-smallest; a string or date can only be
    * prefer-largest), non-null, and jointly unique per group — struct
    * ordering is lexicographic, so the combination decides the row
    * deterministically. Result rows and schema match [[dedupArgmax]]
    * with the equivalent ordering exactly (q05/q06 hash-gate this). */
  def dedupArgmaxAgg(df: DataFrame, keys: Seq[String], maxOrd: Seq[Column]): DataFrame = {
    val row = struct(df.columns.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(row, struct(maxOrd: _*)).as("__row"))
      .select(col("__row.*"))
  }

  /** J5/W6 latest-row-per-group (ref: financial_analyzer.py:421-444). */
  def latestPerGroup(df: DataFrame, keys: Seq[String], ts: Column, tieBreak: Column): DataFrame =
    dedupArgmax(df, keys, Seq(ts.desc, tieBreak.asc))

  /** O1/O4 top-k: global orderBy+limit. Spark plans this as
    * TakeOrderedAndProject (per-partition heap + driver merge of k rows),
    * so it scales without a full sort. Include a unique tiebreak column. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** W1 YoY growth (ref: sec_mcp/server.py:417-425):
    * growth_pct = (v/lag(v) − 1)·100 over `orderCol` within `partCols`.
    * Null for the first period and on zero denominators (ref skips div-by-0). */
  def growthPct(df: DataFrame, partCols: Seq[String], orderCol: Column, valueCol: Column,
                outName: String = "growth_pct"): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(orderCol)
    val prev = lag(valueCol, 1).over(w)
    df.withColumn(outName,
      when(prev.isNotNull && prev =!= 0,
        (valueCol.cast("double") / prev.cast("double") - 1) * 100))
  }

  /** W3 CAGR over an ordered series (ref: sec_mcp/server.py:412-415):
    * (last/first)^(1/(n−1)) − 1, via min_by/max_by on the order column —
    * a single shuffle-free partial-aggregable groupBy. */
  def cagr(df: DataFrame, groupCols: Seq[String], orderCol: Column, valueCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        min_by(valueCol, orderCol).as("first_value"),
        max_by(valueCol, orderCol).as("last_value"),
        countDistinct(orderCol).as("n_periods"))
      .withColumn("cagr",
        when(col("n_periods") > 1 && col("first_value") =!= 0,
          round(pow(col("last_value").cast("double") / col("first_value").cast("double"),
            lit(1.0) / (col("n_periods") - 1)) - 1, 6)))

  /** W4 volatility = stddev of the YoY growth series (ref: server.py:431). */
  def volatility(df: DataFrame, partCols: Seq[String], orderCol: Column, valueCol: Column): DataFrame =
    growthPct(df, partCols, orderCol, valueCol)
      .groupBy(partCols.map(col): _*)
      .agg(round(stddev(col("growth_pct")), 6).as("volatility"))

  /** P1/P2 pivot: aggregate in long form, widen last (SURVEY §7.4 — all
    * computation stays long; pivot is presentation). Explicit `values`
    * avoids the extra distinct-scan job AND fixes output column order. */
  def pivotWide(df: DataFrame, rowKey: Seq[String], pivotCol: String,
                values: Seq[String], agg: Column): DataFrame =
    df.groupBy(rowKey.map(col): _*).pivot(pivotCol, values).agg(agg)

  /** F5 tag-priority fallback (ref: main.py:183-188): per group, the
    * highest-priority alias that is present at all wins for the whole group
    * (not a per-row coalesce). `aliasDim` = (alias, priority) — broadcast. */
  def bestAvailableAlias(df: DataFrame, groupCols: Seq[String], aliasCol: String,
                         aliasDim: DataFrame): DataFrame = {
    val joined = df.join(broadcast(aliasDim), col(aliasCol) === aliasDim("alias"))
    joined.groupBy(groupCols.map(col): _*)
      .agg(min_by(col("alias"), col("priority")).as("best_alias"))
  }

  /** As-of join: for each left row, attach the latest right value whose
    * timestamp is ≤ the left timestamp, per key — the canonical
    * point-in-time lookup Spark has no native operator for.
    *
    * Plan: union the two sides with a side marker, then one key-partitioned
    * window carries the last seen right value forward
    * (`last(_, ignoreNulls)` over unbounded-preceding); left rows keep the
    * carried value. ONE shuffle on the key, no range-join explosion, no
    * per-row subquery — at 100 TB this is a sort-merge pass per key
    * partition. Right rows sort before left at equal timestamps, giving
    * `right.ts <= left.ts` inclusive semantics (= DuckDB ASOF JOIN, which
    * the oracle uses to cross-check this operator).
    *
    * @param valueCols right-side columns to carry (emitted as `asof_<name>`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               valueCols: Seq[String], tieBreak: Seq[String] = Seq.empty): DataFrame =
    asofJoinImpl(left, right, keyCol, tsCol, valueCols, tieBreak, forward = false)

  /** Forward as-of join: for each left row, the EARLIEST right value whose
    * timestamp is ≥ the left timestamp, per key — the mirror operator
    * (align each event to the next snapshot/checkpoint at-or-after it).
    * Same single-shuffle union+window plan with the scan direction
    * reversed; the oracle cross-checks against DuckDB's native
    * `ASOF JOIN ... ON l.ts <= r.ts`. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                      valueCols: Seq[String], tieBreak: Seq[String] = Seq.empty): DataFrame =
    asofJoinImpl(left, right, keyCol, tsCol, valueCols, tieBreak, forward = true)

  private def asofJoinImpl(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                           valueCols: Seq[String], tieBreak: Seq[String],
                           forward: Boolean): DataFrame = {
    val leftCols = left.columns
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        tieBreak.filterNot(leftCols.contains).map(c => lit(null).as(c)): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        tieBreak.filterNot(leftCols.contains).map(col): _*)
    // With no caller tieBreak, right rows sharing (key, ts) would be
    // ordered arbitrarily and last() would carry a run-dependent value —
    // order by the carried values themselves as the final key so ties
    // resolve deterministically (largest carried tuple wins, both
    // directions; DuckDB ASOF picks the same row only when (key, ts) is
    // unique — supply tieBreak when it is not). Left rows' null markers
    // never affect the carry.
    val tieCols =
      if (tieBreak.nonEmpty) tieBreak.map(col)
      else valueCols.map(c => col(s"__v_$c").asc_nulls_first)
    // backward: ts ASC, right(0) before left(1) at equal ts → inclusive ≤.
    // forward: ts DESC, right before left at equal ts → inclusive ≥.
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val orderCols = Seq(tsOrder, col("__side")) ++ tieCols
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** Range (interval) join: match each point row to every interval row of
    * the same key with `start ≤ point ≤ end` — WITHOUT the cartesian/
    * nested-loop plan Spark falls back to for raw range predicates. Both
    * sides are bucketed into fixed `binSize` bins (intervals explode into
    * the bins they overlap, points land in one), the join becomes an
    * equi-join on (key, bin), and the exact range predicate filters inside
    * the join. Each (point, interval) pair matches at most once — a point
    * has exactly one bin. Replication factor = avg interval length /
    * binSize + 1, so pick binSize near the typical interval length.
    * Columns: both inputs keep their columns (they must not collide apart
    * from `keyCol`). */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCol: String,
                pointCol: String, startCol: String, endCol: String,
                binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__bin", expr(s"`$pointCol` div $binSize"))
    // drop inverted intervals BEFORE exploding: sequence(a, b) with a > b
    // steps BACKWARDS in Spark, so one corrupt end<start row would explode
    // into (start-end)/binSize bins instead of matching nothing
    val i = intervals.filter(col(startCol) <= col(endCol)).withColumn("__bin",
      explode(sequence(expr(s"`$startCol` div $binSize"), expr(s"`$endCol` div $binSize"))))
    p.join(i, Seq(keyCol, "__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Gap-based sessionization (batch analog of the streaming
    * flatMapGroupsWithState sessions): a new session starts when the gap to
    * the previous event exceeds `gapSeconds`; session id = running count of
    * session starts. Two windows + one groupBy, all keyed on the user —
    * scales as a single user-partitioned shuffle. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
                 tieBreak: Seq[String] = Seq.empty): DataFrame = {
    // integer µs→s floor division: exact and identical across engines
    val secs = expr(s"unix_micros(`$tsCol`) div 1000000")
    val orderCols = (tsCol +: tieBreak).map(col)
    val w = Window.partitionBy(userCol).orderBy(orderCols: _*)
    val withFlag = df.withColumn("__secs", secs)
      .withColumn("__new_session",
        when(lag(col("__secs"), 1).over(w).isNull
          || col("__secs") - lag(col("__secs"), 1).over(w) > gapSeconds, 1L)
          .otherwise(0L))
    withFlag.withColumn("session_id",
      sum(col("__new_session"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** A7 freshness aggregate (ref: data_manager.py:304-331): latest date +
    * sorted distinct period list per key. The list is emitted as a joined
    * string so the oracle compare is array-representation-agnostic. */
  def freshness(df: DataFrame, keys: Seq[String], dateCol: Column, periodCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        max(dateCol).as("latest_date"),
        concat_ws(",", sort_array(collect_set(periodCol.cast("string")))).as("periods"))
}
