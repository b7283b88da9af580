package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** The as-of join as a FIRST-CLASS plan node — the (c) tier of the
  * extension ladder (custom `LogicalPlan` + `Strategy` + `SparkPlan`),
  * used where composing built-in operators costs structure the planner
  * can't remove. The composed form (`Relational.asofJoin`) unions both
  * sides and runs a carry-forward window; this node instead asks the
  * planner for exactly what the algorithm needs — both children hash-
  * clustered on the key and sorted by (key, ts) — and then ONE forward
  * merge pass per partition pairs every left row with the latest right
  * row at-or-before it. No union materialization, no window buffering:
  * per-partition state is a single carried row.
  *
  * Semantics: backward, inclusive, ROW-ATOMIC — the carried values all
  * come from ONE right row, the row DuckDB's native ASOF JOIN would pick
  * (qx38 hash-checks exactly that). Ties at equal (key, ts) resolve
  * toward the largest carried tuple, like `Relational.asofJoin`. The one
  * documented divergence from the composed operator: when carried columns
  * CONTAIN NULLS, the composed form carries each column's last non-null
  * independently (it can mix values from different right rows); this node
  * carries the matched row as-is, nulls included — the DuckDB-consistent
  * choice. On null-free carried columns (every oracle-gated
  * configuration) the two agree exactly.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKey: Attribute, rightKey: Attribute,
                    leftTs: Attribute, rightTs: Attribute,
                    carried: Seq[Attribute], carriedOut: Seq[Attribute],
                    forward: Boolean)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: AsOfJoin → AsOfJoinExec. Registered via
  * `spark.experimental.extraStrategies` (GraftFunctions.register) and
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions). */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, carried, carriedOut, forward) =>
      AsOfJoinExec(lk, rk, lts, rts, carried, carriedOut, forward,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical merge as-of join.
  *
  * Scale shape: `requiredChildDistribution` makes EnsureRequirements
  * hash-partition both sides identically on the key (the ONLY shuffle);
  * `requiredChildOrdering` makes it sort each side by (key, ts) — so the
  * merge is a single streaming pass per partition holding one buffered
  * right row, regardless of group size. The right ordering appends the
  * carried columns so duplicate (key, ts) rows resolve deterministically
  * (largest carried tuple wins — same rule as the composed operator).
  */
case class AsOfJoinExec(leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        carried: Seq[Attribute], carriedOut: Seq[Attribute],
                        forward: Boolean,
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  // forward = earliest-at-or-after: the SAME merge over ts-DESCENDING
  // children (consume everything at-or-after in scan order; the last
  // consumed is the earliest ≥ left ts)
  private def tsDir: SortDirection = if (forward) Descending else Ascending

  override def output: Seq[Attribute] = left.output ++ carriedOut
  override def producedAttributes: AttributeSet = AttributeSet(carriedOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, tsDir)) ++
      carried.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows stream through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Co-partitioning invariant: zipPartitions requires both children to have
  // the SAME partition count. EnsureRequirements guarantees it here — both
  // requiredChildDistributions are ClusteredDistribution on one key, so the
  // planner gives both sides the same HashPartitioning(numShufflePartitions)
  // (or co-partitioned bucketed scans). zipPartitions itself throws loudly
  // if the counts ever diverge, so a future Spark behavior change surfaces
  // as a hard error, never silent misalignment.
  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val carriedRefs: Seq[Expression] = carried.map { a =>
      val i = rOut.indexWhere(_.exprId == a.exprId)
      BoundReference(i, a.dataType, a.nullable)
    }
    val outTypes = output.map(a => (a.dataType, a.nullable))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tsType)
      // projections are generated code — build per partition, not on the driver
      val carriedProj = UnsafeProjection.create(carriedRefs.toArray)
      val resultProj = UnsafeProjection.create(outTypes.zipWithIndex.map {
        case ((dt, nullable), i) => BoundReference(i, dt, nullable): Expression
      }.toArray)
      val nullCarried = InternalRow.fromSeq(Seq.fill(carried.length)(null))
      val joined = new JoinedRow

      // SQL null semantics: a null key never equals anything and a null ts
      // never satisfies the range — right rows with either can never match
      // (dropped up front; NULLS FIRST ordering puts them at the head), and
      // left rows with either emit null carried values without touching
      // the merge state.
      val rFiltered = rIter.filter { r =>
        !r.isNullAt(rKeyIdx) && !r.isNullAt(rTsIdx)
      }

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rFiltered.hasNext) rFiltered.next() else null
        private var lastMatch: InternalRow = null // carried values of best right row
        private var lastMatchKey: Any = null
        private def rKey = rRow.get(rKeyIdx, keyType)
        private def rTs = rRow.get(rTsIdx, tsType)

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          if (lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTsIdx))
            return resultProj(joined(lRow, nullCarried))
          val lKey = lRow.get(lKeyIdx, keyType)
          val lTs = lRow.get(lTsIdx, tsType)
          // stale carry from a previous key group
          if (lastMatch != null && keyOrd.compare(lastMatchKey, lKey) != 0) {
            lastMatch = null; lastMatchKey = null
          }
          // advance the right side through everything at-or-before (lKey, lTs)
          var advancing = true
          while (advancing && rRow != null) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              rRow = if (rFiltered.hasNext) rFiltered.next() else null
            } else if (c == 0 && {
              val tc = tsOrd.compare(rTs, lTs); if (forward) tc >= 0 else tc <= 0
            }) {
              lastMatch = carriedProj(rRow).copy()
              // the key value may point into a reused row buffer (UTF8String
              // et al.) — copy it, or the stale-carry check silently breaks
              // at key-group boundaries once inputs spill
              lastMatchKey = InternalRow.copyValue(lKey)
              rRow = if (rFiltered.hasNext) rFiltered.next() else null
            } else advancing = false
          }
          val carriedVals = if (lastMatch != null) lastMatch else nullCarried
          resultProj(joined(lRow, carriedVals))
        }
      }
    }
  }
}

object AsOfJoinPlan {

  /** As-of join through the custom plan node: for each left row, the
    * latest right `valueCols` at-or-before its timestamp, per key —
    * emitted as `asof_<name>`, exactly the `Relational.asofJoin`
    * contract. `forward = true` flips to earliest-at-or-after
    * (`Relational.asofJoinForward`). */
  def asofJoinMerge(left: DataFrame, right: DataFrame, keyCol: String,
                    tsCol: String, valueCols: Seq[String],
                    forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val lPlan = left.queryExecution.analyzed
    // Both sides often derive from the same base relation (self-as-of):
    // an alias projection mints fresh exprIds for the whole right output,
    // so the analyzer's DeduplicateRelations never needs to rewrite the
    // right child underneath this node's stored attributes.
    import org.apache.spark.sql.functions.col
    val rPlan = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"$side side has no column '$name'"))
    val carried = valueCols.map(attr(rPlan, _, "right"))
    // Carried columns join the right child's requiredChildOrdering (the
    // deterministic tie-break), so they must be sort-orderable — validate
    // HERE with a clear message instead of letting planning fail later
    // with an opaque sort error on e.g. a MapType column.
    (("key", attr(lPlan, keyCol, "left").dataType) +:
      ("timestamp", attr(lPlan, tsCol, "left").dataType) +:
      carried.map(a => (s"carried column '${a.name}'", a.dataType))).foreach {
      case (what, dt) =>
        require(RowOrdering.isOrderable(dt),
          s"as-of join $what has non-orderable type ${dt.catalogString}; " +
            "carried columns participate in the tie-break sort — project " +
            "orderable columns (or re-attach unorderable ones by joining " +
            "back on an orderable row id)")
    }
    val carriedOut = carried.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoin(lPlan, rPlan,
      attr(lPlan, keyCol, "left"), attr(rPlan, keyCol, "right"),
      attr(lPlan, tsCol, "left"), attr(rPlan, tsCol, "right"),
      carried, carriedOut, forward)
    org.apache.spark.sql.graftshim.GraftDatasetBridge.ofRows(spark, node)
  }
}
