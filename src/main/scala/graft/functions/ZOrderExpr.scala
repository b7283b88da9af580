package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst z-order (Morton) interleave of two long columns' low
  * `bits` bits — the multi-dimensional file-layout key.
  *
  * Why it exists: parquet row-group/file skipping works off per-column
  * min/max stats, which a single-column sort only makes selective for
  * THAT column. Sorting by the z-curve key makes min/max ranges narrow in
  * BOTH dimensions simultaneously (each file covers a small square of the
  * key space instead of a full-width stripe), so scans filtered on either
  * or both columns skip most files — the layout trick behind Delta/
  * Iceberg OPTIMIZE ZORDER, as an engine primitive.
  *
  * Inputs are taken modulo 2^bits (bitwise mask) so arbitrary longs are
  * safe; nulls map to 0, like the engine's other hash expressions. The
  * portable form (TextExprs.zorder — a literal-unrolled sum of masked
  * shifted bits) stays on the oracle side, continuously re-proving this
  * codegen'd loop equivalent. */
case class ZOrder(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder needs (bigint, bigint), got ${left.dataType} for x")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder needs (bigint, bigint), got ${right.dataType} for y")
    else if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(s"graft_zorder bits=$bits out of [1,31]")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val x = left.eval(input)
    val y = right.eval(input)
    ZOrder.interleave(
      if (x == null) 0L else x.asInstanceOf[Long],
      if (y == null) 0L else y.asInstanceOf[Long], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(
      code = code"""
        ${l.code}
        ${r.code}
        long ${ev.value} = graft.functions.ZOrder.interleave(
          ${l.isNull} ? 0L : ${l.value}, ${r.isNull} ? 0L : ${r.value}, $bits);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_zorder"
}

object ZOrder {
  /** Bit interleave: x fills even bit positions, y odd. */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1L
    val xm = x & mask
    val ym = y & mask
    var z = 0L
    var j = 0
    while (j < bits) {
      z |= ((xm >> j) & 1L) << (2 * j)
      z |= ((ym >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }
}
