package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector expressions for the similarity-search operators.
  *
  * The portable forms (TextExprs.dot / lshBucket) are higher-order-function
  * chains (sequence → transform → aggregate) that Catalyst evaluates
  * INTERPRETED — an index array plus a lambda frame per element, per row.
  * That made the all-pairs cosine stage (qx13) the single most expensive
  * query of round 1 (24 s of an 87 s suite). These expressions emit one
  * tight loop via codegen instead.
  *
  * Equivalence discipline (same as PolyHash): the DuckDB oracle SQL keeps
  * the portable fold form, so every hash-matched oracle run re-proves these
  * native implementations bit-identical — the loop is the same sequential
  * left-to-right double accumulation the fold specifies.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<float|double> arguments, got ($l, $r)")
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("graftDot")
    ev.copy(code =
      code"""
        ${l.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${l.isNull}) {
          ${r.code}
          if (!${r.isNull}) {
            java.lang.Double $boxed = graft.functions.DotProduct.dot(
              ${l.value}, ${r.value}, ${elemFloat(left)}, ${elemFloat(right)});
            if ($boxed != null) {
              ${ev.isNull} = false;
              ${ev.value} = $boxed.doubleValue();
            }
          }
        }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Sequential left-to-right sum of per-element double products — the
    * exact reduction order of TextExprs.dot's fold (IEEE doubles are
    * order-deterministic, so this is bit-identical to the oracle's
    * list_reduce). Null semantics mirror the fold: a null element (or a
    * right array shorter than the left — element_at past the end) poisons
    * the accumulator to null. Empty left array → 0.0 (the fold's init). */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() < n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Signed-random-projection LSH bucket id over `nPlanes` deterministic
  * hyperplanes — the codegen'd form of TextExprs.lshBucket. Each plane's
  * dot product is the same sequential double fold as the portable form;
  * plane components come from the same integer-mix formula.
  *
  * Null semantics mirror the portable SQL, which is NOT null-propagating:
  * `CASE WHEN planeDot >= 0 THEN bit ELSE 0 END` sends a null dot (null
  * vector or null element) to the ELSE branch, so every plane contributes
  * 0 and the bucket is 0. */
case class LshBucket(child: Expression, nPlanes: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if nPlanes >= 1 && nPlanes <= 62 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket plane count must be in [1, 62], got $nPlanes")
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bucket needs an array<float|double> argument, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucket.bucket(v.asInstanceOf[ArrayData], elemFloat, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code =
        code"""
          ${c.code}
          long ${ev.value} = 0L;
          if (!${c.isNull}) {
            ${ev.value} = graft.functions.LshBucket.bucket(${c.value}, $elemFloat, $nPlanes);
          }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
  override def prettyName: String = "graft_lsh_bucket"
}

/** Single-pass squared L2 norm: what `graft_dot(x, x)` computes, reading
  * the array ONCE (one null-check + one accessor per element instead of
  * two). Never written by hand — the optimizer rule [[RewriteSelfDot]]
  * rewrites self-dots into this form, the engine's demonstration of a
  * custom `Rule[LogicalPlan]` (SURVEY §7.3 ladder step (c)). Arithmetic
  * and null semantics are exactly DotProduct(x, x): same multiply order,
  * null on null input/element, 0.0 on empty. */
case class SelfNorm2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_self_norm2 needs an array<float|double> argument, got $t")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else SelfNorm2.norm2(v.asInstanceOf[ArrayData], elemFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val boxed = ctx.freshName("graftNorm2")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${c.isNull}) {
          java.lang.Double $boxed = graft.functions.SelfNorm2.norm2(${c.value}, $elemFloat);
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SelfNorm2 =
    copy(child = newChild)
  override def prettyName: String = "graft_self_norm2"
}

object SelfNorm2 {
  def norm2(a: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      i += 1
    }
    acc
  }
}

/** Optimizer rule: `graft_dot(x, x)` → `graft_self_norm2(x)` whenever the
  * two sides are semantically the same deterministic expression — halves
  * the per-element work of every norm computation (the second-hottest
  * vector op after the pairwise dot). Applied via GraftExtensions'
  * injectOptimizerRule AND via `experimental.extraOptimizations` in
  * GraftFunctions.register, so extension-less sessions get it too. The
  * oracle keeps computing norms portably, so every hash-matched run
  * re-proves the rewrite is semantics-preserving on real data. */
object RewriteSelfDot extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
  : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case DotProduct(a, b) if a.deterministic && a.semanticEquals(b) => SelfNorm2(a)
    }
}

object LshBucket {
  /** Plane component for plane `j`, 0-based dim `idx0` — identical
    * arithmetic to TextExprs.planeComponent (which is 1-based):
    * ((1 + (j*64 + i − 1)·MIX) mod P)/P − 0.5 computed in doubles. */
  def component(j: Int, idx0: Int): Double =
    ((1L + (j * 64L + idx0) * TextExprs.MIX) % TextExprs.P).toDouble / TextExprs.P - 0.5

  def bucket(vec: ArrayData, isFloat: Boolean, nPlanes: Int): Long = {
    val n = vec.numElements()
    var out = 0L
    var j = 0
    while (j < nPlanes) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        // a null element nulls every plane's dot → portable form yields 0
        if (vec.isNullAt(i)) return 0L
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += x * component(j, i)
        i += 1
      }
      if (acc >= 0) out |= 1L << j
      j += 1
    }
    out
  }
}
