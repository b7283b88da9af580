package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst implementation of the engine's polynomial rolling hash
  * (TextExprs.polyHash): h = fold over code points, (h*31 + cp) mod 1000003.
  *
  * The portable form is a chain of higher-order functions
  * (sequence → transform(substr/ascii) → aggregate) that Catalyst evaluates
  * INTERPRETED — an index array + lambda frame per character. That is the
  * hot path of MinHash/SimHash/fingerprinting at corpus scale. This
  * expression emits one tight loop inside whole-stage codegen instead: no
  * allocations, no lambda dispatch.
  *
  * Semantics: identical arithmetic over code points (what DuckDB's
  * `unicode(substr(s,i,1))` yields); null and empty both hash to 0, exactly
  * like the portable form's ELSE branch. The driver's oracle gate *proves*
  * the equivalence continuously: Spark plans use this expression while the
  * DuckDB SQL keeps the portable list_reduce form — every hash-matched run
  * re-verifies them against each other on real data.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else PolyHash.hash(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = 0L;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.PolyHash.hash(${c.value});
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "graft_polyhash"
}

object PolyHash {
  val P = 1000003L

  /** Code-point fold — one step per character, full code point (matches
    * DuckDB `unicode` on every input; matches Spark `ascii` on ASCII). */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}

/** Session registration for the engine's native functions. Idempotent —
  * call before building plans that use `graft_polyhash(...)` /
  * `graft_dot(...)` / `graft_lsh_bucket(...)` in SQL text. */
object GraftFunctions {

  /** Several graft functions take an integer parameter that must be a
    * compile-time literal (it shapes the generated loop / the heap
    * bound): lsh plane counts, z-order bits, graft_topk's k. One shared
    * extractor; the caller names itself so the error blames the right
    * function. */
  private[functions] def intLiteral(e: Expression, fn: String,
                                    what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn $what must be an integer literal, got $other")
  }

  private[functions] def lshPlanes(e: Expression): Int =
    intLiteral(e, "graft_lsh_bucket", "plane count")

  // One registration per session: re-registering is harmless semantically
  // but each createOrReplaceTempFunction on an existing name logs a
  // SimpleFunctionRegistry WARN, and operators call register() defensively —
  // a bench run emits ~40 of them, drowning the stdout contract line.
  // Weak keys so dropped sessions don't pin memory.
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def register(spark: SparkSession): Unit = registered.synchronized {
    if (!registered.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_polyhash", exprs => PolyHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_lsh_bucket", exprs => LshBucket(exprs(0), lshPlanes(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_zorder", exprs => ZOrder(exprs(0), exprs(1), lshPlanes(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_minhash_doc", exprs => MinHashDoc(exprs(0),
        lshPlanes(exprs(1)), lshPlanes(exprs(2))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_shingle_hashes", exprs => ShingleHashes(exprs(0),
        lshPlanes(exprs(1))), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashDoc(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_token_count", exprs => TokenCount(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_tokens", exprs => Tokens(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_term_stats", exprs => TermStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_term_freqs", exprs => TermFreqs(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "graft_topk", exprs => TopKMin(exprs(0),
        intLiteral(exprs(1), "graft_topk", "k")), "built-in")
    // self-dot → single-pass norm rewrite for sessions built without
    // GraftExtensions (idempotent: overwrite, don't append)
    if (!spark.experimental.extraOptimizations.contains(RewriteSelfDot))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteSelfDot
    // custom whole-operator plans (AsOfJoin logical → merge exec)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }
}

/** SparkSessionExtensions entry point — lets deployments load the engine's
  * native functions without code:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), after which plain
  * `spark.sql("SELECT graft_polyhash(col) ...")` works in any session. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_bucket"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshBucket].getName, "graft_lsh_bucket"),
      (exprs: Seq[Expression]) => LshBucket(exprs(0), GraftFunctions.lshPlanes(exprs(1)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_zorder"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ZOrder].getName, "graft_zorder"),
      (exprs: Seq[Expression]) => ZOrder(exprs(0), exprs(1),
        GraftFunctions.lshPlanes(exprs(2)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_doc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[MinHashDoc].getName, "graft_minhash_doc"),
      (exprs: Seq[Expression]) => MinHashDoc(exprs(0),
        GraftFunctions.lshPlanes(exprs(1)), GraftFunctions.lshPlanes(exprs(2)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingle_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashes(exprs(0),
        GraftFunctions.lshPlanes(exprs(1)))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SimHashDoc].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => SimHashDoc(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_token_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TokenCount].getName, "graft_token_count"),
      (exprs: Seq[Expression]) => TokenCount(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_tokens"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Tokens].getName, "graft_tokens"),
      (exprs: Seq[Expression]) => Tokens(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_term_stats"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TermStats].getName, "graft_term_stats"),
      (exprs: Seq[Expression]) => TermStats(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_term_freqs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TermFreqs].getName, "graft_term_freqs"),
      (exprs: Seq[Expression]) => TermFreqs(exprs.head)))
    ext.injectOptimizerRule(_ => RewriteSelfDot)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
