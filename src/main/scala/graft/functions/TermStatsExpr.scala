package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term statistics in ONE pass, no shuffle.
  *
  * The BM25 census (`(doc_id, term) → tf [, positions]`) is doc-local:
  * every row of a document's census derives from that document's text
  * alone. The explode → groupBy(doc_id, term) formulation forgets this
  * and pays a full exchange of the exploded token stream (plus, for
  * positions, an ObjectHashAggregate collect_list that falls back to
  * sort-based aggregation on any real key count). These expressions
  * compute the same census inside the scan projection —
  * `explode(graft_term_stats(text))` — so index BUILDS, APPENDS and
  * STREAM BATCHES census with ZERO exchanges before the bucket-placement
  * repartition. At 100 TB this removes the largest write-side shuffle of
  * the lexical store's lifecycle: the exchange that carried one row per
  * token occurrence.
  *
  * Tokenization is bit-identical to [[MinHashDoc.tokens]] (the
  * `graft_tokens` walk): lowercase, [a-z0-9] runs, everything else a
  * separator. Positions are 1-based token ordinals, ascending by
  * construction (no sort needed). Terms emit in first-occurrence order —
  * census row order is immaterial downstream. The result is a STRUCT
  * `(dl, terms)`: dl (the doc's total token count, ≡ `graft_token_count`)
  * rides along so one tokenizer pass yields the entire census — no
  * second counting walk and no CodegenFallback `aggregate` lambda in the
  * scan projection. Null/empty text → `(0, [])` (exploding `.terms` then
  * yields no rows, exactly like exploding a null tokens array). Per-row
  * state is bounded by the document's own size.
  *
  * Reference analog: the tf/positions census a Lucene-shaped indexer
  * derives per document before any distribution — re-expressed as a
  * codegen'd Catalyst expression instead of an aggregation.
  */
object TermStatsDoc {

  /** Shared walk: term → ascending 1-based positions, first-occurrence
    * order preserved (LinkedHashMap). */
  private def walk(s: UTF8String): java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]] = {
    val str = s.toLowerCase.toString
    val acc = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]]
    val sb = new java.lang.StringBuilder(16)
    var ord = 0
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (alnum) sb.appendCodePoint(cp)
      else if (sb.length > 0) {
        ord += 1
        val t = sb.toString
        var buf = acc.get(t)
        if (buf == null) {
          buf = new scala.collection.mutable.ArrayBuffer[Int](4); acc.put(t, buf)
        }
        buf += ord
        sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) {
      ord += 1
      val t = sb.toString
      var buf = acc.get(t)
      if (buf == null) {
        buf = new scala.collection.mutable.ArrayBuffer[Int](4); acc.put(t, buf)
      }
      buf += ord
    }
    acc
  }

  /** struct<dl, terms: array<struct<term, tf, pos>>> of one document.
    * dl (the document's total token count) rides along so the census
    * projection needs exactly ONE pass over the text — no second
    * `graft_token_count` walk, no CodegenFallback `aggregate` lambda. */
  def termStats(s: UTF8String): GenericInternalRow = {
    val acc = walk(s)
    val out = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var dl = 0L
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val pos = e.getValue
      dl += pos.length
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), pos.length.toLong,
        new GenericArrayData(pos.toArray)))
      j += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(out)))
  }

  /** struct<dl, terms: array<struct<term, tf>>> of one document (no
    * position arrays allocated into the output — the one-shot scoring
    * census). */
  def termFreqs(s: UTF8String): GenericInternalRow = {
    val acc = walk(s)
    val out = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var dl = 0L
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val tf = e.getValue.length.toLong
      dl += tf
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), tf))
      j += 1
    }
    new GenericInternalRow(Array[Any](dl, new GenericArrayData(out)))
  }

  val statsType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false),
      StructField("pos", ArrayType(IntegerType, containsNull = false),
        nullable = false))), containsNull = false), nullable = false)))

  val freqsType: DataType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("terms", ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  /** struct<dl=0, terms=[]> — the null/empty-text census. */
  def emptyStats(): GenericInternalRow =
    new GenericInternalRow(Array[Any](0L,
      new GenericArrayData(Array.empty[Any])))
}

/** `graft_term_stats(text)` — see [[TermStatsDoc]]. */
case class TermStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermStatsDoc.statsType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_term_stats needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TermStatsDoc.emptyStats()
    else TermStatsDoc.termStats(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          ${c.isNull} ? graft.functions.TermStatsDoc.emptyStats()
            : graft.functions.TermStatsDoc.termStats(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TermStats =
    copy(child = newChild)
  override def prettyName: String = "graft_term_stats"
}

/** `graft_term_freqs(text)` — see [[TermStatsDoc]]. */
case class TermFreqs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TermStatsDoc.freqsType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_term_freqs needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TermStatsDoc.emptyStats()
    else TermStatsDoc.termFreqs(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          ${c.isNull} ? graft.functions.TermStatsDoc.emptyStats()
            : graft.functions.TermStatsDoc.termFreqs(${c.value});""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
  override def prettyName: String = "graft_term_freqs"
}
