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

/** Native Catalyst implementation of the whole MinHash per-document front
  * end: normalized tokenization → per-token poly hash → word-shingle
  * rolling hashes → k permutation MINIMA plus the DISTINCT shingle-hash
  * set, all in ONE pass over the raw text.
  *
  * The composed form (TextExprs.tokens → posexplode → window lead →
  * k-column grouped MIN + collect_set) is correct and doc-keyed, but it
  * pays an explode (m rows per doc through a shuffle), a per-partition
  * sort for the window, and a wide aggregate — for what is per-row
  * arithmetic. This expression runs the identical arithmetic as a pure
  * scan projection: the hottest front end of every dedup/near-dup/
  * banding query (qx02/03/14/29/34/35/40/51/59) stops shuffling entirely
  * until the band join.
  *
  * Semantics are bit-identical to the portable form and continuously
  * re-proven by the oracle gate (the DuckDB SQL keeps the
  * sequence/transform/aggregate shape) and by MinHashSpec (this ≡ the
  * exploded pipeline ≡ the typed Aggregator, row for row):
  *
  *  - tokenize: lowercase (UTF8String.toLowerCase, what Spark's lower()
  *    uses), then every code point outside [a-z0-9] separates tokens —
  *    exactly `split(regexp_replace(lower(s),'[^a-z0-9 ]',' '),' ')`
  *    with empties filtered;
  *  - token hash: (h*31 + codepoint) mod P per char (PolyHash.hash);
  *  - shingle hash: acc = h_i, then acc = (acc*8191 + h_{i+j}) mod P for
  *    j in 1..n-1 (the window-lead fold);
  *  - sig[t] = MIN over shingles of (aK(t)*sh + bK(t)) mod P — MIN over
  *    the multiset equals MIN over the set, so no dedup precedes it;
  *  - sh = distinct shingle hashes in first-occurrence order (consumers
  *    treat it as a set).
  *
  * Documents with fewer than `shingleN` tokens (or null text) evaluate to
  * NULL — they have no signature, matching the exploded form where such
  * docs simply have no rows. Callers filter nulls.
  */
case class MinHashDoc(child: Expression, k: Int, shingleN: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 1024, s"graft_minhash_doc: k=$k out of [1,1024]")
  require(shingleN >= 1 && shingleN <= 64,
    s"graft_minhash_doc: shingleN=$shingleN out of [1,64]")

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_doc needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashDoc.compute(v.asInstanceOf[UTF8String], k, shingleN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        InternalRow ${ev.value} = null;
        boolean ${ev.isNull} = true;
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MinHashDoc.compute(${c.value}, $k, $shingleN);
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashDoc =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_doc"
}

object MinHashDoc {
  private val P = TextExprs.P

  /** Normalized-token poly hashes of one document, in order, multiplicity
    * kept — the shared procedural tokenizer of the native text front end
    * (graft_minhash_doc / graft_shingle_hashes / graft_simhash). Exactly
    * `transform(tokens(s), w -> polyHash(w))` of the portable form. */
  def tokenHashes(s: UTF8String): Array[Long] = {
    val str = s.toLowerCase.toString
    var hs = new Array[Long](16)
    var m = 0
    var th = 0L
    var inTok = false
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (alnum) {
        th = (th * 31L + cp) % P
        inTok = true
      } else if (inTok) {
        if (m == hs.length) hs = java.util.Arrays.copyOf(hs, m * 2)
        hs(m) = th; m += 1
        th = 0L; inTok = false
      }
      i += Character.charCount(cp)
    }
    if (inTok) {
      if (m == hs.length) hs = java.util.Arrays.copyOf(hs, m + 1)
      hs(m) = th; m += 1
    }
    java.util.Arrays.copyOf(hs, m)
  }

  /** Whole front end for one document; null when it yields no shingles.
    * Called from generated code — keep the signature Java-friendly. */
  def compute(s: UTF8String, k: Int, n: Int): InternalRow = {
    val hs = tokenHashes(s)
    val m = hs.length
    if (m < n) return null
    // --- pass 2: shingle rolling hashes → k minima + distinct set ---
    val nsh = m - n + 1
    val a = new Array[Long](k)
    val b = new Array[Long](k)
    var t = 0
    while (t < k) { a(t) = TextExprs.aK(t); b(t) = TextExprs.bK(t); t += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[java.lang.Long](nsh * 2)
    val distinct = new Array[Long](nsh)
    var nd = 0
    var s0 = 0
    while (s0 < nsh) {
      var acc = hs(s0)
      var j = 1
      while (j < n) { acc = (acc * 8191L + hs(s0 + j)) % P; j += 1 }
      if (seen.add(acc)) { distinct(nd) = acc; nd += 1 }
      t = 0
      while (t < k) {
        val v = (a(t) * acc + b(t)) % P
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      s0 += 1
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(mins),
      new GenericArrayData(java.util.Arrays.copyOf(distinct, nd))))
  }

  /** Normalized tokens as strings (lowered, [a-z0-9] runs) — the walk of
    * [[tokenHashes]] materializing the tokens instead of their hashes. */
  def tokens(s: UTF8String): GenericArrayData = {
    val str = s.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](16)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (alnum) sb.appendCodePoint(cp)
      else if (sb.length > 0) {
        out += UTF8String.fromString(sb.toString); sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray[Any])
  }

  /** Normalized token count without materializing anything — the walk of
    * [[tokenHashes]] minus the hashes. */
  def tokenCount(s: UTF8String): Long = {
    val str = s.toLowerCase.toString
    var m = 0L
    var inTok = false
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
      if (alnum) inTok = true
      else if (inTok) { m += 1; inTok = false }
      i += Character.charCount(cp)
    }
    if (inTok) m += 1
    m
  }

  /** All word-shingle rolling hashes of one document, in order,
    * multiplicity kept; empty when the doc has fewer than n tokens. */
  def shingleHashes(s: UTF8String, n: Int): GenericArrayData = {
    val hs = tokenHashes(s)
    val m = hs.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i < out.length) {
      var acc = hs(i)
      var j = 1
      while (j < n) { acc = (acc * 8191L + hs(i + j)) % P; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash fingerprint of one document (sign-sum over the
    * 32-bit-mixed token hashes, multiset semantics); null when the doc
    * has no tokens — such docs have no fingerprint, matching the
    * exploded form where they simply contribute no rows. */
  def simhash(s: UTF8String): java.lang.Long = {
    val hs = tokenHashes(s)
    if (hs.length == 0) return null
    val sums = new Array[Int](32)
    var i = 0
    while (i < hs.length) {
      val h2 = (hs(i) * TextExprs.MIX) % TextExprs.MIX_MOD
      var j = 0
      while (j < 32) {
        if (((h2 >> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { if (sums(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }
}

/** Native array of all word-shingle rolling hashes (order + multiplicity
  * preserved) — `explode(graft_shingle_hashes(text, n))` replaces the
  * posexplode → window-lead pipeline for every shingle-stream consumer
  * (contamination, repetition signals, span census). Empty array (no
  * rows after explode) for short/null docs, exactly like the windowed
  * form's null-filter. */
case class ShingleHashes(child: Expression, shingleN: Int)
  extends UnaryExpression {

  require(shingleN >= 1 && shingleN <= 64,
    s"graft_shingle_hashes: shingleN=$shingleN out of [1,64]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.emptyLongArray)
    else MinHashDoc.shingleHashes(v.asInstanceOf[UTF8String], shingleN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val emptyArr = "new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0])"
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $emptyArr
            : graft.functions.MinHashDoc.shingleHashes(${c.value}, $shingleN);""",
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** Native normalized tokens array — `tokens(text)` (lower → strip →
  * split → filter empties) as one codegen'd walk instead of a regex
  * pass, a split, and an interpreted filter lambda. Null propagates
  * (split(null) is null in the portable form too). */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokens needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashDoc.tokens(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        boolean ${ev.isNull} = ${c.isNull};
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MinHashDoc.tokens(${c.value});
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
  override def prettyName: String = "graft_tokens"
}

/** Native normalized-token count — `size(tokens(text))` as one codegen'd
  * walk with no split/filter/array allocation. Null propagates (the
  * portable form's `size(null)` is null too). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_token_count needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashDoc.tokenCount(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        boolean ${ev.isNull} = ${c.isNull};
        if (!${c.isNull}) {
          ${ev.value} = graft.functions.MinHashDoc.tokenCount(${c.value});
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
  override def prettyName: String = "graft_token_count"
}

/** Native 32-bit SimHash fingerprint — one pass per document instead of
  * the token explode + 32 CASE-sum aggregation. Null for token-less docs
  * (they have no fingerprint; callers filter). */
case class SimHashDoc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs a string argument, got ${child.dataType}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashDoc.simhash(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = 0L;
        boolean ${ev.isNull} = true;
        if (!${c.isNull}) {
          java.lang.Long fp = graft.functions.MinHashDoc.simhash(${c.value});
          if (fp != null) { ${ev.value} = fp.longValue(); ${ev.isNull} = false; }
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashDoc =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}
