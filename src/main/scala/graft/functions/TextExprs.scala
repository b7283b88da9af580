package graft.functions

/** Dialect-parametric SQL expression builders.
  *
  * The LLM-pipeline operators (MinHash, SimHash, fingerprints, cosine kNN)
  * need *bit-identical* results in Spark and in the DuckDB oracle. Floating
  * hash libraries differ per engine, so every hash here is plain integer
  * arithmetic (poly-rolling hash mod 1000003, Knuth multiplicative mix) and
  * every float reduction is a left-to-right sequential fold — both
  * expressible in Spark SQL and DuckDB SQL from one definition.
  */
final case class Dialect(spark: Boolean) {
  def seq(a: String, b: String): String =
    if (spark) s"sequence($a, $b)" else s"generate_series($a, $b)"
  def el(arr: String, i: String): String =
    if (spark) s"element_at($arr, $i)" else s"($arr)[$i]"
  def map(arr: String, v: String, body: String): String =
    if (spark) s"transform($arr, $v -> $body)" else s"list_transform($arr, $v -> $body)"
  def filt(arr: String, v: String, body: String): String =
    if (spark) s"filter($arr, $v -> $body)" else s"list_filter($arr, $v -> $body)"
  /** Sequential left fold — deterministic reduction order in both engines. */
  def fold(arr: String, init: String, a: String, x: String, body: String): String =
    if (spark) s"aggregate($arr, $init, ($a, $x) -> $body)"
    else s"list_reduce(list_prepend($init, $arr), ($a, $x) -> $body)"
  def amin(arr: String): String = if (spark) s"array_min($arr)" else s"list_min($arr)"
  def adistinct(arr: String): String =
    if (spark) s"array_distinct($arr)" else s"list_distinct($arr)"
  def aconcat(a: String, b: String): String =
    if (spark) s"concat($a, $b)" else s"list_concat($a, $b)"
  def size(arr: String): String = if (spark) s"size($arr)" else s"len($arr)"
  def splitSpace(s: String): String =
    if (spark) s"split($s, ' ')" else s"string_split($s, ' ')"
  def charCode(c: String): String = if (spark) s"ascii($c)" else s"unicode($c)"
  /** Replace ALL matches (DuckDB needs the 'g' flag; Spark is global). */
  def reAll(s: String, pat: String, rep: String): String =
    if (spark) s"regexp_replace($s, '$pat', '$rep')"
    else s"regexp_replace($s, '$pat', '$rep', 'g')"
  def idiv(a: String, b: String): String =
    if (spark) s"($a div $b)" else s"($a // $b)"
  def emptySlice(arr: String): String =
    if (spark) s"slice($arr, 1, 0)" else s"list_slice($arr, 1, 0)"
  def regexExtractAll(s: String, pat: String): String =
    if (spark) s"regexp_extract_all($s, '($pat)', 1)" else s"regexp_extract_all($s, '$pat')"
  def shr(a: String, n: Int): String =
    if (spark) s"shiftright($a, $n)" else s"($a >> $n)"
  /** Length-`len` slice starting at 1-based `start1` (an expression). */
  def slice(arr: String, start1: String, len: Int): String =
    if (spark) s"slice($arr, $start1, $len)"
    else s"list_slice($arr, $start1, ($start1) + ${len - 1})"
  /** Join a string array with the SQL-literal separator `sepSql`. */
  def ajoin(arr: String, sepSql: String): String =
    if (spark) s"array_join($arr, $sepSql)" else s"array_to_string($arr, $sepSql)"
}

object TextExprs {
  /** Hash modulus (prime) — keeps poly-hash values < 2^20 so every
    * intermediate product stays well inside int64. */
  val P = 1000003L
  /** Knuth multiplicative constant, widens the 20-bit poly hash to 32 bits. */
  val MIX = 2654435761L
  val MIX_MOD = 4294967296L // 2^32

  /** MinHash permutation coefficients h_k(x) = (a_k*x + b_k) mod P. */
  def aK(k: Int): Long = ((k + 1) * 8191L + 127L) % P
  def bK(k: Int): Long = ((k + 1) * 524287L + 911L) % P

  /** Canonical text normalization: lowercase, strip non-alnum to spaces,
    * collapse runs, trim. (Reference analog: label/ticker normalization
    * F8/C8, src/core/models.py:64-74 — generalized to document text.) */
  def norm(col: String)(implicit d: Dialect): String =
    s"trim(${d.reAll(d.reAll(s"lower($col)", "[^a-z0-9 ]", " "), " +", " ")})"

  /** Non-empty whitespace tokens of the normalized text. */
  def tokens(col: String)(implicit d: Dialect): String =
    d.filt(d.splitSpace(norm(col)), "w", "w <> ''")

  /** tokens, preferring the native codegen'd walk on the Spark side
    * (register GraftFunctions first); the duck dialect keeps the portable
    * regex/split/filter form — the oracle compare continuously proves the
    * native tokenizer equivalent (CurationPropertySpec hammers the edge
    * cases directly). */
  def tokensAuto(col: String)(implicit d: Dialect): String =
    if (d.spark) s"graft_tokens($col)" else tokens(col)

  /** `size(tokens(col))` as BIGINT — preferring the native codegen'd walk
    * on the Spark side (register GraftFunctions first); the duck dialect
    * keeps the portable regex/split/filter form, so the oracle compare
    * continuously proves the native tokenizer equivalent. Null text is
    * null in both (size(null) / len(NULL)). */
  def tokenCountAuto(col: String)(implicit d: Dialect): String =
    if (d.spark) s"graft_token_count($col)"
    else s"CAST(${d.size(tokens(col))} AS BIGINT)"

  /** Polynomial rolling hash of a string expression, in [0, P). Guarded for
    * empty input (Spark's sequence(1,0) would step backwards). */
  def polyHash(e: String)(implicit d: Dialect): String = {
    val codes = d.map(d.seq("1", s"length($e)"), "i",
      s"CAST(${d.charCode(s"substr($e, i, 1)")} AS BIGINT)")
    s"(CASE WHEN length($e) > 0 THEN ${d.fold(codes, "CAST(0 AS BIGINT)", "acc", "c", s"(acc*31 + c) % $P")} ELSE CAST(0 AS BIGINT) END)"
  }

  /** polyHash, preferring the native codegen'd expression on the Spark
    * side (register GraftFunctions first); the duck dialect keeps the
    * portable fold — the oracle compare then continuously proves the
    * native implementation equivalent. */
  def polyHashAuto(e: String)(implicit d: Dialect): String =
    if (d.spark) s"graft_polyhash($e)" else polyHash(e)

  /** 32-bit widening of the poly hash. */
  def mix32(e: String): String = s"(($e * $MIX) % $MIX_MOD)"

  /** Count-min bucket of a term for sketch row `row`: the MinHash
    * permutation family applied to the widened poly hash, reduced mod the
    * sketch width. Pure int64 arithmetic (max product ~4.3e15), identical
    * in both engines. */
  def cmBucket(term: String, row: Int, width: Int)(implicit d: Dialect): String =
    s"(((${aK(row)} * ${mix32(polyHashAuto(term))} + ${bK(row)}) % $P) % $width)"

  /** Word n-gram shingle strings over a tokens-array expression. */
  def shingles(toks: String, n: Int)(implicit d: Dialect): String = {
    val parts = (0 until n).map(j => d.el(toks, if (j == 0) "i" else s"i+$j"))
    val joined = parts.mkString("concat(", ", ' ', ", ")")
    s"(CASE WHEN ${d.size(toks)} >= $n THEN ${d.map(d.seq("1", s"${d.size(toks)}-${n - 1}"), "i", joined)} ELSE ${d.emptySlice(toks)} END)"
  }

  /** Distinct shingle hash set (the MinHash input set). */
  def shingleHashes(col: String, n: Int)(implicit d: Dialect): String =
    d.adistinct(d.map(shingles(tokens(col), n), "s", polyHash("s")))

  /** k-th MinHash value over a hash-set expression. */
  def minhashK(hashes: String, k: Int)(implicit d: Dialect): String =
    d.amin(d.map(hashes, "h", s"((${aK(k)}*h + ${bK(k)}) % $P)"))

  /** Sequential double dot-product of two equal-length float vectors,
    * each element cast to double BEFORE multiplying (float*float would
    * round differently than DuckDB's promotion). */
  def dot(a: String, b: String)(implicit d: Dialect): String =
    d.fold(
      d.map(d.seq("1", d.size(a)), "i",
        s"CAST(${d.el(a, "i")} AS DOUBLE) * CAST(${d.el(b, "i")} AS DOUBLE)"),
      "CAST(0 AS DOUBLE)", "acc", "x", "acc + x")

  /** Squared L2 norm (sequential). */
  def norm2(a: String)(implicit d: Dialect): String = dot(a, a)

  /** dot, preferring the native codegen'd graft_dot on the Spark side
    * (register GraftFunctions first); the duck dialect keeps the portable
    * fold, so the oracle compare continuously proves equivalence. */
  def dotAuto(a: String, b: String)(implicit d: Dialect): String =
    if (d.spark) s"graft_dot($a, $b)" else dot(a, b)

  def norm2Auto(a: String)(implicit d: Dialect): String =
    if (d.spark) s"graft_dot($a, $a)" else norm2(a)

  /** Portable z-order (Morton) interleave of the low `bits` bits of two
    * bigint expressions — literal-unrolled, so it's plain shifts/masks in
    * both engines (inputs taken modulo 2^bits, matching the native
    * expression's semantics; nulls must be handled by the caller). */
  def zorder(x: String, y: String, bits: Int)(implicit d: Dialect): String = {
    require(bits >= 1 && bits <= 31, s"zorder bits=$bits out of [1,31]")
    val mask = (1L << bits) - 1L
    val terms = (0 until bits).flatMap { j =>
      Seq(s"((${d.shr(s"($x & $mask)", j)} & 1) * ${1L << (2 * j)})",
        s"((${d.shr(s"($y & $mask)", j)} & 1) * ${1L << (2 * j + 1)})")
    }
    s"(CAST(${terms.mkString(" + ")} AS BIGINT))"
  }

  /** zorder, preferring the native codegen'd graft_zorder on the Spark
    * side (register GraftFunctions first); the duck dialect keeps the
    * unrolled portable form — the oracle compare then continuously proves
    * the native implementation equivalent. */
  def zorderAuto(x: String, y: String, bits: Int)(implicit d: Dialect): String =
    if (d.spark) s"graft_zorder($x, $y, $bits)" else zorder(x, y, bits)

  /** Per-vector int8 quantization scale: max|v| / 127 (1.0 for all-zero
    * vectors, so codes are well-defined everywhere). */
  def quantScale(vec: String)(implicit d: Dialect): String = {
    val absmax = d.fold(
      d.map(d.seq("1", d.size(vec)), "i",
        s"abs(CAST(${d.el(vec, "i")} AS DOUBLE))"),
      "CAST(0 AS DOUBLE)", "acc", "x", "greatest(acc, x)")
    s"(CASE WHEN $absmax > 0 THEN $absmax / 127.0 ELSE CAST(1.0 AS DOUBLE) END)"
  }

  /** Int8 codes (as BIGINTs; storage casts to tinyint): floor(v/s + 0.5)
    * — floor-plus-half instead of round() because the two engines agree
    * on floor bit-for-bit while round()'s negative-halfway behavior is
    * implementation-defined. Codes land in [-127, 127] by construction
    * (|v| ≤ 127·s). */
  def quantCodes(vec: String, scale: String)(implicit d: Dialect): String =
    d.map(d.seq("1", d.size(vec)), "i",
      s"CAST(floor(CAST(${d.el(vec, "i")} AS DOUBLE) / $scale + 0.5) AS BIGINT)")

  /** Max per-dimension reconstruction error |v_i − q_i·s| of a quantized
    * vector — the bound the round-trip contract is stated in. */
  def quantMaxErr(vec: String, codes: String, scale: String)
                 (implicit d: Dialect): String =
    d.fold(
      d.map(d.seq("1", d.size(vec)), "i",
        s"abs(CAST(${d.el(vec, "i")} AS DOUBLE) - CAST(${d.el(codes, "i")} AS DOUBLE) * $scale)"),
      "CAST(0 AS DOUBLE)", "acc", "x", "greatest(acc, x)")

  /** Deterministic pseudo-random hyperplane component for plane j, dim
    * index i (1-based): integer mix → uniform-ish double in [-0.5, 0.5). */
  def planeComponent(j: Int, iExpr: String): String =
    s"(CAST((1 + ($j*64 + $iExpr - 1) * $MIX) % $P AS DOUBLE)/$P.0 - 0.5)"

  /** Signed-random-projection dot for plane j over a 64-dim vector. */
  def planeDot(vec: String, j: Int)(implicit d: Dialect): String =
    d.fold(
      d.map(d.seq("1", d.size(vec)), "i",
        s"CAST(${d.el(vec, "i")} AS DOUBLE) * ${planeComponent(j, "i")}"),
      "CAST(0 AS DOUBLE)", "acc", "x", "acc + x")

  /** LSH bucket id from `nPlanes` sign bits. */
  def lshBucket(vec: String, nPlanes: Int)(implicit d: Dialect): String =
    (0 until nPlanes)
      .map(j => s"(CASE WHEN ${planeDot(vec, j)} >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** lshBucket, preferring the native codegen'd expression on Spark. */
  def lshBucketAuto(vec: String, nPlanes: Int)(implicit d: Dialect): String =
    if (d.spark) s"graft_lsh_bucket($vec, $nPlanes)" else lshBucket(vec, nPlanes)
}
