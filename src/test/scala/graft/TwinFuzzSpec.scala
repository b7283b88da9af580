package graft

import graft.operators.{Quantize, Retrieval}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Round-13 property fuzz over the round-12 driver twins: the serving
  * fast paths re-implement tokenize / bucket / probe / tie ordering on
  * the driver for LocalRelation query frames, and ServingParitySpec pins
  * fixed cases — this suite drives RANDOMIZED case volume (seeded, so
  * failures replay) through the same public entry points, local frame vs
  * distributed frame, asserting canonical equality:
  *
  *  - queryTerms: unicode across scripts including beyond-BMP code
  *    points (surrogate pairs), combining marks, RTL, lone surrogates,
  *    nulls, empties, punctuation-only, duplicate-heavy, over-cap texts;
  *  - stored vector search: tie-heavy cosine sets (duplicate centroid
  *    vectors in the fixture), zero vectors, NaN- and ±Inf-poisoned
  *    vectors (the probe twin must mirror Spark's NaN-greatest
  *    comparison semantics), exact-centroid queries, null vectors;
  *  - empty query frames on both paths.
  *
  * Case count exceeds 1000 comparisons per run (600 strings × 3 caps +
  * 240 vectors × 3 probe depths + edge frames). */
class TwinFuzzSpec extends SparkSpec {

  private def bothFrames(rows: Seq[Row], schema: StructType): (DataFrame, DataFrame) = {
    val list = new java.util.ArrayList[Row](); rows.foreach(list.add)
    val local = spark.createDataFrame(list, schema)
    val dist = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    assert(local.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    (local, dist)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private val qSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))
  private val vSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true)))

  test("queryTerms twin ≡ distributed over 600 fuzzed unicode texts × 3 caps") {
    val rnd = new scala.util.Random(20260816L)
    // word alphabets as CODE POINT pools (surrogate-safe sampling) — every
    // script class the tokenizer could treat differently
    val pools: Seq[Seq[Int]] = Seq(
      "abcdefgh", "ABCDEFGH", "äöüßéàç", "日本語中文漢字", "кирилица",
      "עבריתערبي", "0123456789", "!@#$%^&*()[]{}", "----____....",
      "ȩ́́̈", // combining marks
      new String(Character.toChars(0x1F680)) + // beyond-BMP: emoji,
        new String(Character.toChars(0x1F525)) + // math alphanumerics,
        new String(Character.toChars(0x1D518)) + // CJK ext B
        new String(Character.toChars(0x20000))
    ).map(s => s.codePoints().toArray.toSeq)
    def word(): String = {
      val pool = pools(rnd.nextInt(pools.length))
      val sb = new java.lang.StringBuilder
      (0 to rnd.nextInt(6)).foreach(_ =>
        sb.appendCodePoint(pool(rnd.nextInt(pool.length))))
      sb.toString
    }
    def text(): String =
      (0 until rnd.nextInt(40)).map(_ => word())
        .mkString(Seq(" ", "  ", "\t", " \n ")(rnd.nextInt(4)))
    val fixed = Seq[String](null, "", "   ", "\uD83D", "\uDE00tail",
      "a\uD800b", "dup dup DUP dup", (1 to 64).map(i => s"t$i").mkString(" "))
    val rows = (fixed ++ (fixed.length until 600).map(_ => text()))
      .zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
    val (local, dist) = bothFrames(rows, qSchema)
    for (cap <- Seq(1, 6, Int.MaxValue)) {
      val a = canon(Retrieval.queryTerms(local, "text", "doc_id", cap))
      val b = canon(Retrieval.queryTerms(dist, "text", "doc_id", cap))
      assert(a == b, s"cap=$cap: twin diverged from distributed " +
        s"(first diff: ${a.zipAll(b, "<none>", "<none>")
          .find(p => p._1 != p._2)})")
    }
    // the fast path engaged (otherwise this fuzz tests nothing)
    assert(Retrieval.queryTerms(local, "text", "doc_id", 6)
      .queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
  }

  test("stored vector search twin ≡ distributed over 240 fuzzed vectors × 3 probe depths (ties, zeros, NaN, ±Inf)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1302L)
    def v(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 31 + j * 7) % 13) - 6).toFloat)
    val corpus = (1L to 40L).map(i => (i, v(i.toInt))).toDF("doc_id", "embedding")
    // duplicate centroid vectors: exact cosine ties on every query — the
    // tie ordering is the twin's hardest obligation
    val cents = Seq((0L, v(100)), (1L, v(100)), (2L, v(5)), (3L, v(9)),
      (4L, v(5))).toDF("centroid_id", "cen_emb")
    val codebook = Seq((0L, v(21)), (1L, v(22)), (2L, v(23)), (3L, v(24)))
      .toDF("code_id", "cb_emb")
    val store = java.nio.file.Files.createTempDirectory("twin-fuzz-vec-")
      .toString + "/vec"
    Quantize.buildSelfContained(spark, corpus, "doc_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      dims = 8, nBlocks = 2, residual = false, store, storeVectors = true)
    // finite fuzz stays inside the ADC's decimal-exact domain
    // (Decimal(30,12) distances — the operator's documented numeric
    // contract for embedding-scale floats); poison rounds (NaN/±Inf) are
    // compared by OUTCOME equality since the ANSI decimal cast refuses
    // non-finite distances on BOTH paths identically.
    def fuzzVec(poison: Boolean): Seq[Float] =
      rnd.nextInt(if (poison) 8 else 6) match {
        case 0 => Seq.fill(8)(0.0f) // zero norm
        case 1 => v(100) // exact centroid tie pair
        case 2 => v(5) // the other duplicated centroid
        case 3 => (0 until 8).map(_ => (rnd.nextFloat() - 0.5f) * 1e3f)
        case 4 => (0 until 8).map(_ => (rnd.nextFloat() - 0.5f) * 1e-30f)
        case 5 => (0 until 8).map(_ => rnd.nextFloat() * 4 - 2)
        case 6 => // NaN poison at a random position
          val base = (0 until 8).map(_ => rnd.nextFloat() * 4 - 2)
          base.updated(rnd.nextInt(8), Float.NaN)
        case _ => // ±Inf poison
          val base = (0 until 8).map(_ => rnd.nextFloat() * 4 - 2)
          base.updated(rnd.nextInt(8),
            if (rnd.nextBoolean()) Float.PositiveInfinity
            else Float.NegativeInfinity)
      }
    def outcome(df: DataFrame, np: Int): Either[String, Seq[String]] =
      try Right(canon(Quantize.searchSelfContainedRefinedStored(spark, store,
        df, "doc_id", "embedding", k = 4, nProbe = np, rerankDepth = 16)))
      catch { case e: Throwable => Left(e.getClass.getName) }
    // rounds 0-3: finite fuzz, exact result equality required;
    // rounds 4-5: poison rounds, outcome equality (result or SAME error)
    for (round <- 0 until 6) {
      val poison = round >= 4
      val rows = (0 until 40).map { i =>
        if (i == 17) Row(round * 100L + i, null)
        else Row(round * 100L + i, fuzzVec(poison))
      }
      val (local, dist) = bothFrames(rows, vSchema)
      for (np <- Seq(1, 2, 5)) {
        val a = outcome(local, np)
        val b = outcome(dist, np)
        assert(a == b, s"round=$round nProbe=$np poison=$poison: probe " +
          s"twin diverged")
        if (!poison) assert(a.isRight && a.toOption.get.nonEmpty,
          s"round=$round: finite fuzz must produce results")
      }
    }
  }

  test("empty and all-null query frames: twin and distributed both serve empty") {
    import spark.implicits._
    val corpus = (1L to 10L).map(i => (i, s"alpha doc$i common"))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("twin-fuzz-lex-")
      .toString + "/lex"
    Retrieval.writeBm25Store(corpus, "text", "doc_id", store, 4)
    for (rows <- Seq(Seq.empty[Row], Seq(Row(1L, null)), Seq(Row(1L, ""),
        Row(2L, "   ")))) {
      val (local, dist) = bothFrames(rows, qSchema)
      val a = canon(Retrieval.bm25TopKFromStore(spark, store, local,
        "text", "doc_id", 5))
      val b = canon(Retrieval.bm25TopKFromStore(spark, store, dist,
        "text", "doc_id", 5))
      assert(a == b)
      assert(a.isEmpty, s"rows=$rows must serve no hits")
    }
  }
}
