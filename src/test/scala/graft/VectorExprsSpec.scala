package graft

import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Native codegen graft_dot / graft_lsh_bucket ≡ portable fold forms —
  * bit-identical, since both are the same sequential double reduction. */
class VectorExprsSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"
  implicit val d: Dialect = Dialect(spark = true)

  private def emb = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
  }

  test("graft_dot equals the portable fold bit-for-bit on real embeddings") {
    val df = emb.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      expr(TX.norm2("embedding")).as("portable"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // exact bit equality, not approximate — same reduction order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot null semantics: null array → null, empty → 0.0") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
      .select(expr("graft_dot(a, b)").as("dot"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) === 0.0)
  }

  test("graft_lsh_bucket equals the portable sign-bit sum on real embeddings") {
    val df = emb.select(
      expr("graft_lsh_bucket(embedding, 8)").as("native"),
      expr(TX.lshBucket("embedding", 8)).cast("long").as("portable"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // buckets actually spread (not all rows in one bucket)
    assert(rows.map(_.getLong(0)).distinct.length > 1)
  }

  test("optimizer rule rewrites graft_dot(x, x) to single-pass graft_self_norm2") {
    val df = emb.select(expr("graft_dot(embedding, embedding)").as("n2"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_self_norm2"),
      s"RewriteSelfDot must fire on self-dots:\n$optimized")
    assert(!optimized.contains("graft_dot("), optimized)
    // genuinely distinct expressions must NOT be rewritten (note: two
    // aliases of the SAME column are semantically equal and DO rewrite)
    val two = emb.select(expr("graft_dot(embedding, reverse(embedding))").as("d"))
    assert(!two.queryExecution.optimizedPlan.toString.contains("graft_self_norm2"))
    // rewrite is bit-identical to the portable fold (norm2 = dot(x,x))
    val rows = emb.select(
      expr("graft_dot(embedding, embedding)").as("native"),
      expr(TX.norm2("embedding")).as("portable")).collect()
    rows.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("all vector expressions stay inside whole-stage codegen") {
    val df = emb.select(
      expr("graft_dot(embedding, reverse(embedding))").as("d"), // distinct → stays graft_dot
      expr("graft_dot(embedding, embedding)").as("n2"),         // self → rewritten to norm2
      expr("graft_lsh_bucket(embedding, 8)").as("b"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("graft_dot")), plan)
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("graft_self_norm2")), plan)
    assert(plan.linesIterator.exists(l =>
      l.trim.startsWith("*(") && l.contains("graft_lsh_bucket")), plan)
  }

  test("cappedLshBuckets re-splits only oversized buckets, deterministically") {
    val base = Similarity.lshBuckets(emb, "vec_id", "embedding", 4)
    val sizes = base.groupBy("bucket").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cap = sizes.values.max - 1 // force at least one bucket to split
    val out = Similarity.cappedLshBuckets(emb, "vec_id", "embedding",
      nPlanes = 4, maxBucketSize = cap, extraPlanes = 2)
    val rows = out.collect()
    // small buckets keep sub_bucket 0; oversized ones spread over [0, 4)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_in_bucket")
      val sub = r.getAs[Long]("sub_bucket")
      if (n <= cap) assert(sub === 0L)
      else assert(sub >= 0L && sub < 4L)
    }
    val hot = rows.filter(_.getAs[Long]("n_in_bucket") > cap)
    assert(hot.map(_.getAs[Long]("sub_bucket")).distinct.length > 1,
      "the oversized bucket should actually split across sub-buckets")
    // determinism: identical second run
    val again = Similarity.cappedLshBuckets(emb, "vec_id", "embedding",
      nPlanes = 4, maxBucketSize = cap, extraPlanes = 2).collect()
    assert(rows.map(_.toSeq).sortBy(_.toString) === again.map(_.toSeq).sortBy(_.toString))
  }

  test("kNN query-side cap fails fast instead of broadcasting an oversized set") {
    val e = intercept[IllegalArgumentException] {
      Similarity.requireSmallQuerySide(emb, "bruteForceKnn", cap = 2L)
    }
    assert(e.getMessage.contains("broadcasts the query side"))
    // under the cap: passes and the operator runs end-to-end
    val out = Similarity.bruteForceKnn(emb.filter(col("vec_id") < 3), emb,
      "vec_id", "embedding", 2).collect()
    assert(out.nonEmpty)
  }
}
