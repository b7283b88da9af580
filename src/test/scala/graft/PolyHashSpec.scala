package graft

import graft.functions.{Dialect, GraftFunctions, PolyHash, TextExprs => TX}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen PolyHash ≡ portable higher-order-function form. */
class PolyHashSpec extends SparkSpec {

  test("native graft_polyhash equals the portable fold on varied inputs") {
    implicit val d: Dialect = Dialect(spark = true)
    GraftFunctions.register(spark)
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "The quick brown fox 42!",
      "x" * 300, "spaced   out", "ünïcødé tæxt", "日本語テスト")
    val df = inputs.toDF("s").select(
      expr("graft_polyhash(s)").as("native"),
      expr(TX.polyHash("s")).as("portable"))
    val rows = df.collect()
    // ASCII inputs must agree exactly (oracle-critical); non-ASCII uses
    // code points natively (= DuckDB unicode()) which can diverge from
    // Spark's byte-based ascii() — assert ASCII equality only.
    inputs.zip(rows).foreach { case (in, r) =>
      if (in.forall(_ < 128))
        assert(r.getLong(0) === r.getLong(1), s"mismatch for '$in'")
      assert(r.getLong(0) >= 0 && r.getLong(0) < TX.P)
    }
  }

  test("null and empty hash to 0 (matches portable ELSE branch)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Some("x"), None, Some("")).toDF("s")
      .select(expr("graft_polyhash(s)").as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(1) === 0L && hs(2) === 0L && hs(0) != 0L)
  }

  test("direct evaluator matches DuckDB unicode semantics on code points") {
    // "ab" -> ((0*31+97)%P*31+98)%P = 97*31+98 = 3105
    assert(PolyHash.hash(UTF8String.fromString("ab")) === 3105L)
    assert(PolyHash.hash(UTF8String.fromString("")) === 0L)
  }

  test("whole-stage codegen keeps the expression inline (no fallback)") {
    GraftFunctions.register(spark)
    // a literal input constant-folds to LocalTableScan, so drive a real
    // file scan to observe the codegen'd projection
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(expr("graft_polyhash(text)").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks a WholeStageCodegen stage in the plan print;
    // a fallback (CodegenFallback / interpreted) projection would lack it
    assert(plan.linesIterator.exists(l => l.trim.startsWith("*(") && l.contains("graft_polyhash")), plan)
    assert(df.collect().forall(r => r.getLong(0) >= 0 && r.getLong(0) < TX.P))
  }
}
