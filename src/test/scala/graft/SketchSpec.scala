package graft

import org.apache.spark.sql.functions._

/** Approximate sketches (qx47): estimator outputs can't hash-match a
  * different engine, so the contract is ERROR BOUNDS against the exact
  * answers — which is also the honest 100 TB contract (HLL++/KLL exist
  * precisely because exact distinct/quantiles don't scale). The driver
  * gate mirrors this: qx47's oracle hash-matches per-source 0/1
  * within-envelope flags (each engine vs its own exacts), so a blown
  * bound is a red oracle row, not just a red spec. */
class SketchSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct stays within its configured 2% rsd (5% tolerance) per source") {
    val docs = Tables.t(spark, sfDir, "documents")
    val rows = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact"),
        approx_count_distinct(col("text"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1); val approx = r.getLong(2)
      assert(math.abs(approx - exact) <= math.max(1L, (exact * 0.05).toLong),
        s"source=${r.getString(0)} exact=$exact approx=$approx")
    }
  }

  test("percentile_approx at accuracy 10000 is exact on sub-10k groups") {
    val docs = Tables.t(spark, sfDir, "documents")
    val got = docs.groupBy("source")
      .agg(percentile_approx(col("n_chars"), lit(0.5), lit(10000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact discrete median (lower of the two middles — percentile_approx
    // returns an actual element, never an interpolation)
    val exact = docs.select("source", "n_chars").collect()
      .groupBy(_.getString(0)).map { case (s, rs) =>
        val v = rs.map(_.getLong(1)).sorted
        s -> v((v.length - 1) / 2)
      }
    got.foreach { case (s, p50) =>
      val vs = exact(s)
      assert(p50 == vs, s"source=$s approx_p50=$p50 exact=$vs")
    }
  }
}
