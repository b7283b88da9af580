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

  // ---- Count-min sketch (qx102) — exact int64, so properties are hard --

  private def cmDocs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("countMin: estimates never undercount, even under a collision-heavy geometry") {
    // width 4 with 40 distinct terms forces collisions in every row
    val docs = cmDocs((1L to 20L).map(i => i -> s"t$i u$i t$i"): _*)
    val est = graft.operators.TextAnalysis
      .countMinEstimates(docs, "text", depth = 2, width = 4)
      .collect()
    assert(est.length == 40)
    est.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"term=${r.getString(0)} est=${r.getLong(2)} < true=${r.getLong(1)}")
      assert(r.getLong(3) == r.getLong(2) - r.getLong(1))
    }
    // with width 4, SOME term must actually collide (pigeonhole)
    assert(est.exists(_.getLong(3) > 0), "collision geometry produced no overcount")
  }

  test("countMin: sketch is fixed-size and merges by cell-wise addition") {
    val a = cmDocs(1L -> "x y z x", 2L -> "y y q")
    val b = cmDocs(3L -> "x q q w", 4L -> "z")
    val union = cmDocs(1L -> "x y z x", 2L -> "y y q", 3L -> "x q q w", 4L -> "z")
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      graft.operators.TextAnalysis.countMinSketch(df, "text", 3, 8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (ca, cb, cu) = (cells(a), cells(b), cells(union))
    assert(cu.size <= 3 * 8, "sketch exceeded depth*width cells")
    val merged = (ca.keySet ++ cb.keySet).map(k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))).toMap
    assert(merged == cu, "sketch(A) + sketch(B) != sketch(A ∪ B)")
  }

  test("streaming sketch: batch partials merge to the one-shot sketch; a retried batch replaces, never double-counts; foreign checkpoints refused") {
    import graft.streaming.StreamingSketch
    val all = cmDocs(1L -> "x y z x", 2L -> "y y q", 3L -> "x q q w", 4L -> "z w")
    val work = java.nio.file.Files.createTempDirectory("cmstream-").toString
    val out = s"$work/sketch"
    StreamingSketch.processBatch(all.filter(col("doc_id") <= 2), 0L,
      "text", 3, 8, out, streamTag = "ck-A")
    StreamingSketch.processBatch(all.filter(col("doc_id") > 2), 1L,
      "text", 3, 8, out, streamTag = "ck-A")
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = cells(graft.operators.TextAnalysis.countMinSketch(all, "text", 3, 8))
    assert(cells(StreamingSketch.sketch(spark, out)) == oneShot)
    // at-least-once retry of batch 1: partial REPLACED, cells unchanged
    StreamingSketch.processBatch(all.filter(col("doc_id") > 2), 1L,
      "text", 3, 8, out, streamTag = "ck-A")
    assert(cells(StreamingSketch.sketch(spark, out)) == oneShot)
    // a different checkpoint's batch ids must not silently collide
    val e = intercept[IllegalArgumentException] {
      StreamingSketch.processBatch(all.limit(1), 0L, "text", 3, 8, out,
        streamTag = "ck-B")
    }
    assert(e.getMessage.contains("checkpoint"))
  }

  test("countMin: envelope flag is 1 everywhere at the qx102 geometry on the real corpus") {
    val docs = Tables.t(spark, sfDir, "documents")
    val est = graft.operators.TextAnalysis
      .countMinEstimates(docs, "text", depth = 4, width = 256)
      .collect()
    assert(est.nonEmpty)
    est.foreach(r => assert(r.getLong(4) == 1L,
      s"term=${r.getString(0)} blew the Markov envelope"))
  }
}
