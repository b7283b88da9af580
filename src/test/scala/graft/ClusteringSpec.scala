package graft

import graft.operators.Clustering
import org.apache.spark.sql.functions._

class ClusteringSpec extends SparkSpec {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansAssign picks the nearest centroid by cosine; ties go to the smaller id") {
    val cents = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(1f, 0f))
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val vs = emb(
      10L -> Seq(2f, 0.1f),   // → centroid 0 (or 2, same vector) — tie → 0
      11L -> Seq(0.1f, 3f),   // → centroid 1
      12L -> Seq(0f, 0f))     // zero norm: excluded
    val got = Clustering.kmeansAssign(vs, "vec_id", "embedding", cents, "cid", "cv")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 0L, 11L -> 1L))
  }

  test("kmeansAssign tie-break is deterministic for STRING centroid ids too") {
    import spark.implicits._
    // two identical centroids under string ids: negating a string id would
    // be null (arbitrary winner); the typed struct tie-break must pick the
    // lexicographically smaller id every time
    val cents = Seq(("beta", Seq(1f, 0f)), ("alfa", Seq(1f, 0f)))
      .toDF("cid", "cv")
    val vs = emb(10L -> Seq(2f, 0.1f), 11L -> Seq(5f, 0.2f))
    val got = Clustering.kmeansAssign(vs, "vec_id", "embedding", cents, "cid", "cv")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "alfa", 11L -> "alfa"))
  }

  test("kmeansUpdate: exact per-dimension means, 1-based dims") {
    import spark.implicits._
    val vs = emb(1L -> Seq(1f, 2f), 2L -> Seq(3f, 6f), 3L -> Seq(10f, 20f))
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L)).toDF("vec_id", "cluster")
    val got = Clustering.kmeansUpdate(vs, "vec_id", "embedding", assign)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      (0L, 1L) -> (2L, 2.0), (0L, 2L) -> (2L, 4.0),
      (1L, 1L) -> (1L, 10.0), (1L, 2L) -> (1L, 20.0)))
  }

  test("kmeansFit converges on separable blobs and labels them correctly") {
    import spark.implicits._
    // three tight 2-D blobs; seeds (ids 1..3) land one per blob
    val blob = Seq(
      (1L, Seq(10f, 0f)), (4L, Seq(10.5f, 0.2f)), (5L, Seq(9.7f, -0.1f)),
      (2L, Seq(0f, 10f)), (6L, Seq(0.2f, 10.4f)), (7L, Seq(-0.3f, 9.8f)),
      (3L, Seq(-10f, -10f)), (8L, Seq(-9.5f, -10.2f)), (9L, Seq(-10.1f, -9.7f)))
    val vs = blob.toDF("vec_id", "embedding").repartition(4)
    val cents = Clustering.kmeansFit(vs, "vec_id", "embedding", k = 3,
      maxIter = 10, tol = 1e-6)
    val labeled = Clustering.kmeansAssign(vs, "vec_id", "embedding",
        cents, "cluster", "centroid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member joins its seed's cluster
    assert(labeled(4L) == labeled(1L) && labeled(5L) == labeled(1L))
    assert(labeled(6L) == labeled(2L) && labeled(7L) == labeled(2L))
    assert(labeled(8L) == labeled(3L) && labeled(9L) == labeled(3L))
    assert(Set(labeled(1L), labeled(2L), labeled(3L)).size == 3)
  }

  test("kmeansFitGrouped: per-group results equal an isolated kmeansFit per group") {
    import spark.implicits._
    // two groups with different separable geometries; grouped fit in ONE
    // driver loop must land on exactly the centroids each group's own
    // isolated kmeansFit produces (same seed rule, same refit arithmetic;
    // extra rounds past a group's own settle point are fixed points)
    val gA = Seq(
      (1L, Seq(10f, 0f)), (4L, Seq(10.5f, 0.2f)), (5L, Seq(9.7f, -0.1f)),
      (2L, Seq(0f, 10f)), (6L, Seq(0.2f, 10.4f)), (7L, Seq(-0.3f, 9.8f)))
    val gB = Seq(
      (1L, Seq(-5f, -5f)), (3L, Seq(-5.5f, -4.8f)), (9L, Seq(-4.9f, -5.2f)),
      (2L, Seq(7f, 7f)), (8L, Seq(6.5f, 7.2f)))
    val both = (gA.map { case (i, v) => ("a", i, v) } ++
        gB.map { case (i, v) => ("b", i, v) })
      .toDF("grp", "vec_id", "embedding").repartition(4)
    val grouped = Clustering.kmeansFitGrouped(both, "grp", "vec_id",
        "embedding", k = 2, maxIter = 12, tol = 1e-6)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Float](2).toList)
      .toMap
    assert(grouped.size == 4, s"2 groups x k=2 expected: ${grouped.keySet}")
    for ((g, rows) <- Seq("a" -> gA, "b" -> gB)) {
      val solo = Clustering.kmeansFit(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 2, maxIter = 12, tol = 1e-6)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toList).toMap
      // kmeansFit's clusters are keyed by seed id; grouped slots are
      // 1..k in the same (smallest-ids-first) order
      val soloBySlot = solo.toSeq.sortBy(_._1).map(_._2)
      val groupedBySlot = (1L to 2L).map(s => grouped((g, s)))
      assert(groupedBySlot == soloBySlot,
        s"group $g: grouped $groupedBySlot vs solo $soloBySlot")
    }
  }

  test("assign plan: broadcast centroids, partial-aggregated argmax, no window/sort-merge") {
    val vs = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = vs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val plan = Clustering.kmeansAssign(vs, "vec_id", "embedding", cents, "cid", "cv")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // argmax reduces map-side: partial aggregation present
    assert(plan.contains("partial_min_by") || plan.contains("partial_max_by")
      || plan.contains("HashAggregate"), plan)
  }
}
