package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}

/** Distributed k-means building blocks over an embedding column — the
  * engine side of semantic clustering for corpus curation (cluster-then-
  * sample, semantic dedup, topic balancing all start from exactly these
  * two steps).
  *
  * Deliberately exposed as the two Lloyd half-steps rather than a fitted
  * "model": at 100 TB the driver loop belongs to the caller (iterate,
  * checkpoint between rounds, stop on movement), while each half-step must
  * be a single well-shaped distributed pass — which these are:
  *
  *  - assign: centroids BROADCAST (k × dim is driver-sized by definition),
  *    corpus streams through one codegen'd `graft_dot` pass per centroid,
  *    winner reduced map-side via `max_by` partial aggregation — no
  *    shuffle of vector payloads at all, only the final (id, cluster) agg.
  *  - update: per-dimension means via posexplode + grouped aggregation on
  *    (cluster, dim) — k·dim output rows, map-side combinable. Sums run in
  *    DECIMAL so the result is EXACT and independent of partition order
  *    (double summation would make the refit nondeterministic run-to-run).
  *
  * Cosine geometry, matching the similarity operators: vectors and
  * centroids with zero norm are excluded (cosine undefined there), and
  * the cosine expression keeps the `dot / (sqrt(n2a) * sqrt(n2b))` form
  * every oracle query uses, so results stay bit-comparable.
  */
object Clustering {
  private implicit val d: Dialect = Dialect(spark = true)

  /** Nearest-centroid assignment by cosine: one row per input vector with
    * its winning `cluster` and the (6dp-rounded) cosine. Ties break toward
    * the smallest centroid id — deterministic in any engine. */
  def kmeansAssign(vectors: DataFrame, idCol: String, vecCol: String,
                   centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    val v = vectors
      .withColumn("__n2", expr(TX.norm2Auto(vecCol)))
      .filter(col("__n2") > 0)
      .select(col(idCol), col(vecCol).as("__vec"), col("__n2"))
    val c = centroids
      .withColumn("__cn2", expr(TX.norm2Auto(cvecCol)))
      .filter(col("__cn2") > 0)
      .select(col(cidCol).as("__cid"), col(cvecCol).as("__cvec"), col("__cn2"))
    v.crossJoin(broadcast(c))
      .withColumn("__cos",
        expr(TX.dotAuto("__vec", "__cvec"))
          / (sqrt(col("__n2")) * sqrt(col("__cn2"))))
      // min_by over (-cosine, cid): partial-aggregable argmax, so the
      // winner reduces map-side instead of shuffling every (vec, centroid)
      // score through a window; the id rides the ordering struct
      // un-negated, so the tie-break holds for any orderable id type
      .groupBy(idCol)
      .agg(min_by(
        struct(col("__cid").as("cluster"), col("__cos").as("cos")),
        struct((-col("__cos")).as("c"), col("__cid").as("tb"))).as("__w"))
      .select(col(idCol), col("__w.cluster").as("cluster"),
        round(col("__w.cos"), 6).as("cosine"))
  }

  /** Lloyd refit: per-(cluster, dim) mean of member vectors, long-form
    * (`cluster, dim, n_vecs, mean_val`), dims 1-based. `assignment` is
    * (idCol, cluster) — typically [[kmeansAssign]] output. Exact: per-dim
    * sums run in decimal(30,10), so the refit does not drift with
    * partition count or reduction order. Range contract: coordinates must
    * satisfy |v| < 10^20 (any real embedding is orders of magnitude
    * inside this) — under non-ANSI SQL a wider value would cast to null
    * and SILENTLY leave the mean, which is why the bound is stated here
    * rather than left to discovery. */
  def kmeansUpdate(vectors: DataFrame, idCol: String, vecCol: String,
                   assignment: DataFrame): DataFrame = {
    val members = vectors.select(col(idCol), col(vecCol).as("__vec"))
      .join(assignment.select(col(idCol), col("cluster")), idCol)
    members
      .select(col("cluster"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
      .groupBy(col("cluster"), (col("__pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("__v").cast("double").cast("decimal(30,10)")).cast("double")
          / count(lit(1)), 6).as("mean_val"))
  }

  /** Long-form refit back to centroid vectors: (cidCol, cvecCol) with the
    * per-dim means reassembled in dim order as float arrays. */
  private def centroidsFromUpdate(update: DataFrame, cidCol: String,
                                  cvecCol: String): DataFrame =
    update
      .groupBy(col("cluster").as(cidCol))
      .agg(array_sort(collect_list(struct(col("dim"), col("mean_val")))).as("__dm"))
      .withColumn(cvecCol, expr("transform(__dm, x -> CAST(x.mean_val AS FLOAT))"))
      .drop("__dm")

  /** Full Lloyd loop: assign → refit until no centroid moves more than
    * `tol` per coordinate (L∞) or `maxIter` rounds. Returns the final
    * centroids as (cluster, centroid) — feed [[kmeansAssign]] once more
    * for the final labeling.
    *
    * Driver-loop discipline (same contract as Graph.connectedComponents):
    * the driver carries ONLY the k-row movement decision; each round's
    * centroids localCheckpoint so the logical plan doesn't grow by one
    * assign+refit per round, and the previous round's blocks are released
    * once the next materializes. Empty clusters keep their previous
    * centroid (refit emits no rows for them — the standard Lloyd choice
    * that avoids k shrinking mid-run). */
  /** [[kmeansFit]] over MANY independent groups in ONE driver loop —
    * each group (`groupCol`) gets its own k clusters, fitted only on its
    * own members, but every round is a single distributed pass over all
    * groups together. This is the orchestration shape a drifted-cell
    * split needs at scale: D cells × (assign + refit) per round as ONE
    * job each, instead of D serial Lloyd lifecycles (D × rounds × 2
    * driver barriers). Semantics per group are EXACTLY [[kmeansFit]]'s
    * (same seed rule — the k smallest ids within the group; same
    * cosine assignment, decimal-exact refit, empty-cluster carry-
    * forward), except the stop rule: all groups iterate until the MAX
    * movement over every (group, cluster) drops under `tol` — a group
    * that settles early just stops moving (its refit is a fixed point),
    * so extra rounds cannot change its result.
    * Returns (`groupCol`, `cluster` ∈ 1..k, `centroid`). */
  def kmeansFitGrouped(vectors: DataFrame, groupCol: String, idCol: String,
                       vecCol: String, k: Int, maxIter: Int = 20,
                       tol: Double = 1e-4): DataFrame = {
    require(k > 0 && maxIter > 0, "k and maxIter must be positive")
    GraftFunctions.register(vectors.sparkSession)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(idCol))
    // deterministic per-group seed: the k smallest ids of the group
    var ck = vectors
      .withColumn("__slot", row_number().over(w).cast("long"))
      .filter(col("__slot") <= k)
      .select(col(groupCol), col("__slot").as("cluster"),
        col(vecCol).as("centroid"))
      .localCheckpoint()
    var cents = ck
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      // assign: centroids are (groups × k) rows — broadcast-sized by the
      // same argument as kmeansAssign's (a cell split is bounded by the
      // store's cell count); the equi-join on groupCol keeps each member
      // scoring only ITS group's k candidates
      val v = vectors
        .withColumn("__n2", expr(TX.norm2Auto(vecCol)))
        .filter(col("__n2") > 0)
        .select(col(groupCol), col(idCol), col(vecCol).as("__vec"), col("__n2"))
      val c = cents
        .withColumn("__cn2", expr(TX.norm2Auto("centroid")))
        .filter(col("__cn2") > 0)
        .select(col(groupCol), col("cluster").as("__cid"),
          col("centroid").as("__cvec"), col("__cn2"))
      val assign = v.join(broadcast(c), Seq(groupCol))
        .withColumn("__cos",
          expr(TX.dotAuto("__vec", "__cvec"))
            / (sqrt(col("__n2")) * sqrt(col("__cn2"))))
        .groupBy(col(groupCol), col(idCol))
        .agg(min_by(col("__cid"),
          struct((-col("__cos")).as("c"), col("__cid").as("tb"))).as("cluster"))
      // refit: decimal-exact per-(group, cluster, dim) means, reassembled
      val refit = vectors.select(col(groupCol), col(idCol), col(vecCol).as("__vec"))
        .join(assign, Seq(groupCol, idCol))
        .select(col(groupCol), col("cluster"),
          posexplode(col("__vec")).as(Seq("__pos", "__v")))
        .groupBy(col(groupCol), col("cluster"), col("__pos"))
        .agg((sum(col("__v").cast("double").cast("decimal(30,10)")).cast("double")
          / count(lit(1))).as("__m"))
        .groupBy(col(groupCol), col("cluster"))
        .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__dm"))
        .withColumn("__new",
          expr("transform(__dm, x -> CAST(round(x.__m, 6) AS FLOAT))"))
        .select(col(groupCol), col("cluster"), col("__new"))
      val nextCk = cents.select(col(groupCol), col("cluster"),
          col("centroid").as("__old"))
        .join(refit, Seq(groupCol, "cluster"), "left")
        .select(col(groupCol), col("cluster"),
          coalesce(col("__new"), col("__old")).as("centroid"), col("__old"))
        .localCheckpoint()
      moved = nextCk
        .select(max(expr(
          "aggregate(zip_with(centroid, __old, (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, x))")).as("m"))
        .collect()(0).getDouble(0)
      Checkpoints.release(ck)
      ck = nextCk
      cents = nextCk.drop("__old")
      iter += 1
    }
    cents
  }

  def kmeansFit(vectors: DataFrame, idCol: String, vecCol: String,
                k: Int, maxIter: Int = 20, tol: Double = 1e-4): DataFrame = {
    require(k > 0 && maxIter > 0, "k and maxIter must be positive")
    // deterministic seed: the k smallest ids (no RNG, engine-portable)
    var ck = vectors.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cluster"), col(vecCol).as("centroid"))
      .localCheckpoint()
    var cents = ck
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val assign = kmeansAssign(vectors, idCol, vecCol, cents, "cluster", "centroid")
      val refit = centroidsFromUpdate(
        kmeansUpdate(vectors, idCol, vecCol, assign), "cluster", "centroid")
      // empty clusters: carry the old centroid forward
      val nextCk = cents.select(col("cluster"), col("centroid").as("__old"))
        .join(refit.withColumnRenamed("centroid", "__new"), Seq("cluster"), "left")
        .select(col("cluster"), coalesce(col("__new"), col("__old")).as("centroid"),
          col("__old"))
        .localCheckpoint()
      // L∞ movement over all clusters — k rows to the driver, never data
      moved = nextCk
        .select(max(expr(
          "aggregate(zip_with(centroid, __old, (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, x))")).as("m"))
        .collect()(0).getDouble(0)
      Checkpoints.release(ck)
      ck = nextCk
      cents = nextCk.drop("__old")
      iter += 1
    }
    cents
  }
}
