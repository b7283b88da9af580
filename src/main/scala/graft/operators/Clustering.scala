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
      // max_by over (cosine, -cid): partial-aggregable argmax, so the
      // winner reduces map-side instead of shuffling every (vec, centroid)
      // score through a window
      .groupBy(idCol)
      .agg(max_by(
        struct(col("__cid").as("cluster"), col("__cos").as("cos")),
        struct(col("__cos"), (-col("__cid")).as("tb"))).as("__w"))
      .select(col(idCol), col("__w.cluster").as("cluster"),
        round(col("__w.cos"), 6).as("cosine"))
  }

  /** Lloyd refit: per-(cluster, dim) mean of member vectors, long-form
    * (`cluster, dim, n_vecs, mean_val`), dims 1-based. `assignment` is
    * (idCol, cluster) — typically [[kmeansAssign]] output. Exact: per-dim
    * sums run in decimal(20,10), so the refit does not drift with
    * partition count or reduction order. */
  def kmeansUpdate(vectors: DataFrame, idCol: String, vecCol: String,
                   assignment: DataFrame): DataFrame = {
    val members = vectors.select(col(idCol), col(vecCol).as("__vec"))
      .join(assignment.select(col(idCol), col("cluster")), idCol)
    members
      .select(col("cluster"), posexplode(col("__vec")).as(Seq("__pos", "__v")))
      .groupBy(col("cluster"), (col("__pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("__v").cast("double").cast("decimal(20,10)")).cast("double")
          / count(lit(1)), 6).as("mean_val"))
  }
}
