package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, TextExprs => TX}

/** Similarity search over an embedding column (`array<float>`).
  *
  * - Brute-force cosine top-k: the correctness baseline. The query set is
  *   broadcast; the corpus streams — one pass, no corpus shuffle, per-query
  *   top-k via window rank (k small). O(|Q|·|C|) compute but |Q| is small.
  * - Signed-random-projection LSH: the 100 TB path. Each vector gets an
  *   n-bit bucket from deterministic hyperplanes; candidate search becomes
  *   an equi-join on bucket id, cutting the candidate set ~2^n-fold.
  *
  * Dot products are sequential double folds (TextExprs.dot) so the DuckDB
  * oracle reproduces them bit-for-bit.
  */
object Similarity {
  private implicit val d: Dialect = Dialect(spark = true)

  /** Corpus with precomputed squared norm — compute once, reuse across
    * queries. */
  def withNorm2(emb: DataFrame, vecCol: String): DataFrame =
    emb.withColumn("norm2", expr(TX.norm2(vecCol)))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), rank-1 first. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm2(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("norm2").as("q_norm2"))
    val c = withNorm2(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("norm2").as("c_norm2"))
    val dotE = expr(TX.dot("q_vec", "c_vec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          dotE / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH bucket assignment: n-bit signed-random-projection bucket per
    * vector. Bucket planes are deterministic integer-mix pseudo-randoms —
    * identical across engines and runs. */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String, nPlanes: Int): DataFrame =
    emb.select(col(idCol),
      expr(TX.lshBucket(vecCol, nPlanes)).cast("long").as("bucket"))

  /** Bucketed ANN: top-k by cosine *within the query's LSH bucket* — the
    * scale path (equi-join on bucket replaces the cross join). */
  def bucketedKnn(queries: DataFrame, corpus: DataFrame,
                  idCol: String, vecCol: String, nPlanes: Int, k: Int): DataFrame = {
    val qb = lshBuckets(queries, idCol, vecCol, nPlanes)
      .join(withNorm2(queries, vecCol), idCol)
      .select(col(idCol).as("query_id"), col("bucket"),
        col(vecCol).as("q_vec"), col("norm2").as("q_norm2"))
    val cb = lshBuckets(corpus, idCol, vecCol, nPlanes)
      .join(withNorm2(corpus, vecCol), idCol)
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        col(vecCol).as("c_vec"), col("norm2").as("c_norm2"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dot("q_vec", "c_vec")) / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "neighbor_id", "rank", "cosine")
  }
}
