package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.TextAnalysis

/** Round-4 curation batch: importance-weighted data selection (DSIR) and
  * quality-aware canonical selection inside near-dup groups — the two
  * steps that turn "we found the duplicates / we scored the docs" into
  * "this is the corpus we train on". Both oracle-gated (the DuckDB SQL is
  * generated from the same TextExprs definitions the Spark plans run). */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Feature-hash space for qx58 — small enough that the census always
    * broadcasts, large enough that bucket collisions stay rare on the
    * synthetic vocabulary. */
  private[queries] val DSIR_BUCKETS = 4096

  private def duckD = Dialect(spark = false)
  private def sparkD = Dialect(spark = true)

  def queries: Map[String, Q] = Map(

    // ---- DSIR importance weights: score docs toward a target domain ----
    // (target slice = English docs; the weight says how much more likely
    //  the doc is under the target's hashed-bigram LM than the source's)
    "qx58_dsir_weights" -> ((s, dir) =>
      TextAnalysis.dsirWeights(t(s, dir, "documents"), "text", "doc_id",
          col("lang") === "en", DSIR_BUCKETS)
        .orderBy("doc_id")),

    // ---- Quality-canonical selection within near-dup groups -------------
    // (production keeps the BEST duplicate, not the arbitrary smallest id:
    //  per group, the doc with the most tokens wins, ties to smaller id —
    //  an argmax via partial-aggregable min_by, no window over the corpus)
    "qx59_group_canonical" -> ((s, dir) => {
      val d = sparkD
      val docs = t(s, dir, "documents")
      val groups = graft.operators.Dedup.dedupGroups(docs, "text", "doc_id",
        k = ExtensionQueries.MINHASH_K, shingleN = ExtensionQueries.SHINGLE_N,
        rowsPerBand = ExtensionQueries.ROWS_PER_BAND,
        threshold = PipelineQueries.NEARDUP_JACCARD)
      val quality = docs.select(col("doc_id"),
        expr(s"CAST(${d.size(TX.tokens("text")(d))} AS BIGINT)").as("n_tokens"))
      groups.join(quality, "doc_id")
        .groupBy("group_id")
        .agg(count(lit(1)).as("group_size"),
          min_by(
            struct(col("doc_id").as("keep_id"), col("n_tokens").as("keep_tokens")),
            struct((-col("n_tokens")).as("q"), col("doc_id").as("tb"))).as("__w"))
        .select(col("group_id"), col("group_size"),
          col("__w.keep_id").as("keep_id"), col("__w.keep_tokens").as("keep_tokens"))
        .orderBy("group_id")
    })
  )

  def oracleSql: Map[String, String] = Map(

    "qx58_dsir_weights" -> {
      val d = duckD
      val B = DSIR_BUCKETS
      s"""WITH td AS (SELECT doc_id, (lang = 'en') AS tgt,
         |              ${TX.tokens("text")(d)} AS __toks FROM documents),
         |inst AS (SELECT doc_id, tgt, unnest(${TX.shingles("__toks", 2)(d)}) AS sh
         |         FROM td),
         |f AS (SELECT doc_id, tgt, (${TX.polyHash("sh")(d)}) % $B AS f FROM inst),
         |census AS (SELECT f,
         |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         |    CAST(SUM(CASE WHEN NOT tgt THEN 1 ELSE 0 END) AS BIGINT) AS c_s
         |  FROM f GROUP BY f),
         |tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
         |               CAST(SUM(c_s) AS BIGINT) AS n_s FROM census)
         |SELECT doc_id, tgt AS is_target, COUNT(*) AS n_features,
         |  ROUND(SUM(ln(CAST(c.c_t + 1 AS DOUBLE) / CAST(n_t + $B AS DOUBLE))
         |          - ln(CAST(c.c_s + 1 AS DOUBLE) / CAST(n_s + $B AS DOUBLE))), 6)
         |    AS log_weight
         |FROM f JOIN census c USING (f) CROSS JOIN tot
         |GROUP BY doc_id, tgt ORDER BY doc_id""".stripMargin
    },

    "qx59_group_canonical" -> {
      val uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)"
      val inter = s"CAST(len(sa.sh) + len(sb.sh) AS BIGINT) - $uni"
      val d = duckD
      s"""WITH RECURSIVE ${ExtensionQueries.sigCtes},
         |sig AS (SELECT doc_id, ${ExtensionQueries.sigSelect} FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until ExtensionQueries.MINHASH_K / ExtensionQueries.ROWS_PER_BAND).map(b =>
             s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${ExtensionQueries.bandKey(b)} AS band_key FROM sig")
             .mkString("\n UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS sh FROM t4 GROUP BY doc_id),
         |pairs AS (
         |  SELECT doc_a, doc_b FROM cand
         |  JOIN sets sa ON doc_a = sa.doc_id JOIN sets sb ON doc_b = sb.doc_id
         |  WHERE CAST($inter AS DOUBLE)/CAST($uni AS DOUBLE) >= ${PipelineQueries.NEARDUP_JACCARD}),
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM pairs
         |        UNION SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT u AS id FROM sym),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.id),
         |comp AS (SELECT id, MIN(r) AS group_id FROM reach GROUP BY id),
         |tokc AS (SELECT doc_id, CAST(${d.size(TX.tokens("text")(d))} AS BIGINT)
         |           AS n_tokens FROM documents),
         |sel AS (SELECT comp.group_id, comp.id AS doc_id, n_tokens,
         |          ROW_NUMBER() OVER (PARTITION BY comp.group_id
         |            ORDER BY n_tokens DESC, comp.id ASC) AS rn,
         |          COUNT(*) OVER (PARTITION BY comp.group_id) AS group_size
         |        FROM comp JOIN tokc ON comp.id = tokc.doc_id)
         |SELECT group_id, group_size, doc_id AS keep_id, n_tokens AS keep_tokens
         |FROM sel WHERE rn = 1 ORDER BY group_id""".stripMargin
    }
  )
}
