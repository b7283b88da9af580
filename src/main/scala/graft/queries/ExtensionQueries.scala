package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** LLM-data-pipeline operators (dedup, similarity search, text analysis)
  * over the `documents` and `embeddings` tables, with DuckDB oracle SQL
  * generated from the SAME expression definitions (TextExprs with the
  * duck dialect) — one source of truth, two engines, bit-identical hashes.
  */
object ExtensionQueries {

  type Q = (SparkSession, String) => DataFrame

  // shared with PipelineQueries (qx29/qx34 reuse the signature CTEs):
  // one constant set, or the Spark sides and oracles silently diverge
  private[queries] val MINHASH_K = 16
  private[queries] val SHINGLE_N = 3
  private[queries] val ROWS_PER_BAND = 4
  private val LSH_PLANES = 8
  private val KNN_K = 5
  private val QUERY_SET = 20   // vec_id < 20 are the kNN query vectors
  private val PAIR_CAP = 60    // doc_id < 60 for exact pairwise Jaccard

  val queries: Map[String, Q] = Map(

    "qx01_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("canonical_id")
    }),

    "qx02_minhash_signature" -> ((s, dir) => {
      Dedup.minhashSignature(t(s, dir, "documents"), "text", "doc_id", MINHASH_K, SHINGLE_N)
        .orderBy("doc_id")
    }),

    "qx03_minhash_bands" -> ((s, dir) => {
      val sig = Dedup.minhashSignature(t(s, dir, "documents"), "text", "doc_id", MINHASH_K, SHINGLE_N)
      Dedup.minhashBands(sig, "doc_id", MINHASH_K, ROWS_PER_BAND)
        .orderBy("band_id", "band_key")
    }),

    "qx04_simhash" -> ((s, dir) => {
      Dedup.simhash(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    }),

    "qx05_ngram_jaccard" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < PAIR_CAP)
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", SHINGLE_N)
        .orderBy("doc_a", "doc_b")
    }),

    "qx06_knn_bruteforce" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceKnn(emb.filter(col("vec_id") < QUERY_SET), emb,
          "vec_id", "embedding", KNN_K)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    "qx07_lsh_buckets" -> ((s, dir) => {
      Similarity.lshBuckets(t(s, dir, "embeddings"), "vec_id", "embedding", LSH_PLANES)
        .orderBy("vec_id")
    }),

    "qx08_lang_id" -> ((s, dir) => {
      TextAnalysis.langId(t(s, dir, "documents"), "text", "doc_id",
          carryCols = Seq("lang"))
        .orderBy("doc_id")
    }),

    "qx09_quality_signals" -> ((s, dir) => {
      TextAnalysis.qualitySignals(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    }),

    "qx10_token_counts" -> ((s, dir) => {
      TextAnalysis.tokenCounts(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    }),

    "qx11_fingerprints" -> ((s, dir) => {
      TextAnalysis.fingerprints(t(s, dir, "documents"), "text", "doc_id")
        .orderBy("doc_id")
    })
  )

  // ---------------------------------------------------------------------
  // Oracle SQL — generated with the duck dialect from the same TextExprs.
  // ---------------------------------------------------------------------
  private implicit val duck: Dialect = Dialect(spark = false)

  private val toks = TX.tokens("text")

  /** CTE chain mirroring Dedup.shingleHashRows for word n-grams of length
    * `n`: zip-unnest tokens with positions, hash each word once,
    * window-lead shingle combine. Ends with table `t4(doc_id, sh)` —
    * multiplicity kept (consumers DISTINCT/aggregate as needed). */
  private[queries] def shingleCtes(n: Int): String = {
    val shComb = (1 until n).foldLeft("h") { (acc, j) =>
      s"(($acc * 8191 + lead(h, $j) OVER win) % ${TX.P})"
    }
    s"""t0 AS (SELECT doc_id, $toks AS toks FROM documents),
       |t1 AS (SELECT doc_id, unnest(toks) AS w,
       |         unnest(generate_series(1, len(toks))) AS pos FROM t0),
       |t2 AS (SELECT doc_id, pos, ${TX.polyHash("w")} AS h FROM t1),
       |t3 AS (SELECT doc_id, $shComb AS sh FROM t2
       |       WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
       |t4 AS (SELECT doc_id, sh FROM t3 WHERE sh IS NOT NULL)""".stripMargin
  }

  /** shingleCtes at the suite's MinHash shingle length. */
  private[queries] def sigCtes: String = shingleCtes(SHINGLE_N)

  /** k grouped permutation-MINs over t4's shingle hashes. */
  private[queries] def sigSelect: String =
    (0 until MINHASH_K)
      .map(i => s"MIN((${TX.aK(i)}*sh + ${TX.bK(i)}) % ${TX.P}) AS mh${"%02d".format(i)}")
      .mkString(", ")

  private[queries] def bandKey(b: Int): String =
    (0 until ROWS_PER_BAND)
      .map(r => s"CAST(mh${"%02d".format(b * ROWS_PER_BAND + r)} AS VARCHAR)")
      .mkString(" || '|' || ")

  // shared with PipelineQueries (qx37 reuses the simhash CTE)
  private[queries] val simhashBitSums = (0 until 32)
    .map(j => s"SUM(CASE WHEN (h2 // ${1L << j}) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
    .mkString(", ")
  private[queries] val simhashAssemble = (0 until 32)
    .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)")
    .mkString(" + ")

  private val stopList = TextAnalysis.StopEn.map(w => s"'$w'").mkString(", ")

  val oracleSql: Map[String, String] = Map(

    "qx01_dedup_exact" ->
      s"""SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY ${TX.norm("text")}
         |ORDER BY canonical_id""".stripMargin,

    "qx02_minhash_signature" ->
      s"""WITH $sigCtes
         |SELECT doc_id, $sigSelect FROM t4 GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "qx03_minhash_bands" ->
      s"""WITH $sigCtes,
         |sig AS (SELECT doc_id, $sigSelect FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until MINHASH_K / ROWS_PER_BAND).map(b =>
            s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${bandKey(b)} AS band_key FROM sig")
            .mkString("\n UNION ALL ")})
         |SELECT band_id, band_key, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
         |FROM banded GROUP BY band_id, band_key HAVING COUNT(*) >= 2
         |ORDER BY band_id, band_key""".stripMargin,

    "qx04_simhash" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |h AS (SELECT doc_id, ${TX.mix32(TX.polyHash("w"))} AS h2 FROM tok),
         |b AS (SELECT doc_id, $simhashBitSums FROM h GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashAssemble AS BIGINT) AS simhash
         |FROM b ORDER BY doc_id""".stripMargin,

    "qx05_ngram_jaccard" ->
      s"""WITH s AS (SELECT doc_id, ${duck.adistinct(TX.shingles(toks, SHINGLE_N))} AS sh
         |           FROM documents WHERE doc_id < $PAIR_CAP)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(len(a.sh) + len(b.sh) - len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS inter_size,
         |  CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS union_size,
         |  CAST(CAST(len(a.sh) + len(b.sh) - len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS DOUBLE)
         |    / CAST(CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS BIGINT) AS DOUBLE) AS jaccard
         |FROM s a JOIN s b ON a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,

    "qx06_knn_bruteforce" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")} AS norm2 FROM embeddings),
         |q AS (SELECT vec_id AS query_id, embedding AS q_vec, norm2 AS q_norm2 FROM n WHERE vec_id < $QUERY_SET),
         |c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec, norm2 AS c_norm2 FROM n),
         |scored AS (
         |  SELECT query_id, neighbor_id,
         |    CASE WHEN q_norm2 > 0 AND c_norm2 > 0
         |         THEN ${TX.dot("q_vec", "c_vec")} / (sqrt(q_norm2) * sqrt(c_norm2)) END AS cosine
         |  FROM c JOIN q ON query_id <> neighbor_id)
         |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS knn_rank, cosine
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
         |      FROM scored)
         |WHERE rn <= $KNN_K ORDER BY query_id, knn_rank""".stripMargin,

    "qx07_lsh_buckets" ->
      s"""SELECT vec_id, CAST(${TX.lshBucket("embedding", LSH_PLANES)} AS BIGINT) AS bucket
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "qx08_lang_id" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($toks) AS w FROM documents),
         |a AS (SELECT doc_id, lang, COUNT(*) AS n_tokens,
         |        CAST(SUM(CASE WHEN w IN ($stopList) THEN 1 ELSE 0 END) AS BIGINT) AS en_hits
         |      FROM tok GROUP BY doc_id, lang)
         |SELECT doc_id, lang, n_tokens, en_hits,
         |  CAST(en_hits AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS en_ratio,
         |  CASE WHEN CAST(en_hits AS DOUBLE)/CAST(n_tokens AS DOUBLE) >= 0.05
         |       THEN 'en' ELSE 'other' END AS pred_lang
         |FROM a ORDER BY doc_id""".stripMargin,

    "qx09_quality_signals" ->
      s"""SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_raw_chars,
         |  CAST(length(${duck.reAll("lower(text)", "[^a-z]", "")}) AS BIGINT) AS n_alpha,
         |  CAST(length(${duck.reAll("text", "[^0-9]", "")}) AS BIGINT) AS n_digit,
         |  CAST(${duck.size(toks)} AS BIGINT) AS n_tokens,
         |  CAST(${duck.fold(duck.map(toks, "w", "CAST(length(w) AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT) AS sum_token_len,
         |  CASE WHEN length(text) > 0
         |       THEN CAST(length(${duck.reAll("lower(text)", "[^a-z]", "")}) AS DOUBLE)/CAST(length(text) AS DOUBLE) END AS alpha_ratio,
         |  CASE WHEN ${duck.size(toks)} > 0
         |       THEN CAST(${duck.fold(duck.map(toks, "w", "CAST(length(w) AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS DOUBLE)/CAST(${duck.size(toks)} AS DOUBLE) END AS avg_token_len,
         |  (CASE WHEN length(text) > 0
         |        THEN CAST(length(${duck.reAll("lower(text)", "[^a-z]", "")}) AS DOUBLE)/CAST(length(text) AS DOUBLE) END) * 0.5
         |    + (CASE WHEN ${duck.size(toks)} BETWEEN 20 AND 80 THEN 0.3 ELSE 0.0 END)
         |    + (CASE WHEN (CASE WHEN ${duck.size(toks)} > 0
         |         THEN CAST(${duck.fold(duck.map(toks, "w", "CAST(length(w) AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS DOUBLE)/CAST(${duck.size(toks)} AS DOUBLE) END) BETWEEN 3.0 AND 8.0
         |         THEN 0.2 ELSE 0.0 END) AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,

    "qx10_token_counts" ->
      s"""SELECT doc_id,
         |  CAST(${duck.size(duck.splitSpace("text"))} AS BIGINT) AS n_ws_tokens,
         |  CAST(${duck.size(duck.regexExtractAll("lower(text)", "[a-z0-9]+"))} AS BIGINT) AS n_re_tokens,
         |  CAST(${duck.fold(duck.map(toks, "w", s"CAST(${duck.idiv("length(w) + 3", "4")} AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT) AS n_subtokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "qx11_fingerprints" ->
      s"""SELECT doc_id,
         |  ${TX.polyHash(TX.norm("text"))} AS fp_poly,
         |  ${TX.mix32(TX.polyHash(TX.norm("text")))} AS fp_mix32,
         |  md5(${TX.norm("text")}) AS fp_md5
         |FROM documents ORDER BY doc_id""".stripMargin
  )
}
