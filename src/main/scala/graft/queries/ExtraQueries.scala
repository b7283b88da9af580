package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.{t, cents, net1e4}
import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.Similarity

/** Second coverage batch: J2-style ratio join, A5/A6 series ranking,
  * C5/C6 scaling+rounding, bucketed ANN (the LSH scale path end-to-end),
  * and per-bucket top candidate pairs (near-dup verify stage). */
object ExtraQueries {

  type Q = (SparkSession, String) => DataFrame

  private val LSH_PLANES = 8
  private val ANN_K = 3
  private val QUERY_SET = 20

  val queries: Map[String, Q] = Map(

    // ---- J2 + C1: two aggregates joined on year + guarded ratio ----------
    "q27_yearly_ratio" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val li = t(s, dir, "lineitem")
      val oy = o.groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("order_cents"))
      val ly = li.groupBy(year(col("l_shipdate")).cast("long").as("yr"))
        .agg(sum(net1e4(col("l_extendedprice"), col("l_discount"))).as("ship_1e4"))
      oy.join(ly, Seq("yr"))
        .withColumn("ship_to_order_pct",
          when(col("order_cents") > 0,
            col("ship_1e4").cast("double") / lit(100.0) / col("order_cents").cast("double") * 100))
        .orderBy("yr")
    }),

    // ---- A5/A6: series block (latest/oldest/mean/total growth) + ranking -
    "q28_series_ranking" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val yearly = o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      val series = yearly.groupBy("c_mktsegment").agg(
        max_by(col("rev_cents"), col("yr")).as("latest"),
        min_by(col("rev_cents"), col("yr")).as("oldest"),
        (sum(col("rev_cents")).cast("double") / count(lit(1))).as("mean_rev_cents"),
        count(lit(1)).as("n_years"))
        .withColumn("total_growth_pct",
          when(col("oldest") =!= 0,
            (col("latest").cast("double") / col("oldest").cast("double") - 1) * 100))
      series
        .withColumn("rank",
          row_number().over(Window.orderBy(col("latest").desc, col("c_mktsegment"))).cast("long"))
        .withColumn("standing",
          when(col("rank") === 1, "best")
            .when(col("rank") === 5, "worst")
            .otherwise("mid"))
        .orderBy("rank")
    }),

    // ---- C5/C6: unit scaling + display rounding ---------------------------
    "q29_scaling_round" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      o.groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
        .select(col("yr"),
          round(col("rev_cents").cast("double") / 100.0 / 1e6, 2).as("rev_millions"),
          round(col("rev_cents").cast("double") / 100.0 / 1e9, 3).as("rev_billions"))
        .orderBy("yr")
    }),

    // ---- O5 head-N / tail-N caps ------------------------------------------
    "q30_head_tail_caps" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val head = o.orderBy(col("o_orderdate").asc, col("o_orderkey").asc).limit(5)
        .withColumn("which", lit("first"))
      val tail = o.orderBy(col("o_orderdate").desc, col("o_orderkey").desc).limit(5)
        .withColumn("which", lit("last"))
      head.unionByName(tail)
        .select("which", "o_orderkey", "o_orderdate")
        .orderBy("which", "o_orderkey")
    }),

    // ---- E3 concat across scans (unionByName) -----------------------------
    "q31_union_concat" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"), lit("customer").as("src"))
      val sup = t(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(sup)
        .groupBy("src").agg(count(lit(1)).as("n"), min(col("name")).as("first_name"))
        .orderBy("src")
    }),

    // ---- F8/C8 string normalization pipeline ------------------------------
    "q32_identity_normalize" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.select(
          col("c_custkey"),
          upper(trim(col("c_name"))).as("name_norm"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
          // \z (end of input) not $: Java's $ matches before a trailing
          // newline, RE2's does not — \z means the same in both
          when(upper(trim(col("c_name"))).rlike("^[A-Z0-9#_]+\\z"), 1L).otherwise(0L)
            .as("is_clean"))
        .filter(col("c_custkey") < 500)
        .orderBy("c_custkey")
    }),

    // ---- C8 split / regexp_replace ----------------------------------------
    "q33_string_ops" -> ((s, dir) => {
      val p = t(s, dir, "part")
      p.select(
          col("p_partkey"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          length(col("p_name")).cast("long").as("name_len"))
        .filter(col("p_partkey") < 400)
        .orderBy("p_partkey")
    }),

    // ---- Bucketed ANN: the LSH scale path end-to-end ----------------------
    "qx12_bucketed_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bucketedKnn(emb.filter(col("vec_id") < QUERY_SET), emb,
          "vec_id", "embedding", LSH_PLANES, ANN_K)
        .withColumnRenamed("rank", "knn_rank")
        .orderBy("query_id", "knn_rank")
    }),

    // ---- The full near-dup pipeline: minhash → bands → verify → decide ----
    "qx14_near_dup_pipeline" -> ((s, dir) => {
      graft.operators.Dedup.nearDupPipeline(t(s, dir, "documents"), "text", "doc_id",
          k = ExtensionQueries.MINHASH_K, shingleN = ExtensionQueries.SHINGLE_N,
          rowsPerBand = ExtensionQueries.ROWS_PER_BAND, threshold = 0.2)
        .orderBy("doc_a", "doc_b")
    }),

    // ---- Batch sessionization (gap-based) over the events stream table ----
    "qx15_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Relational.sessionize(e, "user_id", "ts", gapSeconds = 1800,
          tieBreak = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("val_cents"),
          min(col("__secs")).as("start_secs"),
          (max(col("__secs")) - min(col("__secs"))).as("duration_secs"))
        .orderBy("user_id", "session_id")
    }),

    // ---- Sliding windows (1h window, 15min slide) in exact arithmetic -----
    // every event belongs to exactly 4 windows; starts enumerated as
    // floor-to-slide minus k slides — integer µs math identical on both
    // engines (StreamingMultimodalSpec proves it equals Spark's built-in
    // window(ts, '1 hour', '15 minutes') generator)
    "qx17_sliding_windows" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.withColumn("secs", expr("unix_micros(ts) div 1000000"))
        .withColumn("k", explode(sequence(lit(0), lit(3))))
        .withColumn("wstart_secs", (col("secs") - (col("secs") % 900)) - col("k") * 900)
        .groupBy(expr("timestamp_micros(wstart_secs * 1000000)").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("val_cents"))
        .orderBy("window_start", "event_type")
    }),

    // ---- As-of join: latest signup at-or-before each purchase, per user ---
    // (the point-in-time lookup operator Spark lacks; DuckDB's native
    //  ASOF JOIN is the independent oracle for our union+window plan)
    "qx16_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("val_cents"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      graft.operators.Relational.asofJoin(purchases, signups,
          "user_id", "ts", Seq("signup_ts"))
        .orderBy("event_id")
    }),

    // ---- As-of via the CUSTOM PLAN NODE (AsOfJoin logical → merge exec) ---
    // (same semantics and oracle as qx16, but through the Strategy-planned
    //  physical operator: key-clustered exchanges + sorted children + one
    //  merge pass — the hash gate proves a custom SparkPlan correct
    //  against DuckDB's native ASOF JOIN)
    "qx38_asof_custom_plan" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("val_cents"))
      val signups = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
      graft.plans.AsOfJoinPlan.asofJoinMerge(purchases, signups,
          "user_id", "ts", Seq("signup_ts"))
        .orderBy("event_id")
    }),

    // ---- Forward as-of via the custom merge exec (mirror of qx38) ---------
    "qx39_asof_forward_custom" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("val_cents"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("ts").as("error_ts"))
      graft.plans.AsOfJoinPlan.asofJoinMerge(purchases, errors,
          "user_id", "ts", Seq("error_ts"), forward = true)
        .orderBy("event_id")
    }),

    // ---- Forward as-of: next error event at-or-after each purchase --------
    // (mirror of qx16; DuckDB's native ASOF with the reversed inequality is
    //  the independent oracle)
    "qx27_asof_forward" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          cents(col("value")).as("val_cents"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), col("ts").as("error_ts"))
      graft.operators.Relational.asofJoinForward(purchases, errors,
          "user_id", "ts", Seq("error_ts"))
        .orderBy("event_id")
    }),

    // ---- Range join: errors inside each purchase's 1h window --------------
    // (binned interval join — equi-join on (key, time-bin) + exact filter,
    //  never a nested-loop range scan; zero-match purchases kept via the
    //  final left join)
    "qx28_range_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 1000000").as("start_secs"))
        .withColumn("end_secs", col("start_secs") + 3600L)
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("err_secs"))
      val matched = graft.operators.Relational.rangeJoin(
          errors, purchases, "user_id", "err_secs", "start_secs", "end_secs", 3600L)
        .groupBy("event_id").agg(count(lit(1)).as("n_errors_1h"))
      purchases.select("event_id", "user_id")
        .join(matched, Seq("event_id"), "left")
        .withColumn("n_errors_1h", coalesce(col("n_errors_1h"), lit(0L)))
        .orderBy("event_id")
    }),

    // ---- Near-dup candidate verify: top-1 cosine pair per LSH bucket ------
    // Round-1 shape (interpreted TX.dot lambda per pair + row_number over
    // the full pair set) was 24.3 s — 28% of the whole bench. Now: the
    // codegen'd graft_dot per pair, and top-1 per bucket via max_by, which
    // is partial-aggregable — each task reduces its pairs to one candidate
    // per bucket BEFORE the shuffle, so the pair set never moves. Ordering
    // (cosine DESC NULLS LAST, vec_a ASC, vec_b ASC) is encoded as the max
    // of (coalesce(cosine,-2), -vec_a, -vec_b) — total and deterministic.
    "qx13_bucket_top_pairs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val b = Similarity.withBucketAndNorm(emb, "vec_id", "embedding", LSH_PLANES)
      val a1 = b.select(col("bucket"), col("vec_id").as("vec_a"),
        col("embedding").as("e_a"), col("norm2").as("n_a"))
      val a2 = b.select(col("bucket").as("bucket2"), col("vec_id").as("vec_b"),
        col("embedding").as("e_b"), col("norm2").as("n_b"))
      val sparkD = Dialect(spark = true)
      val pairs = a1.join(a2, col("bucket") === col("bucket2") && col("vec_a") < col("vec_b"))
        .withColumn("cosine",
          when(col("n_a") > 0 && col("n_b") > 0,
            expr(TX.dotAuto("e_a", "e_b")(sparkD)) / (sqrt(col("n_a")) * sqrt(col("n_b")))))
      pairs.groupBy("bucket")
        .agg(max_by(
          struct(col("vec_a"), col("vec_b"), col("cosine")),
          struct(coalesce(col("cosine"), lit(-2.0)).as("c"),
            (-col("vec_a")).as("na"), (-col("vec_b")).as("nb"))).as("top"))
        .select(col("bucket"), col("top.vec_a").as("vec_a"),
          col("top.vec_b").as("vec_b"), col("top.cosine").as("cosine"))
        .orderBy("bucket")
    })
  )

  private implicit val duck: Dialect = Dialect(spark = false)
  private val cents_o = "CAST(ROUND(o_totalprice*100) AS BIGINT)"
  private val net_l = "CAST(ROUND(l_extendedprice*(1.0-l_discount)*10000) AS BIGINT)"

  private def lshBucketSql = s"CAST(${TX.lshBucket("embedding", LSH_PLANES)} AS BIGINT)"

  val oracleSql: Map[String, String] = Map(

    "q27_yearly_ratio" ->
      s"""WITH oy AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |              CAST(SUM($cents_o) AS BIGINT) AS order_cents FROM orders GROUP BY 1),
         |     ly AS (SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
         |              CAST(SUM($net_l) AS BIGINT) AS ship_1e4 FROM lineitem GROUP BY 1)
         |SELECT oy.yr AS yr, order_cents, ship_1e4,
         |  CASE WHEN order_cents > 0
         |       THEN CAST(ship_1e4 AS DOUBLE)/100.0/CAST(order_cents AS DOUBLE)*100 END AS ship_to_order_pct
         |FROM oy JOIN ly ON oy.yr = ly.yr ORDER BY yr""".stripMargin,

    "q28_series_ranking" ->
      s"""WITH yearly AS (
         |  SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS yr,
         |         CAST(SUM($cents_o) AS BIGINT) AS rev_cents
         |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
         |series AS (
         |  SELECT c_mktsegment,
         |    max_by(rev_cents, yr) AS latest, min_by(rev_cents, yr) AS oldest,
         |    CAST(SUM(rev_cents) AS DOUBLE)/COUNT(*) AS mean_rev_cents,
         |    COUNT(*) AS n_years
         |  FROM yearly GROUP BY c_mktsegment),
         |ranked AS (
         |  SELECT *, CASE WHEN oldest <> 0
         |         THEN (CAST(latest AS DOUBLE)/CAST(oldest AS DOUBLE) - 1)*100 END AS total_growth_pct,
         |    CAST(ROW_NUMBER() OVER (ORDER BY latest DESC, c_mktsegment) AS BIGINT) AS rank
         |  FROM series)
         |SELECT c_mktsegment, latest, oldest, mean_rev_cents, n_years, total_growth_pct, rank,
         |  CASE WHEN rank = 1 THEN 'best' WHEN rank = 5 THEN 'worst' ELSE 'mid' END AS standing
         |FROM ranked ORDER BY rank""".stripMargin,

    "q29_scaling_round" ->
      s"""WITH y AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         |             CAST(SUM($cents_o) AS BIGINT) AS rev_cents FROM orders GROUP BY 1)
         |SELECT yr, ROUND(CAST(rev_cents AS DOUBLE)/100.0/1e6, 2) AS rev_millions,
         |  ROUND(CAST(rev_cents AS DOUBLE)/100.0/1e9, 3) AS rev_billions
         |FROM y ORDER BY yr""".stripMargin,

    "qx12_bucketed_ann" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")} AS norm2,
         |             $lshBucketSql AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS query_id, bucket, embedding AS q_vec, norm2 AS q_norm2
         |      FROM n WHERE vec_id < $QUERY_SET),
         |c AS (SELECT vec_id AS neighbor_id, bucket, embedding AS c_vec, norm2 AS c_norm2 FROM n),
         |scored AS (
         |  SELECT query_id, q.bucket AS bucket, neighbor_id,
         |    CASE WHEN q_norm2 > 0 AND c_norm2 > 0
         |         THEN ${TX.dot("q_vec", "c_vec")} / (sqrt(q_norm2) * sqrt(c_norm2)) END AS cosine
         |  FROM c JOIN q ON c.bucket = q.bucket AND query_id <> neighbor_id)
         |SELECT query_id, bucket, neighbor_id, CAST(rn AS BIGINT) AS knn_rank, cosine
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
         |      FROM scored)
         |WHERE rn <= $ANN_K ORDER BY query_id, knn_rank""".stripMargin,

    "q30_head_tail_caps" ->
      """WITH head AS (SELECT 'first' AS which, o_orderkey, o_orderdate FROM orders
        |              ORDER BY o_orderdate ASC, o_orderkey ASC LIMIT 5),
        |     tail AS (SELECT 'last' AS which, o_orderkey, o_orderdate FROM orders
        |              ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 5)
        |SELECT which, o_orderkey, o_orderdate FROM head
        |UNION ALL SELECT which, o_orderkey, o_orderdate FROM tail
        |ORDER BY which, o_orderkey""".stripMargin,

    "q31_union_concat" ->
      """WITH u AS (
        |  SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier)
        |SELECT src, COUNT(*) AS n, MIN(name) AS first_name
        |FROM u GROUP BY src ORDER BY src""".stripMargin,

    "q32_identity_normalize" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS name_norm,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
        |  CAST(CASE WHEN regexp_matches(upper(trim(c_name)), '^[A-Z0-9#_]+\z')
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_clean
        |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin,

    "q33_string_ops" ->
      """SELECT p_partkey,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part WHERE p_partkey < 400 ORDER BY p_partkey""".stripMargin,

    "qx14_near_dup_pipeline" -> {
      val uni = "CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)"
      val inter = s"CAST(len(sa.sh) + len(sb.sh) AS BIGINT) - $uni"
      s"""WITH ${ExtensionQueries.sigCtes},
         |sig AS (SELECT doc_id, ${ExtensionQueries.sigSelect} FROM t4 GROUP BY doc_id),
         |banded AS (${(0 until ExtensionQueries.MINHASH_K / ExtensionQueries.ROWS_PER_BAND).map(b =>
             s"SELECT doc_id, CAST($b AS BIGINT) AS band_id, ${ExtensionQueries.bandKey(b)} AS band_key FROM sig")
             .mkString("\n UNION ALL ")}),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |         FROM banded a JOIN banded b
         |           ON a.band_id = b.band_id AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS sh FROM t4 GROUP BY doc_id),
         |verified AS (
         |  SELECT doc_a, doc_b, $inter AS inter_size, $uni AS union_size
         |  FROM cand JOIN sets sa ON doc_a = sa.doc_id JOIN sets sb ON doc_b = sb.doc_id)
         |SELECT doc_a, doc_b, inter_size, union_size,
         |  CAST(inter_size AS DOUBLE)/CAST(union_size AS DOUBLE) AS jaccard,
         |  doc_a AS keep_id, doc_b AS drop_id
         |FROM verified
         |WHERE CAST(inter_size AS DOUBLE)/CAST(union_size AS DOUBLE) >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "qx15_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, ts, value,
         |             (epoch_us(ts) // 1000000) AS secs FROM events),
         |f AS (SELECT user_id, event_id, ts, value, secs,
         |        CASE WHEN lag(secs) OVER w IS NULL OR secs - lag(secs) OVER w > 1800
         |             THEN 1 ELSE 0 END AS nf
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (SELECT user_id, value, secs,
         |        CAST(SUM(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |      FROM f)
         |SELECT user_id, session_id, COUNT(*) AS n_events,
         |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_cents,
         |  MIN(secs) AS start_secs, MAX(secs) - MIN(secs) AS duration_secs
         |FROM s GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,

    "qx17_sliding_windows" ->
      """WITH e AS (SELECT event_type, value, (epoch_us(ts) // 1000000) AS secs FROM events),
        |w AS (SELECT event_type, value,
        |        (secs - (secs % 900)) - k * 900 AS wstart_secs
        |      FROM e, (SELECT unnest(generate_series(0, 3)) AS k))
        |SELECT make_timestamp(wstart_secs * 1000000) AS window_start, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS val_cents
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "qx16_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS val_cents
        |           FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, p.ts, p.val_cents, s.signup_ts AS asof_signup_ts
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY event_id""".stripMargin,

    // identical oracle to qx16 — the Spark side differs (custom merge exec
    // vs union+window), so the hash gate proves the two plans AND DuckDB's
    // native ASOF all agree
    "qx38_asof_custom_plan" ->
      """WITH p AS (SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS val_cents
        |           FROM events WHERE event_type = 'purchase'),
        |     s AS (SELECT user_id, ts AS signup_ts FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, p.ts, p.val_cents, s.signup_ts AS asof_signup_ts
        |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.signup_ts
        |ORDER BY event_id""".stripMargin,

    "qx28_range_join" ->
      """WITH p AS (SELECT event_id, user_id, (epoch_us(ts) // 1000000) AS start_secs
        |           FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT user_id, (epoch_us(ts) // 1000000) AS err_secs
        |           FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, CAST(COUNT(e.err_secs) AS BIGINT) AS n_errors_1h
        |FROM p LEFT JOIN e
        |  ON p.user_id = e.user_id
        | AND e.err_secs >= p.start_secs AND e.err_secs <= p.start_secs + 3600
        |GROUP BY p.event_id, p.user_id
        |ORDER BY event_id""".stripMargin,

    "qx27_asof_forward" ->
      """WITH p AS (SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS val_cents
        |           FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT user_id, ts AS error_ts FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, p.ts, p.val_cents, e.error_ts AS asof_error_ts
        |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts <= e.error_ts
        |ORDER BY event_id""".stripMargin,

    "qx39_asof_forward_custom" ->
      """WITH p AS (SELECT event_id, user_id, ts, CAST(ROUND(value*100) AS BIGINT) AS val_cents
        |           FROM events WHERE event_type = 'purchase'),
        |     e AS (SELECT user_id, ts AS error_ts FROM events WHERE event_type = 'error')
        |SELECT p.event_id, p.user_id, p.ts, p.val_cents, e.error_ts AS asof_error_ts
        |FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts <= e.error_ts
        |ORDER BY event_id""".stripMargin,

    "qx13_bucket_top_pairs" ->
      s"""WITH n AS (SELECT vec_id, embedding, ${TX.norm2("embedding")} AS norm2,
         |             $lshBucketSql AS bucket FROM embeddings),
         |pairs AS (
         |  SELECT a.bucket AS bucket, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    CASE WHEN a.norm2 > 0 AND b.norm2 > 0
         |         THEN ${TX.dot("a.embedding", "b.embedding")} / (sqrt(a.norm2) * sqrt(b.norm2)) END AS cosine
         |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT bucket, vec_a, vec_b, cosine
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket
         |        ORDER BY cosine DESC, vec_a, vec_b) AS rn FROM pairs)
         |WHERE rn = 1 ORDER BY bucket""".stripMargin
  )
}
