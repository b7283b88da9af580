package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}

/** Similarity search over an embedding column (`array<float>`).
  *
  * - Brute-force cosine top-k: the correctness baseline. The query set is
  *   broadcast; the corpus streams — one pass, no corpus shuffle, per-query
  *   top-k via window rank (k small). O(|Q|·|C|) compute but |Q| is small.
  * - Signed-random-projection LSH: the 100 TB path. Each vector gets an
  *   n-bit bucket from deterministic hyperplanes; candidate search becomes
  *   an equi-join on bucket id, cutting the candidate set ~2^n-fold.
  *
  * Hot-path dot products run through the codegen'd `graft_dot` expression;
  * the DuckDB oracle keeps the portable sequential-fold form (TextExprs.dot)
  * so every oracle run re-proves them bit-identical.
  */
object Similarity {
  private implicit val d: Dialect = Dialect(spark = true)

  /** The query side of the kNN operators is broadcast — it must stay small.
    * The cap makes the contract executable instead of a comment: exceeding
    * it fails fast with a clear message, not a silent driver OOM mid-join. */
  val MaxQueryRows = 1000000L

  private[graft] def requireSmallQuerySide(queries: DataFrame, op: String,
                                               cap: Long = MaxQueryRows): Unit = {
    // driver-local query frames (the serving shape) answer the count
    // from the LocalRelation itself — no job; distributed frames pay a
    // limit+count, which aborts the scan as soon as the cap is crossed
    val n = DriverPlan.localCount(queries).getOrElse(
      queries.limit((cap + 1).toInt).count())
    require(n <= cap,
      s"$op broadcasts the query side, which has > $cap rows; " +
        "swap the sides or use the bucketed/banded path for large query sets")
  }

  /** Corpus with precomputed squared norm — compute once, reuse across
    * queries. */
  def withNorm2(emb: DataFrame, vecCol: String): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.withColumn("norm2", expr(TX.norm2Auto(vecCol)))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), rank-1 first. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame,
                    idCol: String, vecCol: String, k: Int): DataFrame = {
    requireSmallQuerySide(queries, "bruteForceKnn")
    val q = withNorm2(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("norm2").as("q_norm2"))
    val c = withNorm2(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("norm2").as("c_norm2"))
    val dotE = expr(TX.dotAuto("q_vec", "c_vec"))
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
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String, nPlanes: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.select(col(idCol),
      expr(TX.lshBucketAuto(vecCol, nPlanes)).cast("long").as("bucket"))
  }

  /** (id, bucket, vec, norm2) in ONE projection — bucket and norm are both
    * per-row expressions of the same input row, so pairing them must never
    * cost a self-join of the corpus on the id (a full extra scan + an
    * id-keyed shuffle at scale). */
  def withBucketAndNorm(emb: DataFrame, idCol: String, vecCol: String,
                        nPlanes: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    emb.select(col(idCol),
      expr(TX.lshBucketAuto(vecCol, nPlanes)).cast("long").as("bucket"),
      col(vecCol), expr(TX.norm2Auto(vecCol)).as("norm2"))
  }

  /** Bucketed ANN: top-k by cosine *within the query's LSH bucket* — the
    * scale path (equi-join on bucket replaces the cross join). */
  def bucketedKnn(queries: DataFrame, corpus: DataFrame,
                  idCol: String, vecCol: String, nPlanes: Int, k: Int): DataFrame = {
    requireSmallQuerySide(queries, "bucketedKnn")
    val qb = withBucketAndNorm(queries, idCol, vecCol, nPlanes)
      .select(col(idCol).as("query_id"), col("bucket"),
        col(vecCol).as("q_vec"), col("norm2").as("q_norm2"))
    val cb = withBucketAndNorm(corpus, idCol, vecCol, nPlanes)
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        col(vecCol).as("c_vec"), col("norm2").as("c_norm2"))
    val scored = cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dotAuto("q_vec", "c_vec")) / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "bucket", "neighbor_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate detection — the vector analog of the
    * MinHash text pipeline: candidate pairs come from an LSH-bucket
    * equi-join (never the corpus cross product), each candidate gets one
    * codegen'd `graft_dot` cosine, pairs at/above `threshold` become
    * keep/drop decisions (smaller id survives). All shuffles are
    * bucket-keyed; output size is bounded by LSH selectivity × threshold. */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
                        nPlanes: Int, threshold: Double): DataFrame = {
    val b = withBucketAndNorm(emb, idCol, vecCol, nPlanes)
    val a1 = b.select(col("bucket"), col(idCol).as("vec_a"),
      col(vecCol).as("e_a"), col("norm2").as("n_a"))
    val a2 = b.select(col("bucket").as("bucket2"), col(idCol).as("vec_b"),
      col(vecCol).as("e_b"), col("norm2").as("n_b"))
    a1.join(a2, col("bucket") === col("bucket2") && col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(TX.dotAuto("e_a", "e_b")) / (sqrt(col("n_a")) * sqrt(col("n_b")))))
      .filter(col("cosine") >= threshold)
      .select(col("bucket"), col("vec_a"), col("vec_b"), col("cosine"),
        col("vec_a").as("keep_id"), col("vec_b").as("drop_id"))
  }

  /** IVF coarse assignment: route each vector to its nearest centroid by
    * cosine (argmax via partial-aggregable max_by — no window over the
    * expanded (vector × centroid) set). Centroids are caller-supplied and
    * broadcast; production would refine them with Lloyd iterations (each a
    * repeat of this same assign + a mean-aggregate), which changes the
    * centroid table, not this operator. Ties: higher cosine wins, then the
    * smaller centroid id — total and deterministic. */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame, cenIdCol: String, cenVecCol: String): DataFrame = {
    val c = withNorm2(centroids, cenVecCol)
      .select(col(cenIdCol).as("centroid_id"), col(cenVecCol).as("c_vec"),
        col("norm2").as("c_norm2"))
    val e = withNorm2(emb, vecCol)
    val scored = e.crossJoin(broadcast(c))
      .withColumn("c_cos",
        when(col("norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dotAuto(vecCol, "c_vec")) / (sqrt(col("norm2")) * sqrt(col("c_norm2")))))
    // min_by over (-cosine, centroid_id): same partial-aggregable argmax,
    // but the id rides the ordering struct UN-negated, so the tie-break is
    // deterministic for ANY orderable id type (negating a string id would
    // be null — a silently nondeterministic winner, not an error)
    scored.groupBy(col(idCol))
      .agg(
        min_by(col("centroid_id"),
          struct((-coalesce(col("c_cos"), lit(-2.0))).as("c"),
            col("centroid_id").as("nc"))).as("centroid_id"),
        first(col(vecCol)).as(vecCol),  // constant within the group (same id)
        first(col("norm2")).as("norm2"))
  }

  /** IVF ANN: assign queries and corpus to cells, search only the query's
    * cell — the inverted-file scale path (cell equi-join replaces the cross
    * join, complementing the LSH variant). Exactly the nProbe=1 case of
    * [[ivfKnnMultiProbe]] (probe rank 1 picks the same top cell as
    * ivfAssign's max_by — same cosine-desc, centroid-asc tie-break), so it
    * DELEGATES there: one implementation of the score/rank tail to fix,
    * continuously re-proven by qx22's oracle through this path. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, cenIdCol: String, cenVecCol: String, k: Int): DataFrame =
    ivfKnnMultiProbe(queries, corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, k, nProbe = 1)
      .select("query_id", "centroid_id", "neighbor_id", "rank", "cosine")

  /** Per-vector nearest bucket-mate — the corpus-wide "nearest duplicate"
    * report (one row per vector that shares its LSH bucket with anyone:
    * its single best neighbor and the cosine). Unlike the kNN operators
    * there is NO small query side here — every vector is a query — so the
    * candidate set must come from the bucket equi-join (within-bucket
    * pairs, bounded by bucket size; re-split hot buckets with
    * [[cappedLshBuckets]] first if the embedding distribution skews), and
    * the per-vector argmax reduces map-side via max_by rather than
    * shuffling all pairs through a window. */
  def nearestInBucket(emb: DataFrame, idCol: String, vecCol: String,
                      nPlanes: Int): DataFrame = {
    val b = withBucketAndNorm(emb, idCol, vecCol, nPlanes)
    val l = b.select(col("bucket"), col(idCol).as("vec_a"),
      col(vecCol).as("e_a"), col("norm2").as("n_a"))
    val r = b.select(col("bucket").as("bucket2"), col(idCol).as("vec_b"),
      col(vecCol).as("e_b"), col("norm2").as("n_b"))
    l.join(r, col("bucket") === col("bucket2") && col("vec_a") =!= col("vec_b"))
      .withColumn("cosine",
        when(col("n_a") > 0 && col("n_b") > 0,
          expr(TX.dotAuto("e_a", "e_b")) / (sqrt(col("n_a")) * sqrt(col("n_b")))))
      // min_by on (-cosine, vec_b): type-agnostic deterministic tie-break
      // (see ivfAssign — negating a non-numeric id yields null and a
      // silently arbitrary winner)
      .groupBy(col("vec_a").as(idCol))
      .agg(min_by(
        struct(col("vec_b").as("neighbor_id"), col("cosine").as("cos")),
        struct((-coalesce(col("cosine"), lit(-2.0))).as("c"),
          col("vec_b").as("tb"))).as("__w"))
      .select(col(idCol), col("__w.neighbor_id").as("neighbor_id"),
        round(col("__w.cos"), 6).as("cosine"))
  }

  /** Multi-probe IVF: each query searches its `nProbe` nearest cells
    * instead of one — the standard recall/cost dial (cell boundaries cut
    * off true neighbors; probing adjacent cells recovers them for nProbe×
    * the candidate work, still nothing like the cross join). The corpus
    * keeps its single-cell assignment; only the small, broadcast query
    * side fans out, so the join stays a cell-keyed equi-join and per-cell
    * work scales with cell size, not corpus size. A neighbor can appear
    * via exactly one probed cell (corpus assignment is top-1), so no
    * dedup step is needed. Output adds which probe found each neighbor. */
  def ivfKnnMultiProbe(queries: DataFrame, corpus: DataFrame,
                       idCol: String, vecCol: String,
                       centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                       k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    requireSmallQuerySide(queries, "ivfKnnMultiProbe")
    val c = withNorm2(centroids, cenVecCol)
      .select(col(cenIdCol).as("centroid_id"), col(cenVecCol).as("c_vec"),
        col("norm2").as("c_norm2"))
    val q = withNorm2(queries, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm2").as("q_norm2"))
    // top-nProbe cells per query: window over the (small) query×centroid
    // frame only — the corpus never sees a window here
    val wProbe = Window.partitionBy("query_id")
      .orderBy(coalesce(col("q_cos"), lit(-2.0)).desc, col("centroid_id").asc)
    val qa = q.crossJoin(broadcast(c))
      .withColumn("q_cos",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dotAuto("q_vec", "c_vec")) / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
      .withColumn("probe_rank", row_number().over(wProbe).cast("long"))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("centroid_id"), col("probe_rank"),
        col("q_vec"), col("q_norm2"))
    val ca = ivfAssign(corpus, idCol, vecCol, centroids, cenIdCol, cenVecCol)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        col(vecCol).as("n_vec"), col("norm2").as("n_norm2"))
    val scored = ca.join(broadcast(qa), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("q_norm2") > 0 && col("n_norm2") > 0,
          expr(TX.dotAuto("q_vec", "n_vec")) / (sqrt(col("q_norm2")) * sqrt(col("n_norm2")))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine", "centroid_id", "probe_rank")
  }

  /** Large-to-large k-NN JOIN: every LEFT vector finds its k nearest
    * RIGHT vectors through a shared IVF grid — NEITHER side broadcasts,
    * which is what separates this from the kNN searches above (all of
    * which gate on [[requireSmallQuerySide]]). This is the kNN-graph /
    * cross-corpus-dedup primitive: self-join a 100 TB embedding table to
    * build the neighbor graph SemDeDup-style clustering consumes, or join
    * a new crawl against a curated corpus to score novelty, with both
    * sides at corpus scale.
    *
    * Scale shape (the reason this is not "ivfKnnMultiProbe with the cap
    * removed"):
    *  - The only broadcast-sized object is the CENTROID table, collapsed
    *    to a single-row array and broadcast into a map-side expression.
    *    Each left row computes its top-`nProbe` probe cells with
    *    `transform` + `array_sort` over that array — per-row O(nCells),
    *    NO window, NO shuffle: the multi-probe searches above rank probe
    *    cells with a window because their query side is tiny; a window
    *    keyed on the left id here would shuffle |L|·nCells rows before
    *    any candidate is scored.
    *  - The right side keeps its top-1 cell from [[ivfAssign]] (whose
    *    min_by aggregation is partially aggregable — map-side combine
    *    collapses the nCells candidates per row before the exchange).
    *  - The candidate set is the cell EQUI-join: shuffle keyed on
    *    centroid_id, |L|·nProbe + |R| rows in, Σ_cell |L_cell|·|R_cell|
    *    pairs out — never |L|×|R|. A hot cell is an ordinary skewed
    *    shuffle partition (AQE skew-join splits it); keep cells ~√N via
    *    [[graft.operators.Quantize.HighRecall.nCells]] so per-cell work
    *    stays bounded.
    *  - The per-query top-k is one row_number window keyed on the left
    *    id over the candidate pairs — the algorithm's output-scale data,
    *    not the corpus.
    * A (left, right) pair can surface via at most ONE probed cell (the
    * right side's assignment is top-1), so no dedup stage is needed.
    * Tie-breaks mirror the rest of the family: probe cells by (cosine
    * desc, centroid asc), neighbors by (cosine desc, id asc) — the
    * DuckDB oracle reproduces both orderings exactly.
    *
    * Output: (query_id, neighbor_id, rank, cosine, centroid_id,
    * probe_rank) — rank 1..k per query, probe_rank = which probe found
    * the neighbor. Self-pairs (same id) are excluded, matching
    * [[bruteForceKnn]]. With nProbe = nCells the candidate set is every
    * (cell-mate) pair of the full grid, and the result equals
    * [[bruteForceKnn]]'s ranking (PipelineOpsSpec gates this). */
  /** Map-side top-`nProbe` probe-cell assignment for a LARGE vector frame
    * — the piece that removes [[requireSmallQuerySide]] from the batch
    * operators. The centroid table collapses to ONE row holding a sorted
    * array of (id, vec, norm2) structs; broadcasting that row is the
    * entire "index" the map side needs. Each input row scores every
    * centroid inside a single expression, sorts by (negated cosine,
    * centroid id) — struct comparison gives exactly the (cosine desc, id
    * asc) tie-break the window-based searches use — and keeps the top
    * nProbe. Null-norm rows score as cosine -2 (sorts last), the
    * family's sentinel. Per-row O(nCells) compute, NO window, NO
    * shuffle. Output: (query_id, q_vec, q_norm2, probe_rank 1-based
    * long, centroid_id), nProbe rows per input row. */
  private[graft] def probeAssignLarge(emb: DataFrame, idCol: String, vecCol: String,
                                      centroids: DataFrame, cenIdCol: String,
                                      cenVecCol: String, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    GraftFunctions.register(emb.sparkSession)
    val centsOne = withNorm2(centroids, cenVecCol)
      .select(struct(col(cenIdCol).as("cid"), col(cenVecCol).as("cvec"),
        col("norm2").as("cn2")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("__cents"))
    val probeExpr = expr(
      s"""slice(array_sort(transform(__cents, c -> struct(
         |  CASE WHEN q_norm2 > 0 AND c.cn2 > 0
         |       THEN -(${TX.dotAuto("q_vec", "c.cvec")}) / (sqrt(q_norm2) * sqrt(c.cn2))
         |       ELSE CAST(2.0 AS DOUBLE) END AS negcos,
         |  c.cid AS cid))), 1, $nProbe)""".stripMargin)
    withNorm2(emb, vecCol)
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        col("norm2").as("q_norm2"))
      .crossJoin(broadcast(centsOne))
      .select(col("query_id"), col("q_vec"), col("q_norm2"),
        posexplode(probeExpr).as(Seq("__p", "__probe")))
      .select(col("query_id"), col("q_vec"), col("q_norm2"),
        (col("__p") + 1).cast("long").as("probe_rank"),
        col("__probe.cid").as("centroid_id"))
  }

  def ivfKnnJoin(left: DataFrame, right: DataFrame,
                 idCol: String, vecCol: String,
                 centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                 k: Int, nProbe: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    val qa = probeAssignLarge(left, idCol, vecCol,
      centroids, cenIdCol, cenVecCol, nProbe)
    val ca = ivfAssign(right, idCol, vecCol, centroids, cenIdCol, cenVecCol)
      .select(col(idCol).as("neighbor_id"), col("centroid_id"),
        col(vecCol).as("n_vec"), col("norm2").as("n_norm2"))
    // the cell equi-join — deliberately UN-hinted: at corpus scale both
    // sides are large and this is the shuffle the algorithm budgets for.
    // (Round-14 note: a salted+explicitly-repartitioned variant was tried
    // here and REVERTED — both assignment sides are map-side projections
    // whose scan statistics the planner sees, so the small side broadcasts
    // and the scoring already runs data-parallel on the corpus side's
    // input partitions; the salt's extra exchanges only added wall. The
    // batch-codes tail in Quantize keeps the salt because its index side
    // crosses a groupBy whose unknown size forces a sort-merge join there.)
    val scored = ca.join(qa, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        when(col("q_norm2") > 0 && col("n_norm2") > 0,
          expr(TX.dotAuto("q_vec", "n_vec")) / (sqrt(col("q_norm2")) * sqrt(col("n_norm2")))))
    // per-query ranking via the bounded top-k AGGREGATE, not a window: the
    // map-side partials collapse every partition's candidates to <=k per
    // query BEFORE the query-keyed exchange, so the shuffle moves the
    // answer, not the candidate set (graft_topk's doc has the contract).
    // Field 0 is the family's negated-cosine sentinel: -cos with null ->
    // 2.0 sorts exactly like the (cosine DESC NULLS LAST, id ASC) window
    // this replaces (2.0 > any -cos >= -1; -0.0/0.0 negate into the same
    // relative order). NaN cosines (a NaN vector COMPONENT — zero-norm
    // vectors are already null via the guard above) are mapped to the
    // same 2.0 sentinel explicitly: garbage input ranks last with the
    // nulls. This is a deliberate divergence from the window form, which
    // inherited Spark's NaN-sorts-greatest and ranked NaN FIRST under
    // cosine DESC — an ordering nobody wants and the implicit kind of
    // behavior this rewrite must not depend on.
    GraftFunctions.register(left.sparkSession)
    scored
      .withColumn("__negcos",
        coalesce(nanvl(-col("cosine"), lit(2.0)), lit(2.0)))
      .groupBy(col("query_id"))
      .agg(expr(
        s"graft_topk(struct(__negcos, neighbor_id, cosine, centroid_id, probe_rank), $k)")
        .as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
      .select(col("query_id"), col("__t.neighbor_id").as("neighbor_id"),
        (col("__p") + 1).cast("long").as("rank"),
        col("__t.cosine").as("cosine"),
        col("__t.centroid_id").as("centroid_id"),
        col("__t.probe_rank").as("probe_rank"))
  }

  /** Bucket re-splitting for skewed LSH buckets — the bound that keeps
    * per-bucket all-pairs work from becoming a straggler at scale. Buckets
    * whose population exceeds `maxBucketSize` get `extraPlanes` additional
    * deterministic sign bits appended (planes `nPlanes..nPlanes+extra-1`),
    * splitting the hot bucket ~2^extra-fold; small buckets keep their id
    * (sub-bucket 0). Output: (idCol, bucket, sub_bucket, n_in_bucket).
    * Fully engine-portable — the oracle mirrors it in SQL. */
  def cappedLshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                       nPlanes: Int, maxBucketSize: Long, extraPlanes: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val b = emb.select(col(idCol),
      expr(TX.lshBucketAuto(vecCol, nPlanes)).cast("long").as("bucket"),
      col(vecCol))
    val sizes = b.groupBy("bucket").agg(count(lit(1)).as("n_in_bucket"))
    // extra sign bits = high bits of a wider bucket id: planes are indexed
    // globally, so bucket(n+e) = bucket(n) + 2^n * extraBits
    val wide = expr(TX.lshBucketAuto(vecCol, nPlanes + extraPlanes)).cast("long")
    b.join(sizes, "bucket")
      .withColumn("sub_bucket",
        when(col("n_in_bucket") > maxBucketSize, shiftright(wide - col("bucket"), nPlanes))
          .otherwise(lit(0L)).cast("long"))
      .select(col(idCol), col("bucket"), col("sub_bucket"), col("n_in_bucket"))
  }

  /** Embedding-space DRIFT monitor — [[graft.operators.TextAnalysis.vocabDrift]]'s
    * twin for the vector side: when tomorrow's embedding snapshot stops
    * looking like today's (a new encoder checkpoint, a shifted crawl mix,
    * a silent preprocessing change), the per-dimension first moments move
    * first. Both snapshots reduce to per-dim (n, Σv, Σv²) censuses —
    * dims×partitions narrow rows after map-side partial aggregation, the
    * corpora themselves never shuffle — joined dim-on-dim (a dims-row
    * join), and the report ranks dims by the standardized mean shift
    * |mean_a − mean_b| / sqrt((var_a + var_b)/2 + ε).
    *
    * Engine-exact: sums run in decimal(30,10) (the kmeansUpdate idiom —
    * order-independent, partition-count-independent), and the shift
    * arithmetic after the cast back is division/sqrt only — IEEE-exact in
    * any engine, no transcendentals — so the oracle reproduces the
    * ranking bit-for-bit. Output: (dim, n_a, n_b, mean_a, mean_b, shift),
    * shift desc (6dp) with dim as tie-break, top `topK`. */
  def embeddingDrift(embA: DataFrame, embB: DataFrame, vecCol: String,
                     topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    def census(df: DataFrame, tag: String) = df
      .select(posexplode(col(vecCol)).as(Seq("__pos", "__v")))
      .groupBy((col("__pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as(s"n_$tag"),
        sum(col("__v").cast("double").cast("decimal(30,10)"))
          .cast("double").as(s"s_$tag"),
        sum((col("__v").cast("double") * col("__v").cast("double"))
          .cast("decimal(30,10)")).cast("double").as(s"q_$tag"))
    val j = census(embA, "a").join(census(embB, "b"), "dim")
    val meanA = col("s_a") / col("n_a")
    val meanB = col("s_b") / col("n_b")
    val varA = col("q_a") / col("n_a") - meanA * meanA
    val varB = col("q_b") / col("n_b") - meanB * meanB
    j.withColumn("shift", round(
        abs(meanA - meanB) / sqrt((varA + varB) / lit(2.0) + lit(1e-12)), 6))
      .select(col("dim"), col("n_a"), col("n_b"),
        round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"), col("shift"))
      .orderBy(col("shift").desc, col("dim").asc)
      .limit(topK)
  }
}
