package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, TextExprs => TX}

/** Int8 embedding quantization — the storage/IO compression a 100 TB
  * embedding corpus runs on. A float32 corpus quantized to int8 + one
  * float scale per vector is ~4× smaller on disk AND in shuffle, which at
  * this scale is the difference between an ANN index that fits executor
  * memory and one that spills.
  *
  * Scheme: symmetric per-vector scaling — s = max|v|/127, q_i =
  * floor(v_i/s + 0.5) ∈ [-127, 127], v̂_i = q_i·s, per-dim error ≤ s/2.
  * Engine-portable arithmetic (TextExprs.quant*): the qx52 oracle
  * recomputes scales/codes/errors in DuckDB and hash-matches, so the
  * quantizer itself is under the same gate as every operator. */
object Quantize {
  private implicit val d: Dialect = Dialect(spark = true)

  /** (idCol, q_scale float, q_codes array<tinyint>) — the storage form.
    * The scale is materialized as a column BEFORE the code lambda uses it:
    * inlining the max-abs fold into the per-element expression would
    * re-run it per element — O(d²) per vector. */
  def toInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol),
        expr(TX.quantScale(vecCol)).as("__s"))
      .select(col(idCol),
        col("__s").cast("float").as("q_scale"),
        expr(d.map(TX.quantCodes(vecCol, "__s"), "c", "CAST(c AS TINYINT)"))
          .as("q_codes"))

  /** Reconstruct float vectors from the storage form (lossy: per-dim
    * error ≤ q_scale/2). */
  def dequantize(quantized: DataFrame, idCol: String): DataFrame =
    quantized.select(col(idCol),
      expr("transform(q_codes, c -> CAST(CAST(c AS DOUBLE) * q_scale AS FLOAT))")
        .as("embedding"))

  /** Product-quantization ENCODE: split each `dims`-wide vector into
    * `nBlocks` equal sub-vectors and assign every (vector, block) the
    * nearest codebook entry's matching sub-vector by squared L2 — the
    * standard PQ code assignment (a 64-dim float vector compresses to
    * nBlocks bytes + the shared codebook). `codebook` holds FULL-width
    * centroid vectors (production would Lloyd-refine per block — that
    * changes the codebook table, not this operator).
    *
    * Scale shape: the codebook is tiny by definition → broadcast; the
    * corpus explodes only nBlocks× (bounded, not data-dependent) and the
    * per-(vector, block) argmin is a partial-aggregable min_by on
    * (distance, code) — no window over the corpus, nothing shuffles but
    * the grouped argmin on (id, block). Distances are the deterministic
    * sequential-fold dots (TextExprs.dot / native graft_dot), so the
    * DuckDB oracle reproduces the argmin bit-for-bit. */
  /** PQ ADC search (asymmetric distance computation): score every encoded
    * corpus vector against a small query set WITHOUT reconstructing —
    * per query, precompute the distance from each query sub-vector to
    * every codebook sub-vector (a Q×nBlocks×K lookup table, broadcast by
    * construction), then each corpus vector's approximate distance is the
    * SUM of its blocks' table entries: one (block, code)-keyed broadcast
    * join plus a grouped sum. This is why PQ exists — the corpus side
    * touches only its codes (nBlocks small ints per vector), never floats.
    *
    * Determinism: the per-block partial distances are the sequential-fold
    * dots, and the cross-block sum runs in DECIMAL(30,12) — exact and
    * order-independent — so ranking never depends on float reduction
    * order and the DuckDB oracle reproduces the top-k bit-for-bit.
    * Ranking: distance asc, then vec id asc (total order). */
  def pqSearch(queries: DataFrame, qIdCol: String, qVecCol: String,
               codes: DataFrame, codesIdCol: String, codebook: DataFrame,
               cidCol: String, cvecCol: String,
               dims: Int, nBlocks: Int, k: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    require(k >= 1, s"k=$k must be >= 1")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val w = dims / nBlocks
    val q = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__qsub", expr(d.slice("__qv", s"block * $w + 1", w)))
    val c = codebook
      .select(col(cidCol).as("code"), col(cvecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $w + 1", w)))
    // the lookup table: ||q_b − c_b||² per (query, block, code)
    val table = q.join(c, "block")
      .withColumn("__pd2",
        (expr(TX.dotAuto("__qsub", "__qsub"))
          - lit(2.0) * expr(TX.dotAuto("__qsub", "__csub"))
          + expr(TX.dotAuto("__csub", "__csub"))).cast("decimal(30,12)"))
      .select("query_id", "block", "code", "__pd2")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__d2").asc, col("vec_id").asc)
    codes.join(broadcast(table), Seq("block", "code"))
      .groupBy(col("query_id"), col(codesIdCol).as("vec_id"))
      .agg(sum(col("__pd2")).as("__d2"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("__d2").cast("double"), 6).as("dist2"))
  }

  /** The IVF-PQ INDEX: every corpus vector routed to its nearest coarse
    * centroid (cell) AND compressed to `nBlocks` PQ codes — the
    * production-shaped ANN artifact (FAISS's IndexIVFPQ layout: an
    * inverted list per cell holding code tuples, no floats). Built in one
    * logical pass over the corpus: the coarse assignment's grouped argmax
    * carries the vector through ([[Similarity.ivfAssign]] keeps `vecCol`),
    * and the encode step groups by (id, cell, block) — cell is
    * functionally dependent on id, so adding it to the key is free and
    * AVOIDS an id-keyed join of two corpus-sized derivatives. Shuffled
    * widths: (id, vec) for the assignment, (id, cell, block, code, d2)
    * for the encode — the second is constant-width; only the first
    * carries the vectors, once. ([[ivfPqIndexCodes]] is the gated
    * exchange-free alternative; measured at sf0.1 its fixed plan-time
    * costs — codebook count, one-row collapses, wider codegen units —
    * outweigh the two exchanges below ~100k rows, so the row build stays
    * the default and the codes build is the opt-in for corpus scales
    * where a vector-wide shuffle dominates.)
    *
    * Output: (idCol, centroid_id, block, code) — write it partitioned by
    * centroid_id and searches prune to probed cells at the FILE level. */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                 codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                 dims: Int, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dims / nBlocks
    val assigned = Similarity.ivfAssign(
      corpus, idCol, vecCol, centroids, cenIdCol, cenVecCol)
    val e = assigned
      .select(col(idCol), col("centroid_id"), col(vecCol),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__sub", expr(d.slice(vecCol, s"block * $w + 1", w)))
      .select(col(idCol), col("centroid_id"), col("block"), col("__sub"),
        expr(TX.dotAuto("__sub", "__sub")).as("__xx"))
    val c = codebook
      .select(col(cbIdCol).as("code"), col(cbVecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $w + 1", w)))
      .select(col("code"), col("block"), col("__csub"),
        expr(TX.dotAuto("__csub", "__csub")).as("__cc"))
    e.join(broadcast(c), "block")
      .withColumn("__d2",
        col("__xx") - lit(2.0) * expr(TX.dotAuto("__sub", "__csub")) + col("__cc"))
      .groupBy(col(idCol), col("centroid_id"), col("block"))
      .agg(min_by(col("code"),
        struct(col("__d2").as("d"), col("code").as("tb"))).as("code"))
  }

  /** IVF-PQ SEARCH — the composition of the two proven halves (qx22's
    * cell probing, qx64's ADC scoring) into the index real deployments
    * run: each query probes its `nProbe` nearest cells and ADC-scores
    * ONLY the codes filed in those cells. Cost per query = nProbe cells'
    * worth of constant-width code tuples; the corpus's floats are touched
    * exactly once, at index-build time.
    *
    * Scale shape: probes (Q×nProbe rows) and the ADC lookup table
    * (Q×nBlocks×K rows) are broadcast by construction; the index side is
    * an equi-join on centroid_id then (query_id, block, code) — map-side
    * against a centroid_id-partitioned index — and the cross-block sum is
    * a grouped partial aggregate. No window, no join ever sees the
    * corpus×query product.
    *
    * Determinism: identical to [[pqSearch]] — sequential-fold dots,
    * DECIMAL(30,12) cross-block sums, (distance asc, id asc) total order —
    * so the DuckDB oracle reproduces the top-k bit-for-bit.
    * Output mirrors the IVF operators: which cell and probe found each
    * neighbor ride along. */
  def ivfPqSearch(queries: DataFrame, qIdCol: String, qVecCol: String,
                  corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                  codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                  dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame =
    ivfPqSearchOn(
      ivfPqIndex(corpus, idCol, vecCol, centroids, cenIdCol, cenVecCol,
        codebook, cbIdCol, cbVecCol, dims, nBlocks),
      queries, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)

  /** Top-nProbe cells per query: window over the small query×centroid
    * frame only (same shape as ivfKnnMultiProbe's probe step). Output:
    * (query_id, centroid_id, probe_rank). */
  private[graft] def probeCells(queries: DataFrame, qIdCol: String, qVecCol: String,
                         centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                         nProbe: Int): DataFrame = {
    val cen = Similarity.withNorm2(centroids, cenVecCol)
      .select(col(cenIdCol).as("centroid_id"), col(cenVecCol).as("c_vec"),
        col("norm2").as("c_norm2"))
    val q = Similarity.withNorm2(queries, qVecCol)
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("q_vec"),
        col("norm2").as("q_norm2"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(coalesce(col("q_cos"), lit(-2.0)).desc, col("centroid_id").asc)
    q.crossJoin(broadcast(cen))
      .withColumn("q_cos",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dotAuto("q_vec", "c_vec"))
            / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
      .withColumn("probe_rank", row_number().over(wProbe).cast("long"))
      .filter(col("probe_rank") <= nProbe)
      .select(col("query_id"), col("centroid_id"), col("probe_rank"))
  }

  // ------------------------------------------------------------------
  // Driver-evaluated probe planning (round 12). The stored searches
  // collect the distinct probed-cell list to build the partition-pruning
  // literal — one Spark job per request. When BOTH inputs are
  // driver-local (the serving shape: a one-row query frame and the
  // memoized quantizers), the same top-nProbe-by-cosine ranking is
  // computed here with arithmetic IEEE-identical to the plan's:
  // sequential float→double product fold (= graft_dot / DotProduct.dot),
  // cos = dot/(sqrt(qn)·sqrt(cn)) only when both norms > 0 else the
  // window's coalesce(-2.0), ordering cos desc with NaN largest (Spark's
  // NaN semantics) and centroid_id asc ties (binary UTF8 order for
  // string ids). Exactness matters: the ADC plan ranks cells with the
  // Spark-side expression, and the pruning literal must name the same
  // cells — a near-miss would silently drop candidates. The oracle gates
  // (qx113/qx116/qx124 run this path) re-verify the equivalence on real
  // data every round.
  // ------------------------------------------------------------------

  private def localElemsOk(df: DataFrame, vecCol: String): Boolean =
    df.schema.apply(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType |
        org.apache.spark.sql.types.DoubleType, _) => true
      case _ => false
    }

  private def localToD(v: Any): Double = v match {
    case f: java.lang.Float => f.toDouble
    case d: java.lang.Double => d.doubleValue()
    case other => other.toString.toDouble // unreachable under localElemsOk
  }

  /** DotProduct.dot's exact null/short-array semantics over external rows. */
  private def localDot(a: scala.collection.Seq[Any],
                       b: scala.collection.Seq[Any]): java.lang.Double = {
    val n = a.length
    if (b.length < n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      if (x == null || y == null) return null
      acc += localToD(x) * localToD(y)
      i += 1
    }
    acc
  }

  /** The driver-evaluated twin of probeCells' distinct cell list — Some
    * only when both frames are LocalRelations, the vec columns are
    * array<float|double>, and the centroid id type has a replicable
    * ordering; None falls back to the distributed collect. */
  private def probeCellsLocal(queries: DataFrame, qIdCol: String, qVecCol: String,
                              centroids: DataFrame, cenIdCol: String,
                              cenVecCol: String, nProbe: Int): Option[Seq[Any]] = {
    if (!localElemsOk(queries, qVecCol) || !localElemsOk(centroids, cenVecCol))
      return None
    for {
      ord <- DriverPlan.idOrdering(centroids.schema.apply(cenIdCol).dataType)
      qRows <- DriverPlan.localRows(queries.select(col(qIdCol), col(qVecCol)))
      cRows <- DriverPlan.localRows(
        centroids.select(col(cenIdCol), col(cenVecCol)))
      if cRows.forall(_.get(0) != null) // null ids: let Spark order them
    } yield {
      val cens = cRows.map { r =>
        val v = r.get(1).asInstanceOf[scala.collection.Seq[Any]]
        val n2 = if (v == null) null else localDot(v, v)
        (r.get(0), v, n2)
      }
      val out = new scala.collection.mutable.LinkedHashSet[Any]
      qRows.foreach { qr =>
        val qv = qr.get(1).asInstanceOf[scala.collection.Seq[Any]]
        val qn2 = if (qv == null) null else localDot(qv, qv)
        val scored = cens.map { case (cid, cv, cn2) =>
          // when(q_norm2 > 0 && c_norm2 > 0, dot/(√q·√c)) else null,
          // then coalesce(cos, -2.0); NaN sorts LARGEST under desc.
          // Spark's comparison semantics treat NaN as GREATER than any
          // value, so a NaN norm PASSES the > 0 gate there — the twin
          // must mirror that (NaN norm → NaN cosine → ranks first), not
          // map it to -2.0 (last), or the driver-built pruning literal
          // could omit cells the distributed plan would probe.
          def gateP(n2: Double): Boolean = n2 > 0.0 || n2.isNaN
          val cos: Double =
            if (qn2 == null || cn2 == null ||
                !gateP(qn2.doubleValue()) || !gateP(cn2.doubleValue())) -2.0
            else {
              val d = localDot(qv, cv)
              if (d == null) -2.0
              else d / (math.sqrt(qn2) * math.sqrt(cn2))
            }
          (cid, cos)
        }
        val ranked = scored.sortWith { case ((ida, ca), (idb, cb)) =>
          val na = java.lang.Double.isNaN(ca); val nb = java.lang.Double.isNaN(cb)
          if (na != nb) na // NaN first under desc
          else if (!na && ca != cb) ca > cb
          else ord.lt(ida, idb)
        }
        ranked.take(nProbe).foreach { case (cid, _) => out.add(cid) }
      }
      out.toSeq
    }
  }

  /** The distinct probed-cell list every stored search prunes on —
    * driver-evaluated when the serving shape allows (no job), the
    * probeCells collect otherwise. */
  private def probedCellIds(queries: DataFrame, qIdCol: String, qVecCol: String,
                            centroids: DataFrame, cenIdCol: String,
                            cenVecCol: String, nProbe: Int): Seq[Any] =
    probeCellsLocal(queries, qIdCol, qVecCol, centroids, cenIdCol, cenVecCol,
      nProbe).getOrElse(
      probeCells(queries, qIdCol, qVecCol, centroids, cenIdCol, cenVecCol,
          nProbe)
        .select("centroid_id").distinct().collect().map(_.get(0)).toSeq)

  /** The search tail over an ALREADY-BUILT index (in-memory from
    * [[ivfPqIndex]] or a pruned read of a persisted one) — probes +
    * ADC tables + cell equi-join + decimal sums. */
  private[graft] def ivfPqSearchOn(index: DataFrame,
                            queries: DataFrame, qIdCol: String, qVecCol: String,
                            idCol: String,
                            centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                            codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                            dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    Similarity.requireSmallQuerySide(queries, "ivfPqSearch")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val wSub = dims / nBlocks
    val probes = probeCells(queries, qIdCol, qVecCol,
      centroids, cenIdCol, cenVecCol, nProbe)
    // ADC lookup table: ||q_b − c_b||² per (query, block, code), decimal
    val qb = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__qsub", expr(d.slice("__qv", s"block * $wSub + 1", wSub)))
    val cb = codebook
      .select(col(cbIdCol).as("code"), col(cbVecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $wSub + 1", wSub)))
    // the codebook side is K×nBlocks rows BY DEFINITION — broadcast it
    // explicitly (the other side has just crossed a window, so the
    // planner's size estimate for it is unknown and a sort-merge join on
    // `block` would sort both tiny frames through an exchange for nothing)
    val table = qb.join(broadcast(cb), "block")
      .withColumn("__pd2",
        (expr(TX.dotAuto("__qsub", "__qsub"))
          - lit(2.0) * expr(TX.dotAuto("__qsub", "__csub"))
          + expr(TX.dotAuto("__csub", "__csub"))).cast("decimal(30,12)"))
      .select("query_id", "block", "code", "__pd2")
    // candidates = codes filed in probed cells; both small sides broadcast
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__d2").asc, col("vec_id").asc)
    index.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("query_id") =!= col(idCol))
      .join(broadcast(table), Seq("query_id", "block", "code"))
      .groupBy(col("query_id"), col(idCol).as("vec_id"))
      .agg(sum(col("__pd2")).as("__d2"),
        first(col("centroid_id")).as("centroid_id"), // single-valued per vec
        first(col("probe_rank")).as("probe_rank"))   // single cell per vec
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("__d2").cast("double"), 6).as("dist2"),
        col("centroid_id"), col("probe_rank"))
  }

  /** BATCH ADC search: every row of a LARGE query frame searches the
    * index — the [[Similarity.ivfKnnJoin]] restructuring applied to the
    * PQ-coded index, removing [[ivfPqSearchOn]]'s small-query-side gate.
    * This is what lets corpus-scale batch jobs (dedup the whole store,
    * score a whole crawl) run against the PRODUCTION index instead of
    * raw vectors: the corpus floats were read once at build time; this
    * pass touches only codes.
    *
    * Restructuring vs the broadcast-query search:
    *  - probe cells come from [[Similarity.probeAssignLarge]] (map-side
    *    expression over the single-row broadcast centroid array — no
    *    window, no shuffle), not the windowed [[probeCells]];
    *  - there is no broadcast per-(query, block, code) ADC lookup table
    *    (it would be |Q|×nBlocks×K rows — exactly what cannot broadcast
    *    at batch scale). Instead the codebook's per-block subvectors
    *    (K×nBlocks rows, broadcast by definition) attach to each
    *    candidate code tuple after the cell equi-join and the partial
    *    distance is computed in place from the query vector riding the
    *    probe row. Per-candidate compute trades a second large shuffle
    *    (candidates ⋈ LUT on query_id) for w-dim dots inside one
    *    codegen'd stage — the shuffle-minimal choice;
    *  - the candidate volume is the algorithm's own output-scale work:
    *    Σ_probed-cell |cell| code tuples, never |Q|×|corpus|.
    * Determinism is byte-identical to [[ivfPqSearchOn]]: same per-block
    * formula, same DECIMAL(30,12) cross-block sums, same (dist asc, id
    * asc) order — BatchingOpsSpec gates equality on a shared query set
    * and the qx87 oracle hash-matches the whole-corpus batch. */
  def ivfPqSearchAll(queries: DataFrame, qIdCol: String, qVecCol: String,
                     index: DataFrame, idCol: String,
                     centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                     codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                     dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame =
    ivfPqSearchAllCodes(queries, qIdCol, qVecCol,
      regroupCodes(index, idCol, nBlocks), idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)

  /** [[ivfPqSearchAll]] for a RESIDUAL-coded index — the batch search for
    * the SHIPPED configuration (the high-recall default is a residual
    * store). Same restructuring, one residual twist: the partial
    * distances compare (query − probed-cell centroid) sub-vectors against
    * the residual codewords, so each probe row picks up its centroid's
    * VECTOR from the broadcast centroid table and carries the per-cell
    * query residual into the candidate join; everything downstream
    * (per-candidate compute against the broadcast codebook,
    * DECIMAL(30,12) cross-block sums, tie-breaks) is byte-identical to
    * [[ivfPqSearchResidualOn]] — BatchingOpsSpec gates the equality and
    * the qx88 oracle hash-matches the whole-corpus batch. */
  def ivfPqSearchAllResidual(queries: DataFrame, qIdCol: String, qVecCol: String,
                             index: DataFrame, idCol: String,
                             centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                             codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                             dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame =
    ivfPqSearchAllResidualCodes(queries, qIdCol, qVecCol,
      regroupCodes(index, idCol, nBlocks), idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)

  // ---- codes-array batch path -------------------------------------------
  // The (id, cell, block, code) ROW shape is the persistence contract
  // (partition-pruned stores, per-block epoch overwrites); the BATCH hot
  // path wants one row per VECTOR. The *Codes operators carry the whole
  // code tuple as a positional array so the cell equi-join moves nBlocks×
  // fewer rows and the cross-block ADC distance is ONE codegen'd
  // expression per candidate — no broadcast (block, code) LUT join and no
  // (query, vec) re-aggregation exchange. The row-shaped APIs above
  // delegate here through [[regroupCodes]]; BatchingOpsSpec pins both
  // shapes byte-identical to the broadcast-query searches.

  /** (id, cell, block, code) rows → (id, cell, codes positional array):
    * one narrow index-scale exchange (cheaper than the candidate-scale
    * exchange it replaces downstream). Block-keyed map lookup makes the
    * array positional regardless of row order. */
  private def regroupCodes(index: DataFrame, idCol: String, nBlocks: Int): DataFrame =
    index.groupBy(col(idCol), col("centroid_id"))
      // array_distinct first: an unhealed retried append double-lands
      // identical (id, cell, block, code) rows, and map_from_entries
      // hard-fails on duplicate keys (mapKeyDedupPolicy=EXCEPTION) — the
      // row-path search tolerated that store state, so this one must too
      .agg(map_from_entries(array_distinct(
        collect_list(struct(col("block"), col("code"))))).as("__bm"))
      .withColumn("codes", expr((0 until nBlocks)
        .map(b => s"element_at(__bm, CAST($b AS BIGINT))")
        .mkString("array(", ", ", ")")))
      .select(col(idCol), col("centroid_id"), col("codes"))

  /** One-row broadcastable codebook, ENCODE shape: per code, the
    * per-block sub-vectors and their self-dots, as an array the argmin
    * expression iterates. */
  private def codebookArrOneRow(codebook: DataFrame, cbIdCol: String,
                                cbVecCol: String, wSub: Int, nBlocks: Int): DataFrame =
    codebook
      .select(col(cbIdCol).as("code"), col(cbVecCol).as("__cv"))
      .withColumn("csubs", expr(
        s"transform(sequence(0, ${nBlocks - 1}), b -> ${d.slice("__cv", s"b * $wSub + 1", wSub)})"))
      .withColumn("ccs", expr(s"transform(csubs, s -> ${TX.dotAuto("s", "s")})"))
      .agg(collect_list(struct(col("code"), col("csubs"), col("ccs"))).as("__cb"))

  /** Adds `__subs` (per-block sub-vectors of `vCol`, positional) and
    * `__xxs` (their self-dots). LITERAL-unrolled (array(slice...,
    * slice...)) rather than a `transform` lambda: higher-order functions
    * are CodegenFallback in Spark — interpreted per row — and these
    * columns sit on per-candidate/per-vector hot paths where that
    * interpretation costs more than every exchange this path removed. */
  private def withSubs(dfv: DataFrame, vCol: String, w: Int, nBlocks: Int): DataFrame =
    dfv
      .withColumn("__subs", expr((0 until nBlocks)
        .map(b => d.slice(vCol, s"${b * w + 1}", w))
        .mkString("array(", ", ", ")")))
      .withColumn("__xxs", expr((1 to nBlocks)
        .map(b => TX.dotAuto(s"element_at(__subs, $b)", s"element_at(__subs, $b)"))
        .mkString("array(", ", ", ")")))

  /** Per-vector PQ codes in one map-side expression: for each block the
    * argmin over the broadcast codebook of ||sub − csub||², picked with
    * `least` over (distance, code) structs — the exact (d asc, code asc)
    * tie-break the row path's min_by uses (same struct type ordering).
    * Fully unrolled over literal (block, code) ordinals so every node is
    * codegen'd (element_at / slice / least / struct — no higher-order
    * lambda anywhere); the codebook cardinality is therefore needed at
    * PLAN time, which is fine: a PQ codebook is metadata-small by the
    * operator's own broadcast contract. Needs `__subs`/`__xxs`
    * ([[withSubs]]) and the crossed-in `__cb`. */
  private def codesExpr(nBlocks: Int, kCodes: Int): String = {
    val blocks = (1 to nBlocks).map { b =>
      val cands = (1 to kCodes).map { k =>
        val csub = s"element_at(element_at(__cb, $k).csubs, $b)"
        s"""struct(element_at(__xxs, $b)
           |  - CAST(2.0 AS DOUBLE) * ${TX.dotAuto(s"element_at(__subs, $b)", csub)}
           |  + element_at(element_at(__cb, $k).ccs, $b) AS d,
           |  element_at(__cb, $k).code AS code)""".stripMargin
      }
      if (cands.size == 1) s"${cands.head}.code"
      else s"least(${cands.mkString(",\n")}).code"
    }
    blocks.mkString("array(", ", ", ")")
  }

  /** Element-wise a − b over two `dims`-wide vectors, LITERAL-unrolled
    * (array of per-index casts/subtractions) instead of `zip_with`:
    * zip_with is a CodegenFallback higher-order function, and on the
    * residual paths this column sits under projections that Catalyst may
    * collapse into the per-CANDIDATE evaluation — an interpreted lambda
    * re-run a million times is exactly the cliff the codes path exists
    * to avoid. Values are identical (same per-element double casts). */
  private def residualExpr(aCol: String, bCol: String, dims: Int): String =
    (1 to dims).map(i =>
      s"(CAST(element_at($aCol, $i) AS DOUBLE) - CAST(element_at($bCol, $i) AS DOUBLE))")
      .mkString("array(", ", ", ")")

  /** Exact SQL sum of DECIMAL(30,12) terms: ≤8 additions grow precision
    * by 1 each (caps at 38) with scale 12 preserved — value-identical to
    * sum(DECIMAL(30,12)); >8 terms re-normalize per 8-group (exact while
    * group sums fit 18 integer digits, the headroom the aggregate sum
    * itself needs). */
  private def decimalSumChain(parts: Seq[String]): String =
    if (parts.lengthCompare(8) <= 0) parts.mkString("(", " + ", ")")
    else decimalSumChain(parts.grouped(8).map(g =>
      s"CAST(${g.mkString("(", " + ", ")")} AS DECIMAL(30,12))").toSeq)

  /** Shared candidate-scoring tail: cell equi-join (THE shuffle the
    * algorithm budgets for) → per-candidate cross-block ADC distance via
    * a PER-PROBE-ROW lookup table → rank aggregate. `probes` must carry
    * (query_id, centroid_id, probe_rank, __qsubs, __qxxs).
    *
    * Round-14 restructurings, both value-identical by construction:
    *
    *  1. ADC LUT ON THE PROBE ROW (guide §8: compute on the proxy, not
    *     the payload). The per-block partial distance depends only on
    *     (probe row, block, code) — kCodes×nBlocks values — yet the old
    *     tail recomputed it per CANDIDATE: Σ|cell| × nBlocks w-dim dots
    *     plus, worse, that many double→DECIMAL(30,12) casts
    *     (BigDecimal.valueOf → Double.toString — measured to dominate
    *     the stage: ~4M casts/run at sf0.1, ~3.5 s of one-core CPU).
    *     Now each probe row computes its kCodes×nBlocks partials ONCE
    *     into a code-keyed map of per-block DECIMAL arrays (unrolled
    *     `map(...)` over literal ordinals — CreateMap/element_at are
    *     codegen'd, no higher-order lambda), and a candidate just picks
    *     nBlocks array elements and sums. Same double expression, same
    *     cast, same block order → bit-identical __d2.
    *
    *  2. SALTED, EXPLICITLY-PARTITIONED CELL JOIN (guide §2.5). The
    *     join key has only nCells distinct values; when nCells is below
    *     the core count the scoring stage cannot spread — and AQE's
    *     byte-based coalescing makes it worse by merging the tiny-BYTES
    *     but CPU-heavy post-join partitions to one task (measured: the
    *     whole candidate scoring of qx87/qx88 ran as ONE 3.5-5 s task).
    *     When nCells < 4×shufflePartitions, salt the index side by
    *     pmod(xxhash64(id), S) with S = ceil(4P/nCells), explode the
    *     probe side ×S, and repartition BOTH sides by (cell, salt) with
    *     an explicit partition count — REPARTITION_BY_NUM is exempt
    *     from AQE coalescing, so the scoring stage keeps P tasks. At
    *     production scale nCells ≥ 4P, S = 1, and the plain equi-join
    *     (exactly the old plan) is used: zero overhead where cells are
    *     plentiful. Every (index row, probe row) pair still meets
    *     exactly once (the index row's salt is one of the probe's S),
    *     so the candidate set is unchanged. */
  private def searchCodesTail(indexCodes: DataFrame, probes: DataFrame,
                              cbArr: DataFrame, kCodes: Int, nCells0: Long,
                              idCol: String, nBlocks: Int, k: Int): DataFrame = {
    // Round-15 (guide §1.2 step 2, per-task work): the per-candidate
    // DECIMAL(30,12) sum chain was the stage's remaining cost — precision
    // 30 decimals are BigDecimal-backed, so every candidate paid nBlocks−1
    // allocating BigDecimal adds (measured: ~16 s of task time on qx88's
    // ~candidate-scale input at sf0.1, the single biggest compute block in
    // the bench). Replace it with an EXACT hi/lo long-pair sum: each LUT
    // partial is split once per (probe row, code, block) into
    //   h = trunc(dec)          (CAST DECIMAL→BIGINT)
    //   l = (dec − h) × 1e12    (exact: scale-12 fraction as an integer)
    // so dec = h + l/1e12 exactly, and a candidate sums plain longs
    // (whole-stage-codegen primitive ops, zero allocation). Overflow is
    // impossible for nBlocks ≤ 9: |dec| < 1e18 (DECIMAL(30,12) cast
    // nulls out anything larger), so |Σh| ≤ 9×(1e18−1) < 2^63−1 and
    // |Σl| < 9×1e12. Paths with nBlocks > 9 keep the decimal chain.
    // Null partials (|double| ≥ 1e18 or NaN) null both h and l, so the
    // summed pair nulls out exactly where the decimal sum did.
    val useLongPair = nBlocks <= 9
    // per-probe-row LUT: map from code id → array of per-block DECIMAL
    // partials. Literal-unrolled over (code ordinal, block): every node
    // (element_at / struct access / graft_dot / map()) is codegen'd, and
    // each partial's (dot + cast) expression appears exactly ONCE — the
    // hi/lo split below binds the computed decimal as a lambda variable
    // instead of re-inlining the expression (a literal-unrolled split was
    // measured 10× slower on the residual path: three copies of the
    // residual+slice+dot tree per partial blew the codegen budget).
    val lutArgs = (1 to kCodes).flatMap { kk =>
      val ent = s"element_at(__cb, $kk)"
      val blocks = (1 to nBlocks).map { b =>
        s"""CAST((element_at(__qxxs, $b)
           |  - CAST(2.0 AS DOUBLE) * ${TX.dotAuto(s"element_at(__qsubs, $b)", s"element_at($ent.csubs, $b)")}
           |  + element_at($ent.ccs, $b)) AS DECIMAL(30,12))""".stripMargin
      }
      Seq(s"$ent.code", blocks.mkString("array(", ", ", ")"))
    }
    // hi/lo split of every LUT partial, ONCE PER PROBE ROW (kCodes×nBlocks
    // interpreted lambda applications — planning-scale next to the
    // per-candidate work this feeds): dec = h + l/1e12 exactly, see the
    // header note.
    val lutSplit =
      """transform_values(__lutd, (__ck, __arr) -> transform(__arr, __dec ->
        |  named_struct('h', CAST(__dec AS BIGINT),
        |    'l', CAST((__dec - CAST(CAST(__dec AS BIGINT) AS DECIMAL(30,12)))
        |         * 1000000000000 AS BIGINT))))""".stripMargin
    val probesLut = probes
      .crossJoin(broadcast(cbArr))
      .withColumn("__lutd", expr(lutArgs.mkString("map(", ", ", ")")))
      .withColumn("__lutm", if (useLongPair) expr(lutSplit) else col("__lutd"))
      .select(col("query_id"), col("centroid_id"), col("probe_rank"),
        col("__lutm"))
    // per-candidate: nBlocks array picks + the long-pair (or decimal) sum
    // — no dots, no double→decimal casts on the candidate path
    val parts = (1 to nBlocks).map { b =>
      s"element_at(element_at(__lutm, element_at(codes, $b)), $b)"
    }
    // parallelism of the scoring stage: see doc point 2
    val spark = probes.sparkSession
    val pTarget = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val nCells = math.max(1L, nCells0)
    val saltS = math.min(pTarget.toLong,
      math.max(1L, (4L * pTarget + nCells - 1) / nCells)).toInt
    // Round-15 flip of the salt direction: the r14 salt exploded the
    // PROBE side ×S, so every probe row's kCodes×nBlocks LUT map crossed
    // the exchange S times (the probe row is the FAT side — the map
    // dominates its bytes), while index rows are a few dozen bytes. Now
    // the cheap INDEX rows explode ×S and the probe side salts by a hash
    // of query_id — every (index, probe) pair still meets exactly once
    // (the probe's salt is one of the index row's S), the scoring stage
    // keeps its P REPARTITION_BY_NUM tasks, and the shuffled LUT bytes
    // drop ×S. Same S=1 no-op at production cell counts.
    val joined =
      if (saltS <= 1) indexCodes.join(probesLut, Seq("centroid_id"))
      else {
        val idx = indexCodes
          .withColumn("__salt", explode(expr(s"sequence(0L, ${saltS - 1}L)")))
          .repartition(pTarget, col("centroid_id"), col("__salt"))
        val prb = probesLut
          .withColumn("__salt", pmod(xxhash64(col("query_id")), lit(saltS.toLong)))
          .repartition(pTarget, col("centroid_id"), col("__salt"))
        idx.join(prb, Seq("centroid_id", "__salt")).drop("__salt")
      }
    // ranking via the bounded top-k AGGREGATE, not a window: a window
    // shuffles and sorts EVERY candidate on a decimal key; graft_topk's
    // partial aggregation collapses each partition's candidates to <=k
    // per query map-side, so the query-keyed exchange moves k rows per
    // query — the answer, not the candidate set. Ordering (struct field
    // order: __d2, vec_id, then carried payload) is bit-identical to the
    // (d2 asc, id asc) window this replaces; (d2, vec_id) is unique per
    // candidate so the payload fields never participate in a compare.
    val scored = joined // the budgeted shuffle
      .filter(col("query_id") =!= col(idCol))
    if (useLongPair) {
      // exact long-pair sum, carry-normalized so (hiN, loN) is the unique
      // normal form of the distance: loN ∈ [0, 1e12), value = hiN+loN/1e12.
      // Lexicographic (hiN, loN) compare ≡ exact value compare, and the
      // single-long proxy hiN×1e12+loN (saturated outside ±9e6 integer
      // range, where it would overflow) is strictly monotone below the
      // saturation bands — equal proxies there imply equal values, so the
      // final (value asc, vec_id asc) order is bit-identical to the
      // decimal chain's.
      val hiSum = parts.map(p => s"$p.h").mkString("(", " + ", ")")
      val loSum = parts.map(p => s"$p.l").mkString("(", " + ", ")")
      scored
        .withColumn("__losum", expr(loSum))
        .withColumn("__lon", expr("pmod(__losum, 1000000000000)"))
        .withColumn("__hin", expr(s"$hiSum + (__losum - pmod(__losum, 1000000000000)) div 1000000000000"))
        .select(col("query_id"), col(idCol).as("vec_id"),
          // field 0 = the cheap monotone long proxy for graft_topk's
          // fast-reject (one primitive compare per candidate on a warmed
          // heap); the normalized pair right behind it settles the
          // saturated bands exactly
          expr("""CASE WHEN __hin IS NULL THEN CAST(NULL AS BIGINT)
                 |     WHEN __hin >= 9000000 THEN 9223372036854775807
                 |     WHEN __hin <= -9000000 THEN -9223372036854775807
                 |     ELSE __hin * 1000000000000 + __lon END""".stripMargin).as("__pxy"),
          col("__hin"), col("__lon"), col("centroid_id"), col("probe_rank"))
        .groupBy(col("query_id"))
        .agg(expr(s"graft_topk(struct(__pxy, __hin, __lon, vec_id, centroid_id, probe_rank), $k)")
          .as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
        .select(col("query_id"), col("__t.vec_id").as("neighbor_id"),
          (col("__p") + 1).cast("long").as("rank"),
          // reconstruct the exact DECIMAL value from the pair (k rows per
          // query, not per candidate): hiN + loN×1e-12 is exact at scale
          // 12, so the double cast (and its 6-dp round) is byte-identical
          // to CAST(<decimal chain> AS DOUBLE)
          round(expr("""CAST(CAST(__t.__hin AS DECIMAL(30,12))
                       |  + CAST(__t.__lon AS DECIMAL(20,0)) * 0.000000000001 AS DOUBLE)""".stripMargin), 6)
            .as("dist2"),
          col("__t.centroid_id").as("centroid_id"),
          col("__t.probe_rank").as("probe_rank"))
    } else {
      scored
        .withColumn("__d2", expr(decimalSumChain(parts)))
        .select(col("query_id"), col(idCol).as("vec_id"), col("__d2"),
          // field 0 = the DOUBLE cast of the exact decimal: a monotone
          // proxy that lets graft_topk's fast-reject skip the decimal
          // compare (and the struct allocation) for the common worse-than-
          // worst candidate; the exact decimal right behind it settles
          // double-collisions, so the order is still the exact one
          col("__d2").cast("double").as("__d2d"),
          col("centroid_id"), col("probe_rank"))
        .groupBy(col("query_id"))
        .agg(expr(s"graft_topk(struct(__d2d, __d2, vec_id, centroid_id, probe_rank), $k)")
          .as("__top"))
        .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
        .select(col("query_id"), col("__t.vec_id").as("neighbor_id"),
          (col("__p") + 1).cast("long").as("rank"),
          round(col("__t.__d2").cast("double"), 6).as("dist2"),
          col("__t.centroid_id").as("centroid_id"),
          col("__t.probe_rank").as("probe_rank"))
    }
  }

  /** [[ivfPqIndex]] in BATCH shape — one row per vector, `codes`
    * positional — and fully MAP-SIDE: coarse assignment via
    * [[Similarity.probeAssignLarge]] (nProbe=1 picks ivfAssign's cell —
    * same cosine-desc, id-asc tie-break) and the per-block argmin as one
    * expression against the broadcast one-row codebook. ZERO exchanges
    * where the row path pays two corpus-scale groupBys (one of them
    * carrying the vectors) — BatchingOpsSpec gates bit-equality against
    * the row algorithm. OPT-IN, not the default build: measured at
    * sf0.1 the fixed costs (plan-time codebook count, one-row
    * collapses, K×nBlocks-unrolled codegen units) outweigh the saved
    * exchanges below ~100k vectors; the crossover is where the
    * vector-wide assignment shuffle dominates — exactly the 100 TB
    * regime this variant exists for. */
  def ivfPqIndexCodes(corpus: DataFrame, idCol: String, vecCol: String,
                      centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                      codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                      dims: Int, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dims / nBlocks
    val assigned = Similarity.probeAssignLarge(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, nProbe = 1)
      .select(col("query_id").as(idCol), col("centroid_id"), col("q_vec").as("__v"))
    encodeCodes(assigned, idCol, codebook, cbIdCol, cbVecCol, w, nBlocks)
  }

  /** [[ivfPqIndexResidual]] in BATCH shape — map-side like
    * [[ivfPqIndexCodes]]; the assigned row picks up its cell centroid
    * from the broadcast table and encodes the residual. */
  def ivfPqIndexResidualCodes(corpus: DataFrame, idCol: String, vecCol: String,
                              centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                              codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                              dims: Int, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dims / nBlocks
    val cen = centroids.select(col(cenIdCol).as("centroid_id"),
      col(cenVecCol).as("__cenv"))
    val assigned = Similarity.probeAssignLarge(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, nProbe = 1)
      .select(col("query_id").as(idCol), col("centroid_id"), col("q_vec").as("__v0"))
      .join(broadcast(cen), "centroid_id")
      .withColumn("__v", expr(residualExpr("__v0", "__cenv", dims)))
      .select(col(idCol), col("centroid_id"), col("__v"))
    encodeCodes(assigned, idCol, codebook, cbIdCol, cbVecCol, w, nBlocks)
  }

  private def encodeCodes(assigned: DataFrame, idCol: String,
                          codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                          w: Int, nBlocks: Int): DataFrame = {
    // plan-time cardinality for the unrolled argmin — one metadata-scale
    // count of a table the operator broadcasts anyway (the 1024 cap
    // bounds the generated expression tree; real PQ codebooks are <=256)
    val kCodes = codebook.count().toInt
    require(kCodes >= 1 && kCodes <= 1024,
      s"codebook has $kCodes entries — PQ codebooks are metadata-small " +
        "(<=1024) by this operator's broadcast contract")
    withSubs(assigned.crossJoin(broadcast(
        codebookArrOneRow(codebook, cbIdCol, cbVecCol, w, nBlocks))), "__v", w, nBlocks)
      .withColumn("codes", expr(codesExpr(nBlocks, kCodes)))
      .select(col(idCol), col("centroid_id"), col("codes"))
  }

  /** [[ivfPqSearchAll]] over a codes-array index — the batch hot path.
    * Map-side probes → one cell equi-join (rows = candidates, not
    * candidates×nBlocks) → per-candidate cross-block distance in a single
    * codegen'd expression → rank window. The decimal chain reproduces
    * sum(DECIMAL(30,12)) exactly, so output stays byte-identical to the
    * broadcast-query search. */
  def ivfPqSearchAllCodes(queries: DataFrame, qIdCol: String, qVecCol: String,
                          indexCodes: DataFrame, idCol: String,
                          centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                          codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                          dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val wSub = dims / nBlocks
    val probes = withSubs(
        Similarity.probeAssignLarge(queries, qIdCol, qVecCol,
          centroids, cenIdCol, cenVecCol, nProbe), "q_vec", wSub, nBlocks)
      .select(col("query_id"), col("centroid_id"), col("probe_rank"),
        col("__subs").as("__qsubs"), col("__xxs").as("__qxxs"))
    // metadata-scale counts (same contract as encodeCodes): kCodes sizes
    // the unrolled LUT, nCells sizes the scoring-stage salt
    searchCodesTail(indexCodes, probes,
      codebookArrOneRow(codebook, cbIdCol, cbVecCol, wSub, nBlocks),
      codebook.count().toInt, centroids.count(), idCol, nBlocks, k)
  }

  /** [[ivfPqSearchAllResidual]] over a codes-array index: each probe row
    * carries the per-cell query residual's sub-vectors into the same
    * candidate tail. */
  def ivfPqSearchAllResidualCodes(queries: DataFrame, qIdCol: String, qVecCol: String,
                                  indexCodes: DataFrame, idCol: String,
                                  centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                                  codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                                  dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val wSub = dims / nBlocks
    val probes = withSubs(
        Similarity.probeAssignLarge(queries, qIdCol, qVecCol,
            centroids, cenIdCol, cenVecCol, nProbe)
          .join(broadcast(centroids.select(col(cenIdCol).as("centroid_id"),
            col(cenVecCol).as("__cvec"))), Seq("centroid_id"))
          .withColumn("__qres", expr(residualExpr("q_vec", "__cvec", dims))),
        "__qres", wSub, nBlocks)
      .select(col("query_id"), col("centroid_id"), col("probe_rank"),
        col("__subs").as("__qsubs"), col("__xxs").as("__qxxs"))
    searchCodesTail(indexCodes, probes,
      codebookArrOneRow(codebook, cbIdCol, cbVecCol, wSub, nBlocks),
      codebook.count().toInt, centroids.count(), idCol, nBlocks, k)
  }

  /** Persist an IVF-PQ index partitioned by cell — the durable form of
    * the artifact: each cell's inverted list is its own directory, so a
    * probed search reads ONLY those directories (hive partition pruning;
    * at 100 TB the difference between scanning the whole code table and
    * scanning nProbe/nCells of it). */
  def writeIvfPqIndex(index: DataFrame, path: String): Unit =
    index.write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** Incrementally GROW a persisted IVF-PQ index: assign + encode only
    * the new batch — against the same frozen coarse centroids and
    * codebook the store was built with — and append the resulting code
    * tuples to their cell partitions (`mode("append")` adds files under
    * the affected `centroid_id=...` directories only; untouched cells'
    * files are never rewritten). This is the ingest shape a growing
    * corpus needs: per-batch cost scales with the BATCH (one batch pass
    * + broadcast centroids/codebook), not the standing corpus — the
    * same contract [[graft.operators.Dedup.indexForIncremental]] gives
    * the near-dup store, and FAISS's `IndexIVFPQ.add` gives inverted
    * lists (encode with train-time quantizers, append to cells).
    *
    * Caller contract: batch ids must be new to the store (appends don't
    * upsert), and centroids/codebook must be the build-time frames —
    * changing either invalidates every stored code, which is a rebuild,
    * not an append. Gate (BatchingOpsSpec): store-after-append ≡
    * one-shot rebuild over the union, row for row, and the probed
    * search over the appended store equals the in-memory full-corpus
    * search.
    *
    * RETRY PROTOCOL (this is `mode("append")`, so re-running a FAILED
    * append naively would double-land the batch's code rows and double
    * its ADC distances — the hazard the epoch-addressed BM25 store and
    * the stream ingest's (cell, batch) dynamic overwrite design away):
    * run `deleteFromIvfPqIndex(batchIds)` first, then re-append. The
    * delete is exact surgery on whatever fraction of the batch landed
    * (absent ids are no-ops) with its own crash discipline, so
    * delete-then-reappend from ANY partial state converges to the clean
    * append — BatchingOpsSpec gates that equality. Streams should use
    * [[graft.streaming.StreamingVectorIngest]], whose retries are
    * replace-not-append by construction. */
  def appendToIvfPqIndex(batch: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                         codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                         dims: Int, nBlocks: Int, path: String): Unit = {
    requireNoVectorSidecar(batch.sparkSession, path, "appendToIvfPqIndex")
    appendCodes(batch, idCol, vecCol, centroids, cenIdCol, cenVecCol,
      codebook, cbIdCol, cbVecCol, dims, nBlocks, path, residual = false)
  }

  /** The unguarded code-append both public appends and the
    * sidecar-maintaining [[appendSelfContained]] share. */
  private def appendCodes(batch: DataFrame, idCol: String, vecCol: String,
                          centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                          codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                          dims: Int, nBlocks: Int, path: String,
                          residual: Boolean): Unit = {
    val spark = batch.sparkSession
    requireSingleLevel(org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration), path,
      if (residual) "appendToIvfPqIndexResidual" else "appendToIvfPqIndex")
    val coded =
      if (residual) ivfPqIndexResidual(batch, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol, dims, nBlocks)
      else ivfPqIndex(batch, idCol, vecCol, centroids, cenIdCol, cenVecCol,
        codebook, cbIdCol, cbVecCol, dims, nBlocks)
    coded.write.partitionBy("centroid_id").mode("append").parquet(path)
  }

  /** [[appendToIvfPqIndex]] for a RESIDUAL store: the batch's codes must
    * quantize (vector − assigned centroid) with the residual-space
    * codebook, exactly as the store's builder did — appending raw-encoded
    * codes to a residual store (or vice versa) would silently corrupt
    * every ADC distance in the appended cells. Same caller contract and
    * the same store≡rebuild gate, against [[ivfPqIndexResidual]]. */
  def appendToIvfPqIndexResidual(batch: DataFrame, idCol: String, vecCol: String,
                                 centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                                 codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                                 dims: Int, nBlocks: Int, path: String): Unit = {
    requireNoVectorSidecar(batch.sparkSession, path, "appendToIvfPqIndexResidual")
    appendCodes(batch, idCol, vecCol, centroids, cenIdCol, cenVecCol,
      codebook, cbIdCol, cbVecCol, dims, nBlocks, path, residual = true)
  }

  /** Compact a persisted IVF-PQ index's cell partitions — the maintenance
    * step that closes the append lifecycle: every [[appendToIvfPqIndex]]
    * lands new FILES in its cells, so a frequently-fed store decays into
    * thousands of KB-sized files and probe-time planning cost grows with
    * file count instead of cell count. Delegates to
    * [[graft.sources.Compaction.compactParquet]] (REBALANCE + bounded
    * files, rename-swap) preserving the cell layout, with hive partition
    * TYPE INFERENCE pinned off for the rewrite: the compactor reads the
    * store back generically, and letting Spark re-type numeric-looking
    * STRING cell ids ("01" → 1) would rewrite the directory names and
    * corrupt every probe filter — the same trap [[ivfPqSearchStored]]
    * pins with an explicit schema.
    *
    * Caller contract: quiescent store + [[graft.sources.StoreLock]]
    * scheduling, exactly as compactParquet documents. */
  def compactIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String,
                        maxRecordsPerFile: Long): graft.sources.Compaction.Stats = {
    requireSingleLevel(org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration),
      indexPath, "compactIvfPqIndex")
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    // gated end-to-end: compaction is answer-preserving, so the gate only
    // shields racing readers from the rename swap's transient
    // file-not-found window (cheap — the vector store's cells are small)
    try graft.sources.StoreGate.writeLocked(indexPath) {
      graft.sources.Compaction.compactParquet(
        spark, indexPath, maxRecordsPerFile, Seq("centroid_id"))
    }
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Incrementally SHRINK a persisted IVF-PQ index: remove the given
    * vector ids, rewriting ONLY the cell partitions that contain them —
    * the maintenance shape a curated corpus needs (dedup and
    * decontamination retract documents; their vectors must leave the
    * index without a rebuild). FAISS's `IndexIVF.remove_ids` is the
    * same contract: surgery on the affected inverted lists, the rest of
    * the store untouched.
    *
    * Mechanics: one id+cell-pruned scan finds the affected cells (the
    * delete set broadcasts — it is retraction metadata, not corpus
    * data); the survivors of just those cells are rewritten via dynamic
    * partition overwrite (untouched cells' FILES are never opened,
    * asserted byte-for-byte in BatchingOpsSpec); a cell whose rows are
    * ALL deleted gets its directory removed explicitly, because an
    * overwrite cannot write an empty partition. The partition column is
    * read as STRING so directory names round-trip losslessly whatever
    * the build-time id type was ("01" must stay "01", not become "1" —
    * the same hive-inference trap [[ivfPqSearchStored]] pins with an
    * explicit schema), and survivors are written back through that same
    * string column, reproducing the directory names exactly.
    *
    * Crash safety: the affected cells follow [[graft.sources.Compaction]]'s
    * rename-swap discipline — their pre-image directories are MOVED to a
    * sibling `<indexPath>.delete-bak` before survivors are written back,
    * and the backup is removed only after the write commits. A crash at
    * any point leaves the backup (the marker) behind;
    * [[recoverDeleteBackup]] restores the pre-delete store, after which
    * the delete can simply be re-run. A leftover backup also makes the
    * next delete refuse loudly instead of compounding the damage.
    *
    * Caller contract: same single-writer discipline as
    * [[appendToIvfPqIndex]] (schedule against appends/compaction — see
    * [[graft.sources.StoreLock]]). `idCol` must name the store's vector-id
    * column (it is validated against the store schema, not inferred from
    * column position — a store written by other tooling fails loudly
    * instead of keying the join on the wrong column). Deleting ids absent
    * from the store is a no-op. Returns the number of code rows removed
    * (nBlocks rows per deleted vector present). */
  def deleteFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String,
                           deleteIds: DataFrame, idCol: String): Long = {
    val ids = deleteIds.select(col(idCol)).distinct()
    val (fs, store) = openStoreForDelete(spark, indexPath, idCol,
      "deleteFromIvfPqIndex")
    // Affected cells + doomed row count in one small aggregate: the scan
    // reads only (id, partition) columns, and the delete set broadcasts.
    val hits = store.join(broadcast(ids), store(idCol) === ids(idCol), "leftsemi")
      .groupBy("centroid_id").agg(count(lit(1)).as("doomed"))
      .collect()
    deleteCellsImpl(spark, indexPath, fs, store, ids, idCol, hits)
  }

  /** O(batch) bulk delete for a SELF-CONTAINED store: the caller supplies
    * the retracted VECTORS (a curation pipeline always has them — it just
    * decided to drop them), and the affected cells come from re-running
    * the store's own assignment ([[Similarity.ivfAssign]] against the
    * PERSISTED centroids, the exact deterministic argmax every build /
    * append / recell used) instead of the whole-store (id, cell)
    * discovery scan [[deleteFromIvfPqIndex]] pays. Cost is then bounded
    * by the batch and the affected cells alone — independent of store
    * size. The text-store twin is `deleteFromBm25StoreWithText`
    * (re-tokenize the retracted docs for df deltas); this is the vector
    * analog (re-encode the retracted vectors for cell placement).
    *
    * Contract: `deletedVecs` must carry the STORED vectors for each id —
    * a vector that differs from what was indexed can assign to a
    * different cell and its rows would survive silently (same trust the
    * text twin places in the supplied text). Ids absent from the store
    * are no-ops, exactly like the scan path (their claimed cells simply
    * yield no doomed rows and are left untouched). Requires persisted
    * quantizers; id column comes from the stored params. Same
    * rename-swap crash discipline and `.delete-bak` refusal as the scan
    * path ([[recoverDeleteBackup]] applies). */
  def deleteFromIvfPqIndexWithVectors(spark: org.apache.spark.sql.SparkSession,
                                      indexPath: String,
                                      deletedVecs: DataFrame,
                                      vecCol: String): Long = {
    val (cents, _, p) = loadQuantizers(spark, indexPath)
    val idCol = p.idCol
    val (fs, store) = openStoreForDelete(spark, indexPath, idCol,
      "deleteFromIvfPqIndexWithVectors")
    val assigned = Similarity.ivfAssign(
      deletedVecs.select(col(idCol), col(vecCol)).dropDuplicates(idCol),
      idCol, vecCol, cents, "centroid_id", "cen_emb")
      .select(col("centroid_id").cast("string").as("__cell"))
      .distinct().collect().map(_.getString(0)).toSeq
    if (assigned.isEmpty) return 0L
    val ids = deletedVecs.select(col(idCol)).distinct()
    // cell-pruned presence check: only the claimed cells' files open
    val pruned = store.filter(col("centroid_id").isInCollection(assigned))
    val hits = pruned.join(broadcast(ids), pruned(idCol) === ids(idCol), "leftsemi")
      .groupBy("centroid_id").agg(count(lit(1)).as("doomed"))
      .collect()
    deleteCellsImpl(spark, indexPath, fs, store, ids, idCol, hits)
  }

  /** Shared open/validate for the delete family: schema check, the
    * string-typed partition column read (directory names must round-trip
    * losslessly), single-level layout guard, and the leftover-backup
    * refusal. */
  private def openStoreForDelete(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, idCol: String, op: String)
      : (org.apache.hadoop.fs.FileSystem, DataFrame) = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val dataFields = spark.read.parquet(indexPath).schema.fields
      .filterNot(_.name == "centroid_id")
    if (!dataFields.exists(_.name == idCol))
      throw new IllegalArgumentException(
        s"$op: store $indexPath has no column '$idCol' " +
          s"(data columns: ${dataFields.map(_.name).mkString(", ")}) — " +
          "pass the id column the index was written with")
    val storeSchema = StructType(
      dataFields :+ StructField("centroid_id", StringType))
    val store = spark.read.schema(storeSchema).parquet(indexPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    requireSingleLevel(fs, indexPath, op)
    requireNoSplitManifest(fs, indexPath, op)
    val bak = new org.apache.hadoop.fs.Path(
      indexPath.stripSuffix("/") + ".delete-bak")
    if (fs.exists(bak))
      throw new java.io.IOException(
        s"refusing to delete from $indexPath: backup $bak exists from an " +
          "interrupted delete — run Quantize.recoverDeleteBackup first")
    (fs, store)
  }

  /** The delete's physical tail, shared by the scan-discovery and
    * assign-discovery entry points (and the retention sweep, which
    * already knows the affected cells from its own fraction scan):
    * survivors of the hit cells are eagerly materialized, the cells
    * rename-swap through `.delete-bak`, survivors append back. `hits`
    * rows are (cell: string, doomed: long) with doomed > 0. */
  private def deleteCellsImpl(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String,
                              fs: org.apache.hadoop.fs.FileSystem,
                              store: DataFrame, ids: DataFrame, idCol: String,
                              hits: Array[org.apache.spark.sql.Row]): Long = {
    if (hits.isEmpty) return 0L
    val bak = new org.apache.hadoop.fs.Path(
      indexPath.stripSuffix("/") + ".delete-bak")
    val affected = hits.map(_.getString(0)).toSeq
    val removed = hits.map(_.getLong(1)).sum
    // Eagerly materialize the survivors BEFORE touching the store: the
    // frame reads the very cells about to be moved aside, and truncating
    // the lineage (LogicalRDD) is what makes read-then-replace safe — the
    // affected cells' rows are in memory, bounded by cell size, never
    // the store.
    val survivors = store
      .filter(col("centroid_id").isInCollection(affected))
      .join(broadcast(ids), store(idCol) === ids(idCol), "leftanti")
      .localCheckpoint() // eager: materialized while the cells still exist
    def cellDir(root: org.apache.hadoop.fs.Path, cell: String) =
      new org.apache.hadoop.fs.Path(root,
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString("centroid_id", cell))
    // Swap phase 1: move every affected cell's pre-image into the backup.
    // From here until the backup is removed, a crash is recoverable by
    // restoring the backed-up directories over whatever exists. The whole
    // reader-visible window (moves + survivor write-back) runs behind the
    // store gate — in-flight serving reads drain first, later readers see
    // the complete post-image (the survivors were materialized above, so
    // the gated section is IO-bounded by the affected cells).
    graft.sources.StoreGate.writeLocked(indexPath) {
      fs.mkdirs(bak)
      affected.foreach { cell =>
        if (!fs.rename(cellDir(new org.apache.hadoop.fs.Path(indexPath), cell),
            cellDir(bak, cell)))
          throw new java.io.IOException(
            s"delete swap failed moving cell $cell to $bak — " +
              "run Quantize.recoverDeleteBackup to restore")
      }
      // Swap phase 2: append the survivors as fresh cell directories.
      // Emptied cells simply aren't written — their only copy now lives in
      // the backup, which the success path deletes. No dynamic-overwrite or
      // manual directory removal needed.
      if (!survivors.isEmpty)
        survivors.write.partitionBy("centroid_id")
          .mode(org.apache.spark.sql.SaveMode.Append).parquet(indexPath)
      if (!fs.delete(bak, true))
        throw new java.io.IOException(s"failed to remove delete backup $bak")
    }
    removed
  }

  /** Restore a store from an interrupted [[deleteFromIvfPqIndex]]: every
    * cell directory present in `<indexPath>.delete-bak` replaces its
    * (possibly missing or partially rewritten) counterpart in the store,
    * returning the store to its exact pre-delete state; the caller then
    * re-runs the delete. Returns true when a backup existed and was
    * restored, false when there was nothing to recover. */
  def recoverDeleteBackup(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(
      indexPath.stripSuffix("/") + ".delete-bak")
    if (!fs.exists(bak)) return false
    fs.listStatus(bak).foreach { st =>
      val dst = new org.apache.hadoop.fs.Path(indexPath, st.getPath.getName)
      if (fs.exists(dst) && !fs.delete(dst, true))
        throw new java.io.IOException(s"recover: failed to clear $dst")
      if (!fs.rename(st.getPath, dst))
        throw new java.io.IOException(s"recover: failed to restore $dst")
    }
    if (!fs.delete(bak, true))
      throw new java.io.IOException(s"recover: failed to remove $bak")
    true
  }

  // --------------------------------------------------------------------
  // Tombstoned retraction + retention sweep: the deferred-delete shape a
  // HIGH-CHURN curated corpus needs. deleteFromIvfPqIndex rewrites the
  // affected cells synchronously — right for bulk retractions, wasteful
  // when documents retract one at a time (every retraction would rewrite
  // a whole cell to remove nBlocks rows). The production pattern (same
  // idea as Lucene's deleted-docs bitset or a Delta deletion vector):
  //  - retraction appends the id to a tiny side table (O(1), no store IO),
  //  - searches anti-join the tombstone set after the probe-pruned scan
  //    (bounded by probed-cell size, the same cost envelope as the
  //    (id, block) dedup searchIngested already pays),
  //  - a maintenance-window RETENTION SWEEP physically rewrites only the
  //    cells whose tombstoned fraction crossed a threshold, then shrinks
  //    the tombstone set — amortizing the rewrite across many retractions
  //    while bounding the dead-row fraction (and thus the filter cost and
  //    wasted scan bytes) of every cell.
  // Exact-delete semantics are INVARIANT under sweep timing: filtered
  // search over (partially swept store + remaining tombstones) must equal
  // the search over an index built without the retracted ids, whichever
  // cells have or haven't been swept yet — that equivalence is qx82's
  // oracle row (it reuses qx67's full search SQL with the retracted ids
  // filtered off the corpus side, exactly like qx74).
  // --------------------------------------------------------------------

  private def tombstonesPath(indexPath: String): String =
    indexPath.stripSuffix("/") + ".tombstones"

  // --------------------------------------------------------------------
  // Self-contained store: quantizers persisted WITH the index. The
  // append/delete contract says "centroids/codebook must be the
  // build-time frames — changing either invalidates every stored code";
  // holding them caller-side makes that a documented convention, storing
  // them beside the cells makes it enforced by construction (FAISS
  // serializes its quantizers inside the index file for the same
  // reason). Layout: sibling `<indexPath>.quantizers/{centroids,
  // codebook,params}` parquet dirs, canonical column names — so every
  // existing bare-index path keeps working, and the self-contained
  // entry points below never take a quantizer frame a caller could get
  // wrong.
  // --------------------------------------------------------------------

  private def quantizersPath(indexPath: String): String =
    indexPath.stripSuffix("/") + ".quantizers"

  /** FileSystem-metadata version token of everything a stored-serving
    * answer depends on — cells, tombstones (and the sweep's transient
    * `.old` fallback), the raw-vector sidecar, the quantizers: a few
    * listStatus calls, no Spark job. Any landed mutation (append,
    * tombstone, sweep, compact, recell) changes it, so it is the vector
    * store's result-cache invalidation key (the lexical twin keys on
    * its epochs-table fingerprint). Vector compaction does change the
    * token — unlike the lexical store it rewrites the answer-bearing
    * cells in place, so there is no cheaper compaction-invariant
    * signature to key on. */
  private[graft] def storeVersion(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String): String =
    Retrieval.fsFingerprint(spark, Seq(
      indexPath.stripSuffix("/"), tombstonesPath(indexPath),
      tombstonesPath(indexPath) + ".old", vectorsPath(indexPath),
      quantizersPath(indexPath)))

  /** The vector store's ANSWER-BEARING state token (round 12): like
    * [[storeVersion]] but fingerprinting only what a search can read —
    * the quantizers (centroids/codebook/params, NOT the serving hints),
    * the tombstones (and the sweep's transient `.old`), and the index +
    * sidecar cell directories REACHABLE from the installed centroid
    * table. The distinction matters under long maintenance: a cell
    * split spends seconds writing NEW sub-cells that stay unreachable
    * (probe planning only visits centroid-table cells) until one atomic
    * centroid rename-swap — the full physical fingerprint churns through
    * all of it, starving the serve layer's optimistic bracket, while
    * this token moves exactly once, at the swap. Falls back to
    * [[storeVersion]] for bare stores (no persisted quantizers) and
    * oversized centroid sets (not driver-memoized). */
  /** Every directory a vector serving read can list — the tracked set
    * for the serve layer's rewrite-detection bracket (the store's cells
    * walk recursively from the root; quantizers/tombstones/sidecar are
    * siblings). */
  private[graft] def physicalPaths(indexPath: String): Seq[String] =
    Seq(indexPath, quantizersPath(indexPath), tombstonesPath(indexPath),
      tombstonesPath(indexPath) + ".old", vectorsPath(indexPath))

  private[graft] def servingStateToken(spark: org.apache.spark.sql.SparkSession,
                                       indexPath: String): String = {
    val base = quantizersPath(indexPath)
    val fpQuant = Retrieval.fsFingerprint(spark,
      Seq(s"$base/centroids", s"$base/codebook", s"$base/params"))
    val quantFp = fpQuant + Retrieval.fsFingerprint(spark, Seq(
      tombstonesPath(indexPath), tombstonesPath(indexPath) + ".old"))
    // reachable cells from the quantizer memo DIRECTLY (no DataFrame
    // materialization on the token path — it runs per request, per
    // bracket read); a miss fills the memo via loadQuantizers once
    val reachable: Option[Set[String]] =
      try {
        val hit = quantizerMemo.get(fpQuant)
        val entry =
          if (hit != null) hit
          else { loadQuantizers(spark, indexPath); quantizerMemo.get(fpQuant) }
        Option(entry).flatten.map(_.cellIds)
      } catch { case _: IllegalStateException => None }
    reachable match {
      case None => storeVersion(spark, indexPath) // bare / oversized store
      case Some(cells) =>
        val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
          spark.sparkContext.hadoopConfiguration)
        def cellFp(root: String): String = {
          val rp = new org.apache.hadoop.fs.Path(root)
          if (!fs.exists(rp)) s"$root#absent"
          else fs.listStatus(rp).toSeq.flatMap { st =>
            val n = st.getPath.getName
            val keep =
              if (n.startsWith("centroid_id=")) {
                // unparseable/unmatched names are KEPT (conservative:
                // a spurious retry, never a missed mutation)
                val v = java.net.URLDecoder.decode(
                  n.stripPrefix("centroid_id="), "UTF-8")
                cells.contains(v)
              } else true // loose files / markers: always in
            if (keep) Some(s"$n#${st.getModificationTime}#${st.getLen}")
            else None
          }.sorted.mkString("|")
        }
        java.security.MessageDigest.getInstance("MD5")
          .digest((quantFp + "!" + cellFp(indexPath) + "!" +
            cellFp(vectorsPath(indexPath))).getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
    }
  }

  final case class StoreParams(dims: Int, nBlocks: Int, residual: Boolean,
                               idCol: String)

  /** Persist the build-time quantizers beside the index (canonical
    * columns: centroids (centroid_id, cen_emb), codebook (code, c_emb),
    * 1-row params). Call once at build; [[appendSelfContained]] /
    * [[searchSelfContained]] then need only the store path. */
  def saveQuantizers(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                     codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                     params: StoreParams): Unit = {
    val base = quantizersPath(indexPath)
    centroids.select(col(cenIdCol).as("centroid_id"), col(cenVecCol).as("cen_emb"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/centroids")
    codebook.select(col(cbIdCol).as("code"), col(cbVecCol).as("c_emb"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/codebook")
    import spark.implicits._
    Seq((params.dims, params.nBlocks, params.residual, params.idCol))
      .toDF("dims", "n_blocks", "residual", "id_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/params")
  }

  // Driver-side memo of the persisted quantizers, keyed by the
  // centroid/codebook/params directories' fingerprint (a few listStatus
  // calls — no job). The quantizers are broadcast into every probe and
  // ADC table anyway, so memoizing the same rows costs no extra driver
  // memory — and serving them as LocalRelations makes (a) the params
  // collect, (b) every centroid/codebook broadcast build, and (c) the
  // probed-cell planning joblessly driver-evaluable. A recell/cell-split
  // swaps the quantizer directories (fresh fingerprints), so entries are
  // superseded, never stale. Oversized quantizers (> 256k centroid rows)
  // stay distributed — a deployment that big shouldn't hold them on the
  // driver twice.
  private final case class QuantizerRows(
      cenRows: Seq[org.apache.spark.sql.Row],
      cenSchema: org.apache.spark.sql.types.StructType,
      cbRows: Seq[org.apache.spark.sql.Row],
      cbSchema: org.apache.spark.sql.types.StructType,
      params: StoreParams) {
    /** Centroid ids as partition-value strings — precomputed so the
      * serving-state token never builds DataFrames on the request path. */
    lazy val cellIds: Set[String] =
      cenRows.map(r => String.valueOf(r.get(0))).toSet
  }
  private val quantizerMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Option[QuantizerRows]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[QuantizerRows]]): Boolean =
        size() > 32
    })
  private val QuantizerMemoMaxRows = 262144

  /** Load the persisted quantizers — fails loudly when the store was
    * written without [[saveQuantizers]] (bare index dirs stay supported
    * through the explicit-frame entry points). Bounded quantizers come
    * back as fingerprint-memoized LocalRelations (see [[quantizerMemo]]);
    * answers are identical either way. */
  def loadQuantizers(spark: org.apache.spark.sql.SparkSession, indexPath: String)
      : (DataFrame, DataFrame, StoreParams) = {
    val base = quantizersPath(indexPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(base)))
      throw new IllegalStateException(
        s"store $indexPath has no persisted quantizers ($base missing) — " +
          "build it with buildSelfContained, or use the explicit-frame APIs")
    val key = Retrieval.fsFingerprint(spark,
      Seq(s"$base/centroids", s"$base/codebook", s"$base/params"))
    val hit = quantizerMemo.get(key)
    if (hit != null) hit match {
      case Some(q) => (DriverPlan.localFrame(spark, q.cenRows, q.cenSchema),
        DriverPlan.localFrame(spark, q.cbRows, q.cbSchema), q.params)
      case None => loadQuantizersDistributed(spark, base)
    } else {
      val (cen, cb, p) = loadQuantizersDistributed(spark, base)
      val cenRows = cen.limit(QuantizerMemoMaxRows + 1).collect()
      if (cenRows.length > QuantizerMemoMaxRows) {
        quantizerMemo.put(key, None); (cen, cb, p)
      } else {
        val cbRows = cb.collect() // ≤ codebook size (256-ish) by design
        quantizerMemo.put(key, Some(QuantizerRows(
          cenRows.toSeq, cen.schema, cbRows.toSeq, cb.schema, p)))
        (DriverPlan.localFrame(spark, cenRows.toSeq, cen.schema),
          DriverPlan.localFrame(spark, cbRows.toSeq, cb.schema), p)
      }
    }
  }

  private def loadQuantizersDistributed(
      spark: org.apache.spark.sql.SparkSession, base: String)
      : (DataFrame, DataFrame, StoreParams) = {
    val p = spark.read.parquet(s"$base/params").collect().head
    (spark.read.parquet(s"$base/centroids"),
      spark.read.parquet(s"$base/codebook"),
      StoreParams(p.getAs[Int]("dims"), p.getAs[Int]("n_blocks"),
        p.getAs[Boolean]("residual"), p.getAs[String]("id_col")))
  }

  /** Build + persist a SELF-CONTAINED store: index cells AND the
    * quantizers that produced them, in one call. `residual` picks the
    * encode ([[ivfPqIndexResidual]] vs [[ivfPqIndex]]); the flag is
    * stored and honored by every later lifecycle call.
    *
    * `storeVectors = true` ALSO persists the raw vectors as the
    * `<indexPath>.vectors` sidecar (cell-partitioned, canonical columns
    * (idCol, vec, centroid_id)) — one extra corpus assignment pass at
    * build time that makes [[searchSelfContainedRefinedStored]] (exact
    * rescore with NO caller-supplied corpus) and
    * [[recellIvfPqStoreFromSidecar]] (retrain with no lake pointer)
    * servable from the store alone. */
  def buildSelfContained(spark: org.apache.spark.sql.SparkSession,
                         corpus: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                         codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                         dims: Int, nBlocks: Int, residual: Boolean,
                         indexPath: String, storeVectors: Boolean = false): Unit = {
    val index =
      if (residual) ivfPqIndexResidual(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol, dims, nBlocks)
      else ivfPqIndex(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol, dims, nBlocks)
    writeIvfPqIndex(index, indexPath)
    saveQuantizers(spark, indexPath, centroids, cenIdCol, cenVecCol,
      codebook, cbIdCol, cbVecCol, StoreParams(dims, nBlocks, residual, idCol))
    if (storeVectors)
      writeVectorSidecar(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol, vectorsPath(indexPath),
        overwrite = true, vepoch = 0L)
  }

  /** Append a batch against the STORED quantizers — the frozen-quantizer
    * contract enforced by construction: there is no quantizer argument to
    * pass stale. Same append semantics/gates as [[appendToIvfPqIndex]]. */
  def appendSelfContained(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, batch: DataFrame,
                          vecCol: String): Unit = {
    requireNoSplitManifest(org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration),
      indexPath, "append to")
    val (cents, cb, p) = loadQuantizers(spark, indexPath)
    // a store built with vectors keeps them: the sidecar follows every
    // append (same frozen-centroid assignment, mode append — cells gain
    // files, nothing rewrites). The sidecar lands FIRST: a crash between
    // the two writes then leaves extra sidecar rows (harmless under the
    // multiset/dead-row contract) — the reverse order would leave LIVE
    // code rows with no sidecar vector, the one state that silently
    // drops candidates from the refined-stored rescore. A retried append
    // may double-land rows here exactly as codes double-land; the codes
    // side heals via delete-then-reappend, the sidecar by carrying a
    // fresh vepoch per append: readers resolve max_by(vec, vepoch), so
    // retry duplicates (identical vec, any vepoch) and genuine
    // re-appends after delete+sweep (UPDATED vec, higher vepoch) both
    // land on the right vector.
    if (hasVectorSidecar(spark, indexPath))
      writeVectorSidecar(batch, p.idCol, vecCol,
        cents, "centroid_id", "cen_emb", vectorsPath(indexPath),
        overwrite = false,
        vepoch = sidecarNextVepoch(spark, vectorsPath(indexPath),
          "appendSelfContained"))
    appendCodes(batch, p.idCol, vecCol,
      cents, "centroid_id", "cen_emb", cb, "code", "c_emb",
      p.dims, p.nBlocks, indexPath, residual = p.residual)
  }

  /** Tombstone-aware probed search against the STORED quantizers; the
    * residual flag picks the matching ADC formula. Bare-index callers
    * keep using the explicit-frame searches. */
  def searchSelfContained(spark: org.apache.spark.sql.SparkSession,
                          indexPath: String, queries: DataFrame,
                          qIdCol: String, qVecCol: String,
                          k: Int, nProbe: Int): DataFrame =
    searchSelfContainedImpl(spark, indexPath, queries, qIdCol, qVecCol,
      k, nProbe, allowed = None)

  /** Metadata-predicated stored search — the vector twin of
    * [[Retrieval.bm25TopKFromStoreFiltered]] (and the stored form of the
    * in-memory filtered ANN, qx76): only ids in `allowedDocs` (ACLs,
    * source filters, freshness windows) may appear in the top-k. The
    * allow-list is a broadcast semi-join applied AFTER the probe-pruned
    * scan and the tombstone anti-join, BEFORE ADC ranking — so the k
    * results are k SURVIVORS, never a post-filtered shorter list, and
    * the scan cost envelope is unchanged (probed cells only; the
    * allow-list is predicate metadata, not corpus data). */
  def searchSelfContainedFiltered(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String, queries: DataFrame,
                                  qIdCol: String, qVecCol: String,
                                  allowedDocs: DataFrame,
                                  k: Int, nProbe: Int): DataFrame =
    searchSelfContainedImpl(spark, indexPath, queries, qIdCol, qVecCol,
      k, nProbe, allowed = Some(allowedDocs))

  /** The one stored-serving core (filtered and unfiltered cannot drift):
    * pruned scan → tombstone anti-join → optional allow-list semi-join →
    * the residual-or-raw ADC tail. `preloaded`/`cellsPre` let the
    * sidecar-refined path reuse its quantizer load and probed-cell
    * collect instead of paying those driver jobs twice per serve. */
  private def searchSelfContainedImpl(spark: org.apache.spark.sql.SparkSession,
                                      indexPath: String, queries: DataFrame,
                                      qIdCol: String, qVecCol: String,
                                      k: Int, nProbe: Int,
                                      allowed: Option[DataFrame],
                                      preloaded: Option[(DataFrame, DataFrame, StoreParams)] = None,
                                      cellsPre: Option[Seq[Any]] = None): DataFrame = {
    val (cents, cb, p) = preloaded.getOrElse(loadQuantizers(spark, indexPath))
    // one bounded collect localizes a corpus-backed query frame: the
    // small-side gate, probe-cell evaluation, and every downstream
    // broadcast of query rows become jobless (DriverPlan.localize doc)
    val queriesL = graft.operators.DriverPlan.localize(queries)
    Similarity.requireSmallQuerySide(queriesL, "searchSelfContained")
    val tomb = readTombstones(spark, indexPath, p.idCol)
    val pruned = prunedScanAt(spark, indexPath, queriesL, qIdCol, qVecCol,
      cents, "centroid_id", "cen_emb", nProbe, cellsPre)
    val live0 = pruned.join(broadcast(tomb), pruned(p.idCol) === tomb(p.idCol),
      "leftanti")
    val live = allowed.fold(live0) { a =>
      val ids = a.select(col(a.columns.head).as(p.idCol)).distinct()
      live0.join(broadcast(ids), Seq(p.idCol), "leftsemi")
    }
    if (p.residual)
      ivfPqSearchResidualOn(live, queriesL, qIdCol, qVecCol, p.idCol,
        cents, "centroid_id", "cen_emb", cb, "code", "c_emb",
        p.dims, p.nBlocks, k, nProbe)
    else
      ivfPqSearchOn(live, queriesL, qIdCol, qVecCol, p.idCol,
        cents, "centroid_id", "cen_emb", cb, "code", "c_emb",
        p.dims, p.nBlocks, k, nProbe)
  }

  /** The SHIPPED high-recall search configuration — the budget point
    * RECALL.md measures at recall@10 >= 0.9 on the synthetic corpus and
    * the default [[graft.VectorStoreCtl]]'s `auto` arguments resolve to.
    * Shape, not constants: cells ~ √N keeps cell size ~√N rows so probe
    * cost and cell-rewrite cost balance; probing ~1/3 of cells is where
    * the measured recall curve crosses 0.9 on an (adversarially
    * isotropic) corpus — clustered real embeddings cross earlier, so the
    * fraction is an upper bound on what a deployment needs; rescoring a
    * (10·k)-deep-per-query shortlist exactly costs one broadcast-joined
    * corpus pass ([[ivfPqSearchRefined]]) and removes ADC's quantization
    * error from the final ranking entirely. */
  // --------------------------------------------------------------------
  // Query-drift adaptivity (round 11 stretch). Geometry policies react
  // to CORPUS drift; nothing reacted to QUERY drift — a query mix
  // wandering out of the quantizers' trained space degrades ADC
  // ordering silently (recall falls at fixed budgets while nothing in
  // the store changed). The observable is rank DISPLACEMENT: how much
  // of the exact-rescored top-k the raw ADC top-k missed — a recall
  // proxy the refined serving path already pays for, requiring no
  // ground truth. The maintenance policy (StoreCtl.maintainVec with
  // adaptQueries) measures it per cycle over a sample of the live query
  // mix and, past a threshold, RAISES the store's persisted serving
  // hints (nProbe / rerankDepth) — the deployment's `auto` budgets read
  // the hints, so serving deepens without a config push. A recell
  // replaces the whole `.quantizers` dir and so clears the hints
  // (retrained geometry resets the budget question).
  // --------------------------------------------------------------------

  /** Persisted serving hints (`<store>.quantizers/serving`, one row):
    * the drift policy's output channel, consumed by the `auto` budget
    * resolution. */
  def writeServingHints(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, nProbe: Int,
                        rerankDepth: Int): Unit = {
    import spark.implicits._
    // write-sibling-then-rename like every other install in this store:
    // a plain overwrite has a window where the dir exists but holds no
    // committed files, and every `auto` budget resolution would throw
    // until hand-repair. A crash between the delete and the rename just
    // loses the hints — servingHints returns None and `auto` falls back
    // to the HighRecall defaults, which is the correct degraded state.
    val base = quantizersPath(indexPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    Seq((nProbe, rerankDepth)).toDF("n_probe", "rerank_depth")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/serving-new")
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/serving"), true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(s"$base/serving-new"),
        new org.apache.hadoop.fs.Path(s"$base/serving")))
      throw new java.io.IOException(
        s"failed to install serving hints at $base/serving")
  }

  /** The persisted hints, when a drift policy has written any. */
  def servingHints(spark: org.apache.spark.sql.SparkSession,
                   indexPath: String): Option[(Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(quantizersPath(indexPath) + "/serving")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else
      // tolerate the writer's delete→rename window (and any torn dir):
      // the claimed degraded state is "no hints ⇒ HighRecall defaults",
      // so a read that loses the race must return None, never throw
      try {
        val r = spark.read.parquet(p.toString).collect().head
        Some((r.getInt(0), r.getInt(1)))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** ADC-vs-exact rank displacement at the given budgets: the fraction
    * of the REFINED (exact-rescored) top-k that the raw ADC top-k
    * missed, averaged over all queries' result rows. 0 = the codes
    * already rank like exact distances (refine is a formality);
    * rising values mean the quantizers no longer represent the query
    * mix's neighborhoods and the shortlist is carrying the recall.
    * Needs the raw-vector sidecar (the exact side rescores from it). */
  def rankDisplacement(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, queries: DataFrame,
                       qIdCol: String, qVecCol: String,
                       k: Int, nProbe: Int, rerankDepth: Int): Double = {
    val adc = searchSelfContained(spark, indexPath, queries, qIdCol, qVecCol,
        k, nProbe)
      .select(col("query_id"), col("neighbor_id"))
    val refined = searchSelfContainedRefinedStored(spark, indexPath, queries,
        qIdCol, qVecCol, k, nProbe, rerankDepth)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint() // two counts
    val total = refined.count()
    if (total == 0) 0.0
    else {
      val kept = refined.join(adc, Seq("query_id", "neighbor_id"), "leftsemi")
        .count()
      1.0 - kept.toDouble / total
    }
  }

  object HighRecall {
    /** √N coarse cells (min 16), the build-time half of the config. */
    def nCells(nCorpus: Long): Int =
      math.max(16, math.round(math.sqrt(nCorpus.toDouble)).toInt)
    /** Probe ~1/3 of the cells, floor 8 (small stores probe everything
      * rather than under-probe). */
    def nProbe(nCells: Long): Int =
      math.min(nCells, math.max(8L, math.ceil(nCells / 3.0).toLong)).toInt
    /** Exact-rescore depth: 10×k, floor 100. */
    def rerankDepth(k: Int): Int = math.max(100, 10 * k)
  }

  /** [[searchSelfContained]] with the exact-rescore tail — the stored
    * store's HIGH-RECALL search (RECALL.md's shipped configuration when
    * paired with [[HighRecall]] budgets). The store holds only codes, so
    * the exact vectors come from `corpus` (the table the deployment
    * built the store from); the shortlist is tombstone-filtered BEFORE
    * rescoring, so retracted ids can never re-enter through the refine.
    * Cost: the stored ADC search at `rerankDepth`, plus one
    * broadcast-joined corpus pass over |Q|×rerankDepth candidates. */
  def searchSelfContainedRefined(spark: org.apache.spark.sql.SparkSession,
                                 indexPath: String, queries: DataFrame,
                                 qIdCol: String, qVecCol: String,
                                 corpus: DataFrame, corpusVecCol: String,
                                 k: Int, nProbe: Int, rerankDepth: Int): DataFrame = {
    require(rerankDepth >= k,
      s"rerankDepth=$rerankDepth must be >= k=$k (the shortlist feeds the final rank)")
    val p = loadQuantizers(spark, indexPath)._3
    val queriesL = graft.operators.DriverPlan.localize(queries)
    val shortlist = searchSelfContained(spark, indexPath, queriesL,
      qIdCol, qVecCol, rerankDepth, nProbe)
    exactRescore(shortlist, queriesL, qIdCol, qVecCol,
      corpus, p.idCol, corpusVecCol, k)
  }

  /** [[searchSelfContainedRefined]] with [[searchSelfContainedFiltered]]'s
    * allow-list: the fence is applied to the ADC SHORTLIST (after the
    * pruned scan, before ranking), so the exact rescore re-ranks k-deep
    * lists of ALLOWED survivors only — a disallowed id can neither make
    * the shortlist nor re-enter through the refine, the same two-door
    * guarantee the tombstone filter carries. */
  def searchSelfContainedRefinedFiltered(spark: org.apache.spark.sql.SparkSession,
                                         indexPath: String, queries: DataFrame,
                                         qIdCol: String, qVecCol: String,
                                         allowedDocs: DataFrame,
                                         corpus: DataFrame, corpusVecCol: String,
                                         k: Int, nProbe: Int, rerankDepth: Int): DataFrame = {
    require(rerankDepth >= k,
      s"rerankDepth=$rerankDepth must be >= k=$k (the shortlist feeds the final rank)")
    val p = loadQuantizers(spark, indexPath)._3
    val shortlist = searchSelfContainedFiltered(spark, indexPath, queries,
      qIdCol, qVecCol, allowedDocs, rerankDepth, nProbe)
    exactRescore(shortlist, queries, qIdCol, qVecCol,
      corpus, p.idCol, corpusVecCol, k)
  }

  // --------------------------------------------------------------------
  // Raw-vector SIDECAR: `<indexPath>.vectors`, cell-partitioned parquet
  // with canonical columns (idCol, vec, centroid_id). Closes the one
  // self-containment gap the quantizer sidecar left open: the exact-
  // rescore refine and the recell retrain both need raw floats the PQ
  // cells don't hold, so without it "self-contained" was self-contained
  // for ADC only and every refined/retrain call carried a lake pointer
  // the store knows nothing about.
  //
  // Consistency contract (deliberately minimal — the sidecar is keyed by
  // the INDEX, never consulted for membership):
  //  - invariant: sidecar ⊇ live ids. Build initializes it, the
  //    self-contained append maintains it, recell rewrites it to the
  //    survivors. Bare-index appends on a sidecar store REFUSE loudly
  //    (the one mutation that could silently break the invariant).
  //  - deletes never touch it: a tombstoned/swept/physically-deleted id's
  //    codes leave the index, so its sidecar row is unreachable (the
  //    rescore joins shortlist candidates only) — dead rows are storage,
  //    not correctness. Recell is the vacuum that drops them.
  //  - it is an append-only MULTISET with a VERSION ORDER: every write
  //    lands under a `vepoch=` partition (build/recell at 0, each append
  //    at max+1 — one directory listing, no clock, no store read), and
  //    readers resolve an id's rows with max_by(vec, vepoch). Identical
  //    retry duplicates collapse to the same vector either way; a
  //    delete→sweep→re-append-with-UPDATED-vector sequence (the standard
  //    vector update) resolves to the LATEST vector — without the order,
  //    an arbitrary-pick dedup could rescore/retrain/re-encode the stale
  //    one (the lexical docs sidecar resolves the same case with
  //    max_by(text, epoch)). Pre-vepoch sidecars stay READABLE (readers
  //    fall back to the old arbitrary dedup, correct while no id was
  //    ever re-appended) but appends onto them REFUSE: recell (or a
  //    rebuild) rewrites the sidecar into the versioned layout.
  // Reads go through the same literal `centroid_id IN (probed cells)`
  // partition filter as the code cells — a candidate's vector lives in
  // the cell its codes live in, so the refine's vector lookups are
  // pruned to the exact partitions the ADC scan already opened.
  // --------------------------------------------------------------------

  private def vectorsPath(indexPath: String): String =
    indexPath.stripSuffix("/") + ".vectors"

  /** True iff the store persists its raw vectors ([[buildSelfContained]]
    * with `storeVectors = true`). */
  def hasVectorSidecar(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String): Boolean =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
        spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(vectorsPath(indexPath)))

  /** One frozen-centroid assignment pass → (vepoch, cell)-partitioned
    * (id, vec) rows. Shared by build (overwrite, vepoch 0), append
    * (append, next vepoch), and recell (fresh sidecar under the
    * retrained geometry, folded back to vepoch 0). */
  private def writeVectorSidecar(batch: DataFrame, idCol: String, vecCol: String,
                                 centroids: DataFrame, cenIdCol: String,
                                 cenVecCol: String, sidecarPath: String,
                                 overwrite: Boolean, vepoch: Long): Unit =
    Similarity.ivfAssign(batch, idCol, vecCol, centroids, cenIdCol, cenVecCol)
      .select(col(idCol), col(vecCol).as("vec"), col("centroid_id"))
      .withColumn("vepoch", lit(vepoch))
      .write.partitionBy("vepoch", "centroid_id")
      .mode(if (overwrite) "overwrite" else "append")
      .parquet(sidecarPath)

  /** The sidecar's version frontier from ONE directory listing: -1 = no
    * sidecar (or empty), max vepoch otherwise. Throws on the legacy
    * (pre-vepoch, `centroid_id=` top-level) layout when `op` is an
    * append — the versioned resolution below cannot order rows the old
    * layout never stamped, and mixing the two directory shapes under one
    * root would break every partitioned read of the store. */
  private def sidecarNextVepoch(spark: org.apache.spark.sql.SparkSession,
                                sidecarPath: String, op: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(sidecarPath),
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(sidecarPath)
    if (!fs.exists(root)) return 0L
    val kids = fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
    if (kids.exists(_.startsWith("centroid_id=")))
      throw new IllegalStateException(
        s"$op: sidecar $sidecarPath predates the versioned (vepoch) " +
          "layout — an append onto it could leave one id with two " +
          "unordered vectors (stale-rescore hazard). Migrate first: " +
          "recellIvfPqStoreFromSidecar rewrites the sidecar into the " +
          "versioned layout (or rebuild with buildSelfContained).")
    val eps = kids.filter(_.startsWith("vepoch=")).map(_.stripPrefix("vepoch=").toLong)
    if (eps.isEmpty) 0L else eps.max + 1L
  }

  /** Latest-version resolution for sidecar reads: one row per id, the
    * max-vepoch vector. Pre-vepoch sidecars (no column) keep the old
    * arbitrary-pick dedup — correct while no id was ever re-appended,
    * which the append refusal above enforces going forward. */
  private def resolveSidecarLatest(rows: DataFrame, idCol: String): DataFrame =
    if (rows.columns.contains("vepoch"))
      rows.groupBy(col(idCol))
        .agg(expr("max_by(vec, vepoch)").as("vec"))
    else rows.select(col(idCol), col("vec")).dropDuplicates(idCol)

  private def requireNoVectorSidecar(spark: org.apache.spark.sql.SparkSession,
                                     indexPath: String, op: String): Unit =
    if (hasVectorSidecar(spark, indexPath))
      throw new IllegalStateException(
        s"$op: store $indexPath carries a raw-vector sidecar " +
          s"(${vectorsPath(indexPath)}) this bare-index append would not " +
          "maintain — appended ids would silently vanish from refined " +
          "searches. Append through appendSelfContained instead.")

  /** [[searchSelfContainedRefined]] with NO corpus argument — the exact
    * vectors come from the store's own `.vectors` sidecar, read behind
    * the SAME literal probed-cell partition filter as the ADC scan (a
    * shortlist candidate's vector lives in the cell its codes live in).
    * This is the deployable form of the refined search: quantizers,
    * cells, tombstones AND rescore floats all travel with the store.
    * Fails loudly when the store was built without `storeVectors`. */
  def searchSelfContainedRefinedStored(spark: org.apache.spark.sql.SparkSession,
                                       indexPath: String, queries: DataFrame,
                                       qIdCol: String, qVecCol: String,
                                       k: Int, nProbe: Int,
                                       rerankDepth: Int): DataFrame =
    refinedStoredImpl(spark, indexPath, queries, qIdCol, qVecCol,
      allowed = None, k, nProbe, rerankDepth)

  /** [[searchSelfContainedRefinedStored]] under an id allow-list — the
    * fence applies to the ADC shortlist exactly as
    * [[searchSelfContainedRefinedFiltered]] documents (two-door
    * guarantee: a disallowed id can neither make the shortlist nor
    * re-enter through the refine). */
  def searchSelfContainedRefinedStoredFiltered(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, allowedDocs: DataFrame,
      k: Int, nProbe: Int, rerankDepth: Int): DataFrame =
    refinedStoredImpl(spark, indexPath, queries, qIdCol, qVecCol,
      allowed = Some(allowedDocs), k, nProbe, rerankDepth)

  /** The one sidecar-refined core (filtered and unfiltered cannot
    * drift): stored ADC shortlist at `rerankDepth` → pruned sidecar scan
    * → candidate-dedup'd exact rescore to k. */
  private def refinedStoredImpl(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String, queries: DataFrame,
                                qIdCol: String, qVecCol: String,
                                allowed: Option[DataFrame],
                                k: Int, nProbe: Int,
                                rerankDepth: Int): DataFrame = {
    require(rerankDepth >= k,
      s"rerankDepth=$rerankDepth must be >= k=$k (the shortlist feeds the final rank)")
    if (!hasVectorSidecar(spark, indexPath))
      throw new IllegalStateException(
        s"store $indexPath has no raw-vector sidecar " +
          s"(${vectorsPath(indexPath)} missing) — build it with " +
          "buildSelfContained(..., storeVectors = true), or use " +
          "searchSelfContainedRefined with an explicit corpus")
    // quantizers and the probed-cell list are computed ONCE and shared by
    // the ADC shortlist and the sidecar scan — the cells are identical by
    // construction (same queries, same centroids, same budget), so the
    // reuse saves two driver jobs per serve without changing any answer
    val loaded = loadQuantizers(spark, indexPath)
    val (cents, _, p) = loaded
    val cells = probedCellIds(queries, qIdCol, qVecCol,
      cents, "centroid_id", "cen_emb", nProbe)
    val shortlist = searchSelfContainedImpl(spark, indexPath, queries,
      qIdCol, qVecCol, rerankDepth, nProbe, allowed,
      preloaded = Some(loaded), cellsPre = Some(cells))
    val vecs = prunedScanAt(spark, vectorsPath(indexPath), queries,
      qIdCol, qVecCol, cents, "centroid_id", "cen_emb", nProbe,
      cellsPre = Some(cells))
    exactRescore(shortlist, queries, qIdCol, qVecCol,
      vecs, p.idCol, "vec", k, dedupCandidates = true,
      verCol = if (vecs.columns.contains("vepoch")) Some("vepoch") else None)
  }

  /** [[searchSelfContainedRefinedStoredFiltered]] with ADAPTIVE probe
    * deepening — the classic filtered-ANN failure mode's fix. A
    * selective allow-list thins every probed cell: at 1% selectivity a
    * fixed-nProbe search sees ~1% of its usual candidate pool, the
    * fenced shortlist can fall under k, and recall collapses (RECALL.md's
    * selectivity table measures it). This variant PRE-COUNTS each
    * query's live fenced candidates in its probed cells — one
    * column-pruned (`block = 0` ⇒ one row per vector), partition-pruned
    * count job per attempt — and DOUBLES nProbe until every query sees
    * a FULL SHORTLIST'S WORTH of them — max(c·k, rerankDepth) — or the
    * whole store is probed, then runs the standard filtered refined
    * search once at the settled budget.
    *
    * Why rerankDepth and not just c·k (round 12): the unfiltered
    * HighRecall budget's quality rests on filling a rerankDepth-deep
    * shortlist from the probed cells; a fence that thins the probed
    * pool below that depth silently degrades the filtered search to
    * "exact over whatever happened to be in view" — the RECALL.md
    * mid-selectivity row measured exactly that (0.738 at 10% with the
    * c·k gate: the pool cleared 3k so nothing deepened, while the true
    * fenced neighbors sat in unprobed cells). Rank displacement cannot
    * see this failure — the ADC and refined rankings agree on the
    * candidates they share; the loss is candidates neither saw — so the
    * gate is candidate MASS at shortlist depth, the quantity the budget
    * actually promises. Queries whose ENTIRE fenced pool is smaller
    * than the quota settle at all-cells (the existing stop), which is
    * exact-over-the-fence and cannot be beaten.
    *
    * The deepening reads counts, never vectors: the expensive rescore
    * runs exactly once. Returns (result, nProbeUsed) so callers and
    * probes can see the settled budget; the result is BY CONSTRUCTION
    * [[searchSelfContainedRefinedStoredFiltered]] at that budget. */
  def searchSelfContainedRefinedStoredFilteredAdaptive(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String, queries: DataFrame,
      qIdCol: String, qVecCol: String, allowedDocs: DataFrame,
      k: Int, nProbe0: Int, rerankDepth: Int,
      c: Int = 3): (DataFrame, Int) = {
    require(c >= 1, s"candidate multiplier c=$c must be >= 1")
    require(nProbe0 >= 1, s"nProbe0=$nProbe0 must be >= 1")
    val (cents, _, p) = loadQuantizers(spark, indexPath)
    val nCells = cents.count().toInt
    val tomb = readTombstones(spark, indexPath, p.idCol)
    val allowedIds = allowedDocs
      .select(col(allowedDocs.columns.head).as(p.idCol)).distinct()
      .localCheckpoint() // reused per attempt + by the final search
    // One row per query id, REQUIRED: the per-attempt counts group by
    // query_id, so duplicate ids would (a) make a row-count settle check
    // unreachable or (b) merge two different vectors' candidate pools
    // and settle a budget one of them never validated — refuse loudly
    // instead of picking either failure
    val nQueries = queries.select(col(qIdCol)).distinct().count()
    require(nQueries == queries.count(),
      s"adaptive filtered search requires one row per query id " +
        s"('$qIdCol' has duplicates) — the per-query candidate counts " +
        "cannot validate a budget for two different vectors under one id")
    var np = math.min(nProbe0, nCells)
    var settled = false
    while (!settled) {
      val qcells = probeCells(queries, qIdCol, qVecCol,
          cents, "centroid_id", "cen_emb", np)
        .select("query_id", "centroid_id").localCheckpoint()
      val cellList = qcells.select("centroid_id").distinct()
        .collect().map(_.get(0)).toSeq
      val counts = spark.read.parquet(indexPath)
        .filter(col("centroid_id").isInCollection(cellList))
        .filter(col("block") === 0) // one row per vector
        .select(col(p.idCol), col("centroid_id").cast("string").as("__cell"))
        .join(broadcast(allowedIds), Seq(p.idCol), "leftsemi")
        .join(broadcast(tomb), Seq(p.idCol), "left_anti")
        .join(broadcast(qcells.select(col("query_id"),
          col("centroid_id").cast("string").as("__cell"))), Seq("__cell"))
        // DISTINCT ids: a retry-double-landed append leaves two block=0
        // rows for one vector — counting rows would let duplicates fill
        // the c·k quota with candidates the rescore dedups away
        .groupBy("query_id").agg(countDistinct(col(p.idCol)).as("n"))
        .collect()
      val quota = math.max(c.toLong * k, rerankDepth.toLong)
      val enough = counts.length == nQueries &&
        counts.forall(_.getLong(1) >= quota)
      if (enough || np >= nCells) settled = true
      else np = math.min(nCells, np * 2)
    }
    (refinedStoredImpl(spark, indexPath, queries, qIdCol, qVecCol,
      allowed = Some(allowedIds), k, np, rerankDepth), np)
  }

  /** True iff the store carries [[graft.streaming.StreamingVectorIngest]]'s
    * two-level (cell, batch) layout — any cell directory containing
    * `batch_id=` children. The single-level lifecycle operators (append/
    * delete/sweep/compact) refuse such stores loudly: their
    * partitionBy("centroid_id") rewrites would demote batch_id into a
    * data column for the touched cells only, leaving a store whose files
    * disagree about the schema. [[flattenIngestedStore]] promotes the
    * layout first. */
  private[graft] def hasBatchPartitions(fs: org.apache.hadoop.fs.FileSystem,
                                        indexPath: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(indexPath)
    fs.exists(root) && fs.listStatus(root).exists(c =>
      c.isDirectory && c.getPath.getName.startsWith("centroid_id=") &&
        fs.listStatus(c.getPath).exists(b =>
          b.isDirectory && b.getPath.getName.startsWith("batch_id=")))
  }

  private def requireSingleLevel(fs: org.apache.hadoop.fs.FileSystem,
                                 indexPath: String, op: String): Unit =
    if (hasBatchPartitions(fs, indexPath))
      throw new IllegalStateException(
        s"$op: store $indexPath has the stream-fed (cell, batch) layout — " +
          "run Quantize.flattenIngestedStore (CLI: flatten) to promote it " +
          "to the canonical cell layout first")

  /** Promote a stream-fed store ([[graft.streaming.StreamingVectorIngest]]'s
    * (cell, batch) two-level layout) to the canonical single-level cell
    * layout every lifecycle operator works on — the hand-off from
    * "ingesting" to "maintained": stream → flatten → append/delete/
    * sweep/compact apply unchanged. One store-sized pass: read with
    * partition-type inference OFF (cell ids stay the literal directory
    * strings — the "01" ≠ 1 trap), drop the batch_id bookkeeping column,
    * dedup (id, block) exactly as [[graft.streaming.StreamingVectorIngest]]'s
    * read path does (a contract-violating source's cross-batch
    * re-deliveries are collapsed HERE, once, instead of at every later
    * read), and rewrite partitioned by cell into a sibling directory,
    * installed by rename swap (write `.flatten-new`, retire main to
    * `.flatten-old`, rename in, drop old — a crash leaves either the
    * untouched original or the marker, and a leftover `.flatten-old`
    * with main missing is reinstated on the next run). Runs under
    * [[graft.sources.StoreLock]]. Sibling `.quantizers`/`.tombstones`
    * side tables are path-stable and unaffected. No-op (returns -1) on
    * a store already in cell layout. Returns the number of code rows in
    * the flattened store otherwise. */
  def flattenIngestedStore(spark: org.apache.spark.sql.SparkSession,
                           indexPath: String, idCol: String): Long =
    graft.sources.StoreLock.withLock(spark, indexPath, "flatten") {
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
        spark.sparkContext.hadoopConfiguration)
      val main = new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/"))
      val fresh = new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/") + ".flatten-new")
      val old = new org.apache.hadoop.fs.Path(indexPath.stripSuffix("/") + ".flatten-old")
      // crashed prior flatten: main gone, retired original still present →
      // reinstate it (the original is complete; the fresh dir may not be)
      if (!fs.exists(main) && fs.exists(old) && !fs.rename(old, main))
        throw new java.io.IOException(s"flatten: failed to reinstate $old")
      if (!hasBatchPartitions(fs, indexPath)) return -1L
      val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "false")
      val flat =
        try {
          val df = spark.read.parquet(indexPath)
          if (!df.columns.contains(idCol))
            throw new IllegalArgumentException(
              s"flattenIngestedStore: store $indexPath has no column '$idCol'")
          df.drop("batch_id").dropDuplicates(idCol, "block").localCheckpoint()
        } finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
      val n = flat.count()
      if (fs.exists(fresh) && !fs.delete(fresh, true))
        throw new java.io.IOException(s"flatten: failed to clear $fresh")
      flat.write.partitionBy("centroid_id").parquet(fresh.toString)
      if (fs.exists(old) && !fs.delete(old, true))
        throw new java.io.IOException(s"flatten: failed to clear $old")
      // install swap gated against in-flight serving reads
      graft.sources.StoreGate.writeLocked(indexPath) {
        if (!fs.rename(main, old))
          throw new java.io.IOException(s"flatten: failed to retire $main")
        if (!fs.rename(fresh, main))
          throw new java.io.IOException(s"flatten: failed to install $fresh")
        fs.delete(old, true) // best-effort; main is complete from here
      }
      n
    }

  /** RETRAIN a standing self-contained store's quantizer geometry from
    * its LIVE corpus — the vector analog of [[Retrieval.rebucketBm25Store]],
    * closing the lifecycle asymmetry where the lexical store's bucket
    * geometry can follow corpus growth but the IVF-PQ store's coarse
    * cells and codebook stay frozen at build forever. [[HighRecall]]
    * prescribes √N cells, N grows under appends, and qx95 measures the
    * recall decay of a drifted store — this is the remediation path that
    * keeps the maintained layout's discipline (quantizers swap WITH the
    * cells, tombstones cleared, crash-recoverable install) instead of a
    * by-hand rebuild outside the store lifecycle.
    *
    * `corpus` is the exact-vector lake table the deployment builds from
    * (the store persists only codes — same contract as
    * [[searchSelfContainedRefined]]'s rescore corpus): the live ids
    * (store ids minus tombstones) are semi-joined out of it and become
    * the training + encode input. A live id missing from the corpus
    * fails LOUDLY (it cannot be re-encoded — silently dropping it would
    * turn a maintenance op into data loss), as does a corpus carrying
    * duplicate rows for a live id.
    *
    * Training is deterministic (first-k-ids seeding, no RNG): coarse
    * centroids via [[Clustering.kmeansFit]] and — when `retrainCodebook`
    * — a PQ codebook via [[pqTrain]] (raw-space for a raw store,
    * residual-space via [[trainIvfPq]] for a residual store; with
    * `retrainCodebook = false` the stored codebook is kept and only the
    * cells move). Because the derivation is deterministic,
    * search-after-recell ≡ search of a from-scratch
    * [[buildSelfContained]] on the surviving corpus with the same
    * parameters — BatchingOpsSpec gates that equality row-for-row.
    *
    * Install discipline (the rebucket contract verbatim): the new store
    * is built COMPLETE at `<path>.recell-new` (cells AND
    * `.recell-new.quantizers`), then installed by renames behind
    * `<path>.recell-bak` markers; the live store serves unchanged until
    * the swap instant, and [[recoverIvfPqRecell]] resolves any crash to
    * a complete pre- or post-recell image (rolling FORWARD across the
    * cells-installed/quantizers-pending window — the one state a naive
    * roll-back would mispair). Tombstones are dropped LAST, inside the
    * backup window: the new store holds only survivors, so a stale set
    * would merely over-filter ids re-appended later — recovery finishes
    * the drop. A `_graft_stream_id` marker survives the swap under the
    * same QUIESCENCE CONTRACT as rebucket: stop the stream with its last
    * batch committed first (the store's rows are re-encoded wholesale,
    * so an uncommitted batch replayed after the swap would double-land).
    *
    * `nCells <= 0` resolves to [[HighRecall.nCells]] of the live count —
    * the "follow the corpus" default; `nCodes <= 0` keeps the current
    * codebook's size. Returns (liveVectors, nCells) actually built.
    * Requires the canonical single-level layout
    * ([[flattenIngestedStore]] first for stream-fed stores). A store
    * with a raw-vector sidecar gets it rewritten to the survivors under
    * the retrained cells inside the same install (the sidecar's vacuum);
    * [[recellIvfPqStoreFromSidecar]] sources `corpus` from the sidecar
    * itself, making the retrain lake-free. */
  def recellIvfPqStore(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String, corpus: DataFrame, vecCol: String,
                       nCells: Int = -1, nCodes: Int = -1,
                       retrainCodebook: Boolean = true,
                       coarseMaxIter: Int = 20, pqMaxIter: Int = 10)
      : (Long, Int) =
    graft.sources.StoreLock.withLock(spark, indexPath, "recell") {
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
        spark.sparkContext.hadoopConfiguration)
      requireSingleLevel(fs, indexPath, "recellIvfPqStore")
      requireNoSplitManifest(fs, indexPath, "recell")
      val base = indexPath.stripSuffix("/")
      val bak = new org.apache.hadoop.fs.Path(base + ".recell-bak")
      if (fs.exists(bak) ||
          fs.exists(new org.apache.hadoop.fs.Path(base + ".recell-bak.quantizers")) ||
          fs.exists(new org.apache.hadoop.fs.Path(base + ".recell-bak.vectors")))
        throw new java.io.IOException(
          s"refusing to recell $indexPath: $bak exists from an interrupted " +
            "recell — run Quantize.recoverIvfPqRecell first")
      if (fs.exists(new org.apache.hadoop.fs.Path(base + ".delete-bak")))
        throw new java.io.IOException(
          s"refusing to recell $indexPath: delete backup exists from an " +
            "interrupted delete — run Quantize.recoverDeleteBackup first")
      val (_, oldCodebook, p) = loadQuantizers(spark, indexPath)
      if (!corpus.columns.contains(p.idCol) || !corpus.columns.contains(vecCol))
        throw new IllegalArgumentException(
          s"recellIvfPqStore: corpus must carry '${p.idCol}' and '$vecCol' " +
            s"(has: ${corpus.columns.mkString(", ")})")
      // live ids = store ids minus tombstones — a column-pruned scan;
      // localCheckpoint so the id set is pinned before the store mutates
      val tomb = readTombstones(spark, indexPath, p.idCol)
      val liveIds = spark.read.parquet(indexPath).select(p.idCol).distinct()
        .join(broadcast(tomb), Seq(p.idCol), "left_anti")
        .localCheckpoint()
      val nLive = liveIds.count()
      if (nLive == 0)
        throw new IllegalStateException(
          s"recellIvfPqStore: store $indexPath has no live vectors — " +
            "nothing to retrain on (rebuild instead)")
      val survivors = corpus.select(col(p.idCol), col(vecCol))
        .join(liveIds, Seq(p.idCol), "leftsemi")
        .localCheckpoint() // training + encode both read it; pin once
      val nSurv = survivors.count()
      if (nSurv != nLive)
        throw new IllegalStateException(
          s"recellIvfPqStore: store $indexPath has $nLive live vectors but " +
            s"the corpus yields $nSurv rows for them — " +
            (if (nSurv < nLive) "live ids are missing from the corpus and " +
              "cannot be re-encoded (data loss); pass the lake table the " +
              "store was built from"
             else "the corpus carries duplicate rows for live ids; " +
              "de-duplicate it first"))
      val cells = if (nCells > 0) nCells else HighRecall.nCells(nLive)
      val codes =
        if (nCodes > 0) nCodes
        else oldCodebook.select("code").distinct().count().toInt
      // deterministic retrain on the survivors (first-k-ids seeding)
      val (newCents, newCodebook) =
        if (p.residual && retrainCodebook)
          trainIvfPq(survivors, p.idCol, vecCol, p.dims, cells, p.nBlocks,
            codes, coarseMaxIter, pqMaxIter)
        else {
          val c = Clustering.kmeansFit(survivors, p.idCol, vecCol,
              cells, coarseMaxIter)
            .select(col("cluster").as("centroid_id"),
              col("centroid").as("cen_emb"))
            .localCheckpoint()
          val cb =
            if (retrainCodebook)
              pqTrain(survivors, p.idCol, vecCol, p.dims, p.nBlocks, codes,
                pqMaxIter)
            else oldCodebook
          (c, cb)
        }
      // new store built COMPLETE at the sibling (cells + quantizers);
      // the live store serves unchanged until the swap below
      val tmp = base + ".recell-new"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.delete(new org.apache.hadoop.fs.Path(tmp + ".quantizers"), true)
      fs.delete(new org.apache.hadoop.fs.Path(tmp + ".vectors"), true)
      // a sidecar store keeps its sidecar: the survivors are re-assigned
      // under the RETRAINED centroids and written fresh — which also
      // vacuums dead rows and retry duplicates (the sidecar's one
      // compaction point)
      val hadSidecar = hasVectorSidecar(spark, indexPath)
      buildSelfContained(spark, survivors, p.idCol, vecCol,
        newCents, "centroid_id", "cen_emb", newCodebook, "code", "c_emb",
        p.dims, p.nBlocks, p.residual, tmp, storeVectors = hadSidecar)
      // stream marker travels (rebucket's quiescence contract applies)
      val marker = new org.apache.hadoop.fs.Path(base, "_graft_stream_id")
      if (fs.exists(marker))
        org.apache.hadoop.fs.FileUtil.copy(fs, marker, fs,
          new org.apache.hadoop.fs.Path(tmp, "_graft_stream_id"),
          false, spark.sparkContext.hadoopConfiguration)
      // Install: cells aside, quantizers aside, new cells in, new
      // quantizers in, tombstones dropped, backups dropped — every crash
      // point resolvable by recoverIvfPqRecell (roll-back before the new
      // cells land, roll-forward after).
      val main = new org.apache.hadoop.fs.Path(base)
      val qMain = new org.apache.hadoop.fs.Path(base + ".quantizers")
      val qBak = new org.apache.hadoop.fs.Path(base + ".recell-bak.quantizers")
      val vMain = new org.apache.hadoop.fs.Path(base + ".vectors")
      val vBak = new org.apache.hadoop.fs.Path(base + ".recell-bak.vectors")
      // the whole rename sequence runs behind the store gate: the
      // multi-second retrain above served the old store unchanged; the
      // install is the only reader-visible instant
      graft.sources.StoreGate.writeLocked(indexPath) {
        if (!fs.rename(main, bak))
          throw new java.io.IOException(s"recell: failed to move $main aside")
        if (!fs.rename(qMain, qBak))
          throw new java.io.IOException(
            s"recell: failed to move $qMain aside — run recoverIvfPqRecell")
        if (hadSidecar && !fs.rename(vMain, vBak))
          throw new java.io.IOException(
            s"recell: failed to move $vMain aside — run recoverIvfPqRecell")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), main))
          throw new java.io.IOException(
            s"recell: failed to install $tmp — run recoverIvfPqRecell")
        if (!fs.rename(new org.apache.hadoop.fs.Path(tmp + ".quantizers"), qMain))
          throw new java.io.IOException(
            s"recell: failed to install $tmp.quantizers — run recoverIvfPqRecell")
        if (hadSidecar &&
            !fs.rename(new org.apache.hadoop.fs.Path(tmp + ".vectors"), vMain))
          throw new java.io.IOException(
            s"recell: failed to install $tmp.vectors — run recoverIvfPqRecell")
        // the new store holds only survivors: the tombstones' work is done
        fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath)), true)
        fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old"), true)
        if (!fs.delete(bak, true))
          throw new java.io.IOException(s"recell: failed to remove $bak")
        if (!fs.delete(qBak, true))
          throw new java.io.IOException(s"recell: failed to remove $qBak")
        if (hadSidecar && !fs.delete(vBak, true))
          throw new java.io.IOException(s"recell: failed to remove $vBak")
      }
      (nLive, cells)
    }

  /** [[recellIvfPqStore]] with NO corpus argument — the exact vectors
    * come from the store's own `.vectors` sidecar, so a sidecar store's
    * geometry can follow its corpus without the operator holding a lake
    * pointer (the retrain twin of [[searchSelfContainedRefinedStored]]).
    * The sidecar is a versioned multiset; each id resolves to its
    * max-vepoch (latest) vector before the semi-join, which then yields
    * exactly one row per live id — the corpus-shape recell requires —
    * and a re-appended id retrains on its UPDATED vector, never the
    * stale one. Fails loudly when the store was built without
    * `storeVectors`. */
  def recellIvfPqStoreFromSidecar(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String,
                                  nCells: Int = -1, nCodes: Int = -1,
                                  retrainCodebook: Boolean = true,
                                  coarseMaxIter: Int = 20, pqMaxIter: Int = 10)
      : (Long, Int) = {
    if (!hasVectorSidecar(spark, indexPath))
      throw new IllegalStateException(
        s"store $indexPath has no raw-vector sidecar " +
          s"(${vectorsPath(indexPath)} missing) — build it with " +
          "buildSelfContained(..., storeVectors = true), or use " +
          "recellIvfPqStore with an explicit corpus")
    val p = loadQuantizers(spark, indexPath)._3
    val corpus = resolveSidecarLatest(
      spark.read.parquet(vectorsPath(indexPath)), p.idCol)
    recellIvfPqStore(spark, indexPath, corpus, "vec",
      nCells, nCodes, retrainCodebook, coarseMaxIter, pqMaxIter)
  }

  // --------------------------------------------------------------------
  // INCREMENTAL recell (round 11): split only the DRIFTED cells.
  // recellIvfPqStore remediates drift by rewriting the ENTIRE store —
  // correct, but at 100 TB a full-corpus re-encode is the wrong price
  // when drift is localized (the measured drift fixture crams appended
  // vectors into a few nearest stale cells: THOSE cells bloat, the rest
  // are untouched). splitDriftedCells retrains and rewrites ONLY the
  // overfull cells — rewrite bytes ∝ drifted-cell mass, not store size
  // (ScaleProbe commits the measured ratio) — under a staged, crash-
  // recoverable install:
  //   1. manifest (.split-manifest: old cell ids, new cell ids, vepoch)
  //   2. ONE grouped Lloyd loop retrains `splitWays` sub-centroids for
  //      EVERY drifted cell together, each on its own live sidecar
  //      vectors (deterministic kmeans; Clustering.kmeansFitGrouped) —
  //      the wall is ~flat in the number of drifted cells instead of a
  //      serial per-cell lifecycle; then ONE re-encode of all members
  //      against their nearest new sub-centroid with the FROZEN
  //      codebook, ONE index append + ONE sidecar write — all
  //      UNREACHABLE: no probe selects a centroid id the quantizer
  //      table does not hold
  //   3. swap the centroids table (write sibling, rename behind a bak
  //      marker): the instant it lands, probes see the sub-cells and
  //      never the old cell
  //   4. GC the old cell directories (index + every vepoch's sidecar
  //      dir) — unreachable garbage either way — and drop the manifest.
  //  A crash at any point resolves through recoverCellSplit: before the
  //  centroid swap the store serves EXACTLY as before (roll back = drop
  //  the new dirs); after it, roll forward = finish the GC. Search
  //  semantics are assignment-agnostic (each vector lives in exactly one
  //  cell and its codes reconstruct with that cell's centroid), so
  //  search-after-partial-recell at full probe + full refine is the
  //  closed-form exact kNN — the qx124 gate.
  // --------------------------------------------------------------------

  private def splitManifestPath(indexPath: String) =
    indexPath.stripSuffix("/") + ".split-manifest"

  private def requireNoSplitManifest(fs: org.apache.hadoop.fs.FileSystem,
                                     indexPath: String, op: String): Unit =
    if (fs.exists(new org.apache.hadoop.fs.Path(splitManifestPath(indexPath))))
      throw new java.io.IOException(
        s"refusing to $op $indexPath: ${splitManifestPath(indexPath)} " +
          "exists from an interrupted cell split — run " +
          "Quantize.recoverCellSplit first")

  /** Split the overfull cells of a self-contained sidecar store —
    * incremental drift remediation. A cell is DRIFTED when its live
    * occupancy exceeds `overshoot` × the mean (drift concentrates new
    * mass into few stale cells; fat cells are both the recall loss —
    * coarse pruning — and the scan-cost loss). Each one is split
    * `splitWays` ways. Cold cells are never read, re-encoded, or
    * rewritten. Returns (cellsSplit, vectorsRewritten). */
  def splitDriftedCells(spark: org.apache.spark.sql.SparkSession,
                        indexPath: String, overshoot: Double = 2.0,
                        splitWays: Int = 2,
                        coarseMaxIter: Int = 10): (Int, Long) =
    graft.sources.StoreLock.withLock(spark, indexPath, "cell-split") {
      require(overshoot > 1.0, s"overshoot=$overshoot must be > 1")
      require(splitWays >= 2, s"splitWays=$splitWays must be >= 2")
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
        spark.sparkContext.hadoopConfiguration)
      requireSingleLevel(fs, indexPath, "splitDriftedCells")
      requireNoSplitManifest(fs, indexPath, "split cells of")
      if (fs.exists(new org.apache.hadoop.fs.Path(
          indexPath.stripSuffix("/") + ".delete-bak")))
        throw new java.io.IOException(
          s"refusing to split $indexPath: delete backup exists — run " +
            "Quantize.recoverDeleteBackup first")
      if (!hasVectorSidecar(spark, indexPath))
        throw new IllegalStateException(
          s"splitDriftedCells: store $indexPath has no raw-vector sidecar " +
            s"(${vectorsPath(indexPath)} missing) — the split retrains " +
            "sub-centroids from the cell's own vectors; build with " +
            "storeVectors = true or use the full recellIvfPqStore")
      val (cents, cb, p) = loadQuantizers(spark, indexPath)
      val centIdType = cents.schema.apply("centroid_id").dataType
      val centVecType = cents.schema.apply("cen_emb").dataType
      val numeric = centIdType match {
        case _: org.apache.spark.sql.types.LongType |
             _: org.apache.spark.sql.types.IntegerType |
             _: org.apache.spark.sql.types.ShortType => true
        case _ => false
      }
      if (!numeric)
        throw new IllegalArgumentException(
          "splitDriftedCells: fresh sub-cell ids are allocated past the " +
            s"current maximum, which needs NUMERIC centroid ids (store " +
            s"$indexPath has ${centIdType.simpleString}) — use the full " +
            "recellIvfPqStore")
      val tomb = readTombstones(spark, indexPath, p.idCol)
      // live occupancy per cell: one column-pruned scan (block=0 ⇒ one
      // row per vector); collect is bounded by the cell count. DISTINCT
      // ids — a retry-double-landed append leaves two block=0 rows for
      // one vector, and raw row counts would flag/skip cells on
      // duplicate-inflated occupancy
      val occ = spark.read.parquet(indexPath)
        .filter(col("block") === 0)
        .select(col(p.idCol), col("centroid_id").cast("long").as("__cell"))
        .join(broadcast(tomb), Seq(p.idCol), "left_anti")
        .groupBy("__cell").agg(countDistinct(col(p.idCol)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      val nLive = occ.map(_._2).sum
      if (nLive == 0) return (0, 0L)
      val mean = nLive.toDouble / occ.length
      val drifted = occ.filter(_._2 > overshoot * mean)
        // a cell needs at least one member per sub-centroid to retrain
        .filter(_._2 >= 2L * splitWays).map(_._1).sorted
      if (drifted.isEmpty) return (0, 0L)
      val newFrom = cents.agg(max(col("centroid_id").cast("long")))
        .collect().head.getLong(0) + 1L
      val vepoch = sidecarNextVepoch(spark, vectorsPath(indexPath),
        "splitDriftedCells")
      // 1. manifest FIRST — recovery's decision record
      writeTextFile(fs, splitManifestPath(indexPath),
        s"""{"old":[${drifted.mkString(",")}],""" +
          s""""newFrom":$newFrom,"newWays":$splitWays,"vepoch":$vepoch}""")
      import spark.implicits._
      // The drifted cells' LIVE members — ONE scan for all of them. Ids
      // present in the cells' own CODE rows (minus tombstones) — the
      // same live-ids guard the full recell uses, and the load-bearing
      // one here: the sidecar keeps dead rows (deletes/sweeps never
      // touch it; a swept-then-re-appended id's STALE row also lingers
      // in its old cell), so a sidecar-only anti-join would re-encode
      // deleted vectors into live sub-cells (resurrection) and re-stamp
      // stale vectors at the newest vepoch (inverting the versioned
      // resolution). Membership truth is the index; the sidecar only
      // supplies the floats for ids the index says are here.
      val liveIds = spark.read.parquet(indexPath)
        .filter(col("centroid_id").cast("long").isInCollection(drifted))
        .filter(col("block") === 0)
        .select(col(p.idCol), col("centroid_id").cast("long").as("__cell"))
        .distinct()
        .join(broadcast(tomb), Seq(p.idCol), "left_anti")
      // UN-hinted join: drifted cells are by definition the store's
      // largest, so their live-id set is the one thing NOT to
      // collect-and-broadcast through the driver; both sides are
      // drifted-mass-scale and the optimizer can pick the exchange.
      // resolveSidecarLatest across ALL drifted cells at once: versioned
      // resolution picks each id's newest row among them.
      val members = resolveSidecarLatest(
          spark.read.parquet(vectorsPath(indexPath))
            .filter(col("centroid_id").cast("long").isInCollection(drifted))
            .drop("centroid_id"), p.idCol)
        .join(liveIds, Seq(p.idCol))
        .localCheckpoint() // retrain + encode + sidecar all read it
      // 2. ONE grouped Lloyd loop fits every drifted cell's sub-centroids
      //    together (round 11 ran a serial per-cell lifecycle — D ×
      //    (kmeans rounds + 2 writes) of driver barriers; a drift episode
      //    touching dozens of cells paid dozens of them). Fresh ids are
      //    allocated deterministically — sorted drifted cell j, sub-slot
      //    s ∈ 1..splitWays → newFrom + j·splitWays + (s−1) — exactly the
      //    id range the manifest records for recovery.
      val fitted = graft.operators.Clustering.kmeansFitGrouped(
        members, "__cell", p.idCol, "vec", splitWays, coarseMaxIter)
      val cellIdx = drifted.zipWithIndex
        .map { case (c, j) => (c, j.toLong) }.toSeq.toDF("__cell", "__cidx")
      val subCents = fitted
        .join(broadcast(cellIdx), Seq("__cell"))
        .select((lit(newFrom) + col("__cidx") * splitWays + col("cluster") - 1L)
            .cast(centIdType).as("centroid_id"),
          col("centroid").cast(centVecType).as("cen_emb"))
        .localCheckpoint() // tiny; joins the encode AND the final swap
      //    …then re-encode ALL members against their nearest new sub-centroid
      //    (frozen codebook) in one pass and land the new cells with ONE
      //    index append + ONE sidecar write — UNREACHABLE until the
      //    quantizer swap below. Nearest-among-all-new-sub-cells is
      //    assignment-agnostic for search (each vector lives in exactly
      //    one cell and reconstructs with that cell's centroid), and
      //    letting a member cross to a neighboring split's closer
      //    sub-centroid only tightens its reconstruction. Encode each id
      //    once even if duplicate appends left it live in two drifted
      //    cells.
      val encodeIn = members.dropDuplicates(p.idCol)
        .select(col(p.idCol), col("vec"))
      val newRows =
        if (p.residual) ivfPqIndexResidual(encodeIn, p.idCol, "vec",
          subCents, "centroid_id", "cen_emb", cb, "code", "c_emb",
          p.dims, p.nBlocks)
        else ivfPqIndex(encodeIn, p.idCol, "vec",
          subCents, "centroid_id", "cen_emb", cb, "code", "c_emb",
          p.dims, p.nBlocks)
      newRows.write.mode("append").partitionBy("centroid_id")
        .parquet(indexPath)
      writeVectorSidecar(encodeIn, p.idCol, "vec",
        subCents, "centroid_id", "cen_emb", vectorsPath(indexPath),
        overwrite = false, vepoch = vepoch)
      val rewritten = encodeIn.count()
      // 3. centroid-table swap: old − drifted + every sub-centroid
      val qbase = quantizersPath(indexPath)
      val newCents = cents
        .filter(!col("centroid_id").cast("long").isInCollection(drifted))
        .unionByName(subCents)
      newCents.coalesce(1).write.mode("overwrite")
        .parquet(s"$qbase/centroids-new")
      val cMain = new org.apache.hadoop.fs.Path(s"$qbase/centroids")
      val cBak = new org.apache.hadoop.fs.Path(s"$qbase/centroids-bak")
      val cNew = new org.apache.hadoop.fs.Path(s"$qbase/centroids-new")
      // reader-visible window: the centroid swap plus the old-cell GC (a
      // pre-swap reader's probe plan still references the retired cells)
      // — everything above served the old geometry unchanged
      graft.sources.StoreGate.writeLocked(indexPath) {
        if (!fs.rename(cMain, cBak))
          throw new java.io.IOException(
            s"split: failed to retire $cMain — run recoverCellSplit")
        if (!fs.rename(cNew, cMain))
          throw new java.io.IOException(
            s"split: failed to install $cNew — run recoverCellSplit")
        if (!fs.delete(cBak, true))
          throw new java.io.IOException(s"split: failed to drop $cBak")
        // 4. GC the old (now unreachable) cell dirs, then retire the manifest
        gcSplitCells(spark, fs, indexPath, drifted)
        fs.delete(new org.apache.hadoop.fs.Path(splitManifestPath(indexPath)), false)
      }
      (drifted.length, rewritten)
    }

  private def writeTextFile(fs: org.apache.hadoop.fs.FileSystem,
                            path: String, body: String): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** Drop the retired cells' directories: the index cell dir plus that
    * cell's dir under EVERY sidecar vepoch partition. */
  private def gcSplitCells(spark: org.apache.spark.sql.SparkSession,
                           fs: org.apache.hadoop.fs.FileSystem,
                           indexPath: String, cells: Seq[Long]): Unit = {
    for (c <- cells)
      fs.delete(new org.apache.hadoop.fs.Path(
        indexPath.stripSuffix("/") + s"/centroid_id=$c"), true)
    val vroot = new org.apache.hadoop.fs.Path(vectorsPath(indexPath))
    if (fs.exists(vroot))
      for (vep <- fs.listStatus(vroot)
             if vep.isDirectory && vep.getPath.getName.startsWith("vepoch=");
           c <- cells)
        fs.delete(new org.apache.hadoop.fs.Path(vep.getPath, s"centroid_id=$c"), true)
  }

  /** Resolve an interrupted [[splitDriftedCells]]. Decision record = the
    * manifest; decision key = whether the installed centroid table still
    * holds the manifest's OLD ids (the swap is one rename — atomic):
    *  - centroids dir MISSING (crash mid-swap) → install `centroids-new`
    *    (it was fully written before the swap began), then forward;
    *  - centroids present WITH the new ids → the swap landed: finish the
    *    GC of the old cell dirs and drop the manifest;
    *  - centroids present WITHOUT them → the swap never started: drop
    *    the (unreachable) new cell/sidecar dirs and the sibling, store
    *    back to its exact pre-split state.
    * Returns true when there was a manifest to resolve. */
  def recoverCellSplit(spark: org.apache.spark.sql.SparkSession,
                       indexPath: String): Boolean =
    // Same lock as splitDriftedCells and every other mutation: the
    // rollback/roll-forward renames and deletes must not interleave with
    // a concurrent sweep/append/compact cycle touching the same dirs.
    graft.sources.StoreLock.withLock(spark, indexPath, "cell-split-recover") {
      recoverCellSplitLocked(spark, indexPath)
    }

  private def recoverCellSplitLocked(spark: org.apache.spark.sql.SparkSession,
                                     indexPath: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val mp = new org.apache.hadoop.fs.Path(splitManifestPath(indexPath))
    if (!fs.exists(mp)) return false
    val body = {
      val in = fs.open(mp)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    def longs(key: String): Seq[Long] =
      s""""$key":\\[([0-9,]*)\\]""".r.findFirstMatchIn(body)
        .map(_.group(1)).filter(_.nonEmpty)
        .map(_.split(',').map(_.toLong).toSeq).getOrElse(Seq.empty)
    def long(key: String): Long =
      s""""$key":(-?[0-9]+)""".r.findFirstMatchIn(body).get.group(1).toLong
    val old = longs("old")
    val newIds = (0 until old.length * long("newWays").toInt)
      .map(long("newFrom") + _)
    val vepoch = long("vepoch")
    val qbase = quantizersPath(indexPath)
    val cMain = new org.apache.hadoop.fs.Path(s"$qbase/centroids")
    val cBak = new org.apache.hadoop.fs.Path(s"$qbase/centroids-bak")
    val cNew = new org.apache.hadoop.fs.Path(s"$qbase/centroids-new")
    if (!fs.exists(cMain) && fs.exists(cNew) && !fs.rename(cNew, cMain))
      throw new java.io.IOException(s"recover: failed to install $cNew")
    if (!fs.exists(cMain) && fs.exists(cBak) && !fs.rename(cBak, cMain))
      throw new java.io.IOException(s"recover: failed to restore $cBak")
    val installedIds = spark.read.parquet(cMain.toString)
      .select(col("centroid_id").cast("long")).collect().map(_.getLong(0)).toSet
    // the swap is ONE rename, so it is all-or-nothing; the OLD ids are
    // the reliable key (a cell may have allocated fewer than `newWays`
    // fresh ids, so probing for new ids could misread a landed swap)
    if (old.forall(o => !installedIds.contains(o))) {
      // forward: the swap landed — finish cleanup
      fs.delete(cBak, true)
      fs.delete(cNew, true)
      gcSplitCells(spark, fs, indexPath, old)
    } else {
      // back: drop the unreachable new dirs, store is pre-split
      for (n <- newIds)
        fs.delete(new org.apache.hadoop.fs.Path(
          indexPath.stripSuffix("/") + s"/centroid_id=$n"), true)
      val vdir = new org.apache.hadoop.fs.Path(
        vectorsPath(indexPath) + s"/vepoch=$vepoch")
      fs.delete(vdir, true)
      fs.delete(cNew, true)
      fs.delete(cBak, true)
    }
    fs.delete(mp, false)
    true
  }

  /** Resolve an interrupted [[recellIvfPqStore]] to a complete pre- or
    * post-recell image. The decision key is which pieces exist:
    *  - store dir missing → the swap had not completed: the backed-up
    *    cells (and quantizers, if they got as far as moving) are renamed
    *    back and the `.recell-new` image is dropped — pre-recell state.
    *  - store dir present but its `.quantizers` missing → the one
    *    mid-install state: the NEW cells are in place, so recovery rolls
    *    FORWARD by installing `.recell-new.quantizers` (pairing old
    *    quantizers with new cells would corrupt every ADC distance).
    *  - both present with backups still standing → the install
    *    completed but cleanup didn't: finish the tombstone drop and
    *    remove the backups — post-recell state.
    * Returns true when there was anything to resolve. */
  def recoverIvfPqRecell(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String): Boolean = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val base = indexPath.stripSuffix("/")
    val main = new org.apache.hadoop.fs.Path(base)
    val qMain = new org.apache.hadoop.fs.Path(base + ".quantizers")
    val bak = new org.apache.hadoop.fs.Path(base + ".recell-bak")
    val qBak = new org.apache.hadoop.fs.Path(base + ".recell-bak.quantizers")
    val tmp = new org.apache.hadoop.fs.Path(base + ".recell-new")
    val qTmp = new org.apache.hadoop.fs.Path(base + ".recell-new.quantizers")
    val vMain = new org.apache.hadoop.fs.Path(base + ".vectors")
    val vBak = new org.apache.hadoop.fs.Path(base + ".recell-bak.vectors")
    val vTmp = new org.apache.hadoop.fs.Path(base + ".recell-new.vectors")
    if (!fs.exists(bak) && !fs.exists(qBak) && !fs.exists(vBak)) return false
    // sidecar stores add one rename on each side of the quantizer
    // install; the roll-forward half (crash after the sidecar moved
    // aside, before the new one landed) must install the NEW sidecar —
    // restoring the backup would pair pre-recell vectors with
    // post-recell cell ids and silently break the pruned rescore lookups
    def rollForwardSidecar(): Unit =
      if (fs.exists(vBak) && !fs.exists(vMain)) {
        if (!fs.exists(vTmp))
          throw new java.io.IOException(
            s"recover: store $main has no vector sidecar and no $vTmp to " +
              "install — manual inspection required")
        if (!fs.rename(vTmp, vMain))
          throw new java.io.IOException(s"recover: failed to install $vMain")
      }
    if (!fs.exists(main)) {
      // roll back: reinstate the backed-up cells (and quantizers/sidecar
      // if they had been moved; otherwise the originals never left)
      if (fs.exists(bak) && !fs.rename(bak, main))
        throw new java.io.IOException(s"recover: failed to restore $main")
      if (!fs.exists(qMain) && fs.exists(qBak) && !fs.rename(qBak, qMain))
        throw new java.io.IOException(s"recover: failed to restore $qMain")
      if (!fs.exists(vMain) && fs.exists(vBak) && !fs.rename(vBak, vMain))
        throw new java.io.IOException(s"recover: failed to restore $vMain")
      fs.delete(tmp, true); fs.delete(qTmp, true); fs.delete(vTmp, true)
    } else if (!fs.exists(qMain)) {
      // new cells installed, quantizers pending → roll forward
      if (!fs.exists(qTmp))
        throw new java.io.IOException(
          s"recover: store $main has no quantizers and no $qTmp to " +
            "install — manual inspection required")
      if (!fs.rename(qTmp, qMain))
        throw new java.io.IOException(s"recover: failed to install $qMain")
      rollForwardSidecar()
      fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath)), true)
      fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old"), true)
      fs.delete(bak, true); fs.delete(qBak, true); fs.delete(vBak, true)
      fs.delete(tmp, true)
    } else {
      // cells + quantizers in place; the sidecar install may still be
      // pending (the one crash window after the quantizer install), then
      // finish cleanup (tombstone drop may be pending)
      rollForwardSidecar()
      fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath)), true)
      fs.delete(new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old"), true)
      fs.delete(bak, true); fs.delete(qBak, true); fs.delete(vBak, true)
      fs.delete(tmp, true); fs.delete(qTmp, true); fs.delete(vTmp, true)
    }
    true
  }

  /** Retract vector ids from a persisted index WITHOUT touching the store:
    * append them to the sibling `<indexPath>.tombstones` parquet side
    * table. O(batch) metadata IO; the inverted lists are not opened.
    * `idCol` is validated against the store schema like
    * [[deleteFromIvfPqIndex]] — a mismatched column name fails loudly.
    * Returns the number of (distinct) ids in the appended batch. Pair
    * with [[ivfPqSearchStoredRetained]] to query and [[retentionSweep]]
    * to reclaim.
    *
    * Runs under the store's [[graft.sources.StoreLock]]: a retraction
    * attempted while a [[retentionSweep]] holds the lock fails loudly
    * (`StoreLockedException` — retry after the sweep) instead of racing
    * the sweep's tombstone-set swap. Without the interlock, a batch
    * appended between the sweep's snapshot read and its swap would be
    * silently replaced by the snapshot-derived set — the retracted ids
    * would REAPPEAR in searches, violating the over-filter-only
    * invariant. Loud-and-retryable beats silent under-filtering.
    * Also converges a crashed sweep swap (only `.tombstones.old` on
    * disk) before appending — see [[recoverTombstoneSwap]]. */
  def addTombstones(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                    ids: DataFrame, idCol: String): Long =
    graft.sources.StoreLock.withLock(spark, indexPath, "tombstone-append") {
      val dataFields = spark.read.parquet(indexPath).schema.fields
        .filterNot(_.name == "centroid_id")
      if (!dataFields.exists(_.name == idCol))
        throw new IllegalArgumentException(
          s"addTombstones: store $indexPath has no column '$idCol' " +
            s"(data columns: ${dataFields.map(_.name).mkString(", ")})")
      val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
        spark.sparkContext.hadoopConfiguration)
      recoverTombstoneSwap(fs, indexPath)
      val batch = ids.select(col(idCol)).distinct().localCheckpoint()
      batch.coalesce(1).write.mode("append").parquet(tombstonesPath(indexPath))
      batch.count()
    }

  /** Converge a crashed [[swapTombstones]]: a crash between its
    * rename(main → old) and rename(new → main) leaves only
    * `.tombstones.old` on disk. READERS already fall back to it
    * ([[readTombstones]]), but a WRITER must reinstate it before touching
    * the set — an append-mode write against the missing main directory
    * would create it holding only the new batch, and the reader's
    * main-first preference would then silently retire the entire prior
    * set: permanent under-filtering, the one failure mode the tombstone
    * design must never have. Mirrors [[recoverDeleteBackup]]'s
    * crashed-state discipline, but automatic — the recovery is a single
    * rename, so nothing is left for an operator to decide. */
  private def recoverTombstoneSwap(fs: org.apache.hadoop.fs.FileSystem,
                                   indexPath: String): Unit = {
    val main = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath))
    val old = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old")
    if (!fs.exists(main) && fs.exists(old) && !fs.rename(old, main))
      throw new java.io.IOException(
        s"tombstones: failed to reinstate crashed swap from $old")
  }

  /** The standing tombstone set of a persisted index — empty frame (with
    * the store's id column name and type) when none have been added.
    * Falls back to `<path>.tombstones.old` if a [[retentionSweep]] crashed
    * mid-swap, so retracted ids never transiently reappear in searches. */
  // Bounded tombstone sets memoized by directory fingerprint and served
  // as LocalRelations — the vector twin of the lexical store's memo: the
  // serving anti-join broadcasts these rows anyway, and a LocalRelation
  // broadcast build is jobless. Any landed tombstone write or sweep
  // changes the fingerprint.
  private val tombMemo = new DriverPlan.TableMemo(maxEntries = 64, maxRows = 65536)

  def readTombstones(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     idCol: String): DataFrame = {
    val main = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath))
    val old = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old")
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val src =
      if (fs.exists(main)) Some(main)
      else if (fs.exists(old)) Some(old)
      else None
    src match {
      case Some(p) => tombMemo.localized(spark,
        Retrieval.fsFingerprint(spark, Seq(p.toString)) + "#" + idCol)(
        spark.read.parquet(p.toString).select(idCol).distinct())
      case None =>
        // the empty-tombstone id type comes from the index schema —
        // memoize that resolution too (it is a schema-inference job)
        val idType = DriverPlan.memoRelation(spark, s"cellsraw#$indexPath#" +
            Retrieval.fsFingerprint(spark, Seq(indexPath)))(
            spark.read.parquet(indexPath))
          .schema.apply(idCol).dataType
        DriverPlan.localFrame(spark, Seq.empty,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol, idType))))
    }
  }

  /** [[ivfPqSearchStored]] with the tombstone set filtered out: the
    * anti-join runs AFTER the probe-pruned scan (cost bounded by probed
    * cells, broadcast tombstones) and BEFORE ADC ranking, so the top-k is
    * k SURVIVORS — identical to searching a store the retracted ids were
    * physically deleted from. This is the everyday search of a tombstoned
    * deployment; [[retentionSweep]] only changes where the filtering cost
    * is paid, never the result. */
  def ivfPqSearchStoredRetained(spark: org.apache.spark.sql.SparkSession,
                                indexPath: String,
                                queries: DataFrame, qIdCol: String, qVecCol: String,
                                idCol: String,
                                centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                                codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                                dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    val queriesL = graft.operators.DriverPlan.localize(queries)
    Similarity.requireSmallQuerySide(queriesL, "ivfPqSearchStoredRetained")
    val tomb = readTombstones(spark, indexPath, idCol)
    val pruned = prunedStoreScan(spark, indexPath, queriesL, qIdCol, qVecCol,
      centroids, cenIdCol, cenVecCol, nProbe)
    val live = pruned.join(broadcast(tomb), pruned(idCol) === tomb(idCol), "leftanti")
    ivfPqSearchOn(live, queriesL, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)
  }

  final case class SweepStats(cellsSwept: Long, rowsRemoved: Long,
                              tombstonesPurged: Long, tombstonesRemaining: Long)

  /** Maintenance-window retention sweep: physically delete tombstoned
    * vectors from every cell whose tombstoned row fraction is >=
    * `maxTombstoneFraction`, then shrink the tombstone set to the ids
    * that still have live rows — cells below the threshold keep carrying
    * their (cheap, filtered-at-query-time) tombstones until churn
    * accumulates. Runs under the store's [[graft.sources.StoreLock]]
    * (same interlock as compaction/append — concurrent maintenance fails
    * loudly).
    *
    * Cost shape: ONE column-pruned (id, cell) scan of the store computes
    * per-cell fractions map-side (the tombstone set broadcasts); the
    * physical rewrite is [[deleteFromIvfPqIndex]] restricted to the ids
    * of crossing cells — only those cells' files are opened, with the
    * same rename-swap crash discipline ([[recoverDeleteBackup]] applies).
    *
    * Crash ordering is safe at every point: the physical delete commits
    * before the tombstone set shrinks, and the shrink is a rename swap
    * (`.tombstones.new` written, old moved to `.tombstones.old`, new
    * renamed in, old removed — [[readTombstones]] falls back to `.old`).
    * A tombstone for an already-deleted id is a no-op filter, so every
    * interrupted state still answers searches exactly; re-running the
    * sweep converges. */
  def retentionSweep(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                     idCol: String, maxTombstoneFraction: Double): SweepStats = {
    require(maxTombstoneFraction > 0 && maxTombstoneFraction <= 1,
      s"maxTombstoneFraction=$maxTombstoneFraction must be in (0, 1]")
    graft.sources.StoreLock.withLock(spark, indexPath, "retention-sweep") {
      val sweepFs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration)
      requireSingleLevel(sweepFs, indexPath, "retentionSweep")
      requireNoSplitManifest(sweepFs, indexPath, "sweep")
      val tomb = readTombstones(spark, indexPath, idCol).localCheckpoint()
      val nTomb = tomb.count()
      if (nTomb == 0) SweepStats(0, 0, 0, 0)
      else {
        import org.apache.spark.sql.types.{StringType, StructField, StructType}
        val dataFields = spark.read.parquet(indexPath).schema.fields
          .filterNot(_.name == "centroid_id")
        val storeSchema = StructType(
          dataFields :+ StructField("centroid_id", StringType))
        val store = spark.read.schema(storeSchema).parquet(indexPath)
          .select(col(idCol), col("centroid_id"))
        // one (id, cell) scan: per-cell totals and doomed counts, plus the
        // per-tombstoned-id cell map (a vector's nBlocks rows share one
        // cell) — both driver-side results bounded by nCells / |tombstones|
        val flagged = store.join(
          broadcast(tomb.withColumnRenamed(idCol, "__tid").withColumn("__t", lit(1))),
          store(idCol) === col("__tid"), "left")
        val perCell = flagged.groupBy("centroid_id")
          .agg(count(lit(1)).as("total"), sum(coalesce(col("__t"), lit(0))).as("doomed"))
          .filter(col("doomed") > 0)
          .collect()
        val present = flagged.filter(col("__t") === 1)
          .select(col(idCol), col("centroid_id")).distinct()
          .localCheckpoint() // read BEFORE the store mutates below
        val sweepCells = perCell
          .filter(r => r.getLong(2).toDouble / r.getLong(1) >= maxTombstoneFraction)
          .map(_.getString(0)).toSet
        if (sweepCells.isEmpty) {
          // nothing crosses the threshold; still GC orphan tombstones whose
          // ids have no store rows at all (already deleted or never present)
          val orphanCount = nTomb - present.select(idCol).distinct().count()
          if (orphanCount > 0)
            swapTombstones(spark, indexPath,
              tomb.join(present.select(col(idCol)).distinct(), Seq(idCol), "leftsemi"))
          SweepStats(0, 0, orphanCount, nTomb - orphanCount)
        } else {
          val purgeIds = present.filter(col("centroid_id").isInCollection(sweepCells))
            .select(col(idCol)).localCheckpoint()
          // the fraction scan above already knows each crossing cell and
          // its doomed count — hand them straight to the physical tail
          // instead of paying deleteFromIvfPqIndex's rediscovery scan
          val (dfs, dstore) = openStoreForDelete(spark, indexPath, idCol,
            "retentionSweep")
          val sweepHits = perCell
            .filter(r => sweepCells.contains(r.getString(0)))
            .map(r => org.apache.spark.sql.Row(r.getString(0), r.getLong(2)))
          val removed = deleteCellsImpl(spark, indexPath, dfs, dstore,
            purgeIds, idCol, sweepHits)
          val remaining = tomb
            .join(present.filter(!col("centroid_id").isInCollection(sweepCells))
              .select(col(idCol)), Seq(idCol), "leftsemi")
            .localCheckpoint()
          val nRemaining = remaining.count()
          swapTombstones(spark, indexPath, remaining)
          SweepStats(sweepCells.size.toLong, removed, nTomb - nRemaining, nRemaining)
        }
      }
    }
  }

  /** Crash-safe tombstone-set replacement: write `.tombstones.new`, move
    * the current set to `.tombstones.old`, rename new in, drop old. A
    * READABLE SUPERSET of the current set exists at every intermediate
    * state — the stale-`.old` delete happens only while main is present
    * (readers prefer main), and a crashed prior swap (only `.old` on
    * disk) is reinstated as main FIRST rather than deleted, so no window
    * ever has neither set readable. [[readTombstones]] falls back to
    * `.old`; stale tombstones for physically deleted ids are no-op
    * filters, so every state only ever OVER-filters, never under. */
  private def swapTombstones(spark: org.apache.spark.sql.SparkSession,
                             indexPath: String, remaining: DataFrame): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(indexPath),
      spark.sparkContext.hadoopConfiguration)
    val main = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath))
    val fresh = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".new")
    val old = new org.apache.hadoop.fs.Path(tombstonesPath(indexPath) + ".old")
    recoverTombstoneSwap(fs, indexPath)
    if (fs.exists(fresh) && !fs.delete(fresh, true))
      throw new java.io.IOException(s"retention sweep: failed to clear $fresh")
    remaining.coalesce(1).write.mode("overwrite").parquet(fresh.toString)
    // the rename window is gated (round 13): a racing read is CORRECT at
    // every instant regardless (readable superset — see scaladoc), but
    // the serve bracket's rewrite detector would see the retired files
    // vanish and pay a needless recompute
    graft.sources.StoreGate.writeLocked(indexPath) {
      // stale .old is deleted only while main exists — never the sole copy
      if (fs.exists(old) && !fs.delete(old, true))
        throw new java.io.IOException(s"retention sweep: failed to clear $old")
      if (fs.exists(main) && !fs.rename(main, old))
        throw new java.io.IOException(s"retention sweep: failed to retire $main")
      if (!fs.rename(fresh, main))
        throw new java.io.IOException(s"retention sweep: failed to install $fresh")
      fs.delete(old, true) // best-effort: a leftover .old only over-filters
    }
    ()
  }

  /** Search a PERSISTED index: the union of all probed cells (bounded by
    * min(|Q|·nProbe, nCells) — centroid-count-sized planning metadata,
    * never row data) becomes a literal partition filter on the store, so
    * only the probed cells' files are read. Everything after the pruned
    * scan is [[ivfPqSearch]]'s tail, so results are identical to the
    * in-memory path — asserted row-for-row in BatchingOpsSpec, along with
    * the PartitionFilters line in the plan. */
  def ivfPqSearchStored(spark: org.apache.spark.sql.SparkSession, indexPath: String,
                        queries: DataFrame, qIdCol: String, qVecCol: String,
                        idCol: String,
                        centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                        codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                        dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    val queriesL = graft.operators.DriverPlan.localize(queries)
    Similarity.requireSmallQuerySide(queriesL, "ivfPqSearchStored")
    val pruned = prunedStoreScan(spark, indexPath, queriesL, qIdCol, qVecCol,
      centroids, cenIdCol, cenVecCol, nProbe)
    ivfPqSearchOn(pruned, queriesL, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)
  }

  /** The probe-pruned store scan both stored searches start from: probed
    * cells (bounded by min(|Q|·nProbe, nCells) planning metadata) become a
    * literal partition filter on the cell-partitioned store.
    *
    * The store is read with an EXPLICIT schema: hive partition-column type
    * inference would parse numeric-looking string centroid ids (e.g.
    * "01") as integers, silently breaking the equi-join/filter against
    * probeCells' original id type — and the damage is not a cast away
    * ("01" → 1 → "1" never round-trips). The data columns keep their
    * parquet-embedded types; only the partition column's type is pinned
    * to the centroid frame's id type, which is what the directory names
    * were written from. */
  private def prunedStoreScan(spark: org.apache.spark.sql.SparkSession,
                              indexPath: String,
                              queries: DataFrame, qIdCol: String, qVecCol: String,
                              centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                              nProbe: Int): DataFrame =
    prunedScanAt(spark, indexPath, queries, qIdCol, qVecCol,
      centroids, cenIdCol, cenVecCol, nProbe)

  /** [[prunedStoreScan]] generalized to ANY cell-partitioned sibling of
    * the store (the `.vectors` sidecar reads through the same literal
    * `centroid_id IN` partition filter and the same explicit-schema
    * discipline as the cells themselves). */
  private def prunedScanAt(spark: org.apache.spark.sql.SparkSession,
                           dataPath: String,
                           queries: DataFrame, qIdCol: String, qVecCol: String,
                           centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                           nProbe: Int,
                           cellsPre: Option[Seq[Any]] = None): DataFrame = {
    val cells = cellsPre.getOrElse(probedCellIds(queries, qIdCol, qVecCol,
      centroids, cenIdCol, cenVecCol, nProbe))
    val cenType = centroids.schema.apply(cenIdCol).dataType
    // resolution (schema + leaf listing) memoized by the store's
    // fingerprint: a serving request re-resolves only after a landed
    // mutation (appends/sweeps touch cell-dir mtimes, compaction/recell
    // swap the dirs — all visible to one listStatus of the root)
    val raw = DriverPlan.memoRelation(spark,
      s"cells#$dataPath#${cenType.catalogString}#" +
        Retrieval.fsFingerprint(spark, Seq(dataPath))) {
      val dataFields = spark.read.parquet(dataPath).schema.fields
        .filterNot(_.name == "centroid_id")
      val storeSchema = org.apache.spark.sql.types.StructType(
        dataFields :+ org.apache.spark.sql.types.StructField("centroid_id", cenType))
      spark.read.schema(storeSchema).parquet(dataPath)
    }
    raw.filter(col("centroid_id").isInCollection(cells))
  }

  /** Exact-rescore refinement — the FAISS IndexRefineFlat pattern that
    * completes the production ANN stack: the compressed index produces a
    * `rerankDepth`-deep candidate shortlist cheaply (ADC never touches
    * corpus floats), then ONE more pass over the corpus rescores just
    * those candidates with exact distances and re-ranks to k. ADC's
    * quantization error decides only who makes the shortlist, never the
    * final order.
    *
    * Guarantee (not a heuristic): the final top-k by exact distance over
    * the shortlist contains every true neighbor the shortlist contains —
    * so recall can only improve over taking ADC's own top-k
    * (BatchingOpsSpec asserts the inequality, qx70 hash-gates the values).
    *
    * Scale shape: the shortlist is |Q|×rerankDepth rows — BROADCAST onto
    * the corpus scan (equi-join on the vector id), so the rescore costs
    * one corpus read and zero corpus shuffle. Exact distances are the
    * sequential-fold dots, composed in one expression — deterministic and
    * engine-portable, so the oracle reproduces the re-ranking
    * bit-for-bit. */
  def ivfPqSearchRefined(queries: DataFrame, qIdCol: String, qVecCol: String,
                         corpus: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                         codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                         dims: Int, nBlocks: Int, k: Int, nProbe: Int,
                         rerankDepth: Int): DataFrame = {
    require(rerankDepth >= k,
      s"rerankDepth=$rerankDepth must be >= k=$k (the shortlist feeds the final rank)")
    val shortlist = ivfPqSearch(queries, qIdCol, qVecCol,
        corpus, idCol, vecCol, centroids, cenIdCol, cenVecCol,
        codebook, cbIdCol, cbVecCol, dims, nBlocks, rerankDepth, nProbe)
    exactRescore(shortlist, queries, qIdCol, qVecCol, corpus, idCol, vecCol, k)
  }

  /** [[ivfPqSearchRefined]] for a RESIDUAL build: the ADC shortlist comes
    * from [[ivfPqSearchResidual]] (centroid + residual-code reconstruction),
    * the exact-rescore tail is identical — so the recall guarantee carries
    * over unchanged: the final top-k contains every true neighbor the
    * shortlist contains. This is the search the TRAINED builds
    * ([[trainIvfPq]], whose codebook is residual-space) refine with. */
  def ivfPqSearchResidualRefined(queries: DataFrame, qIdCol: String, qVecCol: String,
                                 corpus: DataFrame, idCol: String, vecCol: String,
                                 centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                                 codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                                 dims: Int, nBlocks: Int, k: Int, nProbe: Int,
                                 rerankDepth: Int): DataFrame = {
    require(rerankDepth >= k,
      s"rerankDepth=$rerankDepth must be >= k=$k (the shortlist feeds the final rank)")
    val shortlist = ivfPqSearchResidual(queries, qIdCol, qVecCol,
        corpus, idCol, vecCol, centroids, cenIdCol, cenVecCol,
        codebook, cbIdCol, cbVecCol, dims, nBlocks, rerankDepth, nProbe)
    exactRescore(shortlist, queries, qIdCol, qVecCol, corpus, idCol, vecCol, k)
  }

  /** Exact-L2 rescore of an ADC shortlist — the shared tail of both
    * refined searches. |Q|×rerankDepth shortlist rows broadcast onto one
    * corpus scan (equi-join on the vector id): one corpus read, zero
    * corpus shuffle, sequential-fold dots for engine portability. */
  private def exactRescore(shortlist: DataFrame,
                           queries: DataFrame, qIdCol: String, qVecCol: String,
                           corpus: DataFrame, idCol: String, vecCol: String,
                           k: Int, dedupCandidates: Boolean = false,
                           verCol: Option[String] = None): DataFrame = {
    val qv = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("__qv"))
    val sl = shortlist.select(col("query_id"), col("neighbor_id"))
      .join(broadcast(qv), "query_id")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__d2x").asc, col("neighbor_id").asc)
    val corpusSel = verCol match {
      case Some(v) => corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), col(v).cast("long").as("__ver"))
      case None => corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"))
    }
    val joined0 = corpusSel.join(broadcast(sl), "neighbor_id")
    // the `.vectors` sidecar is an append-only multiset; collapse
    // duplicates AFTER the candidate join — |Q|×rerankDepth rows, never
    // the corpus. With a version column the LATEST row wins (a re-append
    // after delete+sweep carries the id's updated vector); without one
    // (legacy sidecar / explicit corpus) duplicates are identical retry
    // rows and an arbitrary pick is exact.
    val joined = (dedupCandidates, verCol) match {
      case (true, Some(_)) =>
        val wVer = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id", "neighbor_id").orderBy(col("__ver").desc)
        joined0.withColumn("__vrn", row_number().over(wVer))
          .filter(col("__vrn") === 1).drop("__vrn", "__ver")
      case (true, None) => joined0.dropDuplicates("query_id", "neighbor_id")
      case _ => joined0
    }
    joined
      .withColumn("__d2x",
        expr(TX.dotAuto("__qv", "__qv"))
          - lit(2.0) * expr(TX.dotAuto("__qv", "__cv"))
          + expr(TX.dotAuto("__cv", "__cv")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("__d2x"), 6).as("dist2"))
  }

  /** RESIDUAL IVF-PQ index: encode (vector − its cell centroid) instead
    * of the raw vector — the accuracy step production IVFPQ deployments
    * use (FAISS's default `by_residual`). When the coarse clustering
    * captures structure, residuals carry far less energy than raw
    * vectors, so the same code budget quantizes a smaller thing and ADC
    * distances sharpen.
    *
    * WHEN IT HELPS — measured, not assumed: on clustered embeddings
    * (points near their cell centroid) residual energy « raw energy and
    * recall strictly improves at equal code budget (the BatchingOpsSpec
    * row constructs exactly that regime). On the unclustered synthetic
    * test corpus the nearest-of-8 centroid is ~1.7× the raw energy away,
    * so residual encoding would quantize a LARGER vector — use the raw
    * [[ivfPqIndex]] there. The operator is the mechanism; the data
    * decides which variant to deploy.
    *
    * `codebook` must hold RESIDUAL-space entries (train it on residuals;
    * the spec seeds it with observed residuals). Same scale shape as
    * [[ivfPqIndex]]: broadcast centroids + codebook, one corpus pass, no
    * corpus self-join; arithmetic is double (this variant is spec-gated,
    * not oracle-gated, so no cross-engine float contract is needed).
    * Output: (idCol, centroid_id, block, code). */
  def ivfPqIndexResidual(corpus: DataFrame, idCol: String, vecCol: String,
                         centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                         codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                         dims: Int, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val w = dims / nBlocks
    val cen = centroids.select(col(cenIdCol).as("centroid_id"),
      col(cenVecCol).as("__cenv"))
    val e = Similarity.ivfAssign(corpus, idCol, vecCol,
        centroids, cenIdCol, cenVecCol)
      .join(broadcast(cen), "centroid_id")
      .withColumn("__res", expr(
        s"zip_with($vecCol, __cenv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col(idCol), col("centroid_id"), col("__res"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__sub", expr(d.slice("__res", s"block * $w + 1", w)))
      .select(col(idCol), col("centroid_id"), col("block"), col("__sub"),
        expr(TX.dotAuto("__sub", "__sub")).as("__xx"))
    val c = codebook
      .select(col(cbIdCol).as("code"), col(cbVecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $w + 1", w)))
      .select(col("code"), col("block"), col("__csub"),
        expr(TX.dotAuto("__csub", "__csub")).as("__cc"))
    e.join(broadcast(c), "block")
      .withColumn("__d2",
        col("__xx") - lit(2.0) * expr(TX.dotAuto("__sub", "__csub")) + col("__cc"))
      .groupBy(col(idCol), col("centroid_id"), col("block"))
      .agg(min_by(col("code"),
        struct(col("__d2").as("d"), col("code").as("tb"))).as("code"))
  }

  /** Residual IVF-PQ search: the ADC table is per (query, PROBED CELL,
    * block, code) — ||(q − c_cell)_b − codebook_b(code)||² — because the
    * reconstruction is centroid + residual code. Q × nProbe × nBlocks × K
    * entries, still broadcast by construction; the corpus side still
    * touches only its filed codes. Output matches [[ivfPqSearch]]. */
  def ivfPqSearchResidual(queries: DataFrame, qIdCol: String, qVecCol: String,
                          corpus: DataFrame, idCol: String, vecCol: String,
                          centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                          codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                          dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe=$nProbe must be >= 1")
    require(k >= 1, s"k=$k must be >= 1")
    Similarity.requireSmallQuerySide(queries, "ivfPqSearchResidual")
    val index = ivfPqIndexResidual(corpus, idCol, vecCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol, dims, nBlocks)
    ivfPqSearchResidualOn(index, queries, qIdCol, qVecCol, idCol,
      centroids, cenIdCol, cenVecCol, codebook, cbIdCol, cbVecCol,
      dims, nBlocks, k, nProbe)
  }

  /** The residual ADC search tail over an already-materialized (or
    * pruned-from-store) index frame — the residual analog of
    * [[ivfPqSearchOn]], shared by the in-memory and self-contained
    * stored search paths. */
  private[graft] def ivfPqSearchResidualOn(index: DataFrame,
                          queries: DataFrame, qIdCol: String, qVecCol: String,
                          idCol: String,
                          centroids: DataFrame, cenIdCol: String, cenVecCol: String,
                          codebook: DataFrame, cbIdCol: String, cbVecCol: String,
                          dims: Int, nBlocks: Int, k: Int, nProbe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val wSub = dims / nBlocks
    val cen = Similarity.withNorm2(centroids, cenVecCol)
      .select(col(cenIdCol).as("centroid_id"), col(cenVecCol).as("c_vec"),
        col("norm2").as("c_norm2"))
    val q = Similarity.withNorm2(queries, qVecCol)
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("q_vec"),
        col("norm2").as("q_norm2"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(coalesce(col("q_cos"), lit(-2.0)).desc, col("centroid_id").asc)
    // probes KEEP the query vector: the table needs q − c_cell per cell
    val probes = q.crossJoin(broadcast(cen))
      .withColumn("q_cos",
        when(col("q_norm2") > 0 && col("c_norm2") > 0,
          expr(TX.dotAuto("q_vec", "c_vec"))
            / (sqrt(col("q_norm2")) * sqrt(col("c_norm2")))))
      .withColumn("probe_rank", row_number().over(wProbe).cast("long"))
      .filter(col("probe_rank") <= nProbe)
      .withColumn("__qres", expr(
        "zip_with(q_vec, c_vec, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("query_id"), col("centroid_id"), col("probe_rank"), col("__qres"))
    val cb = codebook
      .select(col(cbIdCol).as("code"), col(cbVecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $wSub + 1", wSub)))
    // table per (query, cell, block, code) — the residual twist; codebook
    // side broadcast explicitly (K×nBlocks rows by definition; the probe
    // side's estimate is unknown after its window)
    val table = probes
      .select(col("query_id"), col("centroid_id"), col("probe_rank"), col("__qres"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__qsub", expr(d.slice("__qres", s"block * $wSub + 1", wSub)))
      .join(broadcast(cb), "block")
      .withColumn("__pd2",
        (expr(TX.dotAuto("__qsub", "__qsub"))
          - lit(2.0) * expr(TX.dotAuto("__qsub", "__csub"))
          + expr(TX.dotAuto("__csub", "__csub"))).cast("decimal(30,12)"))
      .select("query_id", "centroid_id", "probe_rank", "block", "code", "__pd2")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__d2").asc, col("vec_id").asc)
    index
      .join(broadcast(table), Seq("centroid_id", "block", "code"))
      .filter(col("query_id") =!= col(idCol))
      .groupBy(col("query_id"), col(idCol).as("vec_id"))
      .agg(sum(col("__pd2")).as("__d2"),
        first(col("centroid_id")).as("centroid_id"),
        first(col("probe_rank")).as("probe_rank"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("__d2").cast("double"), 6).as("dist2"),
        col("centroid_id"), col("probe_rank"))
  }

  /** One-sided Jacobi SVD of a small dense matrix — DRIVER-side linear
    * algebra on d×d planning metadata (d = embedding dims; 64×64 here),
    * never row data. Returns (u, s, v) with m = u · diag(s) · vᵀ.
    * Columns of `a` are orthogonalized by plane rotations accumulated
    * into v; singular values are the resulting column norms. */
  private[operators] def svdSmall(m: Array[Array[Double]])
      : (Array[Array[Double]], Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var rotated = true
    var sweep = 0
    while (rotated && sweep < 60) {
      rotated = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          var app = 0.0; var aqq = 0.0; var apq = 0.0
          var i = 0
          while (i < n) {
            app += a(i)(p) * a(i)(p); aqq += a(i)(q) * a(i)(q)
            apq += a(i)(p) * a(i)(q); i += 1
          }
          if (math.abs(apq) > 1e-12 * math.sqrt(app * aqq) + 1e-300) {
            rotated = true
            val zeta = (aqq - app) / (2.0 * apq)
            val t = math.signum(zeta) / (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
            val cs = 1.0 / math.sqrt(1.0 + t * t)
            val sn = cs * t
            i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = cs * aip - sn * aiq; a(i)(q) = sn * aip + cs * aiq
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = cs * vip - sn * viq; v(i)(q) = sn * vip + cs * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val s = Array.tabulate(n) { j =>
      math.sqrt((0 until n).map(i => a(i)(j) * a(i)(j)).sum)
    }
    val tol = 1e-12 * math.max(s.max, 1e-300)
    val u = Array.ofDim[Double](n, n)
    for (j <- 0 until n if s(j) > tol; i <- 0 until n) u(i)(j) = a(i)(j) / s(j)
    // Complete near-null columns into an orthonormal basis (Gram-Schmidt
    // of basis vectors against every filled column). A lazy e_j
    // placeholder would leave U non-orthogonal exactly when the input is
    // rank-deficient — and with it the Procrustes rotation R = V·Uᵀ.
    val filled = scala.collection.mutable.ArrayBuffer(
      (0 until n).filter(j => s(j) > tol): _*)
    for (j <- 0 until n if s(j) <= tol) {
      var cand = 0
      var done = false
      while (!done && cand < n) {
        val w = Array.tabulate(n)(i => if (i == cand) 1.0 else 0.0)
        filled.foreach { c =>
          val proj = (0 until n).map(i => w(i) * u(i)(c)).sum
          var i = 0; while (i < n) { w(i) -= proj * u(i)(c); i += 1 }
        }
        val nn = math.sqrt(w.map(x => x * x).sum)
        if (nn > 1e-6) {
          var i = 0; while (i < n) { u(i)(j) = w(i) / nn; i += 1 }
          filled += j
          done = true
        }
        cand += 1
      }
      require(done, "svdSmall: could not complete an orthonormal basis")
    }
    (u, s, v)
  }

  /** z = R·x as a codegen'd column expression: the d×d rotation rides
    * along as a nested array LITERAL (broadcast in the plan, ~32 KB at
    * d=64), each output dim one sequential-fold dot — O(d²) flops per
    * row, zero UDFs, whole-stage-codegen friendly. */
  private def rotateCol(r: Array[Array[Double]], vecCol: String)
      : org.apache.spark.sql.Column = {
    val d0 = r.length
    val rl = typedLit(r.map(_.toSeq).toSeq)
    transform(sequence(lit(0), lit(d0 - 1)), i =>
      aggregate(
        zip_with(element_at(rl, i + 1), col(vecCol),
          (a, b) => a * b.cast("double")),
        lit(0.0), (acc, x) => acc + x))
  }

  /** Project `vecCol` through an OPQ rotation into `outCol` — the search
    * path's half of OPQ: rotate queries and corpus with the SAME trained
    * R, then every pqSearch / ivfPqSearch operator applies unchanged
    * (orthogonal rotations preserve L2, so rotated-space top-k IS
    * original-space top-k). */
  def opqRotate(df: DataFrame, vecCol: String, r: Array[Array[Double]],
                outCol: String): DataFrame =
    df.withColumn(outCol, rotateCol(r, vecCol))

  /** OPQ — train an ORTHOGONAL ROTATION in front of PQ (Ge et al., CVPR
    * 2013 "Optimized Product Quantization", the non-parametric variant;
    * the remaining FAISS accuracy step, `OPQMatrix`). PQ's blocking
    * assumes distortion-relevant variance is spread evenly across the
    * nBlocks sub-spaces; real embeddings concentrate energy in a few
    * correlated directions, so fixed blocks waste code budget. OPQ
    * alternates (a) train PQ on the rotated corpus, (b) given the codes'
    * reconstructions Y, re-solve the rotation as the orthogonal
    * Procrustes problem min_R ||R·X − Y||²_F — whose closed form is
    * R = V·Uᵀ from the SVD of the d×d cross-covariance A = Σᵢ xᵢ·yᵢᵀ.
    *
    * Scale shape: each iteration is (1) one rotated-corpus PQ training
    * ([[pqTrain]]'s broadcast Lloyd), (2) one id-keyed join to assemble
    * reconstructions, (3) ONE corpus pass accumulating A per partition
    * (d² doubles each — 32 KB at d=64) tree-reduced to the driver, and
    * (4) a driver-side 64×64 SVD. Nothing corpus-sized ever reaches the
    * driver; the rotation itself is plan metadata.
    *
    * Returns (R, codebook-in-rotated-space). Gate (BatchingOpsSpec): on
    * anisotropic embeddings, OPQ encode distortion < plain PQ distortion
    * and recall strictly improves at equal code budget; R is orthogonal
    * to 1e-6. */
  def opqTrain(emb: DataFrame, idCol: String, vecCol: String,
               dims: Int, nBlocks: Int, k: Int,
               opqIters: Int = 3, pqMaxIter: Int = 5)
      : (Array[Array[Double]], DataFrame) = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    require(opqIters >= 1, "opqIters must be >= 1")
    var r = Array.tabulate(dims, dims)((i, j) => if (i == j) 1.0 else 0.0)
    var codebook: DataFrame = null
    var iter = 0
    while (iter < opqIters) {
      val rotated = opqRotate(emb, vecCol, r, "__z").select(col(idCol), col("__z"))
      codebook = pqTrain(rotated, idCol, "__z", dims, nBlocks, k,
        maxIter = pqMaxIter).localCheckpoint()
      if (iter < opqIters - 1) {
        // reconstructions y = concat of each block's winning codebook slice
        val w = dims / nBlocks
        val codes = pqEncode(rotated, idCol, "__z",
          codebook, "code", "c_emb", dims, nBlocks)
        val cbBlocks = codebook
          .select(col("code"), col("c_emb"),
            explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
          .withColumn("__csub", expr(d.slice("c_emb", s"block * $w + 1", w)))
          .select(col("code"), col("block"), col("__csub"))
        val recon = codes.join(broadcast(cbBlocks), Seq("code", "block"))
          .groupBy(col(idCol))
          .agg(array_sort(collect_list(struct(col("block"), col("__csub")))).as("__bc"))
          .withColumn("__y", expr("flatten(transform(__bc, x -> x.__csub))"))
          .select(col(idCol), col("__y"))
        // A = Σ x·yᵀ in one pass: per-partition dense accumulation (d²
        // doubles), tree-reduced — genuine per-partition imperative work
        val dd = dims
        val joined = emb
          .select(col(idCol).as("__x_join_id"),
            col(vecCol).cast("array<double>").as("__x"))
          .join(recon.withColumnRenamed(idCol, "__x_join_id"), "__x_join_id")
          .select(col("__x"), col("__y"))
        val a = joined.rdd.mapPartitions { it =>
          val partial = new Array[Double](dd * dd)
          it.foreach { row =>
            val x = row.getSeq[Double](0)
            val y = row.getSeq[Double](1)
            var p = 0
            while (p < dd) {
              val xp = x(p); var q = 0
              while (q < dd) { partial(p * dd + q) += xp * y(q); q += 1 }
              p += 1
            }
          }
          Iterator.single(partial)
        }.treeReduce { (x, y) =>
          var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
        }
        val aMat = Array.tabulate(dims, dims)((p, q) => a(p * dims + q))
        val (u, _, v) = svdSmall(aMat)
        // R = V·Uᵀ maximizes tr(R·A) over orthogonal R
        r = Array.tabulate(dims, dims) { (i, j) =>
          var s = 0.0; var t = 0
          while (t < dims) { s += v(i)(t) * u(j)(t); t += 1 }
          s
        }
      }
      iter += 1
    }
    (r, codebook)
  }

  /** PCA over an embedding corpus — mean vector + the top-`m` principal
    * directions, the dimensionality-reduction front end a production
    * embedding pipeline runs before indexing (FAISS `PCAMatrix`): a
    * 768-dim model embedding carries most of its variance in far fewer
    * directions, and every downstream cost — storage, shuffle width, ADC
    * table size, brute-force flops — scales with the projected width.
    *
    * Scale shape (the [[opqTrain]] pattern): ONE corpus pass accumulates
    * n, Σx and Σx·xᵀ per partition (1 + d + d² doubles each — 33 KB at
    * d=64) tree-reduced to the driver; covariance, eigendecomposition
    * ([[svdSmall]] on the symmetric d×d — singular vectors ARE
    * eigenvectors there) and component selection are driver-side work on
    * planning metadata. Nothing corpus-sized moves.
    *
    * Returns (mean, components) with components m×d, rows orthonormal,
    * ordered by explained variance (eigenvalue) descending — ties and
    * signs resolved by the deterministic Jacobi sweep order, so repeat
    * runs agree. Gate (BatchingOpsSpec): orthonormality, exact recovery
    * of a planted rank-2 subspace, monotone reconstruction error in m,
    * ~zero error at m = d. */
  def pcaTrain(emb: DataFrame, vecCol: String, dims: Int, m: Int)
      : (Array[Double], Array[Array[Double]]) = {
    require(m >= 1 && m <= dims, s"m=$m must be in [1, $dims]")
    val dd = dims
    val acc = emb.select(col(vecCol).cast("array<double>")).rdd
      .mapPartitions { it =>
        val partial = new Array[Double](1 + dd + dd * dd)
        it.foreach { row =>
          val x = row.getSeq[Double](0)
          partial(0) += 1.0
          var p = 0
          while (p < dd) {
            partial(1 + p) += x(p)
            val xp = x(p); var q = 0
            while (q < dd) { partial(1 + dd + p * dd + q) += xp * x(q); q += 1 }
            p += 1
          }
        }
        Iterator.single(partial)
      }.treeReduce { (x, y) =>
        var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x
      }
    val n = acc(0)
    require(n > 0, "pcaTrain: empty corpus — nothing to train on")
    val mean = Array.tabulate(dims)(p => acc(1 + p) / n)
    val cov = Array.tabulate(dims, dims)((p, q) =>
      acc(1 + dd + p * dd + q) / n - mean(p) * mean(q))
    val (_, s, v) = svdSmall(cov)
    val order = s.indices.sortBy(j => -s(j)).take(m)
    (mean, order.map(j => Array.tabulate(dims)(i => v(i)(j))).toArray)
  }

  /** Project vectors onto trained principal components: y = P·(x − μ),
    * an `m`-wide array column. Same expression discipline as
    * [[opqRotate]]: the centered vector is MATERIALIZED once (inlining
    * it into each component's fold would re-run the subtraction m times),
    * then each output dim is one sequential zip_with/aggregate dot —
    * codegen-friendly, zero UDFs. Orthonormal rows preserve L2 within
    * the retained subspace, so distances computed on projections are the
    * original distances minus the discarded directions' energy. */
  def pcaProject(df: DataFrame, vecCol: String,
                 mean: Array[Double], components: Array[Array[Double]],
                 outCol: String): DataFrame = {
    val ml = typedLit(mean.toSeq)
    val cl = typedLit(components.map(_.toSeq).toSeq)
    df.withColumn("__pca_ctr",
        zip_with(col(vecCol), ml, (x, mu) => x.cast("double") - mu))
      .withColumn(outCol,
        transform(sequence(lit(0), lit(components.length - 1)), i =>
          aggregate(
            zip_with(element_at(cl, i + 1), col("__pca_ctr"), (a, b) => a * b),
            lit(0.0), (acc0, x) => acc0 + x)))
      .drop("__pca_ctr")
  }

  /** End-to-end TRAINED residual IVF-PQ build — the composition that
    * closes the production loop: learn the coarse quantizer from the
    * corpus ([[Clustering.kmeansFit]] — cosine Lloyd, the same metric
    * [[Similarity.ivfAssign]] routes by, so trained cells and runtime
    * routing agree), compute every vector's residual against its OWN
    * trained cell, train the PQ codebook on those residuals
    * ([[pqTrain]] — L2 Lloyd, PQ's actual objective), and hand back the
    * two frames every ivfPq* operator takes. FAISS's
    * `train_residual` does exactly this sequencing (coarse first,
    * PQ on residuals second) because the codebook must model what the
    * index will actually encode.
    *
    * Scale shape: both training loops are broadcast-centroid passes with
    * k-row driver decisions; the residual materialization is one
    * assignment pass (no corpus self-join). Gate (BatchingOpsSpec): on
    * clustered data the trained build's recall strictly beats the
    * qx69-style seeded build (first-N centroids + observed-residual
    * codebook) at equal cell/code budget. */
  def trainIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
                 dims: Int, nCells: Int, nBlocks: Int, nCodes: Int,
                 coarseMaxIter: Int = 20, pqMaxIter: Int = 10)
      : (DataFrame, DataFrame) = {
    require(nCells > 0 && nCodes > 0, "nCells and nCodes must be positive")
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    val cents = Clustering.kmeansFit(corpus, idCol, vecCol, nCells, coarseMaxIter)
      .select(col("cluster").as("centroid_id"), col("centroid").as("cen_emb"))
      .localCheckpoint() // both consumers below reuse the trained frame
    val residuals = Similarity.ivfAssign(corpus, idCol, vecCol,
        cents, "centroid_id", "cen_emb")
      .join(broadcast(cents), "centroid_id")
      .withColumn("__res", expr(
        s"zip_with($vecCol, cen_emb, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col(idCol), col("__res"))
    val codebook = pqTrain(residuals, idCol, "__res",
      dims, nBlocks, nCodes, pqMaxIter)
    (cents, codebook)
  }

  /** TRAIN a per-block PQ codebook — the step that separates a toy PQ
    * (codebook = first k vectors) from the production one (FAISS trains
    * per-block k-means). Each block's sub-vector population gets its own
    * Lloyd loop, all blocks advancing together in ONE distributed pass
    * per iteration: assignment is the squared-L2 argmin (PQ's actual
    * objective, unlike [[Clustering]]'s cosine), refit is a decimal-exact
    * per-(block, code, dim) mean. Driver-loop discipline follows
    * [[Clustering.kmeansFit]]: the driver carries only the k×nBlocks-row
    * movement decision, per-round localCheckpoint keeps the plan flat,
    * empty codes carry their previous centroid. The exploded sub-vector
    * frame is persisted once (every iteration reads it; re-slicing the
    * corpus per round would scan it maxIter times).
    *
    * Lloyd never increases its objective from any init, and the init IS
    * the "first k vectors" seed — so the trained codebook's total encode
    * distortion is ≤ the seeded one's by construction (asserted strictly
    * < in BatchingOpsSpec). Returns full-width (code, cvecCol) rows,
    * blocks concatenated in order — directly usable by [[pqEncode]] /
    * [[ivfPqIndex]], which slice per block anyway. */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
              dims: Int, nBlocks: Int, k: Int,
              maxIter: Int = 10, tol: Double = 1e-4,
              cvecCol: String = "c_emb"): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    require(k > 0 && maxIter > 0, "k and maxIter must be positive")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val w = dims / nBlocks
    val subs = emb
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__sub", expr(d.slice("__v", s"block * $w + 1", w)))
      .select(col("__id"), col("block"), col("__sub"),
        expr(TX.dotAuto("__sub", "__sub")).as("__xx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // seed: per block, the sub-vectors of the k smallest ids (the same
      // deterministic no-RNG init as kmeansFit, and exactly the "seeded
      // codebook" a caller would otherwise use directly)
      val seedIds = emb.select(col(idCol)).orderBy(col(idCol)).limit(k)
        .collect().map(_.get(0))
      require(seedIds.nonEmpty,
        s"pqTrain: input corpus is empty — nothing to train a codebook on " +
          s"(idCol=$idCol, vecCol=$vecCol)")
      var ck = subs.filter(col("__id").isInCollection(seedIds.toSeq))
        .join(broadcast(emb.sparkSession.createDataFrame(
          seedIds.zipWithIndex.map { case (id, i) => (id.toString, i.toLong) }
            .toSeq).toDF("__sid", "code")),
          col("__id").cast("string") === col("__sid"))
        .select(col("code"), col("block"),
          expr(d.map("__sub", "x", "CAST(x AS DOUBLE)")).as("__csub"))
        .localCheckpoint()
      var iter = 0
      var moved = Double.MaxValue
      while (iter < maxIter && moved > tol) {
        val withCc = ck.withColumn("__cc", expr(TX.dotAuto("__csub", "__csub")))
        // assign: L2 argmin per (vector, block) — broadcast k×nBlocks codes
        val assign = subs.join(broadcast(withCc), "block")
          .withColumn("__d2",
            col("__xx") - lit(2.0) * expr(TX.dotAuto("__sub", "__csub")) + col("__cc"))
          .groupBy(col("__id"), col("block"))
          .agg(min_by(col("code"),
            struct(col("__d2").as("d"), col("code").as("tb"))).as("code"))
        // refit: decimal-exact per-(block, code, dim) means, reassembled
        val refit = subs.join(assign, Seq("__id", "block"))
          .select(col("block"), col("code"),
            posexplode(col("__sub")).as(Seq("__pos", "__x")))
          .groupBy(col("block"), col("code"), col("__pos"))
          .agg((sum(col("__x").cast("double").cast("decimal(30,10)")).cast("double")
            / count(lit(1))).as("__m"))
          .groupBy(col("block"), col("code"))
          .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
          .withColumn("__new", expr("transform(__pm, x -> x.__m)"))
          .select(col("block"), col("code"), col("__new"))
        val nextCk = ck
          .join(refit, Seq("block", "code"), "left")
          .select(col("block"), col("code"),
            coalesce(col("__new"), col("__csub")).as("__csub"),
            col("__csub").as("__old"))
          .localCheckpoint()
        moved = nextCk
          .select(max(expr(
            "aggregate(zip_with(__csub, __old, (a, b) -> abs(a - b)), " +
              "CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, x))")).as("m"))
          .collect()(0).getDouble(0)
        Checkpoints.release(ck)
        ck = nextCk.drop("__old")
        iter += 1
      }
      // reassemble full-width codebook rows: blocks concatenated in order
      ck.groupBy(col("code"))
        .agg(array_sort(collect_list(struct(col("block"), col("__csub")))).as("__bc"))
        .withColumn(cvecCol, expr("flatten(transform(__bc, x -> x.__csub))"))
        .select(col("code"), col(cvecCol))
    } finally { subs.unpersist(); () }
  }

  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, cidCol: String, cvecCol: String,
               dims: Int, nBlocks: Int): DataFrame = {
    require(nBlocks >= 1 && dims % nBlocks == 0,
      s"nBlocks=$nBlocks must divide dims=$dims")
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val w = dims / nBlocks
    val e = emb
      .select(col(idCol), col(vecCol),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__sub", expr(d.slice(vecCol, s"block * $w + 1", w)))
      .select(col(idCol), col("block"), col("__sub"),
        expr(TX.dotAuto("__sub", "__sub")).as("__xx"))
    val c = codebook
      .select(col(cidCol).as("code"), col(cvecCol).as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $w + 1", w)))
      .select(col("code"), col("block"), col("__csub"),
        expr(TX.dotAuto("__csub", "__csub")).as("__cc"))
    e.join(broadcast(c), "block")
      .withColumn("__d2",
        col("__xx") - lit(2.0) * expr(TX.dotAuto("__sub", "__csub")) + col("__cc"))
      .groupBy(col(idCol), col("block"))
      .agg(min_by(
        struct(col("code"), col("__d2")),
        struct(col("__d2").as("d"), col("code").as("tb"))).as("__w"))
      .select(col(idCol), col("block"), col("__w.code").as("code"),
        round(col("__w.__d2"), 6).as("dist2"))
  }
}
