package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed graph operators for dedup-group resolution.
  *
  * Near-dup detection (Dedup.nearDupPipeline) emits PAIRS; the corpus-level
  * decision needs GROUPS — a doc linked to A and transitively to B must keep
  * exactly one canonical representative across the whole component, or
  * cascading keep/drop decisions disagree between pairs. Connected
  * components is that closure.
  *
  * Implementation is min-label propagation with pointer jumping, expressed
  * as DataFrame joins/aggregations so Catalyst plans every step:
  *
  *  - propagate: each node takes the minimum label among itself and its
  *    neighbors (an equi-join on the symmetrized edge list + a map-side
  *    combinable MIN aggregate);
  *  - jump: each node then takes its label's label (labels are node ids, so
  *    this is a self-join of the label table) — the pointer-doubling step
  *    that collapses long chains in O(log n) rounds instead of O(diameter).
  *
  * Every iteration shuffles on node id / label only (two narrow columns);
  * the edge list is persisted once and re-read per round. The driver loop
  * carries ONLY the convergence decision (an edge-consistency count) —
  * never row data — which is the legitimate driver role in an iterative
  * distributed algorithm. Per-round localCheckpoint truncates lineage
  * (see the note in the loop).
  */
object Graph {

  /** Connected components of an undirected graph given as an edge list.
    * Returns (id, component) with `component` = the minimum node id in the
    * component — a deterministic canonical representative. Nodes appear in
    * the output iff they appear in some edge (callers union isolated nodes
    * themselves if needed). Self-loops are ignored.
    *
    * Converges in O(log n) rounds on any graph shape thanks to the jump
    * step; `maxIter` is a guard against pathological inputs — hitting it
    * throws rather than returning a partially-converged (wrong) labeling.
    *
    * The returned frame is backed by the final round's checkpoint blocks
    * (it was materialized to test convergence); consumers read the cached
    * labeling, and Spark's ContextCleaner reclaims the blocks when the
    * plan is collected.
    */
  /** Edge bound for the driver CC twin (overridable for tests/tuning via
    * the `graft.cc.twin.bound` system property; 0 disables the twin).
    * 1M (u, v) pairs is ~32 MB of driver rows — planning-scale. */
  private def ccTwinBound: Int =
    sys.props.get("graft.cc.twin.bound").flatMap(_.toIntOption)
      .getOrElse(1 << 20)

  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    // DRIVER TWIN (round 14, the DriverPlan philosophy applied to CC):
    // the per-round cost of the distributed loop is dominated by fixed
    // per-round fixtures (the convergence count, the localCheckpoint
    // materialization, ~6 scheduling barriers per round — measured
    // ~0.45 s/round on a 6-round graph whose label table is 854 rows).
    // When the edge list fits a driver bound, collect it ONCE and run
    // exact union-find with min-id roots — the same labeling the loop
    // converges to, returned as a LocalRelation (jobless downstream).
    // The bounded `limit(B+1).collect()` aborts the scan as soon as the
    // bound is crossed, so corpus-scale graphs pay one partial pass and
    // keep the distributed loop verbatim. Null ids or an id type without
    // a replicated ordering also fall back. GraphSpec pins twin ≡
    // distributed labeling on randomized graphs.
    val idType = e0.schema("u").dataType
    val bound = ccTwinBound
    val twin: Option[DataFrame] =
      if (bound <= 0) None
      else DriverPlan.idOrdering(idType).flatMap { ord =>
        val rows = e0.limit(bound + 1).collect()
        if (rows.length > bound ||
            rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) None
        else {
          val parent = new java.util.HashMap[Any, Any]()
          def find(x: Any): Any = {
            var r = x
            while (parent.get(r) != r) r = parent.get(r)
            var c = x
            while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
            r
          }
          rows.foreach { r =>
            val a = r.get(0); val b = r.get(1)
            if (!parent.containsKey(a)) parent.put(a, a)
            if (!parent.containsKey(b)) parent.put(b, b)
            val ra = find(a); val rb = find(b)
            if (ra != rb) {
              if (ord.lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
            }
          }
          val ids = new scala.collection.mutable.ArrayBuffer[Any](parent.size)
          parent.keySet().forEach(k => { ids += k; () })
          val out = ids.map(id => org.apache.spark.sql.Row(id, find(id))).toSeq
          Some(DriverPlan.localFrame(edges.sparkSession, out,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("id", idType, nullable = false),
              org.apache.spark.sql.types.StructField("component", idType, nullable = false)))))
        }
      }
    if (twin.isDefined) return twin.get
    // symmetrize + dedupe once: every round joins against this
    val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Each step references `labels` THREE times (neighbor lookup, the
    // least() merge, and the jump self-join) — without truncation the
    // logical plan triples per step and analysis itself blows up long
    // before the data does. localCheckpoint (eager) cuts lineage to the
    // materialized blocks once per round; a multi-executor deployment that
    // must survive executor loss swaps in reliable checkpoint(dir) at the
    // same call sites.
    //
    // Fixed per-job overhead dominates the loop at bench scale, so the
    // round structure minimizes job count: the FIRST propagate is fused
    // into label initialization (min over the closed neighborhood is one
    // grouped aggregate over sym), and termination is decided by the
    // cheap edge-consistency check below instead of a step-and-compare.

    /** One propagate+jump step as a pure plan transform. */
    def step(labels: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("component").as("nbr_comp")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nbr_comp")).as("nbr_min"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("c1"))
      // (Round 14: a second jump per round was tried and measured a no-op
      // — after one jump a label already names a round-current root, so
      // labels[labels[c]] == labels[c]; violation counts were identical
      // round for round. Reverted.)
      propagated
        .join(labels.select(col("id").as("c1"), col("component").as("c2")), Seq("c1"), "left")
        .select(col("id"), least(col("c1"), coalesce(col("c2"), col("c1"))).as("component"))
    }

    // init = round 0's propagate: component = min(id, min neighbor id)
    var labels = sym
      .groupBy(col("u").as("id"))
      .agg(min(col("v")).as("nbr_min"))
      .select(col("id"), least(col("id"), col("nbr_min")).as("component"))
      .localCheckpoint() // eager: also materializes sym

    // Convergence test, round 0: the labeling is final iff `component` is
    // constant across every edge (then it is constant per component, and
    // since labels only decrease and stay within the component, the
    // constant is the component minimum). Near-dup graphs are star/clique-
    // shaped, so the init aggregate usually converges outright and the
    // whole loop costs this one cheap check.
    //
    // Later rounds (round 14) decide convergence from the CHANGED-LABEL
    // count instead: `step` is a fixed point exactly when no label
    // changed (an inconsistent edge (u,v) with cu > cv forces propagate
    // to lower u's label), and comparing two checkpoint-backed NODE-scale
    // label tables is strictly cheaper than re-joining the EDGE-scale
    // `sym` against the labels twice — at bench scale it drops a
    // ~3-job barrier chain per round, at corpus scale it replaces two
    // edge-scale joins with one node-scale join per round.
    try {
      val edgeViolations = sym
        .join(labels.select(col("id").as("u"), col("component").as("cu")), "u")
        .join(labels.select(col("id").as("v"), col("component").as("cv")), "v")
        .filter(col("cu") =!= col("cv")).count()
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        println(s"[cc] round 0: violations=$edgeViolations")
      if (edgeViolations == 0L) return labels
      var iter = 1
      while (iter < maxIter) {
        val t0 = System.nanoTime()
        // step() reads `labels` only through its own plan, so once the new
        // round's checkpoint has materialized (localCheckpoint is eager) the
        // previous round's blocks are dead — release them after the changed
        // count instead of letting them pile up in executor storage until
        // ContextCleaner eventually notices (high-round graphs would
        // otherwise hold every intermediate labeling simultaneously). The
        // final returned frame is never released — consumers read its
        // cached blocks.
        val prev = labels
        labels = step(labels).localCheckpoint()
        val changed = labels
          .join(prev.select(col("id"), col("component").as("__old")), "id")
          .filter(col("component") =!= col("__old")).count()
        Checkpoints.release(prev)
        if (sys.env.contains("GRAFT_CC_VERBOSE"))
          println(f"[cc] round $iter: changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (changed == 0L) return labels
        iter += 1
      }
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (convergence is O(log n) rounds in the node count)")
    } finally sym.unpersist()
  }

  /** Incremental connected components: merge NEW edges into an EXISTING
    * labeling without the historical edge list.
    *
    * The prior labeling is a compressed certificate of old connectivity —
    * each labeled node links to its canonical representative — so running
    * CC over (star edges ∪ new edges) yields exactly the components of
    * (all historical edges ∪ new edges). Cost scales with labeled-node
    * count + new-edge count, NEVER with historical pair count, and the
    * star side is depth-1 so the pointer-jumping loop converges in a
    * round or two. This is the daily-ingest closure: incremental near-dup
    * emits the new batch's pairs, this folds them into the standing
    * groups (including transitive merges where a new doc bridges two old
    * groups).
    *
    * `prevLabels` must be CC-shaped ((id, component), every node sharing
    * its component with ≥1 other node — what [[connectedComponents]] and
    * Dedup.dedupGroups always produce; a singleton row would survive only
    * through its own self-loop, which CC drops). */
  def incrementalComponents(prevLabels: DataFrame, idCol: String, compCol: String,
                            newEdges: DataFrame, srcCol: String, dstCol: String,
                            maxIter: Int = 25): DataFrame = {
    val star = prevLabels.select(col(idCol).as("u"), col(compCol).as("v"))
    val e = newEdges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    connectedComponents(star.unionByName(e), "u", "v", maxIter)
  }

  /** Fixed-point integer PageRank (Page et al. 1999) over an undirected
    * edge list — a centrality signal for canonical-document selection in
    * near-dup neighborhoods (degree alone over-rewards boilerplate hubs;
    * PageRank discounts neighbors that spread their mass thin).
    *
    * Arithmetic is EXACT int64 fixed-point so a DuckDB oracle can
    * hash-match an iterative float algorithm: ranks live in `scale`
    * units (r₀ = scale per node), each node sends floor(r/deg) to every
    * neighbor, and the damped update is
    * r' = (15·scale + 85·Σ incoming) div 100 — floor division in both
    * engines, order-independent integer sums, no IEEE accumulation
    * anywhere. Quantization error per iteration is < deg/scale of a
    * unit — invisible at scale = 10¹². The per-iteration mass
    * N·scale·85 must fit int64: at scale 10¹² that's ~10⁵ nodes; shrink
    * `scale` for bigger graphs (or normalize r₀, the structure is
    * scale-free). The bound is ENFORCED after symmetrization — Spark's
    * non-ANSI long sum would silently wrap on an oversized graph
    * (DuckDB errors instead), so the failure mode without the check
    * would be quietly wrong centrality values, the one thing a
    * fixed-point design must never produce.
    *
    * Plan shape: the edge list symmetrizes and persists once (every
    * iteration re-reads it); each of the `iters` rounds is one
    * (id)-keyed join + one map-side-combinable integer sum — the
    * standard distributed PR step. The rank table localCheckpoints per
    * round, truncating the otherwise-quadratic lineage (same discipline
    * as connectedComponents). Isolated nodes never appear (no edges →
    * no rank mass to receive); dangling nodes cannot exist in a
    * symmetrized graph. */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters=$iters out of [1,20]")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    // DRIVER TWIN (round 14, same shape as the connectedComponents twin):
    // the update is EXACT int64 fixed-point arithmetic — floor divisions
    // and order-independent long sums — so a driver evaluation reproduces
    // the distributed ranks bit for bit. When the edge list fits the
    // bound (`graft.pr.twin.bound`, default 1M pairs; bounded collect),
    // symmetrize + iterate on the driver and return a LocalRelation; the
    // per-iteration join/aggregate/checkpoint barrier chain disappears.
    // Larger graphs or null ids keep the distributed loop verbatim.
    // GraphSpec pins twin ≡ distributed on its fixtures.
    val prBound = sys.props.get("graft.pr.twin.bound").flatMap(_.toIntOption)
      .getOrElse(1 << 20)
    if (prBound > 0) {
      val raw = e.limit(prBound + 1).collect()
      if (raw.length <= prBound &&
          !raw.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
        val symSet = new java.util.LinkedHashSet[(Any, Any)]()
        raw.foreach { r =>
          val a = r.get(0); val b = r.get(1)
          if (a != b) { symSet.add((a, b)); symSet.add((b, a)); () }
        }
        val deg = new java.util.LinkedHashMap[Any, Long]()
        symSet.forEach(p => { deg.merge(p._1, 1L, (x, y) => x + y); () })
        val n = deg.size().toLong
        require(BigInt(85) * n * scale <= BigInt(Long.MaxValue),
          s"pageRankFixedPoint: 85 * n_nodes($n) * scale($scale) " +
            "exceeds int64 — pass a smaller scale (keep 85*N*scale <= 2^63-1)")
        var ranks = new java.util.LinkedHashMap[Any, Long]()
        deg.keySet().forEach(k => { ranks.put(k, scale); () })
        for (_ <- 1 to iters) {
          val sums = new java.util.LinkedHashMap[Any, Long]()
          val it = symSet.iterator()
          while (it.hasNext) {
            val p = it.next()
            val c = ranks.get(p._1) / deg.get(p._1)
            sums.merge(p._2, c, (x, y) => x + y); ()
          }
          val next = new java.util.LinkedHashMap[Any, Long]()
          sums.forEach((v, s) => { next.put(v, (15L * scale + 85L * s) / 100L); () })
          ranks = next
        }
        val idType = e.schema("u").dataType
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        ranks.forEach((id, r) => { out += org.apache.spark.sql.Row(id, r, deg.get(id)); () })
        return DriverPlan.localFrame(edges.sparkSession, out.toSeq,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id", idType, nullable = false),
            org.apache.spark.sql.types.StructField("pr_units",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("deg",
              org.apache.spark.sql.types.LongType, nullable = false))))
      }
    }
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .filter(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
        .localCheckpoint(false)
      // int64 safety: the damped update multiplies the TOTAL standing
      // mass (≤ N·scale, conserved up to truncation) by 85 before the
      // div — that product must fit a long or the sum wraps silently.
      val nNodes = deg.count()
      require(BigInt(85) * nNodes * scale <= BigInt(Long.MaxValue),
        s"pageRankFixedPoint: 85 * n_nodes($nNodes) * scale($scale) " +
          "exceeds int64 — pass a smaller scale (keep 85*N*scale <= 2^63-1)")
      var ranks = deg.select(col("u").as("id"), lit(scale).as("r"))
      for (_ <- 1 to iters) {
        val contrib = ranks
          .join(deg, ranks("id") === deg("u"))
          .select(col("id"), expr("r div deg").as("c"))
          .join(sym, col("id") === col("u"))
          .select(col("v").as("id"), col("c"))
        val sums = contrib.groupBy("id").agg(sum("c").as("s"))
        // eager per-round checkpoint (kmeansFit discipline): materializes
        // the round so lineage never stacks iterations, and lets the edge
        // cache be dropped before the caller's action
        ranks = sums
          .select(col("id"),
            expr(s"(${15L * scale} + 85 * s) div 100").as("r"))
          .localCheckpoint(true)
      }
      ranks.join(deg, ranks("id") === deg("u"))
        .select(col("id"), col("r").as("pr_units"), col("deg"))
    } finally sym.unpersist(blocking = false)
  }
}
