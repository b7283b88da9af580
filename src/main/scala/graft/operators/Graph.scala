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
  * carries ONLY the convergence decision (a changed-row count) — never row
  * data — which is the legitimate driver role in an iterative distributed
  * algorithm. Per-round localCheckpoint truncates lineage (see the note in
  * the loop).
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
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    // symmetrize + dedupe once: every round joins against this
    val sym = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    // Each round references `labels` THREE times (neighbor lookup, the
    // least() merge, and the jump self-join) — without truncation the
    // logical plan triples per round and analysis itself blows up long
    // before the data does. localCheckpoint (eager) cuts lineage to the
    // materialized blocks each round; a multi-executor deployment that
    // must survive executor loss swaps in reliable checkpoint(dir) at the
    // same call sites.
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint() // eager: also materializes sym

    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // propagate: min label among self + neighbors
      val nbrMin = sym
        .join(labels.select(col("id").as("v"), col("component").as("nbr_comp")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nbr_comp")).as("nbr_min"))
      val propagated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("component"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("c1"))
      // jump: component-of-component (labels are node ids → self-join)
      val jumped = propagated
        .join(labels.select(col("id").as("c1"), col("component").as("c2")), Seq("c1"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("c1"), coalesce(col("c2"), col("c1"))).as("component"))
        .localCheckpoint()
      val changed = jumped.filter(col("prev") =!= col("component")).count()
      labels = jumped.select("id", "component")
      done = changed == 0L
      iter += 1
    }
    sym.unpersist()
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "raise maxIter (convergence is O(log n) rounds in the node count)")
    labels
  }
}
