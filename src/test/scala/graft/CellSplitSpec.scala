package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Incremental recell ([[Quantize.splitDriftedCells]]) — drift
  * remediation that rewrites ONLY the overfull cells. Gates:
  *  - a concentrated-drift store splits exactly its fat cell; rewrite
  *    volume = that cell's live mass, cold cells' files untouched
  *    byte-for-byte;
  *  - serving is answer-identical before/after at full probe + refine
  *    (assignment-agnostic search semantics), and the split store keeps
  *    appending/serving through the ordinary lifecycle;
  *  - the staged install is crash-recoverable: a pre-swap crash rolls
  *    back to the exact pre-split image, and mutations refuse while the
  *    manifest stands.
  */
class CellSplitSpec extends SparkSpec {

  private val dims = 16

  /** member j of cell i: axis vector e_i + small deterministic jitter. */
  private def vec(cell: Int, j: Int): Seq[Float] =
    (0 until dims).map { d =>
      val base = if (d == cell) 1.0f else 0.0f
      base + 0.01f * (((cell * 131 + j * 17 + d * 7) % 11) - 5)
    }

  private def corpus(counts: Seq[Int]) = {
    import spark.implicits._
    counts.zipWithIndex.flatMap { case (n, cell) =>
      (0 until n).map(j => (cell * 1000L + 100L + j, vec(cell, j)))
    }.toDF("vec_id", "embedding")
  }

  private def cents = {
    import spark.implicits._
    (0 until 4).map(i => (i.toLong,
      (0 until dims).map(d => if (d == i) 1.0f else 0.0f))
    ).toDF("centroid_id", "cen_emb")
  }

  private def codebook = {
    import spark.implicits._
    (0 until 4).map(i => (i.toLong, vec(i, 3))).toDF("code_id", "cb_emb")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id", "rank", "dist2")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("splitDriftedCells: only the fat cell is rewritten; answers identical; cold cells byte-untouched; lifecycle continues") {
    import spark.implicits._
    // concentrated drift: cell 0 holds 60 members, cells 1-3 hold 10
    val c = corpus(Seq(60, 10, 10, 10)).localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("cellsplit-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, c, "vec_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      dims, 4, residual = true, store, storeVectors = true)
    // the RESURRECTION trap: delete doc 102 and SWEEP — its codes leave
    // the index and its tombstone is cleared, but its sidecar row
    // deliberately survives (sweeps never touch the sidecar). The split
    // must derive membership from the INDEX, not the sidecar, or it
    // would re-encode the dead vector into a live sub-cell.
    Quantize.addTombstones(spark, store, Seq(102L).toDF("vec_id"), "vec_id")
    Quantize.retentionSweep(spark, store, "vec_id", maxTombstoneFraction = 1e-9)
    assert(spark.read.parquet(s"$store.vectors")
      .filter(col("vec_id") === 102L).count() > 0,
      "fixture: the swept id's sidecar row must still be present")
    // plus standing retractions inside the fat cell: the split vacuums them
    Quantize.addTombstones(spark, store,
      Seq(100L, 101L).toDF("vec_id"), "vec_id")
    val q = c.filter(col("vec_id").isin(105L, 1100L, 2105L))
    def serveFull() = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 5, 1000000, 1000000))
    val before = serveFull()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    def dirSig(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSet
    val coldSigs = (1 to 3).map(i => dirSig(s"$store/centroid_id=$i"))

    val (split, rewritten) = Quantize.splitDriftedCells(spark, store,
      overshoot = 2.0, splitWays = 2)
    assert(split == 1, s"exactly the fat cell must split (got $split)")
    assert(rewritten == 57L,
      s"rewrite volume must be the fat cell's LIVE mass — 60 minus the " +
        s"swept id and the two tombstoned ids (got $rewritten)")
    // the swept id was NOT resurrected: no code rows, and its dead
    // sidecar row left with the GC'd old cell dirs instead of being
    // re-encoded at a fresh vepoch
    assert(spark.read.parquet(store).filter(col("vec_id") === 102L).count() == 0,
      "split must not re-encode a swept id's dead sidecar row")
    assert(spark.read.parquet(s"$store.vectors")
      .filter(col("vec_id") === 102L).count() == 0,
      "the dead sidecar row must not be re-stamped into the new cells")
    // centroid table: 0 retired, two fresh sub-cells appended past max
    val centIds = Quantize.loadQuantizers(spark, store)._1
      .select("centroid_id").collect().map(_.getLong(0)).toSet
    assert(!centIds.contains(0L) && centIds.intersect(Set(4L, 5L)).nonEmpty
      && centIds.size == 5, s"unexpected centroid set $centIds")
    // cold cells: directories byte-identical (no file added/removed/touched)
    assert((1 to 3).map(i => dirSig(s"$store/centroid_id=$i")) == coldSigs,
      "cold cells must not be rewritten")
    // old fat-cell dirs are gone from the index and every sidecar vepoch
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/centroid_id=0")))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$store.vectors"))
      .filter(_.getPath.getName.startsWith("vepoch="))
      .forall(v => !fs.exists(new org.apache.hadoop.fs.Path(v.getPath, "centroid_id=0"))))
    // answers identical at full probe + refine (tombstoned ids stay out)
    val after = serveFull()
    assert(after == before, "split must not change the served answers")
    assert(after.forall { case (_, n, _, _) => n != 100L && n != 101L })
    // the split store keeps living: append + serve still exact (a vector
    // no lattice member shares, so the exact match is unique)
    val extra = Seq((9000L,
      (0 until dims).map(d => 0.5f + 0.001f * d))).toDF("vec_id", "embedding")
    Quantize.appendSelfContained(spark, store, extra, "embedding")
    val q2 = extra.select(lit(9999L).as("vec_id"), col("embedding"))
    val hit = Quantize.searchSelfContainedRefinedStored(
      spark, store, q2, "vec_id", "embedding", 1, 1000000, 1000000)
      .collect().head
    assert(hit.getLong(1) == 9000L && hit.getDouble(3) == 0.0)
    // nothing drifted anymore: re-split is a no-op
    assert(Quantize.splitDriftedCells(spark, store, 2.0, 2) == ((0, 0L)))
  }

  test("splitDriftedCells: SEVERAL drifted cells split in one batched pass — deterministic id allocation, answers identical, cold cell untouched") {
    import spark.implicits._
    // cells 0 and 2 are both fat; 1 and 3 are cold — one call must split
    // both in one grouped lifecycle (one fit loop, one index append, one
    // sidecar write, one swap), not a serial per-cell loop
    val c = corpus(Seq(50, 10, 44, 10)).localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("cellsplit-multi-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, c, "vec_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      dims, 4, residual = true, store, storeVectors = true)
    val q = c.filter(col("vec_id").isin(105L, 1100L, 2105L, 3104L))
    def serveFull() = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 5, 1000000, 1000000))
    val before = serveFull()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    def dirSig(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime)).toSet
    val coldSigs = Seq(1, 3).map(i => dirSig(s"$store/centroid_id=$i"))

    val (split, rewritten) = Quantize.splitDriftedCells(spark, store,
      overshoot = 1.5, splitWays = 2)
    assert(split == 2, s"both fat cells must split (got $split)")
    assert(rewritten == 94L,
      s"rewrite volume must be the two fat cells' live mass (got $rewritten)")
    // deterministic fresh-id allocation: sorted drifted cell j, slot s →
    // newFrom + j*splitWays + (s-1) — cells 0,2 with newFrom=4 → {4,5,6,7}
    val centIds = Quantize.loadQuantizers(spark, store)._1
      .select("centroid_id").collect().map(_.getLong(0)).toSet
    assert(centIds == Set(1L, 3L, 4L, 5L, 6L, 7L),
      s"unexpected centroid set $centIds")
    assert(Seq(1, 3).map(i => dirSig(s"$store/centroid_id=$i")) == coldSigs,
      "cold cells must not be rewritten")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/centroid_id=0")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/centroid_id=2")))
    // answers identical at full probe + refine
    assert(serveFull() == before, "split must not change the served answers")
    // every member landed in SOME new cell and the store serves them
    assert(spark.read.parquet(store).filter(col("block") === 0)
      .select("vec_id").distinct().count() == 114L)
  }

  test("splitDriftedCells crash recovery: a pre-swap crash rolls back to the exact pre-split image; mutations refuse while the manifest stands") {
    import spark.implicits._
    val c = corpus(Seq(40, 10, 10, 10)).localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("cellsplit-cr-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, c, "vec_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      dims, 4, residual = true, store, storeVectors = true)
    val q = c.filter(col("vec_id").isin(105L, 1100L))
    def serveFull() = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 5, 1000000, 1000000))
    val before = serveFull()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    // reconstruct the pre-swap crash state: manifest + UNREACHABLE new
    // cell dirs landed, centroid table untouched
    val manifest = s"""{"old":[0],"newFrom":4,"newWays":2,"vepoch":7}"""
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$store.split-manifest"), true)
    out.write(manifest.getBytes("UTF-8")); out.close()
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(s"$store/centroid_id=1"), fs,
      new org.apache.hadoop.fs.Path(s"$store/centroid_id=4"),
      false, spark.sparkContext.hadoopConfiguration)
    // the store still SERVES exactly as before (new cells unreachable)
    assert(serveFull() == before,
      "pre-swap crash state must serve exactly the pre-split answers")
    // mutations refuse while the manifest stands
    val extra = Seq((9000L, vec(1, 50))).toDF("vec_id", "embedding")
    val exA = intercept[java.io.IOException](
      Quantize.appendSelfContained(spark, store, extra, "embedding"))
    assert(exA.getMessage.contains("recoverCellSplit"))
    val exS = intercept[java.io.IOException](
      Quantize.retentionSweep(spark, store, "vec_id", 0.0001))
    assert(exS.getMessage.contains("recoverCellSplit"))
    // recovery rolls BACK (old id still installed): debris gone, image exact
    assert(Quantize.recoverCellSplit(spark, store))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/centroid_id=4")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store.split-manifest")))
    assert(serveFull() == before)
    // ...and the store mutates again (a real split now runs clean)
    Quantize.appendSelfContained(spark, store, extra, "embedding")
    val (split, _) = Quantize.splitDriftedCells(spark, store, 2.0, 2)
    assert(split == 1)
    assert(!Quantize.recoverCellSplit(spark, store),
      "a completed split must leave nothing to recover")
  }
}
