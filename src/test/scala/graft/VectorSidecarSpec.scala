package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** The raw-vector SIDECAR (`<store>.vectors`) — the piece that makes the
  * self-contained IVF-PQ store self-contained for the exact-rescore
  * refine and the recell retrain, not just for ADC. Gates:
  *  - sidecar-rescored search ≡ corpus-rescored search bit-for-bit,
  *    through build, append, retry double-land (the multiset contract),
  *    tombstones and the retention sweep;
  *  - the ONE mutation that could silently break the "sidecar ⊇ live
  *    ids" invariant — a bare-index append (or a stream batch) on a
  *    sidecar store — refuses loudly;
  *  - recell rewrites the sidecar to the survivors under the RETRAINED
  *    cells (the sidecar's vacuum), corpus-sourced and sidecar-sourced
  *    recell agree, and the crash window after the quantizer install
  *    rolls FORWARD to the new sidecar (restoring the backup would pair
  *    pre-recell vectors with post-recell cell ids);
  *  - the sidecar read serves behind the same literal probed-cell
  *    partition filter as the code cells.
  */
class VectorSidecarSpec extends SparkSpec {

  private val (dims, nBlocks) = (64, 4)

  private def emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    .select("vec_id", "embedding")

  private def cents(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))

  private def codebook(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "neighbor_id", "rank", "dist2")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("sidecar rescore == corpus rescore through build/append/retry/delete/sweep; multiset dedup; guards") {
    val e = emb.localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("sidecar-").toString
    val store = s"$work/store"
    val isAppend = col("vec_id") % 4 === 1
    Quantize.buildSelfContained(spark, e.filter(!isAppend), "vec_id", "embedding",
      cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
      dims, nBlocks, residual = false, store, storeVectors = true)
    assert(Quantize.hasVectorSidecar(spark, store))
    val batch = e.filter(isAppend)
    Quantize.appendSelfContained(spark, store, batch, "embedding")
    val q = e.filter(col("vec_id") < 6)

    def stored() = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, 3, 16))
    def viaCorpus() = rows(Quantize.searchSelfContainedRefined(
      spark, store, q, "vec_id", "embedding", e, "embedding", 4, 3, 16))
    assert(stored() === viaCorpus(),
      "sidecar rescore diverged from corpus rescore after build+append")

    // retry protocol double-land: codes heal via delete-then-reappend,
    // the sidecar keeps BOTH copies (documented multiset) — serving must
    // still dedup to the identical answer
    Quantize.deleteFromIvfPqIndex(spark, store, batch.select("vec_id"), "vec_id")
    Quantize.appendSelfContained(spark, store, batch, "embedding")
    val sidecar = spark.read.parquet(s"$store.vectors")
    assert(sidecar.count() > sidecar.select("vec_id").distinct().count(),
      "retry simulation should have double-landed sidecar rows")
    assert(stored() === viaCorpus(),
      "sidecar rescore diverged after a retried (double-landed) append")

    // tombstones + sweep: dead sidecar rows are unreachable, not wrong
    val dead = e.filter(col("vec_id") % 7 === 3).select("vec_id")
    Quantize.addTombstones(spark, store, dead, "vec_id")
    assert(stored() === viaCorpus(), "diverged under tombstones")
    Quantize.retentionSweep(spark, store, "vec_id", maxTombstoneFraction = 0.01)
    assert(stored() === viaCorpus(), "diverged after the retention sweep")
    assert(stored().forall { case (_, n, _, _) => n % 7 != 3 },
      "swept ids resurfaced through the sidecar rescore")

    // the invariant guards: bare-index append, stream batch, no-sidecar search
    val exBare = intercept[IllegalStateException] {
      Quantize.appendToIvfPqIndex(batch, "vec_id", "embedding",
        cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
        dims, nBlocks, store)
    }
    assert(exBare.getMessage.contains("appendSelfContained"))
    val exStream = intercept[IllegalStateException] {
      graft.streaming.StreamingVectorIngest.processBatch(batch, 0L,
        "vec_id", "embedding", cents(e), "centroid_id", "cen_emb",
        codebook(e), "code_id", "cb_emb", dims, nBlocks, store, s"$work/tag")
    }
    assert(exStream.getMessage.contains("sidecar"))
    val bare = s"$work/bare"
    Quantize.buildSelfContained(spark, e, "vec_id", "embedding",
      cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
      dims, nBlocks, residual = false, bare)
    val exMiss = intercept[IllegalStateException] {
      Quantize.searchSelfContainedRefinedStored(spark, bare, q,
        "vec_id", "embedding", 4, 3, 16)
    }
    assert(exMiss.getMessage.contains("storeVectors"))

    // scale shape: the sidecar read is partition-pruned to probed cells
    val plan = Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, 3, 16)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*centroid_id[^\\]]*\\]".r
      .findAllIn(plan).toSeq
    assert(pf.size >= 2, // the code cells AND the sidecar both prune
      s"expected both the cell scan and the sidecar scan partition-pruned:\n$plan")
  }

  test("recell rewrites the sidecar to survivors under the retrained cells; sidecar-sourced recell == corpus-sourced") {
    val e = emb.localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("sidecar-recell-").toString
    def build(path: String): Unit = {
      Quantize.buildSelfContained(spark, e, "vec_id", "embedding",
        cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
        dims, nBlocks, residual = false, path, storeVectors = true)
      // a retry duplicate + tombstones, so the recell has real vacuuming to do
      Quantize.deleteFromIvfPqIndex(spark, path,
        e.filter(col("vec_id") === 100).select("vec_id"), "vec_id")
      Quantize.appendSelfContained(spark, path,
        e.filter(col("vec_id") === 100), "embedding")
      Quantize.addTombstones(spark, path,
        e.filter(col("vec_id") % 5 === 2).select("vec_id"), "vec_id")
    }
    val (a, b) = (s"$work/a", s"$work/b")
    build(a); build(b)
    val (nA, cellsA) = Quantize.recellIvfPqStore(spark, a, e, "embedding",
      nCells = 10, nCodes = 12, retrainCodebook = true,
      coarseMaxIter = 3, pqMaxIter = 2)
    val (nB, cellsB) = Quantize.recellIvfPqStoreFromSidecar(spark, b,
      nCells = 10, nCodes = 12, retrainCodebook = true,
      coarseMaxIter = 3, pqMaxIter = 2)
    assert((nA, cellsA) === (nB, cellsB))

    // vacuumed: one row per live id, none tombstoned, cells are the new ones
    val sc = spark.read.parquet(s"$a.vectors")
    assert(sc.count() === nA, "recell sidecar must hold exactly the survivors")
    assert(sc.filter(col("vec_id") % 5 === 2).count() === 0,
      "tombstoned ids must leave the sidecar at recell")
    assert(sc.select("centroid_id").distinct().count() <= 10)

    val q = e.filter(col("vec_id") < 6)
    assert(rows(Quantize.searchSelfContainedRefinedStored(
        spark, a, q, "vec_id", "embedding", 4, 4, 16)) ===
      rows(Quantize.searchSelfContainedRefinedStored(
        spark, b, q, "vec_id", "embedding", 4, 4, 16)),
      "sidecar-sourced recell served differently from corpus-sourced")
    // the retrained store still appends WITH its sidecar
    val back = e.filter(col("vec_id") % 5 === 2 && col("vec_id") % 2 === 0)
    Quantize.appendSelfContained(spark, a, back, "embedding")
    assert(spark.read.parquet(s"$a.vectors")
      .filter(col("vec_id") % 5 === 2).count() === back.count(),
      "post-recell append must keep maintaining the sidecar")
  }

  test("recell crash windows with a sidecar: roll-back restores it, the post-quantizer window rolls FORWARD to the new sidecar") {
    val e = emb.localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("sidecar-crash-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, e, "vec_id", "embedding",
      cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
      dims, nBlocks, residual = false, store, storeVectors = true)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(s)
    val q = e.filter(col("vec_id") < 4)
    val before = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, 3, 12))

    // crash BEFORE the new cells land: everything moved aside → roll back
    assert(fs.rename(p(store), p(s"$store.recell-bak")))
    assert(fs.rename(p(s"$store.quantizers"), p(s"$store.recell-bak.quantizers")))
    assert(fs.rename(p(s"$store.vectors"), p(s"$store.recell-bak.vectors")))
    assert(Quantize.recoverIvfPqRecell(spark, store))
    assert(rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, 3, 12)) === before,
      "roll-back must restore the pre-recell sidecar store intact")

    // crash AFTER cells+quantizers installed, sidecar pending: the old
    // sidecar sits in the backup, the new one in .recell-new.vectors —
    // recovery must install the NEW one (old vectors carry old cell ids)
    val (_, newCells) = Quantize.recellIvfPqStore(spark, store, e, "embedding",
      nCells = 10, nCodes = 12, retrainCodebook = true,
      coarseMaxIter = 3, pqMaxIter = 2)
    val after = rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, newCells, 12))
    // reconstruct the crash state from the healthy post-recell image: the
    // installed sidecar becomes the pending .recell-new one, a stale
    // pre-recell sidecar plays the backup
    assert(fs.rename(p(s"$store.vectors"), p(s"$store.recell-new.vectors")))
    assert(fs.mkdirs(p(s"$store.recell-bak.vectors")))
    assert(Quantize.recoverIvfPqRecell(spark, store))
    assert(!fs.exists(p(s"$store.recell-bak.vectors")) &&
      !fs.exists(p(s"$store.recell-new.vectors")))
    assert(rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, newCells, 12)) === after,
      "roll-forward must install the retrained sidecar, not the backup")
  }

  test("versioned sidecar: a vector UPDATE (delete -> sweep -> re-append) resolves to the latest vector everywhere; legacy-layout appends refuse and recell migrates") {
    val e = emb.localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("sidecar-ver-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, e, "vec_id", "embedding",
      cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
      dims, nBlocks, residual = false, store, storeVectors = true)
    // the standard vector UPDATE: retract id 42, sweep (clears the
    // tombstone AND the codes; the sidecar keeps the stale row), then
    // re-append 42 with a DIFFERENT vector (id 77's embedding)
    val victim = 42L
    Quantize.addTombstones(spark, store,
      e.filter(col("vec_id") === victim).select("vec_id"), "vec_id")
    Quantize.retentionSweep(spark, store, "vec_id", maxTombstoneFraction = 0.0001)
    val updated = e.filter(col("vec_id") === 77L)
      .select(lit(victim).as("vec_id"), col("embedding"))
    Quantize.appendSelfContained(spark, store, updated, "embedding")
    // both versions physically present, distinguished by vepoch
    val sc = spark.read.parquet(s"$store.vectors")
    assert(sc.columns.contains("vepoch"), "sidecar rows must carry vepoch")
    assert(sc.filter(col("vec_id") === victim).count() === 2,
      "fixture: the stale and updated rows must coexist in the sidecar")
    // the refined-stored rescore must score 42 with the UPDATED vector:
    // bit-equal to the corpus rescore over the post-update corpus
    val postCorpus = e.filter(col("vec_id") =!= victim).unionByName(updated)
      .localCheckpoint()
    val q = e.filter(col("vec_id") < 6)
    assert(rows(Quantize.searchSelfContainedRefinedStored(
        spark, store, q, "vec_id", "embedding", 4, 3, 16)) ===
      rows(Quantize.searchSelfContainedRefined(
        spark, store, q, "vec_id", "embedding", postCorpus, "embedding", 4, 3, 16)),
      "stored rescore must resolve the re-appended id to its latest vector")
    // sidecar-sourced recell retrains/re-encodes the UPDATED vector (the
    // stale row is dropped by max_by, not by an arbitrary pick) and
    // vacuums to one row per id
    Quantize.recellIvfPqStoreFromSidecar(spark, store,
      nCells = 10, nCodes = 12, retrainCodebook = true,
      coarseMaxIter = 3, pqMaxIter = 2)
    val sc2 = spark.read.parquet(s"$store.vectors")
    assert(sc2.filter(col("vec_id") === victim).count() === 1)
    val qNew = updated.select(lit(999L).as("vec_id"), col("embedding"))
    val hit = Quantize.searchSelfContainedRefinedStored(
        spark, store, qNew, "vec_id", "embedding", 1, 10, 8)
      .collect().head
    assert(hit.getLong(1) === victim && hit.getDouble(3) === 0.0,
      "post-recell store must hold the updated vector exactly")

    // LEGACY (pre-vepoch) sidecar: reads keep working, appends refuse
    // with the migration message, and recell migrates the layout
    val legacyRows = spark.read.parquet(s"$store.vectors")
      .select("vec_id", "vec", "centroid_id").localCheckpoint()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store.vectors"), true)
    legacyRows.write.partitionBy("centroid_id").parquet(s"$store.vectors")
    assert(rows(Quantize.searchSelfContainedRefinedStored(
      spark, store, q, "vec_id", "embedding", 4, 3, 16)).nonEmpty,
      "a legacy sidecar must stay servable")
    val ex = intercept[IllegalStateException] {
      Quantize.appendSelfContained(spark, store, updated, "embedding")
    }
    assert(ex.getMessage.contains("vepoch") &&
      ex.getMessage.contains("recellIvfPqStoreFromSidecar"))
    Quantize.recellIvfPqStoreFromSidecar(spark, store,
      nCells = 10, nCodes = 12, retrainCodebook = true,
      coarseMaxIter = 3, pqMaxIter = 2)
    assert(spark.read.parquet(s"$store.vectors").columns.contains("vepoch"),
      "recell must migrate a legacy sidecar to the versioned layout")
    Quantize.appendSelfContained(spark, store,
      updated.select(lit(7777L).as("vec_id"), col("embedding")), "embedding")
  }

  test("adaptive filtered stored search: probe deepening recovers the candidates a fixed budget loses under a selective allow-list") {
    import spark.implicits._
    val e = emb.localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("sidecar-adapt-").toString
    val store = s"$work/store"
    Quantize.buildSelfContained(spark, e, "vec_id", "embedding",
      cents(e), "centroid_id", "cen_emb", codebook(e), "code_id", "cb_emb",
      dims, nBlocks, residual = false, store, storeVectors = true)
    // ~3% allow-list spread over the 8 cells: at nProbe=1 each query sees
    // only its top cell's few allowed members — under k, so the FIXED
    // budget returns short result lists (the filtered-ANN collapse)
    val allow = e.filter(col("vec_id") % 31 === 5).select("vec_id")
      .localCheckpoint()
    val q = e.filter(col("vec_id") < 4)
    def perQuery(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy("query_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Quantize.searchSelfContainedRefinedStoredFiltered(
      spark, store, q, "vec_id", "embedding", allow, 8, 1, 32)
      .localCheckpoint()
    val (adapt, usedNp) =
      Quantize.searchSelfContainedRefinedStoredFilteredAdaptive(
        spark, store, q, "vec_id", "embedding", allow, 8, 1, 32)
    val a = adapt.localCheckpoint()
    assert(usedNp > 1, "deepening must have engaged on a 3% fence")
    val (fc, ac) = (perQuery(fixed), perQuery(a))
    assert(fc.values.exists(_ < 8L),
      s"fixture: the fixed budget should starve under the fence ($fc)")
    assert(ac.keySet.forall(k => ac(k) >= fc.getOrElse(k, 0L)) &&
      ac.values.sum > fc.values.sum,
      s"adaptive must recover candidates the fixed budget lost ($fc vs $ac)")
    // the adaptive answer IS the standard filtered search at the settled
    // budget — the mechanism changes the budget, never the semantics
    assert(rows(a) === rows(Quantize.searchSelfContainedRefinedStoredFiltered(
      spark, store, q, "vec_id", "embedding", allow, 8, usedNp, 32)),
      "adaptive result must equal the fixed search at the settled nProbe")
    // the fence still holds
    val allowedSet = allow.collect().map(_.getLong(0)).toSet
    assert(a.select("neighbor_id").collect().map(_.getLong(0))
      .forall(allowedSet), "adaptive search leaked a disallowed id")
    // duplicate query ids refuse loudly: the per-query candidate counts
    // cannot validate one budget for two different vectors under one id
    val dup = intercept[IllegalArgumentException](
      Quantize.searchSelfContainedRefinedStoredFilteredAdaptive(
        spark, store, q.unionByName(q), "vec_id", "embedding", allow, 8, 1, 32))
    assert(dup.getMessage.contains("one row per query id"))
  }
}
