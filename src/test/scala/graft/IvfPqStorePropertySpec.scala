package graft

import graft.operators.Quantize
import org.apache.spark.sql.functions._

/** Model-based lifecycle property for the IVF-PQ store — the vector twin
  * of [[Bm25StorePropertySpec]]: a deterministic pseudo-random sequence
  * of append / tombstone / retention-sweep / immediate-delete / compact /
  * RECELL operations (with the documented delete-then-reappend RETRY heal
  * spliced in) must leave a store whose tombstone-filtered probed search
  * answers EXACTLY like the in-memory search over the model's live
  * vectors — under the store's CURRENT quantizers, which a recell
  * retrains mid-sequence (the model reloads them for the comparison, and
  * recell additionally clears the model's tombstone expectations: the
  * new image holds only survivors). Each op is proven alone in
  * BatchingOpsSpec; this proves arbitrary interleavings compose. Fixed
  * LCG per seed → replayable. */
class IvfPqStorePropertySpec extends SparkSpec {

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound) + bound).toInt % bound
    }
  }

  test("random lifecycle sequences answer exactly like the in-memory search over the live vectors") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val queries = emb.filter(col("vec_id") < 5)

    // seeds chosen so the op mix covers recell MID-sequence with standing
    // tombstones before it and appends after it (the append must encode
    // against the retrained quantizers): 7 → sweep, del, append, tomb,
    // sweep, RECELL, append; 41 → sweep, compact, tomb, append, RECELL,
    // append, compact.
    for (seed <- Seq(7L, 41L)) {
      val rnd = new Lcg(seed)
      // model: the live id set; start from a 60% slice so appends have room
      var live = allIds.filter(_ % 5 != 3).toSet
      var pending = allIds.filterNot(live).sorted.toSeq // appendable ids
      val store = java.nio.file.Files
        .createTempDirectory(s"ivfpqprop-$seed-").toString + "/index"
      def frame(ids: Set[Long]) =
        emb.filter(col("vec_id").isInCollection(ids.toSeq))
      Quantize.buildSelfContained(spark, frame(live), "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
        residual = false, store)
      var recelled = false
      for (step <- 1 to 7) {
        rnd.next(6) match {
          case 0 if pending.nonEmpty => // append a fresh batch
            val batch = pending.take(1 + rnd.next(30)).toSet
            pending = pending.drop(batch.size)
            live ++= batch
            Quantize.appendSelfContained(spark, store, frame(batch), "embedding")
            if (rnd.next(2) == 0) {
              // the documented append RETRY heal: delete batch ids, re-append
              import spark.implicits._
              Quantize.deleteFromIvfPqIndex(spark, store,
                batch.toSeq.toDF("vec_id"), "vec_id")
              Quantize.appendSelfContained(spark, store, frame(batch), "embedding")
            }
          case 1 => // O(1) tombstoned retraction (+ an absent id no-op)
            import spark.implicits._
            val pick = live.toSeq.sorted
            val dead = (0 until (1 + rnd.next(5)))
              .map(_ => pick(rnd.next(pick.size))).toSet
            live --= dead
            Quantize.addTombstones(spark, store,
              (dead.toSeq :+ 999999L).toDF("vec_id"), "vec_id")
          case 2 => // threshold sweep at a random fraction
            Quantize.retentionSweep(spark, store, "vec_id",
              maxTombstoneFraction = 0.1 + 0.2 * rnd.next(4))
          case 3 => // immediate cell surgery on a fresh slice — alternating
            // the discovery path (scan vs assign-from-supplied-vectors) on
            // step parity, NOT on an rnd draw, so the documented seed
            // sequences keep their op mix
            import spark.implicits._
            val pick = live.toSeq.sorted
            val dead = (0 until (1 + rnd.next(3)))
              .map(_ => pick(rnd.next(pick.size))).toSet
            live --= dead
            if (step % 2 == 0)
              Quantize.deleteFromIvfPqIndexWithVectors(spark, store,
                frame(dead), "embedding")
            else
              Quantize.deleteFromIvfPqIndex(spark, store,
                dead.toSeq.toDF("vec_id"), "vec_id")
          case 4 => // RETRAIN the geometry mid-sequence from the lake table
            Quantize.recellIvfPqStore(spark, store, emb, "embedding",
              nCells = 4 + rnd.next(5), nCodes = 8 + rnd.next(8),
              coarseMaxIter = 2, pqMaxIter = 1)
            recelled = true
          case _ =>
            Quantize.compactIvfPqIndex(spark, store, maxRecordsPerFile = 1000000L)
        }
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "rank", "dist2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      // the comparison quantizers are whatever the store CURRENTLY holds —
      // frozen from build, or retrained by a mid-sequence recell
      val (curCents, curCb, _) = Quantize.loadQuantizers(spark, store)
      val served = canon(Quantize.searchSelfContained(spark, store,
        queries, "vec_id", "embedding", 3, 2))
      val inMem = canon(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
        frame(live), "vec_id", "embedding", curCents, "centroid_id", "cen_emb",
        curCb, "code", "c_emb", 64, 4, 3, 2))
      assert(served == inMem,
        s"seed=$seed (recelled=$recelled): store diverged from the model")
      assert(served.nonEmpty, s"seed=$seed: vacuous sequence")
    }
  }

  test("sidecar stores under random lifecycles: sidecar >= live ids, and the sidecar rescore equals the corpus rescore") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val allIds = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val queries = emb.filter(col("vec_id") < 5)

    for (seed <- Seq(7L, 41L)) {
      val rnd = new Lcg(seed)
      var live = allIds.filter(_ % 5 != 3).toSet
      var pending = allIds.filterNot(live).sorted.toSeq
      val store = java.nio.file.Files
        .createTempDirectory(s"ivfpqprop-sc-$seed-").toString + "/index"
      def frame(ids: Set[Long]) =
        emb.filter(col("vec_id").isInCollection(ids.toSeq))
      Quantize.buildSelfContained(spark, frame(live), "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
        residual = false, store, storeVectors = true)
      for (step <- 1 to 7) {
        rnd.next(6) match {
          case 0 if pending.nonEmpty =>
            val batch = pending.take(1 + rnd.next(30)).toSet
            pending = pending.drop(batch.size)
            live ++= batch
            Quantize.appendSelfContained(spark, store, frame(batch), "embedding")
            if (rnd.next(2) == 0) {
              // retry heal: codes delete-then-reappend; the sidecar keeps
              // both copies (documented multiset — readers dedup)
              import spark.implicits._
              Quantize.deleteFromIvfPqIndex(spark, store,
                batch.toSeq.toDF("vec_id"), "vec_id")
              Quantize.appendSelfContained(spark, store, frame(batch), "embedding")
            }
          case 1 =>
            import spark.implicits._
            val pick = live.toSeq.sorted
            val dead = (0 until (1 + rnd.next(5)))
              .map(_ => pick(rnd.next(pick.size))).toSet
            live --= dead
            Quantize.addTombstones(spark, store,
              (dead.toSeq :+ 999999L).toDF("vec_id"), "vec_id")
          case 2 =>
            Quantize.retentionSweep(spark, store, "vec_id",
              maxTombstoneFraction = 0.1 + 0.2 * rnd.next(4))
          case 3 =>
            import spark.implicits._
            val pick = live.toSeq.sorted
            val dead = (0 until (1 + rnd.next(3)))
              .map(_ => pick(rnd.next(pick.size))).toSet
            live --= dead
            if (step % 2 == 0)
              Quantize.deleteFromIvfPqIndexWithVectors(spark, store,
                frame(dead), "embedding")
            else
              Quantize.deleteFromIvfPqIndex(spark, store,
                dead.toSeq.toDF("vec_id"), "vec_id")
          case 4 => // retrain — alternating the corpus source proves the
            // sidecar-sourced recell composes with everything else
            if (rnd.next(2) == 0)
              Quantize.recellIvfPqStoreFromSidecar(spark, store,
                nCells = 4 + rnd.next(5), nCodes = 8 + rnd.next(8),
                coarseMaxIter = 2, pqMaxIter = 1)
            else
              Quantize.recellIvfPqStore(spark, store, emb, "embedding",
                nCells = 4 + rnd.next(5), nCodes = 8 + rnd.next(8),
                coarseMaxIter = 2, pqMaxIter = 1)
          case _ =>
            Quantize.compactIvfPqIndex(spark, store, maxRecordsPerFile = 1000000L)
        }
        // the standing invariant every op must preserve
        val sidecarIds = spark.read.parquet(s"$store.vectors")
          .select("vec_id").distinct().collect().map(_.getLong(0)).toSet
        assert(live.subsetOf(sidecarIds),
          s"seed=$seed step=$step: live ids missing from the sidecar: " +
            (live -- sidecarIds).take(5))
      }
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "neighbor_id", "rank", "dist2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val stored = canon(Quantize.searchSelfContainedRefinedStored(spark, store,
        queries, "vec_id", "embedding", 3, 2, 9))
      val viaCorpus = canon(Quantize.searchSelfContainedRefined(spark, store,
        queries, "vec_id", "embedding", emb, "embedding", 3, 2, 9))
      assert(stored == viaCorpus,
        s"seed=$seed: sidecar rescore diverged from the corpus rescore")
      assert(stored.nonEmpty, s"seed=$seed: vacuous sequence")
    }
  }
}
