package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** Model-based lifecycle property for the BM25 store: a deterministic
  * pseudo-random sequence of append / delete / RETRY / compact /
  * rebucket operations must leave a store that serves EXACTLY like the
  * one-shot formula over the model's surviving corpus — the composition
  * gate the per-operation specs can't give (each op is proven alone;
  * this proves arbitrary interleavings compose). Randomness is a fixed
  * LCG per seed, so failures replay bit-identically. */
class Bm25StorePropertySpec extends SparkSpec {

  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(bound: Int): Int = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % bound) + bound).toInt % bound
    }
  }

  private def text(id: Long, salt: Int): String =
    s"alpha w${id % 7} w${(id + salt) % 5} doc$id common"

  test("random lifecycle sequences serve exactly the one-shot formula over the surviving corpus") {
    import spark.implicits._
    for (seed <- Seq(7L, 41L, 1337L)) {
      val rnd = new Lcg(seed)
      // model: live docs the store must be indistinguishable from
      var model = (1L to 25L).map(i => i -> text(i, 0)).toMap
      var nextId = 26L
      var epoch = 0L
      val work = java.nio.file.Files
        .createTempDirectory(s"bm25prop-$seed-").toString
      Retrieval.writeBm25Store(model.toSeq.toDF("doc_id", "text"),
        "text", "doc_id", work, nBuckets = 4 + rnd.next(8))
      var lastOp: Option[() => Unit] = None
      for (step <- 1 to 7) {
        rnd.next(5) match {
          case 0 | 1 => // append a fresh batch (ids new to the store)
            epoch += 1
            val e = epoch
            val batch = (0 until (1 + rnd.next(6)))
              .map(k => (nextId + k) -> text(nextId + k, step)).toMap
            nextId += batch.size
            model ++= batch
            val op = () => Retrieval.appendBm25Store(
              batch.toSeq.toDF("doc_id", "text"), "text", "doc_id", work, e)
            op(); lastOp = Some(op)
          case 2 => // delete — scan path or the O(batch) TEXT path
            epoch += 1
            val e = epoch
            val live = model.keys.toSeq.sorted
            val dead = (0 until (1 + rnd.next(4)))
              .map(_ => live(rnd.next(live.size))).distinct
            val deadDocs = dead.map(i => i -> model(i)) // texts BEFORE removal
            model --= dead
            val op =
              if (rnd.next(2) == 0) { () =>
                // scan path tolerates absent ids (no-op)
                Retrieval.deleteFromBm25Store(spark, work,
                  (dead :+ 999999L).toDF("doc_id"), e): Unit
              } else { () =>
                // text path: deltas re-derived from the docs' own text —
                // contract says every supplied doc IS in the store
                Retrieval.deleteFromBm25Store(spark, work,
                  deadDocs.toDF("doc_id", "text"), "text", "doc_id", e): Unit
              }
            op(); lastOp = Some(op)
          case 3 =>
            Retrieval.compactBm25Store(spark, work); lastOp = None
          case 4 =>
            Retrieval.rebucketBm25Store(spark, work, 4 + rnd.next(12))
            lastOp = None
        }
        // foreachBatch-style retry of the last epoch-addressed op: must
        // be invisible at ANY point in the sequence
        if (rnd.next(3) == 0) lastOp.foreach(_.apply())
      }
      val q = Seq(900L -> "alpha w3 common", 901L -> "w1 w4 beta")
        .toDF("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val served = canon(Retrieval.bm25TopKFromStore(spark, work, q,
        "text", "doc_id", 50))
      val oneShot = canon(Retrieval.bm25TopK(
        model.toSeq.toDF("doc_id", "text"), q, "text", "doc_id", 50))
      assert(served == oneShot, s"seed=$seed: store diverged from the model")
      assert(served.nonEmpty, s"seed=$seed: vacuous sequence")
      assert(Retrieval.liveStats(spark, work).collect().head.getLong(0)
        == model.size, s"seed=$seed: live n_docs diverged from the model")
    }
  }
}
