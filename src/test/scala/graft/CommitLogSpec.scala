package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** The round-12 uniform commit rule, replayed deterministically: every
  * lexical-store mutation's EPOCHS ROW is its commit point, and every
  * reader folds a committed snapshot — so each crash window (simulated
  * by surgically removing the commit row / trailing writes of a
  * completed mutation) serves the exact PRE state, and the same-epoch
  * retry converges to the exact POST state. This is the deterministic
  * twin of the racing ServeMutation probe (STREAMLAT.md's
  * serving-under-mutation section). */
class CommitLogSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def fs(path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  private def answer(store: String, q: String): Seq[String] =
    Retrieval.bm25TopKFromStore(spark, store,
        docs(900L -> q), "text", "doc_id", 10)
      .orderBy("rank").collect().map(_.toString).toSeq

  private val base = (1L to 30L).map(i =>
    i -> s"alpha doc$i common word${i % 5} beta")
  private val batch = (31L to 36L).map(i => i -> s"alpha fresh$i common")
  private val q = "alpha common beta"

  test("a crashed append (postings+df landed, commit row missing) is invisible; the same-epoch retry lands the post state exactly") {
    val store = java.nio.file.Files.createTempDirectory("commit-app-").toString + "/s"
    Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store, 8)
    val pre = answer(store, q)
    Retrieval.appendBm25Store(docs(batch: _*), "text", "doc_id", store, epoch = 1L)
    val post = answer(store, q)
    assert(pre != post, "fixture: the append must change the answer")
    // simulate the crash-before-commit window: remove ONLY epoch 1's
    // commit row — its postings and df deltas stay on disk
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=1"), true))
    assert(answer(store, q) == pre,
      "a commit-row-less append must serve the exact pre state")
    // the liveness scalars agree with what serves (not with orphan rows)
    val (nd, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store)
    assert(nd == 30L, s"snapshot n_docs must exclude the orphan batch: $nd")
    // retry with the same epoch: dynamic overwrites replace the orphan
    // partitions and the commit row lands — exact post state
    Retrieval.appendBm25Store(docs(batch: _*), "text", "doc_id", store, epoch = 1L)
    assert(answer(store, q) == post,
      "the same-epoch retry must converge to the exact post state")
  }

  test("a crashed delete is invisible at every window (df-only; df+tombstones); the retry converges; compaction never swallows it") {
    val store = java.nio.file.Files.createTempDirectory("commit-del-").toString + "/s"
    import spark.implicits._
    Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store, 8)
    val pre = answer(store, q)
    val doomed = Seq(2L, 5L, 9L).toDF("doc_id")
    Retrieval.deleteFromBm25Store(spark, store, doomed, epoch = 1L)
    val post = answer(store, q)
    assert(pre != post, "fixture: the delete must change the answer")

    // window B: tombstones + df landed, commit row missing
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=-1"), true))
    assert(answer(store, q) == pre,
      "a commit-row-less delete (tombstones on disk!) must serve the pre state")
    assert(Retrieval.readBm25Tombstones(spark, store).count() == 0,
      "committed tombstones must exclude the row-less delete epoch")

    // a compaction running INSIDE the crash window must not purge the
    // uncommitted delete's postings (the round-10 poison state): it
    // no-ops, and the doomed docs still serve
    Retrieval.compactBm25Store(spark, store)
    assert(answer(store, q) == pre, "compaction must ignore uncommitted tombstones")

    // window A: only df landed (remove the tombstone partition too)
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/tombstones/epoch=-1"), true))
    assert(answer(store, q) == pre, "a df-only delete window serves the pre state")

    // retry converges from the deepest window
    Retrieval.deleteFromBm25Store(spark, store, doomed, epoch = 1L)
    assert(answer(store, q) == post, "the same-epoch retry lands the post state")

    // and compaction after the commit purges + clears exactly the
    // committed tombstones, answer unchanged
    Retrieval.compactBm25Store(spark, store)
    assert(answer(store, q) == post, "compaction must not change the answer")
    assert(Retrieval.readBm25Tombstones(spark, store).count() == 0)
  }

  test("an uncommitted delete's ids stay deletable by ANOTHER committed delete, and the crashed epoch's retry then no-ops (no double-decrement)") {
    val store = java.nio.file.Files.createTempDirectory("commit-del2-").toString + "/s"
    import spark.implicits._
    Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store, 8)
    // delete epoch 1 "crashes" after tombstones, before its commit row
    Retrieval.deleteFromBm25Store(spark, store, Seq(2L, 5L).toDF("doc_id"),
      epoch = 1L)
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=-1"), true))
    // delete epoch 2 overlaps the crashed set — it must treat 2 and 5 as
    // LIVE (re-derive their deltas) because epoch -1 never committed
    val n2 = Retrieval.deleteFromBm25Store(spark, store,
      Seq(2L, 5L, 9L).toDF("doc_id"), epoch = 2L)
    assert(n2 == 3L, s"the overlapping delete must claim all three ids: $n2")
    val (nd, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store)
    assert(nd == 27L, s"stats must reflect exactly one decrement per doc: $nd")
    // the crashed epoch's retry now skips its ids (committed elsewhere)
    val n1 = Retrieval.deleteFromBm25Store(spark, store,
      Seq(2L, 5L).toDF("doc_id"), epoch = 1L)
    assert(n1 == 0L, s"the retry must no-op on ids another epoch committed: $n1")
    val (nd2, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store)
    assert(nd2 == 27L, s"no double-decrement: $nd2")
  }

  test("deleting ids present ONLY in a crashed append's orphan postings is a no-op — the delta derivation sees the committed snapshot") {
    // round-13 ADVICE closure: the delete's derivation scans (scan branch
    // AND sidecar liveness probe) filter to the committed epoch set. A
    // delete that could see a crashed append's orphan postings would
    // write -df/-n_docs/id-hash deltas for docs the snapshot never
    // counted — permanently understating stats and corrupting the
    // doc-set signature when the append is never retried.
    import spark.implicits._
    for (storeDocs <- Seq(false, true)) {
      val store = java.nio.file.Files.createTempDirectory("commit-orph-")
        .toString + "/s"
      Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store, 8,
        storeDocs = storeDocs)
      val pre = answer(store, q)
      val (nd0, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store)
      val tok0 = Retrieval.storeVersion(spark, store)
      // an append that crashes before its commit row: postings + df (and
      // sidecar texts, on the storeDocs store) are on disk, orphaned
      Retrieval.appendBm25Store(docs(batch: _*), "text", "doc_id", store,
        epoch = 1L)
      assert(fs(store).delete(
        new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=1"), true))
      // delete ids that exist ONLY in the orphan batch: must claim zero
      // docs and leave stats/signature/answers untouched
      val n = Retrieval.deleteFromBm25Store(spark, store,
        Seq(31L, 33L).toDF("doc_id"), epoch = 1L)
      assert(n == 0L,
        s"storeDocs=$storeDocs: delete of orphan-append-only ids must " +
          s"no-op, claimed $n")
      val (nd1, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store)
      assert(nd1 == nd0,
        s"storeDocs=$storeDocs: n_docs must be untouched: $nd1 != $nd0")
      assert(Retrieval.storeVersion(spark, store) == tok0,
        s"storeDocs=$storeDocs: a no-op delete must not move the token")
      assert(answer(store, q) == pre)
      // the append's retry must still land the exact post state — the
      // no-op delete wrote nothing that blocks convergence
      Retrieval.appendBm25Store(docs(batch: _*), "text", "doc_id", store,
        epoch = 1L)
      val postRetry = answer(store, q)
      assert(postRetry != pre, "fixture: the append must change the answer")
      // and deleting a MIX of committed + orphan ids claims only the
      // committed ones (fresh store, fresh orphan window)
      val store2 = java.nio.file.Files.createTempDirectory("commit-orph2-")
        .toString + "/s"
      Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store2, 8,
        storeDocs = storeDocs)
      Retrieval.appendBm25Store(docs(batch: _*), "text", "doc_id", store2,
        epoch = 1L)
      assert(fs(store2).delete(
        new org.apache.hadoop.fs.Path(s"$store2/epochs/epoch=1"), true))
      val n2 = Retrieval.deleteFromBm25Store(spark, store2,
        Seq(2L, 31L).toDF("doc_id"), epoch = 1L)
      assert(n2 == 1L,
        s"storeDocs=$storeDocs: mixed delete must claim only the committed id: $n2")
      val (nd2, _, _, _) = Retrieval.liveStatsAndBuckets(spark, store2)
      assert(nd2 == 29L, s"storeDocs=$storeDocs: exactly one decrement: $nd2")
    }
  }

  test("deleting orphan-append-only ids from a FIELDED store is a no-op (committed-snapshot fence on the bm25f delete derivation)") {
    import spark.implicits._
    val fdocs = (1L to 20L).map(i =>
      (i, s"head$i alpha", s"alpha doc$i common word${i % 5} beta"))
      .toDF("doc_id", "title", "body")
    val fbatch = (31L to 34L).map(i =>
      (i, s"head$i alpha", s"alpha fresh$i common"))
      .toDF("doc_id", "title", "body")
    val store = java.nio.file.Files.createTempDirectory("commit-orphf-")
      .toString + "/s"
    Retrieval.writeBm25fStore(fdocs, Seq("title", "body"), "doc_id", store, 8)
    val snap0 = Retrieval.storeVersion(spark, store)
    Retrieval.appendBm25fStore(fbatch, "doc_id", store, epoch = 1L)
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=1"), true))
    val n = Retrieval.deleteFromBm25fStore(spark, store,
      Seq(31L, 34L).toDF("doc_id"), epoch = 1L)
    assert(n == 0L, s"fielded delete of orphan-only ids must no-op: $n")
    assert(Retrieval.storeVersion(spark, store) == snap0,
      "a no-op fielded delete must not move the token")
  }

  test("the logical cache token moves exactly at the commit row — not at a half-landed delete — and survives compaction") {
    val store = java.nio.file.Files.createTempDirectory("commit-tok-").toString + "/s"
    import spark.implicits._
    Retrieval.writeBm25Store(docs(base: _*), "text", "doc_id", store, 8)
    val t0 = Retrieval.storeVersion(spark, store)
    Retrieval.deleteFromBm25Store(spark, store, Seq(3L).toDF("doc_id"), epoch = 1L)
    val t1 = Retrieval.storeVersion(spark, store)
    assert(t0 != t1, "a committed delete must move the logical token")
    // rolling back to the half-landed window restores the OLD answer;
    // the token (epochs fingerprint) must then differ from the committed
    // token — the cache can never address a committed-state entry with a
    // half-landed store
    assert(fs(store).delete(
      new org.apache.hadoop.fs.Path(s"$store/epochs/epoch=-1"), true))
    assert(Retrieval.storeVersion(spark, store) != t1)
    Retrieval.deleteFromBm25Store(spark, store, Seq(3L).toDF("doc_id"), epoch = 1L)
    val t2 = Retrieval.storeVersion(spark, store)
    val aCommitted = answer(store, q)
    Retrieval.compactBm25Store(spark, store)
    assert(Retrieval.storeVersion(spark, store) == t2,
      "compaction must keep the logical token (answers unchanged)")
    assert(answer(store, q) == aCommitted)
  }
}
