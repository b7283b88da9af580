package graft

import graft.operators.{Quantize, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 composed fuzzer (verdict item 7): TwinFuzzSpec fuzzes the
  * driver twins on QUIET stores and CommitLogSpec replays FIXED crash
  * windows — this spec interleaves a SEEDED-RANDOM store-lifecycle
  * schedule (append / delete / compact / rebucket on the lexical store,
  * append / tombstone / sweep / cell-split on the vector store — every
  * install StoreGate'd inside its operator) with concurrent twin-served
  * reads through the full serving stack (SearchApi: committed-epoch
  * snapshots, version tokens, subset bracket, escalation lease), and
  * asserts EVERY read equals the exact answer of ONE committed snapshot
  * from a pre-computed ledger — never a torn mix, never a 5xx.
  *
  * The ledger is built by replaying the same seeded schedule on a
  * reference store pair and capturing each payload's answer at every
  * committed state; determinism of the build (pinned by ServeMutation's
  * fresh-build guard and re-checked here) makes the live stores'
  * intermediate states byte-comparable. ≥500 validated reads per run. */
class LifecycleFuzzSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val Seed = 20260816L
  private val Readers = 6
  private val MinReads = 500

  private def buildStores(corpus: DataFrame, emb: DataFrame,
                          tag: String): (String, String) = {
    val work = java.nio.file.Files
      .createTempDirectory(s"lcf-$tag-").toString
    Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$work/lex", 8, storeDocs = true)
    Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      emb.filter(col("vec_id") < 6)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
      "centroid_id", "cen_emb",
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
      "code_id", "cb_emb", 64, 4, residual = false, s"$work/vec",
      storeVectors = true)
    (s"$work/lex", s"$work/vec")
  }

  test(s"randomized lifecycle schedule vs concurrent served reads: every read equals one committed snapshot (>= $MinReads reads)") {
    val docs = Tables.t(spark, SfDir, "documents")
    val embT = Tables.t(spark, SfDir, "embeddings")
    val hybrid = docs.join(embT, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 41 === 11
    // three disjoint reserve slices — the schedule appends them one by one
    val reserves = (0 until 3).map(i =>
      hybrid.filter(col("doc_id") % 41 === (13 + i)).localCheckpoint())
    val corpus = hybrid.filter(!isQuery &&
      !col("doc_id").%(41).isin(13L, 14L, 15L)).localCheckpoint()
    val delSlices = (0 until 2).map(i =>
      corpus.select("doc_id").filter(col("doc_id") % 11 === i).limit(40)
        .localCheckpoint())

    // ---- seeded random schedule over both stores ------------------------
    val rnd = new scala.util.Random(Seed)
    type Mut = (String, (String, String) => Unit)
    var lexEpoch = 0L
    var vecAppended = 0
    var lexAppended = 0
    var deleted = 0
    val schedule = scala.collection.mutable.ArrayBuffer.empty[Mut]
    // draw 14 ops; guards keep each draw legal for the state so the same
    // seed replays identically on the reference and live stores
    while (schedule.size < 14) {
      rnd.nextInt(8) match {
        case 0 if lexAppended < reserves.size =>
          val b = reserves(lexAppended); lexAppended += 1; lexEpoch += 1
          val e = lexEpoch
          schedule += (s"lex-append$e" -> ((lex, _) =>
            Retrieval.appendBm25Store(b.select("doc_id", "text"),
              "text", "doc_id", lex, epoch = e)))
        case 1 if deleted < delSlices.size =>
          val ids = delSlices(deleted); deleted += 1; lexEpoch += 1
          val e = lexEpoch
          schedule += (s"lex-delete$e" -> ((lex, _) => {
            Retrieval.deleteFromBm25Store(spark, lex, ids, epoch = e); ()
          }))
        case 2 =>
          schedule += ("lex-compact" -> ((lex, _) => {
            Retrieval.compactBm25Store(spark, lex); () }))
        case 3 =>
          val nb = 4 + rnd.nextInt(3) * 4 // 4, 8, or 12 buckets
          // rebucket folds epochs; later appends/deletes keep counting
          // upward (epochs need only be distinct, not dense)
          schedule += (s"lex-rebucket$nb" -> ((lex, _) => {
            Retrieval.rebucketBm25Store(spark, lex, newBuckets = nb); ()
          }))
        case 4 if vecAppended < reserves.size =>
          val b = reserves(vecAppended); vecAppended += 1
          schedule += (s"vec-append$vecAppended" -> ((_, vec) =>
            Quantize.appendSelfContained(spark, vec,
              b.select("doc_id", "embedding"), "embedding")))
        case 5 if deleted > 0 =>
          val ids = delSlices(deleted - 1)
          schedule += ("vec-tombstone" -> ((_, vec) => {
            Quantize.addTombstones(spark, vec, ids, "doc_id"); () }))
        case 6 =>
          schedule += ("vec-sweep" -> ((_, vec) => {
            Quantize.retentionSweep(spark, vec, "doc_id",
              maxTombstoneFraction = 0.0001); () }))
        case 7 if vecAppended > 0 =>
          schedule += ("vec-split" -> ((_, vec) => {
            Quantize.splitDriftedCells(spark, vec,
              overshoot = 1.05, splitWays = 2); () }))
        case _ => // guard failed this draw; redraw
      }
    }
    info(s"schedule: ${schedule.map(_._1).mkString(" -> ")}")

    // ---- payloads whose answers MOVE across states ----------------------
    val qRows = hybrid.filter(isQuery).select("text", "embedding")
      .limit(3).collect()
    val payloads: Seq[(String, Seq[Float], String)] = qRows.toSeq.flatMap { r =>
      val txt = r.getString(0).split("\\s+").take(5).mkString(" ")
      val vec = r.getSeq[Float](1)
      Seq((txt, Seq.empty[Float], "lexical"), (txt, vec, "hybrid"),
        ("", vec, "vector"))
    }

    def apiFor(lex: String, vec: String, cacheSize: Int) =
      graft.serve.SearchApi.fromConfig(spark, graft.serve.GraftConfig.fromString(
        s"""retrieval:
           |  lex_store: "$lex"
           |  vec_store: "$vec"
           |  depth: 12
           |  n_probe: 2
           |  rerank_depth: 40
           |  max_query_terms: 5
           |  cache_size: $cacheSize
           |""".stripMargin, env = Map.empty)).get
    def canon(body: String): String =
      body.replaceAll("\"timestamp\":\"[^\"]+\"", "\"timestamp\":\"-\"")
    def answers(api: graft.serve.SearchApi): Seq[String] = payloads.map {
      case (t, v, m) =>
        val r = api.search(t, v, 8, m, Seq.empty)
        assert(r.status == 200, s"reference read failed: ${r.body.take(200)}")
        canon(r.body)
    }

    // ---- reference ledger ----------------------------------------------
    val (refLex, refVec) = buildStores(corpus, embT, "ref")
    val refApi = apiFor(refLex, refVec, cacheSize = 0)
    val ledger = scala.collection.mutable.ArrayBuffer(answers(refApi))
    schedule.foreach { case (_, m) => m(refLex, refVec); ledger += answers(refApi) }
    val valid: Seq[Set[String]] =
      payloads.indices.map(i => ledger.map(_(i)).toSet)
    info(s"ledger: ${ledger.size} states; distinct answers/payload: " +
      valid.map(_.size).mkString(","))
    // the schedule must actually move answers, else the assert is vacuous
    assert(valid.exists(_.size > 1), "fixture: no payload's answer ever moved")

    // ---- live phase: fresh stores, concurrent readers + the schedule ----
    val (lex, vec) = buildStores(corpus, embT, "live")
    val api = apiFor(lex, vec, cacheSize = 0) // every read a REAL compute
    payloads.indices.foreach { i =>
      val (t, v, m) = payloads(i)
      assert(canon(api.search(t, v, 8, m, Seq.empty).body) == ledger.head(i),
        s"fresh build diverged on payload $i") // determinism guard
    }
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (0 until Readers).map { c =>
      new Thread(() => {
        var i = c
        while (!stop.get()) {
          val p = i % payloads.size
          val (t, v, m) = payloads(p)
          val r = api.search(t, v, 8, m, Seq.empty)
          if (r.status != 200)
            bad.add(s"status ${r.status} on payload $p: ${r.body.take(160)}")
          else if (!valid(p).contains(canon(r.body)))
            bad.add(s"TORN payload $p: ${canon(r.body).take(200)}")
          reads.incrementAndGet()
          i += Readers
        }
      }, s"lcf-reader-$c")
    }
    readers.foreach(_.start())
    schedule.foreach { case (name, m) =>
      m(lex, vec)
      Thread.sleep(150)
    }
    // keep reading until the floor is met (bounded), then stop. The
    // floor is a SAMPLE-SIZE requirement (>=500 randomized read/state
    // comparisons), not a latency assertion — an uncached hybrid compute
    // runs ~1s quiet but ~3s under a loaded CI box, so the bound is
    // sized for the slow case (6 readers x ~3s/read -> ~250s for 500)
    // rather than failing the consistency fuzz on machine noise.
    val deadline = System.nanoTime() + 360L * 1000000000L
    while (reads.get() < MinReads && System.nanoTime() < deadline)
      Thread.sleep(200)
    stop.set(true); readers.foreach(_.join(30000))
    info(s"${reads.get()} concurrent reads validated against ${ledger.size} states")
    assert(bad.isEmpty, s"${bad.size} bad reads; first: ${bad.peek()}")
    assert(reads.get() >= MinReads,
      s"only ${reads.get()} reads completed (< $MinReads)")
    // post-schedule: the stores converged to the reference's final state
    payloads.indices.foreach { i =>
      val (t, v, m) = payloads(i)
      assert(canon(api.search(t, v, 8, m, Seq.empty).body) == ledger.last(i),
        s"final state mismatch on payload $i")
    }
  }
}
