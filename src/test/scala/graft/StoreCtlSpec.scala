package graft

import graft.operators.{Quantize, Retrieval}
import org.apache.spark.sql.functions._

/** Multi-cycle simulation of the UNIFIED maintenance scheduler
  * ([[StoreCtl]]) over a lex + vec store pair — one sidecar maintains
  * both families. Gates: the same cycle compacts the tombstoned BM25
  * store and sweeps the tombstoned IVF-PQ store; a locked store is a
  * SKIP report while its sibling is still maintained, and the next
  * cycle after release heals it; serving answers are unchanged by
  * maintenance on both sides; the epoch-fold policy is opt-in and
  * refuses under a stream marker; the daemon loop honors maxCycles and
  * bounded jitter without real sleeping. */
class StoreCtlSpec extends SparkSpec {

  private def lexRows(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "doc_id", "rank")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("one cycle maintains both families; a locked store skips and heals next cycle; serving unchanged") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").localCheckpoint()
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("storectl-").toString
    val (lex, vec) = (s"$work/lex", s"$work/vec")

    Retrieval.writeBm25Store(docs, "text", "doc_id", lex, nBuckets = 8)
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, vec)

    // retractions on BOTH stores: lex tombstones standing, vec dead
    // fraction above the sweep threshold in every cell
    val deadLex = docs.filter(col("doc_id") % 7 === 3).select("doc_id")
    assert(Retrieval.deleteFromBm25Store(spark, lex, deadLex, epoch = 1L) > 0)
    val deadVec = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    assert(Quantize.addTombstones(spark, vec, deadVec, "vec_id") > 0)

    val q = docs.filter(col("doc_id") % 97 === 5).limit(4)
      .select("doc_id", "text")
    val expectLex = lexRows(
      Retrieval.bm25TopKFromStore(spark, lex, q, "text", "doc_id", 10))

    val stores = Seq(StoreCtl.LexStore(lex), StoreCtl.VecStore(vec, 0.01))

    // cycle 1 with the lex store LOCKED: skip + sibling still maintained
    graft.sources.StoreLock.acquire(spark, lex, "spec-hold")
    val r1 = StoreCtl.cycle(spark, stores)
    assert(r1.map(_.action) === Seq("skip-locked", "sweep"), r1.toString)
    assert(r1(1).detail.contains("rows removed"))
    assert(!r1(1).detail.startsWith("0 cells"),
      s"vec sweep should have rewritten cells: ${r1(1).detail}")
    graft.sources.StoreLock.release(spark, lex)

    // cycle 2: the lex compact heals; vec has nothing left to sweep
    val r2 = StoreCtl.cycle(spark, stores)
    assert(r2.map(_.action) === Seq("compact", "sweep"), r2.toString)
    assert(!new java.io.File(s"$lex/tombstones").exists(),
      "compact must retire the lex tombstones")
    assert(r2(1).detail.startsWith("0 cells"),
      s"second sweep must find nothing: ${r2(1).detail}")

    // serving unchanged by maintenance on both sides
    assert(lexRows(Retrieval.bm25TopKFromStore(spark, lex, q, "text",
      "doc_id", 10)) === expectLex, "lex serving changed across the compact")
    val vq = emb.filter(col("vec_id") < 3)
    val served = Quantize.searchSelfContained(spark, vec, vq,
      "vec_id", "embedding", 5, 3).select("neighbor_id")
      .collect().map(_.getLong(0)).toSet
    assert(served.forall(_ % 7 != 3), "swept ids resurfaced in vec serving")

    // cycle 3: both stores quiescent — pure noop reporting
    val r3 = StoreCtl.cycle(spark, stores)
    assert(r3.head.action === "noop", r3.toString)
  }

  test("epoch-fold policy: opt-in only, refuses under a stream marker, folds after quiescence") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").localCheckpoint()
    val lex = java.nio.file.Files.createTempDirectory("storectl-fold-")
      .toString + "/lex"
    val base = docs.filter(col("doc_id") % 3 === 0)
    Retrieval.writeBm25Store(base, "text", "doc_id", lex, nBuckets = 4)
    // two appends → 3 epoch partitions per populated bucket
    Retrieval.appendBm25Store(docs.filter(col("doc_id") % 3 === 1),
      "text", "doc_id", lex, epoch = 1L)
    Retrieval.appendBm25Store(docs.filter(col("doc_id") % 3 === 2),
      "text", "doc_id", lex, epoch = 2L)
    assert(StoreCtl.lexEpochFragmentation(spark, lex) > 2.0)

    val q = docs.filter(col("doc_id") % 101 === 7).limit(3)
      .select("doc_id", "text")
    val expect = lexRows(
      Retrieval.bm25TopKFromStore(spark, lex, q, "text", "doc_id", 10))

    // no opt-in → fragmentation alone never folds
    val noOptIn = StoreCtl.cycle(spark, Seq(StoreCtl.LexStore(lex)))
    assert(noOptIn.head.action === "noop", noOptIn.toString)

    // opted in but stream-adopted → refuse (quiescence is operator's call)
    val marker = new java.io.File(s"$lex/_graft_stream_id")
    java.nio.file.Files.writeString(marker.toPath, "some-stream")
    val folding = StoreCtl.LexStore(lex, foldEpochs = true,
      maxEpochsPerBucket = 1.5)
    val underStream = StoreCtl.cycle(spark, Seq(folding))
    assert(underStream.head.action === "skip-stream", underStream.toString)

    // quiesced (marker gone) → fold to epoch 0, serving unchanged
    assert(marker.delete())
    val folded = StoreCtl.cycle(spark, Seq(folding))
    assert(folded.head.action === "fold", folded.toString)
    assert(StoreCtl.lexEpochFragmentation(spark, lex) <= 1.0,
      "fold must collapse the epoch partitions")
    assert(lexRows(Retrieval.bm25TopKFromStore(spark, lex, q, "text",
      "doc_id", 10)) === expect, "serving changed across the epoch fold")
  }

  test("lexical geometry policy: opt-in, refuses under a stream marker, rebuckets to the docs-per-bucket prescription and settles") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").localCheckpoint()
    val lex = java.nio.file.Files.createTempDirectory("storectl-geom-")
      .toString + "/lex"
    // build tiny (2 buckets), then append the rest: the live doc count
    // now wants far more buckets at target 25 docs/bucket
    Retrieval.writeBm25Store(docs.filter(col("doc_id") % 5 === 0),
      "text", "doc_id", lex, nBuckets = 2, storeDocs = true)
    Retrieval.appendBm25Store(docs.filter(col("doc_id") % 5 =!= 0),
      "text", "doc_id", lex, epoch = 1L)
    val live = Retrieval.liveStats(spark, lex).head().getLong(0)
    val want = math.ceil(live / 25.0).toLong
    assert(want > 2L, s"fixture must want more than the built 2 buckets: $want")
    val q = docs.filter(col("doc_id") % 101 === 7).limit(3)
      .select("doc_id", "text")
    val expect = lexRows(
      Retrieval.bm25TopKFromStore(spark, lex, q, "text", "doc_id", 10))
    // no opt-in → geometry drift alone never rebuckets
    val noOptIn = StoreCtl.cycle(spark, Seq(StoreCtl.LexStore(lex)))
    assert(noOptIn.head.action === "noop", noOptIn.toString)
    // opted in but stream-adopted → refuse (rebucket folds epochs)
    val marker = new java.io.File(s"$lex/_graft_stream_id")
    java.nio.file.Files.writeString(marker.toPath, "some-stream")
    val pol = StoreCtl.LexStore(lex, foldEpochs = false,
      targetDocsPerBucket = 25.0, rebucketWhenBucketsOff = 1.5)
    val underStream = StoreCtl.cycle(spark, Seq(pol))
    assert(underStream.head.action === "skip-stream", underStream.toString)
    // quiesced → rebucket to the prescription; serving unchanged; the
    // raw-text sidecar traveled (vacuum) and still serves
    assert(marker.delete())
    val done = StoreCtl.cycle(spark, Seq(pol))
    assert(done.head.action === "rebucket", done.toString)
    assert(spark.read.parquet(s"$lex/epochs").select("n_buckets")
      .head().getInt(0).toLong === want)
    assert(lexRows(Retrieval.bm25TopKFromStore(spark, lex, q, "text",
      "doc_id", 10)) === expect, "serving changed across the rebucket")
    assert(Retrieval.hasDocsSidecar(spark, lex) &&
      Retrieval.readStoreDocs(spark, lex,
        docs.select("doc_id").limit(2)).count() == 2L)
    // settled: next cycle reports geometry ok
    val settled = StoreCtl.cycle(spark, Seq(pol))
    assert(settled.head.action === "noop" &&
      settled.head.detail.contains("geometry ok"), settled.toString)
  }

  test("vector geometry policy: opt-in, needs the sidecar, refuses under a stream marker, retrains to √N and settles") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val work = java.nio.file.Files.createTempDirectory("storectl-rc-").toString

    // a bare store (no sidecar): the policy reports the skip, never crashes
    val bare = s"$work/bare"
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, bare)
    val noSidecar = StoreCtl.cycle(spark,
      Seq(StoreCtl.VecStore(bare, recellWhenCellsOff = 2.0)))
    assert(noSidecar.head.action === "sweep" &&
      noSidecar.head.detail.contains("no raw-vector sidecar"), noSidecar.toString)

    // a sidecar store at 4 cells for 500 live vectors (√N wants 22):
    // stream-adopted → refuse; quiesced → retrain; second cycle settles
    val vec = s"$work/vec"
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, vec, storeVectors = true)
    val marker = new java.io.File(s"$vec/_graft_stream_id")
    java.nio.file.Files.writeString(marker.toPath, "some-stream")
    val spec = StoreCtl.VecStore(vec, recellWhenCellsOff = 2.0)
    val underStream = StoreCtl.cycle(spark, Seq(spec))
    assert(underStream.head.action === "skip-stream", underStream.toString)
    assert(marker.delete())
    // no opt-in → geometry drift alone never retrains
    val noOptIn = StoreCtl.cycle(spark, Seq(StoreCtl.VecStore(vec)))
    assert(noOptIn.head.action === "sweep" &&
      !noOptIn.head.detail.contains("geometry"), noOptIn.toString)
    val retrained = StoreCtl.cycle(spark, Seq(spec))
    assert(retrained.head.action === "recell", retrained.toString)
    val newCells = Quantize.loadQuantizers(spark, vec)._1.count()
    assert(newCells === Quantize.HighRecall.nCells(emb.count()).toLong,
      s"retrain must land on the √N prescription, got $newCells")
    // the retrained store serves (sidecar survived with the new geometry)
    val served = Quantize.searchSelfContainedRefinedStored(spark, vec,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5,
      newCells.toInt, 50)
    assert(served.count() === 15)
    // geometry now matches √N — the next cycle is a plain sweep again
    val settled = StoreCtl.cycle(spark, Seq(spec))
    assert(settled.head.action === "sweep" &&
      settled.head.detail.contains("geometry ok"), settled.toString)
  }

  test("daemon loop: maxCycles honored, injected sleeps jittered within 10%") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").limit(50).localCheckpoint()
    val lex = java.nio.file.Files.createTempDirectory("storectl-d-")
      .toString + "/lex"
    Retrieval.writeBm25Store(docs, "text", "doc_id", lex, nBuckets = 4)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = StoreCtl.runDaemon(spark, Seq(StoreCtl.LexStore(lex)),
      intervalMs = 60000L, maxCycles = 3,
      sleep = sleeps += _, log = logs += _)
    assert(n === 3L)
    assert(sleeps.size === 2, "no sleep after the final cycle")
    assert(sleeps.forall(s => s >= 54000L && s <= 66000L), sleeps.toString)
    assert(logs.size === 3 && logs.forall(_.contains("noop")), logs.toString)
    intercept[IllegalArgumentException] {
      StoreCtl.runDaemon(spark, Seq.empty, 1000L, 1)
    }
    // CLI spec grammar round-trips — options peel off the RIGHT so
    // URI-schemed paths (colons and all) stay intact
    assert(StoreCtl.parseSpec("lex:/p:fold:3.5") ===
      StoreCtl.LexStore("/p", foldEpochs = true, 3.5))
    assert(StoreCtl.parseSpec("vec:/p:0.2:6") ===
      StoreCtl.VecStore("/p", 0.2, 6.0))
    assert(StoreCtl.parseSpec("vec:/p:0.2:6:2.5") ===
      StoreCtl.VecStore("/p", 0.2, 6.0, 2.5))
    assert(StoreCtl.parseSpec("vec:s3a://bucket/store") ===
      StoreCtl.VecStore("s3a://bucket/store"))
    assert(StoreCtl.parseSpec("vec:hdfs://nn:8020/store:0.2") ===
      StoreCtl.VecStore("hdfs://nn:8020/store", 0.2))
    assert(StoreCtl.parseSpec("lex:hdfs://nn:8020/lex:fold") ===
      StoreCtl.LexStore("hdfs://nn:8020/lex", foldEpochs = true))
    assert(StoreCtl.parseSpec("lex:/p:fold:8:1024:2") ===
      StoreCtl.LexStore("/p", foldEpochs = true, 8.0, 1024.0, 2.0))
    assert(StoreCtl.parseSpec("lex:/p:fold:8:1024") === // drift defaults to 2
      StoreCtl.LexStore("/p", foldEpochs = true, 8.0, 1024.0, 2.0))
    assert(StoreCtl.parseSpec("lex:/p:geom:1024") === // geometry sans folding
      StoreCtl.LexStore("/p", targetDocsPerBucket = 1024.0,
        rebucketWhenBucketsOff = 2.0))
    assert(StoreCtl.parseSpec("lex:/p:geom:1024:3") ===
      StoreCtl.LexStore("/p", targetDocsPerBucket = 1024.0,
        rebucketWhenBucketsOff = 3.0))
    // drift thresholds are FACTORS: off >= 1 always, so a sub-1 value
    // would rebucket/recell every cycle forever — refused at construction
    intercept[IllegalArgumentException] {
      StoreCtl.LexStore("/p", targetDocsPerBucket = 10.0,
        rebucketWhenBucketsOff = 0.5)
    }
    intercept[IllegalArgumentException] {
      StoreCtl.VecStore("/p", recellWhenCellsOff = 0.5)
    }
    intercept[IllegalArgumentException] { StoreCtl.parseSpec("zzz:/p") }
  }

  test("cycle survives a store needing manual recovery: an ERROR report with the actionable message, siblings still maintained") {
    import spark.implicits._
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val cents = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val work = java.nio.file.Files.createTempDirectory("storectl-err-").toString
    val (bad, good) = (s"$work/bad", s"$work/good")
    for (p <- Seq(bad, good))
      Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
        residual = false, p, storeVectors = true)
    // a crashed split's manifest: every mutating maintenance op refuses
    // with "run recoverCellSplit" — the daemon must turn that into a
    // per-store ERROR report, not die and stop maintaining `good`
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$bad.split-manifest"),
      """{"old":[0],"newFrom":4,"newWays":2,"vepoch":7}""")
    Quantize.addTombstones(spark, bad, Seq(5L).toDF("vec_id"), "vec_id")
    Quantize.addTombstones(spark, good, Seq(5L).toDF("vec_id"), "vec_id")
    val reports = StoreCtl.cycle(spark,
      Seq(StoreCtl.VecStore(bad, 0.0001), StoreCtl.VecStore(good, 0.0001)))
    assert(reports.head.action === "error" &&
      reports.head.detail.contains("recoverCellSplit"), reports.toString)
    assert(reports(1).action === "sweep" &&
      reports(1).detail.contains("1 cells swept"), reports.toString)
    // recovery unblocks the next cycle
    assert(Quantize.recoverCellSplit(spark, bad))
    val healed = StoreCtl.cycle(spark, Seq(StoreCtl.VecStore(bad, 0.0001)))
    assert(healed.head.action === "sweep", healed.toString)
  }

  test("query-drift policy: displacement over the live query mix raises the persisted serving hints; in-distribution mixes are a no-op; the deepening caps at the cell count") {
    import spark.implicits._
    val dims = 16
    // 24 deterministic cluster centers in R16, 15 members each — enough
    // cells that the auto probe budget (floor 8) starts PARTIAL
    def center(i: Int): Seq[Float] =
      (0 until dims).map(d => math.sin(i * 37.0 + d * 13.0).toFloat)
    val corpus = (0 until 24).flatMap { i =>
      (0 until 15).map { j =>
        (i * 1000L + j,
          center(i).zipWithIndex.map { case (x, d) =>
            x + 0.05f * (((i * 131 + j * 17 + d * 7) % 11) - 5) / 5f })
      }
    }.toDF("vec_id", "embedding").localCheckpoint()
    val work = java.nio.file.Files.createTempDirectory("storectl-adapt-").toString
    val store = s"$work/store"
    val (tc, tcb) = Quantize.trainIvfPq(corpus, "vec_id", "embedding",
      dims, 24, 4, 8, coarseMaxIter = 5, pqMaxIter = 3)
    Quantize.buildSelfContained(spark, corpus, "vec_id", "embedding",
      tc, "centroid_id", "cen_emb", tcb, "code", "c_emb",
      dims, 4, residual = true, store, storeVectors = true)
    // IN-distribution queries: perturbed members. DRIFTED queries: the
    // same members plus a large component the quantizers never trained
    // on (constant offset across dims) — residuals leave the codebook's
    // space, so ADC ordering degrades while exact ordering is fine.
    val qIn = corpus.filter(col("vec_id") % 1000 === 3)
      .limit(6).select((col("vec_id") + 500000L).as("vec_id"),
        expr("transform(embedding, x -> CAST(x + CAST(0.01 AS FLOAT) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    val qOut = qIn.select(col("vec_id"),
        expr("transform(embedding, (x, d) -> CAST(x + CAST(1.5 AS FLOAT) * CAST(CASE WHEN d % 2 = 0 THEN 1.0 ELSE -1.0 END AS FLOAT) AS FLOAT))").as("embedding"))
      .localCheckpoint()
    qIn.write.parquet(s"$work/qin"); qOut.write.parquet(s"$work/qout")
    val np0 = Quantize.HighRecall.nProbe(24)
    val dep0 = Quantize.HighRecall.rerankDepth(5)
    val dispIn = Quantize.rankDisplacement(spark, store, qIn,
      "vec_id", "embedding", 5, np0, dep0)
    val dispOut = Quantize.rankDisplacement(spark, store, qOut,
      "vec_id", "embedding", 5, np0, dep0)
    assert(dispOut > dispIn,
      f"fixture: drifted queries must displace more ($dispIn%.3f vs $dispOut%.3f)")
    val mid = (dispIn + dispOut) / 2
    // in-distribution mix: measured, no action, no hints written
    val ok = StoreCtl.cycle(spark, Seq(StoreCtl.VecStore(store,
      adaptQueries = Some(s"$work/qin"), maxDisplacement = mid, adaptK = 5)))
    assert(ok.head.detail.contains("query-drift ok"), ok.toString)
    assert(Quantize.servingHints(spark, store).isEmpty)
    // drifted mix: the cycle raises the hints; `auto` budgets see them
    val spec = StoreCtl.VecStore(store,
      adaptQueries = Some(s"$work/qout"), maxDisplacement = mid, adaptK = 5)
    val adapted = StoreCtl.cycle(spark, Seq(spec))
    assert(adapted.head.action === "adapt" &&
      adapted.head.detail.contains("serving hints raised"), adapted.toString)
    val hints = Quantize.servingHints(spark, store)
    assert(hints.exists(h => h._1 > np0 && h._2 > dep0), hints.toString)
    // deepening raises recall for the drifted mix (monotone in budget):
    // exact truth = brute-force L2 top-5 over the corpus
    def recallAt(np: Int, dep: Int): Double = {
      val got = Quantize.searchSelfContainedRefinedStored(spark, store,
          qOut, "vec_id", "embedding", 5, np, dep)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
      val truth = corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("cv"))
        .crossJoin(broadcast(qOut.select(col("vec_id").as("query_id"),
          col("embedding").as("qv"))))
        .withColumn("d2", expr(
          """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
            |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
        .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rank") <= 5)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val (np1, dep1) = hints.get
    assert(recallAt(np1, dep1) >= recallAt(np0, dep0),
      "a deeper budget must not lose recall on the drifted mix")
    // repeated cycles keep deepening until nProbe spans every cell, then
    // report the cap honestly instead of writing useless hints
    var last = adapted.head
    var guard = 0
    while (!last.detail.contains("cannot deepen") && guard < 6) {
      last = StoreCtl.cycle(spark, Seq(spec)).head
      guard += 1
    }
    assert(last.detail.contains("cannot deepen") &&
      last.detail.contains("recell"), last.toString)
    assert(Quantize.servingHints(spark, store).exists(_._1 == 24))
    // a recell clears the hints with the rest of the quantizer state
    Quantize.recellIvfPqStoreFromSidecar(spark, store, nCells = 24,
      nCodes = 8, retrainCodebook = true, coarseMaxIter = 3, pqMaxIter = 2)
    assert(Quantize.servingHints(spark, store).isEmpty,
      "a recell must reset the serving hints (fresh geometry, fresh question)")
  }

  test("fielded BM25F store under the scheduler: compact on tombstones, rebucket-on-drift through the bm25f entry point, served ranking equals the one-shot at every state") {
    import spark.implicits._
    def fieldedRows(n: Int, from: Int = 1) = (from until from + n).map(i =>
      (i.toLong, s"alpha t$i common", s"beta body$i word${i % 5} gamma" +
        (if (i % 3 == 0) " alpha" else "")))
      .toDF("doc_id", "title", "body")
    val work = java.nio.file.Files.createTempDirectory("storectl-bm25f-").toString
    val store = s"$work/fstore"
    val fields = Seq(Retrieval.Bm25fField("title", 2.0, 0.5),
      Retrieval.Bm25fField("body", 1.0, 0.75))
    val q = Seq((900L, "alpha common gamma")).toDF("doc_id", "text")
    def served() = lexRows(Retrieval.bm25fTopKFromStore(spark, store,
      fields, q, "text", "doc_id", 15))
    def oneShot(corpus: org.apache.spark.sql.DataFrame) = lexRows(
      Retrieval.bm25fTopK(corpus,
        Seq(Retrieval.Bm25Field("title", 2.0, 0.5),
          Retrieval.Bm25Field("body", 1.0, 0.75)),
        "doc_id", q, "text", 15))

    val base = fieldedRows(24)
    Retrieval.writeBm25fStore(base, Seq("title", "body"), "doc_id", store,
      nBuckets = 4)
    assert(Retrieval.isFieldedStore(spark, store))
    // geometry policy ON: ~6 docs/bucket target, drift factor 2×
    val spec = StoreCtl.LexStore(store, targetDocsPerBucket = 6.0,
      rebucketWhenBucketsOff = 2.0)
    assert(StoreCtl.cycle(spark, Seq(spec)).head.action == "noop")

    // grow 4× past the build geometry → the cycle must rebucket via the
    // FIELDED entry point (the unfielded one refuses fielded layouts)
    Retrieval.appendBm25fStore(fieldedRows(72, from = 25), "doc_id", store,
      epoch = 1L)
    val grown = base.unionByName(fieldedRows(72, from = 25))
    assert(served() == oneShot(grown), "served must equal one-shot after append")
    val r1 = StoreCtl.cycle(spark, Seq(spec)).head
    assert(r1.action == "rebucket", r1.toString)
    assert(Retrieval.isFieldedStore(spark, store),
      "rebucket must preserve the fielded layout")
    assert(Retrieval.liveStatsAndBuckets(spark, store)._4 == 16,
      "96 docs at 6/bucket → 16 buckets")
    assert(served() == oneShot(grown), "served must equal one-shot after rebucket")

    // retract → the next cycle compacts the fielded store; answers equal
    // the one-shot over survivors before AND after
    val doomed = (1L to 96L).filter(_ % 4 == 2)
    assert(Retrieval.deleteFromBm25fStore(spark, store,
      doomed.toDF("doc_id"), epoch = 2L) == doomed.size)
    val live = grown.filter(!col("doc_id").isInCollection(doomed))
    assert(served() == oneShot(live), "served must equal one-shot after delete")
    val r2 = StoreCtl.cycle(spark, Seq(spec)).head
    assert(r2.action == "compact", r2.toString)
    assert(Retrieval.readBm25Tombstones(spark, store).count() == 0)
    assert(served() == oneShot(live), "served must equal one-shot after compact")
  }
}
