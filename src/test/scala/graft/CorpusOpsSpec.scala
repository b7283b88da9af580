package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Round-8 corpus-curation operators beyond the oracle hash-gate:
  * Bloom-prefiltered decontamination (prefilter invisible to results, and
  * it actually bites), Misra–Gries heavy hitters (eviction, guarantee,
  * fallback), priority sampling (exact priorities + HT threshold), and
  * the sharded training order (reproducible, contiguous, epoch-distinct).
  */
class CorpusOpsSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private val BMOD = 29
  private val BREM = 3

  test("contaminationBloom is byte-identical to contamination across shingle lengths and floors") {
    val bench = docs.filter(col("doc_id") % BMOD === BREM)
    val corpus = docs.filter(col("doc_id") % BMOD =!= BREM)
    for ((n, minShared) <- Seq((3, 1L), (4, 1L), (3, 2L))) {
      val exact = TextAnalysis.contamination(corpus, bench, "text", "doc_id", n, minShared)
        .orderBy("doc_id", "bench_id").collect().toSeq
      val bloom = TextAnalysis.contaminationBloom(corpus, bench, "text", "doc_id", n, minShared)
        .orderBy("doc_id", "bench_id").collect().toSeq
      assert(bloom == exact,
        s"n=$n minShared=$minShared: bloom variant diverged (${bloom.size} vs ${exact.size} rows)")
    }
  }

  test("contaminationBloom: the prefilter bites — a disjoint-vocabulary benchmark yields zero survivors and an empty result") {
    import spark.implicits._
    // benchmark vocabulary shares no token with the corpus → no true
    // overlap; the Bloom may pass a stray false positive but the confirm
    // join must kill it, and with tiny bench the filter drops ~everything
    val bench = Seq((900001L, "zzq qqz zqz qzq zzq qqz zqz qzq"))
      .toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % BMOD =!= BREM)
    val out = TextAnalysis.contaminationBloom(corpus, bench, "text", "doc_id", 3, 1L)
    assert(out.count() == 0, "disjoint benchmark must contaminate nothing")
  }

  test("contaminationBloom plan: Bloom test is a scan-side filter (shiftright on the word array) feeding a broadcast join; no cartesian product") {
    val bench = docs.filter(col("doc_id") % BMOD === BREM)
    val corpus = docs.filter(col("doc_id") % BMOD =!= BREM)
    val plan = TextAnalysis.contaminationBloom(corpus, bench, "text", "doc_id", 4, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("shiftright"), "Bloom membership test missing from the plan")
    assert(plan.contains("BroadcastHashJoin"), "confirm join must broadcast the benchmark side")
    assert(!plan.contains("CartesianProduct"), "no cartesian product allowed")
    // the corpus's shingle volume must meet the Bloom test BEFORE any join:
    // the filter appears in the same (pre-exchange) stage as the generate
    val beforeJoin = plan.substring(plan.indexOf("BroadcastHashJoin"))
    assert(beforeJoin.contains("shiftright"),
      "Bloom filter must sit under the join (scan side), not above it")
  }

  test("streaming decontamination: verdict log equals the one-shot batch result; retries replace their own verdicts; foreign checkpoint refused") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingDecontaminate
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val bench = docs.filter(col("doc_id") % BMOD === BREM)
    val corpus = docs.filter(col("doc_id") % BMOD =!= BREM)
    val side = TextAnalysis.bloomBuild(bench, "text", "doc_id", 3)
    val rows = corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dir = java.nio.file.Files.createTempDirectory("sdecon").toString
    val mem = MemoryStream[(Long, String)]
    val slices = rows.grouped(200).toSeq
    val q = StreamingDecontaminate.start(
      mem.toDF().toDF("doc_id", "text"), "text", "doc_id", side,
      shingleN = 3, minShared = 1L, s"$dir/out", s"$dir/ckpt")
    try {
      slices.foreach { g => mem.addData(g.toSeq: _*); q.processAllAvailable() }
    } finally q.stop()
    def streamed = StreamingDecontaminate.verdicts(spark, s"$dir/out")
      .collect().map(_.toString).toSet
    val oneShot = TextAnalysis.contaminationBloom(corpus, bench,
      "text", "doc_id", 3, 1L).collect().map(_.toString).toSet
    assert(streamed.nonEmpty && streamed == oneShot,
      "batch boundaries must be invisible: streamed verdicts == one-shot")
    val before = spark.read.parquet(s"$dir/out").count()
    val last = slices.last.toSeq.toDF("doc_id", "text")
    StreamingDecontaminate.processBatch(last, (slices.size - 1).toLong,
      "text", "doc_id", side, 3, 1L, s"$dir/out", s"$dir/ckpt")
    assert(spark.read.parquet(s"$dir/out").count() == before && streamed == oneShot,
      "retried batch must replace its verdict partition, answers unchanged")
    val ex = intercept[IllegalArgumentException] {
      StreamingDecontaminate.processBatch(last, 0L,
        "text", "doc_id", side, 3, 1L, s"$dir/out", s"$dir/other")
    }
    assert(ex.getMessage.contains("belongs to stream checkpoint"), ex.getMessage)
  }

  test("misraGries heavy hitters: exact top-k on a skewed corpus where eviction definitely fires") {
    import spark.implicits._
    // 1 partition, capacity 4, vocabulary 50: MG must evict constantly but
    // keep the two runaway heavy tokens; the exact confirm then recounts.
    val words = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      (0 until 50).flatMap(i => Seq.fill(6)(s"w$i"))
    val text = new scala.util.Random(7).shuffle(words).mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text").repartition(1)
    val got = TextAnalysis.heavyHitters(d, "text", k = 2, capacity = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("alpha", 400L), ("beta", 300L)),
      s"top-2 must be the exact heavy pair: $got")
  }

  test("misraGries heavy hitters: uniform corpus under a failing guarantee falls back to the exact census (answer still exact)") {
    import spark.implicits._
    // 60 tokens uniform over 30 words, capacity 5 → kth*cap <= N, the
    // guarantee is unprovable; the fallback must return the true top-k
    val text = (0 until 30).map(i => s"u$i u$i").mkString(" ")
    val d = Seq((1L, text)).toDF("doc_id", "text").repartition(1)
    val got = TextAnalysis.heavyHitters(d, "text", k = 3, capacity = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = (0 until 30).map(i => (s"u$i", 2L)).sortBy(_._1).take(3)
    assert(got == expect, s"fallback must yield the exact (tie-broken) top-k: $got")
  }

  test("prioritySample: equals the top-n of independently computed priorities, with the HT threshold right") {
    val n = 25
    val rows = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference: the same u=(h+1)/(P+1), q=w/u arithmetic in plain Scala
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % graft.functions.TextExprs.P)
    val pri = rows.map { case (id, w) =>
      val h = polyHash(s"ps$id")
      (id, w, w.toDouble / ((h + 1).toDouble / (graft.functions.TextExprs.P + 1).toDouble))
    }.sortBy { case (id, _, q) => (-q, id) }
    val tau = pri(n)._3 // (n+1)-th priority
    val expect = pri.take(n).map { case (id, w, q) =>
      (id, w, math.rint(q * 1e6) / 1e6, math.rint(math.max(w.toDouble, tau) * 1e6) / 1e6)
    }
    val got = TextAnalysis.prioritySample(docs, "doc_id", "n_chars", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got.map(t => (t._1, t._2)) == expect.map(t => (t._1, t._2)).toSeq,
      "sample membership/order must match the reference top-n")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-6 && math.abs(g._4 - e._4) < 1e-6,
        s"priority/est_weight mismatch: $g vs $e")
    }
  }

  test("prioritySample: corpus smaller than n keeps every row; zero/negative weights are excluded, not silently ranked") {
    import spark.implicits._
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_chars")
    val out = TextAnalysis.prioritySample(tiny, "doc_id", "n_chars", n = 10)
    assert(out.count() == 3, "undersized corpus must be kept whole")
    // DLT priorities are only defined for w > 0 — a zero weight must not
    // occupy a sample slot and a negative one must not invert the order
    val mixed = Seq((1L, 10L), (2L, 0L), (3L, -5L), (4L, 20L)).toDF("doc_id", "n_chars")
    val kept = TextAnalysis.prioritySample(mixed, "doc_id", "n_chars", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"non-positive weights must be excluded: $kept")
  }

  test("curation v4 composition: every stage bites at sf0.001") {
    val out = graft.SparkEntry.queries("qx94_curation_v4")(spark, sfDir)
      .collect()
    val corpus = docs.filter(col("doc_id") % BMOD =!= BREM)
    val contaminated = TextAnalysis.contaminationBloom(corpus,
        docs.filter(col("doc_id") % BMOD === BREM), "text", "doc_id", 4, 1L)
      .select("doc_id").distinct().count()
    assert(contaminated > 0, "stage 1 must bite: some docs are contaminated")
    val clean = corpus.count() - contaminated
    assert(out.length == 150 && out.length < clean,
      s"stage 2 must bite: sample (${out.length}) below the clean corpus ($clean)")
    val shards = out.map(_.getInt(1)).toSet
    assert(shards == Set(0, 1, 2, 3), s"stage 3 must spread across shards: $shards")
    // the sampled ids exclude every contaminated doc
    val sampledIds = out.map(_.getLong(3)).toSet
    val contaminatedIds = TextAnalysis.contaminationBloom(corpus,
        docs.filter(col("doc_id") % BMOD === BREM), "text", "doc_id", 4, 1L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(sampledIds.intersect(contaminatedIds).isEmpty,
      "no contaminated doc may survive into the training order")
  }

  test("bpeTokenCounts: contraction/digit/punctuation piece classes split as the pattern promises") {
    import spark.implicits._
    val d = Seq(
      (1L, "it's 42 red-cars!!"), // contraction + digits + punct runs
      (2L, "plain words only"),   // degenerate: pieces == words
      (3L, "")                    // empty: zero pieces, hash of empty = 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTokenCounts(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    // "it" "'s" " 42" " red" "-" "cars" "!!" → 7 pieces vs 5 ws tokens
    assert(out(0).getLong(1) == 5 && out(0).getLong(2) == 7,
      s"piece split wrong: ${out(0)}")
    assert(out(1).getLong(1) == 3 && out(1).getLong(2) == 3,
      s"letters-only text must have pieces == words: ${out(1)}")
    assert(out(2).getLong(2) == 0 && out(2).getLong(3) == 0,
      s"empty text must yield zero pieces and the guarded empty hash: ${out(2)}")
  }

  test("qualityRegression: perfect linear corpus fits exactly, an injected violator tops the residual report, collinear features hit the singular guard") {
    import spark.implicits._
    // docs of a_i stopwords ("the", len 3) + b_i fillers ("zz", len 2):
    // y = a = x2 - 2*x1 EXACTLY, and (a, b) vary independently → the
    // normal equations have a unique solution and every residual is 0
    def doc(a: Int, b: Int) = (Seq.fill(a)("the") ++ Seq.fill(b)("zz")).mkString(" ")
    val base = Seq((1L, doc(2, 5)), (2L, doc(4, 1)), (3L, doc(1, 8)),
      (4L, doc(6, 3)), (5L, doc(3, 3)))
    val fit = TextAnalysis.qualityRegression(base.toDF("doc_id", "text"),
      "text", "doc_id", topK = 10).collect()
    assert(fit.length == 5 && fit.forall(r => r.getDouble(3) == 0.0),
      s"exact linear corpus must fit with zero residuals: ${fit.mkString(",")}")
    assert(fit.forall(r => r.getDouble(2) == r.getLong(1).toDouble),
      "y_hat must reproduce y exactly on the perfect fit")
    // one violator: same length stats as doc(4,1) built from non-stop
    // words — its y breaks the plane, so it must top the |residual| list
    val outlier = (99L, (Seq.fill(4)("zzz") ++ Seq.fill(1)("zz")).mkString(" "))
    val withOut = TextAnalysis.qualityRegression((base :+ outlier)
      .toDF("doc_id", "text"), "text", "doc_id", topK = 10).collect()
    assert(withOut.head.getLong(0) == 99L &&
      math.abs(withOut.head.getDouble(3)) > 0.5,
      s"the violator must lead the residual report: ${withOut.mkString(",")}")
    // collinear corpus (single word type → x2 = 3*x1, y = x1): det = 0,
    // the guard must yield NULL coefficients, never Inf/NaN or a crash
    val collinear = Seq((1L, doc(2, 0)), (2L, doc(5, 0)), (3L, doc(9, 0)))
    val sing = TextAnalysis.qualityRegression(collinear.toDF("doc_id", "text"),
      "text", "doc_id", topK = 10).collect()
    assert(sing.forall(r => r.isNullAt(2) && r.isNullAt(3)),
      s"singular normal matrix must yield NULL fits: ${sing.mkString(",")}")
  }

  test("embeddingDrift: self-drift is exactly zero; an injected single-dim shift leads the mover report") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val self = Similarity.embeddingDrift(emb, emb, "embedding", 5).collect()
    assert(self.forall(_.getDouble(5) == 0.0),
      s"identical snapshots must report zero shift: ${self.mkString(",")}")
    // shift dim 7 by +3.0 in snapshot B only — it must top the report
    val shifted = emb.withColumn("embedding", expr(
      "transform(embedding, (v, i) -> CASE WHEN i = 6 THEN CAST(v + 3.0 AS FLOAT) ELSE v END)"))
    val top = Similarity.embeddingDrift(emb, shifted, "embedding", 3).collect()
    assert(top.head.getLong(0) == 7L && top.head.getDouble(5) > 1.0,
      s"the injected dim-7 shift must lead: ${top.mkString(",")}")
  }

  test("containmentPairs: full containment found at Jaccard too low for symmetric near-dup; boilerplate shingles create no pairs") {
    import spark.implicits._
    import graft.operators.Dedup
    // a 6-token quote embedded verbatim in a 40-token host: containment
    // = 1.0 while Jaccard ≈ 4/38 ≈ 0.1 — the banding regime never fires
    val quote = "alpha beta gamma delta epsilon zeta"
    val host = ("one two three four five six seven eight nine ten " +
      quote + " eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty twentyone twentytwo")
    val d = Seq((1L, quote), (2L, host), (3L, "unrelated words entirely distinct tokens here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(d, "text", "doc_id", 3, 0.5, maxDf = 8)
      .collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L
      && pairs.head.getDouble(5) == 1.0,
      s"the embedded quote must surface at containment 1.0: ${pairs.mkString(",")}")
    // boilerplate: ten docs share ONE trigram (df=10 > maxDf=8) and are
    // otherwise disjoint — the cut must leave zero candidate pairs
    val boiler = (0 until 10).map(i =>
      (100L + i, s"copyright footer text plus unique$i filler$i own$i words$i"))
    val none = Dedup.containmentPairs(boiler.toDF("doc_id", "text"),
      "text", "doc_id", 3, 0.1, maxDf = 8).count()
    assert(none == 0, "df > maxDf shingles must be cut before the self-join")
  }

  test("shardOrder: positions contiguous per (epoch, shard), each epoch a full permutation, epochs differ, re-runs agree") {
    val out = TextAnalysis.shardOrder(docs, "doc_id", nShards = 4, nEpochs = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val nDocs = docs.count()
    assert(out.length == 2 * nDocs, "every doc appears once per epoch")
    // contiguous 1..count positions inside every (epoch, shard)
    out.groupBy(t => (t._1, t._2)).foreach { case (k, rows) =>
      val pos = rows.map(_._3).sorted.toSeq
      assert(pos == (1L to rows.length).toSeq, s"positions not contiguous in $k")
    }
    // epochs must order docs differently (epoch-salted hash)
    val e0 = out.filter(_._1 == 0).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    val e1 = out.filter(_._1 == 1).sortBy(t => (t._2, t._3)).map(_._4).toSeq
    assert(e0 != e1, "epochs must yield different permutations")
    assert(e0.toSet == e1.toSet, "both epochs must cover the same docs")
    // determinism across plans
    val again = TextAnalysis.shardOrder(docs, "doc_id", nShards = 4, nEpochs = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(again.sameElements(out), "shardOrder must be bit-reproducible")
  }
}
