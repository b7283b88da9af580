package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Round-2 pipeline operators: deterministic splits, embedding near-dup,
  * IVF ANN — contract properties beyond the oracle hash-gate. */
class PipelineOpsSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("mixtureAlpha: alpha=1 is natural proportions, alpha=0 uniform, alpha=0.5 up-weights small domains; budget never exceeded") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 3 domains with 8:2:1 sizes — skewed enough that temperature bites
    val docs = (Seq.fill(800)("a") ++ Seq.fill(200)("b") ++ Seq.fill(100)("c"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }.toDF("doc_id", "source")
    def plan(alpha: Double) = TextAnalysis
      .mixtureAlpha(docs, "source", alpha, budget = 10000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    val nat = plan(1.0)
    assert(math.abs(nat("a")._2 - 800.0 / 1100) < 1e-6, s"alpha=1 must be proportional: $nat")
    val uni = plan(0.0)
    assert(Seq("a", "b", "c").forall(d => math.abs(uni(d)._2 - 1.0 / 3) < 1e-6),
      s"alpha=0 must be uniform: $uni")
    val sqrtP = plan(0.5)
    assert(sqrtP("c")._2 > nat("c")._2 && sqrtP("a")._2 < nat("a")._2,
      s"alpha=0.5 must up-weight the small domain: $sqrtP vs $nat")
    // floor'd allocations can never overshoot the budget; epochs > 1
    // flags repetition exactly when planned exceeds the domain's docs
    Seq(nat, uni, sqrtP).foreach { p =>
      assert(p.values.map(_._3).sum <= 10000L)
      p.values.foreach { case (n, _, planned, epochs) =>
        assert((epochs > 1.0) == (planned > n))
      }
    }
    assert(uni("c")._4 > 1.0, "uniform over 8:2:1 must repeat the smallest domain")
  }

  test("deterministicSplit: total partition, stable across runs and corpus growth") {
    val s1 = TextAnalysis.deterministicSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // total: every doc gets exactly one of the three labels
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
    // rerun → identical assignment (hash, not random)
    val s2 = TextAnalysis.deterministicSplit(docs, "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 === s2)
    // subset invariance: assignments computed on half the corpus agree —
    // a doc's split never changes when other docs arrive
    val half = TextAnalysis.deterministicSplit(docs.filter(col("doc_id") % 2 === 0), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    half.foreach { case (id, sp) => assert(s1(id) === sp) }
    // fractions land near 80/10/10 (hash-uniform, small-N tolerance)
    val frac = s1.values.groupBy(identity).view.mapValues(_.size.toDouble / s1.size).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95)
  }

  test("invalid split percentages are rejected") {
    intercept[IllegalArgumentException] {
      TextAnalysis.deterministicSplit(docs, "doc_id", trainPct = 95, valPct = 10)
    }
  }

  test("embeddingNearDups: pairs unique, above threshold, keep<drop") {
    val out = Similarity.embeddingNearDups(emb, "vec_id", "embedding", 4, 0.2).collect()
    assert(out.nonEmpty) // threshold low enough to produce candidates
    val pairs = out.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.distinct.length === pairs.length)
    out.foreach { r =>
      assert(r.getAs[Double]("cosine") >= 0.2)
      assert(r.getAs[Long]("keep_id") < r.getAs[Long]("drop_id"))
    }
  }

  test("rangeJoin equals the naive range-predicate join, regardless of binSize") {
    import spark.implicits._
    val points = Seq((1L, 5L), (1L, 100L), (1L, 7200L), (2L, 50L), (3L, 10L))
      .toDF("k", "p")
    // includes an INVERTED interval (end < start): must match nothing and
    // must not explode into a backwards bin sequence
    val intervals = Seq((1L, 0L, 10L), (1L, 90L, 7300L), (2L, 60L, 70L), (4L, 0L, 100L),
      (1L, 5000L, 40L))
      .toDF("k", "s", "e")
    val naive = points.as("p").join(intervals.as("i"),
        col("p.k") === col("i.k") && col("p") >= col("s") && col("p") <= col("e"))
      .select(col("p.k"), col("p"), col("s"), col("e"))
      .collect().map(_.toSeq).sortBy(_.toString)
    for (bin <- Seq(1L, 7L, 1000L, 100000L)) {
      val binned = graft.operators.Relational.rangeJoin(
          points, intervals, "k", "p", "s", "e", bin)
        .select(col("k"), col("p"), col("s"), col("e"))
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(binned === naive, s"binSize=$bin")
    }
  }

  test("asofJoinForward picks the earliest right value at-or-after, null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"), (3L, 1L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 30L, 300L), (2L, 3L, 400L))
      .toDF("k", "t", "v")
    val out = graft.operators.Relational.asofJoinForward(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[Any]("asof_v")))).toMap
    assert(out("a") === Some(100L)) // inclusive: right at t=10 matches left t=10
    assert(out("b") === Some(300L)) // next at-or-after 25 is 30
    assert(out("c") === None)       // only right is at t=3 < 5 → nothing ahead
    assert(out("d") === None)       // no right rows for key 3
  }

  test("ivfKnn: neighbors come from the query's cell, ranks are dense from 1") {
    val centroids = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding",
      centroids, "centroid_id", "c_emb")
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vector lands in exactly one of the 4 cells
    assert(assigned.values.toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    val out = Similarity.ivfKnn(emb.filter(col("vec_id") < 5), emb,
      "vec_id", "embedding", centroids, "centroid_id", "c_emb", k = 3).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      // cell-restricted: each neighbor shares the query's assignment
      rows.foreach { r =>
        assert(assigned(r.getAs[Long]("neighbor_id")) === assigned(q))
        assert(r.getAs[Long]("neighbor_id") !== q)
      }
      // dense ranks 1..n, cosine non-increasing
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
      val cos = byRank.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // centroid seeds are themselves members of their own cell
    (0L until 4L).foreach(c => assert(assigned(c) === c))
  }

  test("ivfKnnJoin: full-probe equals brute force; invariants at partial probe; large query side accepted") {
    val nCells = 4
    val centroids = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    // nProbe = nCells → every (cell-mate) pair is a candidate for every
    // probe, i.e. ALL pairs are candidates → ranking must equal brute force
    val full = Similarity.ivfKnnJoin(emb, emb, "vec_id", "embedding",
        centroids, "centroid_id", "c_emb", k = 3, nProbe = nCells)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceKnn(emb, emb, "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full === brute, "nProbe = nCells must reproduce the exact ranking")
    // partial probe: EVERY vector is a query (no small-side gate), ranks
    // dense from 1, probe_rank within budget, neighbors from probed cells,
    // (query, neighbor) pairs unique
    val nProbe = 2
    val out = Similarity.ivfKnnJoin(emb, emb, "vec_id", "embedding",
      centroids, "centroid_id", "c_emb", k = 3, nProbe = nProbe).collect()
    val nVecs = emb.count()
    assert(out.map(_.getAs[Long]("query_id")).distinct.length.toLong === nVecs,
      "every corpus vector must appear as a query")
    val pairs = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(pairs.distinct.length === pairs.length, "a pair must surface via exactly one probed cell")
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq === (1L to rows.length).toSeq)
      val cos = byRank.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
      rows.foreach { r =>
        assert(r.getAs[Long]("probe_rank") >= 1L && r.getAs[Long]("probe_rank") <= nProbe)
        assert(r.getAs[Long]("neighbor_id") !== q)
      }
    }
    // scale-shape pin: no CartesianProduct — the probe assignment is a
    // map-side expression over the single-row centroid array, not an
    // unkeyed pair enumeration
    val plan = Similarity.ivfKnnJoin(emb, emb, "vec_id", "embedding",
      centroids, "centroid_id", "c_emb", k = 3, nProbe = nProbe)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("ivfKnnJoin: when cells align with clusters, nProbe=1 recovers the COMPLETE graph") {
    import spark.implicits._
    // 4 well-separated clusters on orthogonal axes of R^8: member m of
    // cluster c points along axis 2c with a small fixed tilt into axis
    // 2c+1 — within-cluster cosines ≈ 1, cross-cluster ≈ 0, so every true
    // neighbor is a cluster-mate and ONE probe of an aligned grid must
    // find the exact brute-force graph (this is the semantic the clustered
    // RECALL.md section measures at corpus scale; here it is a hard gate).
    val dims = 8
    val vecs = for (c <- 0 until 4; m <- 0 until 6) yield {
      val v = Array.fill(dims)(0.0f)
      v(2 * c) = 1.0f
      v(2 * c + 1) = 0.05f * (m + 1)
      (c * 6L + m, v)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cents = df.filter(col("vec_id") % 6 === 0) // one seed per cluster
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
    def edges(got: org.apache.spark.sql.DataFrame) =
      got.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneProbe = edges(Similarity.ivfKnnJoin(df, df, "vec_id", "embedding",
      cents, "centroid_id", "c_emb", k = 3, nProbe = 1))
    val brute = edges(Similarity.bruteForceKnn(df, df, "vec_id", "embedding", k = 3))
    assert(oneProbe === brute,
      "aligned cells must make the single-probe graph exactly the brute-force graph")
  }
}
