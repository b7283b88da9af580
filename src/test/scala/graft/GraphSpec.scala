package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Connected components: validated against a local union-find on seeded
  * random graphs, plus the worst-case-diameter shape (a long path) under a
  * tight round budget to prove the pointer-jumping O(log n) bound holds. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: classic union-find with path compression. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize to min id per component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min; members.map(_ -> m)
    }.toMap
  }

  private def ccMap(edges: Seq[(Long, Long)], maxIter: Int = 25): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"), "a", "b", maxIter)
      .as[(Long, Long)].collect().toMap

  test("driver CC twin ≡ distributed loop on seeded random graphs") {
    // the small-edge-set driver twin (round 14) must produce the exact
    // labeling the distributed pointer-jumping loop converges to; run
    // both paths by toggling the bound property and compare maps
    for (seed <- 11 to 14) {
      val rnd = new scala.util.Random(seed)
      val n = 40 + rnd.nextInt(30)
      val edges = Seq.fill(20 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val viaTwin = ccMap(edges) // default bound: twin path for tiny sets
        val viaLoop =
          try {
            sys.props("graft.cc.twin.bound") = "0"
            ccMap(edges)
          } finally sys.props.remove("graft.cc.twin.bound")
        assert(viaTwin == viaLoop, s"seed=$seed twin/loop disagree")
        assert(viaTwin == unionFind(edges), s"seed=$seed vs union-find")
      }
    }
  }

  test("matches union-find on seeded random graphs") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 30 + rnd.nextInt(20)
      val edges = Seq.fill(25 + rnd.nextInt(30))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      assert(ccMap(edges) == unionFind(edges), s"seed=$seed")
    }
  }

  test("incremental components ≡ full recompute on seeded random edge splits") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(100 + seed)
      val n = 40 + rnd.nextInt(20)
      val edges = Seq.fill(40 + rnd.nextInt(30))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val (oldE, newE) = edges.partition(_ => rnd.nextBoolean())
      if (oldE.nonEmpty && newE.nonEmpty) {
        val prev = Graph.connectedComponents(oldE.toDF("a", "b"), "a", "b")
        val got = Graph.incrementalComponents(prev, "id", "component",
            newE.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        // full recompute over everything — the incremental path must agree
        // on every node that appears in any edge
        val want = ccMap(edges)
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("long path converges within the O(log n) round budget") {
    val path = (0L until 63L).map(i => (i, i + 1))
    // diameter 63: pure min-propagation needs 63 rounds; pointer jumping
    // must land it in ~log2(64)+slack — 10 is the proof, 63 would be a fail
    val m = ccMap(path, maxIter = 10)
    assert(m.size == 64 && m.values.forall(_ == 0L))
  }

  test("disjoint cliques get distinct canonical minima") {
    val cliqueA = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- (i + 1) to 13) yield (i.toLong, j.toLong)
    val m = ccMap(cliqueA ++ cliqueB)
    assert((0L to 3L).forall(m(_) == 0L) && (10L to 13L).forall(m(_) == 10L))
  }

  test("self-loops are ignored; empty edge set yields empty output") {
    assert(ccMap(Seq((5L, 5L), (1L, 2L))) == Map(1L -> 1L, 2L -> 1L))
    assert(ccMap(Seq((7L, 7L))).isEmpty)
    assert(Graph.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() == 0)
  }

  test("dedupGroups: every group has >= 2 docs and carries its min id") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (1L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "completely different words about spark catalyst plans and shuffles here"),
      (4L, "unrelated text regarding parquet row groups and column statistics")
    ).toDF("doc_id", "text")
    val rows = graft.operators.Dedup.dedupGroups(docs, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
      .collect()
    assert(rows.forall(_.getLong(2) >= 2))
    val grouped = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0,1,2 are near-dups of each other; 3 and 4 are not grouped
    assert(grouped.keySet == Set(0L, 1L, 2L))
    assert(grouped.values.forall(_ == 0L))
  }

  // ---- pageRankFixedPoint (qx103) --------------------------------------

  /** Reference implementation of the exact fixed-point recurrence. */
  private def prLocal(edges: Seq[(Long, Long)], iters: Int,
                      scale: Long): Map[Long, Long] = {
    val sym = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2).distinct
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = deg.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = sym.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => r(u) / deg(u) }.sum
      }
      r = r.keys.map(id => id -> (15L * scale + 85L * in(id)) / 100L).toMap
    }
    r
  }

  test("pageRankFixedPoint matches the local integer recurrence on path and star graphs") {
    val path = Seq((1L, 2L), (2L, 3L))
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    for (g <- Seq(path, star, path ++ star)) {
      val got = Graph.pageRankFixedPoint(g.toDF("u", "v"), "u", "v", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == prLocal(g, 3, 1000000000000L), s"graph=$g")
      // the round-14 driver twin must equal the DISTRIBUTED loop exactly
      val viaLoop =
        try {
          sys.props("graft.pr.twin.bound") = "0"
          Graph.pageRankFixedPoint(g.toDF("u", "v"), "u", "v", iters = 3)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        } finally sys.props.remove("graft.pr.twin.bound")
      assert(got == viaLoop, s"twin/loop disagree on graph=$g")
    }
  }

  test("pageRank: star center outranks leaves; duplicate/reversed input edges don't change ranks") {
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val got = Graph.pageRankFixedPoint(star.toDF("u", "v"), "u", "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((11L to 14L).forall(l => got(10L) > got(l)))
    val noisy = star ++ star.map(_.swap) ++ star // dups + reversals
    val got2 = Graph.pageRankFixedPoint(noisy.toDF("u", "v"), "u", "v", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("pageRank refuses a graph whose 85*N*scale exceeds int64 instead of wrapping silently") {
    // 5 nodes at scale 2^61: 85*5*2^61 overflows — must fail LOUDLY
    // (Spark's non-ANSI long sum would wrap; DuckDB would error: the
    // cross-engine contract breaks exactly when this guard fires)
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRankFixedPoint(star.toDF("u", "v"), "u", "v", 2,
        scale = Long.MaxValue / 4)
    }
    assert(ex.getMessage.contains("int64"))
    // and the documented safe point still runs
    assert(Graph.pageRankFixedPoint(star.toDF("u", "v"), "u", "v", 2,
      scale = Long.MaxValue / (85L * 5L)).count() == 5L)
  }

  test("overlapEdges: boilerplate shingles above maxDf cannot form edges; rare overlap counts are exact") {
    // every doc shares the 3-gram "common header line"; only 1 & 2 share
    // a rare phrase long enough for TWO distinct rare 3-shingles
    val docs = Seq(
      1L -> "common header line alpha beta gamma delta",
      2L -> "common header line alpha beta gamma epsilon",
      3L -> "common header line zeta eta theta iota",
      4L -> "common header line kappa lambda mu nu").toDF("doc_id", "text")
    val got = graft.operators.Dedup
      .overlapEdges(docs, "text", "doc_id", shingleN = 3, maxDf = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // docs 1,2 share: "header line alpha", "line alpha beta",
    // "alpha beta gamma" (df=2 each); "common header line"
    // (df=4 > maxDf=3) is cut and links nothing
    assert(got == Map((1L, 2L) -> 3L))
  }
}
