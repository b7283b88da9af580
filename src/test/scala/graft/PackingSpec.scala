package graft

import graft.operators.Packing
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing / distributed prefix sum: exactness vs the naive
  * single-partition window, hand-checked packing semantics, and the plan
  * shape that makes it scale (no data-sized single-partition stage). */
class PackingSpec extends SparkSpec {

  test("prefixSum equals the single-partition window on shuffled input") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((1L to 5000L).toVector).map(i => (i, (i % 37) + 1))
    val df = rows.toDF("id", "v").repartition(16) // arbitrary incoming layout
    val got = Packing.prefixSum(df, "id", "v", "cum")
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naiveW = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(naiveW))
      .select("id", "cum").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want && got.size == 5000)
  }

  test("packSequential: hand-computed boundaries, straddlers, zero-token drop") {
    import spark.implicits._
    // tokens 5,3,4 into context 4: doc 1 straddles packs 0-1; doc 4 empty
    val docs = Seq((1L, 5L), (2L, 3L), (3L, 4L), (4L, 0L)).toDF("doc_id", "n")
    val got = Packing.packSequential(docs, "doc_id", "n", 4L)
      .select("doc_id", "start_off", "start_pack", "end_pack", "n_packs")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      1L -> (0L, 0L, 1L, 2L),
      2L -> (5L, 1L, 1L, 1L),
      3L -> (8L, 2L, 2L, 1L)))
  }

  test("plan shape: the only single-partition stage is the partition-count-sized offsets window") {
    import spark.implicits._
    val df = (1L to 10000L).map(i => (i, 1L)).toDF("id", "v")
    val plan = Packing.prefixSum(df, "id", "v", "cum")
      .queryExecution.executedPlan.toString
    // data-sized stages: range exchange + pid-partitioned window
    assert(plan.contains("rangepartitioning(id"), plan)
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    // exactly ONE SinglePartition exchange — the ≤numShufflePartitions-row
    // offsets frame, never the data
    assert(plan.split("Exchange SinglePartition").length - 1 == 1, plan)
    // and the offsets side joins back as a broadcast, not a shuffle
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("prefixSum on sparse random keys equals a local sorted scan") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // sparse, gappy, unordered keys — nothing contiguous about the domain
    val keys = rnd.shuffle((1L to 200000L).toVector).take(3000).toVector
    val rows = keys.map(k => (k, (k % 101) + 7))
    val got = Packing.prefixSum(rows.toDF("id", "v").repartition(13), "id", "v", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var acc = 0L
    val want = rows.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    assert(got == want && got.size == 3000)
  }

  test("prefixSum fails fast on duplicate and on null order keys") {
    import spark.implicits._
    val dup = Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 5L)).toDF("id", "v")
    val e = intercept[Exception] {
      Packing.prefixSum(dup, "id", "v", "cum").collect()
    }
    assert(e.getMessage.contains("must be unique"), e.getMessage)
    val withNull = Seq(Some(1L) -> 10L, None -> 20L, Some(3L) -> 5L)
      .toDF("id", "v")
    val e2 = intercept[Exception] {
      Packing.prefixSum(withNull, "id", "v", "cum").collect()
    }
    assert(e2.getMessage.contains("must be unique"), e2.getMessage)
  }

  test("both prefixSum consumers read ONE range exchange (reuse pinned); correct with reuse off") {
    import spark.implicits._
    val df = (1L to 10000L).map(i => (i, 1L)).toDF("id", "v")
    // reuse on (default): the offsets branch must resolve to a
    // ReusedExchange of the local-sums branch's range shuffle — if
    // canonicalization ever drifts, the two branches would sample range
    // boundaries independently and mis-place offsets, so this fails loudly
    val out = Packing.prefixSum(df, "id", "v", "cum")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"), plan)
    assert(plan.split("\n").exists(l =>
      l.contains("ReusedExchange") && l.contains("rangepartitioning")), plan)
    // reuse off: prefixSum materializes the ranged layout instead, and the
    // sums stay exact
    val prev = spark.conf.get("spark.sql.exchange.reuse", "true")
    try {
      spark.conf.set("spark.sql.exchange.reuse", "false")
      val got = Packing.prefixSum(df, "id", "v", "cum")
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert((1L to 10000L).forall(i => got(i) == i))
    } finally spark.conf.set("spark.sql.exchange.reuse", prev)
  }

  test("packManifest: slices partition every doc; every non-final pack sums to the context length") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val docs = (1L to 500L).map(i => (i, rnd.between(1L, 40L))).toDF("doc_id", "n")
    val C = 16L
    val rows = Packing.packManifest(docs, "doc_id", "n", C)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalTokens = docs.collect().map(_.getLong(1)).sum
    // per-doc: slices are contiguous from 0 and cover exactly n_tokens
    val byDoc = rows.groupBy(_._2)
    docs.collect().foreach { d =>
      val (id, n) = (d.getLong(0), d.getLong(1))
      val slices = byDoc(id).sortBy(_._1).map(s => (s._3, s._4))
      assert(slices.head._1 == 0L, s"doc $id starts at ${slices.head._1}")
      assert(slices.map(_._2).sum == n, s"doc $id covers ${slices.map(_._2).sum} of $n")
      slices.sliding(2).foreach {
        case Array((s1, l1), (s2, _)) => assert(s1 + l1 == s2, s"doc $id gap at $s2")
        case _ =>
      }
    }
    // per-pack: all full except the tape's last
    val lastPack = (totalTokens - 1) / C
    rows.groupBy(_._1).foreach { case (pack, ss) =>
      val tot = ss.map(_._4).sum
      if (pack < lastPack) assert(tot == C, s"pack $pack holds $tot of $C")
      else assert(tot == totalTokens - lastPack * C)
    }
  }

  test("rejects nonpositive context length") {
    import spark.implicits._
    val docs = Seq((1L, 5L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException] {
      Packing.packSequential(docs, "doc_id", "n", 0L)
    }
  }
}
