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

  test("rejects nonpositive context length") {
    import spark.implicits._
    val docs = Seq((1L, 5L)).toDF("doc_id", "n")
    intercept[IllegalArgumentException] {
      Packing.packSequential(docs, "doc_id", "n", 0L)
    }
  }
}
