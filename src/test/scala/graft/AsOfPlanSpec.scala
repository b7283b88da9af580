package graft

import graft.plans.AsOfJoinPlan
import org.apache.spark.sql.functions._

/** Custom-plan as-of join (AsOfJoin logical + strategy + merge exec):
  * result parity with the composed union+window operator on real data,
  * edge semantics on hand-built groups, and the physical-plan shape
  * (our exec + key-clustered exchanges, no window). */
class AsOfPlanSpec extends SparkSpec {
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("merge exec equals the composed asofJoin on the events table") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val composed = graft.operators.Relational.asofJoin(
        purchases, signups, "user_id", "ts", Seq("signup_ts"))
      .orderBy("event_id").collect()
    val merged = AsOfJoinPlan.asofJoinMerge(
        purchases, signups, "user_id", "ts", Seq("signup_ts"))
      .orderBy("event_id").collect()
    assert(merged.toSeq == composed.toSeq && merged.nonEmpty)
  }

  test("edge semantics: inclusive at-or-before, nulls before any right row, absent keys") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"), (2L, 50L, "d"),
      (3L, 7L, "e")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 60L, 600L))
      .toDF("k", "t", "v")
    val out = AsOfJoinPlan.asofJoinMerge(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out("a") == Some(100L)) // equal ts is inclusive
    assert(out("b") == Some(150L)) // latest at-or-before
    assert(out("c") == None)       // before any right row
    assert(out("d") == None)       // right row exists but only later
    assert(out("e") == None)       // key absent on the right entirely
  }

  test("duplicate (key, ts) right rows resolve to the largest carried tuple (parity with composed)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 10L, 2L)).toDF("k", "t", "v")
    val m = AsOfJoinPlan.asofJoinMerge(left, right, "k", "t", Seq("v")).collect()
    assert(m.head.getLong(2) == 9L)
    val c = graft.operators.Relational.asofJoin(left, right, "k", "t", Seq("v")).collect()
    assert(c.head.getLong(2) == 9L)
  }

  test("forward merge equals the composed asofJoinForward on the events table") {
    val e = Tables.events(spark, sfDir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("ts").as("error_ts"))
    val composed = graft.operators.Relational.asofJoinForward(
        purchases, errors, "user_id", "ts", Seq("error_ts"))
      .orderBy("event_id").collect()
    val merged = AsOfJoinPlan.asofJoinMerge(
        purchases, errors, "user_id", "ts", Seq("error_ts"), forward = true)
      .orderBy("event_id").collect()
    assert(merged.toSeq == composed.toSeq && merged.nonEmpty)
  }

  test("null keys and timestamps: left emits null carry, right rows never match, no crash") {
    val left = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "nk"),
      (Some(1L), None, "nt")).toDF("k", "t", "tag")
    val right = Seq((Some(1L), Some(5L), Some(50L)), (None, Some(1L), Some(99L)),
      (Some(1L), None, Some(77L))).toDF("k", "t", "v")
    val out = AsOfJoinPlan.asofJoinMerge(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("a") == Some(50L))  // the only valid right row
    assert(out("nk").isEmpty && out("nt").isEmpty)
  }

  test("string keys: stale carry resets across key groups") {
    val left = Seq(("alpha", 10L, "a1"), ("beta", 10L, "b1")).toDF("k", "t", "tag")
    val right = Seq(("alpha", 5L, 500L)).toDF("k", "t", "v")
    val out = AsOfJoinPlan.asofJoinMerge(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(out("a1") == Some(500L))
    assert(out("b1").isEmpty) // must NOT inherit alpha's carry
  }

  test("physical plan: our exec, key-clustered exchanges, no window") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 8L, 1L)).toDF("k", "t", "v")
    val df = AsOfJoinPlan.asofJoinMerge(left, right, "k", "t", Seq("v"))
    df.collect() // materialize so AQE's final plan is inspectable
    val plan = df.queryExecution.executedPlan.toString
    // physical nodeName renders without the Exec suffix
    assert(plan.contains("AsOfJoin k#"), plan)
    assert(plan.contains("hashpartitioning(k"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("non-orderable carried column fails fast with a clear message, not a planner error") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 5L, "a")).toDF("k", "ts", "v")
      .withColumn("m", map(col("v"), col("ts"))) // MapType: not sort-orderable
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPlan.asofJoinMerge(l, r, "k", "ts", Seq("m"))
    }
    assert(e.getMessage.contains("non-orderable") && e.getMessage.contains("'m'"),
      e.getMessage)
  }
}
