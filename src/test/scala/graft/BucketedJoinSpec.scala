package graft

import graft.sources.FactStore
import org.apache.spark.sql.functions._

/** Co-located join proof: two tables bucketed on the join key with the
  * same bucket count join with ZERO Exchange nodes — the layout that
  * turns a recurring 100 TB join's shuffle into a one-time write cost. */
class BucketedJoinSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  test("bucketed tables join without any shuffle; results equal the plain join") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_mktsegment")

    FactStore.writeBucketed(orders, "orders_b", "o_custkey", 8)
    FactStore.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)
    try {
      // at test scale the planner would broadcast (which also avoids a
      // shuffle but proves nothing about bucketing) — force the sort-merge
      // path the layout exists for, as a 100 TB side would
      val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val bareJoin =
        try {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
          val j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
          val joinPlan = j.queryExecution.executedPlan.toString
          // non-vacuous proof: the scans read bucketed AND the whole join
          // plan contains no Exchange of any kind
          assert(joinPlan.contains("Bucketed: true"),
            s"scans must be bucketed:\n$joinPlan")
          assert(joinPlan.contains("SortMergeJoin"), joinPlan)
          assert(!joinPlan.contains("Exchange"),
            s"bucketed join must be exchange-free:\n$joinPlan")
          j
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)

      val joined = bareJoin
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))

      // equivalence against the plain (shuffling) join
      val plain = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val bucketed = joined
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      assert(bucketed.toSeq === plain.toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
