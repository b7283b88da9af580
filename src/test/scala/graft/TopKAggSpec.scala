package graft

import org.apache.spark.sql.functions._

/** Contract of the bounded top-k aggregate (`graft_topk`): bit-equality
  * with the row_number window it replaces, under every shape that could
  * diverge — multi-partition partial aggregation, ties resolved by the
  * tiebreak field, k larger than the group, string ids, null ordering
  * keys (nulls first, exactly like a window's ASC NULLS FIRST). */
class TopKAggSpec extends SparkSpec {

  private def register(): Unit = graft.functions.GraftFunctions.register(spark)

  test("equals the rank window on a many-partition random frame; payload rides untouched") {
    register()
    // deterministic pseudo-random scores over 200 groups x 500 rows,
    // spread over 32 partitions so partial aggregation really merges
    val df = spark.range(100000).repartition(32)
      .select((col("id") % 200).as("g"), col("id").as("rid"),
        (pmod(col("id") * 2654435761L, lit(1000003L)).cast("double") / 7.0).as("score"),
        (col("id") % 5).as("payload"))
      .localCheckpoint()
    val viaWindow = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("score").asc, col("rid").asc)
      df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 7)
        .select("g", "rid", "rank", "score", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3), r.getLong(4))).toSet
    }
    val viaAgg = df.groupBy("g")
      .agg(expr("graft_topk(struct(score, rid, payload), 7)").as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "v")))
      .select(col("g"), col("v.rid"), (col("p") + 1).cast("int").as("rank"),
        col("v.score"), col("v.payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getLong(4))).toSet
    assert(viaAgg === viaWindow)
  }

  test("ties fall to the tiebreak field; k > group size returns the whole group; string ids order lexically") {
    register()
    import spark.implicits._
    val df = Seq(
      ("g1", "b", 1.0), ("g1", "a", 1.0), ("g1", "c", 1.0), // all tied
      ("g2", "z", 2.0), ("g2", "y", 1.0)                    // k > size
    ).toDF("g", "id", "s").repartition(4)
    val got = df.groupBy("g")
      .agg(expr("graft_topk(struct(s, id), 2)").as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("p", "v")))
      .select(col("g"), col("v.id"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === Set(("g1", "a", 0), ("g1", "b", 1), ("g2", "y", 0), ("g2", "z", 1)))
  }

  test("null ordering keys sort first, matching a window's ASC NULLS FIRST") {
    register()
    import spark.implicits._
    val df = Seq(("g", java.lang.Double.valueOf(2.0), 1L),
      ("g", null.asInstanceOf[java.lang.Double], 2L),
      ("g", java.lang.Double.valueOf(1.0), 3L)).toDF("g", "s", "id")
    val got = df.groupBy("g")
      .agg(expr("graft_topk(struct(s, id), 2)").as("t"))
      .select(posexplode(col("t")).as(Seq("p", "v")))
      .select(col("v.id")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(2L, 3L), s"null key must rank first: $got")
  }

  test("a null key arriving AFTER the heap is full takes the fast-reject path safely and still ranks first") {
    register()
    import spark.implicits._
    // single partition forces arrival order: two non-null rows fill k=2,
    // then the null-keyed row hits the warmed-heap fast-reject compare —
    // the regression this pins was an NPE in the field-0 short-circuit
    val df = Seq(("g", java.lang.Double.valueOf(1.0), 1L),
      ("g", java.lang.Double.valueOf(2.0), 2L),
      ("g", null.asInstanceOf[java.lang.Double], 3L))
      .toDF("g", "s", "id").coalesce(1)
    val got = df.groupBy("g")
      .agg(expr("graft_topk(struct(s, id), 2)").as("t"))
      .select(posexplode(col("t")).as(Seq("p", "v")))
      .select(col("v.id")).collect().map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 1L),
      s"late null key must displace the kept worst and rank first: $got")
  }

  test("rejects non-struct input and k < 1") {
    register()
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("g", "s")
    intercept[Exception] {
      df.groupBy("g").agg(expr("graft_topk(s, 2)")).collect()
    }
    intercept[Exception] {
      df.groupBy("g").agg(expr("graft_topk(struct(s), 0)")).collect()
    }
  }
}
