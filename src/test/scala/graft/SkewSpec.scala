package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted two-stage sum/count equals the plain aggregation") {
    import spark.implicits._
    // heavy hitter: key 0 has 5000 rows, others 10
    val rows = (0 until 5000).map(i => (0, i.toLong)) ++
      (1 to 9).flatMap(k => (0 until 10).map(i => (k, i.toLong)))
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val salted = Skew.saltedAgg(df, Seq("k"), saltBuckets = 8,
      partial = Seq(sum("v").as("__s"), count(lit(1)).as("__n")),
      merge = Seq(sum("__s").as("s"), sum("__n").as("n")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(salted.toSeq === plain.toSeq)
  }

  test("salted collect_set gathers the same distinct values") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i % 3, i % 50)).toDF("k", "v")
    val out = Skew.saltedCollectSet(df, Seq("k"), "v", saltBuckets = 4)
      .collect().map(r => (r.getInt(0), r.getSeq[Int](1).toSet)).toMap
    val expected = (0 until 1000).map(i => (i % 3, i % 50))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(out === expected)
  }

  test("salted join against small replicated right equals plain join") {
    import spark.implicits._
    val left = ((0 until 2000).map(_ => (0, "hot")) ++ Seq((1, "cold"))).toDF("key", "tag")
    val right = Seq((0, "zero"), (1, "one")).toDF("key", "name")
    val plain = left.join(right, "key").groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoinSmallRight(left, right, "key", saltBuckets = 8)
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted === plain)
  }
}
