package graft

import graft.operators.Metrics
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {

  test("observed metrics ride the pipeline's own action — values exact, no extra job") {
    import spark.implicits._
    val docs = Seq((1L, "keep"), (2L, null), (3L, "keep"), (4L, null))
      .toDF("id", "text")
    val (instrumented, obs) = Metrics.observed(docs, "gate",
      count(lit(1)).as("rows"),
      sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"))
    val survivors = instrumented.filter(col("text").isNotNull).count()
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val m = obs.get
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(survivors == 2L)
    assert(m("rows") == 4L && m("null_texts") == 2L, m.toString)
    // the metrics came from the count() action itself — reading them
    // launches NO further job (the whole point vs a second aggregate pass)
    assert(jobsAfter == jobsBefore, s"obs.get ran ${jobsAfter - jobsBefore} extra jobs")
  }

  test("rejects empty metric lists") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Metrics.observed(Seq(1).toDF("x"), "nope")
    }
  }
}
