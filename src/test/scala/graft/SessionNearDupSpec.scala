package graft

import graft.operators.{Dedup, Relational}
import org.apache.spark.sql.functions._

class SessionNearDupSpec extends SparkSpec {

  test("sessionize: gap splits sessions, ids increment per user") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(10)),   // session 1
      (3L, 10L, ts(60)),                     // gap 50min > 30min → session 2
      (4L, 20L, ts(0))                       // other user → own session 1
    ).toDF("event_id", "user_id", "ts")
    val out = Relational.sessionize(events, "user_id", "ts", gapSeconds = 1800,
        tieBreak = Seq("event_id"))
      .select("event_id", "user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(out.toSeq === Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 2L), (4L, 20L, 1L)))
  }

  test("near-dup pipeline: finds a planted near-duplicate, exact dup has jaccard 1.0") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tomorrow"
    val other = "completely different words about spark catalyst plans and shuffles here"
    val docs = Seq((1L, base), (2L, near), (3L, other), (4L, base)).toDF("doc_id", "text")
    val out = Dedup.nearDupPipeline(docs, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Double]("jaccard"))).toMap
    // exact dup pair (1,4) must be found with jaccard 1.0
    assert(math.abs(out((1L, 4L)) - 1.0) < 1e-12)
    // near pair (1,2): 11 shared of 13 union shingles ≈ 0.846 — found
    assert(out.contains((1L, 2L)) && out((1L, 2L)) > 0.5)
    // the unrelated doc never pairs
    assert(!out.keys.exists { case (a, b) => a == 3L || b == 3L })
    // keep/drop: smaller id survives
    assert(out.keys.forall { case (a, b) => a < b })
  }

  test("asofJoin: latest at-or-before match per key, null when none, inclusive ties") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val left = Seq(
      (1L, 10L, ts(5)),   // after signup@0 -> 0
      (2L, 10L, ts(20)),  // after signup@15 -> 15
      (3L, 10L, ts(15)),  // EXACTLY at signup@15 -> inclusive -> 15
      (4L, 20L, ts(5))    // user 20 never signed up -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts(0), ts(0)), (10L, ts(15), ts(15))
    ).toDF("user_id", "ts", "signup_ts")
    val out = graft.operators.Relational.asofJoin(left, right, "user_id", "ts", Seq("signup_ts"))
      .collect().map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.sql.Timestamp]("asof_signup_ts")).map(_.getTime / 60000L)))
      .sortBy(_._1)
    assert(out.toSeq === Seq((1L, Some(0L)), (2L, Some(15L)), (3L, Some(15L)), (4L, None)))
  }
}
