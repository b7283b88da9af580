package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys at cluster scale.
  *
  * When is this needed? Spark's hash aggregation already does map-side
  * partial aggregation, so SUM/COUNT/MIN/MAX-style aggs tolerate key skew
  * well. The pathological cases are (a) aggregation buffers that grow with
  * group size (collect_list/collect_set/percentile) where one hot key's
  * buffer must fit in a single task, and (b) shuffle joins where one key's
  * rows land on one reducer. AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) re-splits skewed JOIN partitions at runtime; salting is
  * the explicit, planner-independent fallback and the only fix for (a).
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 groups on (keys, salt) spreading
    * each hot key over `saltBuckets` tasks; stage 2 merges the partials.
    * Caller supplies both stages because the merge differs per aggregate
    * (sum→sum, count→sum, min→min, avg→(sum,count) pair...). */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(keys.map(col): _*).agg(merge.head, merge.tail: _*)
  }

  /** Salted distinct-collection: collect_set on a hot key without a single
    * task holding the whole set. The cap applies in BOTH stages: each
    * per-salt partial is sorted and truncated to `capPerKey`, so the
    * stage-2 merge buffer is bounded by saltBuckets × capPerKey elements —
    * never the full set of the hot key. Sorting before each truncation
    * makes the kept elements deterministic (the capPerKey smallest), not
    * dependent on partial-array arrival order. When any stage-1 partial
    * hits the cap the result is the smallest `capPerKey` distinct values
    * rather than the complete set — the documented trade for boundedness. */
  def saltedCollectSet(df: DataFrame, keys: Seq[String], valueCol: String,
                       saltBuckets: Int, capPerKey: Int = 100000): DataFrame =
    saltedAgg(df, keys, saltBuckets,
      partial = Seq(slice(sort_array(collect_set(col(valueCol))), 1, capPerKey)
        .as("__partial")),
      merge = Seq(slice(sort_array(array_distinct(flatten(collect_list(col("__partial"))))),
        1, capPerKey).as(s"${valueCol}_set")))

  /** Replicated (broadcast-salt) join for a skewed LEFT side against a
    * small right side: right is exploded `saltBuckets`× so each left salt
    * partition finds its match — the classic salted-join shape, for when
    * AQE's runtime split is unavailable (e.g. custom partitioners). */
  def saltedJoinSmallRight(left: DataFrame, right: DataFrame, key: String,
                           saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets)))
    val replicatedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
