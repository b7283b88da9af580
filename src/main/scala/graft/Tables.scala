package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table access + shared deterministic-arithmetic helpers.
  *
  * Oracle-parity discipline: the driver hash-compares our results against
  * DuckDB running the same ANSI SQL on the same parquet. Floating-point
  * summation order differs between engines, so every money aggregate is
  * done in exact integer cents (`CAST(ROUND(x*100) AS BIGINT)`), and every
  * float output is either a single IEEE operation chain (deterministic) or
  * explicitly rounded. See SparkEntry.oracleSql for the mirrored SQL.
  */
object Tables {

  val AllTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Planned scan-partition count of a table, memoized per (dir, table):
    * parquet split planning is driver-side and job-free, but costs a few
    * ms of file listing we don't want on every query-construct call. */
  private val scanPartsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Input-spread table read — guide §2.5 "input skew: one huge
    * unsplittable file … repartition immediately after the read".
    *
    * The bench datasets are ONE parquet file with ONE row group per
    * table, so every scan plans a single partition and the whole
    * scan-stage pipeline (tokenize / minhash / probe-assign / candidate
    * scoring — the expensive expressions of the text and vector
    * operators) serializes on one core while the other N−1 idle. When
    * the planned scan has fewer splits than the cluster's
    * defaultParallelism, round-robin repartition to defaultParallelism
    * (scale-adaptive: local[8] spreads 8-wide, a 1000-core cluster
    * 1000-wide). At production scale the input has more splits than
    * cores and this is a structural no-op — NO exchange is added, so the
    * zero-shuffle shapes pinned by the plan audits are unchanged where
    * they matter. Round-robin (not a key hash) keeps every downstream
    * key-partitioning property untouched; results are row-order
    * independent throughout (decimal-exact aggregation discipline), so
    * the spread is semantics-preserving. Predicate pushdown survives:
    * Catalyst pushes deterministic filters through Repartition to the
    * scan (re-verified in plans/r14). */
  def ts(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = t(spark, dir, name)
    val want = spark.sparkContext.defaultParallelism
    val have = scanPartsMemo.computeIfAbsent(s"$dir/$name",
      _ => Integer.valueOf(df.rdd.getNumPartitions))
    if (have < want) df.repartition(want) else df
  }

  /** The events table's `ts` physical type has varied across driver data
    * generations: parquet TIMESTAMP(NANOS) (which the Spark vectorized
    * reader only reads as a raw long) and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). Normalize
    * both to a session-TZ microsecond TIMESTAMP: for nanos-as-long the same
    * ns→µs truncation DuckDB applies (its TIMESTAMP is µs-native); for NTZ
    * a plain cast (identity on the stored micros under the UTC session TZ
    * GraftSession pins), so oracle semantics are identical either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    normalizeTs(raw)
  }

  /** ts-column normalization shared by the batch and streaming readers. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast("timestamp"))
    case _ => df // already a session-TZ timestamp
  }

  /** Exact integer cents from a 2-decimal double — deterministic across
    * engines and summation orders (vs. summing raw doubles, which isn't). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** price*(1-disc) has ≤4 decimals in the data; scale to an exact integer
    * ("basis points of a currency unit") before summing. */
  def net1e4(price: Column, disc: Column): Column =
    round(price * (lit(1.0) - disc) * 10000, 0).cast("long")
}
