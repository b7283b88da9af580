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

  /** The events table stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark vectorized reader rejects. Read nanos as raw longs and convert
    * to a microsecond timestamp — the same ns→µs truncation DuckDB applies
    * (its TIMESTAMP is µs-native), so oracle semantics are identical. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Exact integer cents from a 2-decimal double — deterministic across
    * engines and summation orders (vs. summing raw doubles, which isn't). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** price*(1-disc) has ≤4 decimals in the data; scale to an exact integer
    * ("basis points of a currency unit") before summing. */
  def net1e4(price: Column, disc: Column): Column =
    round(price * (lit(1.0) - disc) * 10000, 0).cast("long")
}
