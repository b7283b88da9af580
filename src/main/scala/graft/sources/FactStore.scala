package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.FactModel
import graft.operators.Relational

/** Partitioned parquet fact store (ref S7/S8: src/etl/data_manager.py
  * 192-283/333-379). The reference hand-routes one file per
  * (ticker, year[, quarter]) with a JSON side-index; here the layout IS the
  * index: `partitionBy(ticker, period_type, fiscal_year)` gives Catalyst
  * partition pruning the same file-skipping for free, and dynamic partition
  * overwrite replaces the delete-then-rewrite upsert (ref: pipeline.py:295-299).
  *
  * Scale note: at 100 TB the partition spec keys on (ticker × period ×
  * year) — bounded cardinality (~10k tickers × 2 × ~20y), each partition a
  * few MB..GB of row groups; scans prune by predicate before any IO.
  */
object FactStore {

  /** Derived routing column: FY rows are annual, everything else quarterly
    * (ref: data_manager.py:103-125; F2 semantics — null fp counts annual). */
  def withPeriodType(facts: DataFrame): DataFrame =
    facts.withColumn("period_type",
      when(col("fiscal_period").isNull || col("fiscal_period") === "FY", "annual")
        .otherwise("quarterly"))

  /** Write/upsert facts. Dynamic partition overwrite only rewrites the
    * partitions present in `facts` — incremental refresh of one ticker
    * leaves every other ticker's files untouched. */
  def write(facts: DataFrame, base: String): Unit =
    withPeriodType(facts)
      .write
      .partitionBy("ticker", "period_type", "fiscal_year")
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", "snappy")
      .mode(SaveMode.Overwrite)
      .parquet(base)

  /** Retention: delete whole `fiscal_year=<y>` partition directories with
    * y < `keepFromYear` — data expiry as pure partition-layout surgery
    * (no scan, no rewrite; the layout IS the index, so retention is one
    * directory walk regardless of store size). Returns the number of
    * partition directories removed. Readers racing the deletes can see a
    * partial prefix, the same contract as dynamic-overwrite upserts;
    * production wraps both in a table format's snapshot commit. */
  def expire(spark: SparkSession, base: String, keepFromYear: Int): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(base),
      spark.sparkContext.hadoopConfiguration)
    val glob = new org.apache.hadoop.fs.Path(base, "*/*/fiscal_year=*")
    val Year = """fiscal_year=(\d+)""".r
    val doomed = fs.globStatus(glob).toSeq.filter { st =>
      st.getPath.getName match {
        case Year(y) => y.toInt < keepFromYear
        case _ => false
      }
    }
    doomed.foreach(st => fs.delete(st.getPath, true))
    doomed.size.toLong
  }

  /** Pruned read: ticker + lookback window → Catalyst prunes to the
    * matching partition directories (ref prune loop: data_manager.py:343-347). */
  def read(spark: SparkSession, base: String, ticker: Option[String] = None,
           years: Option[Int] = None, currentYear: Option[Int] = None): DataFrame = {
    var df = spark.read.schema(readSchema).parquet(base)
    ticker.foreach(t => df = df.filter(col("ticker") === t))
    (years, currentYear) match {
      case (Some(y), Some(now)) => df = df.filter(col("fiscal_year") >= now - y + 1)
      case _ =>
    }
    df
  }

  private def readSchema = {
    // partition columns come back typed from directory names; declare the
    // data columns + period_type explicitly so nothing is inferred
    val dataCols = FactModel.factSchema.fields.filterNot(_.name == "ticker")
    org.apache.spark.sql.types.StructType(
      dataCols :+
        org.apache.spark.sql.types.StructField("ticker", org.apache.spark.sql.types.StringType) :+
        org.apache.spark.sql.types.StructField("period_type", org.apache.spark.sql.types.StringType))
  }

  /** Bucketed table writer — the co-located-join layout: both sides of a
    * recurring equi-join written with the SAME bucket count on the join
    * key join WITHOUT a shuffle (bucket pruning + bucketed scan replace
    * the Exchange). This is the layout answer to "this join runs every
    * hour on 100 TB": pay one bucketed write, then every join reads
    * co-located buckets. Requires a table catalog entry (saveAsTable) —
    * bucket metadata lives in the catalog, not the parquet footers. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(bucketCol), nBuckets)

  /** Bucketed write on a composite key — the layout must carry EVERY join
    * key column or the planner disables the bucketed scan (a join on
    * (a, b) cannot reuse buckets hashed on b alone). */
  def writeBucketedMulti(df: DataFrame, table: String, bucketCols: Seq[String],
                         nBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "writeBucketedMulti needs at least one bucket column")
    df.write
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)
  }

  /** A7 freshness aggregate (ref: data_manager.py:304-331): latest filing
    * date + available periods per ticker — computed on demand from the facts
    * table, replacing the reference's JSON metadata files (S12). */
  def freshness(facts: DataFrame): DataFrame =
    Relational.freshness(
      withPeriodType(facts), Seq("ticker"),
      coalesce(col("end_date"), col("instant_date")),
      when(col("period_type") === "annual", col("fiscal_year").cast("string"))
        .otherwise(concat(col("fiscal_year").cast("string"), lit("-"), col("fiscal_period"))))

  /** T2/C10 change detection: order-independent content signature
    * (count + sum of per-row 64-bit hashes). The reference md5's a
    * sorted-key JSON dump (sec_client.py:315-318) — a global sort; this is
    * the distributed equivalent: per-row hash then commutative combine,
    * no shuffle beyond the final 1-row agg. */
  def contentSignature(facts: DataFrame): DataFrame = {
    val base = Seq(
      count(lit(1)).as("n_facts"),
      sum(xxhash64(facts.columns.map(col): _*)).as("content_sum"))
    val withDate =
      if (facts.columns.contains("end_date"))
        base :+ max(coalesce(col("end_date"), col("instant_date"))).as("latest_filing")
      else base
    facts.agg(withDate.head, withDate.tail: _*)
  }

  /** T2 skip-unchanged gate: true when new facts carry the same signature
    * as what's stored (ref: pipeline.py:253-276 compares count + max date). */
  def unchanged(newFacts: DataFrame, storedFacts: DataFrame): Boolean = {
    val a = contentSignature(newFacts.select("ticker", "concept", "value", "fiscal_year", "fiscal_period")).collect()(0)
    val b = contentSignature(storedFacts.select("ticker", "concept", "value", "fiscal_year", "fiscal_period")).collect()(0)
    a == b
  }
}
