package graft

import graft.model.FactModel.Fact
import graft.sources.FactStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S7/S8 partitioned store: layout, pruning, dynamic-partition upsert,
  * freshness, change signature. */
class FactStoreSpec extends SparkSpec {

  def fact(ticker: String, v: Double, fy: Int, fp: String): Fact =
    Fact(ticker, Some(s"$ticker Inc"), None, Some("us-gaap"), Some("Revenues"),
      Some("Revenues"), None, Some(v), Some("USD"), None,
      Some(java.sql.Date.valueOf(s"$fy-12-31")), None, Some("10-K"),
      Some(fy), Option(fp), None)

  test("write partitions by (ticker, period_type, fiscal_year); read prunes") {
    import spark.implicits._
    val base = Files.createTempDirectory("factstore").toString
    val facts = Seq(
      fact("AAA", 1.0, 2020, "FY"), fact("AAA", 2.0, 2021, "FY"),
      fact("AAA", 0.5, 2021, "Q1"), fact("BBB", 9.0, 2021, "FY")).toDF()
    FactStore.write(facts, base)

    val dirs = new java.io.File(base).listFiles().map(_.getName).toSet
    assert(dirs.contains("ticker=AAA") && dirs.contains("ticker=BBB"))

    val pruned = FactStore.read(spark, base, Some("AAA"), Some(1), Some(2021))
    assert(pruned.count() === 2) // 2021 FY + Q1 only
    // partition pruning must reach the physical scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("ticker=BBB"))

    // dynamic overwrite: rewriting AAA/2021 leaves BBB untouched
    FactStore.write(Seq(fact("AAA", 3.0, 2021, "FY")).toDF(), base)
    val after = FactStore.read(spark, base)
    assert(after.filter(col("ticker") === "BBB").count() === 1)
    assert(after.filter(col("ticker") === "AAA" && col("fiscal_year") === 2021
      && col("period_type") === "annual").collect()(0).getAs[Double]("value") === 3.0)
    // AAA 2020 partition untouched by the 2021 overwrite
    assert(after.filter(col("ticker") === "AAA" && col("fiscal_year") === 2020).count() === 1)
  }

  test("expire drops whole fiscal-year partitions below the cutoff, nothing else") {
    import spark.implicits._
    val base = Files.createTempDirectory("factexp").toString
    val facts = Seq(
      fact("AAA", 1.0, 2018, "FY"), fact("AAA", 2.0, 2019, "FY"),
      fact("AAA", 3.0, 2020, "FY"), fact("AAA", 3.5, 2020, "Q1"),
      fact("BBB", 9.0, 2019, "FY"), fact("BBB", 8.0, 2021, "FY")).toDF()
    FactStore.write(facts, base)
    // 2018 + 2019 under AAA/annual, 2019 under BBB/annual → 3 dirs doomed
    val removed = FactStore.expire(spark, base, keepFromYear = 2020)
    assert(removed == 3L, s"removed=$removed")
    val left = FactStore.read(spark, base)
      .select("ticker", "fiscal_year").as[(String, Int)].collect().toSet
    assert(left == Set(("AAA", 2020), ("BBB", 2021)))
    // idempotent: nothing left below the cutoff
    assert(FactStore.expire(spark, base, 2020) == 0L)
  }

  test("freshness aggregate: latest date + sorted period keys per ticker") {
    import spark.implicits._
    val facts = Seq(fact("AAA", 1.0, 2020, "FY"), fact("AAA", 2.0, 2021, "FY"),
      fact("AAA", 0.5, 2021, "Q1")).toDF()
    val f = FactStore.freshness(facts).collect()(0)
    assert(f.getAs[java.sql.Date]("latest_date").toString === "2021-12-31")
    assert(f.getAs[String]("periods") === "2020,2021,2021-Q1")
  }

  test("content signature detects change and ignores row order") {
    import spark.implicits._
    val a = Seq(fact("AAA", 1.0, 2020, "FY"), fact("AAA", 2.0, 2021, "FY")).toDF()
    val b = Seq(fact("AAA", 2.0, 2021, "FY"), fact("AAA", 1.0, 2020, "FY")).toDF()
    val c = Seq(fact("AAA", 1.0, 2020, "FY"), fact("AAA", 2.5, 2021, "FY")).toDF()
    assert(FactStore.unchanged(a, b))
    assert(!FactStore.unchanged(a, c))
  }
}
