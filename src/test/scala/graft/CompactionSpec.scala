package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction collapses a fragmented store, preserves content, bounds file sizes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact").toString + "/store"
    val df = (1L to 10000L).map(i => (i, s"row-$i", i % 7)).toDF("id", "payload", "grp")
    df.repartition(64).write.parquet(dir) // the decayed, fragmented state
    val before = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).collect()(0)

    val stats = Compaction.compactParquet(spark, dir, maxRecordsPerFile = 5000L)

    assert(stats.filesBefore >= 32, s"setup produced only ${stats.filesBefore} files")
    // 10k rows / 5k cap → at least 2 files, and far fewer than 64
    assert(stats.filesAfter >= 2 && stats.filesAfter <= 8, stats.toString)
    val after = spark.read.parquet(dir)
      .agg(sum("id"), count(lit(1))).collect()(0)
    assert(after == before, s"content changed: $before -> $after")
    // every surviving file respects the record cap
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name()).count().collect().map(_.getLong(1))
    assert(perFile.forall(_ <= 5000L), perFile.mkString(","))
  }

  test("keepBackup retains the full pre-compaction directory until the caller drops it") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactb").toString + "/store"
    val df = (1L to 1000L).map(i => (i, s"row-$i")).toDF("id", "payload")
    df.repartition(8).write.parquet(dir)
    Compaction.compactParquet(spark, dir, maxRecordsPerFile = 100000L,
      keepBackup = true)
    // the backup is the complete old version, readable for validation...
    val bak = spark.read.parquet(dir + ".compact-bak")
    assert(bak.count() == 1000L)
    assert(spark.read.parquet(dir).count() == 1000L)
    // ...a second compaction REFUSES to run while it exists (it would
    // destroy the pre-image the caller is still validating)...
    val e = intercept[java.io.IOException] {
      Compaction.compactParquet(spark, dir, maxRecordsPerFile = 100000L)
    }
    assert(e.getMessage.contains("compact-bak"), e.getMessage)
    assert(spark.read.parquet(dir + ".compact-bak").count() == 1000L)
    // ...and once the caller releases it, compaction proceeds and the
    // default mode leaves no backup behind
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".compact-bak"), true)
    Compaction.compactParquet(spark, dir, maxRecordsPerFile = 100000L)
    assert(!new java.io.File(dir + ".compact-bak").exists())
  }

  test("partitioned layout survives compaction within partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compactp").toString + "/store"
    val df = (1L to 3000L).map(i => (i, (i % 3).toString)).toDF("id", "part")
    df.repartition(24).write.partitionBy("part").parquet(dir)
    Compaction.compactParquet(spark, dir, maxRecordsPerFile = 100000L,
      partitionCols = Seq("part"))
    // hive layout intact → partition pruning still works
    val pruned = spark.read.parquet(dir).filter(col("part") === "2")
    assert(pruned.count() == 1000L)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(part"), plan)
  }
}
