package graft

import org.apache.spark.sql.SparkSession

/** The engine's session entry point: recommended configs + native function
  * registration + testdata views, in one call.
  *
  * ```scala
  * val spark = GraftSession.create("my-app")            // local[*]
  * GraftSession.registerViews(spark, "/root/testdata/sf0.01")
  * spark.sql("SELECT graft_polyhash(text) FROM documents").show()
  * ```
  */
object GraftSession {

  def create(appName: String, master: String = "local[*]",
             shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName(appName)
      // shuffle partitions sized to cores (local) — override per cluster
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // dynamic mode so FactStore upserts only touch written partitions
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Register the driver's testdata tables as SQL views (+ the native
    * functions, so the advertised plain-SQL surface is self-contained on
    * sessions not created via `create`). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    Tables.AllTables.foreach { name =>
      Tables.t(spark, dir, name).createOrReplaceTempView(name)
    }
  }
}
