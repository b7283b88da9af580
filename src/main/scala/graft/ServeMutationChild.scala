package graft

import org.apache.spark.sql.SparkSession

/** The CROSS-PROCESS mutator for [[ServeMutation]]'s `xproc` mode
  * (round 14): runs the exact same store-lifecycle script, but from its
  * OWN JVM with its own SparkSession, against store paths the serving
  * JVM is live on. This is the multi-writer reality a deployed store
  * faces — and the one configuration the in-process `StoreGate` cannot
  * fence: the serving JVM's only guards here are the committed-epoch
  * snapshot, the version-token cache keys, and the optimistic SUBSET
  * bracket. ServeMutation's ledger assertions (no 5xx, no torn state,
  * final-state exactness) therefore exercise the optimistic bracket as
  * the PRIMARY mechanism, which the round-13 verdict flagged as never
  * measured.
  *
  * Usage (spawned by ServeMutation, runnable by hand):
  *   ServeMutationChild <lexStore> <vecStore> <appendParquet>
  *                      <deleteIdsParquet> <pauseMs>
  * Prints one `[mut-child] <name> <wallMs>` line per landed mutation;
  * the parent parses these for its walls table.
  */
object ServeMutationChild {
  def main(args: Array[String]): Unit = {
    val Array(lex, vec, appendPath, deletePath, pauseMsStr) = args.take(5)
    val pauseMs = pauseMsStr.toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CHILD_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val appendBatch = spark.read.parquet(appendPath)
    val deleteIds = spark.read.parquet(deletePath)
    val muts = ServeMutation.mutations(spark,
      ServeMutation.Fixture("", lex, vec), appendBatch, deleteIds)
    // settle: the parent starts clients first; mirror the in-process
    // pacing (quiet serving, then one mutation per pause window)
    Thread.sleep(pauseMs)
    muts.foreach { case (name, m) =>
      val t0 = System.nanoTime()
      m()
      println(s"[mut-child] $name ${(System.nanoTime() - t0) / 1000000L}")
      Console.flush()
      Thread.sleep(pauseMs)
    }
    println("[mut-child] done")
    spark.stop()
  }
}
