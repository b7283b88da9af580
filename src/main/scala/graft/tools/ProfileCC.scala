package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase profile of qx29: pairs pipeline vs CC rounds. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val pairs = phase("pairs (near-dup pipeline)") {
      val p = graft.operators.Dedup.nearDupPipeline(docs, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
        .select("doc_a", "doc_b")
        .persist()
      println(s"[profile] n_pairs = ${p.count()}")
      p
    }
    val cc = phase("connectedComponents") {
      val c = graft.operators.Graph.connectedComponents(pairs, "doc_a", "doc_b")
      println(s"[profile] n_nodes = ${c.count()}")
      c
    }
    phase("sizes+join") {
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("group_size"))
      println(s"[profile] rows = ${cc.join(sizes, "component").count()}")
    }
    spark.stop()
  }
}
