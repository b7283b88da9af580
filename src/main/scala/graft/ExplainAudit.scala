package graft
import org.apache.spark.sql.SparkSession
/** Plan-audit utility: prints scan pushdown + join strategy summaries for
  * headline queries (run: runMain graft.ExplainAudit [sfDir]). */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val queryNames =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_filter_project", "q03_regional_revenue", "q04_topk_orders",
               "q01_pricing_summary", "qx02_minhash_signature",
               "qx13_bucket_top_pairs", "qx22_ivf_ann", "qx01_dedup_exact",
               "qx30_decontaminate", "qx35_incremental_neardup",
               "qx34_curation_pipeline", "qx57_gopher_rules",
               "qx58_dsir_weights", "qx64_pq_adc_search", "qx65_curation_v2",
               "qx67_ivfpq_search", "qx70_ivfpq_refine", "qx71_cluster_sample")
    val full = sys.env.contains("GRAFT_EXPLAIN_FULL")
    for (q <- queryNames) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, dir)
      val formatted = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
      val plan = df.queryExecution.toString
      if (full) println(df.queryExecution.optimizedPlan.toString)
      plan.linesIterator.filter(l =>
        l.contains("PushedFilters") || l.contains("DataFilters") || l.contains("BroadcastHashJoin")
        || l.contains("SortMergeJoin") || l.contains("TakeOrderedAndProject")
        || l.contains("ReadSchema")).take(8).foreach(l => println("  " + l.trim.take(250)))
      println("  codegen units: " + formatted.linesIterator.count(_.contains("WholeStageCodegen")))
    }
    spark.stop()
  }
}
