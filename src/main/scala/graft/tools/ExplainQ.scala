package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
    df.count() // let AQE finalize
    val plan = df.queryExecution.executedPlan.toString
    println("scans=" + (plan.split("Scan parquet").length - 1))
    println("exchanges=" + (plan.split("Exchange").length - 1))
    println("reused=" + (plan.split("ReusedExchange").length - 1))
    spark.stop()
  }
}
