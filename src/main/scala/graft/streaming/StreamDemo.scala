package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming surface drive: file-stream the events table through the
  * watermarked windowed agg into a memory sink and print the head.
  * `runMain graft.streaming.StreamDemo [sfDir]`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = EventStreams.windowedAgg(EventStreams.readStream(spark, dir))
      .writeStream.format("memory").queryName("win").outputMode("complete").start()
    q.processAllAvailable()
    val out = spark.table("win").orderBy(col("window.start"), col("event_type"))
    println(s"[stream] windows: ${out.count()}")
    out.show(8, truncate = false)
    q.stop(); spark.stop()
  }
}
