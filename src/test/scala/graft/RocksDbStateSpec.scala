package graft

import org.apache.spark.sql.functions._

/** Scale-grade state backend: the default in-memory (HDFS-backed) state
  * store keeps every key on-heap — at production cardinalities the
  * executors OOM long before the data is big. RocksDB spills state to
  * local disk with bounded memory, which is what a real deployment runs.
  * This spec proves the engine's stateful streaming ops are
  * provider-agnostic by running the dedup gate on RocksDB end to end and
  * checking the progress metrics actually report the RocksDB provider. */
class RocksDbStateSpec extends SparkSpec {

  test("streaming exact dedup runs on the RocksDB state store provider") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Long)] // (event_id, secs)
      val events = mem.toDF().toDF("event_id", "secs")
        .withColumn("ts", expr("timestamp_micros(secs * 1000000)"))
      val q = graft.streaming.EventStreams.dedupedEvents(
          events, Seq("event_id"), "10 minutes")
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("append").start()
      try {
        mem.addData((1L, 0L), (2L, 1L), (1L, 2L)) // duplicate event 1
        q.processAllAvailable()
        mem.addData((2L, 3L), (3L, 4L))           // duplicate event 2
        q.processAllAvailable()
        val got = spark.table("rocks_out").select("event_id")
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got == Seq(1L, 2L, 3L), got.mkString(","))
        val p = q.lastProgress
        assert(p != null && p.stateOperators.nonEmpty, "no stateful operator ran")
        val mem0 = p.stateOperators(0).customMetrics
        // RocksDB-specific metrics prove the provider actually engaged
        assert(mem0.keySet.asScala.exists(_.toLowerCase.contains("rocksdb")),
          s"no rocksdb metrics in ${mem0.keySet}")
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  private implicit class JSetOps[T](s: java.util.Set[T]) {
    def asScala: Set[T] = {
      val b = Set.newBuilder[T]
      s.forEach(e => b += e)
      b.result()
    }
  }
}
