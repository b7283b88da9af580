package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `classic.Dataset.ofRows`, which is `private[sql]` — the one
  * blessed way to wrap a custom LogicalPlan node as a DataFrame. Lives in
  * an `org.apache.spark.sql` subpackage solely to satisfy that access
  * qualifier; contains no other logic. */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Driver-side twin of `Dataset.toJSON` for LocalRelation-backed
    * frames (round 14): runs the SAME `JacksonGenerator` with the same
    * options a `toJSON` task runs — byte-identical output — but over the
    * LocalRelation's driver-resident InternalRows, so serving a k-row
    * response envelope stops costing a Spark job (measured: a 10-task
    * stage per /search response). None for any distributed plan: callers
    * keep their `toJSON.collect()` branch. */
  def localToJsonLines(df: DataFrame): Option[Seq[String]] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        val writer = new java.io.CharArrayWriter()
        val gen = new org.apache.spark.sql.catalyst.json.JacksonGenerator(
          l.schema, writer,
          new org.apache.spark.sql.catalyst.json.JSONOptions(
            Map.empty[String, String],
            df.sparkSession.sessionState.conf.sessionLocalTimeZone, ""))
        try Some(l.data.map { row =>
          gen.write(row); gen.flush()
          val s = writer.toString; writer.reset(); s
        })
        finally gen.close()
      case _ => None
    }
}
