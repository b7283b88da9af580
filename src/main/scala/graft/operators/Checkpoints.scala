package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the storage behind a `localCheckpoint()`-backed frame.
  *
  * `Dataset.unpersist` only clears cache-manager entries; a local
  * checkpoint's blocks belong to the materialized RDD underneath the
  * LogicalRDD leaf, so iterative drivers (connected components, k-means)
  * must unpersist THAT rdd or every round's blocks linger in executor
  * storage until ContextCleaner gets to them. No-op on frames that are
  * not checkpoint-backed. */
private[graft] object Checkpoints {
  def release(df: DataFrame): Unit = df.queryExecution.logical match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false); ()
    case _ => ()
  }
}
