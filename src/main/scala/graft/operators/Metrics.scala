package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Zero-extra-pass pipeline instrumentation.
  *
  * At 100 TB, "count the rows at each stage to monitor the pipeline" is a
  * second full scan per stage — the monitoring silently doubles the job.
  * `Dataset.observe` attaches aggregate metrics to the EXISTING action:
  * they're computed by the same tasks that run the pipeline, collected on
  * the driver as the job finishes, and cost nothing beyond the aggregate
  * arithmetic itself.
  *
  * Typical curation gate:
  * {{{
  * val (gated, obs) = Metrics.observed(cleaned, "quality_gate",
  *   count(lit(1)).as("rows"),
  *   sum(when(col("text").isNull, 1L).otherwise(0L)).as("null_texts"))
  * gated.write.parquet(out)                  // the ONLY action
  * val m = obs.get                           // rows/null_texts from that action
  * require(m("null_texts") == 0L, s"quality gate: $m")
  * }}}
  */
object Metrics {

  /** Attach observed metrics under `name`; returns the instrumented frame
    * (use it in place of `df` — metrics only materialize when an action
    * runs on the RETURNED frame) and the Observation handle whose `get`
    * blocks until that action finishes. */
  def observed(df: DataFrame, name: String,
               metrics: Column*): (DataFrame, Observation) = {
    require(metrics.nonEmpty, "at least one metric column required")
    val obs = Observation(name)
    val instrumented = df.observe(obs, metrics.head, metrics.tail: _*)
    (instrumented, obs)
  }
}
