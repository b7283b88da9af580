package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{BatchingQueries, CurationQueries, ExtensionQueries, ExtraQueries, PipelineQueries, RelationalQueries, RetrievalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps SURVEY.md §2's operator inventory (plus the LLM-pipeline
  * extension ops) onto the driver's testdata tables; `oracleSql` holds the
  * DuckDB-equivalent SQL for the driver's hash-compare gate.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Regional-revenue join chain (J1 + A-class agg + broadcast dims). */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q03_regional_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExtensionQueries.queries ++ ExtraQueries.queries ++
      PipelineQueries.queries ++ BatchingQueries.queries ++ CurationQueries.queries ++
      RetrievalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++ ExtensionQueries.oracleSql ++ ExtraQueries.oracleSql ++
      PipelineQueries.oracleSql ++ BatchingQueries.oracleSql ++ CurationQueries.oracleSql ++
      RetrievalQueries.oracleSql
}
