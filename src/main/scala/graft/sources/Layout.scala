package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}

/** Multi-dimensional file layout: write a table z-order-clustered on two
  * columns so parquet min/max stats skip files for filters on EITHER
  * column (a single-column sort only helps its own column; every other
  * file spans the full range of the rest).
  *
  * Mechanics: compute the Morton key (codegen'd `graft_zorder`),
  * range-partition on it so files tile the z-curve, sort within each
  * partition so row groups tile it too, drop the key, write. Readers
  * need nothing special — engine-native min/max pruning does the skipping
  * (LayoutSpec measures it directly from per-file stats). */
object Layout {

  /** Write `df` z-ordered on (xCol, yCol) into ~`targetFiles` files.
    * Both columns must be bigint; values are clustered on their low
    * `bits` bits (pre-scale wider domains before calling). */
  def zorderWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                  bits: Int, targetFiles: Int): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    GraftFunctions.register(df.sparkSession)
    implicit val d: Dialect = Dialect(spark = true)
    df.withColumn("__z", expr(TX.zorderAuto(xCol, yCol, bits)))
      .repartitionByRange(targetFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Baseline for comparison: linear sort on one column, same file count. */
  def linearWrite(df: DataFrame, path: String, sortCol: String,
                  targetFiles: Int): Unit = {
    require(targetFiles > 0, "targetFiles must be positive")
    df.repartitionByRange(targetFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max envelope of two columns — the same stats parquet
    * footers carry, read back through one scan (input_file_name groups).
    * `filesIntersecting` on this frame predicts scan-time file skipping. */
  def fileEnvelopes(spark: org.apache.spark.sql.SparkSession, path: String,
                    xCol: String, yCol: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(xCol)).as("x_min"), max(col(xCol)).as("x_max"),
        min(col(yCol)).as("y_min"), max(col(yCol)).as("y_max"))

  /** How many files a box filter x∈[x0,x1] ∧ y∈[y0,y1] must read. */
  def filesIntersecting(envelopes: DataFrame,
                        x0: Long, x1: Long, y0: Long, y1: Long): Long =
    envelopes.filter(col("x_max") >= x0 && col("x_min") <= x1 &&
      col("y_max") >= y0 && col("y_min") <= y1).count()
}
