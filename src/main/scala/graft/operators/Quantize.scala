package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, TextExprs => TX}

/** Int8 embedding quantization — the storage/IO compression a 100 TB
  * embedding corpus runs on. A float32 corpus quantized to int8 + one
  * float scale per vector is ~4× smaller on disk AND in shuffle, which at
  * this scale is the difference between an ANN index that fits executor
  * memory and one that spills.
  *
  * Scheme: symmetric per-vector scaling — s = max|v|/127, q_i =
  * floor(v_i/s + 0.5) ∈ [-127, 127], v̂_i = q_i·s, per-dim error ≤ s/2.
  * Engine-portable arithmetic (TextExprs.quant*): the qx52 oracle
  * recomputes scales/codes/errors in DuckDB and hash-matches, so the
  * quantizer itself is under the same gate as every operator. */
object Quantize {
  private implicit val d: Dialect = Dialect(spark = true)

  /** (idCol, q_scale float, q_codes array<tinyint>) — the storage form.
    * The scale is materialized as a column BEFORE the code lambda uses it:
    * inlining the max-abs fold into the per-element expression would
    * re-run it per element — O(d²) per vector. */
  def toInt8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol),
        expr(TX.quantScale(vecCol)).as("__s"))
      .select(col(idCol),
        col("__s").cast("float").as("q_scale"),
        expr(d.map(TX.quantCodes(vecCol, "__s"), "c", "CAST(c AS TINYINT)"))
          .as("q_codes"))

  /** Reconstruct float vectors from the storage form (lossy: per-dim
    * error ≤ q_scale/2). */
  def dequantize(quantized: DataFrame, idCol: String): DataFrame =
    quantized.select(col(idCol),
      expr("transform(q_codes, c -> CAST(CAST(c AS DOUBLE) * q_scale AS FLOAT))")
        .as("embedding"))
}
