package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash sketch aggregator (SURVEY §7.3's planned custom
  * Catalyst aggregation surface): folds shingle hashes into ONE buffer of
  * k permutation-minima instead of k separate MIN aggregate expressions.
  *
  * Same mathematical definition as Dedup.minhashSignature's k MINs
  * (h_i(x) = (a_i·x + b_i) mod P, minimum over the multiset — duplicate
  * insensitivity makes a pre-distinct unnecessary), so the two forms are
  * interchangeable; MinHashSpec asserts equality. The sketch shape is the
  * template for further sketch aggregates (HLL, CPC, quantile) where no
  * k-column decomposition exists.
  *
  * CANONICAL FORM NOTE: production plans (qx02/qx03 and the qx14 near-dup
  * pipeline) run the k-MIN *expression* form — it stays inside the codegen
  * hash aggregate and fuses with collect_set into a single pass. This
  * Aggregator is the Dataset-typed API surface (KeyValueGroupedDataset
  * composition), continuously proven equal, not the hot path.
  *
  * merge() is commutative/associative → Spark runs it map-side (partial
  * aggregation) before the doc-keyed shuffle, like any built-in agg.
  */
class MinHashAggregator(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  import TextExprs.P

  // coefficients precomputed once — reduce() runs per shingle row
  private val as = Array.tabulate(k)(TextExprs.aK)
  private val bs = Array.tabulate(k)(TextExprs.bK)

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sh: Long): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = (as(i) * sh + bs(i)) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Contract note: a group with zero rows surfaces Long.MaxValue
    * sentinels (a groupBy only emits keys with ≥1 row, so this arises only
    * under outer-join-style reuse). The k-MIN SQL form would yield null
    * there — callers composing this into new pipelines must map the
    * sentinel before comparing against that form. */
  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
