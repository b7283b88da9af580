package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence batching for LLM training: exact GLOBAL prefix sums and
  * concat-and-chunk packing of a document stream into fixed context
  * windows — without the single-partition window that the naive
  * `SUM(x) OVER (ORDER BY id)` plan degenerates to.
  *
  * Why this exists: packing assigns every document a position in the
  * concatenated token stream, which is a global running sum. Spark plans
  * an un-partitioned window as Exchange SinglePartition + one task that
  * streams the entire corpus — the textbook 100 TB scale-killer (one
  * straggler task, unbounded spill). The two-phase decomposition here
  * keeps every data-sized operation fully parallel:
  *
  *  1. range-shuffle rows by the (unique) ordering key, so partition p
  *     holds a contiguous key range and partitions are globally ordered;
  *  2. per-partition local running sums (window PARTITION BY partition id
  *     — parallel, one spillable buffer per partition);
  *  3. per-partition totals (map-side-combinable aggregate, ≤ one row per
  *     partition) → exclusive offsets via a window over that TINY frame
  *     (its single-partition stage is bounded by partition COUNT, i.e.
  *     cluster size, never data size);
  *  4. broadcast the offsets back and add.
  *
  * The decomposition is exact, not approximate: addition of longs is
  * associative, and the range shuffle preserves a total order as long as
  * the ordering key is UNIQUE and non-null (fail-fast enforced inside the
  * offsets aggregate — ties would make any running sum ill-defined in
  * both engines anyway, so a violation throws instead of mis-packing).
  */
object Packing {

  /** Exact global running sum of `valueCol` (long) in `orderCol` order,
    * appended as `outCol` — inclusive (each row's own value counted).
    * `orderCol` must be unique and non-null; `valueCol` non-null.
    * Adds two narrow columns and never single-partitions the data. */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // contiguous, globally-ordered ranges; pid stamped BEFORE any further
    // exchange so it names the range, not a later hash bucket
    val ranged0 = df.repartitionByRange(n, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // `ranged` feeds TWO consumers (local sums + offsets), and correctness
    // needs both to see the SAME range boundaries: the RangePartitioner
    // samples its bounds per exchange, so two independently-planned
    // exchanges can disagree and stamp different __pid's — offsets added
    // to the wrong ranges, silently. With exchange reuse on (default) the
    // planner dedupes the two subtrees into one exchange (pinned by
    // PackingSpec's reuse test); with it off, materialize the ranged
    // layout once so both consumers read identical partitions.
    val ranged =
      if (spark.sessionState.conf.exchangeReuseEnabled) ranged0
      else ranged0.localCheckpoint()
    val localW = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__local", sum(col(valueCol)).over(localW))
    // exclusive prefix of per-partition totals: ≤ n rows, so the
    // single-partition window is cluster-bounded, not data-bounded
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the order-key contract (unique, non-null) is ENFORCED here, not
    // comment-enforced: equal keys land in the same range partition, so a
    // per-partition rows-vs-distinct-non-null mismatch catches every
    // violation, and the guard rides the aggregate the offsets frame
    // already pays for (no extra pass over the data; the raise_error
    // evaluates on the ≤ n-row frame)
    val offsets = ranged.groupBy("__pid")
      .agg(sum(col(valueCol)).as("__ptot"),
        count(lit(1)).as("__rows"),
        countDistinct(col(orderCol)).as("__uniq"))
      .withColumn("__off",
        when(col("__rows") =!= col("__uniq"),
          raise_error(format_string(
            s"Packing.prefixSum: order column '$orderCol' must be unique " +
              "and non-null, but range partition %s holds %s rows with " +
              "only %s distinct non-null keys",
            col("__pid"), col("__rows"), col("__uniq"))).cast("long"))
          .otherwise(coalesce(sum(col("__ptot")).over(offW), lit(0L))))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .withColumn(outCol, col("__off") + col("__local"))
      .drop("__pid", "__local", "__off")
  }

  /** Concat-and-chunk packing: documents are laid head-to-tail in
    * `idCol` order into an infinite token tape, which is cut every
    * `contextLen` tokens — the standard pretraining batcher (documents
    * MAY straddle a boundary; the consumer splits them). Per surviving
    * doc (zero-token docs occupy no tape and are dropped):
    *
    *  - `start_off`   tokens on the tape before this doc
    *  - `start_pack`  window holding the doc's first token
    *  - `end_pack`    window holding its last token
    *  - `n_packs`     windows the doc touches (straddlers have > 1)
    *
    * Built on [[prefixSum]], so the whole computation is data-parallel.
    */
  def packSequential(docs: DataFrame, idCol: String, tokensCol: String,
                     contextLen: Long): DataFrame = {
    require(contextLen > 0, s"contextLen=$contextLen must be positive")
    val nonEmpty = docs.filter(col(tokensCol) > 0)
    // integer `div`, not floating `/`: double division silently loses
    // exactness once the tape position passes 2^53 tokens
    prefixSum(nonEmpty, idCol, tokensCol, "__cum")
      .withColumn("start_off", col("__cum") - col(tokensCol))
      .withColumn("start_pack", expr(s"start_off div ${contextLen}L"))
      .withColumn("end_pack", expr(s"(__cum - 1) div ${contextLen}L"))
      .withColumn("n_packs", col("end_pack") - col("start_pack") + 1)
      .drop("__cum")
  }

  /** The pack MANIFEST — the artifact a training loader actually consumes:
    * one row per (window, document) with the token slice of the document
    * that lands in that window: `pack, id, slice_start, slice_len`
    * (slice_start is 0-based within the doc; a straddling doc appears in
    * several packs with contiguous slices). Pure arithmetic on
    * [[packSequential]]'s output plus a bounded explode (a doc fans out
    * only to the packs it touches), so the manifest inherits the prefix
    * sum's data-parallel shape. Invariants (spec-enforced): per-doc
    * slices partition [0, n_tokens); every pack except the tape's last
    * sums to exactly `contextLen`. */
  def packManifest(docs: DataFrame, idCol: String, tokensCol: String,
                   contextLen: Long): DataFrame =
    packSequential(docs, idCol, tokensCol, contextLen)
      .select(col(idCol), col(tokensCol), col("start_off"),
        explode(expr("sequence(start_pack, end_pack)")).as("pack"))
      .withColumn("slice_start",
        greatest(lit(0L), col("pack") * contextLen - col("start_off")))
      .withColumn("slice_len",
        least(col(tokensCol), (col("pack") + lit(1L)) * contextLen - col("start_off"))
          - col("slice_start"))
      .select(col("pack"), col(idCol), col("slice_start"), col("slice_len"))
}
