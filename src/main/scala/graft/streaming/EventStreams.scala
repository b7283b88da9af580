package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table — the capability the
  * reference approximates with scheduled incremental batch (SURVEY §2.9:
  * no true streaming exists there; this is the north-star extension).
  *
  * Batch/stream parity: `windowedCounts` over a static DataFrame produces
  * exactly the q24_event_windows batch result, so the oracle-checked batch
  * query doubles as the streaming correctness anchor.
  */
object EventStreams {

  /** Events schema for streaming reads. The `ts` physical type has varied
    * across driver data generations (TIMESTAMP(NANOS) → long under
    * nanosAsLong; TIMESTAMP(MICROS) utc=false → TIMESTAMP_NTZ), and a
    * file-stream source needs the schema declared up front — so peek at the
    * file's footer with a batch read (metadata-only, no data scan) and
    * declare what is actually there, then normalize exactly as
    * Tables.events does for batch. */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    // the file-stream source wants a directory; glob-filter to the one table
    val raw = spark.readStream.schema(rawSchema(tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeTs(raw)
  }

  /** Tumbling-window counts + sums with a watermark for late data.
    * Works identically on a static DataFrame (batch parity). */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("val_cents"))
  }

  /** Sliding-window per-type rates. */
  def slidingRates(events: DataFrame, len: String = "1 hour", slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), len, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup — the ingest-side guard of the dedup family:
    * drop events whose key was already seen within the watermark horizon.
    * `dropDuplicatesWithinWatermark` evicts state once the watermark passes
    * a key's event time, so state is BOUNDED by (arrival rate × watermark),
    * not by stream lifetime — the difference between a dedup that runs
    * forever and one that OOMs in week two. Batch mode degrades to plain
    * dropDuplicates over the same keys. */
  def dedupedEvents(events: DataFrame, keyCols: Seq[String],
                    watermark: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Stream-stream interval join — the streaming analog of the batch
    * range join (qx28): per user, pair each purchase with the error events
    * landing inside [purchase_ts, purchase_ts + horizon].
    *
    * State hygiene: BOTH sides carry watermarks and the join condition
    * bounds event time on both ends, so Spark derives a state watermark
    * per side — a buffered purchase is evicted once the error-side
    * watermark passes its horizon end, and a buffered error once the
    * purchase-side watermark passes its timestamp. Without the time bound
    * the join would buffer both streams forever; with it, state is
    * (arrival rate × (watermark + horizon)) regardless of stream
    * lifetime. Batch mode: the same plan is a plain equi+range join —
    * callers get batch/stream parity from one definition. */
  def errorsNearPurchases(purchases: DataFrame, errors: DataFrame,
                          horizon: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame = {
    def wm(df: DataFrame) =
      if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val p = wm(purchases).select(col("event_id").as("purchase_id"),
      col("user_id"), col("ts").as("p_ts"))
    val e = wm(errors).select(col("user_id").as("e_user"), col("ts").as("e_ts"))
    p.join(e,
        col("user_id") === col("e_user") &&
          col("e_ts") >= col("p_ts") &&
          col("e_ts") <= col("p_ts") + expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("e_ts"))
  }

  /** Stream-static enrichment: look up a dimension row for every event —
    * the streaming analog of the batch broadcast dim join (J1). The static
    * side is explicitly broadcast: each micro-batch joins against the
    * dim without shuffling the stream, and Spark re-plans the static side
    * per batch (a dim refresh between batches is picked up on file-backed
    * dims). Left join: events with no dim row pass through with nulls —
    * enrichment must never drop stream rows. */
  def enrichedEvents(events: DataFrame, dim: DataFrame, keyCol: String): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), "left")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(nEvents: Long, total: Double, lastTs: Long)
  final case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                               closed: Boolean)

  /** Custom state machine: per-user session aggregation via
    * flatMapGroupsWithState — the `KeyValueGroupedDataset` path for
    * semantics windows can't express (ref analog: the ETL job state machine
    * T3 is driver-side; this is the data-plane equivalent).
    *
    * State hygiene (the 100 TB concern): a processing-time timeout of
    * `gapMs` closes and EMITS the open session of any idle user and
    * REMOVES their state — without it the final session of every user is
    * never emitted and the state store grows one entry per user forever.
    *
    * Batch mode: ProcessingTimeTimeout never fires in batch execution, so
    * each group's trailing open session is emitted eagerly with
    * `closed = false` (and no state is kept) — batch output is complete,
    * and `closed` tells the caller which sessions were gap-terminated vs
    * merely end-of-input. */
  def userSessions(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    // resolved on the driver: the closure must not capture the Dataset
    val streaming = events.isStreaming
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle past the gap: close, emit, and free the state entry
            val s = state.get
            state.remove()
            Iterator.single(UserSession(uid, s.nEvents, s.total, closed = true))
          } else {
            var s = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (s.nEvents > 0 && t - s.lastTs > gapMs) {
                out += UserSession(uid, s.nEvents, s.total, closed = true)
                s = SessionState(0L, 0.0, Long.MinValue)
              }
              s = SessionState(s.nEvents + 1, s.total + e.value, t)
            }
            if (streaming) {
              // keep the open session in state; the timeout closes it later
              state.update(s)
              state.setTimeoutDuration(gapMs)
            } else if (s.nEvents > 0) {
              // batch sees the whole group once — flush the residual now
              out += UserSession(uid, s.nEvents, s.total, closed = false)
            }
            out.iterator
          }
      }
  }
}
