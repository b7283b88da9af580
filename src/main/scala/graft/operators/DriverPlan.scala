package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.types.StructType

/** Driver-side plan shortcuts for the SERVING hot path (round 12).
  *
  * ServeFloor's anatomy showed an uncached `/search` request is a serial
  * chain of ~45 one-task Spark jobs at ~60 ms of scheduling barrier each
  * — the wall is the JOB COUNT, not compute. Most of those jobs move
  * planning-scale data that is already driver-local (the one query row's
  * terms, a few hundred centroids, a bounded tombstone set). The cure is
  * structural, not a cache of answers: evaluate the planning-scale
  * subplans ON THE DRIVER when their inputs are provably driver-local,
  * and hand the results back to Catalyst as [[LocalRelation]]s — a
  * broadcast or collect over a LocalRelation is `LocalTableScanExec
  * .executeCollect`, which returns rows directly WITHOUT submitting a
  * job. Every shortcut here is exact-by-construction: it either runs the
  * same JVM function the codegen'd expression calls, or re-reads rows
  * Catalyst already materialized.
  *
  * None of this changes plans at corpus scale: a distributed query frame
  * never matches [[localRows]], and every caller keeps its distributed
  * branch verbatim.
  */
private[graft] object DriverPlan {

  /** The frame's rows when its OPTIMIZED plan is a LocalRelation (after
    * `ConvertToLocalRelation` folds projections/filters/limits over
    * driver-local data). `collect()` on such a plan is jobless —
    * LocalTableScanExec returns its rows without touching the scheduler.
    * None for any distributed plan: callers fall back to their ordinary
    * Spark jobs. */
  def localRows(df: DataFrame): Option[Array[Row]] =
    df.queryExecution.optimizedPlan match {
      case _: LocalRelation => Some(df.collect())
      case _ => None
    }

  /** Driver-known row count (LocalRelation only). */
  def localCount(df: DataFrame): Option[Long] =
    df.queryExecution.optimizedPlan match {
      case l: LocalRelation => Some(l.data.length.toLong)
      case _ => None
    }

  /** Materialize a SMALL distributed query frame into a LocalRelation at
    * a serving entry point (round 14). A store-serving call whose query
    * frame is corpus-BACKED (a filtered scan, a join) pays a serial job
    * chain just to PLAN: the small-query-side count gate, the probe-cell
    * collect, the distinct-terms explode, the per-query counts — each a
    * scheduling barrier over planning-scale rows that one bounded
    * collect can fetch up front, after which every downstream use hits
    * the existing LocalRelation driver twins (jobless). Frames already
    * local pass through untouched; frames that turn out larger than
    * `bound` keep their distributed plan verbatim — corpus-scale callers
    * see no change, and the bound caps driver memory (the serving
    * contract already caps the query side at [[Similarity.MaxQueryRows]]
    * anyway). Row VALUES are identical and row order is immaterial to
    * every consumer (the serving aggregations and rankings are
    * order-exact by the repo's decimal discipline). */
  def localize(df: DataFrame, bound: Int = 8192): DataFrame =
    df.queryExecution.optimizedPlan match {
      case _: LocalRelation => df
      case _ =>
        val rows = df.limit(bound + 1).collect()
        if (rows.length > bound) df
        else localFrame(df.sparkSession, rows.toIndexedSeq, df.schema)
    }

  /** A LocalRelation-backed frame from driver rows — broadcasts and
    * collects of the result are jobless. */
  def localFrame(spark: SparkSession, rows: Seq[Row],
                 schema: StructType): DataFrame = {
    val list = new java.util.ArrayList[Row](rows.size)
    rows.foreach(list.add)
    spark.createDataFrame(list, schema)
  }

  /** An Ordering replicating Spark's ASC sort for the id types the
    * stores use — needed whenever a driver-evaluated twin must break
    * ties exactly like a plan's `orderBy(id.asc)`. None for types whose
    * Spark ordering isn't replicated here (callers fall back to the
    * distributed plan). StringType goes through UTF8String: Spark orders
    * strings by UTF-8 binary comparison (code-point order), which
    * java.lang.String.compareTo (UTF-16 units) disagrees with past the
    * BMP. */
  def idOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
      case IntegerType => Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
      case ShortType => Some(Ordering.by((x: Any) => x.asInstanceOf[Short]))
      case ByteType => Some(Ordering.by((x: Any) => x.asInstanceOf[Byte]))
      case StringType => Some(new Ordering[Any] {
        def compare(a: Any, b: Any): Int =
          org.apache.spark.unsafe.types.UTF8String
            .fromString(a.asInstanceOf[String])
            .compareTo(org.apache.spark.unsafe.types.UTF8String
              .fromString(b.asInstanceOf[String]))
      })
      case _ => None
    }
  }

  // Resolved-relation memo: `spark.read.parquet(path)` pays schema
  // inference (a footer-read job past the parallel-discovery threshold)
  // and leaf-file listing PER CALL — two scheduling barriers a serving
  // request repeats for the same on-disk state. Caching the resolved
  // DataFrame (whose InMemoryFileIndex holds the listing) keyed by a
  // store-version fingerprint makes re-resolution a map lookup; any
  // landed mutation changes the caller's fingerprint and the stale
  // relation (which may reference deleted part files) is never addressed
  // again. Keys must include the session identity — DataFrames are
  // session-bound.
  private val relationMemo = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, DataFrame]): Boolean = size() > 32
    })

  // Stable per-session ids: identityHashCode can be REUSED after a
  // session is GC'd (or collide), which would alias two sessions onto one
  // cached session-bound DataFrame. A weak-keyed map hands each live
  // session a unique UUID and drops the mapping with the session, so a
  // dead session's cache entries can never be addressed again (they age
  // out of the LRU).
  private val sessionIds = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionId(spark: SparkSession): String =
    sessionIds.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString)

  /** The memoized resolved relation for `key` (caller includes path +
    * version fingerprint; the session identity is appended here). */
  def memoRelation(spark: SparkSession, key: String)
                  (resolve: => DataFrame): DataFrame = {
    val k = key + "#s" + sessionId(spark)
    val hit = relationMemo.get(k)
    if (hit != null) hit
    else { val df = resolve; relationMemo.put(k, df); df }
  }

  /** Bounded, fingerprint-keyed memo of SMALL tables served as
    * LocalRelations. Key discipline: the key must change whenever the
    * on-disk state the table derives from changes (callers key on
    * [[Retrieval.fsFingerprint]] of the table's directory — one
    * listStatus, no job), so entries are never invalidated, only
    * superseded. A result larger than `maxRows` is remembered as
    * "distributed-only" and the caller's ordinary plan is returned —
    * the memo must never hold corpus-scale data on the driver. */
  final class TableMemo(maxEntries: Int, maxRows: Int) {
    private final case class Entry(local: Option[(Seq[Row], StructType)])
    private val m = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Entry](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Entry]): Boolean =
          size() > maxEntries
      })

    /** The memoized LocalRelation twin of `compute`'s result under
      * `key`: the first call per key pays one bounded collect (the same
      * rows the downstream broadcast would have collected anyway);
      * every later call is a driver map lookup. */
    def localized(spark: SparkSession, key: String)
                 (compute: => DataFrame): DataFrame = {
      val hit = m.get(key)
      if (hit != null) hit.local match {
        case Some((rows, schema)) => localFrame(spark, rows, schema)
        case None => compute
      } else {
        val df = compute
        val limited = df.limit(maxRows + 1).collect()
        if (limited.length > maxRows) {
          m.put(key, Entry(None)); df
        } else {
          m.put(key, Entry(Some((limited.toSeq, df.schema))))
          localFrame(spark, limited.toSeq, df.schema)
        }
      }
    }
  }
}
