package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** The deployable BM25-store entry point — [[VectorStoreCtl]]'s lexical
  * twin: every lifecycle operation the durable inverted index implements
  * (build / append / delete / compact / rebucket / recover / search /
  * hybrid / status), drivable from a scheduler. Mutating subcommands
  * take the store's `StoreLock` inside the operators; append/delete are
  * EPOCH-addressed, so a failed invocation is healed by re-running it
  * with the same epoch (dynamic partition overwrite replaces, never
  * duplicates — the operational property a retrying scheduler needs).
  *
  * Subcommands (first arg; parquet paths for data args):
  *  - `build <corpus> <textCol> <idCol> <nBuckets> <store>`
  *  - `append <batch> <textCol> <idCol> <epoch> <store>`   — batch cost;
  *    re-run with the same epoch to heal a failure
  *  - `delete <ids> <epoch> <store>`       — tombstones + scalar/df
  *    roll-back; zero bucket rewrites (one column-pruned postings scan)
  *  - `delete-text <docs> <textCol> <idCol> <epoch> <store>` — O(batch):
  *    deltas from re-tokenizing the supplied docs, standing postings
  *    never opened (docs must be in the store with exactly this text)
  *  - `compact <store>`                    — physically drop tombstoned
  *    postings, affected buckets only (rename-swap crash discipline)
  *  - `rebucket <store> <newBuckets>`      — full rewrite at a new
  *    bucket geometry; epochs fold to 0, history preserved
  *  - `recover <store>`                    — resolve an interrupted
  *    compact AND/OR rebucket (safe no-op when neither crashed)
  *  - `search <queries> <textCol> <idCol> <k> <maxQueryTerms> <store> [out]`
  *  - `hybrid <queries> <textCol> <vecCol> <idCol> <k> <depth>
  *            <nProbe> <rerankDepth> <corpus> <corpusVecCol>
  *            <lexStore> <vecStore> [out]`  — the store-served RAG
  *    composition (qx107): BM25 store ∪ IVF-PQ store → RRF
  *  - `status <store>`                     — live scalars, geometry,
  *    epochs, tombstones, per-bucket file counts
  */
object Bm25StoreCtl {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args) finally spark.stop()
  }

  private val usage =
    "usage: build|append|delete|delete-text|compact|rebucket|recover|search|hybrid|status ..."

  private def maybeWrite(df: org.apache.spark.sql.DataFrame,
                         out: Option[String]): Unit = out match {
    case Some(p) => df.coalesce(1).write.mode("overwrite").parquet(p)
    case None    => df.show(50, truncate = false)
  }

  private[graft] def run(spark: SparkSession, args: Array[String]): Unit =
    args(0) match {
      case "build" =>
        val Array(_, corpus, textCol, idCol, nBuckets, store) = args.take(6)
        Retrieval.writeBm25Store(spark.read.parquet(corpus), textCol, idCol,
          store, nBuckets.toInt)
        println(s"[bm25ctl] built $store ($nBuckets buckets)")
      case "append" =>
        val Array(_, batch, textCol, idCol, epoch, store) = args.take(6)
        Retrieval.appendBm25Store(spark.read.parquet(batch), textCol, idCol,
          store, epoch.toLong)
        println(s"[bm25ctl] appended epoch $epoch to $store")
      case "delete" =>
        val Array(_, ids, epoch, store) = args.take(4)
        val n = Retrieval.deleteFromBm25Store(spark, store,
          spark.read.parquet(ids), epoch.toLong)
        println(s"[bm25ctl] retracted $n docs at epoch $epoch from $store")
      case "delete-text" =>
        // O(batch): df/scalar deltas from re-tokenizing the supplied
        // docs — never opens the standing postings (the docs MUST be in
        // the store with exactly this text; see the operator contract)
        val Array(_, docsP, textCol, idCol, epoch, store) = args.take(6)
        val n = Retrieval.deleteFromBm25Store(spark, store,
          spark.read.parquet(docsP), textCol, idCol, epoch.toLong)
        println(s"[bm25ctl] retracted $n docs at epoch $epoch from $store (text path)")
      case "compact" =>
        val removed = Retrieval.compactBm25Store(spark, args(1))
        println(s"[bm25ctl] compacted ${args(1)}: $removed posting rows removed")
      case "rebucket" =>
        Retrieval.rebucketBm25Store(spark, args(1), args(2).toInt)
        println(s"[bm25ctl] rebucketed ${args(1)} to ${args(2)} buckets")
      case "recover" =>
        val c = Retrieval.recoverBm25Compaction(spark, args(1))
        val r = Retrieval.recoverBm25Rebucket(spark, args(1))
        println(s"[bm25ctl] recover ${args(1)}: compact-bak=$c rebucket-bak=$r")
      case "search" =>
        val Array(_, queries, textCol, idCol, k, maxTerms, store) = args.take(7)
        maybeWrite(Retrieval.bm25TopKFromStore(spark, store,
            spark.read.parquet(queries), textCol, idCol, k.toInt,
            maxQueryTerms = maxTerms.toInt)
          .orderBy("query_id", "rank"), args.lift(7))
      case "hybrid" =>
        val Array(_, queries, textCol, vecCol, idCol, k, depth, nProbe,
          rerank, corpus, corpusVecCol, lexStore, vecStore) = args.take(13)
        maybeWrite(Retrieval.hybridTopKFromStores(spark, lexStore, vecStore,
            spark.read.parquet(queries), textCol, vecCol, idCol,
            k.toInt, depth.toInt, nProbe.toInt, rerank.toInt,
            spark.read.parquet(corpus), corpusVecCol)
          .orderBy("query_id", "rank"), args.lift(13))
      case "status" =>
        val store = args(1)
        // scalar semantics live in ONE place: Retrieval.liveStats — the
        // CLI only adds the bookkeeping columns beside it
        val st = Retrieval.liveStats(spark, store).collect().head
        val meta = spark.read.parquet(s"$store/epochs")
          .agg(max("n_buckets").as("n_buckets"), count(lit(1)).as("n_epochs"))
          .collect().head
        val tomb = Retrieval.readBm25Tombstones(spark, store).count()
        val perBucket = spark.read.parquet(s"$store/postings")
          .groupBy(col("bucket").cast("long").as("bucket"))
          .agg(count(lit(1)).as("rows"))
        println(s"[bm25ctl] $store: live_docs=${st.getLong(0)} " +
          s"total_len=${st.getLong(1)} n_buckets=${meta.getInt(0)} " +
          s"epochs=${meta.getLong(1)} tombstones=$tomb")
        perBucket.orderBy("bucket").show(100, truncate = false)
      case other =>
        System.err.println(s"unknown subcommand '$other'\n$usage")
        sys.exit(2)
    }
}
