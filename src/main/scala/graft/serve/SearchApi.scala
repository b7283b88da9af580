package graft.serve

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Quantize, Retrieval}
import graft.sources.Serve

/** Serving surface for the retrieval layer — the round-10 closure of the
  * reference's defining property that EVERY capability is served
  * (src/api/main.py:163-210, src/sec_mcp/server.py:147-181): the hybrid
  * store-served search (qx107/qx114), the lexical store (qx100 family),
  * and the positional phrase search (qx115) get an HTTP route
  * (`/search`, [[ApiServer]]) and an MCP tool (`search_corpus`,
  * [[McpTools]]) over [[GraftConfig]]-declared store paths.
  *
  * Same split as [[FinancialApi]]: this class is route semantics as pure
  * (status, contentType, body) functions — unit-testable without
  * sockets; the shells bind them. Every mode serves from the PERSISTED
  * stores at pruned-scan cost (bucket IN / probed cells); the only
  * driver-side data are the k-bounded result lists the render edge
  * collects.
  *
  * Query vectors are CALLER-SUPPLIED (the standard vector-store wire
  * contract — Qdrant/Weaviate/pgvector all take the embedding in the
  * request): this container embeds nothing, so `hybrid`/`vector` modes
  * need the POST body's `vector` array. `lexical`/`phrase` work from
  * text alone and are GET-able.
  */
final class SearchApi(spark: SparkSession, conf: SearchApi.RetrievalConf,
                      cache: Option[ResultCache] = None) {

  import FinancialApi.Response

  private def now(): String = java.time.Instant.now().toString

  // Serving-tuned child session (round 11): the shared session's shuffle
  // width is sized for BUILD work (corpus shuffles want all the cores);
  // a serving request's exchanges move k-bounded / planning-scale rows,
  // where a 32-wide shuffle is pure task-scheduling overhead AND hogs
  // the cores concurrent requests need. The child shares the
  // SparkContext (same executors, caches, registered functions get
  // re-registered per session by the operators) but narrows this API's
  // exchanges to `retrieval.serving_shuffle_partitions`. Each request
  // also tags the `graft-serve` FAIR pool: under a FAIR-scheduled
  // context, short serving jobs from concurrent requests share cores
  // instead of queueing whole-job FIFO (a no-op under FIFO).
  private val serveSpark: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions",
      conf.servingShufflePartitions.toString)
    // AQE OFF for serving plans (round 12): every serving stage is
    // k-bounded or planning-scale, so AQE's value (runtime re-planning
    // of big exchanges) is zero here while its cost is the serving
    // floor itself — it materializes each exchange as its OWN job, so a
    // request pays one scheduling barrier per shuffle instead of one
    // job per action, and broadcast builds serialize behind the stage
    // loop instead of all submitting in prepare(). ServeFloor measured
    // the difference; build/batch sessions keep AQE.
    s.conf.set("spark.sql.adaptive.enabled", "false")
    // partition discovery on the serving reads lists bucket/cell dirs;
    // beyond 32 paths Spark launches a LISTING JOB per read — two more
    // scheduling barriers per request. A driver-side listStatus of a few
    // thousand dirs is faster than any job here.
    s.conf.set("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
    s
  }

  private def envelope(df: DataFrame): String = Serve.toJsonEnvelope(df, now())

  private def error(status: Int, message: String): Response =
    Response(status, "application/json",
      s"""{"success":false,"timestamp":"${Serve.jsonEscape(now())}","detail":"${Serve.jsonEscape(message)}"}""")

  // the rescore corpus (exact vectors) — lazily once per API instance,
  // metadata only (no materialization). None ⇒ the vector store's own
  // `.vectors` sidecar rescores — the lake-free deployment shape.
  private lazy val corpusOpt = conf.corpusPath.map(serveSpark.read.parquet)
  // the query-id cast target: the corpus when declared, else the store's
  // own cell schema (both carry the id column the store was built with)
  private lazy val idType = corpusOpt.getOrElse(serveSpark.read.parquet(conf.vecStore))
    .schema.apply(conf.idCol).dataType

  // The synthetic query id must not collide with a REAL corpus id: the
  // ANN search tails exclude self-matches (neighbor_id == query_id), so
  // a colliding id would silently ban that document from every vector/
  // hybrid answer. Numeric id types get their MinValue (never a real
  // doc id in practice); string ids get a NUL-framed sentinel no
  // tokenizer-built corpus carries.
  private lazy val queryIdLit: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.types._
    idType match {
      case LongType    => lit(Long.MinValue)
      case IntegerType => lit(Int.MinValue)
      case ShortType   => lit(Short.MinValue.toInt).cast(idType)
      case StringType  => lit("\u0000graft-query\u0000")
      case other       => lit("0").cast(other) // documented residual risk
    }
  }

  private def queryFrame(text: String): DataFrame = {
    import serveSpark.implicits._
    Seq(text).toDF(conf.textCol)
      .select(queryIdLit.cast(idType).as(conf.idCol), col(conf.textCol))
  }

  private def queryFrameVec(text: String, vec: Seq[Float]): DataFrame = {
    import serveSpark.implicits._
    Seq((text, vec)).toDF(conf.textCol, conf.vecCol)
      .select(queryIdLit.cast(idType).as(conf.idCol),
        col(conf.textCol), col(conf.vecCol))
  }

  private def allowFrame(ids: Seq[String]): DataFrame = {
    import serveSpark.implicits._
    ids.toDF("__aid").select(col("__aid").cast(idType).as(conf.idCol))
  }

  /** One search call. `mode`: `hybrid` (default; needs `vector`),
    * `vector` (needs `vector`), `lexical`, `phrase`, `proximity`
    * (`window` positions, any order). `allowedIds` non-empty ⇒ the
    * filtered serving paths (qx111/qx114 semantics: candidates fenced
    * before ranking, statistics corpus-global). */
  def search(text: String, vector: Seq[Float], k: Int, mode: String,
             allowedIds: Seq[String], window: Int = 12,
             includeText: Boolean = false,
             requireAll: Boolean = false): Response = cache match {
    // cacheless deployments still get admission control: every request
    // is an uncached compute here, exactly the population the slot
    // bound exists for (round 14 — the first probe ran this config and
    // the gate, wired only into the cache-keyed path, never applied)
    case None => admitted[Response](identity)(
      searchCompute(text, vector, k, mode, allowedIds, window,
        includeText, requireAll))
    case Some(c) =>
      // Mutation-exact caching: the key CARRIES each depended-on store's
      // version token (a FileSystem-metadata fingerprint — a few
      // listStatus calls, no Spark job), so a landed mutation changes
      // the key and the stale entry is simply never addressed again
      // (TTL+LRU retire it). Only the stores a mode actually reads are
      // in its key: a vector-store append must not evict lexical
      // answers, and vice versa. Lexical answers deliberately SURVIVE
      // compaction (the token is the epochs-table fingerprint, which
      // compaction never touches — it moves filtering cost, never the
      // answer). Only 200s are cached; the rendered envelope keeps its
      // compute-time timestamp, exactly like the financial routes.
      val ver = cacheVer(mode, includeText, hasVector = vector.nonEmpty)
      val key = cacheKey(c, ver, mode, text, vector, k, window, allowedIds,
        includeText, requireAll)
      c.get(key) match {
        case Some(body) => Response(200, "application/json", body)
        case None =>
          // SINGLE-FLIGHT (round 13): a landed mutation invalidates every
          // affected key at once, so concurrent clients stampede the SAME
          // fresh keys — the first requester computes, the rest wait on
          // its in-flight future instead of duplicating multi-second
          // uncached computes (the classic cache-stampede fix; exactness
          // unchanged — waiters receive the exact response the winner
          // cached).
          val mine = new java.util.concurrent.CompletableFuture[Response]()
          val raced = inFlight.putIfAbsent(key, mine)
          if (raced != null)
            try raced.get(120, java.util.concurrent.TimeUnit.SECONDS)
            catch { case _: java.util.concurrent.TimeoutException =>
              error(503, "in-flight compute timed out; retry") }
          else {
            try {
              val r = coalescedCompute(c, key, text, vector, k, mode,
                allowedIds, window, includeText, requireAll)
              mine.complete(r)
              r
            } catch {
              case e: Throwable => mine.completeExceptionally(e); throw e
            } finally inFlight.remove(key)
          }
      }
  }

  // in-flight uncached computes, keyed like the cache — see search()
  private val inFlight = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.CompletableFuture[FinancialApi.Response]]()

  // ---- Admission control (round 14) ---------------------------------------
  // Past the engine's concurrency sweet spot, extra uncached computes only
  // queue inside Spark's FAIR scheduler: the round-13 probe measured n=32
  // clients at LOWER throughput than n=16 (6.81 < 7.21 req/s) with p50
  // 4.66 s — pure queueing delay with everyone admitted. A fair semaphore
  // bounds concurrent LEADER computes (cache hits, single-flight waiters
  // and gather followers never take a slot — they ride an admitted
  // compute's future); an arrival that cannot get a slot within
  // admissionWaitMs is shed with 429 + Retry-After instead of joining an
  // unbounded queue, so tails stay bounded by wait + one compute and
  // sustained overload degrades to explicit backpressure, not collapse.
  private val computeSlots =
    new java.util.concurrent.Semaphore(conf.maxConcurrentComputes, true)

  private def busyResponse: Response =
    Response(429, "application/json",
      s"""{"success":false,"timestamp":"${Serve.jsonEscape(now())}",""" +
        s""""detail":"engine saturated (${conf.maxConcurrentComputes} """ +
        """concurrent computes); retry shortly"}""",
      headers = Map("Retry-After" -> "1"))

  /** Run `body` holding a compute slot; `busy(429-response)` when
    * saturation outlasts the admission wait. */
  private def admitted[T](busy: Response => T)(body: => T): T = {
    val got =
      try computeSlots.tryAcquire(conf.admissionWaitMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      catch { case _: InterruptedException => false }
    if (!got) busy(busyResponse)
    else try body finally computeSlots.release()
  }

  // ---- Stampede coalescer (round 13) --------------------------------------
  // After a mutation invalidates the cache, DISTINCT uncached keys arrive
  // nearly simultaneously and each is a multi-second, multi-job compute —
  // ServeMutation measured the refill draining FIFO at the engine's
  // uncached throughput, with tail requests waiting out the whole queue.
  // Misses of one batchable shape (same mode/k/window/flags/allow-list)
  // therefore GATHER for a few milliseconds and run as ONE parameterized
  // multi-query plan (the /search batch machinery), so a 12-key refill is
  // ~3 batched computes (one per mode) instead of 12 serialized ones.
  // Exactness unchanged: the batch path is envelope-identical to the
  // single route (spec-pinned) and each item caches under its own key.
  private final case class GatherKey(mode: String, k: Int, window: Int,
                                     includeText: Boolean, requireAll: Boolean,
                                     hasVector: Boolean, allowKey: String)
  private final class Gather {
    var open = true
    val items = scala.collection.mutable.ArrayBuffer.empty[
      (String, Seq[Float], String,
        java.util.concurrent.CompletableFuture[Response])]
  }
  private val gathers =
    new java.util.concurrent.ConcurrentHashMap[GatherKey, Gather]()
  private val gatherLock = new Object
  // paid only under a detected stampede (see coalescedCompute): a
  // solitary uncached miss skips the window entirely
  private val GatherWindowMs = 30L

  private def coalescedCompute(c: ResultCache, key: String, text: String,
                               vector: Seq[Float], k: Int, mode: String,
                               allowedIds: Seq[String], window: Int,
                               includeText: Boolean,
                               requireAll: Boolean): Response = {
    // requests the single route would 400 on (per-item conditions) must
    // not join a batch — they'd silently serve empty instead of erroring
    val needsVector = mode == "hybrid" || mode == "vector"
    val batchable = !(needsVector && vector.isEmpty) &&
      !(mode != "vector" && text.trim.isEmpty)
    if (!batchable) {
      val r = admitted[Response](identity)(
        searchCompute(text, vector, k, mode, allowedIds, window,
          includeText, requireAll))
      if (r.status == 200) c.put(key, r.body)
      return r
    }
    val gk = GatherKey(mode, k, window, includeText, requireAll,
      vector.nonEmpty, allowedIds.sorted.mkString(","))
    val fut = new java.util.concurrent.CompletableFuture[Response]()
    // (isLeader, stampede): a leader only pays the gather window when the
    // registration moment shows a CONCURRENT uncached population — another
    // open gather, or another in-flight compute besides this request's own
    // entry. That is the cache-refill stampede's signature (a mutation
    // invalidates many keys at once); a solitary miss has neither and the
    // fixed 30 ms sleep was a pure latency tax on it (round-14 fix —
    // single-request floor drifted 956→1269 ms partly on this).
    val (isLeader, stampede) = gatherLock.synchronized {
      val cur = gathers.get(gk)
      if (cur != null && cur.open) {
        cur.items += ((text, vector, key, fut)); (false, false)
      } else {
        val others = gathers.size > (if (cur != null) 1 else 0)
        val g = new Gather
        g.items += ((text, vector, key, fut))
        gathers.put(gk, g)
        (true, others || inFlight.size() > 1)
      }
    }
    // followers: bounded wait — a wedged leader must surface as a 503
    // here, never as a hung connection
    if (!isLeader)
      return try fut.get(120, java.util.concurrent.TimeUnit.SECONDS)
      catch { case _: java.util.concurrent.TimeoutException =>
        error(503, "coalesced compute timed out; retry") }
    // LEADER: everything from here must drain the gather on ANY failure
    // (an exception between registration and completion would otherwise
    // strand queued followers on their futures forever)
    try {
      if (stampede) Thread.sleep(GatherWindowMs)
      val batch = gatherLock.synchronized {
        val g = gathers.remove(gk); g.open = false; g.items.toSeq
      }
      def completeAll(rs: Seq[Response]): Unit =
        batch.zip(rs).foreach { case ((_, _, bkey, bfut), r) =>
          if (r.status == 200) c.put(bkey, r.body)
          bfut.complete(r)
        }
      try {
        // ONE admission slot per leader: the gathered batch is one
        // engine compute; a shed leader 429s every gathered item (none
        // cached), which is the explicit-backpressure contract
        if (batch.size == 1) {
          val r = admitted[Response](identity)(
            searchCompute(text, vector, k, mode, allowedIds, window,
              includeText, requireAll))
          completeAll(Seq(r))
        } else admitted[Unit](b => completeAll(Seq.fill(batch.size)(b))) {
          computeBatchEnvelopes(batch.map(b => (b._1, b._2)), k, mode,
            allowedIds, window, includeText, requireAll) match {
            case Right(envs) =>
              completeAll(envs.map(Response(200, "application/json", _)))
            case Left(resp) if resp.status == 501 =>
              // exotic id type: no batch frames — fall back to singles
              completeAll(batch.map(b => searchCompute(b._1, b._2, k, mode,
                allowedIds, window, includeText, requireAll)))
            case Left(resp) =>
              // a shared-parameter refusal (bad k/window/mode) or a store
              // outage applies to every gathered item identically
              completeAll(Seq.fill(batch.size)(resp))
          }
        }
      } catch {
        case e: Throwable =>
          batch.foreach(_._4.completeExceptionally(e)); throw e
      }
    } catch {
      case e: Throwable =>
        // drain the gather if it is still registered (failure before the
        // normal removal) and fail every queued follower
        val g = gatherLock.synchronized {
          val cur = gathers.get(gk)
          if (cur != null && cur.items.exists(_._4 eq fut)) {
            cur.open = false; gathers.remove(gk); cur
          } else null
        }
        if (g != null) g.items.foreach(_._4.completeExceptionally(e))
        if (!fut.isDone) fut.completeExceptionally(e)
        throw e
    }
    fut.get()
  }

  /** The depended-on stores' version-token prefix of every cache key —
    * computed once per request (and once per BATCH: every item shares
    * it, which is what makes single- and batch-served entries
    * interchangeable in the cache). */
  private def cacheVer(mode: String, includeText: Boolean,
                       hasVector: Boolean): String = {
    val needsVec = mode == "hybrid" || mode == "vector" ||
      (mode == "snippet" && hasVector)
    val needsLex = (mode != "vector" && mode != "fielded") || includeText
    (if (needsLex) Retrieval.storeVersion(spark, conf.lexStore)
     else "-") + "/" +
      (if (needsVec) Quantize.servingStateToken(spark, conf.vecStore)
       else "-") + "/" +
      conf.corpusPath.filter(_ => needsVec)
        .map(p => Retrieval.fsFingerprint(spark, Seq(p))).getOrElse("-") + "/" +
      (if (mode == "fielded")
         conf.fieldedStore.map(Retrieval.storeVersion(spark, _)).getOrElse("-")
       else "-")
  }

  /** One query's cache key — IDENTICAL between the single-query route
    * and a batch item carrying the same payload, so a batch fills the
    * cache for later singles and vice versa. */
  private def cacheKey(c: ResultCache, ver: String, mode: String,
                       text: String, vector: Seq[Float], k: Int, window: Int,
                       allowedIds: Seq[String], includeText: Boolean,
                       requireAll: Boolean): String =
    c.key("search",
      "ver" -> ver, "mode" -> mode,
      "q" -> ResultCache.md5hex(text),
      "vec" -> (if (vector.isEmpty) "-"
                else ResultCache.md5hex(vector.mkString(","))),
      "k" -> k, "window" -> window,
      "allow" -> (if (allowedIds.isEmpty) "-"
                  else ResultCache.md5hex(allowedIds.sorted.mkString(","))),
      "text" -> includeText, "all" -> requireAll)

  /** The fused hybrid ranking — ONE dispatch over (rescore source,
    * allow-list) shared by mode=hybrid and mode=snippet-with-vector, so
    * the two cannot diverge. Served through
    * [[Retrieval.hybridTopKFromStoresServed]] (round 12): the two legs
    * run as concurrent actions and the RRF fusion is the driver-side
    * exact twin of the gated plan fusion — RetrievalServingParitySpec
    * pins the equality. Takes the (id, text, vector) query frame so the
    * single-query and batch routes share it verbatim. */
  private def fusedHybrid(qv: DataFrame, k: Int,
                          allowed: Option[DataFrame]): DataFrame =
    Retrieval.hybridTopKFromStoresServed(serveSpark, conf.lexStore,
      conf.vecStore, qv, conf.textCol, conf.vecCol,
      conf.idCol, k, conf.depth, conf.nProbe, conf.rerankDepth,
      rescore = corpusOpt.map(c => (c, conf.vecCol)), allowed = allowed,
      maxQueryTerms = conf.maxQueryTerms)

  /** Recursive FILE listing of every store directory this request
    * reads — the optimistic bracket's tracked set. The needs* predicates
    * mirror the cache key's EXACTLY (round 13): bracketing a store the
    * mode never reads would let a sustained mutation stream on that
    * store fail all bracket attempts and 503 an answer that could not
    * have changed — snippet-without-vector never touches the vec store,
    * pure fielded never touches the unfielded lex store. */
  private def trackedPaths(mode: String, includeText: Boolean,
                           hasVector: Boolean): Seq[String] = {
    val needsVec = mode == "hybrid" || mode == "vector" ||
      (mode == "snippet" && hasVector)
    val needsLex = (mode != "vector" && mode != "fielded") || includeText
    (if (needsLex) Retrieval.physicalPaths(conf.lexStore) else Seq.empty) ++
      (if (needsVec) Quantize.physicalPaths(conf.vecStore) else Seq.empty) ++
      (if (mode == "fielded")
         conf.fieldedStore.toSeq.flatMap(Retrieval.physicalPaths)
       else Seq.empty)
  }

  private def physicalListing(mode: String, includeText: Boolean,
                              hasVector: Boolean): Set[String] =
    Retrieval.fsFileListing(serveSpark,
      trackedPaths(mode, includeText, hasVector))

  /** The store ROOTS this request reads — the escalated lease's lock
    * set. Every in-process installer takes [[StoreGate.writeLocked]] on
    * its store's ROOT path (Retrieval/Quantize install sites), and
    * StoreGate keys gates by exact canonical string, so a lease taken on
    * [[trackedPaths]]' SUBdirectories (postings/, df/, …) would lock
    * different objects and exclude nothing (round-14 ADVICE fix). Same
    * needs* predicates as trackedPaths/cacheVer. */
  private def gateRoots(mode: String, includeText: Boolean,
                        hasVector: Boolean): Seq[String] = {
    val needsVec = mode == "hybrid" || mode == "vector" ||
      (mode == "snippet" && hasVector)
    val needsLex = (mode != "vector" && mode != "fielded") || includeText
    (if (needsLex) Seq(conf.lexStore) else Seq.empty) ++
      (if (needsVec) Seq(conf.vecStore) else Seq.empty) ++
      (if (mode == "fielded") conf.fieldedStore.toSeq else Seq.empty)
  }

  /** Optimistic serve-under-mutation bracket (round 12): compute the
    * response between two physical-token reads and retry when they
    * differ. The committed-epoch snapshot (Retrieval.epochsInfo) already
    * makes every AT-REST store state serve exactly — half-landed
    * mutations are invisible until their commit point — but a request
    * whose several metadata reads straddle a LANDING commit could mix
    * two states (stats read pre-delete, tombstones post-delete), and
    * compaction physically swaps files mid-flight. A changed token means
    * some write landed during compute, so the answer may mix states:
    * recompute. Stable token ⇒ every listing the compute did saw one
    * on-disk state. Bounded retries; on exhaustion (a mutation storm
    * faster than compute) the honest answer is 503, not a maybe-torn
    * 200 — ServeMutation measures that this does not fire at realistic
    * mutation rates. */
  private def searchCompute(text: String, vector: Seq[Float], k: Int,
                            mode: String, allowedIds: Seq[String],
                            window: Int, includeText: Boolean,
                            requireAll: Boolean): Response = {
    // transient read failures a mutation's rename/clear window can
    // inflict on a racing request: a momentarily dataless directory
    // (schema inference fails) or a file moved between listing and open.
    // Retried with backoff up to the bracket bound — a genuinely broken
    // store still fails on the final attempt and surfaces normally.
    def transient(e: Throwable): Boolean = e match {
      case null => false
      case _: java.io.FileNotFoundException => true
      // NIO's distinct not-found type (round 14, cross-process probe):
      // a racing writer's rename/delete window surfaces as this from
      // both the NIO listing and Spark tasks; cause-chain recursion
      // below also catches it wrapped in UncheckedIOException/SparkException
      case _: java.nio.file.NoSuchFileException => true
      case a: org.apache.spark.sql.AnalysisException =>
        a.getMessage != null && a.getMessage.contains("UNABLE_TO_INFER_SCHEMA")
      case other => transient(other.getCause)
    }
    bracketLoop(mode, includeText, vector.nonEmpty, transient) { () =>
      searchComputeOnce(text, vector, k, mode, allowedIds, window,
        includeText, requireAll)
    }
  }

  /** The bracket's attempt loop, shared by the single-query and batch
    * routes. Round-13 acceptance rule: the answer stands when every file
    * present at request start is STILL PRESENT UNCHANGED at the end
    * (subset semantics) — additive mutations (append/delete commits,
    * which the committed-epoch snapshot and plan-time listings already
    * isolate) no longer force a recompute. PER-STORE semantics, stated
    * precisely (round-14 ADVICE): each leg of the plan resolves its
    * store's listing/epoch set once and serves exactly ONE committed
    * snapshot of THAT store — never a torn half-commit — but a
    * hybrid/snippet request resolves its lexical and vector legs at
    * different instants, so an append landing between the two
    * resolutions yields lex@v(n) fused with vec@v(n+1): two adjacent
    * committed versions, the same answer a client issuing the two legs
    * as separate requests would see. The bracket does not claim a
    * cross-store transaction; it guarantees no leg observes an
    * uncommitted or physically-torn state. Only a rewrite/removal
    * mid-compute retries: the in-process installs take the StoreGate
    * write side on the store ROOT — the same key [[gateRoots]] leases —
    * and therefore CANNOT land inside a leased compute; the subset check
    * additionally catches cross-process writers, which have no lease.
    * Round 12's fingerprint-equality rule retried on every landed
    * commit; under a mutation cadence faster than a contended compute,
    * requests rode through mutation after mutation (ServeMutation
    * measured a 29 s tail for exactly this). Transients retry with
    * backoff; 503 on exhaustion. */
  private def bracketLoop(mode: String, includeText: Boolean,
                          hasVector: Boolean,
                          transient: Throwable => Boolean)
                         (once: () => Response): Response = {
    var attempt = 0
    while (attempt < 4) {
      // ESCALATION (round 13, measured): after the first subset failure
      // the store is being actively installed-into — optimistic retries
      // under a fast mutation cadence can fail 4 straight (2 measured
      // 503s/1369 under the lifecycle probe). Retries therefore take the
      // StoreGate read lease: in-process installs queue behind it, so
      // the leased attempt is deterministically consistent. Only
      // already-failed requests lease (first attempts stay optimistic),
      // which keeps the gate's writer-wait bounded and avoids the
      // whole-fleet reader convoys that leasing EVERY compute produced.
      val leased = attempt >= 1
      // one full attempt: before-listing, compute, subset check — all
      // inside the lease when escalated, so the pre-listing can't race
      // an install landing just before acquisition
      def attemptOnce(): Option[Response] = {
        val before = physicalListing(mode, includeText, hasVector)
        val resp = once()
        if (resp.status != 200) Some(resp)
        else if (before.subsetOf(
            physicalListing(mode, includeText, hasVector))) Some(resp)
        else None
      }
      val outcome =
        try {
          if (!leased) attemptOnce()
          else graft.sources.StoreGate.readLocked(
            gateRoots(mode, includeText, hasVector))(attemptOnce())
        } catch {
          case e: Exception if transient(e) && attempt < 3 =>
            Thread.sleep(50L * (attempt + 1)); None
        }
      outcome match {
        case Some(resp) => return resp
        case None => attempt += 1
      }
    }
    error(503, "stores are mutating continuously; retry")
  }

  private def searchComputeOnce(text: String, vector: Seq[Float], k: Int,
                                mode: String, allowedIds: Seq[String],
                                window: Int, includeText: Boolean,
                                requireAll: Boolean): Response = {
    val needsVector = mode == "hybrid" || mode == "vector"
    if (needsVector && vector.isEmpty)
      return error(400, s"mode '$mode' requires a query 'vector' " +
        "(this service does not embed; pass the embedding in the request)")
    if (mode != "vector" && text.trim.isEmpty)
      return error(400, s"mode '$mode' requires non-empty query text")
    computeRows(queryFrame(text), queryFrameVec(text, vector),
      vector.nonEmpty, k, mode,
      Option(allowedIds).filter(_.nonEmpty).map(allowFrame),
      window, includeText, requireAll) match {
      case Left(resp) => resp
      case Right((rows, schema)) =>
        Response(200, "application/json",
          envelope(withoutQueryId(rows, schema)))
    }
  }

  /** Re-frame collected result rows without the query_id column (the
    * single-query envelope shape; batch renders one per id group). Rows
    * arrive (query_id, rank)-ordered from [[computeRows]]. */
  private def withoutQueryId(rows: Seq[Row], schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val idx = schema.fieldIndex("query_id")
    val pruned = org.apache.spark.sql.types.StructType(
      schema.fields.toSeq.patch(idx, Nil, 1))
    val list = new java.util.ArrayList[Row]()
    rows.foreach(r => list.add(Row.fromSeq(r.toSeq.patch(idx, Nil, 1))))
    serveSpark.createDataFrame(list, pruned)
  }

  /** The shared mode dispatch over CALLER-BUILT query frames (single:
    * one sentinel-id row; batch: one row per item) — runs pool-tagged,
    * read-leased, and collects UNDER the lease so the whole read is one
    * snapshot. Returns the (query_id, rank)-ordered rows + schema. */
  private def computeRows(qt: => DataFrame, qv: => DataFrame,
                          hasVector: Boolean, k: Int,
                          mode: String, allowed: Option[DataFrame],
                          window: Int, includeText: Boolean,
                          requireAll: Boolean)
      : Either[Response, (Seq[Row], org.apache.spark.sql.types.StructType)] = {
    // per-request FAIR pool tag (thread-local): a no-op under FIFO
    serveSpark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-serve")
    if (k < 1 || k > conf.maxK)
      return Left(error(400, s"k must be in [1, ${conf.maxK}]: $k"))
    val needsVector = mode == "hybrid" || mode == "vector"
    if (needsVector && k > conf.rerankDepth)
      return Left(error(400, s"k=$k exceeds the configured rerank depth " +
        s"${conf.rerankDepth} (the exact-rescore shortlist feeds the " +
        "final ranking; raise retrieval.rerank_depth or lower k)"))
    lazy val qtF = qt
    lazy val qvF = qv
    // NO read lease here (round 13, measured): holding StoreGate's read
    // side for a whole compute was tried and REMOVED — under concurrent
    // load a fair RW gate turns multi-second leased computes into
    // write-side waits and those into queued-reader convoys
    // (ServeMutation's tail grew, not shrank). Exactness never needed
    // it: the committed-epoch snapshot pins logical state per request,
    // plan-time listings pin additive physical state, and the subset
    // bracket in [[bracketLoop]] retries the (rare, millisecond-window)
    // install straddles. StoreGate still serializes the installs
    // themselves, and remains available for explicit read leases
    // (StoreGateSpec pins those semantics).
    try {
      val result = mode match {
        case "hybrid" => fusedHybrid(qvF, k, allowed)
        case "vector" =>
          val q = qvF.select(col(conf.idCol), col(conf.vecCol))
          ((corpusOpt, allowed) match {
            case (Some(c), Some(a)) => Quantize.searchSelfContainedRefinedFiltered(
              serveSpark, conf.vecStore, q, conf.idCol, conf.vecCol, a,
              c, conf.vecCol, k, conf.nProbe, conf.rerankDepth)
            case (Some(c), None) => Quantize.searchSelfContainedRefined(serveSpark,
              conf.vecStore, q, conf.idCol, conf.vecCol,
              c, conf.vecCol, k, conf.nProbe, conf.rerankDepth)
            case (None, Some(a)) => Quantize.searchSelfContainedRefinedStoredFiltered(
              serveSpark, conf.vecStore, q, conf.idCol, conf.vecCol, a,
              k, conf.nProbe, conf.rerankDepth)
            case (None, None) => Quantize.searchSelfContainedRefinedStored(serveSpark,
              conf.vecStore, q, conf.idCol, conf.vecCol,
              k, conf.nProbe, conf.rerankDepth)
          }).withColumnRenamed("neighbor_id", "doc_id")
        case "lexical" =>
          // require_all flips OR scoring to CONJUNCTIVE (boolean-AND):
          // only docs matching every query term rank, scores unchanged
          val q = qtF
          (allowed, requireAll) match {
            case (Some(a), false) => Retrieval.bm25TopKFromStoreFiltered(serveSpark,
              conf.lexStore, q, a, conf.textCol, conf.idCol, k,
              maxQueryTerms = conf.maxQueryTerms)
            case (None, false) => Retrieval.bm25TopKFromStore(serveSpark,
              conf.lexStore, q, conf.textCol, conf.idCol, k,
              maxQueryTerms = conf.maxQueryTerms)
            case (Some(a), true) =>
              Retrieval.bm25TopKFromStoreConjunctiveFiltered(serveSpark,
                conf.lexStore, q, a, conf.textCol, conf.idCol, k,
                maxQueryTerms = conf.maxQueryTerms)
            case (None, true) => Retrieval.bm25TopKFromStoreConjunctive(serveSpark,
              conf.lexStore, q, conf.textCol, conf.idCol, k,
              maxQueryTerms = conf.maxQueryTerms)
          }
        case "fielded" =>
          // BM25F over the ONE fielded store (round 11): text-only like
          // lexical; the field weights/slopes come from the deployment
          // config (query-time parameters, not store state)
          conf.fieldedStore match {
            case None => return Left(error(503,
              "no fielded store configured (retrieval.fielded_store)"))
            case Some(fs) =>
              allowed match {
                case Some(a) => Retrieval.bm25fTopKFromStoreFiltered(serveSpark,
                  fs, conf.fieldedFields, qtF, a, conf.textCol,
                  conf.idCol, k, maxQueryTerms = conf.maxQueryTerms)
                case None => Retrieval.bm25fTopKFromStore(serveSpark, fs,
                  conf.fieldedFields, qtF, conf.textCol,
                  conf.idCol, k, maxQueryTerms = conf.maxQueryTerms)
              }
          }
        case "phrase" =>
          allowed match {
            case Some(a) => Retrieval.phraseTopKFromStoreFiltered(serveSpark,
              conf.lexStore, qtF, a, conf.textCol, conf.idCol,
              k, maxPhraseTerms = conf.maxQueryTerms)
            case None => Retrieval.phraseTopKFromStore(serveSpark, conf.lexStore,
              qtF, conf.textCol, conf.idCol, k,
              maxPhraseTerms = conf.maxQueryTerms)
          }
        case "proximity" =>
          if (window < 1 || window > 1000)
            return Left(error(400, s"window must be in [1, 1000]: $window"))
          allowed match {
            case Some(a) => Retrieval.proximityTopKFromStoreFiltered(serveSpark,
              conf.lexStore, qtF, a, conf.textCol, conf.idCol,
              k, window, maxQueryTerms = conf.maxQueryTerms)
            case None => Retrieval.proximityTopKFromStore(serveSpark, conf.lexStore,
              qtF, conf.textCol, conf.idCol, k, window,
              maxQueryTerms = conf.maxQueryTerms)
          }
        case "snippet" =>
          // RAG passage serving (qx121): each hit carries the token
          // window around the first matched query term — texts from the
          // store's raw-text sidecar, anchors from the positional
          // postings. `window` here is the snippet HALF-WIDTH in tokens
          // (per-mode meaning, like proximity's position span).
          // WITH a vector (round 11): the ranking is the HYBRID fusion
          // (identical to mode=hybrid), each fused hit snippeted —
          // lexically-matched hits anchor at their first matched term,
          // pure-vector hits get the leading window, lexically-retracted
          // hits get snippet=null (the include_text guard's semantics).
          if (window < 0 || window > 100)
            return Left(error(400, s"window must be in [0, 100] tokens: $window"))
          if (hasVector) {
            if (k > conf.rerankDepth)
              return Left(error(400, s"k=$k exceeds the configured rerank depth " +
                s"${conf.rerankDepth}"))
            Retrieval.attachSnippets(serveSpark, conf.lexStore,
              fusedHybrid(qvF, k, allowed),
              qtF, conf.textCol, conf.idCol, window,
              maxQueryTerms = conf.maxQueryTerms)
          } else allowed match {
            case Some(a) => Retrieval.snippetTopKFromStoreFiltered(serveSpark,
              conf.lexStore, qtF, a, conf.textCol, conf.idCol,
              k, window, maxQueryTerms = conf.maxQueryTerms)
            case None => Retrieval.snippetTopKFromStore(serveSpark, conf.lexStore,
              qtF, conf.textCol, conf.idCol, k, window,
              maxQueryTerms = conf.maxQueryTerms)
          }
        case other =>
          return Left(error(400,
            s"unknown mode '$other' (expected hybrid|vector|lexical|" +
              "fielded|phrase|proximity|snippet)"))
      }
      // RAG context fetch on ANY mode: attach each hit's full document
      // text from the raw-text sidecar (k-bounded join behind the hits'
      // literal dbucket filter — no lake pointer, no corpus scan).
      // Snippet mode already carries its windowed passage. The hits are
      // localCheckpoint'd first (k-bounded) — they feed the dbucket
      // planning read, the join's build side, and the join itself.
      // Deletes never touch the sidecar, so the lex tombstones are
      // anti-joined: a doc deleted from the lex store but still served
      // by the vector leg gets text=null (like an id that was never
      // lexically indexed), never its retracted text. Compaction keeps
      // this guard sound by vacuuming the purged ids' sidecar rows
      // BEFORE it clears the tombstones the anti-join relies on.
      val withText =
        if (includeText && mode != "snippet") {
          // a LocalRelation result (the served-hybrid fusion) is already
          // driver-materialized — checkpointing it would only demote the
          // jobless downstream joins to RDD scans
          val hits =
            if (graft.operators.DriverPlan.localRows(result).isDefined) result
            else result.localCheckpoint()
          val live = Retrieval.readStoreDocs(serveSpark, conf.lexStore,
              hits.select("doc_id"))
            .join(org.apache.spark.sql.functions.broadcast(
                Retrieval.readBm25Tombstones(serveSpark, conf.lexStore)),
              Seq("doc_id"), "left_anti")
          hits.join(org.apache.spark.sql.functions.broadcast(live),
            Seq("doc_id"), "left")
        } else result
      // collect UNDER the lease (and inside the error mapping): the rows
      // are k-bounded per query; callers re-frame them per envelope.
      // Driver twin of the final (query_id, rank) sort (round 14): the
      // served fusion/top-k results are LocalRelations, but Sort is not
      // folded by ConvertToLocalRelation, so orderBy().collect() was a
      // 3-stage Spark job over k driver-resident rows. Ranks are unique
      // within a query_id, so the driver sort IS the plan's ordering;
      // any distributed result (or an id type without a replicated
      // ordering, or a null sort key) falls back to the plan verbatim.
      val localSorted = for {
        rows <- graft.operators.DriverPlan.localRows(withText)
        qOrd <- graft.operators.DriverPlan.idOrdering(
          withText.schema("query_id").dataType)
        qi = withText.schema.fieldIndex("query_id")
        ri = withText.schema.fieldIndex("rank")
        if rows.forall(r => !r.isNullAt(qi) && !r.isNullAt(ri))
      } yield {
        def rankOf(r: Row): Long = r.get(ri) match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case other => other.toString.toLong
        }
        rows.sortWith { (a, b) =>
          val c = qOrd.compare(a.get(qi), b.get(qi))
          if (c != 0) c < 0 else rankOf(a) < rankOf(b)
        }.toSeq
      }
      localSorted match {
        case Some(rows) => Right((rows, withText.schema))
        case None =>
          val ordered = withText.orderBy(col("query_id"), col("rank"))
          Right((ordered.collect().toSeq, ordered.schema))
      }
    } catch {
      case e: IllegalStateException => Left(error(503,
        s"retrieval store unavailable: ${e.getMessage}"))
      // a store missing the raw-text sidecar (snippet mode on a store
      // built without storeDocs) or positional postings (phrase/
      // proximity/snippet on a pre-positional store) is a
      // deployment-shape problem, not a malformed request
      case e: IllegalArgumentException if e.getMessage != null &&
          (e.getMessage.contains("sidecar") ||
            e.getMessage.contains("positional")) =>
        Left(error(503, s"retrieval store unavailable: ${e.getMessage}"))
    }
  }

  // ---- Batch serving (round 13) -----------------------------------------
  // One POST carrying N query payloads of ONE mode/k/filter shape → ONE
  // parameterized plan over an N-row query frame (the serving entries are
  // multi-query-native — the qx suites drive them with dozens of query
  // rows), so the batch pays the per-request plan/scheduling floor once
  // instead of N times. Each item's answer is rendered as the SAME
  // envelope the single-query route produces and cached under the SAME
  // per-item key, so batch and single fills are interchangeable.

  /** Distinct per-item sentinel query ids (the single route's
    * [[queryIdLit]] reasoning, offset by the batch index). */
  private def batchIdValue(i: Int): Any = {
    import org.apache.spark.sql.types._
    idType match {
      case LongType    => java.lang.Long.valueOf(Long.MinValue + 1 + i)
      case IntegerType => Integer.valueOf(Int.MinValue + 1 + i)
      case ShortType   => java.lang.Short.valueOf((Short.MinValue + 1 + i).toShort)
      case StringType  => "\u0000graft-query-" + i + "\u0000"
      case other => throw new IllegalArgumentException(
        s"batch search needs a long/int/short/string id column " +
          s"(store id type: ${other.simpleString})")
    }
  }

  private def batchFrames(items: Seq[(Int, String, Seq[Float])])
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val tSchema = StructType(Seq(StructField(conf.idCol, idType),
      StructField(conf.textCol, StringType)))
    val vSchema = StructType(tSchema.fields.toSeq :+
      StructField(conf.vecCol, ArrayType(FloatType)))
    val tl = new java.util.ArrayList[Row]()
    val vl = new java.util.ArrayList[Row]()
    items.foreach { case (i, text, vec) =>
      tl.add(Row(batchIdValue(i), text))
      vl.add(Row(batchIdValue(i), text, vec))
    }
    (serveSpark.createDataFrame(tl, tSchema),
      serveSpark.createDataFrame(vl, vSchema))
  }

  /** Batch search: every item shares (k, mode, allowed, window,
    * include_text, require_all); items are (text, vector). Returns a 200
    * whose body is `{"success":true,...,"results":[<per-item envelope>]}`
    * in item order, each element byte-identical (timestamp aside) to the
    * single-query route's envelope for the same payload. */
  def searchBatch(items: Seq[(String, Seq[Float])], k: Int, mode: String,
                  allowedIds: Seq[String], window: Int = 12,
                  includeText: Boolean = false,
                  requireAll: Boolean = false): Response = {
    if (items.isEmpty)
      return error(400, "batch 'queries' must be a non-empty array")
    if (items.size > 64)
      return error(400, s"batch too large: ${items.size} queries (max 64)")
    val needsVector = mode == "hybrid" || mode == "vector"
    items.zipWithIndex.foreach { case ((text, vec), i) =>
      if (needsVector && vec.isEmpty)
        return error(400, s"queries[$i]: mode '$mode' requires a 'vector'")
      if (mode != "vector" && text.trim.isEmpty)
        return error(400, s"queries[$i]: mode '$mode' requires non-empty text")
      if (mode == "snippet" && items.exists(_._2.nonEmpty) != vec.nonEmpty)
        return error(400, "queries[]: snippet batches must be uniformly " +
          "with-vector or without (the two rank differently)")
    }
    val out = new Array[String](items.size)
    // per-item cache keys — identical to the single route's, so hits flow
    // both ways; version prefix computed once per batch
    val keyed = cache.map { c =>
      val ver = cacheVer(mode, includeText,
        hasVector = items.exists(_._2.nonEmpty))
      items.zipWithIndex.map { case ((text, vec), i) =>
        val key = cacheKey(c, ver, mode, text, vec, k, window, allowedIds,
          includeText, requireAll)
        c.get(key).foreach(body => out(i) = body)
        key
      }
    }
    val missing = items.indices.filterNot(i => out(i) != null)
    if (missing.nonEmpty) {
      // one admission slot per batch compute (all-hit batches never wait)
      admitted[Either[Response, Seq[String]]](Left(_))(
        computeBatchEnvelopes(missing.map(items), k, mode, allowedIds,
          window, includeText, requireAll)) match {
        case Left(resp) => return resp
        case Right(envs) =>
          missing.zip(envs).foreach { case (i, env) =>
            out(i) = env
            for (c <- cache; keys <- keyed) c.put(keys(i), env)
          }
      }
    }
    Response(200, "application/json",
      s"""{"success":true,"timestamp":"${Serve.jsonEscape(now())}",""" +
        s""""count":${items.size},"results":[${out.mkString(",")}]}""")
  }

  /** ONE bracketed, leased batch compute over `items` (text, vector) —
    * one parameterized plan; returns the per-item envelopes in item
    * order. Shared by [[searchBatch]] and the stampede coalescer. */
  private def computeBatchEnvelopes(items: Seq[(String, Seq[Float])],
                                    k: Int, mode: String,
                                    allowedIds: Seq[String], window: Int,
                                    includeText: Boolean, requireAll: Boolean)
      : Either[Response, Seq[String]] = {
    val pending = new java.util.HashMap[Int, String]()
    def transient(e: Throwable): Boolean = e match {
      case null => false
      case _: java.io.FileNotFoundException => true
      // NIO's distinct not-found type (round 14, cross-process probe):
      // a racing writer's rename/delete window surfaces as this from
      // both the NIO listing and Spark tasks; cause-chain recursion
      // below also catches it wrapped in UncheckedIOException/SparkException
      case _: java.nio.file.NoSuchFileException => true
      case a: org.apache.spark.sql.AnalysisException =>
        a.getMessage != null &&
          a.getMessage.contains("UNABLE_TO_INFER_SCHEMA")
      case other => transient(other.getCause)
    }
    val resp = bracketLoop(mode, includeText,
      hasVector = items.exists(_._2.nonEmpty), transient) { () =>
      pending.clear()
      val batch = items.zipWithIndex.map { case ((t, v), i) => (i, t, v) }
      val (qt, qv) =
        try batchFrames(batch)
        catch { case e: IllegalArgumentException =>
          return Left(error(501, e.getMessage)) }
      computeRows(qt, qv, items.exists(_._2.nonEmpty), k, mode,
        Option(allowedIds).filter(_.nonEmpty).map(allowFrame),
        window, includeText, requireAll) match {
        case Left(r) => r
        case Right((rows, schema)) =>
          val idIdx = schema.fieldIndex("query_id")
          val byId = rows.groupBy(_.get(idIdx))
          items.indices.foreach { i =>
            val subset = byId.getOrElse(batchIdValue(i), Seq.empty[Row])
            pending.put(i, envelope(withoutQueryId(subset, schema)))
          }
          Response(200, "application/json", "")
      }
    }
    if (resp.status != 200) Left(resp)
    else Right(items.indices.map(pending.get))
  }

  /** GET-shaped entry (text modes only). */
  def searchGet(params: Map[String, String]): Response = {
    val mode = params.getOrElse("mode", "lexical")
    if (mode == "hybrid" || mode == "vector")
      return error(400, s"mode '$mode' needs a query vector — POST /search " +
        """with {"text":...,"vector":[...]} instead""")
    search(params.getOrElse("q", ""), Seq.empty,
      params.get("k").flatMap(_.toIntOption).getOrElse(10), mode, Seq.empty,
      params.get("window").flatMap(_.toIntOption).getOrElse(12),
      includeText = params.get("include_text")
        .exists(v => v.equalsIgnoreCase("true") || v == "1"),
      requireAll = params.get("require_all")
        .exists(v => v.equalsIgnoreCase("true") || v == "1"))
  }

  /** POST-shaped entry: {"text":..., "vector":[...], "k":10,
    * "mode":"hybrid", "allowed_ids":[...]} — or a BATCH:
    * {"queries":[{"text":...,"vector":[...]},...], "k":..., "mode":...}
    * (shared k/mode/filters; one parameterized plan serves every item —
    * the corpus-scale RAG shape). */
  def searchPost(body: String): Response = {
    val node =
      try FinancialApi.mapper.readTree(if (body.isEmpty) "{}" else body)
      catch { case e: Exception =>
        return error(400, s"invalid JSON body: ${e.getMessage}") }
    def vecOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[Float] =
      Option(n.get("vector")).filter(_.isArray).map { arr =>
        (0 until arr.size).map(i => arr.get(i).floatValue)
      }.getOrElse(Seq.empty)
    Option(node.get("queries")).filter(_.isArray).foreach { arr =>
      val items = (0 until arr.size).map { i =>
        val it = arr.get(i)
        (Option(it.get("text")).map(_.asText).getOrElse(""), vecOf(it))
      }
      return searchBatch(items,
        Option(node.get("k")).map(_.asInt).getOrElse(10),
        Option(node.get("mode")).map(_.asText).getOrElse("hybrid"),
        Option(node.get("allowed_ids")).filter(_.isArray)
          .map(FinancialApi.asStringSeq).getOrElse(Seq.empty),
        Option(node.get("window")).map(_.asInt).getOrElse(12),
        includeText = Option(node.get("include_text")).exists(_.asBoolean),
        requireAll = Option(node.get("require_all")).exists(_.asBoolean))
    }
    val vec: Seq[Float] = vecOf(node)
    search(
      Option(node.get("text")).map(_.asText).getOrElse(""),
      vec,
      Option(node.get("k")).map(_.asInt).getOrElse(10),
      Option(node.get("mode")).map(_.asText).getOrElse("hybrid"),
      Option(node.get("allowed_ids")).filter(_.isArray)
        .map(FinancialApi.asStringSeq).getOrElse(Seq.empty),
      Option(node.get("window")).map(_.asInt).getOrElse(12),
      includeText = Option(node.get("include_text")).exists(_.asBoolean),
      requireAll = Option(node.get("require_all")).exists(_.asBoolean))
  }
}

object SearchApi {

  /** The GraftConfig-declared retrieval deployment: where the two stores
    * live, optionally where the exact-vector lake table is (the refine
    * rescores from it; `None` serves from the vector store's own
    * `.vectors` sidecar — a store built with `storeVectors = true` needs
    * no lake pointer in its serving config), the column names the
    * stores were built with, and the serving budgets. */
  final case class RetrievalConf(lexStore: String, vecStore: String,
                                 corpusPath: Option[String], idCol: String,
                                 textCol: String, vecCol: String,
                                 depth: Int, nProbe: Int, rerankDepth: Int,
                                 maxQueryTerms: Int, maxK: Int,
                                 fieldedStore: Option[String] = None,
                                 fieldedFields: Seq[Retrieval.Bm25fField] = Seq.empty,
                                 servingShufflePartitions: Int = 8,
                                 maxConcurrentComputes: Int = 16,
                                 admissionWaitMs: Long = 5000L)

  /** Parse "name:weight:b,name:weight:b,..." (weight defaults 1.0, b
    * defaults [[Retrieval.B]]) — the config wire format for the fielded
    * store's serve-time field parameters. */
  private[graft] def parseFields(s: String): Seq[Retrieval.Bm25fField] =
    s.split(',').map(_.trim).filter(_.nonEmpty).toSeq.map { part =>
      part.split(':') match {
        case Array(n) => Retrieval.Bm25fField(n, 1.0)
        case Array(n, w) => Retrieval.Bm25fField(n, w.toDouble)
        case Array(n, w, b) => Retrieval.Bm25fField(n, w.toDouble, b.toDouble)
        case _ => throw new IllegalArgumentException(
          s"bad retrieval.fielded_fields entry '$part' (want name[:weight[:b]])")
      }
    }

  /** True iff every store URI lives on a filesystem whose DIRECTORY
    * mtimes move when children change — the property the version-token
    * fingerprints need for EXACT cache invalidation. Local paths (no
    * scheme / `file:`) and HDFS have real directory mtimes; object
    * stores (s3/s3a/s3n/gs/abfs/oss/cos/wasb...) fake directories, so a
    * partition overwritten IN PLACE with same-named, same-length files
    * can keep its fingerprint and serve stale for up to the TTL. */
  private[graft] def schemesHaveDirMtimes(paths: Seq[String]): Boolean =
    paths.forall { p =>
      val scheme = Option(new java.net.URI(p).getScheme).map(_.toLowerCase)
      scheme.forall(s => s == "file" || s == "hdfs" || s == "viewfs")
    }

  /** Build from config when the store paths are declared; None otherwise
    * (the serving shells then simply don't expose the routes/tool).
    * `retrieval.corpus_path` is optional — omit it for sidecar stores.
    * The result cache defaults ON (`retrieval.cache_size` entries,
    * `retrieval.cache_ttl_seconds` TTL; size 0 disables) only when every
    * store URI's filesystem has real directory mtimes (local/HDFS), where
    * the version-token invalidation is exact. On object-store schemes the
    * default flips to OFF — the fingerprint can miss an in-place
    * overwrite there, so serving stale-for-TTL must be an explicit
    * opt-in (set retrieval.cache_size to enable, and size the TTL to the
    * staleness the deployment tolerates). */
  def fromConfig(spark: SparkSession, cfg: GraftConfig): Option[SearchApi] =
    for {
      lex <- cfg.getString("retrieval.lex_store")
      vec <- cfg.getString("retrieval.vec_store")
    } yield new SearchApi(spark, RetrievalConf(
      lexStore = lex, vecStore = vec,
      corpusPath = cfg.getString("retrieval.corpus_path"),
      idCol = cfg.getStringOr("retrieval.id_col", "doc_id"),
      textCol = cfg.getStringOr("retrieval.text_col", "text"),
      vecCol = cfg.getStringOr("retrieval.vec_col", "embedding"),
      depth = cfg.getIntOr("retrieval.depth", 20),
      nProbe = cfg.getIntOr("retrieval.n_probe", 8),
      rerankDepth = cfg.getIntOr("retrieval.rerank_depth", 100),
      maxQueryTerms = cfg.getIntOr("retrieval.max_query_terms", 16),
      maxK = cfg.getIntOr("retrieval.max_k", 100),
      fieldedStore = cfg.getString("retrieval.fielded_store"),
      fieldedFields = parseFields(
        cfg.getStringOr("retrieval.fielded_fields", "")),
      servingShufflePartitions =
        cfg.getIntOr("retrieval.serving_shuffle_partitions", 8),
      maxConcurrentComputes =
        cfg.getIntOr("retrieval.max_concurrent_computes", 16),
      admissionWaitMs =
        cfg.getIntOr("retrieval.admission_wait_ms", 5000).toLong),
      cache = {
        val stores = Seq(lex, vec) ++ cfg.getString("retrieval.corpus_path") ++
          cfg.getString("retrieval.fielded_store")
        val defaultSize = if (schemesHaveDirMtimes(stores)) 512 else 0
        Option(cfg.getIntOr("retrieval.cache_size", defaultSize))
          .filter(_ > 0)
          .map(new ResultCache(_,
            cfg.getIntOr("retrieval.cache_ttl_seconds", 300).toLong))
      })
}
