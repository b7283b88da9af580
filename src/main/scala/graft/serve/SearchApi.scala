package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    case None => searchCompute(text, vector, k, mode, allowedIds, window,
      includeText, requireAll)
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
      val needsVec = mode == "hybrid" || mode == "vector" ||
        (mode == "snippet" && vector.nonEmpty)
      val needsLex = (mode != "vector" && mode != "fielded") || includeText
      val ver = (if (needsLex) Retrieval.storeVersion(spark, conf.lexStore)
                 else "-") + "/" +
        (if (needsVec) Quantize.servingStateToken(spark, conf.vecStore)
         else "-") + "/" +
        conf.corpusPath.filter(_ => needsVec)
          .map(p => Retrieval.fsFingerprint(spark, Seq(p))).getOrElse("-") + "/" +
        (if (mode == "fielded")
           conf.fieldedStore.map(Retrieval.storeVersion(spark, _)).getOrElse("-")
         else "-")
      val key = c.key("search",
        "ver" -> ver, "mode" -> mode,
        "q" -> ResultCache.md5hex(text),
        "vec" -> (if (vector.isEmpty) "-"
                  else ResultCache.md5hex(vector.mkString(","))),
        "k" -> k, "window" -> window,
        "allow" -> (if (allowedIds.isEmpty) "-"
                    else ResultCache.md5hex(allowedIds.sorted.mkString(","))),
        "text" -> includeText, "all" -> requireAll)
      c.get(key) match {
        case Some(body) => Response(200, "application/json", body)
        case None =>
          val r = searchCompute(text, vector, k, mode, allowedIds, window,
            includeText, requireAll)
          if (r.status == 200) c.put(key, r.body)
          r
      }
  }

  /** The fused hybrid ranking — ONE dispatch over (rescore source,
    * allow-list) shared by mode=hybrid and mode=snippet-with-vector, so
    * the two cannot diverge. Served through
    * [[Retrieval.hybridTopKFromStoresServed]] (round 12): the two legs
    * run as concurrent actions and the RRF fusion is the driver-side
    * exact twin of the gated plan fusion — RetrievalServingParitySpec
    * pins the equality. */
  private def fusedHybrid(text: String, vector: Seq[Float], k: Int,
                          allowed: Option[DataFrame]): DataFrame =
    Retrieval.hybridTopKFromStoresServed(serveSpark, conf.lexStore,
      conf.vecStore, queryFrameVec(text, vector), conf.textCol, conf.vecCol,
      conf.idCol, k, conf.depth, conf.nProbe, conf.rerankDepth,
      rescore = corpusOpt.map(c => (c, conf.vecCol)), allowed = allowed,
      maxQueryTerms = conf.maxQueryTerms)

  /** PHYSICAL state token of every store this request reads — moves
    * with any landed file change (including compaction's swaps, which
    * the logical cache tokens deliberately ignore). Used for the
    * optimistic bracket below, not for caching. The needs* predicates
    * mirror the cache key's EXACTLY (round 13): bracketing a store the
    * mode never reads would let a sustained mutation stream on that
    * store fail all bracket attempts and 503 an answer that could not
    * have changed — snippet-without-vector never touches the vec store,
    * pure fielded never touches the unfielded lex store. */
  private def physicalToken(mode: String, includeText: Boolean,
                            hasVector: Boolean): String = {
    val needsVec = mode == "hybrid" || mode == "vector" ||
      (mode == "snippet" && hasVector)
    val needsLex = (mode != "vector" && mode != "fielded") || includeText
    (if (needsLex) Retrieval.physicalVersion(serveSpark, conf.lexStore)
     else "-") + "/" +
      (if (needsVec) Quantize.servingStateToken(serveSpark, conf.vecStore)
       else "-") + "/" +
      (if (mode == "fielded")
         conf.fieldedStore.map(Retrieval.physicalVersion(serveSpark, _))
           .getOrElse("-")
       else "-")
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
      case a: org.apache.spark.sql.AnalysisException =>
        a.getMessage != null && a.getMessage.contains("UNABLE_TO_INFER_SCHEMA")
      case other => transient(other.getCause)
    }
    var attempt = 0
    while (attempt < 4) {
      val before = physicalToken(mode, includeText, vector.nonEmpty)
      val resp =
        try searchComputeOnce(text, vector, k, mode, allowedIds, window,
          includeText, requireAll)
        catch {
          case e: Exception if transient(e) && attempt < 3 =>
            attempt += 1; Thread.sleep(50L * attempt); null
        }
      if (resp != null) {
        if (resp.status != 200) return resp
        if (physicalToken(mode, includeText, vector.nonEmpty) == before)
          return resp
        attempt += 1
      }
    }
    error(503, "stores are mutating continuously; retry")
  }

  private def searchComputeOnce(text: String, vector: Seq[Float], k: Int,
                                mode: String, allowedIds: Seq[String],
                                window: Int, includeText: Boolean,
                                requireAll: Boolean): Response = {
    // per-request FAIR pool tag (thread-local): a no-op under FIFO
    serveSpark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft-serve")
    if (k < 1 || k > conf.maxK)
      return error(400, s"k must be in [1, ${conf.maxK}]: $k")
    val needsVector = mode == "hybrid" || mode == "vector"
    if (needsVector && k > conf.rerankDepth)
      return error(400, s"k=$k exceeds the configured rerank depth " +
        s"${conf.rerankDepth} (the exact-rescore shortlist feeds the " +
        "final ranking; raise retrieval.rerank_depth or lower k)")
    if (needsVector && vector.isEmpty)
      return error(400, s"mode '$mode' requires a query 'vector' " +
        "(this service does not embed; pass the embedding in the request)")
    if (mode != "vector" && text.trim.isEmpty)
      return error(400, s"mode '$mode' requires non-empty query text")
    val allowed = Option(allowedIds).filter(_.nonEmpty).map(allowFrame)
    // Read lease (round 13): hold the store gate's READ side for the
    // compute, so a physical install window (compact/rebucket/recell/
    // split — the millisecond rename swaps, never the rebuilds) drains
    // in-flight requests instead of tearing them. The request therefore
    // serves the snapshot it STARTED on; the optimistic physical-token
    // bracket above stays as the cross-process belt-and-braces.
    val leased = Seq(conf.lexStore, conf.vecStore) ++ conf.fieldedStore
    graft.sources.StoreGate.readLocked(leased) {
    try {
      val result = mode match {
        case "hybrid" => fusedHybrid(text, vector, k, allowed)
        case "vector" =>
          val q = queryFrameVec(text, vector).select(col(conf.idCol), col(conf.vecCol))
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
          val q = queryFrame(text)
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
            case None => return error(503,
              "no fielded store configured (retrieval.fielded_store)")
            case Some(fs) =>
              allowed match {
                case Some(a) => Retrieval.bm25fTopKFromStoreFiltered(serveSpark,
                  fs, conf.fieldedFields, queryFrame(text), a, conf.textCol,
                  conf.idCol, k, maxQueryTerms = conf.maxQueryTerms)
                case None => Retrieval.bm25fTopKFromStore(serveSpark, fs,
                  conf.fieldedFields, queryFrame(text), conf.textCol,
                  conf.idCol, k, maxQueryTerms = conf.maxQueryTerms)
              }
          }
        case "phrase" =>
          allowed match {
            case Some(a) => Retrieval.phraseTopKFromStoreFiltered(serveSpark,
              conf.lexStore, queryFrame(text), a, conf.textCol, conf.idCol,
              k, maxPhraseTerms = conf.maxQueryTerms)
            case None => Retrieval.phraseTopKFromStore(serveSpark, conf.lexStore,
              queryFrame(text), conf.textCol, conf.idCol, k,
              maxPhraseTerms = conf.maxQueryTerms)
          }
        case "proximity" =>
          if (window < 1 || window > 1000)
            return error(400, s"window must be in [1, 1000]: $window")
          allowed match {
            case Some(a) => Retrieval.proximityTopKFromStoreFiltered(serveSpark,
              conf.lexStore, queryFrame(text), a, conf.textCol, conf.idCol,
              k, window, maxQueryTerms = conf.maxQueryTerms)
            case None => Retrieval.proximityTopKFromStore(serveSpark, conf.lexStore,
              queryFrame(text), conf.textCol, conf.idCol, k, window,
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
            return error(400, s"window must be in [0, 100] tokens: $window")
          if (vector.nonEmpty) {
            if (k > conf.rerankDepth)
              return error(400, s"k=$k exceeds the configured rerank depth " +
                s"${conf.rerankDepth}")
            Retrieval.attachSnippets(serveSpark, conf.lexStore,
              fusedHybrid(text, vector, k, allowed),
              queryFrame(text), conf.textCol, conf.idCol, window,
              maxQueryTerms = conf.maxQueryTerms)
          } else allowed match {
            case Some(a) => Retrieval.snippetTopKFromStoreFiltered(serveSpark,
              conf.lexStore, queryFrame(text), a, conf.textCol, conf.idCol,
              k, window, maxQueryTerms = conf.maxQueryTerms)
            case None => Retrieval.snippetTopKFromStore(serveSpark, conf.lexStore,
              queryFrame(text), conf.textCol, conf.idCol, k, window,
              maxQueryTerms = conf.maxQueryTerms)
          }
        case other =>
          return error(400,
            s"unknown mode '$other' (expected hybrid|vector|lexical|" +
              "fielded|phrase|proximity|snippet)")
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
      Response(200, "application/json",
        envelope(withText.drop("query_id").orderBy("rank")))
    } catch {
      case e: IllegalStateException => error(503,
        s"retrieval store unavailable: ${e.getMessage}")
      // a store missing the raw-text sidecar (snippet mode on a store
      // built without storeDocs) or positional postings (phrase/
      // proximity/snippet on a pre-positional store) is a
      // deployment-shape problem, not a malformed request
      case e: IllegalArgumentException if e.getMessage != null &&
          (e.getMessage.contains("sidecar") ||
            e.getMessage.contains("positional")) =>
        error(503, s"retrieval store unavailable: ${e.getMessage}")
    }
    } // read lease
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
    * "mode":"hybrid", "allowed_ids":[...]}. */
  def searchPost(body: String): Response = {
    val node =
      try FinancialApi.mapper.readTree(if (body.isEmpty) "{}" else body)
      catch { case e: Exception =>
        return error(400, s"invalid JSON body: ${e.getMessage}") }
    val vec: Seq[Float] =
      Option(node.get("vector")).filter(_.isArray).map { arr =>
        (0 until arr.size).map(i => arr.get(i).floatValue)
      }.getOrElse(Seq.empty)
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
                                 servingShufflePartitions: Int = 8)

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
        cfg.getIntOr("retrieval.serving_shuffle_partitions", 8)),
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
