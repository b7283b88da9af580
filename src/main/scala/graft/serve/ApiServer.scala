package graft.serve

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Financials
import graft.sources.{FactStore, Serve}

/** The reference's REST serving facade (src/api/main.py:69-408), built on
  * the JDK's com.sun.net.httpserver — zero new dependencies. The engine
  * stays distributed; routes only collect capped, pre-filtered serving
  * results (Serve renderers). Split in two:
  *
  * - [[FinancialApi]]: route semantics as pure (status, contentType, body)
  *   functions — unit-testable without sockets;
  * - [[ApiServer]]: the HTTP shell binding them to paths.
  *
  * Reference surface covered: /status, /financials/{ticker},
  * /financials/{ticker}/{metric} (json|csv|parquet, period, years,
  * 202-on-miss + background fetch trigger = T5), POST /financials/compare,
  * /data/tickers, /data/ticker/{ticker}/info, POST /etl/fetch/{ticker},
  * POST /etl/refresh, /etl/status, /cache/stats, /cache/clear,
  * /storage/stats — the full route table of src/api/main.py.
  */
final class FinancialApi(spark: SparkSession, facts: () => DataFrame,
                         cache: ResultCache, onMiss: String => Unit = _ => (),
                         tracker: graft.sources.EdgarIngest.JobTracker =
                           new graft.sources.EdgarIngest.JobTracker(),
                         onRefresh: () => Unit = () => ()) {

  import FinancialApi._

  private def now(): String = java.time.Instant.now().toString

  private def envelope(df: DataFrame): String = Serve.toJsonEnvelope(df, now())

  private def error(status: Int, message: String): Response =
    Response(status, "application/json",
      s"""{"success":false,"timestamp":"${Serve.jsonEscape(now())}","detail":"${Serve.jsonEscape(message)}"}""")

  /** True when the store holds any facts for the ticker — the 202-on-miss
    * gate. A limit(1) probe, partition-pruned by the store layout. */
  private def hasTicker(ticker: String): Boolean =
    facts().filter(col("ticker") === ticker).limit(1).count() > 0

  private def miss202(ticker: String): Response = {
    onMiss(ticker) // fire the background fetch (T5 on-demand trigger)
    error(202, s"Data for $ticker not available. Fetching in background. " +
      "Please try again in a few minutes.")
  }

  def status(): Response =
    Response(200, "application/json",
      s"""{"status":"healthy","timestamp":"${Serve.jsonEscape(now())}","service":"graft-financials-api"}""")

  /** GET /financials/{ticker} — full statement set for the company
    * (ref: main.py:105-160). */
  def financials(ticker0: String, period: String, years: Int, format: String): Response = {
    val ticker = ticker0.toUpperCase
    if (!hasTicker(ticker)) return miss202(ticker)
    val k = cache.key("company_data", "ticker" -> ticker, "period" -> period,
      "years" -> years, "format" -> format)
    render(format, s"${ticker}_financials") {
      Financials.statement(
        facts().filter(col("ticker") === ticker), StatementMetrics, period,
        lastN = Some(years))
    } match {
      case Left(resp) => resp
      case Right(make) => Response(200, contentTypeOf(format),
        cache.getOrElseUpdate(k)(make()))
    }
  }

  /** GET /financials/{ticker}/{metric} (ref: main.py:163-210). */
  def metric(ticker0: String, metric: String, period: String, years: Int,
             format: String): Response = {
    val ticker = ticker0.toUpperCase
    if (!hasTicker(ticker)) return miss202(ticker)
    val k = cache.key("metric_data", "ticker" -> ticker, "metric" -> metric,
      "period" -> period, "years" -> years, "format" -> format)
    render(format, s"${ticker}_$metric") {
      Financials.metricSeries(
        facts().filter(col("ticker") === ticker), metric, period, years)
    } match {
      case Left(resp) => resp
      case Right(make) => Response(200, contentTypeOf(format),
        cache.getOrElseUpdate(k)(make()))
    }
  }

  /** POST /financials/compare (ref: main.py:213-232). Body:
    * {"tickers": [...], "metric": "...", "period": "annual", "years": 5}. */
  def compare(body: String): Response = {
    val json =
      try mapper.readTree(body)
      catch { case e: Exception => return error(400, s"invalid JSON body: ${e.getMessage}") }
    val tickers = Option(json.get("tickers")).map(asStringSeq).getOrElse(Seq.empty)
      .map(_.toUpperCase)
    val metricName = Option(json.get("metric")).map(_.asText).getOrElse("")
    val period = Option(json.get("period")).map(_.asText).getOrElse("annual")
    // asInt() alone returns 0 for non-numeric JSON — validate, don't coerce
    val yearsNode = Option(json.get("years"))
    if (yearsNode.exists(n => !n.isIntegralNumber || n.asInt < 1))
      return error(400, "years must be a positive integer")
    val years = yearsNode.map(_.asInt).getOrElse(5)
    if (tickers.isEmpty || metricName.isEmpty)
      return error(400, "body must provide tickers (array) and metric (string)")
    val key = cache.key("comparison", "tickers" -> tickers.sorted.mkString(","),
      "metric" -> metricName, "period" -> period, "years" -> years)
    Response(200, "application/json", cache.getOrElseUpdate(key) {
      envelope(Financials.compare(facts(), metricName, tickers, period, Some(years)))
    })
  }

  /** GET /data/tickers (ref: main.py:235-262): ticker list + freshness
    * sample — one aggregate over the store, not a per-ticker loop. */
  def tickers(sampleLimit: Int = 50): Response = {
    val k = cache.key("tickers", "limit" -> sampleLimit)
    Response(200, "application/json", cache.getOrElseUpdate(k) {
      val fresh = FactStore.freshness(facts())
        .orderBy("ticker").limit(sampleLimit)
      val total = facts().select("ticker").distinct().count()
      val sample = Serve.toJsonEnvelope(fresh, now())
      s"""{"total_tickers":$total,"freshness_sample":$sample}"""
    })
  }

  /** POST /etl/fetch/{ticker} (ref: main.py:302-322): explicit on-demand
    * fetch trigger; invalidates the ticker's cached results. */
  def triggerFetch(ticker0: String): Response = {
    val ticker = ticker0.toUpperCase
    onMiss(ticker)
    // ticker-scoped entries + the store-wide aggregates the new data
    // staleness-breaks (per-ticker matching can't reach those keys)
    val invalidated = cache.invalidateTicker(ticker) +
      cache.invalidatePrefix("storage_stats") + cache.invalidatePrefix("tickers")
    Response(200, "application/json",
      s"""{"success":true,"message":"Fetch triggered for $ticker","invalidated":$invalidated}""")
  }

  /** GET /data/ticker/{ticker}/info (ref: main.py:264-299): per-ticker
    * store detail — freshness plus the partition census that replaces the
    * reference's manual file listing (Catalyst's partition pruning makes
    * the per-ticker scan touch only that ticker's directories). */
  def tickerInfo(ticker0: String): Response = {
    val ticker = ticker0.toUpperCase
    if (!hasTicker(ticker)) return error(404, s"No data found for $ticker")
    val k = cache.key("ticker_info", "ticker" -> ticker)
    Response(200, "application/json", cache.getOrElseUpdate(k) {
      val mine = facts().filter(col("ticker") === ticker)
      val parts = FactStore.withPeriodType(mine)
        .groupBy("period_type", "fiscal_year")
        .agg(count(lit(1)).as("record_count"),
          countDistinct("concept").as("n_concepts"),
          max(col("end_date").cast("string")).as("latest_end_date"))
        .orderBy("period_type", "fiscal_year")
      val partitions = Serve.toJsonEnvelope(parts, now())
      val freshness = Serve.toJsonEnvelope(FactStore.freshness(mine), now())
      s"""{"ticker":"${Serve.jsonEscape(ticker)}","data_freshness":$freshness,
         |"partitions":$partitions}""".stripMargin.replace("\n", "")
    })
  }

  /** POST /etl/refresh (ref: main.py:325-341): full-refresh trigger (T4 —
    * the store's dynamic partition overwrite makes it an upsert) +
    * cache flush. */
  def triggerRefresh(): Response = {
    onRefresh()
    val cleared = cache.clear()
    Response(200, "application/json",
      s"""{"success":true,"message":"Full refresh triggered","cache_cleared":$cleared}""")
  }

  /** GET /etl/status (ref: main.py:343-371): pipeline stats + recent
    * jobs from the tracker (A4/T3). */
  def etlStatus(recentN: Int = 20): Response = {
    val (done, failed, successRate) = tracker.stats
    val recent = tracker.history.takeRight(recentN).map { j =>
      s"""{"job_id":"${Serve.jsonEscape(j.id)}","ticker":"${Serve.jsonEscape(j.ticker)}",
         |"status":"${j.status}","error":${j.error
           .map(e => "\"" + Serve.jsonEscape(e) + "\"").getOrElse("null")}}"""
        .stripMargin.replace("\n", "")
    }.mkString("[", ",", "]")
    Response(200, "application/json",
      s"""{"pipeline_stats":{"completed":$done,"failed":$failed,"success_rate":$successRate},
         |"recent_jobs":$recent}""".stripMargin.replace("\n", ""))
  }

  /** GET /storage/stats (ref: main.py:398-408): one store-wide aggregate
    * (the q17 shape) instead of the reference's file-walk. */
  def storageStats(): Response = {
    val k = cache.key("storage_stats")
    Response(200, "application/json", cache.getOrElseUpdate(k) {
      val df = facts().agg(
        count(lit(1)).as("total_facts"),
        countDistinct("ticker").as("n_tickers"),
        countDistinct("concept").as("n_concepts"),
        min("fiscal_year").as("min_fy"), max("fiscal_year").as("max_fy"))
      Serve.toJsonEnvelope(df, now())
    })
  }

  def cacheStats(): Response = {
    val body = cache.stats.toSeq.sortBy(_._1).map {
      case (k, v: String) => s""""$k":"${Serve.jsonEscape(v)}""""
      case (k, v) => s""""$k":$v"""
    }.mkString("{", ",", "}")
    Response(200, "application/json", body)
  }

  def cacheClear(): Response = {
    val n = cache.clear()
    Response(200, "application/json", s"""{"success":true,"cleared":$n}""")
  }

  /** Format dispatch shared by the data routes: json → envelope, csv →
    * quoted CSV, parquet → single-file bytes (ref StreamingResponse
    * payloads, main.py:131-145). */
  private def render(format: String, filename: String)(df: => DataFrame)
  : Either[Response, () => String] =
    format.toLowerCase match {
      case "json" => Right(() => envelope(df))
      case "csv" => Right(() => Serve.toCsvString(df))
      case "parquet" =>
        // bytes are not cached (binary, large) — rendered per request
        Left(Response(200, "application/octet-stream", "",
          Some(Serve.toParquetBytes(df)),
          Map("Content-Disposition" -> s"attachment; filename=$filename.parquet")))
      case other => Left(error(400, s"unsupported format: $other"))
    }

  private def contentTypeOf(format: String): String =
    if (format.equalsIgnoreCase("csv")) "text/csv" else "application/json"
}

object FinancialApi {
  /** One rendered response: status + content type + text body (or raw
    * bytes for binary payloads) + extra headers. */
  final case class Response(status: Int, contentType: String, body: String,
                            bytes: Option[Array[Byte]] = None,
                            headers: Map[String, String] = Map.empty) {
    def payload: Array[Byte] = bytes.getOrElse(body.getBytes("UTF-8"))
  }

  /** Default statement metric set served by /financials/{ticker}. */
  val StatementMetrics: Seq[String] = Seq(
    "revenue", "gross_profit", "operating_income", "net_income",
    "assets", "liabilities", "equity", "cash")

  private[serve] val mapper = new ObjectMapper()

  private[serve] def asStringSeq(n: JsonNode): Seq[String] = {
    val it = n.elements()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) buf += it.next().asText()
    buf.toSeq
  }
}

/** HTTP shell: path routing over [[FinancialApi]] plus the reference's
  * response hygiene (src/api/main.py:53-54 + config.yaml performance
  * section): gzip for bodies >= 1000 bytes when the client accepts it
  * (`performance.enable_compression`), and a hard response-size cap
  * (`performance.max_response_size_mb`, 413 when exceeded — the cap is
  * checked on the UNcompressed payload, so a pathological query can't
  * smuggle an oversized result past the cap by compressing well). Bind
  * port 0 for an ephemeral test port (`boundPort` reports it). */
final class ApiServer(api: FinancialApi, port: Int = 8000,
                      enableCompression: Boolean = true,
                      maxResponseBytes: Long = 100L * 1024 * 1024,
                      gzipMinBytes: Int = ApiServer.GzipMinBytes,
                      search: Option[SearchApi] = None) {

  import FinancialApi.Response

  /** Shell keyed off the serving config (S13), reference precedence. */
  def this(api: FinancialApi, port: Int, cfg: GraftConfig) =
    this(api, port, cfg.enableCompression,
      cfg.maxResponseSizeMb.toLong * 1024 * 1024)

  /** Shell with the retrieval layer mounted (round 10): `/search` routes
    * appear when the config declares the store paths. */
  def this(api: FinancialApi, port: Int, cfg: GraftConfig,
           search: Option[SearchApi]) =
    this(api, port, cfg.enableCompression,
      cfg.maxResponseSizeMb.toLong * 1024 * 1024,
      ApiServer.GzipMinBytes, search)

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress(port), 0)

  // A real handler pool (round 13): the JDK HttpServer's default (null)
  // executor runs EVERY handler on its single dispatcher thread — the
  // server was serial, so under a post-mutation cache-refill stampede
  // requests queued at the HTTP layer for the SUM of the queued computes
  // (ServeMutation measured 30 s tails), and the serve layer's
  // single-flight/coalescing never even saw concurrent misses. 32
  // daemon threads: requests are either cache hits (ms) or Spark-bound
  // computes that the FAIR pool multiplexes.
  private val handlerPool = java.util.concurrent.Executors.newFixedThreadPool(
    32,
    (r: Runnable) => {
      val t = new Thread(r, "graft-api-handler")
      t.setDaemon(true)
      t
    })
  server.setExecutor(handlerPool)

  def boundPort: Int = server.getAddress.getPort

  private def queryParams(q: String): Map[String, String] =
    Option(q).map(_.split('&').toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  private def route(method: String, path: String, params: Map[String, String],
                    body: String): Response = {
    val period = params.getOrElse("period", "annual")
    val years = params.get("years").flatMap(_.toIntOption).getOrElse(5)
    val format = params.getOrElse("format", "json")
    val parts = path.stripPrefix("/").stripSuffix("/").split('/').toSeq
    (method, parts) match {
      case ("GET", Seq("status"))                    => api.status()
      case ("GET", Seq("financials", t))             => api.financials(t, period, years, format)
      case ("GET", Seq("financials", t, m))          => api.metric(t, m, period, years, format)
      case ("POST", Seq("financials", "compare"))    => api.compare(body)
      case ("GET", Seq("data", "tickers"))           => api.tickers()
      case ("GET", Seq("data", "ticker", t, "info")) => api.tickerInfo(t)
      case ("POST", Seq("etl", "fetch", t))          => api.triggerFetch(t)
      case ("POST", Seq("etl", "refresh"))           => api.triggerRefresh()
      case ("GET", Seq("etl", "status"))             => api.etlStatus()
      case ("GET", Seq("cache", "stats"))            => api.cacheStats()
      case ("POST", Seq("cache", "clear"))           => api.cacheClear()
      case ("GET", Seq("storage", "stats"))          => api.storageStats()
      // retrieval layer (round 10) — mounted only when configured
      case ("GET", Seq("search")) if search.nonEmpty =>
        search.get.searchGet(params)
      case ("POST", Seq("search")) if search.nonEmpty =>
        search.get.searchPost(body)
      case (_, Seq("search")) if search.isEmpty =>
        Response(503, "application/json",
          """{"success":false,"detail":"retrieval stores not configured """ +
            """(set retrieval.lex_store / retrieval.vec_store; """ +
            """retrieval.corpus_path optional for sidecar stores)"}""")
      case _ => Response(404, "application/json",
        s"""{"success":false,"detail":"Not found: $method $path"}""")
    }
  }

  server.createContext("/", { exchange =>
    val resp =
      try {
        val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        route(exchange.getRequestMethod, exchange.getRequestURI.getPath,
          queryParams(exchange.getRequestURI.getRawQuery), body)
      } catch {
        case e: Exception => Response(500, "application/json",
          s"""{"success":false,"detail":"${graft.sources.Serve.jsonEscape(String.valueOf(e.getMessage))}"}""")
      }
    val raw = resp.payload
    val (status, contentType, headers, capped) =
      if (raw.length > maxResponseBytes)
        (413, "application/json", Map.empty[String, String],
          (s"""{"success":false,"detail":"response of ${raw.length} bytes """ +
            s"""exceeds the configured cap of $maxResponseBytes bytes"}""")
            .getBytes("UTF-8"))
      else (resp.status, resp.contentType, resp.headers, raw)
    val acceptsGzip = Option(
        exchange.getRequestHeaders.getFirst("Accept-Encoding"))
      .exists(_.toLowerCase.contains("gzip"))
    val gzip = enableCompression && acceptsGzip &&
      capped.length >= gzipMinBytes
    val payload = if (gzip) ApiServer.gzipBytes(capped) else capped
    exchange.getResponseHeaders.set("Content-Type", contentType)
    // Representation varies on the request's Accept-Encoding whenever
    // compression is possible — not just when it fired — else a shared
    // cache could hand a gzipped body to a client that never asked.
    if (enableCompression) exchange.getResponseHeaders.set("Vary", "Accept-Encoding")
    if (gzip) exchange.getResponseHeaders.set("Content-Encoding", "gzip")
    headers.foreach { case (k, v) => exchange.getResponseHeaders.set(k, v) }
    exchange.sendResponseHeaders(status, payload.length)
    val os = exchange.getResponseBody
    os.write(payload)
    os.close()
  })

  def start(): ApiServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); handlerPool.shutdown() }
}

object ApiServer {
  /** Bodies below this size are never compressed (ref: main.py:54,
    * GZipMiddleware minimum_size=1000 — headers would outweigh savings). */
  val GzipMinBytes: Int = 1000

  private[serve] def gzipBytes(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }
}
