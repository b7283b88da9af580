package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.MetricCatalog
import graft.queries.Financials
import graft.sources.Serve

/** MCP-shaped tool + resource surface (reference: src/sec_mcp/server.py —
  * tools/list returns the 6 tool schemas :53-146, tools/call dispatches by
  * name :147-181, resources/list exposes the two data resources :183-200,
  * resources/read serves them :202-230). The protocol framing (JSON-RPC
  * transport) is host-specific; what the engine owes is the REGISTRY +
  * DISPATCH: names, schemas/URIs, and name→query execution. Every tool
  * body is one of the Financials query surfaces — distributed compute,
  * capped collect at the render edge.
  *
  * `config`, when given, supplies the S&P 500 ticker list for the
  * `sec://companies/sp500` resource (ref: config/sp500_tickers.json via
  * core/config.py:122-127); absent — or empty — the resource falls back to
  * the distinct tickers actually present in the fact store (a bounded
  * companies dim; the collect is a render-edge read of at most a few
  * thousand short strings).
  */
final class McpTools(spark: SparkSession, facts: () => DataFrame,
                     config: Option[GraftConfig] = None,
                     search: Option[SearchApi] = None) {

  import McpTools._

  /** The registry this instance actually serves: the reference's six
    * financial tools, plus `search_corpus` when the retrieval stores are
    * configured (round 10 — the flagship capability gets the same MCP
    * surface as everything else). */
  private def tools: Seq[ToolDef] =
    if (search.nonEmpty) Tools :+ SearchTool else Tools

  /** tools/list payload: JSON array of {name, description, inputSchema}. */
  def listTools: String =
    tools.map { t =>
      s"""{"name":"${t.name}","description":"${Serve.jsonEscape(t.description)}","inputSchema":${t.inputSchema}}"""
    }.mkString("[", ",", "]")

  def toolNames: Seq[String] = tools.map(_.name)

  /** resources/list payload: JSON array of {uri, name, description,
    * mimeType} (ref: server.py:183-200). */
  def listResources: String =
    Resources.map { r =>
      s"""{"uri":"${r.uri}","name":"${Serve.jsonEscape(r.name)}","description":"${Serve.jsonEscape(r.description)}","mimeType":"application/json"}"""
    }.mkString("[", ",", "]")

  def resourceUris: Seq[String] = Resources.map(_.uri)

  /** resources/read: the resource's JSON text for a known URI, an
    * `Unknown resource: ...` line otherwise (ref: server.py:202-230 —
    * errors are returned as text content, never thrown to the client). */
  def readResource(uri: String): String =
    try uri match {
      case "sec://companies/sp500" =>
        val tickers = config.map(_.sp500Tickers).filter(_.nonEmpty)
          .getOrElse(facts().select("ticker").distinct().orderBy("ticker")
            .collect().map(_.getString(0)).toSeq)
        tickers.map(t => s""""${Serve.jsonEscape(t)}"""")
          .mkString("""{"sp500_tickers":[""", ",", "]}")
      case "sec://metrics/available" =>
        // ref data_service.py:301-310: [{metric, description,
        // possible_labels}] over the serving-path label catalog
        MetricCatalog.labelAliases.toSeq.sortBy(_._1).map { case (m, labels) =>
          val title = m.split('_').map(_.capitalize).mkString(" ")
          labels.map(l => s""""${Serve.jsonEscape(l)}"""")
            .mkString(
              s"""{"metric":"$m","description":"Financial metric: $title","possible_labels":[""",
              ",", "]}")
        }.mkString("[", ",", "]")
      case other => s"Unknown resource: $other"
    } catch { case e: Exception => s"Error: ${e.getMessage}" }

  /** tools/call with a parsed argument map. Returns the MCP text-content
    * payload: a JSON envelope on success, an `Error: ...` line on failure
    * (ref: server.py:168-181 wraps errors the same way). */
  def call(name: String, args: Map[String, Any]): String =
    try dispatch(name, new Args(args))
    catch { case e: Exception => s"Error: ${e.getMessage}" }

  /** tools/call with raw JSON arguments (the wire form). */
  def callJson(name: String, argsJson: String): String = {
    val node = FinancialApi.mapper.readTree(if (argsJson.isEmpty) "{}" else argsJson)
    val m = scala.collection.mutable.Map.empty[String, Any]
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      m(e.getKey) =
        if (e.getValue.isArray) FinancialApi.asStringSeq(e.getValue)
        else if (e.getValue.isInt || e.getValue.isLong) e.getValue.asLong
        else e.getValue.asText
    }
    call(name, m.toMap)
  }

  private def envelope(df: DataFrame): String =
    Serve.toJsonEnvelope(df, java.time.Instant.now().toString)

  private def dispatch(name: String, a: Args): String = name match {
    case "get_company_financials" =>
      val own = facts().filter(col("ticker") === a.str("ticker").toUpperCase)
      envelope(Financials.statement(own, FinancialApi.StatementMetrics, a.period,
        lastN = Some(a.years(5))))

    case "get_financial_metric" =>
      val own = facts().filter(col("ticker") === a.str("ticker").toUpperCase)
      envelope(Financials.metricSeries(own, a.str("metric"), a.period, a.years(5)))

    case "compare_companies" =>
      envelope(Financials.compare(facts(), a.str("metric"),
        a.strSeq("tickers").map(_.toUpperCase), a.period, Some(a.years(3))))

    case "analyze_financial_trends" =>
      // one trends block per requested metric, unioned — each block is a
      // single pass; the union is by name so column order is stable
      val own = facts().filter(col("ticker") === a.str("ticker").toUpperCase)
      val metrics = a.strSeq("metrics")
      require(metrics.nonEmpty, "metrics must be a non-empty array")
      envelope(metrics.map(m => Financials.trends(own, m)).reduce(_ unionByName _))

    case "generate_financial_report" =>
      // text report, already envelope-shaped prose (ref: server.py:499-619)
      s"""{"success":true,"report":"${Serve.jsonEscape(
        Financials.report(facts(), a.str("ticker").toUpperCase))}"}"""

    case "get_available_metrics" =>
      val names = (MetricCatalog.tagFallback.keySet ++ MetricCatalog.labelAliases.keySet)
        .toSeq.sorted
      names.map(n => s""""$n"""").mkString("""{"success":true,"metrics":[""", ",", "]}")

    case "search_corpus" if search.nonEmpty =>
      // the SearchApi is the single serving semantics for HTTP and MCP —
      // the tool returns its JSON body (errors stay error-shaped text,
      // matching the reference's wrap-never-throw contract)
      val resp = search.get.search(
        a.optStr("text").getOrElse(""),
        a.strSeq("vector").map(_.toFloat),
        a.intOr("k", 10),
        a.optStr("mode").getOrElse("hybrid"),
        a.strSeq("allowed_ids"),
        a.intOr("window", 12),
        includeText = a.boolOr("include_text", default = false),
        requireAll = a.boolOr("require_all", default = false))
      if (resp.status == 200) resp.body else s"Error: ${resp.body}"

    case other => s"Unknown tool: $other"
  }
}

object McpTools {

  final case class ToolDef(name: String, description: String, inputSchema: String)

  final case class ResourceDef(uri: String, name: String, description: String)

  /** The reference's two resources (src/sec_mcp/server.py:185-198). */
  val Resources: Seq[ResourceDef] = Seq(
    ResourceDef("sec://companies/sp500", "S&P 500 Companies",
      "List of S&P 500 companies with tickers and basic info"),
    ResourceDef("sec://metrics/available", "Available Financial Metrics",
      "List of all available financial metrics"))

  /** The reference's six tools with their input schemas
    * (src/sec_mcp/server.py:53-146). */
  val Tools: Seq[ToolDef] = Seq(
    ToolDef("get_company_financials",
      "Get comprehensive financial data for a company",
      """{"type":"object","properties":{"ticker":{"type":"string"},"years":{"type":"integer","default":5},"period":{"type":"string","default":"annual","enum":["annual","quarterly"]}},"required":["ticker"]}"""),
    ToolDef("get_financial_metric",
      "Get a specific financial metric for a company",
      """{"type":"object","properties":{"ticker":{"type":"string"},"metric":{"type":"string"},"years":{"type":"integer","default":5},"period":{"type":"string","default":"annual","enum":["annual","quarterly"]}},"required":["ticker","metric"]}"""),
    ToolDef("compare_companies",
      "Compare a financial metric across multiple companies",
      """{"type":"object","properties":{"tickers":{"type":"array","items":{"type":"string"}},"metric":{"type":"string"},"years":{"type":"integer","default":3},"period":{"type":"string","default":"annual","enum":["annual","quarterly"]}},"required":["tickers","metric"]}"""),
    ToolDef("analyze_financial_trends",
      "Analyze financial trends for multiple metrics over time",
      """{"type":"object","properties":{"ticker":{"type":"string"},"metrics":{"type":"array","items":{"type":"string"}},"years":{"type":"integer","default":10}},"required":["ticker","metrics"]}"""),
    ToolDef("generate_financial_report",
      "Generate comprehensive financial report for a company",
      """{"type":"object","properties":{"ticker":{"type":"string"},"report_type":{"type":"string","default":"comprehensive","enum":["comprehensive","summary","growth","profitability"]},"years":{"type":"integer","default":5}},"required":["ticker"]}"""),
    ToolDef("get_available_metrics",
      "Get list of available financial metrics",
      """{"type":"object","properties":{"ticker":{"type":"string"}},"required":[]}"""))

  /** The retrieval layer's tool (round 10) — registered only when the
    * serving config declares the store paths. The query vector is
    * caller-supplied (this service does not embed). */
  val SearchTool: ToolDef = ToolDef("search_corpus",
    "Search the document corpus from the persisted retrieval stores " +
      "(hybrid BM25+vector with reciprocal-rank fusion, or " +
      "lexical/vector/fielded/phrase/proximity/snippet single-mode; snippet returns "+
      "the passage around the first matched term from the store's raw-text "+
      "sidecar); optional allowed_ids fences " +
      "results to an access-scoped id set",
    """{"type":"object","properties":{"text":{"type":"string"},"vector":{"type":"array","items":{"type":"number"}},"k":{"type":"integer","default":10},"mode":{"type":"string","default":"hybrid","enum":["hybrid","vector","lexical","fielded","phrase","proximity","snippet"]},"allowed_ids":{"type":"array","items":{"type":"string"}},"window":{"type":"integer","default":12},"include_text":{"type":"boolean","default":false},"require_all":{"type":"boolean","default":false}},"required":[]}""")

  /** Typed access over the loosely-typed argument map. */
  private final class Args(m: Map[String, Any]) {
    def str(k: String): String = m.get(k) match {
      case Some(s: String) => s
      case Some(other) => other.toString
      case None => throw new IllegalArgumentException(s"missing required argument: $k")
    }
    def optStr(k: String): Option[String] = m.get(k).map(String.valueOf)
    def intOr(k: String, default: Int): Int = m.get(k) match {
      case Some(i: Int) => i
      case Some(l: Long) => l.toInt
      case Some(d: Double) if d.isWhole => d.toInt
      // JSON encoders routinely emit integral values as "5.0" — accept
      // any whole number rather than silently substituting the default
      case Some(s: String) => s.toIntOption
        .orElse(s.toDoubleOption.filter(_.isWhole).map(_.toInt))
        .getOrElse(default)
      case _ => default
    }
    def boolOr(k: String, default: Boolean): Boolean = m.get(k) match {
      case Some(b: Boolean) => b
      case Some(s: String) => s.equalsIgnoreCase("true")
      case _ => default
    }
    def strSeq(k: String): Seq[String] = m.get(k) match {
      case Some(xs: Seq[_]) => xs.map(String.valueOf)
      case Some(s: String) => s.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      case _ => Seq.empty
    }
    def years(default: Int): Int = m.get("years") match {
      case Some(i: Int) => i
      case Some(l: Long) => l.toInt
      case Some(s: String) => s.toIntOption.getOrElse(default)
      case _ => default
    }
    def period: String = m.get("period") match {
      case Some(p: String) => p
      case _ => "annual"
    }
  }
}
