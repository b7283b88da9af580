package graft.serve

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

/** S13 config source: YAML file + environment override (reference:
  * src/core/config.py:101-200 — load config.yaml into nested sections,
  * then let environment variables override individual keys).
  *
  * Lookup is by dotted path (`cache.ttl`, `sec_api.rate_limit.
  * requests_per_second`). An environment variable `GRAFT_<PATH>` with dots
  * replaced by underscores, uppercased (e.g. `GRAFT_CACHE_TTL`) wins over
  * the file value — the reference's precedence. Parsing uses Jackson's
  * YAML dataformat, which ships in Spark's own jar set (no new deps).
  */
final class GraftConfig(root: JsonNode, env: Map[String, String] = sys.env) {

  private def envKey(path: String): String =
    "GRAFT_" + path.replace('.', '_').toUpperCase

  private def node(path: String): Option[JsonNode] =
    path.split('.').foldLeft(Option(root)) {
      case (Some(n), seg) => Option(n.get(seg))
      case (None, _) => None
    }

  def getString(path: String): Option[String] =
    env.get(envKey(path)).orElse(node(path).filterNot(_.isNull).map(_.asText))

  def getInt(path: String): Option[Int] = getString(path).flatMap(_.toIntOption)
  def getLong(path: String): Option[Long] = getString(path).flatMap(_.toLongOption)
  def getBoolean(path: String): Option[Boolean] =
    getString(path).flatMap(_.toBooleanOption)

  def getStringList(path: String): Seq[String] =
    env.get(envKey(path)).map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse {
        node(path).filter(_.isArray).map(FinancialApi.asStringSeq).getOrElse(Seq.empty)
      }

  def getStringOr(path: String, default: String): String = getString(path).getOrElse(default)
  def getIntOr(path: String, default: Int): Int = getInt(path).getOrElse(default)
  def getBooleanOr(path: String, default: Boolean): Boolean =
    getBoolean(path).getOrElse(default)

  /** Engine bindings — the config keys that parameterize engine/session
    * behavior rather than the serving shell. Every entry under the
    * `spark:` section is applied to runtime conf; for those file-listed
    * keys, `GRAFT_SPARK_<conf key, dots as underscores, uppercased>` wins
    * over the file value. Conf keys NOT in the file cannot be reconstructed
    * from an env var name (uppercasing loses Spark's camelCase), so
    * env-only settings go through `GRAFT_SPARK_EXTRA` instead:
    * a `key=value;key2=value2` list with exact key case preserved. */
  def applyTo(spark: SparkSession): Unit = {
    node("spark").filter(_.isObject).foreach { s =>
      val it = s.fields()
      while (it.hasNext) {
        val e = it.next()
        val envOverride = env.get("GRAFT_SPARK_" + e.getKey.replace('.', '_').toUpperCase)
        spark.conf.set(e.getKey, envOverride.getOrElse(e.getValue.asText))
      }
    }
    env.get("GRAFT_SPARK_EXTRA").foreach { extra =>
      extra.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k.trim, v.trim)
          case _ => throw new IllegalArgumentException(
            s"GRAFT_SPARK_EXTRA entries must be key=value, got: '$kv'")
        }
      }
    }
  }

  /** A [[ResultCache]] sized by the cache section (ref config keys:
    * cache.ttl, cache.max_size). */
  def buildCache(): ResultCache =
    new ResultCache(
      maxSize = getIntOr("cache.max_size", 1000),
      defaultTtlSeconds = getIntOr("cache.ttl", 3600).toLong)

  def apiPort: Int = getIntOr("api.port", 8000)
  def storageBasePath: Option[String] = getString("data_storage.base_path")
  def rateLimitPerSecond: Int = getIntOr("sec_api.rate_limit.requests_per_second", 10)
  def etlBatchSize: Int = getIntOr("etl.batch_size", 10)
  def skipUnchanged: Boolean = getBooleanOr("etl.skip_unchanged", true)
  def sp500Tickers: Seq[String] = getStringList("sp500_tickers")
  /** Reference performance section (config.yaml:55-57). */
  def maxResponseSizeMb: Int = getIntOr("performance.max_response_size_mb", 100)
  def enableCompression: Boolean = getBooleanOr("performance.enable_compression", true)
}

object GraftConfig {
  private val yaml = new ObjectMapper(new YAMLFactory())

  def fromString(text: String, env: Map[String, String] = sys.env): GraftConfig =
    new GraftConfig(yaml.readTree(text), env)

  def load(path: String, env: Map[String, String] = sys.env): GraftConfig =
    fromString(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), env)
}
