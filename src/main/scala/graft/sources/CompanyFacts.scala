package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.FactModel

/** CompanyFacts ingest: the reference's three-nested-loop JSON walk
  * (ref: src/core/sec_client.py:196-252) re-expressed as a declarative
  * explode chain — map taxonomy → map concept → map unit → array entries.
  *
  * Input: one row per company `(ticker, json)` where `json` is the raw
  * CompanyFacts document. The whole flatten is one narrow stage (no
  * shuffle): from_json + four generators + a projection, all
  * whole-stage-codegen'd. At 100 TB of filings this scales linearly with
  * input splits — there is no driver-side loop anywhere.
  */
object CompanyFacts {

  /** Flatten raw CompanyFacts JSON strings to the canonical fact table.
    * Malformed documents → from_json yields null → dropped; malformed
    * entries (null value) → dropped — the reference's per-row
    * try/skip (sec_client.py:230-249) as null-propagation. */
  def flatten(raw: DataFrame, tickerCol: String = "ticker", jsonCol: String = "json"): DataFrame = {
    val parsed = raw.select(
      col(tickerCol).as("ticker"),
      from_json(col(jsonCol), FactModel.companyFactsSchema).as("cf"))
    parsed
      .filter(col("cf").isNotNull)
      .select(col("ticker"), col("cf.entityName").as("company_name"),
        normalizeCik(col("cf.cik")).as("cik"),
        explode(col("cf.facts")).as(Seq("taxonomy", "concepts")))
      .select(col("ticker"), col("company_name"), col("cik"), col("taxonomy"),
        explode(col("concepts")).as(Seq("concept", "cdata")))
      .select(col("ticker"), col("company_name"), col("cik"), col("taxonomy"),
        col("concept"), col("cdata.label").as("label"),
        col("cdata.description").as("description"),
        explode(col("cdata.units")).as(Seq("unit_raw", "entries")))
      .select(col("ticker"), col("company_name"), col("cik"), col("taxonomy"),
        col("concept"), col("label"), col("description"), col("unit_raw"),
        explode(col("entries")).as("e"))
      .select(
        col("ticker"), col("company_name"), col("cik"), col("taxonomy"),
        col("concept"), col("label"), col("description"),
        col("e.val").as("value"),
        // unknown units → null (ref: sec_client.py:223-228)
        when(col("unit_raw").isInCollection(FactModel.KnownUnits), col("unit_raw"))
          .as("unit"),
        to_date(col("e.start")).as("start_date"),
        to_date(col("e.end")).as("end_date"),
        to_date(col("e.instant")).as("instant_date"),
        // unknown forms → null (ref: sec_client.py:264-275)
        when(col("e.form").isInCollection(FactModel.KnownForms), col("e.form"))
          .as("form"),
        col("e.fy").as("fiscal_year"),
        col("e.fp").as("fiscal_period"),
        col("e.frame").as("frame"))
      .filter(col("value").isNotNull)
  }

  /** F8 identity normalization: CIK zero-padded to 10 digits
    * (ref: models.py:64-69). */
  def normalizeCik(cik: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lpad(cik.cast("string"), 10, "0")

  /** F8: ticker uppercased/trimmed + format check — 1-6 alnum chars with
    * optional `.`/`-` segment (ref: models.py:71-74; data_service.py:312-324). */
  def normalizeTicker(tickerCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val t = upper(trim(tickerCol))
    when(t.rlike("^[A-Z0-9]{1,6}([.-][A-Z0-9]{1,4})?$"), t)
  }

  /** Ticker→CIK master list, both wire formats (ref: sec_client.py:126-148):
    * index-keyed `{"0": {cik_str, ticker, title}}` and columnar
    * `{fields, data}`. Driver-side parse (one ~1 MB file) → broadcast dim. */
  def parseTickerMap(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val indexed = """"cik_str"""".r.findFirstIn(json).isDefined
    val rows: Seq[FactModel.CompanyInfo] =
      if (indexed) {
        val entry = """\{[^{}]*"cik_str"\s*:\s*(\d+)[^{}]*"ticker"\s*:\s*"([^"]+)"[^{}]*"title"\s*:\s*"([^"]+)"[^{}]*\}""".r
        entry.findAllMatchIn(json).map { m =>
          FactModel.CompanyInfo(cik = f"${m.group(1).toLong}%010d",
            ticker = m.group(2).toUpperCase, name = m.group(3))
        }.toSeq
      } else {
        // columnar {fields:[...], data:[[...]]}: positions of cik/ticker/name
        val fields = """"fields"\s*:\s*\[([^\]]*)\]""".r
          .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
        val iCik = fields.indexOf("cik"); val iTic = fields.indexOf("ticker")
        val iName = fields.indexOf("name")
        val row = """\[\s*(\d+)\s*,\s*"([^"]*)"\s*,\s*"([^"]*)"(?:\s*,\s*"([^"]*)")?\s*\]""".r
        row.findAllMatchIn(json).map { m =>
          val cols = Seq(m.group(1), m.group(2), m.group(3))
          FactModel.CompanyInfo(
            cik = f"${cols(iCik).toLong}%010d",
            ticker = cols(iTic).toUpperCase,
            name = cols(iName))
        }.toSeq
      }
    rows.toDF()
  }
}
