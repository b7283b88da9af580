package graft.sources

import org.apache.spark.sql.DataFrame

/** Serving-layer renderers (SURVEY §2.1 S9-S11): CSV, parquet byte payload,
  * JSON rows. Two regimes:
  * - bulk: distributed `df.write` (engine-side, scales with the data);
  * - API streaming: bounded `collect` AFTER the engine has filtered/limited
  *   — only ever called on capped serving results (ref returns capped
  *   series: data_service.py:179-186), never on raw tables.
  */
object Serve {

  /** CSV quoting applied to the RENDERED string of a cell, whatever its
    * type — arrays/structs/timestamps whose toString contains commas or
    * newlines must be quoted too, or they shift the row layout. */
  private def csvCell(v: Any): String = v match {
    case null => ""
    case other =>
      val s = other match { case str: String => str; case x => x.toString }
      if (s.exists(",\"\n\r".contains(_))) "\"" + s.replace("\"", "\"\"") + "\""
      else s
  }

  /** S9 CSV render with the reference's no-data fallback row
    * (ref: data_service.py:273-299). For capped API results. */
  def toCsvString(df: DataFrame, fallbackMessage: String = "No data available"): String = {
    val cols = df.columns
    val rows = df.collect()
    val header = cols.map(csvCell).mkString(",")
    if (rows.isEmpty) s"$header\n$fallbackMessage"
    else {
      val body = rows.map(_.toSeq.map(csvCell).mkString(",")).mkString("\n")
      s"$header\n$body"
    }
  }

  /** S9 bulk CSV: distributed write with header. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.option("header", "true").mode("overwrite").csv(path)

  /** S10 parquet byte payload for HTTP download (ref: data_service.py:228-271):
    * engine writes a single parquet file, serving layer streams the bytes. */
  def toParquetBytes(df: DataFrame): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempDirectory("serve_pq")
    try {
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val file = tmp.toFile.listFiles()
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(
          s"parquet write produced no part file under $tmp"))
      java.nio.file.Files.readAllBytes(file.toPath)
    } finally {
      // the payload is in memory now — don't leak a disk copy per request
      import scala.util.Try
      Try(java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () }))
    }
  }

  /** Minimal JSON string-literal escaper for caller-supplied scalars that
    * get interpolated into the envelope (quotes, backslashes, control
    * chars — everything a JSON string may not contain raw). */
  def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** S11 JSON rows with the response envelope shape
    * (ref: models.py:152-196 — success flag + timestamp + data).
    * LocalRelation-backed frames (every /search response re-framed from
    * collected rows) serialize on the driver through the same
    * JacksonGenerator a toJSON task runs — byte-identical, no Spark
    * job; distributed frames keep the toJSON job. */
  def toJsonEnvelope(df: DataFrame, timestamp: String): String = {
    val rows = org.apache.spark.sql.graftshim.GraftDatasetBridge
      .localToJsonLines(df)
      .getOrElse(df.toJSON.collect().toSeq).mkString(",")
    s"""{"success":true,"timestamp":"${jsonEscape(timestamp)}","data":[$rows]}"""
  }
}
