package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.FactModel

/** DataSource V2 connector for directories of SEC CompanyFacts JSON
  * documents (`CIK##########.json`, one company per file — the layout of
  * the reference's bulk download; ref: src/core/sec_client.py:196-252 is
  * the per-document walk this reader re-implements as a connector).
  *
  * `spark.read.format("secfacts").load(dir)` yields the canonical flat
  * fact table (FactModel.factSchema minus the serving-side `ticker`
  * column, which joins in from the ticker map). This is the idiomatic
  * Spark shape for a custom source — the engine-level alternative to
  * "fetch then flatten" when the filings already sit on shared storage:
  *
  *  - **Partition planning**: one InputPartition per file; a 10k-company
  *    corpus scans as 10k parallel splits with no driver-side loops.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): `cik` equality/IN
  *    prunes WHOLE FILES by name before any byte is read (the filename
  *    carries the cik — file pruning leans on the SEC bulk-download
  *    invariant that `CIK##########.json` names match the document's own
  *    cik field; non-conforming names are never pruned, and the reader
  *    fails loudly on any file whose name disagrees with its document, so
  *    a violated invariant surfaces instead of silently losing rows from
  *    pruned scans); `fiscal_year`
  *    comparisons apply during the parse walk so non-matching entries
  *    never materialize rows. All filters are ALSO left with Spark for
  *    re-application — pushdown here only reduces IO, it never decides
  *    correctness.
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the reader
  *    builds only requested fields. The parse itself still walks the
  *    tree (JSON has no columnar skip), but row width — and everything
  *    downstream — is pruned.
  *
  * Semantics match `CompanyFacts.flatten` exactly (null-value entries
  * dropped, unknown units/forms nulled, cik zero-padded) — the spec
  * compares the two row-for-row, so the connector and the from_json
  * flatten keep proving each other.
  */
class SecFactsSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "secfacts"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SecFactsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SecFactsTable(properties.get("path"))
}

object SecFactsSource {
  /** The flat fact schema minus `ticker` (identity joins in downstream). */
  val schema: StructType =
    StructType(FactModel.factSchema.filterNot(_.name == "ticker"))

  private[v2] val FileCik = """(?i)cik(\d+)\.json""".r.unanchored

  /** cik encoded in a CompanyFacts filename, zero-padded — None for
    * non-conforming names (those files are always read). */
  private[v2] def cikFromName(name: String): Option[String] = name match {
    case FileCik(digits) => Some(("0" * 10 + digits).takeRight(10))
    case _ => None
  }
}

class SecFactsTable(path: String) extends Table with SupportsRead {
  require(path != null, "secfacts requires a path: spark.read.format(\"secfacts\").load(dir)")
  override def name(): String = s"secfacts(`$path`)"
  override def schema(): StructType = SecFactsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SecFactsScanBuilder(path)
}

class SecFactsScanBuilder(path: String) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = SecFactsSource.schema
  private var pushed: Array[Filter] = Array.empty

  /** cik filters prune files, fiscal_year ranges filter during parse —
    * but EVERY filter is also returned to Spark for re-application
    * (filters this source "accepts" would otherwise never be re-checked,
    * and the file-level cik prune is only an optimization: files with
    * non-conforming names are read unpruned, and a filename whose digits
    * disagreed with the JSON's own cik field must not leak wrong rows).
    * Returning them all keeps pushdown purely an IO reducer, never a
    * correctness gate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("cik", _: String) => true
      case In("cik", vs) => vs.forall(_.isInstanceOf[String])
      case EqualTo("fiscal_year", _: Int) => true
      case GreaterThan("fiscal_year", _: Int) => true
      case GreaterThanOrEqual("fiscal_year", _: Int) => true
      case LessThan("fiscal_year", _: Int) => true
      case LessThanOrEqual("fiscal_year", _: Int) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SecFactsScan(path, required, pushed)
}

class SecFactsScan(path: String, required: StructType, pushed: Array[Filter])
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def cikKeep: Option[Set[String]] = {
    val sets = pushed.collect {
      case EqualTo("cik", v: String) => Set(v)
      case In("cik", vs) => vs.map(_.asInstanceOf[String]).toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  // files listed once at planning; cik filters skip files HERE, before read
  private lazy val (allFiles, keptFiles): (Seq[String], Seq[String]) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(path), true)
    val all = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.toLowerCase.endsWith(".json"))
        all += f.getPath.toString
    }
    val kept = cikKeep match {
      case None => all.toSeq
      case Some(keep) => all.toSeq.filter { p =>
        val name = new org.apache.hadoop.fs.Path(p).getName
        SecFactsSource.cikFromName(name).forall(keep.contains)
      }
    }
    (all.toSeq, kept)
  }

  override def planInputPartitions(): Array[InputPartition] =
    keptFiles.sorted.map(f => SecFactsPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // the session's Hadoop conf must travel to executors (s3a credentials,
    // kerberos, custom fs impls) — a fresh Configuration() on the task side
    // would list fine on the driver and then fail every read task
    val confBytes = SecFactsScan.serializeConf(
      org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())
    new SecFactsReaderFactory(required, pushed.filterNot {
      case EqualTo("cik", _) | In("cik", _) => true; case _ => false
    }, confBytes)
  }

  /** Shows in `.explain` — the spec asserts file skipping from this. */
  override def description(): String =
    s"SecFactsScan files=${keptFiles.size}/${allFiles.size} " +
      s"columns=${required.size}/${SecFactsSource.schema.size} " +
      s"pushed=[${pushed.mkString(", ")}]"
}

object SecFactsScan {
  /** Hadoop Configuration isn't Serializable — ship it as its writable
    * byte form (what Spark's own SerializableConfiguration does). */
  def serializeConf(conf: org.apache.hadoop.conf.Configuration): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    conf.write(out); out.flush()
    bos.toByteArray
  }
  def deserializeConf(bytes: Array[Byte]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    conf
  }
}

case class SecFactsPartition(file: String) extends InputPartition

class SecFactsReaderFactory(required: StructType, rowFilters: Array[Filter],
                            confBytes: Array[Byte])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new SecFactsReader(partition.asInstanceOf[SecFactsPartition].file,
      required, rowFilters, SecFactsScan.deserializeConf(confBytes))
}

/** Per-file reader: jackson tree walk → InternalRows of the pruned schema.
  * One CompanyFacts document is MBs at most, so a per-file DOM parse is
  * the right tradeoff (the corpus parallelism is across files). */
class SecFactsReader(file: String, required: StructType, rowFilters: Array[Filter],
                     hadoopConf: org.apache.hadoop.conf.Configuration)
  extends PartitionReader[InternalRow] {

  private def fyOk(fy: Option[Int]): Boolean = rowFilters.forall {
    case EqualTo("fiscal_year", v: Int) => fy.contains(v)
    case GreaterThan("fiscal_year", v: Int) => fy.exists(_ > v)
    case GreaterThanOrEqual("fiscal_year", v: Int) => fy.exists(_ >= v)
    case LessThan("fiscal_year", v: Int) => fy.exists(_ < v)
    case LessThanOrEqual("fiscal_year", v: Int) => fy.exists(_ <= v)
    case _ => true
  }

  private val rows: Iterator[InternalRow] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val in = p.getFileSystem(hadoopConf).open(p)
    val root = try new ObjectMapper().readTree(in) finally in.close()

    def str(n: JsonNode, f: String): Option[String] =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText())
    // malformed dates → null, matching from_json's permissive DateType
    // behavior in CompanyFacts.flatten (one dirty filing must not fail
    // the scan, and the row-identity contract must hold on dirty data)
    def dateDays(s: Option[String]): Any =
      s.flatMap(v => scala.util.Try(
        java.time.LocalDate.parse(v).toEpochDay.toInt).toOption).orNull

    val cik = Option(root.get("cik")).filterNot(_.isNull)
      .map(c => ("0" * 10 + c.asLong().toString).takeRight(10)).orNull
    // filename-vs-document invariant check: the cik file prune
    // (SecFactsScan) trusts that a CIK##########.json name matches the
    // document's own cik field. If they ever disagree, a cik-filtered scan
    // would silently never read this file's matching rows — so every read
    // that DOES touch the file fails loudly, surfacing the broken
    // invariant instead of letting pruned scans quietly lose data.
    SecFactsSource.cikFromName(new org.apache.hadoop.fs.Path(file).getName)
      .foreach { fromName =>
        if (cik != null && cik != fromName)
          throw new IllegalStateException(
            s"secfacts: filename of $file encodes cik $fromName but the " +
              s"document's cik field is $cik — the file-pruning naming " +
              "invariant is violated (rename the file or fix the document)")
      }
    val companyName = str(root, "entityName").orNull

    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val facts = Option(root.get("facts")).filterNot(_.isNull)
    for (f <- facts; tax <- f.properties().asScala) {
      val taxonomy = tax.getKey
      for (con <- tax.getValue.properties().asScala) {
        val concept = con.getKey
        val cdata = con.getValue
        val label = str(cdata, "label").orNull
        val description = str(cdata, "description").orNull
        for (units <- Option(cdata.get("units")).filterNot(_.isNull).toSeq;
             u <- units.properties().asScala) {
          val unitRaw = u.getKey
          val unit = if (FactModel.KnownUnits.contains(unitRaw)) unitRaw else null
          u.getValue.elements().asScala.foreach { e =>
            val value = Option(e.get("val")).filterNot(_.isNull).map(_.asDouble())
            val fy = Option(e.get("fy")).filterNot(_.isNull).map(_.asInt())
            if (value.isDefined && fyOk(fy)) {
              val formRaw = str(e, "form")
              val full = Map[String, Any](
                "company_name" -> companyName, "cik" -> cik,
                "taxonomy" -> taxonomy, "concept" -> concept,
                "label" -> label, "description" -> description,
                "value" -> value.get, "unit" -> unit,
                "start_date" -> dateDays(str(e, "start")),
                "end_date" -> dateDays(str(e, "end")),
                "instant_date" -> dateDays(str(e, "instant")),
                "form" -> formRaw.filter(FactModel.KnownForms.contains).orNull,
                "fiscal_year" -> fy.orNull,
                "fiscal_period" -> str(e, "fp").orNull,
                "frame" -> str(e, "frame").orNull)
              out += new GenericInternalRow(required.fields.map { sf: StructField =>
                full(sf.name) match {
                  case s: String => UTF8String.fromString(s)
                  case other => other
                }
              })
            }
          }
        }
      }
    }
    out.iterator
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
