package graft

import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.Relational
import graft.sources.{CompanyFacts, Serve}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Serving sinks + property-based invariants (SURVEY §5.4). ScalaCheck Gen
  * drives deterministic seeded samples (no scalatestplus bridge offline). */
class ServePropertySpec extends SparkSpec {

  /** Deterministic property runner: `n` samples from seeded generators. */
  def forSamples[T](gen: Gen[T], n: Int = 8)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(42L + i)).foreach(check)
    }

  test("CSV render: quoting, nulls, and the no-data fallback row") {
    import spark.implicits._
    val df = Seq(("a,b", Some(1.5)), ("plain", None)).toDF("s", "v")
    val csv = Serve.toCsvString(df)
    assert(csv === "s,v\n\"a,b\",1.5\nplain,")
    val empty = Serve.toCsvString(df.filter(lit(false)))
    assert(empty === "s,v\nNo data available")
  }

  test("parquet byte payload round-trips") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val bytes = Serve.toParquetBytes(df)
    assert(bytes.length > 0 && bytes.take(4).map(_.toChar).mkString === "PAR1")
    val tmp = java.nio.file.Files.createTempFile("rt", ".parquet")
    java.nio.file.Files.write(tmp, bytes)
    assert(spark.read.parquet(tmp.toString).count() === 2)
  }

  test("JSON envelope carries all rows") {
    import spark.implicits._
    val out = Serve.toJsonEnvelope(Seq((1, "a")).toDF("n", "s"), "2026-08-12T00:00:00Z")
    assert(out.contains(""""success":true""") && out.contains(""""n":1"""))
  }

  test("property: the driver-side JSON twin is byte-identical to Dataset.toJSON for local frames") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // the shapes /search envelopes actually carry (long/string ids, double
    // scores, nullable text, long ranks) plus the awkward cases: NaN/Inf
    // doubles, beyond-BMP unicode, embedded quotes/newlines, nulls,
    // float arrays
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("rank", LongType, nullable = false),
      StructField("emb", ArrayType(FloatType), nullable = true)))
    val rnd = new scala.util.Random(20260816L)
    val tricky = Seq("plain", "q\"uote", "line\nbreak", "tab\there",
      "emoji 😃 beyond-bmp 𐐷", null, "")
    val rows = (1 to 60).map { i =>
      Row(i.toLong,
        tricky(rnd.nextInt(tricky.length)),
        rnd.nextInt(5) match {
          case 0 => null
          case 1 => Double.NaN
          case 2 => Double.PositiveInfinity
          case _ => rnd.nextDouble() * 1e6 - 5e5
        },
        rnd.nextLong().abs % 1000,
        if (rnd.nextBoolean()) null
        else Array.fill(3)(rnd.nextFloat()).toSeq)
    }
    val local = graft.operators.DriverPlan.localFrame(spark, rows, schema)
    assert(org.apache.spark.sql.graftshim.GraftDatasetBridge
      .localToJsonLines(local).isDefined, "fixture: must take the driver path")
    val viaTwin = Serve.toJsonEnvelope(local, "2026-08-16T00:00:00Z")
    // force the distributed path on identical rows: repartition makes the
    // optimized plan non-local, so toJsonEnvelope falls back to the
    // toJSON.collect() job
    val dist = local.repartition(2)
      .sortWithinPartitions() // deterministic? no — so compare as sets below
    val distLines = dist.toJSON.collect().toSet
    val twinLines = org.apache.spark.sql.graftshim.GraftDatasetBridge
      .localToJsonLines(local).get.toSet
    assert(twinLines == distLines,
      s"twin/toJSON divergence: ${twinLines.diff(distLines).take(2)} vs ${distLines.diff(twinLines).take(2)}")
    assert(viaTwin.startsWith("""{"success":true,"timestamp":"2026-08-16T00:00:00Z","data":["""))
  }

  test("property: dedupArgmax is idempotent and keeps one row per key") {
    import spark.implicits._
    val gen = Gen.listOfN(60, for {
      k <- Gen.choose(0, 9); v <- Gen.choose(-1000, 1000); id <- Gen.choose(0, 100000)
    } yield (k, v, id))
    forSamples(gen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "v", "id")
        val once = Relational.dedupArgmax(df, Seq("k"),
          Seq(abs(col("v")).desc, col("id").asc))
        val twice = Relational.dedupArgmax(once, Seq("k"),
          Seq(abs(col("v")).desc, col("id").asc))
        val a = once.collect().map(_.toSeq).toSet
        assert(a === twice.collect().map(_.toSeq).toSet)
        assert(once.groupBy("k").count().filter(col("count") > 1).count() === 0)
      }
    }
  }

  test("property: dedupArgmaxAgg equals the window dedupArgmax under an equivalent ordering") {
    import spark.implicits._
    // ids unique within a sample so the (|v|, id)-ordering picks ONE row
    // deterministically in both implementations; smaller-id tiebreak is
    // reoriented for the aggregate by negation (the documented contract)
    val gen = Gen.listOfN(60, for {
      k <- Gen.choose(0, 9); v <- Gen.choose(-1000, 1000)
    } yield (k, v))
    forSamples(gen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.zipWithIndex.map { case ((k, v), id) => (k, v, id.toLong) }
          .toDF("k", "v", "id")
        val viaWindow = Relational.dedupArgmax(df, Seq("k"),
          Seq(abs(col("v")).desc, col("id").asc))
        val viaAgg = Relational.dedupArgmaxAgg(df, Seq("k"),
          Seq(abs(col("v")), -col("id")))
        assert(viaAgg.collect().map(_.toSeq).toSet ===
               viaWindow.collect().map(_.toSeq).toSet)
        // and the plan is the scale-winning shape: a hash aggregate with a
        // map-side partial, no WindowExec anywhere
        val plan = viaAgg.queryExecution.executedPlan.toString
        assert(!plan.contains("Window"), s"aggregate variant must not window:\n$plan")
      }
    }
  }

  test("property: CIK normalization is idempotent and fixed-width") {
    forSamples(Gen.choose(0L, 9999999999L)) { cik =>
      import spark.implicits._
      val once = Seq(cik).toDF("cik")
        .select(CompanyFacts.normalizeCik(col("cik")).as("c")).collect()(0).getString(0)
      assert(once.length === 10 && once.forall(_.isDigit))
      val twice = Seq(once).toDF("cik")
        .select(CompanyFacts.normalizeCik(col("cik")).as("c")).collect()(0).getString(0)
      assert(twice === once)
    }
  }

  test("property: poly hash stays in range and is deterministic") {
    implicit val d: Dialect = Dialect(spark = true)
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.alphaNumStr.map(_.take(30)))
    forSamples(gen, n = 4) { strs =>
      if (strs.nonEmpty) {
        val df = strs.toDF("s").select(expr(TX.polyHash("lower(s)")).as("h"))
        val hs = df.collect().map(_.getLong(0))
        assert(hs.forall(h => h >= 0 && h < TX.P))
        val again = strs.toDF("s").select(expr(TX.polyHash("lower(s)")).as("h"))
          .collect().map(_.getLong(0))
        assert(hs.toSeq === again.toSeq)
      }
    }
  }

  test("property: F2 annual and quarterly partition the FY/Q universe disjointly") {
    import graft.queries.Financials
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.oneOf[Option[String]](
      None, Some("FY"), Some("Q1"), Some("Q2"), Some("Q3"), Some("Q4")))
    forSamples(gen, n = 4) { fps =>
      val df = fps.zipWithIndex.map { case (fp, i) => (i, fp) }.toDF("id", "fiscal_period")
      val annual = df.filter(Financials.periodFilter("annual")).select("id").collect().map(_.getInt(0)).toSet
      val quarterly = df.filter(Financials.periodFilter("quarterly")).select("id").collect().map(_.getInt(0)).toSet
      assert((annual & quarterly).isEmpty)
      assert((annual | quarterly).size === fps.size) // full partition over FY/Q/null domain
    }
  }
}
