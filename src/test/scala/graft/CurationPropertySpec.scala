package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the curation operators, checked against
  * plain-Scala reference implementations on seeded random inputs (same
  * deterministic Gen runner as ServePropertySpec — no scalatestplus
  * bridge offline). */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  def forSamples[T](gen: Gen[T], n: Int = 6)(check: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen(Gen.Parameters.default, Seed(977L + i)).foreach(check)
    }

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "w1", "w2", "zz")
  private val docGen: Gen[List[String]] = Gen.chooseNum(0, 23).flatMap(Gen.listOfN(_, wordGen))

  test("native tokenizer front end equals the regex/window pipeline on adversarial strings") {
    // the native expressions (graft_minhash_doc / graft_shingle_hashes /
    // graft_simhash) re-implement lower+strip+split procedurally; this
    // hammers that claim with case mixes, unicode (including the Kelvin
    // sign, which LOWERCASES INTO ascii 'k'), combining marks, surrogate
    // pairs, digits, runs of separators, and empty/whitespace-only docs
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '-', '_', '!', '@'),
      1 -> Gen.oneOf('É', 'ß', 'Ω', '中', 'K' /* Kelvin → 'k' */,
        '́' /* combining acute */, '\uD83D', '\uDE00' /* 😀 halves */))
    val textGen: Gen[String] = Gen.chooseNum(0, 60)
      .flatMap(Gen.listOfN(_, charGen)).map(_.mkString)
    forSamples(Gen.listOfN(40, textGen), n = 4) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nat = graft.operators.Dedup.shingleHashRows(df, "text", "doc_id", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val ref = graft.operators.Dedup.shingleHashRowsWindowed(df, "text", "doc_id", 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(nat == ref, s"shingle mismatch on ${texts.mkString("|")}")
      val sa = graft.operators.Dedup.simhash(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sb = graft.operators.Dedup.simhashExploded(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sa == sb, s"simhash mismatch on ${texts.mkString("|")}")
      // token count: native walk vs portable regex/split/filter
      graft.functions.GraftFunctions.register(spark)
      implicit val sd: graft.functions.Dialect = graft.functions.Dialect(spark = true)
      val tc = df.select(col("doc_id"),
          expr(graft.functions.TextExprs.tokenCountAuto("text")).as("a"),
          expr(s"CAST(size(${graft.functions.TextExprs.tokens("text")}) AS BIGINT)").as("b"))
        .collect()
      tc.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2)
          && (r.isNullAt(1) || r.getLong(1) == r.getLong(2)),
          s"token count mismatch on doc ${r.getLong(0)}")
      }
    }
  }

  test("chunkDocuments equals a local sliding-window reference on random docs") {
    val chunk = 4; val stride = 2
    forSamples(Gen.listOfN(5, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.chunkDocuments(df, "text", "doc_id", chunk, stride)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
      val expected = docs.zipWithIndex.flatMap { case (ws, i) =>
        (0 until ws.length by stride).map { s =>
          val win = ws.slice(s, s + chunk)
          (i.toLong, s.toLong) -> (win.length.toLong, win.mkString(" "))
        }
      }.toMap
      assert(got == expected)
    }
  }

  test("repetitionSignals matches local multiset stats; fractions stay in [0,1]") {
    forSamples(Gen.listOfN(6, docGen)) { docs =>
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = TextAnalysis.repetitionSignals(df, "text", "doc_id", n = 2)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      docs.zipWithIndex.foreach { case (ws, i) =>
        val grams = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toList
        if (grams.isEmpty) assert(!got.contains(i.toLong))
        else {
          val counts = grams.groupBy(identity).view.mapValues(_.size)
          val (n, d, t) = got(i.toLong)
          assert(n == grams.length && d == counts.size && t == counts.values.max)
          assert(d <= n && t <= n)
        }
      }
    }
  }

  test("mixtureWeights: quotas bounded by counts, proportion-exact, total maximal") {
    val countsGen = Gen.listOfN(3, Gen.chooseNum(0L, 400L))
    forSamples(countsGen) { counts =>
      val domains = Seq("a", "b", "c")
      val targets = Seq(("a", 200L), ("b", 300L), ("c", 500L))
      val rows = domains.zip(counts).flatMap { case (d, n) =>
        Seq.fill(n.toInt)(d) }.zipWithIndex.map { case (d, i) => (i.toLong, d) }
      val df = (if (rows.isEmpty) Seq((-1L, "zzz")) else rows).toDF("doc_id", "lang")
      val got = TextAnalysis.mixtureWeights(df, "lang", targets)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
      val byDomain = domains.zip(counts).toMap
      val totalBudget = targets.map { case (d, pm) => byDomain(d) * 1000L / pm }.min
      targets.foreach { case (d, pm) =>
        val (n, keep, rate) = got(d)
        assert(n == byDomain(d))
        assert(keep == totalBudget * pm / 1000L) // proportion-exact by construction
        assert(keep <= n && rate <= 1000L)
      }
    }
  }

  test("scrubPatterns: digit-run count matches a local scan; scrubbing is idempotent") {
    val pats = Seq(("digit_run", "[0-9]{6,}", "<id>"))
    val chunkGen = Gen.oneOf(Gen.chooseNum(1, 9).map("abc" * _),
      Gen.chooseNum(1, 9).map("1234567" * _))
    val strGen = Gen.listOfN(4, chunkGen).map(_.mkString(" "))
    forSamples(Gen.listOfN(5, strGen)) { strs =>
      val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
      val out = TextAnalysis.scrubPatterns(df, "s", "id", pats)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      strs.zipWithIndex.foreach { case (s, i) =>
        val runs = "[0-9]{6,}".r.findAllIn(s).size
        val (n, scrubbed) = out(i.toLong)
        assert(n == runs)
        assert(!"[0-9]{6,}".r.findFirstIn(scrubbed).isDefined)
      }
      // idempotence: a second scrub pass changes nothing
      val again = TextAnalysis.scrubPatterns(
          out.toSeq.map { case (i, (_, s)) => (i, s) }.toDF("id", "s"), "s", "id", pats)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      out.foreach { case (i, (_, s)) => assert(again(i) == s) }
    }
  }

  test("tombstone+sweep exact-delete property: ANY retraction set at ANY threshold equals built-without-them") {
    import graft.operators.Quantize
    // small planted corpus: 4 well-separated directions, 48 vectors — big
    // enough for multi-cell routing, small enough to build a store per
    // sample. The property: for a RANDOM retraction set and a RANDOM
    // sweep threshold, the retained search over (partially swept store +
    // remaining tombstones) equals the search over an index built without
    // the retracted ids. The deterministic spec pins 4 curated states;
    // this hammers the invariant across the state space.
    def vec(c: Int, i: Long): Array[Float] =
      Array.tabulate(16)(j => (if (j / 4 == c) 1.0f else 0.0f) +
        ((i * 31 + j * 7) % 13).toFloat / 100f)
    val corpusRows = (0L until 48L).map(i => (i, vec((i % 4).toInt, i)))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    val cents = (0 until 4).map(c => (c.toLong, vec(c, c.toLong)))
      .toDF("cid", "cv")
    val codebook = corpusRows.take(8).toDF("code_id", "c_emb")
    val queries = corpus.filter(col("vec_id") < 6)
    def result(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val caseGen = for {
      retract <- Gen.someOf(6L until 48L) // queries never retracted
      frac <- Gen.oneOf(0.001, 0.2, 0.5, 0.9, 1.0)
    } yield (retract.toSet, frac)
    forSamples(caseGen, n = 5) { case (retract, frac) =>
      val dir = java.nio.file.Files.createTempDirectory("ret-prop").toString
      val store = s"$dir/store"
      Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(corpus, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 16, 4), store)
      if (retract.nonEmpty) {
        Quantize.addTombstones(spark, store,
          corpus.filter(col("vec_id").isInCollection(retract)).select("vec_id"),
          "vec_id")
        Quantize.retentionSweep(spark, store, "vec_id", frac)
      }
      val survivors = corpus.filter(!col("vec_id").isInCollection(retract))
      val ref = s"$dir/ref"
      Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(survivors, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 16, 4), ref)
      val expected = result(Quantize.ivfPqSearchStored(spark, ref,
        queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 16, 4, 3, 2))
      val got = result(Quantize.ivfPqSearchStoredRetained(spark, store,
        queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 16, 4, 3, 2))
      assert(got == expected,
        s"retract=${retract.toSeq.sorted.mkString(",")} frac=$frac: " +
          "retained search diverged from built-without-them")
    }
  }

  test("deterministicSplit: subset-invariance and exhaustive disjoint cover") {
    forSamples(Gen.listOfN(40, Gen.chooseNum(0L, 10000L)).map(_.distinct)) { ids =>
      val df = ids.map(i => (i, s"doc$i")).toDF("doc_id", "text")
      val full = TextAnalysis.deterministicSplit(df, "doc_id")
        .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(full.keySet == ids.toSet) // every doc in exactly one split
      // subset invariance: removing half the corpus never moves a survivor
      val half = ids.filter(_ % 2 == 0)
      val sub = TextAnalysis.deterministicSplit(
          half.map(i => (i, s"doc$i")).toDF("doc_id", "text"), "doc_id")
        .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      sub.foreach { case (id, s) => assert(full(id) == s) }
    }
  }
}
