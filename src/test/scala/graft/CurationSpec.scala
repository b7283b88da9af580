package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Corpus-curation operators: decontamination, repetition signals, PII
  * scrubbing, mixture planning — hand-computed expectations on tiny
  * inputs (the oracle gate covers them at data scale). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contamination: shared-shingle counts and fractions; non-overlapping docs absent") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // shares 'alpha beta gamma', 'beta gamma delta' w/ bench
      (2L, "one two three four five six")            // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta unrelated tail")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, bench, "text", "doc_id",
        shingleN = 3, minShared = 1L)
      .collect()
    assert(out.length == 1)
    val r = out.head
    // doc 1 has 4 shingles; 'alpha beta gamma' + 'beta gamma delta' shared
    assert(r.getLong(0) == 1L && r.getLong(1) == 100L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 4L)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-9)
  }

  test("repetitionSignals: multiplicity stats on a repeating doc") {
    val docs = Seq(
      (1L, "a b a b a b"),       // 2-grams: ab ba ab ba ab → 5 total, 2 distinct, top 3
      (2L, "w x y z"),           // 3 distinct 2-grams, no repeats
      (3L, "single")             // < 2 tokens → absent
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionSignals(docs, "text", "doc_id", n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 2L))
    assert(m(1L).getLong(1) == 5L && m(1L).getLong(2) == 2L && m(1L).getLong(3) == 3L)
    assert(math.abs(m(1L).getDouble(4) - 0.6) < 1e-9)  // (5-2)/5
    assert(math.abs(m(1L).getDouble(5) - 0.6) < 1e-9)  // 3/5
    assert(m(2L).getLong(1) == 3L && m(2L).getLong(2) == 3L)
    assert(m(2L).getDouble(4) == 0.0)
  }

  test("scrubPatterns: per-pattern counts on original text, sequential redaction") {
    val pats = Seq(
      ("digit_run", "[0-9]{6,}", "<id>"),
      ("email", "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<email>"))
    val df = Seq(
      (1L, "user 123456789 mail bob@example.com and 000042 tail"),
      (2L, "nothing to redact")
    ).toDF("id", "s")
    val out = TextAnalysis.scrubPatterns(df, "s", "id", pats)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 2L) // two 6+-digit runs
    assert(out(1L).getLong(2) == 1L)
    assert(out(1L).getString(3) == "user <id> mail <email> and <id> tail")
    assert(out(2L).getLong(1) == 0L && out(2L).getLong(2) == 0L)
    assert(out(2L).getString(3) == "nothing to redact")
  }

  test("mixtureWeights: binding domain caps the total; quotas are integer-exact") {
    val docs = (Seq.fill(218)("en") ++ Seq.fill(70)("de") ++ Seq.fill(64)("fr"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val out = TextAnalysis.mixtureWeights(docs, "lang",
        Seq(("en", 500L), ("de", 250L), ("fr", 250L)))
      .collect().map(r => r.getString(0) -> r).toMap
    // budgets: en 218*1000/500=436, de 70*1000/250=280, fr 64*1000/250=256 → T=256
    assert(out("fr").getLong(3) == 64L)   // binding: keeps all
    assert(out("en").getLong(3) == 128L)  // 256*500/1000
    assert(out("de").getLong(3) == 64L)
    assert(out("en").getLong(4) == (128L * 1000L) / 218L)
    // kept proportions hit the target mix exactly
    assert(out("en").getLong(3) == 2 * out("de").getLong(3))
  }

  test("mixtureWeights: a target domain with zero docs collapses the plan to zero, visibly") {
    val docs = Seq.fill(10)("en").zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "lang")
    val out = TextAnalysis.mixtureWeights(docs, "lang",
        Seq(("en", 500L), ("fr", 500L)))
      .collect().map(r => r.getString(0) -> r).toMap
    // fr has no docs: the 50/50 mix is unachievable — the plan must SAY so
    // (all-zero quotas), not silently drop the fr constraint and keep all en
    assert(out.keySet == Set("en", "fr"))
    assert(out("fr").getLong(1) == 0L && out("fr").getLong(3) == 0L && out("fr").getLong(4) == 0L)
    assert(out("en").getLong(3) == 0L)
  }

  test("incremental near-dup finds new-vs-corpus pairs equal to the full pipeline's cross-split pairs") {
    val mk = (id: Long, s: String) => (id, s)
    val docs = Seq(
      mk(0L, "the quick brown fox jumps over the lazy dog again and again today"),
      mk(1L, "some totally unrelated corpus document about catalyst and shuffles"),
      mk(10L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      mk(11L, "fresh text with no resemblance to anything stored before now at all")
    ).toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") < 10)
    val newBatch = docs.filter(col("doc_id") >= 10)
    val index = graft.operators.Dedup.indexForIncremental(corpus, "text", "doc_id",
      k = 16, shingleN = 3, rowsPerBand = 4)
    val inc = graft.operators.Dedup.incrementalNearDups(newBatch, index, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
      .select("doc_new", "doc_old").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: full pipeline over everything, restricted to cross-split pairs
    val full = graft.operators.Dedup.nearDupPipeline(docs, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a < 10) != (b < 10) }
      .map { case (a, b) => if (a >= 10) (a, b) else (b, a) }.toSet
    assert(inc == full && inc.contains((10L, 0L)))
  }

  test("chunkDocuments: overlapping windows cover every token; text reassembles in order") {
    val docs = Seq((1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(docs, "text", "doc_id",
        chunkTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1: starts 0,2,4,6,8 — full windows of 4 until the tail
    assert(out((1L, 0L)) == (4L, "w1 w2 w3 w4"))
    assert(out((1L, 2L)) == (4L, "w3 w4 w5 w6"))
    assert(out((1L, 8L)) == (2L, "w9 w10"))
    // doc 2 (3 tokens): starts 0 and 2
    assert(out((2L, 0L)) == (3L, "a b c"))
    assert(out((2L, 2L)) == (1L, "c"))
    // every token of doc 1 appears in exactly chunkTokens/stride = 2 windows
    // (except tail tokens) — total tokens across chunks = 4*4 + 2 + ...
    assert(out.keys.count(_._1 == 1L) == 5)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(docs, "text", "doc_id", 4, 3)
    }
  }

  test("simhashNearDups: band candidates find exactly the brute-force hamming<=3 pairs") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 40)
    val banded = graft.operators.Dedup.simhashNearDups(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force over the same fingerprints (no banding — ground truth)
    val sims = graft.operators.Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b) -> h.toLong).toMap
    assert(banded == brute && brute.nonEmpty)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.simhashNearDups(docs, "text", "doc_id", 4)
    }
  }

  test("incremental index stored bucketed on (band_id, band_key): corpus side of the candidate join scans bucketed") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val index = graft.operators.Dedup.indexForIncremental(docs, "text", "doc_id",
      k = 16, shingleN = 3, rowsPerBand = 4)
    graft.sources.FactStore.writeBucketedMulti(index, "corpus_band_index",
      Seq("band_id", "band_key"), 4)
    try {
      val stored = spark.table("corpus_band_index")
      val newBatch = docs.limit(5).withColumn("doc_id", col("doc_id") + 1000000L)
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val inc = graft.operators.Dedup.incrementalNearDups(newBatch, stored,
          "text", "doc_id", k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
        inc.count() // materialize for AQE's final plan
        val plan = inc.queryExecution.executedPlan.toString
        // the stored side reads its bucket layout; only the (small) new
        // batch pays a shuffle for the band join. Assert on the
        // corpus_band_index scan ITSELF, not just anywhere in the plan
        val bucketedScanSection = plan.split("FileScan").find(s =>
          s.contains("corpus_band_index") && s.contains("band_id"))
        assert(bucketedScanSection.exists(_.contains("Bucketed: true")), plan)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql("DROP TABLE IF EXISTS corpus_band_index")
  }

  test("unigramLogProb: common-token docs score higher; hand-checked smoothing") {
    val docs = Seq(
      (1L, "common common common"),   // all high-frequency tokens
      (2L, "common rare"),            // mixed
      (3L, "common common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: common×6, rare×1 → N=7, V=2; p(common)=(6+1)/9, p(rare)=(1+1)/9
    val pc = math.log(7.0 / 9.0); val pr = math.log(2.0 / 9.0)
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - BigDecimal(pc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(out(2L)._2 - BigDecimal((pc + pr) / 2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(out(1L)._2 > out(2L)._2) // rare-token doc scores lower
  }

  test("gopherRules: per-rule verdicts on edge rows (empty, null, symbol-heavy, boundary counts)") {
    val docs = Seq(
      (1L, "the cat sat mat"),        // 4 toks, avg 3.0, no symbols, 1 stop → keep
      (2L, ""),                       // empty: 0 toks, null avg
      (3L, null.asInstanceOf[String]),// null text
      (4L, "a@# b$% c^&"),            // symbol-heavy; avg len 1.0 too short
      (5L, "the of and"),             // exactly minTokens; all-stopword
      (6L, "the of and to in is")     // 6 toks: one past maxTokens
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(docs, "text", "doc_id",
        minTokens = 3, maxTokens = 5, minAvgLen = 2.0, maxAvgLen = 4.0,
        maxSymbolRatio = 0.2, minStopHits = 1)
      .collect().map(r => r.getLong(0) -> r).toMap

    val clean = out(1L)
    assert(clean.getAs[Long]("n_tokens") == 4L)
    assert(math.abs(clean.getAs[Double]("avg_token_len") - 3.0) < 1e-9)
    assert(clean.getAs[Double]("symbol_ratio") == 0.0)
    assert(clean.getAs[Long]("stop_hits") == 1L)
    assert(clean.getAs[Long]("n_failed") == 0L && clean.getAs[Long]("keep") == 1L)

    // empty doc: token rule + stopword rule fail; avg is NULL (no tokens)
    // so the avg band fails too; symbol cap trivially passes on empty text
    val empty = out(2L)
    assert(empty.getAs[Long]("n_tokens") == 0L)
    assert(empty.isNullAt(empty.fieldIndex("avg_token_len")))
    assert(empty.getAs[Long]("pass_symbols") == 1L)
    assert(empty.getAs[Long]("n_failed") == 3L && empty.getAs[Long]("keep") == 0L)

    // null text: every token-derived signal is NULL; NULL comparisons fall
    // to the ELSE 0 branch — a null doc must never be kept
    val nul = out(3L)
    assert(nul.isNullAt(nul.fieldIndex("n_tokens")))
    assert(nul.getAs[Long]("pass_n_tokens") == 0L)
    assert(nul.getAs[Long]("pass_stopwords") == 0L)
    assert(nul.getAs[Long]("keep") == 0L)

    // symbol-heavy: 6 of 11 chars are symbols (0.545... > 0.2); 'a' is a
    // stopword so the stopword floor still passes; avg len 1.0 < 2.0
    val sym = out(4L)
    assert(sym.getAs[Long]("n_tokens") == 3L)
    assert(math.abs(sym.getAs[Double]("symbol_ratio") - 0.545455) < 1e-9)
    assert(sym.getAs[Long]("pass_symbols") == 0L)
    assert(sym.getAs[Long]("pass_avg_len") == 0L)
    assert(sym.getAs[Long]("n_failed") == 2L && sym.getAs[Long]("keep") == 0L)

    // boundary: exactly minTokens passes the band...
    val lo = out(5L)
    assert(lo.getAs[Long]("n_tokens") == 3L && lo.getAs[Long]("pass_n_tokens") == 1L)
    assert(lo.getAs[Long]("keep") == 1L)
    // ...and one past maxTokens fails it, and nothing else
    val hi = out(6L)
    assert(hi.getAs[Long]("n_tokens") == 6L && hi.getAs[Long]("pass_n_tokens") == 0L)
    assert(hi.getAs[Long]("n_failed") == 1L && hi.getAs[Long]("keep") == 0L)
  }

  test("dsirWeights: symmetric hand-checked weights; census broadcasts in the apply join") {
    val docs = Seq(
      (1L, "alpha beta gamma", true),   // bigrams: 'alpha beta' (shared), 'beta gamma'
      (2L, "alpha beta delta", false)   // bigrams: 'alpha beta' (shared), 'beta delta'
    ).toDF("doc_id", "text", "tgt")
    val out = TextAnalysis.dsirWeights(docs, "text", "doc_id", col("tgt"), 4096)
    val m = out.collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3))).toMap
    // shared feature contributes 0 (c_t=c_s=1, n_t=n_s=2); the private
    // feature contributes ±(ln(2/4098) - ln(1/4098)) = ±ln 2
    assert(m(1L)._1 && !m(2L)._1)
    assert(m(1L)._2 == 2L && m(2L)._2 == 2L)
    assert(math.abs(m(1L)._3 - math.log(2.0)) < 1e-5, m(1L)._3.toString)
    assert(math.abs(m(2L)._3 + math.log(2.0)) < 1e-5, m(2L)._3.toString)
    // the ≤buckets-row census must broadcast — the corpus-side apply join
    // must never shuffle on the feature key
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dsirScore against a trained model equals dsirWeights' per-doc scores") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 150)
    val tgt = col("lang") === "en"
    val expected = TextAnalysis.dsirWeights(docs, "text", "doc_id", tgt, 4096)
      .select("doc_id", "n_features", "log_weight")
      .orderBy("doc_id").collect().map(_.toSeq)
    val model = TextAnalysis.dsirModel(docs, "text", tgt, 4096)
    val totals = TextAnalysis.dsirTotals(model)
    val got = TextAnalysis.dsirScore(docs, "text", "doc_id", model, totals, 4096)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(got.length > 0 && got.toSeq === expected.toSeq)
  }

  test("group canonical selection keeps the highest-quality duplicate, not the smallest id") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today indeed"),
      (3L, "completely unrelated text about catalyst optimizer internals only")
    ).toDF("doc_id", "text")
    val groups = graft.operators.Dedup.dedupGroups(docs, "text", "doc_id",
      k = 16, shingleN = 3, rowsPerBand = 2, threshold = 0.2)
    implicit val d: graft.functions.Dialect = graft.functions.Dialect(spark = true)
    val quality = docs.select(col("doc_id"),
      expr(s"CAST(size(${graft.functions.TextExprs.tokens("text")}) AS BIGINT)")
        .as("n_tokens"))
    val got = groups.join(quality, "doc_id")
      .groupBy("group_id")
      .agg(min_by(struct(col("doc_id"), col("n_tokens")),
        struct((-col("n_tokens")).as("q"), col("doc_id").as("tb"))).as("w"))
      .select(col("group_id"), col("w.doc_id").as("keep_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1 and 2 group together (group id = min member = 1); the LONGER
    // doc 2 is kept, though doc 1 has the smaller id
    assert(got == Map(1L -> 2L), got.toString)
  }

  test("mixtureWeights: rejects targets not summing to 1000") {
    val docs = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      TextAnalysis.mixtureWeights(docs, "lang", Seq(("en", 500L)))
    }
  }

  test("vocabDrift: a snapshot compared to itself has zero drift; an injected term surfaces as the top mover") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    // self-comparison: identical censuses → every log ratio is exactly 0
    val self = TextAnalysis.vocabDrift(docs, docs, "text", 512, 10)
      .collect()
    assert(self.length == 10)
    assert(self.forall(_.getDouble(3) == 0.0),
      s"self-drift must be zero: ${self.map(_.getDouble(3)).mkString(",")}")
    // inject a flood of one novel token into snapshot B only: the mover
    // report must lead with a bucket that exists only in B (c_a == 0)
    import spark.implicits._
    val flooded = docs.select(col("doc_id"), col("text"))
      .unionByName(Seq.tabulate(50)(i =>
        (1000000L + i, "zzdriftterm zzdriftterm zzdriftterm"))
        .toDF("doc_id", "text"))
    val movers = TextAnalysis.vocabDrift(
      docs.select("doc_id", "text"), flooded, "text", 512, 5).collect()
    val top = movers.head
    assert(top.getLong(2) > top.getLong(1),
      s"top mover must have grown in snapshot B: $top")
    assert(top.getDouble(3) < 0.0, "B-heavy mover has a negative A:B log ratio")
  }
}
