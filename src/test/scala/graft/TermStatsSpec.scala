package graft

import graft.functions.{Dialect, GraftFunctions, TextExprs => TX}
import graft.operators.Retrieval
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The zero-shuffle census: `graft_term_stats` / `graft_term_freqs`
  * must reproduce, bit-for-bit, the census the old explode →
  * groupBy(doc_id, term) formulation computed — including tokenizer
  * edge cases — and must plan with NO Exchange before the consumer's
  * own keying. */
class TermStatsSpec extends SparkSpec {

  // Tokenizer gauntlet: unicode (non-ascii separators), digits-in-words,
  // repeated terms, leading/trailing separators, empty text, null text,
  // single token, surrogate-pair codepoints as separators.
  private def corpus: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "cat cat dog bird cat"),
      (2L, "  The—quick,BROWN fox2!! fox2 "),
      (3L, ""),
      (4L, null.asInstanceOf[String]),
      (5L, "solo"),
      (6L, "a😀b a b a"), // emoji separates "a" and "b"
      (7L, "x1 x1 x1 x1 x1 y y z")
    ).toDF("doc_id", "text")
  }

  /** The pre-round-10 formulations, kept verbatim as the oracle. */
  private def oldIndex(c: DataFrame): DataFrame = {
    GraftFunctions.register(c.sparkSession)
    val d = Dialect(spark = true)
    c.select(col("doc_id"),
        expr(TX.tokenCountAuto("text")(d)).as("dl"),
        explode(expr(TX.tokensAuto("text")(d))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
  }
  private def oldIndexPositional(c: DataFrame): DataFrame = {
    GraftFunctions.register(c.sparkSession)
    val d = Dialect(spark = true)
    c.select(col("doc_id"),
        expr(TX.tokenCountAuto("text")(d)).as("dl"),
        posexplode(expr(TX.tokensAuto("text")(d))).as(Seq("p0", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"),
        sort_array(collect_list(col("p0") + 1)).as("pos"))
  }

  test("bm25Index census equals the old groupBy census on the tokenizer gauntlet") {
    val got = Retrieval.bm25Index(corpus, "text", "doc_id")
    assert(got.columns.toSeq == Seq("doc_id", "term", "tf", "dl"))
    val g = got.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val o = oldIndex(corpus).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(g == o)
    assert(g.nonEmpty)
    // docs 3 (empty) and 4 (null) contribute no census rows
    assert(!g.exists(r => r._1 == 3L || r._1 == 4L))
  }

  test("bm25IndexPositional equals the old posexplode census; positions ascending 1-based, tf = size(pos)") {
    val got = Retrieval.bm25IndexPositional(corpus, "text", "doc_id")
    assert(got.columns.toSeq == Seq("doc_id", "term", "tf", "dl", "pos"))
    val g = got.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getSeq[Int](4).toList)).toSet
    val o = oldIndexPositional(corpus).collect().map(r => (r.getLong(0),
      r.getString(1), r.getLong(2), r.getLong(3),
      r.getSeq[Int](4).toList)).toSet
    assert(g == o)
    g.foreach { case (_, _, tf, _, pos) =>
      assert(tf == pos.size)
      assert(pos == pos.sorted && pos.head >= 1)
    }
    // hand-checked doc 6: emoji is a separator → tokens a b a b a
    val d6 = g.filter(_._1 == 6L).map(t => (t._2, t._5)).toMap
    assert(d6 == Map("a" -> List(1, 3, 5), "b" -> List(2, 4)))
  }

  /** Plan-shape assertions need a real source: over a LocalRelation the
    * optimizer (ConvertToLocalRelation) constant-folds Project/Filter
    * chains away and the assert would be vacuous. */
  private def parquetCorpus: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("termstats-plan").toString
    corpus.write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("census plans with zero Exchange; every Project/Generate codegen'd (no CodegenFallback)") {
    val pc = parquetCorpus
    for (census <- Seq(Retrieval.bm25Index(pc, "text", "doc_id"),
                       Retrieval.bm25IndexPositional(pc, "text", "doc_id"))) {
      val plan = census.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // codegen'd operators render with a *(n) stage star; a bare
      // "Project [" / "Generate " line means something fell out of WSCG
      val bare = plan.linesIterator.filter(l =>
        (l.contains("Project [") || l.contains("Generate ")) &&
          !l.contains("*(")).toList
      assert(bare.isEmpty, s"non-codegen operators:\n${bare.mkString("\n")}\n$plan")
    }
  }

  test("langId: zero-exchange plan; equals the old explode → groupBy formulation") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.langId(parquetCorpus, "text", "doc_id")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // the tokenizer must run ONCE per row: a pushed-down dl>0 filter that
    // re-evaluates graft_term_freqs would double the scan's CPU
    assert("graft_term_freqs".r.findAllIn(plan).length == 1, plan)
    val d = Dialect(spark = true)
    val old = corpus
      .select(col("doc_id"), explode(expr(TX.tokensAuto("text")(d))).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("w").isInCollection(TextAnalysis.StopEn), 1L)
          .otherwise(0L)).as("en_hits"))
      .withColumn("en_ratio",
        col("en_hits").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pred_lang",
        when(col("en_ratio") >= 0.05, "en").otherwise("other"))
    assert(got.columns.toSeq == old.columns.toSeq)
    def key(df: DataFrame) = df.collect().map(r => (r.getLong(0),
      r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))).toSet
    assert(key(got) == key(old))
    assert(key(got).nonEmpty)
  }

  // vocabDrift's tf-weighted census is gated by its DuckDB oracle
  // (qx42/qx72 hash-match the per-occurrence SQL census at all SFs).
  test("countMinSketch / unigramLogProb: tf-weighted census equals the occurrence-stream census") {
    import graft.operators.TextAnalysis
    val d = Dialect(spark = true)
    // count-min: integer-exact equality against the old per-occurrence count
    val sk = TextAnalysis.countMinSketch(corpus, "text", depth = 3, width = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oldTok = corpus.select(explode(expr(TX.tokensAuto("text")(d))).as("term"))
    val oldSk = oldTok.select(posexplode(array((0 until 3).map(i =>
        expr(TX.cmBucket("term", i, 16)(d)).cast("long")): _*)).as(Seq("row", "bucket")))
      .select(col("row").cast("long").as("row"), col("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sk == oldSk && sk.nonEmpty)
    // unigram LM: same rows at the 6dp gate
    val lm = TextAnalysis.unigramLogProb(corpus, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val tok = corpus.select(col("doc_id"), explode(expr(TX.tokensAuto("text")(d))).as("w"))
    val freq = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
    val totals = freq.agg(sum("cnt").as("n"), count(lit(1)).as("v"))
    val oldLm = tok.join(broadcast(freq), "w").crossJoin(broadcast(totals))
      .withColumn("logp", log((col("cnt") + 1).cast("double")
        / (col("n") + col("v")).cast("double")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"),
        round(avg(col("logp")), 6).as("mean_logp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lm == oldLm && lm.nonEmpty)
  }

  test("graft_term_stats/freqs: null and empty text yield (dl=0, terms=[]) (SQL surface)") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_term_stats(CAST(NULL AS STRING)) a,
        |       graft_term_freqs(CAST(NULL AS STRING)) b,
        |       graft_term_stats('') c, graft_term_freqs('  —  ') d
        |""".stripMargin).collect().head
    for (i <- 0 until 4) {
      val s = r.getStruct(i)
      assert(s.getLong(0) == 0L && s.getSeq[Any](1).isEmpty)
    }
  }
}
