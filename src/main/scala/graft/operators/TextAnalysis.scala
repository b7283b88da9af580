package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Dialect, TextExprs => TX}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (codegen-friendly, no UDFs) with engine-portable
  * arithmetic — see TextExprs.
  */
object TextAnalysis {
  private implicit val d: Dialect = Dialect(spark = true)

  /** Stopword lists for the n-gram/stopword-ratio language heuristic. */
  val StopEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Deterministic train/val/test split: hash the document id (not a
    * random() — re-runs, retries, and different engines must agree on every
    * row's split) into 100 buckets, carve them by percentage. At any scale
    * this is a pure per-row projection — no shuffle, no sampling pass, and
    * the held-out set is stable under corpus growth (a doc's split never
    * changes when other docs arrive). */
  def deterministicSplit(docs: DataFrame, idCol: String,
                         trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: train=$trainPct val=$valPct")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__split_h",
        expr(s"${TX.polyHashAuto(s"CAST(`$idCol` AS STRING)")} % 100"))
      .withColumn("split",
        when(col("__split_h") < trainPct, "train")
          .when(col("__split_h") < trainPct + valPct, "val")
          .otherwise("test"))
      .drop("__split_h")
  }

  /** Deterministic weighted sampling (corpus mixing): keep a row when its
    * salted id-hash lands under `ratePerMille` (0..1000) — the rate can be
    * any per-row expression (per-language quotas, quality-weighted rates).
    * Like [[deterministicSplit]], re-runs and engines agree row-by-row; the
    * salt decorrelates the sample from the train/val/test assignment so
    * sampling does not bias splits. Pure projection+filter — no shuffle,
    * no sampling pass. */
  def hashSample(docs: DataFrame, idCol: String, ratePerMille: org.apache.spark.sql.Column,
                 salt: String = "s"): DataFrame = {
    require(salt.matches("[A-Za-z0-9_]*"),
      s"salt must be alphanumeric/underscore (it is spliced into a SQL literal): '$salt'")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.filter(
      expr(s"${TX.polyHashAuto(s"concat('$salt', CAST(`$idCol` AS STRING))")} % 1000")
        < ratePerMille)
  }

  /** Corpus DRIFT detection between two snapshots — the monitoring step a
    * long-running ingest pipeline needs: when tomorrow's crawl slice stops
    * looking like today's, someone should know BEFORE a model trains on
    * it. Both snapshots' token streams hash into `buckets` features (same
    * census as DSIR), the two distributions are compared bucket-by-bucket
    * under add-1 smoothing, and the topK movers by |log probability
    * ratio| come back with their raw counts.
    *
    * Scale shape: two independent map-side-combinable censuses (≤ buckets
    * rows each, regardless of corpus size), a bucket-keyed full-outer
    * join of the two tiny censuses, 1-row totals broadcast — the corpora
    * are each scanned once and never shuffled. Deterministic: the movers
    * rank on the 6dp-rounded ratio with the bucket id as tie-break, so
    * the oracle reproduces the topK exactly. */
  def vocabDrift(docsA: DataFrame, docsB: DataFrame, textCol: String,
                 buckets: Int, topK: Int): DataFrame = {
    require(buckets > 0 && topK > 0, "buckets and topK must be positive")
    graft.functions.GraftFunctions.register(docsA.sparkSession)
    // census rows = one per DISTINCT term per doc (tf-weighted), not one
    // per occurrence: graft_term_freqs pre-folds repeats inside the scan,
    // so the bucket aggregation's partial pass reads vocabulary-sized
    // input. Integer-exact vs the occurrence-stream formulation.
    def census(docs: DataFrame, cnt: String) = docs
      .select(explode(expr(s"graft_term_freqs($textCol).terms")).as("__ts"))
      .select(col("__ts.term").as("__t"), col("__ts.tf").as("__tf"))
      .withColumn("f", expr(s"${TX.polyHashAuto("__t")(d)} % $buckets"))
      .groupBy("f").agg(sum("__tf").as(cnt))
    val j = census(docsA, "c_a")
      .join(census(docsB, "c_b"), Seq("f"), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
    val tot = j.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    j.crossJoin(broadcast(tot))
      .withColumn("log_ratio",
        round(log((col("c_a") + 1).cast("double") / (col("n_a") + lit(buckets)).cast("double"))
          - log((col("c_b") + 1).cast("double") / (col("n_b") + lit(buckets)).cast("double")), 6))
      .orderBy(abs(col("log_ratio")).desc, col("f").asc)
      .limit(topK)
      .select(col("f"), col("c_a"), col("c_b"), col("log_ratio"))
  }

  /** Language-ID heuristic: ratio of English stopword hits; `en` when the
    * ratio clears the threshold. (The corpus vocabulary is synthetic —
    * what matters is that the heuristic is deterministic and cheap.)
    *
    * ZERO exchanges (round 10): the signals are doc-local, so the whole
    * operator is a scan projection over `graft_term_freqs` — n_tokens is
    * the census struct's dl, en_hits a fold of tf over the stopword
    * terms of the (vocabulary-sized, not occurrence-sized) terms array.
    * The earlier explode → groupBy(id) formulation paid an exchange of
    * per-doc partials plus the occurrence-stream explode feeding its
    * hash aggregate — at 100 TB this is a pure scan instead. Docs with
    * no tokens are absent from the output (as before, where explode
    * emitted nothing for them).
    *
    * PRECONDITION (changed by the scan rewrite): `idCol` is unique —
    * one output row per input row. The old groupBy(id) formulation
    * MERGED rows sharing an id into one summed row; like [[Retrieval
    * .bm25Index]]'s identical rewrite, duplicate ids are the caller's
    * bug (dedup upstream), not a semantics this operator preserves. */
  def langId(docs: DataFrame, textCol: String, idCol: String,
             threshold: Double = 0.05,
             carryCols: Seq[String] = Seq.empty): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val keep = (idCol +: carryCols).map(col)
    // The zero-token drop rides the explode (empty array → no row) instead
    // of a where(dl > 0): Catalyst pushes a filter below the projection by
    // SUBSTITUTING the alias, which would re-run the tokenizer once more
    // per row inside the Filter — Generate blocks that substitution, so
    // graft_term_freqs evaluates exactly once (TermStatsSpec pins it).
    docs
      .select(keep :+ explode(
        filter(array(expr(s"graft_term_freqs($textCol)")),
          s => s.getField("dl") > 0)).as("__s"): _*)
      .select(keep ++ Seq(
        col("__s.dl").as("n_tokens"),
        aggregate(
          filter(col("__s.terms"),
            x => x.getField("term").isInCollection(StopEn)),
          lit(0L), (a, x) => a + x.getField("tf")).as("en_hits")): _*)
      .withColumn("en_ratio", col("en_hits").cast("double") / col("n_tokens").cast("double"))
      .withColumn("pred_lang", when(col("en_ratio") >= threshold, "en").otherwise("other"))
  }

  /** Quality signals: char-class ratios + token stats + a deterministic
    * composite score. All single-pass scalar expressions. */
  def qualitySignals(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // tokenize ONCE into a column; the two token signals read the array
    val toks = "__toks"
    docs
      .withColumn("__toks", expr(TX.tokensAuto(textCol)))
      .select(
        col(idCol),
        length(col(textCol)).cast("long").as("n_raw_chars"),
        expr(s"CAST(length(${d.reAll(s"lower($textCol)", "[^a-z]", "")}) AS BIGINT)").as("n_alpha"),
        expr(s"CAST(length(${d.reAll(textCol, "[^0-9]", "")}) AS BIGINT)").as("n_digit"),
        expr(s"CAST(${d.size(toks)} AS BIGINT)").as("n_tokens"),
        expr(s"CAST(${d.fold(d.map(toks, "w", "CAST(length(w) AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT)").as("sum_token_len"))
      .withColumn("alpha_ratio",
        when(col("n_raw_chars") > 0, col("n_alpha").cast("double") / col("n_raw_chars").cast("double")))
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0, col("sum_token_len").cast("double") / col("n_tokens").cast("double")))
      .withColumn("quality_score",
        col("alpha_ratio") * 0.5
          + when(col("n_tokens").between(20, 80), 0.3).otherwise(0.0)
          + when(col("avg_token_len").between(3.0, 8.0), 0.2).otherwise(0.0))
      .drop("__toks")
  }

  /** Token counting three ways: raw whitespace split, regex word tokens,
    * and a BPE-ish subword estimate (ceil(len/4) chunks per word). */
  def tokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = TX.tokensAuto(textCol)
    docs.select(
      col(idCol),
      expr(s"CAST(${d.size(d.splitSpace(textCol))} AS BIGINT)").as("n_ws_tokens"),
      expr(s"CAST(${d.size(d.regexExtractAll(s"lower($textCol)", "[a-z0-9]+"))} AS BIGINT)").as("n_re_tokens"),
      expr(s"CAST(${d.fold(d.map(toks, "w", s"CAST(${d.idiv("length(w) + 3", "4")} AS BIGINT)"), "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT)").as("n_subtokens"))
  }

  /** Document fingerprint: rolling poly hash of the normalized text, its
    * 32-bit mix, and an md5 for human-checkable identity. */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(
      col(idCol),
      expr(TX.polyHashAuto(TX.norm(textCol))).as("fp_poly"),
      expr(TX.mix32(TX.polyHashAuto(TX.norm(textCol)))).as("fp_mix32"),
      md5(expr(TX.norm(textCol))).as("fp_md5"))
  }

  /** Benchmark decontamination: which corpus docs share word-shingle
    * n-grams with a benchmark/eval set (training-on-the-test-set detection).
    *
    * The benchmark side is BROADCAST — eval sets are small by nature (and
    * the corpus is not), so the corpus streams through ONE shingle-hash
    * scan with a single doc-keyed shuffle: the per-doc shingle total rides
    * along as a window count over the same partitioning the distinct needs
    * (no second scan, no persist whose two consumers could race to fill
    * it).
    *
    * Output: one row per (corpus doc, benchmark doc) sharing >= `minShared`
    * distinct shingles, with the corpus doc's total shingle count and the
    * overlap fraction. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String, idCol: String,
                    shingleN: Int, minShared: Long = 1L): DataFrame = {
    val wDoc = org.apache.spark.sql.expressions.Window.partitionBy(idCol)
    val c = Dedup.shingleHashRows(corpus, textCol, idCol, shingleN).distinct()
      .withColumn("n_doc_shingles", count(lit(1)).over(wDoc))
    val b = Dedup.shingleHashRows(benchmark, textCol, idCol, shingleN).distinct()
      .select(col(idCol).as("bench_id"), col("sh"))
    c.join(broadcast(b), "sh")
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"),
        first(col("n_doc_shingles")).as("n_doc_shingles")) // constant per doc
      .filter(col("n_shared") >= minShared)
      .withColumn("overlap_frac",
        round(col("n_shared").cast("double") / col("n_doc_shingles").cast("double"), 6))
      .select(col(idCol), col("bench_id"), col("n_shared"),
        col("n_doc_shingles"), col("overlap_frac"))
  }

  /** Repetition signals (boilerplate/low-quality detection, Gopher-style):
    * per-doc n-gram multiplicity stats — duplicate-gram fraction and the
    * share taken by the single most frequent n-gram. Two partial-aggregable
    * groupings ((doc, gram) then doc), both doc-keyed shuffles of narrow
    * rows. Docs with fewer than `n` tokens emit no n-grams and are absent
    * from the output (callers treat absent as not-repetitive). */
  def repetitionSignals(docs: DataFrame, textCol: String, idCol: String,
                        n: Int = 2): DataFrame = {
    val grams = Dedup.shingleHashRows(docs, textCol, idCol, n) // multiplicity kept
    val perGram = grams.groupBy(col(idCol), col("sh")).agg(count(lit(1)).as("cnt"))
    perGram.groupBy(idCol)
      .agg(sum("cnt").cast("long").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max("cnt").cast("long").as("top_gram_count"))
      .withColumn("dup_gram_frac",
        round((col("n_grams") - col("n_distinct_grams")).cast("double")
          / col("n_grams").cast("double"), 6))
      .withColumn("top_gram_frac",
        round(col("top_gram_count").cast("double") / col("n_grams").cast("double"), 6))
  }

  /** PII scrubbing: apply redaction patterns in order, count matches per
    * pattern. Counts are measured on the ORIGINAL text (so later patterns
    * aren't blinded by earlier replacements); the scrubbed column applies
    * the replacements sequentially. Patterns must stay in the RE2-safe
    * subset (no backrefs/lookarounds) so Spark's Java regex and the
    * oracle's RE2 agree. Pure per-row projection — no shuffle at any
    * scale. */
  def scrubPatterns(df: DataFrame, textCol: String, idCol: String,
                    patterns: Seq[(String, String, String)]): DataFrame = {
    val scrubbed = patterns.foldLeft(col(textCol)) { case (acc, (_, re, rep)) =>
      regexp_replace(acc, lit(re), lit(rep))
    }
    val counts = patterns.map { case (name, re, _) =>
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("long").as(s"n_$name")
    }
    df.select(col(idCol) +: counts :+ scrubbed.as("scrubbed"): _*)
  }

  /** Context-window chunking: split each document into overlapping
    * fixed-size token windows (size `chunkTokens`, step `stride`) — the
    * chunk-for-training step between curation and tokenization. Same
    * enumeration arithmetic as the sliding-window operator (qx17): each
    * token at 0-based position p belongs to the windows starting at
    * (p div stride − j)·stride for j < chunkTokens/stride, so windows are
    * ENUMERATED per token (explode by a compile-time ratio), never probed
    * by range join. One doc-keyed shuffle; chunk text reassembles
    * deterministically by sorting each group's (pos, token) pairs.
    * Requires stride | chunkTokens. */
  def chunkDocuments(docs: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && chunkTokens % stride == 0,
      s"stride=$stride must divide chunkTokens=$chunkTokens")
    val nK = chunkTokens / stride
    docs
      .select(col(idCol), posexplode(expr(TX.tokensAuto(textCol))).as(Seq("pos", "w")))
      .withColumn("k", explode(sequence(lit(0), lit(nK - 1))))
      .withColumn("chunk_start",
        ((expr(s"pos div $stride") - col("k")) * stride).cast("long"))
      .filter(col("chunk_start") >= 0)
      .groupBy(col(idCol), col("chunk_start"))
      .agg(count(lit(1)).as("n_tokens"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w"))).as("chunk_text"))
  }

  /** Unigram log-probability scoring — the train-then-apply quality
    * filter: fit token frequencies on the corpus, score each doc by the
    * mean log-probability of its tokens (low = out-of-distribution /
    * gibberish, the cheap stand-in for an LM perplexity filter).
    *
    * Laplace-smoothed: p(w) = (count(w) + 1) / (N + V). Scoring joins the
    * token stream against the frequency table on the term — at corpus
    * scale the vocabulary is orders of magnitude smaller than the token
    * stream, so the table broadcasts and the stream never shuffles for
    * the lookup; the per-doc mean is one doc-keyed partial-aggregable
    * pass. Rounded to 6dp for cross-engine gating. */
  def unigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // tf-weighted distinct-terms census (graft_term_freqs): the frequency
    // aggregation, the broadcast-join probe AND the per-doc mean all read
    // one row per (doc, distinct term) instead of one per occurrence —
    // the occurrence count only ever mattered as a weight. The per-doc
    // mean over occurrences is exactly Σ tf·logp / Σ tf.
    val tok = docs
      .select(col(idCol), explode(expr(s"graft_term_freqs($textCol).terms")).as("__ts"))
      .select(col(idCol), col("__ts.term").as("w"), col("__ts.tf").as("tf"))
    val freq = tok.groupBy("w").agg(sum("tf").as("cnt"))
    val totals = freq.agg(sum("cnt").as("n_tokens_corpus"),
      count(lit(1)).as("vocab_size"))
    val scored = tok.join(broadcast(freq), "w")
      .crossJoin(broadcast(totals))
      .withColumn("logp",
        log((col("cnt") + 1).cast("double")
          / (col("n_tokens_corpus") + col("vocab_size")).cast("double")))
    scored.groupBy(idCol)
      .agg(sum("tf").as("n_tokens"),
        round(sum(col("logp") * col("tf").cast("double"))
          / sum(col("tf").cast("double")), 6).as("mean_logp"))
  }

  /** Domain-mixture planning: per-domain sampling rates that hit target
    * proportions while keeping as many docs as possible. With observed
    * counts n_d and integer permille targets t_d, the achievable total is
    * bounded by each domain: T = min_d floor(n_d*1000/t_d); each domain
    * then keeps floor(T*t_d/1000) docs. All-integer arithmetic — the plan
    * is deterministic and engine-portable. Domains absent from `targets`
    * are excluded (weight 0). A TARGET domain absent from the data is the
    * converse case and must not vanish from the plan: its budget is 0, so
    * the total budget — and every domain's quota — collapses to 0, which
    * is the truthful answer ("this mix is unachievable") surfaced as a
    * visible all-zero plan rather than a silently rescaled one. The rates
    * feed [[hashSample]] to materialize the mix. One tiny aggregate per
    * domain. */
  def mixtureWeights(docs: DataFrame, domainCol: String,
                     targetsPermille: Seq[(String, Long)]): DataFrame = {
    require(targetsPermille.nonEmpty && targetsPermille.forall(_._2 > 0),
      "targets must be positive permille weights")
    require(targetsPermille.map(_._2).sum == 1000L,
      s"permille targets must sum to 1000, got ${targetsPermille.map(_._2).sum}")
    val s = docs.sparkSession
    import s.implicits._
    val t = targetsPermille.toDF(domainCol, "target_pm")
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
    // the global min runs as an unpartitioned window over the per-domain
    // frame — one row per domain exists by construction, so the single
    // window partition holds a handful of rows (a broadcast-of-aggregate
    // would cost an extra job for the same result)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // targets are the base side: a target domain with no docs must keep
    // its row (n_docs=0 → budget 0 → the whole plan is 0), not silently
    // drop its constraint
    broadcast(t).join(counts, Seq(domainCol), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("budget", expr("n_docs * 1000 div target_pm"))
      .withColumn("total_budget", min("budget").over(w))
      .withColumn("keep_docs", expr("total_budget * target_pm div 1000"))
      .withColumn("rate_pm",
        when(col("n_docs") > 0, expr("keep_docs * 1000 div n_docs")).otherwise(lit(0L)))
      .select(col(domainCol), col("n_docs"), col("target_pm"),
        col("keep_docs"), col("rate_pm"))
  }

  /** Temperature-scaled (α-sampling) mixture planning — the standard LLM
    * data-recipe step ([[mixtureWeights]]' complement: that one enforces
    * CALLER-CHOSEN proportions; this one DERIVES them from corpus sizes):
    * domain i gets weight nᵢ^α / Σ nⱼ^α, so α=1 is natural proportions,
    * α=0 is uniform, and the usual α∈(0,1) up-weights small domains
    * without letting any single corpus dominate (the multilingual-
    * sampling rule of Conneau & Lample 2019, used for domain mixing by
    * GPT-3/PaLM-class recipes). `epochs` = planned/n — how many passes
    * over a domain the plan implies (>1 flags repetition).
    *
    * Determinism across engines: the α-powers are doubles, but each is
    * pinned to DECIMAL(30,12) BEFORE the cross-domain sum — the one
    * reduction whose float order could differ — so both engines divide
    * identical numbers and the floor'd allocation can't be off by one.
    * One tiny aggregate per domain; the totals row broadcasts. */
  def mixtureAlpha(docs: DataFrame, domainCol: String,
                   alpha: Double, budget: Long): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha outside [0, 1]")
    require(budget > 0, "budget must be positive")
    val counts = docs.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("__w",
        pow(col("n_docs").cast("double"), lit(alpha)).cast("decimal(30,12)"))
    val tot = counts.agg(sum(col("__w")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__p", col("__w").cast("double") / col("__tot").cast("double"))
      .withColumn("weight", round(col("__p"), 6))
      .withColumn("planned_docs",
        floor(lit(budget.toDouble) * col("__p")).cast("long"))
      .withColumn("epochs", round(
        col("planned_docs").cast("double") / col("n_docs").cast("double"), 6))
      .select(col(domainCol), col("n_docs"), col("weight"),
        col("planned_docs"), col("epochs"))
  }

  /** Bigram-LM quality scoring — the step up from [[unigramLogProb]]:
    * score each doc by the mean Laplace-smoothed conditional log
    * probability ln((c(w₁w₂)+1) / (c(w₁)+V)) over its bigram positions
    * (train-then-apply on the corpus itself, V = vocabulary size). Docs
    * with fewer than two tokens have no bigram positions and drop out.
    * Same scale shape as the unigram scorer: censuses are map-side
    * combined; the frequency lookups are joins on the bigram/first-token
    * keys; V and nothing else crosses the driver. */
  def bigramLogProb(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // ONE tokenize+shingle pass feeds every count (the qx44/pmiBigrams
    // lesson): without the persist, the bigram census, the unigram
    // census, AND the vocabulary size each re-tokenize the corpus in
    // their own broadcast-build job — three extra full regex passes that
    // dominate this operator's wall at every scale (tokenization is the
    // expensive term; the counts are vocabulary-sized). The tag-union
    // census is persisted and serves all three small sides; the per-
    // instance probe side pays the fourth, unavoidable pass (it needs
    // per-doc rows, not counts). Same lifecycle tradeoff as
    // nearDupPipeline's cache: the vocabulary-sized entry lives until
    // ContextCleaner collects the plan.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toksDocs = docs.select(col(idCol), expr(TX.tokensAuto(textCol)).as("__toks"))
    val tagged = toksDocs.select(explode(expr(
        s"concat(" +
          s"transform(__toks, t -> named_struct('tag', 'u', 'term', t)), " +
          s"transform(${TX.shingles("__toks", 2)}, b -> named_struct('tag', 'b', 'term', b)))"))
        .as("e"))
      .select(col("e.tag").as("tag"), col("e.term").as("term"))
    val counts = tagged.groupBy("tag", "term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bc = counts.filter(col("tag") === "b")
      .select(col("term").as("bg"), col("c").as("c_bg"))
    val uni = counts.filter(col("tag") === "u")
      .select(col("term").as("w"), col("c").as("c_w"))
    val vocab = counts.filter(col("tag") === "u").agg(count(lit(1)).as("v"))
    val inst = toksDocs.select(col(idCol),
        explode(expr(TX.shingles("__toks", 2))).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
    inst
      .join(bc, "bg")
      .join(uni.select(col("w").as("w1"), col("c_w")), "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("logp",
        log((col("c_bg") + 1).cast("double") / (col("c_w") + col("v")).cast("double")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("logp")), 6).as("mean_logp"))
  }

  /** Gopher-style heuristic quality rules — the classic curation rule
    * pack (token-count bounds, mean-word-length band, symbol-character
    * ratio cap, minimum stopword evidence) evaluated per document with a
    * per-rule verdict and the combined keep decision.
    *
    * Entirely per-row scalar expressions: no shuffle at ANY scale — the
    * rule pack runs inside the scan's whole-stage-codegen like a filter.
    * The formulas are dialect-parametric ([[gopherSignalSelect]]), so the
    * Spark plan and the DuckDB oracle evaluate literally the same
    * arithmetic and the hash gate re-proves the rule pack each run. */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
                  minTokens: Long, maxTokens: Long,
                  minAvgLen: Double, maxAvgLen: Double,
                  maxSymbolRatio: Double, minStopHits: Long): DataFrame = {
    val sels = gopherSignalSelect(textCol, "__toks", minTokens, maxTokens,
      minAvgLen, maxAvgLen, maxSymbolRatio, minStopHits)(d)
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__toks", expr(TX.tokensAuto(textCol)(d)))
      .select(col(idCol) +: sels.map { case (e, a) => expr(e).as(a) }: _*)
  }

  /** (expression, alias) pairs for [[gopherRules]], buildable in either
    * dialect — the single source of truth both engines evaluate. `toks`
    * names a MATERIALIZED tokens-array column ([[TX.tokens]] of `textCol`)
    * that the caller provides (Spark: a `withColumn`; DuckDB: a CTE) —
    * three of the four signals consume the token array, so tokenizing
    * once per row instead of once per signal is the difference between
    * one regex pass and four at 100 TB. */
  def gopherSignalSelect(textCol: String, toks: String,
                         minTokens: Long, maxTokens: Long,
                         minAvgLen: Double, maxAvgLen: Double,
                         maxSymbolRatio: Double, minStopHits: Long)
                        (implicit dl: Dialect): Seq[(String, String)] = {
    val nTok = s"CAST(${dl.size(toks)} AS BIGINT)"
    val sumLen = s"CAST(${dl.fold(dl.map(toks, "w", "CAST(length(w) AS BIGINT)"),
      "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT)"
    val avgLen = s"(CASE WHEN $nTok > 0 THEN " +
      s"ROUND(CAST($sumLen AS DOUBLE) / CAST($nTok AS DOUBLE), 6) END)"
    val alnumSpace =
      s"CAST(length(${dl.reAll(s"lower($textCol)", "[^a-z0-9 ]", "")}) AS BIGINT)"
    val symRatio = s"(CASE WHEN length($textCol) > 0 THEN " +
      s"ROUND(CAST(length($textCol) - $alnumSpace AS DOUBLE) " +
      s"/ CAST(length($textCol) AS DOUBLE), 6) ELSE CAST(0.0 AS DOUBLE) END)"
    val stopList = StopEn.map(w => s"'$w'").mkString("(", ", ", ")")
    val stopHits =
      s"CAST(${dl.size(dl.filt(toks, "w", s"w IN $stopList"))} AS BIGINT)"
    // rules as BIGINT 0/1 flags (CASE handles the null avg of empty docs:
    // null comparison falls to ELSE 0 in both engines)
    val passTok = s"(CASE WHEN $nTok BETWEEN $minTokens AND $maxTokens THEN 1 ELSE 0 END)"
    val passAvg = s"(CASE WHEN $avgLen >= $minAvgLen AND $avgLen <= $maxAvgLen THEN 1 ELSE 0 END)"
    val passSym = s"(CASE WHEN $symRatio <= $maxSymbolRatio THEN 1 ELSE 0 END)"
    val passStop = s"(CASE WHEN $stopHits >= $minStopHits THEN 1 ELSE 0 END)"
    val nFailed = s"(4 - $passTok - $passAvg - $passSym - $passStop)"
    Seq(
      nTok -> "n_tokens",
      avgLen -> "avg_token_len",
      symRatio -> "symbol_ratio",
      stopHits -> "stop_hits",
      s"CAST($passTok AS BIGINT)" -> "pass_n_tokens",
      s"CAST($passAvg AS BIGINT)" -> "pass_avg_len",
      s"CAST($passSym AS BIGINT)" -> "pass_symbols",
      s"CAST($passStop AS BIGINT)" -> "pass_stopwords",
      s"CAST($nFailed AS BIGINT)" -> "n_failed",
      s"CAST((CASE WHEN $nFailed = 0 THEN 1 ELSE 0 END) AS BIGINT)" -> "keep")
  }

  /** DSIR-style importance weights (public method: Xie et al. 2023, "Data
    * Selection via Importance Resampling"): hashed-bigram bag-of-features
    * language models over a TARGET slice (what we want more of) and the
    * SOURCE complement, Laplace-smoothed; each document scores
    * `log p_target(doc) − log p_source(doc)` summed over its features —
    * the standard importance weight for resampling a raw corpus toward a
    * target domain. Feature hashing (poly-hash mod `buckets`) bounds the
    * model at `buckets` rows regardless of vocabulary.
    *
    * Scale shape: train-then-apply like [[unigramLogProb]] — the feature
    * census is a map-side-combinable grouped count over one exploded scan;
    * apply is a second scan joined to the census. The census is at most
    * `buckets` rows, so the apply-side join BROADCASTS it (no shuffle of
    * the corpus side), and the 1-row totals ride a broadcast cross join.
    * Output: one row per doc with >= 1 bigram (docs under 2 tokens have
    * no features, hence no weight — resample treats them separately). */
  def dsirWeights(docs: DataFrame, textCol: String, idCol: String,
                  isTarget: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val feats = docs
      .withColumn("__toks", expr(TX.tokensAuto(textCol)(d)))
      .withColumn("__tgt", isTarget.cast("boolean"))
      .select(col(idCol), col("__tgt"),
        explode(expr(TX.shingles("__toks", 2)(d))).as("__sh"))
      .withColumn("__f", expr(s"${TX.polyHashAuto("__sh")(d)} % $buckets"))
    val census = feats.groupBy("__f")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("c_s"))
    val totals = census.agg(sum(col("c_t")).as("n_t"), sum(col("c_s")).as("n_s"))
    feats
      .join(broadcast(census), "__f")
      .crossJoin(broadcast(totals))
      .withColumn("__lw",
        log((col("c_t") + 1).cast("double")
            / (col("n_t") + lit(buckets)).cast("double"))
          - log((col("c_s") + 1).cast("double")
            / (col("n_s") + lit(buckets)).cast("double")))
      .groupBy(col(idCol), col("__tgt").as("is_target"))
      .agg(count(lit(1)).as("n_features"),
        round(sum(col("__lw")), 6).as("log_weight"))
  }

  /** The trained DSIR model: the hashed-bigram feature census
    * (`f, c_t, c_s`, at most `buckets` rows — write it to parquet; it IS
    * the model). Totals for the smoothing denominators are an aggregate
    * of the census ([[dsirTotals]]). */
  def dsirModel(docs: DataFrame, textCol: String,
                isTarget: org.apache.spark.sql.Column, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("__toks", expr(TX.tokensAuto(textCol)(d)))
      .withColumn("__tgt", isTarget.cast("boolean"))
      .select(col("__tgt"),
        explode(expr(TX.shingles("__toks", 2)(d))).as("__sh"))
      .withColumn("f", expr(s"${TX.polyHashAuto("__sh")(d)} % $buckets"))
      .groupBy("f")
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(!col("__tgt"), 1L).otherwise(0L)).as("c_s"))
  }

  /** (n_target, n_source) of a trained model — two longs, model metadata
    * (collected once at train time, not per scored batch). */
  def dsirTotals(model: DataFrame): (Long, Long) = {
    val r = model.agg(sum(col("c_t")), sum(col("c_s"))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Score ANY document set against a trained DSIR model — the
    * train-offline / score-online half of [[dsirWeights]]: same formula,
    * but the census is a given (persisted) table and the totals are
    * literals, so the plan is scan → explode → broadcast-join census →
    * per-doc sum. No action, no corpus-dependent state — which makes it
    * STREAMING-safe: on a stream it is a stateless projection plus a
    * stream-static broadcast join (proven batch≡stream in
    * StreamingMultimodalSpec). */
  def dsirScore(docs: DataFrame, textCol: String, idCol: String,
                model: DataFrame, totals: (Long, Long), buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val (nT, nS) = totals
    docs
      .withColumn("__toks", expr(TX.tokensAuto(textCol)(d)))
      .select(col(idCol),
        explode(expr(TX.shingles("__toks", 2)(d))).as("__sh"))
      .withColumn("f", expr(s"${TX.polyHashAuto("__sh")(d)} % $buckets"))
      .join(broadcast(model), "f")
      .withColumn("__lw",
        log((col("c_t") + 1).cast("double") / lit(nT + buckets).cast("double"))
          - log((col("c_s") + 1).cast("double") / lit(nS + buckets).cast("double")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"),
        round(sum(col("__lw")), 6).as("log_weight"))
  }

  /** Collocation mining: top-`topK` token bigrams by pointwise mutual
    * information, `minCount` occurrences or more. PMI =
    * ln(p(ab) / (p(a)·p(b))) with p(ab) over bigram instances and p(a),
    * p(b) over unigram instances — the standard "which word pairs stick
    * together" census (multi-word entities, boilerplate detection).
    *
    * Scale shape: bigrams reuse the shingle machinery (n=2) so Spark and
    * the oracle share one definition; both censuses are map-side-combined
    * grouped counts; the two unigram-frequency lookups are equi-joins on
    * the token (AQE broadcasts them when the vocabulary allows); the
    * 1-row totals cross-join in as broadcasts. Nothing driver-side, no
    * quadratic stage. Final order: pmi desc (6dp), then (w1, w2) — fully
    * deterministic under ties. */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long, topK: Int): DataFrame = {
    // ONE tokenize pass (the qx14 lesson): tokenize into a materialized
    // column FIRST (the shingle expression references its input many
    // times — inlining the regex tokenizer there re-runs it per element),
    // then tag-union the unigram and bigram streams out of that column in
    // one projection, so a single (tag, term) census serves both sides.
    // The census is PERSISTED: it has four consumers below (uni lookups
    // ×2, bigram counts, totals) and exchange reuse does not dedupe
    // across them in practice — without the cache the corpus scans once
    // per consumer, which is exactly the cost this shape exists to avoid.
    // Same lifecycle tradeoff as nearDupPipeline's per-doc cache: the
    // vocabulary-sized entry lives until ContextCleaner collects the plan.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tagged = docs.select(expr(TX.tokensAuto(textCol)).as("__toks"))
      .select(explode(expr(
        s"concat(" +
          s"transform(__toks, t -> named_struct('tag', 'u', 'term', t)), " +
          s"transform(${TX.shingles("__toks", 2)}, b -> named_struct('tag', 'b', 'term', b)))"))
        .as("e"))
      .select(col("e.tag").as("tag"), col("e.term").as("term"))
    val counts = tagged.groupBy("tag", "term").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy("tag").agg(sum(col("c")).as("n"))
    val uni = counts.filter(col("tag") === "u").select(col("term").as("w"), col("c"))
    val bi = counts.filter(col("tag") === "b")
      .select(col("term").as("bg"), col("c").as("c_ab"))
    val nUni = totals.filter(col("tag") === "u").select(col("n").as("n_uni"))
    val nBi = totals.filter(col("tag") === "b").select(col("n").as("n_bi"))
    bi.filter(col("c_ab") >= minCount)
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      // double-precision products in fixed left-to-right order — the
      // oracle writes the same parenthesization, so ln sees an identical
      // double in both engines
      .withColumn("pmi", round(log(
        col("c_ab").cast("double") * col("n_uni").cast("double")
          * col("n_uni").cast("double")
          / (col("n_bi").cast("double") * col("c1").cast("double")
            * col("c2").cast("double"))), 6))
      .select("w1", "w2", "c_ab", "pmi")
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  // --------------------------------------------------------------------
  // Bloom-prefiltered decontamination
  // --------------------------------------------------------------------

  /** Probe-j position of a shingle hash in a `bloomBits`-wide Bloom filter.
    * Reuses the MinHash permutation family at an offset index so the Bloom
    * probes are decorrelated from the signature permutations; all integer
    * arithmetic (portable, codegen'd). */
  private def bloomPos(sh: String, j: Int, bloomBits: Int): String =
    s"((($sh * ${TX.aK(100 + j)} + ${TX.bK(100 + j)}) % ${TX.P}) % $bloomBits)"

  /** [[contamination]] with a broadcast Bloom prefilter on the corpus side —
    * the 100 TB shape of training-on-the-test-set detection. qx30's plan
    * shuffles every corpus shingle into the benchmark join; here the
    * benchmark's shingle set is folded into a `bloomBits`-bit Bloom filter
    * (built distributedly: probe positions → per-word `bit_or`, at most
    * bloomBits/64 rows ever reach the driver) and the corpus's shingles are
    * tested against it IN THE SCAN PROJECTION — `element_at` on a constant
    * word array plus two shifts, all codegen'd. Only survivors (true
    * overlaps + the Bloom's few-percent false positives) enter the exact
    * confirm join, which removes the false positives, so the RESULT is
    * byte-identical to [[contamination]] while the shuffle carries a few
    * percent of the corpus's shingle volume. Per-doc shingle totals come
    * from a partial-aggregable groupBy (narrow rows) instead of qx30's
    * per-doc window, and only contaminated docs (a tiny set, broadcast)
    * join back for the overlap fraction.
    *
    * False-positive math at the defaults (k=3 probes): fp ≈ (1-e^(-3n/m))³
    * — at m/n ≈ 6.5 bits per benchmark shingle that is ~5 %. At 100 TB the
    * benchmark side stays what it always is (the small, broadcastable
    * side); m scales with IT, not the corpus.
    *
    * Distribution mechanics: the word array ships as a plan LITERAL —
    * embedded once per stage in the task binary, which is broadcast-
    * equivalent for the defaults (16 KiB) and fine to ~1 MiB (2²³ bits, a
    * ~500k-shingle benchmark at good fp). Past that, prefer raising
    * nProbes over bits, or split the benchmark and union the results —
    * the confirm join keeps any split exact. */
  def contaminationBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String,
                         shingleN: Int, minShared: Long = 1L,
                         bloomBits: Int = 1 << 17, nProbes: Int = 3): DataFrame = {
    val filterSide = bloomBuild(benchmark, textCol, idCol, shingleN,
      bloomBits, nProbes)
    contaminationWithBloom(corpus, filterSide, textCol, idCol,
      shingleN, minShared)
  }

  /** The frozen benchmark side of Bloom decontamination: the per-doc
    * shingle-set frame (the exact confirm side) plus the folded Bloom
    * words — built ONCE and reusable across any number of corpus slices
    * or stream micro-batches (the benchmark is immutable by definition;
    * refreshing it means rebuilding this). */
  final case class BloomSide(bench: DataFrame, bits: Array[Long],
                             bloomBits: Int, nProbes: Int)

  /** Fold the benchmark's shingle set into [[BloomSide]]. The collect is
    * bounded by bloomBits/64 `bit_or` words (16 KiB at the default), NOT
    * by benchmark size. */
  def bloomBuild(benchmark: DataFrame, textCol: String, idCol: String,
                 shingleN: Int, bloomBits: Int = 1 << 17,
                 nProbes: Int = 3): BloomSide = {
    require(bloomBits > 64 && Integer.bitCount(bloomBits) == 1,
      s"bloomBits must be a power of two > 64: $bloomBits")
    require(nProbes >= 1 && nProbes <= 8, s"nProbes out of [1,8]: $nProbes")
    val nWords = bloomBits / 64
    val b = Dedup.shingleHashRowsDistinct(benchmark, textCol, idCol, shingleN)
      .select(col(idCol).as("bench_id"), col("sh"))
    val posCols = (0 until nProbes).map(j => expr(bloomPos("sh", j, bloomBits)))
    val words = b.select(explode(array(posCols: _*)).as("p"))
      .select(expr("cast(p div 64 as int)").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(p % 64 as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .collect()
    val bits = new Array[Long](nWords)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    BloomSide(b, bits, bloomBits, nProbes)
  }

  /** The corpus half of Bloom decontamination against a pre-built
    * [[BloomSide]]: per-doc-distinct shingles (array_distinct in the scan
    * projection — no shuffle), totals via map-side-combinable counts,
    * Bloom test as a pure projection over a constant word array; only
    * survivors reach the exact confirm join, which removes the Bloom's
    * false positives. */
  def contaminationWithBloom(corpus: DataFrame, filterSide: BloomSide,
                             textCol: String, idCol: String,
                             shingleN: Int, minShared: Long): DataFrame = {
    val c = Dedup.shingleHashRowsDistinct(corpus, textCol, idCol, shingleN)
    val tot = c.groupBy(col(idCol)).agg(count(lit(1)).as("n_doc_shingles"))
    val bloomTest = (0 until filterSide.nProbes).map { j =>
      val p = bloomPos("sh", j, filterSide.bloomBits)
      s"((shiftright(element_at(__bloom_bits, cast($p div 64 as int) + 1), cast($p % 64 as int)) & 1) = 1)"
    }.mkString(" AND ")
    val hits = c.withColumn("__bloom_bits", typedLit(filterSide.bits.toSeq))
      .filter(expr(bloomTest))
      .drop("__bloom_bits")
      .join(broadcast(filterSide.bench), "sh") // false positives die here
      .groupBy(col(idCol), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    tot.join(broadcast(hits), idCol)
      .withColumn("overlap_frac",
        round(col("n_shared").cast("double") / col("n_doc_shingles").cast("double"), 6))
      .select(col(idCol), col("bench_id"), col("n_shared"),
        col("n_doc_shingles"), col("overlap_frac"))
  }

  // --------------------------------------------------------------------
  // Heavy hitters (Misra–Gries candidates + exact confirm)
  // --------------------------------------------------------------------

  /** Misra–Gries summary of one partition's token stream: at most
    * `capacity` live counters; any token whose PARTITION frequency exceeds
    * n_p/capacity survives, which is what the global guarantee below needs.
    * Purely partition-local imperative state — the sanctioned mapPartitions
    * case (a streaming summary no relational operator expresses). */
  private def misraGries(capacity: Int)(it: Iterator[String]): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](capacity * 2)
    while (it.hasNext) {
      val t = it.next()
      val cur = counters.get(t)
      if (cur != 0L || counters.containsKey(t)) counters.put(t, cur + 1)
      else if (counters.size < capacity) counters.put(t, 1L)
      else {
        val iter = counters.entrySet().iterator()
        while (iter.hasNext) {
          val e = iter.next()
          if (e.getValue == 1L) iter.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala
  }

  /** Exact top-k tokens by corpus frequency WITHOUT shuffling the token
    * stream — the vocabulary census (qx42) re-shaped for a corpus whose
    * (token, count) pair volume is itself a bottleneck. Two scan-only
    * passes: (1) a per-partition Misra–Gries summary emits ≤ capacity
    * candidates per partition (the only rows that ever leave a partition);
    * (2) the tiny candidate union broadcasts back as a semi-join and only
    * MATCHING tokens are counted (partial-aggregable, shuffle carries ≤
    * |candidates| distinct keys). The Misra–Gries guarantee — any token
    * with global count > N/capacity is heavy in at least one partition and
    * therefore a candidate — is CHECKED, not assumed: if the k-th candidate
    * count fails to clear N/capacity the operator falls back to the full
    * exact census, so the result is the exact top-k in every case. Output
    * ordered (cnt desc, term asc) — deterministic under ties. */
  def heavyHitters(docs: DataFrame, textCol: String,
                   k: Int, capacity: Int): DataFrame = {
    require(k > 0 && capacity > k, s"need capacity > k > 0: k=$k capacity=$capacity")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(expr(TX.tokensAuto(textCol))).as("term"))
    val cap = capacity // stable closure capture (no $outer)
    val candidates = toks.as[String].mapPartitions(misraGries(cap) _).toDF("term").distinct()
    val topk = toks.join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc).limit(k)
    val nRow = docs.agg(coalesce(sum(expr(TX.tokenCountAuto(textCol))), lit(0L)).as("n")).collect()(0)
    val nTokens = nRow.getLong(0)
    val stats = topk.agg(count(lit(1)).as("rows"),
      coalesce(min(col("cnt")), lit(0L)).as("kth")).collect()(0)
    // Fast path ONLY when the guarantee is PROVEN: k candidates exist and
    // the k-th one's exact count clears the N/capacity floor no missed
    // token can exceed. Anything else — including the decrement-cascade
    // worst case where a uniform stream leaves an EMPTY summary — falls
    // back to the full census so the answer stays exact (and loudly so).
    val proven = stats.getLong(0) == k && stats.getLong(1) * capacity > nTokens
    if (proven) topk
    else {
      docs.sparkSession.sparkContext.setJobDescription(
        s"heavyHitters fallback: rows=${stats.getLong(0)}/$k kth=${stats.getLong(1)} vs N/capacity=${nTokens / capacity}")
      toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term").asc).limit(k)
    }
  }

  // --------------------------------------------------------------------
  // BPE-style pre-tokenization counts
  // --------------------------------------------------------------------

  /** GPT-2-STYLE pre-tokenization pattern, reduced to the RE2-safe subset
    * both engines execute identically (alternation + classes only — the
    * original's negative lookahead is not RE2-expressible): contraction
    * suffixes, space-prefixed letter runs, space-prefixed digit runs,
    * space-prefixed punctuation runs. ASCII scope (the corpus contract);
    * apostrophes pre-doubled nowhere — the SQL splice escapes them. */
  val BpePattern: String = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token counts under BOTH tokenizers — the whitespace/alnum count the
    * quality gates use and a BPE-style pre-tokenization count (what a
    * subword tokenizer's piece count tracks; budget planning against a
    * real BPE vocab multiplies this by a fitted pieces-per-pretoken
    * rate). `bpe_hash` is a rolling hash of the JOINED piece stream, so a
    * hash-matched oracle run proves the PIECES equal, not just their
    * count. Pure per-row projections — zero shuffle. */
  def bpeTokenCounts(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val pat = BpePattern.replace("'", "''")
    val pieces = d.regexExtractAll(s"lower(`$textCol`)", pat)
    docs.select(col(idCol),
      expr(TX.tokenCountAuto(textCol)).as("n_ws_tokens"),
      expr(s"CAST(${d.size(pieces)} AS BIGINT)").as("n_bpe_tokens"),
      expr(TX.polyHashAuto(s"array_join($pieces, '|')")).as("bpe_hash"))
  }

  // --------------------------------------------------------------------
  // Priority sampling (weighted corpus subsample, exact arithmetic)
  // --------------------------------------------------------------------

  /** Weighted random sample of `n` rows by priority sampling (Duffield,
    * Lund & Thorup): priority q_i = w_i / u_i with u_i a deterministic
    * id-hash uniform in (0,1]; keep the n largest priorities; τ = the
    * (n+1)-th priority; est_weight = max(w_i, τ) is the Horvitz–Thompson
    * weight that makes subset-sum estimates over the sample unbiased.
    *
    * Arithmetic is DELIBERATELY transcendental-free: u = (h+1)/(P+1) and
    * q = w/u are single IEEE-754 divisions, which every engine rounds
    * identically — unlike the ln() the Efraimidis–Spirakis exponential-key
    * variant needs — so the oracle reproduces every priority bit-for-bit.
    *
    * Scale shape: the priority is a per-row projection; the top-(n+1) cut
    * is TakeOrderedAndProject (per-partition top-n+1, driver merges n+1
    * rows per partition — no global sort exchange); τ and the row-number
    * trim then run over ≤ n+1 rows in one post-limit partition.
    *
    * Weights must be POSITIVE for the scheme's inclusion probabilities
    * (and the est_weight unbiasedness) to mean anything; rather than let
    * a zero/negative weight silently skew the sample toward "never" (or
    * a large-magnitude negative to the bottom of every ordering), rows
    * with weight <= 0 are excluded up front — the standard DLT domain. */
  def prioritySample(docs: DataFrame, idCol: String, weightCol: String,
                     n: Int, salt: String = "ps"): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    require(salt.matches("[A-Za-z0-9_]*"),
      s"salt must be alphanumeric/underscore (it is spliced into a SQL literal): '$salt'")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val h = TX.polyHashAuto(s"concat('$salt', CAST(`$idCol` AS STRING))")
    val prio = s"CAST(`$weightCol` AS DOUBLE) / (CAST(($h) + 1 AS DOUBLE) / ${TX.P + 1}.0)"
    val top = docs
      .filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        expr(prio).as("__priority"))
      .orderBy(col("__priority").desc, col(idCol).asc)
      .limit(n + 1)
    val wAll = Window.partitionBy() // ≤ n+1 rows post-limit: bounded by design
    top
      .withColumn("__tau", min(col("__priority")).over(wAll))
      .withColumn("__rn", row_number().over(
        Window.partitionBy().orderBy(col("__priority").desc, col(idCol).asc)))
      .filter(col("__rn") <= n)
      .select(col(idCol), col("weight"),
        round(col("__priority"), 6).as("priority"),
        round(greatest(col("weight").cast("double"), col("__tau")), 6).as("est_weight"))
      .orderBy(col("priority").desc, col(idCol).asc)
  }

  // --------------------------------------------------------------------
  // Linear quality model (normal equations, one census pass)
  // --------------------------------------------------------------------

  /** Train-then-apply a linear model DISTRIBUTED, with zero iteration and
    * zero transcendentals — the "ML on sufficient statistics" pattern:
    * one map-side-combinable census pass accumulates the normal-equation
    * sums (exact: integer feature products summed in DECIMAL(38,0), so
    * the statistics are order- and partition-independent INTEGERS), the
    * 3×3 system solves in closed form (Cramer — products and divisions of
    * doubles in one fixed parenthesization, bit-identical in any engine),
    * and the fitted plane scores every document in the same query: the
    * output is the top-`topK` residual outliers — documents whose
    * stopword evidence departs most from what their length statistics
    * predict, the cheap "this document is structurally unusual" signal a
    * curation pipeline triages.
    *
    * Model: stop_hits ~ b0 + b1·token_count + b2·Σtoken_len. Features and
    * target are dialect-parametric expressions, so the DuckDB oracle runs
    * THE SAME derivation end-to-end — coefficients included — and the
    * hash gate proves the whole fit, not just the scoring.
    *
    * Scale shape: one scan → 10-value census (a single partial-aggregable
    * row), a 1-row cross join broadcast onto the scoring scan, TakeOrdered
    * top-K. The "training" never shuffles the corpus at all. */
  def qualityRegressionSql(table: String, textCol: String, idCol: String,
                           topK: Int)(implicit dl: Dialect): String = {
    val toks = if (dl.spark) s"graft_tokens($textCol)" else TX.tokens(textCol)(dl)
    val x1 = s"CAST(${dl.size(toks)} AS BIGINT)"
    val x2 = s"CAST(${dl.fold(dl.map(toks, "w", "CAST(length(w) AS BIGINT)"),
      "CAST(0 AS BIGINT)", "acc", "x", "acc + x")} AS BIGINT)"
    val stopList = StopEn.map(w => s"'$w'").mkString("(", ", ", ")")
    val y = s"CAST(${dl.size(dl.filt(toks, "w", s"w IN $stopList"))} AS BIGINT)"
    def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(38,0))) AS DOUBLE)"
    // Cramer determinants in ONE fixed parenthesization (both engines)
    val det = "(n*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1*sx2x2 - sx1x2*sx2) + sx2*(sx1*sx1x2 - sx1x1*sx2))"
    val det0 = "(sy*(sx1x1*sx2x2 - sx1x2*sx1x2) - sx1*(sx1y*sx2x2 - sx1x2*sx2y) + sx2*(sx1y*sx1x2 - sx1x1*sx2y))"
    val det1 = "(n*(sx1y*sx2x2 - sx1x2*sx2y) - sy*(sx1*sx2x2 - sx1x2*sx2) + sx2*(sx1*sx2y - sx1y*sx2))"
    val det2 = "(n*(sx1x1*sx2y - sx1y*sx1x2) - sx1*(sx1*sx2y - sx1y*sx2) + sy*(sx1*sx1x2 - sx1x1*sx2))"
    val yhat = "(b0 + b1*CAST(x1 AS DOUBLE) + b2*CAST(x2 AS DOUBLE))"
    s"""WITH s AS (SELECT $idCol, $x1 AS x1, $x2 AS x2, $y AS y FROM $table),
       |c AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |  ${dsum("x1")} AS sx1, ${dsum("x2")} AS sx2, ${dsum("y")} AS sy,
       |  ${dsum("x1*x1")} AS sx1x1, ${dsum("x1*x2")} AS sx1x2,
       |  ${dsum("x2*x2")} AS sx2x2, ${dsum("x1*y")} AS sx1y,
       |  ${dsum("x2*y")} AS sx2y FROM s),
       |w AS (SELECT CASE WHEN $det <> 0 THEN $det0/$det END AS b0,
       |  CASE WHEN $det <> 0 THEN $det1/$det END AS b1,
       |  CASE WHEN $det <> 0 THEN $det2/$det END AS b2 FROM c),
       |scored AS (SELECT $idCol, y,
       |  ROUND($yhat, 6) AS y_hat,
       |  ROUND(CAST(y AS DOUBLE) - $yhat, 6) AS residual
       |  FROM s CROSS JOIN w)
       |SELECT $idCol, y, y_hat, residual FROM scored
       |ORDER BY abs(residual) DESC, $idCol ASC LIMIT $topK""".stripMargin
  }

  /** [[qualityRegressionSql]] executed on the Spark side (temp view +
    * `spark.sql` — the plan is ordinary Catalyst: one hash-aggregate
    * census, a 1-row broadcast join, TakeOrderedAndProject). */
  def qualityRegression(docs: DataFrame, textCol: String, idCol: String,
                        topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive: $topK")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val view = s"__graft_qreg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    docs.createOrReplaceTempView(view)
    // sql() analyzes eagerly — the returned plan holds the resolved
    // relation, so the catalog entry can be dropped immediately (no view
    // accumulation across calls)
    try docs.sparkSession.sql(
      qualityRegressionSql(view, textCol, idCol, topK)(Dialect(spark = true)))
    finally docs.sparkSession.catalog.dropTempView(view)
  }

  // --------------------------------------------------------------------
  // Deterministic per-shard training order
  // --------------------------------------------------------------------

  /** Reproducible epoch shuffles for a sharded training job: for each
    * epoch, every row hashes (salted by the epoch) to a shard and to a
    * rank within that shard. A 1000-reader job seeks its shard's rows in
    * `position` order and gets a bit-reproducible permutation that differs
    * per epoch — with NO global sort: the only exchange is the (epoch,
    * shard)-keyed window, and each window partition is corpus/nShards
    * narrow (id, hash) rows. Re-runs, retries, and engines agree on every
    * row's (shard, position). */
  def shardOrder(docs: DataFrame, idCol: String,
                 nShards: Int, nEpochs: Int): DataFrame = {
    require(nShards > 0 && nEpochs > 0,
      s"need positive shards/epochs: $nShards/$nEpochs")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val h = TX.polyHashAuto(s"concat('ep', CAST(epoch AS STRING), '_', CAST(`$idCol` AS STRING))")
    val hashed = docs
      .select(col(idCol), explode(expr(s"sequence(0, ${nEpochs - 1})")).as("epoch"))
      .withColumn("__h", expr(h))
      .withColumn("shard", expr(s"cast(__h % $nShards as int)"))
    val w = Window.partitionBy("epoch", "shard").orderBy(col("__h").asc, col(idCol).asc)
    hashed
      .withColumn("position", row_number().over(w).cast("long"))
      .select(col("epoch"), col("shard"), col("position"), col(idCol))
      .orderBy("epoch", "shard", "position")
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over the token
    * stream: `depth` hash rows × `width` buckets of exact occurrence
    * counts. The 100 TB point of the structure: the corpus aggregates
    * into a FIXED-SIZE census — map-side partial aggregation caps every
    * partition's contribution at depth×width rows no matter how many
    * tokens it holds, and sketches of disjoint corpora merge by cell-wise
    * addition (spec-gated). All arithmetic is int64 (the MinHash
    * permutation family over the widened poly hash — TextExprs.cmBucket),
    * so unlike the library estimators behind qx47 the sketch itself is
    * bit-identical in both engines and the oracle hash-matches it. */
  def countMinSketch(docs: DataFrame, textCol: String,
                     depth: Int, width: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // tf-weighted distinct-terms census (graft_term_freqs) instead of the
    // occurrence stream: the depth-way posexplode blowup and the partial
    // aggregation both read vocabulary-sized input. Integer-exact.
    val tok = docs
      .select(explode(expr(s"graft_term_freqs($textCol).terms")).as("__ts"))
      .select(col("__ts.term").as("term"), col("__ts.tf").as("tf"))
    val buckets = array((0 until depth).map(i =>
      expr(TX.cmBucket("term", i, width)).cast("long")): _*)
    tok.select(col("tf"), posexplode(buckets).as(Seq("row", "bucket")))
      .select(col("tf"), col("row").cast("long").as("row"), col("bucket"))
      .groupBy("row", "bucket").agg(sum("tf").as("cnt"))
  }

  /** Per-term count-min estimates next to the exact census: est(t) =
    * min over rows of sketch[row][h_row(t)], always ≥ the true count.
    * `within_markov` is the integer-exact factor-2 Markov envelope
    * (est − true)·width ≤ 2·N, the per-row guarantee the min inherits
    * with probability 1 − 2^−depth. The sketch broadcasts (depth×width
    * rows); the truth census is vocab-bounded — at production scale the
    * query terms would come from a candidate set instead. */
  def countMinEstimates(docs: DataFrame, textCol: String,
                        depth: Int, width: Int): DataFrame =
    countMinEstimatesWith(countMinSketch(docs, textCol, depth, width),
      docs, textCol, depth, width)

  /** [[countMinEstimates]] against a CALLER-SUPPLIED sketch (e.g. the
    * cell-wise-merged batch partials a streaming ingest accumulated —
    * [[graft.streaming.StreamingSketch]]); `docs` provides the exact
    * census the estimates are audited against. */
  def countMinEstimatesWith(sketch: DataFrame, docs: DataFrame, textCol: String,
                            depth: Int, width: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val tok = docs
      .select(explode(expr(s"graft_term_freqs($textCol).terms")).as("__ts"))
      .select(col("__ts.term").as("term"), col("__ts.tf").as("tf"))
    val truth = tok.groupBy("term").agg(sum("tf").as("true_cnt"))
    val total = tok.agg(sum("tf").as("n_tokens"))
    val buckets = array((0 until depth).map(i =>
      expr(TX.cmBucket("term", i, width)).cast("long")): _*)
    val probes = truth.select(col("term"), col("true_cnt"),
      posexplode(buckets).as(Seq("row", "bucket")))
      .select(col("term"), col("true_cnt"),
        col("row").cast("long").as("row"), col("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy("term", "true_cnt").agg(min("cnt").as("est_cnt"))
      .crossJoin(broadcast(total))
      .select(col("term"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"),
        when((col("est_cnt") - col("true_cnt")) * lit(width.toLong)
          <= lit(2L) * col("n_tokens"), 1L).otherwise(0L).as("within_markov"))
  }
}
