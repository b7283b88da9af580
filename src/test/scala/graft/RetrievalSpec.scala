package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25TopK matches the hand-computed Okapi formula on a fixture") {
    // corpus: 3 docs; query "cat" — df(cat)=2, N=3, dl = 4/4/2, avgdl=10/3
    val corpus = docs(
      1L -> "cat cat dog bird",
      2L -> "cat fish fish fish",
      3L -> "dog bird")
    val q = docs(100L -> "cat")
    val got = Retrieval.bm25TopK(corpus, q, "text", "doc_id", 10)
      .orderBy("rank").collect()
    def bm25(tf: Long, dl: Long): Double = {
      val n = 3.0; val df = 2.0; val avgdl = 10.0 / 3.0
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val norm = (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))
      val u = math.floor(idf * norm * 1000000.0 + 0.5).toLong // micro-units
      BigDecimal(u.toDouble / 1000000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc1: tf=2,dl=4 beats doc2: tf=1,dl=4; doc3 has no query term → absent
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // contiguous ranks
    assert(got(0).getDouble(3) == bm25(2, 4))
    assert(got(1).getDouble(3) == bm25(1, 4))
  }

  test("bm25fTopK matches the hand-computed simple-BM25F formula; per-field normalization precedes ONE saturation") {
    import spark.implicits._
    // title avgdl = 3/3 = 1; body avgdl = (2+3+1)/3 = 2; df(cat) = 2, N = 3
    val corpus = Seq(
      (1L, "cat", "dog bird"),
      (2L, "dog", "cat cat cat"),
      (3L, "fish", "fish")).toDF("doc_id", "title", "body")
    val q = docs(100L -> "cat")
    val got = Retrieval.bm25fTopK(corpus,
      Seq(Retrieval.Bm25Field("title", 2.0, 0.5),
        Retrieval.Bm25Field("body", 1.0, 0.75)),
      "doc_id", q, "text", 10).orderBy("rank").collect()
    def sc(wtf: Double): Double = {
      val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
      val u = math.floor(idf * (wtf / (1.2 + wtf)) * 1000000.0 + 0.5).toLong
      BigDecimal(u.toDouble / 1000000.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc1: cat in TITLE, tf=1, dl=1 → wtf = 2·1/(0.5 + 0.5·(1/1)) = 2.0
    // doc2: cat in BODY, tf=3, dl=3 → wtf = 3/(0.25 + 0.75·(3/2)) = 2.1818…
    val wtf1 = 2.0 * 1.0 / ((1.0 - 0.5) + 0.5 * (1.0 / 1.0))
    val wtf2 = 1.0 * 3.0 / ((1.0 - 0.75) + 0.75 * (3.0 / 2.0))
    assert(got.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // saturated wtf orders
    assert(got(0).getDouble(3) == sc(wtf2))
    assert(got(1).getDouble(3) == sc(wtf1))
    // fielded ≠ weighted sum of per-field BM25: a weighted-sum scorer
    // saturates tf per field, and with the title's 2× weight doc1 would
    // win — the ordering above is the BM25F semantics showing
    def bm25Term(tf: Double, dl: Double, avgdl: Double, b: Double): Double =
      (tf * 2.2) / (tf + 1.2 * (1.0 - b + b * dl / avgdl))
    val sumScorer1 = 2.0 * bm25Term(1, 1, 1, 0.5)
    val sumScorer2 = 1.0 * bm25Term(3, 3, 2, 0.75)
    assert(sumScorer1 > sumScorer2,
      "fixture must separate BM25F from the weighted-sum-of-BM25 scorer")
  }

  test("bm25fTopKFromStores: lifecycle composes per field; partial retraction fails the field-complete gate; filter keeps df corpus-global") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "cat dog", "dog bird dog"),
      (2L, "dog fish", "cat cat cat fish"),
      (3L, "fish cat", "fish bird"),
      (4L, "bird bird", "cat dog fish")).toDF("doc_id", "title", "body")
    val q = docs(100L -> "cat fish")
    val flds = Seq(2.0 -> 0.5, 1.0 -> 0.75)
    val work = java.nio.file.Files.createTempDirectory("bm25f-store").toString
    for ((f, p) <- Seq("title" -> s"$work/title", "body" -> s"$work/body")) {
      Retrieval.writeBm25Store(corpus.filter(col("doc_id") =!= 4L), f, "doc_id", p, 4)
      Retrieval.appendBm25Store(corpus.filter(col("doc_id") === 4L), f, "doc_id", p, epoch = 1L)
    }
    val storeFields = Seq(
      Retrieval.Bm25StoreField(s"$work/title", 2.0, 0.5),
      Retrieval.Bm25StoreField(s"$work/body", 1.0, 0.75))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // build+append served == one-shot over the union corpus
    val oneShot = Retrieval.bm25fTopK(corpus,
      Seq(Retrieval.Bm25Field("title", 2.0, 0.5), Retrieval.Bm25Field("body", 1.0, 0.75)),
      "doc_id", q, "text", 10)
    assert(canon(Retrieval.bm25fTopKFromStores(spark, storeFields, q, "text", "doc_id", 10))
      == canon(oneShot))
    // symmetric retraction: delete doc 2 from BOTH stores → equals the
    // one-shot over the reduced corpus (df/avgdl followed the retraction)
    for (p <- Seq(s"$work/title", s"$work/body"))
      Retrieval.deleteFromBm25Store(spark, p, Seq(2L).toDF("doc_id"), epoch = 2L)
    val reduced = Retrieval.bm25fTopK(corpus.filter(col("doc_id") =!= 2L),
      Seq(Retrieval.Bm25Field("title", 2.0, 0.5), Retrieval.Bm25Field("body", 1.0, 0.75)),
      "doc_id", q, "text", 10)
    assert(canon(Retrieval.bm25fTopKFromStores(spark, storeFields, q, "text", "doc_id", 10))
      == canon(reduced))
    // filtered serving: the allow-list fences candidates but df/n_docs
    // stay corpus-global — scores of surviving docs are UNCHANGED
    val unfiltered = Retrieval.bm25fTopKFromStores(spark, storeFields, q, "text", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val filtered = Retrieval.bm25fTopKFromStoresFiltered(spark, storeFields, q,
      Seq(1L).toDF("doc_id"), "text", "doc_id", 10).collect()
    assert(filtered.map(_.getLong(2)).toSet == Set(1L))
    filtered.foreach(r =>
      assert(r.getDouble(3) == unfiltered((r.getLong(0), r.getLong(2))),
        "the filter must not reweight surviving docs' scores"))
    // PARTIAL retraction (one store only) breaks the shared document
    // universe — the gate must refuse loudly, not silently reweight
    Retrieval.deleteFromBm25Store(spark, s"$work/title", Seq(3L).toDF("doc_id"), epoch = 3L)
    val err = intercept[IllegalArgumentException] {
      Retrieval.bm25fTopKFromStores(spark, storeFields, q, "text", "doc_id", 10)
    }
    assert(err.getMessage.contains("field-complete"))
    // SYMMETRIC partial retraction: drop doc 4 from the body store too —
    // both stores now hold exactly 2 live docs ({1,4} vs {1,3}) so a
    // count-only gate would wave it through; the doc-SET signature must
    // still refuse
    Retrieval.deleteFromBm25Store(spark, s"$work/body", Seq(4L).toDF("doc_id"), epoch = 3L)
    val errSym = intercept[IllegalArgumentException] {
      Retrieval.bm25fTopKFromStores(spark, storeFields, q, "text", "doc_id", 10)
    }
    assert(errSym.getMessage.contains("field-complete"))
  }

  test("bm25fTopKFromStores: a doc that tokenizes empty in one field is caught by the set-signature gate") {
    import spark.implicits._
    // doc 3's body is whitespace-only: it has postings in the title
    // store but none in the body store — the two universes differ even
    // though a user wrote the same 3 docs to both. BM25F fields must be
    // total; the gate must refuse rather than silently serve divergent
    // n_docs/avgdl.
    val corpus = Seq(
      (1L, "cat dog", "dog bird"),
      (2L, "dog fish", "cat fish"),
      (3L, "fish cat", "   ")).toDF("doc_id", "title", "body")
    val work = java.nio.file.Files.createTempDirectory("bm25f-empty").toString
    for ((f, p) <- Seq("title" -> s"$work/title", "body" -> s"$work/body"))
      Retrieval.writeBm25Store(corpus, f, "doc_id", p, nBuckets = 4)
    val err = intercept[IllegalArgumentException] {
      Retrieval.bm25fTopKFromStores(spark,
        Seq(Retrieval.Bm25StoreField(s"$work/title", 2.0, 0.5),
          Retrieval.Bm25StoreField(s"$work/body", 1.0, 0.75)),
        docs(100L -> "cat"), "text", "doc_id", 10)
    }
    assert(err.getMessage.contains("tokenizes empty"))
  }

  test("bm25fTopKFromStore SUBSET-FIELDS contract: store-universe statistics on docs that LACK a requested field (pinned divergence from the requested-fields one-shot)") {
    import spark.implicits._
    // round-13 closure of the documented contract (bm25fTopKFromStore's
    // scaladoc): when `fields` names fewer fields than the store holds,
    // n_docs/avgdl_f are the STORE's all-stored-fields live scalars —
    // docs empty in every requested field still count — while df and the
    // candidate set come only from the requested fields' postings. The
    // requested-fields one-shot instead derives n_docs from docs
    // non-empty in the requested fields, so the two must diverge on
    // exactly this corpus shape.
    val titled = Seq(
      (1L, "cat dog", "dog bird dog"),
      (2L, "dog fish", "cat cat fish"),
      (3L, "fish cat", "fish bird"))
    val bodyOnly = Seq( // empty title, query-disjoint body
      (10L, "", "zebra yak zebra"),
      (11L, "", "yak zebra"))
    val corpusA = titled.toDF("doc_id", "title", "body")
    val corpusB = (titled ++ bodyOnly).toDF("doc_id", "title", "body")
    val q = docs(100L -> "cat fish")
    val fT = Seq(Retrieval.Bm25fField("title", 2.0, 0.5))
    val f1 = Seq(Retrieval.Bm25Field("title", 2.0, 0.5))
    def build(c: org.apache.spark.sql.DataFrame): String = {
      val p = java.nio.file.Files.createTempDirectory("bm25f-subset")
        .toString + "/s"
      Retrieval.writeBm25fStore(c, Seq("title", "body"), "doc_id", p, 4)
      p
    }
    val (sA, sB) = (build(corpusA), build(corpusB))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    def servedT(p: String) = Retrieval.bm25fTopKFromStore(spark, p, fT,
      q, "text", "doc_id", 10)
    // 1. when the store universe == the requested-field universe, the
    //    subset serve IS the requested-fields one-shot (baseline)
    assert(canon(servedT(sA))
      == canon(Retrieval.bm25fTopK(corpusA, f1, "doc_id", q, "text", 10)))
    // 2. body-only docs never become candidates of a title-only serve...
    val rA = servedT(sA).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val gotB = servedT(sB).collect()
    assert(gotB.map(r => (r.getLong(0), r.getLong(2))).toSet == rA,
      "docs lacking every requested field must not enter the candidates")
    // ...but they DO move the scores: the store universe carries them
    // into n_docs (idf) and avgdl_title — the pinned store-universe
    // semantics, observable
    val scoresA = servedT(sA).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(gotB.exists(r => scoresA((r.getLong(0), r.getLong(2)))
        != r.getDouble(3)),
      "store-universe scalars must shift subset-field scores when docs " +
        "lacking the requested field join the store")
    // 3. the requested-fields ONE-SHOT ignores those docs entirely (its
    //    n_docs counts docs non-empty in the requested fields) — the
    //    documented divergence, asserted explicitly
    assert(canon(Retrieval.bm25fTopK(corpusB, f1, "doc_id", q, "text", 10))
      == canon(Retrieval.bm25fTopK(corpusA, f1, "doc_id", q, "text", 10)))
    assert(canon(servedT(sB))
      != canon(Retrieval.bm25fTopK(corpusB, f1, "doc_id", q, "text", 10)),
      "the subset serve must diverge from the requested-fields one-shot " +
        "exactly when docs lack a requested field")
    // 4. only the absent docs' SCALARS matter, never their content:
    //    same-length different-token bodies serve byte-identically
    val corpusB2 = (titled ++ Seq(
      (10L, "", "emu gnu emu"), (11L, "", "gnu emu")))
      .toDF("doc_id", "title", "body")
    assert(canon(servedT(build(corpusB2))) == canon(servedT(sB)),
      "subset-field scores may depend on absent docs only through " +
        "n_docs/len scalars")
    // 5. requesting ALL fields on the lacking-docs store still equals the
    //    one-shot (both universes are any-field docs) — the qx123
    //    equality holds beyond the field-total corpus shape
    val fBoth = Seq(Retrieval.Bm25fField("title", 2.0, 0.5),
      Retrieval.Bm25fField("body", 1.0, 0.75))
    val f2 = Seq(Retrieval.Bm25Field("title", 2.0, 0.5),
      Retrieval.Bm25Field("body", 1.0, 0.75))
    assert(canon(Retrieval.bm25fTopKFromStore(spark, sB, fBoth, q, "text",
        "doc_id", 10))
      == canon(Retrieval.bm25fTopK(corpusB, f2, "doc_id", q, "text", 10)))
  }

  test("bm25fTopKFromStores: per-field streamed ingest with UNALIGNED batch boundaries serves the one-shot result") {
    import spark.implicits._
    import graft.streaming.StreamingBm25Ingest
    // fielded serving composes with streamed ingest: each field store is
    // fed by its own stream, and the batch boundaries need not line up
    // across fields — only the final live document set must (the
    // field-complete gate). Title arrives as {2,3} then {4}; body as {2}
    // then {3,4}: same end state, different histories.
    val corpus = Seq(
      (1L, "cat dog", "dog bird dog"),
      (2L, "dog fish", "cat cat cat fish"),
      (3L, "fish cat", "fish bird"),
      (4L, "bird bird", "cat dog fish")).toDF("doc_id", "title", "body")
    val q = docs(100L -> "cat fish", 101L -> "bird")
    val work = java.nio.file.Files.createTempDirectory("bm25f-stream").toString
    def part(ids: Long*) = corpus.filter(col("doc_id").isInCollection(ids))
    for ((f, p, batches) <- Seq(
        ("title", s"$work/title", Seq(Seq(2L, 3L), Seq(4L))),
        ("body", s"$work/body", Seq(Seq(2L), Seq(3L, 4L)))) ) {
      Retrieval.writeBm25Store(part(1L), f, "doc_id", p, nBuckets = 4)
      StreamingBm25Ingest.adopt(spark, p, s"ck-$f")
      for ((ids, bid) <- batches.zipWithIndex)
        StreamingBm25Ingest.processBatch(part(ids: _*), bid.toLong, f,
          "doc_id", p, s"ck-$f")
    }
    val served = Retrieval.bm25fTopKFromStores(spark,
      Seq(Retrieval.Bm25StoreField(s"$work/title", 2.0, 0.5),
        Retrieval.Bm25StoreField(s"$work/body", 1.0, 0.75)),
      q, "text", "doc_id", 10)
    val oneShot = Retrieval.bm25fTopK(corpus,
      Seq(Retrieval.Bm25Field("title", 2.0, 0.5),
        Retrieval.Bm25Field("body", 1.0, 0.75)),
      "doc_id", q, "text", 10)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    assert(canon(served) == canon(oneShot))
  }

  test("fielded RAG from stores: BM25F field stores + sidecar vector store fuse through rrfFuse, equal to fusing the one-shot fielded ranking") {
    import spark.implicits._
    // the production composition one step past qx107: the LEXICAL side
    // of the hybrid is FIELDED (title/body stores), the vector side is
    // the sidecar-rescored store, and the whole fused serving runs from
    // three store paths alone. The gate: swapping the served fielded
    // ranking for the one-shot bm25fTopK under the same fusion yields
    // the identical fused list — store mechanics invisible through RRF.
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 400)
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
    val isQuery = col("doc_id") % 20 === 3
    graft.functions.GraftFunctions.register(spark)
    val fielded = hybrid.select(col("doc_id"), col("embedding"),
      expr("array_join(slice(graft_tokens(text), 1, 5), ' ')").as("title"),
      // pad short docs' bodies: BM25F fields must be total (see the
      // field-complete gate's scaladoc)
      expr("coalesce(nullif(array_join(slice(graft_tokens(text), 6, 1000000), ' '), ''), 'emptybody')").as("body"))
    val corpus = fielded.filter(!isQuery)
    val queries = hybrid.filter(isQuery).select("doc_id", "text", "embedding")
    val work = java.nio.file.Files.createTempDirectory("fielded-rag").toString
    for (f <- Seq("title", "body"))
      Retrieval.writeBm25Store(corpus, f, "doc_id", s"$work/$f", 8)
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
    val codebook = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
    graft.operators.Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      64, 4, residual = false, s"$work/vec", storeVectors = true)
    val storeFields = Seq(
      Retrieval.Bm25StoreField(s"$work/title", 2.0, 0.5),
      Retrieval.Bm25StoreField(s"$work/body", 1.0, 0.75))
    val vec = graft.operators.Quantize.searchSelfContainedRefinedStored(
        spark, s"$work/vec", queries, "doc_id", "embedding",
        k = 20, nProbe = 2, rerankDepth = 1000000)
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
    val lexServed = Retrieval.bm25fTopKFromStores(spark, storeFields,
      queries, "text", "doc_id", 20)
    val lexOneShot = Retrieval.bm25fTopK(corpus,
      Seq(Retrieval.Bm25Field("title", 2.0, 0.5),
        Retrieval.Bm25Field("body", 1.0, 0.75)),
      "doc_id", queries, "text", 20)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    val fusedServed = canon(Retrieval.rrfFuse(lexServed, vec, 60, 10))
    assert(fusedServed == canon(Retrieval.rrfFuse(lexOneShot, vec, 60, 10)))
    assert(fusedServed.nonEmpty)
  }

  test("raw-text sidecar: auto-routed delete equals the scan-path delete, store state for store state") {
    import spark.implicits._
    val base = docs((1L to 20L).map(i => i -> s"alpha doc$i common word$i"): _*)
    val batch = docs((21L to 25L).map(i => i -> s"beta doc$i alpha"): _*)
    val doomed = Seq(3L, 7L, 21L, 999L).toDF("doc_id") // 999 absent → no-op
    val q = docs(900L -> "alpha common beta")
    val root = java.nio.file.Files.createTempDirectory("bm25-docs-del").toString
    val withSc = s"$root/with"; val without = s"$root/without"
    Retrieval.writeBm25Store(base, "text", "doc_id", withSc, 8, storeDocs = true)
    Retrieval.writeBm25Store(base, "text", "doc_id", without, 8)
    for (p <- Seq(withSc, without))
      Retrieval.appendBm25Store(batch, "text", "doc_id", p, epoch = 1L)
    // the sidecar followed the append: all 25 live texts readable, pruned
    val got = Retrieval.readStoreDocs(spark, withSc,
      Seq(5L, 23L).toDF("doc_id")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(5L -> "alpha doc5 common word5", 23L -> "beta doc23 alpha"))
    assert(Retrieval.deleteFromBm25Store(spark, withSc, doomed, epoch = 2L) == 3L)
    assert(Retrieval.deleteFromBm25Store(spark, without, doomed, epoch = 2L) == 3L)
    def dfTable(p: String) = spark.read.parquet(s"$p/df")
      .groupBy("term").agg(sum("cnt").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.filter(_._2 != 0L)
    def stats(p: String) = Retrieval.liveStats(spark, p).collect().head.toSeq
    assert(dfTable(withSc) == dfTable(without))
    assert(stats(withSc) == stats(without))
    def rows(p: String) = Retrieval.bm25TopKFromStore(spark, p, q,
      "text", "doc_id", 30).collect().map(_.toString).toSeq
    assert(rows(withSc) == rows(without))
    // readStoreDocs refuses a store without the sidecar
    val err = intercept[IllegalArgumentException](
      Retrieval.readStoreDocs(spark, without, Seq(1L).toDF("doc_id")))
    assert(err.getMessage.contains("sidecar"))
    // delete → compact → RE-DELETE the same ids: compact clears the
    // tombstones AND vacuums the dead docs' sidecar texts in the same
    // window (serving's include_text guard anti-joins those tombstones,
    // so the texts must leave when the guard does) — the re-delete is a
    // no-op on BOTH paths, doubly guarded on the sidecar route by the
    // liveness probe for the crashed-mid-vacuum transient
    for (p <- Seq(withSc, without)) Retrieval.compactBm25Store(spark, p)
    val afterVacuum = spark.read.parquet(s"$withSc/docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!afterVacuum.exists(Set(3L, 7L, 21L)),
      "compaction must vacuum the purged ids' sidecar texts")
    assert(afterVacuum.size == 22, "vacuum must keep every live doc's text")
    assert(Retrieval.deleteFromBm25Store(spark, withSc, doomed, epoch = 3L) == 0L)
    assert(Retrieval.deleteFromBm25Store(spark, without, doomed, epoch = 3L) == 0L)
    assert(dfTable(withSc) == dfTable(without))
    assert(stats(withSc) == stats(without))
    assert(rows(withSc) == rows(without))
  }

  test("raw-text sidecar: re-ingest after delete+compact serves the LATEST text; rebucket vacuums to exactly the live ids; rebuild without storeDocs clears it") {
    import spark.implicits._
    val base = docs((1L to 12L).map(i => i -> s"alpha doc$i common"): _*)
    val work = java.nio.file.Files.createTempDirectory("bm25-docs-lc").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work, 8, storeDocs = true)
    Retrieval.deleteFromBm25Store(spark, work, Seq(4L).toDF("doc_id"), epoch = 1L)
    Retrieval.compactBm25Store(spark, work) // clears tombstones
    val reborn = docs(4L -> "gamma rewritten text")
    Retrieval.appendBm25Store(reborn, "text", "doc_id", work, epoch = 2L)
    // the reader resolves doc 4 to its LATEST epoch's text
    val txt = Retrieval.readStoreDocs(spark, work, Seq(4L).toDF("doc_id"))
      .collect().head.getString(1)
    assert(txt == "gamma rewritten text")
    // rebucket = the vacuum: one sidecar row per live doc, stale texts gone
    Retrieval.deleteFromBm25Store(spark, work, Seq(9L).toDF("doc_id"), epoch = 3L)
    Retrieval.rebucketBm25Store(spark, work, newBuckets = 4)
    val sc = spark.read.parquet(s"$work/docs")
    assert(sc.count() == 11L) // 12 − deleted 9, doc 4 exactly once
    assert(sc.groupBy("doc_id").count().filter(col("count") > 1).count() == 0L)
    assert(Retrieval.readStoreDocs(spark, work, Seq(4L).toDF("doc_id"))
      .collect().head.getString(1) == "gamma rewritten text")
    assert(spark.read.parquet(s"$work/docs").filter(col("doc_id") === 9L).count() == 0L)
    // serving still equals the one-shot over the live corpus
    val q = docs(900L -> "alpha gamma")
    val live = base.filter(!col("doc_id").isin(4L, 9L)).unionByName(reborn)
    assert(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)
      .collect().map(_.toString).toSeq
      == Retrieval.bm25TopK(live, q, "text", "doc_id", 30)
      .collect().map(_.toString).toSeq)
    // a rebuild WITHOUT storeDocs clears the prior life's sidecar
    Retrieval.writeBm25Store(base, "text", "doc_id", work, 8)
    assert(!Retrieval.hasDocsSidecar(spark, work))
  }

  test("snippetTopKFromStore: anchor is the first matched-term position; window clips at doc start; fixed width") {
    import spark.implicits._
    val corpus = docs(
      1L -> "one two three cat five six seven eight nine ten",
      2L -> "cat at the very start of this document here now",
      3L -> "no match words only filler tokens in this doc")
    val work = java.nio.file.Files.createTempDirectory("bm25-snip").toString
    Retrieval.writeBm25Store(corpus, "text", "doc_id", work, 4, storeDocs = true)
    val got = Retrieval.snippetTopKFromStore(spark, work,
        docs(100L -> "cat"), "text", "doc_id", 10, window = 2)
      .collect().map(r => r.getLong(2) -> r.getString(4)).toMap
    // doc 1: anchor 4 → tokens 2..6 (width 5); doc 2: anchor 1 → clip to
    // start, still width 5 (tokens 1..5); doc 3 unmatched → absent
    assert(got == Map(
      1L -> "two three cat five six",
      2L -> "cat at the very start"))
  }

  test("bm25TopKFromStoreConjunctive: only all-term matches rank; survivors keep their OR scores; composes with the allow-list") {
    import spark.implicits._
    val corpus = docs(
      1L -> "cat dog fish bird",    // matches all of "cat dog fish"
      2L -> "cat dog dog dog",      // missing fish → excluded
      3L -> "fish cat dog extra",   // matches all
      4L -> "cat cat cat")          // missing two → excluded
    val q = docs(100L -> "cat dog fish")
    val work = java.nio.file.Files.createTempDirectory("bm25-conj").toString
    Retrieval.writeBm25Store(corpus, "text", "doc_id", work, 4)
    val conj = Retrieval.bm25TopKFromStoreConjunctive(spark, work, q,
      "text", "doc_id", 10).collect()
    assert(conj.map(_.getLong(2)).toSet == Set(1L, 3L),
      "only docs matching EVERY query term may rank")
    // survivors keep their ordinary BM25 scores — the conjunctive list
    // is a strict subset of the OR ranking with identical values
    val or = Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 10)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    conj.foreach(r => assert(r.getDouble(3) == or(r.getLong(2)),
      "conjunctive must not reweight survivors"))
    // allow-list composes: fence doc 1 away, doc 3 remains the only hit
    val filtered = Retrieval.bm25TopKFromStoreConjunctiveFiltered(spark, work,
      q, Seq(3L, 2L, 4L).toDF("doc_id"), "text", "doc_id", 10).collect()
    assert(filtered.map(_.getLong(2)).toSeq == Seq(3L))
    assert(filtered.head.getDouble(3) == or(3L),
      "the fence must not change corpus-global statistics")
  }

  test("bm25TopK: multi-term scores are summed per doc; ties break on doc_id") {
    val corpus = docs(
      1L -> "alpha beta",
      2L -> "alpha beta",  // identical doc → identical score; tie → doc 1 first
      3L -> "alpha gamma")
    val q = docs(100L -> "alpha beta")
    val got = Retrieval.bm25TopK(corpus, q, "text", "doc_id", 10)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
    assert(got(0).getDouble(3) == got(1).getDouble(3))  // exact tie survives
    assert(got(2).getDouble(3) < got(0).getDouble(3))   // one term < two terms
  }

  test("bm25TopK is partitioning-invariant (decimal-exact, order-independent sums)") {
    val corpus = docs((1L to 40L).map(i =>
      i -> s"term${i % 7} term${i % 5} term${i % 5} filler$i common common"): _*)
    val q = docs(900L -> "term3 common term1")
    val base = Retrieval.bm25TopK(corpus, q, "text", "doc_id", 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val shuffled = Retrieval.bm25TopK(corpus.repartition(7), q, "text", "doc_id", 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(base == shuffled)
    assert(base.nonEmpty)
  }

  test("bm25TopK caps query terms at maxQueryTerms (first tokens win)") {
    val corpus = docs(1L -> "aa bb", 2L -> "zz yy")
    // query's first 2 tokens are aa bb; the tail token zz must be ignored
    val q = docs(100L -> "aa bb zz")
    val got = Retrieval.bm25TopK(corpus, q, "text", "doc_id", 10, maxQueryTerms = 2)
      .collect().map(_.getLong(2)).toSet
    assert(got == Set(1L))
  }

  test("rrfFuse: doc retrieved by both rankings outranks single-list docs; missing ranks contribute 0") {
    import spark.implicits._
    // query 9: lex top = (A=1, B=2), vec top = (A=2, C=1)
    val lex = Seq((9L, 10L, 1L), (9L, 11L, 2L)).toDF("query_id", "doc_id", "rank")
    val vec = Seq((9L, 12L, 1L), (9L, 10L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, 60, 10).orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(10L, 12L, 11L))
    def c(r: Long): Long = // nano-units
      math.floor(1.0 / (60.0 + r) * 1000000000.0 + 0.5).toLong
    def score(u: Long): Double =
      BigDecimal(u.toDouble / 1000000000.0)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getDouble(3) == score(c(1) + c(2)))          // both lists
    assert(got(1).getDouble(3) == score(c(1)))                 // vec only
    assert(got(2).getDouble(3) == score(c(2)))                 // lex only
    // single-list docs carry a null rank for the missing side
    assert(got(1).isNullAt(4) && !got(1).isNullAt(5))
    assert(!got(2).isNullAt(4) && got(2).isNullAt(5))
  }

  test("bm25 store: build+append serves identically to the one-shot in-memory search over the union") {
    val base = docs((1L to 30L).map(i =>
      i -> s"alpha doc$i beta term${i % 5} gamma common"): _*)
    val batch = docs((31L to 40L).map(i =>
      i -> s"delta doc$i alpha term${i % 5} epsilon common"): _*)
    val union = base.unionByName(batch)
    val q = docs(900L -> "alpha term3 common", 901L -> "delta epsilon")
    val work = java.nio.file.Files.createTempDirectory("bm25st-").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work, nBuckets = 8)
    Retrieval.appendBm25Store(batch, "text", "doc_id", work, epoch = 1L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val fromStore = rows(
      Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 12))
    val oneShot = rows(Retrieval.bm25TopK(union, q, "text", "doc_id", 12))
    assert(fromStore == oneShot)
    assert(fromStore.nonEmpty)
    // rebuild-over-union equivalence: append must be invisible
    val work2 = java.nio.file.Files.createTempDirectory("bm25st2-").toString
    Retrieval.writeBm25Store(union, "text", "doc_id", work2, nBuckets = 8)
    assert(rows(Retrieval.bm25TopKFromStore(spark, work2, q, "text", "doc_id", 12))
      == fromStore)
  }

  test("bm25 store search prunes to the query terms' bucket partitions") {
    val corpus = docs((1L to 50L).map(i => i -> s"w$i filler$i unique$i"): _*)
    val q = docs(900L -> "w7")
    val work = java.nio.file.Files.createTempDirectory("bm25pr-").toString
    Retrieval.writeBm25Store(corpus, "text", "doc_id", work, nBuckets = 16)
    val df = Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 5)
    val plan = df.queryExecution.executedPlan.toString
    // the single-term query's lone bucket becomes a LITERAL partition
    // predicate (a 1-element isin folds to equality) on the postings scan
    val b = spark.sql("SELECT graft_polyhash('w7') % 16").collect().head.getLong(0)
    val pf = "PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.isDefined, s"no bucket partition filter on the postings scan:\n$plan")
    assert(pf.get.contains(s"= $b)") || pf.get.contains(s"IN ($b"),
      s"partition filter does not pin bucket $b: ${pf.get}")
    assert(df.collect().map(_.getLong(2)).toSeq == Seq(7L))
  }

  test("qx104 composition: every stage bites on the real corpus and curation changes the answers") {
    val dir = "/root/testdata/sf0.01"
    val docs2 = Tables.t(spark, dir, "documents")
    val isQuery = col("doc_id") % 211 === 5
    val isBench = col("doc_id") % 29 === 3
    val corpus0 = docs2.filter(!isQuery && !isBench)
    val contaminated = graft.operators.TextAnalysis.contaminationBloom(
        corpus0, docs2.filter(isBench), "text", "doc_id", 4, 1L, 1 << 17)
      .select("doc_id").distinct()
    val nContaminated = contaminated.count()
    assert(nContaminated > 0, "decontamination stage is vacuous")
    val clean = corpus0.join(contaminated, Seq("doc_id"), "left_anti")
    val keep = graft.operators.TextAnalysis.gopherRules(clean, "text", "doc_id",
        20L, 90L, 4.0, 4.8, 0.05, 1L)
      .filter(col("keep") === 1).count()
    assert(keep > 0 && keep < clean.count(), "gopher stage is vacuous")
    // curation must actually change retrieval output
    val curated = SparkEntry.queries("qx104_curate_serve")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val raw = SparkEntry.queries("qx100_bm25_topk")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(curated != raw, "curation did not change any top-k answer")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("bm25 store append retry (same epoch) replaces, never double-appends") {
    val base = docs((1L to 20L).map(i => i -> s"alpha doc$i beta common"): _*)
    val batch = docs((21L to 30L).map(i => i -> s"gamma doc$i alpha common"): _*)
    val q = docs(900L -> "alpha common gamma")
    val work = java.nio.file.Files.createTempDirectory("bm25rt-").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work, nBuckets = 8)
    Retrieval.appendBm25Store(batch, "text", "doc_id", work, epoch = 1L)
    val once = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30))
    // the "retry after a crash" path: the SAME logical batch lands again
    Retrieval.appendBm25Store(batch, "text", "doc_id", work, epoch = 1L)
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)) == once)
    // scalars were replaced, not summed twice
    val st = Retrieval.liveStats(spark, work).collect().head
    assert(st.getLong(0) == 30L, s"n_docs after retried append: ${st.getLong(0)}")
  }

  test("bm25 store delete: search equals a store rebuilt without the deleted docs; absent/repeat deletes are no-ops") {
    import spark.implicits._
    val all = docs((1L to 40L).map(i => i -> s"alpha doc$i term${i % 5} common"): _*)
    val deadIds = (1L to 40L).filter(_ % 4 == 1)
    val q = docs(900L -> "alpha term1 common")
    val work = java.nio.file.Files.createTempDirectory("bm25del-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 8)
    val n = Retrieval.deleteFromBm25Store(spark, work,
      (deadIds :+ 9999L).toDF("doc_id"), epoch = 1L) // 9999 absent → no-op
    assert(n == deadIds.size)
    val got = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 40))
    val work2 = java.nio.file.Files.createTempDirectory("bm25del2-").toString
    Retrieval.writeBm25Store(all.filter(!col("doc_id").isin(deadIds: _*)),
      "text", "doc_id", work2, nBuckets = 8)
    assert(got == rows(Retrieval.bm25TopKFromStore(spark, work2, q, "text", "doc_id", 40)))
    assert(got.nonEmpty && !got.exists(r => deadIds.contains(r._3)))
    // deleting the same ids again (new epoch) must not double-decrement
    assert(Retrieval.deleteFromBm25Store(spark, work,
      deadIds.toDF("doc_id"), epoch = 2L) == 0L)
    val st = Retrieval.liveStats(spark, work).collect().head
    assert(st.getLong(0) == 40L - deadIds.size)
    // delete retry with the SAME epoch also converges
    Retrieval.deleteFromBm25Store(spark, work, deadIds.toDF("doc_id"), epoch = 1L)
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0)
      == 40L - deadIds.size)
  }

  test("bm25 store compact: answers invariant, tombstones cleared, untouched bucket files byte-identical, deleted ids re-appendable") {
    import spark.implicits._
    val all = docs((1L to 40L).map(i => i -> s"w${i % 3} doc$i common"): _*)
    val dead = Seq(3L, 6L, 9L)
    val q = docs(900L -> "w1 w2 common")
    val work = java.nio.file.Files.createTempDirectory("bm25cp-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 16)
    Retrieval.deleteFromBm25Store(spark, work, dead.toDF("doc_id"), epoch = 1L)
    val before = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 40))
    // fingerprint a bucket that holds none of the deleted docs' postings
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    val affected = spark.read.parquet(s"$work/postings")
      .filter(col("doc_id").isin(dead: _*))
      .select(col("bucket").cast("long")).distinct().collect().map(_.getLong(0)).toSet
    val untouched = spark.read.parquet(s"$work/postings")
      .select(col("bucket").cast("long")).distinct().collect().map(_.getLong(0))
      .filterNot(affected).headOption
    def fingerprint(b: Long) = {
      val dir = new org.apache.hadoop.fs.Path(s"$work/postings/bucket=$b")
      fs.listStatus(dir).map(s => (s.getPath.toString, s.getLen, s.getModificationTime)).toSet
    }
    val fpBefore = untouched.map(fingerprint)
    val removed = Retrieval.compactBm25Store(spark, work)
    assert(removed > 0L)
    untouched.foreach(b => assert(fingerprint(b) == fpBefore.get,
      s"untouched bucket $b was rewritten"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$work/tombstones")))
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 40)) == before)
    assert(spark.read.parquet(s"$work/postings")
      .filter(col("doc_id").isin(dead: _*)).count() == 0L)
    // the contract qx109 gates end-to-end: formerly-deleted ids are new again
    Retrieval.appendBm25Store(all.filter(col("doc_id") === 3L),
      "text", "doc_id", work, epoch = 2L)
    val after = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 40))
    assert(after.exists(_._3 == 3L))
  }

  test("bm25 store compact crash path: leftover backup makes compact refuse; recover restores and the store still answers exactly") {
    import spark.implicits._
    val all = docs((1L to 30L).map(i => i -> s"w${i % 4} doc$i common"): _*)
    val q = docs(900L -> "w1 common")
    val work = java.nio.file.Files.createTempDirectory("bm25cr-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 8)
    Retrieval.deleteFromBm25Store(spark, work, Seq(5L, 10L).toDF("doc_id"), epoch = 1L)
    val want = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30))
    // simulate a crash mid-swap: move one bucket's pre-image into the backup
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    val someBucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/postings"))
      .map(_.getPath.getName).find(_.startsWith("bucket=")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/compact-bak"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$work/postings/$someBucket"),
      new org.apache.hadoop.fs.Path(s"$work/compact-bak/$someBucket")))
    val ex = intercept[java.io.IOException](Retrieval.compactBm25Store(spark, work))
    assert(ex.getMessage.contains("recoverBm25Compaction"))
    assert(Retrieval.recoverBm25Compaction(spark, work))
    assert(!Retrieval.recoverBm25Compaction(spark, work)) // idempotent no-op
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)) == want)
    // and the re-run compaction completes
    assert(Retrieval.compactBm25Store(spark, work) > 0L)
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)) == want)
  }

  test("bm25 store rebucket: answers invariant at the new bucket count; tombstones folded away") {
    import spark.implicits._
    val all = docs((1L to 40L).map(i => i -> s"alpha w${i % 6} doc$i common"): _*)
    val q = docs(900L -> "alpha w2 common", 901L -> "w5 common")
    val work = java.nio.file.Files.createTempDirectory("bm25rb-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 4)
    Retrieval.appendBm25Store(docs((41L to 50L).map(i =>
      i -> s"alpha doc$i w${i % 6}"): _*), "text", "doc_id", work, epoch = 1L)
    Retrieval.deleteFromBm25Store(spark, work, Seq(7L, 14L).toDF("doc_id"), epoch = 2L)
    val want = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 50))
    Retrieval.rebucketBm25Store(spark, work, newBuckets = 32)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    val bucketDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/postings"))
      .count(_.getPath.getName.startsWith("bucket="))
    assert(bucketDirs > 4, s"rebucket to 32 left only $bucketDirs bucket dirs")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$work/tombstones")))
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 50)) == want)
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 48L)
    // a stream-pinned store keeps its checkpoint identity across rebucket
    val m = new org.apache.hadoop.fs.Path(work, "_graft_stream_id")
    val out = fs.create(m, false)
    try out.write("ckR".getBytes("UTF-8")) finally out.close()
    Retrieval.rebucketBm25Store(spark, work, newBuckets = 8)
    assert(fs.exists(new org.apache.hadoop.fs.Path(work, "_graft_stream_id")),
      "rebucket dropped the stream marker")
    graft.streaming.StreamingBm25Ingest.processBatch(
      docs(60L -> "alpha extra common"), 5L, "text", "doc_id", work, "ckR")
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 49L)
  }

  test("bm25 store persisted df stays consistent with live postings through the whole lifecycle") {
    import spark.implicits._
    val all = docs((1L to 40L).map(i => i -> s"t${i % 7} t${i % 5} doc$i common"): _*)
    val work = java.nio.file.Files.createTempDirectory("bm25df-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 8)
    Retrieval.appendBm25Store(docs((41L to 48L).map(i =>
      i -> s"t${i % 7} doc$i fresh"): _*), "text", "doc_id", work, epoch = 1L)
    Retrieval.deleteFromBm25Store(spark, work,
      (1L to 48L by 5L).toDF("doc_id"), epoch = 2L)
    def dfTable = spark.read.parquet(s"$work/df")
      .groupBy("term").agg(org.apache.spark.sql.functions.sum("cnt").as("df"))
      .filter(col("df") > 0)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def recomputed = {
      val tomb = Retrieval.readBm25Tombstones(spark, work)
      spark.read.parquet(s"$work/postings")
        .join(org.apache.spark.sql.functions.broadcast(tomb), Seq("doc_id"), "left_anti")
        .groupBy("term").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    assert(dfTable == recomputed)
    Retrieval.compactBm25Store(spark, work)
    assert(dfTable == recomputed) // compaction must not change df
  }

  test("streaming BM25 ingest: batch retry is exactly-once, foreign checkpoints refused, manual-epoch stores refused at adoption") {
    import graft.streaming.StreamingBm25Ingest
    val base = docs((1L to 20L).map(i => i -> s"alpha doc$i common"): _*)
    val b1 = docs((21L to 25L).map(i => i -> s"beta doc$i alpha"): _*)
    val b2 = docs((26L to 30L).map(i => i -> s"gamma doc$i common"): _*)
    val q = docs(900L -> "alpha common gamma")
    val work = java.nio.file.Files.createTempDirectory("bm25si-").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work, nBuckets = 8)
    // adoption must refuse a store carrying manual appends (epoch 1)
    val work2 = java.nio.file.Files.createTempDirectory("bm25si2-").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work2, nBuckets = 8)
    Retrieval.appendBm25Store(b1, "text", "doc_id", work2, epoch = 1L)
    val exAdopt = intercept[IllegalArgumentException](
      StreamingBm25Ingest.adopt(spark, work2, "ck"))
    assert(exAdopt.getMessage.contains("batch-appended"))
    // and an unmarked store can't be fed batches either (no adoption ran)
    val exBare = intercept[IllegalArgumentException](
      StreamingBm25Ingest.processBatch(b2, 0L, "text", "doc_id", work2, "ck"))
    assert(exBare.getMessage.contains("stream marker"))
    // the streamed store: two batches, batch 0 RETRIED (foreachBatch's
    // at-least-once) — the epoch overwrite must make the retry invisible
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    val m = new org.apache.hadoop.fs.Path(work, "_graft_stream_id")
    val out = fs.create(m, false)
    try out.write("ckA".getBytes("UTF-8")) finally out.close()
    StreamingBm25Ingest.processBatch(b1, 0L, "text", "doc_id", work, "ckA")
    StreamingBm25Ingest.processBatch(b1, 0L, "text", "doc_id", work, "ckA") // retry
    StreamingBm25Ingest.processBatch(b2, 1L, "text", "doc_id", work, "ckA")
    val got = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30))
    val oneShot = rows(Retrieval.bm25TopK(
      base.unionByName(b1).unionByName(b2), q, "text", "doc_id", 30))
    assert(got == oneShot)
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 30L)
    // a fresh checkpoint must be refused (its batch 0 would overwrite epoch 1)
    val exCk = intercept[IllegalArgumentException](
      StreamingBm25Ingest.processBatch(b2, 0L, "text", "doc_id", work, "ckB"))
    assert(exCk.getMessage.contains("ckA"))
  }

  test("Bm25StoreCtl drives the whole lifecycle: build, append, delete, compact, rebucket, recover, search, status") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("bm25ctl-").toString
    docs((1L to 30L).map(i => i -> s"alpha doc$i term${i % 4} common"): _*)
      .write.parquet(s"$work/corpus")
    docs((31L to 40L).map(i => i -> s"beta doc$i alpha"): _*)
      .write.parquet(s"$work/batch")
    Seq(4L, 8L).toDF("doc_id").write.parquet(s"$work/dead")
    docs(900L -> "alpha term1 common").write.parquet(s"$work/q")
    def ctl(a: String*): Unit = Bm25StoreCtl.run(spark, a.toArray)
    ctl("build", s"$work/corpus", "text", "doc_id", "8", s"$work/store")
    ctl("append", s"$work/batch", "text", "doc_id", "1", s"$work/store")
    ctl("delete", s"$work/dead", "2", s"$work/store")
    ctl("compact", s"$work/store")
    ctl("rebucket", s"$work/store", "16")
    ctl("recover", s"$work/store") // no-op on a healthy store
    ctl("status", s"$work/store")
    ctl("search", s"$work/q", "text", "doc_id", "25", "6",
      s"$work/store", s"$work/out")
    val got = rows(spark.read.parquet(s"$work/out"))
    val want = rows(Retrieval.bm25TopK(
      docs(((1L to 30L) ++ (31L to 40L)).filterNot(Set(4L, 8L)).map(i =>
        if (i <= 30L) i -> s"alpha doc$i term${i % 4} common"
        else i -> s"beta doc$i alpha"): _*),
      docs(900L -> "alpha term1 common"), "text", "doc_id", 25,
      maxQueryTerms = 6))
    assert(got == want && got.nonEmpty)
  }

  test("delete epochs live in negative space: a later append reusing the number cannot clobber the delete's deltas") {
    import spark.implicits._
    // the hazard: delete at epoch 2, then a stream/append batch lands at
    // epoch 2 — with shared epoch space its dynamic overwrite would
    // REPLACE the delete's scalar/df delta rows, silently resurrecting
    // the deleted docs' mass in every idf/avgdl
    val base = docs((1L to 20L).map(i => i -> s"alpha doc$i common"): _*)
    val late = docs((21L to 26L).map(i => i -> s"beta doc$i alpha"): _*)
    val q = docs(900L -> "alpha common beta")
    val work = java.nio.file.Files.createTempDirectory("bm25neg-").toString
    Retrieval.writeBm25Store(base, "text", "doc_id", work, nBuckets = 8)
    Retrieval.deleteFromBm25Store(spark, work, Seq(3L, 7L).toDF("doc_id"), epoch = 2L)
    Retrieval.appendBm25Store(late, "text", "doc_id", work, epoch = 2L) // same number
    val st = Retrieval.liveStats(spark, work).collect().head
    assert(st.getLong(0) == 20L - 2L + 6L,
      s"append at a reused epoch number clobbered the delete: n_docs=${st.getLong(0)}")
    val got = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30))
    val want = rows(Retrieval.bm25TopK(
      base.filter(!col("doc_id").isin(3L, 7L)).unionByName(late),
      q, "text", "doc_id", 30))
    assert(got == want && !got.exists(r => Set(3L, 7L)(r._3)))
  }

  test("delete crash window: deltas-written/tombstones-missing survives an interleaved compact and heals on retry") {
    import spark.implicits._
    // tombstones are the delete's COMMIT POINT (written last). The
    // poison sequence under the old tombstones-first order: crash
    // mid-delete, a scheduler runs compact (which would physically purge
    // the tombstoned postings and clear the tombstones), and the retry
    // finds nothing left to delete — stats overstated forever. With
    // tombstones-last the compact is a NO-OP in the crash window and the
    // retry fully converges.
    val all = docs((1L to 30L).map(i => i -> s"alpha doc$i term${i % 4} common"): _*)
    val dead = Seq(4L, 8L, 12L)
    val q = docs(900L -> "alpha term0 common")
    val work = java.nio.file.Files.createTempDirectory("bm25cw-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 8)
    // construct the exact crash state: run the full delete, then remove
    // the tombstones — identical to dying between the delta writes and
    // the tombstone commit
    Retrieval.deleteFromBm25Store(spark, work, dead.toDF("doc_id"), epoch = 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$work/tombstones"), true))
    // interleaved maintenance must not destroy convergence
    assert(Retrieval.compactBm25Store(spark, work) == 0L)
    assert(spark.read.parquet(s"$work/postings")
      .filter(col("doc_id").isin(dead: _*)).count() > 0,
      "compact in the crash window must not purge the un-tombstoned docs")
    // the documented heal: re-run the SAME delete
    assert(Retrieval.deleteFromBm25Store(spark, work,
      dead.toDF("doc_id"), epoch = 1L) == dead.size)
    val want = rows(Retrieval.bm25TopK(
      all.filter(!col("doc_id").isin(dead: _*)), q, "text", "doc_id", 30))
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)) == want)
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 27L)
    // and the post-heal compact now really purges
    assert(Retrieval.compactBm25Store(spark, work) > 0L)
    assert(rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 30)) == want)
  }

  test("phraseTopKFromStore: exact adjacency semantics on a hand-checked fixture; positions survive the whole lifecycle") {
    import spark.implicits._
    val all = docs(
      1L -> "red fox red fox den",   // "red fox" at 1 and 3 → count 2
      2L -> "fox red fox",           // "red fox" at 2 → count 1
      3L -> "red den fox",           // both terms, never adjacent → no match
      4L -> "fox red",               // reversed order → no match
      5L -> "red red red")           // "red red" overlaps at 1,2 → count 2
    val work = java.nio.file.Files.createTempDirectory("bm25ph-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 4)
    def phrase(q: String, k: Int = 10) =
      Retrieval.phraseTopKFromStore(spark, work,
        docs(900L -> q), "text", "doc_id", k)
        .orderBy("rank").collect()
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(phrase("red fox") == Seq(1L -> 2L, 2L -> 1L),
      "ordered adjacency: count per doc, rank by count desc")
    assert(phrase("fox red") == Seq(1L -> 1L, 2L -> 1L, 4L -> 1L),
      "phrase order matters: the reversed bigram matches a different doc set " +
        "(doc 1 contains 'fox red' once inside 'red fox red fox den')")
    assert(phrase("red red") == Seq(5L -> 2L),
      "repeated-term phrase counts overlapping occurrences")
    assert(phrase("den red") == Seq.empty,
      "terms never adjacent in that order match nothing")
    // maxPhraseTerms caps the phrase: 'red fox den' capped at 2 == 'red fox'
    assert(Retrieval.phraseTopKFromStore(spark, work,
        docs(900L -> "red fox den"), "text", "doc_id", 10, maxPhraseTerms = 2)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
      == Seq(1L -> 2L, 2L -> 1L))
    // positions survive append + delete + compact + rebucket: the phrase
    // answer over the maintained store equals a fresh build's
    Retrieval.appendBm25Store(docs(6L -> "red fox tail"), "text", "doc_id",
      work, epoch = 1L)
    Retrieval.deleteFromBm25Store(spark, work, Seq(2L).toDF("doc_id"), epoch = 2L)
    Retrieval.compactBm25Store(spark, work)
    Retrieval.rebucketBm25Store(spark, work, newBuckets = 8)
    val fresh = java.nio.file.Files.createTempDirectory("bm25ph2-").toString
    Retrieval.writeBm25Store(
      all.filter(col("doc_id") =!= 2L).unionByName(docs(6L -> "red fox tail")),
      "text", "doc_id", fresh, nBuckets = 8)
    val after = phrase("red fox")
    assert(after == Seq(1L -> 2L, 6L -> 1L))
    assert(after == Retrieval.phraseTopKFromStore(spark, fresh,
        docs(900L -> "red fox"), "text", "doc_id", 10)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq,
      "maintained store's phrase answers must equal a fresh rebuild's")
  }

  test("proximityTopKFromStore: windowed any-order semantics on a hand-checked fixture") {
    val all = docs(
      1L -> "red fox den",          // red@1, den@3 — inside window 3
      2L -> "red red den",          // anchors red@1 AND red@2 both qualify
      3L -> "red fox fox fox den",  // red@1, den@5 — needs window 5
      4L -> "den box red")          // den@1, red@3 — order-free match
    val work = java.nio.file.Files.createTempDirectory("bm25px-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 4)
    def prox(q: String, w: Int) =
      Retrieval.proximityTopKFromStore(spark, work,
        docs(900L -> q), "text", "doc_id", 10, w)
        .orderBy("rank").collect()
        .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(prox("red den", 3) == Seq(2L -> 2L, 1L -> 1L, 4L -> 1L),
      "window 3: doc 2 scores one occurrence per qualifying anchor " +
        "(a term twice inside one window still counts once); doc 3's " +
        "span is 5 and must not match")
    assert(prox("red den", 5) == Seq(2L -> 2L, 1L -> 1L, 3L -> 1L, 4L -> 1L),
      "widening the window admits the span-5 doc")
    assert(prox("den red", 3) == prox("red den", 3),
      "proximity is order-free — reversed query terms give identical answers")
    assert(prox("red", 1) == Seq(2L -> 2L, 1L -> 1L, 3L -> 1L, 4L -> 1L),
      "a single-term query's proximity count is its term frequency")
    assert(prox("den wolf", 3) == Seq.empty,
      "a term absent from the corpus can never complete a window")
    // the allow-list fence is pure candidate pruning (no corpus-global
    // statistics in a count), so filtered serving must equal a store
    // holding only the allowed docs — for proximity AND phrase
    import spark.implicits._
    val fenced = java.nio.file.Files.createTempDirectory("bm25pxf-").toString
    Retrieval.writeBm25Store(all.filter(col("doc_id").isin(2L, 3L, 4L)),
      "text", "doc_id", fenced, nBuckets = 4)
    val allow = Seq(2L, 3L, 4L).toDF("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(rows(Retrieval.proximityTopKFromStoreFiltered(spark, work,
        docs(900L -> "red den"), allow, "text", "doc_id", 10, 5)) ===
      rows(Retrieval.proximityTopKFromStore(spark, fenced,
        docs(900L -> "red den"), "text", "doc_id", 10, 5)),
      "filtered proximity diverged from an allowed-only store")
    val phF = rows(Retrieval.phraseTopKFromStoreFiltered(spark, work,
      docs(900L -> "red fox"), allow, "text", "doc_id", 10,
      maxPhraseTerms = 2))
    assert(phF === rows(Retrieval.phraseTopKFromStore(spark, fenced,
        docs(900L -> "red fox"), "text", "doc_id", 10, maxPhraseTerms = 2))
      && phF.nonEmpty,
      "filtered phrase diverged from an allowed-only store")
  }

  test("O(batch) text delete: identical store state to the scan-path delete; tombstoned ids skipped; retry converges") {
    import spark.implicits._
    val all = docs((1L to 40L).map(i => i -> s"t${i % 7} t${i % 5} doc$i common"): _*)
    val q = docs(900L -> "t1 t3 common", 901L -> "t6 common")
    val dead = Seq(5L, 10L, 15L, 20L)
    def buildStore(): String = {
      val w = java.nio.file.Files.createTempDirectory("bm25td-").toString
      Retrieval.writeBm25Store(all, "text", "doc_id", w, nBuckets = 8)
      w
    }
    def state(w: String) = (
      rows(Retrieval.bm25TopKFromStore(spark, w, q, "text", "doc_id", 40)),
      spark.read.parquet(s"$w/df")
        .groupBy("term").agg(sum("cnt").as("df")).filter(col("df") > 0)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet,
      Retrieval.liveStats(spark, w).collect().head.toSeq,
      Retrieval.readBm25Tombstones(spark, w)
        .collect().map(_.getLong(0)).toSet)
    // scan path on one store copy, text path on another — the stores
    // must end bit-equivalent in every observable: served ranking, live
    // df census, scalars, tombstone set
    val wScan = buildStore()
    assert(Retrieval.deleteFromBm25Store(spark, wScan,
      dead.toDF("doc_id"), epoch = 1L) == dead.size)
    val wText = buildStore()
    assert(Retrieval.deleteFromBm25Store(spark, wText,
      all.filter(col("doc_id").isin(dead: _*)), "text", "doc_id",
      epoch = 1L) == dead.size)
    assert(state(wScan) == state(wText),
      "text-path delete diverged from the scan-path delete")
    // retry with the same epoch converges (deterministic deltas replace)
    assert(Retrieval.deleteFromBm25Store(spark, wText,
      all.filter(col("doc_id").isin(dead: _*)), "text", "doc_id",
      epoch = 1L) == dead.size)
    assert(state(wScan) == state(wText), "text-path retry double-counted")
    // an id already tombstoned by an EARLIER epoch is skipped even when
    // its text is supplied again (no double decrement)
    assert(Retrieval.deleteFromBm25Store(spark, wText,
      all.filter(col("doc_id").isin(5L, 25L)), "text", "doc_id",
      epoch = 2L) == 1L)
    assert(Retrieval.deleteFromBm25Store(spark, wScan,
      Seq(5L, 25L).toDF("doc_id"), epoch = 2L) == 1L)
    assert(state(wScan) == state(wText))
  }

  test("store rebuild truncates stale epochs under a dynamic-overwrite session (GraftSession's default)") {
    import spark.implicits._
    // GraftSession.create sets partitionOverwriteMode=dynamic session-wide
    // (for FactStore upserts). A store REBUILD under that session must
    // still truncate all prior epochs: the replaceAll writes pin mode
    // static per-write — without the pin, the old epoch>=1 partitions
    // survive, liveStats sums stale deltas, and serving resurrects docs
    // the rebuild dropped.
    val key = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try {
      val a = docs((1L to 20L).map(i => i -> s"alpha doc$i common"): _*)
      val b = docs((21L to 30L).map(i => i -> s"beta doc$i common"): _*)
      val c = docs((31L to 40L).map(i => i -> s"gamma doc$i common"): _*)
      val q = docs(900L -> "alpha beta gamma common")
      val work = java.nio.file.Files.createTempDirectory("bm25dyn-").toString
      Retrieval.writeBm25Store(a, "text", "doc_id", work, nBuckets = 8)
      Retrieval.appendBm25Store(b, "text", "doc_id", work, epoch = 1L)
      Retrieval.deleteFromBm25Store(spark, work, Seq(3L).toDF("doc_id"), epoch = 2L)
      // rebuild at the same path with ONLY corpus c
      Retrieval.writeBm25Store(c, "text", "doc_id", work, nBuckets = 8)
      assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 10L,
        "stale epoch deltas survived the rebuild")
      val got = rows(Retrieval.bm25TopKFromStore(spark, work, q, "text", "doc_id", 50))
      val want = rows(Retrieval.bm25TopK(c, q, "text", "doc_id", 50))
      assert(got == want, "rebuilt store resurrects docs from the prior life")
      assert(got.nonEmpty)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("append/delete/rebucket refuse a store carrying a leftover compact backup") {
    import spark.implicits._
    val all = docs((1L to 20L).map(i => i -> s"w${i % 3} doc$i common"): _*)
    val work = java.nio.file.Files.createTempDirectory("bm25bak-").toString
    Retrieval.writeBm25Store(all, "text", "doc_id", work, nBuckets = 4)
    Retrieval.deleteFromBm25Store(spark, work, Seq(5L).toDF("doc_id"), epoch = 1L)
    // simulate the interrupted compaction: a bucket moved out into the backup
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    val someBucket = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/postings"))
      .map(_.getPath.getName).find(_.startsWith("bucket=")).get
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/compact-bak"))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$work/postings/$someBucket"),
      new org.apache.hadoop.fs.Path(s"$work/compact-bak/$someBucket")))
    // every mutator must refuse — an append would census a postings set
    // missing live buckets, a rebucket would fold it and LOSE those rows
    for ((name, op) <- Seq[(String, () => Any)](
        "append" -> (() => Retrieval.appendBm25Store(
          docs(90L -> "w1 fresh"), "text", "doc_id", work, epoch = 2L)),
        "delete" -> (() => Retrieval.deleteFromBm25Store(
          spark, work, Seq(6L).toDF("doc_id"), epoch = 3L)),
        "rebucket" -> (() => Retrieval.rebucketBm25Store(spark, work, 8)))) {
      val ex = intercept[java.io.IOException](op())
      assert(ex.getMessage.contains("recoverBm25Compaction"),
        s"$name did not direct to recoverBm25Compaction: ${ex.getMessage}")
    }
    // recovery reopens the road: the append then lands normally
    assert(Retrieval.recoverBm25Compaction(spark, work))
    Retrieval.appendBm25Store(docs(90L -> "w1 fresh"), "text", "doc_id", work, epoch = 2L)
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 20L)
  }

  test("store rebuild clears the prior life's stream marker and compact debris") {
    val a = docs((1L to 10L).map(i => i -> s"alpha doc$i"): _*)
    val work = java.nio.file.Files.createTempDirectory("bm25stale-").toString
    Retrieval.writeBm25Store(a, "text", "doc_id", work, nBuckets = 4)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(work),
      spark.sparkContext.hadoopConfiguration)
    // prior life: stream-pinned, and a compaction died mid-flight
    val m = new org.apache.hadoop.fs.Path(work, "_graft_stream_id")
    val out = fs.create(m, false)
    try out.write("ckDead".getBytes("UTF-8")) finally out.close()
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/compact-bak"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/compact-new"))
    Retrieval.writeBm25Store(a, "text", "doc_id", work, nBuckets = 4)
    assert(!fs.exists(m), "rebuild kept the dead stream's marker")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$work/compact-bak")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$work/compact-new")))
    // and the rebuilt store can adopt a FRESH stream (the stale marker
    // would have refused it with a misleading identity error)
    graft.streaming.StreamingBm25Ingest.adopt(spark, work, "ckFresh")
    graft.streaming.StreamingBm25Ingest.processBatch(
      docs(50L -> "alpha extra"), 0L, "text", "doc_id", work, "ckFresh")
    assert(Retrieval.liveStats(spark, work).collect().head.getLong(0) == 11L)
  }

  test("rrfFuse tie at equal rrf score breaks on doc_id") {
    import spark.implicits._
    val lex = Seq((9L, 20L, 1L), (9L, 21L, 1L)).toDF("query_id", "doc_id", "rank")
      .filter(col("doc_id") === 20L)  // lex: only doc 20 at rank 1
    val vec = Seq((9L, 21L, 1L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(lex, vec, 60, 10).orderBy("rank").collect()
    // both docs have rrf = 1/61 → tie → doc 20 first
    assert(got.map(_.getLong(2)).toSeq == Seq(20L, 21L))
  }

  test("attachSnippets: lexically-matched hits anchor at the first matched term, pure-vector hits get the leading window, retracted hits get null; ranking untouched") {
    import spark.implicits._
    val corpus = docs(
      1L -> "one two three cat five six seven",
      2L -> "zebra yak xylophone walrus vulture",
      3L -> "cat starts this doc right here")
    val work = java.nio.file.Files.createTempDirectory("bm25-attach").toString
    Retrieval.writeBm25Store(corpus, "text", "doc_id", work, 4,
      storeDocs = true)
    Retrieval.deleteFromBm25Store(spark, work, Seq(3L).toDF("doc_id"), 1L)
    // an external (e.g. hybrid-fused) ranking: doc 2 never matched "cat",
    // doc 3 is lexically retracted but still ranked by the vector leg
    val hits = Seq((100L, 1L, 1L), (100L, 2L, 2L), (100L, 3L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val q = docs(100L -> "cat")
    val got = Retrieval.attachSnippets(spark, work, hits, q,
        "text", "doc_id", window = 1)
      .orderBy("rank")
      .select("query_id", "doc_id", "rank", "snippet").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((100L, 1L, 1L), (100L, 2L, 2L), (100L, 3L, 3L)),
      "snippet attachment must not change the ranking")
    assert(got(0).getString(3) == "three cat five",
      "matched hit must anchor at its first matched term")
    assert(got(1).getString(3) == "zebra yak xylophone",
      "unmatched (pure-vector) hit must get the leading window")
    assert(got(2).isNullAt(3),
      "a lexically-retracted hit must get snippet=null, never stale text")
    // ...and the null survives compaction (the sidecar vacuum)
    Retrieval.compactBm25Store(spark, work)
    val got2 = Retrieval.attachSnippets(spark, work, hits, q,
      "text", "doc_id", window = 1).orderBy("rank").collect()
    assert(got2(2).isNullAt(got2(2).fieldIndex("snippet")),
      "compaction must not resurrect a retracted doc's snippet")
  }

  test("FIELDED BM25F store: one store == one-shot bm25fTopK and == the multi-store form, through build/append/delete/compact/rebucket; cross-guards fence both store families") {
    import spark.implicits._
    import graft.operators.Retrieval.{Bm25Field, Bm25fField, Bm25StoreField}
    // hand-made fielded corpus: short titles, longer bodies, some overlap
    def fdocs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "title", "body")
    val base = fdocs((1L to 16L).map(i =>
      (i, s"alpha title$i", s"body$i common words alpha beta gamma doc$i")): _*)
    val batch = fdocs((17L to 20L).map(i =>
      (i, s"beta title$i", s"fresh body$i alpha")): _*)
    val q = docs(900L -> "alpha beta common", 901L -> "gamma title3")
    val fields = Seq(Bm25fField("title", 2.5, 0.5), Bm25fField("body", 1.0, 0.75))
    val oneShotFields = Seq(Bm25Field("title", 2.5, 0.5), Bm25Field("body", 1.0, 0.75))
    def oneShot(corpus: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25fTopK(corpus, oneShotFields, "doc_id", q, "text", 30)
        .collect().map(_.toString).toSeq
    def served(path: String) =
      Retrieval.bm25fTopKFromStore(spark, path, fields, q, "text", "doc_id", 30)
        .collect().map(_.toString).toSeq
    val work = java.nio.file.Files.createTempDirectory("bm25f-one").toString
    val store = s"$work/store"
    Retrieval.writeBm25fStore(base, Seq("title", "body"), "doc_id", store, 4)
    assert(served(store) == oneShot(base), "build: served != one-shot")
    // append at batch cost; retry replaces
    Retrieval.appendBm25fStore(batch, "doc_id", store, epoch = 1L)
    Retrieval.appendBm25fStore(batch, "doc_id", store, epoch = 1L) // retry
    val union = base.unionByName(batch)
    assert(served(store) == oneShot(union), "append: served != one-shot")
    // == the multi-store composition (the same corpus via two stores)
    for ((f, p) <- Seq("title" -> s"$work/t", "body" -> s"$work/b"))
      Retrieval.writeBm25Store(union, f, "doc_id", p, 4)
    assert(Retrieval.bm25fTopKFromStores(spark,
        Seq(Bm25StoreField(s"$work/t", 2.5, 0.5), Bm25StoreField(s"$work/b", 1.0, 0.75)),
        q, "text", "doc_id", 30).collect().map(_.toString).toSeq
      == served(store), "one fielded store != N field stores")
    // delete: tombstones + per-field length roll-back; absent id no-op
    assert(Retrieval.deleteFromBm25fStore(spark, store,
      Seq(3L, 17L, 999L).toDF("doc_id"), epoch = 2L) == 2L)
    val live = union.filter(!col("doc_id").isin(3L, 17L))
    assert(served(store) == oneShot(live), "delete: served != one-shot")
    // re-delete is a no-op (prior-tombstone skip)
    assert(Retrieval.deleteFromBm25fStore(spark, store,
      Seq(3L).toDF("doc_id"), epoch = 3L) == 0L)
    // compaction is SHARED with the unfielded store and answer-invariant
    assert(Retrieval.compactBm25Store(spark, store) > 0L)
    assert(served(store) == oneShot(live), "compact: served changed")
    // rebucket at a new geometry, answers invariant
    Retrieval.rebucketBm25fStore(spark, store, newBuckets = 7)
    assert(served(store) == oneShot(live), "rebucket: served changed")
    // filtered serving == the multi-store filtered form (fence candidates,
    // stats corpus-global)
    val allow = live.filter(col("doc_id") % 2 === 0).select("doc_id")
    for ((f, p) <- Seq("title" -> s"$work/t2", "body" -> s"$work/b2"))
      Retrieval.writeBm25Store(live, f, "doc_id", p, 4)
    assert(Retrieval.bm25fTopKFromStoreFiltered(spark, store, fields, q, allow,
        "text", "doc_id", 30).collect().map(_.toString).toSeq
      == Retrieval.bm25fTopKFromStoresFiltered(spark,
        Seq(Bm25StoreField(s"$work/t2", 2.5, 0.5), Bm25StoreField(s"$work/b2", 1.0, 0.75)),
        q, allow, "text", "doc_id", 30).collect().map(_.toString).toSeq,
      "filtered fielded serving diverged between the two store forms")

    // cross-guards: the two store families refuse each other's writers
    // and servers loudly
    val exA = intercept[IllegalArgumentException](
      Retrieval.appendBm25Store(docs(50L -> "x"), "text", "doc_id", store, 9L))
    assert(exA.getMessage.contains("FIELDED"))
    val exD = intercept[IllegalArgumentException](
      Retrieval.deleteFromBm25Store(spark, store, Seq(1L).toDF("doc_id"), 9L))
    assert(exD.getMessage.contains("FIELDED"))
    val exS = intercept[IllegalArgumentException](
      Retrieval.bm25TopKFromStore(spark, store, q, "text", "doc_id", 5))
    assert(exS.getMessage.contains("FIELDED"))
    val exP = intercept[IllegalArgumentException](
      Retrieval.phraseTopKFromStore(spark, store, q, "text", "doc_id", 5))
    assert(exP.getMessage.contains("FIELDED"))
    val exR = intercept[IllegalArgumentException](
      Retrieval.rebucketBm25Store(spark, store, 8))
    assert(exR.getMessage.contains("FIELDED"))
    val plain = s"$work/plain"
    Retrieval.writeBm25Store(docs(1L -> "alpha"), "text", "doc_id", plain, 2)
    val exFA = intercept[IllegalArgumentException](
      Retrieval.appendBm25fStore(batch, "doc_id", plain, 1L))
    assert(exFA.getMessage.contains("writeBm25fStore"))
    val exFS = intercept[IllegalArgumentException](
      Retrieval.bm25fTopKFromStore(spark, plain, fields, q, "text", "doc_id", 5))
    assert(exFS.getMessage.contains("writeBm25fStore"))
    val exFF = intercept[IllegalArgumentException](
      Retrieval.bm25fTopKFromStore(spark, store,
        Seq(Bm25fField("nope", 1.0)), q, "text", "doc_id", 5))
    assert(exFF.getMessage.contains("stored fields"))
  }

  test("schema migration guards: pre-signature and pre-positional stores refuse mutations and fail serving actionably, never silently") {
    import spark.implicits._
    val corpus = docs((1L to 10L).map(i => i -> s"alpha doc$i common"): _*)
    val work = java.nio.file.Files.createTempDirectory("bm25-migr").toString
    val q = docs(900L -> "alpha")
    val batch = docs(11L -> "alpha fresh")

    // Forge a PRE-SIGNATURE store: current build, epochs table rewritten
    // without id_hash_delta (what a round-9 store looks like on disk)
    val preSig = s"$work/presig"
    Retrieval.writeBm25Store(corpus, "text", "doc_id", preSig, 4)
    val ep = spark.read.parquet(s"$preSig/epochs")
      .drop("id_hash_delta").localCheckpoint()
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(preSig),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$preSig/epochs"), true)
    ep.coalesce(1).write.partitionBy("epoch").parquet(s"$preSig/epochs")
    // mutations refuse: an append would land signed epochs beside
    // unsigned ones and the bit_xor fold would silently skip the old
    // rows' null hashes (false doc-set signature either direction)
    val exA = intercept[IllegalArgumentException](
      Retrieval.appendBm25Store(batch, "text", "doc_id", preSig, epoch = 1L))
    assert(exA.getMessage.contains("id_hash_delta") &&
      exA.getMessage.contains("writeBm25Store"))
    val exD = intercept[IllegalArgumentException](
      Retrieval.deleteFromBm25Store(spark, preSig,
        Seq(3L).toDF("doc_id"), epoch = 1L))
    assert(exD.getMessage.contains("id_hash_delta"))
    // serving (and rebucket, which reads the fold itself) fails with the
    // same actionable message, not a raw AnalysisException
    val exS = intercept[IllegalArgumentException](
      Retrieval.bm25TopKFromStore(spark, preSig, q, "text", "doc_id", 5))
    assert(exS.getMessage.contains("id_hash_delta"))
    val exR = intercept[IllegalArgumentException](
      Retrieval.rebucketBm25Store(spark, preSig, 8))
    assert(exR.getMessage.contains("id_hash_delta"))
    // the migration: rebuild in place, everything works again
    Retrieval.writeBm25Store(corpus, "text", "doc_id", preSig, 4)
    Retrieval.appendBm25Store(batch, "text", "doc_id", preSig, epoch = 1L)
    assert(Retrieval.bm25TopKFromStore(spark, preSig, q, "text", "doc_id", 20)
      .count() == 11L)

    // Forge a PRE-POSITIONAL store: postings rewritten without pos.
    // An append of positional rows would pass phraseImpl's schema check
    // (one footer wins) while old rows read pos=null — explode(null)
    // emits nothing and pre-positional docs silently vanish from
    // phrase/proximity/snippet. The append must refuse instead.
    val prePos = s"$work/prepos"
    Retrieval.writeBm25Store(corpus, "text", "doc_id", prePos, 4)
    val post = spark.read.parquet(s"$prePos/postings")
      .drop("pos").localCheckpoint()
    fs.delete(new org.apache.hadoop.fs.Path(s"$prePos/postings"), true)
    post.write.partitionBy("bucket", "epoch").parquet(s"$prePos/postings")
    val exP = intercept[IllegalArgumentException](
      Retrieval.appendBm25Store(batch, "text", "doc_id", prePos, epoch = 1L))
    assert(exP.getMessage.contains("pos") &&
      exP.getMessage.contains("writeBm25Store"))
    // non-positional serving still works on the old store
    assert(Retrieval.bm25TopKFromStore(spark, prePos, q, "text", "doc_id", 20)
      .count() == 10L)
  }

  test("fsFileListing tracks stores under dot/underscore ANCESTOR dirs (hidden is judged relative to the tracked root)") {
    import spark.implicits._
    // a store deployed under /…/_warehouse/.cache/… — every ancestor
    // segment would have tripped the old absolute-path hidden() check and
    // silently emptied the tracked listing, turning the serve bracket's
    // subset test into a vacuous pass (round-14 ADVICE fix)
    val base = java.nio.file.Files.createTempDirectory("lst-")
    val store = s"$base/_warehouse/.cache/s"
    Retrieval.writeBm25Store(
      (1L to 8L).map(i => i -> s"w$i common").toDF("doc_id", "text"),
      "text", "doc_id", store, 2)
    val listing = Retrieval.fsFileListing(spark, Retrieval.physicalPaths(store))
    assert(listing.nonEmpty,
      "tracked listing must see files under hidden-named ancestors")
    assert(listing.exists(_.contains("/postings/")),
      "postings files must be tracked")
    // in-store hidden entries (_SUCCESS, .crc) stay excluded: they are
    // invisible to every Spark read and churn during additive commits
    assert(!listing.exists(e => e.contains("_SUCCESS") || e.contains(".crc")),
      "in-store staging/marker files must remain untracked")
    // and a rewrite under the hidden-ancestor store IS now detected:
    // append a second epoch (additive — keeps the subset), then compact
    // (physical rewrite — must break it)
    Retrieval.appendBm25Store(
      (9L to 12L).map(i => i -> s"w$i common").toDF("doc_id", "text"),
      "text", "doc_id", store, epoch = 1L)
    Retrieval.deleteFromBm25Store(spark, store,
      Seq(3L, 9L).toDF("doc_id"), epoch = 2L)
    val preCompact = Retrieval.fsFileListing(spark, Retrieval.physicalPaths(store))
    assert(listing.subsetOf(preCompact),
      "additive append+delete commits must keep the pre-state a subset")
    Retrieval.compactBm25Store(spark, store)
    val after = Retrieval.fsFileListing(spark, Retrieval.physicalPaths(store))
    assert(!preCompact.subsetOf(after),
      "a compaction must fail the subset check for hidden-ancestor stores")
  }
}
