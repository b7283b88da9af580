package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.functions.{Dialect, TextExprs => TX}
import graft.operators.{Retrieval, Similarity}

/** Round-8 retrieval batch: BM25 lexical search and hybrid (lexical +
  * vector) reciprocal-rank fusion — the retrieval half of a RAG /
  * training-data stack over the curated corpus. Query workloads are
  * deterministic corpus slices (doc_id residues) so both engines derive
  * the identical workload from the shared parquet; all ranking arithmetic
  * follows the repo's decimal-exact, order-independent discipline. */
object RetrievalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Query docs: doc_id ≡ BM25_QREM (mod BM25_QMOD) — 3 queries at the
    * 500-doc SFs, 24 at sf0.1. Queries use their first MAX_QTERMS tokens
    * (realistic short keyword queries; also bounds the candidate set —
    * the 31-word synthetic vocabulary makes every term a stopword, the
    * worst case for postings pruning). */
  private val BM25_QMOD = 211
  private val BM25_QREM = 5
  private val MAX_QTERMS = 6
  private val BM25_K = 10
  /** Hybrid corpus: documents ⋈ embeddings on doc_id = vec_id (ids are
    * aligned by the generator; sf0.1 has vectors for the first 2000 docs
    * only, so the hybrid corpus is the intersection). */
  private val RRF_QMOD = 241
  private val RRF_QREM = 11
  private val RRF_DEPTH = 20
  private val RRF_TOPK = 10
  /** qx107 store-served hybrid: the vector store's quantizer geometry
    * (same family as the qx67–qx83 stores: first-8 centroid seeds,
    * 64-dim / 4-block PQ, 2 probed cells). The refine depth is set PAST
    * any probed candidate count, so the served shortlist is ALL probed
    * candidates and the exact rescore makes the vector ranks the PLAIN
    * probed-exact-kNN formula — ADC ordering (gated by qx70/qx83) drops
    * out of this oracle, which is what lets the fusion oracle stay a
    * closed-form derivation. */
  private val HY_CENTROIDS = 8
  private val HY_CODES = 4
  private val HY_DIMS = 64
  private val HY_BLOCKS = 4
  private val HY_NPROBE = 2
  private val HY_RERANK = 1000000
  /** qx105 store lifecycle: base corpus → build, doc_id ≡ 3 (mod 7)
    * slice → append, then serve. The oracle prices only the search
    * formula over the UNION corpus — the build/append harness cost
    * lands in the bench construct phase like the ANN store queries. */
  private val STORE_APPEND_MOD = 7
  private val STORE_APPEND_REM = 3
  private val STORE_BUCKETS = 16
  /** qx108/qx109 delete lifecycle: retract doc_id ≡ 6 (mod 11) from the
    * built store. qx109 additionally compacts and then RE-APPENDS the
    * deleted docs with doc_id ≡ 0 (mod 3) — legal precisely because
    * compaction physically removed them and cleared their tombstones,
    * which is the contract the oracle proves. */
  private val STORE_DEL_MOD = 11
  private val STORE_DEL_REM = 6
  private val STORE_READD_MOD = 3
  private val STORE_READD_REM = 0
  /** qx104: curation → retrieval composition. Decontamination runs at
    * qx89's regime (4-gram shingles, ≥1 shared with the held-out
    * benchmark slice — non-empty at every SF); the quality gate is the
    * qx57 Gopher rule pack at its committed thresholds. */
  /** qx115 phrase length: the query's first 2 tokens as an ordered
    * bigram. On the 31-word synthetic vocabulary a bigram hits ~10% of
    * docs (guaranteed non-empty at every SF) while a trigram would hit
    * ~1-2 docs total at sf0.001 — too sparse to gate. */
  private val PHRASE_TERMS = 2
  /** qx117 proximity dials: the query's first 3 distinct terms must all
    * land inside a 12-position window (any order). On the 31-word
    * synthetic vocabulary three common terms co-occur within 12 tokens
    * often enough to gate at every SF while staying far from "matches
    * everything". */
  private val PROX_TERMS = 3
  private val PROX_WINDOW = 12
  /** qx118 BM25F: fielded scoring over a derived title (the doc's first
    * BM25F_TITLE_TOKENS tokens) and body (the rest) — title weighted
    * 2.5× with a flatter length slope, the classic fielded setup. The
    * split is token-deterministic so both engines derive identical
    * fields from the shared parquet. */
  private val BM25F_TITLE_TOKENS = 5
  private val BM25F_TITLE_W = 2.5
  private val BM25F_TITLE_B = 0.5
  private val BM25F_BODY_W = 1.0
  private val BM25F_BODY_B = 0.75

  /** qx121 snippet half-width: each hit returns the (2w+1)-token window
    * starting at max(1, anchor − w), anchor = first matched-term
    * position. */
  private val SNIPPET_WINDOW = 4

  private val V5_BENCH_MOD = 29
  private val V5_BENCH_REM = 3
  private val V5_SHINGLE_N = 4
  private val V5_MIN_SHARED = 1L
  private val V5_BLOOM_BITS = 1 << 17

  // ---- Store-chain steps (round 13) --------------------------------------
  // Every durable-store construction below is expressed as a StoreMemo
  // chain: the store is built ONCE per (JVM, dataset, chain prefix) and
  // shared across bench reps and across queries whose chains are
  // signature-identical — the production shape (stores are durable
  // artifacts) and the round-12 review's prescription. Signatures encode
  // every content-determining parameter; the stores live at fixed
  // relative paths inside the chain's work dir ("store", "lex", "vec",
  // "title", "body") so prefix-sharing chains agree on layout.

  /** Canonical corpus slice names used in chain signatures. */
  private def bm25Build(sliceSig: String, slice: => org.apache.spark.sql.DataFrame,
                        storeDocs: Boolean = false, at: String = "store",
                        textCol: String = "text") =
    StoreMemo.step(
      s"bm25.build|$sliceSig|t=$textCol|b=$STORE_BUCKETS|docs=$storeDocs|at=$at")(w =>
      Retrieval.writeBm25Store(slice, textCol, "doc_id", s"$w/$at",
        STORE_BUCKETS, storeDocs = storeDocs))

  private def bm25Append(sliceSig: String, slice: => org.apache.spark.sql.DataFrame,
                         epoch: Long, at: String = "store",
                         textCol: String = "text") =
    StoreMemo.step(s"bm25.append|$sliceSig|t=$textCol|e=$epoch|at=$at")(w =>
      Retrieval.appendBm25Store(slice, textCol, "doc_id", s"$w/$at", epoch))

  private def bm25Delete(s: SparkSession, sliceSig: String,
                         ids: => org.apache.spark.sql.DataFrame,
                         epoch: Long, at: String = "store") =
    StoreMemo.step(s"bm25.delete|$sliceSig|e=$epoch|at=$at")(w =>
      Retrieval.deleteFromBm25Store(s, s"$w/$at", ids, epoch))

  private def bm25Compact(s: SparkSession, at: String = "store") =
    StoreMemo.step(s"bm25.compact|at=$at")(w =>
      { Retrieval.compactBm25Store(s, s"$w/$at"); () })

  val queries: Map[String, Q] = Map(

    // ---- BM25 top-k lexical retrieval -----------------------------------
    // (inverted-index cost shape: ONE corpus shuffle builds the postings
    //  census; df/avgdl/N and the query terms broadcast; candidates come
    //  from a broadcast join against the postings, never a corpus
    //  re-shuffle. Decimal-exact per-doc sums make the ranking
    //  order-independent; ties break on doc_id.)
    "qx100_bm25_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      Retrieval.bm25TopK(
          docs.filter(col("doc_id") % BM25_QMOD =!= BM25_QREM),
          t(s, dir, "documents").filter(col("doc_id") % BM25_QMOD === BM25_QREM),
          "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // ---- BM25F fielded retrieval ----------------------------------------
    // (per-field soft length normalization BEFORE one shared saturation —
    //  NOT a weighted sum of per-field BM25 scores. One zero-exchange
    //  census per field, one (doc, term) merge exchange, broadcast
    //  stats/query joins.)
    "qx118_bm25f" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = Dialect(spark = true)
      val docs = t(s, dir, "documents")
      val toks = TX.tokensAuto("text")(d)
      val fielded = docs.select(col("doc_id"),
        expr(d.ajoin(d.slice(toks, "1", BM25F_TITLE_TOKENS), "' '")).as("title"),
        expr(d.ajoin(d.slice(toks, (BM25F_TITLE_TOKENS + 1).toString, 1000000),
          "' '")).as("body"))
      Retrieval.bm25fTopK(
          fielded.filter(col("doc_id") % BM25_QMOD =!= BM25_QREM),
          Seq(Retrieval.Bm25Field("title", BM25F_TITLE_W, BM25F_TITLE_B),
            Retrieval.Bm25Field("body", BM25F_BODY_W, BM25F_BODY_B)),
          "doc_id",
          docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM), "text",
          BM25_K, maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // Fielded retrieval SERVED from durable stores: one store per field
    // (built on the base slice, appended with the qx105 slice — the
    // ordinary lifecycle, exercised per field), merged and scored at
    // serve time. The stores are invisible to correctness by
    // construction — the oracle is qx118's one-shot formula over the
    // union corpus, verbatim.
    "qx119_bm25f_store" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = Dialect(spark = true)
      val docs = t(s, dir, "documents")
      val toks = TX.tokensAuto("text")(d)
      val fielded = docs.select(col("doc_id"),
        expr(d.ajoin(d.slice(toks, "1", BM25F_TITLE_TOKENS), "' '")).as("title"),
        expr(d.ajoin(d.slice(toks, (BM25F_TITLE_TOKENS + 1).toString, 1000000),
          "' '")).as("body"))
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      // one chain per field store (title/body split at BM25F_TITLE_TOKENS)
      val Seq(wt, wb) = Seq("title", "body").map { f =>
        StoreMemo.materialize(dir, Seq(
          bm25Build(s"fielded($f,$BM25F_TITLE_TOKENS)!q&!a",
            fielded.filter(notQuery && !isAppend), textCol = f),
          bm25Append(s"fielded($f,$BM25F_TITLE_TOKENS)!q&a",
            fielded.filter(notQuery && isAppend), 1L, textCol = f)))
      }
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25fTopKFromStores(s,
            Seq(Retrieval.Bm25StoreField(s"$wt/store", BM25F_TITLE_W, BM25F_TITLE_B),
              Retrieval.Bm25StoreField(s"$wb/store", BM25F_BODY_W, BM25F_BODY_B)),
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM), "text",
            "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // Fielded retrieval from ONE fielded store (round 11): the same
    // build+append lifecycle and the same oracle as qx119, but the
    // postings carry a field column instead of living in N stores — one
    // pruned scan serves every field, one universe by construction (no
    // field-complete gate to trip), and the serving tail is the
    // single-store constant instead of N× (qx119 was the suite's
    // largest measured serving tail for exactly that reason).
    "qx123_bm25f_one_store" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = Dialect(spark = true)
      val docs = t(s, dir, "documents")
      val toks = TX.tokensAuto("text")(d)
      val fielded = docs.select(col("doc_id"),
        expr(d.ajoin(d.slice(toks, "1", BM25F_TITLE_TOKENS), "' '")).as("title"),
        expr(d.ajoin(d.slice(toks, (BM25F_TITLE_TOKENS + 1).toString, 1000000),
          "' '")).as("body"))
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      val work = StoreMemo.materialize(dir, Seq(
        StoreMemo.step(s"bm25f.build|fielded(title+body,$BM25F_TITLE_TOKENS)" +
          s"!q&!a|b=$STORE_BUCKETS")(w =>
          Retrieval.writeBm25fStore(fielded.filter(notQuery && !isAppend),
            Seq("title", "body"), "doc_id", s"$w/store", STORE_BUCKETS)),
        StoreMemo.step(s"bm25f.append|fielded(title+body," +
          s"$BM25F_TITLE_TOKENS)!q&a|e=1")(w =>
          Retrieval.appendBm25fStore(fielded.filter(notQuery && isAppend),
            "doc_id", s"$w/store", epoch = 1L))))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25fTopKFromStore(s, s"$work/store",
            Seq(Retrieval.Bm25fField("title", BM25F_TITLE_W, BM25F_TITLE_B),
              Retrieval.Bm25fField("body", BM25F_BODY_W, BM25F_BODY_B)),
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM), "text",
            "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // Filtered FIELDED serving: the ACL fence composed with per-field
    // stores — candidates fenced BEFORE ranking (top-k = k survivors),
    // df/n_docs/avgdl corpus-global (the qx111/qx114 semantics, now on
    // the fielded path). Build-only stores: qx119 already exercises the
    // per-field lifecycle; this query isolates the filter composition.
    "qx120_bm25f_filtered" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      val d = Dialect(spark = true)
      val docs = t(s, dir, "documents")
      val toks = TX.tokensAuto("text")(d)
      val fielded = docs.select(col("doc_id"),
        expr(d.ajoin(d.slice(toks, "1", BM25F_TITLE_TOKENS), "' '")).as("title"),
        expr(d.ajoin(d.slice(toks, (BM25F_TITLE_TOKENS + 1).toString, 1000000),
          "' '")).as("body"))
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val Seq(wt, wb) = Seq("title", "body").map { f =>
        StoreMemo.materialize(dir, Seq(
          bm25Build(s"fielded($f,$BM25F_TITLE_TOKENS)!q",
            fielded.filter(notQuery), textCol = f)))
      }
      val allowed = docs.filter(notQuery && col("doc_id") % 3 === 1)
        .select("doc_id")
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25fTopKFromStoresFiltered(s,
            Seq(Retrieval.Bm25StoreField(s"$wt/store", BM25F_TITLE_W, BM25F_TITLE_B),
              Retrieval.Bm25StoreField(s"$wb/store", BM25F_BODY_W, BM25F_BODY_B)),
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM), allowed,
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // CONJUNCTIVE (boolean-AND) serving: only docs matching EVERY query
    // term rank — the other standard lexical query mode. First
    // CONJ_TERMS distinct query tokens (3, like proximity: all three
    // co-occur often enough on the synthetic vocabulary to gate at
    // every SF while staying a strict subset of the OR results).
    // Ordinary store lifecycle first; survivors keep their OR scores.
    "qx122_bm25_conjunctive" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      // qx105's chain verbatim — the conjunctive mode serves from the
      // same shared store
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isAppend)),
        bm25Append("docs!q&a", docs.filter(notQuery && isAppend), 1L)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStoreConjunctive(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxQueryTerms = PROX_TERMS)
          .orderBy("query_id", "rank"))
    }),

    // RAG serving returns the PASSAGE, not just the id: snippet mode
    // over the raw-text sidecar (the lexical twin of the vector store's
    // .vectors — round 10). The store runs build(storeDocs) → append
    // (sidecar maintained at batch epoch) first; anchors come from the
    // positional postings' first positions, texts from the sidecar
    // behind the ranked ids' literal dbucket filter — no lake pointer
    // anywhere in the serving call.
    "qx121_bm25_snippets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isAppend),
          storeDocs = true),
        bm25Append("docs!q&a", docs.filter(notQuery && isAppend), 1L)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.snippetTopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, window = SNIPPET_WINDOW,
            maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- Durable BM25 store: build → append → pruned serve --------------
    // (the lexical twin of the ANN store lifecycle: postings persisted in
    //  term-hash bucket partitions, a new doc batch appended at batch
    //  cost with the corpus scalars rolled forward by exact integer
    //  addition, then the search reads ONLY the query terms' buckets — a
    //  literal partition filter. The oracle is the plain BM25 formula
    //  over the union corpus: store mutations must be invisible.)
    "qx105_bm25_store" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      // chain shared verbatim with qx122 (same store, different query
      // mode) and as the prefix of qx108/qx115's delete lifecycles
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isAppend)),
        bm25Append("docs!q&a", docs.filter(notQuery && isAppend), 1L)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- BM25 store deletion: tombstoned retraction, scalars rolled back
    // (the lexical twin of qx74/qx82: build → append → DELETE a slice →
    //  serve. The delete writes a tombstone epoch, decrements the corpus
    //  scalars by exactly the retracted docs' lengths, and refreshes the
    //  persisted per-term df over the survivors — no bucket is rewritten.
    //  The oracle is the plain BM25 formula over the corpus WITHOUT the
    //  deleted docs: a hash match proves idf (via df AND n_docs), avgdl,
    //  and the candidate set all behave as if the store had been rebuilt
    //  without them.)
    "qx108_bm25_store_delete" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      val isDel = col("doc_id") % STORE_DEL_MOD === STORE_DEL_REM
      // derives from qx105's cached build+append prefix; is itself the
      // prefix of qx115's compacting positional lifecycle
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isAppend)),
        bm25Append("docs!q&a", docs.filter(notQuery && isAppend), 1L),
        bm25Delete(s, "docs!q&d", docs.filter(notQuery && isDel).select("doc_id"), 2L)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- BM25 store compaction + post-compaction re-append --------------
    // (closing the maintenance loop: after DELETE, COMPACT physically
    //  rewrites only the affected buckets and clears the tombstones; the
    //  formerly-deleted ids are thereby legal to append again, and a
    //  slice of them IS re-appended — the only way the oracle (which
    //  keeps that slice) can hash-match is if compaction really cleared
    //  the tombstones and the re-append really landed. Compaction itself
    //  must be invisible for everything else.)
    "qx109_bm25_store_compact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isDel = col("doc_id") % STORE_DEL_MOD === STORE_DEL_REM
      val isReadd = col("doc_id") % STORE_READD_MOD === STORE_READD_REM
      // derives from qx111/qx117's cached full-corpus build
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q", docs.filter(notQuery)),
        bm25Delete(s, "docs!q&d", docs.filter(notQuery && isDel).select("doc_id"), 1L),
        bm25Compact(s),
        bm25Append("docs!q&d&r", docs.filter(notQuery && isDel && isReadd), 2L)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- Filtered store serving: metadata-predicated lexical retrieval --
    // (the lexical twin of qx76's filtered ANN: an id allow-list — ACLs,
    //  source filters, freshness windows — fences the CANDIDATES before
    //  ranking, so the top-k are k survivors; idf/avgdl stay
    //  corpus-global, the standard filtered-retrieval semantics. The
    //  allow-list broadcasts; the store still serves bucket-pruned.)
    "qx111_bm25_filtered" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      // full-corpus build shared verbatim with qx117 and as qx109's prefix
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q", docs.filter(notQuery))))
      val allowed = docs.filter(notQuery && col("doc_id") % 3 === 1)
        .select("doc_id")
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStoreFiltered(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM), allowed,
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- Curation v5: decontaminate → quality-gate → BM25-serve ---------
    // (the retrieval layer riding the curated corpus: Bloom-decontaminate
    //  against the held-out benchmark slice at scan cost, drop the
    //  contaminated docs, keep only Gopher-rule passers, and serve BM25
    //  queries over what survives. Every stage bites at every SF; the
    //  oracle chains the qx89 contamination CTEs, the qx57 keep
    //  expression, and the qx100 scoring CTEs into one derivation.)
    "qx104_curate_serve" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val isQuery = col("doc_id") % BM25_QMOD === BM25_QREM
      val isBench = col("doc_id") % V5_BENCH_MOD === V5_BENCH_REM
      val corpus0 = t(s, dir, "documents").filter(!isQuery && !isBench)
      val bench = docs.filter(isBench)
      val contaminated = graft.operators.TextAnalysis.contaminationBloom(
          corpus0, bench, "text", "doc_id",
          V5_SHINGLE_N, V5_MIN_SHARED, V5_BLOOM_BITS)
        .select("doc_id").distinct()
      val clean = corpus0.join(contaminated, Seq("doc_id"), "left_anti")
      val keepIds = graft.operators.TextAnalysis.gopherRules(clean, "text", "doc_id",
          PipelineQueries.GOPHER_MIN_TOKENS, PipelineQueries.GOPHER_MAX_TOKENS,
          PipelineQueries.GOPHER_MIN_AVG_LEN, PipelineQueries.GOPHER_MAX_AVG_LEN,
          PipelineQueries.GOPHER_MAX_SYMBOL_RATIO, PipelineQueries.GOPHER_MIN_STOP_HITS)
        .filter(col("keep") === 1).select("doc_id")
      val kept = clean.join(keepIds, Seq("doc_id")).select("doc_id", "text")
      Retrieval.bm25TopK(kept, docs.filter(isQuery), "text", "doc_id",
          BM25_K, maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // ---- STORE-SERVED hybrid retrieval: the production RAG shape -------
    // (qx101 proves the fusion formula; THIS query proves the deployment
    //  composition a user actually runs: BOTH retrievers serve from their
    //  persisted stores — lexical from the bucket-partitioned BM25 store
    //  (literal bucket IN pruning, persisted df), vector from the
    //  self-contained IVF-PQ store (probed-cell pruning + exact-rescore
    //  refine) — and the two k-bounded top-lists fuse via RRF on
    //  planning-scale data. PlanAuditSpec pins that both serving scans
    //  are partition-pruned. The oracle derives both rankings in closed
    //  form: the qx100 BM25 CTEs for the lexical ranks, probed exact kNN
    //  for the vector ranks (the refine depth exceeds every candidate
    //  set, so rescore ≡ exact over the probed cells), and qx101's
    //  nano-unit RRF arithmetic.)
    "qx107_hybrid_store" -> ((s, dir) => {
      val p = hybridStoreParts(s, dir)
      // the SERVED twin (round 14): concurrent leg collects + exact
      // driver fusion — the deployment path /search runs, spec-pinned
      // row-identical to the single-plan fusion (ServingParitySpec)
      Retrieval.hybridTopKFromStoresServed(ServingSessions.serving(s),
          p.lexStore, p.vecStore,
          ServingSessions.rebind(ServingSessions.serving(s), p.queries),
          "text", "embedding", "doc_id", RRF_TOPK, RRF_DEPTH,
          HY_NPROBE, HY_RERANK, rescore = Some((p.corpusVecs, "embedding")),
          maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // ---- PHRASE query over the positional store -------------------------
    // (round 10: the postings persist per-term position arrays, so the
    //  store can answer the first query class tf-only postings cannot —
    //  exact consecutive-sequence match, ranked by occurrence count. The
    //  query runs the FULL maintenance lifecycle first (build → append →
    //  delete → compact), so a hash match also proves positions survive
    //  every lifecycle op: a compaction that lost or reordered an array
    //  would change phrase counts. Scoring reads never touch the arrays
    //  (column pruning); only this operator pays for them.)
    "qx115_bm25_phrase" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isAppend = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      val isDel = col("doc_id") % STORE_DEL_MOD === STORE_DEL_REM
      // extends qx108's cached build+append+delete chain by one compaction
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isAppend)),
        bm25Append("docs!q&a", docs.filter(notQuery && isAppend), 1L),
        bm25Delete(s, "docs!q&d", docs.filter(notQuery && isDel).select("doc_id"), 2L),
        bm25Compact(s)))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.phraseTopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxPhraseTerms = PHRASE_TERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- PROXIMITY query over the positional store ----------------------
    // (qx115's unordered sibling: the query's first PROX_TERMS distinct
    //  terms must all co-occur inside a PROX_WINDOW-position window, any
    //  order; one occurrence per qualifying anchor position. Served from
    //  the same bucket-pruned positional postings; the oracle is the same
    //  windowed count in DuckDB join arithmetic.)
    "qx117_bm25_proximity" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      // same full-corpus build as qx111 — one store serves both modes
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q", docs.filter(notQuery))))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.proximityTopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, PROX_WINDOW, maxQueryTerms = PROX_TERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- FILTERED hybrid from stores: ACL-scoped RAG --------------------
    // (qx107's deployment composition under an id allow-list — the
    //  production "only what this caller may see" serving shape. BOTH
    //  retrievers fence their candidates BEFORE ranking: the lexical side
    //  via the store's filtered serving (qx111's semantics), the vector
    //  side via the new filtered stored search — so each contributes
    //  depth-deep lists of ALLOWED survivors and a disallowed doc can
    //  neither make either list nor re-enter through the exact rescore.
    //  Scoring statistics stay corpus-global on both sides; both stores
    //  still serve partition-pruned (PlanAuditSpec pins it WITH the
    //  filter applied). The oracle is qx107's derivation with the same
    //  candidate fence on both sides — df/stats/avgdl CTEs untouched.)
    "qx114_hybrid_filtered" -> ((s, dir) => {
      val p = hybridStoreParts(s, dir)
      // served twin with the ACL fence (round 14): same candidate fencing
      // on both legs, fusion on the driver — parity-pinned
      Retrieval.hybridTopKFromStoresServed(ServingSessions.serving(s),
          p.lexStore, p.vecStore,
          ServingSessions.rebind(ServingSessions.serving(s), p.queries),
          "text", "embedding", "doc_id", RRF_TOPK, RRF_DEPTH,
          HY_NPROBE, HY_RERANK, rescore = Some((p.corpusVecs, "embedding")),
          allowed = Some(p.allowed), maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // ---- STREAMING BM25 ingest: the lexical ingest twin -----------------
    // (documents arrive as a FILE stream; each micro-batch appends at
    //  epoch batchId+1 — exactly-once lands for free on the store's
    //  epoch-addressed dynamic overwrites, the same idempotent-retry
    //  contract the batch API gates. The oracle is qx100's plain formula
    //  over the whole corpus: micro-batch boundaries must be invisible
    //  to the serving path.)
    "qx110_bm25_stream_ingest" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val notQuery = col("doc_id") % BM25_QMOD =!= BM25_QREM
      val isStream = col("doc_id") % STORE_APPEND_MOD === STORE_APPEND_REM
      // step 1 is qx105's build signature verbatim (the stream slice IS
      // the append slice) — the stream-replay harness derives from the
      // cached base store instead of rebuilding it
      val work = StoreMemo.materialize(dir, Seq(
        bm25Build("docs!q&!a", docs.filter(notQuery && !isStream)),
        StoreMemo.step("bm25.streamIngest|docs!q&a|files=4")(w => {
          val landing = s"$w/landing"
          docs.filter(notQuery && isStream).select("doc_id", "text")
            .repartition(4).write.parquet(landing)
          val q = graft.streaming.StreamingBm25Ingest.start(
            s.readStream.schema(s.read.parquet(landing).schema)
              .option("maxFilesPerTrigger", 1).parquet(landing),
            "text", "doc_id", s"$w/store", s"$w/ckpt")
          try q.processAllAvailable() finally q.stop()
        })))
      // exec under the SERVING session conf (round 14): AQE off,
      // 8 shuffle partitions, driver-side discovery - the deployment
      // serving shape; plans and results identical
      ServingSessions.rebind(ServingSessions.serving(s),
        Retrieval.bm25TopKFromStore(s, s"$work/store",
            docs.filter(col("doc_id") % BM25_QMOD === BM25_QREM),
            "text", "doc_id", BM25_K, maxQueryTerms = MAX_QTERMS)
          .orderBy("query_id", "rank"))
    }),

    // ---- FULLY-STREAMED hybrid retrieval: the RAG loop under ingestion -
    // (qx107's composition with BOTH stores fed by streams: documents
    //  micro-batch into the BM25 store via epoch-addressed appends, the
    //  corpus vectors micro-batch into a self-contained IVF-PQ store
    //  against its persisted quantizers, the stream-fed vector store is
    //  FLATTENED to the canonical cell layout (the documented
    //  ingesting→maintained hand-off), and the same hybridTopKFromStores
    //  serves the fused top-k. The oracle is qx107's VERBATIM: ingestion
    //  mechanics — batch boundaries, epoch bookkeeping, the flatten —
    //  must all be invisible to the served ranking.)
    "qx112_hybrid_stream" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      val isQuery = col("doc_id") % RRF_QMOD === RRF_QREM
      val corpusDocs = hybrid.filter(!isQuery).select("doc_id", "text")
      val corpusVecs = hybrid.filter(!isQuery).select("doc_id", "embedding")
      val cents = emb.filter(col("vec_id") < HY_CENTROIDS)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val codebook = emb.filter(col("vec_id") < HY_CODES)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
      // lexical: build on the even half, STREAM the odd half in
      val wl = StoreMemo.materialize(dir, Seq(
        bm25Build(s"hybrid!q($RRF_QMOD,$RRF_QREM)&even",
          corpusDocs.filter(col("doc_id") % 2 === 0), at = "lex"),
        StoreMemo.step(s"bm25.streamIngest|hybrid!q&odd|files=2|at=lex")(w => {
          corpusDocs.filter(col("doc_id") % 2 === 1)
            .repartition(2).write.parquet(s"$w/lexlanding")
          val ql = graft.streaming.StreamingBm25Ingest.start(
            s.readStream.schema(s.read.parquet(s"$w/lexlanding").schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$w/lexlanding"),
            "text", "doc_id", s"$w/lex", s"$w/lexckpt")
          try ql.processAllAvailable() finally ql.stop()
        })))
      // vector: quantizers persisted first, the WHOLE corpus streamed in,
      // then the hand-off to the maintained single-level layout
      val wv = StoreMemo.materialize(dir, Seq(
        StoreMemo.step(s"vec.streamSC|hybrid!q($RRF_QMOD,$RRF_QREM)|" +
          s"c=$HY_CENTROIDS|cb=$HY_CODES|d=$HY_DIMS|bl=$HY_BLOCKS|files=2")(w => {
          graft.operators.Quantize.saveQuantizers(s, s"$w/vec",
            cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
            graft.operators.Quantize.StoreParams(HY_DIMS, HY_BLOCKS,
              residual = false, "doc_id"))
          corpusVecs.repartition(2).write.parquet(s"$w/veclanding")
          val qv = graft.streaming.StreamingVectorIngest.startSelfContained(
            s.readStream.schema(s.read.parquet(s"$w/veclanding").schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$w/veclanding"),
            "embedding", s"$w/vec", s"$w/vecckpt")
          try qv.processAllAvailable() finally qv.stop()
          graft.operators.Quantize.flattenIngestedStore(s, s"$w/vec", "doc_id")
        })))
      // served twin (round 14): ingestion mechanics invisible AND served
      // through the deployment path — parity-pinned to the plan fusion
      Retrieval.hybridTopKFromStoresServed(ServingSessions.serving(s),
          s"$wl/lex", s"$wv/vec",
          ServingSessions.rebind(ServingSessions.serving(s),
            hybrid.filter(isQuery).select("doc_id", "text", "embedding")),
          "text", "embedding", "doc_id", RRF_TOPK, RRF_DEPTH,
          HY_NPROBE, HY_RERANK, rescore = Some((corpusVecs, "embedding")),
          maxQueryTerms = MAX_QTERMS)
        .orderBy("query_id", "rank")
    }),

    // ---- Hybrid retrieval: BM25 ∪ cosine kNN → reciprocal rank fusion --
    // (the production RAG shape: the lexical and vector top-20 lists are
    //  computed independently — each with its own scale path — and fused
    //  on planning-scale candidate lists; 1/(60+rank) contributions are
    //  9 dp-rounded decimals so the fused order is exact in both engines.)
    "qx101_hybrid_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      // persist the embedding-fenced base ONCE: four consumers below
      // (corpus/query × text/vector) would otherwise each rebuild the
      // docs⋈emb subtree inside their own broadcast-build job, and those
      // builds CHAIN — a build's task blocks awaiting its nested inner
      // broadcast, so the per-build walls stack instead of overlapping
      // (measured: 26 jobs, run≫cpu on every build). One materialization
      // + cached reads collapses the chain; at scale this is the working
      // set of the query, materialized once instead of joined four times.
      val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("embedding"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val isQuery = col("doc_id") % RRF_QMOD === RRF_QREM
      val corpusDocs = hybrid.filter(!isQuery).select("doc_id", "text")
      val queryDocs = hybrid.filter(isQuery).select("doc_id", "text")
      val corpusVecs = hybrid.filter(!isQuery).select("doc_id", "embedding")
      val queryVecs = hybrid.filter(isQuery).select("doc_id", "embedding")
      val lex = Retrieval.bm25TopK(corpusDocs, queryDocs, "text", "doc_id",
        RRF_DEPTH, maxQueryTerms = MAX_QTERMS)
      val vec = Similarity.bruteForceKnn(queryVecs, corpusVecs,
          "doc_id", "embedding", RRF_DEPTH)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(lex, vec, Retrieval.RRF_K0, RRF_TOPK)
        .orderBy("query_id", "rank")
    })
  )

  // ---------------------------------------------------------------------
  /** The store chains + frames qx107 and qx114 share (same corpus, same
    * params; qx114 only adds the serve-time ACL fence): the bucket-
    * partitioned lexical BM25 store and the self-contained IVF-PQ store
    * over the embedding-fenced corpus, both memoized per content
    * signature (StoreMemo), plus the query/rescore/fence frames. */
  private[graft] final case class HybridParts(lexStore: String,
      vecStore: String, queries: DataFrame, corpusVecs: DataFrame,
      allowed: DataFrame)

  private[graft] def hybridStoreParts(s: SparkSession, dir: String): HybridParts = {
    val docs = t(s, dir, "documents")
    val emb = t(s, dir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
    val isQuery = col("doc_id") % RRF_QMOD === RRF_QREM
    val corpusDocs = hybrid.filter(!isQuery).select("doc_id", "text")
    val corpusVecs = hybrid.filter(!isQuery).select("doc_id", "embedding")
    val cents = emb.filter(col("vec_id") < HY_CENTROIDS)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
    val codebook = emb.filter(col("vec_id") < HY_CODES)
      .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb"))
    val wl = StoreMemo.materialize(dir, Seq(
      bm25Build(s"hybrid!q($RRF_QMOD,$RRF_QREM)", corpusDocs, at = "lex")))
    val wv = StoreMemo.materialize(dir, Seq(
      StoreMemo.step(s"vec.buildSC|hybrid!q($RRF_QMOD,$RRF_QREM)|" +
        s"c=$HY_CENTROIDS|cb=$HY_CODES|d=$HY_DIMS|bl=$HY_BLOCKS|res=false")(w =>
        graft.operators.Quantize.buildSelfContained(s, corpusVecs,
          "doc_id", "embedding", cents, "centroid_id", "cen_emb",
          codebook, "code_id", "cb_emb", HY_DIMS, HY_BLOCKS,
          residual = false, s"$w/vec"))))
    HybridParts(s"$wl/lex", s"$wv/vec",
      hybrid.filter(isQuery).select("doc_id", "text", "embedding"),
      corpusVecs,
      hybrid.filter(!isQuery && col("doc_id") % 3 === 1).select("doc_id"))
  }

  /** PLAN-TWIN audit surfaces for qx107/qx114: the single-plan fusion
    * over the SAME memoized stores the served bench entries collect
    * from. The served path's final frame is a driver-fused LocalRelation
    * (no scan nodes to audit); its leg DAGs are exactly these subplans
    * (hybridLegs is shared, RetrievalServingParitySpec pins the rows
    * identical), so PlanAuditSpec's partition-pruning pins audit the
    * twins. */
  private[graft] def qx107PlanTwin(s: SparkSession, dir: String): DataFrame = {
    val p = hybridStoreParts(s, dir)
    Retrieval.hybridTopKFromStores(s, p.lexStore, p.vecStore, p.queries,
        "text", "embedding", "doc_id", RRF_TOPK, RRF_DEPTH,
        HY_NPROBE, HY_RERANK, p.corpusVecs, "embedding",
        maxQueryTerms = MAX_QTERMS)
      .orderBy("query_id", "rank")
  }

  private[graft] def qx114PlanTwin(s: SparkSession, dir: String): DataFrame = {
    val p = hybridStoreParts(s, dir)
    Retrieval.hybridTopKFromStoresFiltered(s, p.lexStore, p.vecStore,
        p.queries, p.allowed, "text", "embedding", "doc_id", RRF_TOPK,
        RRF_DEPTH, HY_NPROBE, HY_RERANK, p.corpusVecs, "embedding",
        maxQueryTerms = MAX_QTERMS)
      .orderBy("query_id", "rank")
  }

  private implicit val duck: Dialect = Dialect(spark = false)

  /** BM25 scoring CTE chain over `corpus`/`q` CTEs (both (doc_id, text));
    * yields a `ranked` relation (query_id, doc_id, score_dec, rn).
    * `candWhere` optionally fences the CANDIDATE docs (filtered
    * retrieval, qx111) — df/stats stay corpus-global, matching
    * [[Retrieval.bm25TopKFromStoreFiltered]]'s semantics. */
  private def bm25Ctes: String = bm25CtesWhere("")
  /** The BM25F oracle: fields, censuses, per-field contributions,
    * merge, saturation and micro-unit floor mirror Retrieval.bm25fTopK
    * term for term — the contribution and saturation SQL snippets are
    * the SAME strings both engines evaluate. Shared verbatim by qx118
    * (one-shot) and qx119 (store-served): the per-field store
    * lifecycle is invisible to correctness by construction. qx120
    * passes a candidate fence — applied on the cand CTE only, AFTER
    * dfreq, mirroring scoreBm25f's filtered semantics (df and n_docs
    * stay corpus-global; the allow-list never reweights idf). */
  private def bm25fOracle: String = bm25fOracleWhere("")

  private def bm25fOracleWhere(candWhere: String): String = {
    val d = duck
    val toks = TX.tokens("text")(d)
    s"""WITH fielded AS (SELECT doc_id,
         |    ${d.ajoin(d.slice(toks, "1", BM25F_TITLE_TOKENS), "' '")} AS title,
         |    ${d.ajoin(d.slice(toks, (BM25F_TITLE_TOKENS + 1).toString, 1000000), "' '")} AS body
         |  FROM documents),
         |corpus AS (SELECT * FROM fielded WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |tok0 AS (SELECT doc_id, unnest(${TX.tokens("title")(d)}) AS term FROM corpus),
         |p0 AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok0 GROUP BY doc_id, term),
         |d0 AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM p0 GROUP BY doc_id),
         |tok1 AS (SELECT doc_id, unnest(${TX.tokens("body")(d)}) AS term FROM corpus),
         |p1 AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok1 GROUP BY doc_id, term),
         |d1 AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM p1 GROUP BY doc_id),
         |lens AS (SELECT f.doc_id, COALESCE(a.dl, 0) AS l0, COALESCE(b.dl, 0) AS l1
         |         FROM corpus f LEFT JOIN d0 a USING (doc_id) LEFT JOIN d1 b USING (doc_id)),
         |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |            CAST(SUM(l0) AS BIGINT) AS len_0, CAST(SUM(l1) AS BIGINT) AS len_1
         |          FROM lens WHERE l0 + l1 > 0),
         |c0 AS (SELECT doc_id, term,
         |         ${Retrieval.bm25fContribSql(BM25F_TITLE_W, BM25F_TITLE_B, "len_0")} AS contrib
         |       FROM p0 JOIN d0 USING (doc_id) CROSS JOIN stats),
         |c1 AS (SELECT doc_id, term,
         |         ${Retrieval.bm25fContribSql(BM25F_BODY_W, BM25F_BODY_B, "len_1")} AS contrib
         |       FROM p1 JOIN d1 USING (doc_id) CROSS JOIN stats),
         |merged AS (SELECT doc_id, term, SUM(contrib) AS wtf
         |           FROM (SELECT * FROM c0 UNION ALL SELECT * FROM c1)
         |           GROUP BY doc_id, term),
         |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM merged GROUP BY term),
         |qterms AS (SELECT DISTINCT doc_id AS query_id,
         |             unnest(${d.slice(TX.tokens("text")(d), "1", MAX_QTERMS)}) AS term
         |           FROM q),
         |cand AS (SELECT query_id, m.term AS term, m.doc_id AS doc_id, wtf, df
         |         FROM merged m JOIN qterms USING (term) JOIN dfreq USING (term)$candWhere),
         |scored AS (SELECT query_id, doc_id,
         |    CAST(floor(${Retrieval.idfSql} * ${Retrieval.bm25fSatSql(Retrieval.K1)}
         |         * 1000000.0 + 0.5) AS BIGINT) AS term_score
         |  FROM cand CROSS JOIN stats),
         |perdoc AS (SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score_u
         |           FROM scored GROUP BY query_id, doc_id),
         |ranked AS (SELECT query_id, doc_id, score_u,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |               ORDER BY score_u DESC, doc_id ASC) AS rn
         |           FROM perdoc)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin
  }

  private def bm25CtesWhere(candWhere: String): String =
    bm25CtesFull(candWhere, conjunctive = false)

  private def bm25CtesFull(candWhere: String, conjunctive: Boolean,
                           maxTerms: Int = MAX_QTERMS): String = {
    val d = duck
    s"""tok AS (SELECT doc_id, unnest(${TX.tokens("text")(d)}) AS term FROM corpus),
       |postings AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
       |dlens AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM postings GROUP BY doc_id),
       |stats AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len,
       |            CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |          FROM dlens),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
       |qterms AS (SELECT DISTINCT doc_id AS query_id,
       |             unnest(${d.slice(TX.tokens("text")(d), "1", maxTerms)}) AS term
       |           FROM q),
       |cand AS (SELECT query_id, p.term AS term, p.doc_id AS doc_id, tf, df
       |         FROM postings p JOIN qterms USING (term) JOIN dfreq USING (term)$candWhere),
       |scored AS (
       |  SELECT query_id, cand.doc_id AS doc_id,
       |    CAST(floor(${Retrieval.idfSql} * ${Retrieval.tfNormSql(Retrieval.K1, Retrieval.B)}
       |         * 1000000.0 + 0.5) AS BIGINT) AS term_score
       |  FROM cand JOIN dlens ON cand.doc_id = dlens.doc_id CROSS JOIN stats),
       |${if (!conjunctive)
          """perdoc AS (SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score_u
            |           FROM scored GROUP BY query_id, doc_id),""".stripMargin
        else
          // conjunctive: one scored row per (query, doc, term), so the
          // group count is the matched-term count — keep only docs
          // matching EVERY query term (scores unchanged for survivors)
          """qlens AS (SELECT query_id, COUNT(*) AS nterms FROM qterms GROUP BY query_id),
            |perdoc0 AS (SELECT query_id, doc_id, CAST(SUM(term_score) AS BIGINT) AS score_u,
            |              COUNT(*) AS matched
            |            FROM scored GROUP BY query_id, doc_id),
            |perdoc AS (SELECT query_id, doc_id, score_u
            |           FROM perdoc0 JOIN qlens USING (query_id)
            |           WHERE matched = nterms),""".stripMargin}
       |ranked AS (SELECT query_id, doc_id, score_u,
       |             ROW_NUMBER() OVER (PARTITION BY query_id
       |               ORDER BY score_u DESC, doc_id ASC) AS rn
       |           FROM perdoc)""".stripMargin
  }

  /** RRF fusion tail over `lex(query_id, doc_id, lex_rank)` and
    * `vec(query_id, doc_id, vec_rank)` CTEs — qx101's nano-unit
    * arithmetic, shared with qx107 so the two fusion oracles cannot
    * drift. Yields the final SELECT (rank ≤ RRF_TOPK). */
  private def rrfTailSql: String =
    s"""fused AS (
       |  SELECT COALESCE(lex.query_id, vec.query_id) AS query_id,
       |    COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank,
       |    CAST(CASE WHEN lex_rank IS NOT NULL
       |         THEN floor(1.0 / (CAST(${Retrieval.RRF_K0} AS DOUBLE) + CAST(lex_rank AS DOUBLE))
       |              * 1000000000.0 + 0.5)
       |         ELSE 0 END AS BIGINT) +
       |    CAST(CASE WHEN vec_rank IS NOT NULL
       |         THEN floor(1.0 / (CAST(${Retrieval.RRF_K0} AS DOUBLE) + CAST(vec_rank AS DOUBLE))
       |              * 1000000000.0 + 0.5)
       |         ELSE 0 END AS BIGINT) AS rrf_u
       |  FROM lex FULL OUTER JOIN vec
       |    ON lex.query_id = vec.query_id AND lex.doc_id = vec.doc_id)
       |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
       |  ROUND(CAST(rrf_u AS DOUBLE) / 1000000000.0, 9) AS rrf_score, lex_rank, vec_rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rrf_u DESC, doc_id ASC) AS rn FROM fused)
       |WHERE rn <= $RRF_TOPK ORDER BY query_id, rank""".stripMargin

  val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    // qx112's contract IS qx107's result: both stores fed by streams
    // (plus the flatten hand-off) must serve exactly what the
    // batch-built deployment serves — same oracle, verbatim.
    "qx112_hybrid_stream" -> oracleSqlBase("qx107_hybrid_store"),
    // qx114: the SAME hybrid derivation with the allow-list fencing
    // CANDIDATES on both sides — the lexical cand CTE (qx111's shape)
    // and the vector rescore set — while df/stats/avgdl and the probe
    // selection stay corpus-global. A hash match proves the fence bit on
    // both retrievers and nowhere else.
    "qx114_hybrid_filtered" -> hybridStoreOracle(
      " WHERE p.doc_id % 3 = 1", " WHERE a.doc_id % 3 = 1"))

  /** The store-served hybrid derivation (qx107/qx112/qx114), with
    * optional candidate fences: `lexCandWhere` lands in the BM25 cand
    * CTE (" WHERE p.doc_id % 3 = 1"-shaped), `vecCandWhere` in the
    * vector rescore CTE (" WHERE a.doc_id % 3 = 1"-shaped). Statistics
    * CTEs are shared and unfenced in every variant — filtered retrieval
    * fences candidates, never idf/avgdl. */
  private def hybridStoreOracle(lexCandWhere: String,
                                vecCandWhere: String): String = {
    val d = duck
    def cosSim(v: String, n: String) =
      s"COALESCE(CASE WHEN $n > 0 AND c_norm2 > 0 THEN " +
        s"${TX.dot(v, "c_vec")(d)} / (sqrt($n) * sqrt(c_norm2)) END, -2.0)"
    s"""WITH hybrid AS (SELECT doc_id, text, embedding
       |  FROM documents JOIN embeddings ON doc_id = vec_id),
       |corpus AS (SELECT doc_id, text FROM hybrid WHERE doc_id % $RRF_QMOD <> $RRF_QREM),
       |q AS (SELECT doc_id, text FROM hybrid WHERE doc_id % $RRF_QMOD = $RRF_QREM),
       |${bm25CtesWhere(lexCandWhere)},
       |lex AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS lex_rank
       |        FROM ranked WHERE rn <= $RRF_DEPTH),
       |hn AS (SELECT doc_id, embedding, ${TX.norm2("embedding")(d)} AS norm2 FROM hybrid),
       |cen AS (SELECT vec_id AS centroid_id, embedding AS c_vec,
       |          ${TX.norm2("embedding")(d)} AS c_norm2
       |        FROM embeddings WHERE vec_id < $HY_CENTROIDS),
       |assigned AS (
       |  SELECT doc_id, centroid_id FROM (
       |    SELECT hn.doc_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY hn.doc_id ORDER BY
       |        ${cosSim("hn.embedding", "hn.norm2")} DESC, centroid_id ASC) AS rn
       |    FROM hn CROSS JOIN cen WHERE hn.doc_id % $RRF_QMOD <> $RRF_QREM)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT hn.doc_id AS query_id, cen.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY hn.doc_id ORDER BY
       |        ${cosSim("hn.embedding", "hn.norm2")} DESC, centroid_id ASC) AS rn
       |    FROM hn CROSS JOIN cen WHERE hn.doc_id % $RRF_QMOD = $RRF_QREM)
       |  WHERE rn <= $HY_NPROBE),
       |vresc AS (
       |  SELECT p.query_id, a.doc_id,
       |    ${TX.dot("qe.embedding", "qe.embedding")(d)}
       |      - 2.0 * ${TX.dot("qe.embedding", "ce.embedding")(d)}
       |      + ${TX.dot("ce.embedding", "ce.embedding")(d)} AS d2x
       |  FROM assigned a JOIN probes p USING (centroid_id)
       |  JOIN hybrid qe ON qe.doc_id = p.query_id
       |  JOIN hybrid ce ON ce.doc_id = a.doc_id$vecCandWhere),
       |vec AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS vec_rank
       |        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |                ORDER BY d2x ASC, doc_id ASC) AS rn FROM vresc)
       |        WHERE rn <= $RRF_DEPTH),
       |$rrfTailSql""".stripMargin
  }

  private def oracleSqlBase: Map[String, String] = Map(

    // Store-served hybrid: lexical ranks are qx100's BM25 CTEs over the
    // hybrid corpus; vector ranks are PROBED EXACT kNN (assignment and
    // probe selection mirror Similarity.ivfAssign / Quantize.probeCells'
    // cosine-argmax with nulls→-2.0 and centroid-asc ties; the refine
    // depth exceeds every probed candidate set, so the exact rescore IS
    // the ranking); the fusion is the shared nano-unit RRF tail.
    "qx107_hybrid_store" -> hybridStoreOracle("", ""),

    // Phrase match in pure list arithmetic: both sides index tokens
    // 1-based, normalize each matched (slot, position) pair to the
    // implied start s = pos - slot + 1, and count the starts holding all
    // plen slots. The corpus is the post-lifecycle live set (built ∪
    // appended, minus deleted) — compaction must be invisible.
    "qx115_bm25_phrase" -> {
      val d = duck
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % $BM25_QMOD <> $BM25_QREM
         |    AND doc_id % $STORE_DEL_MOD <> $STORE_DEL_REM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |td AS (SELECT doc_id, ${TX.tokens("text")(d)} AS toks FROM corpus),
         |dtok AS (SELECT doc_id, unnest(toks) AS term,
         |           unnest(generate_series(1, len(toks))) AS pos FROM td),
         |tq AS (SELECT doc_id AS query_id, ${TX.tokens("text")(d)} AS toks FROM q),
         |qtok AS (SELECT query_id, unnest(toks) AS term,
         |           unnest(generate_series(1, len(toks))) AS slot FROM tq),
         |qcap AS (SELECT query_id, term, slot FROM qtok WHERE slot <= $PHRASE_TERMS),
         |qlen AS (SELECT query_id, COUNT(*) AS plen FROM qcap GROUP BY query_id),
         |starts AS (SELECT qc.query_id, d.doc_id, qc.slot, d.pos - qc.slot + 1 AS s
         |           FROM qcap qc JOIN dtok d USING (term)),
         |occ AS (SELECT query_id, doc_id, s FROM starts JOIN qlen USING (query_id)
         |        GROUP BY query_id, doc_id, s, plen HAVING COUNT(*) = plen),
         |counts AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS phrase_count
         |           FROM occ GROUP BY query_id, doc_id)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, phrase_count
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY phrase_count DESC, doc_id ASC) AS rn FROM counts)
         |WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin
    },

    // Windowed proximity in join arithmetic: anchors are every position
    // of any query term in a candidate doc; an anchor scores when its
    // [a, a+W-1] window holds ALL the query's distinct terms (COUNT
    // DISTINCT — a term twice inside one window still counts once).
    "qx117_bm25_proximity" -> {
      val d = duck
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |td AS (SELECT doc_id, ${TX.tokens("text")(d)} AS toks FROM corpus),
         |dtok AS (SELECT doc_id, unnest(toks) AS term,
         |           unnest(generate_series(1, len(toks))) AS pos FROM td),
         |tq AS (SELECT doc_id AS query_id, ${TX.tokens("text")(d)} AS toks FROM q),
         |qtok AS (SELECT query_id, unnest(toks) AS term,
         |           unnest(generate_series(1, len(toks))) AS slot FROM tq),
         |qterms AS (SELECT DISTINCT query_id, term FROM qtok WHERE slot <= $PROX_TERMS),
         |qlen AS (SELECT query_id, COUNT(*) AS nterms FROM qterms GROUP BY query_id),
         |hits AS (SELECT qt.query_id, d.doc_id, d.term, d.pos
         |         FROM qterms qt JOIN dtok d USING (term)),
         |occ AS (SELECT a.query_id, a.doc_id, a.pos
         |        FROM (SELECT DISTINCT query_id, doc_id, pos FROM hits) a
         |        JOIN hits h ON h.query_id = a.query_id AND h.doc_id = a.doc_id
         |          AND h.pos BETWEEN a.pos AND a.pos + ${PROX_WINDOW - 1}
         |        JOIN qlen l ON l.query_id = a.query_id
         |        GROUP BY a.query_id, a.doc_id, a.pos, l.nterms
         |        HAVING COUNT(DISTINCT h.term) = l.nterms),
         |counts AS (SELECT query_id, doc_id, CAST(COUNT(*) AS BIGINT) AS prox_count
         |           FROM occ GROUP BY query_id, doc_id)
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id, prox_count
         |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |        ORDER BY prox_count DESC, doc_id ASC) AS rn FROM counts)
         |WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin
    },

    "qx100_bm25_topk" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    // BM25F: the fields, censuses, per-field contributions, merge,
    // saturation and micro-unit floor mirror Retrieval.bm25fTopK term
    // for term — the contribution and saturation SQL snippets are the
    // SAME strings both engines evaluate.
    "qx118_bm25f" -> bm25fOracle,

    // Store-served fielded retrieval: the per-field store lifecycle is
    // invisible to correctness — qx118's one-shot formula, verbatim.
    "qx119_bm25f_store" -> bm25fOracle,

    // ONE-fielded-store serving: the store layout (field column in the
    // postings, per-field length deltas in the epochs) is invisible to
    // correctness — qx118's one-shot formula, verbatim again.
    "qx123_bm25f_one_store" -> bm25fOracle,

    // Fenced candidates, corpus-global statistics: the WHERE rides the
    // cand CTE only — dfreq/stats CTEs untouched, proving the fielded
    // filter never reweights idf/avgdl.
    "qx120_bm25f_filtered" -> bm25fOracleWhere(" WHERE m.doc_id % 3 = 1"),

    // Conjunctive serving: the HAVING rides the per-doc aggregate only
    // (matched-term count = query-term count); dfreq/stats CTEs are
    // qx100's, so survivors' scores are provably the OR ranking's.
    "qx122_bm25_conjunctive" -> {
      val ctes = bm25CtesFull("", conjunctive = true,
        maxTerms = PROX_TERMS)
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin
    },

    // Ranking = qx100's CTEs verbatim; anchor = MIN over matched query
    // terms of the term's first token position (list_position on the
    // SAME normalized tokens the census walked — Spark reads it from the
    // positional postings instead, the intended cross-derivation check);
    // snippet = the shared Retrieval.snippetSql fragment, evaluated by
    // DuckDB. The store (and its sidecar) is invisible by construction.
    "qx121_bm25_snippets" -> {
      val toks = TX.tokens("text")(duck)
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes,
         |topk AS (SELECT query_id, doc_id, score_u, rn FROM ranked WHERE rn <= $BM25_K),
         |anchors AS (SELECT c.query_id AS query_id, c.doc_id AS doc_id,
         |              MIN(list_position($toks, c.term)) AS anchor
         |            FROM cand c
         |            JOIN topk t ON t.query_id = c.query_id AND t.doc_id = c.doc_id
         |            JOIN corpus ON corpus.doc_id = c.doc_id
         |            GROUP BY c.query_id, c.doc_id)
         |SELECT t.query_id AS query_id, CAST(rn AS BIGINT) AS rank,
         |  t.doc_id AS doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score,
         |  ${Retrieval.snippetSql(toks, "anchor", SNIPPET_WINDOW)(duck)} AS snippet
         |FROM topk t
         |JOIN anchors a ON a.query_id = t.query_id AND a.doc_id = t.doc_id
         |JOIN corpus ON corpus.doc_id = t.doc_id
         |ORDER BY query_id, rank""".stripMargin
    },

    // One chained derivation: contamination pairs (the Bloom is invisible
    // — it only prefilters, the confirm join is exact), the Gopher keep
    // expression evaluated inline, then the BM25 formula over survivors.
    "qx104_curate_serve" -> {
      val d = duck
      val sels = graft.operators.TextAnalysis.gopherSignalSelect("text", "__toks",
        PipelineQueries.GOPHER_MIN_TOKENS, PipelineQueries.GOPHER_MAX_TOKENS,
        PipelineQueries.GOPHER_MIN_AVG_LEN, PipelineQueries.GOPHER_MAX_AVG_LEN,
        PipelineQueries.GOPHER_MAX_SYMBOL_RATIO, PipelineQueries.GOPHER_MIN_STOP_HITS)(d)
      val keepExpr = sels.find(_._2 == "keep").get._1
      s"""WITH ${ExtensionQueries.shingleCtes(V5_SHINGLE_N)},
         |u AS (SELECT DISTINCT doc_id, sh FROM t4),
         |c AS (SELECT doc_id, sh FROM u
         |      WHERE doc_id % $V5_BENCH_MOD <> $V5_BENCH_REM
         |        AND doc_id % $BM25_QMOD <> $BM25_QREM),
         |b AS (SELECT doc_id AS bench_id, sh FROM u
         |      WHERE doc_id % $V5_BENCH_MOD = $V5_BENCH_REM),
         |contaminated AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT c.doc_id FROM c JOIN b USING (sh)
         |    GROUP BY c.doc_id, b.bench_id HAVING COUNT(*) >= $V5_MIN_SHARED)),
         |cl AS (SELECT doc_id, text FROM documents
         |       WHERE doc_id % $V5_BENCH_MOD <> $V5_BENCH_REM
         |         AND doc_id % $BM25_QMOD <> $BM25_QREM
         |         AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
         |td AS (SELECT doc_id, text, ${TX.tokens("text")(d)} AS __toks FROM cl),
         |corpus AS (SELECT doc_id, text FROM td WHERE $keepExpr = 1),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin
    },

    // The lifecycle is invisible to correctness by construction: the
    // oracle is qx100's formula over the corpus minus the deleted slice —
    // delete-then-search ≡ rebuild-without-deleted, including n_docs,
    // total_len (avgdl) and every per-term df.
    "qx108_bm25_store_delete" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % $BM25_QMOD <> $BM25_QREM
         |    AND doc_id % $STORE_DEL_MOD <> $STORE_DEL_REM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    // delete → compact → re-append a slice of the deleted docs: the kept
    // corpus is (all minus deleted) plus the re-added slice. Only a store
    // whose compaction really cleared the tombstones can serve the
    // re-added docs again.
    "qx109_bm25_store_compact" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  WHERE doc_id % $BM25_QMOD <> $BM25_QREM
         |    AND (doc_id % $STORE_DEL_MOD <> $STORE_DEL_REM
         |         OR doc_id % $STORE_READD_MOD = $STORE_READD_REM)),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    // Filtered serving: the allow-list fences cand only — df/stats CTEs
    // untouched, proving idf/avgdl stayed corpus-global through the
    // store path as well.
    "qx111_bm25_filtered" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |${bm25CtesWhere(" WHERE p.doc_id % 3 = 1")}
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    // Stream-fed store ≡ batch-built store ≡ plain formula: micro-batch
    // boundaries are invisible to serving (qx105's oracle, verbatim).
    "qx110_bm25_stream_ingest" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    // The store is invisible to correctness by construction: the oracle
    // is qx100's formula over the union corpus (base ∪ appended batch).
    "qx105_bm25_store" ->
      s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD <> $BM25_QREM),
         |q AS (SELECT doc_id, text FROM documents WHERE doc_id % $BM25_QMOD = $BM25_QREM),
         |$bm25Ctes
         |SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
         |  ROUND(CAST(score_u AS DOUBLE) / 1000000.0, 6) AS score
         |FROM ranked WHERE rn <= $BM25_K ORDER BY query_id, rank""".stripMargin,

    "qx101_hybrid_rrf" -> {
      val d = duck
      s"""WITH hybrid AS (SELECT doc_id, text, embedding
         |  FROM documents JOIN embeddings ON doc_id = vec_id),
         |corpus AS (SELECT doc_id, text FROM hybrid WHERE doc_id % $RRF_QMOD <> $RRF_QREM),
         |q AS (SELECT doc_id, text FROM hybrid WHERE doc_id % $RRF_QMOD = $RRF_QREM),
         |$bm25Ctes,
         |lex AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS lex_rank
         |        FROM ranked WHERE rn <= $RRF_DEPTH),
         |vn AS (SELECT doc_id, embedding, ${TX.norm2("embedding")(d)} AS norm2 FROM hybrid),
         |vq AS (SELECT doc_id AS query_id, embedding AS q_vec, norm2 AS q_norm2
         |       FROM vn WHERE doc_id % $RRF_QMOD = $RRF_QREM),
         |vc AS (SELECT doc_id, embedding AS c_vec, norm2 AS c_norm2
         |       FROM vn WHERE doc_id % $RRF_QMOD <> $RRF_QREM),
         |vscored AS (
         |  SELECT query_id, vc.doc_id AS doc_id,
         |    CASE WHEN q_norm2 > 0 AND c_norm2 > 0
         |         THEN ${TX.dot("q_vec", "c_vec")(d)} / (sqrt(q_norm2) * sqrt(c_norm2)) END AS cosine
         |  FROM vc CROSS JOIN vq),
         |vec AS (SELECT query_id, doc_id, CAST(rn AS BIGINT) AS vec_rank
         |        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |                ORDER BY cosine DESC, doc_id ASC) AS rn FROM vscored)
         |        WHERE rn <= $RRF_DEPTH),
         |$rrfTailSql""".stripMargin
    }
  )
}
