package graft

/** Plan-invariant regression net: every oracle query's PHYSICAL plan is
  * checked for the anti-patterns that kill 100 TB runs. A query can pass
  * its hash gate with a catastrophic plan (correctness says nothing about
  * the shuffle structure) — this spec is the structural complement.
  *
  * Invariants:
  *  - no CartesianProduct anywhere (an unkeyed pair enumeration scales
  *    quadratically; the broadcast nested-loop joins the IVF/kNN paths use
  *    on their deliberately-small sides are allowed);
  *  - at least one WholeStageCodegen span (a fully-interpreted plan means
  *    an Expression fell out of codegen).
  */
class PlanAuditSpec extends SparkSpec {

  val sfDir = "/root/testdata/sf0.001"

  test("gopherRules is scan+project only: zero Exchange in the physical plan") {
    val docs = Tables.t(spark, sfDir, "documents")
    val plan = graft.operators.TextAnalysis.gopherRules(docs, "text", "doc_id",
        20L, 90L, 4.0, 4.8, 0.05, 1L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("IVF-PQ search plans: every join broadcasts a small side — no corpus sort-merge join") {
    // the composed-index queries live or die on this topology: probes and
    // ADC tables broadcast, the corpus side only ever equi-joins them; a
    // SortMergeJoin appearing here means a small side stopped broadcasting
    // and the corpus is being sorted+shuffled for it
    // qx83 is the stored+refined composition (probe-pruned store scan →
    // tombstone anti-join → ADC → broadcast-shortlist exact rescore);
    // its lambda eagerly builds the store, so the plan under audit is the
    // search the deployment actually runs
    for (q <- Seq("qx67_ivfpq_search", "qx69_ivfpq_residual",
                  "qx83_searchref_retained")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"),
        s"$q: a join fell off the broadcast path:\n${plan.take(1500)}")
      assert(plan.contains("BroadcastHashJoin"),
        s"$q lost its broadcast joins:\n${plan.take(1500)}")
    }
  }

  test("round-6 curation plans: qx75 pair stage is a cluster-keyed equi-join, qx76 keeps every small side on the broadcast path") {
    // qx75: the quadratic step must be FENCED — an equi-join keyed on
    // cluster with the priority/threshold tests as residual filters; a
    // Window here would mean a corpus-wide sort snuck in, a
    // CartesianProduct that the fence fell off entirely
    val p75 = SparkEntry.queries("qx75_semantic_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p75.contains("CartesianProduct"), p75.take(1500))
    assert(!p75.contains("Window"),
      s"semantic dedup must not window over the corpus:\n${p75.take(1500)}")
    // qx76: the metadata semi-join and every search-side small frame must
    // broadcast — a SortMergeJoin means the corpus is being sorted for a
    // side that should have shipped to it
    val p76 = SparkEntry.queries("qx76_filtered_ann")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p76.contains("SortMergeJoin"),
      s"qx76: a join fell off the broadcast path:\n${p76.take(1500)}")
  }

  test("qx100 BM25: query-side joins all broadcast — no corpus sort-merge join, no doc-keyed norms join") {
    // the postings census carries the scan-computed doc length, so no
    // (doc_id)-keyed join may exist anywhere: a SortMergeJoin or a
    // hashpartitioning(doc_id) exchange (without term) means the plan
    // re-grew the Lucene norms join the operator exists to avoid
    val p = SparkEntry.queries("qx100_bm25_topk")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"qx100 query-side joins must broadcast:\n${p.take(1500)}")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
    // single-column doc_id exchange only — the (doc_id, term) census and
    // the (query_id, doc_id) score aggregation are the legitimate keys
    assert(!"hashpartitioning\\(doc_id#\\d+L?, \\d+\\)".r.findFirstIn(p).isDefined,
      s"qx100 must not shuffle on doc_id alone (norms join resurfaced):\n${p.take(1500)}")
  }

  test("round-8 late plans: qx96 is scan-only, qx97 never shuffles the corpus, qx90's confirm pass stays broadcast-semi") {
    // qx96: two tokenizer counts + a piece hash are pure projections —
    // an Exchange here means something aggregated that shouldn't
    val p96 = SparkEntry.queries("qx96_bpe_token_counts")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p96.replaceAll("Exchange rangepartitioning[^\n]*", "")
        .contains("Exchange"),
      s"qx96 must be scan+project (+ the output sort only):\n${p96.take(1500)}")
    // qx97: training is a census to ONE row; the only corpus-touching
    // stages are the census partial-agg and the scoring projection — a
    // SortMergeJoin or a doc-keyed hash exchange means the fit shuffled
    // the corpus it never needs to
    val p97 = SparkEntry.queries("qx97_quality_regression")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p97.contains("SortMergeJoin"),
      s"qx97: the 1-row coefficient join fell off the broadcast path:\n${p97.take(1500)}")
    assert(!p97.contains("hashpartitioning(doc_id"),
      s"qx97 must not shuffle the corpus by doc:\n${p97.take(1500)}")
    // qx90 (fast path): the exact recount must reach the token stream
    // through a BROADCAST LeftSemi — a shuffled semi-join would re-key
    // the whole stream the Misra–Gries pass exists to avoid
    val p90 = SparkEntry.queries("qx90_heavy_hitters")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p90.contains("BroadcastHashJoin") && p90.contains("LeftSemi"),
      s"qx90's candidate filter must broadcast:\n${p90.take(1500)}")
  }

  test("qx107 store-served hybrid: BOTH serving scans are partition-pruned (bucket IN on postings/df, probed cells on the vector store)") {
    // the round-9 deployment pin: the fused plan contains the lexical
    // store's bucket-pruned reads AND the vector store's probed-cell
    // read; if either filter disappears the store serves at full-scan
    // cost and the whole point of the persisted layout is gone.
    // Round 14: the bench entry serves through the driver-fused path
    // (its final frame is a LocalRelation with no scan nodes), so the
    // audit reads the PLAN TWIN over the same stores — the identical
    // leg subplans the served path executes (parity spec-pinned).
    val p = queries.RetrievalQueries.qx107PlanTwin(spark, sfDir)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]+\\]".r.findAllIn(p).toSeq
    assert(pf.exists(_.contains("bucket")),
      s"no bucket partition filter on the BM25 store scans:\n${p.take(2000)}")
    assert(pf.exists(_.contains("centroid_id")),
      s"no probed-cell partition filter on the vector store scan:\n${p.take(2000)}")
    // (no SortMergeJoin ban here: the documents⋈embeddings hybrid-corpus
    // equi-join is corpus-scale and SHOULD shuffle, and rrfFuse's
    // full_outer over two k-bounded lists has no broadcast variant —
    // both are planning-scale or legitimately exchanged)
  }

  test("qx114 filtered hybrid: both serving scans stay partition-pruned WITH the allow-list applied, and the fences broadcast") {
    // the round-10 ACL-serving pin: adding the allow-list must not cost
    // either store its partition pruning (the fence is a semi-join AFTER
    // the pruned scan, so the scan nodes keep their literal filters),
    // and the fence itself must be a BroadcastHashJoin LeftSemi —
    // predicate metadata, never a shuffled corpus-scale join.
    // Round 14: audited via the plan twin, same rationale as qx107 above.
    val p = queries.RetrievalQueries.qx114PlanTwin(spark, sfDir)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]+\\]".r.findAllIn(p).toSeq
    assert(pf.exists(_.contains("bucket")),
      s"no bucket partition filter on the BM25 store scans:\n${p.take(2000)}")
    assert(pf.exists(_.contains("centroid_id")),
      s"no probed-cell partition filter on the vector store scan:\n${p.take(2000)}")
    assert("BroadcastHashJoin [^\n]*LeftSemi".r.findAllIn(p).nonEmpty,
      s"the allow-list fence must be a broadcast semi-join:\n${p.take(2000)}")
  }

  test("BM25 store serving plan: the only term-keyed aggregate reads the df sidecar, never the postings") {
    // round 9 persisted per-term df DELTAS in the store; serving sums
    // them from the pruned df scan (vocabulary-scale) — a term-keyed
    // aggregate whose subtree reads the POSTINGS is the regression
    // (that's the corpus-scale census the sidecar exists to amortize)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val docs = Tables.t(spark, sfDir, "documents")
    val work = java.nio.file.Files.createTempDirectory("pa-bm25-").toString
    graft.operators.Retrieval.writeBm25Store(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 17 =!= 2),
      "text", "doc_id", work, 8)
    val df = graft.operators.Retrieval.bm25TopKFromStore(spark, work,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 17 === 2),
      "text", "doc_id", 5, maxQueryTerms = 4)
    // the df-census shape is a SINGLE-key aggregate on term (the
    // query-side (query_id, term) distinct is planning-scale and fine)
    val termAggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.groupingExpressions.size == 1 &&
        a.groupingExpressions.head.references.exists(_.name == "term") => a
    }
    assert(termAggs.nonEmpty, "expected the df-sidecar sum to survive optimization")
    termAggs.foreach { a =>
      val locs = a.collect {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString)
      }.flatten
      assert(locs.nonEmpty && locs.forall(_.contains("/df")),
        s"a term-keyed aggregate reads ${locs.mkString(",")} — " +
          "df must come from the sidecar, not a postings census")
    }
    // and both store reads carry the literal bucket partition filter
    val p = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*bucket[^\\]]*\\]".r.findAllIn(p).toSeq
    assert(pf.size >= 2,
      s"expected bucket-pruned postings AND df scans, got ${pf.size}:\n${p.take(2000)}")
    // round 10: postings persist per-term POSITION arrays for phrase
    // queries — a write-side cost only. BM25 scoring must never
    // materialize them: every scan's ReadSchema has to exclude `pos`
    // (parquet column pruning is what makes the positional schema free
    // for the scoring path)
    val schemas = "ReadSchema: [^\n]+".r.findAllIn(p).toSeq
    assert(schemas.nonEmpty && schemas.forall(!_.contains("pos")),
      s"a BM25 scoring scan reads the position arrays:\n${schemas.mkString("\n")}")
  }

  test("no oracle query plans a CartesianProduct; all keep codegen") {
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val qe = fn(spark, sfDir).queryExecution
      if (qe.executedPlan.toString.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      // AQE's pre-execution plan hides codegen spans — count them the way
      // ExplainAudit does, on the codegen-debug rendering
      val cg = org.apache.spark.sql.execution.debug.codegenString(qe.executedPlan)
      if (!cg.contains("WholeStageCodegen"))
        offenders += s"$name: no WholeStageCodegen span"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
