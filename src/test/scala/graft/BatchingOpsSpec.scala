package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class BatchingOpsSpec extends SparkSpec {

  test("duplicated-span census: hand-checked fractions, within-doc repeats don't count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),        // shingles: "a b c", "b c d"
      (2L, "a b c e"),        // shares "a b c" with doc 1
      (3L, "x y z w"),        // nothing shared
      (4L, "p q r p q r p q") // self-repeating only — 0 cross-doc dup
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpanCensus(docs, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 1L, 0.5)))
    assert(got(3L) == ((2L, 0L, 0.0)))
    assert(got(4L)._2 == 0L, s"within-doc repetition must not count: ${got(4L)}")
  }

  test("removeDuplicatedSpans: only cross-doc shared spans excised; within-doc repeats, unique text, empty docs untouched") {
    import spark.implicits._
    import graft.operators.Dedup
    // docs 1/2 share exactly one 3-gram ("common boiler plate"); doc 3
    // repeats its own trigram (must NOT count); doc 4 is unique; doc 5
    // is empty — the rewrite must be surgical, not a blanket filter
    val docs = Seq(
      (1L, "alpha beta common boiler plate gamma delta"),
      (2L, "zeta common boiler plate eta theta iota"),
      (3L, "one two three one two three one two three"),
      (4L, "completely unique words nobody else uses anywhere"),
      (5L, ""),
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(docs, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == (7L, 3L, "alpha beta gamma delta"),
      s"doc 1 must lose exactly the shared trigram: ${out(1L)}")
    assert(out(2L) == (7L, 3L, "zeta eta theta iota"), out(2L).toString)
    assert(out(3L) == (9L, 0L, "one two three one two three one two three"),
      s"within-doc repetition must NOT be excised: ${out(3L)}")
    assert(out(4L) == (7L, 0L, "completely unique words nobody else uses anywhere"))
    assert(out(5L) == (0L, 0L, ""), "empty doc kept with empty text")
  }

  test("semanticDedup: pairwise drop fenced inside clusters, closest-to-centroid wins, zero-norm excluded") {
    import spark.implicits._
    import graft.operators.Dedup
    // two orthogonal centroids; cluster 0 holds a near-identical pair
    // (only the lower-priority twin must drop) plus a distant mate below
    // tau; cluster 1 is a singleton; one zero vector must vanish entirely
    val vecs = Seq(
      10L -> Array(1f, 0.01f, 0f, 0f),   // closest to c0 — the representative
      11L -> Array(1f, 0.02f, 0f, 0f),   // cos(10,11) ≈ 0.99995 ≥ tau → drops
      12L -> Array(0.5f, 0.45f, 0f, 0f), // same cluster, cos ≈ 0.75 < tau → kept
      20L -> Array(0f, 1f, 0.1f, 0f),    // cluster 1 singleton → kept
      99L -> Array(0f, 0f, 0f, 0f),      // zero norm → not assignable, absent
    ).toDF("vec_id", "embedding")
    val cents = Seq(0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0f, 1f, 0f, 0f))
      .toDF("centroid_id", "c_emb")
    val out = Dedup.semanticDedup(vecs, "vec_id", "embedding",
      cents, "centroid_id", "c_emb", tau = 0.95)
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(rows.keySet == Set(10L, 11L, 12L, 20L), "zero-norm row must be excluded")
    assert(rows(10L) == (1L, None))
    assert(rows(11L) == (0L, Some(10L)), "lower-priority twin drops, dominated by the representative")
    assert(rows(12L) == (1L, None), "below-tau cluster-mate survives")
    assert(rows(20L) == (1L, None), "singleton cluster keeps its only member")
    // invariants: kept=0 iff dup_of present; the highest-priority member
    // of every cluster is structurally undominateable, hence kept
    val all = out.collect()
    assert(all.forall(r => (r.getLong(3) == 0L) == !r.isNullAt(4)))
    val byCluster = all.groupBy(_.getLong(1))
    byCluster.values.foreach { members =>
      val top = members.minBy(r => (-r.getDouble(2), r.getLong(0)))
      assert(top.getLong(3) == 1L, s"cluster top priority must be kept: $top")
    }
    // plan shape: no unfenced cartesian anywhere — assignment is a
    // broadcast cross-join, the pair stage an equi-join on cluster
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"no cartesian product allowed:\n$plan")
  }

  test("multi-probe IVF: recall vs brute force never drops when probing more cells") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3))
    val p1 = pairs(Similarity.ivfKnn(queries, emb, "vec_id", "embedding",
      cents, "cid", "cv", 3))
    val p2 = pairs(Similarity.ivfKnnMultiProbe(queries, emb, "vec_id", "embedding",
      cents, "cid", "cv", 3, 2))
    val r1 = (truth intersect p1).size.toDouble / truth.size
    val r2 = (truth intersect p2).size.toDouble / truth.size
    assert(r2 >= r1, s"recall dropped with more probes: 1-probe=$r1 2-probe=$r2")
    assert(r2 > 0.5, s"2-probe recall implausibly low: $r2")
    // NOT asserted: p1 ⊆ p2. With fixed k, a closer candidate surfaced by
    // the second cell rightfully displaces a 1-probe result — only recall
    // against the true top-k is monotone (anything that outranks a true
    // top-k member is itself in the true top-k).
  }

  test("IVF+PQ: index = exactly its two halves; full-probe search = pqSearch; recall above chance") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // 16 codebook entries (vs qx63's toy 4): recall against the exact kNN
    // is bounded by codebook resolution — PQ also ranks by approximate L2
    // while the truth ranks by cosine, so the bar below is deliberately
    // modest; the oracle gate (qx67) carries exactness, this row carries
    // "the approximation is useful"
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    // 1) the fused index carries the SAME cells as ivfAssign and the SAME
    //    codes as pqEncode — the composition adds routing, not new math
    val index = Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4)
    val cells = Similarity.ivfAssign(emb, "vec_id", "embedding", cents, "cid", "cv")
      .select(col("vec_id"), col("centroid_id").as("cell_ref"))
    val codes = Quantize.pqEncode(emb, "vec_id", "embedding",
        codebook, "code_id", "c_emb", 64, 4)
      .select(col("vec_id"), col("block"), col("code").as("code_ref"))
    val mismatch = index
      .join(cells, "vec_id").join(codes, Seq("vec_id", "block"))
      .filter(col("centroid_id") =!= col("cell_ref") || col("code") =!= col("code_ref"))
      .count()
    assert(mismatch == 0L, s"$mismatch index rows disagree with ivfAssign/pqEncode")
    assert(index.count() == emb.count() * 4, "one code per (vector, block)")
    // 2) recall against the float-exact truth: more probes never hurt,
    //    and the 2-probe composed index finds a solid share of true kNN
    //    (PQ distances are approximate, so the bar sits below the float
    //    multi-probe IVF's — the codes, not the routing, cost recall)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val queries = emb.filter(col("vec_id") < 20)
    // two truths: the index approximates exact L2 (what PQ codes encode),
    // so that's the gated recall; cosine brute force is recorded alongside
    // (it diverges from L2 on unnormalized vectors — informative, not
    // a property of this operator)
    val cosTruth = pairs(Similarity.bruteForceKnn(queries, emb, "vec_id", "embedding", 3))
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    val l2Truth = pairs(emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
      .withColumn("rank", row_number().over(wL2))
      .filter(col("rank") <= 3))
    def ivfpq(nProbe: Int) = Quantize.ivfPqSearch(
      queries, "vec_id", "embedding", emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, nProbe)
    // 3) probing EVERY cell removes the routing: the composed search must
    //    then equal plain pqSearch (k+1, self dropped, re-ranked) row for
    //    row — ranks, rounded distances, everything. This pins the ADC
    //    tail to the qx64-proven half; the recall rows below then measure
    //    only what routing + codes cost.
    val fullProbe = ivfpq(8)
      .select("query_id", "neighbor_id", "rank", "dist2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val pqRef = Quantize.pqSearch(queries, "vec_id", "embedding",
        Quantize.pqEncode(emb, "vec_id", "embedding",
          codebook, "code_id", "c_emb", 64, 4).select("vec_id", "block", "code"),
        "vec_id", codebook, "code_id", "c_emb", 64, 4, 4)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("rank").asc)).cast("long"))
      .filter(col("rank") <= 3)
      .select("query_id", "neighbor_id", "rank", "dist2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(fullProbe == pqRef,
      s"full-probe IVF+PQ diverges from pqSearch: only-ivfpq=${fullProbe -- pqRef} only-pq=${pqRef -- fullProbe}")
    // 4) recall rows: well above the ~0.002 chance floor for top-3 of 2000.
    //    NOT asserted monotone in nProbe — with approximate ADC distances,
    //    extra candidates can displace true neighbors, unlike the float
    //    multi-probe IVF where scoring is exact.
    def recall(truth: Set[(Long, Long)], got: Set[(Long, Long)]) =
      (truth intersect got).size.toDouble / truth.size
    val got2 = pairs(ivfpq(2))
    val (rl2, rcos) = (recall(l2Truth, got2), recall(cosTruth, got2))
    info(f"IVF+PQ(2-probe) recall: vs exact L2 $rl2%.2f, vs cosine brute force $rcos%.2f")
    assert(rl2 > 0.05, s"2-probe IVF+PQ recall vs exact L2 at chance level: $rl2")
    assert(rcos > 0.05, s"2-probe IVF+PQ recall vs bruteForceKnn at chance level: $rcos")
  }

  test("persisted IVF-PQ index: partition-pruned probed search equals the in-memory search") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val queries = emb.filter(col("vec_id") < 3) // few queries → few probed cells
    val path = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/index"
    Quantize.writeIvfPqIndex(
      Quantize.ivfPqIndex(emb, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
    // durable layout: one directory per cell (the inverted lists)
    val cellDirs = new java.io.File(path).listFiles()
      .count(_.getName.startsWith("centroid_id="))
    assert(cellDirs == 8, s"expected 8 cell directories, got $cellDirs")
    val fromStore = Quantize.ivfPqSearchStored(spark, path,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
    val inMem = Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(fromStore) == rows(inMem),
      "stored-index search must equal the in-memory search row for row")
    // the scan is partition-pruned to the probed cells — file-level, not
    // row-level: PartitionFilters on centroid_id, and fewer partitions
    // read than exist (3 queries × 2 probes ≤ 6 of 8 cells)
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"probed cells must prune partitions:\n${plan.take(2000)}")
    // and the pruning is FILE-level, not row-level: a cell-IN filter on
    // the store selects exactly that many partition directories
    val scan = spark.read.parquet(path)
      .filter(col("centroid_id").isInCollection(Seq(0L, 3L)))
      .queryExecution.executedPlan.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scan.isDefined, "expected a FileSourceScanExec over the index store")
    assert(scan.get.selectedPartitions.partitionCount == 2,
      s"2 probed cells must read 2 of 8 partitions, got ${scan.get.selectedPartitions.partitionCount}")
  }

  test("appendToIvfPqIndex: store-after-append equals one-shot rebuild; base files survive untouched") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    // every-4th split: the batch routes to many cells, so the append
    // exercises multi-directory partition appends
    val base = emb.filter(col("vec_id") % 4 =!= 1)
    val batch = emb.filter(col("vec_id") % 4 === 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-append").toString
    val appended = dir + "/appended"
    val rebuilt = dir + "/rebuilt"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(base, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), appended)
    def parquetFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val baseFiles = parquetFiles(appended)
    Quantize.appendToIvfPqIndex(batch, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, appended)
    // append semantics at the FILE level: every base file is still there
    // (mode("append") adds files to cell dirs, never rewrites the store)
    val afterFiles = parquetFiles(appended)
    assert(baseFiles.subsetOf(afterFiles),
      s"append must not rewrite base files; lost ${baseFiles -- afterFiles}")
    assert(afterFiles.size > baseFiles.size, "append must add files")
    // THE gate: stored-after-append ≡ one-shot rebuild over the union,
    // row for row (same qx51 incremental≡full pattern)
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), rebuilt)
    def rows(p: String): Set[String] = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    assert(rows(appended) == rows(rebuilt),
      "appended store must equal the one-shot rebuild row for row")
    // and the searched top-k over the appended store equals the in-memory
    // full-corpus search
    val queries = emb.filter(col("vec_id") < 5)
    def top(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank", "dist2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val fromStore = top(Quantize.ivfPqSearchStored(spark, appended,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2))
    val inMem = top(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2))
    assert(fromStore == inMem,
      "search over the appended store must equal the in-memory full-corpus search")
  }

  test("append retry protocol: delete(batchIds) then re-append converges from a partial append to the clean store") {
    // appendToIvfPqIndex is mode(\"append\") — a naive retry of a FAILED
    // append would double-land the batch's code rows and double ADC
    // distances. The documented retry protocol is delete-then-reappend;
    // this gate proves it converges from the WORST partial state (the
    // whole batch already landed once, i.e. a crash after commit) and
    // from the half-landed state (some batch rows present).
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val base = emb.filter(col("vec_id") % 4 =!= 1)
    val batch = emb.filter(col("vec_id") % 4 === 1)
    val half = batch.filter(col("vec_id") % 8 === 1)
    def build(path: String, corpus: org.apache.spark.sql.DataFrame): Unit =
      Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(corpus, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
    def append(path: String, b: org.apache.spark.sql.DataFrame): Unit =
      Quantize.appendToIvfPqIndex(b, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, path)
    def rows(p: String) = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-retry").toString
    build(s"$dir/clean", base); append(s"$dir/clean", batch)
    for ((name, partial) <- Seq("full" -> batch, "half" -> half)) {
      val p = s"$dir/$name"
      build(p, base)
      append(p, partial) // the interrupted attempt's landed fraction
      // retry per protocol: delete the batch ids (absent ones no-op) …
      Quantize.deleteFromIvfPqIndex(spark, p, batch.select("vec_id"), "vec_id")
      append(p, batch) // … then re-append
      assert(rows(p) == rows(s"$dir/clean"),
        s"delete-then-reappend from the $name-landed state must equal the clean append")
    }
  }

  test("deleteFromIvfPqIndex: store-after-delete equals build-without-them; untouched cells keep their files") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-delete").toString
    val store = dir + "/store"
    val rebuilt = dir + "/rebuilt"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), store)
    def parquetFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    // pick the doomed set from the STORE's routing: every vector filed in
    // cell 0 plus every-9th of the rest — cell 0 empties entirely (its
    // directory must vanish) while other cells shrink in place
    // (cast: hive partition inference re-types the numeric-looking
    // partition column as int — pin to long for the driver-side pairs)
    val byCell = spark.read.parquet(store)
      .select(col("vec_id"), col("centroid_id").cast("long")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cell0 = byCell.filter(_._2 == 0L).map(_._1).toSet
    assert(cell0.nonEmpty, "fixture needs a populated cell 0")
    val doomedIds = cell0 ++ byCell.map(_._1).filter(_ % 9 == 0)
    val doomed = emb.filter(col("vec_id").isInCollection(doomedIds)).select("vec_id")
    val before = parquetFiles(store)
    val untouchedCells = byCell.map(_._2).distinct.toSet --
      byCell.filter(t => doomedIds(t._1)).map(_._2).toSet
    val removed = Quantize.deleteFromIvfPqIndex(spark, store, doomed, "vec_id")
    assert(removed == doomedIds.size * 4L,
      s"expected ${doomedIds.size} vectors x 4 blocks removed, got $removed")
    // cells with no doomed rows keep their FILES byte-for-byte (never opened)
    val after = parquetFiles(store)
    val untouchedBefore = before.filter(f => untouchedCells.exists(c => f.contains(s"centroid_id=$c/")))
    assert(untouchedBefore.subsetOf(after),
      s"delete must not rewrite unaffected cells; lost ${untouchedBefore -- after}")
    // the emptied cell's directory is gone
    assert(!new java.io.File(store, "centroid_id=0").exists(),
      "a cell whose rows are all deleted must lose its directory")
    // THE gate: store-after-delete equals an index built without the
    // doomed vectors, row for row
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(
      emb.filter(!col("vec_id").isInCollection(doomedIds)), "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), rebuilt)
    def rows(p: String): Set[String] = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    assert(rows(store) == rows(rebuilt),
      "shrunk store must equal the build-without-them index row for row")
    // deleting ids not present is a no-op: zero removed, files untouched
    val absent = emb.filter(col("vec_id") < 0).select("vec_id")
    assert(Quantize.deleteFromIvfPqIndex(spark, store, absent, "vec_id") == 0L)
    assert(parquetFiles(store) == after, "no-op delete must leave files unchanged")
    // id-column contract: a name the store doesn't carry fails loudly
    // (position-based inference could key the join on e.g. 'block', whose
    // small values collide with vector ids and delete the wrong rows)
    val mis = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("doc_id"))
    val err = intercept[IllegalArgumentException] {
      Quantize.deleteFromIvfPqIndex(spark, store, mis, "doc_id")
    }
    assert(err.getMessage.contains("doc_id") && err.getMessage.contains("vec_id"))
  }

  test("deleteFromIvfPqIndex: interrupted delete is recoverable and blocks further deletes until recovered") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-recover").toString
    val store = dir + "/store"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), store)
    def rows(p: String): Set[String] = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    val pristine = rows(store)
    // Simulate a crash mid-swap: one cell's pre-image moved to the backup,
    // nothing written back yet — the exact state phase 1 leaves behind.
    val cells = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("centroid_id=")).sortBy(_.getName)
    assert(cells.length >= 2, "fixture needs multiple cells")
    val bak = new java.io.File(store + ".delete-bak")
    assert(bak.mkdirs())
    val moved = cells.head
    assert(moved.renameTo(new java.io.File(bak, moved.getName)))
    // a fresh delete must refuse while the backup marker exists
    val doomed = emb.filter(col("vec_id") % 11 === 0).select("vec_id")
    val refusal = intercept[java.io.IOException] {
      Quantize.deleteFromIvfPqIndex(spark, store, doomed, "vec_id")
    }
    assert(refusal.getMessage.contains("delete-bak"))
    // recovery restores the pre-delete store exactly, then deletes work again
    assert(Quantize.recoverDeleteBackup(spark, store))
    assert(!bak.exists())
    assert(rows(store) == pristine,
      "recovery must restore the exact pre-delete store")
    assert(!Quantize.recoverDeleteBackup(spark, store),
      "recover with no backup present must report nothing to do")
    val removed = Quantize.deleteFromIvfPqIndex(spark, store, doomed, "vec_id")
    assert(removed > 0L)
  }

  test("deleteFromIvfPqIndexWithVectors: assign-discovery delete equals the scan-path delete; no-ops, guards") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-delvecs").toString
    val byScan = dir + "/scan"
    val byVecs = dir + "/vecs"
    for (p <- Seq(byScan, byVecs))
      Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
        residual = false, p)
    def rows(p: String): Set[String] = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    def parquetFiles(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val doomed = emb.filter(col("vec_id") % 7 === 0)
    val doomedCells = spark.read.parquet(byVecs)
      .join(doomed.select("vec_id"), "vec_id")
      .select(col("centroid_id").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val untouchedBefore = parquetFiles(byVecs)
      .filterNot(f => doomedCells.exists(c => f.contains(s"centroid_id=$c/")))
    // THE gate: both discovery paths produce the identical store
    val r1 = Quantize.deleteFromIvfPqIndex(spark, byScan,
      doomed.select("vec_id"), "vec_id")
    val r2 = Quantize.deleteFromIvfPqIndexWithVectors(spark, byVecs,
      doomed.select("vec_id", "embedding"), "embedding")
    assert(r1 == r2 && r2 > 0L, s"scan path removed $r1, vector path $r2")
    assert(rows(byScan) == rows(byVecs),
      "assign-discovery delete must equal the scan-discovery delete row for row")
    // unaffected cells keep their files byte-for-byte on the vector path too
    assert(untouchedBefore.subsetOf(parquetFiles(byVecs)),
      "WithVectors must not rewrite cells without doomed rows")
    // absent ids are a no-op — including a GHOST id whose vector assigns
    // to a populated cell (presence is checked, never assumed)
    val filesAfter = parquetFiles(byVecs)
    val ghost = emb.filter(col("vec_id") === 2)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    assert(Quantize.deleteFromIvfPqIndexWithVectors(spark, byVecs,
      ghost, "embedding") == 0L)
    assert(parquetFiles(byVecs) == filesAfter,
      "ghost-id delete must leave every file untouched")
    // a bare store (no persisted quantizers) fails loudly
    val bare = dir + "/bare"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), bare)
    val err = intercept[IllegalStateException] {
      Quantize.deleteFromIvfPqIndexWithVectors(spark, bare,
        doomed.select("vec_id", "embedding"), "embedding")
    }
    assert(err.getMessage.contains("quantizers"))
    // leftover backup refuses, same discipline as the scan path
    val bak = new java.io.File(byVecs + ".delete-bak")
    assert(bak.mkdirs())
    val refusal = intercept[java.io.IOException] {
      Quantize.deleteFromIvfPqIndexWithVectors(spark, byVecs,
        doomed.select("vec_id", "embedding"), "embedding")
    }
    assert(refusal.getMessage.contains("delete-bak"))
    assert(bak.delete())
  }

  test("appendToIvfPqIndexResidual: residual store-after-append equals residual rebuild") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // residual-space codebook seeded from observed residuals (qx69 shape)
    val resCb = graft.operators.Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 100 && col("vec_id") < 104),
        "vec_id", "embedding", cents, "cid", "cv")
      .join(broadcast(cents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    val base = emb.filter(col("vec_id") % 4 =!= 2)
    val batch = emb.filter(col("vec_id") % 4 === 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-resapp").toString
    val appended = dir + "/appended"
    val rebuilt = dir + "/rebuilt"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndexResidual(base, "vec_id", "embedding",
      cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4), appended)
    Quantize.appendToIvfPqIndexResidual(batch, "vec_id", "embedding",
      cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4, appended)
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndexResidual(emb, "vec_id", "embedding",
      cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4), rebuilt)
    def rows(p: String): Set[String] = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    assert(rows(appended) == rows(rebuilt),
      "residual appended store must equal the residual one-shot rebuild row for row")
  }

  test("exact-rescore refinement: recall never below ADC's top-k, and exact distances rule the order") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val queries = emb.filter(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    val truth = pairs(emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= 3))
    val adc = pairs(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2))
    val refined = pairs(Quantize.ivfPqSearchRefined(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2, rerankDepth = 12))
    def recall(got: Set[(Long, Long)]) =
      (truth intersect got).size.toDouble / truth.size
    val (rAdc, rRef) = (recall(adc), recall(refined))
    info(f"recall vs exact L2: ADC top-3 $rAdc%.3f, refined(12) $rRef%.3f")
    // THEOREM for a shared shortlist: every true neighbor the shortlist
    // contains survives exact re-ranking (true neighbors have globally
    // minimal exact distance), while ADC's own top-k can bury them under
    // quantization error — so refined recall is never below ADC's
    assert(rRef >= rAdc, f"refinement lost recall: adc=$rAdc%.3f refined=$rRef%.3f")
    // depth == k degenerates to re-ordering the same set: identical PAIRS
    val depthK = pairs(Quantize.ivfPqSearchRefined(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2, rerankDepth = 3))
    assert(depthK == adc, "depth==k must keep exactly ADC's candidate set")
    intercept[IllegalArgumentException] {
      Quantize.ivfPqSearchRefined(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 64, 4, 3, 2, rerankDepth = 2)
    }
    // RESIDUAL-build refinement (the search trainIvfPq's codebook needs):
    // same theorem, same gates — recall never below the residual ADC's,
    // depth==k degenerates to the same candidate set re-ordered.
    val resCb = graft.operators.Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 16 && col("vec_id") < 32),
        "vec_id", "embedding", cents, "cid", "cv")
      .join(broadcast(cents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    val adcRes = pairs(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2))
    val refRes = pairs(Quantize.ivfPqSearchResidualRefined(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2, rerankDepth = 12))
    val (rAdcRes, rRefRes) = (recall(adcRes), recall(refRes))
    info(f"residual recall vs exact L2: ADC top-3 $rAdcRes%.3f, refined(12) $rRefRes%.3f")
    assert(rRefRes >= rAdcRes,
      f"residual refinement lost recall: adc=$rAdcRes%.3f refined=$rRefRes%.3f")
    val depthKRes = pairs(Quantize.ivfPqSearchResidualRefined(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2, rerankDepth = 3))
    assert(depthKRes == adcRes,
      "residual depth==k must keep exactly the residual ADC's candidate set")
  }

  test("ivfPqSearchAll: byte-identical to the broadcast-query search; whole corpus as queries accepted") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val index = Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSet
    // equality on a shared small query set: same top-k, same rounded
    // decimal distances, same cell/probe attribution — the batch
    // restructuring (map-side probes, per-candidate distances instead of
    // the broadcast LUT) must change the PLAN only, never a byte of output
    val queries = emb.filter(col("vec_id") < 20)
    val viaLut = rows(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2))
    val viaBatch = rows(Quantize.ivfPqSearchAll(queries, "vec_id", "embedding",
      index, "vec_id", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2))
    assert(viaBatch === viaLut,
      "batch ADC search must reproduce the broadcast-path search exactly")
    // the whole corpus as the query side — the case the broadcast path
    // refuses — produces k rows per vector, dense ranks, no cartesian
    val all = Quantize.ivfPqSearchAll(emb, "vec_id", "embedding",
      index, "vec_id", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, 3, 2)
    val collected = all.collect()
    assert(collected.map(_.getLong(0)).distinct.length.toLong === emb.count(),
      "every corpus vector must appear as a query")
    val plan = all.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("ivfPqSearchAllResidual: byte-identical to the broadcast residual search; whole corpus accepted") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    // residual-space codebook from mid-corpus seeds (the qx69 recipe —
    // seeding from 0..3 would make every entry the zero vector)
    val seeds = emb.filter(col("vec_id") >= 100 && col("vec_id") < 104)
    val resCb = Similarity.ivfAssign(seeds, "vec_id", "embedding", cents, "cid", "cv")
      .join(broadcast(cents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    val index = Quantize.ivfPqIndexResidual(emb, "vec_id", "embedding",
      cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4).localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSet
    val queries = emb.filter(col("vec_id") < 20)
    val viaLut = rows(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2))
    val viaBatch = rows(Quantize.ivfPqSearchAllResidual(queries, "vec_id", "embedding",
      index, "vec_id", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2))
    assert(viaBatch === viaLut,
      "residual batch search must reproduce the broadcast residual path exactly")
    val all = Quantize.ivfPqSearchAllResidual(emb, "vec_id", "embedding",
      index, "vec_id", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2)
    assert(all.select("query_id").distinct().count() === emb.count(),
      "every corpus vector must appear as a query")
  }

  test("ivfPqSearch with STRING vector ids: identical ties rank by id, repeat runs agree") {
    import spark.implicits._
    import graft.operators.Quantize
    // four identical vectors under string ids + one distinct query vector:
    // every corpus candidate ties exactly (same cell, same codes, same ADC
    // distance), so the ranking must fall back to the id ordering — the
    // library contract for non-numeric ids (a silently arbitrary winner
    // here would make re-runs disagree at scale)
    val vecA = Array.fill(8)(1.0f)
    val corpus = Seq("v3", "v1", "v4", "v2").map((_, vecA))
      .toDF("vec_id", "embedding")
    val query = Seq(("q", Array.tabulate(8)(i => if (i < 4) 1.0f else 0.5f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(("c0", vecA)).toDF("cid", "cv")
    val codebook = Seq(("k0", vecA)).toDF("code_id", "c_emb")
    def run() = Quantize.ivfPqSearch(query, "vec_id", "embedding",
        corpus, "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 8, 2, 3, 1)
      .orderBy("rank")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    val got = run()
    assert(got === Seq(("v1", 1L), ("v2", 2L), ("v3", 3L)),
      s"tied candidates must rank by id: $got")
    assert(run() === got, "repeat runs must agree exactly")
  }

  test("persisted IVF-PQ index with numeric-looking STRING centroid ids: stored search equals in-memory") {
    import spark.implicits._
    import graft.operators.Quantize
    // centroid ids "01"/"10" LOOK numeric: hive partition-type inference
    // would read them back as ints 1/10, and "01" can never round-trip
    // ("01" → 1 → "1") — so the store must be read with the centroid
    // frame's actual id type, not the inferred one
    val up = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val dn = Array.tabulate(8)(i => if (i < 4) 0.0f else 1.0f)
    def jig(v: Array[Float], eps: Float) = v.map(_ + eps)
    val corpus = Seq(
      ("a1", jig(up, 0.01f)), ("a2", jig(up, 0.02f)), ("a3", jig(up, 0.03f)),
      ("b1", jig(dn, 0.01f)), ("b2", jig(dn, 0.02f)), ("b3", jig(dn, 0.03f)))
      .toDF("vec_id", "embedding")
    val cents = Seq(("01", up), ("10", dn)).toDF("cid", "cv")
    val codebook = Seq(("k0", up), ("k1", dn)).toDF("code_id", "c_emb")
    val queries = corpus.filter(col("vec_id") === "a1")
    val path = java.nio.file.Files.createTempDirectory("ivfpq-str").toString + "/index"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(corpus, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 8, 2), path)
    // the durable layout carries the ORIGINAL string form in the dir names
    val dirs = new java.io.File(path).listFiles().map(_.getName)
      .filter(_.startsWith("centroid_id=")).sorted.toSeq
    assert(dirs == Seq("centroid_id=01", "centroid_id=10"), dirs.toString)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id", "rank", "dist2", "centroid_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .toSet
    val stored = rows(Quantize.ivfPqSearchStored(spark, path,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 8, 2, 3, 2))
    val inMem = rows(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      corpus, "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 8, 2, 3, 2))
    assert(stored.nonEmpty, "stored-index search returned nothing — partition ids mismatched")
    assert(stored == inMem, s"stored=$stored inMem=$inMem")
  }

  test("compactIvfPqIndex: append-fragmented store shrinks file count, rows and probed search unchanged, string cell ids survive") {
    import spark.implicits._
    import graft.operators.Quantize
    // long-id store: base build + 4 appends fragment every touched cell
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val path = java.nio.file.Files.createTempDirectory("ivfpq-compact").toString + "/index"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(
      emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
    (1 to 4).foreach { m =>
      Quantize.appendToIvfPqIndex(emb.filter(col("vec_id") % 5 === m),
        "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 64, 4, path)
    }
    def countFiles(p: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).count(_.getPath.endsWith(".parquet"))
    }
    def contents(p: String) = spark.read.parquet(p)
      .select("vec_id", "block", "code", "centroid_id")
      .collect().map(_.toString).toSet
    val queries = emb.filter(col("vec_id") < 10)
    def search() = Quantize.ivfPqSearchStored(spark, path,
        queries, "vec_id", "embedding", "vec_id",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)
      .collect().map(_.toString).toSet
    val (filesBefore, rowsBefore, searchBefore) = (countFiles(path), contents(path), search())
    assert(filesBefore > 8, s"fixture must be fragmented, got $filesBefore files")
    val stats = Quantize.compactIvfPqIndex(spark, path, maxRecordsPerFile = 1000000L)
    assert(stats.filesAfter < stats.filesBefore,
      s"compaction must shrink file count: $stats")
    assert(countFiles(path) == stats.filesAfter.toInt)
    assert(contents(path) == rowsBefore, "compaction must not change a single row")
    assert(search() == searchBefore, "probed search must be identical over the compacted store")
    // string-id store: numeric-looking cell dirs must survive the rewrite
    // (partition-type inference is pinned off inside the compactor)
    val up = Array.tabulate(8)(i => if (i < 4) 1.0f else 0.0f)
    val dn = Array.tabulate(8)(i => if (i < 4) 0.0f else 1.0f)
    val corpus = Seq(("a1", up.map(_ + 0.01f)), ("a2", up.map(_ + 0.02f)),
      ("b1", dn.map(_ + 0.01f)), ("b2", dn.map(_ + 0.02f))).toDF("vec_id", "embedding")
    val scents = Seq(("01", up), ("10", dn)).toDF("cid", "cv")
    val scb = Seq(("k0", up), ("k1", dn)).toDF("code_id", "c_emb")
    val spath = java.nio.file.Files.createTempDirectory("ivfpq-compact-str").toString + "/index"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(corpus, "vec_id", "embedding",
      scents, "cid", "cv", scb, "code_id", "c_emb", 8, 2), spath)
    def strStoreRows(p: String): Set[String] = {
      val dataFields = spark.read.parquet(p).schema.fields
        .filterNot(_.name == "centroid_id")
      val sch = org.apache.spark.sql.types.StructType(dataFields :+
        org.apache.spark.sql.types.StructField("centroid_id",
          org.apache.spark.sql.types.StringType))
      spark.read.schema(sch).parquet(p).collect().map(_.toString).toSet
    }
    val srowsBefore = strStoreRows(spath)
    Quantize.compactIvfPqIndex(spark, spath, maxRecordsPerFile = 1000000L)
    val sdirs = new java.io.File(spath).listFiles().map(_.getName)
      .filter(_.startsWith("centroid_id=")).sorted.toSeq
    assert(sdirs == Seq("centroid_id=01", "centroid_id=10"),
      s"string cell ids must round-trip through compaction: $sdirs")
    assert(strStoreRows(spath) == srowsBefore)
  }

  test("tombstone + retentionSweep: filtered search is exact delete at EVERY sweep state; threshold splits cells; orphans GC'd") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-retention").toString
    val store = dir + "/store"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), store)
    // retract: all of cell 0 (high per-cell fraction -> will cross the
    // threshold) plus every-13th vector elsewhere (low fraction -> won't)
    val byCell = spark.read.parquet(store)
      .select(col("vec_id"), col("centroid_id").cast("long")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cell0 = byCell.filter(_._2 == 0L).map(_._1).toSet
    assert(cell0.nonEmpty, "fixture needs a populated cell 0")
    val retracted = cell0 ++ byCell.map(_._1).filter(_ % 13 == 0)
    val queries = emb.filter(col("vec_id") < 20)
    def result(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // reference: search over an index BUILT without the retracted ids
    val refDir = dir + "/ref"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(
      emb.filter(!col("vec_id").isInCollection(retracted)), "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), refDir)
    val reference = result(Quantize.ivfPqSearchStored(spark, refDir,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2))
    def retained() = result(Quantize.ivfPqSearchStoredRetained(spark, store,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2))
    val n = Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id").isInCollection(retracted)).select("vec_id"), "vec_id")
    assert(n == retracted.size.toLong)
    // state 1 — all tombstones, nothing swept: exact delete semantics
    assert(retained() == reference, "pre-sweep filtered search must be exact delete")
    // state 2 — mixed: cell 0 is 100% dead, others ~1/13; threshold 0.5
    // sweeps exactly the all-dead cell(s) and keeps the sparse tombstones
    val stats = Quantize.retentionSweep(spark, store, "vec_id", 0.5)
    assert(stats.cellsSwept >= 1, s"cell 0 is 100% tombstoned, must sweep: $stats")
    assert(!new java.io.File(store, "centroid_id=0").exists(),
      "fully-retracted cell must lose its directory at sweep")
    assert(stats.tombstonesRemaining > 0,
      s"sparse cells stay tombstoned below threshold: $stats")
    assert(stats.tombstonesPurged + stats.tombstonesRemaining == n, s"$stats")
    assert(retained() == reference, "post-mixed-sweep filtered search must be exact delete")
    // state 3 — sweep everything: tombstones drain, rows physically gone,
    // the PLAIN stored search now equals the reference too
    val stats2 = Quantize.retentionSweep(spark, store, "vec_id", 1e-9)
    assert(stats2.tombstonesRemaining == 0, s"full sweep must drain: $stats2")
    assert(result(Quantize.ivfPqSearchStored(spark, store,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2)) == reference,
      "after a full sweep even the unfiltered stored search is the delete result")
    // state 4 — orphan GC: a tombstone for an id with no store rows is
    // purged from the set without opening any cell
    Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id").isInCollection(cell0.take(1))).select("vec_id"), "vec_id")
    val stats3 = Quantize.retentionSweep(spark, store, "vec_id", 1.0)
    assert(stats3 == Quantize.SweepStats(0, 0, 1, 0), s"orphan GC: $stats3")
    // crash-state fallback: with the main set retired to .old mid-swap,
    // reads see the OLD set (over-filtering is safe; vanishing is not)
    Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id") < 2).select("vec_id"), "vec_id")
    val fsPath = new java.io.File(store + ".tombstones")
    assert(fsPath.exists)
    assert(fsPath.renameTo(new java.io.File(store + ".tombstones.old")))
    assert(Quantize.readTombstones(spark, store, "vec_id").count() == 2,
      "mid-swap crash state must still read the retired tombstone set")
    // id-column contract fails loudly, like delete's
    val err = intercept[IllegalArgumentException] {
      Quantize.addTombstones(spark, store,
        emb.filter(col("vec_id") < 2).select(col("vec_id").as("doc_id")), "doc_id")
    }
    assert(err.getMessage.contains("doc_id"))
  }

  test("HighRecall policy: sqrt-N cells, third-of-cells probes clamped to cell count, depth floors") {
    import graft.operators.Quantize.HighRecall
    assert(HighRecall.nCells(2000) == 45)      // round(sqrt(2000))
    assert(HighRecall.nCells(100) == 16)       // floor: tiny corpora keep >= 16 cells
    assert(HighRecall.nCells(1000000) == 1000)
    assert(HighRecall.nProbe(45) == 15)        // ceil(45/3)
    assert(HighRecall.nProbe(8) == 8)          // floor 8, clamped to nCells
    assert(HighRecall.nProbe(5) == 5)          // never probe more cells than exist
    assert(HighRecall.nProbe(1000) == 334)
    assert(HighRecall.rerankDepth(3) == 100)   // floor 100
    assert(HighRecall.rerankDepth(10) == 100)
    assert(HighRecall.rerankDepth(50) == 500)  // 10k past the floor
  }

  test("tombstone crash/interlock: writers reinstate a crashed swap; retraction during a held lock fails loudly") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-ts-crash").toString
    val store = dir + "/store"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), store)
    assert(Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id") < 2).select("vec_id"), "vec_id") == 2)
    val main = new java.io.File(store + ".tombstones")
    val old = new java.io.File(store + ".tombstones.old")
    // crash between the sweep swap's rename(main->old) and rename(new->main):
    // only .old on disk. A subsequent APPEND must reinstate the prior set,
    // not recreate main holding only its own batch (which would silently
    // retire every earlier retraction — permanent under-filtering).
    assert(main.renameTo(old))
    assert(Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id") === 2).select("vec_id"), "vec_id") == 1)
    assert(Quantize.readTombstones(spark, store, "vec_id").count() == 3,
      "append after crashed swap must union with the reinstated prior set")
    assert(!old.exists, "crashed-swap .old must be consumed by the recovery")
    // same crash state entering a SWEEP: the swap converges it, and the
    // physical delete still covers every tombstone read via the fallback
    assert(main.renameTo(old))
    val stats = Quantize.retentionSweep(spark, store, "vec_id", 1e-9)
    assert(stats.tombstonesRemaining == 0, s"full sweep must drain: $stats")
    assert(!old.exists && !new java.io.File(store + ".tombstones.new").exists,
      "sweep from crash state must leave no intermediate tombstone dirs")
    assert(Quantize.readTombstones(spark, store, "vec_id").count() == 0)
    assert(spark.read.parquet(store).filter(col("vec_id") < 3).count() == 0,
      "ids tombstoned before the crash must be physically deleted by the sweep")
    // interlock: while a maintenance op holds the store lock (as the
    // retention sweep does), a retraction fails LOUDLY and retryably
    // instead of racing the tombstone-set swap
    graft.sources.StoreLock.acquire(spark, store, "spec-hold")
    try {
      intercept[graft.sources.StoreLock.StoreLockedException] {
        Quantize.addTombstones(spark, store,
          emb.filter(col("vec_id") === 9).select("vec_id"), "vec_id")
      }
    } finally graft.sources.StoreLock.release(spark, store)
    // and once released, the retraction goes through unchanged
    assert(Quantize.addTombstones(spark, store,
      emb.filter(col("vec_id") === 9).select("vec_id"), "vec_id") == 1)
  }

  test("self-contained store: persisted quantizers drive append/search/CLI; residual stored search equals in-memory") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val queries = emb.filter(col("vec_id") < 20)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq-selfc").toString
    def result(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // RAW store: self-contained search == explicit-frame stored search
    val raw = dir + "/raw"
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, raw)
    val viaStoredApi = result(Quantize.ivfPqSearchStored(spark, raw,
      queries, "vec_id", "embedding", "vec_id",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2))
    assert(result(Quantize.searchSelfContained(spark, raw,
        queries, "vec_id", "embedding", 3, 2)) == viaStoredApi,
      "self-contained raw search must equal the explicit-frame stored search")
    // RESIDUAL store: the NEW stored-residual path == in-memory residual
    val resCb = graft.operators.Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 16 && col("vec_id") < 32),
        "vec_id", "embedding", cents, "cid", "cv")
      .join(broadcast(cents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    val res = dir + "/res"
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4,
      residual = true, res)
    val inMem = result(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCb, "code_id", "c_emb", 64, 4, 3, 2))
    assert(result(Quantize.searchSelfContained(spark, res,
        queries, "vec_id", "embedding", 3, 2)) == inMem,
      "stored residual search must equal the in-memory residual search")
    // APPEND against stored quantizers == one-shot build over the union
    val part = dir + "/part"
    Quantize.buildSelfContained(spark, emb.filter(col("vec_id") % 3 =!= 0),
      "vec_id", "embedding", cents, "cid", "cv",
      codebook, "code_id", "c_emb", 64, 4, residual = false, part)
    Quantize.appendSelfContained(spark, part,
      emb.filter(col("vec_id") % 3 === 0), "embedding")
    assert(result(Quantize.searchSelfContained(spark, part,
        queries, "vec_id", "embedding", 3, 2)) == viaStoredApi,
      "append via stored quantizers must reproduce the full-corpus store")
    // TOMBSTONES are honored by the self-contained search
    Quantize.addTombstones(spark, raw,
      emb.filter(col("vec_id") === 21L).select("vec_id"), "vec_id")
    assert(!Quantize.searchSelfContained(spark, raw,
        queries, "vec_id", "embedding", 3, 2)
      .filter(col("neighbor_id") === 21L).collect().nonEmpty,
      "retracted id must not appear in self-contained search results")
    // a bare store (no persisted quantizers) fails loudly
    val bare = dir + "/bare"
    Quantize.writeIvfPqIndex(Quantize.ivfPqIndex(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), bare)
    val err = intercept[IllegalStateException] {
      Quantize.searchSelfContained(spark, bare, queries, "vec_id", "embedding", 3, 2)
    }
    assert(err.getMessage.contains("quantizers"))
    // CLI round-trip: build + status + search-to-parquet via run()
    val cli = dir + "/cli"
    val embP = dir + "/emb.parquet"; val cenP = dir + "/cen.parquet"
    val cbP = dir + "/cb.parquet"; val qP = dir + "/q.parquet"
    val outP = dir + "/out.parquet"
    emb.write.parquet(embP); cents.write.parquet(cenP)
    codebook.write.parquet(cbP); queries.write.parquet(qP)
    VectorStoreCtl.run(spark, Array("build", embP, "vec_id", "embedding",
      cenP, "cid", "cv", cbP, "code_id", "c_emb", "64", "4", "false", cli))
    VectorStoreCtl.run(spark, Array("status", cli))
    VectorStoreCtl.run(spark, Array("search", qP, "vec_id", "embedding",
      "3", "2", cli, outP))
    assert(result(spark.read.parquet(outP)) == viaStoredApi,
      "CLI search output must equal the API result")
    // REFINED stored search (the high-recall configuration): equals the
    // in-memory refined search over the same frames, and the tombstone
    // filter applies BEFORE the rescore (retracted ids cannot re-enter)
    val refInMem = result(Quantize.ivfPqSearchRefined(
      queries, "vec_id", "embedding", emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2, 10))
    assert(result(Quantize.searchSelfContainedRefined(spark, cli,
        queries, "vec_id", "embedding", emb, "embedding", 3, 2, 10)) == refInMem,
      "stored refined search must equal the in-memory refined search")
    assert(!Quantize.searchSelfContainedRefined(spark, raw,
        queries, "vec_id", "embedding", emb, "embedding", 3, 2, 10)
      .filter(col("neighbor_id") === 21L).collect().nonEmpty,
      "tombstoned id must not re-enter through the exact rescore")
    // CLI searchref with auto budgets resolves via Quantize.HighRecall
    // (8 cells -> nProbe 8, k=3 -> depth 100) and writes parquet
    val outR = dir + "/outref.parquet"
    VectorStoreCtl.run(spark, Array("searchref", qP, "vec_id", "embedding",
      "3", "auto", "auto", embP, "embedding", cli, outR))
    val autoRef = result(Quantize.searchSelfContainedRefined(spark, cli,
      queries, "vec_id", "embedding", emb, "embedding", 3,
      Quantize.HighRecall.nProbe(8), Quantize.HighRecall.rerankDepth(3)))
    assert(result(spark.read.parquet(outR)) == autoRef,
      "CLI searchref auto budgets must resolve via Quantize.HighRecall")
  }

  test("recellIvfPqStore: retrain equals from-scratch build on survivors; tombstones cleared; crash states recover") {
    import graft.operators.{Clustering, Quantize}
    import spark.implicits._
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val cents0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val cb0 = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val queries = emb.filter(col("vec_id") < 6)
    val dir = java.nio.file.Files.createTempDirectory("recell-").toString
    def result(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.orderBy("query_id", "rank").collect().map(_.toString).toSeq
    // lifecycle: build on a slice, append the rest, tombstone a third slice
    val store = dir + "/store"
    val isAppend = col("vec_id") % 4 === 1
    val isDead = col("vec_id") % 7 === 2
    Quantize.buildSelfContained(spark, emb.filter(!isAppend),
      "vec_id", "embedding", cents0, "cid", "cv", cb0, "code_id", "c_emb",
      64, 4, residual = false, store)
    Quantize.appendSelfContained(spark, store, emb.filter(isAppend), "embedding")
    Quantize.addTombstones(spark, store,
      emb.filter(isDead).select("vec_id"), "vec_id")
    val survivors = emb.filter(!isDead).localCheckpoint()
    val nSurv = survivors.count()
    // RECELL: retrain both quantizers on the live corpus
    val (nLive, gotCells) = Quantize.recellIvfPqStore(spark, store, emb,
      "embedding", nCells = 6, nCodes = 10, coarseMaxIter = 4, pqMaxIter = 2)
    assert(nLive == nSurv && gotCells == 6)
    // the gate: search-after-recell == from-scratch buildSelfContained on
    // the surviving corpus with identically-trained quantizers
    val fresh = dir + "/fresh"
    val freshCents = Clustering.kmeansFit(survivors, "vec_id", "embedding", 6, 4)
      .select(col("cluster").as("centroid_id"), col("centroid").as("cen_emb"))
      .localCheckpoint()
    val freshCb = Quantize.pqTrain(survivors, "vec_id", "embedding", 64, 4, 10, 2)
    Quantize.buildSelfContained(spark, survivors, "vec_id", "embedding",
      freshCents, "centroid_id", "cen_emb", freshCb, "code", "c_emb",
      64, 4, residual = false, fresh)
    val want = result(Quantize.searchSelfContained(spark, fresh,
      queries, "vec_id", "embedding", 4, 3))
    assert(result(Quantize.searchSelfContained(spark, store,
        queries, "vec_id", "embedding", 4, 3)) == want,
      "recelled store must serve exactly like a from-scratch rebuild on the survivors")
    assert(want.nonEmpty)
    // tombstones really cleared: a formerly-deleted id is re-appendable
    // and findable (the qx109 trick) — with stale tombstones it would be
    // silently filtered out of every search
    val readd = emb.filter(col("vec_id") === 9L) // 9 % 7 == 2 → was dead
    Quantize.appendSelfContained(spark, store, readd, "embedding")
    // refine depth past every candidate (the qx107 trick): all 6 cells
    // probed + full-depth exact rescore makes the served ranking exact
    // kNN over the live store, so a query placed AT id 9's vector (under
    // a fresh query id — the search excludes self-matches by id) MUST
    // surface it at distance 0 — unless a stale tombstone still filters it
    assert(Quantize.searchSelfContainedRefined(spark, store,
        readd.select(lit(900900L).as("vec_id"), col("embedding")),
        "vec_id", "embedding", emb, "embedding", 5, 6, 100000)
      .filter(col("neighbor_id") === 9L && col("rank") === 1L).count() == 1,
      "re-appended formerly-deleted id must be served again " +
        "(exact rescore at full depth: its own query vector is at distance 0)")
    // missing live vectors in the corpus fail LOUDLY (no silent data loss)
    val exMiss = intercept[IllegalStateException](Quantize.recellIvfPqStore(
      spark, store, emb.filter(col("vec_id") % 2 === 0), "embedding",
      nCells = 6, nCodes = 10, coarseMaxIter = 2, pqMaxIter = 1))
    assert(exMiss.getMessage.contains("missing from the corpus"))
    // retrainCodebook=false keeps the stored codebook, moves only cells
    val pre = Quantize.loadQuantizers(spark, store)._2
      .collect().map(_.toString).toSet
    Quantize.recellIvfPqStore(spark, store, emb, "embedding",
      nCells = 5, nCodes = -1, retrainCodebook = false, coarseMaxIter = 2)
    assert(Quantize.loadQuantizers(spark, store)._2
      .collect().map(_.toString).toSet == pre,
      "retrainCodebook=false must keep the stored codebook")
    // default geometry follows the corpus: nCells <= 0 -> HighRecall's sqrt-N
    val (n2, c2) = Quantize.recellIvfPqStore(spark, store, emb, "embedding",
      coarseMaxIter = 2, pqMaxIter = 1)
    assert(c2 == Quantize.HighRecall.nCells(n2))
    // CRASH 1 (pre-install): cells moved aside, nothing installed → roll back
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(store),
      spark.sparkContext.hadoopConfiguration)
    val preCrash = result(Quantize.searchSelfContained(spark, store,
      queries, "vec_id", "embedding", 4, 3))
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".recell-bak")))
    val exBak = intercept[java.io.IOException](Quantize.recellIvfPqStore(
      spark, store, emb, "embedding", nCells = 5, coarseMaxIter = 2))
    assert(exBak.getMessage.contains("recoverIvfPqRecell"))
    assert(Quantize.recoverIvfPqRecell(spark, store))
    assert(!Quantize.recoverIvfPqRecell(spark, store)) // idempotent no-op
    assert(result(Quantize.searchSelfContained(spark, store,
      queries, "vec_id", "embedding", 4, 3)) == preCrash)
    // CRASH 2 (mid-install): new cells in place, quantizers pending →
    // recovery must roll FORWARD (old quantizers + new cells would
    // corrupt every ADC distance)
    val liveNow = spark.read.parquet(store).select("vec_id").distinct()
      .join(emb, Seq("vec_id")).localCheckpoint()
    val nc = Clustering.kmeansFit(liveNow, "vec_id", "embedding", 7, 2)
      .select(col("cluster").as("centroid_id"), col("centroid").as("cen_emb"))
    val ncb = Quantize.pqTrain(liveNow, "vec_id", "embedding", 64, 4, 10, 1)
    Quantize.buildSelfContained(spark, liveNow, "vec_id", "embedding",
      nc, "centroid_id", "cen_emb", ncb, "code", "c_emb", 64, 4,
      residual = false, store + ".recell-new")
    val forwardWant = result(Quantize.searchSelfContained(spark,
      store + ".recell-new", queries, "vec_id", "embedding", 4, 3))
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".recell-bak")))
    assert(fs.rename(new org.apache.hadoop.fs.Path(store + ".quantizers"),
      new org.apache.hadoop.fs.Path(store + ".recell-bak.quantizers")))
    assert(fs.rename(new org.apache.hadoop.fs.Path(store + ".recell-new"),
      new org.apache.hadoop.fs.Path(store)))
    // crash point: .recell-new.quantizers not yet installed
    assert(Quantize.recoverIvfPqRecell(spark, store))
    assert(result(Quantize.searchSelfContained(spark, store,
        queries, "vec_id", "embedding", 4, 3)) == forwardWant,
      "roll-forward recovery must complete the new image")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".recell-bak")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(store + ".recell-bak.quantizers")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(store + ".recell-new.quantizers")))
  }

  test("vector-store maintenance daemon: sweeps on schedule, locked store is a skip not a crash") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val store = java.nio.file.Files.createTempDirectory("ivfpq-daemon")
      .toString + "/store"
    Quantize.buildSelfContained(spark, emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4,
      residual = false, store)
    // retract one full cell so the first cycle has real work
    val cell0 = spark.read.parquet(store)
      .filter(col("centroid_id").cast("long") === 0L)
      .select("vec_id").distinct()
    Quantize.addTombstones(spark, store, cell0, "vec_id")
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    var slept = 0L
    val cycles = VectorStoreCtl.runMaintenanceDaemon(spark, store,
      maxDeadFraction = 0.5, intervalMs = 3600000L, maxCycles = 2,
      sleep = ms => slept += ms, log = logs += _)
    assert(cycles == 2 && logs.size == 2, s"$cycles cycles, logs: $logs")
    assert(logs(0).contains("swept 1 cells"), s"cycle 1 must sweep cell 0: ${logs(0)}")
    assert(logs(1).contains("swept 0 cells"), s"cycle 2 must be a no-op: ${logs(1)}")
    assert(slept >= 3240000L && slept <= 3960000L,
      s"one inter-cycle sleep at ~interval±10%: $slept")
    assert(Quantize.readTombstones(spark, store, "vec_id").count() == 0,
      "full-cell retraction leaves no pending tombstones after the sweep")
    // a store locked by concurrent maintenance: daemon skips, never dies
    graft.sources.StoreLock.acquire(spark, store, "test-holder")
    try {
      val logs2 = scala.collection.mutable.ArrayBuffer.empty[String]
      val c2 = VectorStoreCtl.runMaintenanceDaemon(spark, store,
        maxDeadFraction = 0.5, intervalMs = 3600000L, maxCycles = 1,
        sleep = _ => (), log = logs2 += _)
      assert(c2 == 1 && logs2.head.contains("skipped"),
        s"locked store must skip the cycle: $logs2")
    } finally graft.sources.StoreLock.release(spark, store)
  }

  test("pcaTrain/pcaProject: orthonormal components, planted subspace recovered exactly, error monotone in m") {
    import spark.implicits._
    import graft.operators.Quantize
    // planted rank-2 corpus in 8 dims: x = a·e1 + b·e3, integer coefs
    // (exact in float), deterministic — top-2 PCA must recover the span
    val pts = (0 until 200).map { i =>
      val a = (i % 17 - 8).toFloat; val b = ((i * 7) % 23 - 11).toFloat
      (i.toLong, Array(a, 0f, b, 0f, 0f, 0f, 0f, 0f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (mean, comp) = Quantize.pcaTrain(df, "embedding", dims = 8, m = 2)
    // rows orthonormal
    for (r1 <- comp.indices; r2 <- comp.indices) {
      val dot = comp(r1).zip(comp(r2)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (r1 == r2) 1.0 else 0.0)) < 1e-9,
        s"components must be orthonormal: <$r1,$r2> = $dot")
    }
    // the span {e1, e3} is recovered: every component's energy outside
    // dims {0, 2} is ~zero (sign/order free)
    comp.foreach { c =>
      val outside = c.indices.filterNot(i => i == 0 || i == 2).map(i => c(i) * c(i)).sum
      assert(outside < 1e-9, s"component leaks outside the planted span: ${c.toSeq}")
    }
    // rank-2 data through 2 components reconstructs EXACTLY (μ + Pᵀ·y = x)
    def reconError(data: Seq[(Long, Array[Float])], mu: Array[Double],
                   p: Array[Array[Double]]): Double = {
      val src = data.map(_._2)
      val proj = Quantize.pcaProject(data.toDF("vec_id", "embedding"),
          "embedding", mu, p, "y")
        .orderBy("vec_id").select("y").collect().map(_.getSeq[Double](0))
      src.zip(proj).map { case (x, y) =>
        x.indices.map { i =>
          val xi = x(i).toDouble
          val xhat = mu(i) + p.indices.map(j => p(j)(i) * y(j)).sum
          (xi - xhat) * (xi - xhat)
        }.sum
      }.sum / src.size
    }
    assert(reconError(pts, mean, comp) < 1e-9,
      "rank-2 corpus must reconstruct exactly from its top-2 components")
    // real embeddings: error strictly shrinks as m grows, ~zero at m = d
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val real = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val errs = Seq(2, 8, 32, 64).map { m =>
      val (mu, p) = Quantize.pcaTrain(emb, "embedding", dims = 64, m = m)
      m -> reconError(real, mu, p)
    }
    errs.sliding(2).foreach { case Seq((m1, e1), (m2, e2)) =>
      assert(e2 < e1, s"error must shrink with m: m=$m1 → $e1, m=$m2 → $e2")
    }
    assert(errs.last._2 < 1e-6, s"full basis must reconstruct: ${errs.last}")
  }

  test("pcaProject is an exact isometry on a planted low-rank corpus: every pairwise L2 survives the 64→8 projection") {
    import spark.implicits._
    import graft.operators.Quantize
    // 120 vectors in a ROTATED 8-dim subspace of 64: integer coefficients
    // in dims 0..7, then Givens rotations smear the subspace across
    // block boundaries (so the test can't pass by PCA trivially reading
    // off coordinates). Pairwise differences cancel the mean, and the
    // components span the data's subspace, so ||y_i − y_j|| must equal
    // ||x_i − x_j|| exactly — the license for running every L2-based
    // downstream stage (k-means, PQ training, IVF search) at 8 dims.
    def rot(v: Array[Double], p: Int, q: Int, th: Double): Unit = {
      val c = math.cos(th); val s = math.sin(th)
      val vp = v(p); val vq = v(q)
      v(p) = c * vp - s * vq; v(q) = s * vp + c * vq
    }
    val pts = (0 until 120).map { i =>
      val x = new Array[Double](64)
      for (j <- 0 until 8) x(j) = ((i * (j + 3)) % 19 - 9).toDouble
      rot(x, 0, 8, 0.7); rot(x, 1, 16, 0.5); rot(x, 2, 24, 1.1)
      rot(x, 3, 40, 0.3); rot(x, 7, 63, 0.9); rot(x, 5, 33, 1.3)
      (i.toLong, x.map(_.toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (mu, p) = Quantize.pcaTrain(df, "embedding", dims = 64, m = 8)
    val proj = Quantize.pcaProject(df, "embedding", mu, p, "y")
      .orderBy("vec_id").select("y").collect().map(_.getSeq[Double](0).toArray)
    val full = pts.map(_._2.map(_.toDouble)).toArray
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var maxDev = 0.0
    for (i <- full.indices; j <- (i + 1) until full.length) {
      val dev = math.abs(d2(full(i), full(j)) - d2(proj(i), proj(j)))
      if (dev > maxDev) maxDev = dev
    }
    assert(maxDev < 1e-6,
      f"projection must preserve every pairwise squared distance; max deviation $maxDev%g")
  }

  test("pqTrain: Lloyd-trained codebook strictly reduces PQ distortion vs its own seed") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    // the seed IS pqTrain's init (first 16 vectors), so Lloyd's monotone
    // objective guarantees trained <= seeded; strict < is the "training
    // actually moved" check
    val seeded = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val trained = Quantize.pqTrain(emb, "vec_id", "embedding", 64, 4, 16, maxIter = 5)
    assert(trained.count() === 16L, "one trained codebook row per code")
    assert(trained.select(expr("size(c_emb)")).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(64), "full-width reassembly")
    def distortion(cb: org.apache.spark.sql.DataFrame, cid: String, cvec: String) =
      Quantize.pqEncode(emb, "vec_id", "embedding", cb, cid, cvec, 64, 4)
        .agg(sum("dist2")).collect()(0).getDouble(0)
    val dSeed = distortion(seeded, "code_id", "c_emb")
    val dTrained = distortion(trained, "code", "c_emb")
    info(f"PQ distortion: seeded $dSeed%.3f -> trained $dTrained%.3f")
    assert(dTrained < dSeed,
      f"training must reduce distortion: seed=$dSeed%.3f trained=$dTrained%.3f")
  }

  test("residual IVF-PQ beats raw IVF-PQ at equal code budget on clustered embeddings") {
    import spark.implicits._
    import graft.operators.Quantize
    // The regime residual encoding exists for: points scattered tightly
    // around well-separated cluster centers. 8 orthogonal-ish centers in
    // 64-dim, 150 points each, deterministic hash noise at ±0.15 per dim
    // (residual energy « raw energy). On the UNCLUSTERED synthetic corpus
    // the nearest centroid is farther than the origin and residual
    // encoding would hurt — see ivfPqIndexResidual's doc; this fixture is
    // the honest demonstration of where the variant pays.
    def h(i: Long, j: Int): Float = {
      val x = (i * 2654435761L + j * 40503L) & 0xffffL
      (x.toFloat / 0xffff - 0.5f) * 0.3f
    }
    val dims = 64
    val centers = (0 until 8).map { c =>
      Array.tabulate(dims)(j => if (j / 8 == c) 1.0f else 0.1f * h(c + 100L, j))
    }
    val vecs = (0L until 1200L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(dims)(j => centers(c)(j) + h(i, j)))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = centers.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("cid", "cv")
    // equal code budget: 16 entries each, seeded from the data each
    // variant actually quantizes (raw vectors vs observed residuals)
    val rawCodebook = vecs.take(16).map { case (i, v) => (i, v) }
      .toDF("code_id", "c_emb")
    val resCodebook = vecs.take(16).map { case (i, v) =>
      val c = centers((i % 8).toInt)
      (i, Array.tabulate(dims)(j => v(j) - c(j)))
    }.toDF("code_id", "c_emb")
    val queries = emb.filter(col("vec_id") < 16)
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= 5))
    val raw = pairs(Quantize.ivfPqSearch(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      rawCodebook, "code_id", "c_emb", dims, 4, 5, 2))
    val res = pairs(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", cents, "cid", "cv",
      resCodebook, "code_id", "c_emb", dims, 4, 5, 2))
    def recall(got: Set[(Long, Long)]) =
      (truth intersect got).size.toDouble / truth.size
    val (rRaw, rRes) = (recall(raw), recall(res))
    info(f"clustered recall@5: raw IVF-PQ $rRaw%.3f, residual IVF-PQ $rRes%.3f")
    assert(rRes > rRaw,
      f"residual must beat raw at equal code budget on clustered data: raw=$rRaw%.3f res=$rRes%.3f")
    assert(rRes > 0.5, f"residual recall implausibly low on easy clusters: $rRes%.3f")
  }

  test("trained end-to-end IVF-PQ (kmeansFit + pqTrain on residuals) beats the seeded build at equal budget") {
    import spark.implicits._
    import graft.operators.Quantize
    // same clustered regime as the residual-vs-raw row: 8 well-separated
    // centers, ±0.15/dim hash noise. The SEEDED build is qx69's shape —
    // centroids = first 8 corpus vectors (noisy cluster members, not
    // centers), codebook = observed residuals of 16 mid-corpus vectors
    // against those noisy centroids. The TRAINED build learns both from
    // the corpus: kmeansFit coarse centers + pqTrain on the residuals
    // against them. Equal budget (8 cells, 16 codes) — the recall delta
    // is attributable to training alone.
    def h(i: Long, j: Int): Float = {
      val x = (i * 2654435761L + j * 40503L) & 0xffffL
      (x.toFloat / 0xffff - 0.5f) * 0.3f
    }
    val dims = 64
    val centers = (0 until 8).map { c =>
      Array.tabulate(dims)(j => if (j / 8 == c) 1.0f else 0.1f * h(c + 100L, j))
    }
    val vecs = (0L until 1200L).map { i =>
      val c = (i % 8).toInt
      (i, Array.tabulate(dims)(j => centers(c)(j) + h(i, j)))
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 16)
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("d2", expr(
        """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= 5))
    def recall(got: Set[(Long, Long)]) =
      (truth intersect got).size.toDouble / truth.size
    // SEEDED (qx69 shape): first-8-vector centroids, observed-residual codes
    val seedCents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val seedResCb = graft.operators.Similarity.ivfAssign(
        emb.filter(col("vec_id") >= 16 && col("vec_id") < 32),
        "vec_id", "embedding", seedCents, "cid", "cv")
      .join(broadcast(seedCents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    val seeded = pairs(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", seedCents, "cid", "cv",
      seedResCb, "code_id", "c_emb", dims, 4, 5, 2))
    // TRAINED: the composed build — same budget, everything learned
    val (tCents, tCb) = Quantize.trainIvfPq(emb, "vec_id", "embedding",
      dims, nCells = 8, nBlocks = 4, nCodes = 16, coarseMaxIter = 10, pqMaxIter = 5)
    val trained = pairs(Quantize.ivfPqSearchResidual(queries, "vec_id", "embedding",
      emb, "vec_id", "embedding", tCents, "centroid_id", "cen_emb",
      tCb, "code", "c_emb", dims, 4, 5, 2))
    val (rSeed, rTrained) = (recall(seeded), recall(trained))
    info(f"clustered recall@5: seeded build $rSeed%.3f, trained build $rTrained%.3f")
    assert(rTrained > rSeed,
      f"training both quantizers must beat the seeded build: seeded=$rSeed%.3f trained=$rTrained%.3f")
    assert(rTrained > 0.5, f"trained recall implausibly low on easy clusters: $rTrained%.3f")
  }

  test("OPQ: trained rotation cuts PQ distortion and lifts recall at equal code budget; R is orthogonal") {
    import spark.implicits._
    import graft.operators.Quantize
    val dims = 32
    def h(i: Long, j: Int): Double = {
      val x = (i * 2654435761L + j * 97003L) & 0xffffL
      x.toDouble / 0xffff - 0.5
    }
    // Anisotropic latent space with RESOLVABLE neighborhoods: 8 coarse ×
    // 4 sub = 32 groups of 6 points. Group identity lives in latent dims
    // 0..11 (coarse ±2.0 in 0..7, sub ±0.8 in 8..11, noise 0.1
    // everywhere), then 45° Givens chains smear every latent dim across
    // all four PQ blocks. Each point's true top-5 is exactly its 5
    // sub-group mates. Under FIXED blocks, every block sees a quarter of
    // the separating energy for all 32 groups — 16 codes underfit and
    // candidates collide across groups; a learned rotation re-aligns the
    // 12 separating dims into whole blocks, where 16 codes resolve the
    // hierarchy. This is the regime OPQ exists for.
    def g(c: Long, j: Int): Double =
      if (((c * 2654435761L + j * 40503L) >> 7 & 1L) == 0L) -1.0 else 1.0
    def mix(x: Array[Double]): Array[Float] = {
      val y = x.clone()
      val is = math.sqrt(0.5)
      def giv(p: Int, q: Int): Unit = {
        val a = y(p); val b = y(q)
        y(p) = is * (a - b); y(q) = is * (a + b)
      }
      (0 until 16).foreach(j => giv(j, j + 16))
      (0 until 8).foreach(j => giv(j, j + 8))
      (16 until 24).foreach(j => giv(j, j + 8))
      y.map(_.toFloat)
    }
    val vecs = (for (grp <- 0 until 32; m <- 0 until 6) yield {
      val (coarse, sub) = (grp / 4, grp % 4)
      val i = (grp * 6 + m).toLong
      val lat = Array.tabulate(dims) { j =>
        (if (j < 8) 2.0 * g(coarse, j)
         else if (j < 12) 0.8 * g(1000L + sub, j)
         else 0.0) + 0.1 * h(i, j)
      }
      (i, mix(lat))
    }).toSeq
    val emb = vecs.toDF("vec_id", "embedding")
    def distortion(df: org.apache.spark.sql.DataFrame, vecCol: String,
                   cb: org.apache.spark.sql.DataFrame): Double =
      Quantize.pqEncode(df, "vec_id", vecCol, cb, "code", "c_emb", dims, 4)
        .agg(sum("dist2")).collect()(0).getDouble(0)
    // plain PQ and OPQ at the SAME budget: 4 blocks × 8 codes — aligned,
    // 8 codes exactly cover the 8 coarse patterns in one block; smeared,
    // each block faces 32 distinct projections and must collide
    val pqCb = Quantize.pqTrain(emb, "vec_id", "embedding", dims, 4, 8, maxIter = 8)
    val pqDist = distortion(emb, "embedding", pqCb)
    val (r, opqCb) = Quantize.opqTrain(emb, "vec_id", "embedding",
      dims, 4, 8, opqIters = 4, pqMaxIter = 8)
    // R must be orthogonal (R·Rᵀ = I) — the rotation preserves distances
    val rrT = Array.tabulate(dims, dims) { (i, j) =>
      (0 until dims).map(t => r(i)(t) * r(j)(t)).sum
    }
    val orthoDev = (for (i <- 0 until dims; j <- 0 until dims)
      yield math.abs(rrT(i)(j) - (if (i == j) 1.0 else 0.0))).max
    assert(orthoDev < 1e-6, s"R not orthogonal: max deviation $orthoDev")
    val rotated = Quantize.opqRotate(emb, "embedding", r, "__z")
      .select(col("vec_id"), col("__z"))
    val opqDist = distortion(rotated, "__z", opqCb)
    info(f"PQ distortion: plain $pqDist%.3f, OPQ $opqDist%.3f")
    assert(opqDist < pqDist,
      f"OPQ must cut distortion on anisotropic data: plain=$pqDist%.3f opq=$opqDist%.3f")
    // recall@5: rotated-space ADC search vs plain ADC search, same budget
    val queries = emb.filter(col("vec_id") < 18) // spans three full groups
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("d2").asc, col("neighbor_id").asc)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    val truth = pairs(emb
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(queries
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))))
      .withColumn("d2", expr(
        """aggregate(zip_with(qv, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE)),
          |  CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)""".stripMargin))
      .withColumn("rank", row_number().over(wL2)).filter(col("rank") <= 6)
      .withColumn("query_id", col("query_id"))) // self dropped in pairs()
    val plain = pairs(Quantize.pqSearch(queries, "vec_id", "embedding",
      Quantize.pqEncode(emb, "vec_id", "embedding", pqCb, "code", "c_emb", dims, 4)
        .select("vec_id", "block", "code"),
      "vec_id", pqCb, "code", "c_emb", dims, 4, 6))
    val rq = Quantize.opqRotate(queries, "embedding", r, "__z")
      .select(col("vec_id"), col("__z"))
    val opq = pairs(Quantize.pqSearch(rq, "vec_id", "__z",
      Quantize.pqEncode(rotated, "vec_id", "__z", opqCb, "code", "c_emb", dims, 4)
        .select("vec_id", "block", "code"),
      "vec_id", opqCb, "code", "c_emb", dims, 4, 6))
    def recall(got: Set[(Long, Long)]) =
      (truth intersect got).size.toDouble / truth.size
    val (rPlain, rOpq) = (recall(plain), recall(opq))
    info(f"anisotropic recall@5: plain PQ $rPlain%.3f, OPQ $rOpq%.3f")
    assert(rOpq > rPlain,
      f"OPQ must lift recall at equal budget: plain=$rPlain%.3f opq=$rOpq%.3f")
  }

  test("int8 quantization: tinyint storage, codes in range, round-trip error ≤ scale/2") {
    import org.apache.spark.sql.types.ByteType
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = graft.operators.Quantize.toInt8(emb, "vec_id", "embedding")
    // 4×-compression claim rests on actual int8 storage
    assert(q.schema("q_codes").dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType == ByteType)
    val back = graft.operators.Quantize.dequantize(q, "vec_id")
      .withColumnRenamed("embedding", "emb_hat")
    val joined = emb.join(back, "vec_id").join(q.select("vec_id", "q_scale"), "vec_id")
    val viol = joined.filter(expr(
      """exists(zip_with(embedding, emb_hat, (a, b) -> abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
        |  e -> e > CAST(q_scale AS DOUBLE) / 2.0 + 1e-9)""".stripMargin)).count()
    assert(viol == 0L, s"$viol vectors exceed the scale/2 reconstruction bound")
    assert(joined.count() == emb.count())
  }

  test("nearestInBucket tie-break is deterministic for STRING vector ids") {
    import spark.implicits._
    // three identical vectors, string ids — every pair ties at cosine 1.0;
    // each vector's reported neighbor must be the smallest OTHER id
    val emb = Seq(("v3", Seq(1f, 1f)), ("v1", Seq(1f, 1f)), ("v2", Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.nearestInBucket(emb, "vec_id", "embedding", 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("v1" -> "v2", "v2" -> "v1", "v3" -> "v1"))
  }

  test("pqEncode: codebook vectors self-assign at distance 0; broadcast codebook, no window; bad geometry rejected") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val codebook = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val out = graft.operators.Quantize.pqEncode(emb, "vec_id", "embedding",
      codebook, "code_id", "c_emb", 64, 4)
    val self = out.filter(col("vec_id") < 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(self.length == 16)
    self.foreach { case ((vid, blk), (code, d2)) =>
      assert(code == vid && d2 == 0.0, s"vec $vid block $blk -> code $code dist $d2")
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
    intercept[IllegalArgumentException] {
      graft.operators.Quantize.pqEncode(emb, "vec_id", "embedding",
        codebook, "code_id", "c_emb", 64, 5)
    }
  }

  test("pqSearch: exact self-match at rank 1 for codebook members; k past corpus size returns everything ranked") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 50)
    val codebook = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    val codes = graft.operators.Quantize.pqEncode(emb, "vec_id", "embedding",
      codebook, "code_id", "c_emb", 64, 4)
    val out = graft.operators.Quantize.pqSearch(
      emb.filter(col("vec_id") < 4), "vec_id", "embedding",
      codes, "vec_id", codebook, "code_id", "c_emb", 64, 4, 100)
    val rows = out.collect()
    // k=100 > 50 corpus vectors: every (query, vector) pair is ranked
    assert(rows.length == 4 * 50)
    // a codebook member's ADC distance to itself is exactly 0 → rank 1
    // (its codes point at its own sub-vectors)
    val top = rows.filter(_.getLong(2) == 1L)
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    (0L until 4L).foreach { q =>
      assert(top(q) == (q, 0.0), s"query $q top: ${top(q)}")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Quantize.pqSearch(emb, "vec_id", "embedding",
        codes, "vec_id", codebook, "code_id", "c_emb", 64, 4, 0)
    }
  }

  test("multi-probe rejects nProbe < 1") {
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.limit(2).select(col("vec_id").as("cid"), col("embedding").as("cv"))
    intercept[IllegalArgumentException] {
      Similarity.ivfKnnMultiProbe(emb.limit(5), emb, "vec_id", "embedding",
        cents, "cid", "cv", 3, 0)
    }
  }

  /** FROZEN REFERENCE of the original row-shaped IVF-PQ index build
    * (grouped-argmin assignment via ivfAssign + grouped-argmin encode
    * against the exploded broadcast codebook). The shipped build is
    * map-side expressions; this copy keeps the two implementations
    * provably bit-identical forever. */
  private def rowPathIndexReference(corpus: org.apache.spark.sql.DataFrame,
      cents: org.apache.spark.sql.DataFrame,
      codebook: org.apache.spark.sql.DataFrame,
      residual: Boolean): org.apache.spark.sql.DataFrame = {
    import graft.functions.{Dialect, TextExprs => TX}
    implicit val d: Dialect = Dialect(spark = true)
    graft.functions.GraftFunctions.register(spark)
    val (dims, nBlocks) = (64, 4)
    val w = dims / nBlocks
    val assigned = Similarity.ivfAssign(corpus, "vec_id", "embedding",
      cents, "cid", "cv")
    val base =
      if (!residual) assigned.withColumn("__res", col("embedding"))
      else assigned
        .join(broadcast(cents.select(col("cid").as("centroid_id"),
          col("cv").as("__cenv"))), "centroid_id")
        .withColumn("__res", expr(
          "zip_with(embedding, __cenv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
    val e = base
      .select(col("vec_id"), col("centroid_id"), col("__res"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__sub", expr(d.slice("__res", s"block * $w + 1", w)))
      .select(col("vec_id"), col("centroid_id"), col("block"), col("__sub"),
        expr(TX.dotAuto("__sub", "__sub")).as("__xx"))
    val c = codebook
      .select(col("code_id").as("code"), col("c_emb").as("__cv"),
        explode(expr(s"sequence(0L, ${nBlocks - 1}L)")).as("block"))
      .withColumn("__csub", expr(d.slice("__cv", s"block * $w + 1", w)))
      .select(col("code"), col("block"), col("__csub"),
        expr(TX.dotAuto("__csub", "__csub")).as("__cc"))
    e.join(broadcast(c), "block")
      .withColumn("__d2",
        col("__xx") - lit(2.0) * expr(TX.dotAuto("__sub", "__csub")) + col("__cc"))
      .groupBy(col("vec_id"), col("centroid_id"), col("block"))
      .agg(min_by(col("code"),
        struct(col("__d2").as("d"), col("code").as("tb"))).as("code"))
  }

  test("map-side index build: bit-identical to the frozen row-path reference, raw and residual") {
    import graft.operators.Quantize
    val emb = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val codebook = emb.filter(col("vec_id") >= 100 && col("vec_id") < 116)
      .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def explodeCodes(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id"), col("centroid_id"),
        posexplode(col("codes")).as(Seq("block", "code")))
      .select(col("vec_id"), col("centroid_id"),
        col("block").cast("long").as("block"), col("code"))
    assert(rows(explodeCodes(Quantize.ivfPqIndexCodes(emb, "vec_id", "embedding",
        cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4)))
      === rows(rowPathIndexReference(emb, cents, codebook, residual = false)),
      "raw map-side encode diverged from the row-path reference")
    // residual codebook in residual space (the qx69 seeding recipe)
    val seeds = emb.filter(col("vec_id") >= 200 && col("vec_id") < 216)
    val resCb = Similarity.ivfAssign(seeds, "vec_id", "embedding", cents, "cid", "cv")
      .join(broadcast(cents.withColumnRenamed("cid", "centroid_id")), "centroid_id")
      .withColumn("c_emb", expr(
        "zip_with(embedding, cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
      .select(col("vec_id").as("code_id"), col("c_emb"))
    assert(rows(explodeCodes(Quantize.ivfPqIndexResidualCodes(emb, "vec_id", "embedding",
        cents, "cid", "cv", resCb, "code_id", "c_emb", 64, 4)))
      === rows(rowPathIndexReference(emb, cents, resCb, residual = true)),
      "residual map-side encode diverged from the row-path reference")
    // the plan the map-side build exists for: the CORPUS never shuffles —
    // assignment and encode are expressions over the scan (the only
    // exchanges left are the one-row centroid/codebook collapses and
    // their broadcasts, all metadata-sized)
    val plan = Quantize.ivfPqIndexCodes(emb, "vec_id", "embedding",
      cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus-keyed shuffle crept back into the index build:\n${plan.take(2000)}")
  }
}
