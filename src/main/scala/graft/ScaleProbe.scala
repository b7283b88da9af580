package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for SCALE.md: inflate the documents corpus N× and time
  * the MinHash+LSH pipeline — the plan is one explode + doc-keyed shuffles,
  * so wall time should grow ~linearly with corpus size.
  * `runMain graft.ScaleProbe [sfDir] [bm25only]` */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bm25Only = args.contains("bm25only")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = Tables.t(spark, dir, "documents").select("doc_id", "text").cache()
    val n0 = base.count() // materialize cache so inflation cost is excluded

    // BM25F store-served probe: TWO field stores (title/body), corpus
    // inflated 1×/4×/16× with a FIXED query set. The fielded serve adds
    // exactly one (doc, term) merge exchange over candidate-bounded
    // rows on top of two pruned per-store scans, and the field-complete
    // gate is an O(1) epochs read per store — so the serve wall should
    // track the bucket bytes like single-field serving, with NO
    // corpus-scale term anywhere.
    if (args.contains("bm25f")) {
      graft.functions.GraftFunctions.register(spark)
      // a ≤5-token doc would leave an empty body — the field stores'
      // universes would diverge and the field-complete gate would refuse
      // (by design); BM25F fields must be total, so pad with the
      // placeholder token the operator's scaladoc prescribes
      def fieldize(df: org.apache.spark.sql.DataFrame) = df.select(
        col("doc_id"),
        expr("array_join(slice(graft_tokens(text), 1, 5), ' ')").as("title"),
        expr("coalesce(nullif(array_join(slice(graft_tokens(text), 6, 1000000), ' '), ''), 'emptybody')").as("body"))
      val queries = base.filter(col("doc_id") % 503 === 7)
      val warm = java.nio.file.Files.createTempDirectory("scale-bm25fw").toString
      for (f <- Seq("title", "body"))
        graft.operators.Retrieval.writeBm25Store(fieldize(base), f, "doc_id",
          s"$warm/$f", 64)
      val warmFields = Seq(
        graft.operators.Retrieval.Bm25StoreField(s"$warm/title", 2.0, 0.5),
        graft.operators.Retrieval.Bm25StoreField(s"$warm/body", 1.0, 0.75))
      graft.operators.Retrieval.bm25fTopKFromStores(spark, warmFields,
        queries, "text", "doc_id", 10, maxQueryTerms = 2).count() // warmup
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
        val path = java.nio.file.Files.createTempDirectory("scale-bm25f").toString
        val fielded = fieldize(inflated)
        for (f <- Seq("title", "body"))
          graft.operators.Retrieval.writeBm25Store(fielded, f, "doc_id",
            s"$path/$f", 64)
        val fields = Seq(
          graft.operators.Retrieval.Bm25StoreField(s"$path/title", 2.0, 0.5),
          graft.operators.Retrieval.Bm25StoreField(s"$path/body", 1.0, 0.75))
        val t0 = System.nanoTime()
        val hits = graft.operators.Retrieval.bm25fTopKFromStores(spark, fields,
          queries, "text", "doc_id", 10, maxQueryTerms = 2).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] bm25f_docs=${n0 * mult}%8d  serve=${secs}%6.2fs  hits: $hits")
      }
      spark.stop()
      return
    }

    // Curation compositions + kNN-graph build at 1×/4×/16× (round 14):
    // the bench's wall leaders qx34/qx65 (multi-gate curation) and qx86
    // (kNN-graph connected components) probed on an inflated corpus.
    // Inflation keeps the 1× dup/quality STRUCTURE instead of minting
    // clones: replica i suffixes every token with `_ri` (all shingles
    // move → no cross-replica near-dups, per-replica dup rate unchanged —
    // the realistic "new content arrived" shape) and rotates embeddings
    // by i dims (cross-replica cosine breaks). qx86's centroid count
    // scales ∝ √N — the standard IVF practice the fixed-constant bench
    // plan doesn't need at one SF but a 100 TB deployment would set.
    if (args.contains("curation")) {
      graft.functions.GraftFunctions.register(spark)
      val docsBase = Tables.t(spark, dir, "documents")
      val embBase = Tables.t(spark, dir, "embeddings")
      val nEmb = embBase.count()
      for (mult <- Seq(1, 4, 16)) {
        val tmp = java.nio.file.Files.createTempDirectory(s"scale-cur$mult-").toString
        (0 until mult).map { i =>
          if (i == 0) docsBase
          else docsBase
            .withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
            .withColumn("text", expr(
              s"array_join(transform(split(text, ' '), w -> concat(w, '_r$i')), ' ')"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
        (0 until mult).map { i =>
          if (i == 0) embBase
          else embBase
            .withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
            .withColumn("embedding", expr(
              s"concat(slice(embedding, ${i + 1}, 1000000), slice(embedding, 1, $i))"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
        for (q <- Seq("qx34_curation_pipeline", "qx65_curation_v2")) {
          val fn = SparkEntry.queries(q)
          fn(spark, tmp).count() // plan/codegen warm on this data
          val t0 = System.nanoTime()
          val n = fn(spark, tmp).count()
          println(f"[scale] ${q}_docs=${5000L * mult}%8d  " +
            f"wall=${(System.nanoTime() - t0) / 1e9}%6.2fs  rows: $n")
        }
        // qx86's body with √N centroids (8 at 1×) — the scale path
        val emb = Tables.t(spark, tmp, "embeddings")
        val nCents = (8 * math.sqrt(mult)).round.toInt
        val centroids = embBase.filter(col("vec_id") < nCents)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"))
        def knnGraph(): Long = {
          val edges = graft.operators.Similarity.ivfKnnJoin(emb, emb,
              "vec_id", "embedding", centroids, "centroid_id", "c_emb",
              3, nProbe = 2)
            .filter(col("cosine") >= 0.4)
            .select(col("query_id").as("u"), col("neighbor_id").as("v"))
          val cc = graft.operators.Graph.connectedComponents(edges, "u", "v")
          cc.groupBy("component").agg(count(lit(1))).count()
        }
        knnGraph() // warm
        val t1 = System.nanoTime()
        val groups = knnGraph()
        println(f"[scale] qx86_knn_graph_vecs=${nEmb * mult}%8d  " +
          f"centroids=$nCents%3d  " +
          f"wall=${(System.nanoTime() - t1) / 1e9}%6.2fs  groups: $groups")
      }
      spark.stop()
      return
    }

    // BM25 store: SERVING cost must track the query terms' bucket bytes
    // (a literal partition filter on postings AND df), never the corpus;
    // and APPEND cost must track the batch, never the standing store.
    // Corpus inflated 1×/4×/16× with a FIXED query set: the pruned-scan
    // fraction stays ~flat (both the buckets and the store grow with the
    // corpus) and the serving wall follows the bucket bytes — an unpruned
    // plan would read 64/|query buckets| times more at every row. Then a
    // FIXED batch appends to each store: ~flat walls down the column.
    {
      def dirBytes(f: java.io.File, pred: String => Boolean): Long = {
        def walk(g: java.io.File): Seq[java.io.File] =
          if (g.isDirectory) g.listFiles().toSeq.flatMap(walk) else Seq(g)
        walk(f).filter(g => g.getPath.endsWith(".parquet") && pred(g.getPath))
          .map(_.length()).sum
      }
      val queries = base.filter(col("doc_id") % 503 === 7)
      val batch = base.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
      val bn = batch.count()
      val warm = java.nio.file.Files.createTempDirectory("scale-bm25w").toString
      graft.operators.Retrieval.writeBm25Store(base, "text", "doc_id", warm, 64)
      graft.operators.Retrieval.bm25TopKFromStore(spark, warm, queries,
        "text", "doc_id", 10, maxQueryTerms = 2).count() // codegen warmup
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
            col("text")))
          .reduce(_ unionByName _)
        val path = java.nio.file.Files.createTempDirectory("scale-bm25").toString
        graft.operators.Retrieval.writeBm25Store(inflated, "text", "doc_id",
          path, 64)
        val t0 = System.nanoTime()
        val hits = graft.operators.Retrieval.bm25TopKFromStore(spark, path,
          queries, "text", "doc_id", 10, maxQueryTerms = 2).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // measured prune: bytes under the query terms' bucket dirs vs the
        // whole postings+df store (exactly what the partition filter reads)
        val qb = graft.operators.Retrieval
          .queryTerms(queries, "text", "doc_id", 2)
          .select(expr("graft_polyhash(term) % 64").as("b"))
          .distinct().collect().map(_.getLong(0)).toSet
        val isQB = (p: String) => qb.exists(b => p.contains(s"bucket=$b/"))
        val root = new java.io.File(path)
        val pruned = dirBytes(root, isQB)
        val total = dirBytes(root, _ => true)
        val t1 = System.nanoTime()
        graft.operators.Retrieval.appendBm25Store(batch, "text", "doc_id",
          path, epoch = 1L)
        val appendSecs = (System.nanoTime() - t1) / 1e9
        println(f"[scale] bm25_docs=${n0 * mult}%8d  buckets=${qb.size}%2d/64  " +
          f"pruned=${pruned}%9dB of ${total}%9dB (${100.0 * pruned / total}%4.1f%%)  " +
          f"serve=${secs}%6.2fs  hits: $hits  |  append_batch=$bn%6d  append=${appendSecs}%6.2fs")
        // delete a FIXED 100-doc set, then compact: delete pays one
        // column-pruned postings scan (broadcast delete set, zero bucket
        // rewrites) — wall should grow sub-linearly with the store;
        // compact rewrites only the affected buckets' bytes, reported as
        // the rewritten fraction
        // O(batch) TEXT delete first (round 10): deltas from re-tokenizing
        // a fixed 100-doc set — the wall must be flat in the STORE size
        // because the standing postings are never opened
        val dead2 = (1L to 100L).map(_ * 7L + 1L)
        val dead2Docs = base.filter(col("doc_id").isin(dead2: _*))
        dead2Docs.count() // materialize off the cached base; exclude from wall
        val tT = System.nanoTime()
        val nDelT = graft.operators.Retrieval.deleteFromBm25Store(spark, path,
          dead2Docs, "text", "doc_id", epoch = 2L)
        val delTextSecs = (System.nanoTime() - tT) / 1e9
        val dead = (1L to 100L).map(_ * 7L) // fixed set, present in every copy-0 slice
        val t2 = System.nanoTime()
        val nDel = graft.operators.Retrieval.deleteFromBm25Store(spark, path,
          spark.createDataset(dead)(org.apache.spark.sql.Encoders.scalaLong)
            .toDF("doc_id"), epoch = 3L)
        val delSecs = (System.nanoTime() - t2) / 1e9
        val preBytes = dirBytes(new java.io.File(s"$path/postings"), _ => true)
        val t3 = System.nanoTime()
        val removed = graft.operators.Retrieval.compactBm25Store(spark, path)
        val compSecs = (System.nanoTime() - t3) / 1e9
        val postBytes = dirBytes(new java.io.File(s"$path/postings"), _ => true)
        println(f"[scale] bm25_docs=${n0 * mult}%8d  delete_docs=$nDel%4d  " +
          f"delete_scan=${delSecs}%6.2fs  delete_text($nDelT%4d)=${delTextSecs}%6.2fs  |  " +
          f"compact_rows=$removed%6d  " +
          f"compact=${compSecs}%6.2fs  store ${preBytes}%9dB -> ${postBytes}%9dB")
      }
    }
    if (bm25Only) { spark.stop(); return }
    val vecOnly = args.contains("veconly")

    if (!vecOnly) {
    // untimed warmup: compile the pipeline's codegen units once so the 1×
    // measurement reflects steady-state throughput, not Janino compiles
    graft.operators.Dedup.minhashBands(
      graft.operators.Dedup.minhashSignature(base, "text", "doc_id", 16, 3),
      "doc_id", 16, 4).count()

    for (mult <- Seq(1, 4, 16, 64)) {
      val inflated = (0 until mult).map(i =>
        base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
      val t0 = System.nanoTime()
      val sig = graft.operators.Dedup.minhashSignature(inflated, "text", "doc_id", 16, 3)
      val nBuckets = graft.operators.Dedup.minhashBands(sig, "doc_id", 16, 4).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] docs=${n0 * mult}%7d  minhash+bands=${secs}%6.2fs  buckets>=2: $nBuckets")
    }

    // Bloom decontamination: the BENCHMARK is fixed (bits built once,
    // outside the timed region — the deployment shape) while the corpus
    // inflates. The Bloom test is a scan projection and only survivors
    // shuffle, so wall should track the corpus ~linearly; a plan that
    // re-shuffled the whole shingle volume would grow its exchange 16×
    // and show it here
    {
      val bench = base.filter(col("doc_id") % 29 === 3)
      val side = graft.operators.TextAnalysis.bloomBuild(bench, "text", "doc_id", 4)
      graft.operators.TextAnalysis.contaminationWithBloom(
        base.filter(col("doc_id") % 29 =!= 3), side, "text", "doc_id", 4, 1L).count()
      for (mult <- Seq(1, 4, 16)) {
        val corpus = (0 until mult).map(i =>
          base.filter(col("doc_id") % 29 =!= 3)
            .select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _)
        val t0 = System.nanoTime()
        val hits = graft.operators.TextAnalysis.contaminationWithBloom(
          corpus, side, "text", "doc_id", 4, 1L).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] bloom_decon_docs=${(n0 - bench.count()) * mult}%8d  " +
          f"decon=${secs}%6.2fs  contaminated_pairs: $hits")
      }
    }

    // sequence packing: the global-prefix-sum decomposition should also be
    // ~linear (range shuffle + pid-local windows); a single-partition
    // window plan would flatline one core here and give super-linear walls
    base.unpersist() // don't let the corpus cache skew the packing probe
    graft.operators.Packing.packSequential(
      spark.range(1000).select(col("id"), lit(10L).as("n")), "id", "n", 128L).count()
    for (mult <- Seq(1, 4, 16)) {
      val n = 2000000L * mult
      val docs = spark.range(n).select(col("id"), (col("id") % 97 + 1).as("n"))
      val t0 = System.nanoTime()
      val packs = graft.operators.Packing.packSequential(docs, "id", "n", 2048L)
        .select(max("end_pack")).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] pack_docs=$n%9d  pack=${secs}%6.2fs  packs: ${packs + 1}")
    }
    } // !vecOnly

    // IVF-PQ: index build + probed search, corpus inflated 1×/4×/16× —
    // build is the default two-exchange row algorithm (the exchange-free
    // codes build is the measured opt-in for >~100k vectors, SCALE.md),
    // search touches only probed cells' codes, so both should scale
    // ~linearly with corpus size (an all-pairs or unpruned plan would not)
    {
      val emb0 = Tables.t(spark, dir, "embeddings")
        .select("vec_id", "embedding").cache()
      val e0 = emb0.count()
      val cents = emb0.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"))
      val codebook = emb0.filter(col("vec_id") < 16)
        .select(col("vec_id").as("code_id"), col("embedding").as("c_emb"))
      val queries = emb0.filter(col("vec_id") < 20)
      graft.operators.Quantize.ivfPqSearch(queries, "vec_id", "embedding",
        emb0, "vec_id", "embedding", cents, "cid", "cv",
        codebook, "code_id", "c_emb", 64, 4, 3, 2).count() // codegen warmup
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val t0 = System.nanoTime()
        val rows = graft.operators.Quantize.ivfPqSearch(
          queries, "vec_id", "embedding", inflated, "vec_id", "embedding",
          cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] ivfpq_vecs=${e0 * mult}%8d  build+search=${secs}%6.2fs  hits: $rows")
      }

      // batch ADC (qx87's operator): the WHOLE corpus queries the PQ index
      // at 1×/4×/16×, centroid count scaled with the corpus (constant
      // expected cell size) — candidate work is N × nProbe × cellSize, so
      // walls should grow ~LINEARLY in N. The codes-array path (round 10)
      // reduced the plan to map-side build (zero corpus shuffles) + one
      // cell equi-join + a per-candidate distance expression + the rank
      // window; this column is the measured evidence the batch tail's
      // growth is the algorithm's own output scale, not a stage-constant
      // blowup.
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val centsM = inflated.filter(col("vec_id") < 8L * mult)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val t0 = System.nanoTime()
        val idx = graft.operators.Quantize.ivfPqIndexCodes(
          inflated, "vec_id", "embedding",
          centsM, "cid", "cv", codebook, "code_id", "c_emb", 64, 4)
        val rows = graft.operators.Quantize.ivfPqSearchAllCodes(
          inflated, "vec_id", "embedding", idx, "vec_id",
          centsM, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, 3, 2).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] batchadc_vecs=${e0 * mult}%8d  cells=${8 * mult}%4d  " +
          f"build+search=${secs}%6.2fs  rows: $rows")
      }

      // sidecar refine vs corpus-table refine (round 10): the exact
      // rescore's big scan is the probed cells of `.vectors` instead of
      // the whole lake table. Cells scale with the corpus (constant cell
      // size) while the probe budget stays fixed, so the sidecar refine
      // scans ~CONSTANT rows as N grows where the corpus-table refine
      // reads all N — these walls are the measured form of that claim.
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _).localCheckpoint()
        val centsM = inflated.filter(col("vec_id") < 8L * mult)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val work = java.nio.file.Files
          .createTempDirectory(s"scale-sidecar-$mult-").toString
        val store = s"$work/store"
        graft.operators.Quantize.buildSelfContained(spark, inflated,
          "vec_id", "embedding", centsM, "cid", "cv",
          codebook, "code_id", "c_emb", 64, 4, residual = false, store,
          storeVectors = true)
        // the lake table the corpus-refine reads is PARQUET, like the
        // sidecar — comparing a disk scan against a cached frame would
        // flatter whichever side held the cache
        inflated.write.parquet(s"$work/lake")
        val lake = spark.read.parquet(s"$work/lake")
        val t0 = System.nanoTime()
        val r1 = graft.operators.Quantize.searchSelfContainedRefinedStored(
          spark, store, queries, "vec_id", "embedding", 3, 2, 12).count()
        val s1 = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val r2 = graft.operators.Quantize.searchSelfContainedRefined(
          spark, store, queries, "vec_id", "embedding",
          lake, "embedding", 3, 2, 12).count()
        val s2 = (System.nanoTime() - t1) / 1e9
        // the claim's units: rows the rescore's big scan reads — probed
        // sidecar cells vs the whole lake (untimed bookkeeping)
        val probed = graft.operators.Similarity.probeAssignLarge(
            queries, "vec_id", "embedding", centsM, "cid", "cv", 2)
          .select("centroid_id").distinct()
          .collect().map(_.get(0)).toSet
        val scanRows = spark.read.parquet(s"$store.vectors")
          .filter(col("centroid_id").isInCollection(probed.toSeq)).count()
        println(f"[scale] sidecar_vecs=${e0 * mult}%8d  cells=${8 * mult}%4d  " +
          f"refine_sidecar=${s1}%6.2fs  refine_corpus=${s2}%6.2fs  " +
          f"scan_rows ${scanRows}%6d vs ${e0 * mult}%6d  rows: $r1/$r2")
      }

      // INCREMENTAL recell vs full recell (round 11): rewrite volume must
      // track the DRIFTED-CELL MASS, not the store size. Fixture = the
      // measured drift shape (RECALL.md): a uniform base over 8 seeded
      // cells plus a concentrated slab (N/4 vectors pulled toward ONE
      // centroid — (N/8 + N/4)/(1.25N/8) = 2.4x the mean, clearly past
      // the 2x threshold) appended against the frozen quantizers — that
      // cell bloats, the rest are untouched. Twin stores remediate with (a)
      // splitDriftedCells and (b) recellIvfPqStoreFromSidecar; the probe
      // prints rows-rewritten and walls at 1× and 4×: the split's
      // rewrite stays ∝ the fat cell while the recell's tracks N.
      for (mult <- Seq(1, 4)) {
        val base = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val cen7 = emb0.filter(col("vec_id") === 7)
          .select(col("embedding").as("c7"))
        val slab = base.limit((e0.toInt * mult) / 4)
          .crossJoin(broadcast(cen7))
          .select((col("vec_id") + 50000000L).as("vec_id"),
            expr("zip_with(embedding, c7, (x, c) -> " +
              "CAST(CAST(0.05 AS DOUBLE) * x + CAST(0.95 AS DOUBLE) * c AS FLOAT))")
              .as("embedding"))
          .localCheckpoint()
        val centsM = base.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val work = java.nio.file.Files
          .createTempDirectory(s"scale-split-$mult-").toString
        val (a, b) = (s"$work/a", s"$work/b")
        for (p <- Seq(a, b)) {
          graft.operators.Quantize.buildSelfContained(spark, base,
            "vec_id", "embedding", centsM, "cid", "cv",
            codebook, "code_id", "c_emb", 64, 4, residual = false, p,
            storeVectors = true)
          graft.operators.Quantize.appendSelfContained(spark, p, slab,
            "embedding")
        }
        val n = e0 * mult + slab.count()
        val t0 = System.nanoTime()
        val (cellsSplit, rewritten) =
          graft.operators.Quantize.splitDriftedCells(spark, a,
            overshoot = 2.0, splitWays = 4)
        val sSplit = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val (nLive, _) = graft.operators.Quantize.recellIvfPqStoreFromSidecar(
          spark, b, nCells = 8 + 3, nCodes = 16,
          retrainCodebook = false, coarseMaxIter = 5)
        val sRecell = (System.nanoTime() - t1) / 1e9
        println(f"[scale] cellsplit_vecs=$n%8d  split: $cellsSplit cells / " +
          f"$rewritten%6d rows rewritten in ${sSplit}%6.2fs  vs  full recell: " +
          f"$nLive%6d rows rewritten in ${sRecell}%6.2fs")
      }

      // large-to-large kNN JOIN (qx84's operator): full corpus self-join at
      // 1×/4×/16× with the CENTROID COUNT scaled with the corpus, holding
      // expected cell size constant — candidate-pair work is
      // cells × |L_cell|×|R_cell|, so walls should grow ~linearly with
      // corpus size. An all-pairs plan would grow quadratically (16× data
      // → 256× pairs) and a broadcast-query-side plan would die on the
      // driver long before corpus scale — this probe is the evidence the
      // operator does neither.
      graft.operators.Similarity.ivfKnnJoin(emb0, emb0, "vec_id", "embedding",
        cents, "cid", "cv", 3, 2).count() // codegen warmup
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        // copy-0 ids are below the shift stride, so this picks 8×mult
        // DISTINCT original vectors as seeds
        val centsM = inflated.filter(col("vec_id") < 8L * mult)
          .select(col("vec_id").as("cid"), col("embedding").as("cv"))
        val t0 = System.nanoTime()
        val rows = graft.operators.Similarity.ivfKnnJoin(
          inflated, inflated, "vec_id", "embedding",
          centsM, "cid", "cv", 3, 2).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] knnjoin_vecs=${e0 * mult}%8d  cells=${8 * mult}%4d  " +
          f"join=${secs}%6.2fs  rows: $rows")
      }

      // incremental append: a FIXED batch appended to a stored index whose
      // standing corpus grows 1×/4×/16× — per-batch cost must track the
      // BATCH (≈flat walls down this column), not the store; a
      // rebuild-shaped "append" would grow linearly here
      val batch = emb0.filter(col("vec_id") % 10 === 7)
        .select((col("vec_id") + lit(900000000L)).as("vec_id"), col("embedding"))
      val bn = batch.count()
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val path = java.nio.file.Files.createTempDirectory("scale-ivfpq-app")
          .toString + "/index"
        graft.operators.Quantize.writeIvfPqIndex(
          graft.operators.Quantize.ivfPqIndex(inflated, "vec_id", "embedding",
            cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
        val t0 = System.nanoTime()
        graft.operators.Quantize.appendToIvfPqIndex(batch, "vec_id", "embedding",
          cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4, path)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] append_store=${e0 * mult}%8d  batch=$bn%5d  append=${secs}%6.2fs")
      }
      // delete: surgery cost tracks the REWRITTEN cells, not the store —
      // a fixed-SIZE delete set confined to 1 cell rewrites ~1/8 the
      // bytes of the same-size set spread over all 8 cells, so walls
      // should grow down this column with cell spread; a rebuild-shaped
      // delete would cost the same at every spread
      for (spread <- Seq(1, 4, 8)) {
        val inflated = (0 until 4).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val path = java.nio.file.Files.createTempDirectory("scale-ivfpq-del")
          .toString + "/index"
        graft.operators.Quantize.writeIvfPqIndex(
          graft.operators.Quantize.ivfPqIndex(inflated, "vec_id", "embedding",
            cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
        val pairs = spark.read.parquet(path)
          .select(col("vec_id"), col("centroid_id").cast("string"))
          .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
        val cells = pairs.map(_._2).distinct.sorted.take(spread)
        val perCell = 96 / spread
        val ids = cells.flatMap(c =>
          pairs.filter(_._2 == c).map(_._1).sorted.take(perCell)).toSeq
        val doomed = spark.createDataset(ids)(
          org.apache.spark.sql.Encoders.scalaLong).toDF("vec_id")
        def cellBytes(only: Option[Set[String]]): Long = {
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
          walk(new java.io.File(path))
            .filter(f => f.getPath.endsWith(".parquet") && only.forall(cs =>
              cs.exists(c => f.getPath.contains(s"centroid_id=$c/"))))
            .map(_.length()).sum
        }
        val total = cellBytes(None)
        val t0 = System.nanoTime()
        val removed = graft.operators.Quantize.deleteFromIvfPqIndex(
          spark, path, doomed, "vec_id")
        val secs = (System.nanoTime() - t0) / 1e9
        // bytes REWRITTEN = post-delete bytes of the affected cells (plus
        // the walls, which at this store size are fixed-cost-dominated);
        // the untouched-files-byte-identical invariant is asserted in
        // BatchingOpsSpec — this line shows the rewrite FRACTION scaling
        // with cell spread while rows_removed stays constant
        val rewritten = cellBytes(Some(cells.toSet))
        println(f"[scale] delete_cells=$spread%2d  ids=${ids.size}%3d  rows_removed=$removed%4d  " +
          f"rewritten=${rewritten}%8dB of ${total}%8dB (${100.0 * rewritten / total}%4.1f%%)  delete=${secs}%6.2fs")
      }
      // retention sweep: cost tracks the AFFECTED cells, not the store —
      // dead rows confined to ONE cell (half that cell's vectors
      // tombstoned, so it crosses any threshold below 0.5 while every
      // other cell holds zero dead rows) at store 1×/4×/16×. The sweep's
      // only store-sized cost is the single column-pruned (id, cell)
      // scan that computes per-cell fractions; the rewrite opens just
      // the crossing cell — so rewritten bytes stay a ~constant FRACTION
      // of the store (one cell of 8) instead of the 100% a rebuild-shaped
      // sweep would pay, and walls grow with the affected cell, not the
      // corpus
      for (mult <- Seq(1, 4, 16)) {
        val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
          .reduce(_ unionByName _)
        val path = java.nio.file.Files.createTempDirectory("scale-ivfpq-sweep")
          .toString + "/index"
        graft.operators.Quantize.writeIvfPqIndex(
          graft.operators.Quantize.ivfPqIndex(inflated, "vec_id", "embedding",
            cents, "cid", "cv", codebook, "code_id", "c_emb", 64, 4), path)
        val pairs = spark.read.parquet(path)
          .select(col("vec_id"), col("centroid_id").cast("string"))
          .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
        val cell = pairs.map(_._2).distinct.sorted.head
        val cellIds = pairs.filter(_._2 == cell).map(_._1).sorted
        val doomedIds = cellIds.take(cellIds.length / 2).toSeq
        graft.operators.Quantize.addTombstones(spark, path,
          spark.createDataset(doomedIds)(
            org.apache.spark.sql.Encoders.scalaLong).toDF("vec_id"), "vec_id")
        def cellBytes2(only: Option[Set[String]]): Long = {
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
          walk(new java.io.File(path))
            .filter(f => f.getPath.endsWith(".parquet") && only.forall(cs =>
              cs.exists(c => f.getPath.contains(s"centroid_id=$c/"))))
            .map(_.length()).sum
        }
        val total = cellBytes2(None)
        val t0 = System.nanoTime()
        val stats = graft.operators.Quantize.retentionSweep(
          spark, path, "vec_id", 0.3)
        val secs = (System.nanoTime() - t0) / 1e9
        val rewritten = cellBytes2(Some(Set(cell)))
        println(f"[scale] sweep_store=${e0 * mult}%8d  dead=${doomedIds.size}%5d  " +
          f"cells_swept=${stats.cellsSwept}  rows_removed=${stats.rowsRemoved}%6d  " +
          f"rewritten=${rewritten}%8dB of ${total}%9dB (${100.0 * rewritten / total}%4.1f%%)  " +
          f"sweep=${secs}%6.2fs")
      }
      emb0.unpersist()
    }

    // connected components: synthetic chains of 8 (worst-ish shape for
    // min-propagation alone; pointer jumping keeps rounds O(log n)), grown
    // 1×/4×/16× — wall time should grow ~linearly, rounds logarithmically
    for (mult <- Seq(1, 4, 16)) {
      val n = 100000L * mult
      val edges = spark.range(n).toDF("u")
        .filter(col("u") % 8 =!= 7)
        .select(col("u"), (col("u") + 1).as("v"))
      val t0 = System.nanoTime()
      val comps = graft.operators.Graph.connectedComponents(edges, "u", "v")
        .select(countDistinct("component")).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scale] cc_nodes=$n%8d  cc=${secs}%6.2fs  components: $comps")
    }
    spark.stop()
  }
}
