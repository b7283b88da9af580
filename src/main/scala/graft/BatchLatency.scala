package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-serving latency probe (round 13): POST /search with a
  * `queries` array of N payloads — ONE parameterized multi-query plan —
  * vs N sequential single-query POSTs, both uncached (cache_size 0), at
  * batch sizes 1/4/16. The committed number is amortized per-query p50
  * at n=16: a RAG pipeline ships query batches, and the engine's
  * per-request floor (plan construction + scheduling barriers) amortizes
  * across the batch while the pruned scans parallelize.
  *
  * Usage: runMain graft.BatchLatency [sfDir] [outDir]
  */
object BatchLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "."
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.t(spark, sfDir, "documents")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val corpus = hybrid.filter(!isQuery)
    val work = java.nio.file.Files.createTempDirectory("batch-lat-").toString
    graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$work/lex", 64)
    graft.operators.Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
      "centroid_id", "cen_emb",
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
      "code_id", "cb_emb", 64, 4, residual = false, s"$work/vec",
      storeVectors = true)
    val conf = graft.serve.SearchApi.RetrievalConf(s"$work/lex", s"$work/vec",
      corpusPath = None, idCol = "doc_id", textCol = "text",
      vecCol = "embedding", depth = 20, nProbe = 2, rerankDepth = 100,
      maxQueryTerms = 6, maxK = 100)
    val api = new graft.serve.SearchApi(spark, conf) // no cache: uncached

    // 16 distinct query payloads — the hybrid query slice holds ~9 docs
    // at sf0.1, so payloads cycle the docs with shifted 6-token windows
    // (distinct texts ⇒ distinct queries/cache keys; vectors reuse the
    // doc's embedding, a realistic multi-query-per-document shape)
    val qRows = hybrid.filter(isQuery).select("text", "embedding")
      .limit(16).collect()
    require(qRows.nonEmpty, "no hybrid query docs")
    val texts = (0 until 16).map { i =>
      val words = qRows(i % qRows.length).getString(0).split("\\s+")
      words.slice(i / qRows.length * 3, i / qRows.length * 3 + 6)
        .mkString(" ")
    }
    val vecs = (0 until 16).map(i => qRows(i % qRows.length).getSeq[Float](1))
    def jstr(s: String) = "\"" + graft.sources.Serve.jsonEscape(s) + "\""

    def batchBody(mode: String, n: Int): String = {
      val items = (0 until n).map { i =>
        if (mode == "lexical") s"""{"text":${jstr(texts(i))}}"""
        else s"""{"text":${jstr(texts(i))},"vector":${vecs(i).mkString("[", ",", "]")}}"""
      }.mkString("[", ",", "]")
      s"""{"queries":$items,"k":10,"mode":"$mode"}"""
    }
    def singles(mode: String, n: Int): Unit = (0 until n).foreach { i =>
      val r = api.search(texts(i),
        if (mode == "lexical") Seq.empty else vecs(i), 10, mode, Seq.empty)
      require(r.status == 200, r.body.take(150))
    }
    // warm both shapes (codegen + listings)
    for (mode <- Seq("lexical", "hybrid")) {
      require(api.searchPost(batchBody(mode, 16)).status == 200)
      singles(mode, 2)
    }
    val reps = 5
    val md = new StringBuilder
    val rows = for (mode <- Seq("lexical", "hybrid"); n <- Seq(1, 4, 16)) yield {
      def p50(f: => Unit): Double = {
        val walls = (0 until reps).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
        }.sorted
        walls(reps / 2)
      }
      val batchWall = p50 {
        require(api.searchPost(batchBody(mode, n)).status == 200)
      }
      val singleWall = p50(singles(mode, n))
      println(f"[batch-lat] $mode%-8s n=$n%2d  batch=${batchWall}%7.0f ms " +
        f"(${batchWall / n}%6.1f ms/q)  sequential-singles=${singleWall}%7.0f ms " +
        f"(${singleWall / n}%6.1f ms/q)")
      (mode, n, batchWall, singleWall)
    }

    val marker = "## Batch serving latency"
    val path = java.nio.file.Paths.get(s"$outDir/STREAMLAT.md")
    val existing =
      if (java.nio.file.Files.exists(path))
        new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      else ""
    val (kept, keptAfter) = existing.indexOf(marker) match {
      case -1 => (existing, "")
      case i =>
        val rest = existing.substring(i + marker.length)
        val next = rest.indexOf("\n## ")
        (existing.substring(0, i), if (next == -1) "" else rest.substring(next))
    }
    val out = new StringBuilder(kept)
    out.append(s"""$marker (round 13)

`runMain graft.BatchLatency $sfDir` — POST /search with a `queries`
array (ONE parameterized multi-query plan; per-item envelopes
byte-identical to the single route, spec-gated) vs the same payloads as
sequential single-query calls, both UNCACHED, median of $reps. The
per-request floor (plan construction + scheduling barriers, ~13 jobs
for hybrid) is paid once per batch instead of once per query.

| mode | batch size | batch wall | per query | sequential singles | per query |
|---|---|---|---|---|---|
""")
    for ((mode, n, bw, sw) <- rows)
      out.append(f"| $mode | $n | ${bw}%.0f ms | ${bw / n}%.1f ms | ${sw}%.0f ms | ${sw / n}%.1f ms |\n")
    out.append(keptAfter)
    java.nio.file.Files.writeString(path, out.toString)
    println(s"[batch-lat] appended section to $outDir/STREAMLAT.md")
    spark.stop()
  }
}
