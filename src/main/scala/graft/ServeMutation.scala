package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serve-under-mutation probe (round 12): the version-token cache, the
  * committed-epoch snapshot reads, and the optimistic physical-token
  * bracket all claim that serving stays EXACT while the stores mutate —
  * this measures the claim instead of asserting it.
  *
  * Protocol: build the two stores, then SEQUENTIALLY apply a lifecycle
  * of mutations (lex append → vec append → lex delete → vec tombstone →
  * lex compact → vec sweep → vec cell split), capturing each payload's
  * exact serving answer at EVERY intermediate state — the reference
  * ledger. Then rebuild identical stores and replay the same mutations
  * from a mutator thread while N closed-loop clients hammer a live
  * ApiServer (result cache ON — the deployment default). Assertions:
  * every response is HTTP 200 (no 5xx under mutation), every response
  * body equals the ledger's answer for SOME store state (pre- or
  * post-mutation exact — never a torn mix), and after the mutator
  * finishes every payload serves the FINAL state's answer exactly (the
  * mutation-exact cache invalidated everything it had to). The latency
  * table under mutation lands in STREAMLAT.md beside the quiet-store
  * numbers.
  *
  * Usage: runMain graft.ServeMutation [sfDir] [outDir]
  */
object ServeMutation {

  private val Clients = 8
  private val K = 10

  private[graft] final case class Fixture(work: String, lex: String, vec: String)

  /** Build the two stores from the corpus (deterministic logical
    * content, so two builds serve identical answers). */
  private def build(spark: SparkSession, corpus: DataFrame,
                    emb: DataFrame, tag: String): Fixture = {
    val work = java.nio.file.Files.createTempDirectory(s"serve-mut-$tag-").toString
    graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$work/lex", 64, storeDocs = true)
    graft.operators.Quantize.buildSelfContained(spark,
      corpus.select("doc_id", "embedding"), "doc_id", "embedding",
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb")),
      "centroid_id", "cen_emb",
      emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("code_id"), col("embedding").as("cb_emb")),
      "code_id", "cb_emb", 64, 4, residual = false, s"$work/vec",
      storeVectors = true)
    Fixture(work, s"$work/lex", s"$work/vec")
  }

  /** The mutation script — each step a named store lifecycle call.
    * Shared with [[ServeMutationChild]] (the cross-process mutator). */
  private[graft] def mutations(spark: SparkSession, f: Fixture,
                               appendBatch: DataFrame, deleteIds: DataFrame)
      : Seq[(String, () => Unit)] = Seq(
    "lex-append" -> (() => graft.operators.Retrieval.appendBm25Store(
      appendBatch.select("doc_id", "text"), "text", "doc_id", f.lex, epoch = 1L)),
    "vec-append" -> (() => graft.operators.Quantize.appendSelfContained(
      spark, f.vec, appendBatch.select("doc_id", "embedding"), "embedding")),
    "lex-delete" -> (() => {
      graft.operators.Retrieval.deleteFromBm25Store(spark, f.lex,
        deleteIds, epoch = 2L); ()
    }),
    "vec-tombstone" -> (() => {
      graft.operators.Quantize.addTombstones(spark, f.vec, deleteIds,
        "doc_id"); ()
    }),
    "lex-compact" -> (() => {
      graft.operators.Retrieval.compactBm25Store(spark, f.lex); ()
    }),
    "vec-sweep" -> (() => {
      graft.operators.Quantize.retentionSweep(spark, f.vec, "doc_id",
        maxTombstoneFraction = 0.0001); ()
    }),
    "vec-split" -> (() => {
      // after the append one cell is overfull vs the build-time mean —
      // a low overshoot guarantees at least one split fires
      graft.operators.Quantize.splitDriftedCells(spark, f.vec,
        overshoot = 1.05, splitWays = 2); ()
    }))

  def main(args: Array[String]): Unit = {
    // `xproc` (round 14): the live-phase mutator runs in a SEPARATE JVM
    // (ServeMutationChild) — StoreGate cannot fence it, so the optimistic
    // subset bracket is measured as the PRIMARY consistency mechanism
    val xproc = args.contains("xproc")
    val posArgs = args.filterNot(_ == "xproc")
    val sfDir = if (posArgs.length > 0) posArgs(0) else "/root/testdata/sf0.1"
    val outDir = if (posArgs.length > 1) posArgs(1) else "."
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // FAIR pools with a real allocation file (round 13): serving jobs
    // ("graft-serve", tagged per-request by SearchApi) get 8× the weight
    // of the mutator's default-pool jobs plus a minShare, so a request
    // racing a long maintenance job (the 9.5 s cell split) is scheduled
    // ahead of it instead of queueing behind its stages — the serving
    // tail under mutation is bounded by the request's own work.
    val poolFile = java.nio.file.Files.createTempFile("graft-pools-", ".xml")
    java.nio.file.Files.writeString(poolFile,
      """<?xml version="1.0" encoding="UTF-8"?>
        |<allocations>
        |  <pool name="graft-serve">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>8</weight>
        |    <minShare>8</minShare>
        |  </pool>
        |</allocations>
        |""".stripMargin)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", poolFile.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.t(spark, sfDir, "documents")
    val emb = Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val isQuery = col("doc_id") % 241 === 11
    val isReserve = col("doc_id") % 241 === 13 // appended mid-run
    val corpus = hybrid.filter(!isQuery && !isReserve).localCheckpoint()
    val reserve = hybrid.filter(isReserve).localCheckpoint()
    // delete a slice of BASE ids that actually rank for the payloads'
    // terms would be ideal; a deterministic slice is enough to move
    // answers (stats always move: n_docs/avgdl shift every ranking)
    val deleteIds = corpus.select("doc_id").filter(col("doc_id") % 17 === 3)
      .limit(200).localCheckpoint()

    val qRows = hybrid.filter(isQuery)
      .select("text", "embedding").limit(4).collect()
    // payloads cover the three serving modes over both stores
    val payloads: Seq[String] = qRows.toSeq.flatMap { r =>
      val txt = graft.sources.Serve.jsonEscape(
        r.getString(0).split("\\s+").take(6).mkString(" "))
      val vec = r.getSeq[Float](1).mkString("[", ",", "]")
      Seq(
        s"""{"text":"$txt","vector":$vec,"k":$K,"mode":"hybrid"}""",
        s"""{"text":"$txt","k":$K,"mode":"lexical"}""",
        s"""{"text":"$txt","vector":$vec,"k":$K,"mode":"vector"}""")
    }

    def cfgFor(f: Fixture, cacheSize: Int) = graft.serve.GraftConfig.fromString(
      s"""retrieval:
         |  lex_store: "${f.lex}"
         |  vec_store: "${f.vec}"
         |  depth: 20
         |  n_probe: 2
         |  rerank_depth: 100
         |  max_query_terms: 6
         |  cache_size: $cacheSize
         |""".stripMargin, env = Map.empty)

    // strip the per-response timestamp: the remaining envelope (columns,
    // rows, values) is the deterministic answer for one store state
    def canon(body: String): String =
      body.replaceAll("\"timestamp\":\"[^\"]+\"", "\"timestamp\":\"-\"")

    // ---- reference ledger: answers per payload per store state
    val refFix = build(spark, corpus, emb, "ref")
    val refMuts = mutations(spark, refFix, reserve, deleteIds)
    val refApi = graft.serve.SearchApi.fromConfig(spark,
      cfgFor(refFix, cacheSize = 0)).get
    def answers(api: graft.serve.SearchApi): Seq[String] = payloads.map { p =>
      val r = api.searchPost(p)
      require(r.status == 200, s"reference pass failed: ${r.body.take(200)}")
      canon(r.body)
    }
    val ledger = scala.collection.mutable.ArrayBuffer(answers(refApi))
    for ((name, m) <- refMuts) {
      m()
      println(s"[serve-mut] reference state after $name captured")
      ledger += answers(refApi)
    }
    val validByPayload: Seq[Set[String]] =
      payloads.indices.map(i => ledger.map(_(i)).toSet)
    println(s"[serve-mut] ledger: ${ledger.size} states x ${payloads.size} " +
      s"payloads; distinct answers per payload: " +
      validByPayload.map(_.size).mkString(","))

    // ---- live phase: fresh identical stores, cache ON, clients + mutator
    val liveFix = build(spark, corpus, emb, "live")
    val liveApi = graft.serve.SearchApi.fromConfig(spark,
      cfgFor(liveFix, cacheSize = 512)).get
    // the ledger's state-0 answers must transfer to the fresh build —
    // a cheap determinism guard before anything races
    payloads.indices.foreach { i =>
      val got = canon(liveApi.searchPost(payloads(i)).body)
      require(got == ledger.head(i),
        s"fresh build diverged from reference build on payload $i")
    }
    import spark.implicits._
    val finCache = new graft.serve.ResultCache(10, 60)
    val finApi = new graft.serve.FinancialApi(spark,
      () => Seq.empty[(String, String)].toDF("ticker", "x"), finCache)
    val server = new graft.serve.ApiServer(finApi, 0, cfgFor(liveFix, 512),
      Some(liveApi)).start()
    val port = server.boundPort
    val client = java.net.http.HttpClient.newHttpClient()

    val bad = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t00 = System.nanoTime()
    val slow = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lat = java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.lang.Long]())
    val n5xx = new java.util.concurrent.atomic.AtomicInteger(0)
    val nTorn = new java.util.concurrent.atomic.AtomicInteger(0)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    val clients = (0 until Clients).map { c =>
      new Thread(() => {
        var i = c
        while (!stop.get()) {
          val p = i % payloads.size
          val t0 = System.nanoTime()
          val r = client.send(java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:$port/search"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              payloads(p))).build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          val tookMs = (System.nanoTime() - t0) / 1000000L
          lat.add(tookMs)
          if (tookMs > 2000)
            slow.add(f"payload=$p mode=${p % 3} took=${tookMs} ms " +
              f"start=+${(t0 - t00) / 1000000L} ms " +
              f"end=+${(System.nanoTime() - t00) / 1000000L} ms")
          fired.incrementAndGet()
          if (r.statusCode >= 500) {
            n5xx.incrementAndGet()
            bad.add(s"5xx on payload $p: ${r.body.take(160)}")
          } else if (!validByPayload(p).contains(canon(r.body))) {
            nTorn.incrementAndGet()
            bad.add(s"TORN payload $p: ${canon(r.body).take(200)}")
          }
          i += Clients
        }
      })
    }
    val liveMuts = mutations(spark, liveFix, reserve, deleteIds)
    clients.foreach(_.start())
    Thread.sleep(3000) // quiet-store serving first
    val mutWalls: Seq[(String, Double)] =
      if (!xproc) liveMuts.map { case (name, m) =>
        val t0 = System.nanoTime()
        m()
        val w = (System.nanoTime() - t0) / 1e6
        println(f"[serve-mut] live mutation $name landed in $w%.0f ms " +
          f"(+${(t0 - t00) / 1000000L} ms → +${(System.nanoTime() - t00) / 1000000L} ms)")
        Thread.sleep(2500)
        (name, w)
      }
      else {
        // ---- cross-process mutator: same script, separate JVM ----------
        val xTmp = java.nio.file.Files.createTempDirectory("serve-mut-x-")
        reserve.write.parquet(s"$xTmp/append")
        deleteIds.write.parquet(s"$xTmp/delete")
        // the child inherits THIS forked JVM's full classpath verbatim
        // (sbt's bg-jobs stage each jar into its own directory, so a
        // jar-dir wildcard reconstruction misses everything but one jar
        // — the round-14 first-run failure)
        val javaBin = s"${System.getProperty("java.home")}/bin/java"
        import scala.jdk.CollectionConverters._
        // inherit the parent's --add-opens set (Spark 4 on JDK 17 needs
        // them); keep memory bounded for the side JVM
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments.asScala.toList
        val addOpens: Seq[String] = jvmArgs.zip(jvmArgs.drop(1)).collect {
          case ("--add-opens", v) => List("--add-opens", v)
        }.flatten
        val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq("-Xmx8g", "-cp",
          System.getProperty("java.class.path"), "graft.ServeMutationChild",
          liveFix.lex, liveFix.vec, s"$xTmp/append", s"$xTmp/delete", "2500")
        val pb = new ProcessBuilder(cmd.asJava)
        pb.redirectErrorStream(true)
        val proc = pb.start()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream))
        val walls = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
        val childLog = scala.collection.mutable.ArrayBuffer.empty[String]
        try {
          var line: String = null
          val wallRe = """\[mut-child\] (\S+) (\d+)""".r
          while ({ line = reader.readLine(); line != null }) {
            wallRe.findFirstMatchIn(line) match {
              case Some(m) =>
                walls += ((m.group(1), m.group(2).toDouble))
                println(s"[serve-mut] xproc mutation ${m.group(1)} landed in " +
                  s"${m.group(2)} ms (+${(System.nanoTime() - t00) / 1000000L} ms)")
              case None =>
                if (line.contains("[mut-child] done"))
                  println("[serve-mut] xproc mutator done")
                else if (childLog.size < 200) childLog += line
            }
          }
          require(proc.waitFor(5, java.util.concurrent.TimeUnit.MINUTES) &&
            proc.exitValue() == 0,
            s"xproc mutator failed (exit ${proc.exitValue()}); last child " +
              s"output:\n${childLog.takeRight(25).mkString("\n")}")
          require(walls.size == liveMuts.size,
            s"xproc mutator landed ${walls.size}/${liveMuts.size} mutations; " +
              s"last child output:\n${childLog.takeRight(25).mkString("\n")}")
        } catch {
          case e: Throwable =>
            // the clients spin on `stop`; a dead mutator must not leave
            // them looping forever (round-14 lesson: it did)
            stop.set(true)
            throw e
        }
        walls.toSeq
      }
    stop.set(true); clients.foreach(_.join())

    // post-mutation exactness: the cache must serve the FINAL state now
    val freshApi = graft.serve.SearchApi.fromConfig(spark,
      cfgFor(liveFix, cacheSize = 0)).get
    val finalBad = payloads.indices.count { i =>
      val got = canon(client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/search"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          payloads(i))).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).body)
      val ok = got == ledger.last(i)
      if (!ok) {
        // distinguish a stale cache (HTTP answer ≠ a fresh cacheless
        // compute on the same store) from store-content divergence
        // (fresh compute ≠ the reference build's final state)
        val fresh = canon(freshApi.searchPost(payloads(i)).body)
        println(s"[serve-mut] FINAL MISMATCH payload $i: " +
          (if (fresh == got) "store content diverged from reference build"
           else "cache served a stale entry") +
          s"\n[serve-mut]   got:   ${got.take(220)}" +
          s"\n[serve-mut]   want:  ${ledger.last(i).take(220)}" +
          s"\n[serve-mut]   fresh: ${fresh.take(220)}")
      }
      !ok
    }
    server.stop()

    import scala.jdk.CollectionConverters._
    val sorted = lat.asScala.map(_.toLong).toSeq.sorted
    def pct(p: Double): Long =
      if (sorted.isEmpty) -1
      else sorted(math.min(sorted.size - 1,
        math.ceil(p * sorted.size).toInt - 1).max(0))
    println(f"[serve-mut] ${fired.get()} requests under ${liveMuts.size} " +
      f"mutations: 5xx=${n5xx.get()} torn=${nTorn.get()} " +
      f"final_mismatch=$finalBad p50=${pct(0.5)} ms p95=${pct(0.95)} ms " +
      f"max=${sorted.lastOption.getOrElse(-1L)} ms")
    bad.asScala.take(5).foreach(b => println(s"[serve-mut]   $b"))
    slow.asScala.foreach(s => println(s"[serve-mut] SLOW $s"))
    require(n5xx.get() == 0, s"${n5xx.get()} 5xx responses under mutation")
    require(nTorn.get() == 0, s"${nTorn.get()} torn responses under mutation")
    require(finalBad == 0, s"$finalBad payloads not serving the final state")

    // ---- STREAMLAT.md section (marker-delimited, sibling-preserving)
    val marker = if (xproc) "## Serving under CROSS-PROCESS mutation"
                 else "## Serving under mutation"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
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
    val md = new StringBuilder(kept)
    val mutatorDesc =
      if (xproc) s"""a SEPARATE-JVM mutator (`graft.ServeMutationChild`,
spawned with its own SparkSession against the same store paths — the
multi-writer deployment reality) drives the full store lifecycle, one
mutation every ~2.5 s. The in-process StoreGate CANNOT fence this
writer, so the committed-epoch snapshot + version-token cache keys +
the optimistic SUBSET bracket carry consistency as the PRIMARY
mechanisms."""
      else """a mutator thread
drives the full store lifecycle, one mutation every ~2.5 s."""
    md.append(s"""$marker (round ${if (xproc) 14 else 13})

`runMain graft.ServeMutation $sfDir${if (xproc) " xproc" else ""}` — $Clients closed-loop clients POST
`/search` (hybrid/lexical/vector over both stores, result cache ON — the
deployment default) against a live ApiServer while $mutatorDesc EVERY
response is validated against a pre-computed ledger of the exact answer
at each of the ${ledger.size} store states (timestamp stripped, values
compared verbatim): a response must equal SOME state's answer — never a
torn mix of two — and after the last mutation every payload must serve
the final state exactly (mutation-exact cache invalidation, observed).
The mechanisms under test: committed-epoch snapshot reads (the epochs
row is EVERY lexical mutation's commit point — a half-landed append or
delete is invisible until its row lands; CommitLogSpec replays the
crash windows deterministically), version-token cache keys (the lexical
token is the commit log's fingerprint, so it moves exactly when answers
can), the round-13 SUBSET bracket (a request's answer stands when every
file present at its start is still present unchanged — additive commits
serve the exact PRE state the request planned against; only a
rewrite-install straddle recomputes), single-flight per cache key, the
stampede coalescer (concurrent uncached misses of one mode gather into
ONE parameterized batch plan — the /search batch machinery), and a real
HTTP handler pool (the JDK server's default executor was serial; tails
used to include the whole refill queue).

| requests | mutations | 5xx | torn responses | final-state mismatches | p50 | p95 | max |
|---|---|---|---|---|---|---|---|
| ${fired.get()} | ${liveMuts.size} (${mutWalls.map(_._1).mkString(", ")}) | ${n5xx.get()} | ${nTorn.get()} | $finalBad | ${pct(0.5)} ms | ${pct(0.95)} ms | ${sorted.lastOption.getOrElse(-1L)} ms |

Mutation walls while serving: ${mutWalls.map { case (n, w) => f"$n $w%.0f ms" }.mkString(", ")}.
Reading it: zero 5xx and zero torn responses means concurrent clients
never observed a mixed store state across ${liveMuts.size} lifecycle
mutations (append/delete/compact/sweep/split on both stores), and the
post-run check proves the caches converged to the final state. The p95
under mutation is the coalesced-batch refill wall: a landed mutation
invalidates every affected key at once, the stampede gathers into one
batched compute per mode, and every gathered request pays that one
batch's wall. The max is a batch that computed DURING the cell split's
heavy jobs and then paid one leased retry when the split's install
landed mid-compute — bounded by compute-under-contention, never by
waiting out a mutation (round 12 measured 25.9 s for a request that
did; the additive-mutation case no longer retries at all under the
subset bracket).
""")
    md.append(keptAfter)
    java.nio.file.Files.writeString(path, md.toString)
    println(s"[serve-mut] appended section to $outDir/STREAMLAT.md")
    spark.stop()
  }
}
