package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Quantize, Retrieval}

/** ONE maintenance scheduler for BOTH store families — the deployment
  * runs a single sidecar instead of a lexical daemon
  * ([[Bm25StoreCtl]]) and a vector daemon ([[VectorStoreCtl]]). Each
  * cycle visits every registered store and runs that family's
  * maintenance policy; per-store outcomes are reported, and a store
  * that refuses (its `StoreLock` is held — a concurrent append window,
  * another maintainer, or the debris of a crashed operation whose lock
  * file deliberately survives) is a SKIP, not a crash: dead rows are
  * still dead next interval, and crash debris keeps the daemon out
  * until an operator inspects (the lock error message says who to look
  * for). Reference analog: the serving stack's single background
  * refresher (`src/jobs/scheduler.py:1-60`) — generalized to
  * heterogeneous stores.
  *
  * Policies:
  *  - LEXICAL ([[LexStore]]): tombstones standing → [[Retrieval
  *    .compactBm25Store]] (affected buckets only). Epoch-partition
  *    fragmentation above `maxEpochsPerBucket` → the same-geometry
  *    [[Retrieval.rebucketBm25Store]] fold, but ONLY when
  *    `foldEpochs = true` AND the store carries no stream marker:
  *    folding voids per-epoch replay idempotency, so it must never run
  *    under a live (or crash-retrying) ingest — quiescence is the
  *    operator's call, not the scheduler's.
  *  - VECTOR ([[VecStore]]): [[VectorStoreCtl.maintain]] — threshold
  *    retention sweep, then compaction when cells fragment; plus the
  *    opt-in `recellWhenCellsOff` geometry policy (sidecar-sourced
  *    retrain when the cell count drifts from √N — see [[VecStore]]).
  *
  * The scheduler holds NO lock itself: every mutating operator takes
  * the store lock internally, so the daemon can never widen a race —
  * it only sequences calls that are individually safe.
  */
object StoreCtl {

  sealed trait StoreSpec { def path: String }

  /** `foldEpochs` is the explicit quiescence opt-in (see object doc).
    *
    * `targetDocsPerBucket` + `rebucketWhenBucketsOff` (both > 0) enable
    * the lexical GEOMETRY policy — the exact twin of the vector family's
    * `recellWhenCellsOff`: serving reads the query terms' buckets, so
    * per-query bytes track corpus/nBuckets, and a store that grew 16×
    * past its build geometry serves 16× the bytes per term. When the
    * live doc count (an O(1) epochs read) drifts more than the declared
    * factor from `ceil(live / targetDocsPerBucket)` buckets, a cycle
    * rebuckets to that prescription ([[Retrieval.rebucketBm25Store]],
    * which also folds epochs and vacuums the raw-text sidecar).
    * Stream-adopted stores are skip-reported, not rebucketted —
    * rebucket's quiescence contract (folding voids per-epoch replay
    * idempotency) makes that the operator's call, exactly like the
    * epoch fold and the vector recell. */
  final case class LexStore(path: String,
                            foldEpochs: Boolean = false,
                            maxEpochsPerBucket: Double = 8.0,
                            targetDocsPerBucket: Double = 0.0,
                            rebucketWhenBucketsOff: Double = 0.0)
      extends StoreSpec {
    // off = max(want/current, current/want) is always >= 1, so a sub-1
    // threshold would rebucket the whole store EVERY cycle forever
    require(rebucketWhenBucketsOff == 0.0 || rebucketWhenBucketsOff >= 1.0,
      s"rebucketWhenBucketsOff is a drift FACTOR (>= 1), not a fraction: " +
        s"$rebucketWhenBucketsOff")
  }

  /** `recellWhenCellsOff` is the vector family's opt-in GEOMETRY policy
    * (the twin of the lexical `foldEpochs`): when > 0, a maintenance
    * cycle retrains the store's quantizer geometry
    * ([[Quantize.recellIvfPqStoreFromSidecar]]) once its cell count
    * drifts more than that factor from `HighRecall`'s √N prescription
    * for the LIVE corpus — the autonomous form of "the geometry follows
    * the corpus". Preconditions, both reported as skips rather than
    * crashes: the store must carry its raw-vector sidecar (the scheduler
    * holds no lake pointer), and must not be stream-adopted (recell's
    * quiescence contract, same reason the epoch fold refuses). */
  final case class VecStore(path: String,
                            maxDeadFraction: Double = 0.3,
                            maxFilesPerCell: Double = 4.0,
                            recellWhenCellsOff: Double = 0.0,
                            adaptQueries: Option[String] = None,
                            adaptVecCol: String = "embedding",
                            maxDisplacement: Double = 0.5,
                            adaptK: Int = 10)
      extends StoreSpec {
    // same drift-factor shape as the lexical policy: off >= 1 always
    require(recellWhenCellsOff == 0.0 || recellWhenCellsOff >= 1.0,
      s"recellWhenCellsOff is a drift FACTOR (>= 1), not a fraction: " +
        s"$recellWhenCellsOff")
  }

  /** One store's outcome in one cycle. `action` ∈ {"compact", "fold",
    * "sweep", "skip-locked", "noop", "skip-stream", "recell",
    * "rebucket", "adapt", "error"} (vector sweeps fold compaction into
    * their detail; "error" carries a store's actionable refusal —
    * crashed-operation debris and the like — without killing the
    * daemon). */
  final case class CycleReport(path: String, family: String,
                               action: String, detail: String)

  private def fsFor(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Average epoch-partition count per bucket — the lex store's
    * fragmentation measure (a long-lived batch-appended store grows one
    * (bucket, epoch) directory per append). Pure listing, no data read. */
  private[graft] def lexEpochFragmentation(spark: SparkSession,
                                           path: String): Double = {
    val fs = fsFor(spark, path)
    val root = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "/postings")
    if (!fs.exists(root)) return 0.0
    val buckets = fs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith("bucket="))
    if (buckets.isEmpty) return 0.0
    val epochs = buckets.map(b => fs.listStatus(b.getPath).count(st =>
      st.isDirectory && st.getPath.getName.startsWith("epoch=")).toLong).sum
    epochs.toDouble / buckets.length
  }

  private def hasStreamMarker(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "/_graft_stream_id"))

  private def hasTombstones(spark: SparkSession, path: String): Boolean =
    fsFor(spark, path).exists(new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "/tombstones"))

  /** One lexical maintenance pass (see object doc for the policy).
    * Priority: tombstones → compact; geometry off → rebucket (which
    * subsumes an epoch fold); fragmentation → fold; else noop. */
  def maintainLex(spark: SparkSession, s: LexStore): CycleReport = {
    if (hasTombstones(spark, s.path)) {
      val removed = Retrieval.compactBm25Store(spark, s.path)
      CycleReport(s.path, "lex", "compact", s"removed $removed posting rows")
    } else {
      val geom = if (s.targetDocsPerBucket > 0 && s.rebucketWhenBucketsOff > 0) {
        // ONE tiny epochs read yields the live doc count AND the bucket
        // geometry (the same read serving starts from)
        val (live, _, _, nb) = Retrieval.liveStatsAndBuckets(spark, s.path)
        val current = nb.toLong
        val want = math.max(1L, math.ceil(live / s.targetDocsPerBucket).toLong)
        val off = math.max(want.toDouble / current, current.toDouble / want)
        if (off <= s.rebucketWhenBucketsOff)
          Some(CycleReport(s.path, "lex", "noop",
            f"geometry ok ($current buckets, target wants $want, ${off}%.1fx)"))
        else if (hasStreamMarker(spark, s.path))
          Some(CycleReport(s.path, "lex", "skip-stream",
            s"geometry off ($current buckets, target wants $want) but " +
              "stream-adopted; rebucket folds epochs — operator action"))
        else {
          // route by layout (round 12): a FIELDED store rebuckets through
          // its own entry point — the unfielded rebucket refuses fielded
          // layouts loudly, and a policy must maintain both store kinds
          if (Retrieval.isFieldedStore(spark, s.path))
            Retrieval.rebucketBm25fStore(spark, s.path, want.toInt)
          else Retrieval.rebucketBm25Store(spark, s.path, want.toInt)
          Some(CycleReport(s.path, "lex", "rebucket",
            s"geometry retrained: $current -> $want buckets for $live live docs"))
        }
      } else None
      geom match {
        case Some(r) if r.action != "noop" => return r
        case _ => ()
      }
      val frag = lexEpochFragmentation(spark, s.path)
      if (s.foldEpochs && frag > s.maxEpochsPerBucket) {
        if (hasStreamMarker(spark, s.path))
          CycleReport(s.path, "lex", "skip-stream",
            f"fragmented ($frag%.1f epochs/bucket) but stream-adopted; " +
              "folding needs a quiesced ingest — operator action")
        else {
          val n = spark.read.parquet(s.path.stripSuffix("/") + "/epochs")
            .select("n_buckets").head().getInt(0)
          if (Retrieval.isFieldedStore(spark, s.path))
            Retrieval.rebucketBm25fStore(spark, s.path, n)
          else Retrieval.rebucketBm25Store(spark, s.path, n)
          CycleReport(s.path, "lex", "fold",
            f"epoch fold at $n buckets (was $frag%.1f epochs/bucket)")
        }
      } else CycleReport(s.path, "lex", "noop",
        f"no tombstones, $frag%.1f epochs/bucket" +
          geom.map("; " + _.detail).getOrElse(""))
    }
  }

  /** One vector maintenance pass — [[VectorStoreCtl.maintain]], then the
    * opt-in geometry policy, then the opt-in QUERY-DRIFT policy (see
    * [[VecStore]]). */
  def maintainVec(spark: SparkSession, s: VecStore): CycleReport = {
    val r = VectorStoreCtl.maintain(spark, s.path, s.maxDeadFraction,
      s.maxFilesPerCell)
    val swept =
      s"${r.sweep.cellsSwept} cells swept, ${r.sweep.rowsRemoved} rows removed, " +
        s"${r.sweep.tombstonesRemaining} tombstones pending" +
        r.compact.map(c => s"; compacted ${c.filesBefore} -> ${c.filesAfter} files")
          .getOrElse("")
    // both opt-in policies need the quantizers; load at most once per
    // cycle (the adapt branch never runs after a recell, so it cannot
    // observe a stale load)
    lazy val loadedQ = Quantize.loadQuantizers(spark, s.path)
    val geomReport: CycleReport =
      if (s.recellWhenCellsOff <= 0)
        CycleReport(s.path, "vec", "sweep", swept)
      else if (!Quantize.hasVectorSidecar(spark, s.path))
        CycleReport(s.path, "vec", "sweep",
          swept + "; recell policy skipped: store has no raw-vector sidecar")
      else if (hasStreamMarker(spark, s.path))
        CycleReport(s.path, "vec", "skip-stream",
          swept + "; recell policy skipped: stream-adopted — retraining " +
            "re-encodes rows wholesale, quiescence is the operator's call")
      else {
        // geometry check: current cells from the tiny persisted centroid
        // frame, the prescription from the LIVE id count (one column-pruned
        // scan — a maintenance-cycle cost, not a serving cost)
        val (cents, _, p) = loadedQ
        val current = cents.count()
        val tomb = Quantize.readTombstones(spark, s.path, p.idCol)
        val live = spark.read.parquet(s.path)
          .select(p.idCol).distinct()
          .join(org.apache.spark.sql.functions.broadcast(tomb),
            Seq(p.idCol), "left_anti").count()
        val want = Quantize.HighRecall.nCells(live).toLong
        val off = math.max(want.toDouble / current, current.toDouble / want)
        if (off <= s.recellWhenCellsOff)
          CycleReport(s.path, "vec", "sweep",
            swept + f"; geometry ok ($current cells, √N wants $want, ${off}%.1fx)")
        else {
          val (nLive, cells) = Quantize.recellIvfPqStoreFromSidecar(spark, s.path)
          CycleReport(s.path, "vec", "recell",
            swept + s"; geometry retrained: $current -> $cells cells " +
              s"for $nLive live vectors (√N wanted $want)")
        }
      }
    // QUERY-drift policy: geometry reacts to the corpus, this reacts to
    // the query mix. Measure the ADC-vs-exact rank displacement
    // ([[Quantize.rankDisplacement]] — a recall proxy needing no ground
    // truth) over the configured live-query sample at the CURRENT auto
    // budgets; past the threshold, raise the persisted serving hints
    // (nProbe ×1.5 capped at the cell count, depth ×1.5) that the `auto`
    // budget resolution reads. Skipped on a recell cycle (the retrain
    // replaced `.quantizers` and with it any hints — the fresh geometry
    // is measured next cycle) and without a sidecar (the exact side
    // rescores from it).
    s.adaptQueries match {
      case Some(_) if geomReport.action == "recell" =>
        geomReport.copy(detail = geomReport.detail +
          "; query-drift policy skipped this cycle: the recell just " +
          "replaced the quantizers (fresh geometry is measured next cycle)")
      case Some(_) if !Quantize.hasVectorSidecar(spark, s.path) =>
        // report the skip — a silently-unmonitored drift policy is the
        // worst state (the operator believes drift is watched)
        geomReport.copy(detail = geomReport.detail +
          "; query-drift policy skipped: store has no raw-vector sidecar " +
          "(rankDisplacement rescores from it — rebuild with storeVectors)")
      case Some(qPath) =>
        val (cents, _, p) = loadedQ
        val nCells = cents.count().toInt
        val (np0, dep0) = Quantize.servingHints(spark, s.path).getOrElse(
          (Quantize.HighRecall.nProbe(nCells.toLong),
            Quantize.HighRecall.rerankDepth(s.adaptK)))
        val disp = Quantize.rankDisplacement(spark, s.path,
          spark.read.parquet(qPath), p.idCol, s.adaptVecCol,
          s.adaptK, np0, dep0)
        if (disp <= s.maxDisplacement)
          geomReport.copy(detail = geomReport.detail +
            f"; query-drift ok (displacement $disp%.2f <= " +
            f"${s.maxDisplacement}%.2f at nProbe=$np0, depth=$dep0)")
        else if (np0 >= nCells)
          geomReport.copy(detail = geomReport.detail +
            f"; query drift measured (displacement $disp%.2f) but nProbe " +
            f"already spans all $nCells cells — the budget cannot deepen " +
            "further; schedule a recell")
        else {
          val np1 = math.min(nCells, math.max(np0 + 1, math.ceil(np0 * 1.5).toInt))
          val dep1 = math.ceil(dep0 * 1.5).toInt
          Quantize.writeServingHints(spark, s.path, np1, dep1)
          geomReport.copy(action = "adapt", detail = geomReport.detail +
            f"; query drift: displacement $disp%.2f > " +
            f"${s.maxDisplacement}%.2f — serving hints raised to " +
            s"nProbe=$np1, depth=$dep1")
        }
      case _ => geomReport
    }
  }

  /** One cycle over all stores. Lock refusals become skip reports. */
  def cycle(spark: SparkSession, stores: Seq[StoreSpec]): Seq[CycleReport] =
    stores.map { s =>
      val family = s match { case _: LexStore => "lex"; case _: VecStore => "vec" }
      try s match {
        case l: LexStore => maintainLex(spark, l)
        case v: VecStore => maintainVec(spark, v)
      } catch {
        case e: graft.sources.StoreLock.StoreLockedException =>
          CycleReport(s.path, family, "skip-locked", e.getMessage)
        // a store needing manual intervention (crashed-split manifest →
        // "run recoverCellSplit", leftover compact/delete backups, a
        // fielded store registered on the unfielded lex policy, ...)
        // must become an ERROR REPORT, not a dead daemon: its siblings
        // keep being maintained and the operator sees the actionable
        // message every cycle until they resolve it
        case scala.util.control.NonFatal(e) =>
          // keep the report diagnosable: class, message (may be null for
          // code bugs), and the first own-code frame
          val at = e.getStackTrace.headOption.map(f => s" at $f").getOrElse("")
          CycleReport(s.path, family, "error", s"$e$at")
      }
    }

  /** The unified daemon loop: [[cycle]] with jittered sleep — the
    * single-sidecar deployment shape. Injectable sleep/log keep the
    * policy spec-testable without real time (the
    * [[VectorStoreCtl.runMaintenanceDaemon]] convention). */
  def runDaemon(spark: SparkSession, stores: Seq[StoreSpec],
                intervalMs: Long, maxCycles: Long = Long.MaxValue,
                sleep: Long => Unit = ms => Thread.sleep(ms),
                log: String => Unit = println): Long = {
    require(intervalMs > 0, "intervalMs must be positive")
    require(stores.nonEmpty, "no stores registered")
    var cycles = 0L
    while (cycles < maxCycles) {
      cycle(spark, stores).foreach(r =>
        log(s"[storectl] cycle ${cycles + 1} ${r.family} ${r.path}: " +
          s"${r.action} — ${r.detail}"))
      cycles += 1
      if (cycles < maxCycles) {
        val h = scala.util.hashing.MurmurHash3.stringHash(s"graft-storectl-$cycles")
        val frac = (h.toLong & 0xffffL).toDouble / 0xffffL * 2.0 - 1.0
        sleep(math.max(0L, intervalMs + (intervalMs * 0.1 * frac).toLong))
      }
    }
    cycles
  }

  /** CLI: `cycle <spec>...` (one pass) or `daemon <intervalMs>
    * <maxCycles> <spec>...` where spec is
    * `lex:<path>[:fold[:maxEpochsPerBucket[:targetDocsPerBucket[:rebucketWhenBucketsOff]]]]`
    * (geometry without epoch folding: `lex:<path>:geom:<targetDocsPerBucket>[:rebucketWhenBucketsOff]`)
    * or `vec:<path>[:maxDeadFraction[:maxFilesPerCell[:recellWhenCellsOff]]]`.
    * Omitted drift factors default to 2.0. */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, usage)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try args(0) match {
      case "cycle" =>
        cycle(spark, args.drop(1).map(parseSpec).toSeq).foreach(r =>
          println(s"[storectl] ${r.family} ${r.path}: ${r.action} — ${r.detail}"))
      case "daemon" =>
        runDaemon(spark, args.drop(3).map(parseSpec).toSeq,
          args(1).toLong, args(2).toLong)
      case other => throw new IllegalArgumentException(s"$other?\n$usage")
    } finally spark.stop()
  }

  private val usage =
    "usage: cycle lex:<path>[:fold[:maxEpochs[:targetDocs[:rebucketOff]]]] " +
      "| lex:<path>:geom:<targetDocs>[:rebucketOff] " +
      "| vec:<path>[:deadFrac[:maxFiles[:recellOff]]] ...\n" +
      "   or: daemon <intervalMs> <maxCycles> <spec>..."

  /** Specs are parsed family-prefix, OPTIONS-SUFFIX: the option tokens
    * (numbers, `fold`) are peeled off the RIGHT and whatever remains —
    * colons and all — is the path, so URI-schemed stores
    * (`hdfs://nn:8020/store`, `s3a://bucket/store`) parse correctly.
    * The one ambiguity is a path whose final `:`-separated segment is
    * itself a bare number — quoteable by appending the option
    * explicitly. */
  private[graft] def parseSpec(s: String): StoreSpec = {
    val (family, rest) = s.span(_ != ':') match {
      case (f @ ("lex" | "vec"), r) if r.nonEmpty => (f, r.drop(1))
      case _ => throw new IllegalArgumentException(s"bad store spec: $s\n$usage")
    }
    def isNum(t: String) = t.toDoubleOption.isDefined
    var toks = rest.split(':').toList
    val maxOpts = if (family == "lex") 4 else 3
    var opts = List.empty[String]
    while (toks.length > 1 && opts.length < maxOpts &&
        (isNum(toks.last) ||
          (family == "lex" && (toks.last == "fold" || toks.last == "geom")))) {
      opts = toks.last :: opts
      toks = toks.init
    }
    val p = toks.mkString(":")
    (family, opts) match {
      case ("lex", Nil)              => LexStore(p)
      case ("lex", List("fold"))     => LexStore(p, foldEpochs = true)
      case ("lex", List("fold", m))  => LexStore(p, foldEpochs = true, m.toDouble)
      case ("lex", List("fold", m, t)) => // drift factor defaults to 2.0
        LexStore(p, foldEpochs = true, m.toDouble, t.toDouble, 2.0)
      case ("lex", List("fold", m, t, ro)) =>
        LexStore(p, foldEpochs = true, m.toDouble, t.toDouble, ro.toDouble)
      case ("lex", List("geom", t)) => // geometry policy WITHOUT epoch folding
        LexStore(p, targetDocsPerBucket = t.toDouble,
          rebucketWhenBucketsOff = 2.0)
      case ("lex", List("geom", t, ro)) =>
        LexStore(p, targetDocsPerBucket = t.toDouble,
          rebucketWhenBucketsOff = ro.toDouble)
      case ("vec", Nil)              => VecStore(p)
      case ("vec", List(f))          => VecStore(p, f.toDouble)
      case ("vec", List(f, mf))      => VecStore(p, f.toDouble, mf.toDouble)
      case ("vec", List(f, mf, ro))  => VecStore(p, f.toDouble, mf.toDouble,
                                                 ro.toDouble)
      case _ => throw new IllegalArgumentException(s"bad store spec: $s\n$usage")
    }
  }
}
