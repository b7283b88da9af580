package graft

import graft.operators.Retrieval
import graft.sources.StoreGate

/** The round-13 serve/maintenance read-write gate: serving requests hold
  * the READ side for their compute; a physical install window (the
  * rename swaps of compact/rebucket/recell/split) takes the WRITE side —
  * so an in-flight request completes against the snapshot it STARTED on
  * instead of tearing or waiting out a long mutation (ServeMutation's
  * measured 25.9 s tail). */
class StoreGateSpec extends SparkSpec {

  test("write side waits for in-flight readers; queued readers wait for the writer (fair)") {
    val path = "/tmp/store-gate-sem-test"
    val events = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val readerIn = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val reader = new Thread(() => StoreGate.readLocked(Seq(path)) {
      events.add("reader-in"); readerIn.countDown()
      release.await()
      events.add("reader-out")
    })
    reader.start(); readerIn.await()
    val writer = new Thread(() => StoreGate.writeLocked(path) {
      events.add("writer-in")
    })
    writer.start()
    Thread.sleep(200)
    assert(!events.contains("writer-in"),
      "the install window must wait for the in-flight reader")
    // a LATE reader queues behind the pending writer (fair lock): it
    // must not starve the install window
    val late = new Thread(() => StoreGate.readLocked(Seq(path)) {
      events.add("late-reader-in")
    })
    late.start()
    Thread.sleep(200)
    assert(!events.contains("late-reader-in"),
      "a late reader must queue behind the pending writer")
    release.countDown()
    reader.join(5000); writer.join(5000); late.join(5000)
    import scala.jdk.CollectionConverters._
    val order = events.asScala.toSeq
    assert(order.indexOf("reader-out") < order.indexOf("writer-in"))
    assert(order.indexOf("writer-in") < order.indexOf("late-reader-in"))
  }

  test("gates key by exact canonical path: a SUBPATH lease does not exclude a ROOT writer — the serve layer must lease store roots (round-14 ADVICE)") {
    val root = "/tmp/store-gate-key-test"
    // (1) the trap the round-13 code fell into: leasing the store's
    // physical SUBdirectories (what Retrieval.physicalPaths returns)
    // while every installer write-locks the store ROOT — different keys,
    // different lock objects, zero exclusion
    val subpaths = graft.operators.Retrieval.physicalPaths(root)
    assert(!subpaths.contains(root) && subpaths.forall(_.startsWith(root + "/")),
      "fixture: physicalPaths must be strict subdirectories of the root")
    val writerRan = new java.util.concurrent.atomic.AtomicBoolean(false)
    StoreGate.readLocked(subpaths) {
      val w = new Thread(() => StoreGate.writeLocked(root) { writerRan.set(true) })
      w.start(); w.join(5000)
      assert(writerRan.get(),
        "exact-key semantics: a subpath lease must NOT block a root writer " +
          "(if this starts blocking, StoreGate learned prefix matching and " +
          "the serve layer's gateRoots choice should be revisited)")
    }
    // (2) the correct discipline (SearchApi.gateRoots): leasing the ROOT
    // excludes a root-locked install for the lease's duration
    val installed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val w = new Thread(() => StoreGate.writeLocked(root) { installed.set(true) })
    StoreGate.readLocked(Seq(root)) {
      w.start(); Thread.sleep(200)
      assert(!installed.get(), "a root lease must exclude a root-locked install")
    }
    w.join(5000)
    assert(installed.get(), "the install proceeds once the lease is released")
  }

  test("an in-flight read completes against the pre-install snapshot while a rebucket's swap waits on the gate") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("gate-rb-")
      .toString + "/s"
    val base = (1L to 30L).map(i => i -> s"alpha doc$i common word${i % 5}")
    Retrieval.writeBm25Store(base.toDF("doc_id", "text"), "text", "doc_id",
      store, 8)
    val q = Seq(900L -> "alpha common").toDF("doc_id", "text")
    def serve(): Seq[String] =
      Retrieval.bm25TopKFromStore(spark, store, q, "text", "doc_id", 10)
        .orderBy("rank").collect().map(_.toString).toSeq
    val pre = serve()
    val gotPre = new java.util.concurrent.atomic.AtomicReference[Seq[String]]()
    val readerIn = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    // the "request": enters its read lease, signals, waits, then executes
    // its scan — exactly the window a racing install would tear
    val request = new Thread(() => StoreGate.readLocked(Seq(store)) {
      readerIn.countDown()
      release.await()
      gotPre.set(serve())
    })
    request.start(); readerIn.await()
    // the maintenance: a rebucket whose multi-second rebuild runs
    // ungated but whose install swap must queue behind the reader
    val rebucketDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maint = new Thread(() => {
      Retrieval.rebucketBm25Store(spark, store, newBuckets = 4)
      rebucketDone.set(true)
    })
    maint.start()
    // wait for the rebuild to reach the (blocked) install: the sibling
    // .rebucket-new image exists, the swap has not happened
    val deadline = System.nanoTime() + 30L * 1000000000L
    val newImg = new java.io.File(store + ".rebucket-new")
    while (!newImg.exists() && System.nanoTime() < deadline) Thread.sleep(50)
    assert(newImg.exists(), "fixture: rebuild must reach the install")
    Thread.sleep(300)
    assert(!rebucketDone.get(),
      "the install swap must wait for the in-flight read lease")
    release.countDown()
    request.join(30000); maint.join(30000)
    assert(rebucketDone.get())
    assert(gotPre.get() == pre,
      "the in-flight read must serve the exact pre-install snapshot")
    assert(serve() == pre,
      "rebucket must not change answers (post-install reads agree)")
  }
}
