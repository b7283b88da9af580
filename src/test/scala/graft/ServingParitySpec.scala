package graft

import graft.operators.{Quantize, Retrieval}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-12 serving fast paths are EXACT TWINS of the distributed plans
  * they shortcut — this suite pins the equality the scaladocs claim:
  * driver-evaluated query terms / slot tokens, the driver-computed
  * probed-cell list (via end-to-end store searches over local vs
  * distributed query frames), and the served hybrid's driver-side RRF
  * fusion vs the plan-side rrfFuse. */
class ServingParitySpec extends SparkSpec {

  private val qSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true)))

  /** The same query rows as a LocalRelation (fast path) and as an
    * RDD-backed frame (forces the distributed plan). */
  private def bothFrames(rows: Seq[Row], schema: StructType): (DataFrame, DataFrame) = {
    val list = new java.util.ArrayList[Row](); rows.foreach(list.add)
    val local = spark.createDataFrame(list, schema)
    val dist = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    assert(local.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "fixture: the local frame must be a LocalRelation")
    assert(!dist.queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation],
      "fixture: the distributed frame must NOT be a LocalRelation")
    (local, dist)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("queryTerms: the driver-evaluated twin equals the distributed explode/distinct, edge cases included") {
    val rows = Seq(
      Row(1L, "Café au-LAIT!! 123 naïve cat CAT cat"),
      Row(2L, null),
      Row(3L, ""),
      Row(4L, "  --- !!! "),
      Row(5L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      Row(6L, "dup dup dup dup"))
    val (local, dist) = bothFrames(rows, qSchema)
    for (cap <- Seq(3, 6, Int.MaxValue)) {
      val a = canon(Retrieval.queryTerms(local, "text", "doc_id", cap))
      val b = canon(Retrieval.queryTerms(dist, "text", "doc_id", cap))
      assert(a == b, s"cap=$cap")
      assert(a.nonEmpty)
    }
    // the fast path actually engaged: a LocalRelation in, a LocalRelation out
    assert(Retrieval.queryTerms(local, "text", "doc_id", 4)
      .queryExecution.optimizedPlan
      .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
  }

  private def lexStoreFixture(): (String, Seq[Row]) = {
    import spark.implicits._
    val corpus = (1L to 30L).map(i =>
      (i, s"alpha doc$i common word${i % 5} beta gamma${i % 3}")).toDF("doc_id", "text")
    val work = java.nio.file.Files.createTempDirectory("parity-lex-").toString
    val store = s"$work/lex"
    Retrieval.writeBm25Store(corpus, "text", "doc_id", store, 8)
    // a standing delete so the tombstone memo path is exercised
    Retrieval.deleteFromBm25Store(spark, store, Seq(3L, 7L).toDF("doc_id"),
      epoch = 1L)
    val qRows = Seq(
      Row(901L, "alpha common beta"),
      Row(902L, "word2 gamma1 alpha alpha"))
    (store, qRows)
  }

  test("lexical store serving: local and distributed query frames rank identically (terms, buckets, tombstones, counts)") {
    val (store, qRows) = lexStoreFixture()
    val (local, dist) = bothFrames(qRows, qSchema)
    // twice: the second pass serves tombstones + relations from the memos
    for (_ <- 1 to 2) {
      assert(canon(Retrieval.bm25TopKFromStore(spark, store, local, "text", "doc_id", 5)) ==
        canon(Retrieval.bm25TopKFromStore(spark, store, dist, "text", "doc_id", 5)))
      assert(canon(Retrieval.bm25TopKFromStoreConjunctive(spark, store, local, "text", "doc_id", 5)) ==
        canon(Retrieval.bm25TopKFromStoreConjunctive(spark, store, dist, "text", "doc_id", 5)))
      assert(canon(Retrieval.phraseTopKFromStore(spark, store, local, "text", "doc_id", 5)) ==
        canon(Retrieval.phraseTopKFromStore(spark, store, dist, "text", "doc_id", 5)))
      assert(canon(Retrieval.proximityTopKFromStore(spark, store, local, "text", "doc_id", 5, window = 4)) ==
        canon(Retrieval.proximityTopKFromStore(spark, store, dist, "text", "doc_id", 5, window = 4)))
    }
    assert(Retrieval.bm25TopKFromStore(spark, store, local, "text", "doc_id", 5)
      .count() > 0)
  }

  // 8-dim embeddings with DUPLICATE centroid vectors (exact cosine ties —
  // the tie-break the driver twin must replicate) and a zero vector in
  // the query mix (norm 0 → the window's coalesce(-2.0) branch).
  private def vecStoreFixture(): (String, Seq[Row]) = {
    import spark.implicits._
    def v(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 31 + j * 7) % 13) - 6).toFloat)
    val corpus = (1L to 40L).map(i => (i, v(i.toInt))).toDF("doc_id", "embedding")
    // cells 0 and 1 share one vector: every query's cos ties exactly
    val cents = Seq(
      (0L, v(100)), (1L, v(100)), (2L, v(5)), (3L, v(9))
    ).toDF("centroid_id", "cen_emb")
    val codebook = Seq(
      (0L, v(21)), (1L, v(22)), (2L, v(23)), (3L, v(24))
    ).toDF("code_id", "cb_emb")
    val work = java.nio.file.Files.createTempDirectory("parity-vec-").toString
    val store = s"$work/vec"
    Quantize.buildSelfContained(spark, corpus, "doc_id", "embedding",
      cents, "centroid_id", "cen_emb", codebook, "code_id", "cb_emb",
      dims = 8, nBlocks = 2, residual = false, store, storeVectors = true)
    val qRows = Seq(
      Row(801L, v(2)),
      Row(802L, v(37)),
      Row(803L, Seq.fill(8)(0.0f))) // zero vector: all cells at -2.0
    (store, qRows)
  }

  private val vSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("embedding", ArrayType(FloatType), nullable = true)))

  test("stored vector search: local and distributed query frames rank identically (driver-computed probe cells incl. ties and zero norms)") {
    val (store, qRows) = vecStoreFixture()
    val (local, dist) = bothFrames(qRows, vSchema)
    for (np <- Seq(1, 2, 4); _ <- 1 to 2) {
      val a = canon(Quantize.searchSelfContainedRefinedStored(spark, store,
        local, "doc_id", "embedding", k = 5, nProbe = np, rerankDepth = 20))
      val b = canon(Quantize.searchSelfContainedRefinedStored(spark, store,
        dist, "doc_id", "embedding", k = 5, nProbe = np, rerankDepth = 20))
      assert(a == b, s"nProbe=$np")
      assert(a.nonEmpty)
    }
  }

  test("hybridTopKFromStoresServed: the driver-side concurrent fusion equals rrfFuse row-for-row (stored, filtered, and lake-rescore shapes)") {
    import spark.implicits._
    val (lexStore, _) = lexStoreFixture()
    val (vecStore, _) = vecStoreFixture()
    def v(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 31 + j * 7) % 13) - 6).toFloat)
    val hSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val qRows = Seq(
      Row(901L, "alpha common beta", v(2)),
      Row(902L, "word2 gamma1 alpha", v(37)))
    val (local, dist) = bothFrames(qRows, hSchema)
    val corpus = (1L to 40L).map(i => (i, v(i.toInt))).toDF("doc_id", "embedding")
    val allow = (1L to 40L).filter(_ % 2 == 0).toDF("doc_id")
    val shapes = Seq[(Option[(DataFrame, String)], Option[DataFrame])](
      (None, None), (None, Some(allow)),
      (Some((corpus, "embedding")), None),
      (Some((corpus, "embedding")), Some(allow)))
    for ((rescore, allowed) <- shapes) {
      val served = Retrieval.hybridTopKFromStoresServed(spark, lexStore,
        vecStore, local, "text", "embedding", "doc_id",
        k = 8, depth = 10, nProbe = 2, rerankDepth = 20,
        rescore = rescore, allowed = allowed)
      // the plan-side fusion over the same legs, via the public entries
      val plan = (rescore, allowed) match {
        case (None, None) => Retrieval.hybridTopKFromStoresStored(spark,
          lexStore, vecStore, dist, "text", "embedding", "doc_id",
          8, 10, 2, 20)
        case (None, Some(a)) => Retrieval.hybridTopKFromStoresStoredFiltered(
          spark, lexStore, vecStore, dist, a, "text", "embedding", "doc_id",
          8, 10, 2, 20)
        case (Some((c, cv)), None) => Retrieval.hybridTopKFromStores(spark,
          lexStore, vecStore, dist, "text", "embedding", "doc_id",
          8, 10, 2, 20, c, cv)
        case (Some((c, cv)), Some(a)) => Retrieval.hybridTopKFromStoresFiltered(
          spark, lexStore, vecStore, dist, a, "text", "embedding", "doc_id",
          8, 10, 2, 20, c, cv)
      }
      assert(served.columns.toSeq == plan.columns.toSeq,
        s"schema drift (rescore=${rescore.isDefined}, allowed=${allowed.isDefined})")
      val a = canon(served)
      val b = canon(plan)
      assert(a == b,
        s"fusion drift (rescore=${rescore.isDefined}, allowed=${allowed.isDefined})")
      assert(a.nonEmpty)
      // the served fusion is a LocalRelation: downstream joins are jobless
      assert(served.queryExecution.optimizedPlan
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
    }
  }

  test("result-cache default gates on directory-mtime schemes (object stores default OFF)") {
    import graft.serve.SearchApi
    assert(SearchApi.schemesHaveDirMtimes(Seq("/tmp/x", "file:/tmp/y")))
    assert(SearchApi.schemesHaveDirMtimes(Seq("hdfs://nn/x", "/local")))
    assert(!SearchApi.schemesHaveDirMtimes(Seq("s3a://bucket/x", "/tmp/y")))
    assert(!SearchApi.schemesHaveDirMtimes(Seq("gs://b/x")))
    assert(!SearchApi.schemesHaveDirMtimes(Seq("abfss://c@a/x")))
  }
}
