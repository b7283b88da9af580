package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Three independent signature implementations must agree row for row:
  * the native one-pass expression (production), the exploded/windowed
  * k-MIN pipeline (portable reference), and the typed Aggregator. */
class MinHashSpec extends SparkSpec {

  test("native MinHashDoc signature equals the exploded k-MIN form AND the typed aggregator") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val a = Dedup.minhashSignature(docs, "text", "doc_id", 16, 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val ex = Dedup.minhashSignatureExploded(docs, "text", "doc_id", 16, 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Dedup.minhashSignatureTyped(docs, "text", "doc_id", 16, 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length === 100 && a.toSeq === ex.toSeq && a.toSeq === b.toSeq)
  }

  test("native signature plan is a pure scan projection: zero Exchange before banding") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dedup.minhashSignature(docs, "text", "doc_id", 16, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("MinHashDoc edge rows: null, empty, and short docs have no signature; token boundaries match the regex pipeline") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"),          // 4 tokens, 2 shingles at n=3
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, "one two"),                      // < n tokens → no signature
      (5L, "The--QUICK  brown\tfox!!")      // same tokens as doc 1 after norm
    ).toDF("doc_id", "text")
    val got = Dedup.minhashSignature(docs, "text", "doc_id", 8, 3)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got.keySet == Set(1L, 5L))
    // normalization-insensitive: punctuation/case/whitespace variants of
    // the same words produce the identical signature
    assert(got(1L) == got(5L))
    // and the exploded reference agrees on the same edge inputs
    val ex = Dedup.minhashSignatureExploded(docs, "text", "doc_id", 8, 3)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(ex == got)
  }

  test("native shingle stream and simhash equal their exploded reference forms") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200)
    // shingle hashes: same (doc, hash) multiset, multiplicity included
    val a = Dedup.shingleHashRows(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Dedup.shingleHashRowsWindowed(docs, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty && (a sameElements b))
    // simhash: identical fingerprints per doc
    val sa = Dedup.simhash(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = Dedup.simhashExploded(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sa.nonEmpty && sa == sb)
    // and the native simhash plans no shuffle at all
    val plan = Dedup.simhash(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("aggregator partial merge is order-insensitive") {
    val agg = new graft.functions.MinHashAggregator(4)
    val xs = Seq(5L, 99L, 12345L, 7L)
    val left = xs.take(2).foldLeft(agg.zero.clone())(agg.reduce)
    val right = xs.drop(2).foldLeft(agg.zero.clone())(agg.reduce)
    val merged = agg.merge(left, right)
    val serial = xs.foldLeft(agg.zero.clone())(agg.reduce)
    assert(merged.toSeq === serial.toSeq)
  }
}
