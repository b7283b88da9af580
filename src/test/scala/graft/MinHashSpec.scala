package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The typed sketch aggregator must equal the k-MIN expression form. */
class MinHashSpec extends SparkSpec {

  test("MinHashAggregator signature equals the k-MIN form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100)
    val a = Dedup.minhashSignature(docs, "text", "doc_id", 16, 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Dedup.minhashSignatureTyped(docs, "text", "doc_id", 16, 3)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.length === 100 && a.toSeq === b.toSeq)
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
