package graft

import org.apache.spark.sql.functions._

/** End-to-end corpus-curation drive — the library as a training-data user
  * consumes it: quality gate → exact + near-dup dedup (global groups) →
  * deterministic split → mixture plan → context-window chunks, written
  * out as train/val/test parquet. `runMain graft.CurationDemo [sfDir] [outDir]` */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("curated").toString
    val spark = GraftSession.create("curation-demo", master = "local[8]",
      shufflePartitions = 8)
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, sfDir, "documents")
    // the gate counts tokens with the SAME tokenizer the chunker uses —
    // a hand-rolled split here would measure the 15..80 gate in different
    // units than the chunks it admits
    val sparkD = functions.Dialect(spark = true)
    val quality = docs.withColumn("n_tokens",
        expr(s"CAST(${sparkD.size(functions.TextExprs.tokens("text")(sparkD))} AS BIGINT)"))
      .filter(col("n_tokens").between(15, 80))
    val canonical = operators.Dedup.exact(docs, "text", "doc_id")
      .select(col("canonical_id").as("doc_id"))
    val nearDupDrops = operators.Dedup.dedupGroups(docs, "text", "doc_id",
        k = 16, shingleN = 3, rowsPerBand = 4, threshold = 0.2)
      .filter(col("doc_id") =!= col("group_id")).select("doc_id")
    val curated = quality
      .join(canonical, Seq("doc_id"), "left_semi")
      .join(nearDupDrops, Seq("doc_id"), "left_anti")
      .persist() // three consumers below: mixture plan, split write, census

    val plan = operators.TextAnalysis.mixtureWeights(curated, "lang",
      Seq(("de", 150L), ("en", 400L), ("es", 150L), ("fr", 150L), ("zh", 150L)))
    println("[demo] mixture plan:")
    plan.orderBy("lang").collect().foreach(r => println(s"[demo]   $r"))

    val splitDocs = operators.TextAnalysis.deterministicSplit(curated, "doc_id")
    val chunks = operators.TextAnalysis.chunkDocuments(
        splitDocs.select("doc_id", "text"), "text", "doc_id", 32, 16)
      .join(splitDocs.select("doc_id", "split"), "doc_id")
    // observed write gate: row/empty-chunk counters ride the write action
    // itself (Metrics.observed) — monitoring without a second scan
    val (gated, obs) = operators.Metrics.observed(chunks, "chunk_gate",
      count(lit(1)).as("chunks"),
      sum(when(col("n_tokens") <= 0, 1L).otherwise(0L)).as("empty_chunks"))
    gated.write.mode("overwrite").partitionBy("split").parquet(s"$outDir/chunks")
    val gate = obs.get
    require(gate("empty_chunks") == 0L, s"chunk gate tripped: $gate")
    println(s"[demo] chunk gate (observed on the write itself): $gate")

    val census = spark.read.parquet(s"$outDir/chunks")
      .groupBy("split").agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("sum_tokens"))
      .orderBy("split")
    println(s"[demo] kept ${curated.count()} of ${docs.count()} docs → $outDir")
    census.collect().foreach(r => println(s"[demo]   $r"))
    curated.unpersist()
    spark.stop()
  }
}
