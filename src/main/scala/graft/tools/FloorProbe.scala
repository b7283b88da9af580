package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (round 13): time the serve path's pieces —
  * physicalListing, computeRows tail, operator call — to localize the
  * floor regression. Not part of the driver contract. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val emb = graft.Tables.t(spark, sfDir, "embeddings")
    val hybrid = docs.join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("text"), col("embedding")).localCheckpoint()
    val corpus = hybrid.filter(!(col("doc_id") % 241 === 11))
    val work = java.nio.file.Files.createTempDirectory("floor-probe-").toString
    graft.operators.Retrieval.writeBm25Store(corpus.select("doc_id", "text"),
      "text", "doc_id", s"$work/lex", 64)
    val qRow = hybrid.filter(col("doc_id") % 241 === 11)
      .select("text", "embedding").limit(1).collect().head
    val qText = qRow.getString(0).split("\\s+").take(6).mkString(" ")
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e6}%8.1f ms"); r
    }
    val q = Seq((Long.MinValue, qText)).toDF("doc_id", "text")
    // warm
    graft.operators.Retrieval.bm25TopKFromStore(spark, s"$work/lex", q,
      "text", "doc_id", 10, maxQueryTerms = 6).count()
    for (i <- 1 to 3) {
      val df = time(s"plan bm25TopKFromStore #$i")(
        graft.operators.Retrieval.bm25TopKFromStore(spark, s"$work/lex", q,
          "text", "doc_id", 10, maxQueryTerms = 6))
      time(s"collect plain #$i")(df.collect())
      time(s"collect orderBy(rank) #$i")(df.orderBy("rank").collect())
      time(s"collect orderBy(qid,rank) #$i")(
        df.orderBy(col("query_id"), col("rank")).collect())
      time(s"fsFileListing lex #$i")(
        graft.operators.Retrieval.fsFileListing(spark,
          graft.operators.Retrieval.physicalPaths(s"$work/lex")).size)
    }
    spark.stop()
  }
}
