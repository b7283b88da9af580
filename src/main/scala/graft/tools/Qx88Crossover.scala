package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** qx88 dual-engine crossover probe (round 11) — the missing half of the
  * SCALE.md batch-ADC grid: round 10 probed Spark against ITSELF
  * (sublinear wall growth), which proves the constant amortizes but not
  * WHERE Spark's wall crosses under DuckDB's on the identical
  * computation. This main materializes the inflated corpora
  * (1×/4×/16× of the sf dir's embeddings, ids shifted so the
  * build-time slices — centroids `< 8`, residual seeds `[100, 104)` —
  * keep their original members and every cell just grows), times the
  * EXACT qx88 operator pipeline per multiple, and writes each inflated
  * corpus plus qx88's committed oracle SQL for `tools/qx88_duck.py` to
  * time on the DuckDB side. Both engines then execute the same
  * computation on the same parquet: corpus-as-queries residual batch
  * ADC, fixed 8 cells / nProbe 2 / k 3, so candidate work grows ~N²
  * (|Q|·nProbe·cellSize) for BOTH. Total wall = index build + search +
  * top-k, matching what BENCH measures for qx88.
  *
  * Usage: runMain graft.tools.Qx88Crossover [sfDir] [outDir]
  * then:  python3 tools/qx88_duck.py <outDir>
  */
object Qx88Crossover {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/qx88x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val emb0 = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").localCheckpoint()
    val e0 = emb0.count()

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/qx88_oracle.sql"),
      graft.SparkEntry.oracleSql("qx88_ivfpq_batch_residual"))

    // the exact qx88 body (CurationQueries) over an explicit frame
    def runQx88(emb: org.apache.spark.sql.DataFrame): Long = {
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cen_emb"))
      val seeds = emb.filter(col("vec_id") >= 100 && col("vec_id") < 104)
      val resCodebook = graft.operators.Similarity.ivfAssign(
          seeds, "vec_id", "embedding", cents, "centroid_id", "cen_emb")
        .join(broadcast(cents), "centroid_id")
        .withColumn("c_emb", expr(
          "zip_with(embedding, cen_emb, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))"))
        .select(col("vec_id").as("code_id"), col("c_emb"))
      val index = graft.operators.Quantize.ivfPqIndexResidual(
        emb, "vec_id", "embedding",
        cents, "centroid_id", "cen_emb", resCodebook, "code_id", "c_emb",
        64, 4)
      graft.operators.Quantize.ivfPqSearchAllResidual(
        emb, "vec_id", "embedding", index, "vec_id",
        cents, "centroid_id", "cen_emb", resCodebook, "code_id", "c_emb",
        64, 4, 3, 2).count()
    }
    runQx88(emb0) // codegen + shuffle-service warmup, excluded

    for (mult <- Seq(1, 4, 16)) {
      val inflated = (0 until mult).map(i =>
          emb0.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _).localCheckpoint()
      inflated.write.mode("overwrite")
        .parquet(s"$outDir/mult=$mult/embeddings.parquet")
      val walls = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val rows = runQx88(inflated)
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val best = walls.map(_._1).min
      println(f"""{"engine":"spark","mult":$mult,"vecs":${e0 * mult},""" +
        f""""wall_sec":$best%.2f,"rows":${walls.head._2}}""")
    }
    spark.stop()
  }
}
