package graft

import graft.functions.{Dialect, GraftFunctions, TextExprs => TX, ZOrder}
import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("native graft_zorder ≡ portable unrolled form ≡ reference interleave") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val rows = Seq.fill(500)((rnd.nextLong().abs % 100000L, rnd.nextLong().abs % 100000L))
    val df = rows.toDF("x", "y")
    val native = df.selectExpr("x", "y", "graft_zorder(x, y, 16) AS z")
    val portable = expr(TX.zorder("x", "y", 16)(Dialect(spark = true)))
    val both = native.withColumn("zp", portable).collect()
    both.foreach { r =>
      val (x, y, z, zp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(z == zp, s"native/portable diverge at ($x,$y): $z vs $zp")
      assert(z == ZOrder.interleave(x, y, 16), s"reference diverges at ($x,$y)")
    }
    // known value: x=0b11 (bits 0,2), y=0b1 (bit 1) → 0b111 = 7
    assert(ZOrder.interleave(3L, 1L, 16) == 7L)
  }

  test("z-order layout: box filters touch fewer files than a linear sort layout") {
    import spark.implicits._
    // uniform 256×256 grid, 16 files each way
    val n = 1 << 16
    val df = spark.range(n).select((col("id") % 256).as("x"),
      expr("id div 256").as("y"), col("id").as("payload"))
    val base = java.nio.file.Files.createTempDirectory("layout").toString
    Layout.zorderWrite(df, s"$base/z", "x", "y", 8, 16)
    Layout.linearWrite(df, s"$base/l", "x", 16)
    val ze = Layout.fileEnvelopes(spark, s"$base/z", "x", "y").cache()
    val le = Layout.fileEnvelopes(spark, s"$base/l", "x", "y").cache()
    assert(ze.count() == 16 && le.count() == 16)
    // y-constrained box: the linear (x-sorted) layout cannot skip ANY file
    val zy = Layout.filesIntersecting(ze, 0, 255, 0, 15)
    val ly = Layout.filesIntersecting(le, 0, 255, 0, 15)
    assert(ly == 16, s"x-sorted layout unexpectedly pruned on y: $ly")
    assert(zy <= 6, s"z-order layout should touch ~4 of 16 files, got $zy")
    // x-constrained box: BOTH layouts prune — z-order keeps x selectivity
    val zx = Layout.filesIntersecting(ze, 0, 15, 0, 255)
    assert(zx <= 6, s"z-order lost x selectivity: $zx")
    // point-ish box: z-order touches ~1 tile
    val zp = Layout.filesIntersecting(ze, 10, 20, 10, 20)
    assert(zp <= 2, s"small box should hit ~1 z-tile, got $zp")
    ze.unpersist(); le.unpersist()
  }
}
