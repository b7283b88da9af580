package graft

class GraftSessionSpec extends SparkSpec {

  test("registerViews + native function give a plain-SQL surface") {
    graft.functions.GraftFunctions.register(spark)
    GraftSession.registerViews(spark, "/root/testdata/sf0.001")
    val out = spark.sql(
      """SELECT count(*) AS n, count(DISTINCT graft_polyhash(text)) AS nh
        |FROM documents""".stripMargin).collect()(0)
    assert(out.getAs[Long]("n") === 500L)
    assert(out.getAs[Long]("nh") > 490L) // distinct texts hash distinctly
    // joins across views work
    val rev = spark.sql(
      """SELECT r_name, count(*) AS n FROM nation JOIN region
        |ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY r_name""".stripMargin)
    assert(rev.count() === 5)
  }
}
