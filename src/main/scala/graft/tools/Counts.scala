package graft.tools

/** Canonical doc counts, GENERATED not hand-written (round-9 ritual fix:
  * four rounds running, the committed prose and the driver-final
  * artifacts disagreed on query/spec counts because humans typed them).
  * Prints the numbers README/SURVEY/COVERAGE must quote;
  * `tools/check_counts.sh` greps the docs against this output and a
  * test-run log, and fails the round-close on any drift.
  * No SparkSession needed — the maps are plain values. */
object Counts {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.size
    val o = graft.SparkEntry.oracleSql.size
    println(s"queries=$q")
    println(s"oracles=$o")
    require(graft.SparkEntry.oracleSql.keySet.subsetOf(
        graft.SparkEntry.queries.keySet),
      "oracleSql contains keys with no matching query: " +
        (graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet))
  }
}
