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
    // invariant BEFORE any output: a dangling oracle key must abort
    // without printing counts a downstream grep could still harvest
    require(graft.SparkEntry.oracleSql.keySet.subsetOf(
        graft.SparkEntry.queries.keySet),
      "oracleSql contains keys with no matching query: " +
        (graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet))
    println(s"queries=${graft.SparkEntry.queries.size}")
    println(s"oracles=${graft.SparkEntry.oracleSql.size}")
  }
}
