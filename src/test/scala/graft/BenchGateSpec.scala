package graft

import org.scalatest.funsuite.AnyFunSuite

/** The regression-flag gate replayed against the EXACT numbers that
  * produced round 7's three false flags (driver-final BENCH_DELTA.json),
  * plus the cases that must still flag. The gate's contract: a flag
  * means "the PLAN regressed", so machine/JIT/duck-side noise must never
  * trip it and a genuine 2×+ wall regression always must. */
class BenchGateSpec extends AnyFunSuite {

  private def gate(sparkNow: Double, duckNow: Double, prevRatio: Double,
                   prevMin: Double, prevSpread: Double): Boolean =
    BenchGate.regressed(sparkNow, Some(duckNow), Some(prevRatio),
      Some(prevMin), Some(prevSpread))

  test("qx59's round-7 flag (DuckDB-side speedup) does not trip the gate") {
    // driver-final artifact: spark 0.971 -> 1.171 s (inside any plausible
    // spread ceiling), duck 8.5 -> 4.36 s, ratio 0.114 -> 0.269. The
    // ratio more than doubled because DUCK got faster; Spark stayed 3.7×
    // faster than DuckDB on the query.
    assert(!gate(sparkNow = 1.171, duckNow = 4.359, prevRatio = 0.114,
      prevMin = 0.971, prevSpread = 1.5))
  }

  test("qx60/qx63's round-7 flags (sub-second JIT swings) do not trip the gate") {
    // qx60: 0.369 -> 0.922 s with an in-run spread of 3.1× on an
    // unchanged plan; qx63: 0.203 -> 0.523 s, same story. The committed
    // spread already covers the observed wall.
    assert(!gate(sparkNow = 0.922, duckNow = 0.195, prevRatio = 1.398,
      prevMin = 0.369, prevSpread = 3.1))
    assert(!gate(sparkNow = 0.523, duckNow = 0.133, prevRatio = 1.763,
      prevMin = 0.203, prevSpread = 3.1))
  }

  test("a genuine plan regression still flags: wall past the ceiling AND ratio breached") {
    // stable query (tight committed spread), duck unchanged, spark wall
    // tripled: both gates trip
    assert(gate(sparkNow = 3.0, duckNow = 0.5, prevRatio = 2.0,
      prevMin = 1.0, prevSpread = 1.1))
    // the same regression with a NOISY committed history still flags once
    // the wall clears min × spread
    assert(gate(sparkNow = 4.0, duckNow = 0.5, prevRatio = 2.0,
      prevMin = 1.0, prevSpread = 3.0))
  }

  test("both-engine load drift cancels in the ratio and never flags") {
    // machine 2× slower: both walls double, ratio unchanged
    assert(!gate(sparkNow = 2.0, duckNow = 1.0, prevRatio = 1.0,
      prevMin = 1.0, prevSpread = 1.3))
  }

  test("materiality floors: sub-floor walls never flag regardless of ratio") {
    assert(!gate(sparkNow = 0.4, duckNow = 0.01, prevRatio = 1.0,
      prevMin = 0.05, prevSpread = 1.0)) // spark under 0.5 s... duck under 0.05 s
    assert(!gate(sparkNow = 5.0, duckNow = 0.04, prevRatio = 10.0,
      prevMin = 0.1, prevSpread = 1.0)) // duck side not material
  }

  test("missing committed data establishes a baseline instead of flagging") {
    assert(!BenchGate.regressed(5.0, Some(0.5), None, Some(1.0), Some(1.0)))
    assert(!BenchGate.regressed(5.0, None, Some(1.0), Some(1.0), Some(1.0)))
    assert(!BenchGate.regressed(5.0, Some(0.5), Some(1.0), None, Some(1.0)))
    // missing spread alone is fine — the floor stands in
    assert(BenchGate.regressed(5.0, Some(0.5), Some(1.0), Some(1.0), None))
  }

  test("the spread floor tolerates small drift on ultra-stable queries") {
    // committed spread 1.0 (perfectly stable); wall up 20% with a duck
    // speedup pushing the ratio over 2x — inside the 1.25 floor, no flag
    assert(!gate(sparkNow = 1.2, duckNow = 0.1, prevRatio = 0.5,
      prevMin = 1.0, prevSpread = 1.0))
  }
}
