#!/usr/bin/env python3
"""Per-query DuckDB baseline for the oracle suite.

Times every oracle SQL from a graft.Verify output dir in DuckDB over the
same parquet tables Bench.scala reads, min-of-N wall clock per query, and
writes BASELINE_DUCKDB.json — the per-query side of the "within 2x of the
reference-engine baseline" bar (round totals alone can hide a single
pathological query). Bench.scala picks this file up when its SF dir
matches and emits per-query spark/duckdb ratios into BENCH_FULL.json.

DuckDB runs with its default thread count (all cores — the same hardware
budget as Bench's local[32]).

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir> [reps=3] [outPath]

outPath defaults to BASELINE_DUCKDB.json (the committed baseline). Bench.scala
invokes this script with a temp outPath to obtain a SAME-RUN DuckDB measurement
— both engines timed under identical machine conditions, so per-query ratios
survive day-to-day load drift that moves absolute walls ±20%.
"""
import json, sys, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, reps=3, out_path="BASELINE_DUCKDB.json"):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    timings, errors = {}, {}
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                errors[name] = f"{type(e).__name__}: {e}"
                break
            d = time.monotonic() - t0
            best = d if best is None or d < best else best
        if best is not None:
            timings[name] = round(best, 3)
            print(f"{name}: {best:.3f}s")
    total = round(sum(timings.values()), 3)
    out = {
        "sf": sf_dir,
        "reps": reps,
        "threads": con.execute("SELECT current_setting('threads')").fetchone()[0],
        "duckdb_version": duckdb.__version__,
        "total": total,
        "n_queries": len(timings),
        "errors": errors,
        "queries": timings,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\ntotal {total}s over {len(timings)} queries "
          f"({len(errors)} errors) -> {out_path}")
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         sys.argv[4] if len(sys.argv) > 4 else "BASELINE_DUCKDB.json")
