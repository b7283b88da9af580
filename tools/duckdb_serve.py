#!/usr/bin/env python3
"""Long-lived DuckDB measurement coprocess for graft.Bench (round 14).

The round-13 bench measured Spark's full suite first and DuckDB's full
suite after it — so a load swing in either half lands on one engine only,
and the headline ratio moves with machine weather (observed: the DuckDB
denominator rose 125.5 s -> 172.1 s between rounds on identical queries).
This coprocess interleaves the two engines PER QUERY: Bench times a
query's Spark reps, then immediately asks this process to time the same
query's DuckDB reps — adjacent in time, so both engines see the same
machine conditions and the per-query ratio is load-invariant by
construction.

Protocol (line-oriented, stdin -> stdout):
  request:  <query-name>\n
  reply:    {"name":..., "best":sec|null, "err":str|null,
             "loadavg":float}\n
  shutdown: EOF on stdin (or the literal line "__exit__")

Views over the same parquet tables Bench reads; reps = min-of-N
(default 2, argv[3]). DuckDB runs its default thread count — the same
all-cores hardware budget as Bench's local[32].

Usage: duckdb_serve.py <sfDir> <oracleSqlJson> [reps=2]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def loadavg():
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def main(sf_dir, oracle_path, reps=2):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    # handshake line: Bench waits for this before trusting the coprocess
    print(json.dumps({"ready": True, "n_queries": len(oracle),
                      "duckdb_version": duckdb.__version__}), flush=True)
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        if name == "__exit__":
            break
        if name not in oracle:
            print(json.dumps({"name": name, "best": None,
                              "err": "unknown query",
                              "loadavg": loadavg()}), flush=True)
            continue
        sql = oracle[name]
        best, err = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                err = f"{type(e).__name__}: {e}"
                break
            d = time.monotonic() - t0
            best = d if best is None or d < best else best
        print(json.dumps({"name": name,
                          "best": round(best, 4) if best is not None else None,
                          "err": err, "loadavg": loadavg()}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 2)
