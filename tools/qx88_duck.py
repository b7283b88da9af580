#!/usr/bin/env python3
"""DuckDB half of the qx88 crossover probe (round 11).

Runs qx88's committed oracle SQL (written by `runMain
graft.tools.Qx88Crossover` alongside the inflated corpora) against each
mult=N/embeddings.parquet and prints one JSON line per multiple —
min-of-2 walls, same protocol as the Spark side. DuckDB gets all cores
(its default) so the comparison is engine-vs-engine, not
threads-vs-threads.

Usage: python3 tools/qx88_duck.py [outDir=/tmp/qx88x]
"""
import glob
import json
import os
import sys
import time

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qx88x"
sql = open(os.path.join(out, "qx88_oracle.sql")).read()

for d in sorted(glob.glob(os.path.join(out, "mult=*")),
                key=lambda p: int(p.split("=")[-1])):
    mult = int(d.split("=")[-1])
    con = duckdb.connect()
    pq = os.path.join(d, "embeddings.parquet", "*.parquet")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}')")
    walls = []
    rows = None
    for _ in range(2):
        t0 = time.time()
        rows = len(con.execute(sql).fetchall())
        walls.append(time.time() - t0)
    con.close()
    print(json.dumps({"engine": "duckdb", "mult": mult,
                      "wall_sec": round(min(walls), 2), "rows": rows}))
