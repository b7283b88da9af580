#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs the DuckDB oracle.

Emulates the driver's t2 gate: for each <name>.parquet written by
graft.Verify, run oracle_sql.json[name] in DuckDB over views named after
the testdata tables, then compare (rows sorted by all columns, columns
sorted by name) exactly. Reports per-query PASS/FAIL with first diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    # canonicalize cell values for comparison
    def cell(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)  # full precision
        return str(v)
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return cols, sorted(rows)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            want = con.execute(sql).df()
            gc, gr = canon(got)
            wc, wr = canon(want)
            if gc != wc:
                print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
                n_fail += 1
            elif len(gr) != len(wr):
                print(f"FAIL {name}: rowcount spark={len(gr)} oracle={len(wr)}")
                n_fail += 1
            elif gr != wr:
                bad = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
                print(f"FAIL {name}: values differ, first diffs:")
                for a, b in bad:
                    print(f"  spark : {a}\n  oracle: {b}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(gr)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
