#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate:
run graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same fixture tables; compare sorted rows exactly.

Usage: python3 dev/check.py <sfDir> <outDir> [query ...]
(Dev-only tool; the shipped library is pure Scala.)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_rows, spark_cols, duck_rows, duck_cols):
    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(duck_rows)}"
    cols = sorted(spark_cols)
    s_ix = [spark_cols.index(c) for c in cols]
    d_ix = [duck_cols.index(c) for c in cols]
    s = sorted([tuple(norm_cell(r[i]) for i in s_ix) for r in spark_rows],
               key=lambda t: tuple(str(x) for x in t))
    d = sorted([tuple(norm_cell(r[i]) for i in d_ix) for r in duck_rows],
               key=lambda t: tuple(str(x) for x in t))
    n_exact = n_close = 0
    first_bad = None
    for a, b in zip(s, d):
        if a == b:
            n_exact += 1
            continue
        ok = True
        for x, y in zip(a, b):
            if x == y:
                continue
            if isinstance(x, float) and isinstance(y, float) and \
               abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                continue
            ok = False
        if ok:
            n_close += 1
        else:
            if first_bad is None:
                first_bad = (a, b)
    if first_bad:
        return f"VALUE MISMATCH exact={n_exact} close={n_close} " \
               f"bad example:\n  spark={first_bad[0]}\n  duck ={first_bad[1]}"
    if n_close:
        return f"CLOSE-NOT-EXACT ({n_close} rows differ < 1e-9) — driver hash WOULD FAIL"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            duck = con.execute(oracle[name])
            duck_rows = duck.fetchall()
            duck_cols = [d[0] for d in duck.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sq = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_rows = sq.fetchall()
            spark_cols = [d[0] for d in sq.description]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
