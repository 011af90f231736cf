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

INT_TYPES = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}


def type_drift(duck_types, spark_types):
    """The driver's hash is TYPE-AWARE; Python fetch is type-blind (HUGEINT
    -> int looks identical locally but hash-fails the gate — burned rounds
    5+6 on q57/q58/q70/q81). Returns (fatal, warnings): fatal for any
    oracle HUGEINT/DECIMAL or cross-class drift vs the Spark parquet
    schema; warnings for int-width drift (INT vs BIGINT), which the
    driver's hash normalizes."""
    fatal, warns = [], []
    for c, dt in duck_types.items():
        st = spark_types.get(c)
        if st is None:
            continue  # schema mismatch reported separately
        if dt == st:
            continue
        if dt in ("HUGEINT", "UHUGEINT") or dt.startswith("DECIMAL"):
            fatal.append(f"col '{c}': oracle {dt} vs spark {st} — "
                         f"CAST the oracle column (driver hash WOULD FAIL)")
        elif dt in INT_TYPES and st in INT_TYPES:
            warns.append(f"col '{c}': int width {dt} vs {st}")
        else:
            fatal.append(f"col '{c}': oracle {dt} vs spark {st}")
    return fatal, warns


def nested_cols(types):
    """Top-level array/map/struct output columns are FORBIDDEN: the
    driver's pandas compare sorts with sort_values, which raises
    'unhashable type: numpy.ndarray' on them (round-18 q248 failed the
    gate while this script's stringified-tuple sort passed locally).
    Unpack to scalar columns (qs[0] AS q25, ...) or explode to rows."""
    bad = []
    for c, t in types.items():
        u = t.upper()
        if "[]" in u or u.startswith(("STRUCT", "MAP", "LIST", "UNION")):
            bad.append(f"col '{c}': {t}")
    return bad


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
            duck_rel = con.sql(oracle[name])
            duck_types = {c: str(t) for c, t in
                          zip(duck_rel.columns, duck_rel.types)}
            duck_rows = duck_rel.fetchall()
            duck_cols = duck_rel.columns
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sq = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_types = {c: str(t) for c, t in zip(sq.columns, sq.types)}
            spark_rows = sq.fetchall()
            spark_cols = sq.columns
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        nested = nested_cols(spark_types) + nested_cols(duck_types)
        if nested:
            print(f"FAIL {name}: NESTED TOP-LEVEL OUTPUT (driver pandas "
                  f"sort WOULD CRASH): " + "; ".join(sorted(set(nested))))
            n_fail += 1
            continue
        fatal, warns = type_drift(duck_types, spark_types)
        for w in warns:
            print(f"WARN {name}: {w}")
        if fatal:
            print(f"FAIL {name}: TYPE DRIFT: " + "; ".join(fatal))
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
