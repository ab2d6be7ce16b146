#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
sfDir, loads the Spark result parquet written by graft.Verify, sorts
columns by name and rows by all values, and compares cell-by-cell.
Driver-side tooling only — the shipped Scala library does not use this.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        # exact-compare floats; normalize -0.0
        return v + 0.0
    return v


NEAR_MISSES = []


def cmp_cell(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == b:
            return True
        # relative-epsilon fallback: engines that round/interpolate with
        # algebraically-equal but floating-point-different formulas can land
        # one ulp apart on rounding boundaries; treat as a near-miss (logged)
        # rather than a hard fail (ADVICE r1).
        if abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)):
            NEAR_MISSES.append((a, b))
            return True
        return False
    # Decimal vs float etc.
    try:
        if type(a) is not type(b):
            return float(a) == float(b)
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        # reset per query: near-misses from a FAILed query must not leak
        # into the next passing query's count (ADVICE r2)
        NEAR_MISSES.clear()
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        o_cols, s_cols = sorted(oracle.columns), sorted(spark.columns)
        if o_cols != s_cols:
            print(f"FAIL {name}: columns differ oracle={o_cols} spark={s_cols}")
            n_fail += 1
            continue
        o = oracle[o_cols].sort_values(o_cols, kind="mergesort").values.tolist()
        s = spark[s_cols].sort_values(s_cols, kind="mergesort").values.tolist()
        if len(o) != len(s):
            print(f"FAIL {name}: row counts differ oracle={len(o)} spark={len(s)}")
            n_fail += 1
            continue
        bad = None
        for i, (ro, rs) in enumerate(zip(o, s)):
            for j, (a, b) in enumerate(zip(ro, rs)):
                if not cmp_cell(a, b):
                    bad = (i, o_cols[j], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r}")
            n_fail += 1
        else:
            nm = f" [{len(NEAR_MISSES)} near-miss]" if NEAR_MISSES else ""
            print(f"PASS {name} ({len(o)} rows){nm}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
