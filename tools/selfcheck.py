#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same test tables and compare (schema-insensitively: columns sorted by
name, rows in emitted order, doubles compared exactly after the queries' own
ROUND(x,4) canonicalization).

Usage: selfcheck.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            rr.append(v)
        out.append(tuple(rr))
    return out


def main():
    # argv: <sfDir> <verifyOutDir> [comma-separated query-name filter,
    #       matching graft.Verify's third arg for single-query iteration]
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            spark_rel = con.query(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = list(spark_rel.columns)
            spark_rows = spark_rel.fetchall()
            duck_rel = con.query(sql)
            duck_cols = list(duck_rel.columns)
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} != {sorted(duck_cols)}")
            n_fail += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} != {len(b)}")
            n_fail += 1
            continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        # tolerate float repr slop only if values round-trip equal at 4dp
        real_bad = []
        for i, x, y in bad:
            ok = True
            for xv, yv in zip(x, y):
                if xv == yv:
                    continue
                # rel_tol MUST be 0: the default 1e-9 tolerates +-1.0 at
                # billion-scale values and masked a real cent-level
                # divergence as float slop
                if isinstance(xv, float) and isinstance(yv, float) and math.isclose(xv, yv, rel_tol=0.0, abs_tol=2e-9):
                    continue
                ok = False
            if not ok:
                real_bad.append((i, x, y))
        if real_bad:
            i, x, y = real_bad[0]
            print(f"FAIL {name}: {len(real_bad)} diff rows; first at {i}:\n  spark={x}\n  duck ={y}")
            n_fail += 1
        else:
            tag = "PASS" if not bad else "PASS~"  # PASS~ = only sub-1e-9 float slop
            print(f"{tag} {name} ({len(a)} rows)")
            n_pass += 1
    # queries without oracle
    import os
    for d in sorted(os.listdir(out_dir)):
        if only is not None and d not in only:
            continue
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            n = con.query(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n} (no oracle)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
