#!/usr/bin/env python3
"""DuckDB oracle wall-clock for the bench artifact (graft.Bench shells out
here): runs each oracle SQL n times over the same parquet tables and prints
one line per query: `<name>\t<min_seconds>`. Materializes every result
(fetchall) so sorts/limits are executed, mirroring the Spark side's noop sink.

Usage: oraclebench.py <sfDir> <oracleSqlJson> [runs=3] [threads=32]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_json = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    threads = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(sql_json))
    # fixed per-query overhead (parse/plan/fetch of an empty-compute query),
    # min over the same n runs — emitted as a reserved row so the bench can
    # report compute-ratios: sub-second oracles otherwise make launch cost
    # read as a 4-7x Spark "slowdown" that no amount of plan work removes
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        con.query("SELECT 1 AS x").fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"__overhead__\t{best:.6f}")
    for name in sorted(oracle):
        # per-query isolation: one bad oracle string must not cost the
        # artifact its entire denominator (the other queries' timings)
        try:
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                con.query(oracle[name]).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{name}\t{best:.6f}")
        except Exception as e:
            print(f"[oraclebench] {name}: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
