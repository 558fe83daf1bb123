#!/usr/bin/env python3
"""Audit every registry query's output-ordering contract for totality.

The driver's correctness gate (and tools/selfcheck.py, its stand-in)
compares rows IN EMITTED ORDER. That is only sound when each query's
ORDER BY is a TOTAL order over its output: if two rows tie on the ORDER BY
columns but differ elsewhere, both engines are free to emit them either way
and the gate passes only while they happen to agree. q01 shipped with
exactly that latent fragility — (l_orderkey, l_linenumber) is not unique in
the shipped lineitem, 509 ambiguous tie groups survive its filter at sf0.01,
and the 10x-corpus gate run caught the misalignment (39k rows) that the
sf0.01 gate had been passing by accident.

This tool replays that audit against any graft.Verify dump: for each query,
it parses the oracle's outermost ORDER BY, strips alias prefixes and
DESC/NULLS markers, and checks in DuckDB whether any ORDER BY key group in
the dumped output contains two DISTINCT full rows. Queries whose ORDER BY
cannot be auto-parsed (expression keys, inner LIMIT subqueries) are listed
as MANUAL for eyeball review — in the current registry all of those are
1-row scalar reports or provably-unique keys.

Usage: ordercheck.py <verifyOutDir>
Exit 0 = no AMBIGUOUS contract found (MANUAL entries still print).
"""
import json
import os
import re
import sys

import duckdb


def main():
    out = sys.argv[1]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    ambiguous, manual = [], []
    for name, sql in sorted(oracle.items()):
        hits = re.findall(r'ORDER BY\s+([^)\n;]+(?:\n[^)\n;]+)*)', sql, re.I)
        if not hits:
            continue  # scalar report with no ordering: compare is 1-row
        raw = hits[-1]
        cols = []
        for c in raw.split(','):
            c = c.strip().split()[0]        # drop DESC / NULLS markers
            c = c.split('.')[-1].strip('"')  # strip alias prefix
            if re.fullmatch(r'[A-Za-z_][A-Za-z0-9_]*', c):
                cols.append(c)
            else:
                cols = None
                break
        path = f"{out}/{name}"
        if not os.path.isdir(path):
            continue
        have = set(con.query(
            f"SELECT * FROM '{path}/*.parquet' LIMIT 0").columns)
        if cols is None or not set(cols) <= have:
            manual.append((name, raw.replace('\n', ' ')[:70]))
            continue
        cl = ", ".join(f'"{c}"' for c in cols)
        n = con.execute(f"""
            SELECT count(*) FROM (
              SELECT {cl}
              FROM (SELECT tt AS r, * FROM '{path}/*.parquet' tt)
              GROUP BY {cl}
              HAVING count(*) > 1
                 AND count(DISTINCT CAST(r AS VARCHAR)) > 1)""").fetchone()[0]
        if n > 0:
            ambiguous.append((name, n))
    for name, n in ambiguous:
        print(f"AMBIGUOUS {name}: {n} ORDER BY key groups hold distinct rows")
    for name, raw in manual:
        print(f"MANUAL    {name}: ORDER BY {raw}")
    print(f"{len(ambiguous)} ambiguous / {len(manual)} manual "
          f"/ {len(oracle)} oracles")
    sys.exit(1 if ambiguous else 0)


if __name__ == "__main__":
    main()
