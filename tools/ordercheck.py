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

This tool replays that audit against any graft.Verify dump. For each
oracle it finds the TOP-LEVEL ORDER BY (paren-depth-0 scan over a copy
with comments and string literals blanked — an inner CTE's ORDER BY never
counts, which is what used to shunt every 1-row scalar report into
MANUAL):

  - no top-level ORDER BY: sound iff the dump holds <= 1 row, else
    AMBIGUOUS (the emitted-order compare has no contract at all);
  - otherwise the keys are split on top-level commas with ASC/DESC/NULLS
    markers stripped, KEEPING expression text, and the check groups the
    dumped rows by every key that binds against the output schema
    (plain columns AND expressions like md5(CAST(doc_id AS VARCHAR))).
    Keys that do not bind are retried through an `expr AS alias` rename
    map scraped from the SQL (ORDER BY p_brand vs SELECT p_brand AS
    brand). Grouping by a SUBSET of the keys is SOUND: if the evaluable
    subset already puts <= 1 distinct row in every group, the full key
    list — a refinement — is total a fortiori.

Only a query whose evaluable-key grouping leaves ties (or binds nothing)
lands in MANUAL for eyeball review.

Usage: ordercheck.py <verifyOutDir>
Exit 0 = no AMBIGUOUS contract found (MANUAL entries still print).
"""
import json
import os
import re
import sys

import duckdb


def blank_noise(sql):
    """Copy of sql with -- comments and '...' literals space-blanked so a
    paren or ORDER BY inside them can't confuse the depth scan. Length
    (and thus every index) is preserved."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
        elif c == "'":
            out[i] = " "
            i += 1
            while i < n:
                if sql[i] == "'":
                    # '' escape stays inside the literal
                    if i + 1 < n and sql[i + 1] == "'":
                        out[i] = out[i + 1] = " "
                        i += 2
                        continue
                    out[i] = " "
                    i += 1
                    break
                out[i] = " "
                i += 1
        else:
            i += 1
    return "".join(out)


def top_level_order_by(sql):
    """(start, clause) of the LAST depth-0 ORDER BY, or None."""
    clean = blank_noise(sql)
    depth = 0
    last = None
    for m in re.finditer(r"[()]|ORDER\s+BY", clean, re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            last = m.end()
    if last is None:
        return None
    # the clause runs to end-of-statement (top level: nothing follows but
    # an optional LIMIT/OFFSET, which we strip)
    clause = sql[last:].strip().rstrip(";").strip()
    clause = re.sub(r"\b(LIMIT|OFFSET)\b[\s\S]*$", "", clause, flags=re.I).strip()
    return clause


def split_keys(clause):
    """Top-level comma split of an ORDER BY clause; ASC/DESC/NULLS
    FIRST/LAST markers stripped, expression text kept."""
    keys, depth, cur = [], 0, []
    for ch in clause:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            keys.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    keys.append("".join(cur))
    out = []
    for k in keys:
        k = k.strip()
        k = re.sub(r"\s+(ASC|DESC)\s*$", "", k, flags=re.I)
        k = re.sub(r"\s+NULLS\s+(FIRST|LAST)\s*$", "", k, flags=re.I)
        k = re.sub(r"\s+(ASC|DESC)\s*$", "", k, flags=re.I)
        if k:
            out.append(k)
    return out


def alias_map(sql):
    """expr -> alias pairs scraped from `expr AS alias` sites (identifier
    exprs only — enough for the ORDER-BY-pre-rename-column pattern)."""
    m = {}
    for expr, alias in re.findall(
            r"([A-Za-z_][A-Za-z0-9_.]*)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)",
            sql, re.I):
        m.setdefault(expr, alias)
        m.setdefault(expr.split(".")[-1], alias)
    return m


def main():
    out = sys.argv[1]
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    ambiguous, manual = [], []
    for name, sql in sorted(oracle.items()):
        path = f"{out}/{name}"
        if not os.path.isdir(path):
            continue
        rel = f"'{path}/*.parquet'"
        clause = top_level_order_by(sql)
        if clause is None:
            nrows = con.execute(f"SELECT count(*) FROM {rel}").fetchone()[0]
            if nrows > 1:
                ambiguous.append((name, f"{nrows} rows with NO top-level ORDER BY"))
            continue
        keys = split_keys(clause)
        renames = alias_map(sql)

        def binds(expr):
            try:
                con.execute(f"SELECT {expr} FROM {rel} LIMIT 0")
                return True
            except Exception:
                return False

        usable = []
        for k in keys:
            # candidate order matters for soundness: the rename map (an
            # `expr AS alias` match for THIS key) is tried BEFORE the key
            # itself — a renamed key's old name can coincide with an
            # unrelated same-named output column, and binding that column
            # would unsoundly pass the tie check
            bare = k.split(".")[-1] if re.fullmatch(
                r"[A-Za-z_][A-Za-z0-9_]*\.[A-Za-z_][A-Za-z0-9_]*", k) else None
            for cand in (renames.get(k),
                         renames.get(bare) if bare else None,
                         k, bare):
                if cand and binds(cand):
                    usable.append(cand)
                    break
        if not usable:
            manual.append((name, clause.replace("\n", " ")[:70]))
            continue
        cl = ", ".join(usable)
        try:
            n = con.execute(f"""
                SELECT count(*) FROM (
                  SELECT 1
                  FROM (SELECT tt AS r, * FROM {rel} tt)
                  GROUP BY {cl}
                  HAVING count(*) > 1
                     AND count(DISTINCT CAST(r AS VARCHAR)) > 1)""").fetchone()[0]
        except Exception:
            # a key can bind as a standalone SELECT yet be illegal in
            # GROUP BY (aggregate or window expression) — human decides
            manual.append((name, clause.replace("\n", " ")[:70]))
            continue
        if n > 0:
            if len(usable) < len(keys):
                # subset proof failed but unevaluable keys remain — a human
                # must decide whether those break the ties
                manual.append((name, clause.replace("\n", " ")[:70]))
            else:
                ambiguous.append(
                    (name, f"{n} ORDER BY key groups hold distinct rows"))
    for name, why in ambiguous:
        print(f"AMBIGUOUS {name}: {why}")
    for name, raw in manual:
        print(f"MANUAL    {name}: ORDER BY {raw}")
    print(f"{len(ambiguous)} ambiguous / {len(manual)} manual "
          f"/ {len(oracle)} oracles")
    sys.exit(1 if ambiguous else 0)


if __name__ == "__main__":
    main()
