#!/usr/bin/env python3
"""Generate the EDGE corpus for the differential edge-case gate (EDGE.md).

The driver's sf* corpora are statistically clean: no empty strings, no
unicode beyond ASCII, no zero vectors, no tied sort keys, no skew. Every
one of those absences hides a class of divergence the 178-query registry
could carry silently — tie-break nondeterminism in top-k/rank/keep-first
selection, NaN from zero-norm cosine, tokenizer behavior on ""/whitespace,
code-point-vs-byte length on emoji, timestamp ties inside window frames.
This generator plants exactly those cases while PRESERVING the shipped
value domains (event_type/lang/source/status/priority/segment sets,
2-decimal money, n_chars == len(text), contiguous vec_ids, referential
integrity), so every registered query still binds its constants and the
full registry can run against DuckDB on this corpus via graft.Verify +
tools/selfcheck.py — the same machinery as the driver's gate.

Planted families (each tagged in comments below):
  documents   E1 empty/whitespace-only/single-char, E2 unicode (CJK, emoji,
              combining vs precomposed, RTL), E3 pathological repetition
              (single char / single word / single bigram), E4 exact+near
              dup clusters, E5 quote/backslash/newline/tab payloads (CSV/
              JSON/XML roundtrip stress), E6 long doc, E7 digits/punct-only
  embeddings  V1 zero vector (cosine NaN), V2 identical twins (top-k tie),
              V3 antipodal pair (cos = -1), V4 one-hot, V5 1e-30 / 1e15
              magnitudes (float under/overflow), rest = seeded Gaussian
              label clusters (first 32 ids kept benign: centroid/probe
              ranges vec_id<16 / <20 stay numerically ordinary)
  events      T1 one user with half of all events (skew), T2 single-event
              users, T3 all-events-same-timestamp user (total window tie),
              T4 duplicate (user_id, ts) with distinct event_ids,
              T5 value 0 / negative / 1e12 / 1e-7, T6 props '{}' and
              extra-key JSON, T7 epoch-adjacent + far-future timestamps
  lineitem/   R1 tied prices/dates everywhere, R2 discount 1.0 (zero net),
  orders      R3 quantity/price 0, R4 one customer owns ~25% of orders,
              R5 one part on ~20% of lines, R6 1970-01-01 and 2099 dates
  part/...    S1 empty-string p_name, S2 unicode/quote/comma/newline names,
              S3 acctbal 0 / negative / tie clusters

Usage: gen_edge.py [outDir]   (default /root/repo/edgedata/sfedge)
Everything is seeded; the corpus is deterministic.
"""
import os
import random
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.001"  # region/nation copied verbatim (tiny, canonical)
SEED = 20260816

LANGS = ["en", "de", "fr", "es", "zh"]
SOURCES = [f"src{i}" for i in range(20)]
ETYPES = ["view", "click", "purchase", "signup", "error"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
VOCAB = ("key agg row scan slow fast table value part hash merge batch spark "
         "line sort window the a".split())


def money(rng, lo=1.0, hi=100000.0):
    return round(rng.uniform(lo, hi), 2)


def gen_documents(rng):
    docs = []  # (doc_id, text, lang, source)

    def add(text, lang=None, source=None):
        docs.append((len(docs), text,
                     lang or rng.choice(LANGS), source or rng.choice(SOURCES)))

    # E1: empty / whitespace / single char
    add("")
    add(" ")
    add("   \t\n  ")
    add("a")
    add(".")
    # E2: unicode
    add("汉字文本处理测试 汉字文本处理测试 词元统计")
    add("😀🚀😀🚀 emoji stream 😀🚀 with words between")
    add("café menu café menu")          # precomposed e-acute
    add("café menu café menu")        # combining e-acute (NFC-differs)
    add("مرحبا بالعالم rtl mixed ltr")
    add("zͦaͦlͦgͦoͦ combining stack text")
    # E2b: BM25 keywords ADJACENT to CJK/accented chars (no ASCII boundary
    # chars around them) — pins the Java-\b vs RE2-\b divergence for
    # t128's hash/join/merge terms; the letter-run contract counts these
    # identically on both engines, \b does not
    add("哈希hash表 data join查询 merge合并 éhashé plus plain hash join merge")
    # E3: pathological repetition
    add("a" * 4000)
    add(("word " * 800).strip())
    add(("ping pong " * 400).strip())
    # E4 seeds: dup cluster bases (copied below)
    base1 = " ".join(rng.choice(VOCAB) for _ in range(60))
    base2 = " ".join(rng.choice(VOCAB) for _ in range(45))
    add(base1); add(base2)
    # E5: escaping payloads
    add('he said "quote" and \\backslash\\ and, commas, everywhere')
    add("line one\nline two\nline three")
    add("tab\tseparated\tfields here")
    add("<p>html-ish <b>markup</b> & entities &amp; here</p>")
    add('{"looks": "like json", "n": 3} trailing words')
    # E6: long doc
    add(" ".join(rng.choice(VOCAB) for _ in range(4000)))
    # E7: digits / punctuation only
    add("12345 67890 12345")
    add("!!! ??? ... ;;; :::")
    # filler resembling the shipped corpus
    n_edge = len(docs)
    for _ in range(320 - n_edge):
        add(" ".join(rng.choice(VOCAB) for _ in range(rng.randint(8, 120))))
    # E4: exact duplicates (verbatim copies of earlier docs, incl. edge docs)
    for src_id in [0, 5, 11, n_edge, n_edge + 1, n_edge + 2, 14, 15]:
        add(docs[src_id][1])
    # E4: near duplicates (~5% words replaced)
    for src_id in [14, 15, n_edge + 3, n_edge + 4]:
        words = docs[src_id][1].split(" ")
        for i in range(len(words)):
            if rng.random() < 0.05:
                words[i] = rng.choice(VOCAB)
        add(" ".join(words))
    return [(i, t, l, s, len(t)) for (i, t, l, s) in docs]


def gen_embeddings(rng):
    rows = []  # (vec_id, embedding(64), label)
    centers = {lab: [rng.uniform(-1, 1) for _ in range(64)] for lab in range(10)}

    def gauss(lab):
        c = centers[lab]
        return [round(c[j] + rng.gauss(0, 0.15), 6) for j in range(64)]

    # first 32 ids benign (centroid range vec_id<16, probe range <20)
    for i in range(32):
        lab = i % 10
        rows.append((i, gauss(lab), lab))
    # V1 zero vector
    rows.append((32, [0.0] * 64, 0))
    # V2 identical twins (exact top-k score tie)
    twin = gauss(3)
    rows.append((33, twin, 3))
    rows.append((34, list(twin), 3))
    # V3 antipodal pair
    v = gauss(5)
    rows.append((35, v, 5))
    rows.append((36, [-x for x in v], 5))
    # V4 one-hot
    oh = [0.0] * 64; oh[7] = 1.0
    rows.append((37, oh, 7))
    # V5 magnitude extremes. 1e-30 floats: squares survive only because both
    # engines fold in double (1e-60 per term) — a float-accumulating kernel
    # would underflow to a zero norm on one side only. The large extreme is
    # 100.0 (100x unit scale), NOT 1e15: a 1e15 component overflows the
    # integer-cents canonicalization CAST in BOTH engines IDENTICALLY
    # (Spark CAST_OVERFLOW == DuckDB out-of-range, verified by hand), so the
    # crash contract is symmetric but a crashing row can't be gate-green.
    rows.append((38, [1e-30] * 64, 8))
    rows.append((39, [100.0 if j == 0 else 0.0 for j in range(64)], 9))
    for i in range(40, 300):
        lab = rng.randrange(10)
        rows.append((i, gauss(lab), lab))
    # V6: component-level corruption (round 14, ADVICE) — one NaN
    # component and one NULL component. Same corruption class as the V1
    # zero vector but asymmetric between engines at the COMPONENT level:
    # DuckDB's list_sum ignores NULL elements while Spark's fold NULLs
    # out; NaN ordering/aggregation semantics differ per expression. The
    # scorableVec contract (queries/Similarity.scala) excludes these up
    # front on BOTH engines. Appended at the tail so vec_ids stay
    # contiguous and the Gaussian filler sequence is unchanged.
    # NaN planted as a placeholder here; main() rewrites it to a true
    # 'nan'::FLOAT via SQL (duckdb's executemany converts Python NaN
    # parameters to NULL, which would collapse V6 to two NULL rows)
    nanv = gauss(1); nanv[13] = 0.0
    rows.append((300, nanv, 1))
    nullv = gauss(2); nullv[27] = None
    rows.append((301, nullv, 2))
    return rows


def gen_events(rng):
    rows = []  # (event_id, ts, user_id, event_type, value, props)
    eid = 0
    base = "2024-01-01 00:00:00"

    def ts(sec, micro=0):
        return f"TIMESTAMP '{base}' + INTERVAL ({sec}) SECOND + INTERVAL ({micro}) MICROSECOND"

    def add(sec, uid, et=None, val=None, props=None, micro=0):
        nonlocal eid
        rows.append((eid, ts(sec, micro), uid,
                     et or rng.choice(ETYPES),
                     round(rng.uniform(0, 100), 4) if val is None else val,
                     props or '{"k": %d}' % rng.randint(0, 99)))
        eid += 1

    # T1: user 0 owns ~1500 events over 30 days (sessions + skew)
    sec = 0
    for _ in range(1500):
        sec += rng.choice([5, 30, 120, 2400])  # mixes intra/inter-session gaps
        add(sec, 0)
    # T2: single-event users
    for uid in range(100, 120):
        add(rng.randint(0, 2_000_000), uid)
    # T3: user 1 — 40 events at the SAME timestamp (total tie in every frame)
    for _ in range(40):
        add(777_777, 1)
    # T4: duplicate (user, ts) pairs with distinct event_ids
    for uid in (2, 3):
        for _ in range(3):
            add(10_000, uid)
    # T5: value extremes; T6: props edges
    add(50_000, 4, val=0.0)
    add(50_060, 4, val=-5.25)
    add(50_120, 4, val=1e12)
    add(50_180, 4, val=1e-7)
    add(50_240, 4, props="{}")
    add(50_300, 4, props='{"k": 7, "extra": "x"}')
    # T6b: malformed / non-numeric props — Spark get_json_object NULLs
    # them, DuckDB json_extract THROWS without a json_valid guard (the
    # t39 oracle divergence this corpus pins; see EDGE.md)
    add(50_360, 4, props="not json at all")
    add(50_420, 4, props='{"k": ')
    add(50_480, 4, props='{"k": "str"}')
    # T6c: LENIENTLY-malformed props (round 14, ADVICE) — parse under
    # Jackson's Hive-compat leniency flags (which get_json_object
    # hard-enables) but are SPEC-invalid JSON: DuckDB's json_valid
    # quarantines them to NULL. t39's contract is spec-strict on both
    # engines (from_json with the leniency flags off), pinned here.
    add(50_540, 4, props="{'k': 5}")                       # single quotes
    add(50_600, 4, props='{"k": 3, "s": "a\x01b"}')        # raw ctrl char in string
    add(50_660, 4, props='{"k": 05}')                      # leading zero
    add(50_720, 4, props='{"k": NaN}')                     # non-numeric number
    # T7: timestamp extremes (epoch-adjacent + far future), micro precision
    rows.append((eid, "TIMESTAMP '1970-01-01 00:00:01'", 5, "view", 1.0, '{"k": 1}')); eid += 1
    rows.append((eid, "TIMESTAMP '2099-12-31 23:59:59'", 5, "view", 2.0, '{"k": 2}')); eid += 1
    add(60_000, 6, micro=1)
    add(60_000, 6, micro=2)
    # bulk: 60 ordinary users
    for _ in range(1300):
        add(rng.randint(0, 2_500_000), rng.randint(7, 66))
    return rows


def gen_relational(rng):
    customers = []
    for i in range(300):
        # S3: tie clusters at 0.0 / -100.0 / 5000.0; unicode names sprinkled
        bal = rng.choice([0.0, -100.0, 5000.0]) if i % 7 == 0 else money(rng, -999.99, 9999.99)
        name = f"Customer#{i:09d}" if i % 53 else f"Clienté {i} 中"
        customers.append((i, name, rng.randrange(25), bal, rng.choice(SEGMENTS)))
    suppliers = []
    for i in range(40):
        bal = [0.0, -1.0, 2500.0, 2500.0][i % 4]
        suppliers.append((i, f"Supplier#{i:09d}", rng.randrange(25), bal))
    parts = []
    names = ["", "café \U0001F680 widget", 'quoted "name" here', "comma, name",
             "line\nbreak name", "tab\tname"]
    for i in range(300):
        name = names[i] if i < len(names) else (
            rng.choice(["small", "red", "green", "odd"]) + " " +
            rng.choice(["ring", "widget", "bolt", "gear"]))
        price = [0.0, 0.01, 99.99, 99.99][i % 4] if i % 5 == 0 else money(rng, 1, 2000)
        parts.append((i, name, f"Brand#{rng.randrange(25)}",
                      rng.choice(["ECONOMY", "STANDARD", "LARGE", "PROMO", "SMALL", "MEDIUM"]),
                      rng.choice([0, 1, 5, 50, 50]), price))
    orders, lineitems = [], []
    li_id = 0
    for okey in range(2000):
        # R4: customer 0 owns ~25% of orders
        cust = 0 if rng.random() < 0.25 else rng.randrange(300)
        # R6 + R1: epoch/far dates, heavy date ties on '1997-06-15'
        r = rng.random()
        if r < 0.01:
            odate = "TIMESTAMP '1970-01-01 00:00:00'"
        elif r < 0.02:
            odate = "TIMESTAMP '2099-01-01 00:00:00'"
        elif r < 0.30:
            odate = "TIMESTAMP '1997-06-15 00:00:00'"
        else:
            odate = (f"TIMESTAMP '1995-01-01 00:00:00' + "
                     f"INTERVAL ({rng.randint(0, 2400)}) DAY")
        total = rng.choice([111111.11, 222222.22]) if rng.random() < 0.2 else money(rng)
        orders.append((okey, cust, rng.choice("POF"), total, odate, rng.choice(PRIORITIES)))
        for ln in range(1, rng.randint(1, 7) + 1):
            pkey = 0 if rng.random() < 0.2 else rng.randrange(300)   # R5
            qty = rng.choice([0.0, 1.0, 25.0, 25.0, 50.0])           # R3+R1 ties
            price = rng.choice([0.0, 0.01, 5000.00, 5000.00]) if rng.random() < 0.15 \
                else money(rng, 900, 100000)
            disc = rng.choice([0.0, 0.05, 0.10, 1.0])                # R2
            tax = rng.choice([0.0, 0.03, 0.08])
            if rng.random() < 0.30:
                sdate = "TIMESTAMP '1997-07-01 00:00:00'"            # R1 tie
            else:
                sdate = (f"TIMESTAMP '1995-02-01 00:00:00' + "
                         f"INTERVAL ({rng.randint(0, 2400)}) DAY")
            lineitems.append((okey, pkey, rng.randrange(40), ln, qty, price,
                              disc, tax, rng.choice("ANR"), rng.choice("OF"), sdate))
            li_id += 1
    return customers, suppliers, parts, orders, lineitems


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/edgedata/sfedge"
    rng = random.Random(SEED)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for f in ("region.parquet", "nation.parquet"):
        shutil.copy(os.path.join(SRC, f), os.path.join(out, f))

    docs = gen_documents(rng)
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")

    embs = gen_embeddings(rng)
    con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.executemany("INSERT INTO e VALUES (?,?,?)", embs)
    # V6 NaN component (see gen_embeddings): set element 14 of vec 300 to a
    # TRUE NaN — Python NaN params arrive as NULL, so it must be SQL-side
    con.execute("""UPDATE e SET embedding = list_transform(range(1, 65),
        i -> CASE WHEN i = 14 THEN 'nan'::FLOAT ELSE embedding[i] END)
        WHERE vec_id = 300""")
    con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    evs = gen_events(rng)
    # props may contain single quotes (T6c plants {'k': 5}) — escape for
    # the SQL literal; the control-char byte passes through verbatim
    vals = ",".join(f"({i}, {t}, {u}, '{et}', {v!r}, '{p}')"
                    for (i, t, u, et, v, p0) in evs
                    for p in [p0.replace("'", "''")])
    con.execute(f"""COPY (SELECT * FROM (VALUES {vals})
        t(event_id, ts, user_id, event_type, value, props)
        ORDER BY event_id) TO '{out}/events.parquet' (FORMAT PARQUET)""")

    customers, suppliers, parts, orders, lineitems = gen_relational(rng)
    con.execute("CREATE TABLE c (c_custkey BIGINT, c_name VARCHAR, c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?,?,?,?,?)", customers)
    con.execute(f"COPY c TO '{out}/customer.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE s (s_suppkey BIGINT, s_name VARCHAR, s_nationkey INTEGER, s_acctbal DOUBLE)")
    con.executemany("INSERT INTO s VALUES (?,?,?,?)", suppliers)
    con.execute(f"COPY s TO '{out}/supplier.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE p (p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?,?,?,?,?,?)", parts)
    con.execute(f"COPY p TO '{out}/part.parquet' (FORMAT PARQUET)")
    ovals = ",".join(f"({k}, {c}, '{st}', {tp!r}, {dt}, '{pr}')"
                     for (k, c, st, tp, dt, pr) in orders)
    con.execute(f"""COPY (SELECT * FROM (VALUES {ovals})
        t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
        ORDER BY o_orderkey) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    con.execute("""CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
        l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
        l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)""")
    for (ok, pk, sk, ln, q, pr, d, tx, rf, ls, sd) in lineitems:
        con.execute(f"INSERT INTO li VALUES ({ok},{pk},{sk},{ln},{q!r},{pr!r},{d!r},{tx!r},'{rf}','{ls}',{sd})")
    con.execute(f"COPY (SELECT * FROM li ORDER BY l_orderkey, l_linenumber) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

    for t in ["documents", "embeddings", "events", "customer", "supplier",
              "part", "orders", "lineitem"]:
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote edge corpus to {out}")


if __name__ == "__main__":
    main()
