#!/usr/bin/env python3
"""Generate an sf1 documents fixture (10x sf0.1) for the heavy-family scale
rehearsal (SCALE.md "sf1 rehearsal" section).

The driver ships sf0.001/0.01/0.1 only and /root/testdata is read-only, so
the 10x corpus is synthesized HERE, statistically matched to the shipped
generator as measured from sf0.1:

  - vocabulary: 500 fresh random words (length 3-8, seeded), i.e. GROWN
    ~16x versus the shipped 31. Growing the vocabulary with the corpus is
    deliberate and is what makes the rehearsal meaningful: keeping the
    31-word vocabulary fixed at 50k docs makes RANDOM documents
    0.43-Jaccard similar on char trigrams (measured; max 0.96 in a 40-doc
    sample), so chance >=0.8 near-dup pairs grow ~n^2 and every exact
    near-dup operator's OUTPUT is quadratic regardless of algorithm --
    a degenerate corpus no real crawl resembles (open vocabulary => a 10x
    crawl has ~10x near-dup pairs). Suffix-variant words were rejected
    too: variants of one base share its trigrams, which keeps the
    universal-trigram floor high. See SCALE.md "sf1 rehearsal".
  - per-doc word count: resampled from the empirical sf0.1 distribution;
  - source/lang: resampled from the empirical joint distribution;
  - near-dups: 5% of docs are copies of a random earlier doc with ~5% of
    words replaced (measured: 25 bigram-Jaccard>=0.8 pairs per 500 docs);
  - exact dups: 0.2% verbatim copies (measured: 8 per 5000).

Everything is seeded. Round 11 adds a 10x embeddings table (20k vectors)
so the ANN/index-maintenance family can rehearse at 10x too: per-label
per-dimension Gaussians fitted from sf0.1 (mean/std over each of the 64
dims within each of the 10 labels), labels resampled from the empirical
marginal -- preserving the label-cluster structure the IVF/centroid
queries exploit. A 10x lineitem (6M rows) is synthesized as 10
orderkey-offset copies of sf0.1 — distinct orderkeys and rows scale
10x, the per-suppkey group COUNT stays fixed while every group grows
10x deep (the shape t163's grouped selection must absorb), and a
per-copy cent-level price shift keeps distinct-value counts growing
with the data (so t57's exact-median frequency pre-aggregation can't
cheat by collapsing to the sf0.1 value universe). The remaining tables
are copied from sf0.1 unscaled.

The round-11 continuation adds a scale multiplier so the SAME generator
contract produces the sf10 corpus (100x sf0.1) for the second decade of
the rehearsal: mult=10 gives 500k docs, 200k vectors, and a 5000-word
vocabulary (the open-vocabulary rule again — Heaps-law-style ~10x type
growth per 10x corpus, for the same degenerate-Jaccard reason as sf1).
The scaled lineitem stays at 10 copies for any mult (the relational
rehearsal is a separate axis; scaling it 100x would just slow the
documents-family runs this corpus exists for).

Round 12 adds the relational axis's own second decade: an optional
liCopies arg scales lineitem to liCopies orderkey-offset copies (100 ->
60M rows), and when liCopies != 10 ALSO scales orders the same way
(o_orderkey offset, cent-level o_totalprice shift, o_custkey kept so
every per-customer window partition grows liCopies deep — the q10
shape) — plus --relational-only to skip the document/embedding
synthesis for a corpus that exists only for the lineitem/orders family.

--events N additionally scales the events table N-fold for the TEMPORAL
axis: each copy shifts timestamps by i*31 days (one epoch per copy —
intra-copy gap structure, and thus session boundaries, are preserved
verbatim), offsets event_id, and keeps user_id so every per-user
window/session partition grows N deep — the q19/t115 shape.

Usage: gen_sf1.py [outDir] [mult] [liCopies] [--relational-only]
                  [--events N]
       (default /root/repo/testdata-sf1 1 10)
"""
import os
import random
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
N_DOCS = 50_000
N_VECS = 20_000
P_NEAR = 0.05
P_EXACT = 0.002
SEED = 20260814


def main():
    argv = sys.argv[1:]
    ev_copies = 0
    if "--events" in argv:
        i = argv.index("--events")
        if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
            sys.exit("usage: gen_sf1.py [outDir] [mult] [liCopies] "
                     "[--relational-only] [--events N]  (N must be an integer)")
        ev_copies = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    vec_mult = 0
    if "--vectors-only" in argv:
        i = argv.index("--vectors-only")
        if i + 1 >= len(argv) or not argv[i + 1].lstrip("-").isdigit():
            sys.exit("usage: gen_sf1.py [outDir] [--vectors-only MULT]  "
                     "(MULT must be an integer)")
        vec_mult = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]
    relational_only = "--relational-only" in argv
    out = args[0] if len(args) > 0 else "/root/repo/testdata-sf1"
    mult = int(args[1]) if len(args) > 1 else 1
    li_copies = int(args[2]) if len(args) > 2 else 10
    n_docs, n_vecs, n_vocab = N_DOCS * mult, N_VECS * mult, 500 * mult
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # The third-decade relational COPY (liCopies=1000 -> 600M lineitem +
    # 150M orders) buffers its whole result under DuckDB's default
    # preserve_insertion_order and OOMs the box (observed: 98 GB resident,
    # zero bytes written). Output order is irrelevant -- every consumer
    # sorts or aggregates -- so stream the COPY and cap the buffer.
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    if vec_mult:
        gen_vectors_only(con, out, N_VECS * vec_mult)
        for f in os.listdir(SRC):
            if f != "embeddings.parquet":
                shutil.copy(os.path.join(SRC, f), os.path.join(out, f))
        nv = con.execute(
            f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
        print(f"wrote {out}: {nv} vecs (vector axis; other tables = sf0.1)")
        return
    if relational_only:
        gen_relational(con, out, li_copies)
        skip = {"documents.parquet", "embeddings.parquet",
                "lineitem.parquet", "orders.parquet"}
        if ev_copies:
            gen_events(con, out, ev_copies)
            skip.add("events.parquet")
        for f in os.listdir(SRC):
            if f not in skip:
                shutil.copy(os.path.join(SRC, f), os.path.join(out, f))
        n = con.execute(f"SELECT count(*) FROM '{out}/lineitem.parquet'").fetchone()[0]
        no = con.execute(f"SELECT count(*) FROM '{out}/orders.parquet'").fetchone()[0]
        ne = (con.execute(f"SELECT count(*) FROM '{out}/events.parquet'").fetchone()[0]
              if os.path.exists(f"{out}/events.parquet") else 0)
        print(f"wrote {out}: {n} lineitem rows, {no} orders rows, "
              f"{ne} events rows (relational/temporal axis)")
        return
    wordcounts = [r[0] for r in con.execute(
        f"SELECT len(regexp_extract_all(text, '\\S+')) FROM '{SRC}/documents.parquet'"
    ).fetchall()]
    srclang = con.execute(
        f"SELECT source, lang FROM '{SRC}/documents.parquet'").fetchall()

    rnd = random.Random(SEED)
    drawn = {"".join(rnd.choice("abcdefghijklmnopqrstuvwxyz")
                     for _ in range(rnd.randint(3, 8)))
             for _ in range(n_vocab + 20 * mult)}
    # 3-letter collisions grow ~quadratically with draws while the 20*mult
    # margin grows linearly, so at large mult the deduped set can fall
    # short — top up until n_vocab distinct words exist (a no-op at the
    # mults used so far, keeping those corpora bit-identical)
    while len(drawn) < n_vocab:
        drawn.add("".join(rnd.choice("abcdefghijklmnopqrstuvwxyz")
                          for _ in range(rnd.randint(3, 8))))
    vocab = sorted(drawn)[:n_vocab]
    assert len(vocab) == n_vocab, (len(vocab), n_vocab)
    docs = []
    for i in range(n_docs):
        u = rnd.random()
        if docs and u < P_EXACT:
            text = docs[rnd.randrange(len(docs))][1]
        elif docs and u < P_EXACT + P_NEAR:
            words = docs[rnd.randrange(len(docs))][1].split(" ")
            words = [w if rnd.random() >= 0.05 else rnd.choice(vocab)
                     for w in words]
            text = " ".join(words)
        else:
            n = rnd.choice(wordcounts)
            text = " ".join(rnd.choice(vocab) for _ in range(n))
        source, lang = srclang[rnd.randrange(len(srclang))]
        docs.append((i, text, lang, source, len(text)))

    # arrow-backed bulk load: executemany is row-at-a-time and crawls at
    # the 500k-doc scale
    import pandas as pd
    ddf = pd.DataFrame(docs, columns=["doc_id", "text", "lang", "source", "n_chars"])
    con.register("ddf", ddf)
    con.execute("CREATE TABLE d AS SELECT CAST(doc_id AS BIGINT) AS doc_id, text, "
                "lang, source, CAST(n_chars AS BIGINT) AS n_chars FROM ddf")
    con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")

    # 10x embeddings: per-(label, dim) Gaussian fit from sf0.1, labels
    # from the empirical marginal — same 64-dim float32 list schema
    stats = con.execute(
        f"""SELECT label, pos - 1, avg(x), stddev_samp(x)
            FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                         unnest(embedding) AS x
                  FROM '{SRC}/embeddings.parquet')
            GROUP BY 1, 2""").fetchall()
    mu = {(int(l), int(p)): (m, s) for l, p, m, s in stats}
    label_marginal = [int(r[0]) for r in con.execute(
        f"SELECT label FROM '{SRC}/embeddings.parquet'").fetchall()]
    dims = 1 + max(p for _, p in mu.keys())
    vrnd = random.Random(SEED + 1)
    vecs = []
    for vid in range(n_vecs):
        lab = label_marginal[vrnd.randrange(len(label_marginal))]
        emb = [vrnd.gauss(*mu[(lab, p)]) for p in range(dims)]
        vecs.append((vid, emb, lab))
    edf = pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"])
    con.register("edf", edf)
    con.execute("CREATE TABLE e AS SELECT CAST(vec_id AS BIGINT) AS vec_id, "
                "CAST(embedding AS FLOAT[]) AS embedding, "
                "CAST(label AS INTEGER) AS label FROM edf")
    con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    gen_relational(con, out, li_copies)
    skip = {"documents.parquet", "embeddings.parquet",
            "lineitem.parquet", "orders.parquet"}
    if ev_copies:
        gen_events(con, out, ev_copies)
        skip.add("events.parquet")
    for f in os.listdir(SRC):
        if f not in skip:
            shutil.copy(os.path.join(SRC, f), os.path.join(out, f))
    n, avg = con.execute(f"SELECT count(*), avg(length(text)) "
                         f"FROM '{out}/documents.parquet'").fetchone()
    nv = con.execute(f"SELECT count(*) FROM '{out}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {out}: {n} docs, avg len {avg:.0f}; {nv} vecs")


def gen_vectors_only(con, out, n_vecs):
    """The VECTOR axis's own corpus (--vectors-only MULT): embeddings
    scaled MULT-fold with every other table copied from sf0.1 unscaled,
    for the certification-arm / ANN-index family whose cost is vector
    count, not document count. Same statistical contract as the standard
    embeddings synthesis (per-(label, dim) Gaussians fitted from sf0.1,
    labels from the empirical marginal) but drawn with numpy's
    PCG64(SEED+2) instead of the random.gauss loop — 2M x 64 draws is
    ~130M samples, minutes-vs-hours territory. A distinct corpus class,
    so the sf1/sf10/sf100 embeddings stay bit-identical to prior rounds."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    stats = con.execute(
        f"""SELECT label, pos - 1, avg(x), stddev_samp(x)
            FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
                         unnest(embedding) AS x
                  FROM '{SRC}/embeddings.parquet')
            GROUP BY 1, 2""").fetchall()
    labels_sorted = sorted({int(l) for l, _, _, _ in stats})
    dims = 1 + max(int(p) for _, p, _, _ in stats)
    mu = np.zeros((len(labels_sorted), dims))
    sd = np.zeros((len(labels_sorted), dims))
    lab_idx = {l: i for i, l in enumerate(labels_sorted)}
    for l, p, m, s in stats:
        mu[lab_idx[int(l)], int(p)] = m
        sd[lab_idx[int(l)], int(p)] = s
    marginal = np.array([int(r[0]) for r in con.execute(
        f"SELECT label FROM '{SRC}/embeddings.parquet'").fetchall()])
    rng = np.random.default_rng(SEED + 2)
    labs = marginal[rng.integers(0, len(marginal), size=n_vecs)]
    li = np.vectorize(lab_idx.get)(labs)
    emb = (mu[li] + rng.standard_normal((n_vecs, dims)) * sd[li]).astype(np.float32)
    flat = pa.array(emb.reshape(-1), type=pa.float32())
    offsets = pa.array(np.arange(0, (n_vecs + 1) * dims, dims, dtype=np.int32))
    table = pa.table({
        "vec_id": pa.array(np.arange(n_vecs, dtype=np.int64)),
        "embedding": pa.ListArray.from_arrays(offsets, flat),
        "label": pa.array(labs.astype(np.int32)),
    })
    pq.write_table(table, f"{out}/embeddings.parquet")


def gen_events(con, out, copies):
    """Scaled events for the temporal axis: copy i shifts timestamps by
    i*31 days (one epoch per copy — the source span is 30 days, so epochs
    never overlap and intra-copy gap structure, i.e. session boundaries,
    is preserved verbatim), offsets event_id, and keeps user_id so every
    per-user window/session partition grows `copies` deep."""
    con.execute(
        f"""COPY (
              SELECT e.* REPLACE (
                e.event_id + c.i * (SELECT max(event_id) + 1
                                    FROM '{SRC}/events.parquet') AS event_id,
                e.ts + c.i * INTERVAL '31 days' AS ts,
                e.value + c.i * 0.01 AS value)
              FROM '{SRC}/events.parquet' e, range({copies}) c(i)
            ) TO '{out}/events.parquet' (FORMAT PARQUET)""")


def gen_relational(con, out, li_copies):
    """Scaled lineitem (always) and orders (when li_copies != 10, the
    relational-axis signal): orderkey-offset copies with cent-level price
    diversification so distinct-value counts grow with the data; group
    keys (l_suppkey, o_custkey, flags) are NOT offset, so every group
    grows li_copies deep — the grouped-selection / window-depth shape the
    axis exists to stress."""
    con.execute(
        f"""COPY (
              SELECT li.* REPLACE (
                li.l_orderkey + c.i * (SELECT max(l_orderkey) + 1
                                       FROM '{SRC}/lineitem.parquet') AS l_orderkey,
                li.l_extendedprice + c.i * 0.01 AS l_extendedprice)
              FROM '{SRC}/lineitem.parquet' li, range({li_copies}) c(i)
            ) TO '{out}/lineitem.parquet' (FORMAT PARQUET)""")
    if li_copies != 10:
        con.execute(
            f"""COPY (
                  SELECT o.* REPLACE (
                    o.o_orderkey + c.i * (SELECT max(o_orderkey) + 1
                                          FROM '{SRC}/orders.parquet') AS o_orderkey,
                    o.o_totalprice + c.i * 0.01 AS o_totalprice)
                  FROM '{SRC}/orders.parquet' o, range({li_copies}) c(i)
                ) TO '{out}/orders.parquet' (FORMAT PARQUET)""")
    else:
        shutil.copy(os.path.join(SRC, "orders.parquet"),
                    os.path.join(out, "orders.parquet"))


if __name__ == "__main__":
    main()
