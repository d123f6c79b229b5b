#!/usr/bin/env python3
"""One-off scale-up generator for the scaling-slope bench (dev
tooling, driver-side python only — NOT part of the Spark library).

Produces `documents.parquet` and `events.parquet` at a requested
scale factor under /root/repo/localdata/sf<SF>/, statistically shaped
like the driver's sf0.1 testdata (word-salad docs drawn from the same
vocabulary with ~the same length distribution and a small exact/near
duplicate rate; events with the 1.5% users/events ratio, the same
five event types, and the same fixed Jan-2024 window). Seeded and
deterministic. The remaining sf0.1 tables are symlinked in so
`graft.Tables.load` works unchanged; only documents/events are
actually larger.

Usage: gen_scale.py <sf>            # e.g. 0.5 or 1.0
Scale anchors: sf0.1 = 5,000 docs / 100,000 events.
"""
import random
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
OUT_ROOT = Path("/root/repo/localdata")

LANGS = [("en", 0.70), ("zh", 0.10), ("fr", 0.10), ("de", 0.10)]
# uniform across the driver's five types (probed at sf0.1); value is
# exponential with mean 50 rounded to cents (driver: mean≈std≈49.9,
# min 0), props the driver's '{"k": N}' shape
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def gen_documents(con, rng, n_docs, out):
    vocab = [r[0] for r in con.sql(f"""
        select distinct unnest(string_split(text, ' ')) w
        from '{SRC}/documents.parquet' order by 1""").fetchall()
        if r[0]]
    n_src = 20
    rows = []
    for i in range(n_docs):
        nw = max(3, int(rng.gauss(55, 18)))
        text = " ".join(rng.choice(vocab) for _ in range(nw))
        rows.append((i, text))
    # duplicate structure: ~0.2% exact dups + ~0.2% near dups (two
    # words swapped), mirroring the handful of twins in the driver data
    for _ in range(max(1, n_docs // 500)):
        a, b = rng.randrange(n_docs), rng.randrange(n_docs)
        rows[b] = (rows[b][0], rows[a][1])
        c, d = rng.randrange(n_docs), rng.randrange(n_docs)
        w = rows[c][1].split(" ")
        if len(w) > 4:
            w[rng.randrange(len(w))] = rng.choice(vocab)
            rows[d] = (rows[d][0], " ".join(w))
    recs = []
    for i, text in rows:
        r = rng.random()
        acc, lang = 0.0, LANGS[-1][0]
        for lg, p in LANGS:
            acc += p
            if r < acc:
                lang = lg
                break
        recs.append((i, text, lang, f"src{rng.randrange(n_src)}",
                     len(text)))
    con.sql("create or replace table _docs (doc_id bigint, text varchar, "
            "lang varchar, source varchar, n_chars bigint)")
    con.executemany("insert into _docs values (?,?,?,?,?)", recs)
    con.sql(f"copy (select * from _docs order by doc_id) to '{out}' "
            "(format parquet)")


def gen_events(con, rng, n_events, out):
    n_users = max(1, int(n_events * 0.015))
    base = 1704067200_000000  # 2024-01-01T00:00:00Z in micros
    span = 30 * 86400 * 1_000_000
    con.sql("create or replace table _ev (event_id bigint, ts timestamp, "
            "user_id bigint, event_type varchar, value double, "
            "props varchar)")
    batch = []
    for i in range(n_events):
        us = base + rng.randrange(span)
        et = EVENT_TYPES[rng.randrange(5)]
        v = round(rng.expovariate(1.0 / 50.0), 2)
        batch.append((i, us, rng.randrange(n_users), et, v,
                      '{"k": %d}' % rng.randrange(100)))
        if len(batch) >= 50000:
            con.executemany("insert into _ev values "
                            "(?, make_timestamp(?), ?, ?, ?, ?)", batch)
            batch = []
    if batch:
        con.executemany("insert into _ev values "
                        "(?, make_timestamp(?), ?, ?, ?, ?)", batch)
    con.sql(f"copy (select * from _ev order by event_id) to '{out}' "
            "(format parquet)")


def gen_lineitem(con, n_li, out):
    """Scaled bipartite graph source for the xg-family slope runs:
    node domains (parts, suppliers, orders) scale WITH the edge count
    so average degree stays at the driver's ~30 lineitems/part —
    TPC-H's own scaling rule. Values are hash-uniform (the driver's
    key/flag/date columns probe uniform), generated fully in SQL so
    6M rows cost seconds. (l_orderkey, l_linenumber) stays unique."""
    n_parts = max(1, n_li // 30)
    n_supp = max(1, n_li // 600)
    con.sql(f"""copy (
        select i // 4 as l_orderkey,
          cast(hash(i * 7 + 1) % {n_parts} as bigint) as l_partkey,
          cast(hash(i * 13 + 2) % {n_supp} as bigint) as l_suppkey,
          cast(i % 4 + 1 as integer) as l_linenumber,
          cast(1 + hash(i * 17 + 3) % 50 as double) as l_quantity,
          round(900 + (hash(i * 19 + 4) % 10410000) / 100.0, 2)
            as l_extendedprice,
          round((hash(i * 23 + 5) % 11) / 100.0, 2) as l_discount,
          round((hash(i * 29 + 6) % 9) / 100.0, 2) as l_tax,
          ['A','N','R'][cast(hash(i * 31 + 7) % 3 as int) + 1]
            as l_returnflag,
          ['F','O'][cast(hash(i * 37 + 8) % 2 as int) + 1]
            as l_linestatus,
          timestamp '1995-01-02'
            + interval (hash(i * 41 + 9) % 2498) days as l_shipdate
        from range({n_li}) t(i) order by l_orderkey, l_linenumber
        ) to '{out}' (format parquet)""")


def gen_part(con, n_parts, out):
    """Scaled part master for the er-family slope runs: p_name =
    adjective + ' ' + noun hash-uniform over the driver's probed
    8x8 vocabulary (sf0.1: 8 first tokens x 8 second tokens, ~2500
    parts per first token). Scaling parts while the name palette
    stays FIXED is exactly the er1-killer the slope table exists to
    witness: first-token blocks grow linearly until the 10k cap
    excludes all of them, while er2's (tok1, tok2) blocks grow 8x
    slower. Fully in SQL (seconds at 6M rows)."""
    adjs = "['blue','cold','hot','large','new','old','red','small']"
    nouns = ("['anvil','bolt','gear','gizmo','plate','ring','rod',"
             "'widget']")
    types = ("['ECONOMY','LARGE','MEDIUM','PROMO','SMALL',"
             "'STANDARD']")
    con.sql(f"""copy (
        select i as p_partkey,
          {adjs}[cast(hash(i * 43 + 11) % 8 as int) + 1] || ' ' ||
            {nouns}[cast(hash(i * 47 + 12) % 8 as int) + 1] as p_name,
          'Brand#' || cast(1 + hash(i * 53 + 13) % 25 as varchar)
            as p_brand,
          {types}[cast(hash(i * 59 + 14) % 6 as int) + 1] as p_type,
          cast(1 + hash(i * 61 + 15) % 50 as integer) as p_size,
          round(900 + (hash(i * 67 + 16) % 1000) / 10.0, 2)
            as p_retailprice
        from range({n_parts}) t(i) order by p_partkey
        ) to '{out}' (format parquet)""")


def gen_embeddings(rng, con, n_vecs, out):
    """Scaled ANN corpus: 64-dim gaussian(0, 0.13) float vectors with
    labels 0..9 — the driver's probed embedding distribution."""
    con.sql("create or replace table _emb (vec_id bigint, "
            "embedding float[], label integer)")
    batch = []
    for i in range(n_vecs):
        vec = [round(rng.gauss(0.0, 0.13), 6) for _ in range(64)]
        batch.append((i, vec, rng.randrange(10)))
        if len(batch) >= 5000:
            con.executemany("insert into _emb values (?,?,?)", batch)
            batch = []
    if batch:
        con.executemany("insert into _emb values (?,?,?)", batch)
    con.sql(f"copy (select * from _emb order by vec_id) to '{out}' "
            "(format parquet)")


def main():
    sf = float(sys.argv[1])
    rng = random.Random(42)
    out = OUT_ROOT / f"sf{sf:g}"
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    n_docs = int(5000 * sf / 0.1)
    n_events = int(100000 * sf / 0.1)
    gen_documents(con, rng, n_docs, out / "documents.parquet")
    gen_events(con, rng, n_events, out / "events.parquet")
    # scaled graph + ANN + ER sources (separate seeds so adding them
    # never perturbs the documents/events byte-stream above)
    for t in ["lineitem", "embeddings", "part"]:
        p = out / f"{t}.parquet"
        # NEVER write through a stale symlink into /root/testdata
        if p.is_symlink():
            p.unlink()
    gen_lineitem(con, int(600000 * sf / 0.1), out / "lineitem.parquet")
    gen_embeddings(random.Random(43), con, int(2000 * sf / 0.1),
                   out / "embeddings.parquet")
    gen_part(con, int(20000 * sf / 0.1), out / "part.parquet")
    for t in ["region", "nation", "customer", "supplier",
              "orders"]:
        link = out / f"{t}.parquet"
        if not link.exists():
            link.symlink_to(f"{SRC}/{t}.parquet")
    print(f"[gen_scale] sf{sf:g}: {n_docs} docs, {n_events} events, "
          f"{int(600000 * sf / 0.1)} lineitems, "
          f"{int(2000 * sf / 0.1)} vectors -> {out}")


if __name__ == "__main__":
    main()
