#!/usr/bin/env python3
"""Build a derived scale-probe corpus from the sf0.1 fixtures, then
time the heavy operators against it:

    python3 tools/scale_probe.py                 # 10x  -> /tmp/sfx (llm)
    python3 tools/scale_probe.py 100 /tmp/sfx100 # 100x -> /tmp/sfx100
    python3 tools/scale_probe.py 100 /tmp/sfxr100 rel   # relational tier
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sfx \
      sbt "runMain graft.IsoBench dedup_near_minhash dedup_clusters ..."

Families:
  llm (default) — documents + embeddings, the tables the
    dedup/similarity family reads. Each source doc/vector gains
    COPIES-1 shifted-id copies (doc text perturbed for a third of the
    copies; vectors rescaled, which preserves cosine), so the
    duplicate structure becomes much DENSER than any real corpus — a
    worst-case probe: operators whose cost follows the OUTPUT size
    (simhash pairs, ngram jaccard on a mostly-dup corpus) will show
    that output explosion; operators with banded/bucketed candidate
    generation (minhash, LSH, IVF, clusters) should stay near-flat.
  rel — lineitem + orders scaled COPIES x with o_orderkey/l_orderkey
    shifted per copy (the fact tables grow; join keys stay
    consistent), dimension tables (customer/nation/region/supplier/
    part) copied verbatim — the TPC-H scaling shape where facts
    outgrow dims, so broadcast-ability of the dims is preserved and
    the big-big orders x lineitem exchange is what actually scales.
  ev — events scaled COPIES x with user_id AND event_id shifted per
    copy and timestamps untouched: the per-user event-time structure
    (sessions, funnels, paths, transitions) replicates exactly, so
    per-user analytics scale linearly in users, while the per-time-
    bucket arrival density grows COPIES x — which makes the
    cross-entity temporal joins (time proximity, interval overlap)
    show their inherent quadratic-in-density output growth. The
    busier-service scaling shape.

The id stride is 1_000_000 so copy ids can never collide with source
ids (sf0.1 doc/vec/order ids stay well below it) at any COPIES <= 1000.
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx"
FAMILY = sys.argv[3] if len(sys.argv) > 3 else "llm"
STRIDE = 1_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

if FAMILY == "llm":
    con.execute(f"""
    COPY (
      SELECT doc_id + {STRIDE} * c AS doc_id,
             CASE WHEN c > 0 AND doc_id % 3 = 0
                  THEN text || ' copytag' || CAST(c AS VARCHAR)
                  ELSE text END AS text,
             lang, source, n_chars
      FROM '{SRC}/documents.parquet', generate_series(0, {COPIES - 1}) AS g(c)
    ) TO '{DST}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT vec_id + {STRIDE} * c AS vec_id, label,
             CASE WHEN c = 0 THEN embedding
                  ELSE list_transform(embedding, x -> x * (1 + 0.001 * c)) END
               AS embedding
      FROM '{SRC}/embeddings.parquet', generate_series(0, {COPIES - 1}) AS g(c)
    ) TO '{DST}/embeddings.parquet' (FORMAT PARQUET)""")
    docs = con.execute(
        f"SELECT count(*) FROM '{DST}/documents.parquet'").fetchone()[0]
    vecs = con.execute(
        f"SELECT count(*) FROM '{DST}/embeddings.parquet'").fetchone()[0]
    print(f"wrote {DST}: {docs} documents, {vecs} embeddings ({COPIES}x)")
elif FAMILY == "rel":
    con.execute(f"""
    COPY (
      SELECT o_orderkey + {STRIDE} * c AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority
      FROM '{SRC}/orders.parquet', generate_series(0, {COPIES - 1}) AS g(c)
    ) TO '{DST}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT * REPLACE (l_orderkey + {STRIDE} * c AS l_orderkey)
      FROM '{SRC}/lineitem.parquet', generate_series(0, {COPIES - 1}) AS g(c)
    ) TO '{DST}/lineitem.parquet' (FORMAT PARQUET)""")
    for dim in ("customer", "nation", "region", "supplier", "part"):
        shutil.copyfile(f"{SRC}/{dim}.parquet", f"{DST}/{dim}.parquet")
    li = con.execute(
        f"SELECT count(*) FROM '{DST}/lineitem.parquet'").fetchone()[0]
    orders = con.execute(
        f"SELECT count(*) FROM '{DST}/orders.parquet'").fetchone()[0]
    print(f"wrote {DST}: {li} lineitem, {orders} orders ({COPIES}x), "
          "dims verbatim")
elif FAMILY == "ev":
    con.execute(f"""
    COPY (
      SELECT event_id + {STRIDE} * c AS event_id, ts,
             user_id + {STRIDE} * c AS user_id, event_type, value, props
      FROM '{SRC}/events.parquet', generate_series(0, {COPIES - 1}) AS g(c)
    ) TO '{DST}/events.parquet' (FORMAT PARQUET)""")
    n = con.execute(
        f"SELECT count(*) FROM '{DST}/events.parquet'").fetchone()[0]
    print(f"wrote {DST}: {n} events ({COPIES}x, users shifted, ts kept)")
else:
    sys.exit(f"unknown family {FAMILY!r} (llm | rel | ev)")
