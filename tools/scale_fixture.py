#!/usr/bin/env python
"""Deterministic local sf1 fixture: 10x sf0.1, built by replicating the
driver-generated tables with structure-preserving transforms — no RNG,
bit-reproducible, never touches /root/testdata.

Scaling must multiply WORK, not blow up operator semantics:

- ``documents``: 10 replicas; replica i>0 prefixes every token with
  ``r{i}`` (vocabularies disjoint across replicas) and offsets doc_id by
  5000*i. Within-replica near-dup structure is exactly sf0.1's (shingles
  map 1:1 under the prefix), and across replicas nothing collides — so
  dedup/cluster pair counts scale 10x linearly instead of 100x
  quadratically, which is the property a real 10x corpus has
  (duplicates-per-document density is scale-free).
- ``orders``/``lineitem``: 10 disjoint key-shifted copies (orderkey
  +150k*i, custkey +15k*i, suppkey +1k*i, partkey +20k*i). The
  customer<->supplier AND customer<->part graphs become 10 disjoint
  components — a real 10x dataset grows its catalog with its orders, so
  per-part fan-in (and thus Σdeg² candidate work in the link-prediction
  joins) scales linearly, not 100x; custkeys stay < 1e6 so the PageRank
  node-space offset (supplier = 1e6 + suppkey) never collides.
- everything else copies through unchanged (present so load_table works;
  the measured operators don't read them).

Output: ``.scale_data/sf1/*.parquet`` (gitignored; ~100 MB).
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEST = os.path.join(REPO, ".scale_data", "sf1")
REPLICAS = 10

N_DOCS, N_ORDERS, N_CUST, N_SUPP, N_PART = 5_000, 150_000, 15_000, 1_000, 20_000


def build(dest: str = DEST, src: str = SRC, replicas: int = REPLICAS) -> str:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    def replicate(sql_for_i, out_name):
        parts = " UNION ALL ".join(sql_for_i(i) for i in range(replicas))
        con.execute(
            f"COPY ({parts}) TO '{os.path.join(dest, out_name)}' (FORMAT PARQUET)"
        )

    docs = os.path.join(src, "documents.parquet")
    replicate(
        lambda i: (
            f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{docs}')"
            if i == 0
            else f"""SELECT doc_id + {N_DOCS * i} AS doc_id,
                array_to_string(list_transform(str_split(text, ' '), x -> 'r{i}' || x), ' ') AS text,
                lang, source,
                CAST(length(array_to_string(list_transform(str_split(text, ' '), x -> 'r{i}' || x), ' ')) AS BIGINT) AS n_chars
                FROM read_parquet('{docs}')"""
        ),
        "documents.parquet",
    )
    orders = os.path.join(src, "orders.parquet")
    replicate(
        lambda i: f"""SELECT o_orderkey + {N_ORDERS * i} AS o_orderkey,
            o_custkey + {N_CUST * i} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{orders}')""",
        "orders.parquet",
    )
    li = os.path.join(src, "lineitem.parquet")
    li_cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{li}')").fetchall()]
    passthrough = [
        c for c in li_cols if c not in ("l_orderkey", "l_suppkey", "l_partkey")
    ]

    replicate(
        lambda i: (
            f"SELECT l_orderkey + {N_ORDERS * i} AS l_orderkey, "
            f"l_suppkey + {N_SUPP * i} AS l_suppkey, "
            f"l_partkey + {N_PART * i} AS l_partkey, "
            + ", ".join(passthrough)
            + f" FROM read_parquet('{li}')"
        ),
        "lineitem.parquet",
    )
    # events: 10 TIME-SHIFTED replicas (replica i moves 32 days later,
    # ids/users offset) — the axis real position history grows on: more
    # months, same per-hour traffic density. Cross-replica close-pair
    # candidates are impossible (the 1 h window never spans the 32-day
    # gap), so proximity-join work scales linearly like the real thing —
    # replicating users in-place instead would quadratically inflate
    # pair density, which no real 10x dataset does.
    events = os.path.join(src, "events.parquet")
    n_events, n_users = con.execute(
        f"SELECT count(*), count(DISTINCT user_id) FROM read_parquet('{events}')"
    ).fetchone()
    replicate(
        lambda i: f"""SELECT event_id + {n_events * i} AS event_id,
            ts + INTERVAL {32 * i} DAYS AS ts,
            user_id + {n_users * i} AS user_id,
            event_type, value, props
            FROM read_parquet('{events}')""",
        "events.parquet",
    )
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        s = os.path.join(src, f"{t}.parquet")
        if os.path.exists(s):
            shutil.copyfile(s, os.path.join(dest, f"{t}.parquet"))
    return dest


if __name__ == "__main__":
    out = build()
    for f in sorted(os.listdir(out)):
        print(f, os.path.getsize(os.path.join(out, f)) // 1024, "KiB")
