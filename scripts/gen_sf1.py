#!/usr/bin/env python3
"""Generate a local sf1 scale point (VERDICT r3 #10 stretch).

/root/testdata is read-only and tops out at sf0.1; this script materializes
an sf1 tier under testdata_sf1/ (gitignored) with the SAME schemas:

* lineitem — DuckDB's TPC-H dbgen at sf=1 (~6M rows), projected/cast to the
  11-column shape the driver's tables use (l_shipdate as TIMESTAMP).
* orders — dbgen sf=1 orders (~1.5M rows), projected to the driver's 6-col
  shape (o_orderdate as TIMESTAMP).
* events — 1M rows mirroring the sf0.1 distribution 10x'd (30-day monotone
  timestamp spread, 5 event types, JSON props), generated with DuckDB hash
  arithmetic — deterministic, no Python loop.
* documents — 50k deterministic synthetic docs (seeded token soup over a
  fixed vocabulary, ~10% planted near-duplicates) matching the sf0.1
  distribution shape 10x'd.
* embeddings — 20k x 64-d seeded Gaussian vectors, ~10% planted near-dups.

Deterministic (seed 42); ~1-2 min, ~400 MB on disk. Already-present outputs
are skipped, so re-running only fills gaps.
"""

from __future__ import annotations

import os
import random

import duckdb

OUT = os.path.join(os.path.dirname(__file__), "..", "testdata_sf1")
DIM = 64


def _have(name: str) -> bool:
    return os.path.isfile(os.path.join(OUT, name))


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    if not _have("lineitem.parquet") or not _have("orders.parquet"):
        con.execute("LOAD tpch")
        print("generating TPC-H sf1 (dbgen) ...", flush=True)
        con.execute("CALL dbgen(sf=1)")
    if not _have("lineitem.parquet"):
        print("writing sf1 lineitem ...", flush=True)
        con.execute(
            f"""
            COPY (
                SELECT l_orderkey::BIGINT AS l_orderkey,
                       l_partkey::BIGINT AS l_partkey,
                       l_suppkey::BIGINT AS l_suppkey,
                       l_linenumber::INTEGER AS l_linenumber,
                       l_quantity::DOUBLE AS l_quantity,
                       l_extendedprice::DOUBLE AS l_extendedprice,
                       l_discount::DOUBLE AS l_discount,
                       l_tax::DOUBLE AS l_tax,
                       l_returnflag, l_linestatus,
                       l_shipdate::TIMESTAMP AS l_shipdate
                FROM lineitem
            ) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)
            """
        )
    if not _have("orders.parquet"):
        print("writing sf1 orders ...", flush=True)
        con.execute(
            f"""
            COPY (
                SELECT o_orderkey::BIGINT AS o_orderkey,
                       o_custkey::BIGINT AS o_custkey,
                       o_orderstatus,
                       o_totalprice::DOUBLE AS o_totalprice,
                       o_orderdate::TIMESTAMP AS o_orderdate,
                       o_orderpriority
                FROM orders
            ) TO '{OUT}/orders.parquet' (FORMAT PARQUET)
            """
        )
    if not _have("events.parquet"):
        print("writing sf1 events (1M rows) ...", flush=True)
        con.execute(
            f"""
            COPY (
                SELECT i::BIGINT AS event_id,
                       TIMESTAMP '2024-01-01'
                         + to_microseconds((i * 2592000000000 / 1000000)::BIGINT
                                           + (hash(i) % 1000000)::BIGINT) AS ts,
                       (hash(i * 7) % 15000)::BIGINT AS user_id,
                       ['view','click','purchase','signup','error']
                         [(1 + hash(i * 3) % 5)::BIGINT] AS event_type,
                       round((hash(i * 5) % 20000) / 100.0, 2)::DOUBLE AS value,
                       '{{"k": ' || (hash(i * 11) % 100)::VARCHAR || '}}' AS props
                FROM range(0, 1000000) t(i)
            ) TO '{OUT}/events.parquet' (FORMAT PARQUET)
            """
        )

    if _have("documents.parquet") and _have("embeddings.parquet"):
        print("done:", OUT, flush=True)
        return
    print("generating 50k documents ...", flush=True)
    rng = random.Random(42)
    vocab = [f"tok{i}" for i in range(4000)]
    langs = ["en", "de", "fr", "es"]
    sources = ["web", "wiki", "code", "forum"]
    docs: list[tuple[int, str, str, str, int]] = []
    for i in range(45000):
        n = rng.randint(20, 200)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        docs.append(
            (i, text, rng.choice(langs), rng.choice(sources), len(text))
        )
    for i in range(5000):  # planted near-dups: copy with a small edit
        base = docs[rng.randrange(45000)][1]
        words = base.split()
        words[rng.randrange(len(words))] = rng.choice(vocab)
        text = " ".join(words)
        docs.append(
            (
                45000 + i,
                text,
                rng.choice(langs),
                rng.choice(sources),
                len(text),
            )
        )
    con.execute(
        "CREATE TABLE docs (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", docs)
    con.execute(
        f"COPY docs TO '{OUT}/documents.parquet' (FORMAT PARQUET)"
    )

    print("generating 20k embeddings ...", flush=True)
    embs: list[tuple[int, list[float], int]] = []
    for i in range(18000):
        embs.append(
            (i, [rng.gauss(0, 1) for _ in range(DIM)], rng.randrange(10))
        )
    for i in range(2000):
        base = embs[rng.randrange(18000)][1]
        embs.append(
            (
                18000 + i,
                [v + rng.gauss(0, 0.01) for v in base],
                rng.randrange(10),
            )
        )
    con.execute(
        "CREATE TABLE emb (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO emb VALUES (?,?,?)", embs)
    con.execute(f"COPY emb TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)")
    print("done:", OUT, flush=True)


if __name__ == "__main__":
    main()
