"""Local mirror of the driver's DuckDB-oracle comparison: run a Spark query and its
oracle SQL side by side, then compare row count + (sorted-by-name) columns +
order-insensitive cell values. Strict exact equality — if this passes, any
hash-based comparison of the same values passes too."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(float(v))
    if isinstance(v, int):
        return str(v)
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return str(v)


def _canon_frame(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(
        tuple(_canon_cell(r[i]) for i in order) for r in rows
    )
    return sorted_cols, canon_rows


def compare(spark_df, con, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty == match."""
    problems = []
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = list(spark_df.columns)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count differs: spark={len(spark_rows)} duck={len(duck_rows)}")
    sc, sr = _canon_frame(spark_cols, spark_rows)
    dc, dr = _canon_frame(duck_cols, duck_rows)
    if sr != dr:
        diffs = [
            (a, b) for a, b in zip(sr, dr) if a != b
        ][:5]
        extra_s = [r for r in sr if r not in set(dr)][:3]
        extra_d = [r for r in dr if r not in set(sr)][:3]
        problems.append(
            f"values differ; first aligned diffs={diffs}; "
            f"spark-only={extra_s}; duck-only={extra_d}"
        )
    return problems
