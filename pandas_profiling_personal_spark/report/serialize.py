"""Profile result caching (S6, reference: serialize_report.py:20-60).

The reference pickles (df_hash, config, description_set, report). Here the
JSON-serializable stats dict + config are dumped with a schema fingerprint of
the source DataFrame; ``loads`` refuses a cache whose fingerprint mismatches.
"""

from __future__ import annotations

import hashlib
import json
import pickle
from dataclasses import asdict
from typing import Any

from pyspark.sql import DataFrame

from pandas_profiling_personal_spark.config import ProfileConfig
from pandas_profiling_personal_spark.plans.profile import ProfileResult

_MAGIC = "pandas_profiling_personal_spark/1"


def df_fingerprint(df: DataFrame) -> str:
    """Cheap identity for cache validation: schema + row count (no content scan;
    content hashing 100 TB to validate a cache defeats the cache)."""
    schema = df.schema.json()
    n = df.count()
    return hashlib.sha256(f"{schema}|{n}".encode()).hexdigest()


def dumps(result: ProfileResult, config: ProfileConfig, fingerprint: str) -> bytes:
    payload = {
        "magic": _MAGIC,
        "fingerprint": fingerprint,
        "config": asdict(config),
        "result": json.loads(result.to_json()),
    }
    return pickle.dumps(payload, protocol=4)


def loads(blob: bytes, fingerprint: str | None = None) -> dict[str, Any]:
    payload = pickle.loads(blob)
    if payload.get("magic") != _MAGIC:
        raise ValueError("not a pandas_profiling_personal_spark cache blob")
    if fingerprint is not None and payload["fingerprint"] != fingerprint:
        raise ValueError(
            "cache fingerprint mismatch — source data or schema changed"
        )
    return payload


def dump_file(
    path: str, result: ProfileResult, config: ProfileConfig, fingerprint: str
) -> None:
    with open(path, "wb") as fh:
        fh.write(dumps(result, config, fingerprint))


def load_file(path: str, fingerprint: str | None = None) -> dict[str, Any]:
    with open(path, "rb") as fh:
        return loads(fh.read(), fingerprint)
