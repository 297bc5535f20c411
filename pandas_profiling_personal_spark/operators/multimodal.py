"""Multimodal (image/audio/video) column support for training-data pipelines.

Contract: media travel as opaque ``binary`` columns plus a typed metadata struct.
All Spark-side plumbing here is real and tested — schemas, Arrow-batched
``mapInPandas`` iterators, partition sizing, binaryFile ingestion. The actual
byte decoding (PIL/libav) is NOT available in this environment, so the decode
kernels are stubbed: ``decoder="fake"`` produces deterministic pseudo-metadata
from the bytes (so tests exercise the full distributed path end-to-end) and
``decoder="real"`` raises NotImplementedError at the exact point a decode
library call belongs.

The reference's image analysis (reference: summary_helpers.py:239-309,
summary_helpers_image.py:1-114) is driver-side PIL over pandas — the shape here
is the distributed replacement: feature-extract into columns with Arrow batches,
then aggregate features with the ordinary profiling operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from pandas_profiling_personal_spark.functions import stats as S

#: metadata produced per media object
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi containers
    b"\x00\x00\x00": "mp4?",
}


def _sniff_format(data: bytes) -> str:
    for magic, name in _MAGIC.items():
        if data[: len(magic)] == magic:
            return name
    return "unknown"


def _fake_decode(data: bytes) -> tuple[int, int, bool]:
    """Deterministic pseudo width/height/truncation derived from the content
    hash — a stand-in with the same signature and cost profile as a real decode,
    so the distributed plumbing is exercised honestly in tests."""
    h = hashlib.md5(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    truncated = (h[2] % 17) == 0
    return width, height, truncated


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(data: bytes) -> tuple[str | None, int | None, int | None, bool]:
    """PIL decode: (format, width, height, truncated) — the reference's image
    dimensions/truncation analysis (reference: summary_helpers_image.py:1-114)
    as a per-object kernel. Caller guarantees PIL is importable."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(data))
        fmt = (img.format or "unknown").lower()
        width, height = img.size
        truncated = False
        try:
            img.load()
        except Exception:
            truncated = True
        return fmt, width, height, truncated
    except Exception:
        # not an image PIL recognizes — keep the magic-bytes sniff for format
        return None, None, None, False


def media_metadata(
    df: DataFrame,
    binary_col: str,
    decoder: str = "fake",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Append a ``meta`` struct column decoded from ``binary_col``.

    Arrow-batched ``mapInPandas``: bytes never round-trip through Python row by
    row. Decoders:

    * ``"fake"`` — deterministic pseudo-metadata (test tier; n_bytes, format
      sniff and content_hash are REAL, width/height/truncated are derived)
    * ``"real"`` — PIL dimensions/format/truncation
      (reference: summary_helpers_image.py:1-114); raises ``ImportError``
      up-front if PIL is absent
    * ``"auto"`` — ``"real"`` when PIL imports, else ``"fake"`` (the
      dependency-optional tier; resolved once on the driver so every executor
      runs the same kernel)
    """
    if decoder == "auto":
        decoder = "real" if _pil_available() else "fake"
    if decoder == "real" and not _pil_available():
        raise ImportError(
            "media_metadata(decoder='real') needs Pillow; install it or use "
            "decoder='auto' to fall back to the deterministic fake tier"
        )
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("meta", MEDIA_META_SCHEMA)]
    )

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    continue
                data = bytes(data)
                if decoder == "real":
                    fmt, width, height, truncated = _real_decode(data)
                    fmt = fmt or _sniff_format(data)
                else:
                    width, height, truncated = _fake_decode(data)
                    fmt = _sniff_format(data)
                metas.append(
                    {
                        "n_bytes": len(data),
                        "format": fmt,
                        "width": width,
                        "height": height,
                        "truncated": truncated,
                        "content_hash": hashlib.md5(data).hexdigest(),
                    }
                )
            yield pdf.assign(meta=metas)

    return df.mapInPandas(decode_batches, out_schema)


def media_profile(
    df: DataFrame, binary_col: str, decoder: str = "fake"
) -> dict:
    """Aggregate media statistics: byte-size stats, format histogram, dimension
    stats, duplicate-content groups — one decode pass + ordinary aggregations
    (the decode output is cached to avoid re-decoding per aggregate)."""
    from pyspark import StorageLevel

    meta = media_metadata(df, binary_col, decoder).select("meta.*").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        scalars = meta.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.avg("n_bytes").alias("mean_bytes"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
            F.min("height").alias("min_height"),
            F.max("height").alias("max_height"),
            F.sum(F.col("truncated").cast("int")).alias("n_truncated"),
        ).collect()[0]
        formats = {
            r["format"]: r["cnt"]
            for r in meta.groupBy("format")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        dupes = (
            meta.groupBy("content_hash")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1)
            .count()
        )
        return {
            **scalars.asDict(),
            "formats": formats,
            "n_duplicate_contents": dupes,
        }
    finally:
        meta.unpersist()


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Ingest raw media files as (path, modificationTime, length, content) via
    the built-in binaryFile source — distributed file reading with partition
    planning, the A19 file-stats path done Spark-native."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


#: per-path filesystem stats (A19 full tier)
FILE_STAT_SCHEMA = T.StructType(
    [
        T.StructField("st_size", T.LongType()),
        T.StructField("st_mtime", T.DoubleType()),
        T.StructField("st_ctime", T.DoubleType()),
        T.StructField("st_atime", T.DoubleType()),
    ]
)


def file_stats(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Full st_size/st_mtime/st_ctime/st_atime per path (A19) — the fields the
    reference collects driver-side via ``os.stat``
    (reference: summary_helpers.py:117-140). The binaryFile source only
    surfaces mtime/length, so this optional tier stats each path inside an
    Arrow-batched ``mapInPandas`` — executor-local filesystem I/O, which is
    the one legitimate use of Python here. Paths must be visible from the
    executors (local fs / NFS / fuse mount). ``file:`` URI prefixes from
    binaryFile are stripped; Spark 4.1's binaryFile emits special characters
    RAW (``file:/d/has space #1.bin`` — measured, not percent-encoded, and a
    fragment-aware urlparse would truncate at ``#``), but Hadoop versions
    differ, so if the raw path doesn't stat and contains ``%`` the
    percent-decoded form is tried as a fallback. Unstattable paths yield a
    null struct rather than failing the job."""
    import os
    from urllib.parse import unquote

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("file_stat", FILE_STAT_SCHEMA)]
    )

    def stat_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            stats = []
            for p in pdf[path_col]:
                try:
                    local = str(p)
                    if local.startswith("file:"):
                        local = local[len("file:") :]
                        # normalize file:///x and file://host/x forms
                        while local.startswith("//"):
                            local = local[1:]
                    try:
                        st = os.stat(local)
                    except OSError:
                        if "%" not in local:
                            raise
                        st = os.stat(unquote(local))
                    stats.append(
                        {
                            "st_size": st.st_size,
                            "st_mtime": st.st_mtime,
                            "st_ctime": st.st_ctime,
                            "st_atime": st.st_atime,
                        }
                    )
                except OSError:
                    stats.append(None)
            pdf = pdf.copy()
            pdf["file_stat"] = stats
            yield pdf

    return df.mapInPandas(stat_batch, out_schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    n_frames: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """Explode a video/container column into ``n_frames`` evenly-spaced frame
    rows (doc plumbing for frame-sampling pipelines). The frame extraction
    kernel is stubbed like :func:`media_metadata`."""
    frame_schema = T.StructType(
        [
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != binary_col]
        + [T.StructField("frame", frame_schema)]
    )

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                data = row[binary_col]
                base = {k: row[k] for k in pdf.columns if k != binary_col}
                if data is None:
                    continue
                data = bytes(data)
                if decoder == "real":
                    raise NotImplementedError("frame extraction needs libav")
                for i in range(n_frames):
                    h = hashlib.md5(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append({**base, "frame": {"frame_index": i, "frame_hash": h}})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(extract, out_schema)
