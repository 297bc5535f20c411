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

import numpy as np
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
        T.StructField("phash", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"GIF8": "gif",
    b"RIFF": "riff",  # wav/avi containers
    b"YUV4MPEG2": "y4m",
    b"\x00\x00\x00": "mp4?",
}


def _sniff_format(data: bytes) -> str:
    for magic, name in _MAGIC.items():
        if data[: len(magic)] == magic:
            return name
    return "unknown"


#: netpbm magics, for the SQL sniff only (the Python parser validates the
#: full header, so _sniff_format leaves them to _parse_netpbm)
_SQL_MAGIC: "list[tuple[bytes, str]]" = list(_MAGIC.items()) + [
    (b"P5", "pgm"),
    (b"P2", "pgm"),
    (b"P6", "ppm"),
    (b"P3", "ppm"),
]


def sniff_format_expr(c) -> "F.Column":
    """Pure-SQL twin of :func:`_sniff_format` (+ netpbm magics): a
    magic-byte format sniff as a single when-chain over binary prefixes —
    JVM-side, scan speed, no Python. This is what makes a FULL-DATA format
    mix affordable on a 100 TB binary column: the payload is never decoded,
    only its first bytes compared."""
    expr = F.lit("unknown")
    for magic, name in reversed(_SQL_MAGIC):
        expr = F.when(
            F.substring(c, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return expr


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


def _real_decode(
    data: bytes,
) -> tuple[str | None, int | None, int | None, bool, "np.ndarray | None"]:
    """PIL decode: (format, width, height, truncated, grayscale matrix) — the
    reference's image dimensions/truncation analysis
    (reference: summary_helpers_image.py:1-114) as a per-object kernel that
    decodes ONCE: the grayscale matrix for the perceptual hashes comes from
    the same loaded Image (decode dominates per-image cost — a second
    Image.open for hashing would halve real-tier throughput, review r7).
    Caller guarantees PIL is importable."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(data))
        fmt = (img.format or "unknown").lower()
        width, height = img.size
        truncated = False
        gray = None
        try:
            img.load()
            gray = np.asarray(img.convert("L"), dtype=np.float64)
        except Exception:
            truncated = True
        return fmt, width, height, truncated, gray
    except Exception:
        # not an image PIL recognizes — keep the magic-bytes sniff for format
        return None, None, None, False, None


# ----------------------------------------------------------------------------
# EXIF (A20 full tier — reference: summary_helpers_image.py:84-107 extracts
# the tag dict per image; summary_helpers.py:208-237 aggregates key counts).
# Two tiers: PIL's ExifTags mapping when Pillow is importable, else a pure-
# Python JPEG APP1/TIFF IFD parser (the EXIF container format is public:
# JPEG markers -> APP1 "Exif\0\0" -> TIFF header -> IFD entries), so the
# dependency-free environment still produces REAL exif from real bytes.
# ----------------------------------------------------------------------------

#: TIFF/EXIF tag ids -> names (subset PIL's ExifTags.TAGS also surfaces)
_EXIF_TAGS = {
    0x010E: "ImageDescription",
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x011A: "XResolution",
    0x011B: "YResolution",
    0x0128: "ResolutionUnit",
    0x0131: "Software",
    0x0132: "DateTime",
    0x013B: "Artist",
    0x8298: "Copyright",
    0x829A: "ExposureTime",
    0x829D: "FNumber",
    0x8827: "ISOSpeedRatings",
    0x9003: "DateTimeOriginal",
    0x9004: "DateTimeDigitized",
    0x920A: "FocalLength",
    0xA002: "ExifImageWidth",
    0xA003: "ExifImageHeight",
}
_EXIF_SUBIFD = 0x8769  # pointer to the Exif sub-IFD, followed not emitted
_TIFF_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _parse_tiff_exif(buf: bytes) -> dict[str, str]:
    """Parse IFD0 (+ Exif sub-IFD) of a TIFF block into {tag_name: str}."""
    try:
        if buf[:2] == b"II":
            endian = "little"
        elif buf[:2] == b"MM":
            endian = "big"
        else:
            return {}

        def rd(off: int, n: int) -> int:
            return int.from_bytes(buf[off : off + n], endian)

        if rd(2, 2) != 42:
            return {}
        out: dict[str, str] = {}

        def parse_ifd(off: int, depth: int) -> None:
            if depth > 2 or off + 2 > len(buf):
                return
            for j in range(rd(off, 2)):
                e = off + 2 + 12 * j
                if e + 12 > len(buf):
                    return
                tag, typ, cnt = rd(e, 2), rd(e + 2, 2), rd(e + 4, 4)
                tsize = _TIFF_TYPE_SIZES.get(typ)
                if tsize is None or cnt > 1 << 20:
                    continue
                total = tsize * cnt
                voff = e + 8 if total <= 4 else rd(e + 8, 4)
                if voff + total > len(buf):
                    continue
                if tag == _EXIF_SUBIFD:
                    parse_ifd(rd(e + 8, 4), depth + 1)
                    continue
                name = _EXIF_TAGS.get(tag)
                if name is None:
                    continue
                if typ == 2:  # ASCII, NUL-terminated
                    out[name] = (
                        buf[voff : voff + cnt]
                        .split(b"\x00")[0]
                        .decode("ascii", "replace")
                    )
                elif typ in (1, 3, 4):  # BYTE/SHORT/LONG
                    vals = [rd(voff + i * tsize, tsize) for i in range(cnt)]
                    out[name] = str(vals[0]) if cnt == 1 else str(vals)
                elif typ in (5, 10):  # (S)RATIONAL — render as "num/den"
                    num, den = rd(voff, 4), rd(voff + 4, 4)
                    if typ == 10:
                        num = num - (1 << 32) if num >= 1 << 31 else num
                        den = den - (1 << 32) if den >= 1 << 31 else den
                    out[name] = f"{num}/{den}"
                else:  # UNDEFINED etc.
                    out[name] = buf[voff : voff + min(total, 64)].hex()

        parse_ifd(rd(4, 4), 0)
        return out
    except Exception:
        return {}


def _parse_jpeg_exif(data: bytes) -> dict[str, str]:
    """Walk JPEG markers to the APP1 "Exif" segment; {} for non-JPEG."""
    if data[:3] != b"\xff\xd8\xff":
        return {}
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            break
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no payload
            i += 2
            continue
        if marker == 0xDA:  # start-of-scan: no EXIF past here
            break
        seglen = int.from_bytes(data[i + 2 : i + 4], "big")
        if seglen < 2:
            break
        if marker == 0xE1 and data[i + 4 : i + 10] == b"Exif\x00\x00":
            return _parse_tiff_exif(data[i + 10 : i + 2 + seglen])
        i += 2 + seglen
    return {}


def _pil_exif(data: bytes) -> dict[str, str]:
    """Reference extract_exif (summary_helpers_image.py:84-107): PIL tag dict
    with byte values decoded. Caller guarantees PIL imports."""
    from io import BytesIO

    from PIL import ExifTags, Image

    try:
        raw = Image.open(BytesIO(data))._getexif()
    except Exception:
        return {}
    if not raw:
        return {}
    out = {}
    for k, v in raw.items():
        if k not in ExifTags.TAGS:
            continue
        if isinstance(v, bytes):
            v = v.decode(errors="replace")
        out[ExifTags.TAGS[k]] = str(v)
    return out


def extract_exif(data: bytes) -> dict[str, str]:
    """Per-object EXIF dict — PIL tier when available, else the pure parser."""
    if _pil_available():
        return _pil_exif(data)
    return _parse_jpeg_exif(data)


# ----------------------------------------------------------------------------
# Perceptual image hashing (closes A20: the reference groups duplicate images
# by imagehash.phash — reference: summary_helpers_image.py:57-67 — which is
# PERCEPTUAL: a resized/recompressed copy hashes near-identically, unlike the
# exact md5 content_hash). pHash/dHash are public algorithms: grayscale ->
# small fixed resize -> 2D DCT low-frequency block (pHash) or horizontal
# gradient signs (dHash) -> 64-bit signature; near-duplicates have small
# Hamming distance, so pair generation reuses the SimHash band machinery
# (operators/dedup.banded_hamming_pairs). Decode tiers:
#   * PIL importable      -> any PIL format (the reference's tier)
#   * pure netpbm parser  -> REAL perceptual hashes with zero dependencies
#     (PGM/PPM P2/P3/P5/P6 are public plain formats), so resize-invariance is
#     honestly testable in a PIL-free environment
#   * fake                -> 60-bit signature from the md5 hex prefix —
#     deterministic and SQL-expressible, the cross-engine oracle tier
# The resize + DCT + threshold pipeline is shared numpy, so any two decode
# tiers produce IDENTICAL hashes for identical pixel matrices.
# ----------------------------------------------------------------------------


def _parse_netpbm(data: bytes) -> "np.ndarray | None":
    """Pure-Python netpbm decode -> float64 grayscale matrix (None if the
    bytes are not a complete, well-formed P2/P3/P5/P6 image). Color planes
    collapse via the Rec.601 luma weights PIL's ``convert("L")`` also uses."""
    try:
        if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"2356":
            return None
        kind = chr(data[1])
        i, vals = 2, []
        while len(vals) < 3 and i < len(data):
            c = data[i : i + 1]
            if c == b"#":
                j = data.find(b"\n", i)
                i = len(data) if j < 0 else j + 1
            elif c.isspace():
                i += 1
            elif c.isdigit():
                j = i
                while j < len(data) and data[j : j + 1].isdigit():
                    j += 1
                vals.append(int(data[i:j]))
                i = j
            else:
                return None
        if len(vals) < 3:
            return None
        w, h, maxval = vals
        if not (0 < w and 0 < h and 0 < maxval < 65536) or w * h > (1 << 26):
            return None
        n = w * h * (3 if kind in "36" else 1)
        if kind in "56":
            # the spec demands EXACTLY ONE whitespace byte between maxval and
            # the raster — verify it rather than assume: a CRLF writer or a
            # stray comment here would shift the pixel offset and produce
            # silently WRONG perceptual hashes (review r8); one \r\n pair is
            # tolerated as the single "newline"
            ws = data[i : i + 1]
            if not ws.isspace():
                return None
            i += 1
            itemsize = 1 if maxval < 256 else 2
            need = n * itemsize
            if ws == b"\r" and data[i : i + 1] == b"\n":
                # ambiguous: the byte after CR is either the LF of a CRLF
                # newline or a pixel valued 10 — disambiguate by the EXACT
                # expected raster size (review r8 second pass: skipping the
                # LF unconditionally shifted a spec-conforming raster whose
                # first pixel is 10). Exact-size match wins; oversized
                # payloads prefer the spec-conforming single-ws reading.
                if len(data) - i == need:
                    pass  # spec reading fits exactly: the 0x0A is a pixel
                elif len(data) - (i + 1) == need:
                    i += 1  # CRLF writer with an exact-size raster
                # oversized / truncated payloads fall through to the
                # spec-conforming single-whitespace reading: the CRLF reading
                # always has ONE byte fewer, so "only CRLF has enough bytes"
                # is impossible (review r9 — an unsatisfiable elif sat here)
            dt = np.uint8 if maxval < 256 else np.dtype(">u2")
            px = np.frombuffer(data, dt, count=n, offset=i).astype(np.float64)
        else:
            toks = data[i:].split()
            if len(toks) < n:
                return None
            px = np.array([int(t) for t in toks[:n]], dtype=np.float64)
        px = px * (255.0 / maxval)
        if kind in "36":
            px = px.reshape(h, w, 3)
            return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        return px.reshape(h, w)
    except Exception:
        return None


def _pil_gray(data: bytes) -> "np.ndarray | None":
    from io import BytesIO

    from PIL import Image

    try:
        return np.asarray(
            Image.open(BytesIO(data)).convert("L"), dtype=np.float64
        )
    except Exception:
        return None


def _decode_gray(data: bytes) -> "np.ndarray | None":
    """Grayscale pixel matrix: PIL when importable, else the netpbm parser."""
    if _pil_available():
        m = _pil_gray(data)
        if m is not None:
            return m
    return _parse_netpbm(data)


def _resize_area(m: "np.ndarray", oh: int, ow: int) -> "np.ndarray":
    """Deterministic block-mean downscale (area average — what makes the hash
    survive resizes); nearest-neighbor when either target dim is an upscale."""
    h, w = m.shape
    if h < oh or w < ow:
        return m[np.arange(oh) * h // oh][:, np.arange(ow) * w // ow]
    re = np.arange(oh + 1) * h // oh
    ce = np.arange(ow + 1) * w // ow
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = m.cumsum(0).cumsum(1)
    tot = (
        csum[re[1:, None], ce[None, 1:]]
        - csum[re[:-1, None], ce[None, 1:]]
        - csum[re[1:, None], ce[None, :-1]]
        + csum[re[:-1, None], ce[None, :-1]]
    )
    area = (re[1:, None] - re[:-1, None]) * (ce[None, 1:] - ce[None, :-1])
    return tot / area


_DCT_CACHE: dict[int, "np.ndarray"] = {}


def _dct_matrix(n: int) -> "np.ndarray":
    if n not in _DCT_CACHE:
        k = np.arange(n, dtype=np.float64)[:, None]
        i = np.arange(n, dtype=np.float64)[None, :]
        d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        d[0] *= 1.0 / np.sqrt(2.0)
        _DCT_CACHE[n] = d
    return _DCT_CACHE[n]


def _pack_bits(bits: "np.ndarray") -> int:
    v = 0
    for b in bits.flatten():
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v  # signed-long wraparound


def phash_gray(m: "np.ndarray", hash_size: int = 8, highfreq: int = 4) -> int:
    """64-bit pHash of a grayscale matrix: 32x32 area resize -> 2D DCT ->
    top-left ``hash_size``^2 low-frequency block -> median threshold. Same
    construction as imagehash.phash (the reference's duplicate grouping key);
    bit order is row-major MSB-first, stable across engines."""
    n = hash_size * highfreq
    small = _resize_area(np.asarray(m, dtype=np.float64), n, n)
    d = _dct_matrix(n)
    low = (d @ small @ d.T)[:hash_size, :hash_size]
    return _pack_bits(low > np.median(low))


def dhash_gray(m: "np.ndarray", hash_size: int = 8) -> int:
    """64-bit dHash: 8x9 area resize -> horizontal gradient signs."""
    small = _resize_area(
        np.asarray(m, dtype=np.float64), hash_size, hash_size + 1
    )
    return _pack_bits(small[:, 1:] > small[:, :-1])


def perceptual_hashes(data: bytes) -> tuple[int | None, int | None]:
    """(phash, dhash) for decodable image bytes, (None, None) otherwise."""
    gray = _decode_gray(data)
    if gray is None or gray.size == 0:
        return None, None
    return phash_gray(gray), dhash_gray(gray)


def _fake_hashes(md5_hex: str) -> tuple[int, int]:
    """Deterministic 60-bit signatures from the md5 hex: the oracle tier —
    DuckDB reproduces them as CAST('0x' || substring(md5(x),1,15) AS UBIGINT)
    (60 bits keeps every value signed-BIGINT-safe in both engines). Byte-
    identical contents collide at Hamming 0; everything else is ~uniform, so
    the fake tier exercises the full banded pair-generation path with exact
    duplicates as the planted near-dups."""
    return int(md5_hex[:15], 16), int(md5_hex[15:30], 16)


def media_metadata(
    df: DataFrame,
    binary_col: str,
    decoder: str = "fake",
    batch_size_hint: int = 256,
    exif: bool = False,
) -> DataFrame:
    """Append a ``meta`` struct column decoded from ``binary_col``.

    Arrow-batched ``mapInPandas``: bytes never round-trip through Python row by
    row. Decoders:

    * ``"fake"`` — deterministic pseudo-metadata (test/oracle tier; n_bytes,
      format sniff and content_hash are REAL, width/height/truncated are
      derived, phash/dhash are the md5-prefix signatures of
      :func:`_fake_hashes` — engine-reproducible)
    * ``"real"`` — PIL dimensions/format/truncation
      (reference: summary_helpers_image.py:1-114) plus perceptual
      phash/dhash (reference: summary_helpers_image.py:57-67 groups
      duplicates by imagehash.phash); raises ``ImportError`` up-front if
      PIL is absent
    * ``"netpbm"`` — dependency-free REAL tier: the pure PGM/PPM parser
      decodes dimensions and perceptual hashes for netpbm bytes (None +
      magic-sniff format for everything else) — real resize-surviving
      hashes with zero imports
    * ``"auto"`` — ``"real"`` when PIL imports, else ``"fake"`` (the
      dependency-optional tier; resolved once on the driver so every executor
      runs the same kernel)

    ``exif=True`` additionally appends an ``exif`` map<string,string> column
    (A20 full tier): PIL's tag mapping when Pillow is importable, else the
    pure-Python JPEG APP1 parser — real tags from real bytes either way.
    Existing ``meta`` fields are unchanged (phash/dhash are additive) so
    oracle-checked selections of its fields are unaffected.
    """
    if decoder == "auto":
        decoder = "real" if _pil_available() else "fake"
    if decoder == "real" and not _pil_available():
        raise ImportError(
            "media_metadata(decoder='real') needs Pillow; install it or use "
            "decoder='auto' to fall back to the deterministic fake tier"
        )
    use_pil_exif = exif and _pil_available()  # resolve ONCE, on the driver
    fields = list(df.schema.fields) + [T.StructField("meta", MEDIA_META_SCHEMA)]
    if exif:
        fields.append(
            T.StructField("exif", T.MapType(T.StringType(), T.StringType()))
        )
    out_schema = T.StructType(fields)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            exifs = []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    exifs.append(None)
                    continue
                data = bytes(data)
                md5_hex = hashlib.md5(data).hexdigest()
                if decoder == "real":
                    fmt, width, height, truncated, gray = _real_decode(data)
                    fmt = fmt or _sniff_format(data)
                    if gray is None:  # PIL couldn't load: netpbm fallback
                        gray = _parse_netpbm(data)
                    if gray is not None and gray.size:
                        ph, dh = phash_gray(gray), dhash_gray(gray)
                    else:
                        ph = dh = None
                elif decoder == "netpbm":
                    gray = _parse_netpbm(data)
                    if gray is not None:
                        height, width = gray.shape
                        fmt = "ppm" if data[1:2] in b"36" else "pgm"
                        truncated = False
                        ph, dh = phash_gray(gray), dhash_gray(gray)
                    else:
                        width = height = ph = dh = None
                        truncated = False
                        fmt = _sniff_format(data)
                else:
                    width, height, truncated = _fake_decode(data)
                    fmt = _sniff_format(data)
                    ph, dh = _fake_hashes(md5_hex)
                metas.append(
                    {
                        "n_bytes": len(data),
                        "format": fmt,
                        "width": width,
                        "height": height,
                        "truncated": truncated,
                        "content_hash": md5_hex,
                        "phash": ph,
                        "dhash": dh,
                    }
                )
                if exif:
                    exifs.append(
                        _pil_exif(data)
                        if use_pil_exif
                        else _parse_jpeg_exif(data)
                    )
            out = pdf.assign(meta=metas)
            if exif:
                out = out.assign(exif=exifs)
            yield out

    return df.mapInPandas(decode_batches, out_schema)


def image_near_duplicates(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: str = "fake",
    max_hamming: int = 7,
    band_bits: int | None = None,
    bits: int | None = None,
    key_blocks: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs of perceptually near-duplicate images —
    the image-side analogue of MinHash text near-dup, and the scale-path
    version of the reference's phash duplicate grouping
    (reference: summary_helpers_image.py:57-67, driver-side exact-phash
    groups over pandas; here: banded Hamming pairs, so a resized or
    recompressed copy within ``max_hamming`` bits is found too).

    One decode pass (Arrow-batched mapInPandas — the only Python, at the
    codec boundary), then :func:`...operators.dedup.banded_hamming_pairs`
    over ``meta.phash``: the shuffle carries (id, 64-bit signature) only,
    blocked on ``bits/band_bits`` exact bands. Recall is exact while
    ``bits/band_bits > max_hamming`` (pigeonhole). Undecodable rows (phash
    null) are excluded — they cannot be perceptually compared.

    Oracle tier: ``decoder="fake"`` signatures are 60-bit md5 prefixes —
    ``bits``/``band_bits`` DEFAULT per decoder (60/6 for fake, 64/8 for
    the real tiers) so the top block is never a degenerate short band (a
    60-bit signature banded as 64-bit leaves a 16-key band that alone goes
    quadratic — review r7); an independent SQL engine reproduces the fake
    tier's exact pair set.

    Scale note: ``key_blocks=None`` (the default) AUTO-SIZES the band
    geometry from the corpus count via
    :func:`...operators.dedup.auto_band_geometry` — small corpora get
    single-block bands (minimal explode), large corpora widen keys by
    concatenating blocks (the Manku block-combination scheme: e.g. 60-bit
    fake signatures at 50k docs pick multi-block keys for ~14x fewer
    candidate pairs at the SAME exact-recall radius; measured 75.8 s ->
    16.6 s at sf1 — review r7/r8: the scale-safe tier is the default, not
    a flag). The sizing count on the INPUT frame is metadata-only for a
    parquet scan; pass explicit ``key_blocks`` (and ``band_bits``) to
    skip it and pin a geometry — the PAIR SET is identical for every
    valid geometry, only the plan changes."""
    from pandas_profiling_personal_spark.operators.dedup import (
        auto_band_geometry,
        banded_hamming_pairs,
    )

    if decoder == "auto":
        # resolve the tier BEFORE picking hash geometry: in a PIL-free
        # environment 'auto' decodes with the fake tier's 60-bit md5
        # signatures, and banding those as bits=64/band_bits=8 leaves a
        # degenerate 16-key top band that silently goes quadratic
        # (review r8)
        decoder = "real" if _pil_available() else "fake"
    if bits is None:
        bits = 60 if decoder == "fake" else 64
    if key_blocks is None:
        band_bits, key_blocks = auto_band_geometry(
            df.count(), bits, max_hamming, band_bits
        )
    elif band_bits is None:
        band_bits = 6 if decoder == "fake" else 8
    sig = (
        media_metadata(df, binary_col, decoder)
        .select(S.col(id_col), F.col("meta.phash").alias("__phash"))
        .where(F.col("__phash").isNotNull())
        # explicit exchange under the signature table: the banded join reads
        # it TWICE (both self-join sides), and mapInPandas has no exchange
        # boundary of its own — without this the DECODE PASS (the expensive
        # part for real images) executes once per side; with it both sides
        # read one shuffle via ReuseExchange (the incremental_minhash_dedup
        # pattern at dedup.py)
        .repartition(S.col(id_col))
    )
    return banded_hamming_pairs(
        sig, id_col, "__phash", bits, band_bits, max_hamming,
        key_blocks=key_blocks,
    )


#: metadata produced per audio object
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("content_hash", T.StringType()),
        # appended AFTER the r7 fields (additive only — oracle-checked
        # selections of the earlier fields are unaffected): the perceptual
        # audio signature, filled only when audio_metadata(signature=True)
        T.StructField("signature", T.LongType()),
    ]
)


def _parse_wav_header(data: bytes) -> dict | None:
    """Pure-Python RIFF/WAVE header parse -> sample_rate/channels/bits/
    frames/duration (None if the bytes are not a well-formed WAV). The
    container format is public: 'RIFF'<size>'WAVE' then chunks; 'fmt '
    carries the codec params, 'data' the sample payload whose size over
    block_align is the frame count."""
    try:
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        i, fmt, data_size = 12, None, None
        while i + 8 <= len(data):
            cid = data[i : i + 4]
            csize = int.from_bytes(data[i + 4 : i + 8], "little")
            if cid == b"fmt " and csize >= 16 and i + 8 + 16 <= len(data):
                fmt = {
                    "channels": int.from_bytes(data[i + 10 : i + 12], "little"),
                    "sample_rate": int.from_bytes(
                        data[i + 12 : i + 16], "little"
                    ),
                    "block_align": int.from_bytes(
                        data[i + 20 : i + 22], "little"
                    ),
                    "bits_per_sample": int.from_bytes(
                        data[i + 22 : i + 24], "little"
                    ),
                }
            elif cid == b"data":
                # clamp the declared payload to the bytes ACTUALLY present:
                # a truncated download keeps its header's size field, and
                # trusting it would silently overcount frames/duration
                # (review r7)
                data_size = min(csize, max(len(data) - (i + 8), 0))
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None or data_size is None or fmt["block_align"] == 0:
            return None
        # hostile/corrupt headers: a 4-byte field can exceed the int32
        # schema (0xFFFFFFFF "sample rate" would fail or wrap the Arrow
        # struct conversion and take the whole job down — review r7)
        if not (0 < fmt["sample_rate"] < 1 << 31):
            return None
        n_frames = data_size // fmt["block_align"]
        return {
            "sample_rate": fmt["sample_rate"],
            "channels": fmt["channels"],
            "bits_per_sample": fmt["bits_per_sample"],
            "n_frames": n_frames,
            "duration_s": (
                round(n_frames / fmt["sample_rate"], 6)
                if fmt["sample_rate"]
                else None
            ),
        }
    except Exception:
        return None


def _wav_samples(data: bytes) -> "np.ndarray | None":
    """Mono float64 samples of a PCM RIFF/WAVE payload (uint8 or int16 LE,
    any channel count — channels average down), None for anything else.
    Same chunk-walk hardening as :func:`_parse_wav_header` (declared sizes
    clamped to bytes actually present)."""
    try:
        if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        i, fmt, payload = 12, None, None
        while i + 8 <= len(data):
            cid = data[i : i + 4]
            csize = int.from_bytes(data[i + 4 : i + 8], "little")
            if cid == b"fmt " and csize >= 16 and i + 8 + 16 <= len(data):
                fmt = {
                    "codec": int.from_bytes(data[i + 8 : i + 10], "little"),
                    "channels": int.from_bytes(data[i + 10 : i + 12], "little"),
                    "block_align": int.from_bytes(
                        data[i + 20 : i + 22], "little"
                    ),
                    "bits": int.from_bytes(data[i + 22 : i + 24], "little"),
                }
            elif cid == b"data":
                end = i + 8 + min(csize, max(len(data) - (i + 8), 0))
                payload = data[i + 8 : end]
            i += 8 + csize + (csize & 1)
        if (
            fmt is None
            or payload is None
            or fmt["codec"] != 1  # PCM only
            or fmt["channels"] < 1
            or fmt["bits"] not in (8, 16)
            or fmt["block_align"] != fmt["channels"] * fmt["bits"] // 8
        ):
            return None
        n_frames = len(payload) // fmt["block_align"]
        if n_frames == 0:
            return None
        cnt = n_frames * fmt["channels"]
        if fmt["bits"] == 8:  # unsigned, midpoint 128
            x = (
                np.frombuffer(payload, np.uint8, count=cnt).astype(np.float64)
                - 128.0
            )
        else:
            x = np.frombuffer(payload, "<i2", count=cnt).astype(np.float64)
        return x.reshape(n_frames, fmt["channels"]).mean(axis=1)
    except Exception:
        return None


def audio_envelope_signature(
    samples: "np.ndarray", windows: int = 64
) -> int | None:
    """Deterministic perceptual audio signature — the dHash of audio: the
    mean-|amplitude| envelope over ``windows + 1`` equal TIME windows
    (fractional-edge area resampling, so the envelope depends on relative
    position, not sample count), one bit per adjacent-window gradient sign.
    Invariant to global gain (comparisons are scale-free) and stable under
    resampling (the envelope is a function of relative time), so a
    re-encoded/normalized copy lands within a small Hamming distance —
    exactly the property the banded pair join needs. Pure numpy; the audio
    twin of :func:`dhash_gray` (reference groups image duplicates by
    perceptual hash, summary_helpers_image.py:57-67; audio has no
    reference-side counterpart — this closes the modality gap)."""
    n = int(samples.size)
    if n < 2:
        return None
    cs = np.concatenate(
        [[0.0], np.cumsum(np.abs(samples), dtype=np.float64)]
    )
    edges = np.linspace(0.0, float(n), windows + 2)
    areas = np.diff(np.interp(edges, np.arange(n + 1, dtype=np.float64), cs))
    env = areas / np.diff(edges)
    return _pack_bits(env[:-1] > env[1:])


def audio_metadata(
    df: DataFrame,
    binary_col: str,
    decoder: str = "auto",
    signature: bool = False,
) -> DataFrame:
    """Append an ``audio_meta`` struct decoded from ``binary_col`` — the
    audio half of the multimodal column contract (images get
    :func:`media_metadata`). Arrow-batched ``mapInPandas``; same seam
    policy: Python only at the codec boundary.

    Decoders: ``"auto"`` — the pure RIFF/WAVE header parser (real fields
    from real bytes, zero dependencies — WAV is the PGM of audio);
    non-WAV bytes keep the magic-bytes format sniff with null audio
    fields. ``"fake"`` — deterministic md5-derived pseudo-fields for ANY
    bytes (the engine-reproducible oracle/test tier: an independent SQL
    engine recomputes them from the same md5 prefix).

    ``signature=True`` additionally fills the ``signature`` field (null
    otherwise): the 64-bit perceptual envelope hash of
    :func:`audio_envelope_signature` on the WAV tier (null for non-PCM
    bytes), or the 60-bit md5-prefix signature on the fake tier (the same
    oracle-reproducible rule as image ``_fake_hashes``). Off by default —
    the signature decodes the full sample payload, while the metadata
    fields only read the header."""
    fields = list(df.schema.fields) + [
        T.StructField("audio_meta", AUDIO_META_SCHEMA)
    ]
    out_schema = T.StructType(fields)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    continue
                data = bytes(data)
                md5_hex = hashlib.md5(data).hexdigest()
                base = {
                    "n_bytes": len(data),
                    "content_hash": md5_hex,
                    "signature": None,
                }
                if decoder == "fake":
                    h = int(md5_hex[:8], 16)
                    rate = 8000 + h % 40000
                    frames = int(md5_hex[8:16], 16) % 1_000_000
                    if signature:
                        base["signature"] = int(md5_hex[:15], 16)
                    metas.append(
                        {
                            **base,
                            "format": _sniff_format(data),
                            "sample_rate": rate,
                            "channels": 1 + h % 2,
                            "bits_per_sample": 8 * (1 + (h >> 2) % 2),
                            "n_frames": frames,
                            "duration_s": round(frames / rate, 6),
                        }
                    )
                    continue
                wav = _parse_wav_header(data)
                if wav is not None:
                    if signature:
                        x = _wav_samples(data)
                        if x is not None:
                            base["signature"] = audio_envelope_signature(x)
                    metas.append({**base, "format": "wav", **wav})
                else:
                    metas.append(
                        {
                            **base,
                            "format": _sniff_format(data),
                            "sample_rate": None,
                            "channels": None,
                            "bits_per_sample": None,
                            "n_frames": None,
                            "duration_s": None,
                        }
                    )
            yield pdf.assign(audio_meta=metas)

    return df.mapInPandas(decode_batches, out_schema)


def audio_near_duplicates(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: str = "auto",
    max_hamming: int = 7,
    band_bits: int | None = None,
    bits: int | None = None,
    key_blocks: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs of perceptually near-duplicate audio —
    the audio analogue of :func:`image_near_duplicates`, sharing the same
    pair-generation engine (``dedup.banded_hamming_pairs``) and the same
    two-tier design:

    * ``"auto"`` — the 64-bit envelope-gradient signature of
      :func:`audio_envelope_signature` over decoded PCM WAV samples
      (gain-invariant, resample-stable); non-WAV/non-PCM rows drop out of
      pair generation (null signature).
    * ``"fake"`` — 60-bit md5-prefix signatures (byte-identical contents
      pair at Hamming 0; an independent SQL engine reproduces the exact
      pair set — the oracle tier, same rule as image ``_fake_hashes``).

    One Arrow decode pass produces the signatures; only (id, signature)
    enters the shuffle. ``key_blocks=None`` auto-sizes the band geometry
    from the corpus count (``dedup.auto_band_geometry`` — the scale-safe
    default); every valid geometry returns the identical pair set."""
    from pandas_profiling_personal_spark.operators.dedup import (
        auto_band_geometry,
        banded_hamming_pairs,
    )

    if bits is None:
        bits = 60 if decoder == "fake" else 64
    if key_blocks is None:
        band_bits, key_blocks = auto_band_geometry(
            df.count(), bits, max_hamming, band_bits
        )
    elif band_bits is None:
        band_bits = 6 if decoder == "fake" else 8
    sig = (
        audio_metadata(df, binary_col, decoder, signature=True)
        .select(id_col, F.col("audio_meta.signature").alias("__sig"))
        .where(F.col("__sig").isNotNull())
        # explicit exchange under the signature table: mapInPandas has no
        # exchange boundary of its own, so without this the banded self-join
        # re-runs the decode pass once PER SIDE (the image_near_duplicates
        # review-r7 lesson; plan-gated for both operators)
        .repartition(S.col(id_col))
    )
    return banded_hamming_pairs(
        sig, id_col, "__sig", bits=bits, band_bits=band_bits,
        max_hamming=max_hamming, key_blocks=key_blocks,
    )


def audio_dedup_keep_list(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: str = "auto",
    **band_kwargs,
) -> DataFrame:
    """AUDIO dedup end product: the input with a ``keep`` flag — one
    representative (minimum id) per perceptual near-dup cluster, composed
    from :func:`audio_near_duplicates` pairs -> ``dedup.cluster_pairs``
    connected components -> keep flags, the same composition as
    :func:`image_dedup_keep_list`."""
    from pandas_profiling_personal_spark.operators.dedup import (
        dedup_keep_list,
    )

    pairs = audio_near_duplicates(
        df, binary_col, id_col, decoder=decoder, **band_kwargs
    )
    return dedup_keep_list(df, pairs, id_col)


def image_dedup_keep_list(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    decoder: str = "fake",
    **band_kwargs,
) -> DataFrame:
    """The end product of IMAGE dedup: the input with a ``keep`` flag — one
    representative (minimum id) per perceptual near-dup CLUSTER, everything
    else kept. The image-side twin of the text pipeline's
    ``dedup.dedup_keep_list``, composed from the same machinery:
    :func:`image_near_duplicates` pairs -> ``dedup.cluster_pairs``
    connected components (a chain original ≈ resized ≈ re-resized collapses
    to ONE representative even when the chain's ends exceed
    ``max_hamming`` of each other) -> keep flags. ``band_kwargs`` pass
    through to the pair stage (``max_hamming``/``band_bits``/``bits``/
    ``key_blocks``)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        dedup_keep_list,
    )

    pairs = image_near_duplicates(
        df, binary_col, id_col, decoder=decoder, **band_kwargs
    )
    return dedup_keep_list(df, pairs, id_col)


def incremental_image_dedup(
    df: DataFrame,
    sig_store: DataFrame | None,
    binary_col: str,
    id_col: str,
    decoder: str = "fake",
    **kwargs,
) -> DataFrame:
    """Daily-incremental IMAGE dedup: decode the new shard's perceptual
    signatures once and sweep them against a persisted ``(id, signature)``
    store via ``dedup.incremental_hamming_dedup`` — the image twin of the
    text pipeline's ``incremental_minhash_dedup``. Returns ``(id,
    signature, keep, dup_of)``; append its ``(id, signature)`` rows to the
    store afterwards. Rows with undecodable/null media have no perceptual
    identity and are ABSENT (route them through the exact content-hash
    tier). ``kwargs`` pass to the sweep (``bits``/``max_hamming``/
    ``band_bits``/``key_blocks``)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_hamming_dedup,
    )

    if decoder == "auto":
        decoder = "real" if _pil_available() else "fake"
    kwargs.setdefault("bits", 60 if decoder == "fake" else 64)
    if kwargs.get("key_blocks") is None and "n_hint" not in kwargs:
        # size the band geometry from the PRE-decode counts: counting the
        # signature frame itself would re-run the Arrow media decode as an
        # extra job (review r8); df.count() is metadata-only on a parquet
        # scan and the store is a plain signature table
        kwargs["n_hint"] = df.count() + (
            sig_store.count() if sig_store is not None else 0
        )
    sigs = (
        media_metadata(df, binary_col, decoder)
        .select(id_col, F.col("meta.phash").alias("signature"))
        .where(F.col("signature").isNotNull())
    )
    return incremental_hamming_dedup(
        sigs, sig_store, id_col=id_col, sig_col="signature", **kwargs
    )


def incremental_audio_dedup(
    df: DataFrame,
    sig_store: DataFrame | None,
    binary_col: str,
    id_col: str,
    decoder: str = "auto",
    **kwargs,
) -> DataFrame:
    """Daily-incremental AUDIO dedup — :func:`incremental_image_dedup`'s
    audio twin over the envelope signatures of
    :func:`audio_envelope_signature` (or the md5 fake tier)."""
    from pandas_profiling_personal_spark.operators.dedup import (
        incremental_hamming_dedup,
    )

    kwargs.setdefault("bits", 60 if decoder == "fake" else 64)
    if kwargs.get("key_blocks") is None and "n_hint" not in kwargs:
        # pre-decode sizing count, same rationale as incremental_image_dedup
        kwargs["n_hint"] = df.count() + (
            sig_store.count() if sig_store is not None else 0
        )
    sigs = (
        audio_metadata(df, binary_col, decoder, signature=True)
        .select(id_col, F.col("audio_meta.signature").alias("signature"))
        .where(F.col("signature").isNotNull())
    )
    return incremental_hamming_dedup(
        sigs, sig_store, id_col=id_col, sig_col="signature", **kwargs
    )


def media_profile(
    df: DataFrame,
    binary_col: str,
    decoder: str = "fake",
    exif: bool = False,
    exif_max_keys: int = 256,
) -> dict:
    """Aggregate media statistics: byte-size stats, format histogram, dimension
    stats, duplicate-content groups — one decode pass + ordinary aggregations
    (the decode output is cached to avoid re-decoding per aggregate).

    ``exif=True`` adds the reference's EXIF aggregation
    (reference: summary_helpers.py:208-237 builds key counts + per-key value
    series driver-side over pandas) done distributed: explode the exif map
    once, then one grouped count for keys and a driver-capped top-values
    count per key."""
    from pyspark import StorageLevel

    decoded = media_metadata(df, binary_col, decoder, exif=exif)
    meta = decoded.select(
        "meta.*", *(["exif"] if exif else [])
    ).persist(StorageLevel.MEMORY_AND_DISK)
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
        # perceptual duplicate groups — the reference's semantics
        # (summary_helpers_image.py:57-67 groups by imagehash.phash, so a
        # re-encoded copy counts as a duplicate; exact content_hash alone
        # under-counts those)
        p_dupes = (
            meta.where(F.col("phash").isNotNull())
            .groupBy("phash")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") > 1)
            .count()
        )
        out = {
            **scalars.asDict(),
            "formats": formats,
            "n_duplicate_contents": dupes,
            "n_duplicate_perceptual": p_dupes,
        }
        if exif:
            # one explode of the map -> (key, value) pairs; keys counted in
            # one grouped agg, per-key top values in a second bounded one
            kv = meta.select(
                F.explode_outer("exif").alias("k", "v")
            ).where(F.col("k").isNotNull())
            kv = kv.persist(StorageLevel.MEMORY_AND_DISK)
            try:
                # top-``exif_max_keys`` keys by count, NOT every distinct
                # key: real EXIF tag vocabularies are tiny, but hostile
                # metadata can mint arbitrary key strings and an unbounded
                # rollup would land them all on the driver (review r7) —
                # the explicit limit makes the transfer bound a contract
                out["exif_keys"] = {
                    r["k"]: r["cnt"]
                    for r in kv.groupBy("k")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .orderBy(F.desc("cnt"), "k")
                    .limit(exif_max_keys)
                    .collect()
                }
                from pandas_profiling_personal_spark.operators.frequencies import (
                    top_k_counts,
                )

                vals: dict[str, dict[str, int]] = {}
                if out["exif_keys"]:  # isin() rejects an empty list
                    vc = (
                        kv.where(F.col("k").isin(*out["exif_keys"]))
                        .groupBy(
                            F.col("k").alias("column"),
                            F.col("v").alias("value"),
                        )
                        .agg(F.count(F.lit(1)).alias("count"))
                    )
                    for r in top_k_counts(vc, 10).collect():
                        vals.setdefault(r["column"], {})[r["value"]] = r[
                            "count"
                        ]
                out["exif_values"] = vals
            finally:
                kv.unpersist()
        return out
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


def strip_file_uri(p: str) -> str:
    """``file:``-URI → local path, handling ``file:/x``, ``file:///x`` and
    ``file://host/x`` forms. The single source of truth for URI stripping —
    :func:`file_stats`, :func:`read_paths_bytes` and the profile()'s path
    refinement all share it so a path that stats also reads."""
    p = str(p)
    if p.startswith("file:"):
        p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
    return p


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
                    local = strip_file_uri(p)
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


def read_paths_bytes(
    df: DataFrame,
    path_col: str = "path",
    content_col: str = "content",
    max_bytes: int | None = None,
) -> DataFrame:
    """Append the file CONTENT of each path as a binary column — the bridge
    from a string path column to the binary-column media operators
    (:func:`media_metadata` / :func:`media_profile`). Executor-local reads
    inside an Arrow-batched ``mapInPandas`` (like :func:`file_stats`); paths
    must be visible from the executors. Unreadable paths yield NULL content.
    ``max_bytes`` caps the read per file (header-sniff tier: dimensions/
    format of JPEG/PNG/GIF live in the first few KB — no need to pull a
    100 MB TIFF across to hash its header). Same URI-stripping and
    percent-decode fallback as :func:`file_stats`, so any path that stats
    also reads."""
    import os
    from urllib.parse import unquote

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(content_col, T.BinaryType())]
    )

    def read_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = []
            for p in pdf[path_col]:
                try:
                    local = strip_file_uri(p)
                    if not os.path.isfile(local):
                        if "%" in local and os.path.isfile(unquote(local)):
                            local = unquote(local)
                        else:
                            contents.append(None)
                            continue
                    with open(local, "rb") as fh:
                        contents.append(
                            fh.read(max_bytes) if max_bytes else fh.read()
                        )
                except OSError:
                    contents.append(None)
            pdf = pdf.copy()
            pdf[content_col] = contents
            yield pdf

    return df.mapInPandas(read_batch, out_schema)


_Y4M_PLANES = {
    # chroma plane size as a function of (w, h); Y is always w*h. 8-bit only.
    "420": lambda w, h: 2 * (((w + 1) // 2) * ((h + 1) // 2)),
    "420jpeg": lambda w, h: 2 * (((w + 1) // 2) * ((h + 1) // 2)),
    "420paldv": lambda w, h: 2 * (((w + 1) // 2) * ((h + 1) // 2)),
    "420mpeg2": lambda w, h: 2 * (((w + 1) // 2) * ((h + 1) // 2)),
    "422": lambda w, h: 2 * (((w + 1) // 2) * h),
    "444": lambda w, h: 2 * (w * h),
    "mono": lambda w, h: 0,
}


def _parse_y4m(data: bytes) -> "tuple[dict, list[int]] | None":
    """Pure-Python YUV4MPEG2 (.y4m) container parse — the video analogue of
    :func:`_parse_netpbm` / :func:`_parse_wav_header`: uncompressed planar
    YUV, so frame extraction is header arithmetic plus a buffer view, no
    codec. Returns ``(header, y_offsets)`` where ``header`` carries width/
    height/fps/colorspace/truncated and ``y_offsets[k]`` is the byte offset
    of frame ``k``'s Y (luma) plane — exactly the grayscale matrix the
    perceptual-hash kernels consume. ``None`` if the bytes are not a
    well-formed 8-bit Y4M stream. A payload that ends mid-frame parses as
    the complete frames plus ``truncated=True`` (same policy as the WAV
    parser: salvage the valid prefix, flag the damage)."""
    try:
        if not data.startswith(b"YUV4MPEG2"):
            return None
        eol = data.find(b"\n", 9)
        if eol < 0:
            return None
        w = h = None
        fps_num, fps_den, cs = None, None, "420"
        for tok in data[9:eol].split(b" "):
            if not tok:
                continue
            tag, val = tok[:1], tok[1:]
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F" and b":" in val:
                a, b = val.split(b":", 1)
                fps_num, fps_den = int(a), int(b)
            elif tag == b"C":
                # strip bit-depth suffixes like 420p10 -> unsupported
                cs = val.decode("ascii", "replace")
        if w is None or h is None or w <= 0 or h <= 0 or w * h > (1 << 26):
            return None
        chroma = _Y4M_PLANES.get(cs)
        if chroma is None:
            return None  # 10/16-bit or exotic colorspace: not this parser
        frame_size = w * h + chroma(w, h)
        offsets: list[int] = []
        truncated = False
        i = eol + 1
        while i < len(data):
            # each frame: b"FRAME" [tagged params] b"\n" then raw planes
            if data[i : i + 5] != b"FRAME":
                truncated = True
                break
            feol = data.find(b"\n", i + 5)
            if feol < 0 or len(data) - (feol + 1) < frame_size:
                truncated = True
                break
            offsets.append(feol + 1)
            i = feol + 1 + frame_size
        hdr = {
            "width": w,
            "height": h,
            "fps_num": fps_num,
            "fps_den": fps_den,
            "colorspace": cs,
            "n_frames": len(offsets),
            "truncated": truncated,
        }
        return hdr, offsets
    except Exception:
        return None


def _y4m_gray_frame(data: bytes, hdr: dict, y_offset: int) -> "np.ndarray":
    """Frame's Y (luma) plane as a float64 ``h x w`` matrix — grayscale by
    construction (Y' IS the luma the netpbm path derives via Rec.601), so
    the existing :func:`phash_gray` / :func:`dhash_gray` kernels apply
    unchanged. Absolute range (video-range 16-235 vs full 0-255) is
    irrelevant to both: phash thresholds on the median, dhash on gradients."""
    w, h = hdr["width"], hdr["height"]
    return (
        np.frombuffer(data, np.uint8, count=w * h, offset=y_offset)
        .astype(np.float64)
        .reshape(h, w)
    )


def sample_frames(
    df: DataFrame,
    binary_col: str,
    n_frames: int = 4,
    decoder: str = "fake",
) -> DataFrame:
    """Explode a video/container column into ``n_frames`` evenly-spaced frame
    rows (doc plumbing for frame-sampling pipelines).

    Decoder tiers (the image/audio pattern):

    * ``"y4m"`` (= ``"auto"``, since no libav binding exists here) — REAL
      frame extraction for uncompressed YUV4MPEG2 payloads via
      :func:`_parse_y4m`: ``n_frames`` evenly-spaced source frames are
      sampled (slot ``k`` reads source frame ``k * total // n_frames`` —
      shorter clips repeat frames so every video emits exactly ``n_frames``
      slots and slot-wise votes stay comparable), each frame's Y plane is
      perceptually hashed (:func:`phash_gray`) and emitted as a 16-hex
      ``frame_hash`` whose top 15 digits are the 60-bit Hamming signature
      downstream banding already extracts. Compressed containers (mp4/mkv/
      avi) still raise ``NotImplementedError`` naming libav — transcoding
      to .y4m is the documented bridge.
    * ``"fake"`` — deterministic md5 frame hashes (the engine-reproducible
      oracle tier; byte-identical videos collide, everything else uniform).
    * ``"real"`` — an honest ``NotImplementedError`` (libav absent).
    """
    if decoder == "auto":
        decoder = "y4m"
    if decoder == "real":
        raise NotImplementedError("frame extraction needs libav")
    if decoder not in ("fake", "y4m"):
        raise ValueError(f"unknown decoder {decoder!r}")
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
                if decoder == "y4m":
                    parsed = _parse_y4m(data)
                    if parsed is None:
                        raise NotImplementedError(
                            "sample_frames(decoder='y4m'): payload is not "
                            "8-bit YUV4MPEG2 — compressed video decode "
                            "needs libav (absent here); transcode to .y4m "
                            "(ffmpeg -i in.mp4 out.y4m) or use "
                            "decoder='fake' for plumbing tests"
                        )
                    hdr, offsets = parsed
                    total = hdr["n_frames"]
                    if total == 0:
                        continue  # header-only/corrupt stream: no frames
                    for i in range(n_frames):
                        gray = _y4m_gray_frame(
                            data, hdr, offsets[(i * total) // n_frames]
                        )
                        h = format(phash_gray(gray) & ((1 << 64) - 1), "016x")
                        rows.append(
                            {
                                **base,
                                "frame": {"frame_index": i, "frame_hash": h},
                            }
                        )
                    continue
                for i in range(n_frames):
                    h = hashlib.md5(data + i.to_bytes(4, "big")).hexdigest()
                    rows.append({**base, "frame": {"frame_index": i, "frame_hash": h}})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(extract, out_schema)


#: metadata produced per video object
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("truncated", T.BooleanType()),
        T.StructField("content_hash", T.StringType()),
    ]
)


def video_metadata(
    df: DataFrame,
    binary_col: str,
    decoder: str = "auto",
) -> DataFrame:
    """Append a ``video_meta`` struct decoded from ``binary_col`` — the
    video third of the multimodal metadata matrix (:func:`media_metadata`
    for images, :func:`audio_metadata` for audio). Arrow-batched
    ``mapInPandas``; Python only at the codec seam.

    Decoders: ``"auto"`` — the pure YUV4MPEG2 parser (:func:`_parse_y4m`):
    real width/height/fps/colorspace/frame-count/duration from real bytes,
    zero dependencies, header-walk cost only (frame payloads are strided
    over, never decoded); non-Y4M bytes keep the magic-bytes format sniff
    with null video fields — a metadata scan reports, it doesn't raise
    (the :func:`sample_frames` DECODE tiers are the ones that refuse
    compressed codecs). ``"fake"`` — deterministic md5-derived
    pseudo-fields for ANY bytes, the engine-reproducible oracle tier
    (an independent SQL engine recomputes every integer field from the
    same md5 hex arithmetic)."""
    if decoder not in ("auto", "y4m", "fake"):
        # same validation sample_frames applies: a typo'd decoder must not
        # silently run the parse tier when the caller expected the
        # engine-reproducible fake fields (the oracle cross-check would
        # mismatch with no hint why)
        raise ValueError(
            f"unknown decoder {decoder!r} (video_metadata tiers: 'auto' = "
            "'y4m' header parse, 'fake' md5 pseudo-fields)"
        )
    fields = list(df.schema.fields) + [
        T.StructField("video_meta", VIDEO_META_SCHEMA)
    ]
    out_schema = T.StructType(fields)

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for data in pdf[binary_col]:
                if data is None:
                    metas.append(None)
                    continue
                data = bytes(data)
                md5_hex = hashlib.md5(data).hexdigest()
                base = {"n_bytes": len(data), "content_hash": md5_hex}
                if decoder == "fake":
                    h = int(md5_hex[:8], 16)
                    fps = 24 + h % 37
                    frames = int(md5_hex[8:16], 16) % 100_000
                    metas.append(
                        {
                            **base,
                            "format": _sniff_format(data),
                            "width": 64 + h % 1216,
                            "height": 64 + (h >> 2) % 656,
                            "fps_num": fps,
                            "fps_den": 1,
                            "colorspace": None,
                            "n_frames": frames,
                            "duration_s": round(frames / fps, 6),
                            "truncated": h % 17 == 0,
                        }
                    )
                    continue
                parsed = _parse_y4m(data)
                if parsed is not None:
                    hdr, _ = parsed
                    num, den = hdr["fps_num"], hdr["fps_den"]
                    dur = (
                        round(hdr["n_frames"] * den / num, 6)
                        if num and den
                        else None
                    )
                    metas.append(
                        {
                            **base,
                            "format": "y4m",
                            "width": hdr["width"],
                            "height": hdr["height"],
                            "fps_num": num,
                            "fps_den": den,
                            "colorspace": hdr["colorspace"],
                            "n_frames": hdr["n_frames"],
                            "duration_s": dur,
                            "truncated": hdr["truncated"],
                        }
                    )
                else:
                    metas.append(
                        {
                            **base,
                            "format": _sniff_format(data),
                            "width": None,
                            "height": None,
                            "fps_num": None,
                            "fps_den": None,
                            "colorspace": None,
                            "n_frames": None,
                            "duration_s": None,
                            "truncated": None,
                        }
                    )
            yield pdf.assign(video_meta=metas)

    return df.mapInPandas(decode_batches, out_schema)


def video_near_duplicates(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    n_frames: int = 4,
    decoder: str = "fake",
    max_hamming: int = 7,
    min_matching_frames: int | None = None,
    band_bits: int | None = None,
    bits: int | None = None,
    key_blocks: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_matching_frames) pairs of near-duplicate VIDEOS —
    the last modality's near-dup tier, composed over the existing frame
    plumbing: :func:`sample_frames` emits ``n_frames`` evenly-spaced frame
    hashes per video, each frame hash becomes a 60-bit signature, frames at
    the SAME index pair through the shared banded Hamming engine, and two
    videos near-dup when at least ``min_matching_frames`` (default: a
    strict majority, ``n_frames // 2 + 1``) of their same-index frames
    match within ``max_hamming`` — the standard frame-voting rule for
    video-level dedup.

    Decoder tiers: ``"y4m"`` (= ``"auto"``) is a REAL tier — uncompressed
    YUV4MPEG2 payloads are frame-parsed in pure Python (:func:`_parse_y4m`)
    and each sampled frame's Y plane perceptually hashed, so re-encoded
    variants (noise, chroma subsampling changes, container param changes)
    land within ``max_hamming`` while unrelated clips don't (pytest-gated
    on hand-built fixtures). Compressed codecs still raise
    ``NotImplementedError`` naming libav. ``"fake"``'s md5 frame hashes are
    engine-reproducible, so an independent SQL engine rebuilds the exact
    pair set (all-pairs per frame index + the same vote) — that tier
    oracle-checks the plumbing, partitioning and vote semantics.

    Same-index pairing rides ONE banded join: frame rows carry the encoded
    id ``video_id * n_frames + frame_index``, so banding runs once over
    all frames; candidates that banded across DIFFERENT indexes are
    discarded by the decode filter (recall is untouched — the per-frame
    pigeonhole guarantee holds within every index, and the filter only
    drops pairs the vote must not count). Shuffles: the one banded-pair
    exchange + one (doc_a, doc_b) count."""
    from pandas_profiling_personal_spark.operators.dedup import (
        auto_band_geometry,
        banded_hamming_pairs,
    )

    if decoder == "auto":
        decoder = "y4m"
    if decoder == "real":
        raise NotImplementedError("frame extraction needs libav")
    from pyspark.sql.types import IntegralType

    if not isinstance(df.schema[id_col].dataType, IntegralType):
        # the encoded frame id is id*K+index arithmetic: a string id casts
        # to null (silently EMPTY pair set) and a fractional double
        # truncates (silently MERGED videos) — refuse both loudly
        raise ValueError(
            f"video_near_duplicates needs an integral {id_col!r} "
            f"(got {df.schema[id_col].dataType.simpleString()}): frame ids "
            "encode as id*n_frames+index — map string ids to a surrogate "
            "first (e.g. xxhash64 or zipWithIndex)"
        )
    if min_matching_frames is None:
        min_matching_frames = n_frames // 2 + 1
    if bits is None:
        bits = 60
    K = int(n_frames)
    # |id|*K + (K-1) must fit a long, else the ANSI multiply errors
    # mid-job with a stack trace that names nothing useful (review r9)
    id_bound = ((1 << 63) - 1 - (K - 1)) // K
    if key_blocks is None:
        # auto geometry needs a sizing count anyway — ride the overflow
        # check on the same agg for a call-time named error
        n_videos, max_abs_id = df.agg(
            F.count(F.lit(1)), F.max(F.abs(S.col(id_col).cast("long")))
        ).first()
        if max_abs_id is not None and max_abs_id > id_bound:
            raise ValueError(
                f"video_near_duplicates: max |{id_col}| = {max_abs_id} "
                f"exceeds {id_bound} = (2^63-1-(n_frames-1))/n_frames, so "
                "the encoded frame id id*n_frames+frame_index would "
                "overflow long arithmetic — map ids to a dense surrogate "
                "first (e.g. zipWithIndex or row_number)"
            )
        band_bits, key_blocks = auto_band_geometry(
            n_videos * K, bits, max_hamming, band_bits
        )
    elif band_bits is None:
        band_bits = 6
    vid = S.col(id_col).cast("long")
    frames = sample_frames(
        df.select(id_col, binary_col), binary_col, n_frames, decoder
    ).select(
        # caller-supplied geometry pays ZERO extra actions (review r9
        # second pass: the unconditional sizing agg added a full scan to a
        # path that previously ran none) — the bound is enforced plan-side
        # instead, a named raise_error the moment an oversized id is seen;
        # null ids keep their null __fid (dropped by banding, as before)
        F.when(
            vid.isNull() | (F.abs(vid) <= F.lit(id_bound)),
            vid * K + F.col("frame.frame_index"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    f"video_near_duplicates: |{id_col}| exceeds "
                    f"{id_bound} = (2^63-1-(n_frames-1))/n_frames — the "
                    "encoded frame id would overflow; map ids to a dense "
                    "surrogate first (e.g. zipWithIndex or row_number)"
                )
            ).cast("long")
        )
        .alias("__fid"),
        F.conv(F.substring("frame.frame_hash", 1, 15), 16, 10)
        .cast("long")
        .alias("__sig"),
    )
    pairs = banded_hamming_pairs(
        frames.repartition(S.col("__fid")), "__fid", "__sig",
        bits=bits, band_bits=band_bits,
        max_hamming=max_hamming, key_blocks=key_blocks,
    )
    return (
        pairs
        # same frame index only: the vote counts aligned frames. pmod, not
        # %: Spark's remainder follows the sign, so a negative-id video
        # would never index-match a positive-id one (review r9) — pmod and
        # the floor decode below agree for every sign
        .where(F.pmod(F.col("doc_a"), F.lit(K)) == F.pmod(F.col("doc_b"), F.lit(K)))
        .select(
            # exact integer decode (floor division for every sign): the
            # numerator is exactly divisible by K after subtracting pmod, so
            # integral `div` is exact — double division would round for
            # encoded ids beyond 2^53 (review r9)
            F.expr(f"(doc_a - pmod(doc_a, {K})) div {K}").alias("doc_a"),
            F.expr(f"(doc_b - pmod(doc_b, {K})) div {K}").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_matching_frames"))
        .where(F.col("n_matching_frames") >= int(min_matching_frames))
    )
