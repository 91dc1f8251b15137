"""Multimodal columns: opaque binary payloads with typed metadata.

The engine's convention for image/audio/video at 100 TB scale: the
payload is an opaque ``binary`` column (or, for very large media, an
object-store URI to fetch inside the UDF) plus a typed metadata struct
— never a decoded in-memory representation at rest. All per-media
compute (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` so payloads stream through Python in
columnar batches without ever landing on the driver.

Decoding: netpbm images (PGM ``P5`` / PPM ``P6`` — the classic public
raster format) are decoded FOR REAL by a dependency-free pure-Python
parser (``decode_netpbm``): header tokenizer (whitespace + ``#``
comments), dimension/maxval parse, raster → numpy array. Compressed
codecs (JPEG/PNG/audio/video) still need external libraries that are
NOT in this environment, so ``decode_image`` falls back to a gated PIL
import for those formats only. ``attach_ppm_media`` builds real P6
payloads JVM-side, so the decode path runs end-to-end on actual image
bytes and is oracle-checked (workloads/multimodal.py).

Scale notes:
- ``mapInPandas`` preserves partitioning — no shuffle for per-row media
  ops; size partitions by bytes (maxPartitionBytes), not row count,
  since payloads dominate.
- Feature extraction emits fixed-width ``array<double>`` — compact,
  column-prunable, and joinable with the similarity ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_N_HIST_BINS = 16


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media: the UTF-8 bytes of ``text_col`` stand in
    for encoded image bytes, with a plausible metadata struct. Lets every
    downstream op run for real without codec libraries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("image").alias("media_type"),
                F.lit("fake-raw").alias("format"),
                F.octet_length(payload).cast("int").alias("width"),
                F.lit(1).alias("height"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


_PPM_WIDTH = 16  # attach_ppm_media: 16 RGB pixels/row = 48 raster bytes


def attach_ppm_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Real P6 PPM payloads built JVM-side: header ``P6\\n16 {h}\\n255\\n``
    + raster = the UTF-8 bytes of ``text_col`` zero-padded to h rows of
    16 RGB pixels (h = ceil(n_bytes/48), min 1). Every downstream decode
    runs on genuine image bytes, and because the construction is pure
    SQL over the text column, an independent engine can recompute any
    pixel statistic from the text for oracle checks."""
    raw = F.encode(F.col(text_col), "UTF-8")
    hgt = F.greatest(
        F.lit(1), F.ceil(F.octet_length(raw) / F.lit(3 * _PPM_WIDTH))
    ).cast("int")
    total = (hgt * (3 * _PPM_WIDTH)).cast("int")
    header = F.encode(
        F.concat(
            F.lit(f"P6\n{_PPM_WIDTH} "), hgt.cast("string"), F.lit("\n255\n")
        ),
        "UTF-8",
    )
    # zero-pad the raster to exactly h*48 bytes (pad < 48 by construction)
    raster = F.substring(F.concat(raw, F.lit(bytes(3 * _PPM_WIDTH))), F.lit(1), total)
    payload = F.concat(header, raster)
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("image").alias("media_type"),
                F.lit("ppm").alias("format"),
                F.lit(_PPM_WIDTH).alias("width"),
                hgt.alias("height"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


def _no_decoder() -> None:
    raise NotImplementedError(
        "decoding compressed codecs (JPEG/PNG/audio/video) requires a "
        "codec library (e.g. PIL/ffmpeg) that is not available in this "
        "environment; netpbm (P5/P6) decodes natively via decode_netpbm"
    )


def decode_netpbm(payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Dependency-free netpbm decoder (public format: magic, ASCII
    header tokens with ``#`` comments, binary raster). Supports P5
    (grayscale) and P6 (RGB) with maxval <= 255. Returns
    ``(format, width, height, maxval, pixels)`` where pixels is
    (H, W) uint8 for P5 and (H, W, 3) for P6."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: magic={magic!r}")
    # header tokenizer: fields separated by whitespace; '#' starts a
    # comment running to end-of-line; raster begins after exactly ONE
    # whitespace byte following the maxval token
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte that terminates the header
    width, height, maxval = tokens
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    shape = (height, width, 3) if channels == 3 else (height, width)
    return magic.decode(), width, height, maxval, raster.reshape(shape)


def decode_image(payload: bytes):
    """Decode an image payload to a numpy array. Netpbm (P5/P6) decodes
    natively with no dependencies; other formats fall back to a gated
    PIL import (not present in this environment)."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)[4]
    try:
        import io

        from PIL import Image
    except ImportError:
        _no_decoder()
    return np.asarray(Image.open(io.BytesIO(payload)))


def byte_histogram_features(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """Per-media feature vector: normalized 16-bin byte histogram.

    A deterministic stand-in for a CNN embedding with the identical
    Spark plumbing: Arrow-batched ``mapInPandas``, fixed-width
    ``array<double>`` output. Keyed pass-through columns are preserved.
    """
    in_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=_N_HIST_BINS).astype(
                    np.float64
                )
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            out = pdf[in_cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(extract, schema=out_schema)


def decoded_pixel_features(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL decode path: parse each payload with ``decode_netpbm`` and
    emit per-image statistics computed from the DECODED pixel array —
    parsed dimensions/maxval plus the normalized 16-bin high-nibble
    histogram of the pixel bytes. Nothing is carried through from
    metadata: a header mis-parse or raster mis-slice changes the output
    (which is what makes the oracle check meaningful)."""
    in_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("maxval", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, maxvals, feats = [], [], [], []
            for payload in pdf[payload_col]:
                _, w, h, mv, pixels = decode_netpbm(bytes(payload))
                flat = pixels.reshape(-1)
                hist = np.bincount(flat >> 4, minlength=_N_HIST_BINS).astype(
                    np.float64
                )
                total = hist.sum()
                widths.append(w)
                heights.append(h)
                maxvals.append(mv)
                feats.append((hist / total if total else hist).tolist())
            out = pdf[in_cols].copy()
            out["width"] = widths
            out["height"] = heights
            out["maxval"] = maxvals
            out["features"] = feats
            yield out

    return df.mapInPandas(extract, schema=out_schema)


def frame_sample(
    df: DataFrame, payload_col: str = "media", frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """"Video" frame sampling over an opaque payload: split the byte
    stream into fixed-size frames and keep every ``stride``-th one.
    Real decoders slot into the same mapInPandas signature."""
    in_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, stride):
                    rows.append(
                        {
                            **{c: row[c] for c in in_cols},
                            "frame_idx": i,
                            "frame": payload[i * frame_bytes : (i + 1) * frame_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=[*in_cols, "frame_idx", "frame"])

    return df.mapInPandas(sample, schema=out_schema)


def resize_image(df: DataFrame, payload_col: str = "media", **_kw) -> DataFrame:
    """STUB: real resize needs a decoder. Raises at plan-build time so
    callers fail fast rather than inside executors."""
    _no_decoder()
