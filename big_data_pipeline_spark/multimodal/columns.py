"""Multimodal columns: opaque binary payloads with typed metadata.

The engine's convention for image/audio/video at 100 TB scale: the
payload is an opaque ``binary`` column (or, for very large media, an
object-store URI to fetch inside the UDF) plus a typed metadata struct
— never a decoded in-memory representation at rest. All per-media
compute (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` so payloads stream through Python in
columnar batches without ever landing on the driver.

The decode step itself needs codec libraries (PIL/ffmpeg) that are NOT
in this environment — it is STUBBED: ``decode_image`` raises
``NotImplementedError`` unless a decoder is importable, and the tested
path uses deterministic fake media from ``attach_fake_media``. The
Spark-side plumbing (schema, batch iteration, partitioning, output
shapes) is real and covered by tests + a registered query.

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


def _no_decoder() -> None:
    raise NotImplementedError(
        "media decode requires a codec library (e.g. PIL/ffmpeg) that is "
        "not available in this environment; use attach_fake_media for "
        "plumbing tests or install a decoder and extend decode_image"
    )


def decode_image(payload: bytes):  # pragma: no cover - exercised via stub test
    """STUB (SURVEY.md north-star multimodal op). Real implementation
    would return a HxWxC uint8 array via PIL; the import is gated so
    the module works without it."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        _no_decoder()
    import io

    from PIL import Image

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
