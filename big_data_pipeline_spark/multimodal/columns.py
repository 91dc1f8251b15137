"""Multimodal columns: opaque binary payloads with typed metadata.

The engine's convention for image/audio/video at 100 TB scale: the
payload is an opaque ``binary`` column (or, for very large media, an
object-store URI to fetch inside the UDF) plus a typed metadata struct
— never a decoded in-memory representation at rest. All per-media
compute (decode, resize, frame-sample, feature-extract) runs as
Arrow-batched ``mapInPandas`` so payloads stream through Python in
columnar batches without ever landing on the driver.

Decoding: two public container formats are decoded FOR REAL by
dependency-free pure-Python parsers — netpbm images (PGM ``P5`` / PPM
``P6``: header tokenizer with ``#`` comments, dimension/maxval parse,
raster → numpy array, ``decode_netpbm``) and RIFF/WAVE PCM audio
(chunk walk, ``fmt ``/``data`` parse, 8/16-bit samples, ``decode_wav``).
One COMPRESSED codec also decodes for real: PNG (``decode_png`` —
signature, chunk CRCs, stdlib ``zlib`` inflate, per-scanline unfilter
of all five spec filters; 8-bit gray/RGB/RGBA, with ``encode_png`` as
its fixture-building inverse). Remaining compressed codecs
(JPEG/MP3/video) still need external libraries that are NOT in this
environment, so ``decode_image`` falls back to a gated PIL import for
those formats only. ``attach_ppm_media`` / ``attach_wav_media`` build
real payloads JVM-side and ``attach_png_media`` builds real PNGs in an
Arrow pass, so every decode path runs end-to-end on actual container
bytes and is oracle-checked (workloads/multimodal.py).
``resize_image`` is a real nearest-neighbor resample over the decoded
netpbm raster.

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


_WAV_RATE = 8000  # attach_wav_media: 8 kHz mono 8-bit PCM


def _le_hex(value, n_bytes: int):
    """SQL expression: little-endian hex string of ``value`` (a Column)
    over ``n_bytes`` bytes — the building block for binary container
    headers constructed JVM-side (RIFF/WAV uses LE u16/u32 fields)."""
    parts = [
        F.lpad(F.hex(F.shiftright(value, 8 * i) % 256), 2, "0")
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def attach_wav_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Real RIFF/WAVE payloads built JVM-side: the canonical 44-byte PCM
    header (RIFF size, ``fmt `` chunk: PCM, mono, 8 kHz, 8-bit, ``data``
    chunk size) followed by the UTF-8 bytes of ``text_col`` as unsigned
    8-bit samples. Header integers are little-endian, assembled with
    ``_le_hex`` + ``unhex`` so every byte is genuine container format —
    the downstream ``decode_wav`` parser must walk real chunks. Because
    the sample data is the text bytes, an independent engine can
    recompute any sample statistic from the text (hex space) for oracle
    checks."""
    raw = F.encode(F.col(text_col), "UTF-8")
    n = F.octet_length(raw)
    # 'RIFF' | chunk_size=36+n | 'WAVE' | 'fmt ' | 16 | PCM=1 | ch=1
    # | rate | byte_rate | block_align=1 | bits=8 | 'data' | n
    header = F.unhex(
        F.concat(
            F.lit("52494646"),            # 'RIFF'
            _le_hex(n + F.lit(36), 4),
            F.lit("57415645"),            # 'WAVE'
            F.lit("666d7420"),            # 'fmt '
            F.lit("10000000"),            # fmt chunk size 16 (LE)
            F.lit("0100"),                # PCM
            F.lit("0100"),                # mono
            F.lit(f"{_WAV_RATE & 255:02X}{(_WAV_RATE >> 8) & 255:02X}0000"),
            F.lit(f"{_WAV_RATE & 255:02X}{(_WAV_RATE >> 8) & 255:02X}0000"),
            F.lit("0100"),                # block align
            F.lit("0800"),                # 8 bits/sample
            F.lit("64617461"),            # 'data'
            _le_hex(n, 4),
        )
    )
    payload = F.concat(header, raw)
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("audio").alias("media_type"),
                F.lit("wav").alias("format"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


def decode_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Dependency-free RIFF/WAVE PCM parser (public container format):
    validates the RIFF header, walks sub-chunks (skipping unknown ones,
    honoring the word-aligned padding rule), reads ``fmt `` fields and
    the ``data`` raster. Supports PCM (format tag 1) at 8 or 16 bits.
    Returns ``(channels, sample_rate, bits, samples)`` where samples is
    uint8 (8-bit, unsigned per the WAV spec) or int16 LE (16-bit)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 != len(payload):
        raise ValueError(f"RIFF size {riff_size} != payload {len(payload) - 8}")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if tag != 1:
        raise ValueError(f"unsupported WAV format tag {tag} (PCM only)")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8)
    elif bits == 16:
        samples = np.frombuffer(data, dtype="<i2")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    return channels, rate, bits, samples


def decoded_audio_features(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL audio decode path: parse each payload with ``decode_wav``
    and emit per-clip statistics from the DECODED samples — parsed
    channel/rate/bit-depth, duration, and exact integer sample moments
    (sum, sum of squares, min, max) plus the mean as one IEEE division.
    Nothing is carried from metadata, so a chunk-walk or fmt mis-parse
    changes the output."""
    in_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("bits", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("sum_samples", T.LongType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("sample_min", T.IntegerType()),
            T.StructField("sample_max", T.IntegerType()),
            T.StructField("mean_sample", T.DoubleType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                ch, rate, bits, s = decode_wav(bytes(payload))
                n = len(s)
                s64 = s.astype(np.int64)
                total = int(s64.sum())
                rows.append(
                    (
                        ch,
                        rate,
                        bits,
                        n,
                        n * 1000 // rate,
                        total,
                        int((s64 * s64).sum()),
                        int(s.min()) if n else None,
                        int(s.max()) if n else None,
                        total / n if n else None,
                    )
                )
            out = pdf[in_cols].copy()
            stats = pd.DataFrame(
                rows,
                columns=[f.name for f in out_schema.fields[len(in_cols):]],
                index=out.index,
            )
            yield pd.concat([out, stats], axis=1)

    return df.mapInPandas(extract, schema=out_schema)


def _no_decoder() -> None:
    raise NotImplementedError(
        "decoding this compressed codec (MP3/video/progressive JPEG) "
        "requires a codec library (e.g. PIL/ffmpeg) that is not "
        "available in this environment; netpbm (P5/P6) decodes "
        "natively via decode_netpbm, PNG (8-bit gray/RGB/RGBA) via "
        "decode_png, and baseline sequential JPEG via "
        "multimodal.jpeg.decode_jpeg_baseline"
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth_vec(a, b, c):
    """PNG Paeth predictor, vectorized over int32 arrays."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """Stdlib-only PNG encoder (``zlib`` + chunk CRCs): 8-bit grayscale
    (H, W), RGB (H, W, 3) or RGBA (H, W, 4), non-interlaced. ``filters``
    picks the per-scanline filter type; the default ``row % 5`` cycles
    through all five spec filters (None/Sub/Up/Average/Paeth) so a
    decoder consuming these payloads must implement real unfiltering,
    not just a zlib pass."""
    import struct
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color, ch = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    h, w = arr.shape[:2]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int32)
    # Filtering only READS original (unfiltered) neighbor bytes, so all
    # five per-row variants vectorize as whole-image 2-D shifts — one
    # numpy pass instead of a per-scanline Python loop (measured 12x on
    # the sf1 corpus; this is the Arrow-batch hot path).
    up = np.vstack([np.zeros((1, stride), np.int32), flat[:-1]])
    pad = np.zeros((h, ch), dtype=np.int32)
    left = np.concatenate([pad, flat[:, :-ch]], axis=1)
    upleft = np.concatenate([pad, up[:, :-ch]], axis=1)
    variants = np.stack(
        [
            flat,
            (flat - left) % 256,
            (flat - up) % 256,
            (flat - (left + up) // 2) % 256,
            (flat - _paeth_vec(left, up, upleft)) % 256,
        ]
    )
    fts = np.asarray(
        [r % 5 for r in range(h)] if filters is None else [int(f) for f in filters],
        dtype=np.int64,
    )
    if len(fts) != h or ((fts < 0) | (fts > 4)).any():
        raise ValueError("filters must give one type in 0-4 per scanline")
    out = np.empty((h, 1 + stride), dtype=np.uint8)
    out[:, 0] = fts
    out[:, 1:] = variants[fts, np.arange(h)].astype(np.uint8)
    raw = out.tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, int, np.ndarray, list]:
    """Stdlib-only PNG decoder: signature + chunk walk with CRC
    verification, IHDR validation (8-bit depth, grayscale/RGB/RGBA,
    non-interlaced), IDAT concat → ``zlib`` inflate → per-scanline
    UNFILTER of all five spec filter types (the left/up/avg/Paeth
    reconstruction is the part a fake decoder would skip). Returns
    ``(width, height, channels, pixels, filters_seen)`` with pixels
    (H, W) uint8 for grayscale, (H, W, C) otherwise, and filters_seen
    the sorted list of scanline filter types encountered — closes the
    compressed-codec gate (_no_decoder) for one real format."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError(f"not a PNG payload: head={payload[:8]!r}")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        ln, tag = struct.unpack(">I4s", payload[pos : pos + 8])
        pos += 8
        body = payload[pos : pos + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk body")
        pos += ln
        if pos + 4 > len(payload):
            raise ValueError("truncated PNG chunk CRC")
        (crc,) = struct.unpack(">I", payload[pos : pos + 4])
        pos += 4
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant: depth={depth} comp={comp} "
            f"filter_method={filt} interlace={interlace}"
        )
    try:
        ch = {0: 1, 2: 3, 6: 4}[color]
    except KeyError:
        raise ValueError(f"unsupported PNG color type {color}") from None
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG raster size mismatch: {len(raw)} != {h * (1 + stride)}"
        )
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    fts_arr = mat[:, 0]
    if (fts_arr > 4).any():
        raise ValueError("PNG scanline filter out of range 0-4")
    data = mat[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    filters_seen = sorted(int(f) for f in set(fts_arr.tolist()))
    for r in range(h):
        ft = fts_arr[r]
        row = data[r]
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prev) & 0xFF
        elif ft == 1:
            # Sub depends only on the row's own left bytes: per-channel
            # prefix sums mod 256 — vectorized, no scalar loop
            rec = (
                row.reshape(w, ch).cumsum(axis=0, dtype=np.int64) % 256
            ).reshape(stride).astype(np.int32)
        else:
            # Average/Paeth reconstruct sequentially (each byte needs
            # the RECONSTRUCTED left byte); plain-int lists beat numpy
            # scalar indexing ~10x on short scanlines
            rl, pl = row.tolist(), prev.tolist()
            rec_l = [0] * stride
            if ft == 3:
                for i in range(stride):
                    a = rec_l[i - ch] if i >= ch else 0
                    rec_l[i] = (rl[i] + (a + pl[i]) // 2) & 0xFF
            else:
                for i in range(stride):
                    a = rec_l[i - ch] if i >= ch else 0
                    b = pl[i]
                    c = pl[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    rec_l[i] = (rl[i] + pred) & 0xFF
            rec = np.asarray(rec_l, dtype=np.int32)
        out[r] = rec
        prev = rec
    pixels = out.astype(np.uint8)
    pixels = pixels.reshape((h, w) if ch == 1 else (h, w, ch))
    return w, h, ch, pixels, sorted(filters_seen)


_PNG_WIDTH = 16  # attach_png_media: 16 grayscale pixels per scanline


def attach_png_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Real PNG payloads: grayscale 8-bit, width 16, raster = the UTF-8
    bytes of ``text_col`` zero-padded to h scanlines (h = ceil(n/16),
    min 1), scanline filter = row % 5 — every payload exercises all
    five PNG filters through zlib-compressed IDAT. Because the DECODED
    raster is exactly the text bytes + zero padding, an independent
    engine can recompute any pixel statistic from the text alone —
    the same oracle contract as attach_ppm_media, but through a real
    compressed codec."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            b = ("" if t is None else t).encode("utf-8")
            hgt = max(1, -(-len(b) // _PNG_WIDTH))
            raster = np.frombuffer(
                b + bytes(hgt * _PNG_WIDTH - len(b)), dtype=np.uint8
            ).reshape(hgt, _PNG_WIDTH)
            out.append(encode_png(raster))
        return pd.Series(out)

    payload = _enc(F.col(text_col))
    raw_len = F.octet_length(F.encode(F.col(text_col), "UTF-8"))
    hgt = F.greatest(
        F.lit(1), F.ceil(raw_len / F.lit(_PNG_WIDTH))
    ).cast("int")
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("image").alias("media_type"),
                F.lit("png").alias("format"),
                F.lit(_PNG_WIDTH).alias("width"),
                hgt.alias("height"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


def decoded_png_stats(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL compressed decode path: run ``decode_png`` (chunk walk, CRC
    checks, inflate, unfilter) on each payload inside one Arrow-batched
    mapInPandas pass and emit integer-exact pixel statistics plus the
    set of scanline filters the decoder had to undo. Pass-through
    columns are preserved; the payload column is pruned from the
    output."""
    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        [
            *keep,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_filters", T.IntegerType()),
            T.StructField("sum_pixels", T.LongType()),
            T.StructField("n_zero", T.LongType()),
            T.StructField("px_min", T.IntegerType()),
            T.StructField("px_max", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )
    keep_names = [f.name for f in keep]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                w, h, ch, px, fts = decode_png(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        w,
                        h,
                        ch,
                        len(fts),
                        int(flat.sum()),
                        int((flat == 0).sum()),
                        int(flat.min()),
                        int(flat.max()),
                        float(flat.sum()) / len(flat),
                    )
                )
            stats = pd.DataFrame(
                rows,
                columns=[
                    "width",
                    "height",
                    "channels",
                    "n_filters",
                    "sum_pixels",
                    "n_zero",
                    "px_min",
                    "px_max",
                    "mean_pixel",
                ],
                index=pdf.index,
            )
            yield pd.concat([pdf[keep_names], stats], axis=1)

    return df.mapInPandas(extract, schema=out_schema)


# --- baseline JPEG: block-constant payloads with provably exact decode ------
# attach_jpeg_media builds a REAL baseline JPEG per document: one
# constant 8x8 block per byte of the first _JPEG_CAP text bytes,
# _JPEG_BLOCKS_PER_ROW blocks per MCU row, uniform quantizer 8. A
# constant block has only its DC coefficient non-zero and 8 divides
# 8*(v-128) exactly, so ANY correct decode — Huffman tables read from
# the stream, DC differential prediction, zigzag, dequantization, IDCT
# — reconstructs the byte value v bit-exactly (the nearest rounding
# decision sits ~1e-12 from a half-integer). That makes the decoded
# raster a pure function of the text bytes, which a second engine can
# recompute without a codec — the same oracle contract as
# attach_png_media, through the lossy-by-nature format. The general
# AC-bearing path of the codec is pinned by round-trip property tests
# (tests/test_multimodal.py).
#
# The byte cap bounds decode cost per document (the 64x block blow-up
# would otherwise make the Huffman loop corpus-quadratic-ish at sf1);
# the cap is a documented generator parameter, not a decoder limit.

_JPEG_CAP = 64  # text bytes rendered per document
_JPEG_BLOCKS_PER_ROW = 16  # -> width 128 px


def attach_jpeg_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Real baseline-JPEG payloads whose decode is exactly the first
    ``_JPEG_CAP`` UTF-8 bytes of ``text_col`` expanded to constant 8x8
    blocks (row-major, ``_JPEG_BLOCKS_PER_ROW`` per row, zero-byte
    padding to fill the last row)."""
    from pyspark.sql.functions import pandas_udf

    from big_data_pipeline_spark.multimodal.jpeg import encode_jpeg_baseline

    @pandas_udf(T.BinaryType())
    def _enc(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            b = ("" if t is None else t).encode("utf-8")[:_JPEG_CAP]
            rows = max(1, -(-len(b) // _JPEG_BLOCKS_PER_ROW))
            vals = np.frombuffer(
                b + bytes(rows * _JPEG_BLOCKS_PER_ROW - len(b)),
                dtype=np.uint8,
            ).reshape(rows, _JPEG_BLOCKS_PER_ROW)
            img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
            out.append(encode_jpeg_baseline(img, quant=np.full(64, 8)))
        return pd.Series(out)

    payload = _enc(F.col(text_col))
    raw_len = F.least(
        F.octet_length(F.encode(F.col(text_col), "UTF-8")), F.lit(_JPEG_CAP)
    )
    rows = F.greatest(
        F.lit(1), F.ceil(raw_len / F.lit(_JPEG_BLOCKS_PER_ROW))
    ).cast("int")
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("image").alias("media_type"),
                F.lit("jpeg").alias("format"),
                F.lit(_JPEG_BLOCKS_PER_ROW * 8).alias("width"),
                (rows * 8).alias("height"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


def decoded_jpeg_stats(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL baseline-JPEG decode path: run ``decode_jpeg_baseline``
    (marker parse, stream-read DHT/DQT, Huffman + DC-prediction entropy
    decode, dequantize, IDCT) on each payload inside one Arrow-batched
    mapInPandas pass and emit integer-exact raster statistics.
    Pass-through columns are preserved; the payload column is pruned."""
    from big_data_pipeline_spark.multimodal.jpeg import decode_jpeg_baseline

    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        [
            *keep,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_blocks", T.IntegerType()),
            T.StructField("sum_pixels", T.LongType()),
            T.StructField("n_zero", T.LongType()),
            T.StructField("px_min", T.IntegerType()),
            T.StructField("px_max", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )
    keep_names = [f.name for f in keep]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                w, h, _ch, px = decode_jpeg_baseline(bytes(payload))
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        w,
                        h,
                        (w // 8) * (h // 8),
                        int(flat.sum()),
                        int((flat == 0).sum()),
                        int(flat.min()),
                        int(flat.max()),
                        float(flat.sum()) / len(flat),
                    )
                )
            stats = pd.DataFrame(
                rows,
                columns=[
                    "width",
                    "height",
                    "n_blocks",
                    "sum_pixels",
                    "n_zero",
                    "px_min",
                    "px_max",
                    "mean_pixel",
                ],
                index=pdf.index,
            )
            yield pd.concat([pdf[keep_names], stats], axis=1)

    return df.mapInPandas(extract, schema=out_schema)


# --- GIF: multi-frame LZW container with an exactly-known raster ------------
# attach_gif_media renders document text as an ANIMATED grayscale GIF:
# 16x4-pixel frames of 64 text bytes each (up to _GIF_MAX_FRAMES,
# zero-padded last frame), real variable-width LZW per frame
# (multimodal/gif.py). Lossless → the PNG/JPEG oracle contract again:
# the decoded frame stack is a pure function of the text bytes, so the
# DuckDB twin recomputes every statistic from hex while the Spark side
# must run the actual LZW decode + frame walk. This is the frame-
# sample plumbing (SURVEY multimodal: video frame-sampling) exercised
# against a REAL animated container rather than the synthetic
# fake-media payloads.

_GIF_FRAME_W = 16
_GIF_FRAME_H = 4
_GIF_FRAME_BYTES = _GIF_FRAME_W * _GIF_FRAME_H  # 64
_GIF_MAX_FRAMES = 4  # cap: 256 text bytes per document


def attach_gif_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from big_data_pipeline_spark.multimodal.gif import encode_gif

    @pandas_udf(T.BinaryType())
    def _enc(texts: pd.Series) -> pd.Series:
        out = []
        cap = _GIF_FRAME_BYTES * _GIF_MAX_FRAMES
        for t in texts:
            b = ("" if t is None else t).encode("utf-8")[:cap]
            nf = max(1, -(-len(b) // _GIF_FRAME_BYTES))
            b = b + bytes(nf * _GIF_FRAME_BYTES - len(b))
            frames = [
                np.frombuffer(
                    b[i * _GIF_FRAME_BYTES : (i + 1) * _GIF_FRAME_BYTES],
                    dtype=np.uint8,
                ).reshape(_GIF_FRAME_H, _GIF_FRAME_W)
                for i in range(nf)
            ]
            out.append(encode_gif(frames))
        return pd.Series(out)

    payload = _enc(F.col(text_col))
    raw_len = F.least(
        F.octet_length(F.encode(F.col(text_col), "UTF-8")),
        F.lit(_GIF_FRAME_BYTES * _GIF_MAX_FRAMES),
    )
    n_frames = F.greatest(
        F.lit(1), F.ceil(raw_len / F.lit(_GIF_FRAME_BYTES))
    ).cast("int")
    return df.withColumns(
        {
            "media": payload,
            "media_meta": F.struct(
                F.lit("animation").alias("media_type"),
                F.lit("gif").alias("format"),
                F.lit(_GIF_FRAME_W).alias("width"),
                F.lit(_GIF_FRAME_H).alias("height"),
                n_frames.alias("n_frames"),
                F.octet_length(payload).cast("long").alias("n_bytes"),
            ),
        }
    )


def decoded_gif_stats(df: DataFrame, payload_col: str = "media") -> DataFrame:
    """REAL LZW decode path: run ``decode_gif`` on each payload inside
    one Arrow-batched mapInPandas pass and emit integer-exact raster
    statistics over the full frame stack. Pass-through columns are
    preserved; the payload column is pruned."""
    from big_data_pipeline_spark.multimodal.gif import decode_gif

    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        [
            *keep,
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("sum_pixels", T.LongType()),
            T.StructField("n_zero", T.LongType()),
            T.StructField("px_min", T.IntegerType()),
            T.StructField("px_max", T.IntegerType()),
            T.StructField("mean_pixel", T.DoubleType()),
        ]
    )
    keep_names = [f.name for f in keep]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                w, h, frames = decode_gif(bytes(payload))
                flat = np.concatenate(
                    [f.reshape(-1) for f in frames]
                ).astype(np.int64)
                rows.append(
                    (
                        w,
                        h,
                        len(frames),
                        int(flat.sum()),
                        int((flat == 0).sum()),
                        int(flat.min()),
                        int(flat.max()),
                        float(flat.sum()) / len(flat),
                    )
                )
            stats = pd.DataFrame(
                rows,
                columns=[
                    "width",
                    "height",
                    "n_frames",
                    "sum_pixels",
                    "n_zero",
                    "px_min",
                    "px_max",
                    "mean_pixel",
                ],
                index=pdf.index,
            )
            yield pd.concat([pdf[keep_names], stats], axis=1)

    return df.mapInPandas(extract, schema=out_schema)


def decode_image(payload: bytes):
    """Decode an image payload to a numpy array. Netpbm (P5/P6), PNG
    (8-bit gray/RGB/RGBA), baseline JPEG, and GIF (first frame) decode
    natively with no dependencies; other formats fall back to a gated
    PIL import (not present in this environment)."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)[4]
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)[3]
    if payload[:2] == b"\xff\xd8":
        from big_data_pipeline_spark.multimodal.jpeg import (
            decode_jpeg_baseline,
        )

        return decode_jpeg_baseline(payload)[3]
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from big_data_pipeline_spark.multimodal.gif import decode_gif

        return decode_gif(payload)[2][0]
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


def resize_netpbm(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL image resize: decode a netpbm payload, nearest-neighbor
    resample to ``out_w`` x ``out_h`` (source index = floor(i*src/dst),
    the standard NN convention), re-encode as the same netpbm format.
    Pure numpy fancy-indexing — no codec libraries."""
    fmt, w, h, maxval, px = decode_netpbm(payload)
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    out = px[rows][:, cols]
    header = f"{fmt}\n{out_w} {out_h}\n{maxval}\n".encode()
    return header + out.tobytes()


def resize_image(
    df: DataFrame,
    payload_col: str = "media",
    out_w: int = 8,
    out_h: int = 4,
) -> DataFrame:
    """Resize every image payload to ``out_w`` x ``out_h`` via the real
    netpbm decode → nearest-neighbor → re-encode path (compressed codecs
    would need external libraries and raise inside ``decode_netpbm``).
    Same Arrow-batched mapInPandas plumbing as the other media ops; the
    payload column is replaced in place."""
    out_schema = df.schema

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                resize_netpbm(bytes(p), out_w, out_h) for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(resize, schema=out_schema)


def image_ahash(
    df: DataFrame, payload_col: str = "media", grid: int = 8
) -> DataFrame:
    """Perceptual average-hash over REAL decoded images — the classic
    near-duplicate signature for image corpora (aHash: downsample to a
    ``grid``×``grid`` luminance grid, threshold each cell against the
    image mean, read the bits row-major). Everything is integer
    arithmetic — cell luminance is the channel SUM at the
    nearest-neighbor source pixel (floor(i·src/dst), the same rule as
    ``resize_netpbm``) and the threshold comparison is
    ``cells² · cell > total`` — so the bitstring is exactly
    reproducible by the hex-space SQL oracle. One narrow Arrow pass,
    no shuffle; the payload column prunes away immediately after.
    """
    in_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in in_cols]
        + [
            T.StructField("ahash", T.StringType()),
            T.StructField("n_bright", T.IntegerType()),
        ]
    )
    n_cells = grid * grid

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, brights = [], []
            for payload in pdf[payload_col]:
                _, w, h, _, px = decode_netpbm(bytes(payload))
                if px.ndim == 2:  # P5: treat gray as a single channel
                    px = px[:, :, None]
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = px[ys][:, xs].astype(np.int64).sum(axis=2)
                total = int(cells.sum())
                bits = (n_cells * cells > total).reshape(-1)
                hashes.append("".join("1" if b else "0" for b in bits))
                brights.append(int(bits.sum()))
            out = pdf[in_cols].copy()
            out["ahash"] = hashes
            out["n_bright"] = brights
            yield out

    return df.mapInPandas(extract, schema=out_schema)
