"""Property-based tests (hypothesis) for the order-sensitive operators.

These complement the fixture-based tests with adversarial shapes:
duplicate order keys across shard boundaries, all-equal values, empty
partitions, single-row groups.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.operators.prefix import sharded_running_sum

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group (few, forces ties)
        st.integers(min_value=0, max_value=50),  # order key (dups likely)
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_rows)
def test_sharded_running_sum_property(spark, rows):
    # make (g, k) unique: running sums need a total order
    uniq = {}
    for g, k, v in rows:
        uniq[(g, k)] = v
    data = [(g, k, v) for (g, k), v in uniq.items()]
    df = spark.createDataFrame(data, "g int, k int, v int")
    w = (
        Window.partitionBy("g")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        (r.g, r.k, r.cum)
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    )
    for shards in (1, 3, 7):
        got = sorted(
            (r.g, r.k, r.cum)
            for r in sharded_running_sum(
                df, ["g"], "k", "v", "cum", shards=shards
            ).collect()
        )
        assert got == want, shards


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.integers(min_value=0, max_value=40),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=30),
)
def test_greedy_binpack_invariants_property(spark, sizes, budget):
    """Greedy no-split packing: replay the sweep in plain Python and
    demand identical pack assignment from the Spark implementation."""
    import pandas as pd

    from big_data_pipeline_spark.workloads import llm_pipeline as lp

    data = [(i, "g", n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens int")

    # reference sweep
    want, pid, used = {}, 0, 0
    for i, n in enumerate(sizes):
        if used > 0 and used + n > budget:
            pid += 1
            used = 0
        want.setdefault(pid, []).append((i, n))
        used += n

    def pack_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        ids, p, u = [], 0, 0
        for n in pdf["n_tokens"]:
            if u > 0 and u + n > budget:
                p += 1
                u = 0
            ids.append(p)
            u += n
        pdf["pack_id"] = ids
        return pdf

    got_rows = (
        df.groupBy("lang")
        .applyInPandas(
            pack_group, schema="doc_id long, lang string, n_tokens int, pack_id long"
        )
        .collect()
    )
    got = {}
    for r in got_rows:
        got.setdefault(r.pack_id, []).append((r.doc_id, r.n_tokens))
    got = {p: sorted(v) for p, v in got.items()}
    want = {p: sorted(v) for p, v in want.items()}
    assert got == want
    # capacity invariant: a multi-doc pack whose docs each fit the
    # budget fits in total. (An oversize doc may legitimately share a
    # pack: it enters at used == 0 — e.g. after a zero-size doc.)
    for p, docs in got.items():
        sizes_p = [n for _, n in docs]
        if len(sizes_p) > 1 and max(sizes_p) <= budget:
            assert sum(sizes_p) <= budget


# --- pure-Python codec properties (no Spark session needed) -----------------

_px_bytes = st.binary(min_size=0, max_size=4 * 4 * 3)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    raw=st.binary(min_size=0, max_size=108),
    ow=st.integers(min_value=1, max_value=9),
    oh=st.integers(min_value=1, max_value=9),
)
def test_resize_netpbm_properties(w, h, raw, ow, oh):
    from big_data_pipeline_spark.multimodal import decode_netpbm, resize_netpbm

    n = w * h * 3
    raster = (raw + bytes(n))[:n]
    payload = b"P6\n%d %d\n255\n" % (w, h) + raster
    out = resize_netpbm(payload, ow, oh)
    fmt, rw, rh, mv, px = decode_netpbm(out)
    assert (fmt, rw, rh, mv) == ("P6", ow, oh, 255)
    # every output pixel is some input pixel (NN never invents values)
    src = decode_netpbm(payload)[4]
    for r in range(oh):
        for c in range(ow):
            assert tuple(px[r][c]) == tuple(src[(r * h) // oh][(c * w) // ow])
    # identity resize is byte-exact
    assert decode_netpbm(resize_netpbm(payload, w, h))[4].tobytes() == raster


@settings(max_examples=50, deadline=None)
@given(data=st.binary(min_size=0, max_size=200))
def test_wav_encode_decode_roundtrip_property(data):
    import struct

    from big_data_pipeline_spark.multimodal import decode_wav

    # same canonical 44-byte header attach_wav_media builds JVM-side
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(data))
    )
    ch, rate, bits, s = decode_wav(hdr + data)
    assert (ch, rate, bits) == (1, 8000, 8)
    assert s.tobytes() == data


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    qs=st.lists(
        st.floats(min_value=0.5, max_value=50.0,
                  allow_nan=False, allow_infinity=False),
        min_size=3, max_size=12,
    ),
)
def test_spearman_monotone_transform_invariant(spark, tmp_path_factory, qs):
    """rho(q, p) is invariant under any strictly increasing transform
    of p — the defining property of a rank statistic. Here p = q (rho
    would be 1) vs p = 3*q + 7: identical ranks, identical rho."""
    import pandas as pd

    from big_data_pipeline_spark.workloads.data_quality import (
        spearman_rank_corr,
    )

    qs = [round(v, 2) for v in qs]
    outs = []
    for transform in (lambda v: v, lambda v: 3.0 * v + 7.0):
        d = tmp_path_factory.mktemp("sp")
        pd.DataFrame(
            {
                "l_returnflag": ["A"] * len(qs),
                "l_quantity": qs,
                "l_extendedprice": [transform(v) for v in qs],
            }
        ).to_parquet(str(d / "lineitem.parquet"))
        [r] = spearman_rank_corr(spark, str(d)).collect()
        outs.append(r.spearman_rho)
    assert outs[0] == outs[1]  # bit-identical: ranks are equal integers


# --- round-5: PNG codec round-trip under adversarial shapes/filters ----------

_png_case = st.tuples(
    st.integers(min_value=1, max_value=9),  # height
    st.integers(min_value=1, max_value=12),  # width
    st.sampled_from([1, 3, 4]),  # channels (gray/RGB/RGBA)
    st.integers(min_value=0, max_value=2**32 - 1),  # pixel seed
    st.lists(
        st.integers(min_value=0, max_value=4), min_size=9, max_size=9
    ),  # per-row filter choices (first h used)
)


@settings(max_examples=50, deadline=None)
@given(_png_case)
def test_png_roundtrip_property(case):
    import numpy as np

    from big_data_pipeline_spark.multimodal import decode_png, encode_png

    h, w, ch, seed, fts = case
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = rng.integers(0, 256, shape, dtype=np.uint8)
    ww, hh, cc, out, seen = decode_png(encode_png(px, fts[:h]))
    assert (ww, hh, cc) == (w, h, ch)
    assert (out == px).all()
    assert seen == sorted(set(fts[:h]))


# --- round-5: ppjoin prefix+positional+size filters lose no pairs ------------

_corpus = st.lists(
    st.lists(
        st.sampled_from("abcdefgh"), min_size=3, max_size=12
    ).map(lambda toks: " ".join(toks)),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_corpus)
def test_ppjoin_equals_naive_join_property(spark, tmp_path_factory, texts):
    """Tiny random corpora with heavy shingle collisions (8-token
    alphabet): the filtered ppjoin output must equal the naive
    all-shared-shingles join exactly — completeness of the prefix,
    size, and positional filters under adversarial overlap."""
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.workloads.text import (
        jaccard_prefix_filter_pairs,
        shingle_jaccard_pairs,
    )

    tmp = tmp_path_factory.mktemp("ppjoin_prop")
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.mode(
        "overwrite"
    ).parquet(str(tmp / "documents.parquet"))
    naive = {
        (r.doc_id1, r.doc_id2): (r.n_common, r.jaccard)
        for r in shingle_jaccard_pairs(spark, str(tmp)).collect()
    }
    pref = {
        (r.doc_id1, r.doc_id2): (r.n_common, r.jaccard)
        for r in jaccard_prefix_filter_pairs(spark, str(tmp)).collect()
    }
    assert pref == naive


# --- baseline JPEG codec fuzz (round 6) -------------------------------------
# No Spark involvement: pure codec round-trips over adversarial shapes
# (1x1, extreme aspect ratios, non-multiple-of-8 dims, constant and
# saturated rasters) — the cases a fixture corpus never produces.

_jpeg_imgs = st.tuples(
    st.integers(min_value=1, max_value=40),  # height
    st.integers(min_value=1, max_value=40),  # width
    st.integers(min_value=0, max_value=2**31 - 1),  # value seed
)


@settings(max_examples=25, deadline=None)
@given(_jpeg_imgs)
def test_jpeg_unit_quant_roundtrip_property(dims):
    import numpy as np

    from big_data_pipeline_spark.multimodal.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    h, w, seed = dims
    rng = np.random.default_rng(seed)
    # mix structured and saturated content: gradients hit long zero
    # runs (ZRL/EOB paths), uniform noise hits dense AC blocks,
    # constants hit the DC-only path
    kind = seed % 3
    if kind == 0:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    elif kind == 1:
        img = np.fromfunction(
            lambda y, x: (4 * x + 7 * y) % 256, (h, w)
        ).astype(np.uint8)
    else:
        img = np.full((h, w), seed % 256, dtype=np.uint8)
    pay = encode_jpeg_baseline(img, quant=np.ones(64))
    dw, dh, ch, px = decode_jpeg_baseline(pay)
    assert (dw, dh, ch) == (w, h, 1)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 1


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=1, max_value=30),  # height
        st.integers(min_value=1, max_value=30),  # width
        st.integers(min_value=1, max_value=4),  # frames
        st.integers(min_value=0, max_value=2**31 - 1),  # seed
    )
)
def test_gif_lzw_roundtrip_property(dims):
    import numpy as np

    from big_data_pipeline_spark.multimodal.gif import decode_gif, encode_gif

    h, w, nf, seed = dims
    rng = np.random.default_rng(seed)
    kind = seed % 3
    if kind == 0:
        frames = [
            rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            for _ in range(nf)
        ]
    elif kind == 1:  # low-entropy: long LZW strings, many dict hits
        frames = [
            (np.indices((h, w)).sum(axis=0) % (2 + seed % 7)).astype(np.uint8)
            for _ in range(nf)
        ]
    else:
        frames = [np.full((h, w), (seed + i) % 256, np.uint8) for i in range(nf)]
    dw, dh, got = decode_gif(encode_gif(frames, interlace=bool(seed % 2)))
    assert (dw, dh, len(got)) == (w, h, nf)
    for a, b in zip(got, frames):
        assert (a == b).all()
