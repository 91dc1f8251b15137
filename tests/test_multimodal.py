"""Multimodal plumbing: fake media, feature extraction, frame sampling,
decoder stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_pipeline_spark.multimodal import (
    attach_fake_media,
    byte_histogram_features,
    decode_image,
    frame_sample,
    resize_image,
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "a" * 300)], ["doc_id", "text"]
    )


def test_attach_fake_media_schema_and_meta(docs):
    out = attach_fake_media(docs)
    row = out.filter("doc_id = 1").first()
    assert bytes(row["media"]) == b"hello world"
    assert row["media_meta"]["n_bytes"] == 11
    assert row["media_meta"]["media_type"] == "image"


def test_byte_histogram_features_sum_to_one(docs):
    feats = byte_histogram_features(attach_fake_media(docs).select("doc_id", "media"))
    pdf = feats.toPandas().set_index("doc_id")
    for _, row in pdf.iterrows():
        v = np.array(row["features"])
        assert len(v) == 16
        assert abs(v.sum() - 1.0) < 1e-12
    # 'aaaa...' is a single byte value → one bin holds all mass
    assert max(pdf.loc[2, "features"]) == 1.0


def test_frame_sample_shapes(docs):
    frames = frame_sample(
        attach_fake_media(docs).select("doc_id", "media"), frame_bytes=64, stride=4
    ).toPandas()
    # doc 2: 300 bytes → 4 full frames → indices 0 (stride 4 keeps 0th)
    d2 = frames[frames["doc_id"] == 2]
    assert list(d2["frame_idx"]) == [0]
    assert len(bytes(d2["frame"].iloc[0])) == 64
    # doc 1: 11 bytes → 1 frame, the full payload
    d1 = frames[frames["doc_id"] == 1]
    assert len(bytes(d1["frame"].iloc[0])) == 11


def test_decoder_gates_compressed_codecs_only(docs):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        resize_image(docs)


def test_decode_netpbm_p6_with_comments():
    from big_data_pipeline_spark.multimodal import decode_netpbm

    raster = bytes(range(2 * 2 * 3))
    payload = b"P6\n# a comment\n2 # trailing\n2\n255\n" + raster
    fmt, w, h, mv, px = decode_netpbm(payload)
    assert (fmt, w, h, mv) == ("P6", 2, 2, 255)
    assert px.shape == (2, 2, 3)
    assert px.tobytes() == raster


def test_decode_netpbm_p5_grayscale():
    from big_data_pipeline_spark.multimodal import decode_netpbm

    payload = b"P5 3 2 15\n" + bytes([0, 1, 2, 3, 4, 5])
    fmt, w, h, mv, px = decode_netpbm(payload)
    assert (fmt, w, h, mv) == ("P5", 3, 2, 15)
    assert px.shape == (2, 3)
    assert px[1, 2] == 5


def test_decode_netpbm_rejects_bad_input():
    from big_data_pipeline_spark.multimodal import decode_netpbm

    with pytest.raises(ValueError, match="magic"):
        decode_netpbm(b"P3\n1 1\n255\n1 2 3")  # ASCII variant unsupported
    with pytest.raises(ValueError, match="maxval"):
        decode_netpbm(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(ValueError):  # truncated raster
        decode_netpbm(b"P6\n4 4\n255\n" + bytes(5))


def test_attach_ppm_media_roundtrips_through_decoder(docs):
    from big_data_pipeline_spark.multimodal import attach_ppm_media, decode_netpbm

    rows = {
        r["doc_id"]: r
        for r in attach_ppm_media(docs).select("doc_id", "text", "media").collect()
    }
    for doc_id, r in rows.items():
        fmt, w, h, mv, px = decode_netpbm(bytes(r["media"]))
        raw = r["text"].encode()
        assert (fmt, w, mv) == ("P6", 16, 255)
        assert h == max(1, -(-len(raw) // 48))
        # raster = text bytes zero-padded to h*48
        assert px.reshape(-1).tobytes() == raw + bytes(h * 48 - len(raw))


def test_decoded_pixel_features_from_real_bytes(docs):
    from big_data_pipeline_spark.multimodal import (
        attach_ppm_media,
        decoded_pixel_features,
    )

    feats = decoded_pixel_features(
        attach_ppm_media(docs).select("doc_id", "media")
    ).toPandas().set_index("doc_id")
    # doc 2: 300 'a' bytes (0x61, nibble 6) + 36 pad zeros in 7 rows
    r = feats.loc[2]
    assert (r["width"], r["height"], r["maxval"]) == (16, 7, 255)
    v = np.array(r["features"])
    assert abs(v[6] - 300 / 336) < 1e-15
    assert abs(v[0] - 36 / 336) < 1e-15
    assert abs(v.sum() - 1.0) < 1e-12
