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


def test_decoder_stubs_raise_not_implemented(docs):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        resize_image(docs)
