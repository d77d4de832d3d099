"""Multimodal binary-column plumbing: schemas, Arrow batch shape, stubbed
codec determinism, resize/frame-sample stages."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_rags_spark.multimodal.codecs import (
    attach_fake_image_payload,
    decode_payload,
    frame_sample,
    image_features,
    resize_images,
)


@pytest.fixture(scope="module")
def images(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    return attach_fake_image_payload(docs)


def test_payload_schema(images):
    assert dict(images.dtypes)["payload"] == "binary"
    assert "width" in images.schema["meta"].dataType.fieldNames()


def test_decode_stub_is_deterministic_and_marked():
    img = decode_payload(b"hello world bytes", 4, 4)
    assert img.shape == (4, 4) and img.dtype == np.uint8
    assert (img == decode_payload(b"hello world bytes", 4, 4)).all()
    with pytest.raises(NotImplementedError, match="stubbed"):
        decode_payload(b"...", 2, 2, fmt="image/png")


def test_image_features_batch(images):
    feats = image_features(images)
    rows = feats.collect()
    assert len(rows) == 50
    r = rows[0]
    assert r["n_bytes"] > 0 and 0 <= r["mean_byte"] <= 255 and r["std_byte"] >= 0
    # deterministic across runs
    again = {x["doc_id"]: x["mean_byte"] for x in image_features(images).collect()}
    assert again[r["doc_id"]] == r["mean_byte"]


def test_resize_produces_fixed_dims(spark, images):
    resized = resize_images(images, 8, 6)
    rows = resized.collect()
    assert all(len(bytes(r["payload"])) == 8 * 6 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 6 for r in rows)
    # resized payloads decode through the same stub
    feats = image_features(resized).collect()
    assert all(f["width"] == 8 for f in feats)


def test_frame_sample_keeps_every_kth(images):
    frames = frame_sample(images, every_k=4, frame_bytes=16)
    per_doc = {}
    for r in frames.collect():
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
        assert len(bytes(r["frame_payload"])) <= 16
    assert per_doc, "no frames sampled"
    for frames_list in per_doc.values():
        assert all(f % 4 == 0 for f in frames_list)

def test_audio_features_and_stub_contract(spark, sf_smoke):
    import math

    import numpy as np
    import pytest

    from bigdata_rags_spark.io.readers import read_testdata
    from bigdata_rags_spark.multimodal.codecs import (
        attach_fake_audio_payload,
        audio_features,
        decode_audio,
    )

    docs = read_testdata(spark, sf_smoke, "documents")["documents"].limit(20)
    clips = attach_fake_audio_payload(docs)
    feats = {r["doc_id"]: r for r in audio_features(clips, window=8).collect()}
    assert len(feats) == 20
    for r in feats.values():
        assert 0.0 <= r["rms"] <= 1.0 and 0.0 <= r["peak"] <= 1.0
        assert 0.0 <= r["zero_cross_rate"] <= 1.0
        assert r["n_windows"] == math.ceil(r["n_samples"] / 8)
        assert r["sample_rate"] == 16_000
    # the decode stub: known PCM round-trips exactly; real codecs raise
    pcm = np.array([0, 16384, -16384, 32767], dtype="<i2").tobytes()
    x = decode_audio(pcm)
    assert np.allclose(x, [0.0, 0.5, -0.5, 32767 / 32768])
    with pytest.raises(NotImplementedError):
        decode_audio(b"\x00\x00", codec="audio/mp3")
