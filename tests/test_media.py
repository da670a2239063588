"""Multimodal media plumbing tests: synth table, Arrow-batched decode
features (fake kernel), resize math, frame-sample plan, and the
real-codec gate raising NotImplementedError without PIL present."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.sources.media import (
    MEDIA_FEATURES_SCHEMA,
    decode_features,
    frame_sample_plan,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    pairs = spark.createDataFrame(
        [(f"doc{i}", f"images/0_{j}.jpg") for i in range(20) for j in range(2)],
        "doc_id string, media_ref string",
    )
    return synth_media(spark, pairs).cache()


def test_synth_media_deterministic(spark, media):
    a = sorted((r["doc_id"], r["media_ref"], bytes(r["data"])) for r in media.collect())
    b = sorted((r["doc_id"], r["media_ref"], bytes(r["data"])) for r in media.collect())
    assert a == b
    assert all(len(x[2]) == 64 for x in a)  # 4x md5-hex unhexed


def test_decode_features_schema_and_values(spark, media):
    feats = decode_features(media)
    assert feats.schema == MEDIA_FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 40
    for r in rows:
        assert r["decode_ok"] == "ok"
        assert r["n_bytes"] == 64
        assert 0 <= r["mean_byte"] <= 255
        # aspect-preserving thumbnail: max dim <= 128, ratio preserved
        assert max(r["thumb_w"], r["thumb_h"]) <= 128
        if max(r["width"], r["height"]) > 128:
            assert max(r["thumb_w"], r["thumb_h"]) == 128 or (
                abs(max(r["thumb_w"], r["thumb_h"]) - 128) <= 1
            )


def test_decode_features_null_dims_survive(spark, media):
    """MEDIA_TABLE_SCHEMA permits NULL width/height (real-world metadata
    can be undecodable); the pandas batch must emit NULL thumb dims for
    those rows, not kill the task with a non-finite astype (review r4)."""
    nulled = media.withColumn(
        "width",
        F.when(F.col("media_ref") == "images/0_0.jpg", None).otherwise(
            F.col("width")
        ),
    )
    rows = decode_features(nulled).collect()
    assert len(rows) == 40
    for r in rows:
        if r["width"] is None:
            # unknown width -> NULL thumb_w; thumb_h still scales off the
            # known height (pandas max skips NaN)
            assert r["thumb_w"] is None and r["thumb_h"] is not None
        else:
            assert r["thumb_w"] is not None
        assert r["decode_ok"] == "ok"  # decode is independent of dims


def test_frame_sample_plan_video_only(spark, media):
    plan = frame_sample_plan(media, every_n_sec=2)
    rows = plan.collect()
    n_video = media.filter(F.col("mime") == "video/mp4").count()
    assert len(rows) == n_video and n_video > 0
    for r in rows:
        ts = r["frame_ts"]
        assert ts[0] == 0 and all(b - a == 2 for a, b in zip(ts, ts[1:]))


def test_real_codec_gate_raises(spark, media):
    from deepseek_ocr_spark.sources.media import _decode_real

    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00" * 8)
