"""Multimodal plumbing tests: binary columns in/out of Arrow batches,
deterministic stub decoders, explode shapes, schema contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from appengine_mapreduce_spark.operators.multimodal import (
    decode_image_features,
    embed_media_table,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [(i, bytes([i % 251]) * (100 + i)) for i in range(50)]
    return spark.createDataFrame(rows, "id bigint, content binary")


def test_embed_media_table_schema(spark, media_df):
    out = embed_media_table(media_df)
    meta_type = dict(out.dtypes)["media_meta"]
    assert "media_type" in meta_type and "sample_rate" in meta_type
    assert out.filter(F.col("media_meta.media_type") == "image").count() == 50


def test_decode_image_features(spark, media_df):
    out = decode_image_features(media_df).collect()
    assert len(out) == 50
    byid = {r.id: r for r in out}
    for r in out:
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)
    # deterministic: same content → same features
    again = {r.id: r for r in decode_image_features(media_df).collect()}
    assert all(byid[i].features == again[i].features for i in byid)


def test_resize_images(spark, media_df):
    out = resize_images(media_df, 224, 224).collect()
    assert len(out) == 50
    assert all(r.width == 224 and r.height == 224 for r in out)
    assert all(len(bytes(r.content)) == 18 for r in out)  # 16B digest + w + h


def test_sample_video_frames(spark):
    rows = [(1, b"videoblob-a", 3500), (2, b"videoblob-b", 999), (3, b"x", 0)]
    df = spark.createDataFrame(rows, "id bigint, content binary, duration_ms bigint")
    out = sample_video_frames(df, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r.frame_ts_ms)
    assert sorted(by_id[1]) == [0, 1000, 2000, 3000]
    assert by_id[2] == [0]
    assert 3 not in by_id  # zero-duration → no frames
    frames = {bytes(r.frame) for r in out}
    assert len(frames) == len(out)  # every (blob, ts) frame distinct
