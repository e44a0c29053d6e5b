"""Multimodal pipeline stages: schema, one-to-one and one-to-many Arrow
batch shapes, stub determinism, and the NotImplementedError boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_omnata_push_spark.engine.catalog import load_table
from dbt_omnata_push_spark.llmops.multimodal import (
    documents_as_media,
    extract_features,
    resize_media,
    sample_frames,
)


def _media(spark, sf_dir):
    return documents_as_media(
        load_table(spark, sf_dir, "documents").limit(50)
    )


def test_resize_shapes_and_determinism(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = resize_media(media, width=16, height=8)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["n_bytes"] == 16 * 8 for r in rows)
    assert all(len(r["payload"]) == 16 * 8 for r in rows)
    again = {r["media_id"]: bytes(r["payload"]) for r in out.collect()}
    assert all(bytes(r["payload"]) == again[r["media_id"]] for r in rows)


def test_sample_frames_one_to_many(spark, sf_dir):
    media = _media(spark, sf_dir)
    out = sample_frames(media, n_frames=4)
    assert out.count() == 50 * 4
    per = out.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]
    idx = out.select("frame_idx").distinct().collect()
    assert sorted(r["frame_idx"] for r in idx) == [0, 1, 2, 3]


def test_unstubbed_decode_raises_at_stage_boundary(spark, sf_dir):
    media = _media(spark, sf_dir)
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        resize_media(media, 4, 4, decode_stub=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_frames(media, decode_stub=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        extract_features(media, decode_stub=False).collect()
