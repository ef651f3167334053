"""Multimodal plumbing: mapInPandas schema/batching with the fake decoder,
and the NotImplementedError gate for real codecs."""

from __future__ import annotations

import pytest

from serialization_agents_spark.operators.multimodal import (
    decode_image_batches,
    extract_image_features,
    synth_media,
)


def test_image_feature_extraction_schema_and_determinism(spark):
    media = synth_media(spark, n=60)
    out = extract_image_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    # only image rows (id % 3 != 0) survive the kind filter
    assert set(rows) == {i for i in range(60) if i % 3 != 0}
    r = rows[1]
    assert r["decode_ok"] and r["channels"] == 3
    assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
    assert len(r["feature"]) == 8
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert rows2[1]["feature"] == r["feature"]


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_batches(fake=False)
