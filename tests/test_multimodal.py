"""Multimodal plumbing: mapInPandas schema/batching with the fake decoder,
and the NotImplementedError gate for real codecs."""

from __future__ import annotations

import pytest

from serialization_agents_spark.operators.multimodal import (
    decode_image_batches,
    extract_audio_features,
    extract_image_features,
    resize_images,
    sample_video_frames,
    synth_media,
)


def test_image_feature_extraction_schema_and_determinism(spark):
    media = synth_media(spark, n=60)
    out = extract_image_features(media, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    # only image rows (not audio id%3==0, not video id%7==1) survive
    assert set(rows) == {
        i for i in range(60) if i % 3 != 0 and i % 7 != 1
    }
    r = rows[2]
    assert r["decode_ok"] and r["channels"] == 3
    assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
    assert len(r["feature"]) == 8
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in extract_image_features(media, fake=True).collect()}
    assert rows2[2]["feature"] == r["feature"]


def test_real_decode_is_explicitly_stubbed():
    """Without codecs, fake=False must fail loudly at plan time (never
    silently emit fake features). With PIL present the image paths light
    up instead — covered by test_real_image_decode_with_pil."""
    from serialization_agents_spark.operators import multimodal as M

    if not M._HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image_batches(fake=False)
        with pytest.raises(NotImplementedError):
            resize_images(None, fake=False)
    if not M._HAVE_SOUNDFILE:
        with pytest.raises(NotImplementedError):
            extract_audio_features(None, fake=False)
    # video codecs (ffmpeg) have no probe target here
    with pytest.raises(NotImplementedError):
        sample_video_frames(None, fake=False)


def test_real_image_decode_with_pil(spark, tmp_path):
    """Opportunistic real-codec path (VERDICT round-3 #8): when the
    import probe finds PIL, fake=False decodes real bytes with the same
    schema/batching; skipped in codec-less sandboxes."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io as _io

    from pyspark.sql import functions as F

    img = PIL_Image.new("RGB", (20, 10), color=(255, 0, 0))
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    png = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(b"not an image"))],
        "media_id long, kind string, content binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    rows = {r["media_id"]: r for r in
            extract_image_features(media, fake=False).collect()}
    assert rows[1]["decode_ok"] and (rows[1]["width"], rows[1]["height"]) == (20, 10)
    assert rows[1]["feature"] == pytest.approx([1 / 3] * 8, abs=0.02)
    assert not rows[2]["decode_ok"]  # garbage degrades, never crashes

    resized = {r["media_id"]: r for r in
               resize_images(media, width=4, height=4, fake=False).collect()}
    assert len(bytes(resized[1]["content"])) == 4 * 4 * 3
    assert resized[2]["content"] is None


def test_real_audio_decode_with_soundfile(spark):
    """Opportunistic real-codec path (VERDICT round-4 #8, mirroring the
    PIL image probe): when the import probe finds soundfile, fake=False
    decodes real WAV bytes with the same schema/batching; skipped in
    codec-less sandboxes."""
    sf_mod = pytest.importorskip("soundfile")
    import io as _io

    import numpy as np
    from pyspark.sql import functions as F

    sr = 8000
    t = np.arange(sr) / sr  # 1 second of 440 Hz sine
    buf = _io.BytesIO()
    sf_mod.write(buf, 0.5 * np.sin(2 * np.pi * 440 * t), sr, format="WAV")
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "audio", bytearray(b"not audio"))],
        "media_id long, kind string, content binary",
    ).withColumn(
        "meta",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(sr).alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ),
    )
    rows = {r["media_id"]: r for r in
            extract_audio_features(media, fake=False).collect()}
    assert rows[1]["decode_ok"] and rows[1]["duration_ms"] == 1000
    # mean |sin| of a full-cycle segment ~= 0.5 * 2/pi
    assert rows[1]["feature"] == pytest.approx([0.5 * 2 / np.pi] * 8, abs=0.01)
    assert not rows[2]["decode_ok"]  # garbage degrades, never crashes


def test_audio_features_kind_filter_and_meta_carry(spark):
    media = synth_media(spark, n=42)
    rows = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert set(rows) == {i for i in range(42) if i % 3 == 0}
    r = rows[0]
    assert r["decode_ok"] and r["sample_rate"] == 16000
    assert 500 <= r["duration_ms"] <= 60_500 and len(r["feature"]) == 8


def test_frame_sampling_fanout_is_bounded_and_deterministic(spark):
    media = synth_media(spark, n=50)
    frames = sample_video_frames(media, every_ms=1000, max_frames=16)
    rows = frames.collect()
    vids = {i for i in range(50) if i % 3 != 0 and i % 7 == 1}
    assert {r["media_id"] for r in rows} == vids
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["ts_ms"]))
        assert len(r["frame"]) == 16  # md5 payload per frame
    for mid, fs in per.items():
        assert 1 <= len(fs) <= 16
        assert sorted(fs) == [(i, i * 1000) for i in range(len(fs))]
    # deterministic re-run
    again = sorted((r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in frames.collect())
    first = sorted((r["media_id"], r["frame_idx"], bytes(r["frame"])) for r in rows)
    assert again == first


def test_resize_payload_shape(spark):
    media = synth_media(spark, n=20)
    out = resize_images(media, width=32, height=8).collect()
    assert all(len(r["content"]) == 32 * 8 for r in out)
    assert all(r["width"] == 32 and r["height"] == 8 for r in out)
