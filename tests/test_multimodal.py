"""Multimodal binary-column operators: plumbing, schemas, stub gating."""

import pytest
from pyspark.sql import functions as F

from entitymatchingmodel_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytearray(b"\xff\xd8\xff\xe0" + b"j" * 100)),  # jpeg magic
        (2, bytearray(b"\x89PNG\r\n" + b"p" * 200)),       # png magic
        (3, bytearray(b"plain text payload " * 20)),
        (4, None),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_media_metadata_formats(media):
    out = {r["id"]: r.asDict() for r in MM.media_metadata(media, "id", "payload").collect()}
    assert out[1]["format"] == "jpeg"
    assert out[2]["format"] == "png"
    assert out[3]["format"] == "unknown"
    assert out[1]["n_bytes"] == 104
    assert out[4]["n_bytes"] is None


def test_image_features_deterministic_shape(media):
    out = MM.image_features(media, "id", "payload").collect()
    by_id = {r["id"]: r["feat"] for r in out}
    assert len(by_id) == 4
    assert by_id[4] is None
    for i in (1, 2, 3):
        feat = by_id[i]
        assert len(feat) == 16
        assert abs(sum(feat) - 1.0) < 1e-9  # L1-normalized histogram
    # determinism: re-run yields identical vectors
    again = {r["id"]: r["feat"] for r in MM.image_features(media, "id", "payload").collect()}
    assert again == by_id


def test_resize_images_fallback_sizes(media):
    out = {r["id"]: r.asDict() for r in MM.resize_images(media, "id", "payload", 8, 4).collect()}
    for i in (1, 2, 3):
        assert len(out[i]["resized"]) == 8 * 4
        assert out[i]["width"] == 8 and out[i]["height"] == 4
    assert out[4]["resized"] is None


def test_sample_frames_chunking(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 4)),  # 1024 bytes -> 4 chunks of 256
         (2, bytearray(b"x" * 100)),             # < frame -> 1 partial chunk
         (3, None)],
        "id long, payload binary",
    )
    out = MM.sample_frames(df, "id", "payload", frame_bytes=256, every_n=2, max_frames=8).collect()
    rows = sorted([(r["id"], r["frame_idx"], len(r["frame"])) for r in out])
    assert rows == [(1, 0, 256), (1, 2, 256), (2, 0, 100)]
    # frame content is the right slice
    first = next(r for r in out if r["id"] == 1 and r["frame_idx"] == 0)
    assert bytes(first["frame"]) == bytes(range(256))


def test_audio_stats_int8_interpretation(spark):
    df = spark.createDataFrame([(1, bytearray([0, 10, 246]))], "id long, payload binary")
    row = MM.audio_stats(df, "id", "payload").collect()[0]
    # 246 as int8 is -10 -> abs 10
    assert row["n_samples"] == 3
    assert row["max_amp"] == 10.0
    assert abs(row["mean_amp"] - 20.0 / 3) < 1e-12


def test_strict_mode_raises_clearly(media):
    with pytest.raises(NotImplementedError, match="STUB"):
        MM.sample_frames(media, "id", "payload", strict=True)
    if not MM._HAVE_PIL:
        with pytest.raises(NotImplementedError, match="STUB"):
            MM.image_features(media, "id", "payload", strict=True)
        with pytest.raises(NotImplementedError, match="STUB"):
            MM.resize_images(media, "id", "payload", 8, 8, strict=True)


def test_multimodal_null_and_empty_binary_pinned(spark):
    """NULL/empty binary payloads: metadata + feature + audio ops keep one
    row per input with NULL propagation; sample_frames (a per-frame
    explode) yields NO rows for NULL media — the explode contract, same as
    an inner range join. Pinned so a nullable media corpus can't crash or
    silently change shape."""
    from pyspark.sql import functions as F

    from entitymatchingmodel_spark.operators.multimodal import (
        audio_stats,
        image_features,
        media_metadata,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\nrest")), (2, None), (3, bytearray(b""))],
        "media_id long, data binary",
    )
    meta = {r["id"]: r for r in media_metadata(df, "media_id", "data").collect()}
    assert set(meta) == {1, 2, 3}
    assert meta[2]["n_bytes"] is None and meta[2]["content_md5"] is None
    assert meta[3]["n_bytes"] == 0
    feats = {r["id"]: r["feat"] for r in image_features(df, "media_id", "data").collect()}
    assert set(feats) == {1, 2, 3} and feats[2] is None and feats[3] is not None
    audio = {r["id"]: r for r in audio_stats(df, "media_id", "data").collect()}
    assert set(audio) == {1, 2, 3}
    assert audio[2]["n_samples"] is None and audio[3]["n_samples"] == 0
    frames = sample_frames(df, "media_id", "data").collect()
    assert {r["id"] for r in frames} == {1, 3}, "NULL media has no frames"
