import pytest
from pyspark.sql import functions as F

from sparkall_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    raw = spark.createDataFrame(
        [
            (1, bytearray(b"\x89PNG fake image bytes 1")),
            (2, bytearray(b"\x89PNG fake image bytes 22")),
            (3, None),
        ],
        ["id", "blob"],
    )
    return M.attach_metadata(raw, "id", "blob", "image")


def test_attach_metadata_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    rows = {r["media_id"]: r for r in media.collect()}
    assert rows[1]["meta"]["modality"] == "image"
    assert rows[1]["meta"]["n_bytes"] == 23
    assert rows[3]["meta"]["n_bytes"] is None


def test_decode_images_deterministic_and_null_safe(media):
    out = M.decode_images(media)
    assert out.schema == M.IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] >= 64 and rows[1]["channels"] == 3
    # same payload -> same features (deterministic fake)
    again = {r["media_id"]: r for r in M.decode_images(media).collect()}
    assert rows[1]["phash"] == again[1]["phash"]
    # null payload -> null features, job survives
    assert rows[3]["width"] is None


def test_resize_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        M.resize_images(media, 224, 224)


def test_video_frame_sampling_plumbing(media):
    frames = M.sample_video_frames(media)
    rows = frames.collect()
    assert {f.name for f in frames.schema.fields} == {
        "media_id",
        "frame_idx",
        "frame_ref",
    }
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2, 3}
    assert all(r["frame_ref"].startswith("fake://") for r in rows)
