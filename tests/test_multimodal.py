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


def _png_bytes(width: int, height: int) -> bytes:
    """A complete, valid PNG (8-bit RGB, zlib-compressed zero pixels)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif_bytes(width: int, height: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def _bmp_bytes(width: int, height: int) -> bytes:
    import struct

    info = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24
    return b"BM" + b"\x00" * 12 + info


def _jpeg_bytes(width: int, height: int) -> bytes:
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 3)
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_real_header_decode_true_dimensions(spark):
    """PNG/GIF/BMP/JPEG container headers are parsed for REAL — the
    decode stage returns the true dimensions, channels, and mime."""
    raw = spark.createDataFrame(
        [
            (1, bytearray(_png_bytes(320, 200))),
            (2, bytearray(_gif_bytes(101, 57))),
            (3, bytearray(_bmp_bytes(640, 480))),
            (4, bytearray(_jpeg_bytes(1920, 1080))),
        ],
        ["id", "blob"],
    )
    media = M.attach_metadata(raw, "id", "blob", "image")
    mimes = {r["media_id"]: r["meta"]["mime"] for r in media.collect()}
    assert mimes == {
        1: "image/png", 2: "image/gif", 3: "image/bmp", 4: "image/jpeg",
    }
    feats = {r["media_id"]: r for r in M.decode_images(media).collect()}
    assert (feats[1]["width"], feats[1]["height"], feats[1]["channels"]) == (320, 200, 3)
    assert (feats[2]["width"], feats[2]["height"]) == (101, 57)
    assert (feats[3]["width"], feats[3]["height"], feats[3]["channels"]) == (640, 480, 3)
    assert (feats[4]["width"], feats[4]["height"], feats[4]["channels"]) == (1920, 1080, 3)


def test_parse_image_header_rejects_unknown():
    assert M.parse_image_header(b"not an image, just text bytes") is None
    assert M.parse_image_header(None) is None
    assert M.parse_image_header(b"\x89PNG") is None  # truncated


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
