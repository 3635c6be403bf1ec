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


def _bmp_with_pixels(rgb_rows) -> bytes:
    """A real 24bpp BI_RGB BMP (bottom-up, 4-byte-aligned rows)."""
    import struct

    height = len(rgb_rows)
    width = len(rgb_rows[0])
    stride = (3 * width + 3) // 4 * 4
    px = bytearray()
    for row in reversed(rgb_rows):
        r = bytearray()
        for (R, G, B) in row:
            r += bytes([B, G, R])
        r += b"\x00" * (stride - len(r))
        px += r
    pix_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", pix_off + len(px), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 0, 0, 0, 0
    )
    return header + info + bytes(px)


def test_bmp_real_pixel_decode_true_mean_luma():
    """Uncompressed BMP pixels are decoded for REAL: mean_luma is the
    exact Rec.601 mean, not a hash-derived fake (r4)."""
    img = _bmp_with_pixels(
        [
            [(255, 255, 255), (0, 0, 0)],
            [(255, 0, 0), (0, 0, 255)],
        ]
    )
    feats = M._decode_one(img)
    assert (feats["width"], feats["height"]) == (2, 2)
    expected = (1.0 + 0.0 + 0.299 + 0.114) / 4
    assert abs(feats["mean_luma"] - expected) < 1e-6
    # deterministic and sensitive: flipping a pixel changes the value
    img2 = _bmp_with_pixels(
        [
            [(255, 255, 255), (255, 255, 255)],
            [(255, 0, 0), (0, 0, 255)],
        ]
    )
    assert M._decode_one(img2)["mean_luma"] > feats["mean_luma"]


def test_netpbm_real_pixel_decode():
    """Binary PGM/PPM decode for real; a left-to-right luma gradient
    makes every dHash difference bit 1 (signed all-ones == -1)."""
    vals = bytes([10, 20, 30, 40, 250, 240])
    pgm = b"P5\n# cmt\n3 2\n255\n" + vals
    feats = M._decode_one(pgm)
    assert (feats["width"], feats["height"], feats["channels"]) == (3, 2, 1)
    assert abs(feats["mean_luma"] - (sum(vals) / 6 / 255)) < 1e-6

    grad = bytes(bytearray(16 * x for x in range(16)) * 16)
    gradient_pgm = b"P5 16 16 255\n" + grad
    assert M.dhash64(M.decode_pixels(gradient_pgm)) == -1

    ppm = b"P6 2 1 255\n" + bytes([255, 0, 0, 0, 0, 255])
    feats = M._decode_one(ppm)
    assert (feats["width"], feats["height"], feats["channels"]) == (2, 1, 3)
    assert abs(feats["mean_luma"] - (0.299 + 0.114) / 2) < 1e-6


def test_real_pixels_flow_through_decode_images(spark):
    """End-to-end mapInPandas path: true pixel features for BMP/PPM rows
    alongside header-only fakes for compressed formats."""
    bmp = _bmp_with_pixels([[(255, 255, 255), (0, 0, 0)]])
    ppm = b"P6 1 1 255\n" + bytes([0, 255, 0])
    raw = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, bytearray(_png_bytes(8, 8)))],
        ["id", "blob"],
    )
    media = M.attach_metadata(raw, "id", "blob", "image")
    mimes = {r["media_id"]: r["meta"]["mime"] for r in media.collect()}
    assert mimes[2] == "image/x-portable-pixmap"
    feats = {r["media_id"]: r for r in M.decode_images(media).collect()}
    assert abs(feats[1]["mean_luma"] - 0.5) < 1e-6
    assert abs(feats[2]["mean_luma"] - 0.587) < 1e-6
    assert feats[3]["width"] == 8  # compressed: header real, luma fake


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


def _wav_bytes(rate: int, ch: int, bits: int, n_frames: int) -> bytes:
    import struct

    data = b"\x00" * (n_frames * ch * bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _flac_bytes(rate: int, ch: int, bits: int, total: int) -> bytes:
    info = bytearray(34)
    info[10] = (rate >> 12) & 0xFF
    info[11] = (rate >> 4) & 0xFF
    info[12] = ((rate & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
    info[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
    info[14:18] = (total & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + bytes(info)


def _ogg_bytes(rate: int, ch: int) -> bytes:
    import struct

    page = b"OggS" + b"\x00" * 22 + b"\x01\x1e"  # 1 segment, 30 bytes
    ident = (b"\x01vorbis" + struct.pack("<IB I", 0, ch, rate)
             + b"\x00" * 10)
    return page + ident


def _mp3_bytes(n_pad: int = 4000) -> bytes:
    # ID3v2 tag (10-byte syncsafe size) + one MPEG-1 Layer III frame
    # header: 128 kbit/s (index 9), 44100 Hz (index 0), joint stereo
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
    frame = bytes([0xFF, 0xFB, 0x90, 0x40])
    return id3 + frame + b"\x00" * n_pad


def test_parse_audio_header_real_values():
    wav = M.parse_audio_header(_wav_bytes(16000, 1, 16, 32000))
    assert wav["mime"] == "audio/wav"
    assert (wav["sample_rate"], wav["channels"], wav["bits_per_sample"]) == (
        16000, 1, 16)
    assert wav["duration_sec"] == pytest.approx(2.0)

    flac = M.parse_audio_header(_flac_bytes(44100, 2, 16, 441000))
    assert flac["mime"] == "audio/flac"
    assert (flac["sample_rate"], flac["channels"], flac["bits_per_sample"]) == (
        44100, 2, 16)
    assert flac["duration_sec"] == pytest.approx(10.0)

    ogg = M.parse_audio_header(_ogg_bytes(48000, 2))
    assert ogg["mime"] == "audio/ogg"
    assert (ogg["sample_rate"], ogg["channels"]) == (48000, 2)

    mp3 = M.parse_audio_header(_mp3_bytes())
    assert mp3["mime"] == "audio/mpeg"
    assert (mp3["sample_rate"], mp3["channels"]) == (44100, 2)
    assert mp3["duration_sec"] == pytest.approx(
        len(_mp3_bytes()) * 8 / 128000)

    assert M.parse_audio_header(b"definitely not audio bytes") is None
    assert M.parse_audio_header(None) is None


def test_decode_audio_mapinpandas(spark):
    raw = spark.createDataFrame(
        [
            (1, bytearray(_wav_bytes(8000, 2, 16, 8000))),
            (2, bytearray(_flac_bytes(22050, 1, 24, 22050))),
            (3, bytearray(_ogg_bytes(44100, 1))),
            (4, None),
            (5, bytearray(b"junk payload")),
        ],
        ["id", "blob"],
    )
    media = M.attach_metadata(raw, "id", "blob", "audio")
    mimes = {r["media_id"]: r["meta"]["mime"] for r in media.collect()}
    assert mimes[1] == "audio/wav" and mimes[2] == "audio/flac"
    assert mimes[3] == "audio/ogg" and mimes[5] == "audio/unknown"

    out = M.decode_audio(media)
    assert out.schema == M.AUDIO_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["sample_rate"] == 8000 and rows[1]["channels"] == 2
    assert rows[1]["duration_sec"] == pytest.approx(1.0)
    assert rows[2]["bits_per_sample"] == 24
    assert rows[3]["sample_rate"] == 44100
    assert rows[4]["mime"] is None  # null payload -> null row
    assert rows[5]["mime"] is None  # unknown container -> null row


def _mp4_bytes(width: int, height: int, timescale: int, duration: int) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0))."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"              # version 0 + flags
        + b"\x00" * 8                     # creation/modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"              # version 0 + flags
        + b"\x00" * 72                    # ids/times/matrix
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


def test_parse_video_header_real_values():
    mp4 = _mp4_bytes(1920, 1080, 600, 3000)
    feats = M.parse_video_header(mp4)
    assert (feats["width"], feats["height"]) == (1920, 1080)
    assert feats["duration_sec"] == pytest.approx(5.0)
    assert feats["mime"] == "video/mp4"
    assert M.parse_video_header(b"not a video at all...") is None
    assert M.parse_video_header(None) is None


def test_decode_video_headers_mapinpandas(spark):
    raw = spark.createDataFrame(
        [
            (1, bytearray(_mp4_bytes(640, 360, 1000, 12500))),
            (2, bytearray(b"garbage bytes not a container")),
            (3, None),
        ],
        "id long, blob binary",
    )
    media = M.attach_metadata(raw, "id", "blob", "video")
    mimes = {r["media_id"]: r["meta"]["mime"] for r in media.collect()}
    assert mimes[1] == "video/mp4"
    assert mimes[2] == "video/unknown"
    feats = {r["media_id"]: r for r in M.decode_video_headers(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (640, 360)
    assert feats[1]["duration_sec"] == pytest.approx(12.5)
    assert feats[2]["width"] is None and feats[3]["width"] is None
