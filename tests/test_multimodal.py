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
    # PNG pixels decode for REAL too (r4): zero-filled 8x8 -> luma 0
    assert feats[3]["width"] == 8
    assert feats[3]["mean_luma"] == 0.0


def _png_encode(pixels, color_type, depth=8, filters=None, palette=None,
                interlace=0) -> bytes:
    """Independent spec-straight PNG encoder for decoder tests.

    ``pixels``: h x w x channels nested lists of samples (palette
    indices for color type 3).  ``filters``: per-row filter type
    (default 0); filtering is applied per spec §9 so every filter type
    exercises the decoder's reconstruction path.
    """
    import struct
    import zlib as _z

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
        )

    h = len(pixels)
    w = len(pixels[0])
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, nch * depth // 8)

    def row_bytes(row) -> bytes:
        if depth == 16:
            return b"".join(
                struct.pack(">H", s) for px in row for s in (px if nch > 1 else [px])
            )
        if depth == 8:
            return bytes(s for px in row for s in (px if nch > 1 else [px]))
        # depth < 8: pack samples MSB-first
        samples = [px for px in row]
        acc = bits = 0
        out = bytearray()
        for s in samples:
            acc = (acc << depth) | s
            bits += depth
            if bits == 8:
                out.append(acc)
                acc = bits = 0
        if bits:
            out.append(acc << (8 - bits))
        return bytes(out)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    def encode_rows(rows, row_filters):
        out_ = bytearray()
        prev_ = None
        for y, row in enumerate(rows):
            line = row_bytes(row)
            f = row_filters[y] if row_filters else 0
            up = prev_ if prev_ is not None else bytes(len(line))
            filt = bytearray()
            for x in range(len(line)):
                a = line[x - bpp] if x >= bpp else 0
                b = up[x]
                c = up[x - bpp] if x >= bpp else 0
                if f == 0:
                    v = line[x]
                elif f == 1:
                    v = line[x] - a
                elif f == 2:
                    v = line[x] - b
                elif f == 3:
                    v = line[x] - (a + b) // 2
                else:
                    v = line[x] - paeth(a, b, c)
                filt.append(v & 0xFF)
            out_ += bytes([f]) + bytes(filt)
            prev_ = line
        return out_

    if interlace:
        raw = bytearray()
        for x0, y0, xs, ys in ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
                               (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2),
                               (0, 1, 1, 2)):
            rows = [
                [pixels[y][x] for x in range(x0, w, xs)]
                for y in range(y0, h, ys)
            ]
            if rows and rows[0]:
                raw += encode_rows(rows, None)
    else:
        raw = encode_rows(pixels, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(c for rgb in palette for c in rgb))
    return out + chunk(b"IDAT", _z.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_png_real_pixel_decode_all_filters():
    """PNG pixels decode for REAL (zlib inflate + unfiltering): every
    filter type (None/Sub/Up/Average/Paeth) reconstructs exactly."""
    import numpy as np

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    expected = (
        img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    ).astype(np.float32)
    pixels = [[list(map(int, img[y, x])) for x in range(4)] for y in range(5)]
    png = _png_encode(pixels, color_type=2, filters=[0, 1, 2, 3, 4])
    luma = M.decode_pixels(png)
    assert luma is not None and luma.shape == (5, 4)
    assert np.allclose(luma, expected, atol=1e-3)
    feats = M._decode_one(png)
    assert abs(feats["mean_luma"] - float(expected.mean()) / 255.0) < 1e-6


def test_png_real_pixel_decode_variants():
    """Grayscale, gray+alpha, RGBA, 16-bit, sub-byte depths, palette."""
    import numpy as np

    # 8-bit grayscale with Sub+Paeth filters
    g = [[10, 20, 30], [40, 50, 60]]
    png = _png_encode(g, color_type=0, filters=[1, 4])
    assert np.allclose(M.decode_pixels(png), np.array(g, dtype=np.float32))
    # gray+alpha: luma is the gray plane, alpha ignored
    ga = [[[100, 255], [200, 0]]]
    png = _png_encode(ga, color_type=4, filters=[2])
    assert np.allclose(M.decode_pixels(png), [[100.0, 200.0]])
    # RGBA: Rec.601 on RGB
    rgba = [[[255, 0, 0, 10], [0, 0, 255, 250]]]
    png = _png_encode(rgba, color_type=6)
    assert np.allclose(
        M.decode_pixels(png), [[255 * 0.299, 255 * 0.114]], atol=1e-3
    )
    # 16-bit RGB: high byte is the 8-bit value
    rgb16 = [[[0xFF00, 0x0000, 0x0000], [0x0000, 0xFF00, 0x0000]]]
    png = _png_encode(rgb16, color_type=2, depth=16)
    assert np.allclose(
        M.decode_pixels(png), [[255 * 0.299, 255 * 0.587]], atol=1e-3
    )
    # 1-bit grayscale: 0 -> 0, 1 -> 255 (w=3 exercises partial-byte rows)
    bits = [[1, 0, 1], [0, 1, 0]]
    png = _png_encode(bits, color_type=0, depth=1)
    assert np.allclose(
        M.decode_pixels(png), [[255.0, 0.0, 255.0], [0.0, 255.0, 0.0]]
    )
    # 4-bit palette indices -> PLTE luma
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = [[0, 1, 2]]
    png = _png_encode(idx, color_type=3, depth=4, palette=pal)
    assert np.allclose(
        M.decode_pixels(png),
        [[255 * 0.299, 255 * 0.587, 255 * 0.114]],
        atol=1e-3,
    )


def _gif_lzw_encode(indices, min_code_size: int) -> bytes:
    """Independent GIF-variant LZW compressor for decoder tests."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]
    run = b""
    for i in indices:
        cand = run + bytes([i])
        if cand in table:
            run = cand
            continue
        out_bits.append((table[run], width))
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        run = bytes([i])
    if run:
        out_bits.append((table[run], width))
    out_bits.append((eoi, width))
    acc = nbits = 0
    data = bytearray()
    for code, wd in out_bits:
        acc |= code << nbits
        nbits += wd
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif_with_pixels(indices_rows, palette, interlaced=False) -> bytes:
    """A complete GIF89a with one LZW-coded frame over ``palette``."""
    import struct

    h = len(indices_rows)
    w = len(indices_rows[0])
    pal_bits = 1
    while (1 << (pal_bits + 1)) < len(palette):
        pal_bits += 1
    pal_size = 2 << pal_bits
    gct = bytearray()
    for i in range(pal_size):
        gct += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    rows = list(indices_rows)
    if interlaced:
        order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(start, h, step)]
        rows = [indices_rows[y] for y in order]
    flat = [i for row in rows for i in row]
    min_code = max(2, pal_bits + 1)
    lzw = _gif_lzw_encode(flat, min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        part = lzw[i : i + 255]
        blocks += bytes([len(part)]) + part
    iflags = (0x40 if interlaced else 0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | pal_bits, 0, 0)
        + bytes(gct)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
        + bytes([min_code]) + bytes(blocks) + b"\x00"
        + b"\x3b"
    )


def test_gif_real_pixel_decode():
    """GIF pixels decode for REAL via pure-Python LZW + palette luma."""
    import numpy as np

    pal = [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]
    idx = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]]
    gif = _gif_with_pixels(idx, pal)
    lum = {0: 0.0, 1: 255.0, 2: 255 * 0.299, 3: 255 * 0.114}
    expected = np.array([[lum[i] for i in row] for row in idx], dtype=np.float32)
    luma = M.decode_pixels(gif)
    assert luma is not None and luma.shape == (3, 4)
    assert np.allclose(luma, expected, atol=1e-3)
    feats = M._decode_one(gif)
    assert (feats["width"], feats["height"]) == (4, 3)
    assert abs(feats["mean_luma"] - float(expected.mean()) / 255.0) < 1e-6


def test_gif_interlaced_and_large_table():
    """Interlaced row order is undone; LZW code-width growth (table past
    the initial width) round-trips on a many-distinct-runs image."""
    import numpy as np

    pal = [((17 * i) % 256, (31 * i) % 256, (53 * i) % 256) for i in range(16)]
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 16, size=(16, 16))
    gif = _gif_with_pixels([list(map(int, r)) for r in idx], pal, interlaced=True)
    palf = np.array(pal, dtype=np.float32)
    lum = palf[:, 0] * 0.299 + palf[:, 1] * 0.587 + palf[:, 2] * 0.114
    expected = lum[idx]
    luma = M.decode_pixels(gif)
    assert luma is not None
    assert np.allclose(luma, expected, atol=1e-3)


def test_parse_image_header_rejects_unknown():
    assert M.parse_image_header(b"not an image, just text bytes") is None
    assert M.parse_image_header(None) is None
    assert M.parse_image_header(b"\x89PNG") is None  # truncated


def test_resize_images_real_roundtrip(spark):
    """resize_images is REAL (r4): decode -> bilinear -> PGM payload
    that decode_images can read back at the target size; undecodable
    payloads yield null rows."""
    import numpy as np

    big = _bmp_with_pixels(
        [[(v, v, v) for v in row] for row in
         np.repeat(np.repeat([[0, 255], [255, 0]], 8, axis=0), 8, axis=1)]
    )
    raw = spark.createDataFrame(
        [(1, bytearray(big)), (2, bytearray(b"garbage not an image")), (3, None)],
        ["id", "blob"],
    )
    media = M.attach_metadata(raw, "id", "blob", "image")
    out = {r["media_id"]: r for r in M.resize_images(media, 4, 4).collect()}
    assert out[1]["width"] == 4 and out[1]["payload"] is not None
    assert out[2]["payload"] is None and out[3]["payload"] is None
    # the resized payload is a real PGM: decode it back
    luma = M.decode_pixels(bytes(out[1]["payload"]))
    assert luma.shape == (4, 4)
    # checkerboard halves average toward mid-gray after downsample;
    # corners keep their block's dominant value
    assert luma[0, 0] < 128 < luma[0, 3]
    # the resized frame flows through decode_images as a normal image
    rdf = spark.createDataFrame(
        [(9, bytearray(out[1]["payload"]))], ["id", "blob"]
    )
    feats = M.decode_images(M.attach_metadata(rdf, "id", "blob", "image")).collect()[0]
    assert (feats["width"], feats["height"]) == (4, 4)


def test_video_frame_sampling_plumbing(media):
    """Non-AVI payloads keep the marked fake refs with null payloads."""
    frames = M.sample_video_frames(media)
    rows = frames.collect()
    assert {f.name for f in frames.schema.fields} == {
        "media_id", "frame_idx", "t_sec", "frame_payload", "frame_ref",
    }
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == {1, 2, 3}
    assert all(
        r["frame_ref"].startswith("fake://") and r["frame_payload"] is None
        for r in rows
    )


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


# --- r4: REAL baseline JPEG decode (pure Python huffman + numpy IDCT) -----


def _jpeg_encode(y, cb=None, cr=None, restart_interval=0) -> bytes:
    """Spec-straight baseline JPEG encoder (test-only, independent of
    the decoder): all-ones quant tables, canonical 8-bit huffman codes.
    Grayscale when cb/cr are None; else 4:2:0 with full-res Y and
    quarter-res chroma (pass pre-downsampled cb/cr planes)."""
    import struct

    import numpy as np

    M = np.zeros((8, 8))
    k = np.arange(8)
    M[:] = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    M[0, :] = 1.0
    M *= np.sqrt(np.where(k == 0, 1.0, 2.0))[:, None] / np.sqrt(8.0)

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]

    def table_bytes(syms):
        counts = [0] * 16
        counts[7] = len(syms)  # every code 8 bits, canonical
        return bytes(counts) + bytes(syms)

    dc_code = {s: (i, 8) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}

    out = bytearray()
    bitbuf = []

    def put(code, length):
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)
        for i in range(0, len(bitbuf), 8):
            b = 0
            for bit in bitbuf[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        bitbuf.clear()

    def mag(v):
        s = 0 if v == 0 else int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    def encode_block(plane, y0, x0, pred):
        h, w = plane.shape
        blk = np.zeros((8, 8))
        for yy in range(8):
            for xx in range(8):
                blk[yy, xx] = plane[min(y0 + yy, h - 1), min(x0 + xx, w - 1)]
        coeff = M @ (blk - 128.0) @ M.T
        zz = np.round(coeff.ravel()[ZZ]).astype(int)
        s, bits = mag(int(zz[0]) - pred)
        put(*dc_code[s])
        if s:
            put(bits, s)
        run = 0
        for v in zz[1:]:
            if v == 0:
                run += 1
                continue
            while run >= 16:
                put(*ac_code[0xF0])
                run -= 16
            s, bits = mag(int(v))
            put(*ac_code[(run << 4) | s])
            put(bits, s)
            run = 0
        if run:
            put(*ac_code[0x00])
        return int(zz[0])

    h, w = y.shape
    color = cb is not None
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    ncomp = 3 if color else 1
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, 0x22 if color else 0x11, 0])
    if color:
        sof += bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, syms in ((0, dc_syms), (1, ac_syms)):
        tb = table_bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(tb)) + bytes([cls << 4]) + tb
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp]) + bytes([1, 0x00])
    if color:
        sos += bytes([2, 0x00, 3, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    preds = [0, 0, 0]
    rst = 0
    mcu = 0
    if color:
        mcus_y, mcus_x = -(-h // 16), -(-w // 16)
    else:
        mcus_y, mcus_x = -(-h // 8), -(-w // 8)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                flush_bits()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                preds = [0, 0, 0]
            mcu += 1
            if color:
                for by in range(2):
                    for bx in range(2):
                        preds[0] = encode_block(
                            y, my * 16 + by * 8, mx * 16 + bx * 8, preds[0]
                        )
                preds[1] = encode_block(cb, my * 8, mx * 8, preds[1])
                preds[2] = encode_block(cr, my * 8, mx * 8, preds[2])
            else:
                preds[0] = encode_block(y, my * 8, mx * 8, preds[0])
    flush_bits()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_real_luma_decode_grayscale():
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(6, 10)).astype(np.float64)
    jpg = _jpeg_encode(img)
    luma = M.decode_pixels(jpg)
    assert luma is not None and luma.shape == (6, 10)
    # all-ones quant tables: error is only coefficient rounding
    assert np.abs(luma - img).max() <= 4.0
    feats = M._decode_one(jpg)
    assert (feats["width"], feats["height"]) == (10, 6)
    assert abs(feats["mean_luma"] - float(img.mean()) / 255) < 0.01


def test_jpeg_real_luma_decode_color_420_with_restarts():
    """4:2:0 color with DRI restart markers: chroma blocks are entropy-
    consumed (not stored), restart resync + DC predictor reset work."""
    import numpy as np

    rng = np.random.default_rng(9)
    y = rng.integers(0, 256, size=(12, 20)).astype(np.float64)
    cb = rng.integers(0, 256, size=(6, 10)).astype(np.float64)
    cr = rng.integers(0, 256, size=(6, 10)).astype(np.float64)
    jpg = _jpeg_encode(y, cb, cr, restart_interval=1)
    luma = M.decode_pixels(jpg)
    assert luma is not None and luma.shape == (12, 20)
    assert np.abs(luma - y).max() <= 4.0


def _jpeg_encode_12bit(y12) -> bytes:
    """Spec-straight 12-bit extended-sequential (SOF1) grayscale
    encoder, independent of the decoder: 16-bit all-ones quant table
    (Pq=1), canonical 8-bit huffman codes over the WIDER 12-bit
    magnitude categories (DC 0..15, AC sizes 1..14), level shift 2048.
    ``y12`` holds samples in [0, 4095]."""
    import struct

    import numpy as np

    M8 = np.zeros((8, 8))
    k = np.arange(8)
    M8[:] = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    M8[0, :] = 1.0
    M8 *= np.sqrt(np.where(k == 0, 1.0, 2.0))[:, None] / np.sqrt(8.0)
    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    dc_syms = list(range(16))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 15)
    ]
    dc_code = {s: (i, 8) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}

    out = bytearray()
    bitbuf = []

    def put(code, length):
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)
        for i in range(0, len(bitbuf), 8):
            b = 0
            for bit in bitbuf[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        bitbuf.clear()

    def mag(v):
        s = (
            0
            if v == 0
            else int(v).bit_length() if v > 0 else int(-v).bit_length()
        )
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    h, w = y12.shape
    out += b"\xff\xd8"
    # Pq=1: 16-bit table entries, all ones
    out += (
        b"\xff\xdb"
        + struct.pack(">H", 131)
        + b"\x10"
        + b"\x00\x01" * 64
    )
    sof = struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc1" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, syms in ((0, dc_syms), (1, ac_syms)):
        counts = [0] * 16
        counts[7] = len(syms)
        tb = bytes(counts) + bytes(syms)
        out += (
            b"\xff\xc4" + struct.pack(">H", 3 + len(tb)) + bytes([cls << 4]) + tb
        )
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    pred = 0
    for my in range(-(-h // 8)):
        for mx in range(-(-w // 8)):
            blk = np.zeros((8, 8))
            for yy in range(8):
                for xx in range(8):
                    blk[yy, xx] = y12[
                        min(my * 8 + yy, h - 1), min(mx * 8 + xx, w - 1)
                    ]
            coeff = M8 @ (blk - 2048.0) @ M8.T
            zz = np.round(coeff.ravel()[ZZ]).astype(int)
            s, bits = mag(int(zz[0]) - pred)
            put(*dc_code[s])
            if s:
                put(bits, s)
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    put(*ac_code[0xF0])
                    run -= 16
                s, bits = mag(int(v))
                put(*ac_code[(run << 4) | s])
                put(bits, s)
                run = 0
            if run:
                put(*ac_code[0x00])
            pred = int(zz[0])
    flush_bits()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_12bit_extended_sequential_real_decode():
    """r8: 12-bit extended sequential (SOF1, 16-bit DQT) decodes for
    REAL — samples level-shifted at 2048 and scaled into the 8-bit
    feature range; the decode must match the source image / 16."""
    import numpy as np

    rng = np.random.default_rng(12)
    img12 = rng.integers(0, 4096, size=(10, 14)).astype(np.float64)
    jpg = _jpeg_encode_12bit(img12)
    luma = M.decode_pixels(jpg)
    assert luma is not None and luma.shape == (10, 14)
    # all-ones quant: only coefficient rounding error, /16 scaled
    assert np.abs(luma - img12 / 16.0).max() <= 1.0
    feats = M._decode_one(jpg)
    assert (feats["width"], feats["height"]) == (14, 10)
    # REAL decode, not the hash fake: mean_luma tracks the image
    assert abs(feats["mean_luma"] - float(img12.mean()) / 16.0 / 255.0) < 0.01


def _jpeg_encode_progressive(y, cb=None, cr=None) -> bytes:
    """Spec-straight PROGRESSIVE JPEG encoder (test-only, independent
    of the decoder): canonical 8-bit huffman codes, all-ones quant.
    Scan script exercises every decoder path — interleaved DC first
    scan at Al=1, DC refinement, per-component spectral-selection AC
    bands (1-5, 6-63) at Al=1, then AC refinement scans at Al=0 (the
    correction-bit/EOBRUN machinery of T.81 G.1.2.3)."""
    import struct

    import numpy as np

    Mx = np.zeros((8, 8))
    k = np.arange(8)
    Mx[:] = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    Mx[0, :] = 1.0
    Mx *= np.sqrt(np.where(k == 0, 1.0, 2.0))[:, None] / np.sqrt(8.0)
    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    dc_syms = list(range(12))
    ac_syms = (
        [r << 4 for r in range(15)]          # EOB / EOBRUN symbols
        + [0xF0]                              # ZRL
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    dc_code = {s: (i, 8) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}

    def table_bytes(syms):
        counts = [0] * 16
        counts[7] = len(syms)
        return bytes(counts) + bytes(syms)

    color = cb is not None
    planes = [y] + ([cb, cr] if color else [])
    facs = [(2, 2), (1, 1), (1, 1)] if color else [(1, 1)]
    h, w = y.shape
    hmax = max(f[0] for f in facs)
    vmax = max(f[1] for f in facs)
    mcus_y, mcus_x = -(-h // (8 * vmax)), -(-w // (8 * hmax))

    # coefficient blocks per component, zigzag ints, padded to MCU grid
    comp_blocks = []
    for ci, plane in enumerate(planes):
        fh, fv = facs[ci]
        bh, bw = mcus_y * fv, mcus_x * fh
        blocks = np.zeros((bh, bw, 64), dtype=np.int64)
        ph, pw = plane.shape
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros((8, 8))
                for yy in range(8):
                    for xx in range(8):
                        blk[yy, xx] = plane[
                            min(by * 8 + yy, ph - 1), min(bx * 8 + xx, pw - 1)
                        ]
                coeff = Mx @ (blk - 128.0) @ Mx.T
                blocks[by, bx] = np.round(coeff.ravel()[ZZ]).astype(np.int64)
        comp_blocks.append(blocks)

    out = bytearray()
    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, (facs[ci][0] << 4) | facs[ci][1], 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, syms in ((0, dc_syms), (1, ac_syms)):
        tb = table_bytes(syms)
        out += (
            b"\xff\xc4" + struct.pack(">H", 3 + len(tb)) + bytes([cls << 4]) + tb
        )

    bitbuf = []

    def put(code, length):
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)
        for i in range(0, len(bitbuf), 8):
            b = 0
            for bit in bitbuf[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        bitbuf.clear()

    def mag(v):
        s = 0 if v == 0 else (v if v > 0 else -v).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body)

    # --- scan 1: DC, all components interleaved, Al=1 ----------------
    sos(list(range(1, nc + 1)), 0, 0, 0, 1)
    preds = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                fh, fv = facs[ci]
                for by in range(fv):
                    for bx in range(fh):
                        v = int(comp_blocks[ci][my * fv + by, mx * fh + bx, 0]) >> 1
                        s, bits = mag(v - preds[ci])
                        preds[ci] = v
                        put(*dc_code[s])
                        if s:
                            put(bits, s)
    flush_bits()

    # --- scan 2: DC refinement, Ah=1, Al=0 ----------------------------
    sos(list(range(1, nc + 1)), 0, 0, 1, 0)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                fh, fv = facs[ci]
                for by in range(fv):
                    for bx in range(fh):
                        put(int(comp_blocks[ci][my * fv + by, mx * fh + bx, 0]) & 1, 1)
    flush_bits()

    def comp_units(ci):
        fh, fv = facs[ci]
        ph, pw = planes[ci].shape
        bw = -(-pw // 8)
        bh = -(-ph // 8)
        return [(by, bx) for by in range(bh) for bx in range(bw)]

    # --- AC first scans per component, two spectral bands, Al=1 ------
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            sos([ci + 1], ss, se, 0, 1)
            eobrun = 0

            def emit_eobrun():
                nonlocal eobrun
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    put(*ac_code[nbits << 4])
                    if nbits:
                        put(eobrun - (1 << nbits), nbits)
                    eobrun = 0

            for by, bx in comp_units(ci):
                blk = comp_blocks[ci][by, bx]
                r = 0
                for k in range(ss, se + 1):
                    v = int(blk[k])
                    v = -((-v) >> 1) if v < 0 else v >> 1  # trunc toward 0
                    if v == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        put(*ac_code[0xF0])
                        r -= 16
                    s, bits = mag(v)
                    put(*ac_code[(r << 4) | s])
                    put(bits, s)
                    r = 0
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
            emit_eobrun()
            flush_bits()

    # --- AC refinement scans per component, Al=0 ---------------------
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            sos([ci + 1], ss, se, 1, 0)
            eobrun = 0
            pending: list[int] = []

            def emit_pending():
                for b in pending:
                    put(b, 1)
                pending.clear()

            def emit_eobrun2():
                nonlocal eobrun
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    put(*ac_code[nbits << 4])
                    if nbits:
                        put(eobrun - (1 << nbits), nbits)
                    eobrun = 0
                    emit_pending()

            for by, bx in comp_units(ci):
                blk = comp_blocks[ci][by, bx]
                absv = [abs(int(blk[k])) for k in range(ss, se + 1)]
                eob = 0  # 1-based offset of last newly-nonzero coeff
                for j, a in enumerate(absv):
                    if a == 1:
                        eob = j + 1
                r = 0
                br: list[int] = []
                for j, a in enumerate(absv):
                    if a == 0:
                        r += 1
                        continue
                    while r > 15 and j + 1 <= eob:
                        emit_eobrun2()
                        put(*ac_code[0xF0])
                        r -= 16
                        for b in br:
                            put(b, 1)
                        br.clear()
                    if a > 1:
                        br.append(a & 1)
                        continue
                    emit_eobrun2()
                    put(*ac_code[(r << 4) | 1])
                    put(1 if blk[ss + j] > 0 else 0, 1)
                    for b in br:
                        put(b, 1)
                    br.clear()
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    pending.extend(br)
                    if eobrun == 0x7FFF:
                        emit_eobrun2()
            emit_eobrun2()
            flush_bits()

    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_real_decode_grayscale():
    """r7: progressive SOF2 decodes for REAL and matches the baseline
    decode of the same image bit-for-bit (same coefficients, same
    IDCT pipeline) — DC successive approximation + spectral-selection
    bands + AC refinement + EOBRUN all exercised."""
    import numpy as np

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(13, 21)).astype(np.float64)
    base = M.decode_pixels(_jpeg_encode(img))
    prog = M.decode_pixels(_jpeg_encode_progressive(img))
    assert prog is not None and prog.shape == (13, 21)
    assert np.array_equal(base, prog)
    assert np.abs(prog - img).max() <= 4.0
    feats = M._decode_one(_jpeg_encode_progressive(img))
    assert (feats["width"], feats["height"]) == (21, 13)
    assert not str(feats.get("pixels_ref", "")).startswith("fake://")


def test_jpeg_progressive_color_420_skips_chroma_scans():
    """Color 4:2:0 progressive: chroma AC scans are skipped wholesale
    (marker search), interleaved DC keeps stream sync — Y plane equals
    the baseline decode exactly."""
    import numpy as np

    rng = np.random.default_rng(23)
    y = rng.integers(0, 256, size=(12, 20)).astype(np.float64)
    cb = rng.integers(0, 256, size=(6, 10)).astype(np.float64)
    cr = rng.integers(0, 256, size=(6, 10)).astype(np.float64)
    base = M.decode_pixels(_jpeg_encode(y, cb, cr))
    prog = M.decode_pixels(_jpeg_encode_progressive(y, cb, cr))
    assert prog is not None and prog.shape == (12, 20)
    assert np.array_equal(base, prog)


def test_jpeg_progressive_flat_image_eobrun_path():
    """A flat image makes EVERY AC band an EOB run spanning all blocks
    (the EOBRUN accumulation path), and DC refinement still lands."""
    import numpy as np

    img = np.full((24, 24), 77, dtype=np.float64)
    prog = M.decode_pixels(_jpeg_encode_progressive(img))
    assert prog is not None
    assert np.abs(prog - 77.0).max() <= 2.0


def test_jpeg_headerless_progressive_still_falls_back():
    """A SOF2 stream with no scan data / no quant tables still returns
    None and routes to the marked deterministic fake (header real);
    arithmetic coding (SOF10) keeps falling back too."""
    import struct

    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 6, 10, 3)
    jpg = b"\xff\xd8" + sof2 + b"\xff\xd9"
    assert M.decode_pixels(jpg) is None
    feats = M._decode_one(jpg)
    assert (feats["width"], feats["height"]) == (10, 6)  # header real
    sof10 = b"\xff\xca" + struct.pack(">HBHHB", 11, 8, 6, 10, 3)
    assert M.decode_pixels(b"\xff\xd8" + sof10 + b"\xff\xd9") is None


# --- r4: REAL PCM WAV waveform decode -------------------------------------


def _wav_pcm(samples, rate=16000, bits=16, channels=1) -> bytes:
    """Independent PCM WAV writer (float samples in [-1, 1])."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if bits == 16:
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raw = ((np.clip(x, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
    block = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_wav_waveform_real_decode():
    import numpy as np

    t = np.arange(1600) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    wav = _wav_pcm(sine)
    mono = M.decode_waveform(wav)
    assert mono is not None and mono.size == 1600
    # a 0.5-amplitude sine: rms ~ 0.5/sqrt(2), peak ~ 0.5
    assert abs(np.sqrt((mono**2).mean()) - 0.5 / np.sqrt(2)) < 0.01
    assert abs(np.abs(mono).max() - 0.5) < 0.01
    # stereo: channel-averaged mono
    stereo = np.empty(200)
    stereo[0::2] = 0.25   # L
    stereo[1::2] = -0.25  # R
    wav2 = _wav_pcm(stereo, channels=2)
    mono2 = M.decode_waveform(wav2)
    assert mono2.size == 100 and np.abs(mono2).max() < 0.01
    # 8-bit unsigned path
    wav3 = _wav_pcm(sine, bits=8)
    mono3 = M.decode_waveform(wav3)
    assert abs(np.abs(mono3).max() - 0.5) < 0.02
    # non-WAV -> None (honest fallback)
    assert M.decode_waveform(b"fLaC" + b"\x00" * 64) is None


def test_wav_waveforms_mapinpandas(spark):
    import numpy as np

    sine = 0.5 * np.sin(2 * np.pi * np.arange(800) / 40)
    raw = spark.createDataFrame(
        [(1, bytearray(_wav_pcm(sine))), (2, bytearray(b"OggS" + b"\x00" * 64)),
         (3, None)],
        ["id", "blob"],
    )
    media = M.attach_metadata(raw, "id", "blob", "audio")
    feats = {r["media_id"]: r for r in M.decode_waveforms(media).collect()}
    assert feats[1]["n_samples"] == 800
    assert abs(feats[1]["rms"] - 0.5 / np.sqrt(2)) < 0.01
    assert feats[2]["rms"] is None and feats[3]["rms"] is None


# --- r4: codec robustness fuzz --------------------------------------------


def test_decoders_never_raise_on_garbage():
    """decode_pixels/_decode_one/parse_*_header must treat arbitrary
    bytes as data: None/fake results, never exceptions (a malformed
    payload must not kill a 100 TB job)."""
    import random

    rng = random.Random(1234)
    magics = [
        b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"\xff\xd8", b"BM",
        b"P5 ", b"P6 ", b"RIFF", b"fLaC", b"OggS", b"ID3", b"",
    ]
    for trial in range(300):
        magic = magics[trial % len(magics)]
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 400)))
        payload = magic + body
        luma = M.decode_pixels(payload)  # must not raise
        assert luma is None or luma.ndim == 2
        feats = M._decode_one(payload)  # falls back to the marked fake
        assert set(feats) == {"width", "height", "channels", "mean_luma", "phash"}
        M.parse_image_header(payload)
        M.parse_audio_header(payload)
        M.parse_video_header(payload)
        M.decode_waveform(payload)


def test_truncated_real_files_never_raise():
    """Truncations of VALID files at every prefix length: the nastiest
    malformed inputs are half-written real ones."""
    import numpy as np

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    pixels = [[list(map(int, img[y, x])) for x in range(8)] for y in range(8)]
    png = _png_encode(pixels, color_type=2, filters=[0, 1, 2, 3, 4, 0, 1, 2])
    pal = [((7 * i) % 256, i, 255 - i) for i in range(8)]
    gif = _gif_with_pixels(
        [[int(v) for v in row] for row in rng.integers(0, 8, size=(6, 6))], pal
    )
    jpg = _jpeg_encode(img[:, :, 0].astype(np.float64))
    wav = _wav_pcm(np.sin(np.arange(400) / 10.0) * 0.3)
    for full in (png, gif, jpg, wav):
        for cut in range(0, len(full), 7):
            payload = full[:cut]
            M.decode_pixels(payload)
            M.decode_waveform(payload)
            if payload:
                M._decode_one(payload)


def _mjpeg_avi(jpeg_frames, us_per_frame=500_000) -> bytes:
    """Minimal MJPEG AVI: RIFF(AVI ) { LIST(hdrl){avih}, LIST(movi){00dc...} }."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<I", us_per_frame) + b"\x00" * 52
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    movi_body = b"movi" + b"".join(chunk(b"00dc", f) for f in jpeg_frames)
    movi = chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_mjpeg_avi_real_frame_sampling(spark):
    """MJPEG AVI frames sample for REAL: every-other-frame at 2 fps /
    1 s sampling, payloads are standalone JPEGs our decoder reads."""
    import numpy as np

    frames = [
        _jpeg_encode(np.full((8, 8), v, dtype=np.float64)) for v in (40, 120, 200)
    ]
    avi = _mjpeg_avi(frames, us_per_frame=500_000)  # 2 fps
    raw = spark.createDataFrame([(7, bytearray(avi))], ["id", "blob"])
    media = M.attach_metadata(raw, "id", "blob", "video")
    rows = sorted(
        M.sample_video_frames(media, every_n_seconds=1.0).collect(),
        key=lambda r: r["frame_idx"],
    )
    # frames 0 and 2 (step = 1.0 / 0.5 = 2)
    assert [r["frame_idx"] for r in rows] == [0, 1]
    assert [r["t_sec"] for r in rows] == [0.0, 1.0]
    assert all(r["frame_ref"] is None for r in rows)
    lumas = [float(M.decode_pixels(bytes(r["frame_payload"])).mean()) for r in rows]
    assert abs(lumas[0] - 40) < 3 and abs(lumas[1] - 200) < 3
    # sampled frames compose with the image pipeline
    fdf = spark.createDataFrame(
        [(r["frame_idx"], bytearray(r["frame_payload"])) for r in rows],
        ["id", "blob"],
    )
    feats = M.decode_images(
        M.attach_metadata(fdf, "id", "blob", "image")
    ).collect()
    assert all((f["width"], f["height"]) == (8, 8) for f in feats)


def test_avi_header_and_mime(spark):
    """AVI main-header parse (avih) + RIFF/AVI mime sniff (r4)."""
    import numpy as np
    import struct

    frames = [_jpeg_encode(np.full((4, 6), 99, dtype=np.float64))] * 4
    avi = _mjpeg_avi(frames, us_per_frame=250_000)
    # patch dwTotalFrames / dwWidth / dwHeight into avih for the test
    a = avi.find(b"avih") + 8
    avi = (
        avi[: a + 16] + struct.pack("<I", 4) + avi[a + 20 : a + 32]
        + struct.pack("<II", 6, 4) + avi[a + 40 :]
    )
    hdr = M.parse_video_header(avi)
    assert hdr == {
        "width": 6, "height": 4, "duration_sec": 1.0,
        "mime": "video/x-msvideo",
    }
    raw = spark.createDataFrame([(1, bytearray(avi))], ["id", "blob"])
    media = M.attach_metadata(raw, "id", "blob", "video")
    assert media.collect()[0]["meta"]["mime"] == "video/x-msvideo"


def test_png_adam7_interlaced_decodes(  ):
    """Adam7-interlaced PNG decodes for REAL (r4): per-pass unfilter +
    scatter reassembles the exact image (RGB and sub-byte gray)."""
    import numpy as np

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(11, 9, 3), dtype=np.uint8)
    pixels = [[list(map(int, img[y, x])) for x in range(9)] for y in range(11)]
    png = _png_encode(pixels, color_type=2, interlace=1)
    expected = (
        img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    )
    luma = M.decode_pixels(png)
    assert luma is not None and luma.shape == (11, 9)
    assert np.allclose(luma, expected, atol=1e-3)
    # 1-bit grayscale interlaced: partial-byte pass rows
    bits = [[int(v) for v in rng.integers(0, 2, size=5)] for _ in range(7)]
    png1 = _png_encode(bits, color_type=0, depth=1, interlace=1)
    want = np.array(bits, dtype=np.float32) * 255.0
    assert np.allclose(M.decode_pixels(png1), want)


def test_jpeg_progressive_truncation_falls_back_to_fake():
    """A progressive stream cut mid-scan returns None (marked-fake
    route) — never a half-decoded frame marked real."""
    import numpy as np

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.float64)
    full = _jpeg_encode_progressive(img)
    assert M.decode_pixels(full) is not None
    for frac in (0.4, 0.6, 0.8):
        cut = full[: int(len(full) * frac)]
        assert M.decode_pixels(cut) is None, f"truncated at {frac} decoded"


def _jpeg_encode_hierarchical(y) -> bytes:
    """Spec-straight hierarchical JPEG encoder (test-only, independent
    of the decoder): DHP (full dims) -> SOF0 base frame at half
    resolution -> EXP(1,1) -> SOF5 differential frame.  All-ones quant
    tables, canonical 8-bit huffman codes.  The differential frame
    codes (source - decoder-visible upsampled base reconstruction),
    with the DC coefficient coded WITHOUT prediction and no level
    shift — T.81 F.2.1.3.1 / J.1.1.4."""
    import struct

    import numpy as np

    M = np.zeros((8, 8))
    k = np.arange(8)
    M[:] = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    M[0, :] = 1.0
    M *= np.sqrt(np.where(k == 0, 1.0, 2.0))[:, None] / np.sqrt(8.0)
    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_code = {s: (i, 8) for i, s in enumerate(dc_syms)}
    ac_code = {s: (i, 8) for i, s in enumerate(ac_syms)}

    out = bytearray()
    bitbuf = []

    def put(code, length):
        for i in range(length - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def flush_bits():
        while len(bitbuf) % 8:
            bitbuf.append(1)
        for i in range(0, len(bitbuf), 8):
            b = 0
            for bit in bitbuf[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        bitbuf.clear()

    def mag(v):
        s = 0 if v == 0 else int(abs(int(v))).bit_length()
        bits = v if v >= 0 else v + (1 << s) - 1
        return s, bits

    def encode_frame(plane, differential):
        """Emit the frame's entropy data; return the decoder-visible
        reconstruction (before any reference add / level handling)."""
        h, w = plane.shape
        bys, bxs = -(-h // 8), -(-w // 8)
        recon = np.zeros((bys * 8, bxs * 8))
        pred = 0
        for by in range(bys):
            for bx in range(bxs):
                blk = np.zeros((8, 8))
                for yy in range(8):
                    for xx in range(8):
                        blk[yy, xx] = plane[
                            min(by * 8 + yy, h - 1), min(bx * 8 + xx, w - 1)
                        ]
                shift = 0.0 if differential else 128.0
                zz = np.round((M @ (blk - shift) @ M.T).ravel()[ZZ]).astype(int)
                if differential:
                    s, bits = mag(int(zz[0]))  # PRED = 0, not updated
                else:
                    s, bits = mag(int(zz[0]) - pred)
                    pred = int(zz[0])
                put(*dc_code[s])
                if s:
                    put(bits, s)
                run = 0
                for v in zz[1:]:
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        put(*ac_code[0xF0])
                        run -= 16
                    s, bits = mag(int(v))
                    put(*ac_code[(run << 4) | s])
                    put(bits, s)
                    run = 0
                if run:
                    put(*ac_code[0x00])
                deq = np.zeros(64)
                deq[ZZ] = zz
                recon[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    M.T @ deq.reshape(8, 8) @ M
                )
        return recon[:h, :w]

    def upsample(a, th, tw):
        def one(x, t):
            outa = np.zeros((x.shape[0], t), dtype=np.int64)
            outa[:, 0::2] = x[:, : (t + 1) // 2]
            nxt = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            outa[:, 1::2] = ((x + nxt + 1) >> 1)[:, : t // 2]
            return outa

        return one(one(a, tw).T, th).T

    def sof_and_sos(marker, h, w):
        hdr = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
        seg = bytes([0xFF, marker]) + struct.pack(">H", 2 + len(hdr)) + hdr
        seg += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, 0, 63, 0]
        )
        return seg

    src = np.round(np.asarray(y, dtype=np.float64)).astype(np.int64)
    h, w = src.shape
    base = src[::2, ::2].astype(np.float64)
    bh, bw = base.shape

    out += b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    dhp = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xde" + struct.pack(">H", 2 + len(dhp)) + dhp
    for cls, syms in ((0, dc_syms), (1, ac_syms)):
        counts = [0] * 16
        counts[7] = len(syms)
        tb = bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 3 + len(tb)) + bytes([cls << 4]) + tb
    # base frame (non-differential sequential, half resolution)
    out += sof_and_sos(0xC0, bh, bw)
    recon_base = encode_frame(base, differential=False)
    flush_bits()
    recon_base = np.clip(np.round(recon_base) + 128, 0, 255).astype(np.int64)
    # EXP(1,1) + differential frame at full resolution
    out += b"\xff\xdf" + struct.pack(">H", 3) + bytes([0x11])
    up = upsample(recon_base, h, w)
    diff = (src - up).astype(np.float64)
    out += sof_and_sos(0xC5, h, w)
    encode_frame(diff, differential=True)
    flush_bits()
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_hierarchical_real_luma_decode():
    """r9 VERDICT ask #4: the Huffman hierarchical pyramid (DHP + SOF0
    base + EXP + SOF5 differential) decodes REAL pixels — and the
    baseline/progressive walkers refuse the stream instead of lying
    with the half-resolution base."""
    import numpy as np

    yy, xx = np.mgrid[0:11, 0:14].astype(np.float64)
    rng = np.random.default_rng(17)
    img = np.clip(
        np.round(120 + 60 * np.sin(yy / 3.0) + 50 * np.cos(xx / 4.0)
                 + rng.normal(0, 2, size=yy.shape)),
        0, 255,
    )
    jpg = _jpeg_encode_hierarchical(img)
    assert M._jpeg_luma(jpg) is None
    assert M._jpeg_luma_progressive(jpg) is None
    luma = M.decode_pixels(jpg)
    assert luma is not None and luma.shape == (11, 14)
    # base-frame coefficient rounding is corrected by the differential
    # frame; only ITS rounding remains
    assert np.abs(luma - img).max() <= 5.0
    feats = M._decode_one(jpg)
    assert (feats["width"], feats["height"]) == (14, 11)  # DHP dims
    assert abs(feats["mean_luma"] - float(img.mean()) / 255) < 0.01
    assert feats["phash"] == M.dhash64(luma)  # real path, not the fake


def test_jpeg_hierarchical_truncated_and_garbage_return_none():
    import numpy as np

    img = np.full((10, 12), 99.0)
    jpg = _jpeg_encode_hierarchical(img)
    assert M.decode_pixels(jpg[: len(jpg) // 2]) is None
    assert M.decode_pixels(jpg[:-4]) is None  # pyramid never completes
    full = M.decode_pixels(jpg)
    assert full is not None and np.abs(full - img).max() <= 5.0


def test_fingerprint_hamming_pairs_generic(spark):
    """Generic 64-bit banded Hamming join: full recall below chunks,
    validation, null drop."""
    import pytest

    from sparkall_spark.operators.dedup import fingerprint_hamming_pairs

    rows = [
        (1, 0b1010_0000),          # base
        (2, 0b1010_0001),          # hamming 1 from id 1
        (3, 0b1010_0111),          # hamming 3 from id 1
        (4, -1),                   # all ones: far from everything
        (5, None),                 # dropped
    ]
    df = spark.createDataFrame(rows, "id long, fp long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in fingerprint_hamming_pairs(df, "id", "fp", 3, 4).collect()
    }
    assert got == {(1, 2): 1, (1, 3): 3, (2, 3): 2}
    with pytest.raises(ValueError, match="full recall"):
        fingerprint_hamming_pairs(df, "id", "fp", 4, 4)
    with pytest.raises(ValueError, match="divide 64"):
        fingerprint_hamming_pairs(df, "id", "fp", 2, 5)


def test_image_neardup_pairs_and_dedup(spark):
    """Near-identical BMPs (one low-order pixel tweak) pair at small
    Hamming distance; a structurally different image does not; dedup
    keeps the smaller id."""
    import numpy as np

    from sparkall_spark.operators.multimodal import image_dedup, image_neardup_pairs

    base = [[(x * 16 % 256, x * 16 % 256, x * 16 % 256) for x in range(16)]
            for _ in range(8)]
    tweak = [row[:] for row in base]
    tweak[0][0] = (17, 17, 17)  # one pixel nudged: same dHash gradient
    other = [[((x * 37 + y * 91) % 256,) * 3 for x in range(16)]
             for y in range(8)]
    rows = [
        (1, bytearray(_bmp_with_pixels(base))),
        (2, bytearray(_bmp_with_pixels(tweak))),
        (3, bytearray(_bmp_with_pixels(other))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(df, max_hamming=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs
    kept = sorted(
        r["media_id"] for r in image_dedup(df, max_hamming=3).collect()
    )
    assert kept == [1, 3]
    ann = {
        r["media_id"]: r["is_neardup"]
        for r in image_dedup(df, max_hamming=3, mode="annotate").collect()
    }
    assert ann == {1: False, 2: True, 3: False}


def test_spectral_features_sine_physics():
    """A pure sine's centroid sits at its frequency, its zcr at 2f/sr,
    its bandwidth near zero, flatness near zero (tonal); white-ish
    content pushes flatness up."""
    import numpy as np

    from sparkall_spark.operators.multimodal import (
        decode_waveform,
        spectral_features,
    )

    sr, f = 8000, 1000
    t = np.arange(8000) / sr
    wav = _wav_pcm(0.7 * np.sin(2 * np.pi * f * t), rate=sr)
    feats = spectral_features(decode_waveform(wav), sr)
    assert feats["sample_rate"] == sr
    assert abs(feats["zcr"] - 2 * f / sr) < 0.01
    assert abs(feats["spectral_centroid"] - f) < 25
    assert feats["spectral_bandwidth"] < 120
    assert f - 50 < feats["rolloff85"] < f + 50
    assert feats["flatness"] < 0.01
    # deterministic rerun
    assert feats == spectral_features(decode_waveform(wav), sr)
    # a flat-spectrum signal (a CENTERED impulse — the Hann window
    # zeroes the edges) maxes flatness
    imp = np.zeros(4096)
    imp[2048] = 1.0
    flat = spectral_features(imp, sr)
    assert flat["flatness"] > 0.5


def test_spectral_features_silence_and_empty():
    import numpy as np

    from sparkall_spark.operators.multimodal import spectral_features

    z = spectral_features(np.zeros(1024), 8000)
    assert z["spectral_centroid"] == 0.0 and z["zcr"] == 0.0
    assert spectral_features(np.array([]), 8000) is None
    assert spectral_features(None, 8000) is None


def test_audio_spectral_features_mapinpandas(spark):
    """Spark plumbing: WAV rows get real descriptors, non-WAV payloads
    null rows; plan stays map-only (single mapInPandas crossing)."""
    import numpy as np

    from sparkall_spark.operators.multimodal import audio_spectral_features

    sr = 8000
    t = np.arange(4000) / sr
    rows = [
        (1, bytearray(_wav_pcm(0.5 * np.sin(2 * np.pi * 500 * t), rate=sr))),
        (2, bytearray(b"fLaC" + b"\x00" * 64)),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in audio_spectral_features(df).collect()}
    assert abs(out[1]["spectral_centroid"] - 500) < 25
    assert out[1]["sample_rate"] == sr
    assert out[2]["spectral_centroid"] is None
    assert out[3]["spectral_centroid"] is None
    plan = audio_spectral_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_image_header_webp_variants():
    import struct

    from sparkall_spark.operators.multimodal import parse_image_header

    def riff(chunk, body):
        payload = chunk + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload

    # lossy VP8: 3-byte frame tag, start code, 16-bit dims
    vp8 = riff(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + struct.pack("<H", 320) + struct.pack("<H", 240) + b"\x00" * 8)
    h = parse_image_header(vp8)
    assert h == {"width": 320, "height": 240, "channels": 3,
                 "mime": "image/webp"}
    # lossless VP8L: packed 14+14-bit minus-one dims + alpha_is_used
    bits = (199) | (99 << 14)  # 200 x 100, alpha bit clear
    vp8l = riff(b"VP8L", b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8)
    h = parse_image_header(vp8l)
    assert (h["width"], h["height"], h["channels"], h["mime"]) == (
        200, 100, 3, "image/webp")
    vp8l_a = riff(
        b"VP8L", b"\x2f" + struct.pack("<I", bits | (1 << 28)) + b"\x00" * 8
    )
    assert parse_image_header(vp8l_a)["channels"] == 4
    # extended VP8X: 24-bit minus-one canvas dims; ALPHA flag is 0x10
    def vp8x(flags):
        return riff(
            b"VP8X",
            bytes([flags]) + b"\x00\x00\x00"
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
            + b"\x00" * 4,
        )
    h = parse_image_header(vp8x(0))
    assert (h["width"], h["height"], h["channels"]) == (640, 480, 3)
    assert parse_image_header(vp8x(0x10))["channels"] == 4
    # truncated/garbage RIFF -> None, not a crash
    assert parse_image_header(b"RIFF\x04\x00\x00\x00WEBPxxxx" + b"\x00" * 20) is None


def test_parse_image_header_tiff_both_byte_orders():
    import struct

    from sparkall_spark.operators.multimodal import parse_image_header

    def tiff(bo):
        e, fmt = ("<", b"II*\x00") if bo == "little" else (">", b"MM\x00*")
        entries = [
            (256, 3, 1, 800),  # ImageWidth SHORT
            (257, 4, 1, 600),  # ImageLength LONG
            (277, 3, 1, 3),    # SamplesPerPixel
        ]
        ifd = struct.pack(e + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if typ == 3:
                packed = struct.pack(e + "H", val) + b"\x00\x00"
            else:
                packed = struct.pack(e + "I", val)
            ifd += struct.pack(e + "HHI", tag, typ, cnt) + packed
        ifd += struct.pack(e + "I", 0)
        return fmt + struct.pack(e + "I", 8) + ifd

    for bo in ("little", "big"):
        h = parse_image_header(tiff(bo))
        assert h == {"width": 800, "height": 600, "channels": 3,
                     "mime": "image/tiff"}, bo
    assert parse_image_header(b"II*\x00\xff\xff\xff\xff") is None


def test_parse_image_header_tiff_offset_stored_values():
    """A tag whose total value size exceeds 4 bytes stores an OFFSET in
    the value field; the header parser must dereference it (it used to
    read the offset itself as the dimension)."""
    import struct

    from sparkall_spark.operators.multimodal import parse_image_header

    for bo in ("little", "big"):
        e, magic = ("<", b"II*\x00") if bo == "little" else (">", b"MM\x00*")
        n = 3
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * n + 4
        width_vals = struct.pack(e + "HHH", 800, 1, 2)  # SHORT x3: 6 bytes
        height_vals = struct.pack(e + "II", 600, 9)  # LONG x2: 8 bytes
        w_off = data_off
        h_off = w_off + len(width_vals)
        ifd = struct.pack(e + "H", n)
        ifd += struct.pack(e + "HHII", 256, 3, 3, w_off)
        ifd += struct.pack(e + "HHII", 257, 4, 2, h_off)
        ifd += struct.pack(e + "HHI", 277, 3, 1)
        ifd += struct.pack(e + "H", 3) + b"\x00\x00"  # inline, left-justified
        ifd += struct.pack(e + "I", 0)
        payload = (
            magic + struct.pack(e + "I", ifd_off) + ifd
            + width_vals + height_vals
        )
        h = parse_image_header(payload)
        assert h == {"width": 800, "height": 600, "channels": 3,
                     "mime": "image/tiff"}, bo


def _tiff_bytes(w, h, pixels, photometric=1, spp=1, bo="little",
                compression=1, n_strips=2):
    """Minimal stripped TIFF writer (8-bit), independent of the reader."""
    import struct

    e = "<" if bo == "little" else ">"
    magic = b"II*\x00" if bo == "little" else b"MM\x00*"
    raw = bytes(pixels)
    rows_per_strip = max(1, h // n_strips)
    strips = []
    r = 0
    while r < h:
        rr = min(rows_per_strip, h - r)
        strips.append(raw[r * w * spp : (r + rr) * w * spp])
        r += rr
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
        (259, 3, 1, compression), (262, 3, 1, photometric),
        (277, 3, 1, spp), (278, 3, 1, rows_per_strip),
    ]
    n = len(entries) + 2  # + StripOffsets + StripByteCounts
    ifd_off = 8
    ifd_size = 2 + 12 * n + 4
    arrays_off = ifd_off + ifd_size
    counts = [len(s) for s in strips]
    k = len(strips)
    co_off = arrays_off
    so_off = arrays_off + 4 * k
    data_off = so_off + 4 * k
    offsets, pos = [], data_off
    for c in counts:
        offsets.append(pos)
        pos += c
    def entry(tag, typ, cnt, val):
        if typ == 3 and cnt == 1:
            return struct.pack(e + "HHIHxx", tag, typ, cnt, val)
        return struct.pack(e + "HHII", tag, typ, cnt, val)
    all_entries = entries + [(279, 4, k, co_off), (273, 4, k, so_off)]
    all_entries.sort()
    ifd = struct.pack(e + "H", n)
    for t in all_entries:
        ifd += entry(*t)
    ifd += struct.pack(e + "I", 0)
    body = ifd
    body += b"".join(struct.pack(e + "I", c) for c in counts)
    body += b"".join(struct.pack(e + "I", o) for o in offsets)
    body += b"".join(strips)
    return magic + struct.pack(e + "I", ifd_off) + body


def test_tiff_pixel_decode_real():
    import numpy as np

    from sparkall_spark.operators.multimodal import decode_pixels

    w, h = 6, 4
    gray = list(range(w * h))
    for bo in ("little", "big"):
        px = decode_pixels(_tiff_bytes(w, h, gray, bo=bo))
        assert px is not None and px.shape == (h, w)
        assert px.flatten().tolist() == [float(v) for v in gray], bo
    # WhiteIsZero inverts
    inv = decode_pixels(_tiff_bytes(w, h, gray, photometric=0))
    assert inv.flatten().tolist() == [255.0 - v for v in gray]
    # RGB -> Rec.601 luma
    rgb = []
    for i in range(w * h):
        rgb += [255, 0, 0]  # pure red
    px = decode_pixels(_tiff_bytes(w, h, rgb, photometric=2, spp=3))
    assert np.allclose(px, 255 * 0.299, atol=0.01)
    # compressed flavors stay honestly undecoded
    assert decode_pixels(_tiff_bytes(w, h, gray, compression=5)) is None
