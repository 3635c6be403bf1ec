"""Property-based checks of the r9 portable-arithmetic contracts.

These run against DuckDB + pure-Python references only (no Spark
session), so hypothesis can afford real example counts.  The
Spark-side equality to each SQL rendering is pinned separately
(test_zorder/test_quantize/test_sketches); together the two layers say
Spark == SQL == the documented formula.
"""

import math

import duckdb
from hypothesis import given, settings, strategies as st

from sparkall_spark.operators.quantize import quantize_sql
from sparkall_spark.operators.sketches import (
    _CMS_ROW_SALT,
    _CMS_ROW_STRIDE,
)
from sparkall_spark.operators.sampling import _A1, _A2, _B1, _M
from sparkall_spark.sources.sinks import zorder_key_sql


def _morton_ref(vals: list[int], bits: int) -> int:
    n = len(vals)
    key = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            key |= ((v >> i) & 1) << (i * n + j)
    return key


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, (1 << 16) - 1), min_size=2, max_size=3),
        min_size=1,
        max_size=8,
    ).filter(lambda rows: len({len(r) for r in rows}) == 1),
    st.integers(4, 16),
)
def test_zorder_key_sql_is_morton(rows, bits):
    n = len(rows[0])
    cols = [f"c{j}" for j in range(n)]
    vals = ", ".join(
        "(" + ", ".join(str(v & ((1 << bits) - 1)) for v in r) + ")"
        for r in rows
    )
    sql = zorder_key_sql(cols, bits)
    got = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {sql} FROM (VALUES {vals}) t({', '.join(cols)})"
        ).fetchall()
    ]
    want = [
        _morton_ref([v & ((1 << bits) - 1) for v in r], bits) for r in rows
    ]
    assert got == want


def _quantize_ref(vec: list[float]) -> list[int]:
    mx = max(abs(x) for x in vec) if vec else 0.0
    s = mx / 127.0
    if s <= 0:  # includes subnormal-absmax underflow (see quantize.py)
        return [0] * len(vec)
    return [
        max(-127, min(127, math.floor(x / s + 0.5))) for x in vec
    ]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=16,
    )
)
def test_quantize_sql_is_the_documented_formula(vec):
    lit = "[" + ", ".join(repr(float(x)) for x in vec) + "]::DOUBLE[]"
    got = duckdb.sql(f"SELECT {quantize_sql(lit)}").fetchone()[0]
    assert list(got) == _quantize_ref(vec)
    # structural: codes in range, absmax hits +/-127 for nonzero input
    assert all(-127 <= q <= 127 for q in got)
    if max(abs(x) for x in vec) / 127.0 > 0:
        assert max(abs(q) for q in got) == 127


def _mix_ref(x: int, seed: int) -> int:
    h = (abs(x) + seed) % _M
    h = (h * _A1 + _B1) % _M
    return (h * _A2) % _M


def _poly_ref(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % 1_000_000_007
    return acc


@settings(max_examples=60, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FA1),
        min_size=0,
        max_size=24,
    ),
    st.integers(0, 3),
    st.sampled_from([64, 1024, 4096]),
)
def test_cms_bucket_sql_is_the_documented_chain(s, d, width):
    """CMS row-d bucket == LCG-mix(poly(s), seed_d) % width, for any
    unicode string — the cross-engine addressing contract."""
    from sparkall_spark.operators.sketches import _cms_bucket_sql

    lit = "'" + s.replace("'", "''") + "'"
    got = duckdb.sql(f"SELECT {_cms_bucket_sql(lit, d, width)}").fetchone()[0]
    want = _mix_ref(_poly_ref(s), d * _CMS_ROW_STRIDE + _CMS_ROW_SALT) % width
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 55),
    st.integers(2, 6),
    st.integers(2, 6),
)
def test_dhash_is_brightness_shift_invariant(seed, shift, hmul, wmul):
    """dHash compares neighboring block MEANS, so a uniform brightness
    shift (no clipping) preserves every comparison bit — the exact
    invariance the e04 driver fixture's planted near-dups rely on."""
    import numpy as np

    from sparkall_spark.operators.multimodal import dhash64

    rng = np.random.default_rng(seed)
    a = rng.integers(0, 200, size=(8 * hmul, 8 * wmul), dtype=np.uint8)
    assert dhash64(a) == dhash64((a.astype(np.int16) + shift).astype(np.uint8))


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 0xFFFF),
    st.integers(1, 0xFFFF),
    st.integers(1, 16),
    st.booleans(),
    st.booleans(),
)
def test_tiff_header_inline_and_offset_agree(w, h, spp, big_endian, offset_store):
    """parse_image_header must read the same dimensions whether a tag's
    value is inline (<=4 bytes) or offset-stored (the count>1 layout
    that used to be misread as the value itself)."""
    import struct

    from sparkall_spark.operators.multimodal import parse_image_header

    e, magic = (">", b"MM\x00*") if big_endian else ("<", b"II*\x00")
    n = 3
    data_off = 8 + 2 + 12 * n + 4
    tail = b""
    ifd = struct.pack(e + "H", n)
    for tag, val in ((256, w), (257, h), (277, spp)):
        if offset_store:
            # SHORT x3, first element is the value -> stored at offset
            ifd += struct.pack(e + "HHII", tag, 3, 3, data_off + len(tail))
            tail += struct.pack(e + "HHH", val, 1, 2)
        else:
            ifd += struct.pack(e + "HHI", tag, 3, 1)
            ifd += struct.pack(e + "H", val) + b"\x00\x00"
    ifd += struct.pack(e + "I", 0)
    payload = magic + struct.pack(e + "I", 8) + ifd + tail
    got = parse_image_header(payload)
    assert got == {"width": w, "height": h, "channels": spp,
                   "mime": "image/tiff"}
