"""Mimic the driver's verify: run every queries() entry at sf0.01 and
compare against its oracle_sql() via DuckDB (row count + schema + order-
insensitive values).  This is the strongest local signal that
CORRECTNESS_r{N}.json will come back green."""

import duckdb
import pytest

import __spark_entry__ as E
from tests.conftest import TABLES, assert_matches_oracle

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


ALL = sorted(E.queries().items())
ORACLES = E.oracle_sql()


@pytest.mark.parametrize("name", [n for n, _ in ALL])
def test_query_against_oracle(spark, duck01, name):
    df = E.queries()[name](spark, SF_DIR)
    assert name in ORACLES, f"{name} has no oracle — every entry must be checkable"
    assert_matches_oracle(df, duck01, ORACLES[name])


def test_every_query_has_an_oracle():
    assert set(ORACLES) == {n for n, _ in ALL}


# --- regression: the r3 q06 rounding tie -----------------------------------
# The r3 entry BINDed ROUND(ep*(1-d), 2); inputs carry <=2 decimal digits
# each so the product has <=4, and rows landing exactly on .xx5 are
# rounding TIES where Spark (HALF_UP on the decimal string) and DuckDB
# (round on the binary double) legitimately disagree.  r3's conftest
# compared floats at rel_tol=1e-6 and passed locally while the driver's
# exact value hash failed.  These two tests pin both halves of the fix:
# exact comparison now catches the 2dp entry, and the repaired 6dp entry
# is tie-free.

_Q06_2DP = """
SELECT ?name ?disc_price WHERE {
    ?l a sa:Lineitem ; sa:extendedprice ?ep ; sa:discount ?d ;
       sa:part ?p .
    ?p a sa:Part ; sa:name ?name .
    FILTER regex(?name, "%ol%")
    FILTER rlike(?name, "^[a-z]+ [a-z]+$")
    BIND(ROUND(?ep * (1 - ?d), 2) AS ?disc_price)
    FILTER (?disc_price > 50000)
}
"""

_Q06_2DP_ORACLE = """
SELECT p_name AS name,
       round(l_extendedprice * (1 - l_discount), 2) AS disc_price
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_name LIKE '%ol%'
  AND regexp_matches(p_name, '^[a-z]+ [a-z]+$')
  AND round(l_extendedprice * (1 - l_discount), 2) > 50000
"""


def test_r3_q06_tie_prone_entry_now_fails_locally(spark, duck01):
    """The exact r3 entry shape must FAIL the tightened local contract
    (it failed the driver hash in CORRECTNESS_r03) — proving the local
    suite now predicts the driver's verdict for this bug class."""
    from sparkall_spark.engine import Engine
    from sparkall_spark.fixtures import PREFIX_BLOCK, tpch_mappings

    df = Engine(spark, tpch_mappings(SF_DIR)).sparql(PREFIX_BLOCK + _Q06_2DP)
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(df, duck01, _Q06_2DP_ORACLE)
    # ...and the old epsilon comparison masks it, which is exactly how
    # r3 shipped the bug:
    assert_matches_oracle(df, duck01, _Q06_2DP_ORACLE, approx_floats=True)


# --- regression: the r4 e23 type drift -------------------------------------
# The r4 e23 oracle's start_offset was sum(BIGINT) OVER (...), which
# DuckDB types as HUGEINT; fetchdf() materializes HUGEINT as float64, so
# the driver's per-type value hash saw 322.0 vs the entry's 322 and went
# red — while Python's cross-type 322 == 322.0 let the local suite pass.
# Pin both halves: the uncast oracle must now FAIL locally (int-kind vs
# float-kind is a mismatch), and the CAST-repaired e23 oracle passes.

def _e23_oracle_uncast():
    """The exact r4 oracle shape: windowed sum without the outer CAST."""
    fixed = E.oracle_sql()["e23_split_pack"]
    assert "CAST(start_offset AS BIGINT)" in fixed, (
        "e23 oracle lost its HUGEINT repair cast"
    )
    return fixed.replace(
        "CAST(start_offset AS BIGINT) AS start_offset", "start_offset"
    )


def test_r4_e23_uncast_windowed_sum_now_fails_locally(spark, duck01):
    df = E.queries()["e23_split_pack"](spark, SF_DIR)
    with pytest.raises(AssertionError, match="value mismatch"):
        assert_matches_oracle(df, duck01, _e23_oracle_uncast())


def test_int_vs_float_kind_is_a_mismatch():
    """Unit-pin the comparison itself, incl. the numpy dtypes fetchdf
    actually produces (np.int64 is not a Python int; np.float64 IS a
    Python float subclass)."""
    import numpy as np

    from tests.conftest import _rows_equal

    assert not _rows_equal((322,), (322.0,))
    assert not _rows_equal((np.int64(322),), (np.float64(322.0),))
    assert not _rows_equal((322.0,), (np.int64(322),))
    assert _rows_equal((np.int64(322),), (322,))
    assert _rows_equal((np.float64(1.5),), (1.5,))
    # bools must not be caught by the Integral check
    assert _rows_equal((True,), (True,))


# ---------------------------------------------------------------------------
# Bench emission contract (r5 VERDICT item 1): the driver keeps only a
# ~2 KB tail of bench.py's stdout and parses the JSON line out of it.
# Round 5's record was lost because prose notes embedded in the JSON
# line pushed its head past the capture window.  Pin the line size and
# round-trip the driver's capture exactly.

def _worst_case_bench_line() -> str:
    import bench

    # worst case: every entry takes a 4-digit-seconds time with full
    # millisecond precision — longer values than any real run
    timings = {name: 9999.999 for name in bench.BENCH_QUERIES}
    medians = {name: 9999.999 for name in bench.BENCH_QUERIES}
    return bench.build_json_line(
        timings, medians, "0.1", calib=9999.999, calib_end=9999.999
    )


def test_bench_json_line_fits_driver_tail_capture():
    line = _worst_case_bench_line()
    assert len(line.encode()) < 1800, (
        f"bench stdout JSON is {len(line)} bytes; the driver captures "
        "only ~2 KB of stdout tail — move prose to BENCH_NOTES.md"
    )


def test_bench_json_line_parses_from_tail_capture():
    import json

    line = _worst_case_bench_line()
    # simulate prior stderr-free stdout noise + the driver's tail slice
    captured = ("# some earlier stdout line\n" + line + "\n")[-2048:]
    parsed = None
    for cand in captured.strip().splitlines():
        try:
            parsed = json.loads(cand)
        except json.JSONDecodeError:
            continue
    assert parsed is not None, "driver-style tail parse failed"
    assert parsed["metric"] == "headline_queries_total"
    assert set(parsed) == {
        "metric", "value", "unit", "queries", "median_total",
        "unchanged_entries_total", "sf", "calib", "calib_end",
    }
    import bench

    assert set(parsed["queries"]) == set(bench.BENCH_QUERIES)
    # no prose fields may ever come back
    assert "notes" not in parsed and "variance_note" not in parsed


def test_e04_pinned_fingerprints_match_decode():
    """The committed _E04_PINNED_FPS constants (the e04 oracle's
    literal side) must equal what the live decode_pixels+dhash64 path
    produces over the fixture images.  If this fails after a
    DELIBERATE fixture/hash change, regenerate the constants with
    ``python -c "import __spark_entry__ as E; print(E._e04_fingerprints())"``
    and update _E04_PINNED_FPS; if it fails after any other change, the
    decode/hash regressed — fix the code, not the constants."""
    import __spark_entry__ as E

    assert E._e04_fingerprints() == E._E04_PINNED_FPS
