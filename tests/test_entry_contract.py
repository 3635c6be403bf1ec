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
