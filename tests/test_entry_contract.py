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
