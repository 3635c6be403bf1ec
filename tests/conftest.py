import math
import numbers
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARKALL_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from sparkall_spark.session import get_spark

    s = get_spark(
        "sparkall-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # roomy heap: a full-suite session accumulates broadcast +
            # codegen state across ~170 tests
            "spark.driver.memory": "8g",
            "spark.sql.warehouse.dir": "/tmp/sparkall_test_warehouse",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(autouse=True, scope="module")
def _clear_cache_between_modules(request):
    """Operators persist() intermediates (minhash, graph); drop them
    between modules so a long full-suite run doesn't accumulate cache
    on the small test driver."""
    yield
    if "spark" in request.fixturenames or True:
        from pyspark.sql import SparkSession

        active = SparkSession.getActiveSession()
        if active is not None:
            active.catalog.clearCache()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize_value(v):
    if isinstance(v, float):
        return 0.0 if (not math.isfinite(v)) else round(v, 6)
    # list-valued columns: DuckDB's fetchdf yields np.ndarray, Spark
    # yields list — normalize both to tuples with rounded floats so the
    # generic tuple comparison below works elementwise
    if hasattr(v, "tolist") and not hasattr(v, "timestamp"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize_value(e) for e in v)
    return v


def _normalize(rows, colnames):
    """Column-name-sorted, row-sorted, float-rounded tuples (mirrors the
    driver's order-insensitive value-hash comparison)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        out.append(tuple(_normalize_value(row[i]) for i in order))
    out.sort(key=lambda t: tuple(("" if v is None else str(v)) for v in t))
    return out


def assert_matches_oracle(spark_df, duck_con, sql, check_order=False,
                          approx_floats=False):
    """Compare a Spark result against a DuckDB oracle the way the driver
    does: column-name-sorted, row-sorted, floats rounded to 6dp, then
    EXACT equality.  The driver hashes the 6dp-normalized values, so an
    epsilon here would hide driver-visible mismatches (r3's q06 rounding
    tie passed locally at rel_tol=1e-6 but failed the driver hash).

    ``approx_floats=True`` restores a rel_tol=1e-6 comparison — for
    tests of genuinely unrounded float pipelines (iterative aggregates
    etc.) where the test itself doesn't round and 6dp normalization can
    straddle a boundary.  Driver-gated entries must NOT need it: they
    round explicitly in both the entry and the oracle.
    """
    sdf = spark_df.toPandas()
    odf = duck_con.execute(sql).fetchdf()
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in odf.columns
    ), f"schema mismatch: spark={list(sdf.columns)} oracle={list(odf.columns)}"
    s_rows = _normalize(sdf.itertuples(index=False, name=None), list(sdf.columns))
    o_rows = _normalize(odf.itertuples(index=False, name=None), list(odf.columns))
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows)
        if not _rows_equal(a, b, approx_floats=approx_floats)
    ]
    assert not mismatches, f"value mismatch, first: {mismatches[0]}"


def _is_float_kind(v):
    # np.float64 subclasses float, so this covers pandas/duckdb floats.
    return isinstance(v, float)


def _is_int_kind(v):
    # np.int64 is NOT a Python int but IS numbers.Integral; exclude bool.
    return isinstance(v, numbers.Integral) and not isinstance(v, bool)


def _rows_equal(a, b, approx_floats=False):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        # The driver's value hash stringifies per-type, so 322 (BIGINT)
        # vs 322.0 (DuckDB HUGEINT drifting to float64 via fetchdf) is a
        # driver-visible mismatch even though Python's 322 == 322.0 is
        # True.  r4's e23 red row slipped through exactly here — treat
        # int-kind vs float-kind as a mismatch, always.
        if (_is_float_kind(x) and _is_int_kind(y)) or (
            _is_int_kind(x) and _is_float_kind(y)
        ):
            return False
        if isinstance(x, float) and isinstance(y, float):
            if approx_floats:
                if not math.isclose(x, y, rel_tol=1e-6, abs_tol=1e-9):
                    return False
            elif x != y and not (math.isnan(x) and math.isnan(y)):
                return False
        elif hasattr(x, "timestamp") and hasattr(y, "timestamp"):
            if str(x) != str(y):
                return False
        else:
            if x != y and str(x) != str(y):
                return False
    return True
