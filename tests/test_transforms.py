import pytest
from pyspark.sql import functions as F

from sparkall_spark.functions.transforms import (
    TransformError,
    apply_transform_chain,
    transform_column,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(1, "10", "abc"), (2, "20", "xbc"), (3, "bad", "abz")],
        ["id", "num", "s"],
    )


def _vals(df, col_expr, src="num"):
    return [r["out"] for r in df.select(col_expr.alias("out")).orderBy("id").collect()]


def test_toInt_nulls_on_failure(df):
    col, flt = transform_column(F.col("num"), "toInt")
    assert flt is None
    assert _vals(df, col) == [10, 20, None]


def test_scl_variants(df):
    base = F.col("num").try_cast("int")
    col, _ = transform_column(base, "scl(+5)")
    assert _vals(df, col) == [15, 25, None]
    col, _ = transform_column(base, "scl(*2)")
    assert _vals(df, col) == [20, 40, None]
    col, _ = transform_column(base, "scl(-1)")
    assert _vals(df, col) == [9, 19, None]
    # the reference's underscore spelling scl(_+61)
    col, _ = transform_column(base, "scl(_+61)")
    assert _vals(df, col) == [71, 81, None]


def test_skp_returns_filter(df):
    col, flt = transform_column(F.col("id"), "skp(2)")
    assert flt is not None
    assert [r["id"] for r in df.filter(flt).collect()] == [1, 3]


def test_substit_keeps_nonmatches(df):
    """Reference bug fixed: when().otherwise() so non-matching rows keep
    their value (SparkExecutor.scala:219-225 nulls them)."""
    col, _ = transform_column(F.col("s"), "substit(abc,zzz)")
    assert _vals(df, col) == ["zzz", "xbc", "abz"]


def test_replc(df):
    col, _ = transform_column(F.col("s"), "replc(bc,XY)")
    assert _vals(df, col) == ["aXY", "xXY", "abz"]


def test_prefix_postfix(df):
    col, _ = transform_column(F.col("s"), "prefix(P_)")
    assert _vals(df, col) == ["P_abc", "P_xbc", "P_abz"]
    col, _ = transform_column(F.col("s"), "postfix(_S)")
    assert _vals(df, col) == ["abc_S", "xbc_S", "abz_S"]


def test_chain_with_filters(df):
    col, filters = apply_transform_chain(F.col("id"), ["toInt", "scl(*10)", "skp(20)"])
    out = df.select(col.alias("v"), "id")
    for f in filters:
        out = out.filter(f)
    assert sorted(r["v"] for r in out.collect()) == [10, 30]


def test_errors():
    with pytest.raises(TransformError):
        transform_column(F.col("x"), "nope(1)")
    with pytest.raises(TransformError):
        transform_column(F.col("x"), "scl(bad)")
    with pytest.raises(TransformError):
        transform_column(F.col("x"), "substit(onlyone)")


def test_chain_skp_after_scl_engine_order(spark, sf_dir, duck):
    """Regression (r4): in the ENGINE path, skp's row filter must be
    applied before withColumn replaces the join column — applying it
    after re-resolves the filter against the transformed value and
    double-applies the upstream chain ((x+1)+1 <> 4 instead of
    (x+1) <> 4), silently dropping the wrong rows."""
    from tests.conftest import assert_matches_oracle

    from sparkall_spark.engine import Engine
    from sparkall_spark.fixtures import PREFIX_BLOCK, tpch_mappings

    engine = Engine(spark, tpch_mappings(sf_dir))
    df = engine.sparql(
        PREFIX_BLOCK
        + """
        SELECT ?cname WHERE {
            ?c a sa:Customer ; sa:name ?cname ; sa:nation ?n .
            ?n a sa:Nation .
        }
        TRANSFORM(?c?n.l.toInt.scl(+1).skp(4) && ?c?n.r.toInt.scl(+1))
        """
    )
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT c_name AS cname
        FROM customer JOIN nation
          ON (CAST(c_nationkey AS INT) + 1) = (CAST(n_nationkey AS INT) + 1)
        WHERE (CAST(c_nationkey AS INT) + 1) <> 4
        """,
    )
