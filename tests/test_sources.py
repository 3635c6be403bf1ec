"""Source registry coverage: csv, json, orc readers feeding the engine;
multi-format union for one star; unknown-type error."""

import pytest

from tests.conftest import assert_matches_oracle

from sparkall_spark.engine import Engine
from sparkall_spark.fixtures import NS
from sparkall_spark.mappings import EntityMapping, MappingIndex
from sparkall_spark.sources import load_source


@pytest.fixture(scope="module")
def staged(spark, sf_dir, tmp_path_factory):
    """Stage the nation table as csv, json, and orc."""
    root = tmp_path_factory.mktemp("fmt")
    df = spark.read.parquet(f"{sf_dir}/nation.parquet")
    paths = {}
    for fmt in ("csv", "json", "orc"):
        p = str(root / fmt)
        w = df.coalesce(1).write.mode("overwrite")
        if fmt == "csv":
            w.option("header", "true").csv(p)
        elif fmt == "json":
            w.json(p)
        else:
            w.orc(p)
        paths[fmt] = p
    return paths


def _nation_mapping(path: str, fmt: str, name: str = "Nation") -> EntityMapping:
    return EntityMapping(
        name=name,
        source=path,
        source_type=fmt,
        id_attr="n_nationkey",
        predicates={NS + "name": "n_name", NS + "region": "n_regionkey"},
        class_iri=NS + "Nation",
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_format_roundtrip_through_engine(spark, duck, staged, fmt):
    engine = Engine(spark, MappingIndex([_nation_mapping(staged[fmt], fmt)]))
    df = engine.sparql(
        f"""
        PREFIX sa: <{NS}>
        SELECT ?n ?name WHERE {{
            ?n a sa:Nation ; sa:name ?name ; sa:region ?r .
            FILTER (?r != 0)
        }}
        """
    )
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT n_nationkey AS n, n_name AS name
        FROM nation WHERE n_regionkey <> 0
        """,
    )


def test_mixed_format_union_star(spark, duck, staged):
    """One star served by a csv source AND a json source -> union
    (the reference's multi-source scenario spans actual stores;
    here two file formats prove the same dispatch+union path)."""
    idx = MappingIndex(
        [
            _nation_mapping(staged["csv"], "csv", "NationCsv"),
            _nation_mapping(staged["json"], "json", "NationJson"),
        ]
    )
    df = Engine(spark, idx).sparql(
        f"""
        PREFIX sa: <{NS}>
        SELECT ?name WHERE {{ ?n a sa:Nation ; sa:name ?name ; sa:region ?r . }}
        """
    )
    assert_matches_oracle(
        df,
        duck,
        "SELECT n_name AS name FROM nation UNION ALL SELECT n_name AS name FROM nation",
    )


def test_unknown_source_type(spark):
    bad = _nation_mapping("/nope", "carrier_pigeon")
    with pytest.raises(ValueError, match="unknown source type"):
        load_source(spark, bad)


def test_csv_schema_inference_types(spark, staged):
    df = load_source(spark, _nation_mapping(staged["csv"], "csv"))
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["n_nationkey"] == "int"
    assert kinds["n_name"] == "string"
