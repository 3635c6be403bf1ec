from pathlib import Path

from tests.conftest import assert_matches_oracle

from sparkall_spark.engine import Engine
from sparkall_spark.mappings import SourceCatalog, load_rml
from sparkall_spark.plans.model import Star, Triple

DATA = Path(__file__).parent / "data"
NS = "http://sparkall.io/ns/"


def test_load_rml_structure():
    idx = load_rml(DATA / "test_mappings.ttl")
    by_name = {m.name: m for m in idx.mappings}
    assert set(by_name) == {"Customer", "Nation"}
    c = by_name["Customer"]
    assert c.source_type == "parquet"
    assert c.source.endswith("customer.parquet")
    assert c.id_attr == "c_custkey"
    assert c.class_iri == NS + "Customer"
    assert c.predicates[NS + "name"] == "c_name"
    assert c.predicates[NS + "nation"] == "c_nationkey"


def test_rml_with_config_merge():
    catalog = SourceCatalog.from_json(DATA / "test_config.json")
    idx = load_rml(DATA / "test_mappings.ttl", catalog)
    by_name = {m.name: m for m in idx.mappings}
    assert by_name["Customer"].options.get("mergeSchema") == "false"
    assert by_name["Nation"].broadcast is True


def test_relevant_sources_set_containment():
    idx = load_rml(DATA / "test_mappings.ttl")
    star = Star(
        "c",
        [Triple("c", NS + "name", "n", True)],
        class_iri=NS + "Customer",
    )
    assert [m.name for m in idx.relevant_sources(star)] == ["Customer"]
    # a predicate nobody maps -> no relevant source
    star2 = Star("c", [Triple("c", NS + "nope", "x", True)], class_iri=None)
    assert idx.relevant_sources(star2) == []
    # without a class constraint, any covering mapping is relevant
    star3 = Star("s", [Triple("s", NS + "name", "x", True)])
    assert {m.name for m in idx.relevant_sources(star3)} == {"Customer", "Nation"}


def test_engine_from_rml_end_to_end(spark, duck):
    engine = Engine.from_rml(
        spark, DATA / "test_mappings.ttl", DATA / "test_config.json"
    )
    df = engine.sparql(
        f"""
        PREFIX sa: <{NS}>
        SELECT ?cname ?nname WHERE {{
            ?c a sa:Customer ; sa:name ?cname ; sa:nation ?n .
            ?n a sa:Nation ; sa:name ?nname .
        }}
        """
    )
    assert_matches_oracle(
        df,
        duck,
        """
        SELECT c_name AS cname, n_name AS nname
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        """,
    )


def test_parse_reference_style_rml(tmp_path):
    """The loader handles the reference's RML dialect (mappings.ttl
    shapes: nosql:store URIs, //Table sources, FnO blocks ignored)."""
    ttl = """
@prefix rr: <http://www.w3.org/ns/r2rml#>
@prefix rml: <http://semweb.mmlab.be/ns/rml#>
@prefix nosql: <http://purl.org/db/nosql#>
@prefix bsbm: <http://example.org/vocab/>
@prefix edm: <http://www.europeana.eu/schemas/edm/>

<#ProducerMapping>
	rml:logicalSource [
		rml:source "//Producer";
		nosql:store nosql:jdbc
	];
	rr:subjectMap [
		rr:template "http://example.com/{nr}";
		rr:class bsbm:Producer
	];
	rr:predicateObjectMap [
		rr:predicate edm:country;
		rr:objectMap [rml:reference "country"]
	].
"""
    p = tmp_path / "ref.ttl"
    p.write_text(ttl)
    idx = load_rml(p)
    (m,) = idx.mappings
    assert m.name == "Producer"
    assert m.source == "//Producer"
    assert m.source_type == "jdbc"
    assert m.id_attr == "nr"
    assert m.predicates == {"http://www.europeana.eu/schemas/edm/country": "country"}
