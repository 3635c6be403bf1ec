"""DESCRIBE query form (SPARQL 1.1 §16.4) — r4 extension.

Well-defined under the closed mapping model: each described variable
must be a star subject, whose entity mapping fixes the full predicate
set.  The DataFrame backend unpivots each source in ONE scan; the SQL
backend renders one portable statement (per-predicate selects over a
`sol` CTE).
"""

import pytest

from sparkall_spark import Engine
from sparkall_spark.fixtures import PREFIX_BLOCK, tpch_mappings
from sparkall_spark.plans.parser import SparqlParseError, parse_sparql
from tests.conftest import assert_matches_oracle

NS = "http://sparkall.io/ns/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, tpch_mappings(sf_dir))


def test_describe_parse_and_validation():
    q = parse_sparql(
        PREFIX_BLOCK + "DESCRIBE ?n WHERE { ?n a sa:Nation ; sa:region ?r . }"
    )
    assert q.describe_vars == ["n"] and q.select_vars == ["n"]
    with pytest.raises(SparqlParseError, match="WHERE"):
        parse_sparql(PREFIX_BLOCK + "DESCRIBE <http://x>")
    with pytest.raises(SparqlParseError, match="only .variables"):
        parse_sparql(
            PREFIX_BLOCK + "DESCRIBE ?n <http://x> WHERE { ?n a sa:Nation . }"
        )
    with pytest.raises(SparqlParseError, match="star subject"):
        parse_sparql(
            PREFIX_BLOCK
            + "DESCRIBE ?r WHERE { ?n a sa:Nation ; sa:region ?r . }"
        )
    with pytest.raises(SparqlParseError, match="UNION"):
        parse_sparql(
            PREFIX_BLOCK
            + "DESCRIBE ?n WHERE { { ?n a sa:Nation . } UNION "
            "{ ?n a sa:Region . } }"
        )


def test_describe_matches_oracle(engine, duck):
    q = (
        PREFIX_BLOCK
        + """
        DESCRIBE ?n WHERE {
            ?n a sa:Nation ; sa:region ?r .
            FILTER (?r = 1)
        }
        """
    )
    oracle = f"""
    SELECT DISTINCT * FROM (
        SELECT CAST(n_nationkey AS VARCHAR) AS subject,
               '{NS}name' AS predicate, n_name AS object
        FROM nation WHERE n_regionkey = 1
        UNION ALL
        SELECT CAST(n_nationkey AS VARCHAR), '{NS}region',
               CAST(n_regionkey AS VARCHAR)
        FROM nation WHERE n_regionkey = 1
        UNION ALL
        SELECT CAST(n_nationkey AS VARCHAR), '{RDF_TYPE}', '{NS}Nation'
        FROM nation WHERE n_regionkey = 1
    )
    """
    assert_matches_oracle(engine.sparql(q), duck, oracle)
    a = sorted(map(tuple, engine.sparql(q).collect()))
    b = sorted(map(tuple, engine.sparql(q, backend="sql").collect()))
    assert a == b and len(a) == 15  # 5 nations x 3 triples
    assert engine.sparql(q).columns == ["subject", "predicate", "object"]


def test_describe_join_restricted(engine):
    """DESCRIBE a variable restricted through a join; backends agree,
    and every mapped predicate of the entity appears."""
    q = (
        PREFIX_BLOCK
        + """
        DESCRIBE ?c WHERE {
            ?c a sa:Customer ; sa:nation ?n ; sa:acctbal ?bal .
            ?n a sa:Nation ; sa:name ?nname .
            FILTER (?bal > 9000)
            FILTER (?nname = "NATION_20")
        }
        """
    )
    a = engine.sparql(q).collect()
    b = engine.sparql(q, backend="sql").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    preds = {r["predicate"] for r in a}
    assert preds == {
        NS + "name", NS + "nation", NS + "acctbal", NS + "mktsegment",
        RDF_TYPE,
    }
    # 4 predicate triples + type triple per described customer
    subjects = {r["subject"] for r in a}
    assert len(a) == 5 * len(subjects) and len(subjects) >= 1


def test_describe_multiple_variables(engine):
    """DESCRIBE ?c ?n emits both entities' descriptions in one graph."""
    q = (
        PREFIX_BLOCK
        + """
        DESCRIBE ?c ?n WHERE {
            ?c a sa:Customer ; sa:nation ?n ; sa:acctbal ?bal .
            ?n a sa:Nation .
            FILTER (?bal > 9900)
        }
        """
    )
    a = engine.sparql(q).collect()
    b = engine.sparql(q, backend="sql").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    types = {r["object"] for r in a if r["predicate"] == RDF_TYPE}
    assert types == {NS + "Customer", NS + "Nation"}
