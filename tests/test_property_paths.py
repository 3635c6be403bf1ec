"""Property paths (extension): sequence ``p1/p2`` and inverse ``^p``
desugar into fresh-variable triple chains at parse time, so stars,
planner, and both backends see ordinary BGPs (no new executor code).
"""

import pytest

from sparkall_spark import Engine
from sparkall_spark.fixtures import PREFIX_BLOCK, tpch_mappings
from sparkall_spark.plans.parser import SparqlParseError, parse_sparql
from tests.conftest import assert_matches_oracle


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    return Engine(spark, tpch_mappings(sf_dir))


def test_sequence_path_desugars_to_chain():
    q = parse_sparql(
        PREFIX_BLOCK
        + "SELECT ?rk WHERE { ?c a sa:Customer ; sa:nation/sa:region ?rk . }"
    )
    # intermediate star introduced, customer joins through it
    inter = [s for s in q.stars if s.startswith("__pp")]
    assert len(inter) == 1
    assert set(q.stars) == {"c", inter[0]}
    preds = {t.predicate.rsplit("/", 1)[-1] for t in q.stars[inter[0]].triples}
    assert preds == {"region"}


def test_inverse_path_swaps_roles():
    q = parse_sparql(
        PREFIX_BLOCK + "SELECT ?c WHERE { ?n a sa:Nation . ?n ^sa:nation ?c . }"
    )
    # ^sa:nation makes ?c the subject of the nation triple
    assert "c" in q.stars
    assert any(
        t.predicate.endswith("nation") and t.obj == "n"
        for t in q.stars["c"].triples
    )


def test_path_rejects_rdf_type_and_literal_object():
    with pytest.raises(SparqlParseError, match="rdf:type"):
        parse_sparql(
            PREFIX_BLOCK + "SELECT ?x WHERE { ?c a/sa:name ?x . }"
        )
    with pytest.raises(SparqlParseError, match="variable"):
        parse_sparql(
            PREFIX_BLOCK
            + 'SELECT ?c WHERE { ?c sa:nation/sa:name "FRANCE" . }'
        )


_SEQ_QUERY = (
    PREFIX_BLOCK
    + """
    SELECT ?cname ?rk WHERE {
        ?c a sa:Customer ; sa:name ?cname ; sa:nation/sa:region ?rk .
    }
    """
)

_SEQ_ORACLE = """
SELECT c_name AS cname, n_regionkey AS rk
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


def test_sequence_path_matches_oracle(engine, duck):
    assert_matches_oracle(engine.sparql(_SEQ_QUERY), duck, _SEQ_ORACLE)


def test_sequence_path_backends_agree(engine):
    a = sorted(map(tuple, engine.sparql(_SEQ_QUERY).collect()))
    b = sorted(map(tuple, engine.sparql(_SEQ_QUERY, backend="sql").collect()))
    assert a == b and len(a) > 0


def test_inverse_path_matches_oracle(engine, duck):
    q = (
        PREFIX_BLOCK
        + """
        SELECT ?nname (COUNT(*) AS ?n) WHERE {
            ?n a sa:Nation ; sa:name ?nname .
            ?n ^sa:nation ?c .
            ?c a sa:Customer .
        } GROUP BY ?nname ORDER BY ?nname
        """
    )
    oracle = """
    SELECT n_name AS nname, count(*) AS n
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY nname
    """
    assert_matches_oracle(engine.sparql(q), duck, oracle, check_order=True)


def test_ask_query_form(engine):
    """ASK (extension): one boolean row, true iff solutions exist."""
    q_true = (
        PREFIX_BLOCK
        + 'ASK WHERE { ?p a sa:Part ; sa:size ?s . FILTER (?s > 30) }'
    )
    q_false = (
        PREFIX_BLOCK
        + 'ASK { ?p a sa:Part ; sa:size ?s . FILTER (?s > 1000000) }'
    )
    for q, expected in [(q_true, True), (q_false, False)]:
        for backend in ("dataframe", "sql"):
            rows = engine.sparql(q, backend=backend).collect()
            assert len(rows) == 1
            assert rows[0]["ask"] is expected, (q, backend)


def test_ask_over_union(engine):
    """ASK over UNION: true iff ANY branch has a solution — both
    backends (r4; advisor finding: the union early-return previously
    bypassed the ask probe)."""
    q_true = (
        PREFIX_BLOCK
        + """
        ASK WHERE {
            { ?p a sa:Part ; sa:size ?s . FILTER (?s > 1000000) }
            UNION
            { ?c a sa:Customer ; sa:acctbal ?b . FILTER (?b > 9000) }
        }
        """
    )
    q_false = (
        PREFIX_BLOCK
        + """
        ASK WHERE {
            { ?p a sa:Part ; sa:size ?s . FILTER (?s > 1000000) }
            UNION
            { ?c a sa:Customer ; sa:acctbal ?b . FILTER (?b > 1000000000) }
        }
        """
    )
    for q, expected in [(q_true, True), (q_false, False)]:
        for backend in ("dataframe", "sql"):
            rows = engine.sparql(q, backend=backend).collect()
            assert len(rows) == 1
            assert rows[0]["ask"] is expected, (backend, expected)


def test_or_filter_desugars_to_in(engine, duck):
    q = (
        PREFIX_BLOCK
        + """
        SELECT ?name ?size WHERE {
            ?p a sa:Part ; sa:name ?name ; sa:size ?size .
            FILTER (?size = 1 || ?size = 7 || ?size = 42)
        }
        """
    )
    oracle = """
    SELECT p_name AS name, p_size AS size FROM part
    WHERE p_size IN (1, 7, 42)
    """
    assert_matches_oracle(engine.sparql(q), duck, oracle)
    a = sorted(map(tuple, engine.sparql(q).collect()))
    b = sorted(map(tuple, engine.sparql(q, backend="sql").collect()))
    assert a == b


def test_or_filter_rejects_mixed_shapes():
    with pytest.raises(SparqlParseError, match="share one variable"):
        parse_sparql(
            PREFIX_BLOCK
            + "SELECT ?p WHERE { ?p a sa:Part ; sa:size ?s ; sa:retailprice ?r ."
            + " FILTER (?s = 1 || ?r = 2) }"
        )
    with pytest.raises(SparqlParseError, match="&&"):
        parse_sparql(
            PREFIX_BLOCK
            + "SELECT ?p WHERE { ?p a sa:Part ; sa:size ?s ."
            + " FILTER (?s = 1 || ?s = 2 && ?s = 3) }"
        )


def test_var_to_var_filter(engine, duck):
    """FILTER (?a < ?b) across stars: applied post-join in both backends."""
    q = (
        PREFIX_BLOCK
        + """
        SELECT ?name ?disc ?tax WHERE {
            ?l a sa:Lineitem ; sa:discount ?disc ; sa:tax ?tax ; sa:part ?p .
            ?p a sa:Part ; sa:name ?name .
            FILTER (?disc < ?tax)
        }
        """
    )
    oracle = """
    SELECT p_name AS name, l_discount AS disc, l_tax AS tax
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_discount < l_tax
    """
    assert_matches_oracle(engine.sparql(q), duck, oracle)
    a = sorted(map(tuple, engine.sparql(q).collect()))
    b = sorted(map(tuple, engine.sparql(q, backend="sql").collect()))
    assert a == b and len(a) > 0
