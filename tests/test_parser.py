import pytest

from sparkall_spark.plans.model import split_iri
from sparkall_spark.plans.parser import RDF_TYPE, SparqlParseError, parse_sparql
from sparkall_spark.plans.planner import plan_query

Q_BASIC = """
PREFIX sa: <http://sparkall.io/ns/>
SELECT DISTINCT ?name ?size
WHERE {
    ?p a sa:Part .
    ?p sa:name ?name .
    ?p sa:size ?size .
    FILTER (?size > 30)
}
ORDER BY ?name DESC(?size)
LIMIT 10
"""


def test_basic_parse():
    q = parse_sparql(Q_BASIC)
    assert q.distinct
    assert q.select_vars == ["name", "size"]
    assert set(q.stars) == {"p"}
    star = q.stars["p"]
    assert star.class_iri == "http://sparkall.io/ns/Part"
    assert len(star.triples) == 2
    assert len(q.filters) == 1
    f = q.filters[0]
    assert (f.var, f.op, f.value) == ("size", ">", 30)
    assert [(k.var, k.descending) for k in q.order_keys] == [
        ("name", False),
        ("size", True),
    ]
    assert q.limit == 10


def test_shared_subject_and_join():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?cname ?nname WHERE {
            ?c a sa:Customer ; sa:name ?cname ; sa:nation ?n .
            ?n a sa:Nation .
            ?n sa:name ?nname .
        }
        """
    )
    assert set(q.stars) == {"c", "n"}
    plan = plan_query(q)
    assert len(plan.join_edges) == 1
    e = plan.join_edges[0]
    assert (e.left_star, e.right_star) == ("c", "n")
    assert e.pred == "http://sparkall.io/ns/nation"
    # needed predicates pruned to used ones
    assert plan.needed_preds["c"] == {
        "http://sparkall.io/ns/name",
        "http://sparkall.io/ns/nation",
    }
    assert plan.needed_preds["n"] == {"http://sparkall.io/ns/name"}


def test_aggregates_group_order():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?flag (SUM(?qty) AS ?sum_qty) (COUNT(*) AS ?n)
        WHERE {
            ?l a sa:Lineitem .
            ?l sa:returnflag ?flag .
            ?l sa:quantity ?qty .
        }
        GROUP BY ?flag
        ORDER BY ?flag
        """
    )
    assert q.select_vars == ["flag"]
    assert [(a.fn, a.var, a.alias) for a in q.aggregations] == [
        ("sum", "qty", "sum_qty"),
        ("count", "*", "n"),
    ]
    assert q.group_by == ["flag"]


def test_filters_string_regex_and_conjunction():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?p a sa:Part .
            ?p sa:name ?name .
            ?p sa:brand ?brand .
            ?p sa:size ?size .
            FILTER (?brand = "Brand#1" && ?size <= 20)
            FILTER regex(?name, "%green%")
        }
        """
    )
    ops = {(f.var, f.op) for f in q.filters}
    assert ops == {("brand", "="), ("size", "<="), ("name", "regex")}
    regex_f = next(f for f in q.filters if f.op == "regex")
    assert regex_f.value == "%green%"


def test_transform_clause():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?c a sa:Customer . ?c sa:name ?name . ?c sa:nation ?n .
            ?n a sa:Nation .
        }
        TRANSFORM(?c?n.l.toInt.scl(+1) && ?c?n.r.toInt)
        """
    )
    assert len(q.transforms) == 2
    t0, t1 = q.transforms
    assert (t0.left_var, t0.right_var, t0.side) == ("c", "n", "l")
    assert t0.functions == ("toInt", "scl(+1)")
    assert (t1.side, t1.functions) == ("r", ("toInt",))


def test_optional_block():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name ?oprice WHERE {
            ?c a sa:Customer . ?c sa:name ?name .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c . ?o sa:totalprice ?oprice . }
        }
        """
    )
    assert q.optional_stars == {"o"}
    plan = plan_query(q)
    assert any(e.left_outer for e in plan.join_edges)


def test_optional_filter_on_optional_var_hoists():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name ?oprice WHERE {
            ?c a sa:Customer . ?c sa:name ?name .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                       ?o sa:totalprice ?oprice . FILTER (?oprice > 100) }
        }
        """
    )
    assert any(f.var == "oprice" for f in q.filters)


def test_optional_filter_on_mandatory_var_becomes_attach_condition():
    """A FILTER inside OPTIONAL that binds to a mandatory star is
    SPARQL LeftJoin(Ω1, Ω2, expr): it guards whether the block matches
    (part of the LEFT JOIN ON condition), never whether the mandatory
    row survives — recorded as an attach filter, NOT hoisted pre-join
    (r4 block-unit semantics; was rejected pre-r4)."""
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?c a sa:Customer . ?c sa:name ?name . ?c sa:acctbal ?bal .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                       FILTER (?bal > 100) }
        }
        """
    )
    (blk,) = q.optional_blocks
    assert len(blk.attach_var_filters) == 1
    assert blk.attach_var_filters[0].var == "bal"
    # NOT in the global pre-join list (that would drop customers)
    assert not any(f.var == "bal" for f in q.filters)


def test_optional_filter_on_mandatory_subject_becomes_attach_condition():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?c a sa:Customer . ?c sa:name ?name .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                       FILTER (?c = 5) }
        }
        """
    )
    (blk,) = q.optional_blocks
    assert len(blk.attach_var_filters) == 1
    assert not any(f.var == "c" for f in q.filters)


def test_optional_var_to_var_filter_block_scoped():
    """A var-to-var comparison whose vars all bind to the OPTIONAL
    block's own stars is applied INSIDE the block unit (before the left
    join attaches), so it cannot drop left rows — accepted and recorded
    on the block (r4 block-unit semantics; was rejected pre-r4)."""
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?c a sa:Customer . ?c sa:name ?name .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                       ?o sa:totalprice ?tp . ?o sa:shippriority ?sp .
                       FILTER (?tp > ?sp) }
        }
        """
    )
    (blk,) = q.optional_blocks
    assert blk.subjects == frozenset({"o"})
    assert len(blk.var_filters) == 1
    # the filter must NOT also be hoisted to the post-join global list
    assert not any(f.value_is_var for f in q.filters)


def test_optional_var_to_var_filter_cross_scope_attaches():
    """A var-to-var comparison spanning the OPTIONAL block and the
    mandatory pattern is the LeftJoin expr: it joins the unit's LEFT
    JOIN ON condition (r4; was rejected pre-r4)."""
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?c a sa:Customer . ?c sa:name ?name . ?c sa:acctbal ?bal .
            OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                       ?o sa:totalprice ?tp .
                       FILTER (?tp > ?bal) }
        }
        """
    )
    (blk,) = q.optional_blocks
    assert len(blk.attach_var_filters) == 1
    assert not any(f.value_is_var for f in q.filters)


def test_optional_filter_on_unbound_var_rejected():
    with pytest.raises(SparqlParseError, match="unbound"):
        parse_sparql(
            """
            PREFIX sa: <http://sparkall.io/ns/>
            SELECT ?name WHERE {
                ?c a sa:Customer . ?c sa:name ?name .
                OPTIONAL { ?o a sa:Orders . ?o sa:customer ?c .
                           FILTER (?ghost > 1) }
            }
            """
        )


def test_type_triple_not_a_column():
    q = parse_sparql(Q_BASIC)
    assert all(t.predicate != RDF_TYPE for t in q.stars["p"].triples)


def test_split_iri():
    assert split_iri("http://a/b#c") == ("http://a/b#", "c")
    assert split_iri("http://a/b/c") == ("http://a/b/", "c")


def test_comments_stripped():
    q = parse_sparql(
        """
        PREFIX sa: <http://sparkall.io/ns/>
        SELECT ?name WHERE {
            ?p a sa:Part .   # type constraint
            ?p sa:name ?name .
            #?p sa:size ?size .
        }
        """
    )
    assert len(q.stars["p"].triples) == 1


def test_nested_optional_parses_and_marks_stars():
    """Well-designed nested OPTIONAL (r4): both stars land in
    optional_stars and the join edges chain child -> parent -> mandatory
    so execution renders a left-deep LEFT JOIN chain."""
    from sparkall_spark.fixtures import PREFIX_BLOCK
    from sparkall_spark.plans.parser import parse_sparql

    q = parse_sparql(
        PREFIX_BLOCK
        + """
        SELECT ?a WHERE {
            ?x a sa:Nation ; sa:name ?a .
            OPTIONAL { ?y a sa:Customer ; sa:nation ?x .
                       OPTIONAL { ?z a sa:Orders ; sa:customer ?y . } }
        }
        """
    )
    assert q.optional_stars == {"y", "z"}
    assert set(q.stars) == {"x", "y", "z"}


def test_nested_optional_rebinding_enclosing_star_rejected():
    """Per-column optionality inside an already-optional star is not
    expressible in the flat star model — reject, don't silently merge."""
    import pytest

    from sparkall_spark.fixtures import PREFIX_BLOCK
    from sparkall_spark.plans.parser import SparqlParseError, parse_sparql

    with pytest.raises(SparqlParseError, match="re-binds"):
        parse_sparql(
            PREFIX_BLOCK
            + """
            SELECT ?a WHERE {
                ?x a sa:Nation ; sa:name ?a .
                OPTIONAL { ?y a sa:Customer ; sa:nation ?x .
                           OPTIONAL { ?y sa:acctbal ?b . } }
            }
            """
        )


def test_nested_optional_disconnected_rejected():
    """A nested OPTIONAL star that connects straight to the mandatory
    pattern (skipping its parent block) is not a well-designed pattern:
    the left-deep chain would attach it even where the parent failed."""
    import pytest

    from sparkall_spark.fixtures import PREFIX_BLOCK
    from sparkall_spark.plans.parser import SparqlParseError, parse_sparql

    with pytest.raises(SparqlParseError, match="does not connect through"):
        parse_sparql(
            PREFIX_BLOCK
            + """
            SELECT ?a WHERE {
                ?x a sa:Nation ; sa:name ?a .
                OPTIONAL { ?y a sa:Customer ; sa:nation ?x .
                           OPTIONAL { ?z a sa:Supplier ; sa:nation ?x . } }
            }
            """
        )


def test_filter_in_later_block_on_earlier_block_star_attaches():
    """A FILTER inside OPTIONAL block 2 binding block 1's star: block 1
    attaches first (declaration order), so its columns are visible when
    block 2 attaches — the filter becomes block 2's ON condition (r4;
    was rejected pre-r4).  The reverse direction (block 1 referencing
    block 2) stays rejected: block 2 is not yet attached."""
    import pytest

    from sparkall_spark.fixtures import PREFIX_BLOCK
    from sparkall_spark.plans.parser import SparqlParseError, parse_sparql

    q = parse_sparql(
        PREFIX_BLOCK
        + """
        SELECT ?a WHERE {
            ?x a sa:Nation ; sa:name ?a .
            OPTIONAL { ?y a sa:Customer ; sa:nation ?x . }
            OPTIONAL { ?s a sa:Supplier ; sa:nation ?x ;
                          sa:acctbal ?bal .
                       FILTER(?y != 3) }
        }
        """
    )
    assert len(q.optional_blocks[1].attach_var_filters) == 1

    with pytest.raises(SparqlParseError, match="not visible"):
        parse_sparql(
            PREFIX_BLOCK
            + """
            SELECT ?a WHERE {
                ?x a sa:Nation ; sa:name ?a .
                OPTIONAL { ?y a sa:Customer ; sa:nation ?x .
                           FILTER(?s != 3) }
                OPTIONAL { ?s a sa:Supplier ; sa:nation ?x . }
            }
            """
        )
