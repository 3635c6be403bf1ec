"""RDF N-Triples loader: typed pivot, arrays, most-specific type,
template id extraction (replaces reference NTtoDF.java behavior)."""

import pytest

from sparkall_spark.mappings import EntityMapping
from sparkall_spark.sources.rdf import parse_ntriples, read_ntriples

NT = """\
<http://ex.com/1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/Thing> .
<http://ex.com/1> <http://ex.com/ns/count> "42"^^<http://www.w3.org/2001/XMLSchema#int> .
<http://ex.com/1> <http://ex.com/ns/price> "9.5"^^<http://www.w3.org/2001/XMLSchema#double> .
<http://ex.com/1> <http://ex.com/ns/active> "true"^^<http://www.w3.org/2001/XMLSchema#boolean> .
<http://ex.com/1> <http://ex.com/ns/when> "2020-01-02T03:04:05"^^<http://www.w3.org/2001/XMLSchema#dateTime> .
<http://ex.com/1> <http://ex.com/ns/label> "first thing" .
<http://ex.com/1> <http://ex.com/ns/tag> "a" .
<http://ex.com/1> <http://ex.com/ns/tag> "b" .
<http://ex.com/1> <http://ex.com/ns/friend> <http://ex.com/2> .
<http://ex.com/2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/Thing> .
<http://ex.com/2> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/ZSpecial> .
<http://ex.com/2> <http://ex.com/ns/count> "7"^^<http://www.w3.org/2001/XMLSchema#int> .
<http://ex.com/2> <http://ex.com/ns/label> "second thing" .
<http://ex.com/3> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/Thing> .
<http://ex.com/3> <http://ex.com/ns/label> "third thing" .
"""


@pytest.fixture(scope="module")
def nt_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("rdf") / "things.nt"
    p.write_text(NT)
    return str(p)


def _mapping(nt_path, class_iri="http://ex.com/ns/Thing"):
    return EntityMapping(
        name="Thing",
        source=nt_path,
        source_type="rdf",
        id_attr="nr",
        predicates={},
        class_iri=class_iri,
        options={"subject_template": "http://ex.com/{nr}"},
    )


def test_parse_ntriples_raw(spark, nt_path):
    t = parse_ntriples(spark, nt_path)
    rows = t.collect()
    assert len(rows) == 15
    iri_objs = [r for r in rows if r["is_iri"]]
    # rdf:type objects + friend
    assert len(iri_objs) == 5


def test_pivot_types_and_arrays(spark, nt_path):
    df = read_ntriples(spark, _mapping(nt_path))
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema["count"] == "int"
    assert schema["price"] == "double"
    assert schema["active"] == "boolean"
    assert schema["when"] == "timestamp"
    assert schema["label"] == "string"
    assert schema["tag"] == "array<string>"  # repeated -> array
    rows = {r["nr"]: r for r in df.collect()}
    # subject 2's most-specific (lexicographically last) type is ZSpecial,
    # so it must NOT appear under Thing (reference: NTtoDF.java:117-123)
    assert set(rows) == {"1", "3"}
    r1 = rows["1"]
    assert r1["count"] == 42
    assert abs(r1["price"] - 9.5) < 1e-9
    assert r1["active"] is True
    assert str(r1["when"]).startswith("2020-01-02 03:04:05")
    assert sorted(r1["tag"]) == ["a", "b"]
    # IRI object id-extracted via the template
    assert r1["friend"] == "2"
    # subject 3 has no count -> null
    assert rows["3"]["count"] is None


def test_most_specific_class_selectable(spark, nt_path):
    df = read_ntriples(spark, _mapping(nt_path, "http://ex.com/ns/ZSpecial"))
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["nr"] == "2"
    assert rows[0]["count"] == 7


NT_EDGE = """\
# a comment line
_:b0 <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/Blank> .
_:b0 <http://ex.com/ns/label> "blank node subject" .
<http://ex.com/10> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex.com/ns/Blank> .
<http://ex.com/10> <http://ex.com/ns/label> "hello \\"quoted\\" world" .
<http://ex.com/10> <http://ex.com/ns/note> "bonjour"@fr .

<http://ex.com/10> <http://ex.com/ns/empty> "" .
"""


def test_edge_cases_blank_lang_escapes(spark, tmp_path):
    p = tmp_path / "edge.nt"
    p.write_text(NT_EDGE)
    df = read_ntriples(
        spark,
        EntityMapping(
            name="Blank",
            source=str(p),
            source_type="rdf",
            id_attr="id",
            predicates={},
            class_iri="http://ex.com/ns/Blank",
            options={"subject_template": "http://ex.com/{id}"},
        ),
    )
    rows = {r["id"]: r for r in df.collect()}
    # blank-node subject survives (id = the raw _:b0 label, template no-match)
    assert "_:b0" in rows
    assert rows["_:b0"]["label"] == "blank node subject"
    r10 = rows["10"]
    assert r10["label"] == 'hello \\"quoted\\" world'
    assert r10["note"] == "bonjour"
    assert r10["empty"] == ""
