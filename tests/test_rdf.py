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
    # escapes decoded per N-Triples spec (r4: was raw before)
    assert r10["label"] == 'hello "quoted" world'
    assert r10["note"] == "bonjour"
    assert r10["empty"] == ""


# --- r4: serialization round-trip + literal edge parsing ------------------


def test_lang_tagged_and_escaped_literals_parse(spark, tmp_path):
    """Language-tagged literals keep their value (tag stripped); typed
    literals carry their datatype IRI."""
    nt = tmp_path / "lit.nt"
    nt.write_text(
        '<http://x/1> <http://p/name> "chat"@fr .\n'
        '<http://x/1> <http://p/n> "5"^^<http://www.w3.org/2001/XMLSchema#int> .\n'
        '<http://x/1> <http://p/quote> "say \\"hi\\"" .\n'
    )
    from sparkall_spark.sources.rdf import parse_ntriples

    rows = {
        r["p"]: r for r in parse_ntriples(spark, str(nt)).collect()
    }
    assert rows["http://p/name"]["lex"] == "chat"
    assert rows["http://p/n"]["lex"] == "5"
    assert rows["http://p/n"]["dtype"].endswith("#int")
    assert rows["http://p/quote"]["lex"] == 'say "hi"'  # escapes decoded


def test_ntriples_write_read_roundtrip(spark, tmp_path):
    """to_ntriples_lines is the inverse of read_ntriples: serialize a
    typed frame, read it back through the full pivot reader, compare."""
    from sparkall_spark.mappings import EntityMapping
    from sparkall_spark.sources.rdf import to_ntriples_lines, read_ntriples

    NS = "http://ex.org/ns/"
    src = spark.createDataFrame(
        [
            (1, 'plain "quoted" text', 10, 2.5, True),
            (2, "back\\slash and\nnewline", None, 0.5, False),
        ],
        ["nid", "label", "n", "score", "flag"],
    )
    lines = to_ntriples_lines(
        src,
        id_col="nid",
        subject_template="http://ex.org/node/{nid}",
        class_iri=NS + "Node",
        predicates={
            NS + "label": "label", NS + "n": "n",
            NS + "score": "score", NS + "flag": "flag",
        },
    )
    out = tmp_path / "nodes_nt"
    lines.coalesce(1).write.mode("overwrite").text(str(out))
    # row 2 has a null n -> no triple for it (serialize skips nulls)
    assert lines.count() == 2 + 4 + 3

    mapping = EntityMapping(
        name="Node",
        source=str(out),
        source_type="rdf",
        id_attr="nid",
        predicates={NS + k: k for k in ("label", "n", "score", "flag")},
        class_iri=NS + "Node",
        options={"subject_template": "http://ex.org/node/{nid}"},
    )
    back = read_ntriples(spark, mapping)
    got = {
        int(r["nid"]): r
        for r in back.select("nid", "label", "n", "score", "flag").collect()
    }
    assert got[1]["label"] == 'plain "quoted" text'
    assert got[1]["n"] == 10 and abs(got[1]["score"] - 2.5) < 1e-9
    assert got[1]["flag"] is True
    assert got[2]["label"] == "back\\slash and\nnewline"
    assert got[2]["n"] is None and got[2]["flag"] is False
