"""RDF N-Triples -> one typed wide DataFrame per entity class.

Re-expresses the reference's RDD/collect-heavy Java loader
(reference: NTtoDF.java:39-388 — regex tokenizer :56-58, groupByKey by
subject :82-88, most-specific-type choice :117-123, driver-side column
discovery via collect() :134-135,203 flagged "SUB-OPTIMAL WITH LARGE
DATA", schema build :212-251, RowFactory rows :254-359) as a pure
DataFrame pipeline:

    spark.read.text -> regexp split -> per-subject type choice (window
    max, lexicographically-last rdf:type like the reference) ->
    groupBy(subject).pivot(predicate, explicit list).collect_list ->
    typed casts from XSD datatype tags.

The only driver-side materialization is the *metadata-scale* predicate
statistics (distinct predicate -> datatype/multiplicity), never row
data — that is what makes this version hold at 100 TB: the heavy path
is one shuffle (groupBy subject + pivot) with map-side combine.

Datatype mapping (reference: NTtoDF.java:160-178,212-246):
xsd:int/integer -> int, xsd:double/float/decimal -> double,
xsd:boolean -> boolean, xsd:dateTime -> timestamp, xsd:date -> date,
repeated predicate -> array<...>, default string.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparkall_spark.mappings import EntityMapping

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"

_NT_LINE = r"^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+(.*?)\s*\.\s*$"

_XSD_TO_SPARK = {
    XSD + "int": "int",
    XSD + "integer": "int",
    XSD + "long": "bigint",
    XSD + "double": "double",
    XSD + "float": "double",
    XSD + "decimal": "double",
    XSD + "boolean": "boolean",
    XSD + "dateTime": "timestamp",
    XSD + "date": "date",
}


def parse_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Raw triples as (s, p, lex, dtype, is_iri) — all DataFrame ops."""
    lines = spark.read.text(path)
    t = lines.select(
        F.regexp_extract("value", _NT_LINE, 1).alias("s_raw"),
        F.regexp_extract("value", _NT_LINE, 2).alias("p"),
        F.regexp_extract("value", _NT_LINE, 3).alias("o_raw"),
    ).filter(F.col("p") != "")
    is_iri = F.col("o_raw").startswith("<")
    raw_lit = F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1)
    # N-Triples escape decoding (spec §2.1.1).  Escaped backslashes are
    # swapped to a sentinel FIRST so their trailing char is never
    # misread as a fresh escape (\\n is backslash+n, not newline).
    u = F.regexp_replace(raw_lit, r"\\\\", "\x00")
    u = F.regexp_replace(u, r'\\"', '"')
    u = F.regexp_replace(u, r"\\n", "\n")
    u = F.regexp_replace(u, r"\\r", "\r")
    u = F.regexp_replace(u, r"\\t", "\t")
    u = F.regexp_replace(u, "\x00", "\\\\")
    lex = F.when(is_iri, F.regexp_extract("o_raw", r"^<([^>]*)>$", 1)).otherwise(u)
    dtype = F.regexp_extract("o_raw", r"\^\^<([^>]*)>$", 1)
    return t.select(
        F.regexp_replace("s_raw", r"^<|>$", "").alias("s"),
        "p",
        lex.alias("lex"),
        dtype.alias("dtype"),
        is_iri.cast("boolean").alias("is_iri"),
    )


def _template_extractor(col, template: str | None):
    """Strip the subject-template prefix/suffix around ``{attr}`` so IRIs
    become join-ready ids (reference: Helpers.scala:120-152 extracts the
    attr name; here we also invert the template on the data side)."""
    if not template:
        return col
    m = re.match(r"^(.*)\{[^{}]+\}(.*)$", template)
    if not m:
        return col
    prefix, suffix = re.escape(m.group(1)), re.escape(m.group(2))
    extracted = F.regexp_extract(col, f"^{prefix}(.*){suffix}$", 1)
    # non-matching subjects (blank nodes, foreign IRIs) keep their raw
    # form instead of collapsing to ''
    return F.when(extracted != "", extracted).otherwise(col)


def read_ntriples(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    """Load the entity class of ``mapping`` from an N-Triples file.

    Options: ``subject_template`` (e.g. ``http://example.com/{nr}``)
    turns subject/object IRIs into bare ids; ``class`` defaults to
    ``mapping.class_iri``.
    """
    triples = parse_ntriples(spark, mapping.source)
    class_iri = mapping.options.get("class", mapping.class_iri)
    template = mapping.options.get("subject_template")

    # most-specific (lexicographically last) rdf:type per subject,
    # matching reference NTtoDF.java:117-123
    types = (
        triples.filter(F.col("p") == RDF_TYPE)
        .groupBy("s")
        .agg(F.max("lex").alias("chosen_type"))
    )
    if class_iri:
        types = types.filter(F.col("chosen_type") == class_iri)

    data = triples.filter(F.col("p") != RDF_TYPE).join(types.select("s"), "s", "inner")

    # metadata-scale statistics: datatype + multiplicity per predicate
    per_sp = data.groupBy("s", "p").agg(F.count("*").alias("n"))
    pred_stats = (
        per_sp.groupBy("p").agg(F.max("n").alias("max_n")).join(
            data.groupBy("p").agg(
                F.max("dtype").alias("dtype"), F.max("is_iri").alias("has_iri")
            ),
            "p",
        )
    ).collect()  # bounded by #distinct predicates — metadata, not data

    pred_info: dict[str, tuple[bool, str, bool]] = {}
    col_names: dict[str, str] = {}
    for row in pred_stats:
        local = row["p"].rsplit("#", 1)[-1].rsplit("/", 1)[-1]
        # disambiguate local-name collisions across namespaces deterministically
        name = local
        k = 2
        while name in col_names.values():
            name = f"{local}_{k}"
            k += 1
        col_names[row["p"]] = name
        pred_info[row["p"]] = (
            row["max_n"] > 1,
            _XSD_TO_SPARK.get(row["dtype"], "string"),
            bool(row["has_iri"]),
        )

    preds = sorted(pred_info)
    wide = (
        data.groupBy("s")
        .pivot("p", preds)  # explicit list: no extra distinct job
        .agg(F.collect_list("lex"))
    )

    cols = [
        _template_extractor(F.col("s"), template).alias(mapping.id_attr or "id")
    ]
    for p in preds:
        multi, spark_type, has_iri = pred_info[p]
        c = F.col(f"`{p}`")
        if has_iri and template:
            c = F.transform(c, lambda x: _template_extractor(x, template))
        if multi:
            expr = F.transform(c, lambda x: x.cast(spark_type))
        else:
            # try_element_at: subjects missing this predicate pivot to an
            # empty array -> null (ANSI element_at would throw)
            expr = F.try_element_at(c, F.lit(1)).cast(spark_type)
        cols.append(expr.alias(col_names[p]))
    return wide.select(*cols)


# --- serialization (r4): DataFrame -> N-Triples ---------------------------

_PY_TO_XSD = {
    "int": XSD + "integer",
    "bigint": XSD + "integer",
    "smallint": XSD + "integer",
    "double": XSD + "double",
    "float": XSD + "double",
    "boolean": XSD + "boolean",
    "timestamp": XSD + "dateTime",
    "date": XSD + "date",
}


def _nt_escape(col):
    """N-Triples string-literal escaping (spec §2.1.1): backslash first,
    then quote and the control characters."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    c = F.regexp_replace(c, "\t", "\\\\t")
    return c


def to_ntriples_lines(
    df: DataFrame,
    id_col: str,
    subject_template: str,
    class_iri: str | None = None,
    predicates: dict[str, str] | None = None,
) -> DataFrame:
    """Serialize a wide entity DataFrame into N-Triples lines (one
    string column ``line``), the inverse of :func:`read_ntriples`.

    ``subject_template`` is the same ``http://.../{attr}`` form the
    reader inverts; ``predicates`` maps predicate IRI -> column name
    (defaults to every non-id column under ``{class_ns}{col}``).  Typed
    columns get XSD datatype tags; strings are escaped per spec.  Pure
    Column expressions — write with ``df.write.text`` for a distributed
    N-Triples export."""
    m = re.match(r"^(.*)\{[^{}]+\}(.*)$", subject_template)
    if not m:
        raise ValueError(f"bad subject template: {subject_template!r}")
    subj = F.concat(
        F.lit("<" + m.group(1)),
        F.col(id_col).cast("string"),
        F.lit(m.group(2) + ">"),
    )
    if predicates is None:
        ns = (class_iri.rsplit("#", 1)[0].rsplit("/", 1)[0] + "/") if class_iri else "urn:col/"
        predicates = {ns + c: c for c in df.columns if c != id_col}
    parts: list = []
    if class_iri:
        parts.append(
            F.concat(subj, F.lit(f" <{RDF_TYPE}> <{class_iri}> ."))
        )
    dtypes = dict(df.dtypes)
    for iri, col in sorted(predicates.items()):
        t = dtypes.get(col, "string")
        if t == "string":
            obj = F.concat(F.lit('"'), _nt_escape(F.col(col)), F.lit('"'))
        else:
            xsd = _PY_TO_XSD.get(t)
            lex = F.col(col).cast("string")
            obj = (
                F.concat(F.lit('"'), lex, F.lit(f'"^^<{xsd}>'))
                if xsd
                else F.concat(F.lit('"'), _nt_escape(lex), F.lit('"'))
            )
        line = F.concat(subj, F.lit(f" <{iri}> "), obj, F.lit(" ."))
        parts.append(F.when(F.col(col).isNotNull(), line))
    out = df.select(
        F.explode(F.array(*[p.alias("l") for p in parts])).alias("line")
    )
    return out.filter(F.col("line").isNotNull())
