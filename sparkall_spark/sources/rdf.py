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
    lex = F.when(is_iri, F.regexp_extract("o_raw", r"^<([^>]*)>$", 1)).otherwise(
        F.regexp_extract("o_raw", r'^"((?:[^"\\]|\\.)*)"', 1)
    )
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
