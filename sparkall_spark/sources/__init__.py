"""Reader registry: source type -> (spark, mapping) -> DataFrame.

The reference dispatches on the ``nosql:store`` URI in a match block
(reference: SparkExecutor.scala:85-106); here it is a plain dict so new
sources are one registration away (the reference documents new sources
as its extension point, README.md:62-63).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkall_spark.mappings import EntityMapping
from sparkall_spark.sources.files import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
from sparkall_spark.sources.jdbc import read_jdbc
from sparkall_spark.sources.nosql import read_cassandra, read_elasticsearch, read_mongodb
from sparkall_spark.sources.rdf import read_ntriples
from sparkall_spark.sources.warc import read_warc_mapping

ReaderFn = Callable[[SparkSession, EntityMapping], DataFrame]

READERS: dict[str, ReaderFn] = {
    "parquet": read_parquet,
    "csv": read_csv,
    "json": read_json,
    "orc": read_orc,
    "text": read_text,
    "jdbc": read_jdbc,
    "mongodb": read_mongodb,
    "cassandra": read_cassandra,
    "elasticsearch": read_elasticsearch,
    "rdf": read_ntriples,
    "warc": read_warc_mapping,
}


def register_reader(source_type: str, fn: ReaderFn) -> None:
    READERS[source_type] = fn


def load_source(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    try:
        reader = READERS[mapping.source_type]
    except KeyError:
        raise ValueError(
            f"unknown source type {mapping.source_type!r} for entity {mapping.name!r}; "
            f"known: {sorted(READERS)}"
        ) from None
    return reader(spark, mapping)
