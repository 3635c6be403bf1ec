"""JDBC source (reference: SparkExecutor.scala:99-100, MySQL evaluated).

Mapping options: ``url``, ``driver``, ``user``, ``password`` plus any
standard Spark JDBC option.  ``mapping.source`` of the form
``//TableName`` (the reference's convention) or a plain table name
becomes ``dbtable``.

Scale notes: without partitioning options a JDBC scan is ONE task; for
large tables callers should set ``partitionColumn``/``lowerBound``/
``upperBound``/``numPartitions`` in the mapping options — they are
passed straight through, giving a parallel range-partitioned read.
Filters and projections are pushed into the remote SQL by Spark's JDBC
relation automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkall_spark.mappings import EntityMapping


def jdbc_read_spec(mapping: EntityMapping) -> tuple[str, dict[str, str]]:
    """(format, options) for a JDBC scan — pure, contract-testable.

    partitionColumn/lowerBound/upperBound/numPartitions pass straight
    through, so callers get Spark's parallel range-partitioned read.
    """
    opts = dict(mapping.options)
    opts.pop("broadcast", None)
    table = mapping.source.lstrip("/")
    opts.setdefault("dbtable", table)
    return "jdbc", opts


def read_jdbc(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    fmt, opts = jdbc_read_spec(mapping)
    return spark.read.format(fmt).options(**opts).load()
