"""NoSQL connectors: MongoDB, Cassandra, Elasticsearch.

These require their DataSource connector jars on the classpath (not
bundled in this environment); the readers build the right format +
options and fail with a clear message when the connector is absent.

Reference behavior being re-expressed:
- MongoDB (SparkExecutor.scala:92-98): URI built from url/database/
  collection options (Helpers.scala:154-161) with the size-based
  paginating partitioner so the scan parallelizes.
- Cassandra (SparkExecutor.scala:88-89): keyspace/table options.
- Elasticsearch (SparkExecutor.scala:90-91): nodes/port + resource.

Scale notes: each connector partitions the scan on the remote store's
native sharding (Mongo chunks, Cassandra token ranges, ES shards), so a
1000-executor cluster reads in parallel; filters/projections are pushed
by the connectors' DataSource V2 implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkall_spark.mappings import EntityMapping


def _fail_if_missing(spark: SparkSession, fmt: str, entity: str, exc: Exception):
    raise RuntimeError(
        f"source type for entity {entity!r} needs the {fmt!r} connector jar on "
        f"the Spark classpath (add it via spark.jars.packages)"
    ) from exc


def mongo_uri(options: dict[str, str]) -> str:
    """mongodb://host[:port]/db.collection[?opts] from url/database/collection."""
    url = options.get("url", "127.0.0.1")
    db = options.get("database", "test")
    coll = options.get("collection", "")
    extra = options.get("options", "")
    uri = f"mongodb://{url}/{db}.{coll}"
    if extra:
        uri += f"?{extra}"
    return uri


def mongodb_read_spec(mapping: EntityMapping) -> tuple[str, dict[str, str]]:
    """(format, options) for a MongoDB scan — pure, contract-testable."""
    return "mongodb", {
        "connection.uri": mongo_uri(mapping.options),
        "database": mapping.options.get("database", "test"),
        "collection": mapping.options.get("collection", ""),
        # size-based pagination => balanced input partitions
        "partitioner": mapping.options.get(
            "partitioner",
            "com.mongodb.spark.sql.connector.read.partitioner.PaginateBySizePartitioner",
        ),
    }


def cassandra_read_spec(mapping: EntityMapping) -> tuple[str, dict[str, str]]:
    return "org.apache.spark.sql.cassandra", {
        "keyspace": mapping.options.get("keyspace", ""),
        "table": mapping.options.get("table", mapping.source.lstrip("/")),
    }


def elasticsearch_read_spec(mapping: EntityMapping) -> tuple[str, dict[str, str]]:
    return "org.elasticsearch.spark.sql", {
        "es.nodes": mapping.options.get("nodes", "localhost"),
        "es.port": mapping.options.get("port", "9200"),
        "es.resource": mapping.options.get("resource", mapping.source.lstrip("/")),
    }


def read_mongodb(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    fmt, opts = mongodb_read_spec(mapping)
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as e:  # connector jar missing
        _fail_if_missing(spark, fmt, mapping.name, e)


def read_cassandra(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    fmt, opts = cassandra_read_spec(mapping)
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as e:
        _fail_if_missing(spark, "cassandra", mapping.name, e)


def read_elasticsearch(spark: SparkSession, mapping: EntityMapping) -> DataFrame:
    fmt, opts = elasticsearch_read_spec(mapping)
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as e:
        _fail_if_missing(spark, "elasticsearch", mapping.name, e)
