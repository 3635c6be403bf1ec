"""sparkall_spark — a PySpark-native semantic data-lake engine.

A from-scratch reimplementation of the query and data-processing
capabilities of EIS-Bonn/sparkall (Squerall), designed Spark-first:

- users write a restricted SPARQL fragment over an ontology;
- declarative mappings (RML Turtle or plain Python) bind ontology
  classes/predicates to attributes of concrete sources (parquet, CSV,
  JSON, JDBC, MongoDB, Cassandra, Elasticsearch, RDF N-Triples);
- the engine decomposes the query into star-shaped subqueries, builds
  ONE lazy DataFrame plan (per-star projection + filters pushed to the
  scan, chained equi-joins, aggregation, ordering, limit) and lets
  Catalyst/Tungsten/AQE pick every physical strategy.

Beyond reference parity, :mod:`sparkall_spark.operators` adds the
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal columns) and :mod:`sparkall_spark.streaming`
adds Structured Streaming helpers.
"""

from sparkall_spark.engine import Engine
from sparkall_spark.mappings import EntityMapping, MappingIndex
from sparkall_spark.session import get_spark

__all__ = ["Engine", "EntityMapping", "MappingIndex", "get_spark"]

__version__ = "0.1.0"
