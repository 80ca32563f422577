"""nornicdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of orneryd/NornicDB (graph + search + memory
extensions), re-expressed Spark-first.

The reference (read-only at /root/reference) is a Go, in-process,
Neo4j-compatible property-graph database. This engine is NOT a port: graph
patterns compile to DataFrame joins, search to DataFrame pipelines, and
Catalyst/Tungsten pick physical strategies. See SURVEY.md for the full
capability blueprint and reference citations.

Layout:
    session    — SparkSession factory tuned for the engine
    catalog    — star-schema table loading + property-graph projection
    functions/ — Cypher-equivalent scalar/vector column builders
    operators/ — graph pattern ops (expand, paths), dedup, text analysis
    search/    — BM25 fulltext, vector top-k, hybrid RRF
    streaming/ — sessionization, decay scoring, temporal ops
"""

from nornicdb_spark.session import get_spark
from nornicdb_spark.catalog import Catalog, PropertyGraph

__all__ = ["get_spark", "Catalog", "PropertyGraph"]
__version__ = "0.1.0"
