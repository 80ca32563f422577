"""Source/sink queries — SURVEY §2.1: the Neo4j-export JSON interchange
exercised end-to-end (export → distributed JSON write → import → verify),
with the oracle restating expected entity counts from the base tables.
Writes stay inside the repo (.tmp/, gitignored).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.queries import register
from nornicdb_spark.sources import export_graph_json, import_graph_json


@register(
    "source_neo4j_json_roundtrip",
    oracle="""
    SELECT 'node:Customer' AS kind, CAST(count(*) AS BIGINT) AS n FROM customer
    UNION ALL SELECT 'node:Order', count(*) FROM orders
    UNION ALL SELECT 'node:Part', count(*) FROM part
    UNION ALL SELECT 'node:Supplier', count(*) FROM supplier
    UNION ALL SELECT 'node:Nation', count(*) FROM nation
    UNION ALL SELECT 'node:Region', count(*) FROM region
    UNION ALL SELECT 'rel:PLACED', count(*) FROM orders
    UNION ALL SELECT 'rel:CONTAINS', count(*) FROM lineitem
    UNION ALL SELECT 'rel:SUPPLIES', count(*)
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    UNION ALL SELECT 'rel:FROM',
      (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
    UNION ALL SELECT 'rel:IN', count(*) FROM nation
    """,
)
def source_neo4j_json_roundtrip(spark, sf_dir):
    # apoc.export.json.all → apoc.import.json roundtrip (reference
    # apoc_load_export.go:222, 624; storage/types.go:1-46 export format):
    # entity counts after the roundtrip must equal the base tables'.
    g = Catalog(spark, sf_dir).graph
    sf_tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    path = f"/root/repo/.tmp/neo4j_json_{sf_tag}"
    export_graph_json(g, path)
    back = import_graph_json(spark, path)
    nodes = back.nodes.groupBy(
        F.concat(F.lit("node:"), F.col("label")).alias("kind")
    ).agg(F.count(F.lit(1)).alias("n"))
    rels = back.edges.groupBy(
        F.concat(F.lit("rel:"), F.col("type")).alias("kind")
    ).agg(F.count(F.lit(1)).alias("n"))
    return nodes.unionByName(rels)
