"""Introspection procedures — SURVEY §2.8 (CALL db.* / dbms.* routing,
reference pkg/cypher/call.go:596-803, executor_show.go:16-70).

Each procedure is a DataFrame producer over the catalog/graph — the batch
analogue of the reference's metadata calls. Schema-derived results
(property keys, schema visualization) read parquet FOOTERS only, no data
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nornicdb_spark.catalog import NODE_SPECS, Catalog


def db_labels(graph) -> DataFrame:
    """CALL db.labels (reference call.go:610-): every node label with its
    count (the reference yields just the label; the count costs nothing
    extra here and backs db.stats)."""
    return graph.nodes.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))


def db_relationship_types(graph) -> DataFrame:
    """CALL db.relationshipTypes + per-type counts."""
    return graph.edges.groupBy("type").agg(F.count(F.lit(1)).alias("n_edges"))


def db_property_keys(cat: Catalog) -> DataFrame:
    """CALL db.propertyKeys — per-label property names. Derived from the
    base-table schemas (schema-on-read: the typed columns ARE the
    properties), driver-side only."""
    rows = []
    for label, table, _key in NODE_SPECS:
        for field in cat.table(table).schema.fields:
            rows.append((label, field.name, field.dataType.simpleString()))
    return cat.spark.createDataFrame(rows, "label string, key string, type string")


def db_schema_visualization(graph) -> DataFrame:
    """CALL db.schema.visualization (reference executor_show.go /
    call.go:700s): distinct (source label, relationship type, target
    label) triples — the graph's shape."""
    src_label = F.split(F.col("src"), ":").getItem(0)
    dst_label = F.split(F.col("dst"), ":").getItem(0)
    return (
        graph.edges.select(
            src_label.alias("src_label"), F.col("type"), dst_label.alias("dst_label")
        )
        .distinct()
    )


def db_info(cat: Catalog) -> DataFrame:
    """CALL db.info / dbms.components — engine identity + table stats."""
    rows = [("nornicdb_spark", "0.1", t) for t in ("batch",)]
    return cat.spark.createDataFrame(rows, "name string, version string, mode string")


def db_ping(cat: Catalog) -> DataFrame:
    """CALL db.ping (reference call.go:676)."""
    return cat.spark.createDataFrame([("ok",)], "status string")


def db_indexes(cat: Catalog) -> DataFrame:
    """CALL db.indexes / SHOW INDEXES (reference executor_show.go:16-32).
    In this engine Catalyst pushdown subsumes property/range/composite
    indexes; the materialized structures are the search-side ones."""
    rows = [
        ("embeddings_cosine", "VECTOR", "Embedding", ["embedding"], "ONLINE"),
        ("documents_fulltext", "FULLTEXT", "Document", ["text"], "ONLINE"),
    ]
    return cat.spark.createDataFrame(
        rows,
        "name string, type string, labelsOrTypes string, properties array<string>, "
        "state string",
    )


def db_constraints(cat: Catalog) -> DataFrame:
    """CALL db.constraints / SHOW CONSTRAINTS — the key column of every
    base table behaves as a uniqueness constraint (enforced by the
    write path's groupBy-count check)."""
    rows = [
        (f"unique_{label.lower()}_{key}", "UNIQUENESS", label, [key])
        for label, _table, key in NODE_SPECS
    ]
    return cat.spark.createDataFrame(
        rows, "name string, type string, label string, properties array<string>"
    )


def dbms_components(cat: Catalog) -> DataFrame:
    """CALL dbms.components (reference call.go:750s)."""
    import pyspark

    return cat.spark.createDataFrame(
        [("nornicdb-spark", [pyspark.__version__], "community")],
        "name string, versions array<string>, edition string",
    )
