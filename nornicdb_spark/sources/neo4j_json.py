"""Neo4j-export JSON interchange — SURVEY §2.1 (reference
pkg/storage/types.go:1-46 ToNeo4jExport doc, storage/loader.go,
apoc_load_export.go:624 apoc.import.json).

Format: JSON lines, one entity per line —
``{"type":"node","id":...,"labels":[...],"properties":{...}}`` and
``{"type":"relationship","id":...,"label":<rel type>,"start":{"id":..},
"end":{"id":..},"properties":{...}}`` — the shape apoc.export.json.all
emits and apoc.import.json consumes.

Properties travel as a ``map<string,string>`` on the wire (the export
format is schema-free); importers get typed columns back via
``from_json``/casts at the call site. Both directions are distributed
reads/writes — no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _props_map(df: DataFrame, exclude: tuple[str, ...]) -> F.Column:
    """Pack non-structural columns into map<string,string> (nulls dropped,
    matching the export format's absent-key convention)."""
    pairs = []
    for c in df.columns:
        if c in exclude:
            continue
        pairs.append(F.struct(F.lit(c).alias("key"), F.col(c).cast("string").alias("value")))
    if not pairs:
        return F.map_from_entries(F.array().cast("array<struct<key:string,value:string>>"))
    entries = F.filter(F.array(*pairs), lambda s: s["value"].isNotNull())
    return F.map_from_entries(entries)


def export_graph_json(graph, path: str, mode: str = "overwrite") -> None:
    """apoc.export.json.all — write nodes + relationships as one JSON-lines
    dataset (union keeps it a single distributed write)."""
    nodes = graph.nodes.select(
        F.lit("node").alias("type"),
        F.col("id").cast("string").alias("id"),
        F.array(F.col("label")).alias("labels"),
        _props_map(graph.nodes, ("id", "label")).alias("properties"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("struct<id:string>").alias("start"),
        F.lit(None).cast("struct<id:string>").alias("end"),
    )
    rels = graph.edges.select(
        F.lit("relationship").alias("type"),
        F.col("edge_id").cast("string").alias("id"),
        F.lit(None).cast("array<string>").alias("labels"),
        _props_map(graph.edges, ("src", "dst", "type", "edge_id")).alias("properties"),
        F.col("type").alias("label"),
        F.struct(F.col("src").cast("string").alias("id")).alias("start"),
        F.struct(F.col("dst").cast("string").alias("id")).alias("end"),
    )
    nodes.unionByName(rels).write.mode(mode).json(path)


def import_graph_json(spark: SparkSession, path: str):
    """apoc.import.json — read a Neo4j-export JSON-lines dataset back into
    a PropertyGraph (nodes: id/label/properties; edges:
    src/dst/type/edge_id/properties)."""
    from nornicdb_spark.catalog import PropertyGraph

    schema = (
        "type string, id string, labels array<string>, "
        "properties map<string,string>, label string, "
        "start struct<id:string>, end struct<id:string>"
    )
    raw = spark.read.schema(schema).json(path)
    nodes = raw.filter(F.col("type") == "node").select(
        F.col("id"),
        F.element_at(F.col("labels"), 1).alias("label"),
        F.col("properties"),
    )
    edges = raw.filter(F.col("type") == "relationship").select(
        F.col("start.id").alias("src"),
        F.col("end.id").alias("dst"),
        F.col("label").alias("type"),
        F.col("id").cast("long").alias("edge_id"),
        F.col("properties"),
    )
    return PropertyGraph(nodes=nodes, edges=edges)
