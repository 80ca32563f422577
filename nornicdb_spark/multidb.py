"""Multi-database namespacing + composite databases — SURVEY §1.4/§2.1
(reference pkg/storage/namespaced.go: ID-prefix namespacing;
pkg/multidb/composite.go:1-22: composite DBs span constituents).

Same design re-expressed on DataFrames: a namespace is a pure id-prefix
rewrite (``<ns>/<id>`` on nodes and edge endpoints), a composite database
is the union of its constituents' frames. Both are lazy projections —
no data copied, and every traversal/algorithm operator works unchanged
because they only see the (nodes, edges) contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.catalog import PropertyGraph

SEP = "/"


def namespaced(graph: PropertyGraph, namespace: str) -> PropertyGraph:
    """NamespacedEngine: prefix every node id (and edge endpoint) with
    ``<namespace>/`` — reference namespaced.go's key-prefix scheme."""
    if SEP in namespace:
        raise ValueError(f"namespace must not contain {SEP!r}")
    p = F.lit(namespace + SEP)
    nodes = graph.nodes.withColumn("id", F.concat(p, F.col("id")))
    edges = graph.edges.withColumn("src", F.concat(p, F.col("src"))).withColumn(
        "dst", F.concat(p, F.col("dst"))
    )
    return PropertyGraph(nodes=nodes, edges=edges, catalog=graph.catalog)


def strip_namespace(id_col) -> F.Column:
    """Recover the constituent-local id (drop the '<ns>/' prefix)."""
    return F.substring_index(id_col, SEP, -1)


def namespace_of(id_col) -> F.Column:
    """The namespace component of a namespaced id."""
    return F.substring_index(id_col, SEP, 1)


def composite(graphs: dict[str, PropertyGraph]) -> PropertyGraph:
    """CompositeEngine: one graph spanning namespaced constituents
    (reference composite_engine.go). Queries against the composite see
    every member's nodes/edges; ids stay globally unique via the prefix."""
    if not graphs:
        raise ValueError("composite needs at least one constituent")
    parts = [namespaced(g, ns) for ns, g in sorted(graphs.items())]
    nodes = parts[0].nodes
    edges = parts[0].edges
    for g in parts[1:]:
        nodes = nodes.unionByName(g.nodes)
        edges = edges.unionByName(g.edges)
    return PropertyGraph(nodes=nodes, edges=edges)
