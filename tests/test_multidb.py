"""Namespacing + composite database behavior (SURVEY §1.4/§2.1 rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark import multidb
from nornicdb_spark.operators import algorithms


def test_namespace_prefixes_and_roundtrip(graph):
    ns = multidb.namespaced(graph, "tenant1")
    row = ns.nodes.filter(F.col("label") == "Region").orderBy("id").first()
    assert row.id.startswith("tenant1/Region:")
    back = ns.nodes.select(multidb.strip_namespace(F.col("id")).alias("raw")).first()
    assert back.raw.startswith("Region:") or ":" in back.raw


def test_composite_spans_constituents(graph):
    comp = multidb.composite({"a": graph, "b": graph})
    assert comp.nodes.count() == 2 * graph.nodes.count()
    assert comp.edges.count() == 2 * graph.edges.count()
    # namespaces keep ids disjoint
    ns_counts = (
        comp.nodes.select(multidb.namespace_of(F.col("id")).alias("ns"))
        .groupBy("ns").count().collect()
    )
    assert {r.ns for r in ns_counts} == {"a", "b"}


def test_algorithms_respect_namespace_isolation(graph):
    # components never bridge tenants: WCC on the composite of two copies
    # yields exactly double the per-tenant component count
    nodes = graph.nodes.filter(F.col("label").isin("Nation", "Region"))
    edges = graph.edges.filter(F.col("type") == "IN")
    from nornicdb_spark.catalog import PropertyGraph

    sub = PropertyGraph(nodes=nodes, edges=edges)
    single = algorithms.connected_components(sub).select("component").distinct().count()
    comp = multidb.composite({"a": sub, "b": sub})
    double = algorithms.connected_components(comp).select("component").distinct().count()
    assert double == 2 * single
