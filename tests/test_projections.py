"""gds.graph.project/list/drop behavior (SURVEY §2.9 projection row)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nornicdb_spark.operators import algorithms
from nornicdb_spark.projections import GraphCatalog


def test_project_list_drop_and_reuse(graph):
    cat = GraphCatalog()
    nodes = graph.nodes.filter(F.col("label").isin("Nation", "Region")).select(
        "id", "label", "key"
    )
    edges = graph.edges.filter(F.col("type") == "IN")
    info = cat.project("geo", nodes, edges)
    assert info.node_count == 30
    assert info.relationship_count == 25

    assert [p.name for p in cat.list()] == ["geo"]

    # algorithms run against the cached projection
    cc = algorithms.connected_components(cat.get("geo"))
    n_components = cc.select("component").distinct().count()
    assert n_components == 5  # one star per region

    # re-project replaces
    cat.project("geo", nodes.limit(10), edges.limit(0))
    assert cat.get("geo").nodes.count() == 10

    cat.drop("geo")
    with pytest.raises(KeyError):
        cat.get("geo")
