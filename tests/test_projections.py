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


def test_gds_graph_procedures_via_frontend(spark, sf_dir):
    # gds.graph.project/list/drop + fastRP.stats + version through Cypher
    # (reference fastrp.go:83-160, 314-421)
    from nornicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    r = eng.cypher(
        "CALL gds.graph.project('supnet', 'Supplier', 'SUPPLIES')"
    ).collect()[0]
    assert r.graphName == "supnet" and r.nodeCount > 0
    names = {x.graphName for x in eng.cypher("CALL gds.graph.list()").collect()}
    assert "supnet" in names
    st = eng.cypher("CALL gds.fastRP.stats('supnet', 64)").collect()[0]
    assert (st.nodeCount, st.embeddingDimension) == (r.nodeCount, 64)
    v = eng.cypher("CALL gds.version()").collect()[0]
    assert v.version == "2.6.0-nornicdb"
    eng.cypher("CALL gds.graph.drop('supnet')")
    names = {x.graphName for x in eng.cypher("CALL gds.graph.list()").collect()}
    assert "supnet" not in names
