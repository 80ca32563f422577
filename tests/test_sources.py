"""Roundtrip tests for SURVEY §2.1 sources/sinks — Neo4j-export JSON and
CSV/JSON loaders. Writes stay inside the repo (.tmp/, gitignored)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nornicdb_spark.sources import (
    export_csv,
    export_graph_json,
    export_json,
    import_graph_json,
    load_csv,
    load_json,
)

TMP = "/root/repo/.tmp/test_sources"


@pytest.fixture(scope="module", autouse=True)
def clean_tmp():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_neo4j_json_roundtrip(spark, graph):
    path = f"{TMP}/graph_json"
    export_graph_json(graph, path)
    back = import_graph_json(spark, path)

    assert back.nodes.count() == graph.nodes.count()
    assert back.edges.count() == graph.edges.count()

    # labels survive
    want = {r.label: r.n for r in graph.nodes.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    got = {r.label: r.n for r in back.nodes.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == want

    # typed edge property survives through the string map: total quantity
    want_q = graph.edges.agg(F.sum("l_quantity")).collect()[0][0]
    got_q = back.edges.select(
        F.element_at(F.col("properties"), "l_quantity").cast("double").alias("q")
    ).agg(F.sum("q")).collect()[0][0]
    assert got_q == pytest.approx(want_q)

    # src/dst/type triplets intact for a spot type
    assert (
        back.edges.filter(F.col("type") == "IN").count()
        == graph.edges.filter(F.col("type") == "IN").count()
    )


def test_csv_roundtrip(spark, catalog):
    path = f"{TMP}/nation_csv"
    export_csv(catalog.nation, path)
    back = load_csv(spark, path)
    assert sorted(back.columns) == sorted(catalog.nation.columns)
    assert back.count() == catalog.nation.count()
    want = {r.n_nationkey for r in catalog.nation.select("n_nationkey").collect()}
    got = {r.n_nationkey for r in back.select("n_nationkey").collect()}
    assert got == want


def test_json_roundtrip_preserves_types(spark, catalog):
    path = f"{TMP}/region_json"
    export_json(catalog.region.withColumn("flag", F.lit(True)), path)
    back = load_json(spark, path)
    row = back.orderBy("r_regionkey").first()
    assert isinstance(row.r_regionkey, int)
    assert row.flag is True
