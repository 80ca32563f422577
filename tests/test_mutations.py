"""Unit tests for SURVEY §2.7 batch mutations — MERGE row fates, DELETE
constraint behavior, label set ops, stats counters — on tiny tables
(the reference's merge_test.go / executor_mutations behavior-test style).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nornicdb_spark.operators import mutations as mut


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id long, name string, bal long"
    )


def test_create_fills_missing_columns(spark, base):
    res = mut.create_rows(base, spark.createDataFrame([(3,)], "id long"))
    rows = {r.id: (r.name, r.bal) for r in res.df.collect()}
    assert rows[3] == (None, None)
    assert res.stats.nodes_created == 1
    assert len(rows) == 3


def test_merge_three_row_fates(spark, base):
    # matched (id=2), created (id=9), untouched (id=1)
    incoming = spark.createDataFrame([(2, 99), (9, 7)], "id long, bal long")
    res = mut.merge_rows(
        base,
        incoming,
        keys=["id"],
        on_create={"name": F.lit("made")},
        on_match={"bal": F.col("_new_bal") + F.col("bal")},
    )
    rows = {r.id: (r.name, r.bal) for r in res.df.collect()}
    assert rows[1] == ("a", 10)          # untouched
    assert rows[2] == ("b", 119)         # ON MATCH: new + old
    assert rows[9] == ("made", 7)        # ON CREATE
    assert res.stats.nodes_created == 1


def test_merge_introduces_new_property_column(spark, base):
    incoming = spark.createDataFrame([(1, "x")], "id long, tag string")
    res = mut.merge_rows(
        base, incoming, keys=["id"], on_match={"tag": F.col("_new_tag")}
    )
    rows = {r.id: r.tag for r in res.df.collect()}
    assert rows[1] == "x" and rows[2] is None


def test_merge_default_on_match_keeps_base(spark, base):
    incoming = spark.createDataFrame([(1, "zzz", 0)], "id long, name string, bal long")
    res = mut.merge_rows(base, incoming, keys=["id"])
    rows = {r.id: (r.name, r.bal) for r in res.df.collect()}
    assert rows[1] == ("a", 10)  # MERGE without ON MATCH SET mutates nothing


def test_set_and_remove_properties(spark, base):
    res = mut.set_properties(base, F.col("id") == 1, {"bal": F.lit(0)})
    assert {r.id: r.bal for r in res.df.collect()} == {1: 0, 2: 20}
    assert res.stats.properties_set == 1
    res2 = mut.remove_properties(res.df, F.col("id") == 1, "bal")
    assert {r.id: r.bal for r in res2.df.collect()} == {1: None, 2: 20}


def test_label_add_remove_idempotent(spark):
    nodes = spark.createDataFrame(
        [(1, ["A"]), (2, ["A", "B"])], "id long, labels array<string>"
    )
    res = mut.add_label(nodes, F.lit(True), "B")
    assert {r.id: r.labels for r in res.df.collect()} == {1: ["A", "B"], 2: ["A", "B"]}
    assert res.stats.labels_added == 1  # node 2 already had B
    res2 = mut.remove_label(res.df, F.col("id") == 1, "A")
    assert {r.id: r.labels for r in res2.df.collect()} == {1: ["B"], 2: ["A", "B"]}


def test_delete_refuses_with_relationships(spark, base):
    edges = spark.createDataFrame([(1, 2, "R")], "src long, dst long, type string")
    with pytest.raises(ValueError, match="DETACH"):
        mut.delete_nodes(base, F.col("id") == 1, edges=edges, detach=False)


def test_detach_delete_cascades(spark, base):
    edges = spark.createDataFrame(
        [(1, 2, "R"), (2, 1, "R"), (2, 2, "S")], "src long, dst long, type string"
    )
    res = mut.delete_nodes(base, F.col("id") == 1, edges=edges, detach=True)
    assert [r.id for r in res.df.collect()] == [2]
    assert [(r.src, r.dst) for r in res.edges.collect()] == [(2, 2)]
    assert res.stats.nodes_deleted == 1
    assert res.stats.relationships_deleted == 2


def test_delete_null_predicate_keeps_node(spark):
    # Cypher 3VL: DELETE ... WHERE age > 30 with age NULL is no-match —
    # the row must survive, not silently vanish from both sets.
    df = spark.createDataFrame(
        [(1, 40), (2, None), (3, 20)], "id long, age long"
    )
    res = mut.delete_nodes(df, F.col("age") > 30)
    assert sorted(r.id for r in res.df.collect()) == [2, 3]
    assert res.stats.nodes_deleted == 1


def test_delete_by_target_frame(spark, base):
    targets = spark.createDataFrame([(2,)], "id long")
    res = mut.delete_nodes(base, targets)
    assert [r.id for r in res.df.collect()] == [1]


def test_unique_constraint(spark):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], "k long, v string")
    viol = mut.unique_violations(df, ["k"]).collect()
    assert [(r.k, r.n) for r in viol] == [(1, 2)]
    with pytest.raises(ValueError, match="unique"):
        mut.assert_unique(df, ["k"])
    mut.assert_unique(df, ["k", "v"])  # composite key is unique
