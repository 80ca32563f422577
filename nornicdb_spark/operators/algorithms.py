"""Graph algorithms — SURVEY §2.9, GraphX/GraphFrames-style on DataFrames.

The reference implements these as single-process Go loops over adjacency
maps (pkg/cypher/apoc_algorithms.go, apoc_community.go,
linkprediction.go). Here each is the standard distributed formulation:
joins for neighbor aggregation, driver-side loop with localCheckpoint for
the fixpoint (lineage truncation — without it iteration N replays
iterations 1..N-1).

Determinism: every tie is broken by min-id / explicit ordering so results
are stable across runs and partitionings (required by the oracle harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(graph) -> DataFrame:
    """Per-node in/out/total degree (reference fn degree/inDegree/outDegree,
    SURVEY §2.6 entity row). Nodes with no edges get 0s."""
    out_deg = graph.edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    in_deg = graph.edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        graph.nodes.select("id", "label", "key")
        .join(out_deg, "id", "left_outer")
        .join(in_deg, "id", "left_outer")
        .fillna(0, subset=["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    graph,
    iterations: int = 10,
    damping: float = 0.85,
    rel_types: tuple[str, ...] = (),
) -> DataFrame:
    """PageRank by power iteration (reference apoc.algo.pageRank,
    apoc_algorithms.go:252-307 — same formulation: rank = (1-d)/N +
    d * Σ rank(in)/outDeg(in); dangling nodes' mass redistributed
    uniformly so total rank stays 1).

    Returns (id, pagerank). Scale: ranks/edges are hash-partitioned on id;
    each iteration is one shuffle (join + agg); lineage cut per iteration.
    """
    edges = (graph.edges_by_type(*rel_types) if rel_types else graph.edges).select(
        "src", "dst"
    )
    nodes = graph.nodes.select("id")
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    # (id, out_degree) — out_degree null ⇒ dangling node
    ranks = nodes.join(out_deg, "id", "left_outer").withColumn(
        "rank", F.lit(1.0 / n)
    )
    ranks = ranks.localCheckpoint(eager=True)

    for _ in range(iterations):
        contribs = (
            ranks.filter(F.col("out_degree").isNotNull())
            .join(edges, ranks.id == edges.src)
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("contrib"))
        )
        dangling = (
            ranks.filter(F.col("out_degree").isNull()).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            ranks.select("id", "out_degree")
            .join(contribs, "id", "left_outer")
            .withColumn(
                "rank",
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0)),
            )
            .drop("contrib")
        ).localCheckpoint(eager=True)

    return ranks.select("id", F.col("rank").alias("pagerank"))


def connected_components(graph, max_iterations: int = 30) -> DataFrame:
    """Weakly connected components (reference apoc.algo.wcc,
    apoc_community.go:332-429). Returns (id, component) where component =
    min node id (lexicographic) in the component.

    Iterative min-label propagation over the undirected edge set until
    fixpoint — O(diameter) shuffles.
    """
    und = (
        graph.edges.select("src", "dst")
        .unionByName(
            graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
    )
    labels = graph.nodes.select("id", F.col("id").alias("component"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            labels.join(und, labels.id == und.src)
            .select(F.col("dst").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, "id", "left_outer")
            .withColumn(
                "new_component",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ),
            )
        )
        n_changed = updated.filter(
            F.col("new_component") != F.col("component")
        ).count()
        labels = updated.select(
            "id", F.col("new_component").alias("component")
        ).localCheckpoint(eager=True)
        if n_changed == 0:
            break
    return labels


def label_propagation(graph, max_iterations: int = 10) -> DataFrame:
    """Synchronous LPA communities (reference apoc.algo.labelPropagation,
    apoc_community.go:225-329). Deterministic variant: each node adopts
    the most frequent neighbor label, ties broken by min label.
    Returns (id, community)."""
    und = graph.edges.select("src", "dst").unionByName(
        graph.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = graph.nodes.select("id", F.col("id").alias("community"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        counts = (
            labels.join(und, labels.id == und.src)
            .groupBy(F.col("dst").alias("id"), F.col("community"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # most-frequent neighbor label, ties → min label: two-stage agg
        # (max count, then min community among argmax) keeps it all
        # map-side-combinable.
        max_n = counts.groupBy("id").agg(F.max("n").alias("max_n"))
        best = (
            counts.join(max_n, "id")
            .filter(F.col("n") == F.col("max_n"))
            .groupBy("id")
            .agg(F.min("community").alias("new_community"))
        )
        updated = labels.join(best, "id", "left_outer").withColumn(
            "next", F.coalesce(F.col("new_community"), F.col("community"))
        )
        n_changed = updated.filter(F.col("next") != F.col("community")).count()
        labels = updated.select("id", F.col("next").alias("community")).localCheckpoint(
            eager=True
        )
        if n_changed == 0:
            break
    return labels


def common_neighbors(
    graph,
    rel_types: tuple[str, ...] = (),
    min_common: int = 1,
) -> DataFrame:
    """gds.linkPrediction.commonNeighbors / jaccard / adamicAdar /
    preferentialAttachment scores for node pairs sharing ≥min_common
    out-neighbors (reference linkprediction.go:162-340).

    Neighborhood = out-neighbors over ``rel_types``. Returns
    (a, b, common, jaccard, adamic_adar, preferential_attachment)
    for a < b. Self-join on the shared-neighbor key — the standard
    distributed formulation (shuffle on neighbor id, skew-prone on hub
    nodes; cap hub fan-out upstream if needed).
    """
    e = (graph.edges_by_type(*rel_types) if rel_types else graph.edges).select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).distinct()
    deg = e.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    nbr_deg = e.groupBy("nbr").agg(F.count(F.lit(1)).alias("nbr_in_deg"))

    a = e.select(F.col("node").alias("a"), "nbr")
    b = e.select(F.col("node").alias("b"), "nbr")
    pairs = (
        a.join(b, "nbr")
        .filter(F.col("a") < F.col("b"))
        .join(nbr_deg, "nbr")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(1.0 / F.log(F.col("nbr_in_deg"))).alias("adamic_adar"),
        )
        .filter(F.col("common") >= min_common)
    )
    return (
        pairs.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b")), "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("deg_a") + F.col("deg_b") - F.col("common")),
        )
        .withColumn(
            "preferential_attachment", (F.col("deg_a") * F.col("deg_b")).cast("long")
        )
        .select(
            "a", "b", "common", "jaccard", "adamic_adar", "preferential_attachment"
        )
    )


def k_hop_neighborhood(
    graph,
    start: DataFrame,
    k: int,
    rel_types: tuple[str, ...] = (),
    direction: str = "out",
) -> DataFrame:
    """apoc.neighbors.tohop — distinct nodes within ≤k hops, excluding the
    start node itself (reference apoc_algorithms.go:448-551). Returns
    (start_id, end_id, first_depth)."""
    from nornicdb_spark.operators.paths import shortest_paths

    reach = shortest_paths(
        graph, start, graph.nodes.select("id"), max_hops=k,
        rel_types=rel_types, direction=direction,
    )
    return (
        reach.filter(F.col("distance") > 0)
        .select("start_id", "end_id", F.col("distance").alias("first_depth"))
    )
