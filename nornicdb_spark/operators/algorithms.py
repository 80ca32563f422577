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

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nornicdb_spark.operators.scope import CkptScope


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


def _typed_pair_edges(graph, rel_types: tuple[str, ...], encoded: bool) -> DataFrame:
    """Lean (src, dst) edge set for the given rel types, long-encoded when
    the graph supports it — STATIC per (graph, rel_types): memoized like
    the shared adjacency (bounded by the type vocabulary), so repeated
    iterative calls neither rescan parquet nor leak per-invocation
    checkpoint blocks."""
    if not rel_types:
        return graph.adj_pairs_encoded() if encoded else graph.adj_pairs()

    def build():
        if encoded:
            e = graph.edges_full_by_type(*rel_types)
            if "src_enc" in e.columns:
                e = e.select(
                    F.col("src_enc").alias("src"), F.col("dst_enc").alias("dst")
                )
            else:
                e = e.select(
                    graph.encode_id(F.col("src")).alias("src"),
                    graph.encode_id(F.col("dst")).alias("dst"),
                )
        else:
            e = graph.edges_by_type(*rel_types).select("src", "dst")
        return e.localCheckpoint(eager=True)

    return graph.memo(("typed_pairs", tuple(rel_types), encoded), build)


_SIZE_SUFFIX = {
    "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
}


def _parse_byte_conf(raw: str) -> int:
    """Spark byte-string config value ('67108864', '10m', '64MB', '-1')
    → bytes (negative = feature disabled)."""
    s = str(raw).strip().lower()
    for suffix in sorted(_SIZE_SUFFIX, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SIZE_SUFFIX[suffix])
    return int(float(s))


def broadcast_node_ceiling(graph, override: int | None = None) -> int:
    """Max node count whose per-node rank state still fits the session's
    broadcast budget. Derived from ``spark.sql.autoBroadcastJoinThreshold``
    (≈16 B per state row: 8 B long id + 8 B double) instead of a hardcoded
    row count, so the same code broadcasts ~4M nodes at the default 64 MB
    threshold and falls back to Catalyst's shuffle join on graphs/clusters
    where broadcasting O(V) state is exactly what does not scale.
    ``override`` (the operators' ``broadcast_state_max_nodes`` kwarg) pins
    the ceiling explicitly; threshold ≤ 0 (broadcast disabled) ⇒ 0."""
    if override is not None:
        return override
    try:
        raw = graph.nodes.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "67108864"
        )
        threshold = _parse_byte_conf(raw)
    except Exception:  # pragma: no cover - conf plumbing guard
        threshold = 64 << 20
    return max(0, threshold // 16)


def pagerank(
    graph,
    iterations: int = 10,
    damping: float = 0.85,
    rel_types: tuple[str, ...] = (),
    broadcast_state_max_nodes: int | None = None,
) -> DataFrame:
    """PageRank by power iteration (reference apoc.algo.pageRank,
    apoc_algorithms.go:252-307 — same formulation: rank = (1-d)/N +
    d * Σ rank(in)/outDeg(in); dangling nodes' mass redistributed
    uniformly so total rank stays 1). Returns (id, pagerank).

    Execution shape ("contribs as state"): the per-iteration persisted
    state is the AGGREGATED contribution table (≤ one row per node with
    in-edges), not the joined rank table. Each iteration is then a single
    pipelined pass — rebuild ranks from (static base ⋈ contribs), probe
    the edge pairs, partial-aggregate map-side, one shuffle on dst — and
    one small localCheckpoint. Rank-side joins are broadcast when the
    node count is below ``broadcast_state_max_nodes`` (node state is tiny
    relative to edges; at sf0.1 this halves iteration latency by keeping
    the whole pass in one stage); above it they fall back to Catalyst's
    shuffle join, because broadcasting O(V) state is exactly what does
    not scale. Dangling mass is derived from mass conservation
    (Σ rank = 1 every iteration ⇒ dangling mass = 1 − Σ contribs) as a
    broadcast 1-row aggregate over the checkpointed state — no second
    pass over ranks, no driver collect.
    """
    # static across iterations. Untyped: the shared lean pair adjacency
    # (graph.adj_pairs() — built once per graph instance from the pruned
    # 2-column scan). Typed: a lazy per-call plan keeps the type filter
    # and column pruning at the parquet scans, then materializes the
    # (small) filtered set.
    # Long-encoded fast path (star-schema graphs): ranks are invariant
    # under any 1:1 re-keying of node ids, so the whole iteration loop
    # shuffles 8-byte longs and only the final projection decodes back to
    # string ids.
    scope = CkptScope()  # frees per-invocation checkpoint blocks on exit
    encoded = graph.numeric_keys
    edges = _typed_pair_edges(graph, rel_types, encoded)
    if encoded:
        nodes = graph.nodes_encoded()
    else:
        nodes = graph.nodes.select("id")

    def build_base():
        n = nodes.count()
        if n == 0:
            return n, None
        out_deg = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree")
        )
        # static (id, out_degree) — out_degree null ⇒ dangling node
        return n, nodes.join(out_deg, "id", "left_outer").localCheckpoint(
            eager=True
        )

    # node count + degree base are static per (graph, rel_types) — memoized
    # like the shared adjacency, so repeated pagerank calls skip the setup
    n, base = graph.memo(("pr_base", tuple(rel_types), encoded), build_base)
    if n == 0:
        return nodes.withColumn("pagerank", F.lit(0.0))

    maybe_bcast = (
        F.broadcast
        if n <= broadcast_node_ceiling(graph, broadcast_state_max_nodes)
        else (lambda df: df)
    )
    emitters = base.filter(F.col("out_degree").isNotNull())

    def rank_expr(contrib_col, s_col):
        return F.lit((1.0 - damping) / n) + F.lit(damping) * (
            F.coalesce(contrib_col, F.lit(0.0)) + (F.lit(1.0) - s_col) / n
        )

    def roll_with_mass(old: DataFrame | None, plan: DataFrame):
        """Checkpoint the new contribs lazily and compute Σ contrib with
        the SAME action that materializes the checkpoint — one job where
        an eager checkpoint plus a per-iteration broadcast of the 1-row
        mass aggregate was two (plus a BroadcastExchange stage inside the
        next iteration's plan). The collected scalar is a bounded 1-row
        driver artifact (the same convention as the loops' convergence
        counts); its value is bit-identical to what the old broadcast
        crossJoin computed — it is the same physical aggregation."""
        new = scope.ckpt(plan, eager=False)
        s = new.agg(F.coalesce(F.sum("contrib"), F.lit(0.0))).collect()[0][0]
        if old is not None:
            scope.release(old)
        return new, float(s)

    contribs: DataFrame | None = None
    s_val = 0.0
    for _ in range(iterations):
        if contribs is None:  # first iteration: uniform ranks, no join
            ranks = emitters.withColumn("rank", F.lit(1.0 / n))
        else:
            ranks = (
                emitters.join(maybe_bcast(contribs), "id", "left_outer")
                .withColumn("rank", rank_expr(F.col("contrib"), F.lit(s_val)))
                .select("id", "out_degree", "rank")
            )
        contribs, s_val = roll_with_mass(
            contribs,
            maybe_bcast(
                ranks.select(
                    "id", (F.col("rank") / F.col("out_degree")).alias("c")
                )
            )
            .join(edges, F.col("id") == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("contrib")),
        )

    if contribs is None:  # iterations == 0
        out = nodes.withColumn("pagerank", F.lit(1.0 / n))
    else:
        out = (
            base.join(maybe_bcast(contribs), "id", "left_outer")
            .withColumn("pagerank", rank_expr(F.col("contrib"), F.lit(s_val)))
            .select("id", "pagerank")
        )
    if encoded:
        out = out.select(graph.decode_id(F.col("id")).alias("id"), "pagerank")
    # the lazy result still reads the final contribs frame: it escapes to
    # the session registry; every superseded round's blocks are freed here
    return scope.finish(out, keep=() if contribs is None else (contribs,))


def personalized_pagerank(
    graph,
    sources: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    rel_types: tuple[str, ...] = (),
    broadcast_state_max_nodes: int | None = None,
) -> DataFrame:
    """Personalized PageRank (the GDS pageRank sourceNodes config):
    teleport AND dangling mass go to the source distribution p
    (p_i = 1/|S| on sources, 0 elsewhere) instead of uniformly —
    rank = (1−d)·p + d·(Σ rank(in)/outDeg(in) + dangling_mass·p),
    init rank = p. Same contribs-as-state execution shape as
    :func:`pagerank` (one shuffle per iteration, dangling mass from mass
    conservation as a broadcast 1-row aggregate); the per-node p column
    rides in the static base, so personalization adds no per-iteration
    joins. ``sources``: DataFrame with an ``id`` column.
    Returns (id, pagerank)."""
    scope = CkptScope()  # frees per-invocation checkpoint blocks on exit
    encoded = graph.numeric_keys
    edges = _typed_pair_edges(graph, rel_types, encoded)
    nodes = graph.nodes.select("id")
    src = sources.select("id").distinct()
    if encoded:
        nodes = graph.nodes_encoded()
        src = src.select(graph.encode_id(F.col("id")).alias("id"))
    # Validate sources against the node set BEFORE sizing the teleport
    # distribution: an unknown source id would make sum(p) < 1 and leak
    # rank mass every iteration. GDS fails fast on unknown sourceNodes;
    # we do the same (one cheap semi-join + count at setup time).
    n_raw = src.count()
    src = scope.ckpt(src.join(nodes, "id", "left_semi"))
    n_src = src.count()
    if n_src != n_raw:
        raise ValueError(
            f"personalized_pagerank: {n_raw - n_src} of {n_raw} source ids "
            "are not nodes of the graph (GDS sourceNodes validation)"
        )
    if n_src == 0:
        return scope.finish(
            graph.nodes.select("id").withColumn("pagerank", F.lit(0.0))
        )

    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    base = (
        nodes.join(out_deg, "id", "left_outer")
        .join(src.withColumn("_s", F.lit(1)), "id", "left_outer")
        .withColumn(
            "p",
            F.when(F.col("_s").isNotNull(), F.lit(1.0 / n_src)).otherwise(
                F.lit(0.0)
            ),
        )
        .select("id", "out_degree", "p")
    )
    base = scope.ckpt(base)
    scope.release(src)  # folded into base — dead from here on
    n = graph.nodes.count()
    maybe_bcast = (
        F.broadcast
        if n <= broadcast_node_ceiling(graph, broadcast_state_max_nodes)
        else (lambda df: df)
    )
    emitters = base.filter(F.col("out_degree").isNotNull())

    def rank_expr(contrib_col, s_col):
        return F.lit(1.0 - damping) * F.col("p") + F.lit(damping) * (
            F.coalesce(contrib_col, F.lit(0.0)) + (F.lit(1.0) - s_col) * F.col("p")
        )

    def roll_with_mass(old: DataFrame | None, plan: DataFrame):
        # one job materializes the lazy checkpoint AND returns Σ contrib
        # (see pagerank.roll_with_mass)
        new = scope.ckpt(plan, eager=False)
        s = new.agg(F.coalesce(F.sum("contrib"), F.lit(0.0))).collect()[0][0]
        if old is not None:
            scope.release(old)
        return new, float(s)

    contribs: DataFrame | None = None
    s_val = 0.0
    for _ in range(iterations):
        if contribs is None:  # first iteration: rank = p, no join
            ranks = emitters.withColumn("rank", F.col("p"))
        else:
            ranks = (
                emitters.join(maybe_bcast(contribs), "id", "left_outer")
                .withColumn("rank", rank_expr(F.col("contrib"), F.lit(s_val)))
                .select("id", "out_degree", "rank")
            )
        contribs, s_val = roll_with_mass(
            contribs,
            maybe_bcast(
                ranks.select(
                    "id", (F.col("rank") / F.col("out_degree")).alias("c")
                )
            )
            .join(edges, F.col("id") == edges.src)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("contrib")),
        )

    if contribs is None:
        out = base.select("id", F.col("p").alias("pagerank"))
    else:
        out = (
            base.join(maybe_bcast(contribs), "id", "left_outer")
            .withColumn("pagerank", rank_expr(F.col("contrib"), F.lit(s_val)))
            .select("id", "pagerank")
        )
    if encoded:
        out = out.select(graph.decode_id(F.col("id")).alias("id"), "pagerank")
    keep = (base,) if contribs is None else (base, contribs)
    return scope.finish(out, keep=keep)


def _undirected_pairs(graph, distinct: bool) -> DataFrame:
    """Symmetrized (src, dst) pair set, src-partitioned and checkpointed —
    STATIC per graph, memoized alongside the shared adjacency (wcc wants
    the distinct closure; LPA keeps parallel-edge multiplicity)."""

    def build():
        adj = graph.adj_pairs()
        und = adj.unionByName(
            adj.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        if distinct:
            und = und.distinct()
        return und.repartition("src").localCheckpoint(eager=True)

    return graph.memo(("und_pairs", distinct), build)


def connected_components(graph, max_iterations: int = 30) -> DataFrame:
    """Weakly connected components (reference apoc.algo.wcc,
    apoc_community.go:332-429). Returns (id, component) where component =
    min node id (lexicographic) in the component.

    Iterative min-label propagation over the undirected edge set until
    fixpoint — O(diameter) shuffles.
    """
    scope = CkptScope()
    und = _undirected_pairs(graph, distinct=True)  # static, memoized
    labels = graph.nodes.select("id", F.col("id").alias("component"))
    labels = scope.ckpt(labels)

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
        labels = scope.roll(
            labels,
            updated.select("id", F.col("new_component").alias("component")),
        )
        if n_changed == 0:
            break
    return scope.finish(labels, keep=(labels,))


def label_propagation(graph, max_iterations: int = 10) -> DataFrame:
    """Synchronous LPA communities (reference apoc.algo.labelPropagation,
    apoc_community.go:225-329). Deterministic variant: each node adopts
    the most frequent neighbor label, ties broken by min label.
    Returns (id, community)."""
    scope = CkptScope()
    und = _undirected_pairs(graph, distinct=False)  # static, memoized
    labels = graph.nodes.select("id", F.col("id").alias("community"))
    labels = scope.ckpt(labels)

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
        labels = scope.roll(
            labels, updated.select("id", F.col("next").alias("community"))
        )
        if n_changed == 0:
            break
    return scope.finish(labels, keep=(labels,))


def common_neighbors(
    graph,
    rel_types: tuple[str, ...] = (),
    min_common: int = 1,
    max_nbr_degree: int | None = None,
) -> DataFrame:
    """gds.linkPrediction.commonNeighbors / jaccard / adamicAdar /
    resourceAllocation / preferentialAttachment scores for node pairs
    sharing ≥min_common out-neighbors (reference linkprediction.go:162-340;
    resource allocation Σ 1/|N(z)| per linkpredict/topology.go:550-577,
    Zhou et al. 2009).

    Neighborhood = out-neighbors over ``rel_types``. Returns
    (a, b, common, jaccard, adamic_adar, resource_allocation,
    preferential_attachment) for a < b.

    Shape: group edges by the shared neighbor, emit the sorted in-
    neighbor list once per neighbor, and generate the C(d,2) ordered
    pairs map-side from the list — one shuffle (the groupBy) replaces the
    classic self-join's two, the in-degree rides along as ``size(list)``
    instead of a third join, and the (a,b) aggregation partial-combines
    before its shuffle. Skew profile is identical to the self-join (a
    hub's quadratic pair stream lands on its neighbor key either way) —
    the hub cap below is the mitigation.
    """
    e = graph.pairs_by_type(*rel_types).select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    )

    # Numeric fast path: node ids are '<Label>:<key>'. When the (single)
    # rel type connects exactly one (src,dst) label pair, the prefixes
    # are constants — strip them and run the whole pair pipeline on
    # longs (the quadratic pair stream then shuffles 16-byte keys, not
    # ~25-byte strings; ~3× faster at sf0.1). Every score is symmetric
    # in (a,b), so aggregating in numeric orientation and restoring the
    # engine's lexicographic orientation at output is value-identical.
    eps = graph.type_endpoints.get(rel_types[0]) if len(rel_types) == 1 else None
    keyed = eps is not None and len(eps) == 1
    if keyed:
        src_label = eps[0][0]
        e = e.select(
            F.split("node", ":").getItem(1).cast("long").alias("node"),
            F.split("nbr", ":").getItem(1).cast("long").alias("nbr"),
        )

    deg = e.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))

    # The C(d,2) pair stream is the operator's dominant shuffle (measured
    # at sf0.1: 156 MB of the query's 167 MB total), so its rows carry
    # ONLY the bare (a, b) keys — degrees are attached AFTER the
    # min_common filter, on the aggregated pair table, which is always ≤
    # (and typically d× smaller than) the pre-agg stream. Earlier
    # revisions rode (node, deg) structs through the stream to keep the
    # post-agg plan join-free; that doubled every shuffled row to save
    # two joins on the far smaller result. array_sort on the bare keys
    # preserves the ascending (a < b) orientation the struct sort had.
    sc = e.sparkSession.sparkContext
    nbrs = e.groupBy("nbr").agg(
        F.array_sort(F.collect_set("node")).alias("ns")
    ).select(F.size("ns").alias("d"), "ns")
    # The C(d,2) explosion below multiplies row count ~100×; without this
    # AQE sizes the stage from the tiny pre-explode aggregate and runs
    # the quadratic work on a handful of cores.
    nbrs = nbrs.repartition(sc.defaultParallelism * 2)
    # hub fan-out cap: a celebrity shared-neighbor z contributes
    # in_deg(z)² candidate pairs — at 100× scale one hub explodes the
    # pair stream. With the cap, neighbors above the ceiling are dropped
    # from the pair source (their AA/RA contribution is ~0 anyway:
    # 1/log(deg), 1/deg); scores become "hub-capped" per the standard
    # large-graph practice. None = exact.
    if max_nbr_degree is not None:
        nbrs = nbrs.filter(F.col("d") <= max_nbr_degree)
    # all (a, b) with a < b from the sorted list, generated in the
    # neighbor's partition: flatten(transform(ns, (x,i) → slice-after-i
    # paired with x))
    combos = F.flatten(
        F.transform(
            F.col("ns"),
            lambda x, i: F.transform(
                F.slice(F.col("ns"), i + 2, F.size(F.col("ns"))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    # per-neighbor AA/RA contributions are constant across that
    # neighbor's C(d,2) pairs — compute the log/div ONCE per neighbor
    # row, not once per exploded pair (the pair stream is ~d×/2 larger)
    nbrs = nbrs.withColumn("_aa", 1.0 / F.log(F.col("d"))).withColumn(
        "_ra", 1.0 / F.col("d")
    )
    pairs = (
        nbrs.select("_aa", "_ra", F.explode(combos).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            # rounded to 9 decimals: these float sums are the only partition-
            # order-sensitive outputs of the operator. The 1e-12 shift
            # moves the rounding boundary off nice decimals: 1/pd sums are
            # rationals that can land EXACTLY on x.xxxxxxxx5, where
            # Spark's BigDecimal(string) rounding and an oracle's
            # binary-value rounding disagree by 1e-9.
            F.round(F.sum("_aa") + 1e-12, 9).alias("adamic_adar"),
            F.round(F.sum("_ra") + 1e-12, 9).alias("resource_allocation"),
        )
        .filter(F.col("common") >= min_common)
    )
    # degree attach on the aggregated (post-filter) pair table — two
    # equi-joins against the O(|V|) degree table (AQE broadcasts it when
    # it fits; at sf0.1 it is 3 orders of magnitude smaller than the
    # pair stream these columns used to ride through)
    scored = (
        pairs.join(
            deg.select(F.col("node").alias("a"), F.col("deg").alias("_da")), "a"
        )
        .join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("_db")), "b"
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("_da") + F.col("_db") - F.col("common")),
        )
        .withColumn(
            "preferential_attachment",
            (F.col("_da") * F.col("_db")).cast("long"),
        )
    )
    if keyed:
        # restore string ids + lexicographic (a, b) orientation (numeric
        # and string order disagree: 'X:10' < 'X:2' lexicographically)
        sa = F.concat(F.lit(src_label + ":"), F.col("a").cast("string"))
        sb = F.concat(F.lit(src_label + ":"), F.col("b").cast("string"))
        scored = scored.withColumn("a_s", F.least(sa, sb)).withColumn(
            "b_s", F.greatest(sa, sb)
        ).drop("a", "b").withColumnRenamed("a_s", "a").withColumnRenamed("b_s", "b")
    return scored.select(
        "a", "b", "common", "jaccard", "adamic_adar",
        "resource_allocation", "preferential_attachment"
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


def weighted_shortest_paths(
    graph,
    start: DataFrame,
    weight_col: str | None = None,
    rel_types: tuple[str, ...] = (),
    direction: str = "out",
    max_iterations: int = 20,
    with_paths: bool = False,
) -> DataFrame:
    """apoc.algo.dijkstra — weighted shortest-path distances from every
    start node (reference apoc_algorithms.go:67-113: priority-queue
    Dijkstra, weight = edge property else 1.0, directed out-edges).

    Distributed formulation is iterative relaxation (delta-stepping
    degenerate case): each round relaxes the *improved* frontier only, so
    settled mass stops shuffling — rounds ≈ longest shortest-path hop
    count. Returns ``(start_id, end_id, cost[, node_path])``; cost of the
    start itself is 0.0. With ``with_paths`` ties on cost break by
    lexicographic node_path (deterministic); without it only the scalar
    min cost is tracked — path arrays never enter the shuffle, which is
    the difference between shuffling (pair, double) and (pair, array)
    rows at 100 TB.
    """
    # Long-encoded fast path: distances are invariant under 1:1 node
    # re-keying, so the relaxation loop shuffles (long, long, double)
    # rows; only the final projection decodes. Path mode stays on strings
    # — its cost ties break by LEXICOGRAPHIC node_path, which encoding
    # would reorder.
    encoded = graph.numeric_keys and not with_paths
    e = _weighted_oriented_edges(
        graph, rel_types, direction, weight_col, encode=encoded
    )
    if encoded:
        start = start.select(graph.encode_id(F.col("id")).alias("id"))

    scope = CkptScope()
    state = [F.lit(0.0).alias("cost")]
    if with_paths:
        state.append(F.array(F.col("id")).alias("node_path"))
    best = scope.ckpt(
        start.select(
            F.col("id").alias("start_id"), F.col("id").alias("end_id"), *state
        )
    )
    support = best  # the checkpointed frame the current `best` plan reads
    frontier = best

    carry = ["start_id", "end_id", "cost"] + (["node_path"] if with_paths else [])

    # Per round ONE exchange + ONE checkpoint/action: raw relaxation
    # candidates (tagged new) are UNIONed with the settled table (tagged
    # old) and hash-aggregated per pair key — min-of-new and min-of-old
    # in one pass. This replaces the earlier min_agg + full-outer-join
    # shape, whose pre-aggregated candidates were shuffled AGAIN into a
    # sort-merge join against the (unpartitioned checkpoint) settled
    # side: 3 exchanges + 2 sorts per round collapse into 1 exchange +
    # 0 sorts, and the shuffled bytes drop by the aggregated-candidate
    # table. The checkpointed agg output yields the improved frontier (a
    # filter) and the updated best (a projection) without further
    # shuffles, exactly as before.
    def tag(df: DataFrame, old: bool) -> DataFrame:
        cols = ["start_id", "end_id"]
        if with_paths:
            cols.append(
                F.struct("cost", "node_path").alias("m")
            )
        else:
            cols.append(F.col("cost").alias("m"))
        return df.select(*cols, F.lit(old).alias("_old"))

    new_min = F.min(F.when(~F.col("_old"), F.col("m"))).alias("new_m")
    old_min = F.min(F.when(F.col("_old"), F.col("m"))).alias("old_m")
    cost_of = (lambda m: m.getField("cost")) if with_paths else (lambda m: m)

    for _ in range(max_iterations):
        relax = [
            "start_id",
            F.col("dst").alias("end_id"),
            (F.col("cost") + F.col("w")).alias("cost"),
        ]
        if with_paths:
            relax.append(
                F.array_append(F.col("node_path"), F.col("dst")).alias("node_path")
            )
        cand = frontier.join(e, frontier.end_id == e.src).select(*relax)
        # lazy checkpoint + count = ONE job per round: the improved-count
        # action both materializes the checkpoint and decides termination
        # (an eager checkpoint followed by isEmpty would be two)
        merged = scope.ckpt(
            tag(cand, old=False)
            .unionByName(tag(best, old=True))
            .groupBy("start_id", "end_id")
            .agg(new_min, old_min),
            eager=False,
        )
        # strict <: a cost tie keeps the settled entry (same rule the
        # full-outer-join shape applied)
        is_better = F.col("new_m").isNotNull() & (
            F.col("old_m").isNull()
            | (cost_of(F.col("new_m")) < cost_of(F.col("old_m")))
        )
        win = F.when(is_better, F.col("new_m")).otherwise(F.col("old_m"))
        if with_paths:
            unpack = [win.getField("cost").alias("cost"),
                      win.getField("node_path").alias("node_path")]
        else:
            unpack = [win.alias("cost")]
        improved = merged.filter(is_better).select("start_id", "end_id", *unpack)
        if improved.count() == 0:
            scope.release(merged)  # best never adopted this round's merge
            break
        best = merged.select("start_id", "end_id", *unpack)  # lazy — no 2nd job
        scope.release(support)  # superseded: best now reads this round's merge
        support = merged
        frontier = improved

    out = best.select(*carry)
    if encoded:
        out = out.select(
            graph.decode_id(F.col("start_id")).alias("start_id"),
            graph.decode_id(F.col("end_id")).alias("end_id"),
            "cost",
        )
    return scope.finish(out, keep=(support,))


def astar_shortest_path(
    graph,
    start: DataFrame,
    target: DataFrame,
    heuristic: DataFrame,
    weight_col: str | None = None,
    rel_types: tuple[str, ...] = (),
    max_iterations: int = 20,
) -> DataFrame:
    """apoc.algo.aStar (reference apoc_algorithms.go:114-205: Dijkstra +
    admissible lat/lon heuristic). In a batch engine the heuristic cannot
    reorder a priority queue; instead it *prunes*: a frontier entry whose
    f = cost + h(end) already exceeds the best-known target cost can never
    improve the answer and is dropped. With h ≡ 0 this degrades exactly to
    :func:`weighted_shortest_paths` restricted to targets.

    ``heuristic``: DataFrame (id, h) — admissible lower bound on
    remaining cost to any target. Returns (start_id, end_id, cost).
    """
    scope = CkptScope()
    e = _weighted_oriented_edges(graph, rel_types, "out", weight_col)
    h = heuristic.select(F.col("id").alias("end_id"), F.col("h").alias("h"))
    targets = target.select(F.col("id").alias("end_id")).distinct()

    best = scope.ckpt(
        start.select(
            F.col("id").alias("start_id"),
            F.col("id").alias("end_id"),
            F.lit(0.0).alias("cost"),
        )
    )
    frontier = best
    prev_improved: DataFrame | None = None

    for _ in range(max_iterations):
        # current best-known cost to any target, per start (driver-small)
        ub = (
            best.join(targets, "end_id", "left_semi")
            .groupBy("start_id")
            .agg(F.min("cost").alias("ub"))
        )
        cand = (
            frontier.join(e, frontier.end_id == e.src)
            .select("start_id", F.col("dst").alias("end_id"), (F.col("cost") + F.col("w")).alias("cost"))
            .groupBy("start_id", "end_id")
            .agg(F.min("cost").alias("cost"))
            .join(h, "end_id", "left_outer")
            .join(ub, "start_id", "left_outer")
            .filter(
                F.col("ub").isNull()
                | (F.col("cost") + F.coalesce(F.col("h"), F.lit(0.0)) < F.col("ub"))
            )
            .select("start_id", "end_id", "cost")
        )
        improved = (
            cand.join(
                best.select("start_id", "end_id", F.col("cost").alias("old_cost")),
                ["start_id", "end_id"],
                "left_outer",
            )
            .filter(F.col("old_cost").isNull() | (F.col("cost") < F.col("old_cost")))
            .select("start_id", "end_id", "cost")
        )
        improved = scope.ckpt(improved, eager=False)
        if improved.count() == 0:  # materializes the checkpoint too
            scope.release(improved)
            break
        best = scope.roll(
            best,
            best.unionByName(improved)
            .groupBy("start_id", "end_id")
            .agg(F.min("cost").alias("cost")),
        )
        scope.release(prev_improved)  # folded into best two rounds running
        prev_improved = improved
        frontier = improved

    out = best.join(targets, "end_id", "left_semi").select(
        "start_id", "end_id", "cost"
    )
    return scope.finish(out, keep=(best,))


def _weighted_oriented_edges(graph, rel_types, direction, weight_col,
                             encode: bool = False):
    """(src, dst, w) in the requested orientation, weight defaulting to
    1.0, checkpointed for the relaxation loop. ``encode=True`` long-
    encodes the endpoints BEFORE the checkpoint, built from the LAZY edge
    plan so column pruning reaches the parquet scans and the loop never
    re-splits strings per round (and never forces the full-width
    adjacency materialization it doesn't need). Memoized per graph
    instance — repeated shortest-path calls over the same graph reuse
    one checkpoint (the reference keeps its adjacency resident too)."""
    key = ("w_edges", tuple(rel_types), direction, weight_col, encode)
    return graph.memo(
        key,
        lambda: _build_weighted_oriented_edges(
            graph, rel_types, direction, weight_col, encode
        ),
    )


def _build_weighted_oriented_edges(graph, rel_types, direction, weight_col,
                                   encode: bool = False):
    if encode:
        base = graph.edges_full_by_type(*rel_types)
        if "src_enc" in base.columns:
            src = F.col("src_enc").alias("src")
            dst = F.col("dst_enc").alias("dst")
        else:
            src = graph.encode_id(F.col("src")).alias("src")
            dst = graph.encode_id(F.col("dst")).alias("dst")
    else:
        base = (
            graph.adj_by_type(*rel_types)
            if not rel_types
            else graph.edges_by_type(*rel_types)
        )
        src, dst = F.col("src").alias("src"), F.col("dst").alias("dst")
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
        if weight_col
        else F.lit(1.0)
    ).alias("w")
    e = base.select(src, dst, w)
    flipped = base.select(dst.alias("src"), src.alias("dst"), w)
    if direction == "in":
        e = flipped
    elif direction == "both":
        e = e.unionByName(flipped)
    if encode:
        # the lazy scan arrives with file-sized partitioning; hash it by
        # src like the shared adjacency so relaxation joins co-locate and
        # run at session parallelism
        e = e.repartition("src")
    return e.localCheckpoint(eager=True)  # static across relaxation rounds


def _induced_subgraph(graph, label: str | list | None):
    """Label-induced subgraph, matching the reference's dist-map trick
    (apoc_community.go / apoc_algorithms.go init dist only for label
    nodes, so BFS never leaves the label set). A list of labels induces
    over the union (superset of the reference's single-label form)."""
    if isinstance(label, (list, tuple)):
        nodes = graph.nodes.filter(F.col("label").isin(list(label)))
    elif label:
        nodes = graph.nodes_by_label(label)
    else:
        nodes = graph.nodes
    nodes = nodes.select("id")
    e = graph.adj_pairs()
    e = e.join(nodes.select(F.col("id").alias("src")), "src").join(
        nodes.select(F.col("id").alias("dst")), "dst"
    )
    return nodes, e


def closeness_centrality(
    nodes: DataFrame, edges: DataFrame, max_depth: int = 20
) -> DataFrame:
    """apoc.algo.closeness (reference apoc_algorithms.go:403-446):
    undirected hop-BFS per source over the induced subgraph;
    score = reachable² / (Σdist · (n−1)), 0 if nothing reachable.

    ``edges`` is treated as undirected (symmetrized here). All-pairs BFS
    runs every source simultaneously — one frontier DataFrame keyed by
    (source, node) — so rounds = graph diameter regardless of |V|.
    Intended for projected/label subgraphs; all-pairs state is
    O(|V|·reach) rows, partitioned by source.
    """
    scope = CkptScope()
    und = scope.ckpt(
        edges.select("src", "dst").unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
    )  # static across BFS rounds
    n = nodes.count()

    visited = nodes.select(
        F.col("id").alias("s"), F.col("id").alias("v")
    ).withColumn("d", F.lit(0))
    visited = scope.ckpt(visited)
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = scope.ckpt(
            frontier.join(und, frontier.v == und.src)
            .select("s", F.col("dst").alias("v"))
            .distinct()
            .join(visited.select("s", "v"), ["s", "v"], "left_anti")
            .withColumn("d", F.lit(depth)),
            eager=False,
        )
        if nxt.count() == 0:  # materializes the checkpoint too
            scope.release(nxt)
            break
        visited = scope.roll(visited, visited.unionByName(nxt))
        scope.release(frontier)  # folded into visited (no-op round 1)
        frontier = nxt

    per_src = visited.filter(F.col("d") > 0).groupBy("s").agg(
        F.count(F.lit(1)).alias("reachable"), F.sum("d").alias("total_dist")
    )
    out = (
        nodes.select(F.col("id"))
        .join(per_src.select(F.col("s").alias("id"), "reachable", "total_dist"), "id", "left_outer")
        .select(
            "id",
            F.when(
                F.col("reachable").isNotNull() & (F.col("total_dist") > 0),
                (F.col("reachable") * F.col("reachable")).cast("double")
                / (F.col("total_dist") * F.lit(float(n - 1))),
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )
    return scope.finish(out, keep=(visited,))


def betweenness_centrality(
    nodes: DataFrame,
    edges: DataFrame,
    max_depth: int = 20,
    normalize: bool = True,
    samples: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """apoc.algo.betweenness (reference apoc_algorithms.go:323-387):
    Brandes' algorithm over the directed edge set, normalized by
    2/((n−1)(n−2)) when n > 2. Pass a symmetrized ``edges`` for the
    undirected variant.

    Distributed Brandes: level-synchronous BFS from ALL sources at once
    accumulating path counts σ (parallel edges each contribute, matching
    the reference's per-edge pred list), then a backward sweep by
    descending BFS level accumulating dependencies
    δ(v) += σ(v)/σ(w)·(1+δ(w)). Rounds = 2·diameter; state is
    (source, node) pairs partitioned by source.

    ``samples``: exact all-sources accumulation is O(V·E) state and will
    not survive a 100× node-count scale-up (the reference bounds the same
    cost per-label). With ``samples=k < n`` the BFS runs from k
    hash-ordered source nodes (xxhash64(id, seed) — deterministic across
    runs and partitionings, no RNG) and accumulated dependencies are
    scaled by n/k — the Brandes–Pich sampled estimator, unbiased over the
    source draw. Per-source BFS state drops from O(V·E) to O(k·E).
    """
    scope = CkptScope()
    e = scope.ckpt(edges.select("src", "dst"))  # static across both sweeps
    n = nodes.count()

    # ---- forward: per-(source, node) depth + path count σ -------------
    if samples is not None and 0 < samples < n:
        sources = (
            nodes.select("id")
            .orderBy(F.xxhash64(F.col("id"), F.lit(seed)), F.col("id"))
            .limit(samples)
        )
        scale = float(n) / float(samples)
    else:
        sources, scale = nodes, 1.0
    frontier = sources.select(
        F.col("id").alias("s"), F.col("id").alias("v")
    ).withColumn("sigma", F.lit(1.0))
    frontier = scope.ckpt(frontier)
    visited = frontier.select("s", "v")
    prev_visited: DataFrame | None = None
    levels: list[DataFrame] = [frontier]

    for _ in range(1, max_depth + 1):
        nxt = scope.ckpt(
            frontier.join(e, frontier.v == e.src)
            .select("s", F.col("dst").alias("v"), "sigma")
            .join(visited, ["s", "v"], "left_anti")
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma")),
            eager=False,
        )
        if nxt.count() == 0:  # materializes the checkpoint too
            scope.release(nxt)
            break
        visited = scope.roll(prev_visited, visited.unionByName(nxt.select("s", "v")))
        prev_visited = visited
        levels.append(nxt)
        frontier = nxt
    scope.release(prev_visited)  # forward-sweep only

    # ---- backward: dependency accumulation, deepest level first -------
    deltas: list[DataFrame] = [None] * len(levels)
    deltas[-1] = levels[-1].withColumn("delta", F.lit(0.0))
    for i in range(len(levels) - 2, -1, -1):
        upper = deltas[i + 1].select(
            "s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w"), "delta"
        )
        contrib = (
            levels[i]
            .join(e, levels[i].v == e.src)
            .join(
                upper,
                (F.col("dst") == upper.w) & (levels[i].s == upper.s),
            )
            .select(
                levels[i].s.alias("s"),
                levels[i].v.alias("v"),
                (
                    (F.col("sigma") / F.col("sigma_w")) * (F.lit(1.0) + F.col("delta"))
                ).alias("c"),
            )
            .groupBy("s", "v")
            .agg(F.sum("c").alias("contrib"))
        )
        deltas[i] = scope.ckpt(
            levels[i]
            .join(contrib, ["s", "v"], "left_outer")
            .withColumn("delta", F.coalesce(F.col("contrib"), F.lit(0.0)))
            .select("s", "v", "sigma", "delta")
        )
        # levels[i] is folded into deltas[i]; only levels[-1] stays live
        # (deltas[-1] is a lazy projection over it)
        scope.release(levels[i])

    acc = deltas[0].filter(F.col("s") != F.col("v")).select("v", "delta")
    for d in deltas[1:]:
        acc = acc.unionByName(d.filter(F.col("s") != F.col("v")).select("v", "delta"))
    scores = acc.groupBy(F.col("v").alias("id")).agg(F.sum("delta").alias("score"))
    norm = (2.0 / ((n - 1) * (n - 2)) if (normalize and n > 2) else 1.0) * scale
    # per-node scores are O(|V|) — materialize them once and free the
    # O(k·E) per-level sweep state the lazy plan would otherwise pin
    out = scope.ckpt(
        nodes.select("id")
        .join(scores, "id", "left_outer")
        .select("id", (F.coalesce(F.col("score"), F.lit(0.0)) * F.lit(norm)).alias("score"))
    )
    return scope.finish(out, keep=(out,))


def louvain_communities(
    nodes: DataFrame,
    edges: DataFrame,
    weight_col: str | None = None,
    max_iterations: int = 10,
) -> DataFrame:
    """apoc.algo.louvain, first-level pass (reference
    apoc_community.go:66-219: undirected, weight property else 1.0,
    modularity-gain local moves). Synchronous distributed variant: every
    round each node moves to the neighboring community with the best
    modularity gain ΔQ = k_i,in/m − γ·k_i·Σtot/(2m²) (ties → min
    community id), until no node moves. One shuffle per round; converges
    like parallel Louvain (Prat-Pérez et al.).

    Synchronous moves on symmetric graphs ping-pong (a joins b's community
    while b joins a's), so each round only one hash-parity class of nodes
    may move — the standard parallel-Louvain coloring trick; 2×
    max_iterations rounds give every node max_iterations chances.
    """
    w = (
        F.coalesce(F.col(weight_col).cast("double"), F.lit(1.0))
        if weight_col
        else F.lit(1.0)
    )
    scope = CkptScope()
    und = edges.select("src", "dst", w.alias("w")).filter(F.col("src") != F.col("dst"))
    und = und.unionByName(
        und.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    und = scope.ckpt(und)  # static across rounds
    if und.isEmpty():
        return scope.finish(nodes.select("id", F.col("id").alias("community")))
    # 2m as a broadcast 1-row aggregate — same pattern as pagerank's
    # dangling mass; no mid-pipeline driver collect
    two_m_df = F.broadcast(und.agg(F.sum("w").alias("_two_m")))

    k = scope.ckpt(
        und.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("k"))
    )
    comm = scope.ckpt(nodes.select("id", F.col("id").alias("community")))

    stalled = 0
    for rnd in range(2 * max_iterations):
        # total weighted degree + member count per community (sizes feed
        # the singleton-swap rule below)
        stats = (
            comm.join(k, "id", "left_outer")
            .groupBy("community")
            .agg(
                F.sum(F.coalesce(F.col("k"), F.lit(0.0))).alias("sigma_tot"),
                F.count(F.lit(1)).alias("_sz"),
            )
        )
        nbr_comm = (
            und.join(comm.select(F.col("id").alias("dst"), F.col("community").alias("c")), "dst")
            .groupBy(F.col("src").alias("id"), F.col("c"))
            .agg(F.sum("w").alias("k_in"))
        )
        cand = (
            nbr_comm.join(k, "id")
            .join(
                stats.select(
                    F.col("community").alias("c"), "sigma_tot",
                    F.col("_sz").alias("_tgt_sz"),
                ),
                "c",
            )
            .join(comm, "id")
            .join(
                stats.select(
                    F.col("community"), F.col("_sz").alias("_own_sz")
                ),
                "community",
            )
            # singleton-swap rule (parallel Louvain, Ghosh et al.): when
            # both the node's community and the target are singletons,
            # only the move toward the smaller community id is allowed —
            # otherwise two same-parity adjacent singletons swap labels
            # forever (a↔b each round) and stars never coalesce.
            .filter(
                ~(
                    (F.col("_own_sz") == 1)
                    & (F.col("_tgt_sz") == 1)
                    & (F.col("c") > F.col("community"))
                )
            )
            # leaving own community: its sigma_tot includes self degree
            .withColumn(
                "adj_tot",
                F.when(F.col("c") == F.col("community"), F.col("sigma_tot") - F.col("k"))
                .otherwise(F.col("sigma_tot")),
            )
            .crossJoin(two_m_df)
            .withColumn(
                "gain",
                F.col("k_in") / F.col("_two_m")
                - F.col("k") * F.col("adj_tot")
                / (F.col("_two_m") * F.col("_two_m") / 2.0),
            )
        )
        best = (
            cand.groupBy("id")
            .agg(
                F.max(
                    F.struct(
                        F.col("gain"),
                        # staying wins exact gain ties (classic Louvain:
                        # move only on STRICT improvement) — without this
                        # a hub with one attached leaf ties its own
                        # community against a lone-leaf singleton and the
                        # hash tie-break can pull it out of its star
                        (F.col("c") == F.col("community"))
                        .cast("int")
                        .alias("_own"),
                        (-F.xxhash64("c")).alias("_t"),  # stable-ish pre-tiebreak
                        F.col("c"),
                    )
                ).alias("m")
            )
            .select("id", F.col("m.gain").alias("gain"), F.col("m.c").alias("best_c"))
        )
        updated = (
            comm.join(best, "id", "left_outer")
            .withColumn(
                "next",
                F.when(
                    (F.pmod(F.xxhash64("id"), F.lit(2)) == F.lit(rnd % 2))
                    & F.col("gain").isNotNull()
                    & (F.col("gain") > 1e-12),
                    F.col("best_c"),
                ).otherwise(F.col("community")),
            )
        )
        n_moved = updated.filter(F.col("next") != F.col("community")).count()
        comm = scope.roll(
            comm, updated.select("id", F.col("next").alias("community"))
        )
        # converged only when BOTH parity classes pass without a move
        stalled = stalled + 1 if n_moved == 0 else 0
        if stalled >= 2:
            break

    # canonical community id = min member id (stable across runs)
    canon = comm.groupBy("community").agg(F.min("id").alias("canon"))
    out = comm.join(canon, "community").select(
        "id", F.col("canon").alias("community")
    )
    return scope.finish(out, keep=(comm,))


def fastrp_embeddings(
    graph,
    dim: int = 32,
    iteration_weights: tuple[float, ...] = (0.0, 1.0, 1.0),
    seed: int = 42,
    rel_types: tuple[str, ...] = (),
) -> DataFrame:
    """gds.fastRP.stream (reference pkg/cypher/fastrp.go:28-802): FastRP
    structural embeddings — very-sparse random projection init
    (Achlioptas s=3: ±√3 w.p. 1/6 each, else 0), then L rounds of
    mean-neighbor aggregation with per-iteration L2 normalization, final
    embedding = Σ w_ℓ · h^(ℓ).

    Determinism without RNG: the projection matrix entry for (node, dim)
    is a pure function of xxhash64(id, dim, seed) — identical across runs
    and partitionings. Layout is long-form (id, d, val): neighbor mean =
    join + groupBy(dst, d) — pure shuffle ops that scale to 100 TB, no
    per-row Python.
    """
    scope = CkptScope()
    und = (
        graph.edges_by_type(*rel_types).select("src", "dst")
        if rel_types
        else graph.adj_pairs()
    )
    und = scope.ckpt(
        und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )  # static across layers

    dims = F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("d")
    h = F.pmod(F.xxhash64(F.col("id"), F.col("d"), F.lit(seed)), F.lit(6))
    sqrt3 = 3.0 ** 0.5
    cur = (
        graph.nodes.select("id")
        .select("id", dims)
        .select(
            "id",
            "d",
            F.when(h == 0, F.lit(sqrt3))
            .when(h == 1, F.lit(-sqrt3))
            .otherwise(F.lit(0.0))
            .alias("val"),
        )
    )
    cur = scope.ckpt(_l2_normalize(cur))

    # every layer's checkpoint stays live until the weighted sum below —
    # the epilogue materializes the (|V|-row) embedding table once and
    # frees the whole layer stack
    acc = cur.select("id", "d", (F.col("val") * F.lit(iteration_weights[0])).alias("val"))
    for wl in iteration_weights[1:]:
        nxt = (
            cur.join(und, cur.id == und.src)
            .groupBy(F.col("dst").alias("id"), F.col("d"))
            .agg(F.avg("val").alias("val"))
        )
        # isolated nodes keep a zero vector (reference skips them too)
        cur = scope.ckpt(_l2_normalize(nxt))
        acc = acc.unionByName(
            cur.select("id", "d", (F.col("val") * F.lit(wl)).alias("val"))
        )

    emb = acc.groupBy("id", "d").agg(F.sum("val").alias("val"))
    out = scope.ckpt(
        emb.groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("d", "val"))).alias("p"))
        .select("id", F.col("p.val").alias("embedding"))
    )
    return scope.finish(out, keep=(out,))


def _l2_normalize(long_vec: DataFrame) -> DataFrame:
    """L2-normalize a long-form (id, d, val) vector table; zero vectors
    pass through unchanged."""
    norms = long_vec.groupBy(F.col("id").alias("_nid")).agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("norm")
    )
    return (
        long_vec.join(norms, long_vec.id == F.col("_nid"))
        .select(
            "id",
            "d",
            F.when(F.col("norm") > 0, F.col("val") / F.col("norm"))
            .otherwise(F.lit(0.0))
            .alias("val"),
        )
    )


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected simple graph given as distinct (a, b) pairs (a ≠ b, one
    row per edge in either orientation).

    Compact-forward orientation (Latapy 2008): each undirected edge is
    oriented from the lower-(degree, id) endpoint to the higher one, so
    every triangle is enumerated exactly once and the two-hop join's
    fan-out per node is bounded by its ORIENTED out-degree — a celebrity
    hub keeps a small out-list (its edges point at it), which is the
    standard skew guard that lets triangle counting survive power-law
    graphs at 100 TB. Three hash joins, no cartesian.
    Returns (id, triangles, degree, clustering)."""
    scope = CkptScope()
    und = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    und = und.unionByName(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    deg = und.groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    e = scope.ckpt(
        und.join(deg.select(F.col("id").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("d").alias("dv")), "v")
        .filter(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )  # reused three times below
    ab = e.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    bc = e.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    ac = e.select(F.col("src").alias("x"), F.col("dst").alias("z"))
    tri = ab.join(bc, "y").join(ac, ["x", "z"])
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # per-node output is O(|V|): materialize once, free the oriented edge
    # checkpoint the triangle join would otherwise pin for the session
    out = scope.ckpt(
        deg.join(per_node, "id", "left_outer")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.col("d").alias("degree"),
            F.when(
                F.col("d") >= 2,
                2.0 * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("d") * (F.col("d") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
    return scope.finish(out, keep=(out,))


# Single source of truth for k-core peel depth: the engine loop and the
# driver's unrolled SQL oracle (queries/graph.py:_kcore_oracle) both derive
# from this so they can never silently diverge on peel-depth > unroll-depth
# datasets (long chains peel one layer per round, O(n) worst case).
KCORE_MAX_ROUNDS = 12


def k_core(pairs: DataFrame, k: int = 3, max_rounds: int = KCORE_MAX_ROUNDS) -> DataFrame:
    """k-core membership: iteratively peel nodes of degree < k from the
    undirected graph given as (a, b) pairs until fixpoint (Seidman 1983
    cores; the GDS kCore shape). Each round is one degree aggregate + two
    semi-joins on the surviving edge set — O(rounds) shuffles, edge set
    only shrinks, checkpoint per round cuts lineage. Deterministic
    (synchronous peeling), and a fixpoint is preserved by further rounds,
    so a fixed-round unrolled SQL oracle reproduces the early-stopping
    loop exactly. Returns (id, core_degree) for nodes in the k-core."""
    scope = CkptScope()
    und = pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
    und = scope.ckpt(
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    edges = und
    converged = False
    for _ in range(max_rounds):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.filter(F.col("d") >= k).select("u")
        pruned = (
            edges.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .select("u", "v")
        )
        n_before = edges.count()
        edges = scope.roll(edges, pruned)
        if edges.count() == n_before:
            converged = True
            break
    if not converged:
        # One more peel pass would still shrink the edge set: the returned
        # membership is an over-approximation of the true k-core. Surface it
        # rather than silently returning a superset.
        warnings.warn(
            f"k_core did not reach fixpoint within max_rounds={max_rounds}; "
            "result is a superset of the true k-core (raise max_rounds)",
            RuntimeWarning,
            stacklevel=2,
        )
    out = edges.groupBy(F.col("u").alias("id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    ).filter(F.col("core_degree") >= k)
    return scope.finish(out, keep=(edges,))
