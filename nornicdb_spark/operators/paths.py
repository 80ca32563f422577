"""Variable-length paths + shortest-path BFS, as iterative DataFrame joins.

The reference enumerates paths imperatively per start node with a
cycle-free-per-path guard (pkg/cypher/traversal.go:1127-1237 ``findPaths``;
shortest_path.go:18-365 BFS). At cluster scale the same semantics is a
*frontier loop*: each iteration is one equi-join frontier ⋈ edges — all
starts advance simultaneously, Pregel-style.

Scale notes:
- every iteration ``localCheckpoint``s the frontier: truncates lineage so
  plan size stays O(1) in depth, and materializes the (usually shrinking)
  frontier for reuse.
- Cypher forbids repeating a *relationship* within one path
  (not a node) — tracked via an accumulated ``edge_id`` array. Edge ids
  are deterministic hashes assigned at graph build.
- shortest-path BFS keeps a ``visited`` set (min-depth per node) and
  stops as soon as any target is reached — the frontier never re-expands
  settled nodes, so work is O(edges within radius).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nornicdb_spark.operators.expand import OUT, IN
from nornicdb_spark.operators.scope import CkptScope


def _oriented_edges(graph, rel_types: tuple[str, ...], direction: str) -> DataFrame:
    # untyped: shared materialized adjacency (one checkpoint per graph
    # instance); typed: lazy plan so the type filter and column pruning
    # reach the parquet scans
    e = graph.adj() if not rel_types else graph.edges_by_type(*rel_types)
    e = e.select("src", "dst", "type", "edge_id")
    if direction == OUT:
        return e
    flipped = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "type", "edge_id"
    )
    if direction == IN:
        return flipped
    return e.unionByName(flipped)


def _oriented_ckpt(graph, rel_types: tuple[str, ...], direction: str,
                   cols: tuple[str, ...]) -> DataFrame:
    """Checkpointed oriented edge set for the frontier loops — STATIC per
    (graph, rel_types, direction, cols), memoized on the graph instance
    (bounded by the type vocabulary × 3 directions) so repeated traversals
    reuse one resident frame instead of leaking one per invocation.
    Untyped out-edges are already a projection of the shared adjacency —
    re-checkpointing that would copy it."""
    if not rel_types and direction == OUT:
        if cols == ("src", "dst"):
            return graph.adj_pairs()  # shared lean checkpoint
        return _oriented_edges(graph, rel_types, direction).select(*cols)
    return graph.memo(
        ("oriented_edges", tuple(rel_types), direction, cols),
        lambda: _oriented_edges(graph, rel_types, direction)
        .select(*cols)
        .localCheckpoint(eager=True),
    )


def _oriented_ckpt_enc(graph, rel_types: tuple[str, ...], direction: str,
                       with_edge_id: bool) -> DataFrame:
    """Long-encoded twin of :func:`_oriented_ckpt` for frontier loops on
    star-schema graphs: endpoints come from the precomputed enc columns
    (pure arithmetic over the numeric base keys — no concat, no splits),
    so every per-round join builds/probes 8-byte long keys and each
    round's broadcast/shuffle carries ~40% of the string bytes. Memoized
    per (graph, types, direction, cols) like the string twin."""
    cols = ("src", "dst", "edge_id") if with_edge_id else ("src", "dst")
    if not rel_types and direction == OUT and not with_edge_id:
        return graph.adj_pairs_encoded()  # shared lean encoded checkpoint

    def build():
        e = graph.edges_full_by_type(*rel_types)
        base_cols = [
            F.col("src_enc").alias("src"), F.col("dst_enc").alias("dst")
        ] + ([F.col("edge_id")] if with_edge_id else [])
        out = e.select(*base_cols)
        if direction != OUT:
            flipped = e.select(
                F.col("dst_enc").alias("src"), F.col("src_enc").alias("dst"),
                *([F.col("edge_id")] if with_edge_id else []),
            )
            out = flipped if direction == IN else out.unionByName(flipped)
        return out.localCheckpoint(eager=True)

    return graph.memo(
        ("oriented_edges_enc", tuple(rel_types), direction, cols), build
    )


def _loop_edges(graph, rel_types, direction, with_edge_id: bool):
    """(edges, encoded?) for a frontier loop: encoded when the graph
    carries precomputed enc keys, the string form otherwise."""
    if getattr(graph, "_edges_full", None) is not None:
        return _oriented_ckpt_enc(graph, rel_types, direction, with_edge_id), True
    cols = ("src", "dst", "type", "edge_id") if with_edge_id else ("src", "dst")
    return _oriented_ckpt(graph, rel_types, direction, cols), False


def _enc_start(graph, start: DataFrame) -> DataFrame:
    return start.select(graph.encode_id(F.col("id")).alias("id"))


def var_length_paths(
    graph,
    start: DataFrame,
    min_hops: int = 1,
    max_hops: int = 2,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
    with_node_path: bool = True,
) -> DataFrame:
    """Enumerate paths ``(start)-[*min..max]->(end)``.

    ``start``: DataFrame with an ``id`` column. Returns one row per path:
    ``(start_id, end_id, depth, node_path array<string>,
    edge_path array<long>)`` — the array columns back Cypher's
    ``nodes(p)`` / ``relationships(p)`` / ``length(p)`` accessors
    (reference traversal.go:1264-1275 PathResult).

    ``with_node_path=False`` drops the node array from the loop state:
    the per-round checkpoints are materialization barriers Catalyst
    cannot prune columns through, so a caller that never reads
    ``nodes(p)`` should say so (path COUNTS still honor relationship
    uniqueness — ``edge_path`` always rides along).
    """
    if min_hops < 0 or max_hops < min_hops:
        raise ValueError("need 0 <= min_hops <= max_hops")
    # the static edge set is reused every iteration — materialized once
    # per (graph, types, direction) and memoized (GraphX caches edges for
    # exactly this reason; without it each round re-derives the
    # union-of-parquet-scans edge projection). Star-schema graphs run the
    # whole loop on encoded longs (joins, frontier checkpoints and the
    # path arrays all carry 8-byte keys); only the final projection
    # decodes back to string ids — path COUNTS and membership are
    # invariant under the 1:1 re-keying.
    scope = CkptScope()
    edges, encoded = _loop_edges(graph, rel_types, direction, with_edge_id=True)
    if encoded:
        start = _enc_start(graph, start)

    state = [
        F.col("id").alias("start_id"),
        F.col("id").alias("end_id"),
    ]
    if with_node_path:
        state.append(F.array(F.col("id")).alias("node_path"))
    state.append(F.array().cast("array<long>").alias("edge_path"))
    frontier = start.select(*state)
    out: list[DataFrame] = []
    if min_hops == 0:
        out.append(frontier.withColumn("depth", F.lit(0)))

    for depth in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier.end_id == edges.src)
            # relationship-uniqueness per path (Cypher semantics)
            .filter(~F.array_contains(F.col("edge_path"), F.col("edge_id")))
            .select(
                "start_id",
                F.col("dst").alias("end_id"),
                *(
                    [F.array_append(F.col("node_path"), F.col("dst")).alias("node_path")]
                    if with_node_path
                    else []
                ),
                F.array_append(F.col("edge_path"), F.col("edge_id")).alias(
                    "edge_path"
                ),
            )
        )
        if depth == max_hops:
            # final depth: nothing iterates over this frontier again —
            # let it flow lazily into the result union (checkpointing the
            # deepest, largest frontier would materialize it twice)
            if depth >= min_hops:
                out.append(nxt.withColumn("depth", F.lit(depth)))
            break
        # lazy checkpoint: the count that decides termination is the
        # same job that materializes the frontier (one job per depth)
        frontier = scope.ckpt(nxt, eager=False)
        if depth >= min_hops:
            out.append(frontier.withColumn("depth", F.lit(depth)))
        if frontier.count() == 0:
            break

    if not out:
        res = frontier.withColumn("depth", F.lit(0)).limit(0)
    else:
        res = out[0]
        for df in out[1:]:
            res = res.unionByName(df)
    if encoded:
        dec = [
            graph.decode_id(F.col("start_id")).alias("start_id"),
            graph.decode_id(F.col("end_id")).alias("end_id"),
        ]
        if with_node_path:
            dec.append(
                F.transform(
                    F.col("node_path"), lambda x: graph.decode_id(x)
                ).alias("node_path")
            )
        res = res.select(*dec, "edge_path", "depth")
    # the per-depth frontiers ARE the result's support — they escape to
    # the bounded session registry rather than pinning blocks forever
    return scope.finish(res, keep=tuple(scope.tracked()))


def all_simple_paths(
    graph,
    start: DataFrame,
    target: DataFrame,
    max_hops: int = 3,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
) -> DataFrame:
    """apoc.algo.allSimplePaths — every node-disjoint path from ``start``
    to ``target`` of length ≤ ``max_hops`` (reference
    apoc_algorithms.go:206-251, DFS with per-path node-uniqueness).

    Frontier enumeration like :func:`var_length_paths`, but the uniqueness
    guard is on *nodes* (simple paths) rather than relationships, and only
    rows whose endpoint is in ``target`` are emitted. Returns
    ``(start_id, end_id, depth, node_path)``.

    Star-schema graphs enumerate on encoded longs (node-uniqueness and
    target membership are set semantics — invariant under 1:1
    re-keying); the final projection decodes ids and path arrays.
    """
    scope = CkptScope()
    edges, encoded = _loop_edges(graph, rel_types, direction, with_edge_id=False)
    if encoded:
        start = _enc_start(graph, start)
        target = _enc_start(graph, target)
    targets = target.select(F.col("id").alias("end_id")).distinct()

    frontier = start.select(
        F.col("id").alias("start_id"),
        F.col("id").alias("end_id"),
        F.array(F.col("id")).alias("node_path"),
    )
    hits: list[DataFrame] = []
    for depth in range(1, max_hops + 1):
        frontier = scope.ckpt(
            frontier.join(edges, frontier.end_id == edges.src)
            # node-uniqueness per path = simple path (vs. the relationship
            # uniqueness var_length_paths uses — Cypher default)
            .filter(~F.array_contains(F.col("node_path"), F.col("dst")))
            .select(
                "start_id",
                F.col("dst").alias("end_id"),
                F.array_append(F.col("node_path"), F.col("dst")).alias("node_path"),
            ),
            eager=False,
        )
        hits.append(
            frontier.join(targets, "end_id", "left_semi").withColumn(
                "depth", F.lit(depth)
            )
        )
        # count doubles as the checkpoint's materializing action
        if frontier.count() == 0:
            break

    res = hits[0]
    for df in hits[1:]:
        res = res.unionByName(df)
    if encoded:
        res = res.select(
            graph.decode_id(F.col("start_id")).alias("start_id"),
            graph.decode_id(F.col("end_id")).alias("end_id"),
            "depth",
            F.transform(
                F.col("node_path"), lambda x: graph.decode_id(x)
            ).alias("node_path"),
        )
    else:
        res = res.select("start_id", "end_id", "depth", "node_path")
    return scope.finish(res, keep=tuple(scope.tracked()))


def subgraph_nodes(
    graph,
    start: DataFrame,
    max_level: int = 3,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
) -> DataFrame:
    """apoc.path.subgraphNodes — the distinct nodes reachable from the
    ``start`` set within ``max_level`` hops, each tagged with its minimum
    BFS level (reference call_apoc_path.go filtered expansion). Level 0 is
    the start set itself. Returns ``(id, level)``.

    Unlike the path enumerators this is a *set* BFS: the frontier is
    deduplicated against everything seen, so work is bounded by the
    subgraph size, not the path count. Star-schema graphs run it on
    encoded longs (set semantics); the final projection decodes.
    """
    scope = CkptScope()
    edges, encoded = _loop_edges(graph, rel_types, direction, with_edge_id=False)
    if encoded:
        start = _enc_start(graph, start)

    seen = start.select("id").distinct().withColumn("level", F.lit(0))
    seen = scope.ckpt(seen)
    frontier = seen.select("id")
    for level in range(1, max_level + 1):
        nxt = scope.ckpt(
            frontier.join(edges, frontier.id == edges.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(seen.select("id"), "id", "left_anti"),
            eager=False,
        )
        if nxt.count() == 0:  # materializes the checkpoint too
            scope.release(nxt)
            break
        seen = scope.roll(seen, seen.unionByName(nxt.withColumn("level", F.lit(level))))
        scope.release(frontier)  # folded into seen (no-op on round 1)
        frontier = nxt
    res = seen
    if encoded:
        res = seen.select(graph.decode_id(F.col("id")).alias("id"), "level")
    return scope.finish(res, keep=(seen,))


def spanning_tree(
    graph,
    start: DataFrame,
    max_level: int = 3,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
) -> DataFrame:
    """apoc.path.spanningTree — a BFS tree over the reachable subgraph:
    every reached node appears once with exactly one parent (reference
    call_apoc_path.go). Deterministic parent choice: the minimum parent id
    among first-level reachers. Returns ``(id, parent, level)`` for
    level ≥ 1 (start nodes are roots, not emitted).
    """
    scope = CkptScope()
    edges = _oriented_ckpt(graph, rel_types, direction, ("src", "dst"))

    seen = scope.ckpt(start.select("id").distinct())
    frontier = seen
    out: list[DataFrame] = []
    for level in range(1, max_level + 1):
        reached = scope.ckpt(
            frontier.join(edges, frontier.id == edges.src)
            .groupBy(F.col("dst").alias("next_id"))
            .agg(F.min(F.col("src")).alias("parent"))
            .join(seen, F.col("next_id") == seen.id, "left_anti")
            .select(
                F.col("next_id").alias("id"),
                "parent",
                F.lit(level).alias("level"),
            ),
            eager=False,
        )
        if reached.count() == 0:  # materializes the checkpoint too
            scope.release(reached)
            break
        out.append(reached)
        seen = scope.roll(seen, seen.unionByName(reached.select("id")))
        frontier = reached.select("id")

    if not out:
        return scope.finish(
            start.select("id")
            .withColumn("parent", F.lit(None).cast("string"))
            .withColumn("level", F.lit(0))
            .limit(0)
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    # result unions the per-level reached checkpoints; the rolled `seen`
    # is loop-only and freed here
    scope.release(seen)
    return scope.finish(res, keep=tuple(scope.tracked()))


def shortest_paths(
    graph,
    start: DataFrame,
    target: DataFrame,
    max_hops: int = 15,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
) -> DataFrame:
    """shortestPath((a)-[*..max]->(b)) distances for all (start, target)
    pairs — returns ``(start_id, end_id, distance)`` with the *minimum*
    hop count (reference shortest_path.go:18-365; BFS with early exit).

    Frontier BFS from all starts at once; ``visited`` keeps the first
    (= minimal) depth each node was reached from each start.

    Star-schema graphs run the BFS on encoded longs (min-depth-per-pair
    is pure set semantics — invariant under 1:1 re-keying); the final
    projection decodes.
    """
    scope = CkptScope()
    edges, encoded = _loop_edges(graph, rel_types, direction, with_edge_id=False)
    if encoded:
        start = _enc_start(graph, start)
        target = _enc_start(graph, target)
    targets = target.select(F.col("id").alias("end_id")).distinct()

    visited = start.select(
        F.col("id").alias("start_id"), F.col("id").alias("end_id")
    ).withColumn("distance", F.lit(0))
    frontier = visited
    prev_visited: DataFrame | None = None
    results = [visited.join(targets, "end_id", "left_semi")]

    for depth in range(1, max_hops + 1):
        nxt = scope.ckpt(
            frontier.join(edges, frontier.end_id == edges.src)
            .select("start_id", F.col("dst").alias("end_id"))
            .distinct()
            .join(visited.select("start_id", "end_id"), ["start_id", "end_id"], "left_anti")
            .withColumn("distance", F.lit(depth)),
            eager=False,
        )
        if nxt.count() == 0:  # materializes the checkpoint too
            scope.release(nxt)
            break
        visited = scope.roll(prev_visited, visited.unionByName(nxt))
        prev_visited = visited
        results.append(nxt.join(targets, "end_id", "left_semi"))
        frontier = nxt

    scope.release(prev_visited)  # loop-only state
    res = results[0]
    for df in results[1:]:
        res = res.unionByName(df)
    if encoded:
        res = res.select(
            graph.decode_id(F.col("start_id")).alias("start_id"),
            graph.decode_id(F.col("end_id")).alias("end_id"),
            "distance",
        )
    else:
        res = res.select("start_id", "end_id", "distance")
    return scope.finish(res, keep=tuple(scope.tracked()))


def all_shortest_paths(
    graph,
    start: DataFrame,
    target: DataFrame,
    max_hops: int = 15,
    rel_types: tuple[str, ...] = (),
    direction: str = OUT,
) -> DataFrame:
    """allShortestPaths — every min-length path, with path arrays
    (reference traversal.go:1435-1553). Returns
    ``(start_id, end_id, distance, node_path)`` — one row per distinct
    min-length node sequence.

    BFS that carries node paths but prunes to first-reached depth per
    (start, end): all parents at min depth survive, deeper re-visits drop.

    Star-schema graphs run the BFS on encoded longs (first-reached-depth
    and the distinct-path set are invariant under 1:1 re-keying); the
    final projection decodes ids and path arrays.
    """
    scope = CkptScope()
    edges, encoded = _loop_edges(graph, rel_types, direction, with_edge_id=False)
    if encoded:
        start = _enc_start(graph, start)
        target = _enc_start(graph, target)
    targets = target.select(F.col("id").alias("end_id")).distinct()

    frontier = start.select(
        F.col("id").alias("start_id"),
        F.col("id").alias("end_id"),
        F.array(F.col("id")).alias("node_path"),
    )
    settled = frontier.select("start_id", "end_id").withColumn("distance", F.lit(0))
    prev_settled: DataFrame | None = None
    hits = [
        frontier.join(targets, "end_id", "left_semi").withColumn("distance", F.lit(0))
    ]

    for depth in range(1, max_hops + 1):
        expanded = scope.ckpt(
            frontier.join(edges, frontier.end_id == edges.src)
            .select(
                "start_id",
                F.col("dst").alias("end_id"),
                F.array_append(F.col("node_path"), F.col("dst")).alias("node_path"),
            )
            .join(settled.select("start_id", "end_id"), ["start_id", "end_id"], "left_anti")
            .distinct(),
            eager=False,
        )
        if expanded.count() == 0:  # materializes the checkpoint too
            scope.release(expanded)
            break
        settled = scope.roll(
            prev_settled,
            settled.unionByName(
                expanded.select("start_id", "end_id")
                .distinct()
                .withColumn("distance", F.lit(depth))
            ),
        )
        prev_settled = settled
        hits.append(
            expanded.join(targets, "end_id", "left_semi").withColumn(
                "distance", F.lit(depth)
            )
        )
        frontier = expanded

    scope.release(prev_settled)  # loop-only state
    res = hits[0]
    for df in hits[1:]:
        res = res.unionByName(df)
    if encoded:
        res = res.select(
            graph.decode_id(F.col("start_id")).alias("start_id"),
            graph.decode_id(F.col("end_id")).alias("end_id"),
            "distance",
            F.transform(
                F.col("node_path"), lambda x: graph.decode_id(x)
            ).alias("node_path"),
        )
    else:
        res = res.select("start_id", "end_id", "distance", "node_path")
    return scope.finish(res, keep=tuple(scope.tracked()))
