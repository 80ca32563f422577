"""Query registry: every SURVEY §2 operator exposed as a named query.

Each query is ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle SQL string over the same parquet tables. The driver runs
both at sf0.01 and hash-compares (CORRECTNESS_r{N}.json). Column names are
aligned on both sides; ORDER/LIMIT queries carry total tiebreakers so the
selected row set is deterministic.

Modules register into QUERIES/ORACLES at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Registration order matters: the driver's correctness harness verifies the
# first N registry entries, so families without a driver-verified row yet
# (search, LLM pipeline, temporal, mutations, Cypher frontend, functions,
# sources) register before the relational/graph families that were fully
# hash-stamped in round 1.
from nornicdb_spark.queries import search  # noqa: E402,F401
from nornicdb_spark.queries import llm_pipeline  # noqa: E402,F401
from nornicdb_spark.queries import temporal  # noqa: E402,F401
from nornicdb_spark.queries import mutations  # noqa: E402,F401
from nornicdb_spark.queries import functions_ext  # noqa: E402,F401
from nornicdb_spark.queries import sources_io  # noqa: E402,F401
from nornicdb_spark.queries import cypher_queries  # noqa: E402,F401
from nornicdb_spark.queries import relational  # noqa: E402,F401
from nornicdb_spark.queries import graph  # noqa: E402,F401

# Driver-window priority (the harness verifies the first 50 registry
# entries), round 7: (1) the one NEW query (sampled betweenness — the
# Brandes–Pich {samples:k} estimator gets its driver-visible oracle row);
# (2) stale-stamp rotation, oldest first — after the r6 window the
# backlog is 3 r1 + 27 r2 + 41 r3 stamps. The whole r1 trio and r2
# cohort (mutations, cypher frontend, procedures, APOC, spatial) rotate
# now, plus the 19 r3 rows whose engine paths the checkpoint-lifecycle
# rework touched most (path enumerators, dedup clustering, cypher
# compiler row-tag frames, streaming state). The remaining 22 r3 rows
# rotate in round 8.
_PRIORITY = (
    # new this round
    "graph_betweenness_sampled", "ann_ivfpq_recall",
    # round-1 stamps — set ops / unwind
    "union_all_names", "union_names", "unwind_part_words",
    # round-2 stamps — mutations + constraints
    "mutation_create_regions", "mutation_detach_delete_nation0",
    "mutation_foreach_discount_bump", "mutation_merge_order_counts",
    "mutation_set_remove_flag", "constraint_unique_violations",
    # round-2 stamps — cypher frontend
    "cypher_foreach_writes", "cypher_fulltext_search",
    "cypher_list_fold_quantifiers", "cypher_optional_match",
    "cypher_orders_pipeline", "cypher_pattern_comprehension",
    "cypher_shortest_path", "cypher_top_balances", "cypher_union_case",
    "cypher_unwind_functions", "cypher_vector_search",
    "cypher_write_pipeline",
    # round-2 stamps — procedures / APOC / spatial / sources / temporal
    "proc_db_labels", "proc_db_property_keys",
    "proc_db_relationship_types", "proc_db_schema_visualization",
    "apoc_coll_suite", "apoc_map_json", "spatial_haversine_distance",
    "source_neo4j_json_roundtrip", "duration_customer_order_span",
    # round-3 stamps — paths/dedup/compiler/streaming families whose
    # operators were reworked for checkpoint lifecycle this round
    "dedup_cluster_canonical", "graph_all_simple_paths",
    "graph_neighbors_byhop_customer", "graph_spanning_tree",
    "graph_subgraph_nodes",
    "cypher_apoc_run", "cypher_correlated_call", "cypher_index_mgmt",
    "cypher_merge_rel", "cypher_varlen_bound_endpoint",
    "cypher_vector_spatial_functions",
    "stream_access_tracker", "stream_dedup_events",
    "stream_session_stats", "stream_static_enrich", "stream_stream_join",
    "stream_windowed_counts",
    "inference_edge_decay", "inference_similarity_edges",
)


def _tier(n: str) -> tuple[int, int]:
    # oracle-backed priority entries lead — the window is exactly the
    # size of the priority set, and a rows-only entry that slips to the
    # next round loses less (its driver check is weaker anyway)
    if n in _PRIORITY:
        return (0, 0 if n in ORACLES else 1)
    return (1, 0) if n in ORACLES else (2, 0)


_ordered = sorted(QUERIES, key=_tier)
_reordered = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "register"]
