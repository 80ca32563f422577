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
# entries): (1) entries that failed in CORRECTNESS_r02 — all since fixed —
# or that no round has checked yet, oracle-backed first; (2) other
# oracle-backed queries; (3) rows-only queries. Stable within each tier,
# family order above.
_PRIORITY = (
    # r02 failures, fixed this round (events ts-schema, list-cell hashing)
    "decay_scores", "sessionization", "co_access_pairs", "event_window_agg",
    "json_props_extract", "stream_windowed_counts", "stream_session_stats",
    "cypher_vector_spatial_functions",
    # oracle-backed, never driver-stamped (incl. queries new this round)
    "dedup_cluster_canonical", "text_repetition_ratios", "text_pii_scrub",
    "doc_chunking", "text_contamination", "embedding_centroid_stats",
    "agg_rollup_region_nation", "agg_cube_status_priority",
    "set_ops_customer_supplier_nations", "events_asof_purchase",
    "stream_static_enrich", "graph_neighbors_byhop_customer",
    "stream_stream_join", "stream_dedup_events", "vector_filtered_topk",
    "multimodal_resize_plan", "multimodal_audio_windows",
    "temporal_cyclic_patterns", "inference_similarity_edges",
    "inference_transitive_edges", "inference_evidence_buffer",
    "inference_edge_decay",
    "vocab_top_words",
    "text_unigram_logprob", "corpus_split_assign",
    "corpus_quality_filter", "corpus_stratified_sample",
    "cypher_merge_rel", "cypher_correlated_call",
    "cypher_varlen_bound_endpoint", "cypher_index_mgmt",
    "spatial_polygon_contains", "cypher_apoc_run", "proc_db_index_stats",
    "stream_access_tracker", "graph_all_simple_paths", "graph_subgraph_nodes",
    "graph_spanning_tree",
    # rows-only, never driver-stamped (weaker rows-check is still a stamp)
    "ann_hnsw", "ann_kmeans_pruned", "ann_lsh", "bm25_prefix_topk",
    "dedup_embedding_lsh", "dedup_simhash_pairs", "multimodal_features",
    "kalman_smooth", "kalman_velocity", "kalman_adaptive",
    "graph_connected_components", "graph_label_propagation",
    "graph_pagerank", "graph_louvain_supplier_communities",
    "graph_fastrp_embeddings",
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
