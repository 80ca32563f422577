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
# entries), round 8: (1) the 4 queries registered after the r7 window was
# fixed and therefore never driver-stamped (quantize ×2 + stream near-dup
# oracle-backed; ann_ivfpq rows-only, its recall twin passed r7);
# (2) unwind_part_words — the r1 stamp that slipped the 51-entry r7 list;
# (3) the 22 r3 rows explicitly deferred from round 7;
# (4) the entire r4 cohort (13 rows);
# (5) 10 oldest-r5 fillers (search/ANN recall gates — they re-exercise
# the co_access-adjacent join paths least recently verified).
# Exactly 50 entries — tests/test_registry.py pins len == 50 and the
# cohort claims so the r7 slip cannot recur.
# Registered mid-round-8 (NOT in this window; lead the r9 list):
# ann_int8 (rows-only), ann_int8_recall (oracle-gated).
_PRIORITY = (
    # never-stamped (registered post-r7-window)
    "embedding_quantize_int8", "embedding_quantization_error",
    "stream_dedup_near_dup", "ann_ivfpq",
    # round-1 slip
    "unwind_part_words",
    # round-3 stamps — the 22 rows deferred from round 7
    "corpus_quality_filter", "corpus_stratified_sample",
    "text_repetition_ratios", "text_pii_scrub", "doc_chunking",
    "text_contamination", "vocab_top_words", "corpus_split_assign",
    "multimodal_resize_plan", "multimodal_audio_windows",
    "inference_transitive_edges", "decay_scores", "co_access_pairs",
    "event_window_agg", "json_props_extract", "events_asof_purchase",
    "temporal_cyclic_patterns", "spatial_polygon_contains",
    "proc_db_index_stats", "agg_rollup_region_nation",
    "agg_cube_status_priority", "set_ops_customer_supplier_nations",
    # round-4 stamps — whole cohort
    "embedding_centroid_stats", "text_unigram_logprob",
    "corpus_sequence_packing", "sessionization",
    "inference_evidence_buffer", "cypher_call_astar",
    "cypher_call_betweenness", "cypher_call_closeness",
    "cypher_call_subgraph_nodes", "graph_pagerank",
    "graph_connected_components", "cypher_apoc_load",
    "cypher_spatial_intersects",
    # round-5 fillers (oldest remaining cohort)
    "bm25_topk", "bm25_prefix_topk", "vector_cosine_topk",
    "vector_euclidean_topk", "vector_knn_join", "hybrid_rrf",
    "ann_kmeans_recall", "ann_lsh_recall", "ann_hnsw_recall",
    "ann_pq_recall",
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
