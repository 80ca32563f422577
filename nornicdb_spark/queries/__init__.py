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
# entries), round 9: (1) the int8 serving pair registered mid-round-8
# after that window was fixed — never driver-stamped (ann_int8_recall
# oracle-gated; ann_int8 rows-only, gated by its recall twin);
# (2) the entire remaining r5-stamp cohort (35 rows — the oldest
# oracle-backed stamps after r8); (3) 13 r6 fillers chosen to span the
# families the r5 cohort does not touch (TPC-H headline, graph
# traversal/decomposition, PPR/fastRP gates, MMR, multimodal decode,
# window/percentile/function surfaces).
# Exactly 50 entries — tests/test_registry.py pins len == 50 and the
# cohort claims so the r7 slip cannot recur. After r9 every
# oracle-backed stamp is r6+ and the oldest cohort is the remaining
# 37 r6 rows (queued for r10).
# Registered mid-round-9 (NOT in this window; lead the r10 list):
# stream_vec_dedup_int8 (rows-only), stream_vec_dedup_int8_gate
# (oracle-gated agreement with the fp32 exact greedy path),
# stream_bm25_topk (oracle-backed — shares bm25_topk's oracle verbatim),
# stream_ann_ivf_int8 (rows-only), stream_ann_ivf_int8_recall
# (oracle-gated recall vs the exact scan), stream_graph_wcc
# (oracle-backed — shares graph_connected_components' oracle verbatim;
# the maintained union-find labels are byte-identical to batch WCC),
# stream_dedup_exact (oracle-backed — shares dedup_exact's oracle;
# observation-log count/min aggregates are batch-order-invariant).
_PRIORITY = (
    # never-stamped (registered post-r8-window)
    "ann_int8_recall", "ann_int8",
    # round-5 stamps — the whole remaining cohort (35 rows)
    "ann_pq", "bm25_weighted", "corpus_mixture_plan",
    "corpus_split_contamination", "cypher_apoc_import",
    "cypher_call_byhop", "cypher_call_link_prediction",
    "cypher_call_louvain", "cypher_call_lp_ensemble",
    "cypher_call_lp_predict", "cypher_call_path_expand",
    "cypher_call_simple_paths", "cypher_call_spanning_tree",
    "dedup_embedding_cosine", "dedup_embedding_lsh_recall",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_simhash_pairs", "graph_label_propagation",
    "graph_link_prediction_suppliers",
    "graph_louvain_supplier_communities",
    "graph_triangle_count_suppliers", "hybrid_adaptive", "hybrid_rerank",
    "kalman_adaptive", "kalman_smooth", "kalman_velocity",
    "multimodal_frame_plan", "text_fingerprints", "text_language_id",
    "text_quality_scores", "text_token_stats", "vector_filtered_topk",
    # round-6 fillers (13 of the 50-row r6 cohort; rest queued for r10)
    "q1_pricing_summary", "q3_top_unshipped_revenue",
    "q5_revenue_by_nation", "graph_dijkstra_customer_parts",
    "graph_kcore", "cypher_call_ppr", "graph_fastrp_gate", "hybrid_mmr",
    "multimodal_decode", "window_lag_running_sum",
    "quantity_percentiles", "math_functions", "higher_order_list_ops",
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
