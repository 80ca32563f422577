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
# entries), round 4: (1) the r03 mismatch, now fixed; (2) queries whose
# oracle or output convention is NEW or CHANGED this round (CALL-routed
# §2.9 tail, new oracles for pagerank/WCC/bm25-prefix, hybrid adaptive/
# rerank, weighted BM25, spatial intersects, 9-decimal rounding
# re-stamps); (3) rows-only queries no round has checked. Remaining
# window slots fill with already-stamped oracle-backed entries (tier 1).
_PRIORITY = (
    # the single r03 red row, fixed (ULP rounding)
    "inference_evidence_buffer",
    # formerly rows-only, now oracle-backed
    "graph_pagerank", "graph_connected_components", "bm25_prefix_topk",
    # §2.9 tail reached through CALL dispatch (new this round)
    "cypher_call_astar", "cypher_call_simple_paths",
    "cypher_call_betweenness", "cypher_call_closeness",
    "cypher_call_louvain", "cypher_call_subgraph_nodes",
    "cypher_call_spanning_tree", "cypher_call_path_expand",
    "cypher_call_byhop", "cypher_call_link_prediction",
    "cypher_call_lp_predict", "cypher_call_lp_ensemble",
    # CALL-routed load/export round trip + frontend spatial tail
    "cypher_apoc_load", "cypher_spatial_intersects",
    # hybrid adaptive weights / rerank / weighted BM25 / packing (new)
    "hybrid_adaptive", "hybrid_rerank", "bm25_weighted",
    "corpus_sequence_packing",
    # 9-decimal rounding convention changed output values → re-stamp
    "embedding_centroid_stats", "text_unigram_logprob", "sessionization",
    "graph_link_prediction_suppliers",
    # rows-only never driver-stamped (weaker rows-check is still a stamp)
    "hybrid_mmr",
    "dedup_embedding_lsh", "dedup_simhash_pairs", "multimodal_features",
    "kalman_smooth", "kalman_velocity", "kalman_adaptive",
    "graph_label_propagation", "graph_louvain_supplier_communities",
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
