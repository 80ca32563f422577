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
# entries), round 5: (1) the 4 r04 err rows, now stringified; (2) queries
# whose oracle, implementation, or output convention is NEW or CHANGED
# this round (apoc.import.json CALL, LPA/louvain oracles, the louvain
# singleton-swap convergence fix, ANN recall gates, MMR oracle + rounded
# score, link-prediction contribution precompute). Remaining window
# slots fill with already-stamped oracle-backed entries (tier 1).
_PRIORITY = (
    # the 4 r04 err rows — array outputs now stringified
    "cypher_call_simple_paths", "cypher_call_spanning_tree",
    "cypher_call_path_expand", "cypher_call_byhop",
    # new CALL route + e2e roundtrip
    "cypher_apoc_import",
    # formerly rows-only, now oracle-backed
    "graph_label_propagation", "graph_louvain_supplier_communities",
    "hybrid_mmr",
    # new driver-visible ANN recall gates
    "ann_kmeans_recall", "ann_lsh_recall", "ann_hnsw_recall",
    # formerly rows-only, now oracle-backed (simhash pair mining is
    # md5-deterministic; Kalman recurrences as recursive CTEs)
    "dedup_simhash_pairs", "dedup_embedding_lsh_recall",
    "kalman_smooth", "kalman_velocity", "kalman_adaptive",
    # new data-recipe operators (beyond-reference LLM-pipeline family)
    "corpus_temperature_resample", "corpus_mixture_plan",
    "corpus_split_contamination",
    # product-quantization ANN (compression path) + its gate
    "ann_pq_recall", "ann_pq",
    # personalized PageRank (GDS sourceNodes config), unrolled-CTE oracle
    "graph_pagerank_personalized", "cypher_call_ppr",
    # triangle count + clustering coefficient (compact-forward), k-core
    "graph_triangle_count_suppliers", "graph_kcore",
    # louvain convergence fix changed community outputs → re-stamp
    "cypher_call_louvain",
    # link-prediction per-neighbor contribution precompute → re-stamp
    "graph_link_prediction_suppliers", "cypher_call_link_prediction",
    "cypher_call_lp_predict", "cypher_call_lp_ensemble",
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
