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
# entries), round 6: (1) queries that are NEW or whose oracle/behavior
# CHANGED this round (fastRP gate, real WAV/PPM decode, k-core oracle
# depth now tied to the engine constant, temperature-resample rounded
# acceptance boundary, MMR rounded selection key, PPR source validation);
# (2) stale-stamp rotation — 133 of 183 queries carried an r1-r4 stamp
# into r6, so the remaining 43 slots go to the OLDEST (round-1) stamps,
# re-verifying the relational/graph/function families against current
# code. The leftover r1 trio (union_all_names, union_names,
# unwind_part_words) + the r2-r4 cohort rotate in next round.
_PRIORITY = (
    # new or changed this round
    "graph_fastrp_gate", "multimodal_decode", "graph_kcore",
    "corpus_temperature_resample", "hybrid_mmr",
    "graph_pagerank_personalized", "cypher_call_ppr",
    # oldest stamps (round 1) — relational core
    "case_acctbal_bands", "collect_segments_per_nation",
    "count_distinct_per_segment", "date_functions", "distinct_segments",
    "exists_customers_with_orders", "having_frequent_customers",
    "higher_order_list_ops", "in_list_nations",
    "join_customer_nation_region", "list_functions", "math_functions",
    "not_exists_customers_without_orders", "null_handling",
    "optional_match_order_counts", "order_count_by_status",
    "order_skip_limit", "q1_pricing_summary", "q3_top_unshipped_revenue",
    "q5_revenue_by_nation", "quantity_percentiles",
    "regex_match_customers", "stats_by_brand", "string_functions",
    "string_predicates", "top_acctbal_customers",
    "topk_orders_per_priority", "window_lag_running_sum",
    # oldest stamps (round 1) — graph pattern + algorithm family
    "graph_all_shortest_paths_customer_parts", "graph_astar_customer_region",
    "graph_betweenness_nation_region", "graph_closeness_nation_region",
    "graph_customer_parts_2hop", "graph_dijkstra_customer_parts",
    "graph_exists_parts_with_suppliers", "graph_khop_supplier",
    "graph_optional_match_nation_suppliers", "graph_order_degrees",
    "graph_orders_per_customer", "graph_shortest_path_supplier_region",
    "graph_suppliers_per_region", "graph_undirected_nation_neighbors",
    "graph_var_length_reach",
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
