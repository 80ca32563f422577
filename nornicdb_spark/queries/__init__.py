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
# entries), round 10: (1) the seven maintained-index-family rows
# registered mid-round-9 after that window was fixed — never
# driver-stamped; three of them carry batch-oracle-VERBATIM claims
# (stream_graph_wcc shares graph_connected_components' oracle,
# stream_dedup_exact shares dedup_exact's, stream_bm25_topk shares
# bm25_topk's), so a driver hash-stamp here is the strongest possible
# close on the round-9 centerpiece; the two rows-only twins
# (stream_vec_dedup_int8, stream_ann_ivf_int8) are each gated by their
# oracle-backed gate/recall sibling in the same window;
# (2) the entire remaining r6-stamp cohort (37 rows — the oldest
# oracle-backed stamps after r9); (3) 6 r7 fillers spanning the families
# the rest of the window does not touch (mutations, Cypher pipeline,
# streaming windows, procedures, IVF-PQ recall, Neo4j-JSON source).
# Exactly 50 entries — tests/test_registry.py pins the window size so
# the r7 slip cannot recur. After r10 no oracle-backed stamp is older
# than r7 (the remaining 44 r7 rows lead the r11 window).
_PRIORITY = (
    # never-stamped (registered post-r9-window): the maintained family
    "stream_graph_wcc", "stream_dedup_exact", "stream_bm25_topk",
    "stream_vec_dedup_int8_gate", "stream_vec_dedup_int8",
    "stream_ann_ivf_int8_recall", "stream_ann_ivf_int8",
    # round-6 stamps — the whole remaining cohort (37 rows)
    "case_acctbal_bands", "collect_segments_per_nation",
    "corpus_temperature_resample", "count_distinct_per_segment",
    "date_functions", "distinct_segments", "exists_customers_with_orders",
    "graph_all_shortest_paths_customer_parts", "graph_astar_customer_region",
    "graph_betweenness_nation_region", "graph_closeness_nation_region",
    "graph_customer_parts_2hop", "graph_exists_parts_with_suppliers",
    "graph_khop_supplier", "graph_optional_match_nation_suppliers",
    "graph_order_degrees", "graph_orders_per_customer",
    "graph_pagerank_personalized", "graph_shortest_path_supplier_region",
    "graph_suppliers_per_region", "graph_undirected_nation_neighbors",
    "graph_var_length_reach", "having_frequent_customers",
    "in_list_nations", "join_customer_nation_region", "list_functions",
    "not_exists_customers_without_orders", "null_handling",
    "optional_match_order_counts", "order_count_by_status",
    "order_skip_limit", "regex_match_customers", "stats_by_brand",
    "string_functions", "string_predicates", "top_acctbal_customers",
    "topk_orders_per_priority",
    # round-7 fillers (6 of the 50-row r7 cohort; rest queued for r11)
    "mutation_merge_order_counts", "cypher_orders_pipeline",
    "stream_windowed_counts", "proc_db_schema_visualization",
    "ann_ivfpq_recall", "source_neo4j_json_roundtrip",
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
