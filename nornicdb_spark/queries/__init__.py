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
# entries), round 11: (1) the five rows registered mid-round-10 after
# that window was fixed — never driver-stamped (the BM25 serving pair
# shares ONE DuckDB oracle, so two hashes close the whole
# batched-serving correctness story; stream_ann_ivf_multi's rows-only
# row rides with its oracle-backed equality gate; vocab_bpe_pairs is
# the tokenizer statistic); (2) the ENTIRE remaining r7-stamp cohort
# (44 rows — the oldest oracle-backed stamps after r10); (3) one
# filler: hybrid_rrf_many, this round's batched hybrid serving row
# (swept green at sf0.01) — after r11 nothing oracle-backed is older
# than r8, and only round-11's own vocab_bpe_merges remains unstamped
# (queued r12). Exactly 50 entries — tests/test_registry.py pins the
# window size so the r7 slip cannot recur.
#
# r12 rotation queue (registered post-r11-window, all swept green at
# sf0.01 + sf1, most at sf10 — see SWEEP_r11_late_additions_*.json):
# vocab_bpe_merges, dedup_substring_spans, dedup_substring_mask,
# text_bigram_logprob, text_tfidf_vectors, text_similar_docs_tfidf,
# corpus_source_report, embedding_random_projection, ann_rp_refine
# (+_recall, _multi, _multi_gate), sketch_distinct_users_gate,
# sketch_quantile_value_gate, stream_sketch_distinct_gate,
# stream_histogram_quantile, skew_salted_distinct_parts,
# skew_salted_join_revenue, corpus_weighted_sample (+_per_source),
# stream_weighted_sample (shares the batch sampler's oracle).
# Lead the r12 _PRIORITY with these, then
# the oldest remaining stamp cohort.
_PRIORITY = (
    # never-stamped (registered post-r10-window): batched serving + BPE
    "bm25_multi_query", "stream_bm25_multi_query",
    "stream_ann_ivf_multi_gate", "stream_ann_ivf_multi",
    "vocab_bpe_pairs",
    # round-7 stamps — the whole remaining cohort (44 rows)
    "dedup_cluster_canonical", "inference_similarity_edges",
    "stream_session_stats", "stream_access_tracker",
    "stream_static_enrich", "stream_stream_join", "stream_dedup_events",
    "inference_edge_decay", "mutation_create_regions",
    "mutation_set_remove_flag", "mutation_detach_delete_nation0",
    "mutation_foreach_discount_bump", "constraint_unique_violations",
    "spatial_haversine_distance", "duration_customer_order_span",
    "apoc_coll_suite", "apoc_map_json", "proc_db_labels",
    "proc_db_relationship_types", "proc_db_property_keys",
    "cypher_top_balances", "cypher_optional_match", "cypher_union_case",
    "cypher_unwind_functions", "cypher_write_pipeline",
    "cypher_shortest_path", "cypher_pattern_comprehension",
    "cypher_list_fold_quantifiers", "cypher_foreach_writes",
    "cypher_vector_search", "cypher_fulltext_search",
    "cypher_vector_spatial_functions", "cypher_merge_rel",
    "cypher_correlated_call", "cypher_varlen_bound_endpoint",
    "cypher_index_mgmt", "cypher_apoc_run", "graph_betweenness_sampled",
    "graph_all_simple_paths", "graph_subgraph_nodes",
    "graph_spanning_tree", "graph_neighbors_byhop_customer",
    "union_names", "union_all_names",
    # round-11 filler: the batched hybrid serving row
    "hybrid_rrf_many",
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
