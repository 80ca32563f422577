"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1), local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect). A warmup query runs first so JVM/codegen startup isn't billed to
the first measurement.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nornicdb_spark import get_spark
from nornicdb_spark.queries import QUERIES

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_top_unshipped_revenue",
    "q5_revenue_by_nation",
    "topk_orders_per_priority",
    "window_lag_running_sum",
    # graph patterns + algorithms
    "graph_orders_per_customer",
    "graph_customer_parts_2hop",
    "graph_link_prediction_suppliers",
    "graph_var_length_reach",
    "graph_pagerank",
    "graph_dijkstra_customer_parts",
    # cypher frontend end-to-end
    "cypher_orders_pipeline",
    # search
    "bm25_topk",
    "vector_knn_join",
    "hybrid_rrf",
    # LLM-pipeline ops
    "dedup_minhash_lsh",
    "text_quality_scores",
    # mutations
    "mutation_merge_order_counts",
]


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="nornicdb-bench")

    # warmup: touch the fact table + trigger codegen paths
    materialize(QUERIES["q1_pricing_summary"](spark, sf_dir))

    # three passes, min per query: host-level contention adds 2-3×
    # multiplicative noise to single shots (this box is shared — load
    # spikes land on whole passes), and the iterative operators reach
    # codegen/adjacency steady state on their second run; the min over
    # three is the honest engine-cost estimate with one noisy window
    # tolerated
    timings: dict[str, float] = {}
    for _pass in range(3):
        for name in HEADLINE:
            if name not in QUERIES:
                continue
            t0 = time.perf_counter()
            materialize(QUERIES[name](spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            # drop references to this query's checkpointed RDDs promptly so
            # the shared JVM's block manager doesn't bloat into later queries
            gc.collect()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
