"""HNSW recall + determinism tests (reference search/hnsw_recall_test.go
style: approximate results must overlap the exact brute-force oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.search.hnsw import HnswIndex, ShardedHnswIndex
from nornicdb_spark.search.vector import cosine_topk


def test_hnsw_recall_vs_bruteforce(spark, catalog):
    emb = catalog.embeddings
    query = [float((i * 7) % 13) / 13.0 for i in range(64)]

    idx = HnswIndex.build(emb, preset="balanced")
    approx = [vid for vid, _ in idx.search(query, k=10)]

    exact = [
        r.vec_id
        for r in cosine_topk(emb, query, k=10, id_col="vec_id").collect()
    ]
    overlap = len(set(approx) & set(exact))
    assert overlap >= 9, f"recall@10 too low: {overlap}/10"


def test_hnsw_deterministic_build(spark, catalog):
    emb = catalog.embeddings
    q = [1.0] * 64
    a = HnswIndex.build(emb).search(q, k=5)
    b = HnswIndex.build(emb).search(q, k=5)
    assert a == b


def test_sharded_hnsw_recall_vs_bruteforce(spark, catalog):
    # build_partitioned must keep vectors on the executors and still hit
    # ≥0.9 recall@10 against the exact scan (VERDICT round-1 gate).
    emb = catalog.embeddings
    query = [float((i * 7) % 13) / 13.0 for i in range(64)]
    idx = ShardedHnswIndex.build_partitioned(emb, num_shards=4, preset="balanced")
    try:
        approx = [vid for vid, _ in idx.search(query, k=10)]
        exact = [
            r.vec_id
            for r in cosine_topk(emb, query, k=10, id_col="vec_id").collect()
        ]
        overlap = len(set(approx) & set(exact))
        assert overlap >= 9, f"sharded recall@10 too low: {overlap}/10"
    finally:
        idx.unpersist()


def test_sharded_hnsw_distributed_queries(spark, catalog):
    emb = catalog.embeddings
    idx = ShardedHnswIndex.build_partitioned(emb, num_shards=3, preset="fast")
    try:
        queries = emb.select(
            F.col("vec_id").alias("query_id"), "embedding"
        ).limit(20)
        rows = idx.search_distributed(queries, k=3).collect()
        assert len(rows) == 60
        top1 = {r.query_id: r.vec_id for r in rows if r.rank == 1}
        hits = sum(1 for qid, vid in top1.items() if qid == vid)
        assert hits >= 18
    finally:
        idx.unpersist()


def test_hnsw_distributed_queries(spark, catalog):
    emb = catalog.embeddings
    idx = HnswIndex.build(emb, preset="fast")
    queries = emb.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).limit(20)
    res = idx.search_distributed(queries, k=3)
    rows = res.collect()
    assert len(rows) == 60
    # self should be its own nearest neighbor (exact vector present)
    top1 = {r.query_id: r.vec_id for r in rows if r.rank == 1}
    hits = sum(1 for qid, vid in top1.items() if qid == vid)
    assert hits >= 18


def test_hnsw_near_duplicate_clusters_recall():
    # near-duplicate clusters are the HNSW degenerate case: plain
    # closest-M neighbor selection turns each cluster into a clique that
    # disconnects from the graph (measured recall 0.65 at the sf10
    # probe's 100-fold-copy corpus). The diversity heuristic
    # (_select_neighbors, Malkov & Yashunin Alg. 4) must keep bridge
    # edges: recall over clustered data stays >= 0.9.
    import numpy as np

    from nornicdb_spark.search.hnsw import HnswIndex

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype(np.float32)
    vecs = np.repeat(base, 100, axis=0) + 0.005 * rng.normal(
        size=(2000, 16)
    ).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = np.arange(2000, dtype=np.int64)
    idx = HnswIndex(ids, vecs, m=16, ef_construction=200, ef_search=100, seed=42)

    hits = total = 0
    for qi in range(0, 2000, 100):  # one query per cluster
        q = vecs[qi]
        exact = np.argsort(-(vecs @ q), kind="stable")[:10]
        got = {i for i, _ in idx.search(q, k=10)}
        hits += len(got & {int(ids[e]) for e in exact})
        total += 10
    assert hits / total >= 0.9, hits / total
