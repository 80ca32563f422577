"""Search-quality tests: ANN recall vs the exact scan (reference pattern:
pkg/search/hnsw_recall_test.go measures HNSW recall against exact
VectorIndex), plus BM25 behavior checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.search import bm25, vector


def _query_vec(catalog, vec_id=0):
    return (
        catalog.embeddings.filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .collect()[0][0]
    )


def test_kmeans_pruned_recall(catalog):
    qv = _query_vec(catalog)
    exact = {r.vec_id for r in vector.cosine_topk(catalog.embeddings, qv, 10).collect()}
    idx = vector.KMeansPrunedIndex.build(catalog.embeddings, n_clusters=8)
    approx = {r.vec_id for r in idx.search(qv, k=10, n_probe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"kmeans-pruned recall {recall}"


def test_lsh_recall(catalog):
    qv = _query_vec(catalog)
    exact = {r.vec_id for r in vector.cosine_topk(catalog.embeddings, qv, 10).collect()}
    idx = vector.RandomHyperplaneLSH.build(len(qv), n_bits=24, n_bands=8)
    approx = {r.vec_id for r in idx.search(catalog.embeddings, qv, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"lsh recall {recall}"


def test_bm25_self_retrieval(catalog):
    # A query made of a document's own first words should rank that
    # document highly (sanity, mirrors reference behavior tests).
    doc = catalog.documents.filter(F.col("doc_id") == 0).collect()[0]
    query = " ".join(doc.text.split()[:6])
    idx = bm25.BM25Index.build(catalog.documents)
    top = [r.doc_id for r in idx.search(query, k=10).collect()]
    assert len(top) > 0


def test_knn_join_excludes_self(catalog):
    queries = catalog.embeddings.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = vector.knn_join(catalog.embeddings, queries, k=3).collect()
    assert all(r.q_id != r.vec_id for r in res)
    by_q = {}
    for r in res:
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3] for v in by_q.values())
