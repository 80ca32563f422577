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


def test_mmr_diversify_penalizes_near_duplicates(spark):
    # three candidates: A (top), B (near-identical to A), C (orthogonal,
    # slightly lower relevance than B) — with λ=0.5, MMR must pick C
    # before B once A is selected
    from nornicdb_spark.search.hybrid import mmr_diversify

    cand = spark.createDataFrame(
        [(1, 1.0), (2, 0.9), (3, 0.8)], "doc_id long, rrf_score double"
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.999, 0.01]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    rows = mmr_diversify(cand, emb, limit=3, mmr_lambda=0.5).orderBy(
        "mmr_rank"
    ).collect()
    assert [r.doc_id for r in rows] == [1, 3, 2]
    # λ=1.0 → pure relevance order
    rows = mmr_diversify(cand, emb, limit=3, mmr_lambda=1.0).orderBy(
        "mmr_rank"
    ).collect()
    assert [r.doc_id for r in rows] == [1, 2, 3]


def test_mmr_limit_exceeds_candidates_and_null_embeddings(spark):
    # edge cases of the greedy loop: (a) limit > candidate count must
    # return every candidate exactly once, ranks 1..n; (b) candidates
    # with no embedding row (NULL vector) are legal — they carry zero
    # similarity penalty, so ordering among them is pure relevance.
    from nornicdb_spark.search.hybrid import mmr_diversify

    cand = spark.createDataFrame(
        [(1, 1.0), (2, 0.9), (3, 0.8), (4, 0.7)], "doc_id long, rrf_score double"
    )
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (3, [1.0, 0.0])],  # 2 and 4 have no embedding
        "vec_id long, embedding array<double>",
    )
    rows = mmr_diversify(cand, emb, limit=100, mmr_lambda=0.5).orderBy(
        "mmr_rank"
    ).collect()
    assert len(rows) == 4
    assert [r.mmr_rank for r in rows] == [1, 2, 3, 4]
    assert sorted(r.doc_id for r in rows) == [1, 2, 3, 4]
    # doc 3 duplicates doc 1's vector → full penalty pushes it last at
    # λ=0.5 (0.5·0.8 − 0.5·1.0 < 0); the unembedded 2 and 4 are unpenalized
    assert [r.doc_id for r in rows] == [1, 2, 4, 3]
    # zero-norm embedding is treated like a missing one, not a crash
    emb0 = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = mmr_diversify(cand.limit(2), emb0, limit=5, mmr_lambda=0.5).collect()
    assert len(rows) == 2


def test_pq_recall_with_refinement(catalog):
    # PQ (m=16 subspaces × 32 codes) + top-8k exact refinement must
    # recover most of the exact euclidean top-10 (ADC alone is coarse on
    # near-random vectors; refinement is the standard ADC+R fix).
    from pyspark.sql import functions as F

    emb = catalog.embeddings
    qv = _query_vec(catalog)
    exact = {r.vec_id for r in vector.euclidean_topk(emb, qv, 10).collect()}
    idx = vector.ProductQuantizerIndex.build(emb, m=16, k_codes=32)
    approx = {r.vec_id for r in idx.search(qv, k=10, refine=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"pq recall {recall}"
    # compressed representation really is m small codes
    row = idx.codes.first()
    assert len(row.codes) == 16 and all(0 <= c < 32 for c in row.codes)


def test_ivfpq_recall_and_structure(catalog):
    # IVFADC: coarse lists + residual PQ + probed-list ADC + refine.
    # Uniform synthetic embeddings are the IVF worst case (the coarse
    # probe dominates the loss), so the gate sits at 0.5 like the
    # kmeans-pruned gate; measured 0.6-1.0 across query vectors.
    emb = catalog.embeddings
    qv = _query_vec(catalog)
    exact = {r.vec_id for r in vector.euclidean_topk(emb, qv, 10).collect()}
    idx = vector.IVFPQIndex.build(emb, n_lists=8, m=16, k_codes=32)
    approx = {r.vec_id for r in idx.search(qv, k=10, n_probe=4, refine=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ivfpq recall {recall}"
    # the codes table carries the list routing and m small codes
    row = idx.codes.first()
    assert 0 <= row.list_id < 8
    assert len(row.codes) == 16 and all(0 <= c < 32 for c in row.codes)
    # probing every list with no refinement degrades exactly to PQ ADC
    # over the full corpus: candidates == corpus, ranking pure-ADC
    full = idx.search(qv, k=10, n_probe=8, refine=1)
    assert full.count() == 10


def test_ivfpq_probe_prunes_lists(catalog):
    # the ADC scan must touch only the probed lists: filter on list_id
    # reaches the codes scan, and the scan stays JVM-only (no Python
    # eval) up to the TakeOrdered
    emb = catalog.embeddings
    qv = _query_vec(catalog)
    idx = vector.IVFPQIndex.build(emb, n_lists=8, m=16, k_codes=32)
    df = idx.search(qv, k=10, n_probe=2, refine=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "list_id" in plan and "isin" in plan.lower() or " IN (" in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "TakeOrderedAndProject" in plan


def test_bm25_search_many_equals_per_query_search(catalog):
    # the batched serving path must return, per query, exactly the
    # single-query path's top-k — including the repeated-word weight
    # and the rounded-score/doc_id tie order; an untokenizable query
    # contributes no rows.
    spark = catalog.documents.sparkSession
    batch = [
        (1, "spark join query performance"),
        (2, "distributed shuffle partition skew"),
        (3, "query query optimizer"),  # repeated word → 2× weight
        (4, "a of the"),  # stopwords only → no output rows
    ]
    idx = bm25.BM25Index.build(catalog.documents)
    qdf = spark.createDataFrame(batch, "query_id long, query_text string")
    got = {}
    for r in idx.search_many(qdf, k=5).collect():
        got.setdefault(r.query_id, []).append((r.doc_id, round(r.score, 9)))
    for qid, qtext in batch:
        want = [
            (r.doc_id, round(r.score, 9))
            for r in idx.search(qtext, k=5).collect()
        ]
        assert got.get(qid, []) == want, f"query {qid} diverges"
    assert 4 not in got


def test_bm25_unified_tokenizer_non_ascii(spark):
    # ONE tokenizer rule on every path (reference tokenize() is Unicode:
    # fulltext_index.go:254-256): a query with non-ASCII letters must
    # score identically through search(), search_many() AND the DuckDB
    # oracle — the regression for the query-side ASCII/corpus-side
    # Unicode split search_many shipped with.
    import duckdb
    import pandas as pd

    docs_rows = [
        (0, "naïve café data naïve"),
        (1, "café terrace at night"),
        (2, "plain ascii data table"),
        (3, "naïve approach to data"),
    ]
    assert bm25.tokenize_query("Naïve café 東京 a x") == ["naïve", "café", "東京"]

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    idx = bm25.BM25Index.build(docs)
    single = [
        (r.doc_id, round(r.score, 9))
        for r in idx.search("naïve café data", k=4).collect()
    ]
    assert single, "non-ASCII query matched nothing"
    qdf = spark.createDataFrame(
        [(7, "naïve café data")], "query_id long, query_text string"
    )
    batched = [
        (r.doc_id, round(r.score, 9))
        for r in idx.search_many(qdf, k=4).collect()
    ]
    assert batched == single

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(docs_rows, columns=["doc_id", "text"])
    )
    oracle = [
        (int(d), round(float(s), 9))
        for d, s in con.execute(
            bm25.bm25_oracle_sql("naïve café data", k=4)
        ).fetchall()
    ]
    assert oracle == single


def test_bm25_multi_oracle_empty_batch_raises():
    # 'VALUES ' with zero rows is invalid SQL — refuse at build time
    # instead of handing DuckDB a syntax error at registration.
    import pytest

    with pytest.raises(ValueError, match="tokenized\\s+to nothing"):
        bm25.bm25_multi_oracle_sql([(1, "a of the"), (2, "x")], k=3)
    # one indexable query is enough for a valid oracle
    sql = bm25.bm25_multi_oracle_sql([(1, "a of the"), (2, "data")], k=3)
    assert "VALUES (2, 'data', 1.0)" in sql


def test_bm25_shared_index_memo_evicts_stopped_sessions(catalog):
    # the memo is a SessionMemo, not a plain dict: a stopped session's
    # entry must not pin the interpreter or be readable by an id()-reuse
    from nornicdb_spark.operators.scope import SessionMemo

    memo = bm25._shared_memo()
    assert isinstance(memo, SessionMemo)
    idx = bm25.shared_index(catalog.documents, "memo-test-key")
    assert bm25.shared_index(catalog.documents, "memo-test-key") is idx


def test_hybrid_rrf_many_equals_single_query_composition(catalog, sf_dir):
    # the batched hybrid (search_many BM25 leg + cosine_topk_many vector
    # leg + rrf_fuse_many) must return, per query, exactly what the
    # single-query composition (search + cosine_topk + rrf_fuse) returns
    from nornicdb_spark.queries.search import (
        HYBRID_BATCH,
        _query_vec,
        hybrid_rrf_many,
    )
    from nornicdb_spark.search import hybrid

    spark = catalog.documents.sparkSession
    got = {}
    for r in hybrid_rrf_many(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append(
            (r.doc_id, round(r.rrf_score, 9), r.bm_rank, r.vec_rank)
        )
    idx = bm25.shared_index(catalog.documents, sf_dir)
    for qid, qtext, vid in HYBRID_BATCH:
        bm = hybrid.rank_by(idx.search(qtext, k=20), "score", "doc_id")
        vs = hybrid.rank_by(
            vector.cosine_topk(
                catalog.embeddings, _query_vec(spark, sf_dir, vid), k=20
            ).withColumnRenamed("vec_id", "doc_id"),
            "score",
            "doc_id",
        )
        fused = hybrid.rrf_fuse({"bm": bm, "vec": vs}, id_col="doc_id")
        want = [
            (r.doc_id, round(r.rrf_score, 9), r.bm_rank, r.vec_rank)
            for r in fused.collect()
        ]
        assert got.get(qid, []) == want, f"query {qid} diverges"


def test_phrase_search_semantics(spark):
    # reference PhraseSearch: contains + earliest-occurrence score
    # 1/(1+idx/100); position-0 match scores exactly 1.0; absent phrase
    # yields no rows; equal positions fall to the doc_id tie-break
    docs = spark.createDataFrame(
        [
            (0, "Merge Batch first"),        # idx 0 → 1.0
            (1, "xx merge batch later"),     # idx 3 → 1/(1.03)
            (2, "no match here"),
            (3, "merge batch tie"),          # idx 0 → ties doc 0
        ],
        "doc_id long, text string",
    )
    got = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.phrase_search(docs, "MERGE batch", limit=10).collect()
    ]
    assert got == [
        (0, 1.0),
        (3, 1.0),
        (1, round(1.0 / 1.03, 9)),
    ]


def test_rp_refine_recall_and_shape(catalog):
    qv = _query_vec(catalog)
    exact = {r.vec_id for r in vector.cosine_topk(catalog.embeddings, qv, 10).collect()}
    got = vector.rp_refine_topk(catalog.embeddings, qv, k=10, coarse=200).collect()
    recall = len(exact & {r.vec_id for r in got}) / len(exact)
    assert recall >= 0.5, f"rp-refine recall {recall}"
    # refined scores are the EXACT full-width cosines, ordered desc
    scores = [r.score for r in got]
    assert scores == sorted(scores, reverse=True)
    # coarse >= corpus degenerates to the exact scan (pool covers all)
    full = vector.rp_refine_topk(
        catalog.embeddings, qv, k=10, coarse=10_000_000
    ).collect()
    assert {r.vec_id for r in full} == exact


def test_rp_refine_many_equals_single_path(catalog):
    from pyspark.sql import functions as F

    emb = catalog.embeddings
    q = emb.filter(F.col("vec_id").isin(3, 11)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch = {
        (r.query_id, r.vec_id, round(r.score, 9))
        for r in vector.rp_refine_topk_many(emb, q, k=5, coarse=120).collect()
    }
    single = set()
    for qid in (3, 11):
        qv = emb.filter(F.col("vec_id") == qid).select("embedding").collect()[0][0]
        for r in vector.rp_refine_topk(emb, qv, k=5, coarse=120).collect():
            single.add((qid, r.vec_id, round(r.score, 9)))
    assert batch == single and len(batch) == 10


def test_rp_refine_many_empty_query_batch(catalog):
    from pyspark.sql import functions as F

    emb = catalog.embeddings
    q = emb.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = vector.rp_refine_topk_many(emb, q, k=5, coarse=50)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "score"]
