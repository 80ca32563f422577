"""Search queries — SURVEY §2.10: BM25 fulltext, vector top-k, kNN join,
hybrid RRF, and ANN variants (KMeans-pruned, LSH).

Exact ops carry full DuckDB oracles. ANN ops are approximate by design —
they get rows-only driver checks plus recall assertions in
tests/test_search.py (reference pattern: hnsw_recall_test.go measures
recall against the exact index).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from nornicdb_spark.operators.localframe import literal_df

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.operators import scope
from nornicdb_spark.search import bm25 as bm25_mod
from nornicdb_spark.search import hybrid, vector
from nornicdb_spark.queries import register

BM25_QUERY = "spark join query performance"
FUSE_QUERY = "window merge batch"


_QUERY_VEC_MEMO = scope.SessionMemo()


def _query_vec(spark, sf_dir, vec_id: int = 0):
    # memoized per (session, dir, vec_id): the collected 1-row query
    # vector is a deterministic driver-resident artifact, and re-reading
    # it cost every vector-leg query a full embeddings scan + one job
    # per invocation (measured: 11.7 MB scanned for one row at sf0.1).
    # ASSUMES the embeddings parquet under sf_dir is immutable for the
    # life of the session (true for every harness: test fixtures and
    # bench dirs are written once) — a caller that rewrites embeddings
    # in-session must use a fresh session or a different sf_dir key,
    # or this memo serves the pre-rewrite vector.
    hit = _QUERY_VEC_MEMO.get(spark, (sf_dir, vec_id))
    if hit is not None:
        return hit[0]
    emb = Catalog(spark, sf_dir).embeddings
    vec = emb.filter(F.col("vec_id") == vec_id).select("embedding").collect()[0][0]
    return _QUERY_VEC_MEMO.put(spark, (sf_dir, vec_id), (vec,))[0]


@register("bm25_topk", oracle=bm25_mod.bm25_oracle_sql(BM25_QUERY, k=10))
def bm25_topk(spark, sf_dir):
    # db.index.fulltext.queryNodes (reference call_fulltext.go; scoring
    # fulltext_index.go:123-199).
    docs = Catalog(spark, sf_dir).documents
    idx = bm25_mod.shared_index(docs, sf_dir)
    return idx.search(BM25_QUERY, k=10)


_FT_IDX_MEMO = scope.SessionMemo()


def _maintained_ft_index(spark, sf_dir):
    # documents ingested in 3 batches into the maintained term-hash-
    # partitioned postings table (streaming/fulltext.py). Memoized per
    # (session, sf_dir) now that two registry rows probe it — the
    # deterministic-build twin-sharing discipline of the IVF/vec memos.
    hit = _FT_IDX_MEMO.get(spark, sf_dir)
    if hit is not None:
        return hit
    import shutil

    from nornicdb_spark.streaming.fulltext import MaintainedBM25Index

    docs = Catalog(spark, sf_dir).documents
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/ftidx_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedBM25Index(spark, path)
    for b in range(3):
        idx.process_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    return _FT_IDX_MEMO.put(spark, sf_dir, idx)


@register("stream_bm25_topk", oracle=bm25_mod.bm25_oracle_sql(BM25_QUERY, k=10))
def stream_bm25_topk(spark, sf_dir):
    # the reference's LIVE inverted index (fulltext_index.go Add keeps
    # postings current as docs arrive): an exact-term search probing
    # only the query terms' partitions of the maintained postings.
    # df/tf/dl/N/avgdl are batch-order-invariant, so the result — and
    # the oracle — are IDENTICAL to the static bm25_topk: the strongest
    # correctness statement a streaming index can make.
    return _maintained_ft_index(spark, sf_dir).search(BM25_QUERY, k=10)


@register(
    "bm25_prefix_topk",
    oracle=bm25_mod.bm25_prefix_oracle_sql("spar quer", k=10),
)
def bm25_prefix_topk(spark, sf_dir):
    # prefix-match expansion at 0.8·idf (fulltext_index.go:157-171).
    # Selection orders by the raw score (same as the oracle's inner
    # LIMIT); the emitted score is rounded to 9 decimals on both sides.
    docs = Catalog(spark, sf_dir).documents
    idx = bm25_mod.shared_index(docs, sf_dir)
    out = idx.search("spar quer", k=10, prefix=True)
    return out.select("doc_id", F.round("score", 9).alias("score"))


# a serving-shaped batch: overlapping vocabularies (so the pruned
# postings slice is shared), one repeated word (per-query weight), and
# one query with no indexable tokens (contributes no rows, both sides)
BM25_BATCH = [
    (1, BM25_QUERY),
    (2, "distributed shuffle partition skew"),
    (3, "query query optimizer"),
    (4, "a of the"),
]


@register(
    "bm25_multi_query",
    oracle=bm25_mod.bm25_multi_oracle_sql(BM25_BATCH, k=5),
)
def bm25_multi_query(spark, sf_dir):
    # batched serving: the whole query table scored in ONE pass over the
    # semi-join-pruned postings slice (search_many) — q queries cost one
    # scan instead of q driver round trips; per-query results equal the
    # single-query path's (tested in test_search.py).
    docs = Catalog(spark, sf_dir).documents
    idx = bm25_mod.shared_index(docs, sf_dir)
    qdf = literal_df(spark, BM25_BATCH, "query_id long, query_text string")
    # raw score on both sides (bm25_topk's pattern — the harness rounds)
    return idx.search_many(qdf, k=5).select("query_id", "doc_id", "score")


@register(
    "stream_bm25_multi_query",
    oracle=bm25_mod.bm25_multi_oracle_sql(BM25_BATCH, k=5),
)
def stream_bm25_multi_query(spark, sf_dir):
    # batched serving over the LIVE index: one tk-isin-pruned scan
    # covers the whole query batch's terms; shares bm25_multi_query's
    # oracle verbatim (maintained == static on the same corpus).
    idx = _maintained_ft_index(spark, sf_dir)
    qdf = literal_df(spark, BM25_BATCH, "query_id long, query_text string")
    return idx.search_many(qdf, k=5).select("query_id", "doc_id", "score")


_COSINE_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       list_dot_product(CAST(embedding AS DOUBLE[]), qv)
         / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])))
            * sqrt(list_dot_product(qv, qv))) AS score
FROM embeddings, q
ORDER BY round(score, 9) DESC, vec_id LIMIT 10
"""


@register("vector_cosine_topk", oracle=_COSINE_ORACLE)
def vector_cosine_topk(spark, sf_dir):
    # db.index.vector.queryNodes, cosine (reference call_vector.go:35-280);
    # exact linear scan = the reference's exact VectorIndex
    # (vector_index.go:312-363).
    emb = Catalog(spark, sf_dir).embeddings
    return vector.cosine_topk(emb, _query_vec(spark, sf_dir), k=10)


_COSINE_MINSIM_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id, score FROM (
  SELECT vec_id,
         list_dot_product(CAST(embedding AS DOUBLE[]), qv)
           / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qv, qv))) AS score
  FROM embeddings, q
) WHERE round(score, 9) >= 0.30
ORDER BY round(score, 9) DESC, vec_id LIMIT 10
"""


@register("vector_cosine_minsim", oracle=_COSINE_MINSIM_ORACLE)
def vector_cosine_minsim(spark, sf_dir):
    # the reference Search()'s minSimilarity knob (vector_index.go:
    # 312-363; service resolveMinSimilarity): results below the
    # threshold are dropped BEFORE the top-k, so fewer than k rows can
    # return. Threshold compares the rounded score on both sides. At
    # the fixture corpus 0.30 keeps ~6 of the top-10 — the truncation
    # path is actually exercised.
    emb = Catalog(spark, sf_dir).embeddings
    return vector.cosine_topk(
        emb, _query_vec(spark, sf_dir), k=10, min_similarity=0.30
    )


_EUCLID_ORACLE = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       sqrt(list_sum(list_transform(
           list_zip(CAST(embedding AS DOUBLE[]), qv),
           p -> (p[1] - p[2]) * (p[1] - p[2])))) AS dist
FROM embeddings, q
ORDER BY round(dist, 9) ASC, vec_id LIMIT 10
"""


@register("vector_euclidean_topk", oracle=_EUCLID_ORACLE)
def vector_euclidean_topk(spark, sf_dir):
    # euclidean similarity option (reference call_vector.go:153-232).
    emb = Catalog(spark, sf_dir).embeddings
    return vector.euclidean_topk(emb, _query_vec(spark, sf_dir), k=10)


_KNN_ORACLE = """
WITH q AS (
  SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))) AS score
  FROM embeddings e, q WHERE e.vec_id <> q.q_id
)
SELECT q_id, vec_id, score, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY round(score, 9) DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 5
"""


@register("vector_knn_join", oracle=_KNN_ORACLE)
def vector_knn_join(spark, sf_dir):
    # batch similarity fan-out (reference GPU batch path, pkg/gpu/gpu.go —
    # replaced by cluster parallelism: broadcast queries, stream the table).
    emb = Catalog(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return vector.knn_join(emb, queries, k=5)


_RRF_ORACLE = f"""
WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS bm_rank
  FROM ({bm25_mod.bm25_oracle_sql(FUSE_QUERY, k=20)})
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, vec_id) AS vec_rank
  FROM (
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS score
    FROM embeddings, q
    ORDER BY round(score, 9) DESC, vec_id LIMIT 20
  )
)
SELECT coalesce(bm.doc_id, vs.doc_id) AS doc_id,
       coalesce(1.0 / (60 + bm_rank), 0) + coalesce(1.0 / (60 + vec_rank), 0)
         AS rrf_score,
       bm_rank, vec_rank
FROM bm FULL OUTER JOIN vs ON bm.doc_id = vs.doc_id
ORDER BY rrf_score DESC, doc_id
"""


@register("hybrid_rrf", oracle=_RRF_ORACLE)
def hybrid_rrf(spark, sf_dir):
    # Hybrid RRF fusion, k=60, rank 1-indexed (reference search.go:38-58,
    # 165-200): BM25 over documents fused with cosine over embeddings
    # (vec_id ≡ doc_id in the fixtures).
    cat = Catalog(spark, sf_dir)
    idx = bm25_mod.shared_index(cat.documents, sf_dir)
    bm = hybrid.rank_by(idx.search(FUSE_QUERY, k=20), "score", "doc_id")
    vs = hybrid.rank_by(
        vector.cosine_topk(cat.embeddings, _query_vec(spark, sf_dir), k=20)
        .withColumnRenamed("vec_id", "doc_id"),
        "score",
        "doc_id",
    )
    fused = hybrid.rrf_fuse({"bm": bm, "vec": vs}, id_col="doc_id")
    return fused.select(
        "doc_id",
        "rrf_score",
        F.col("bm_rank").cast("long").alias("bm_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
    )


@register(
    "hybrid_rrf_minscore",
    oracle=f"""
    SELECT * FROM ({_RRF_ORACLE})
    WHERE round(rrf_score, 9) >= 0.02
    ORDER BY round(rrf_score, 9) DESC, doc_id
    """,
)
def hybrid_rrf_minscore(spark, sf_dir):
    # SearchOptions.MinRRFScore (search.go:172): fused results below
    # the threshold are dropped. At k=60 a doc present in only ONE
    # 20-deep leg scores ≤ 1/61 ≈ 0.0164, so 0.02 keeps exactly the
    # docs both legs agree on — the knob visibly truncates.
    cat = Catalog(spark, sf_dir)
    idx = bm25_mod.shared_index(cat.documents, sf_dir)
    bm = hybrid.rank_by(idx.search(FUSE_QUERY, k=20), "score", "doc_id")
    vs = hybrid.rank_by(
        vector.cosine_topk(cat.embeddings, _query_vec(spark, sf_dir), k=20)
        .withColumnRenamed("vec_id", "doc_id"),
        "score",
        "doc_id",
    )
    fused = hybrid.rrf_fuse(
        {"bm": bm, "vec": vs}, id_col="doc_id", min_score=0.02
    )
    return fused.select(
        "doc_id",
        "rrf_score",
        F.col("bm_rank").cast("long").alias("bm_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
    )


# Batched hybrid serving: one fixed (query_id, query_text, vec_id)
# batch; qid == vec_id by construction so the vector leg needs no
# mapping join. Each query's fused result must equal the single-query
# hybrid_rrf composition (tested), so the oracle is the single-query
# RRF oracle UNIONed over the batch.
HYBRID_BATCH = (
    (0, FUSE_QUERY, 0),
    (1, "distributed shuffle partition skew", 1),
    (2, "query optimizer statistics", 2),
)


def _rrf_oracle_one(qid: int, qtext: str, vec_id: int) -> str:
    return f"""
    WITH bm AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS bm_rank
      FROM ({bm25_mod.bm25_oracle_sql(qtext, k=20)})
    ),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = {vec_id}),
    vs AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (ORDER BY round(score, 9) DESC, vec_id) AS vec_rank
      FROM (
        SELECT vec_id,
               list_dot_product(CAST(embedding AS DOUBLE[]), qv)
                 / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(qv, qv))) AS score
        FROM embeddings, q
        ORDER BY round(score, 9) DESC, vec_id LIMIT 20
      )
    )
    SELECT CAST({qid} AS BIGINT) AS query_id,
           coalesce(bm.doc_id, vs.doc_id) AS doc_id,
           coalesce(1.0 / (60 + bm_rank), 0) + coalesce(1.0 / (60 + vec_rank), 0)
             AS rrf_score,
           bm_rank, vec_rank
    FROM bm FULL OUTER JOIN vs ON bm.doc_id = vs.doc_id
    """


_RRF_MANY_ORACLE = " UNION ALL ".join(
    f"SELECT * FROM ({_rrf_oracle_one(q, t, v)})" for q, t, v in HYBRID_BATCH
)


@register("hybrid_rrf_many", oracle=_RRF_MANY_ORACLE)
def hybrid_rrf_many(spark, sf_dir):
    # Batched hybrid serving — the reference's user-facing search entry
    # is hybrid RRF (search.go:38-58 fuses vector+BM25 per request);
    # here a whole request batch fuses in ONE plan: the BM25 leg is one
    # semi-join-pruned postings scan (search_many), the vector leg one
    # broadcast-batch corpus scan (cosine_topk_many), fusion one
    # full-outer join on (query, doc). q hybrid requests cost one fused
    # plan instead of q driver round trips; per-query results equal the
    # single-query hybrid_rrf composition (tested).
    cat = Catalog(spark, sf_dir)
    idx = bm25_mod.shared_index(cat.documents, sf_dir)
    qtext = literal_df(spark, 
        [(q, t) for q, t, _ in HYBRID_BATCH],
        "query_id long, query_text string",
    )
    bm = hybrid.rank_by(
        idx.search_many(qtext, k=20), "score", "doc_id",
        partition_by=("query_id",),
    )
    qvec = cat.embeddings.filter(
        F.col("vec_id").isin([v for *_, v in HYBRID_BATCH])
    ).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    vs = hybrid.rank_by(
        vector.cosine_topk_many(cat.embeddings, qvec, k=20)
        .withColumnRenamed("vec_id", "doc_id"),
        "score",
        "doc_id",
        partition_by=("query_id",),
    )
    fused = hybrid.rrf_fuse_many({"bm": bm, "vec": vs}, id_col="doc_id")
    return fused.select(
        "query_id",
        "doc_id",
        "rrf_score",
        F.col("bm_rank").cast("long").alias("bm_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
    )


@register("ann_kmeans_pruned")  # approximate — rows-only; recall in tests
def ann_kmeans_pruned(spark, sf_dir):
    # k-means candidate pruning (reference kmeans_candidate_gen.go).
    emb = Catalog(spark, sf_dir).embeddings
    idx = vector.KMeansPrunedIndex.build(emb, n_clusters=8)
    return idx.search(_query_vec(spark, sf_dir), k=10, n_probe=3)


@register("ann_lsh")  # approximate — rows-only; recall in tests
def ann_lsh(spark, sf_dir):
    # LSH-bucketed ANN (scale path for the reference's HNSW role,
    # hnsw_index.go — candidate generation must be a joinable key at 100 TB).
    emb = Catalog(spark, sf_dir).embeddings
    dim = len(_query_vec(spark, sf_dir))
    idx = vector.RandomHyperplaneLSH.build(dim, n_bits=24, n_bands=8)
    return idx.search(emb, _query_vec(spark, sf_dir), k=10)


@register("ann_hnsw")  # approximate — rows-only; recall gated in tests
def ann_hnsw(spark, sf_dir):
    # distributed HNSW: per-partition shard build on executors + scatter/
    # gather query grid — no driver collect of vectors (reference
    # search/hnsw_index.go; presets hnsw_config.go:37-68).
    from nornicdb_spark.search.hnsw import ShardedHnswIndex

    emb = Catalog(spark, sf_dir).embeddings
    idx = ShardedHnswIndex.build_partitioned(emb, num_shards=4, preset="balanced")
    scope.escape_rdd(idx.shards)  # per-call index: deferred release
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").orderBy(
        "query_id"
    ).limit(25)
    return idx.search_distributed(queries, k=10)


# ---- driver-visible ANN recall gates ---------------------------------------
# ANN results are approximate, so their row sets carry no SQL oracle — but
# the RECALL against the exact scan is checkable (reference pattern:
# hnsw_recall_test.go pins recall thresholds). Each gate emits one row
# (ok=1) iff recall@10 clears the operator's threshold; the DuckDB oracle
# states the expected constant, so a recall regression turns the driver
# row red. Thresholds sit under measured recall with margin (kmeans
# n_probe=3: 0.6-0.7 observed; LSH 24-bit/8-band: 0.9; sharded HNSW: 1.0).

_OK_ORACLE = "SELECT CAST(1 AS BIGINT) AS ok"


def _gate(exact_ids, approx_ids, min_hits: int):
    # single-row (ok) aggregate: |exact ∩ approx| >= min_hits — all
    # DataFrame-side, no driver compare
    return (
        exact_ids.join(approx_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= F.lit(min_hits)).cast("long").alias("ok"))
    )


@register("ann_kmeans_recall", oracle=_OK_ORACLE)
def ann_kmeans_recall(spark, sf_dir):
    # recall@10 of the k-means-pruned index (n_probe=3/8 clusters) vs the
    # exact cosine scan; gate at >= 0.5 (measured 0.6-0.7).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.cosine_topk(emb, qv, k=10).select("vec_id")
    idx = vector.KMeansPrunedIndex.build(emb, n_clusters=8)
    approx = idx.search(qv, k=10, n_probe=3).select("vec_id")
    return _gate(exact, approx, min_hits=5)


@register("ann_lsh_recall", oracle=_OK_ORACLE)
def ann_lsh_recall(spark, sf_dir):
    # recall@10 of hyperplane-LSH (24 bits / 8 bands) vs the exact scan;
    # gate at >= 0.7 (measured 0.9 at sf0.001 and sf0.01).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.cosine_topk(emb, qv, k=10).select("vec_id")
    idx = vector.RandomHyperplaneLSH.build(len(qv), n_bits=24, n_bands=8)
    approx = idx.search(emb, qv, k=10).select("vec_id")
    return _gate(exact, approx, min_hits=7)


@register("ann_hnsw_recall", oracle=_OK_ORACLE)
def ann_hnsw_recall(spark, sf_dir):
    # mean recall@10 of the sharded HNSW over 25 queries vs the exact
    # per-query top-10 (self included, matching search_distributed);
    # gate at >= 0.9 → >= 225 of 250 hits (measured 1.0).
    from pyspark.sql import Window as W

    from nornicdb_spark.search.hnsw import ShardedHnswIndex

    emb = Catalog(spark, sf_dir).embeddings
    idx = ShardedHnswIndex.build_partitioned(emb, num_shards=4, preset="balanced")
    scope.escape_rdd(idx.shards)  # per-call index: deferred release
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").orderBy(
        "query_id"
    ).limit(25)
    approx = idx.search_distributed(queries, k=10).select("query_id", "vec_id")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("_v"))
    q = queries.select(
        "query_id", F.col("embedding").cast("array<double>").alias("_q")
    )
    scored = e.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        vector.cosine_sim(F.col("_v"), F.col("_q")).alias("score"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
    )
    return (
        exact.join(approx, ["query_id", "vec_id"])
        .agg((F.count(F.lit(1)) >= F.lit(225)).cast("long").alias("ok"))
    )


@register("ann_pq")  # approximate — rows-only; recall-gated below
def ann_pq(spark, sf_dir):
    # product-quantization ANN (Jégou et al. 2011): 16 subspaces × 32
    # codes, codegen'd ADC scan over the compressed codes + exact
    # refinement of the top-4k — the 100 TB compression path where the
    # full vectors no longer fit hot storage.
    emb = Catalog(spark, sf_dir).embeddings
    idx = vector.ProductQuantizerIndex.build(emb, m=16, k_codes=32)
    scope.escape_frame(idx.codes)  # per-call index: deferred release
    return idx.search(_query_vec(spark, sf_dir), k=10, refine=4)


@register("ann_ivfpq")  # approximate — rows-only; recall-gated below
def ann_ivfpq(spark, sf_dir):
    # Faiss-style IVFADC (Jégou et al. 2011 §V): coarse k-means lists +
    # residual PQ, probed-list ADC scan, exact refine — the composed
    # 100 TB ANN architecture (the codes table is partitioned by list id,
    # so the probe filter prunes partitions and the codegen'd ADC scan
    # touches only n_probe/n_lists of the compressed data).
    emb = Catalog(spark, sf_dir).embeddings
    idx = vector.IVFPQIndex.build(emb, n_lists=8, m=16, k_codes=32)
    scope.escape_frame(idx.codes)  # per-call index: deferred release
    return idx.search(_query_vec(spark, sf_dir), k=10, n_probe=4, refine=8)


@register("ann_ivfpq_recall", oracle=_OK_ORACLE)
def ann_ivfpq_recall(spark, sf_dir):
    # recall@10 of IVF-PQ (8 lists / probe 4 / 16×32 PQ / refine 8) vs
    # the exact euclidean scan; gate at >= 0.5 (measured 0.6-1.0 across
    # query vectors at sf0.001/sf0.01 — the uniform synthetic embeddings
    # are the IVF worst case, so the coarse probe dominates the loss).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.euclidean_topk(emb, qv, k=10).select("vec_id")
    idx = vector.IVFPQIndex.build(emb, n_lists=8, m=16, k_codes=32)
    scope.escape_frame(idx.codes)  # per-call index: deferred release
    approx = idx.search(qv, k=10, n_probe=4, refine=8).select("vec_id")
    return _gate(exact, approx, min_hits=5)


@register("ann_pq_recall", oracle=_OK_ORACLE)
def ann_pq_recall(spark, sf_dir):
    # recall@10 of PQ+refine-8 vs the exact euclidean scan; gate at
    # >= 0.7 (measured 0.9-1.0 at sf0.001 and sf0.01).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.euclidean_topk(emb, qv, k=10).select("vec_id")
    idx = vector.ProductQuantizerIndex.build(emb, m=16, k_codes=32)
    scope.escape_frame(idx.codes)  # per-call index: deferred release
    approx = idx.search(qv, k=10, refine=8).select("vec_id")
    return _gate(exact, approx, min_hits=7)


@register("ann_int8")  # approximate — rows-only; recall-gated below
def ann_int8(spark, sf_dir):
    # int8-quantized serving scan (search/vector.py Int8Index): the
    # per-vector scale cancels in cosine, so the approximate top-k·refine
    # scans ONLY the int8 codes + integer code norm (4× smaller column,
    # pure codegen'd arithmetic — plan-tested JVM-only), then the full
    # vectors are touched for just the candidates (broadcast semi-join
    # exact refine) — the storage-side quantization of
    # operators/quantize.py made usable in search.
    emb = Catalog(spark, sf_dir).embeddings
    idx = vector.Int8Index.build(emb)  # codes are a lazy plan: no
    # learned state, nothing to checkpoint/escape (unlike PQ/IVF-PQ)
    return idx.search(_query_vec(spark, sf_dir), k=10, refine=4)


@register("ann_int8_recall", oracle=_OK_ORACLE)
def ann_int8_recall(spark, sf_dir):
    # recall@10 of int8-scan + refine-4 vs the exact cosine scan; gate at
    # >= 0.9 — int8 symmetric quantization perturbs cosines by ≲ 1e-2,
    # so the refine window recovers the exact set (measured 1.0 at
    # sf0.001 and sf0.01).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.cosine_topk(emb, qv, k=10).select("vec_id")
    idx = vector.Int8Index.build(emb)
    approx = idx.search(qv, k=10, refine=4).select("vec_id")
    return _gate(exact, approx, min_hits=9)


@register(
    "vector_filtered_topk",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS score
    FROM embeddings JOIN documents ON doc_id = vec_id, q
    WHERE lang = 'en' AND n_chars >= 150
    ORDER BY round(score, 9) DESC, vec_id LIMIT 10
    """,
)
def vector_filtered_topk(spark, sf_dir):
    # attribute-filtered vector search (the payload-filter shape of
    # Qdrant-style APIs the reference serves over gRPC): the predicate
    # prunes BEFORE scoring — at scale the metadata filter cuts the
    # scanned vectors, and with a partitioned corpus it prunes files.
    cat = Catalog(spark, sf_dir)
    allowed = cat.documents.filter(
        (F.col("lang") == "en") & (F.col("n_chars") >= 150)
    ).select(F.col("doc_id").alias("vec_id"))
    src = cat.embeddings.join(allowed, "vec_id", "left_semi")
    return vector.cosine_topk(src, _query_vec(spark, sf_dir), k=10)


ADAPT_QUERY = "merge window"  # 2 words → adaptive weights bm25=1.5, vector=0.5

_ADAPTIVE_ORACLE = f"""
WITH bm AS (
  SELECT doc_id, row_number() OVER (ORDER BY round(score, 9) DESC, doc_id) AS bm_rank
  FROM ({bm25_mod.bm25_oracle_sql(ADAPT_QUERY, k=20)})
),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY round(score, 9) DESC, vec_id) AS vec_rank
  FROM (
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS score
    FROM embeddings, q
    ORDER BY round(score, 9) DESC, vec_id LIMIT 20
  )
)
SELECT coalesce(bm.doc_id, vs.doc_id) AS doc_id,
       coalesce(1.5 / (60 + bm_rank), 0) + coalesce(0.5 / (60 + vec_rank), 0)
         AS rrf_score,
       bm_rank, vec_rank
FROM bm FULL OUTER JOIN vs ON bm.doc_id = vs.doc_id
"""


@register("hybrid_adaptive", oracle=_ADAPTIVE_ORACLE)
def hybrid_adaptive(spark, sf_dir):
    # query-adaptive RRF weights (reference search.go:2043-2104): the
    # 2-word query selects bm25=1.5 / vector=0.5; the weighting is a
    # deterministic function of the query, so the whole adaptive
    # pipeline is oracle-checked.
    cat = Catalog(spark, sf_dir)
    idx = bm25_mod.shared_index(cat.documents, sf_dir)
    w = hybrid.adaptive_rrf_weights(ADAPT_QUERY)
    bm = hybrid.rank_by(idx.search(ADAPT_QUERY, k=20), "score", "doc_id")
    vs = hybrid.rank_by(
        vector.cosine_topk(cat.embeddings, _query_vec(spark, sf_dir), k=20)
        .withColumnRenamed("vec_id", "doc_id"),
        "score",
        "doc_id",
    )
    fused = hybrid.rrf_fuse(
        {"bm": bm, "vec": vs},
        weights={"bm": w["bm25"], "vec": w["vector"]},
        id_col="doc_id",
    )
    return fused.select(
        "doc_id",
        "rrf_score",
        F.col("bm_rank").cast("long").alias("bm_rank"),
        F.col("vec_rank").cast("long").alias("vec_rank"),
    )


_RERANK_ORACLE = f"""
WITH fused AS ({_RRF_ORACLE}),
toks AS (
  SELECT doc_id,
         list_distinct(list_filter(
           string_split_regex(lower(coalesce(text, '')), '[^\\p{{L}}\\p{{N}}]+'),
           x -> length(x) >= 2)) AS dt
  FROM documents
)
SELECT fused.doc_id,
       rrf_score AS bi_score,
       round(CAST(len(list_intersect(dt, ['batch', 'merge', 'window']))
                  AS DOUBLE) / 3.0, 9) AS cross_score,
       round(CAST(len(list_intersect(dt, ['batch', 'merge', 'window']))
                  AS DOUBLE) / 3.0, 9) AS final_score
FROM fused JOIN toks ON toks.doc_id = fused.doc_id
"""


@register("hybrid_rerank", oracle=_RERANK_ORACLE)
def hybrid_rerank(spark, sf_dir):
    # stage-2 rerank of the fused top-K (reference rerank.go): the
    # cross-encoder scorer is an external API there; the batch default
    # is the deterministic lexical-overlap cross score, so the rerank
    # stage itself is oracle-checked end-to-end.
    cat = Catalog(spark, sf_dir)
    fused = hybrid_rrf(spark, sf_dir)
    return hybrid.lexical_rerank(
        fused, cat.documents, FUSE_QUERY, top_k=100
    )


def _mmr_oracle(limit: int = 10, lam: float = 0.7) -> str:
    """Greedy MMR as an unrolled selection chain: the argmax over the
    bounded fused slice is deterministic (selection key = mmr ROUNDED to
    9 decimals so ULP-level arithmetic differences between numpy and
    DuckDB can't reorder near-ties; ties then break relevance desc then
    doc_id, mirroring mmr_diversify's first-wins scan over the sorted
    candidates), so ``limit`` unrolled steps reproduce the greedy loop."""
    steps = []
    for k in range(2, limit + 1):
        steps.append(f"""
    s{k} AS MATERIALIZED (
      SELECT n.doc_id, n.rel,
             {lam!r} * n.rel - {(1.0 - lam)!r} * greatest(0.0, coalesce(
               (SELECT max(sim.s) FROM sim JOIN sel{k - 1} sl
                  ON sim.j = sl.doc_id
                WHERE sim.i = n.doc_id), 0.0)) AS mmr
      FROM norm n WHERE n.doc_id NOT IN (SELECT doc_id FROM sel{k - 1})
    ),
    p{k} AS MATERIALIZED (
      SELECT doc_id, mmr, rel FROM s{k}
      ORDER BY round(mmr, 9) DESC, rel DESC, doc_id LIMIT 1
    ),
    sel{k} AS MATERIALIZED (
      SELECT * FROM sel{k - 1}
      UNION ALL SELECT doc_id, {k} AS rank, mmr FROM p{k}
    )""")
    return f"""
    WITH fused AS MATERIALIZED ({_RRF_ORACLE}),
    cand AS MATERIALIZED (
      SELECT f.doc_id, f.rrf_score AS rel, CAST(e.embedding AS DOUBLE[]) AS v
      FROM fused f LEFT JOIN embeddings e ON e.vec_id = f.doc_id
    ),
    norm AS MATERIALIZED (
      SELECT doc_id, rel,
             CASE WHEN v IS NULL OR sqrt(list_dot_product(v, v)) = 0 THEN NULL
                  ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
             END AS u
      FROM cand
    ),
    sim AS MATERIALIZED (
      SELECT a.doc_id AS i, b.doc_id AS j, list_dot_product(a.u, b.u) AS s
      FROM norm a JOIN norm b
        ON a.doc_id <> b.doc_id AND a.u IS NOT NULL AND b.u IS NOT NULL
    ),
    p1 AS MATERIALIZED (
      SELECT doc_id, {lam!r} * rel AS mmr, rel FROM norm
      ORDER BY round(mmr, 9) DESC, rel DESC, doc_id LIMIT 1
    ),
    sel1 AS MATERIALIZED (SELECT doc_id, 1 AS rank, mmr FROM p1),
    {','.join(steps)}
    SELECT doc_id, CAST(rank AS INT) AS mmr_rank, round(mmr, 9) AS mmr_score
    FROM sel{limit}
    """


@register("hybrid_mmr", oracle=_mmr_oracle())
def hybrid_mmr(spark, sf_dir):
    # MMR diversification of the fused list (reference search.go:
    # 1510-1608): λ·relevance − (1−λ)·max-cosine-to-selected, greedy
    # over the bounded top list as one Arrow batch. Oracle = the greedy
    # argmax chain unrolled (10 steps over the ≤40-row slice).
    cat = Catalog(spark, sf_dir)
    fused = hybrid_rrf(spark, sf_dir)
    out = hybrid.mmr_diversify(
        fused, cat.embeddings, limit=10, mmr_lambda=0.7
    )
    return out.select(
        "doc_id", "mmr_rank", F.round("mmr_score", 9).alias("mmr_score")
    )


@register(
    "bm25_weighted",
    oracle=bm25_mod.bm25_weighted_oracle_sql(
        BM25_QUERY, {"text": 1.0, "source": 3.0}, k=10
    ),
)
def bm25_weighted(spark, sf_dir):
    # priority-property field weighting (reference search.go:96-110
    # SearchableProperties): simple BM25F — weighted tf and doc length,
    # idf over any-field matches; the source field carries 3× weight.
    docs = Catalog(spark, sf_dir).documents
    idx = bm25_mod.BM25Index.build_weighted(
        docs, {"text": 1.0, "source": 3.0}
    )
    scope.escape_frame(idx.postings)  # per-call index: deferred release
    out = idx.search(BM25_QUERY, k=10)
    return out.select("doc_id", F.round("score", 9).alias("score"))


_IVF_SERVE_MEMO = scope.SessionMemo()


def _maintained_ivf_index(spark, sf_dir):
    # the maintained IVF+int8 serving index (streaming/ivf.py — live
    # vector-DB ingest, reference vector_index.go Add semantics):
    # centroids trained on the seed third of the corpus, the other two
    # thirds ingested as later batches against the frozen centroids.
    # Memoized per (session, sf_dir) — the rows-only query and its
    # recall gate twin share one KMeans fit + ingest (the bm25
    # shared_index discipline); the build is deterministic, so the memo
    # changes cost, not results. SessionMemo evicts stopped sessions'
    # entries, so the memo pins neither dead sessions nor their frames.
    hit = _IVF_SERVE_MEMO.get(spark, sf_dir)
    if hit is not None:
        return hit
    import shutil

    from nornicdb_spark.streaming.ivf import MaintainedIVFIndex

    emb = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/ivfserve_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedIVFIndex(spark, path)
    idx.bootstrap(emb.filter(F.col("vec_id") % 3 == 0), n_lists=8)
    for b in (1, 2):
        idx.process_batch(emb.filter(F.col("vec_id") % 3 == b), batch_id=b)
    return _IVF_SERVE_MEMO.put(spark, sf_dir, (idx, emb))


@register("stream_ann_ivf_int8")  # approximate — rows-only; recall twin below
def stream_ann_ivf_int8(spark, sf_dir):
    # top-10 over the maintained serving index: pruned int8 list scan +
    # fp32 refine. KMeans assignment makes the candidate set seed-/
    # implementation-dependent → no row-set oracle; the driver gate is
    # stream_ann_ivf_int8_recall.
    idx, emb = _maintained_ivf_index(spark, sf_dir)
    return idx.search(_query_vec(spark, sf_dir), refine_src=emb, k=10, n_probe=3)


@register("stream_ann_ivf_int8_recall", oracle=_OK_ORACLE)
def stream_ann_ivf_int8_recall(spark, sf_dir):
    # recall@10 of the maintained (3-batch-ingested) serving index vs the
    # exact cosine scan — same gate bar as ann_kmeans_recall (n_probe=3
    # of 8 lists; the int8+refine step adds no loss per ann_int8_recall).
    idx, emb = _maintained_ivf_index(spark, sf_dir)
    qv = _query_vec(spark, sf_dir)
    exact = vector.cosine_topk(emb, qv, k=10).select("vec_id")
    approx = idx.search(qv, refine_src=emb, k=10, n_probe=3).select("vec_id")
    return _gate(exact, approx, min_hits=5)


def _ivf_query_batch(spark, sf_dir, emb):
    # three corpus vectors as a deterministic serving batch
    rows = (
        emb.filter(F.col("vec_id").isin(0, 1, 2))
        .orderBy("vec_id")
        .collect()
    )
    return [(int(r.vec_id) + 100, [float(x) for x in r.embedding]) for r in rows]


@register("stream_ann_ivf_multi")  # approximate — rows-only; gate below
def stream_ann_ivf_multi(spark, sf_dir):
    # batched serving over the maintained index: one list-pruned int8
    # scan covers the whole query batch (union of probed lists), then a
    # per-query window + one keyed fp32 refine. KMeans assignment makes
    # the candidate set seed-dependent → no row-set oracle; the
    # equality gate twin below is the driver check.
    idx, emb = _maintained_ivf_index(spark, sf_dir)
    qdf = literal_df(spark, 
        _ivf_query_batch(spark, sf_dir, emb),
        "query_id bigint, qvec array<double>",
    )
    out = idx.search_many(qdf, refine_src=emb, k=10, n_probe=3)
    return out.select(
        "query_id", "vec_id", F.round("score", 9).alias("score")
    )


@register("stream_ann_ivf_multi_gate", oracle=_OK_ORACLE)
def stream_ann_ivf_multi_gate(spark, sf_dir):
    # the batched path must EQUAL the per-query single path row-for-row
    # (ids and 9-digit-rounded scores) — probing, int8 scoring, and
    # refine are the same arithmetic, so this is full equality, not a
    # recall bar: ok=1 iff the symmetric difference is empty.
    idx, emb = _maintained_ivf_index(spark, sf_dir)
    batch = _ivf_query_batch(spark, sf_dir, emb)
    qdf = literal_df(spark, batch, "query_id bigint, qvec array<double>")
    cols = ["query_id", "vec_id", "s"]
    batched = idx.search_many(qdf, refine_src=emb, k=10, n_probe=3).select(
        "query_id", "vec_id", F.round("score", 9).alias("s")
    )
    singles = None
    for qid, qv in batch:
        one = idx.search(qv, refine_src=emb, k=10, n_probe=3).select(
            F.lit(qid).cast("bigint").alias("query_id"),
            "vec_id",
            F.round("score", 9).alias("s"),
        )
        singles = one if singles is None else singles.unionByName(one)
    diff = batched.join(singles, cols, "left_anti").unionByName(
        singles.join(batched, cols, "left_anti")
    )
    return diff.agg((F.count(F.lit(1)) == 0).cast("long").alias("ok"))


# -- batched hybrid over the LIVE indexes ------------------------------------
# the reference's user-facing entry (search.go:38-58) fused per request
# over its live in-memory indexes; this is that shape at serving-batch
# scale: one tk-pruned postings scan + one list-pruned int8 scan serve
# the whole batch, fused in one plan. Query texts pair with query
# vectors by qid (vec_id = qid - 1); qid 4's text is all stopwords, so
# its BM25 leg is empty and the fusion must carry the vector leg alone
# through the full-outer join — the degenerate-leg edge, exercised on
# both the batched and single paths.
def _hybrid_serve_batch(spark, sf_dir, emb):
    texts = {1: BM25_QUERY, 2: "distributed shuffle partition skew",
             3: "query query optimizer", 4: "a of the"}
    rows = (
        emb.filter(F.col("vec_id").isin(0, 1, 2, 3)).orderBy("vec_id").collect()
    )
    return [
        (int(r.vec_id) + 1, texts[int(r.vec_id) + 1],
         [float(x) for x in r.embedding])
        for r in rows
    ]


def _hybrid_fused_key_cols(fused):
    # null ranks (doc absent from one leg) break anti-join equality —
    # coalesce to a sentinel for the symmetric-difference compare
    return fused.select(
        "query_id",
        "doc_id",
        F.round("rrf_score", 9).alias("s"),
        F.coalesce(F.col("bm_rank").cast("long"), F.lit(-1)).alias("bm_rank"),
        F.coalesce(F.col("vec_rank").cast("long"), F.lit(-1)).alias("vec_rank"),
    )


@register("stream_hybrid_rrf_many")  # approximate legs — rows-only; gate below
def stream_hybrid_rrf_many(spark, sf_dir):
    # batched hybrid RRF over BOTH maintained indexes: the live BM25
    # postings (one tk-pruned scan for the batch) fused with the live
    # IVF int8 serving index (one union-of-probed-lists scan). The IVF
    # leg's KMeans assignment is seed-dependent → no row-set oracle;
    # the equality gate twin is the driver check.
    ft = _maintained_ft_index(spark, sf_dir)
    ivf, emb = _maintained_ivf_index(spark, sf_dir)
    batch = _hybrid_serve_batch(spark, sf_dir, emb)
    qtext = literal_df(spark, 
        [(q, t) for q, t, _ in batch], "query_id long, query_text string"
    )
    qvec = literal_df(spark, 
        [(q, v) for q, _, v in batch], "query_id bigint, qvec array<double>"
    )
    bm = hybrid.rank_by(
        ft.search_many(qtext, k=20), "score", "doc_id",
        partition_by=("query_id",),
    )
    vs = hybrid.rank_by(
        ivf.search_many(qvec, refine_src=emb, k=20, n_probe=3)
        .withColumnRenamed("vec_id", "doc_id"),
        "score",
        "doc_id",
        partition_by=("query_id",),
    )
    fused = hybrid.rrf_fuse_many({"bm": bm, "vec": vs}, id_col="doc_id")
    return _hybrid_fused_key_cols(fused)


@register("stream_hybrid_rrf_many_gate", oracle=_OK_ORACLE)
def stream_hybrid_rrf_many_gate(spark, sf_dir):
    # the batched hybrid must EQUAL, per query, the single-query
    # composition over the SAME live indexes (search + search, rank_by,
    # rrf_fuse) — ids, both leg ranks, and 9-digit-rounded fused scores;
    # full row-set equality (empty symmetric difference), not a recall
    # bar.
    ft = _maintained_ft_index(spark, sf_dir)
    ivf, emb = _maintained_ivf_index(spark, sf_dir)
    batch = _hybrid_serve_batch(spark, sf_dir, emb)
    batched = stream_hybrid_rrf_many(spark, sf_dir)  # already key-cols
    singles = None
    for qid, qtext, qv in batch:
        bm = hybrid.rank_by(ft.search(qtext, k=20), "score", "doc_id")
        vs = hybrid.rank_by(
            ivf.search(qv, refine_src=emb, k=20, n_probe=3)
            .withColumnRenamed("vec_id", "doc_id"),
            "score",
            "doc_id",
        )
        one = _hybrid_fused_key_cols(
            hybrid.rrf_fuse({"bm": bm, "vec": vs}, id_col="doc_id")
            .withColumn("query_id", F.lit(qid).cast("long"))
        )
        singles = one if singles is None else singles.unionByName(one)
    cols = ["query_id", "doc_id", "s", "bm_rank", "vec_rank"]
    diff = batched.join(singles, cols, "left_anti").unionByName(
        singles.join(batched, cols, "left_anti")
    )
    return diff.agg((F.count(F.lit(1)) == 0).cast("long").alias("ok"))


_COSINE_MANY_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))) AS score
  FROM embeddings e, q
)
SELECT query_id, vec_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY round(score, 9) DESC, vec_id) AS rn
  FROM scored) WHERE rn <= 10
"""


@register(
    "bm25_phrase_search",
    oracle=bm25_mod.phrase_oracle_sql("merge batch", 10),
)
def bm25_phrase_search(spark, sf_dir):
    # exact-phrase search (reference fulltext_index.go PhraseSearch):
    # contains + earliest-occurrence score 1/(1+idx/100), top-10 with a
    # doc_id tie-break (the reference's sort.Slice leaves equal scores
    # unordered — determinism delta documented in phrase_search)
    docs = Catalog(spark, sf_dir).documents
    return bm25_mod.phrase_search(docs, "merge batch", limit=10)


@register("vector_multi_query", oracle=_COSINE_MANY_ORACLE)
def vector_multi_query(spark, sf_dir):
    # batched exact vector serving (cosine_topk_many): q queries cost
    # ONE broadcast-batch pass over the corpus + a per-query window
    # top-k — the exact-leg counterpart of bm25_multi_query (unlike
    # vector_knn_join there is no self-exclusion: this is the SEARCH
    # path, per-query equal to vector_cosine_topk).
    emb = Catalog(spark, sf_dir).embeddings
    qdf = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").cast("bigint").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    return vector.cosine_topk_many(emb, qdf, k=10)


# -- live-index removal -------------------------------------------------------
REMOVED_DOC_IDS = (0, 3, 7, 11, 400)

_FT_RM_MEMO = scope.SessionMemo()


def _maintained_ft_index_with_removals(spark, sf_dir):
    # a SEPARATE index path from _maintained_ft_index (that one's rows
    # assert maintained == full static corpus): 3 ingest batches, then
    # one removal batch tombstoning REMOVED_DOC_IDS
    hit = _FT_RM_MEMO.get(spark, sf_dir)
    if hit is not None:
        return hit
    import shutil

    from nornicdb_spark.streaming.fulltext import MaintainedBM25Index

    docs = Catalog(spark, sf_dir).documents
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/ftrm_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedBM25Index(spark, path)
    for b in range(3):
        idx.process_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=b)
    idx.remove_batch(
        literal_df(spark, 
            [(i,) for i in REMOVED_DOC_IDS], "doc_id long"
        ),
        batch_id=3,
    )
    return _FT_RM_MEMO.put(spark, sf_dir, idx)


@register(
    "stream_bm25_remove",
    oracle=bm25_mod.bm25_oracle_sql(
        BM25_QUERY,
        k=10,
        doc_filter=f"doc_id NOT IN {REMOVED_DOC_IDS}",
    ),
)
def stream_bm25_remove(spark, sf_dir):
    # live-index document removal (reference fulltext_index.go Remove):
    # after tombstoning a subset, the maintained search equals a STATIC
    # index built on the remaining corpus — df, tf, N, avgdl all shift
    # exactly (tombstone anti-join + negative stats rows), so the
    # oracle is the BM25 oracle over `documents WHERE doc_id NOT IN …`.
    idx = _maintained_ft_index_with_removals(spark, sf_dir)
    return idx.search(BM25_QUERY, k=10)


@register("stream_ann_ivf_remove_gate", oracle=_OK_ORACLE)
def stream_ann_ivf_remove_gate(spark, sf_dir):
    # vector removal on the live serving index: searching after
    # tombstoning a subset must EQUAL an index that never ingested
    # those vectors (same frozen centroids ⇒ identical remaining
    # codes) — full row-set equality, ok=1 iff the symmetric
    # difference is empty.
    import shutil

    from nornicdb_spark.streaming.ivf import MaintainedIVFIndex

    emb = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    removed = [1, 5, 9, 13]
    qv = _query_vec(spark, sf_dir)
    remaining = emb.filter(~F.col("vec_id").isin(removed))
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")

    idx = MaintainedIVFIndex(spark, f"/root/repo/.tmp/ivfrm_{tag}")
    shutil.rmtree(idx.path, ignore_errors=True)
    idx.bootstrap(seed, n_lists=8)
    idx.process_batch(emb.filter(F.col("vec_id") % 2 == 1), batch_id=0)
    idx.remove_batch(
        literal_df(spark, [(i,) for i in removed], "vec_id long"),
        batch_id=1,
    )
    ref = MaintainedIVFIndex(spark, f"/root/repo/.tmp/ivfrmref_{tag}")
    shutil.rmtree(ref.path, ignore_errors=True)
    ref.bootstrap(seed, n_lists=8)
    ref.process_batch(
        emb.filter(
            (F.col("vec_id") % 2 == 1) & ~F.col("vec_id").isin(removed)
        ),
        batch_id=0,
    )
    cols = ["vec_id", "s"]
    got = idx.search(qv, refine_src=remaining, k=10, n_probe=3).select(
        "vec_id", F.round("score", 9).alias("s")
    )
    want = ref.search(qv, refine_src=remaining, k=10, n_probe=3).select(
        "vec_id", F.round("score", 9).alias("s")
    )
    diff = got.join(want, cols, "left_anti").unionByName(
        want.join(got, cols, "left_anti")
    )
    return diff.agg((F.count(F.lit(1)) == 0).cast("long").alias("ok"))


@register("ann_rp_refine")  # approximate — rows-only; recall-gated below
def ann_rp_refine(spark, sf_dir):
    # JL-projection coarse filter (16-dim codegen scan, sign matrix as
    # plan literals) + exact full-width refine over the top-200
    # candidates — the index-free ANN scale path: stage 1's bandwidth is
    # the projection ratio (4x) cheaper than the brute scan and nothing
    # is built or goes stale.
    emb = Catalog(spark, sf_dir).embeddings
    return vector.rp_refine_topk(
        emb, _query_vec(spark, sf_dir), k=10, coarse=200
    ).select("vec_id", F.round("score", 9).alias("score"))


@register("ann_rp_refine_recall", oracle=_OK_ORACLE)
def ann_rp_refine_recall(spark, sf_dir):
    # recall@10 of the RP-coarse + exact-refine pipeline vs the exact
    # cosine scan; gate at >= 0.5 (measured 0.7-1.0 over 5 query
    # vectors at sf0.01 with coarse=200, 1.0 at sf1 — the kmeans gate's
    # bar).
    emb = Catalog(spark, sf_dir).embeddings
    qv = _query_vec(spark, sf_dir)
    exact = vector.cosine_topk(emb, qv, k=10).select("vec_id")
    approx = vector.rp_refine_topk(emb, qv, k=10, coarse=200).select("vec_id")
    return _gate(exact, approx, min_hits=5)


@register("ann_rp_refine_multi")  # approximate — rows-only; equality-gated below
def ann_rp_refine_multi(spark, sf_dir):
    # batched RP-refine serving: a 3-query table against ONE projected
    # corpus scan (per-query window coarse top-200, full-width refine)
    emb = Catalog(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id").isin(0, 7, 42)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return vector.rp_refine_topk_many(emb, q, k=10, coarse=200).select(
        "query_id", "vec_id", F.round("score", 9).alias("score")
    )


@register("ann_rp_refine_multi_gate", oracle=_OK_ORACLE)
def ann_rp_refine_multi_gate(spark, sf_dir):
    # FULL per-query equality of the batched path vs the audited
    # single-query rp_refine_topk (same coarse=200): identical
    # (query_id, vec_id, rounded score) row sets — the serving-family
    # bar (strictly stronger than a recall gate).
    emb = Catalog(spark, sf_dir).embeddings
    qids = [0, 7, 42]
    q = emb.filter(F.col("vec_id").isin(*qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    batch = vector.rp_refine_topk_many(emb, q, k=10, coarse=200).select(
        "query_id", "vec_id", F.round("score", 9).alias("s")
    )
    singles = None
    for qid in qids:
        qv = _query_vec(spark, sf_dir, vec_id=qid)
        s = vector.rp_refine_topk(emb, qv, k=10, coarse=200).select(
            F.lit(qid).cast("long").alias("query_id"),
            "vec_id",
            F.round("score", 9).alias("s"),
        )
        singles = s if singles is None else singles.unionByName(s)
    joined = batch.join(singles, ["query_id", "vec_id", "s"])
    return (
        batch.agg(F.count(F.lit(1)).alias("nb"))
        .crossJoin(singles.agg(F.count(F.lit(1)).alias("ns")))
        .crossJoin(joined.agg(F.count(F.lit(1)).alias("nj")))
        .select(
            (
                (F.col("nb") == F.col("ns"))
                & (F.col("ns") == F.col("nj"))
                & (F.col("nj") == F.lit(len(qids) * 10))
            )
            .cast("long")
            .alias("ok")
        )
    )
