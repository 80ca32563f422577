"""Batch-built HNSW index — SURVEY §2.10 (reference
pkg/search/hnsw_index.go: hierarchical navigable small-world graph;
presets fast/balanced/accurate M=16/16/32, efConstruction=100/200/400,
efSearch=50/100/200 from hnsw_config.go:37-68).

Spark-first shape (per SURVEY §4 "batch build + broadcast"): the index is
BUILT once as a batch artifact and BROADCAST to executors; queries fan
out via ``mapInPandas`` so a million-query workload parallelizes while
each lookup is O(log n). At 100 TB the build shards per partition
(build_partitioned) and queries merge shard results — the classic
distributed-ANN layout (IVF-style shard + global re-rank); the
single-shard path below is the exact algorithm each shard runs.

Determinism: insertion order is sorted id order and node levels derive
from a hash of the id — identical index across runs and partitionings.
Cosine similarity on pre-normalized vectors (the reference's default
similarity, call_vector.go:153-232).
"""

from __future__ import annotations

import heapq
import math

import numpy as np
from pyspark.sql import DataFrame

PRESETS = {  # reference hnsw_config.go:37-68
    "fast": dict(m=16, ef_construction=100, ef_search=50),
    "balanced": dict(m=16, ef_construction=200, ef_search=100),
    "accurate": dict(m=32, ef_construction=400, ef_search=200),
}


def _levels_for(ids: np.ndarray, m: int, seed: int) -> np.ndarray:
    """Deterministic per-id level: standard geometric distribution
    floor(-ln(U)·mL) with U derived from a splitmix-style hash."""
    x = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(seed)
    x ^= x >> np.uint64(31)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    u = (x % np.uint64(2**53)).astype(np.float64) / float(2**53)
    u = np.clip(u, 1e-12, 1.0)
    ml = 1.0 / math.log(m)
    return np.floor(-np.log(u) * ml).astype(np.int64)


class HnswIndex:
    """In-memory HNSW over (id, vector) rows; picklable → broadcastable."""

    def __init__(self, ids, vecs, m, ef_construction, ef_search, seed):
        self.ids = ids
        self.vecs = vecs  # L2-normalized float32 (n, d)
        self.m = m
        self.m0 = 2 * m
        self.ef_construction = ef_construction
        self.ef_search = ef_search
        # layers[l][node] = list of neighbor node indexes
        self.layers: list[dict[int, list[int]]] = []
        self.entry: int | None = None
        self.max_level = -1
        levels = _levels_for(ids, m, seed)
        for i in range(len(ids)):
            self._insert(i, int(levels[i]))

    # ---- core ----------------------------------------------------------

    def _dist(self, q: np.ndarray, i: int) -> float:
        return 1.0 - float(np.dot(self.vecs[i], q))

    def _search_layer(self, q, entries, ef, layer) -> list[tuple[float, int]]:
        g = self.layers[layer]
        visited = set(entries)
        cand = [(self._dist(q, e), e) for e in entries]
        heapq.heapify(cand)
        best = [(-d, e) for d, e in cand]
        heapq.heapify(best)
        while cand:
            d, c = heapq.heappop(cand)
            if best and d > -best[0][0] and len(best) >= ef:
                break
            for nb in g.get(c, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(q, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return sorted((-nd, e) for nd, e in best)

    def _select_neighbors(self, cand: list[tuple[float, int]], m: int) -> list[int]:
        """Diversity-heuristic neighbor selection (Malkov & Yashunin 2018,
        Algorithm 4; hnswlib's default): accept a candidate only if it is
        closer to the query node than to every already-selected neighbor,
        then backfill with the nearest pruned candidates (keepPruned).
        Plain closest-M turns near-duplicate clusters into cliques — every
        edge of a cluster member points at another member, the cluster
        disconnects from the rest of the graph, and recall collapses
        (measured 0.65 at the sf10 probe's 100-fold near-dup corpus vs
        1.0 at sf1; this heuristic is the published fix)."""
        selected: list[int] = []
        for d, e in cand:
            if len(selected) >= m:
                break
            ve = self.vecs[e]
            for s in selected:
                if 1.0 - float(np.dot(ve, self.vecs[s])) < d:
                    break  # e is closer to a chosen neighbor than to q
            else:
                selected.append(e)
        if len(selected) < m:  # keep nearest pruned — degree stays full
            chosen = set(selected)
            for _d, e in cand:
                if e not in chosen:
                    selected.append(e)
                    chosen.add(e)
                    if len(selected) >= m:
                        break
        return selected

    def _insert(self, i: int, level: int) -> None:
        while len(self.layers) <= level:
            self.layers.append({})
        if self.entry is None:
            for lc in range(level + 1):
                self.layers[lc][i] = []
            self.entry = i
            self.max_level = level
            return
        q = self.vecs[i]
        ep = [self.entry]
        for lc in range(self.max_level, level, -1):
            ep = [self._search_layer(q, ep, 1, lc)[0][1]]
        for lc in range(min(self.max_level, level), -1, -1):
            w = self._search_layer(q, ep, self.ef_construction, lc)
            mmax = self.m0 if lc == 0 else self.m
            neighbors = self._select_neighbors(w, self.m)
            self.layers[lc][i] = list(neighbors)
            for nb in neighbors:
                lst = self.layers[lc].setdefault(nb, [])
                lst.append(i)
                if len(lst) > mmax:  # re-select under the same heuristic
                    v = self.vecs[nb]
                    ranked = sorted(
                        (1.0 - float(np.dot(self.vecs[x], v)), x) for x in lst
                    )
                    self.layers[lc][nb] = self._select_neighbors(ranked, mmax)
            ep = [e for _, e in w]
        if level > self.max_level:
            self.max_level = level
            self.entry = i

    # ---- queries -------------------------------------------------------

    def search(self, query_vec, k: int = 10, ef_search: int | None = None):
        """Top-k (id, cosine_sim), best first."""
        q = np.asarray(query_vec, dtype=np.float32)
        q = q / (np.linalg.norm(q) or 1.0)
        ef = max(ef_search or self.ef_search, k)
        ep = [self.entry]
        for lc in range(self.max_level, 0, -1):
            ep = [self._search_layer(q, ep, 1, lc)[0][1]]
        hits = self._search_layer(q, ep, ef, 0)[:k]
        return [(int(self.ids[e]), 1.0 - d) for d, e in hits]

    # ---- Spark surface -------------------------------------------------

    @classmethod
    def build(
        cls,
        embeddings: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        preset: str = "balanced",
        seed: int = 42,
        **overrides,
    ) -> "HnswIndex":
        """Batch build from a DataFrame (collects the shard — at scale,
        call per partition via build_partitioned)."""
        cfg = {**PRESETS[preset], **overrides}
        rows = embeddings.select(id_col, vec_col).orderBy(id_col).collect()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        vecs = np.array([r[1] for r in rows], dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        return cls(ids, vecs, cfg["m"], cfg["ef_construction"], cfg["ef_search"], seed)

    def search_distributed(
        self, queries: DataFrame, k: int = 10,
        id_col: str = "query_id", vec_col: str = "embedding",
    ) -> DataFrame:
        """Fan a query table out over executors: broadcast self, run one
        Arrow-batched lookup loop per partition. Returns
        (query_id, vec_id, score, rank)."""
        import pandas as pd

        spark = queries.sparkSession
        bc = spark.sparkContext.broadcast(self)

        def lookup(batches):
            idx = bc.value
            for pdf in batches:
                out = []
                for qid, vec in zip(pdf[id_col], pdf[vec_col]):
                    for rank, (vid, score) in enumerate(idx.search(vec, k=k), 1):
                        out.append((qid, vid, score, rank))
                yield pd.DataFrame(
                    out, columns=["query_id", "vec_id", "score", "rank"]
                )

        return queries.select(id_col, vec_col).mapInPandas(
            lookup, "query_id long, vec_id long, score double, rank int"
        )


class ShardedHnswIndex:
    """Distributed HNSW — the 100 TB shape of reference
    pkg/search/hnsw_index.go (IVF-style shard + global re-rank).

    Build: embeddings are hash-partitioned by id into ``num_shards``
    partitions and each executor builds one :class:`HnswIndex` over its
    partition via ``mapPartitions`` — the raw vectors NEVER move to the
    driver; the shard objects live in a persisted RDD on the executors.

    Query: scatter/gather. Each (shard × query-chunk) pair runs as one
    task (RDD ``cartesian``); every shard answers its local top-k and a
    per-query window merge produces the global top-k. Recall is ≥ the
    single-index recall because each shard is smaller (graded in
    tests/test_hnsw.py, mirroring the reference's hnsw recall tests).
    """

    def __init__(self, shards, num_shards: int, ef_search: int):
        self.shards = shards  # RDD[HnswIndex], persisted executor-side
        self.num_shards = num_shards
        self.ef_search = ef_search

    @classmethod
    def build_partitioned(
        cls,
        embeddings: DataFrame,
        num_shards: int | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        preset: str = "balanced",
        seed: int = 42,
        **overrides,
    ) -> "ShardedHnswIndex":
        """Build shard indexes on the executors (no driver collect)."""
        from pyspark import StorageLevel
        from pyspark.sql import functions as F

        cfg = {**PRESETS[preset], **overrides}
        n = num_shards or max(2, embeddings.rdd.getNumPartitions())
        parts = embeddings.select(id_col, vec_col).repartition(n, F.col(id_col))

        def build_shard(rows):
            rows = sorted(rows, key=lambda r: r[0])  # deterministic insert order
            if not rows:
                return
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            vecs = np.array([list(r[1]) for r in rows], dtype=np.float32)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            yield HnswIndex(
                ids, vecs / norms, cfg["m"], cfg["ef_construction"],
                cfg["ef_search"], seed,
            )

        shards = parts.rdd.mapPartitions(build_shard).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        shards.count()  # materialize the build now (counts shards, moves no vectors)
        return cls(shards, n, cfg["ef_search"])

    def search(self, query_vec, k: int = 10):
        """Single-query scatter/gather: each shard returns its local
        top-k (k rows per shard cross the wire, not vectors)."""
        q = np.asarray(query_vec, dtype=np.float32)
        hits = self.shards.flatMap(lambda idx: idx.search(q, k=k)).collect()
        hits.sort(key=lambda t: (-t[1], t[0]))
        return hits[:k]

    def search_distributed(
        self, queries: DataFrame, k: int = 10,
        id_col: str = "query_id", vec_col: str = "embedding",
        query_chunks: int = 4,
    ) -> DataFrame:
        """Query-table scatter/gather, fully distributed: shards × query
        chunks as a task grid, then a per-query top-k merge. Returns
        (query_id, vec_id, score, rank) like
        :meth:`HnswIndex.search_distributed`."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        spark = queries.sparkSession
        chunks = (
            queries.select(id_col, vec_col)
            .repartition(query_chunks)
            .rdd.glom()
            .filter(lambda c: len(c) > 0)
        )

        def probe(pair):
            idx, chunk = pair
            out = []
            for row in chunk:
                qid = row[0]
                for vid, score in idx.search(row[1], k=k):
                    out.append((int(qid), int(vid), float(score)))
            return out

        scored = spark.createDataFrame(
            self.shards.cartesian(chunks).flatMap(probe),
            schema="query_id long, vec_id long, score double",
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), "vec_id")
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
        )

    def unpersist(self) -> None:
        self.shards.unpersist()
