"""Server-side query-embedder hook (reference QueryEmbedder interface,
executor.go:259-263, 309-323): db.index.vector.queryNodes accepts a STRING
query and embeds it server-side before the similarity scan.

The reference delegates to an external embedding service; this container
has none, so the in-tree implementation is a deterministic hashed n-gram
featurizer — a real (if simple) text embedder, not a stub: same text →
same vector, cosine-meaningful overlap for shared character n-grams. Any
callable ``str -> list[float]`` can be installed instead via
``set_query_embedder``.
"""

from __future__ import annotations

import hashlib
import math


class HashingEmbedder:
    """Character-trigram hashing embedder (feature-hashing / 'hashing
    trick'): each trigram hashes to a dimension and a sign; the vector is
    L2-normalized. Deterministic across processes."""

    def __init__(self, dim: int = 64, n: int = 3):
        self.dim = dim
        self.n = n

    def __call__(self, text: str) -> list[float]:
        v = [0.0] * self.dim
        t = f"  {text.lower().strip()}  "
        for i in range(len(t) - self.n + 1):
            g = t[i:i + self.n]
            h = int.from_bytes(
                hashlib.md5(g.encode()).digest()[:8], "big"
            )
            sign = 1.0 if (h >> 8) & 1 else -1.0
            v[h % self.dim] += sign
        norm = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / norm for x in v]


def set_query_embedder(catalog, embedder) -> None:
    """Install ``embedder`` (callable str -> list[float]) on a catalog —
    the batch analogue of configuring the server's embedding service."""
    catalog._query_embedder = embedder


def get_query_embedder(catalog):
    return getattr(catalog, "_query_embedder", None)
