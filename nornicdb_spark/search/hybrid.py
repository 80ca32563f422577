"""Hybrid search: Reciprocal Rank Fusion of ranked result lists.

Reference: RRF_score = Σ weight / (k + rank), k=60, rank 1-indexed
(pkg/search/search.go:38-58; fusion at 165-200). The reference fuses
in-process sorted slices; here each ranked list is a DataFrame and the
fusion is a full-outer join + sum — rank assignment is a window
``row_number`` (exactly the capability SURVEY §2.11 notes the reference
lacks as a generic operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

RRF_K = 60


def rank_by(
    df: DataFrame,
    score_col: str,
    id_col: str,
    ascending: bool = False,
    partition_by: tuple[str, ...] = (),
) -> DataFrame:
    """Attach a deterministic 1-indexed ``rank`` (ties broken by id).

    ``partition_by``: rank within each key group (e.g. a query id for
    batched multi-query search) — the scalable path, one shuffle keyed by
    the partition columns. Without it, ranking is GLOBAL: the caller's
    contract is a bounded top-k list (every in-tree caller LIMITs
    upstream); the constant partition key makes the single-partition
    execution explicit rather than an accidental WindowExec fallback."""
    order = [
        F.asc(score_col) if ascending else F.desc(score_col),
        F.asc(id_col),
    ]
    if partition_by:
        spec = W.partitionBy(*partition_by)
    else:
        # single-bucket hash of the id: semantically one partition, but an
        # explicit partition spec (a plain lit folds back to the
        # unpartitioned-window fallback WindowExec warns about)
        spec = W.partitionBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(1)))
    return df.withColumn("rank", F.row_number().over(spec.orderBy(*order)))


def rrf_fuse(
    ranked: dict[str, DataFrame],
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    k: int = RRF_K,
    limit: int | None = None,
) -> DataFrame:
    """Fuse named ranked lists (each with ``id_col`` + ``rank``).

    Returns (id_col, rrf_score, <name>_rank …) ordered by score desc.
    Missing entries contribute 0 (document absent from that ranking).
    """
    weights = weights or {}
    fused = None
    for name, df in ranked.items():
        part = df.select(
            F.col(id_col), F.col("rank").alias(f"{name}_rank")
        )
        fused = part if fused is None else fused.join(part, id_col, "full_outer")

    score = None
    for name in ranked:
        w = float(weights.get(name, 1.0))
        term = F.when(
            F.col(f"{name}_rank").isNotNull(),
            F.lit(w) / (F.lit(k) + F.col(f"{name}_rank")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term

    out = fused.withColumn("rrf_score", score).orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return out.limit(limit) if limit else out
