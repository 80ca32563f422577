"""Skew-breaking rewrites that keep EXACT results — the tools for the
hot-key cases AQE cannot fix. AQE's skew handling splits oversized
sort-merge-join partitions; it cannot split ONE group of a groupBy, so
``count(DISTINCT user) BY key`` with a key holding 30% of a 100 TB
table still funnels that key's whole distinct set through one reducer.
The rewrites here shard such a key deterministically by a hash of the
VALUE (never rand() — results must be reproducible and replay-stable),
aggregate per shard, then combine — algebraically identical output,
per-reducer width cut by n_salt.

Both operators are exact (plain-SQL oracles, not gates). Reference
scope: the reference is single-node (no shuffle to skew) — this is
Spark-native scale infrastructure, SURVEY §2.13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salt: int = 32,
) -> DataFrame:
    """Exact ``count(DISTINCT value) BY key`` for skewed keys: phase 1
    groups on (key, hash(value) % n_salt) so each reducer deduplicates
    only its value shard — the value sets of a hot key spread over
    n_salt reducers instead of one — and phase 2 sums the disjoint
    shard counts (a value lands in exactly ONE shard, so the sum is the
    exact distinct count, not an estimate). Returns
    (key, distinct_count).

    Use when the hot key is in the GROUP BY: AQE cannot split a single
    group, and plain partial aggregation cannot shrink DISTINCT state
    map-side. The sketch alternative (operators/sketches.py) trades
    exactness for even less state; this trades one extra (tiny)
    shuffle for exactness."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(int(n_salt)))
    shard = (
        df.groupBy(F.col(key_col), salt.alias("_salt"))
        .agg(F.countDistinct(F.col(value_col)).alias("_part"))
    )
    return (
        shard.groupBy(key_col)
        .agg(F.sum("_part").cast("long").alias("distinct_count"))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    salt_by: str | None = None,
) -> DataFrame:
    """Exact inner equi-join with the left side's hot keys sharded:
    every left row gets a deterministic salt (hash of ``salt_by``, a
    left column that varies within a key — default: the key itself is
    NOT acceptable, so a caller must name one) and the right side is
    exploded across all n_salt shards; the join runs on
    (key, salt), so one hot key's rows land on n_salt reducers instead
    of one. Row-identical to ``left.join(right, on)`` — the right
    replication guarantees every (left row, right row) pair still
    meets exactly once.

    Cost model: right side scans/shuffles n_salt x — use for a
    moderate right side against a badly skewed big left when the right
    is too LARGE to broadcast (a broadcastable right needs no salting:
    broadcast joins don't shuffle the left at all)."""
    if salt_by is None:
        raise ValueError(
            "salted_join needs salt_by: a LEFT column that varies inside "
            "a join key (e.g. the fact table's id) — salting by the key "
            "itself would put a hot key's rows back on one reducer"
        )
    if "_salt" in left.columns or "_salt" in right.columns:
        raise ValueError(
            "salted_join reserves the column name '_salt'; rename or "
            "drop the existing _salt column first"
        )
    lft = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_by)), F.lit(int(n_salt)))
    )
    rgt = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(int(n_salt))]))
    )
    return lft.join(rgt, [on, "_salt"]).drop("_salt")
