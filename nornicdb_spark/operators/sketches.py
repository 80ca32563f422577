"""Approximate aggregates for 100 TB interactive analytics — HLL++
distinct counting and Greenwald-Khanna quantiles (both Spark built-ins:
mergeable sketch state, partial aggregation, no exact-sort/exact-set
memory). The operators here pair the sketch with its ground truth and
check the published error bound IN the result, so the driver's oracle
hash goes red if a Spark upgrade ever degrades sketch accuracy:
the exact columns carry the DuckDB oracle, the ok flag carries the
bound. Production callers use the sketch alone — the exact twin in
these gate rows exists to certify it (same posture as the ANN recall
gates, search/vector.py).

Reference scope: the reference has no approximate aggregates (its
count/avg surface is exact, pkg/cypher aggregates) — this is a
beyond-reference capability for the interactive-at-scale north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    rsd: float = 0.05,
    tol_factor: float = 4.0,
) -> DataFrame:
    """Per-group exact distinct count + in-result HLL++ accuracy flag:
    ok = |approx - exact| <= tol_factor * rsd * exact (HLL++ relative
    standard deviation `rsd`; 4 sigma ~ certain). Returns
    (group, exact_distinct, ok). The exact column is oracle-matched;
    the approx value is intentionally NOT emitted (it is
    sketch-version-dependent) — only its bound check is.

    Scale: both aggregates are mergeable map-side state; the HLL
    register array is O(1/rsd^2) bytes per group regardless of
    cardinality — the operator a 10^10-distinct-users count runs when
    the exact set no longer fits anywhere."""
    return (
        df.groupBy(group_col)
        .agg(
            F.countDistinct(value_col).cast("long").alias("exact_distinct"),
            F.approx_count_distinct(value_col, rsd).alias("_approx"),
        )
        .select(
            group_col,
            "exact_distinct",
            (
                F.abs(F.col("_approx") - F.col("exact_distinct"))
                <= F.lit(tol_factor * rsd) * F.col("exact_distinct")
            )
            .cast("long")
            .alias("ok"),
        )
    )


def approx_quantile_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    accuracy: int = 1000,
) -> DataFrame:
    """Per-group exact quantile + in-result Greenwald-Khanna bound check:
    approx_percentile guarantees the returned element's rank is within
    n/accuracy of the target rank — verified by counting elements
    <=/< the sketch's answer and intersecting the rank interval
    (+/-1 slack for ties/interpolation). Returns (group, exact_q, ok).

    Scale: GK state is O(accuracy * log n) per group; the exact twin
    (percentile()) exists only to certify the sketch — production
    calls drop it and never materialize a per-group sort."""
    ap = df.groupBy(group_col).agg(
        F.expr(f"approx_percentile({value_col}, {q}, {accuracy})").alias("_ap"),
        F.expr(f"percentile({value_col}, {q})").alias("_exact"),
        # count NON-NULL values: percentile/approx_percentile and the
        # rank sums below all ignore NULLs, so the rank target must too
        F.count(F.col(value_col)).alias("_n"),
    )
    ranks = (
        df.join(F.broadcast(ap.select(group_col, "_ap")), group_col)
        .groupBy(group_col)
        .agg(
            F.sum((F.col(value_col) <= F.col("_ap")).cast("long")).alias("_le"),
            F.sum((F.col(value_col) < F.col("_ap")).cast("long")).alias("_lt"),
        )
    )
    target = F.lit(q) * F.col("_n")
    slack = F.col("_n") / F.lit(float(accuracy)) + F.lit(1.0)
    return (
        ap.join(ranks, group_col)
        .select(
            group_col,
            F.round("_exact", 9).alias("exact_q"),
            (
                (F.col("_lt") + 1 <= target + slack)
                & (F.col("_le") >= target - slack)
            )
            .cast("long")
            .alias("ok"),
        )
    )
