"""As-of (nearest-previous) join — a temporal operator the reference
lacks (SURVEY §2.3 "No theta/range/as-of/interval joins"), included as a
capability extension: enriching an event stream with the latest prior
state per key is the workhorse of feature backfills and training-data
pipelines.

Implementation is the scalable union-window trick, NOT a range join:
tag both sides, union on (key, ts), and take the last right-side payload
at-or-before each left row with one window over (key, ts) — a single
shuffle on the key, no per-row subqueries, no quadratic candidate pairs.
At 100 TB this is one sort-shuffle of |L|+|R| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same ``on`` key (backward as-of,
    ties match). Right columns (except the key) come back prefixed
    ``right_``; rows with no prior match keep nulls. ``tolerance_seconds``
    voids matches older than the given gap.

    If several right rows share (key, ts), the one sorting last by its
    remaining columns wins — pre-aggregate the right side for full
    determinism.
    """
    r_payload = [c for c in right.columns if c != on]
    rv = F.struct(
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in r_payload],
    )
    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        rv.alias("_rv"),
    )
    # right rows sort before left rows at equal ts (ties match), and at
    # equal (ts, side) the row-sort on _rv makes "last wins" deterministic
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
    )
    u = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_m", F.last("_rv", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "_m",
            F.when(
                F.col("_ts").cast("double") - F.col("_m._rts").cast("double")
                <= F.lit(float(tolerance_seconds)),
                F.col("_m"),
            ),
        )
    cols = [c for c in left.columns]
    cols.append(F.col("_m._rts").alias(f"right_{right_ts}"))
    cols += [F.col(f"_m.{c}").alias(f"right_{c}") for c in r_payload if c != right_ts]
    return out.select(*cols)
