"""Sessionization + co-access inference over an event log.

Reference analogues: temporal access tracker / session-boundary detection
(pkg/temporal/session.go) and co-access relationship inference
(pkg/inference/inference.go:1-65 — similarity / co-access / temporal
proximity edges with confidence). The reference tracks sessions in-process
per node; here both are single window/join pipelines.

Batch sessionization is the classic lag-gap-cumsum: a new session starts
where the gap to the previous event exceeds ``gap``; session id = running
count of session starts. One shuffle on the key, everything else stays in
the partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids: (…events…, session_id) where session_id is
    1-based per key in time order."""
    w = W.partitionBy(key_col).orderBy(F.col(ts_col), F.col("event_id"))
    gap_us = F.unix_micros(F.col(ts_col)) - F.unix_micros(
        F.lag(F.col(ts_col)).over(w)
    )
    is_new = F.when(
        gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-key session summary: (user_id, n_sessions, max_session_events,
    avg_session_seconds)."""
    s = sessionize(events, key_col, ts_col, gap_seconds)
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).cast(
                "double"
            )
            / 1e6
        ).alias("duration_s"),
    )
    return per_session.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        # rounded: float-avg of derived durations is partition-order
        # sensitive at the ULP
        F.round(F.avg("duration_s") + 1e-9, 6).alias("avg_session_seconds"),
    )


def co_access_pairs(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    min_shared: int = 3,
    max_keys_per_window: int | None = 4096,
    warn_hot_windows: bool = False,
) -> DataFrame:
    """Co-access inference: keys active in the same tumbling window,
    scored by confidence = shared_windows / min(windows_a, windows_b)
    (reference inference.go co-access edges with confidence).
    Returns (a, b, shared_windows, confidence) for a < b.

    Skew guards (the self-join on the window key is quadratic in the
    number of keys active in a window — a hot window, the NORMAL shape
    of event data, is otherwise a cluster-killer at scale; same hub-cap
    argument as dedup.ngram_jaccard_pairs(max_shingle_df)):

    - ``max_keys_per_window``: a hot window (more active keys than the
      cap) contributes only its ``cap`` lowest-``md5(key)`` keys — a
      deterministic uniform-ish key sample, portable to a SQL oracle
      (``row_number() OVER (PARTITION BY w ORDER BY md5(k), k)``).
      Windows at or under the cap are untouched (exact). Because the
      hash order is global per key, a surviving pair's shared-window
      count stays exact over the windows where both survive. Join work
      is bounded at C(cap, 2) rows per window. ``None`` disables.
    - ``n_windows >= min_shared`` pre-filter: exact and free — a key
      active in fewer (kept) windows than ``min_shared`` can never
      reach ``shared_windows >= min_shared`` (shared <= min(na, nb)),
      so it is semi-join-pruned before the quadratic join.

    ``n_windows`` (the confidence denominator) counts the key's
    *surviving* window memberships so shared <= min(na, nb) always
    holds. ``warn_hot_windows=True`` eagerly counts capped windows and
    emits a warning (one extra scan — off by default).
    """
    win = (F.unix_micros(F.col(ts_col)) / (window_seconds * 1_000_000)).cast(
        "long"
    )
    active = events.select(
        F.col(key_col).alias("k"), win.alias("w")
    ).distinct()
    if max_keys_per_window is not None:
        if warn_hot_windows:
            import warnings

            n_hot = (
                active.groupBy("w")
                .agg(F.count(F.lit(1)).alias("c"))
                .filter(F.col("c") > max_keys_per_window)
                .count()
            )
            if n_hot:
                warnings.warn(
                    f"co_access_pairs: {n_hot} hot window(s) exceeded "
                    f"max_keys_per_window={max_keys_per_window}; keys "
                    "were deterministically sampled (md5 order)",
                    stacklevel=2,
                )
        rn = F.row_number().over(
            W.partitionBy("w").orderBy(
                F.md5(F.col("k").cast("string")), F.col("k")
            )
        )
        active = (
            active.withColumn("_rn", rn)
            .filter(F.col("_rn") <= max_keys_per_window)
            .drop("_rn")
        )
    counts = active.groupBy("k").agg(F.count(F.lit(1)).alias("n_windows"))
    # exact pre-prune: keys with fewer kept windows than min_shared
    # cannot appear in the output
    eligible = counts.filter(F.col("n_windows") >= min_shared)
    active = active.join(
        eligible.select("k"), "k", "left_semi"
    )
    pairs = (
        active.select(F.col("k").alias("a"), "w")
        .join(active.select(F.col("k").alias("b"), "w"), "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("shared_windows"))
        .filter(F.col("shared_windows") >= min_shared)
    )
    return (
        pairs.join(
            eligible.select(
                F.col("k").alias("a"), F.col("n_windows").alias("na")
            ),
            "a",
        )
        .join(
            eligible.select(
                F.col("k").alias("b"), F.col("n_windows").alias("nb")
            ),
            "b",
        )
        .withColumn(
            "confidence",
            F.col("shared_windows") / F.least(F.col("na"), F.col("nb")),
        )
        .select("a", "b", "shared_windows", "confidence")
    )
