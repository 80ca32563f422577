"""Cyclic access-pattern detection — batch twin of the reference's
temporal PatternDetector (pkg/temporal/pattern_detector.go): hour-of-day
and day-of-week histograms per key; a peaked histogram is a pattern.

Formulas mirror the reference exactly:
- daily  : concentration = max_hour_count / (total/24);
           confidence = clamp((concentration − 1)/3, 0, 1); keep ≥ 0.3
           (pattern_detector.go:200-243)
- weekly : concentration = max_day_count / (total/7);
           confidence = clamp((concentration − 1)/2, 0, 1); keep ≥ 0.4
           (pattern_detector.go:246-289)
- both require ≥ MinSamplesForPattern (10) accesses
  (pattern_detector.go:86-96)

Determinism note: the reference breaks peak ties by Go map iteration
order (random); we break them by the smallest hour/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_SAMPLES = 10
DAILY_THRESHOLD = 0.3
WEEKLY_THRESHOLD = 0.4


def _concentration_patterns(
    ev: DataFrame, bucket: F.Column, n_buckets: int, divisor: float,
    threshold: float, ptype: str, key_col: str,
) -> DataFrame:
    counts = ev.groupBy(key_col, bucket.alias("bkt")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # argmax with min-bucket tie-break: max over (n, -bucket) structs
    per_key = counts.groupBy(key_col).agg(
        F.sum("n").alias("total"),
        F.max(
            F.struct(F.col("n").alias("n"), (-F.col("bkt")).alias("negb"))
        ).alias("m"),
    )
    conf = F.least(
        F.greatest(
            (F.col("m.n") / (F.col("total") / n_buckets) - 1.0) / divisor,
            F.lit(0.0),
        ),
        F.lit(1.0),
    )
    return (
        per_key.filter(F.col("total") >= MIN_SAMPLES)
        .withColumn("confidence", conf)
        .filter(F.col("confidence") >= threshold)
        .select(
            F.col(key_col),
            F.lit(ptype).alias("pattern_type"),
            (-F.col("m.negb")).cast("long").alias("peak"),
            "confidence",
        )
    )


def cyclic_patterns(
    events: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Detected daily/weekly patterns per key over an event log.
    Returns (key, pattern_type, peak, confidence) — peak is the hour
    0-23 (daily) or day-of-week 0=Sunday..6 (weekly, Go Weekday
    convention). Two histogram aggregations, no state."""
    ev = events.select(F.col(key_col), F.col(ts_col).alias("_ts"))
    daily = _concentration_patterns(
        ev, F.hour("_ts"), 24, 3.0, DAILY_THRESHOLD, "daily", key_col
    )
    weekly = _concentration_patterns(
        ev, F.dayofweek("_ts") - 1, 7, 2.0, WEEKLY_THRESHOLD, "weekly", key_col
    )
    return daily.unionByName(weekly)
