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


def burst_patterns(
    ev: DataFrame,
    window_seconds: float = 60.0,
    min_accesses: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Burst detection (pattern_detector.go:290-320 detectBurstPattern):
    keys with ≥ ``min_accesses`` events in the trailing window (here
    anchored at the log's max timestamp — the batch 'now'), confidence
    = min(accesses_per_second / 10, 1). Returns
    (key, n_in_window, confidence)."""
    now = ev.agg(F.max(ts_col).alias("_now"))
    win = F.expr(f"_now - INTERVAL {int(window_seconds)} SECONDS")
    return (
        ev.crossJoin(F.broadcast(now))
        .where(F.col(ts_col) > win)
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_window"))
        .where(F.col("n_in_window") >= int(min_accesses))
        .withColumn(
            "confidence",
            F.round(
                F.least(
                    F.col("n_in_window") / float(window_seconds) / 10.0,
                    F.lit(1.0),
                ),
                9,
            ),
        )
    )


def trend_patterns(
    ev: DataFrame,
    growth_threshold: float = 0.05,
    decay_threshold: float = -0.05,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Growth/decay trend patterns (pattern_detector.go:323-349
    detectTrendPattern): the key's final access-velocity classifies as
    'growing' above / 'decaying' below the thresholds, confidence =
    min(|velocity|/0.5, 1); keys in between emit no pattern (the
    reference returns nil). Velocity = the tracker's interval-filter
    state, i.e. :func:`~nornicdb_spark.streaming.kalman.
    kalman_final_velocity`."""
    from nornicdb_spark.streaming.kalman import kalman_final_velocity

    vel = kalman_final_velocity(
        ev, key_col=key_col, ts_col=ts_col, value_col=value_col
    )
    rvel = F.round(F.col("vel") + 1e-12, 9)
    return (
        vel.select(F.col(key_col).alias("k"), rvel.alias("vel"))
        .where(
            (F.col("vel") > float(growth_threshold))
            | (F.col("vel") < float(decay_threshold))
        )
        .select(
            "k",
            F.when(F.col("vel") > float(growth_threshold), F.lit("growing"))
            .otherwise(F.lit("decaying"))
            .alias("pattern"),
            "vel",
            F.round(F.least(F.abs(F.col("vel")) / 0.5, F.lit(1.0)), 9).alias(
                "confidence"
            ),
        )
    )


def peak_access_time(
    ev: DataFrame, key_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """GetPeakAccessTime (pattern_detector.go:352-395): per key, the
    modal hour-of-day and day-of-week (0=Sunday, Go Weekday numbering;
    ties to the smallest bucket — the reference's Go-map iteration
    leaves its ties arbitrary) and the combined confidence
    (maxHour/total·24/10 + maxDay/total·7/10)/2 clamped to 1."""
    from pyspark.sql import Window as W

    def modal(bucket, name):
        counts = ev.groupBy(
            F.col(key_col).alias("k"), bucket.alias(name)
        ).agg(F.count(F.lit(1)).cast("double").alias("c"))
        w = W.partitionBy("k").orderBy(F.desc("c"), F.asc(name))
        tot = W.partitionBy("k")
        return (
            counts.withColumn("_rn", F.row_number().over(w))
            .withColumn("_tot", F.sum("c").over(tot))
            .where(F.col("_rn") == 1)
            .select("k", name, (F.col("c") / F.col("_tot")).alias(f"_frac_{name}"))
        )

    hours = modal(F.hour(ts_col), "peak_hour")
    days = modal(F.dayofweek(ts_col) - 1, "peak_day")
    conf = F.round(
        F.least(
            (F.col("_frac_peak_hour") * 24.0 / 10.0
             + F.col("_frac_peak_day") * 7.0 / 10.0) / 2.0,
            F.lit(1.0),
        ),
        9,
    )
    return hours.join(days, "k").select(
        "k", "peak_hour", "peak_day", conf.alias("confidence")
    )
