"""Query-load prediction — QPS buckets, trend, scaling signals.

Reference: pkg/temporal/query_load.go QueryLoadPredictor. The query log
is bucketed (non-empty buckets only — flushBucket skips empty ones,
query_load.go:261-264); each bucket's QPS feeds a velocity Kalman
filter (defaults query_load.go:148-166: q_pos .5, q_vel .1, r 2.0,
P₀ = diag(100, 10), dt 1); the profile reports:

- current (filtered) QPS + velocity; trend = velocity vs
  spike/drop thresholds ÷ 10 (GetPrediction, :328-336)
- predictions at 300/900/3600 steps, clamped ≥ 0 (:339-352)
- baseline mean/σ over the last 60 non-empty buckets, set only when
  > 5 observations (updateBaseline, :285-308)
- peak hour = argmax of per-hour-of-day raw query counts (:354-362;
  Go iterates a map so ties there are arbitrary — here ties break to
  the LOWEST hour, the determinism delta documented at phrase_search)
- anomaly when |latest raw QPS − baseline| > k·σ (:369-380)
- ShouldScaleUp / ShouldScaleDown (:422-452)

Batch shape: one groupBy for the buckets, one Arrow fold for the
filter (the Kalman order-dependent exception, a single bounded series),
plain aggregates for baseline/peak — the profile is one row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# DefaultLoadConfig filter constants (query_load.go:151-158)
Q_POS, Q_VEL, R, P0_POS, P0_VEL, DT = 0.5, 0.1, 2.0, 100.0, 10.0, 1.0


def query_load_profile(
    ev: DataFrame,
    bucket_seconds: int = 3600,
    spike_threshold: float = 5.0,
    drop_threshold: float = -5.0,
    anomaly_stddevs: float = 3.0,
    baseline_window: int = 60,
    threshold_qps: float | None = None,
    min_qps: float = 0.0,
    ts_col: str = "ts",
) -> DataFrame:
    """One-row load profile over an event/query log. ``threshold_qps``
    enables the scale_up/scale_down signals (None → both false)."""
    import pandas as pd

    bkt_us = int(bucket_seconds) * 1_000_000
    buckets = (
        ev.groupBy(
            (F.unix_micros(F.col(ts_col)) / bkt_us).cast("bigint").alias("b")
        )
        .agg((F.count(F.lit(1)) / float(bucket_seconds)).alias("qps"))
    )
    hours = (
        ev.groupBy(F.hour(ts_col).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("h"))
        .limit(1)
    )

    sp, dp = float(spike_threshold) / 10.0, float(drop_threshold) / 10.0
    ks, bw = float(anomaly_stddevs), int(baseline_window)
    tq, mq = threshold_qps, float(min_qps)

    def fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("b")
        pos = vel = 0.0
        p00, p01, p10, p11 = P0_POS, 0.0, 0.0, P0_VEL
        for z in pdf["qps"].astype("float64"):
            pred_pos = pos + vel * DT
            n00 = p00 + DT * p10 + DT * p01 + DT * DT * p11 + Q_POS
            n01 = p01 + DT * p11
            n10 = p10 + DT * p11
            n11 = p11 + Q_VEL
            innov = z - pred_pos
            s = n00 + R
            k0, k1 = n00 / s, n10 / s
            pos = pred_pos + k0 * innov
            vel = vel + k1 * innov
            p00 = (1 - k0) * n00
            p01 = (1 - k0) * n01
            p10 = n10 - k1 * n00
            p11 = n11 - k1 * n01
        recent = pdf["qps"].astype("float64").tail(bw)
        recent = recent[recent > 0]
        if len(recent) > 5:
            base_mean = float(recent.mean())
            base_std = float(
                max(0.0, (recent**2).mean() - base_mean * base_mean) ** 0.5
            )
        else:
            base_mean = base_std = 0.0
        trend = (
            "increasing" if vel > sp else "decreasing" if vel < dp else "stable"
        )
        raw_last = float(pdf["qps"].iloc[-1])
        preds = [max(0.0, pos + vel * n * DT) for n in (300, 900, 3600)]
        scale_up = scale_down = False
        if tq is not None:
            scale_up = (pos > tq * 0.8 and trend == "increasing") or (
                preds[0] > tq
            )
            scale_down = pos < tq * 0.5 and trend != "increasing" and pos > mq
        return pd.DataFrame(
            {
                "n_buckets": [len(pdf)],
                "current_qps": [pos],
                "velocity": [vel],
                "trend": [trend],
                "pred_5m": [preds[0]],
                "pred_15m": [preds[1]],
                "pred_1h": [preds[2]],
                "baseline_qps": [base_mean],
                "baseline_std": [base_std],
                "is_anomaly": [
                    base_std > 0 and abs(raw_last - base_mean) > ks * base_std
                ],
                "scale_up": [scale_up],
                "scale_down": [scale_down],
            }
        )

    schema = (
        "n_buckets long, current_qps double, velocity double, trend string,"
        " pred_5m double, pred_15m double, pred_1h double,"
        " baseline_qps double, baseline_std double, is_anomaly boolean,"
        " scale_up boolean, scale_down boolean"
    )
    profile = (
        buckets.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: fold(pdf), schema=schema)
    )
    return profile.crossJoin(
        F.broadcast(hours.select(F.col("h").alias("peak_hour")))
    )
