"""Relationship evolution — per-edge weight trends over time.

Reference: pkg/temporal/relationship_evolution.go. Each co-accessed
node pair carries a 2-state (position, velocity) Kalman filter over its
observed co-access weight; the trend classifies the filter's velocity
(strengthening > 0.01 / weakening < −0.01 / stable, 'unknown' under
MinObservationsForTrend=3), confidence = n/(n+10), and the predicted
strength is the linear extrapolation pos + vel·steps
(filter/kalman_velocity.go:222-228 Predict). Filter constants are the
edge-tracker defaults (relationship_evolution.go:125-143): q_pos 0.01,
q_vel 0.001, r 0.1, P₀ = diag(1.0, 0.1), dt 1.

Distributed shape: the reference tracks ≤100k edges in one process
(LRU-evicted); here the observation series is a DataFrame — per-window
co-access weights (weight = least of the pair's event counts in the
shared window, the co-access intensity) — and the per-edge fold is one
Arrow-batched applyInPandas over (a, b) keys (the Kalman discipline:
order-dependent recurrences are the documented Pandas-UDF exception).
Edge count scales with the cluster, not a driver LRU.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# edge-tracker filter defaults (relationship_evolution.go:128-135)
Q_POS, Q_VEL, R, P0_POS, P0_VEL, DT = 0.01, 0.001, 0.1, 1.0, 0.1, 1.0


def co_access_weight_series(
    ev: DataFrame,
    window_seconds: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(a, b, w, weight): for every key pair active in the same time
    window, the co-access intensity = least of their event counts in
    that window. One groupBy + an equi-join on the window id — never an
    all-pairs product across windows."""
    win_us = int(window_seconds) * 1_000_000
    per = ev.groupBy(
        F.col(key_col).alias("k"),
        (F.unix_micros(F.col(ts_col)) / win_us).cast("bigint").alias("w"),
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    x, y = per.alias("x"), per.alias("y")
    return (
        x.join(y, (F.col("x.w") == F.col("y.w")) & (F.col("x.k") < F.col("y.k")))
        .select(
            F.col("x.k").alias("a"),
            F.col("y.k").alias("b"),
            F.col("x.w").alias("w"),
            F.least(F.col("x.c"), F.col("y.c")).alias("weight"),
        )
    )


def relationship_trends(
    ev: DataFrame,
    window_seconds: int = 3600,
    min_obs: int = 3,
    strengthen: float = 0.01,
    weaken: float = -0.01,
    steps: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-edge trend (relationship_evolution.go calculateTrend):
    (a, b, n_obs, direction, vel, strength, predicted, confidence).
    Direction thresholds compare the 9-digit-rounded velocity so
    boundary membership matches the oracle."""
    import pandas as pd

    obs = co_access_weight_series(ev, window_seconds, key_col, ts_col)

    def per_edge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("w")
        pos = vel = 0.0
        p00, p01, p10, p11 = P0_POS, 0.0, 0.0, P0_VEL
        for z in pdf["weight"].astype("float64"):
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
        return pd.DataFrame(
            {
                "a": [pdf["a"].iloc[0]],
                "b": [pdf["b"].iloc[0]],
                "n_obs": [len(pdf)],
                "pos": [pos],
                "vel": [vel],
            }
        )

    state = obs.groupBy("a", "b").applyInPandas(
        per_edge, schema="a long, b long, n_obs long, pos double, vel double"
    )
    rvel = F.round(F.col("vel") + 1e-12, 9)
    direction = (
        F.when(F.col("n_obs") < int(min_obs), F.lit("unknown"))
        .when(rvel > float(strengthen), F.lit("strengthening"))
        .when(rvel < float(weaken), F.lit("weakening"))
        .otherwise(F.lit("stable"))
    )
    return state.select(
        "a",
        "b",
        "n_obs",
        direction.alias("direction"),
        rvel.alias("vel"),
        F.round(F.col("pos") + 1e-12, 9).alias("strength"),
        F.round(F.col("pos") + F.col("vel") * float(steps) * DT + 1e-12, 9)
        .alias("predicted"),
        F.round(
            F.col("n_obs").cast("double")
            / (F.col("n_obs").cast("double") + 10.0),
            9,
        ).alias("confidence"),
    )
