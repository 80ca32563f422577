"""Decay scoring: batch recompute of the reference's memory-decay system.

Reference semantics (pkg/decay/decay.go:503-545, DefaultConfig 245-252):
    score = 0.4·recency + 0.3·frequency + 0.3·importance, clamped [0,1]
    recency   = exp(−λ_tier · hours_since_access), λ = ln2 / half_life_h
    frequency = min(ln(1 + accesses) / ln(101), 1)      (cap 100 accesses)
    importance= tier default (EPISODIC .3 / SEMANTIC .6 / PROCEDURAL .9)
    archive when score < 0.05
Half-lives: 7 d / 69 d / 693 d (decay.go package doc).

The reference runs this on a 1-hour ticker per node; at scale it's a pure
projection over an aggregates table — one scan, no shuffle beyond the
per-key agg that produces (last_accessed, access_count).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HALF_LIFE_DAYS = {"EPISODIC": 7.0, "SEMANTIC": 69.0, "PROCEDURAL": 693.0}
TIER_IMPORTANCE = {"EPISODIC": 0.3, "SEMANTIC": 0.6, "PROCEDURAL": 0.9}
RECENCY_W, FREQUENCY_W, IMPORTANCE_W = 0.4, 0.3, 0.3
ARCHIVE_THRESHOLD = 0.05


def lambda_per_hour(tier: str) -> float:
    return math.log(2) / (HALF_LIFE_DAYS[tier] * 24.0)


def decay_score_col(
    tier_col: F.Column, hours_col: F.Column, access_count_col: F.Column
) -> F.Column:
    """Score expression — usable on any frame with tier/hours/count."""
    lam = (
        F.when(tier_col == "EPISODIC", lambda_per_hour("EPISODIC"))
        .when(tier_col == "PROCEDURAL", lambda_per_hour("PROCEDURAL"))
        .otherwise(lambda_per_hour("SEMANTIC"))
    )
    imp = (
        F.when(tier_col == "EPISODIC", TIER_IMPORTANCE["EPISODIC"])
        .when(tier_col == "PROCEDURAL", TIER_IMPORTANCE["PROCEDURAL"])
        .otherwise(TIER_IMPORTANCE["SEMANTIC"])
    )
    recency = F.exp(-lam * hours_col)
    frequency = F.least(
        F.log(1 + access_count_col.cast("double")) / math.log(101.0), F.lit(1.0)
    )
    raw = RECENCY_W * recency + FREQUENCY_W * frequency + IMPORTANCE_W * imp
    return F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))


def decay_scores_from_events(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key decay scores derived from an access log: last_accessed =
    max(ts), access_count = count, tier assigned by key mod 3 (fixture
    convention), 'now' = global max ts (deterministic batch time).

    Returns (user_id, tier, access_count, hours_since, score, archived).
    """
    agg = events.groupBy(F.col(key_col).alias("user_id")).agg(
        F.max(ts_col).alias("last_accessed"),
        F.count(F.lit(1)).alias("access_count"),
    )
    now = events.agg(F.max(ts_col).alias("now"))
    tier = (
        F.when(F.col("user_id") % 3 == 0, "EPISODIC")
        .when(F.col("user_id") % 3 == 1, "SEMANTIC")
        .otherwise("PROCEDURAL")
    )
    hours = (
        F.unix_micros(F.col("now")) - F.unix_micros(F.col("last_accessed"))
    ).cast("double") / 3.6e9
    out = (
        agg.crossJoin(F.broadcast(now))
        .withColumn("tier", tier)
        .withColumn("hours_since", hours)
        .withColumn(
            "score",
            decay_score_col(F.col("tier"), F.col("hours_since"), F.col("access_count")),
        )
        .withColumn("archived", F.col("score") < ARCHIVE_THRESHOLD)
    )
    return out.select(
        "user_id", "tier", "access_count", "hours_since", "score", "archived"
    )
