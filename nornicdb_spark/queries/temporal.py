"""Temporal / streaming queries — SURVEY §2.11: decay scoring,
sessionization, co-access inference, event-window aggregation, JSON
property access, Kalman smoothing.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from nornicdb_spark.operators.localframe import literal_df

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.streaming import decay, kalman, sessions
from nornicdb_spark.queries import register


_DECAY_ORACLE = """
    WITH agg AS (
      SELECT user_id, max(ts) AS last_accessed,
             CAST(count(*) AS BIGINT) AS access_count
      FROM events GROUP BY user_id
    ),
    now_t AS (SELECT max(ts) AS now FROM events),
    base AS (
      SELECT user_id,
             CASE WHEN user_id % 3 = 0 THEN 'EPISODIC'
                  WHEN user_id % 3 = 1 THEN 'SEMANTIC'
                  ELSE 'PROCEDURAL' END AS tier,
             access_count,
             CAST(epoch_us(now) - epoch_us(last_accessed) AS DOUBLE) / 3600000000
               AS hours_since
      FROM agg, now_t
    )
    SELECT user_id, tier, access_count, hours_since,
           least(greatest(
             0.4 * exp(-(CASE tier WHEN 'EPISODIC' THEN ln(2)/(7*24)
                                   WHEN 'PROCEDURAL' THEN ln(2)/(693*24)
                                   ELSE ln(2)/(69*24) END) * hours_since)
             + 0.3 * least(ln(1 + CAST(access_count AS DOUBLE)) / ln(101), 1.0)
             + 0.3 * (CASE tier WHEN 'EPISODIC' THEN 0.3
                                WHEN 'PROCEDURAL' THEN 0.9 ELSE 0.6 END),
             0.0), 1.0) AS score,
           least(greatest(
             0.4 * exp(-(CASE tier WHEN 'EPISODIC' THEN ln(2)/(7*24)
                                   WHEN 'PROCEDURAL' THEN ln(2)/(693*24)
                                   ELSE ln(2)/(69*24) END) * hours_since)
             + 0.3 * least(ln(1 + CAST(access_count AS DOUBLE)) / ln(101), 1.0)
             + 0.3 * (CASE tier WHEN 'EPISODIC' THEN 0.3
                                WHEN 'PROCEDURAL' THEN 0.9 ELSE 0.6 END),
             0.0), 1.0) < 0.05 AS archived
    FROM base
    """


@register("decay_scores", oracle=_DECAY_ORACLE)
def decay_scores(spark, sf_dir):
    # 3-tier decay recompute (reference pkg/decay/decay.go:503-545).
    ev = Catalog(spark, sf_dir).events
    return decay.decay_scores_from_events(ev)


@register(
    "decay_stats",
    oracle="""
    SELECT tier, CAST(count(*) AS BIGINT) AS n,
           round(avg(score), 9) AS avg_score,
           CAST(sum(CASE WHEN archived THEN 1 ELSE 0 END) AS BIGINT)
             AS n_archivable
    FROM (""" + _DECAY_ORACLE + """) GROUP BY tier
    """,
)
def decay_stats(spark, sf_dir):
    # decay.Manager.GetStats (decay.go:703-760): per-tier counts,
    # per-tier average score, archivable count — the memory-health
    # dashboard aggregate, one groupBy over the recomputed scores.
    ev = Catalog(spark, sf_dir).events
    return (
        decay.decay_scores_from_events(ev)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("score"), 9).alias("avg_score"),
            F.sum(F.col("archived").cast("bigint")).alias("n_archivable"),
        )
    )


@register(
    "decay_archival_candidates",
    oracle="""
    SELECT user_id, tier, round(score, 9) AS score
    FROM (""" + _DECAY_ORACLE + """)
    WHERE round(score, 9) < 0.5
    ORDER BY round(score, 9) ASC, user_id LIMIT 20
    """,
)
def decay_archival_candidates(spark, sf_dir):
    # archival candidates: lowest-scored memories below the configured
    # threshold, most-urgent first (decay.go ShouldArchive + the
    # bottom-N shape of kalman_adapter.go:346 GetArchivalCandidates;
    # the Kalman-urgency variant composes kalman.* the same way).
    # Threshold 0.5 — the default 0.05 can never fire (importance floor
    # 0.09), so the row exercises real truncation under a configured
    # ArchiveThreshold.
    ev = Catalog(spark, sf_dir).events
    scores = decay.decay_scores_from_events(ev)
    return (
        scores.where(F.round(F.col("score"), 9) < 0.5)
        .select("user_id", "tier", F.round("score", 9).alias("score"))
        .orderBy(F.asc(F.round(F.col("score"), 9)), F.asc("user_id"))
        .limit(20)
    )


@register(
    "sessionization",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    tagged AS (
      SELECT user_id, ts, event_id,
             sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM ordered
    ),
    per_session AS (
      SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6
               AS duration_s
      FROM tagged GROUP BY user_id, session_id
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
           max(n_events) AS max_session_events,
           round(avg(duration_s) + 1e-9, 6) AS avg_session_seconds
    FROM per_session GROUP BY user_id
    """,
)
def sessionization(spark, sf_dir):
    # gap-based session detection (reference pkg/temporal/session.go role)
    # as lag-gap-cumsum windows, 30-minute gap.
    ev = Catalog(spark, sf_dir).events
    return sessions.session_stats(ev, gap_seconds=1800)


@register(
    "co_access_pairs",
    oracle="""
    WITH active0 AS (
      SELECT DISTINCT user_id AS k, epoch_us(ts) // 3600000000 AS w
      FROM events
    ),
    -- hot-window skew cap: keep only the 256 lowest-md5(k) keys per
    -- window (deterministic sample; windows <= 256 keys are untouched —
    -- matches sessions.co_access_pairs(max_keys_per_window=256))
    active AS (
      SELECT k, w FROM (
        SELECT k, w, row_number() OVER (
          PARTITION BY w ORDER BY md5(CAST(k AS VARCHAR)), k) AS rn
        FROM active0
      ) WHERE rn <= 256
    ),
    counts AS (SELECT k, CAST(count(*) AS BIGINT) AS n_windows
               FROM active GROUP BY k),
    pairs AS (
      SELECT x.k AS a, y.k AS b, CAST(count(*) AS BIGINT) AS shared_windows
      FROM active x JOIN active y ON x.w = y.w AND x.k < y.k
      GROUP BY x.k, y.k HAVING count(*) >= 3
    )
    SELECT a, b, shared_windows,
           CAST(shared_windows AS DOUBLE) / least(ca.n_windows, cb.n_windows)
             AS confidence
    FROM pairs JOIN counts ca ON ca.k = a JOIN counts cb ON cb.k = b
    """,
)
def co_access_pairs(spark, sf_dir):
    # co-access relationship inference with confidence
    # (reference pkg/inference/inference.go:1-65). Hot-window cap = 256
    # (binds at sf1 where every hourly window has ~1.3k active keys;
    # sf0.01/sf0.1 windows max out at 28/166 keys so results there are
    # exact and unchanged).
    ev = Catalog(spark, sf_dir).events
    return sessions.co_access_pairs(
        ev, window_seconds=3600, min_shared=3, max_keys_per_window=256
    )


@register(
    "event_window_agg",
    oracle="""
    SELECT epoch_us(ts) // 900000000 AS window_id, event_type,
           CAST(count(*) AS BIGINT) AS n, sum(value) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def event_window_agg(spark, sf_dir):
    # 15-minute tumbling aggregation — batch twin of
    # streaming.structured.windowed_event_counts (epoch-bucket keyed so
    # the oracle avoids engine timestamp-bucket conventions).
    ev = Catalog(spark, sf_dir).events
    win = (F.unix_micros(F.col("ts")) / 900_000_000).cast("long")
    return ev.groupBy(
        win.alias("window_id"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))


@register(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def json_props_extract(spark, sf_dir):
    # dynamic JSON property access (reference property maps are
    # schema-free, storage/types.go:185-211; apoc.convert.fromJsonMap).
    ev = Catalog(spark, sf_dir).events
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


# The Kalman filters are deterministic recurrences over (ts, event_id)-
# ordered series, so they DO carry SQL oracles: a recursive CTE advances
# the filter state row by row with the exact same float-op order as the
# Python loop (sub-ULP equal; both sides round at 9 decimals with the
# repo's 1e-12 epsilon shift). Series are bounded (≤~100 rows/user), so
# recursion depth is trivial for DuckDB.

_KALMAN_EV = """
    ev AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 8
    )"""

# scalar filter (kalman_functions.go:360-408; defaults :206-218):
# velocity-projection predict, then standard 1-D update
_XP = "(f.x + (f.x - f.lx))"                       # x += (x - last_x)
_K = "((f.p + 0.0001) / ((f.p + 0.0001) + 88.0))"  # p += q; k = p/(p+r)

_KALMAN_SMOOTH_ORACLE = f"""
    WITH RECURSIVE {_KALMAN_EV},
    f AS (
      SELECT user_id, CAST(NULL AS TIMESTAMP) AS ts,
             CAST(0 AS DOUBLE) AS value,
             CAST(0 AS BIGINT) AS rn, CAST(0 AS DOUBLE) AS x,
             CAST(0 AS DOUBLE) AS lx, CAST(30 AS DOUBLE) AS p
      FROM (SELECT DISTINCT user_id FROM ev)
      UNION ALL
      SELECT e.user_id, e.ts, e.value, e.rn,
             {_XP} + {_K} * (e.value - {_XP}) AS x,
             {_XP} AS lx,
             (1.0 - {_K}) * (f.p + 0.0001) AS p
      FROM f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
    )
    SELECT user_id, ts, value, round(x + 1e-12, 9) AS filtered
    FROM f WHERE rn >= 1
    """


@register("kalman_smooth", oracle=_KALMAN_SMOOTH_ORACLE)
def kalman_smooth(spark, sf_dir):
    # kalman.process chain per user over the event value series
    # (reference kalman_functions.go:360-408). Oracle = the recurrence as
    # a recursive CTE; also pinned to hand-unrolled constants in
    # tests/test_streaming.py::test_kalman_smooth_golden.
    ev = Catalog(spark, sf_dir).events
    out = kalman.kalman_smooth(ev.filter(F.col("user_id") < 8))
    return out.select(
        "user_id", "ts", "value",
        F.round(F.col("filtered") + 1e-12, 9).alias("filtered"),
    )


# constant-velocity filter (kalman_functions.go:599-655; defaults
# :221-232, dt=1): 2-state predict/update, P as four scalars
_N00 = "(f.p00 + f.p10 + f.p01 + f.p11 + 0.1)"
_N01 = "(f.p01 + f.p11)"
_N10 = "(f.p10 + f.p11)"
_N11 = "(f.p11 + 0.01)"
_S = f"({_N00} + 1.0)"
_K0 = f"({_N00} / {_S})"
_K1 = f"({_N10} / {_S})"
_PP = "(f.pos + f.vel)"
_INNOV = f"(e.value - {_PP})"

_KALMAN_VEL_F = f"""f AS (
      SELECT user_id, CAST(NULL AS TIMESTAMP) AS ts,
             CAST(0 AS DOUBLE) AS value,
             CAST(0 AS BIGINT) AS rn, CAST(0 AS DOUBLE) AS pos,
             CAST(0 AS DOUBLE) AS vel, CAST(100 AS DOUBLE) AS p00,
             CAST(0 AS DOUBLE) AS p01, CAST(0 AS DOUBLE) AS p10,
             CAST(10 AS DOUBLE) AS p11
      FROM (SELECT DISTINCT user_id FROM ev)
      UNION ALL
      SELECT e.user_id, e.ts, e.value, e.rn,
             {_PP} + {_K0} * {_INNOV} AS pos,
             f.vel + {_K1} * {_INNOV} AS vel,
             (1.0 - {_K0}) * {_N00} AS p00,
             (1.0 - {_K0}) * {_N01} AS p01,
             {_N10} - {_K1} * {_N00} AS p10,
             {_N11} - {_K1} * {_N01} AS p11
      FROM f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
    )"""

_KALMAN_VELOCITY_ORACLE = f"""
    WITH RECURSIVE {_KALMAN_EV},
    {_KALMAN_VEL_F}
    SELECT user_id, ts, value,
           round(pos + 1e-12, 9) AS pos, round(vel + 1e-12, 9) AS vel
    FROM f WHERE rn >= 1
    """

# final filter state per key (the tracker's intervalFilter.Velocity())
_KALMAN_FINAL_VEL = f"""
    WITH RECURSIVE {_KALMAN_EV},
    {_KALMAN_VEL_F},
    last AS (SELECT user_id AS lu, max(rn) AS mr FROM f GROUP BY user_id)
    SELECT user_id, round(vel + 1e-12, 9) AS vel
    FROM f JOIN last ON f.user_id = last.lu AND f.rn = last.mr
    """


@register(
    "temporal_hot_nodes",
    oracle="""
    SELECT user_id, vel FROM (""" + _KALMAN_FINAL_VEL + """)
    WHERE vel > 0 ORDER BY vel DESC, user_id LIMIT 5
    """,
)
def temporal_hot_nodes(spark, sf_dir):
    # Tracker.GetHotNodes (tracker.go:733-766): nodes whose interval
    # filter shows an INCREASING access rate — final velocity-filter
    # state per key, positive only, most-accelerating first.
    ev = Catalog(spark, sf_dir).events
    vel = kalman.kalman_final_velocity(ev.filter(F.col("user_id") < 8))
    return (
        vel.select(
            "user_id", F.round(F.col("vel") + 1e-12, 9).alias("vel")
        )
        .where(F.col("vel") > 0)
        .orderBy(F.desc("vel"), F.asc("user_id"))
        .limit(5)
    )


@register(
    "temporal_cold_nodes",
    oracle="""
    SELECT user_id, vel FROM (""" + _KALMAN_FINAL_VEL + """)
    WHERE vel < 0 ORDER BY vel ASC, user_id LIMIT 5
    """,
)
def temporal_cold_nodes(spark, sf_dir):
    # Tracker.GetColdNodes (tracker.go:768-800): decreasing access
    # rate, most-negative velocity first — the archival shortlist.
    ev = Catalog(spark, sf_dir).events
    vel = kalman.kalman_final_velocity(ev.filter(F.col("user_id") < 8))
    return (
        vel.select(
            "user_id", F.round(F.col("vel") + 1e-12, 9).alias("vel")
        )
        .where(F.col("vel") < 0)
        .orderBy(F.asc("vel"), F.asc("user_id"))
        .limit(5)
    )


# edge-tracker filter fragments (relationship_evolution.go:128-135
# defaults: q_pos .01, q_vel .001, r .1, P0 diag(1.0, 0.1), dt 1)
_E_N00 = "(f.p00 + f.p10 + f.p01 + f.p11 + 0.01)"
_E_N01 = "(f.p01 + f.p11)"
_E_N10 = "(f.p10 + f.p11)"
_E_N11 = "(f.p11 + 0.001)"
_E_S = f"({_E_N00} + 0.1)"
_E_K0 = f"({_E_N00} / {_E_S})"
_E_K1 = f"({_E_N10} / {_E_S})"
_E_PP = "(f.pos + f.vel)"
_E_INNOV = f"(o.weight - {_E_PP})"

_REL_TRENDS_ORACLE = f"""
    WITH RECURSIVE per AS (
      SELECT user_id AS k, epoch_us(ts) // 3600000000 AS w,
             CAST(count(*) AS DOUBLE) AS c
      FROM events WHERE user_id < 8 GROUP BY 1, 2
    ),
    obs AS (
      SELECT x.k AS a, y.k AS b, x.w AS w, least(x.c, y.c) AS weight,
             row_number() OVER (PARTITION BY x.k, y.k ORDER BY x.w) AS rn
      FROM per x JOIN per y ON x.w = y.w AND x.k < y.k
    ),
    f AS (
      SELECT a, b, CAST(0 AS BIGINT) AS rn, CAST(0 AS DOUBLE) AS pos,
             CAST(0 AS DOUBLE) AS vel, CAST(1.0 AS DOUBLE) AS p00,
             CAST(0 AS DOUBLE) AS p01, CAST(0 AS DOUBLE) AS p10,
             CAST(0.1 AS DOUBLE) AS p11
      FROM (SELECT DISTINCT a, b FROM obs)
      UNION ALL
      SELECT o.a, o.b, o.rn,
             {_E_PP} + {_E_K0} * {_E_INNOV} AS pos,
             f.vel + {_E_K1} * {_E_INNOV} AS vel,
             (1.0 - {_E_K0}) * {_E_N00} AS p00,
             (1.0 - {_E_K0}) * {_E_N01} AS p01,
             {_E_N10} - {_E_K1} * {_E_N00} AS p10,
             {_E_N11} - {_E_K1} * {_E_N01} AS p11
      FROM f JOIN obs o ON o.a = f.a AND o.b = f.b AND o.rn = f.rn + 1
    ),
    last AS (SELECT a AS la, b AS lb, max(rn) AS mr
             FROM f WHERE rn >= 1 GROUP BY a, b)
    SELECT f.a, f.b, last.mr AS n_obs,
           CASE WHEN last.mr < 3 THEN 'unknown'
                WHEN round(vel + 1e-12, 9) > 0.01 THEN 'strengthening'
                WHEN round(vel + 1e-12, 9) < -0.01 THEN 'weakening'
                ELSE 'stable' END AS direction,
           round(vel + 1e-12, 9) AS vel,
           round(pos + 1e-12, 9) AS strength,
           round(pos + vel * 5 + 1e-12, 9) AS predicted,
           round(CAST(last.mr AS DOUBLE) / (last.mr + 10.0), 9) AS confidence
    FROM f JOIN last ON f.a = last.la AND f.b = last.lb AND f.rn = last.mr
    """


@register("temporal_relationship_trends", oracle=_REL_TRENDS_ORACLE)
def temporal_relationship_trends(spark, sf_dir):
    # RelationshipEvolution (relationship_evolution.go): per co-accessed
    # pair, a velocity Kalman filter over hourly co-access intensity;
    # trend = strengthening/weakening/stable on the filter velocity
    # (defaults ±0.01, min 3 observations), confidence n/(n+10),
    # predicted strength = pos + vel·5 (Predict, kalman_velocity.go:222).
    from nornicdb_spark.streaming import evolution

    ev = Catalog(spark, sf_dir).events.filter(F.col("user_id") < 8)
    return evolution.relationship_trends(ev)


# query-load filter fragments (query_load.go:151-158 defaults:
# q_pos .5, q_vel .1, r 2.0, P0 diag(100, 10), dt 1)
_L_N00 = "(f.p00 + f.p10 + f.p01 + f.p11 + 0.5)"
_L_N01 = "(f.p01 + f.p11)"
_L_N10 = "(f.p10 + f.p11)"
_L_N11 = "(f.p11 + 0.1)"
_L_S = f"({_L_N00} + 2.0)"
_L_K0 = f"({_L_N00} / {_L_S})"
_L_K1 = f"({_L_N10} / {_L_S})"
_L_PP = "(f.pos + f.vel)"
_L_INNOV = f"(o.qps - {_L_PP})"

_QUERY_LOAD_ORACLE = f"""
    WITH RECURSIVE ob AS (
      SELECT b, qps, row_number() OVER (ORDER BY b) AS rn FROM (
        SELECT epoch_us(ts) // 3600000000 AS b, count(*) / 3600.0 AS qps
        FROM events GROUP BY 1)
    ),
    f AS (
      SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS DOUBLE) AS pos,
             CAST(0 AS DOUBLE) AS vel, CAST(100 AS DOUBLE) AS p00,
             CAST(0 AS DOUBLE) AS p01, CAST(0 AS DOUBLE) AS p10,
             CAST(10 AS DOUBLE) AS p11
      UNION ALL
      SELECT o.rn,
             {_L_PP} + {_L_K0} * {_L_INNOV} AS pos,
             f.vel + {_L_K1} * {_L_INNOV} AS vel,
             (1.0 - {_L_K0}) * {_L_N00} AS p00,
             (1.0 - {_L_K0}) * {_L_N01} AS p01,
             {_L_N10} - {_L_K1} * {_L_N00} AS p10,
             {_L_N11} - {_L_K1} * {_L_N01} AS p11
      FROM f JOIN ob o ON o.rn = f.rn + 1
    ),
    last AS (SELECT max(rn) AS mr FROM ob),
    fin AS (SELECT pos, vel FROM f, last WHERE f.rn = last.mr),
    recent AS (SELECT qps FROM ob, last WHERE rn > mr - 60 AND qps > 0),
    base AS (
      SELECT CASE WHEN count(*) > 5 THEN avg(qps) ELSE 0.0 END AS m,
             CASE WHEN count(*) > 5 THEN
               sqrt(greatest(avg(qps * qps) - avg(qps) * avg(qps), 0.0))
             ELSE 0.0 END AS sd
      FROM recent
    ),
    rawlast AS (SELECT qps AS raw FROM ob, last WHERE rn = mr),
    peak AS (SELECT hour(ts) AS peak_hour FROM events
             GROUP BY 1 ORDER BY count(*) DESC, 1 LIMIT 1),
    trend AS (
      SELECT CASE WHEN vel > 0.5 THEN 'increasing'
                  WHEN vel < -0.5 THEN 'decreasing'
                  ELSE 'stable' END AS t
      FROM fin
    )
    SELECT (SELECT mr FROM last) AS n_buckets,
           round(pos, 9) AS current_qps,
           round(vel, 9) AS velocity,
           t AS trend,
           round(greatest(0.0, pos + vel * 300), 9) AS pred_5m,
           round(greatest(0.0, pos + vel * 900), 9) AS pred_15m,
           round(greatest(0.0, pos + vel * 3600), 9) AS pred_1h,
           round(m, 9) AS baseline_qps,
           round(sd, 9) AS baseline_std,
           (sd > 0 AND abs(raw - m) > 3.0 * sd) AS is_anomaly,
           ((pos > 0.1 * 0.8 AND t = 'increasing')
             OR greatest(0.0, pos + vel * 300) > 0.1) AS scale_up,
           (pos < 0.1 * 0.5 AND t <> 'increasing' AND pos > 0.0)
             AS scale_down,
           peak_hour
    FROM fin, base, rawlast, peak, trend
    """


@register("temporal_query_load", oracle=_QUERY_LOAD_ORACLE)
def temporal_query_load(spark, sf_dir):
    # QueryLoadPredictor (query_load.go): hourly QPS buckets feed the
    # load velocity filter; trend vs spike/drop thresholds ÷10,
    # 300/900/3600-step predictions clamped ≥0, last-60-bucket
    # baseline mean/σ, peak hour (ties to the LOWEST hour — Go's map
    # iteration leaves reference ties arbitrary), anomaly at 3σ, and
    # the ShouldScaleUp/Down signals at threshold 0.1 QPS.
    from nornicdb_spark.streaming import load as load_mod

    ev = Catalog(spark, sf_dir).events
    out = load_mod.query_load_profile(
        ev, bucket_seconds=3600, threshold_qps=0.1, min_qps=0.0
    )
    return out.select(
        "n_buckets",
        F.round("current_qps", 9).alias("current_qps"),
        F.round("velocity", 9).alias("velocity"),
        "trend",
        F.round("pred_5m", 9).alias("pred_5m"),
        F.round("pred_15m", 9).alias("pred_15m"),
        F.round("pred_1h", 9).alias("pred_1h"),
        F.round("baseline_qps", 9).alias("baseline_qps"),
        F.round("baseline_std", 9).alias("baseline_std"),
        "is_anomaly",
        "scale_up",
        "scale_down",
        "peak_hour",
    )


@register(
    "temporal_burst_patterns",
    oracle="""
    WITH mx AS (SELECT max(ts) AS m FROM events)
    SELECT user_id AS k, CAST(count(*) AS BIGINT) AS n_in_window,
           round(least(count(*) / 86400.0 / 10.0, 1.0), 9) AS confidence
    FROM events, mx WHERE ts > m - INTERVAL 1 DAY
    GROUP BY 1 HAVING count(*) >= 5
    """,
)
def temporal_burst_patterns(spark, sf_dir):
    # detectBurstPattern (pattern_detector.go:290-320): keys with >= 5
    # events in the trailing window (1-day window — the 60s default is
    # a config knob and the fixture's last minute is near-empty),
    # confidence = min(aps/10, 1), anchored at the log's max ts.
    from nornicdb_spark.streaming import patterns

    ev = Catalog(spark, sf_dir).events
    return patterns.burst_patterns(ev, window_seconds=86400, min_accesses=5)


@register(
    "temporal_trend_patterns",
    oracle="""
    SELECT user_id AS k,
           CASE WHEN vel > 0.05 THEN 'growing' ELSE 'decaying' END
             AS pattern,
           vel,
           round(least(abs(vel) / 0.5, 1.0), 9) AS confidence
    FROM (""" + _KALMAN_FINAL_VEL + """)
    WHERE vel > 0.05 OR vel < -0.05
    """,
)
def temporal_trend_patterns(spark, sf_dir):
    # detectTrendPattern (pattern_detector.go:323-349): growing/decaying
    # classification of each key's final access velocity, confidence
    # min(|v|/0.5, 1); keys inside the thresholds emit no pattern.
    from nornicdb_spark.streaming import patterns

    ev = Catalog(spark, sf_dir).events.filter(F.col("user_id") < 8)
    return patterns.trend_patterns(ev)


@register(
    "temporal_peak_access",
    oracle="""
    WITH hc AS (SELECT user_id AS k, hour(ts) AS peak_hour,
                       CAST(count(*) AS DOUBLE) AS c
                FROM events GROUP BY 1, 2),
    hh AS (SELECT k, peak_hour,
                  c / (sum(c) OVER (PARTITION BY k)) AS fh,
                  row_number() OVER (PARTITION BY k
                                     ORDER BY c DESC, peak_hour) AS rn
           FROM hc),
    dc AS (SELECT user_id AS k, dayofweek(ts) AS peak_day,
                  CAST(count(*) AS DOUBLE) AS c
           FROM events GROUP BY 1, 2),
    dd AS (SELECT k, peak_day,
                  c / (sum(c) OVER (PARTITION BY k)) AS fd,
                  row_number() OVER (PARTITION BY k
                                     ORDER BY c DESC, peak_day) AS rn
           FROM dc)
    SELECT hh.k, CAST(peak_hour AS INT) AS peak_hour,
           CAST(peak_day AS INT) AS peak_day,
           round(least((fh * 24.0 / 10.0 + fd * 7.0 / 10.0) / 2.0, 1.0), 9)
             AS confidence
    FROM hh JOIN dd ON hh.k = dd.k WHERE hh.rn = 1 AND dd.rn = 1
    """,
)
def temporal_peak_access(spark, sf_dir):
    # GetPeakAccessTime (pattern_detector.go:352-395): per key the
    # modal hour-of-day and day-of-week (0=Sunday) with the combined
    # confidence, ties to the smallest bucket (Go map order leaves the
    # reference's ties arbitrary).
    from nornicdb_spark.streaming import patterns

    ev = Catalog(spark, sf_dir).events
    out = patterns.peak_access_time(ev)
    return out.select(
        "k",
        F.col("peak_hour").cast("int").alias("peak_hour"),
        F.col("peak_day").cast("int").alias("peak_day"),
        "confidence",
    )


@register("kalman_velocity", oracle=_KALMAN_VELOCITY_ORACLE)
def kalman_velocity(spark, sf_dir):
    # kalman.velocity.process 2-state filter (kalman_functions.go:599-655).
    # Oracle = recursive-CTE recurrence; pinned to hand-unrolled constants
    # in tests/test_streaming.py::test_kalman_velocity_golden.
    ev = Catalog(spark, sf_dir).events
    out = kalman.kalman_velocity(ev.filter(F.col("user_id") < 8))
    return out.select(
        "user_id", "ts", "value",
        F.round(F.col("pos") + 1e-12, 9).alias("pos"),
        F.round(F.col("vel") + 1e-12, 9).alias("vel"),
    )


# adaptive filter (kalman_functions.go:841-905; defaults :234-250):
# basic-branch fragments over the adaptive state names (bx/blast/bp)
_BXP = "(f.bx + (f.bx - f.blast))"
_BK = "((f.bp + 0.0001) / ((f.bp + 0.0001) + 88.0))"
_BX1 = f"({_BXP} + {_BK} * (e.value - {_BXP}))"
_BTREND = f"({_BX1} - {_BXP})"
# stage-1 (post-filter, pre-switch) values per branch
_FILT = f"(CASE WHEN f.mode = 'velocity' THEN {_PP} + {_K0} * {_INNOV} ELSE {_BX1} END)"
_TR1 = f"(CASE WHEN f.mode = 'velocity' THEN f.vel + {_K1} * {_INNOV} ELSE {_BTREND} END)"
_BX_1 = f"(CASE WHEN f.mode = 'velocity' THEN f.bx ELSE {_BX1} END)"
_BLAST_1 = f"(CASE WHEN f.mode = 'velocity' THEN f.blast ELSE {_BXP} END)"
_POS_1 = f"(CASE WHEN f.mode = 'velocity' THEN {_PP} + {_K0} * {_INNOV} ELSE f.pos END)"
_VEL_1 = f"(CASE WHEN f.mode = 'velocity' THEN f.vel + {_K1} * {_INNOV} ELSE f.vel END)"
# switch predicates (hysteresis 10, trend 0.1, stability 0.02)
_TO_VEL = f"(f.since + 1 >= 10 AND f.mode = 'basic' AND abs({_TR1}) > 0.1)"
_TO_BASIC = f"(f.since + 1 >= 10 AND f.mode = 'velocity' AND abs({_TR1}) < 0.02)"

_KALMAN_ADAPTIVE_ORACLE = f"""
    WITH RECURSIVE {_KALMAN_EV},
    f AS (
      SELECT user_id, CAST(NULL AS TIMESTAMP) AS ts,
             CAST(0 AS DOUBLE) AS value, CAST(0 AS BIGINT) AS rn,
             CAST(NULL AS DOUBLE) AS filtered, 'basic' AS mode,
             CAST(0 AS BIGINT) AS since,
             CAST(0 AS DOUBLE) AS bx, CAST(0 AS DOUBLE) AS blast,
             CAST(30 AS DOUBLE) AS bp,
             CAST(0 AS DOUBLE) AS pos, CAST(0 AS DOUBLE) AS vel,
             CAST(100 AS DOUBLE) AS p00, CAST(0 AS DOUBLE) AS p01,
             CAST(0 AS DOUBLE) AS p10, CAST(10 AS DOUBLE) AS p11
      FROM (SELECT DISTINCT user_id FROM ev)
      UNION ALL
      SELECT e.user_id, e.ts, e.value, e.rn,
             {_FILT} AS filtered,
             CASE WHEN {_TO_VEL} THEN 'velocity'
                  WHEN {_TO_BASIC} THEN 'basic' ELSE f.mode END AS mode,
             CASE WHEN {_TO_VEL} OR {_TO_BASIC} THEN 0
                  ELSE f.since + 1 END AS since,
             CASE WHEN {_TO_BASIC} THEN {_POS_1} ELSE {_BX_1} END AS bx,
             CASE WHEN {_TO_BASIC} THEN ({_POS_1} - {_VEL_1})
                  ELSE {_BLAST_1} END AS blast,
             CASE WHEN f.mode = 'velocity' THEN f.bp
                  ELSE (1.0 - {_BK}) * (f.bp + 0.0001) END AS bp,
             CASE WHEN {_TO_VEL} THEN {_BX_1} ELSE {_POS_1} END AS pos,
             CASE WHEN {_TO_VEL} THEN {_TR1} ELSE {_VEL_1} END AS vel,
             CASE WHEN f.mode = 'velocity' THEN (1.0 - {_K0}) * {_N00}
                  ELSE f.p00 END AS p00,
             CASE WHEN f.mode = 'velocity' THEN (1.0 - {_K0}) * {_N01}
                  ELSE f.p01 END AS p01,
             CASE WHEN f.mode = 'velocity' THEN {_N10} - {_K1} * {_N00}
                  ELSE f.p10 END AS p10,
             CASE WHEN f.mode = 'velocity' THEN {_N11} - {_K1} * {_N01}
                  ELSE f.p11 END AS p11
      FROM f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
    )
    SELECT user_id, ts, value, round(filtered + 1e-12, 9) AS filtered, mode
    FROM f WHERE rn >= 1
    """


@register("kalman_adaptive", oracle=_KALMAN_ADAPTIVE_ORACLE)
def kalman_adaptive_oracle_backed(spark, sf_dir):
    # kalman.adaptive.process auto-switching filter
    # (kalman_functions.go:841-905): basic until |trend| > 0.1, velocity
    # until |trend| < 0.02, 10-observation hysteresis, states synced at
    # each switch. Oracle = the full branching recurrence as a recursive
    # CTE (mode travels as a state column); also pinned in
    # tests/test_streaming.py::test_kalman_adaptive_golden.
    ev = Catalog(spark, sf_dir).events
    out = kalman.kalman_adaptive(ev.filter(F.col("user_id") < 8))
    return out.select(
        "user_id", "ts", "value",
        F.round(F.col("filtered") + 1e-12, 9).alias("filtered"),
        "mode",
    )


@register(
    "stream_windowed_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
           time_bucket(INTERVAL '15 minutes', ts) + INTERVAL '15 minutes'
             AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           sum(value) AS total_value
    FROM events GROUP BY 1, 2, 3
    """,
)
def stream_windowed_counts(spark, sf_dir):
    # SURVEY §2.11: the SAME events, processed as a bounded Structured
    # Streaming job (file source → watermark → tumbling window → memory
    # sink), must equal the batch oracle — exactly-once window semantics.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    agg = structured.windowed_event_counts(s, window="15 minutes")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return structured.run_to_completion(agg, f"stream_win_{tag}")


@register(
    "stream_session_stats",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def stream_session_stats(spark, sf_dir):
    # session_window streaming agg vs a batch gaps-and-islands oracle:
    # Spark's session end = last event + gap, start = first event.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    agg = structured.session_window_stats(s, gap="30 minutes")
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    df = structured.run_to_completion(agg, f"stream_sess_{tag}")
    return df.select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )


@register(
    "stream_access_tracker",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS access_count,
           max(ts) AS last_access,
           0.0 AS score_before,
           LEAST(1.0, 0.4 + 0.3 * LEAST(ln(1 + count(*)) / ln(101), 1.0)
                     + 0.3 * 0.6) AS score_after
    FROM events GROUP BY user_id
    """,
)
def stream_access_tracker(spark, sf_dir):
    # SURVEY §2.11 custom stateful operator: applyInPandasWithState
    # keyed decay/reinforcement state (reference temporal tracker +
    # decay.go Reinforce). One bounded batch → every user is fresh
    # (score_before 0), post-reinforcement score is the closed-form
    # decay formula the oracle restates.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    out = structured.stateful_access_tracker(s, tier="SEMANTIC")
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName(f"acc_{tag}").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM acc_{tag}")


@register(
    "events_asof_purchase",
    oracle="""
    WITH c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click'),
    p AS (SELECT user_id, ts, max(value) AS pvalue
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id, c.user_id,
           p.ts AS purchase_ts, p.pvalue AS purchase_value,
           CASE WHEN p.ts IS NULL THEN NULL
                ELSE date_diff('second', p.ts, c.ts) END AS gap_seconds
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
)
def events_asof_purchase(spark, sf_dir):
    # As-of join (temporal extension; SURVEY §2.3 notes the reference has
    # none): each click is enriched with the user's most recent
    # at-or-before purchase — one sort-shuffle on the key via the
    # union-window operator, no per-row subqueries. The purchase side is
    # pre-aggregated per (user, ts) so ties are deterministic.
    from nornicdb_spark.operators.asof import asof_join

    ev = Catalog(spark, sf_dir).events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof_join(clicks, purchases, on="user_id")
    return out.select(
        "event_id",
        "user_id",
        F.col("right_ts").alias("purchase_ts"),
        F.col("right_pvalue").alias("purchase_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp("right_ts"))
        .cast("long")
        .alias("gap_seconds"),
    )


@register(
    "stream_static_enrich",
    oracle="""
    SELECT c_mktsegment AS segment,
           time_bucket(INTERVAL '1 hour', ts) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           sum(value) AS total_value
    FROM events JOIN customer ON c_custkey = user_id + 1
    GROUP BY 1, 2
    """,
)
def stream_static_enrich(spark, sf_dir):
    # stream-static join (Structured Streaming): the event stream is
    # enriched against the static customer dimension inside the
    # micro-batch, then windowed — the standard fact-stream + dim-table
    # shape. The dim side is broadcast per micro-batch; no stream state
    # beyond the window aggregation.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    dim = Catalog(spark, sf_dir).customer.select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
    )
    enriched = s.join(F.broadcast(dim), "user_id")
    agg = (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            "segment",
            F.col("window.start").alias("window_start"),
            "n",
            "total_value",
        )
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return structured.run_to_completion(agg, f"stream_enrich_{tag}")


@register(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', p.ts, c.ts) AS BIGINT) AS gap_seconds
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts BETWEEN c.ts - INTERVAL '1 hour' AND c.ts
    """,
)
def stream_stream_join(spark, sf_dir):
    # stream-stream inner join with event-time bounds (clicks matched to
    # same-user purchases in the preceding hour), both sides watermarked
    # — the canonical two-stream correlation; state is bounded by the
    # watermark + range condition. Must equal the batch range join.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    clicks = (
        s.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"), "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        s.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("purchase_ts") <= F.col("click_ts")),
    ).select(
        "click_id", "purchase_id", "user_id",
        (F.unix_timestamp("click_ts") - F.unix_timestamp("purchase_ts"))
        .cast("long").alias("gap_seconds"),
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return structured.run_to_completion(joined, f"ss_join_{tag}", mode="append")


@register(
    "stream_dedup_events",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def stream_dedup_events(spark, sf_dir):
    # streaming deduplication (dropDuplicates over the stream) — the
    # Structured-Streaming twin of exact dedup; emits each key once,
    # state keyed by the dedup columns. Keys only, so first-arrival
    # nondeterminism can't leak into the comparison.
    from nornicdb_spark.streaming import structured

    s = structured.read_events_stream(spark, sf_dir)
    dd = s.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return structured.run_to_completion(dd, f"ss_dedup_{tag}", mode="append")


@register(
    "temporal_cyclic_patterns",
    oracle="""
    WITH hourly AS (
      SELECT user_id, hour(ts) AS bkt, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT user_id, sum(n) AS total, max(n) AS maxn,
             min(bkt) FILTER (WHERE n = (SELECT max(n) FROM hourly h2
                                         WHERE h2.user_id = hourly.user_id))
               AS peak
      FROM hourly GROUP BY user_id
    ),
    dow AS (
      SELECT user_id, dayofweek(ts) AS bkt, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT user_id, sum(n) AS total, max(n) AS maxn,
             min(bkt) FILTER (WHERE n = (SELECT max(n) FROM dow d2
                                         WHERE d2.user_id = dow.user_id))
               AS peak
      FROM dow GROUP BY user_id
    )
    SELECT user_id, 'daily' AS pattern_type, CAST(peak AS BIGINT) AS peak,
           least(greatest((maxn / (total / 24.0) - 1.0) / 3.0, 0), 1.0)
             AS confidence
    FROM daily
    WHERE total >= 10
      AND least(greatest((maxn / (total / 24.0) - 1.0) / 3.0, 0), 1.0) >= 0.3
    UNION ALL
    SELECT user_id, 'weekly', CAST(peak AS BIGINT),
           least(greatest((maxn / (total / 7.0) - 1.0) / 2.0, 0), 1.0)
    FROM weekly
    WHERE total >= 10
      AND least(greatest((maxn / (total / 7.0) - 1.0) / 2.0, 0), 1.0) >= 0.4
    """,
)
def temporal_cyclic_patterns(spark, sf_dir):
    # cyclic access-pattern detection (reference
    # pattern_detector.go:200-289): hour-of-day / day-of-week histogram
    # concentration per user; exact reference confidence formulas.
    from nornicdb_spark.streaming.patterns import cyclic_patterns

    ev = Catalog(spark, sf_dir).events
    return cyclic_patterns(ev)


@register(
    "inference_evidence_buffer",
    oracle="""
    WITH signals AS (
      SELECT 'User:' || user_id AS src,
             'Type:' || event_type AS dst,
             CASE WHEN event_type IN ('click', 'view') THEN 'coaccess'
                  ELSE 'relates_to' END AS label,
             least(abs(value) / 50.0, 1.0) AS score,
             CAST(time_bucket(INTERVAL '30 minutes', ts) AS VARCHAR)
               AS session_id,
             ts
      FROM events
    ),
    now_t AS (SELECT max(ts) AS now FROM events),
    th(label, mc, ms, mn, ma) AS (VALUES
      ('relates_to', 3, 0.5, 2, 24), ('similar_to', 2, 0.7, 1, 48),
      ('coaccess', 5, 0.3, 3, 12), ('topology', 2, 0.6, 1, 72),
      ('depends_on', 3, 0.6, 2, 168)),
    agg AS (
      SELECT src, dst, label,
             CAST(count(*) AS BIGINT) AS n_signals,
             round(avg(score), 9) AS score_avg,
             CAST(count(DISTINCT CASE WHEN session_id <> '' THEN session_id END)
                  AS BIGINT) AS n_sessions,
             min(ts) AS first_ts, max(ts) AS last_ts
      FROM signals GROUP BY 1, 2, 3
    )
    SELECT src, dst, label, n_signals, score_avg, n_sessions,
           first_ts, last_ts,
           (date_diff('second', first_ts, now_t.now) <= ma * 3600.0
            AND n_signals >= mc AND score_avg >= ms AND n_sessions >= mn)
             AS materialize
    FROM agg JOIN th USING (label), now_t
    """,
)
def inference_evidence_buffer(spark, sf_dir):
    # evidence buffering (reference evidence.go:269-383): signals derived
    # deterministically from the event log accumulate per (src,dst,label)
    # and materialize only past the per-label proof thresholds. The
    # evaluation instant is max(ts) so the batch is reproducible.
    from nornicdb_spark.operators import inference

    ev = Catalog(spark, sf_dir).events
    signals = ev.select(
        F.concat(F.lit("User:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("Type:"), F.col("event_type")).alias("dst"),
        F.when(F.col("event_type").isin("click", "view"), "coaccess")
        .otherwise("relates_to")
        .alias("label"),
        F.least(F.abs(F.col("value")) / 50.0, F.lit(1.0)).alias("score"),
        F.date_trunc("hour", F.col("ts")).cast("string").alias("_h"),
        F.col("ts"),
    ).withColumn(
        "session_id",
        F.window("ts", "30 minutes").start.cast("string"),
    ).drop("_h")
    now = ev.agg(F.max("ts")).collect()[0][0]
    return inference.accumulate_evidence(signals, F.lit(now))


@register(
    "inference_edge_decay",
    oracle="""
    WITH now_t AS (SELECT max(o_orderdate) + INTERVAL '30 days' AS now
                   FROM orders),
    edges AS (
      SELECT o_orderkey AS edge_id,
             0.5 + (o_orderkey % 50) / 100.0 AS confidence,
             o_orderkey % 4 <> 0 AS auto_generated,
             o_orderdate AS created_at,
             o_orderdate + INTERVAL '10 days' AS last_accessed
      FROM orders
    )
    SELECT edge_id, confidence, auto_generated,
           CASE WHEN auto_generated
                     AND date_diff('second', created_at, now_t.now) / 86400.0 > 7
                THEN confidence * power(0.95, greatest(
                       date_diff('second', last_accessed, now_t.now) / 86400.0, 0))
                ELSE confidence END AS new_confidence,
           (auto_generated
            AND date_diff('second', created_at, now_t.now) / 86400.0 > 7
            AND CASE WHEN auto_generated
                          AND date_diff('second', created_at, now_t.now) / 86400.0 > 7
                     THEN confidence * power(0.95, greatest(
                            date_diff('second', last_accessed, now_t.now) / 86400.0, 0))
                     ELSE confidence END < 0.3) AS deleted
    FROM edges, now_t
    """,
)
def inference_edge_decay(spark, sf_dir):
    # edge-confidence decay sweep (reference edge_decay.go: 5%/day,
    # delete < 0.3, 7-day grace, auto-generated only) over a
    # deterministic synthetic edge table; 'now' = max date + 30 days.
    from nornicdb_spark.operators import inference

    o = Catalog(spark, sf_dir).orders
    edges = o.select(
        F.col("o_orderkey").alias("edge_id"),
        (0.5 + (F.col("o_orderkey") % 50) / 100.0).alias("confidence"),
        (F.col("o_orderkey") % 4 != 0).alias("auto_generated"),
        F.col("o_orderdate").alias("created_at"),
        F.date_add(F.col("o_orderdate"), 10).cast("timestamp").alias("last_accessed"),
    )
    now = o.agg(F.date_add(F.max("o_orderdate"), 30)).collect()[0][0]
    out = inference.decay_edges(edges, F.lit(now).cast("timestamp"))
    return out.select(
        "edge_id", "confidence", "auto_generated", "new_confidence", "deleted"
    )


def _stream_near_dup_oracle() -> str:
    # batch replica of the stream-static near-dup join: same shingle
    # hashing, same 32-perm/8-band LSH keys, distinct-h Jaccard — the
    # incremental-ingest result must equal the batch recompute
    from nornicdb_spark.operators.dedup import MERSENNE_P
    from nornicdb_spark.queries.llm_pipeline import _SHINGLES, _perm_values

    return f"""
    WITH {_SHINGLES},
    sh2 AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM sh),
    perms(i, a, b) AS (VALUES {_perm_values()}),
    sigs AS MATERIALIZED (
      SELECT doc_id, i, min((a * h + b) % {MERSENNE_P}) AS sig
      FROM sh2 CROSS JOIN perms GROUP BY doc_id, i
    ),
    bands AS MATERIALIZED (
      SELECT doc_id, i // 4 AS band,
             string_agg(CAST(sig AS VARCHAR), '-' ORDER BY i) AS band_key
      FROM sigs GROUP BY doc_id, i // 4
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT s.doc_id AS stream_doc, c.doc_id AS corpus_doc
      FROM bands s JOIN bands c
        ON s.band = c.band AND s.band_key = c.band_key
      WHERE s.doc_id % 5 = 0 AND c.doc_id % 5 <> 0
    ),
    sizes AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh2 GROUP BY doc_id),
    inter AS MATERIALIZED (
      SELECT cand.stream_doc, cand.corpus_doc, count(*) AS n_inter
      FROM cand
      JOIN sh2 sa ON sa.doc_id = cand.stream_doc
      JOIN sh2 sb ON sb.doc_id = cand.corpus_doc AND sb.h = sa.h
      GROUP BY 1, 2
    )
    SELECT stream_doc, corpus_doc,
           round(CAST(n_inter AS DOUBLE) / (sx.n + sy.n - n_inter), 9)
             AS jaccard
    FROM inter JOIN sizes sx ON sx.doc_id = stream_doc
               JOIN sizes sy ON sy.doc_id = corpus_doc
    WHERE CAST(n_inter AS DOUBLE) / (sx.n + sy.n - n_inter) >= 0.5
    """


@register("stream_dedup_near_dup", oracle=_stream_near_dup_oracle())
def stream_dedup_near_dup(spark, sf_dir):
    # incremental semantic dedup: INCOMING documents (a file stream —
    # Kafka in production) near-dup-checked against a STATIC corpus via
    # a stream-static equi-join on MinHash band keys. The stream side
    # computes its signature with per-ROW narrow expressions
    # (dedup.shingle_hashes_col / minhash_band_keys_col — no explode, no
    # stateful aggregation inside the micro-batch); only candidate pairs
    # reach the Jaccard verify. This is the ingest shape of a 100 TB
    # corpus: the banded index is a maintained table, each arriving batch
    # probes ~n/bucket_count of it, never the full corpus.
    from nornicdb_spark.operators import dedup, scope
    from nornicdb_spark.streaming import structured

    docs = Catalog(spark, sf_dir).documents
    static = docs.filter(F.col("doc_id") % 5 != 0)
    # normalized snapshot (the MaintainedBandIndex layout): band rows do
    # NOT carry the hash sets — the checkpoint stores each doc's array
    # once instead of once per band, and the candidate join shuffles
    # narrow (doc, band, band_key) rows; the verify pulls only candidate
    # docs' hash sets through a keyed join afterwards. The STATIC side is
    # a batch build, so it uses the explode+collect_set pipeline (spread
    # across cores, vectorized) — ~5× faster than the per-row nested
    # expression, which only the STREAM side needs (no explode/groupBy
    # inside a micro-batch). collect_set(h) = the same distinct-hash set.
    static_idx = (
        dedup.shingles(static)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("c_hs"))
        .select(F.col("doc_id").alias("corpus_doc"), "c_hs")
        .localCheckpoint(eager=True)
    )
    scope.escape_frame(static_idx)
    static_bands = static_idx.select(
        "corpus_doc",
        F.posexplode(dedup.minhash_band_keys_col(F.col("c_hs"))).alias(
            "band", "band_key"
        ),
    ).localCheckpoint(eager=True)  # the maintained index snapshot
    scope.escape_frame(static_bands)

    s = (
        structured.read_documents_stream(spark, sf_dir)
        .filter(F.col("doc_id") % 5 == 0)
        .select(
            F.col("doc_id").alias("stream_doc"),
            dedup.shingle_hashes_col("text").alias("s_hs"),
        )
        .filter(F.size("s_hs") > 0)
    )
    sb = s.select(
        "stream_doc",
        "s_hs",
        F.posexplode(dedup.minhash_band_keys_col(F.col("s_hs"))).alias(
            "band", "band_key"
        ),
    )
    cand = (
        sb.join(static_bands, ["band", "band_key"])
        .select("stream_doc", "corpus_doc", "s_hs")
        .dropDuplicates(["stream_doc", "corpus_doc"])
        .join(static_idx, "corpus_doc")
    )
    inter = F.size(F.array_intersect("s_hs", "c_hs")).cast("double")
    jac = inter / (
        F.size("s_hs").cast("double") + F.size("c_hs").cast("double") - inter
    )
    out = (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.5)
        .select("stream_doc", "corpus_doc", F.round("jaccard", 9).alias("jaccard"))
    )
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    return structured.run_to_completion(
        out, f"stream_near_dup_{tag}", mode="append"
    )


def _dup_seeded_embeddings(spark, sf_dir):
    # duplicate-seeded corpus for the maintained-dedup queries: 50
    # exact-copy vectors appended past the CURRENT max id (the
    # llm_pipeline._seeded_embeddings +100000 offset collides with real
    # ids at sf1+, where the derived corpus occupies a dense id range).
    # The copy of vid lands in batch (vid + offset) % 3 — offset ≡ 2
    # (mod 3) for every fixture size, so a copy never shares its
    # original's batch.
    emb = Catalog(spark, sf_dir).embeddings.select("vec_id", "embedding")
    offset = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    return emb.unionByName(
        emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + offset).alias("vec_id"), "embedding"
        )
    )


def _vec_batches(emb):
    return [emb.filter(F.pmod("vec_id", F.lit(3)) == b) for b in range(3)]


from nornicdb_spark.operators import scope as _scope

_VEC_IDX_MEMO = _scope.SessionMemo()


def _maintained_vec_matches(spark, sf_dir):
    # Drive the maintained int8+LSH embedding near-dup index
    # (streaming/neardup.MaintainedVecIndex — the composition SCALING.md
    # specs: hyperplane-LSH band buckets over an int8-code verify
    # payload) through 3 deterministic foreachBatch deliveries: batch b
    # = seeded vectors with vec_id % 3 == b, in order. Every planted
    # exact dup lands in a different batch than its original, so every
    # planted pair crosses a batch boundary and must be caught by the
    # maintained (not snapshot) index; the derived sf1/sf10 corpora add
    # ~0.9999-cosine copy clusters spanning batches. Batches are
    # delivered by direct process_batch calls: foreachBatch semantics
    # with a deterministic batch split, which a file-stream source
    # cannot guarantee. Memoized per (session, sf_dir): the rows-only
    # query and its gate twin share one ingest (deterministic build —
    # the memo changes cost, not results); SessionMemo evicts stopped
    # sessions' entries so dead sessions are not pinned.
    hit = _VEC_IDX_MEMO.get(spark, sf_dir)
    if hit is not None:
        return hit
    import shutil

    from nornicdb_spark.streaming.neardup import MaintainedVecIndex

    emb = _dup_seeded_embeddings(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/vecidx_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedVecIndex(spark, path, dim=dim, threshold=0.95)
    for b, batch in enumerate(_vec_batches(emb)):
        idx.process_batch(batch, batch_id=b)
    it = emb.schema["vec_id"].dataType.simpleString()
    out = idx.matches(id_type=it)
    return _VEC_IDX_MEMO.put(spark, sf_dir, out)


@register("stream_vec_dedup_int8")  # approximate banding — rows-only;
def stream_vec_dedup_int8(spark, sf_dir):  # gate twin is driver-visible
    # matches recorded by the maintained int8+LSH ingest loop: each
    # planted duplicate is rejected against the batch-earlier accepted
    # member of its cluster. LSH banding is seeded-random (hyperplane
    # sign bits over float dots — not portable to a SQL oracle), so this
    # row is rows-only; stream_vec_dedup_int8_gate is the oracle-backed
    # twin proving agreement with the fp32 exact-GEMM greedy semantics.
    return _maintained_vec_matches(spark, sf_dir).select(
        "stream_doc", "corpus_doc", "cosine"
    )


@register(
    "stream_vec_dedup_int8_gate", oracle="SELECT CAST(1 AS BIGINT) AS ok"
)
def stream_vec_dedup_int8_gate(spark, sf_dir):
    # agreement gate: the composed (LSH bands + int8 verify) maintained
    # matches must EQUAL the fp32 exact-GEMM GREEDY-ACCEPT expectation,
    # simulated batch-by-batch (batch b's docs are matched against the
    # union of prior ACCEPTED docs — the maintained index's semantics;
    # a pairwise orientation shortcut is wrong as soon as a cluster has
    # >2 members, the normal case on the derived sf1/sf10 corpora).
    # int8 cosine error (<= ~1e-2) sits far from the planted
    # similarities (exact dups at 1.0, derived copies ~0.9997) and the
    # fixture background (~0.52), so PRECISION is exact (zero extras
    # allowed). Recall is bounded by the banding's designed miss rate —
    # P[miss] ~ 3.7e-8 per near-identical pair, and the sf10 corpus has
    # 4.4M expected pairs (measured: exactly 1 banding miss at cosine
    # 0.99948) — so the recall bar is 0.9999: a thousand times looser
    # than design, a thousand times tighter than any structural bug
    # (the round-9 cap/selectivity bug scored 0.095).
    from nornicdb_spark.operators import dedup, scope

    got = _maintained_vec_matches(spark, sf_dir).select(
        "stream_doc", "corpus_doc"
    )
    batches = _vec_batches(_dup_seeded_embeddings(spark, sf_dir))
    accepted = batches[0]
    want = None
    for batch in batches[1:]:
        pairs = dedup.embedding_near_duplicates(
            accepted.unionByName(batch), threshold=0.95, exact=True
        )
        acc_ids = accepted.select(F.col("vec_id").alias("_acc"))
        # cross pairs only: exactly one side is an already-accepted doc
        flagged = (
            pairs.join(
                acc_ids.withColumnRenamed("_acc", "a").withColumn("_fa", F.lit(1)),
                "a", "left",
            )
            .join(
                acc_ids.withColumnRenamed("_acc", "b").withColumn("_fb", F.lit(1)),
                "b", "left",
            )
            .filter(F.coalesce("_fa", F.lit(0)) != F.coalesce("_fb", F.lit(0)))
        )
        cross = flagged.select(
            F.when(F.col("_fa").isNull(), F.col("a")).otherwise(F.col("b"))
            .alias("stream_doc"),
            F.when(F.col("_fa").isNull(), F.col("b")).otherwise(F.col("a"))
            .alias("corpus_doc"),
        ).localCheckpoint(eager=True)  # 3 reuses: want, matched, next round
        want = cross if want is None else want.unionByName(cross)
        matched = cross.select(F.col("stream_doc").alias("vec_id")).distinct()
        accepted = accepted.unionByName(batch.join(matched, "vec_id", "left_anti"))
        scope.escape_frame(cross)
    n_want = want.count()
    n_agree = got.join(want, ["stream_doc", "corpus_doc"]).count()
    n_got = got.count()
    import math

    ok = int(
        n_want > 0
        and n_got == n_agree  # precision exact: no pair the fp32 path lacks
        and n_agree >= math.ceil(n_want * 0.9999)
    )
    return literal_df(spark, [(ok,)], "ok bigint")
