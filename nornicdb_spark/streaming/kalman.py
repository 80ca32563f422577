"""Kalman smoothing as grouped, ordered Pandas UDFs.

Reference: kalman.process scalar filter (pkg/cypher/kalman_functions.go:
360-408 — velocity-projected 1-D filter; defaults X=0, LastX=0, P=30,
Q=0.0001, R=88, E=1 at 206-218) and kalman.velocity.process 2-state
constant-velocity filter (kalman_functions.go:599-655; defaults
P=[100,0,0,10], QPos=0.1, QVel=0.01, R=1, dt=1 at 221-232).

The reference threads JSON state through per-call invocations; the Spark
formulation is the SURVEY §7 "hard parts" prescription: order-dependent →
``applyInPandas`` over groups sorted by timestamp. Each group's series is
filtered sequentially inside one Arrow batch; groups are independent →
full cluster parallelism across keys.

Closures are self-contained (no module-global references) so executor
workers never import this package.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kalman_smooth(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    q: float = 0.0001,
    r: float = 88.0,
    p0: float = 30.0,
) -> DataFrame:
    """Scalar Kalman filter per key over time-ordered values.

    Returns (key, ts, value, filtered) — ``filtered`` reproduces the
    reference's kalman.process chain exactly (same defaults, same
    velocity-projection quirk)."""
    schema = f"{key_col} long, {ts_col} timestamp, {value_col} double, filtered double"
    kc, tc, vc = key_col, ts_col, value_col
    q_, r_, p0_ = float(q), float(r), float(p0)

    def per_key(pdf):
        pdf = pdf.sort_values([tc, "event_id"] if "event_id" in pdf else tc)
        x = last_x = 0.0
        p = p0_
        out = []
        for z in pdf[vc].astype("float64"):
            velocity = x - last_x          # project ahead using velocity
            x += velocity
            last_x = x
            p = p + q_ * 1.0               # E = 1 (no setpoint target)
            k = p / (p + r_)
            x += k * (z - x)
            p = (1.0 - k) * p
            out.append(x)
        res = pdf[[kc, tc, vc]].copy()
        res["filtered"] = out
        return res

    return df.select(kc, tc, vc, *(["event_id"] if "event_id" in df.columns else [])) \
        .groupBy(kc).applyInPandas(per_key, schema=schema)


def kalman_velocity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    q_pos: float = 0.1,
    q_vel: float = 0.01,
    r: float = 1.0,
    dt: float = 1.0,
) -> DataFrame:
    """2-state constant-velocity Kalman filter per key: returns
    (key, ts, value, pos, vel) — position estimate + rate-of-change
    (the reference's momentum-tracking use case)."""
    schema = (
        f"{key_col} long, {ts_col} timestamp, {value_col} double, "
        "pos double, vel double"
    )
    kc, tc, vc = key_col, ts_col, value_col
    qp, qv, r_, dt_ = float(q_pos), float(q_vel), float(r), float(dt)

    def per_key(pdf):
        pdf = pdf.sort_values([tc, "event_id"] if "event_id" in pdf else tc)
        pos = vel = 0.0
        p00, p01, p10, p11 = 100.0, 0.0, 0.0, 10.0
        pos_out, vel_out = [], []
        for z in pdf[vc].astype("float64"):
            # predict
            pred_pos = pos + vel * dt_
            pred_vel = vel
            n00 = p00 + dt_ * p10 + dt_ * p01 + dt_ * dt_ * p11 + qp
            n01 = p01 + dt_ * p11
            n10 = p10 + dt_ * p11
            n11 = p11 + qv
            # update
            innov = z - pred_pos
            s = n00 + r_
            k0, k1 = n00 / s, n10 / s
            pos = pred_pos + k0 * innov
            vel = pred_vel + k1 * innov
            p00 = (1 - k0) * n00
            p01 = (1 - k0) * n01
            p10 = n10 - k1 * n00
            p11 = n11 - k1 * n01
            pos_out.append(pos)
            vel_out.append(vel)
        res = pdf[[kc, tc, vc]].copy()
        res["pos"] = pos_out
        res["vel"] = vel_out
        return res

    return df.select(kc, tc, vc, *(["event_id"] if "event_id" in df.columns else [])) \
        .groupBy(kc).applyInPandas(per_key, schema=schema)


def kalman_final_velocity(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    **kwargs,
) -> DataFrame:
    """One row per key: the velocity-filter STATE after the last
    observation — exactly the reference tracker's
    ``intervalFilter.Velocity()`` (tracker.go:744-746), the quantity
    GetHotNodes/GetColdNodes rank by. Same arithmetic as
    :func:`kalman_velocity`, keeping only the tail state per key — the
    fold consumes observations in the same (ts, event_id) order the
    full filter and the oracle use, so duplicate timestamps cannot
    make 'last' ambiguous."""
    schema = f"{key_col} long, vel double"
    kc, tc, vc = key_col, ts_col, value_col

    def per_key_tail(pdf):
        import pandas as pd

        pdf = pdf.sort_values([tc, "event_id"] if "event_id" in pdf else tc)
        pos = vel = 0.0
        p00, p01, p10, p11 = 100.0, 0.0, 0.0, 10.0
        qp = float(kwargs.get("q_pos", 0.1))
        qv = float(kwargs.get("q_vel", 0.01))
        r_ = float(kwargs.get("r", 1.0))
        dt_ = float(kwargs.get("dt", 1.0))
        for z in pdf[vc].astype("float64"):
            pred_pos = pos + vel * dt_
            n00 = p00 + dt_ * p10 + dt_ * p01 + dt_ * dt_ * p11 + qp
            n01 = p01 + dt_ * p11
            n10 = p10 + dt_ * p11
            n11 = p11 + qv
            innov = z - pred_pos
            s = n00 + r_
            k0, k1 = n00 / s, n10 / s
            pos = pred_pos + k0 * innov
            vel = vel + k1 * innov
            p00 = (1 - k0) * n00
            p01 = (1 - k0) * n01
            p10 = n10 - k1 * n00
            p11 = n11 - k1 * n01
        return pd.DataFrame({kc: [pdf[kc].iloc[0]], "vel": [vel]})

    return (
        df.select(kc, tc, vc, *(["event_id"] if "event_id" in df.columns else []))
        .groupBy(kc)
        .applyInPandas(per_key_tail, schema=schema)
    )


def kalman_adaptive(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    trend_threshold: float = 0.1,
    stability_threshold: float = 0.02,
    hysteresis: int = 10,
) -> DataFrame:
    """kalman.adaptive.process chain per key — the auto-switching filter
    (reference kalman_functions.go:841-905 kalmanAdaptiveProcess, defaults
    at 234-250): runs the basic filter until the trend score exceeds
    ``trend_threshold``, switches to the velocity filter, and falls back
    when the trend magnitude drops under ``stability_threshold``; switches
    are rate-limited by the ``hysteresis`` observation count and states
    are synced across the switch exactly as the reference does.

    Returns (key, ts, value, filtered, mode)."""
    schema = (
        f"{key_col} long, {ts_col} timestamp, {value_col} double, "
        "filtered double, mode string"
    )
    kc, tc, vc = key_col, ts_col, value_col
    tt, st, hy = float(trend_threshold), float(stability_threshold), int(hysteresis)

    def per_key(pdf):
        pdf = pdf.sort_values([tc, "event_id"] if "event_id" in pdf else tc)
        # basic filter state (defaults kalman_functions.go:206-218)
        bx = b_last = 0.0
        bp = 30.0
        bq, br = 0.0001, 88.0
        # velocity filter state (defaults kalman_functions.go:221-232)
        pos = vel = 0.0
        p00, p01, p10, p11 = 100.0, 0.0, 0.0, 10.0
        qp, qv, vr, dt = 0.1, 0.01, 1.0, 1.0
        mode, since_switch, trend = "basic", 0, 0.0
        out_val, out_mode = [], []
        for z in pdf[vc].astype("float64"):
            if mode == "velocity":
                pred_pos = pos + vel * dt
                pred_vel = vel
                n00 = p00 + dt * p10 + dt * p01 + dt * dt * p11 + qp
                n01 = p01 + dt * p11
                n10 = p10 + dt * p11
                n11 = p11 + qv
                s = n00 + vr
                k0, k1 = n00 / s, n10 / s
                innov = z - pred_pos
                pos = pred_pos + k0 * innov
                vel = pred_vel + k1 * innov
                p00 = (1 - k0) * n00
                p01 = (1 - k0) * n01
                p10 = n10 - k1 * n00
                p11 = n11 - k1 * n01
                filtered = pos
                trend = vel
            else:
                velocity = bx - b_last
                bx += velocity
                b_last = bx
                bp = bp + bq * 1.0
                k = bp / (bp + br)
                bx += k * (z - bx)
                bp = (1.0 - k) * bp
                filtered = bx
                trend = bx - b_last
            since_switch += 1
            if since_switch >= hy:
                mag = abs(trend)
                if mode == "basic" and mag > tt:
                    mode, since_switch = "velocity", 0
                    pos, vel = bx, trend          # sync (ref :887-888)
                elif mode == "velocity" and mag < st:
                    mode, since_switch = "basic", 0
                    bx, b_last = pos, pos - vel   # sync (ref :894-895)
            out_val.append(filtered)
            out_mode.append(mode)
        res = pdf[[kc, tc, vc]].copy()
        res["filtered"] = out_val
        res["mode"] = out_mode
        return res

    return df.select(kc, tc, vc, *(["event_id"] if "event_id" in df.columns else [])) \
        .groupBy(kc).applyInPandas(per_key, schema=schema)
