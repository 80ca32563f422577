"""Scalar kalman.* functions over JSON state strings — the reference's
per-call filter surface (pkg/cypher/kalman_functions.go: kalmanInit :290,
kalmanProcess :360-408, kalmanPredict :440-448, kalmanStateValue :450-470,
kalmanReset :933; state JSON tags at :113-135).

The reference threads filter state through node properties as JSON; these
are the same operations as pure Column expressions (from_json → arithmetic
→ to_json — fully JVM-side, one row at a time with no Python). For ordered
SERIES smoothing use streaming/kalman.py's applyInPandas chains; this
module is the function-call surface.
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F

# field order matches the Go struct marshal order (kalman_functions.go:113)
STATE_SCHEMA = (
    "x double, lx double, p double, k double, e double, q double, r double, "
    "vs double, n bigint"
)

DEFAULTS = {"x": 0.0, "lx": 0.0, "p": 30.0, "k": 0.0, "e": 1.0,
            "q": 0.0001, "r": 88.0, "vs": 10.0, "n": 0}


def kalman_init(config: dict | None = None) -> Column:
    """kalman.init([config]) → state JSON literal (defaults
    kalman_functions.go:206-218; config keys :290-308)."""
    st = dict(DEFAULTS)
    config = config or {}
    if "processNoise" in config:
        st["q"] = float(config["processNoise"]) * 0.001
    if "measurementNoise" in config:
        st["r"] = float(config["measurementNoise"])
    if "initialCovariance" in config:
        st["p"] = float(config["initialCovariance"])
    if "varianceScale" in config:
        st["vs"] = float(config["varianceScale"])
    return F.lit(json.dumps(st, separators=(",", ":")))


def _parse(state: Column) -> Column:
    return F.from_json(state, STATE_SCHEMA)


def _let(value: Column, fn) -> Column:
    """Bind ``value`` ONCE and evaluate ``fn`` over the binding — a
    single-element ``transform`` whose lambda variable is a leaf node.

    Column arithmetic has no local bindings: every ``st["x"]`` reference
    pastes a full copy of ``st``'s subtree into the output expression,
    so a filter step that reads ~15 state fields embeds ~15 copies of
    its INPUT state — and chained steps (``process(z2, r1.state)``)
    grow geometrically (~15^depth nodes). Two chained adaptive steps
    measured ~2 min of pure driver-side analysis. With the lambda
    binding the input subtree appears exactly once per step and chains
    grow linearly. Same arithmetic per row (from_json additionally
    evaluates once instead of per-reference), so values are identical.
    """
    return F.transform(F.array(value), fn)[0]


def kalman_process(measurement: Column, state: Column, target: Column | None = None) -> Column:
    """kalman.process(z, state[, target]) → struct(value, state) — one
    filter step (kalman_functions.go:360-408, incl. the velocity
    projection and setpoint error boost)."""
    def step(st: Column) -> Column:
        velocity = st["x"] - st["lx"]
        x1 = st["x"] + velocity
        lx1 = x1
        if target is None:
            e1 = F.lit(1.0)
        else:
            e1 = F.when(
                (target != F.lit(0.0)) & (lx1 != F.lit(0.0)),
                F.abs(F.lit(1.0) - target / lx1),
            ).otherwise(F.lit(1.0))
        p1 = st["p"] + st["q"] * e1
        k1 = p1 / (p1 + st["r"])
        x2 = x1 + k1 * (measurement.cast("double") - x1)
        p2 = (F.lit(1.0) - k1) * p1
        new_state = F.to_json(F.struct(
            x2.alias("x"), lx1.alias("lx"), p2.alias("p"), k1.alias("k"),
            e1.alias("e"), st["q"].alias("q"), st["r"].alias("r"),
            st["vs"].alias("vs"), (st["n"] + 1).alias("n"),
        ))
        return F.struct(x2.alias("value"), new_state.alias("state"))

    return _let(_parse(state), step)


def kalman_predict(state: Column, steps: Column) -> Column:
    """kalman.predict(state, n) — project n steps by current velocity
    without updating state (kalman_functions.go:440-448)."""
    return _let(
        _parse(state),
        lambda st: st["x"] + steps.cast("double") * (st["x"] - st["lx"]),
    )


def kalman_state_value(state: Column) -> Column:
    """kalman.state(state) — current estimate (kalman_functions.go:450)."""
    return _parse(state)["x"]


def kalman_reset(state: Column) -> Column:
    """kalman.reset(state) — fresh default state of the SAME filter type,
    detected from the state JSON's discriminating field ("pos" →
    velocity, "mode" → adaptive, else basic; kalman_functions.go:933-950)."""
    from nornicdb_spark.functions import kalman_scalar as KS

    return (
        F.when(
            F.get_json_object(state, "$.pos").isNotNull(),
            KS.kalman_velocity_init(),
        )
        .when(
            F.get_json_object(state, "$.mode").isNotNull(),
            KS.kalman_adaptive_init(),
        )
        .otherwise(F.lit(json.dumps(DEFAULTS, separators=(",", ":"))))
    )


# ---- 2-state (position + velocity) filter --------------------------------
# reference kalman_functions.go:138-155 (state), 221-232 (defaults),
# 538-547 (init), 600-660 (process), 693-706 (predict)

VEL_STATE_SCHEMA = (
    "pos double, vel double, p array<double>, qp double, qv double, "
    "r double, dt double, n bigint"
)

VEL_DEFAULTS = {"pos": 0.0, "vel": 0.0, "p": [100.0, 0.0, 0.0, 10.0],
                "qp": 0.1, "qv": 0.01, "r": 1.0, "dt": 1.0, "n": 0}


def _parse_vel(state: Column) -> Column:
    return F.from_json(state, VEL_STATE_SCHEMA)


def kalman_velocity_init(
    initial_pos: float | None = None, initial_vel: float | None = None
) -> Column:
    st = dict(VEL_DEFAULTS)
    if initial_pos is not None:
        st["pos"] = float(initial_pos)
        st["vel"] = float(initial_vel or 0.0)
    return F.lit(json.dumps(st, separators=(",", ":")))


def _vel_step(z: Column, st: Column) -> Column:
    """One predict+update of the 2-state filter over a parsed state
    struct; returns struct(pos, vel, p array, n)."""
    dt = F.when(st["dt"] > 0, st["dt"]).otherwise(F.lit(1.0))
    pred_pos = st["pos"] + st["vel"] * dt
    p00, p01 = st["p"][0], st["p"][1]
    p10, p11 = st["p"][2], st["p"][3]
    pp00 = p00 + dt * p10 + dt * p01 + dt * dt * p11 + st["qp"]
    pp01 = p01 + dt * p11
    pp10 = p10 + dt * p11
    pp11 = p11 + st["qv"]
    innovation = z.cast("double") - pred_pos
    s = pp00 + st["r"]
    k0, k1 = pp00 / s, pp10 / s
    return F.struct(
        (pred_pos + k0 * innovation).alias("pos"),
        (st["vel"] + k1 * innovation).alias("vel"),
        F.array(
            (F.lit(1.0) - k0) * pp00,
            (F.lit(1.0) - k0) * pp01,
            pp10 - k1 * pp00,
            pp11 - k1 * pp01,
        ).alias("p"),
        (st["n"] + 1).alias("n"),
    )


def kalman_velocity_process(measurement: Column, state: Column) -> Column:
    """kalman.velocity.process(z, state) → struct(value, velocity, state)."""

    def step(st: Column) -> Column:
        def emit(u: Column) -> Column:
            new_state = F.to_json(F.struct(
                u["pos"].alias("pos"), u["vel"].alias("vel"), u["p"].alias("p"),
                st["qp"].alias("qp"), st["qv"].alias("qv"), st["r"].alias("r"),
                st["dt"].alias("dt"), u["n"].alias("n"),
            ))
            return F.struct(
                u["pos"].alias("value"), u["vel"].alias("velocity"),
                new_state.alias("state"),
            )

        # u is read 5× — bind the step result too, not just the input
        return _let(_vel_step(measurement, st), emit)

    return _let(_parse_vel(state), step)


def kalman_velocity_predict(state: Column, steps: Column) -> Column:
    """kalman.velocity.predict(state, n) — explicit-velocity projection."""

    def proj(st: Column) -> Column:
        dt = F.when(st["dt"] > 0, st["dt"]).otherwise(F.lit(1.0))
        return st["pos"] + st["vel"] * steps.cast("double") * dt

    return _let(_parse_vel(state), proj)


# ---- adaptive (auto-switching) filter ------------------------------------
# reference kalman_functions.go:158-185 (state), 235-248 (defaults),
# 759-783 (init), 841-938 (process). Mode logic: run the current mode's
# filter, update the trend score, and after the hysteresis window switch
# basic→velocity when |trend| > trendThreshold (seeding the velocity
# state from the basic estimate) or velocity→basic when |trend| <
# stabilityThreshold.

ADAPTIVE_STATE_SCHEMA = (
    f"basic struct<{STATE_SCHEMA}>, velocity struct<{VEL_STATE_SCHEMA}>, "
    "mode string, ss bigint, tt double, st double, hy bigint, n bigint, "
    "lf double, ts double"
)


def kalman_adaptive_init(config: dict | None = None) -> Column:
    config = config or {}
    st = {
        "basic": dict(DEFAULTS), "velocity": dict(VEL_DEFAULTS),
        "mode": "basic", "ss": 0,
        "tt": float(config.get("trendThreshold", 0.1)),
        "st": float(config.get("stabilityThreshold", 0.02)),
        "hy": int(config.get("hysteresis", 10)),
        "n": 0, "lf": 0.0, "ts": 0.0,
    }
    if config.get("initialMode") == "velocity":
        st["mode"] = "velocity"
    return F.lit(json.dumps(st, separators=(",", ":")))


def kalman_adaptive_process(measurement: Column, state: Column) -> Column:
    """kalman.adaptive.process(z, state) → struct(value, mode, state)."""
    return _let(
        F.from_json(state, ADAPTIVE_STATE_SCHEMA),
        lambda st: _let(
            # the velocity-branch result is read ~10× below — bind it
            _vel_step(measurement, st["velocity"]),
            lambda vu: _adaptive_emit(measurement, st, vu),
        ),
    )


def _adaptive_emit(measurement: Column, st: Column, vu: Column) -> Column:
    """Mode selection + state re-marshal over the BOUND parsed state
    ``st`` and velocity-step result ``vu`` (kalman_adaptive_process)."""
    is_vel = st["mode"] == F.lit("velocity")

    # run BOTH branches as expressions; select by mode (codegen'd — the
    # unused branch costs arithmetic, not a Python call)
    # basic step (same math as kalman_process, target-less)
    b = st["basic"]
    velocity_b = b["x"] - b["lx"]
    x1 = b["x"] + velocity_b
    p1 = b["p"] + b["q"]
    k1 = p1 / (p1 + b["r"])
    x2 = x1 + k1 * (measurement.cast("double") - x1)
    p2 = (F.lit(1.0) - k1) * p1

    filtered = F.when(is_vel, vu["pos"]).otherwise(x2)
    trend = F.when(is_vel, vu["vel"]).otherwise(x2 - x1)

    n1 = st["n"] + 1
    ss1 = st["ss"] + 1
    trend_mag = F.abs(trend)
    to_velocity = (~is_vel) & (ss1 >= st["hy"]) & (trend_mag > st["tt"])
    to_basic = is_vel & (ss1 >= st["hy"]) & (trend_mag < st["st"])
    new_mode = (
        F.when(to_velocity, F.lit("velocity"))
        .when(to_basic, F.lit("basic"))
        .otherwise(st["mode"])
    )
    new_ss = F.when(to_velocity | to_basic, F.lit(0).cast("long")).otherwise(ss1)

    new_basic = F.struct(
        # velocity→basic sync: X = vel.Pos, LastX = Pos - Vel
        F.when(to_basic, vu["pos"]).when(is_vel, b["x"]).otherwise(x2).alias("x"),
        F.when(to_basic, vu["pos"] - vu["vel"]).when(is_vel, b["lx"]).otherwise(x1).alias("lx"),
        F.when(is_vel, b["p"]).otherwise(p2).alias("p"),
        F.when(is_vel, b["k"]).otherwise(k1).alias("k"),
        b["e"].alias("e"), b["q"].alias("q"), b["r"].alias("r"),
        b["vs"].alias("vs"),
        F.when(is_vel, b["n"]).otherwise(b["n"] + 1).alias("n"),
    )
    v = st["velocity"]
    new_velocity = F.struct(
        # basic→velocity sync: Pos = basic X, Vel = trend
        F.when(to_velocity, x2).when(is_vel, vu["pos"]).otherwise(v["pos"]).alias("pos"),
        F.when(to_velocity, trend).when(is_vel, vu["vel"]).otherwise(v["vel"]).alias("vel"),
        F.when(is_vel, vu["p"]).otherwise(v["p"]).alias("p"),
        v["qp"].alias("qp"), v["qv"].alias("qv"), v["r"].alias("r"),
        v["dt"].alias("dt"),
        F.when(is_vel, vu["n"]).otherwise(v["n"]).alias("n"),
    )
    new_state = F.to_json(F.struct(
        new_basic.alias("basic"), new_velocity.alias("velocity"),
        new_mode.alias("mode"), new_ss.alias("ss"), st["tt"].alias("tt"),
        st["st"].alias("st"), st["hy"].alias("hy"), n1.alias("n"),
        filtered.alias("lf"), trend.alias("ts"),
    ))
    return F.struct(
        filtered.alias("value"), new_mode.alias("mode"), new_state.alias("state")
    )
