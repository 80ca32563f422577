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


def kalman_process(measurement: Column, state: Column, target: Column | None = None) -> Column:
    """kalman.process(z, state[, target]) → struct(value, state) — one
    filter step (kalman_functions.go:360-408, incl. the velocity
    projection and setpoint error boost)."""
    st = _parse(state)
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


def kalman_predict(state: Column, steps: Column) -> Column:
    """kalman.predict(state, n) — project n steps by current velocity
    without updating state (kalman_functions.go:440-448)."""
    st = _parse(state)
    return st["x"] + steps.cast("double") * (st["x"] - st["lx"])


def kalman_state_value(state: Column) -> Column:
    """kalman.state(state) — current estimate (kalman_functions.go:450)."""
    return _parse(state)["x"]


def kalman_reset(state: Column) -> Column:
    """kalman.reset(state) — fresh default state (basic filter;
    kalman_functions.go:933-950)."""
    return F.lit(json.dumps(DEFAULTS, separators=(",", ":")))
