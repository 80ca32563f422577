"""Mini replica of the driver's DuckDB-oracle comparison.

Canonicalization: sort columns by name, normalize numerics to
float64/int64, round floats to 9 significant digits, stringify
timestamps, sort rows, compare. Mirrors the driver's
"row-count + schema + order-insensitive value-hash" gate closely enough
that green here predicts green in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def _round_sig(x: float, sig: int = 9) -> float:
    if x == 0 or not math.isfinite(x):
        return x
    return round(x, sig - int(math.floor(math.log10(abs(x)))) - 1)


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_bool_dtype(s):
            out[col] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            out[col] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.astype("float64").map(
                lambda v: _round_sig(v) if pd.notna(v) else np.nan
            )
        elif pd.api.types.is_datetime64_any_dtype(s):
            out[col] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        else:
            out[col] = s.astype("string")
    res = pd.DataFrame(out)
    res = res.sort_values(by=list(res.columns), na_position="first").reset_index(
        drop=True
    )
    return res


def compare(spark_df, duck_con, sql: str) -> None:
    raw_got = spark_df.toPandas()
    raw_want = duck_con.execute(sql).df()
    # dtype *kind* must agree (int vs float vs str) — mirrors the driver's
    # schema check; e.g. duckdb sum(BIGINT) silently widens to HUGEINT
    # (float64 in pandas) and must be CAST in the oracle instead.
    def kind(s: pd.Series) -> str:
        k = s.dtype.kind
        return {"i": "int", "u": "int", "f": "float", "c": "float",
                "b": "bool", "M": "timestamp"}.get(k, "other")

    for c in set(raw_got.columns) & set(raw_want.columns):
        assert kind(raw_got[c]) == kind(raw_want[c]), (
            f"dtype kind mismatch on {c!r}: spark={raw_got[c].dtype} "
            f"oracle={raw_want[c].dtype}"
        )
    got = canonicalize(raw_got)
    want = canonicalize(raw_want)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-7, atol=1e-9)
