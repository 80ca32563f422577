"""String functions with no JVM-native expression.

Only Unicode normalization lives here — everything else in the string
surface compiles to built-in Column expressions. Arrow-batched pandas
UDF per SURVEY §2.12 (never row-at-a-time F.udf).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """normalize(s[, form]) — Unicode normalization (reference
    functions_eval_functions.go normalize; openCypher 9 normalize())."""
    if form not in _FORMS:
        raise ValueError(f"normalize form must be one of {_FORMS}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm(col)
