"""Duration functions — Cypher duration decomposition (SURVEY §2.6
temporal row; reference pkg/cypher/duration.go:126-508: CypherDuration is
a months/days/seconds triple, duration.between/inMonths/inDays/inSeconds).

Semantics implemented (calendar-aware, matching Cypher's duration.between
on dates): whole months first — one month from s is the same day-of-month
one month later — then whole days of the remainder, then seconds. All
native Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _whole_months(start: Column, end: Column) -> Column:
    """Calendar months between: 12·Δyear + Δmonth, minus one when the
    end's day-of-month hasn't reached the start's yet."""
    raw = (F.year(end) - F.year(start)) * 12 + (F.month(end) - F.month(start))
    return (raw - F.when(F.dayofmonth(end) < F.dayofmonth(start), 1).otherwise(0)).cast(
        "long"
    )


def duration_between(start: Column, end: Column) -> Column:
    """duration.between(s, e) → struct(months, days, seconds) for
    date-typed inputs (reference duration.go:126-208 decomposition)."""
    months = _whole_months(start, end)
    after_months = F.add_months(start, months.cast("int"))
    days = F.datediff(end, after_months).cast("long")
    return F.struct(
        months.alias("months"), days.alias("days"), F.lit(0).cast("long").alias("seconds")
    )


def duration_in_months(start: Column, end: Column) -> Column:
    """duration.inMonths — whole calendar months only."""
    return _whole_months(start, end)


def duration_in_days(start: Column, end: Column) -> Column:
    """duration.inDays — whole days, no month normalization."""
    return F.datediff(end, start).cast("long")


def duration_in_seconds(start: Column, end: Column) -> Column:
    """duration.inSeconds for timestamp inputs."""
    return (F.unix_timestamp(end) - F.unix_timestamp(start)).cast("long")
