"""Query registry: every SURVEY §2 operator exposed as a named query.

Each query is ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle SQL string over the same parquet tables. The driver runs
both at sf0.01 and hash-compares (CORRECTNESS_r{N}.json). Column names are
aligned on both sides; ORDER/LIMIT queries carry total tiebreakers so the
selected row set is deterministic.

Modules register into QUERIES/ORACLES at import time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the registry."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Registration order matters: the driver's correctness harness verifies the
# first N registry entries, so families without a driver-verified row yet
# (search, LLM pipeline, temporal, mutations, Cypher frontend, functions,
# sources) register before the relational/graph families that were fully
# hash-stamped in round 1.
from nornicdb_spark.queries import search  # noqa: E402,F401
from nornicdb_spark.queries import llm_pipeline  # noqa: E402,F401
from nornicdb_spark.queries import temporal  # noqa: E402,F401
from nornicdb_spark.queries import mutations  # noqa: E402,F401
from nornicdb_spark.queries import functions_ext  # noqa: E402,F401
from nornicdb_spark.queries import sources_io  # noqa: E402,F401
from nornicdb_spark.queries import cypher_queries  # noqa: E402,F401
from nornicdb_spark.queries import relational  # noqa: E402,F401
from nornicdb_spark.queries import graph  # noqa: E402,F401

# Within the order above, oracle-backed queries register ahead of rows-only
# ones (stable sort) so hash-comparable entries fill the driver's verification
# window first.
_ordered = sorted(QUERIES, key=lambda n: n not in ORACLES)
_reordered = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "register"]
