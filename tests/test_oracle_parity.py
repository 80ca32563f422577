"""Every registered query with an oracle must match DuckDB at the test SF.

This is the local twin of the driver's CORRECTNESS gate — parametrized over
the full registry so a new query is covered the moment it's registered.
"""

from __future__ import annotations

import pytest

from nornicdb_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    compare(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
