"""Bucketed-table utilities — the 100 TB co-located-join story made
concrete.

At cluster scale the repeated fact-fact joins (orders ⋈ lineitem on the
order key, expands on src/dst) should not shuffle per query: write both
sides bucketed by the join key once, and every subsequent equi-join on
that key is exchange-free (Spark reads matching buckets pair-wise).
`localCheckpoint` adjacency is the single-session analogue; bucketed
tables are the durable, cross-job one. tests/test_plans.py asserts the
Exchange actually disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Sorting within buckets additionally removes the Sort from
    sort-merge joins."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two tables previously written with :func:`write_bucketed` on
    the same key/bucket count — planned without a shuffle exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
