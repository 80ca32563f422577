"""Cluster table layout — partitioned writes for probe-pruned indexes.

The partitioned indexes (IVF-PQ codes repartitioned by ``list_id``,
the maintained near-dup band index) promise "written partitionBy on a
real cluster" so probe filters prune whole directories instead of
scanning every file. This module makes that executable: one helper that
lays a DataFrame out hive-partitioned, and a reader whose scans carry
``PartitionFilters`` for equality/IN probes on the partition column
(plan-tested in tests/test_plans.py). At 100 TB this is the difference
between an ADC scan touching n_probe/n_lists of the codes and touching
all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from nornicdb_spark.operators.localframe import literal_df

# Default hash-partition bucket count for the maintained indexes'
# pruned tables (near-dup bands/payload, graph nodes/merges, BM25 term
# buckets). One home so a cluster deployment retunes it once: size as
# index_bytes / target_partition_bytes (~128 MB) — e.g. ~1024 for a
# 100 TB corpus' band index; locally a modest default keeps test
# directory counts sane without changing the plan shape.
DEFAULT_N_PK = 64


def recover_interrupted_swap(path: str) -> None:
    """Finish a :func:`rewrite_partitioned` swap that crashed between its
    two renames: ``<path>.old`` holding the only copy of the data is
    restored to ``path``; a leftover ``.old`` beside an intact ``path``
    (cleanup crashed after a COMPLETED swap) is removed. Callers that
    probe the table before rewriting (the maintained indexes' compact()
    entry points) run this first so a default-argument re-run actually
    performs the recovery the error messages promise."""
    import os
    import shutil

    old = f"{path}.old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)  # completed swap whose cleanup crashed
        else:
            os.rename(old, path)  # interrupted swap — restore


def write_partitioned(
    df: DataFrame, path: str, *partition_cols: str, mode: str = "overwrite"
) -> None:
    """Write ``df`` as parquet hive-partitioned by ``partition_cols`` —
    equality/IN filters on those columns become directory pruning
    (``PartitionFilters``) on read, and appends land as new files inside
    existing partitions (parallel per-partition writers on a cluster)."""
    if not partition_cols:
        raise ValueError("write_partitioned needs at least one partition column")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a :func:`write_partitioned` table. Pass ``schema`` (including
    the partition columns) when the directory may be file-less — appended
    empty batches leave nothing to infer from."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a maintained-index table that may not exist yet (fresh path,
    no bootstrap, or only empty batches so far): a missing path reads as
    an empty table with the explicit ``schema``, so first-batch ingest
    and early monitoring reads need no special-casing. The explicit
    schema also covers file-less directories appends can leave behind."""
    from pyspark.errors import AnalysisException

    import os

    try:
        return spark.read.schema(schema).parquet(path)
    except AnalysisException:
        if os.path.exists(f"{path}.old"):
            # a rewrite_partitioned swap crashed between its two renames:
            # the data is intact in <path>.old but a silent empty read
            # here would make the index "forget" its corpus — be loud
            raise RuntimeError(
                f"{path} is missing but {path}.old exists — an "
                "interrupted compaction left the table un-swapped. "
                "Re-run the compaction (it restores the original "
                "directory first) or rename the .old directory back."
            )
        return literal_df(spark, [], schema)


def stored_col_type(spark: SparkSession, path: str, col: str) -> str | None:
    """Recover a column's type from a stored table's schema (the caller
    supplied the id type at write time; reads without a reference frame
    get it back here). ``None`` when the table does not exist yet — but
    NOT when it is merely half-swapped: a missing path with a
    ``<path>.old`` sibling is an interrupted compaction, and treating it
    as 'never ingested' would let a default-argument compact() skip the
    restore silently. Same loud refusal as :func:`read_or_empty`."""
    from pyspark.errors import AnalysisException

    import os

    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        if os.path.exists(f"{path}.old"):
            raise RuntimeError(
                f"{path} is missing but {path}.old exists — an "
                "interrupted compaction left the table un-swapped. "
                "Run recover_interrupted_swap (compact() does so "
                "automatically) or rename the .old directory back."
            )
        return None
    return df.schema[col].dataType.simpleString()


def rewrite_partitioned(
    spark: SparkSession,
    path: str,
    schema: str,
    transform,
    *partition_cols: str,
) -> None:
    """Maintenance-window rewrite of a partitioned table: read ``path``
    with ``schema``, apply ``transform``, write to a staging sibling,
    then swap directories. For compacting ingest-partitioned tables
    (``src_batch=N/...`` accumulation) back to a bounded directory
    count. The swap is two renames on a local/HDFS-style filesystem;
    on object stores the same shape is a manifest/metastore pointer
    swap. MUST run with no concurrent writer (stream stopped). A crash
    between the two renames leaves the table at ``<path>.old`` — the
    next run restores it first (and :func:`read_or_empty` refuses to
    read the half-swapped state as an empty table)."""
    import os
    import shutil

    recover_interrupted_swap(path)
    df = transform(spark.read.schema(schema).parquet(path))
    staging, old = f"{path}.compacting", f"{path}.old"
    shutil.rmtree(staging, ignore_errors=True)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(staging)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
