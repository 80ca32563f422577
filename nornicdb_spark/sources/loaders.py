"""File loaders / exporters — SURVEY §2.1.

The reference routes LOAD CSV but leaves it unsupported in embedded mode
(pkg/cypher/clauses.go:1799-1801) and implements apoc.load.json /
apoc.load.csv / apoc.export.* imperatively (apoc_load_export.go:25-624).
Spark's readers are strictly superior: distributed, schema-inferring,
predicate-pushing. These wrappers exist to (a) pin the semantics the
Cypher surface expects (one row per record, header handling, type
inference) and (b) give the frontend a stable internal API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load_csv(
    spark: SparkSession,
    path: str,
    header: bool = True,
    infer_schema: bool = True,
    **options,
) -> DataFrame:
    """LOAD CSV [WITH HEADERS] / apoc.load.csv (reference
    apoc_load_export.go:108): distributed CSV scan; header=False yields
    Cypher's positional `row` list as columns _c0.._cN."""
    return (
        spark.read.options(
            header=str(header).lower(), inferSchema=str(infer_schema).lower(), **options
        ).csv(path)
    )


def load_json(spark: SparkSession, path: str, multiline: bool = False, **options) -> DataFrame:
    """apoc.load.json / jsonArray (reference apoc_load_export.go:25,572):
    JSON-lines by default; multiline=True for one big array document."""
    return spark.read.options(multiLine=str(multiline).lower(), **options).json(path)


def export_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """apoc.export.json.query/all (reference apoc_load_export.go:222):
    result table → JSON lines (distributed write, one file per task)."""
    df.write.mode(mode).json(path)


def export_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """apoc.export.csv.query/all (reference apoc_load_export.go:368)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)
