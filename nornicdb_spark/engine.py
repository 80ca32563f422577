"""Engine facade — the embedded-API equivalent of the reference's
``nornicdb.Open(dir) → DB.Cypher(ctx, query, params)``
(pkg/nornicdb/db.go:434, 1620), Spark-first: queries return DataFrames,
never collected driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.cypher.compiler import compile_cypher
from nornicdb_spark.cypher.parser import parse


class Engine:
    """One graph database over a directory of parquet tables.

    >>> eng = Engine(spark, "/root/testdata/sf0.001")
    >>> eng.cypher("MATCH (c:Customer) RETURN count(*) AS n").show()
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        from nornicdb_spark.catalog import shared_catalog

        self.spark = spark
        # shared read-only catalog: plans and the materialized adjacency
        # are reused across Engines; writes live in this Engine's store
        self.catalog = shared_catalog(spark, sf_dir)
        self._store = None

    @property
    def store(self):
        """Session-scoped mutable graph store — created on first use;
        reads and writes in this Engine share its table versions
        (the batch analogue of the reference's implicit transaction)."""
        if self._store is None:
            from nornicdb_spark.cypher.store import GraphStore

            self._store = GraphStore(self.catalog)
        return self._store

    def cypher(self, query: str, params: dict | None = None) -> DataFrame:
        """Execute a Cypher query; returns the result DataFrame
        (lazy — Catalyst plans it with the rest of the job). Write
        queries (CREATE/MERGE/SET/REMOVE/DELETE) mutate this Engine's
        store eagerly and return a one-row stats summary."""
        from nornicdb_spark.cypher.compiler import Compiler
        from nornicdb_spark.cypher.parser import parse as _parse

        stripped = query.lstrip()
        head = stripped.split(None, 1)[0].upper() if stripped else ""
        if head == "EXPLAIN":
            # Neo4j EXPLAIN: plan only, nothing executes (reference
            # explain.go:37-63) — one row with the formatted Spark plan
            body = stripped.split(None, 1)[1]
            return self.spark.createDataFrame(
                [(self.explain(body),)], "plan string"
            )
        if head == "PROFILE":
            # PROFILE runs the query; per-operator runtime rows are a
            # server-side concern — results come back like a plain run
            query = stripped.split(None, 1)[1]
        return Compiler(self.catalog, params, store=self.store).compile(_parse(query))

    def explain(self, query: str, params: dict | None = None) -> str:
        """EXPLAIN (reference explain.go:37-63): parsed clause summary +
        Spark's formatted physical plan for the compiled DataFrame."""
        ast = parse(query)
        lines = ["=== Cypher AST ==="]
        for clause in ast.clauses:
            lines.append(f"  {type(clause).__name__}")
        df = compile_cypher(self.catalog, query, params)
        lines.append("=== Physical plan ===")
        lines.append(df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        ))
        return "\n".join(lines)
