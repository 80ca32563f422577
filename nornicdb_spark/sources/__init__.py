"""Sources & sinks — SURVEY §2.1 (LOAD CSV, apoc.load.json/csv,
apoc.export.*, Neo4j-export JSON import)."""

from nornicdb_spark.sources.loaders import (  # noqa: F401
    load_csv,
    load_json,
    export_csv,
    export_json,
)
from nornicdb_spark.sources.neo4j_json import (  # noqa: F401
    export_graph_json,
    import_graph_json,
)
