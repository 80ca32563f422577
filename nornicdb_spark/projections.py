"""Named graph projections — gds.graph.project / list / drop (reference
pkg/cypher/fastrp.go:1-27 API doc; SURVEY §2.9 projection row).

A projection is a (nodes, edges) DataFrame pair registered under a name
and persisted in Spark's block-manager cache, so repeated algorithm calls
over the same subgraph skip re-derivation — the batch analogue of the
reference's in-memory graph catalog.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from nornicdb_spark.catalog import PropertyGraph


@dataclass
class ProjectionInfo:
    name: str
    node_count: int
    relationship_count: int


class GraphCatalog:
    """gds.graph.* surface: named, cached subgraph projections."""

    def __init__(self):
        self._graphs: dict[str, PropertyGraph] = {}

    def project(
        self, name: str, nodes: DataFrame, edges: DataFrame
    ) -> ProjectionInfo:
        """gds.graph.project — cache + register a projection. Re-projecting
        an existing name replaces it (drop first)."""
        if name in self._graphs:
            self.drop(name)
        g = PropertyGraph(nodes=nodes.cache(), edges=edges.cache())
        self._graphs[name] = g
        return ProjectionInfo(
            name=name,
            node_count=g.nodes.count(),  # also materializes the cache
            relationship_count=g.edges.count(),
        )

    def get(self, name: str) -> PropertyGraph:
        if name not in self._graphs:
            raise KeyError(f"gds: graph {name!r} not projected")
        return self._graphs[name]

    def list(self) -> list[ProjectionInfo]:
        """gds.graph.list."""
        return [
            ProjectionInfo(n, g.nodes.count(), g.edges.count())
            for n, g in sorted(self._graphs.items())
        ]

    def drop(self, name: str) -> None:
        """gds.graph.drop — unpersist + deregister, including any resident
        adjacency/memo checkpoints algorithms built over the projection."""
        g = self._graphs.pop(name)
        g.release()
        g.nodes.unpersist()
        g.edges.unpersist()


# process-wide default catalog — the frontend's gds.graph.* procedures
# resolve names here (reference keeps a global projections map,
# fastrp.go graphProjections)
DEFAULT_CATALOG = GraphCatalog()


def get_projection(name: str) -> PropertyGraph | None:
    try:
        return DEFAULT_CATALOG.get(name)
    except KeyError:
        return None
