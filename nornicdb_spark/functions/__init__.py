"""Scalar-function surface — SURVEY §2.6.

Everything here is a *Column builder*: pure ``pyspark.sql.functions``
compositions that stay inside whole-stage codegen (no Python UDFs). The
reference dispatches these by name at eval time
(pkg/cypher/functions_eval_functions.go, functions_eval_math.go,
apoc_collections.go); our equivalents are expression constructors used by
queries and, later, the Cypher frontend.
"""

from nornicdb_spark.functions.spatial import (  # noqa: F401
    point,
    haversine_distance_m,
    within_bbox,
    within_distance,
)
from nornicdb_spark.functions.temporal import (  # noqa: F401
    duration_between,
    duration_in_days,
    duration_in_seconds,
)
from nornicdb_spark.functions import apoc  # noqa: F401
