"""Scalar-function + procedure queries — SURVEY §2.6 tail (spatial,
durations, APOC coll/map/convert) and §2.8 introspection procedures.

Coordinates for spatial tests are synthesized deterministically from keys
(the TPC-H-ish tables carry no geo columns); the oracle restates the same
synthesis so the trig pipeline itself is what's checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark import procedures
from nornicdb_spark.catalog import Catalog
from nornicdb_spark.functions import apoc, spatial, temporal
from nornicdb_spark.queries import register


def _cat(spark, sf_dir):
    return Catalog(spark, sf_dir)


@register(
    "spatial_haversine_distance",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 120) - 60 + 0.25  AS lat,
             (c_custkey % 300) - 150 + 0.5  AS lon
      FROM customer
    )
    SELECT c_custkey AS c_key,
           2.0 * 6371000.0 * asin(sqrt(
             sin(radians(0.0 - lat) / 2) * sin(radians(0.0 - lat) / 2)
             + cos(radians(lat)) * cos(radians(0.0))
               * sin(radians(0.0 - lon) / 2) * sin(radians(0.0 - lon) / 2)
           )) AS dist_m,
           CASE WHEN abs(lon) <= 30 AND abs(lat) <= 30 THEN TRUE ELSE FALSE END
             AS in_bbox
    FROM pts
    """,
)
def spatial_haversine_distance(spark, sf_dir):
    # point / point.distance / point.withinBBox (reference
    # executor_show.go:141-148): haversine to the origin plus a bbox
    # predicate, all native trig expressions.
    c = _cat(spark, sf_dir).customer
    lat = (F.col("c_custkey") % 120 - 60 + 0.25).cast("double")
    lon = (F.col("c_custkey") % 300 - 150 + 0.5).cast("double")
    p = spatial.point(lon, lat)
    origin = spatial.point(F.lit(0.0), F.lit(0.0))
    return c.select(
        F.col("c_custkey").alias("c_key"),
        spatial.point_distance(p, origin).alias("dist_m"),
        spatial.within_bbox(p, -30.0, -30.0, 30.0, 30.0).alias("in_bbox"),
    )


@register(
    "spatial_polygon_contains",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 120) - 60 + 0.25  AS y,
             (c_custkey % 300) - 150 + 0.5  AS x
      FROM customer
    )
    SELECT c_custkey AS c_key,
           -- the diamond |x|+|y| <= 50 (vertices at (±50,0),(0,±50));
           -- boundary-exact points are excluded like the ray caster
           CASE WHEN abs(x) + abs(y) < 50 THEN TRUE
                WHEN abs(x) + abs(y) = 50 AND x < 0 AND y = 0 THEN TRUE
                ELSE FALSE END AS inside
    FROM pts
    """,
)
def spatial_polygon_contains(spark, sf_dir):
    # polygon() + point.contains via ray casting as a native column
    # expression (reference executor_show.go:144-147, helpers.go:188-230).
    # The diamond polygon makes the SQL oracle a closed-form |x|+|y| test
    # (with the ray caster's half-open boundary convention).
    c = _cat(spark, sf_dir).customer
    y = (F.col("c_custkey") % 120 - 60 + 0.25).cast("double")
    x = (F.col("c_custkey") % 300 - 150 + 0.5).cast("double")
    p = spatial.point(x, y, srid=7203)
    diamond = F.array(
        spatial.point(F.lit(50.0), F.lit(0.0), srid=7203),
        spatial.point(F.lit(0.0), F.lit(50.0), srid=7203),
        spatial.point(F.lit(-50.0), F.lit(0.0), srid=7203),
        spatial.point(F.lit(0.0), F.lit(-50.0), srid=7203),
    )
    return c.select(
        F.col("c_custkey").alias("c_key"),
        spatial.point_in_polygon(p, spatial.polygon(diamond)).alias("inside"),
    )


@register(
    "duration_customer_order_span",
    oracle="""
    WITH span AS (
      SELECT o_custkey, min(o_orderdate) AS s, max(o_orderdate) AS e
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS c_key,
           CAST((year(e) - year(s)) * 12 + (month(e) - month(s))
                - CASE WHEN day(e) < day(s) THEN 1 ELSE 0 END AS BIGINT)
             AS months,
           CAST(date_diff('day',
                s + to_months(CAST((year(e) - year(s)) * 12 + (month(e) - month(s))
                    - CASE WHEN day(e) < day(s) THEN 1 ELSE 0 END AS INT)),
                e) AS BIGINT) AS days,
           CAST(date_diff('day', s, e) AS BIGINT) AS total_days
    FROM span
    """,
)
def duration_customer_order_span(spark, sf_dir):
    # duration.between / duration.inDays (reference duration.go:126-508):
    # Cypher months/days decomposition of each customer's first→last
    # order span.
    o = _cat(spark, sf_dir).orders
    span = o.groupBy(F.col("o_custkey").alias("c_key")).agg(
        F.min("o_orderdate").alias("s"), F.max("o_orderdate").alias("e")
    )
    dur = temporal.duration_between(F.col("s"), F.col("e"))
    return span.select(
        "c_key",
        dur["months"].alias("months"),
        dur["days"].alias("days"),
        temporal.duration_in_days(F.col("s"), F.col("e")).alias("total_days"),
    )


@register(
    "apoc_coll_suite",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey AS p_key,
           array_to_string(list_sort(list_distinct(words)), ',') AS to_set,
           CAST(CASE WHEN list_position(words, 'sky') IS NULL THEN -1
                     ELSE list_position(words, 'sky') - 1 END AS BIGINT)
             AS idx_sky,
           array_to_string(list_transform(range(1, len(words)),
                           i -> words[i] || '|' || words[i + 1]), ',') AS pairs,
           CAST(len(list_filter(words, x -> x = words[1])) AS BIGINT)
             AS occ_first
    FROM w
    """,
)
def apoc_coll_suite(spark, sf_dir):
    # apoc.coll.{toSet,indexOf,pairs,occurrences} (reference
    # apoc_collections.go) over part-name word lists, serialized to
    # strings for representation-stable hashing.
    p = _cat(spark, sf_dir).part
    words = F.split(F.col("p_name"), " ")
    pairs_str = F.array_join(
        F.transform(
            apoc.coll_pairs(words),
            lambda s: F.concat(s["first"], F.lit("|"), s["second"]),
        ),
        ",",
    )
    return p.select(
        F.col("p_partkey").alias("p_key"),
        F.array_join(apoc.coll_to_set(words), ",").alias("to_set"),
        apoc.coll_index_of(words, "sky").alias("idx_sky"),
        pairs_str.alias("pairs"),
        apoc.coll_occurrences(words, F.element_at(words, 1)).alias("occ_first"),
    )


@register(
    "apoc_map_json",
    oracle="""
    SELECT n_nationkey AS n_key,
           json_extract_string(j, '$.name') AS name_back,
           json_extract_string(j, '$.n') AS n_back
    FROM (
      SELECT n_nationkey,
             '{"name":"' || n_name || '","n":' || CAST(n_regionkey AS VARCHAR) || '}'
               AS j
      FROM nation
    )
    """,
)
def apoc_map_json(spark, sf_dir):
    # apoc.map.fromPairs + apoc.convert.toJson + get-back (reference
    # apoc_collections.go map/convert rows): build a map, serialize to
    # JSON, extract fields. Both sides construct the identical JSON text.
    n = _cat(spark, sf_dir).nation
    m = apoc.map_from_pairs(
        F.array(
            F.struct(F.lit("name").alias("key"), F.col("n_name").alias("value")),
            F.struct(
                F.lit("n").alias("key"),
                F.col("n_regionkey").cast("string").alias("value"),
            ),
        )
    )
    j = apoc.convert_to_json(m)
    return n.select(
        F.col("n_nationkey").alias("n_key"),
        F.get_json_object(j, "$.name").alias("name_back"),
        F.get_json_object(j, "$.n").alias("n_back"),
    )


# ---- §2.8 procedures ----------------------------------------------------


@register(
    "proc_db_labels",
    oracle="""
    SELECT 'Customer' AS label, CAST(count(*) AS BIGINT) AS n_nodes FROM customer
    UNION ALL SELECT 'Order', count(*) FROM orders
    UNION ALL SELECT 'Part', count(*) FROM part
    UNION ALL SELECT 'Supplier', count(*) FROM supplier
    UNION ALL SELECT 'Nation', count(*) FROM nation
    UNION ALL SELECT 'Region', count(*) FROM region
    """,
)
def proc_db_labels(spark, sf_dir):
    # CALL db.labels (reference call.go:610-): label inventory + counts.
    return procedures.db_labels(_cat(spark, sf_dir).graph)


@register(
    "proc_db_relationship_types",
    oracle="""
    SELECT 'PLACED' AS type, CAST(count(*) AS BIGINT) AS n_edges FROM orders
    UNION ALL SELECT 'CONTAINS', count(*) FROM lineitem
    UNION ALL SELECT 'SUPPLIES', count(*)
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    UNION ALL SELECT 'FROM',
      (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
    UNION ALL SELECT 'IN', count(*) FROM nation
    """,
)
def proc_db_relationship_types(spark, sf_dir):
    # CALL db.relationshipTypes (reference call.go): type inventory.
    return procedures.db_relationship_types(_cat(spark, sf_dir).graph)


@register(
    "proc_db_property_keys",
    oracle="""
    SELECT 'Customer' AS label, column_name AS key FROM (DESCRIBE customer)
    UNION ALL SELECT 'Order', column_name FROM (DESCRIBE orders)
    UNION ALL SELECT 'Part', column_name FROM (DESCRIBE part)
    UNION ALL SELECT 'Supplier', column_name FROM (DESCRIBE supplier)
    UNION ALL SELECT 'Nation', column_name FROM (DESCRIBE nation)
    UNION ALL SELECT 'Region', column_name FROM (DESCRIBE region)
    """,
)
def proc_db_property_keys(spark, sf_dir):
    # CALL db.propertyKeys (reference call.go): per-label property names,
    # read from parquet footers only.
    return procedures.db_property_keys(_cat(spark, sf_dir)).select("label", "key")


@register(
    "proc_db_schema_visualization",
    oracle="""
    SELECT * FROM (VALUES
      ('Customer', 'PLACED', 'Order'),
      ('Order', 'CONTAINS', 'Part'),
      ('Supplier', 'SUPPLIES', 'Part'),
      ('Customer', 'FROM', 'Nation'),
      ('Supplier', 'FROM', 'Nation'),
      ('Nation', 'IN', 'Region')
    ) t(src_label, type, dst_label)
    """,
)
def proc_db_schema_visualization(spark, sf_dir):
    # CALL db.schema.visualization (reference executor_show.go): the
    # graph's label/type shape.
    return procedures.db_schema_visualization(_cat(spark, sf_dir).graph)


@register(
    "proc_db_index_stats",
    oracle="""
    SELECT 'embeddings_cosine' AS name, 'VECTOR' AS type,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS entries
    UNION ALL
    SELECT 'documents_fulltext', 'FULLTEXT',
           (SELECT CAST(count(*) AS BIGINT) FROM documents)
    """,
)
def proc_db_index_stats(spark, sf_dir):
    # CALL db.index.stats — registered-index cardinalities from the
    # IndexCatalog (reference call.go introspection family).
    from nornicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.catalog._index_catalog = None  # default registry
    return eng.cypher("CALL db.index.stats")
