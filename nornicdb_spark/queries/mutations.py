"""Mutation queries — SURVEY §2.7 (CREATE/MERGE/SET/REMOVE/DELETE/FOREACH
as batch table rewrites), each returning the post-mutation state so the
DuckDB oracle can restate the rewrite in plain SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from nornicdb_spark.operators.localframe import literal_df

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.operators import mutations as mut
from nornicdb_spark.queries import register


def _cat(spark, sf_dir):
    return Catalog(spark, sf_dir)


@register(
    "mutation_create_regions",
    oracle="""
    SELECT r_regionkey AS r_key, r_name FROM region
    UNION ALL
    SELECT 90, NULL
    UNION ALL
    SELECT 91, NULL
    """,
)
def mutation_create_regions(spark, sf_dir):
    # CREATE (reference create.go:15-): append rows; properties absent in
    # the CREATE clause (r_name here) materialize as NULL.
    region = _cat(spark, sf_dir).region
    new_rows = literal_df(spark, [(90,), (91,)], "r_regionkey long")
    res = mut.create_rows(region, new_rows, with_stats=False)
    return res.df.select(F.col("r_regionkey").alias("r_key"), "r_name")


@register(
    "mutation_merge_order_counts",
    oracle="""
    SELECT c_custkey AS c_key, c_name, cnt AS n_orders
    FROM customer LEFT JOIN (
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey
    ) ON o_custkey = c_custkey
    UNION ALL
    SELECT k, 'NEW:' || CAST(k AS VARCHAR), CAST(0 AS BIGINT)
    FROM (VALUES (-1), (-2), (-3)) t(k)
    """,
)
def mutation_merge_order_counts(spark, sf_dir):
    # MERGE + ON CREATE SET / ON MATCH SET (reference merge.go:14-1847):
    # upsert per-customer order counts onto the customer table. Matched
    # customers gain n_orders; customers with no orders keep NULL (the
    # merge never touched them); unmatched incoming keys are created.
    cat = _cat(spark, sf_dir)
    incoming = (
        cat.orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .unionByName(
            literal_df(spark, 
                [(-1, 0), (-2, 0), (-3, 0)], "c_custkey long, n_orders long"
            )
        )
    )
    res = mut.merge_rows(
        cat.customer,
        incoming,
        keys=["c_custkey"],
        on_create={"c_name": F.concat(F.lit("NEW:"), F.col("c_custkey").cast("string"))},
        on_match={"n_orders": F.col("_new_n_orders")},
        with_stats=False,
    )
    return res.df.select(F.col("c_custkey").alias("c_key"), "c_name", "n_orders")


@register(
    "mutation_set_remove_flag",
    oracle="""
    SELECT c_custkey AS c_key,
           CASE WHEN c_acctbal < 0 AND c_mktsegment <> 'MACHINERY'
                THEN 'NEG' END AS flag
    FROM customer
    """,
)
def mutation_set_remove_flag(spark, sf_dir):
    # SET then REMOVE (reference executor_mutations.go:247-567): flag
    # negative-balance customers, then strip the flag again for one
    # segment — surviving flags are exactly (neg AND NOT machinery).
    customer = _cat(spark, sf_dir).customer
    step1 = mut.set_properties(
        customer,
        F.col("c_acctbal") < 0,
        {"flag": F.lit("NEG")},
        with_stats=False,
    ).df
    step2 = mut.remove_properties(
        step1, F.col("c_mktsegment") == "MACHINERY", "flag", with_stats=False
    ).df
    return step2.select(F.col("c_custkey").alias("c_key"), "flag")


@register(
    "mutation_detach_delete_nation0",
    oracle="""
    SELECT 'PLACED' AS type, CAST(count(*) AS BIGINT) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey WHERE c_nationkey <> 0
    UNION ALL SELECT 'CONTAINS', count(*) FROM lineitem
    UNION ALL SELECT 'SUPPLIES', count(*)
      FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    UNION ALL SELECT 'FROM',
      (SELECT count(*) FROM customer WHERE c_nationkey <> 0)
      + (SELECT count(*) FROM supplier)
    UNION ALL SELECT 'IN', count(*) FROM nation
    """,
)
def mutation_detach_delete_nation0(spark, sf_dir):
    # DETACH DELETE (reference executor_mutations.go:65-246): delete every
    # customer of nation 0 from the graph; their PLACED and FROM edges
    # cascade, all other edges survive. Target set arrives as a DataFrame
    # (the bound MATCH), not a collected id list.
    cat = _cat(spark, sf_dir)
    g = cat.graph
    targets = (
        cat.customer.filter(F.col("c_nationkey") == 0)
        .select(
            F.concat(F.lit("Customer:"), F.col("c_custkey").cast("string")).alias("id")
        )
    )
    res = mut.delete_nodes(
        g.nodes, targets, edges=g.edges, detach=True, with_stats=False
    )
    return res.edges.groupBy("type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "mutation_foreach_discount_bump",
    oracle="""
    SELECT l_orderkey AS o_key,
           array_to_string(list(CAST(round(l_discount + 0.01, 2) AS VARCHAR)
                                ORDER BY l_linenumber, l_discount), ',') AS discounts
    FROM lineitem GROUP BY l_orderkey
    """,
)
def mutation_foreach_discount_bump(spark, sf_dir):
    # FOREACH (x IN list | SET x += 0.01) (reference clauses.go:1689-1797):
    # per-order discount list updated element-wise via transform — stays
    # JVM-side, no explode/regroup shuffle.
    lineitem = _cat(spark, sf_dir).lineitem
    per_order = lineitem.groupBy(F.col("l_orderkey").alias("o_key")).agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_discount"))
        ).alias("items")
    )
    bumped = mut.foreach_set(
        per_order.withColumn("discounts", F.col("items.l_discount")).drop("items"),
        "discounts",
        lambda x: F.round(x + F.lit(0.01), 2),
    )
    return bumped.select(
        "o_key",
        F.array_join(F.transform("discounts", lambda x: x.cast("string")), ",").alias(
            "discounts"
        ),
    )


@register(
    "constraint_unique_violations",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY o_custkey HAVING count(*) > 1
    """,
)
def constraint_unique_violations(spark, sf_dir):
    # CREATE CONSTRAINT ... IS UNIQUE enforcement probe (reference
    # storage/schema.go:327-412): key tuples occurring more than once.
    orders = _cat(spark, sf_dir).orders
    return mut.unique_violations(orders, ["o_custkey"])
