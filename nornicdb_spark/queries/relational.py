"""Relational core queries — SURVEY §2.2 (filters/predicates), §2.4
(aggregations), §2.5 (sort/limit/set ops/rows), §2.6 (scalar functions).

Each maps a Cypher capability of the reference (cited per query) onto
DataFrame ops. Everything here is pure built-in-function Catalyst territory:
filters push to parquet, aggregates get map-side partial aggregation,
ORDER BY+LIMIT becomes TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.queries import register


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    return Catalog(spark, sf_dir)


# --- scans + filter + project + sort + limit (SURVEY §7 phase-0 slice) ---
# Reference: label scan + WHERE + RETURN + ORDER BY + LIMIT
# (pkg/cypher/match_with.go:64-69, match_rows.go:223-338).


@register(
    "top_acctbal_customers",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer WHERE c_acctbal > 1000.0
    ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
)
def top_acctbal_customers(spark, sf_dir):
    cat = _cat(spark, sf_dir)
    return (
        cat.customer.filter(F.col("c_acctbal") > 1000.0)
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(10)
    )


# --- implicit-grouping aggregation: TPC-H Q1 shape -----------------------
# Reference: grouped aggregation (pkg/cypher/match_aggregation.go:10-276),
# sum/avg/count over filtered scan.


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                     AS sum_qty,
           sum(l_extendedprice)                                AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))             AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                     AS avg_qty,
           avg(l_extendedprice)                                AS avg_price,
           avg(l_discount)                                     AS avg_disc,
           CAST(count(*) AS BIGINT)                            AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _cat(spark, sf_dir).lineitem
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "order_count_by_status",
    oracle="""
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice) AS total_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def order_count_by_status(spark, sf_dir):
    return (
        _cat(spark, sf_dir)
        .orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "count_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(count(*) AS BIGINT) AS n_cust
    FROM customer GROUP BY c_mktsegment
    """,
)
def count_distinct_per_segment(spark, sf_dir):
    return (
        _cat(spark, sf_dir)
        .customer.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_cust"),
        )
    )


@register(
    "distinct_segments",
    oracle="SELECT DISTINCT c_mktsegment FROM customer",
)
def distinct_segments(spark, sf_dir):
    # RETURN DISTINCT (reference match.go:238-243).
    return _cat(spark, sf_dir).customer.select("c_mktsegment").distinct()


@register(
    "stats_by_brand",
    oracle="""
    SELECT p_brand,
           stddev_samp(p_retailprice) AS sd_price,
           stddev_pop(p_retailprice)  AS sdp_price,
           avg(p_retailprice)         AS avg_price,
           min(p_retailprice)         AS min_price,
           max(p_retailprice)         AS max_price
    FROM part GROUP BY p_brand
    """,
)
def stats_by_brand(spark, sf_dir):
    # stDev / stDevP (reference functions_eval_math.go:478-494).
    return (
        _cat(spark, sf_dir)
        .part.groupBy("p_brand")
        .agg(
            F.stddev_samp("p_retailprice").alias("sd_price"),
            F.stddev_pop("p_retailprice").alias("sdp_price"),
            F.avg("p_retailprice").alias("avg_price"),
            F.min("p_retailprice").alias("min_price"),
            F.max("p_retailprice").alias("max_price"),
        )
    )


@register(
    "quantity_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS p50,
           quantile_cont(l_quantity, 0.9)  AS p90,
           quantile_disc(l_quantity, 0.5)  AS p50_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark, sf_dir):
    # percentileCont / percentileDisc (reference functions_eval_math.go:456-477).
    li = _cat(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90"),
        F.expr("percentile_approx(l_quantity, 0.5, 2147483647)").alias("p50_disc"),
    )


@register(
    "collect_segments_per_nation",
    oracle="""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
    FROM customer GROUP BY c_nationkey
    """,
)
def collect_segments_per_nation(spark, sf_dir):
    # collect(DISTINCT x) (reference match_aggregation.go:528) — emitted as a
    # sorted joined string so the hash compare is representation-stable.
    return (
        _cat(spark, sf_dir)
        .customer.groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            )
        )
    )


# --- set ops / rows (SURVEY §2.5) ---------------------------------------


@register(
    "union_names",
    oracle="""
    SELECT r_name AS name FROM region
    UNION
    SELECT n_name AS name FROM nation
    """,
)
def union_names(spark, sf_dir):
    # UNION dedup (reference clauses.go:753-871).
    cat = _cat(spark, sf_dir)
    return (
        cat.region.select(F.col("r_name").alias("name"))
        .union(cat.nation.select(F.col("n_name").alias("name")))
        .distinct()
    )


@register(
    "union_all_names",
    oracle="""
    SELECT r_name AS name FROM region
    UNION ALL
    SELECT n_name AS name FROM nation
    """,
)
def union_all_names(spark, sf_dir):
    cat = _cat(spark, sf_dir)
    return cat.region.select(F.col("r_name").alias("name")).union(
        cat.nation.select(F.col("n_name").alias("name"))
    )


@register(
    "unwind_part_words",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def unwind_part_words(spark, sf_dir):
    # UNWIND list → rows (reference clauses.go:300-587) via explode.
    return (
        _cat(spark, sf_dir)
        .part.select(F.explode(F.split(F.col("p_name"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "order_skip_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 10
    """,
)
def order_skip_limit(spark, sf_dir):
    # SKIP/LIMIT (reference string_patterns.go:102-170).
    return (
        _cat(spark, sf_dir)
        .orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# --- predicates (SURVEY §2.2) -------------------------------------------


@register(
    "exists_customers_with_orders",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def exists_customers_with_orders(spark, sf_dir):
    # EXISTS{} pattern predicate → left semi join
    # (reference executor_mutations.go:1256-1313).
    cat = _cat(spark, sf_dir)
    return cat.customer.join(
        cat.orders,
        cat.customer.c_custkey == cat.orders.o_custkey,
        "left_semi",
    ).select("c_custkey")


@register(
    "not_exists_customers_without_orders",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def not_exists_customers_without_orders(spark, sf_dir):
    cat = _cat(spark, sf_dir)
    return cat.customer.join(
        cat.orders,
        cat.customer.c_custkey == cat.orders.o_custkey,
        "left_anti",
    ).select("c_custkey")


@register(
    "in_list_nations",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('FRANCE', 'GERMANY', 'JAPAN', 'KENYA')
    """,
)
def in_list_nations(spark, sf_dir):
    # IN list membership (reference comparison.go:264-315).
    return (
        _cat(spark, sf_dir)
        .nation.filter(F.col("n_name").isin("FRANCE", "GERMANY", "JAPAN", "KENYA"))
        .select("n_nationkey", "n_name")
    )


@register(
    "string_predicates",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE starts_with(c_name, 'Customer#') AND contains(c_name, '9')
      AND c_name LIKE '%5'
    """,
)
def string_predicates(spark, sf_dir):
    # STARTS WITH / CONTAINS / ENDS WITH (reference comparison.go:213-263).
    c = _cat(spark, sf_dir).customer
    return c.filter(
        F.col("c_name").startswith("Customer#")
        & F.col("c_name").contains("9")
        & F.col("c_name").endswith("5")
    ).select("c_custkey")


@register(
    "regex_match_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE regexp_matches(c_name, '00+1[0-9]$')
    """,
)
def regex_match_customers(spark, sf_dir):
    # =~ regex predicate (reference comparison.go:180-212). Spark rlike is
    # unanchored "contains a match" — same as duckdb regexp_matches.
    c = _cat(spark, sf_dir).customer
    return c.filter(F.col("c_name").rlike("00+1[0-9]$")).select("c_custkey", "c_name")


@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg2,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def null_handling(spark, sf_dir):
    # coalesce / nullIf / IS NULL (reference comparison.go:316-345).
    c = _cat(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("(none)")).alias(
            "seg2"
        ),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
    )


@register(
    "case_acctbal_bands",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS band,
           CAST(count(*) AS BIGINT) AS n
    FROM customer GROUP BY 1
    """,
)
def case_acctbal_bands(spark, sf_dir):
    # searched CASE (reference case_expression.go:1-533).
    c = _cat(spark, sf_dir).customer
    band = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("band")
    )
    return c.groupBy(band).agg(F.count(F.lit(1)).alias("n"))


# --- scalar functions (SURVEY §2.6) -------------------------------------


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                      AS uname,
           lower(c_mktsegment)                AS lseg,
           substr(c_name, 10, 5)              AS mid,
           CAST(length(c_name) AS BIGINT)     AS name_len,
           replace(c_name, 'Customer', 'C')   AS short_name,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
           trim('  ' || c_name || '  ')       AS trimmed,
           reverse(c_mktsegment)              AS rseg,
           split_part(c_name, '#', 2)         AS name_num
    FROM customer
    """,
)
def string_functions(spark, sf_dir):
    # toUpper/toLower/substring/replace/lpad/trim/reverse/split
    # (reference functions_eval_functions.go string section; SURVEY §2.6).
    c = _cat(spark, sf_dir).customer
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 5).alias("mid"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("short_name"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_num"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT p_partkey,
           abs(p_retailprice - 1000.0)          AS diff,
           floor(p_retailprice)                 AS fl,
           ceil(p_retailprice)                  AS ce,
           sqrt(p_retailprice)                  AS sq,
           ln(p_retailprice)                    AS lnp,
           log10(p_retailprice)                 AS lg,
           exp(p_retailprice / 1000.0)          AS ex,
           power(p_size, 2.0)                   AS sz2,
           CAST(sign(p_retailprice - 1200.0) AS DOUBLE) AS sgn,
           floor(p_retailprice * 100) / 100     AS trunc2
    FROM part
    """,
)
def math_functions(spark, sf_dir):
    # abs/ceil/floor/sqrt/log/log10/exp/power/sign
    # (reference functions_eval_math.go; SURVEY §2.6 math row).
    p = _cat(spark, sf_dir).part
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000.0).alias("diff"),
        F.floor("p_retailprice").cast("double").alias("fl"),
        F.ceil("p_retailprice").cast("double").alias("ce"),
        F.sqrt("p_retailprice").alias("sq"),
        F.log(F.col("p_retailprice")).alias("lnp"),
        F.log10("p_retailprice").alias("lg"),
        F.exp(F.col("p_retailprice") / 1000.0).alias("ex"),
        F.pow(F.col("p_size").cast("double"), F.lit(2.0)).alias("sz2"),
        F.signum(F.col("p_retailprice") - 1200.0).alias("sgn"),
        (F.floor(F.col("p_retailprice") * 100) / 100).alias("trunc2"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT)    AS y,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(month(o_orderdate) AS BIGINT)   AS m,
           CAST(count(*) AS BIGINT)             AS n,
           sum(o_totalprice)                    AS total
    FROM orders GROUP BY 1, 2, 3
    """,
)
def date_functions(spark, sf_dir):
    # temporal component access (reference duration.go:418-508,
    # functions_eval_functions.go:1532-1610).
    o = _cat(spark, sf_dir).orders
    return o.groupBy(
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("total"))


@register(
    "list_functions",
    oracle="""
    SELECT p_partkey,
           words[1]                                       AS head,
           words[len(words)]                              AS last,
           CAST(len(words) AS BIGINT)                     AS n_words,
           array_to_string(list_reverse(words), ' ')      AS reversed,
           array_to_string(words[2:], ' ')                AS tail
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    """,
)
def list_functions(spark, sf_dir):
    # head/last/size/reverse/tail list ops (reference SURVEY §2.6 list row)
    # via Spark array functions on a split column.
    p = _cat(spark, sf_dir).part
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.element_at(words, 1).alias("head"),
        F.element_at(words, -1).alias("last"),
        F.size(words).cast("long").alias("n_words"),
        F.array_join(F.reverse(words), " ").alias("reversed"),
        F.array_join(F.slice(words, 2, F.size(words) - 1), " ").alias("tail"),
    )


@register(
    "higher_order_list_ops",
    oracle="""
    SELECT p_partkey,
           CAST(list_sum(list_transform(string_split(p_name, ' '),
                                        w -> length(w))) AS BIGINT)
             AS total_chars,
           len(list_filter(string_split(p_name, ' '), w -> length(w) > 4))
             AS n_long_words
    FROM part
    """,
)
def higher_order_list_ops(spark, sf_dir):
    # reduce/extract/filter higher-order list fns (reference
    # functions_eval dispatch; SURVEY §2.6) via transform/filter/aggregate.
    p = _cat(spark, sf_dir).part
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).cast("int").alias(
            "n_long_words"
        ),
    )


# --- joins + HAVING + windows -------------------------------------------


@register(
    "having_frequent_customers",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) > 5
    """,
)
def having_frequent_customers(spark, sf_dir):
    # WITH ... WHERE after aggregation = HAVING (reference match_with.go:84-90).
    o = _cat(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 5)
    )


@register(
    "join_customer_nation_region",
    oracle="""
    SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust,
           sum(c_acctbal) AS total_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_customer_nation_region(spark, sf_dir):
    # multi-hop equi-join chain; nation/region are broadcast dims.
    cat = _cat(spark, sf_dir)
    return (
        cat.customer.join(
            F.broadcast(cat.nation),
            cat.customer.c_nationkey == cat.nation.n_nationkey,
        )
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "q5_revenue_by_nation",
    oracle="""
    SELECT n_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_revenue_by_nation(spark, sf_dir):
    # TPC-H Q5 shape: 6-way join with region filter; Catalyst/AQE pick
    # broadcast for dims, shuffle-hash/sort-merge for the fact joins.
    cat = _cat(spark, sf_dir)
    return (
        cat.customer.join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            cat.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(cat.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(cat.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "optional_match_order_counts",
    oracle="""
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def optional_match_order_counts(spark, sf_dir):
    # OPTIONAL MATCH → left outer join; count(NULL)=0 rows preserved
    # (reference clauses.go:873-936).
    cat = _cat(spark, sf_dir)
    return (
        cat.customer.join(
            cat.orders, cat.customer.c_custkey == cat.orders.o_custkey, "left_outer"
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def topk_orders_per_priority(spark, sf_dir):
    # Top-k per group — window function surface the reference lacks but
    # needs for RRF ranks (SURVEY §2.11 note).
    o = _cat(spark, sf_dir).orders
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@register(
    "window_lag_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w            AS prev_price,
           sum(o_totalprice) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                                               AS running_total,
           row_number() OVER w                 AS seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_running_sum(spark, sf_dir):
    # lag / running aggregate / row_number — access-sequence analytics
    # (SURVEY §2.11 Spark mapping for the temporal tracker).
    o = _cat(spark, sf_dir).orders
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum("o_totalprice")
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("running_total"),
        F.row_number().over(w).alias("seq"),
    )


@register(
    "q3_top_unshipped_revenue",
    oracle="""
    SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY round(revenue, 9) DESC, l_orderkey LIMIT 10
    """,
)
def q3_top_unshipped_revenue(spark, sf_dir):
    # TPC-H Q3 shape: selective filters on both sides of a fact-fact join,
    # then agg + global top-k (TakeOrderedAndProject).
    cat = _cat(spark, sf_dir)
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    return (
        cat.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(cat.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(cat.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        # rank key rounded per the ULP convention: duplicated data (the
        # derived sfN corpora are key-shifted copies) gives equal-revenue
        # groups whose distributed sums differ by 1 ULP, so the raw-float
        # sort never reaches the orderkey tie-break (caught at sf10)
        .orderBy(F.desc(F.round(F.col("revenue"), 9)), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "agg_rollup_region_nation",
    oracle="""
    SELECT coalesce(r_name, 'ALL') AS region,
           coalesce(n_name, 'ALL') AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(c_acctbal) AS total_acctbal
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark, sf_dir):
    # GROUP BY ROLLUP — hierarchical subtotals in one pass (an extension
    # the reference lacks; SURVEY §2.4 "Spark has them for free").
    # Subtotal rows surface as 'ALL' so null semantics can't differ
    # between engines.
    cat = _cat(spark, sf_dir)
    return (
        cat.customer
        .join(cat.nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(cat.region, F.col("r_regionkey") == F.col("n_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("c_acctbal").alias("total_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "agg_cube_status_priority",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           sum(o_totalprice) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark, sf_dir):
    # GROUP BY CUBE — all grouping-set combinations in one shuffle.
    cat = _cat(spark, sf_dir)
    return (
        cat.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@register(
    "set_ops_customer_supplier_nations",
    oracle="""
    SELECT 'both' AS which, n FROM (
      SELECT c_nationkey AS n FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT 'customer_only', n FROM (
      SELECT c_nationkey AS n FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
    )
    """,
)
def set_ops_customer_supplier_nations(spark, sf_dir):
    # INTERSECT / EXCEPT (SURVEY §2.5 "free if extended") — nations with
    # both customers and suppliers vs customer-only nations.
    cat = _cat(spark, sf_dir)
    c = cat.customer.select(F.col("c_nationkey").alias("n"))
    s = cat.supplier.select(F.col("s_nationkey").alias("n"))
    both = c.intersect(s).select(F.lit("both").alias("which"), "n")
    only = c.subtract(s).select(
        F.lit("customer_only").alias("which"), "n"
    )
    return both.unionByName(only)


@register(
    "sketch_distinct_users_gate",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(1 AS BIGINT) AS ok
    FROM events GROUP BY event_type
    """,
)
def sketch_distinct_users_gate(spark, sf_dir):
    # HLL++ distinct-users-per-event-type with the 4-sigma error bound
    # checked IN the result (operators/sketches.py): the exact column is
    # hash-matched against DuckDB, the ok flag goes 0 (red) if the
    # sketch ever drifts past 4*rsd. Production callers keep only the
    # sketch — O(1/rsd^2) bytes of mergeable state per group at any
    # cardinality.
    from nornicdb_spark.operators import sketches

    ev = Catalog(spark, sf_dir).events
    return sketches.approx_distinct_gate(ev, "event_type", "user_id")


@register(
    "sketch_quantile_value_gate",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 9) AS exact_q,
           CAST(1 AS BIGINT) AS ok
    FROM events GROUP BY event_type
    """,
)
def sketch_quantile_value_gate(spark, sf_dir):
    # Greenwald-Khanna median-per-event-type with the published
    # n/accuracy rank bound verified in-result by re-ranking the
    # sketch's answer; exact_q carries the DuckDB oracle. Production
    # callers use the sketch alone — no per-group sort ever happens.
    from nornicdb_spark.operators import sketches

    ev = Catalog(spark, sf_dir).events
    return sketches.approx_quantile_gate(ev, "event_type", "value")


@register(
    "stream_sketch_distinct_gate",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
           CAST(1 AS BIGINT) AS ok
    FROM events GROUP BY event_type
    """,
)
def stream_sketch_distinct_gate(spark, sf_dir):
    # the HLL distinct counter as a MAINTAINED index
    # (streaming/sketches.py): events ingested in 3 deterministic
    # batches as per-(group, batch) sketch rows, served by register
    # union — the live "distinct users right now" counter whose state
    # is O(2^lg_k) bytes per group at ANY cardinality. ok = the
    # maintained estimate within 4*rsd of the exact count (lg_k=12 ->
    # rsd ~ 1.6%, bound 6.5%); exact_distinct carries the oracle.
    import shutil

    from nornicdb_spark.streaming.sketches import MaintainedDistinctIndex

    ev = Catalog(spark, sf_dir).events
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/distidx_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedDistinctIndex(spark, path, "event_type", "user_id")
    for b in range(3):
        idx.process_batch(ev.filter(F.col("event_id") % 3 == b), batch_id=b)
    exact = ev.groupBy(F.col("event_type")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    # lg_k=12: rsd = 1.04/sqrt(2^12) ~ 0.0163; 4-sigma bound
    bound = 4.0 * 1.04 / (2.0 ** 12) ** 0.5
    return (
        exact.join(
            idx.counts().select(
                F.col("grp").alias("event_type"), "approx_distinct"
            ),
            "event_type",
        )
        .select(
            "event_type",
            "exact_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(bound) * F.col("exact_distinct")
            )
            .cast("long")
            .alias("ok"),
        )
    )


@register(
    "skew_salted_distinct_parts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_count
    FROM lineitem GROUP BY l_returnflag
    """,
)
def skew_salted_distinct_parts(spark, sf_dir):
    # count(DISTINCT part) per returnflag — 3 groups each holding ~1/3
    # of the table, the exact shape AQE cannot split and partial agg
    # cannot shrink: the salted two-phase rewrite (operators/skew.py)
    # shards each group's distinct set over 32 reducers and sums the
    # disjoint shard counts. Result is EXACT (plain-SQL oracle).
    from nornicdb_spark.operators import skew

    li = Catalog(spark, sf_dir).lineitem
    return skew.salted_distinct_count(li, "l_returnflag", "l_partkey")


@register(
    "skew_salted_join_revenue",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join_revenue(spark, sf_dir):
    # the salted fact-dim join (operators/skew.py): every lineitem row
    # salted by l_linenumber, orders replicated across the 8 shards —
    # row-identical to the plain join (exact oracle), hot order keys
    # spread over 8 reducers. The demo aggregates to revenue per
    # priority so the compared output is compact.
    from nornicdb_spark.operators import skew

    cat = Catalog(spark, sf_dir)
    j = skew.salted_join(
        cat.lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        cat.orders.select("o_orderkey", "o_orderpriority"),
        on="o_orderkey", n_salt=8, salt_by="l_linenumber",
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "stream_histogram_quantile",
    oracle="""
    WITH base AS (
      SELECT event_type, CAST(floor(value / 5.0) AS BIGINT) AS bucket
      FROM events WHERE event_id % 10 <> 0
    ),
    net AS (
      SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n
      FROM base GROUP BY event_type, bucket
    ),
    tot AS (
      SELECT event_type, CAST(sum(n) AS BIGINT) AS total
      FROM net GROUP BY event_type
    ),
    cum AS (
      SELECT event_type, bucket,
             sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
      FROM net
    )
    SELECT event_type AS grp,
           (min(bucket) + 0.5) * 5.0 AS q_est,
           CAST(min(total) AS BIGINT) AS total
    FROM cum JOIN tot USING (event_type)
    WHERE cum >= 0.5 * total
    GROUP BY event_type
    """,
)
def stream_histogram_quantile(spark, sf_dir):
    # the maintained fixed-width histogram (streaming/sketches.py
    # MaintainedHistogramIndex): events ingested in 3 batches, then the
    # event_id % 10 == 0 observations REMOVED via negative count rows —
    # the subtract-capable contrast to the HLL index (registers cannot
    # subtract; counts can, and serving stays a pure sum). The median
    # estimate (first bucket reaching q*total, midpoint) is
    # deterministic, so this row carries a FULL DuckDB oracle over the
    # surviving observations — removal correctness is hash-checked, not
    # gated.
    import shutil

    from nornicdb_spark.streaming.sketches import MaintainedHistogramIndex

    ev = Catalog(spark, sf_dir).events
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/histidx_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedHistogramIndex(spark, path, "event_type", "value", width=5.0)
    for b in range(3):
        idx.process_batch(ev.filter(F.col("event_id") % 3 == b), batch_id=b)
    idx.remove_batch(ev.filter(F.col("event_id") % 10 == 0), batch_id=3)
    return idx.quantile(0.5)
