"""Graph pattern + algorithm queries — SURVEY §2.3 (pattern joins) and
§2.9 (algorithms), run on the star-schema graph projection (FIXTURES.md §A)
so every structural operator is oracle-checkable against SQL joins over the
base tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.catalog import Catalog
from nornicdb_spark.operators import algorithms
from nornicdb_spark.operators.expand import (
    expand,
    match_nodes,
    optional_expand,
    exists_pattern,
)
from nornicdb_spark.operators.paths import var_length_paths
from nornicdb_spark.queries import register


def _graph(spark, sf_dir):
    # shared instance → the materialized adjacency (PropertyGraph.adj) is
    # built once per process and reused by every iterative graph query
    from nornicdb_spark.catalog import shared_catalog

    return shared_catalog(spark, sf_dir).graph


@register(
    "graph_orders_per_customer",
    oracle="""
    SELECT c_custkey AS c_key, CAST(count(*) AS BIGINT) AS n_orders
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def graph_orders_per_customer(spark, sf_dir):
    # 1-hop expand (c:Customer)-[:PLACED]->(o:Order) + implicit-grouping
    # count (reference traversal.go:143-479 + match_aggregation.go).
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "c", "Customer")
    ex = expand(g, frame, "c", "r", "o", rel_types=("PLACED",), dst_label="Order")
    return ex.groupBy(F.col("c_key")).agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "graph_customer_parts_2hop",
    oracle="""
    SELECT o_custkey AS c_key,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    """,
)
def graph_customer_parts_2hop(spark, sf_dir):
    # chained pattern (c)-[:PLACED]->(o)-[:CONTAINS]->(p)
    # (reference traversal.go:575-757 parseChainedTraversalPattern).
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "c", "Customer")
    hop1 = expand(g, frame, "c", "r1", "o", rel_types=("PLACED",), dst_label="Order")
    hop2 = expand(g, hop1, "o", "r2", "p", rel_types=("CONTAINS",), dst_label="Part")
    return hop2.groupBy(F.col("c_key")).agg(
        F.countDistinct(F.col("p_key")).alias("n_parts")
    )


@register(
    "graph_suppliers_per_region",
    oracle="""
    SELECT r_regionkey AS r_key, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_regionkey
    """,
)
def graph_suppliers_per_region(spark, sf_dir):
    # (s:Supplier)-[:FROM]->(n:Nation)-[:IN]->(r:Region) chain.
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "s", "Supplier")
    hop1 = expand(g, frame, "s", "e1", "n", rel_types=("FROM",), dst_label="Nation")
    hop2 = expand(g, hop1, "n", "e2", "r", rel_types=("IN",), dst_label="Region")
    return hop2.groupBy(F.col("r_key")).agg(F.count(F.lit(1)).alias("n_suppliers"))


@register(
    "graph_order_degrees",
    oracle="""
    SELECT o_orderkey AS key,
           CAST(1 AS BIGINT) AS in_degree,
           CAST(count(l_orderkey) AS BIGINT) AS out_degree
    FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    """,
)
def graph_order_degrees(spark, sf_dir):
    # degree/inDegree/outDegree (SURVEY §2.6 entity functions) for Order
    # nodes: in = the PLACED edge from its customer, out = CONTAINS edges.
    g = _graph(spark, sf_dir)
    return (
        algorithms.degrees(g)
        .filter(F.col("label") == "Order")
        .select("key", "in_degree", "out_degree")
    )


@register(
    "graph_var_length_reach",
    oracle="""
    SELECT 'Order'  AS label, CAST(count(*) AS BIGINT) AS n_paths FROM orders
    UNION ALL
    SELECT 'Nation' AS label, CAST(count(*) AS BIGINT) FROM customer
    UNION ALL
    SELECT 'Part'   AS label, CAST(count(*) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'Region' AS label, CAST(count(*) AS BIGINT) FROM customer
    """,
)
def graph_var_length_reach(spark, sf_dir):
    # variable-length (c:Customer)-[*1..2]->(x): one row per path
    # (reference traversal.go:1127-1237 findPaths). Path counts per end
    # label equal base-table cardinalities: depth-1 → Order (one per
    # order), Nation (one per customer); depth-2 → Part (one per
    # lineitem), Region (one per customer).
    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Customer").select("id")
    paths = var_length_paths(g, starts, min_hops=1, max_hops=2, with_node_path=False)
    end_label = F.split(F.col("end_id"), ":").getItem(0)
    return paths.groupBy(end_label.alias("label")).agg(
        F.count(F.lit(1)).alias("n_paths")
    )


@register(
    "graph_optional_match_nation_suppliers",
    oracle="""
    SELECT n_nationkey AS n_key,
           CAST(count(s_suppkey) AS BIGINT) AS n_suppliers
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def graph_optional_match_nation_suppliers(spark, sf_dir):
    # OPTIONAL MATCH (n:Nation)<-[:FROM]-(s:Supplier) — nations with no
    # suppliers keep a row with null supplier → count 0
    # (reference clauses.go:873-936).
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "n", "Nation")
    ex = optional_expand(
        g, frame, "n", "e", "s", rel_types=("FROM",), direction="in",
        dst_label="Supplier",
    )
    return ex.groupBy(F.col("n_key")).agg(
        F.count(F.col("s_key")).alias("n_suppliers")
    )


@register(
    "graph_exists_parts_with_suppliers",
    oracle="""
    SELECT CAST(p_partkey AS BIGINT) AS p_key FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def graph_exists_parts_with_suppliers(spark, sf_dir):
    # WHERE EXISTS { (p)<-[:SUPPLIES]-() } — semi join over incoming edges
    # (reference executor_mutations.go:1256-1313). SUPPLIES edges derive
    # from distinct lineitem (partkey, suppkey), so a part has a supplier
    # iff it appears in lineitem.
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "p", "Part")
    hit = exists_pattern(g, frame, "p", rel_types=("SUPPLIES",), direction="in")
    return hit.select(F.col("p_key").alias("p_key"))


@register(
    "graph_undirected_nation_neighbors",
    oracle="""
    SELECT n_nationkey AS n_key, CAST(count(*) AS BIGINT) AS n_neighbors
    FROM (
      SELECT n_nationkey, 'Customer:' || c_custkey AS nbr
        FROM nation JOIN customer ON c_nationkey = n_nationkey
      UNION ALL
      SELECT n_nationkey, 'Supplier:' || s_suppkey
        FROM nation JOIN supplier ON s_nationkey = n_nationkey
      UNION ALL
      SELECT n_nationkey, 'Region:' || r_regionkey
        FROM nation JOIN region ON n_regionkey = r_regionkey
    ) GROUP BY n_nationkey
    """,
)
def graph_undirected_nation_neighbors(spark, sf_dir):
    # undirected expand (n:Nation)-[e]-(x): both orientations contribute
    # (reference traversal.go:61-142 direction variants).
    g = _graph(spark, sf_dir)
    frame = match_nodes(g, "n", "Nation")
    ex = expand(g, frame, "n", "e", "x", direction="both")
    return ex.groupBy(F.col("n_key")).agg(F.count(F.lit(1)).alias("n_neighbors"))


@register(
    "graph_link_prediction_suppliers",
    oracle="""
    WITH supplies AS (
      SELECT DISTINCT 'Supplier:' || l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    deg AS (SELECT s, count(*) AS d FROM supplies GROUP BY s),
    part_deg AS (SELECT p, count(*) AS pd FROM supplies GROUP BY p),
    pairs AS (
      -- pair orientation matches the engine: lexicographic on node id
      SELECT a.s AS a, b.s AS b,
             CAST(count(*) AS BIGINT) AS common,
             round(sum(1.0 / ln(pd)) + 1e-12, 9) AS adamic_adar,
             round(sum(1.0 / pd) + 1e-12, 9) AS resource_allocation
      FROM supplies a JOIN supplies b ON a.p = b.p AND a.s < b.s
      JOIN part_deg ON part_deg.p = a.p
      GROUP BY a.s, b.s HAVING count(*) >= 3
    )
    SELECT a, b, common,
           common / (da.d + db.d - common) AS jaccard,
           adamic_adar,
           resource_allocation,
           CAST(da.d * db.d AS BIGINT) AS preferential_attachment
    FROM pairs JOIN deg da ON da.s = pairs.a JOIN deg db ON db.s = pairs.b
    """,
)
def graph_link_prediction_suppliers(spark, sf_dir):
    # gds.linkPrediction.{commonNeighbors,jaccard,adamicAdar,
    # resourceAllocation,preferentialAttachment} over SUPPLIES
    # out-neighborhoods (reference linkprediction.go:162-340;
    # linkpredict/topology.go:550-577).
    g = _graph(spark, sf_dir)
    scores = algorithms.common_neighbors(g, rel_types=("SUPPLIES",), min_common=3)
    return scores.select(
        "a", "b", "common", "jaccard", "adamic_adar",
        "resource_allocation", "preferential_attachment"
    )


# The star-schema graph projection (FIXTURES.md §A) spelled out as SQL —
# shared by every unrolled-iteration oracle (pagerank, label propagation).
_GRAPH_SQL = """
    edges AS MATERIALIZED (
      SELECT 'Customer:' || o_custkey AS src, 'Order:' || o_orderkey AS dst
      FROM orders
      UNION ALL
      SELECT 'Order:' || l_orderkey, 'Part:' || l_partkey FROM lineitem
      UNION ALL
      SELECT DISTINCT 'Supplier:' || l_suppkey, 'Part:' || l_partkey
      FROM lineitem
      UNION ALL
      SELECT 'Customer:' || c_custkey, 'Nation:' || c_nationkey FROM customer
      UNION ALL
      SELECT 'Supplier:' || s_suppkey, 'Nation:' || s_nationkey FROM supplier
      UNION ALL
      SELECT 'Nation:' || n_nationkey, 'Region:' || n_regionkey FROM nation
    ),
    nodes AS MATERIALIZED (
      SELECT 'Customer:' || c_custkey AS id FROM customer
      UNION ALL SELECT 'Order:' || o_orderkey FROM orders
      UNION ALL SELECT 'Part:' || p_partkey FROM part
      UNION ALL SELECT 'Supplier:' || s_suppkey FROM supplier
      UNION ALL SELECT 'Nation:' || n_nationkey FROM nation
      UNION ALL SELECT 'Region:' || r_regionkey FROM region
    )"""


def _pagerank_oracle(iterations: int = 5, d: float = 0.85, k: int = 50) -> str:
    """Fixed-iteration PageRank as an unrolled CTE chain (no recursion
    needed for a known iteration count): same formulation as the engine —
    rank = (1-d)/N + d*(contrib + dangling_mass/N), dangling mass from
    mass conservation (1 - Σ contribs), uniform init."""
    chain = [
        _GRAPH_SQL + """,
    meta AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS MATERIALIZED (
      SELECT src AS id, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src
    ),
    c1 AS MATERIALIZED (
      SELECT e.dst AS id, sum((1.0 / meta.n) / o.od) AS contrib
      FROM edges e JOIN outdeg o ON o.id = e.src, meta
      GROUP BY e.dst
    )"""
    ]
    for i in range(2, iterations + 1):
        chain.append(f"""
    s{i - 1} AS MATERIALIZED (SELECT sum(contrib) AS s FROM c{i - 1}),
    r{i - 1} AS MATERIALIZED (
      SELECT nodes.id,
             {(1.0 - d)!r} / meta.n
               + {d!r} * (coalesce(c.contrib, 0.0)
                          + (1.0 - s{i - 1}.s) / meta.n) AS rank
      FROM nodes LEFT JOIN c{i - 1} c ON c.id = nodes.id, meta, s{i - 1}
    ),
    c{i} AS MATERIALIZED (
      SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
      FROM r{i - 1} r JOIN outdeg o ON o.id = r.id
      JOIN edges e ON e.src = r.id
      GROUP BY e.dst
    )""")
    last = iterations
    return f"""
    WITH {','.join(chain)},
    sF AS MATERIALIZED (SELECT sum(contrib) AS s FROM c{last})
    SELECT nodes.id,
           round({(1.0 - d)!r} / meta.n
                 + {d!r} * (coalesce(c.contrib, 0.0)
                            + (1.0 - sF.s) / meta.n), 9) AS pagerank
    FROM nodes LEFT JOIN c{last} c ON c.id = nodes.id, meta, sF
    ORDER BY pagerank DESC, nodes.id ASC LIMIT {k}
    """


_PPR_DEFAULT_SRC = (
    "SELECT 'Customer:' || c_custkey AS id FROM customer WHERE c_nationkey = 1"
)


def _ppr_oracle(
    iterations: int = 5, d: float = 0.85, k: int = 50,
    src_sql: str = _PPR_DEFAULT_SRC,
) -> str:
    """Personalized PageRank unrolled — same chain as
    :func:`_pagerank_oracle` but teleport/dangling mass go to the source
    distribution p (``src_sql`` rows), init rank = p."""
    chain = [
        _GRAPH_SQL + f""",
    srcs AS MATERIALIZED ({src_sql}),
    meta AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS s_n FROM srcs),
    pnode AS MATERIALIZED (
      SELECT nodes.id,
             CASE WHEN srcs.id IS NOT NULL THEN 1.0 / meta.s_n
                  ELSE 0.0 END AS p
      FROM nodes LEFT JOIN srcs ON srcs.id = nodes.id, meta
    ),
    outdeg AS MATERIALIZED (
      SELECT src AS id, CAST(count(*) AS DOUBLE) AS od FROM edges GROUP BY src
    ),
    c1 AS MATERIALIZED (
      SELECT e.dst AS id, sum(p.p / o.od) AS contrib
      FROM edges e JOIN outdeg o ON o.id = e.src
      JOIN pnode p ON p.id = e.src
      GROUP BY e.dst
    )"""
    ]
    for i in range(2, iterations + 1):
        chain.append(f"""
    s{i - 1} AS MATERIALIZED (SELECT sum(contrib) AS s FROM c{i - 1}),
    r{i - 1} AS MATERIALIZED (
      SELECT pnode.id,
             {(1.0 - d)!r} * pnode.p
               + {d!r} * (coalesce(c.contrib, 0.0)
                          + (1.0 - s{i - 1}.s) * pnode.p) AS rank
      FROM pnode LEFT JOIN c{i - 1} c ON c.id = pnode.id, s{i - 1}
    ),
    c{i} AS MATERIALIZED (
      SELECT e.dst AS id, sum(r.rank / o.od) AS contrib
      FROM r{i - 1} r JOIN outdeg o ON o.id = r.id
      JOIN edges e ON e.src = r.id
      GROUP BY e.dst
    )""")
    last = iterations
    return f"""
    WITH {','.join(chain)},
    sF AS MATERIALIZED (SELECT sum(contrib) AS s FROM c{last})
    SELECT pnode.id,
           round({(1.0 - d)!r} * pnode.p
                 + {d!r} * (coalesce(c.contrib, 0.0)
                            + (1.0 - sF.s) * pnode.p), 9) AS pagerank
    FROM pnode LEFT JOIN c{last} c ON c.id = pnode.id, sF
    ORDER BY pagerank DESC, pnode.id ASC LIMIT {k}
    """


@register("graph_pagerank_personalized", oracle=_ppr_oracle())
def graph_pagerank_personalized(spark, sf_dir):
    # personalized PageRank seeded at nation-1 customers (the GDS
    # pageRank sourceNodes config; teleport + dangling mass restricted
    # to the source distribution). Rounded-then-sorted like
    # graph_pagerank so the top-50 set is partition-order independent.
    g = _graph(spark, sf_dir)
    sources = g.nodes_by_label("Customer").join(
        Catalog(spark, sf_dir)
        .table("customer")
        .filter(F.col("c_nationkey") == 1)
        .select(
            F.concat(F.lit("Customer:"), F.col("c_custkey")).alias("id")
        ),
        "id",
        "left_semi",
    )
    pr = algorithms.personalized_pagerank(g, sources, iterations=5)
    return (
        pr.withColumn("pagerank", F.round("pagerank", 9))
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(50)
    )


@register("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    # apoc.algo.pageRank (reference apoc_algorithms.go:252-307), power
    # iteration with dangling-mass redistribution, damping 0.85.
    # pagerank is rounded to 9 decimals BEFORE the top-50 sort so the
    # selected set and the hashed values are partition-order independent
    # (ties broken by id on both sides).
    g = _graph(spark, sf_dir)
    pr = algorithms.pagerank(g, iterations=5)
    return (
        pr.withColumn("pagerank", F.round("pagerank", 9))
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(50)
    )


@register(
    "graph_dijkstra_customer_parts",
    oracle="""
    SELECT 'Customer:' || o_custkey AS start_id,
           'Part:' || l_partkey AS end_id,
           min(1.0 + l_quantity) AS cost
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_partkey
    """,
)
def graph_dijkstra_customer_parts(spark, sf_dir):
    # apoc.algo.dijkstra (reference apoc_algorithms.go:67-113): weighted
    # shortest paths Customer→Part where CONTAINS carries weight
    # l_quantity and PLACED defaults to 1.0. On the layered star graph the
    # min cost to a part is min over orders of (1 + l_quantity) — exactly
    # SQL-expressible, so the full relaxation loop is oracle-checked.
    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Customer").select("id")
    sp = algorithms.weighted_shortest_paths(g, starts, weight_col="l_quantity")
    return sp.filter(F.col("end_id").startswith("Part:"))


@register(
    "graph_astar_customer_region",
    oracle="""
    SELECT 'Customer:' || c_custkey AS start_id,
           'Region:' || n_regionkey AS end_id,
           2.0 AS cost
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)
def graph_astar_customer_region(spark, sf_dir):
    # apoc.algo.aStar (reference apoc_algorithms.go:114-205): A* from
    # every customer to the Region layer with an admissible layer
    # heuristic (Region 0, Nation 1, else 2) that prunes the non-region
    # frontier once a target cost is known.
    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Customer").select("id")
    targets = g.nodes_by_label("Region").select("id")
    h = g.nodes.select(
        "id",
        F.when(F.col("label") == "Region", 0.0)
        .when(F.col("label") == "Nation", 1.0)
        .otherwise(2.0)
        .alias("h"),
    )
    return algorithms.astar_shortest_path(g, starts, targets, h)


@register(
    "graph_closeness_nation_region",
    oracle="""
    WITH cnt AS (SELECT n_regionkey, count(*) AS k FROM nation GROUP BY n_regionkey),
    tot AS (SELECT (SELECT count(*) FROM nation) + (SELECT count(*) FROM region) AS n)
    SELECT 'Region:' || r_regionkey AS id,
           CASE WHEN k > 0 THEN CAST(k AS DOUBLE) / (n - 1) ELSE 0.0 END AS score
    FROM region LEFT JOIN cnt ON n_regionkey = r_regionkey, tot
    UNION ALL
    SELECT 'Nation:' || n_nationkey,
           CAST(k * k AS DOUBLE) / ((2 * k - 1) * (n - 1))
    FROM nation JOIN cnt USING (n_regionkey), tot
    """,
)
def graph_closeness_nation_region(spark, sf_dir):
    # apoc.algo.closeness (reference apoc_algorithms.go:403-446) on the
    # Nation–Region membership graph. Each region star is a separate
    # component, so the BFS score has a closed form the oracle states:
    # region = k/(n-1); nation = k²/((2k-1)(n-1)) for k member nations.
    g = _graph(spark, sf_dir)
    nodes = g.nodes.filter(F.col("label").isin("Nation", "Region")).select("id")
    edges = g.edges_by_type("IN").select("src", "dst")
    return algorithms.closeness_centrality(nodes, edges)


@register(
    "graph_betweenness_nation_region",
    oracle="""
    WITH cnt AS (SELECT n_regionkey, count(*) AS k FROM nation GROUP BY n_regionkey),
    tot AS (SELECT (SELECT count(*) FROM nation) + (SELECT count(*) FROM region) AS n)
    SELECT 'Region:' || r_regionkey AS id,
           coalesce(k * (k - 1), 0) * 2.0 / ((n - 1.0) * (n - 2.0)) AS score
    FROM region LEFT JOIN cnt ON n_regionkey = r_regionkey, tot
    UNION ALL
    SELECT 'Nation:' || n_nationkey, 0.0 FROM nation
    """,
)
def graph_betweenness_nation_region(spark, sf_dir):
    # apoc.algo.betweenness (reference apoc_algorithms.go:323-387),
    # undirected via symmetrized edges. On per-region stars the only
    # intermediates are the region hubs: k(k-1) ordered leaf pairs each,
    # normalized by 2/((n-1)(n-2)) — a closed form the oracle checks.
    g = _graph(spark, sf_dir)
    nodes = g.nodes.filter(F.col("label").isin("Nation", "Region")).select("id")
    e = g.edges_by_type("IN").select("src", "dst")
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return algorithms.betweenness_centrality(nodes, und)


@register(
    "graph_betweenness_sampled",
    oracle="""
    WITH sampled AS (
      SELECT n_nationkey, n_regionkey FROM nation
      WHERE n_nationkey IN (8, 18, 2, 16, 17, 9, 4, 0, 20)
    ),
    cnt AS (SELECT n_regionkey, count(*) AS k FROM nation GROUP BY n_regionkey),
    scnt AS (SELECT n_regionkey, count(*) AS s FROM sampled GROUP BY n_regionkey),
    tot AS (SELECT (SELECT count(*) FROM nation) + (SELECT count(*) FROM region) AS n)
    SELECT 'Region:' || r_regionkey AS id,
           coalesce(s, 0) * coalesce(k - 1, 0) * (n / 10.0) * 2.0
             / ((n - 1.0) * (n - 2.0)) AS score
    FROM region LEFT JOIN cnt ON cnt.n_regionkey = r_regionkey
                LEFT JOIN scnt ON scnt.n_regionkey = r_regionkey, tot
    UNION ALL
    SELECT 'Nation:' || n_nationkey, 0.0 FROM nation
    """,
)
def graph_betweenness_sampled(spark, sf_dir):
    # apoc.algo.betweenness with {samples: 10} (reference
    # apoc_algorithms.go:323-387 bounds the same O(V·E) cost per label) —
    # the Brandes–Pich estimator: BFS from k hash-ordered sources
    # (xxhash64(id, 42), no RNG), dependencies scaled by n/k. Nation and
    # region are fixed-size TPC-H tables, so the drawn source set is
    # SF-invariant and the oracle pins it literally: 9 nation leaves +
    # Region:2 (a hub source contributes no dependency on a star). Each
    # region hub then accumulates (sampled member leaves)·(k−1)·(n/10),
    # normalized by 2/((n−1)(n−2)) — closed form restated in SQL.
    g = _graph(spark, sf_dir)
    nodes = g.nodes.filter(F.col("label").isin("Nation", "Region")).select("id")
    e = g.edges_by_type("IN").select("src", "dst")
    und = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return algorithms.betweenness_centrality(nodes, und, samples=10, seed=42)


@register(
    "graph_louvain_supplier_communities",
    oracle="""
    WITH cnt AS (
      SELECT s_nationkey AS nk, count(*) AS k FROM supplier GROUP BY s_nationkey
    )
    SELECT CAST((SELECT count(*) FROM nation) AS BIGINT) AS n_communities,
           CAST((SELECT max(coalesce(k, 0) + 1)
                 FROM nation LEFT JOIN cnt ON nk = n_nationkey)
                AS BIGINT) AS largest,
           CAST((SELECT count(*) FROM supplier)
                + (SELECT count(*) FROM nation) AS BIGINT) AS n_nodes
    """,
)
def graph_louvain_supplier_communities(spark, sf_dir):
    # apoc.algo.louvain (reference apoc_community.go:66-219) over the
    # Supplier–Nation FROM membership stars. Disjoint stars make the
    # modularity optimum provable (leaf gain 1/2m − 2k_star/(2m)² > 0
    # whenever total edges exceed one star's degree, and cross-star
    # k_in = 0 forbids merges), so community count = |Nation|, largest =
    # max suppliers-per-nation + 1 — a closed form the oracle restates.
    # Same argument as cypher_call_louvain's Nation–Region stars.
    g = _graph(spark, sf_dir)
    keep = ("Supplier", "Nation")
    nodes = g.nodes.filter(F.col("label").isin(*keep)).select("id")
    edges = (
        g.edges.filter(F.col("type") == "FROM")
        .join(nodes.select(F.col("id").alias("src")), "src")
        .select("src", "dst")
    )
    comm = algorithms.louvain_communities(nodes, edges)
    return (
        comm.groupBy("community")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.max("size").alias("largest"),
            F.sum("size").alias("n_nodes"),
        )
    )


@register(
    "graph_triangle_count_suppliers",
    oracle="""
    WITH supplies AS MATERIALIZED (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.s AS a, b.s AS b
      FROM supplies a JOIN supplies b ON a.p = b.p AND a.s < b.s
    ),
    und AS MATERIALIZED (
      SELECT a AS u, b AS v FROM pairs
      UNION SELECT b, a FROM pairs
    ),
    deg AS MATERIALIZED (SELECT u AS id, CAST(count(*) AS BIGINT) AS d
            FROM und GROUP BY u),
    o AS MATERIALIZED (
      SELECT u AS src, v AS dst
      FROM und JOIN deg du ON du.id = u JOIN deg dv ON dv.id = v
      WHERE du.d < dv.d OR (du.d = dv.d AND u < v)
    ),
    tri AS MATERIALIZED (
      SELECT ab.src AS x, ab.dst AS y, bc.dst AS z
      FROM o ab
      JOIN o bc ON bc.src = ab.dst
      JOIN o ac ON ac.src = ab.src AND ac.dst = bc.dst
    ),
    per_node AS MATERIALIZED (
      SELECT n AS id, CAST(count(*) AS BIGINT) AS t
      FROM (SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri)
      GROUP BY n
    )
    SELECT deg.id, CAST(coalesce(t, 0) AS BIGINT) AS triangles, d AS degree,
           round(CASE WHEN d >= 2
                      THEN 2.0 * coalesce(t, 0) / (d * (d - 1))
                      ELSE 0.0 END, 9) AS clustering
    FROM deg LEFT JOIN per_node ON per_node.id = deg.id
    """,
)
def graph_triangle_count_suppliers(spark, sf_dir):
    # triangle counting + local clustering coefficient on the supplier
    # co-supply projection (suppliers sharing >= 1 part), compact-forward
    # degree orientation so the two-hop join fan-out stays bounded on
    # power-law graphs. Beyond-reference GDS-style analytics op.
    li = Catalog(spark, sf_dir).table("lineitem")
    supplies = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pairs = (
        supplies.alias("x")
        .join(supplies.alias("y"), "p")
        .filter(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .distinct()
    )
    out = algorithms.triangle_counts(pairs)
    return out.select(
        "id", "triangles", "degree",
        F.round("clustering", 9).alias("clustering"),
    )


def _kcore_oracle(k: int = 3, rounds: int = algorithms.KCORE_MAX_ROUNDS) -> str:
    """k-core peeling unrolled: synchronous degree-threshold pruning is
    deterministic and fixpoint-preserving (extra rounds after the
    fixpoint change nothing), so ``rounds`` >= the empirical peel depth
    (2 at sf0.001, 4 at sf0.01) reproduces the engine's early-stopping
    loop exactly — the LPA-oracle argument. Unroll depth derives from the
    engine's KCORE_MAX_ROUNDS so a dataset with peel depth in
    (oracle, engine] can't diverge the two silently; the engine warns if
    even that depth fails to converge."""
    chain = [
        _GRAPH_SQL + """,
    e0 AS MATERIALIZED (
      SELECT src AS u, dst AS v FROM edges
      UNION SELECT dst, src FROM edges
    )"""
    ]
    for r in range(1, rounds + 1):
        chain.append(f"""
    d{r} AS (SELECT u, count(*) AS d FROM e{r - 1} GROUP BY u),
    kp{r} AS (SELECT u FROM d{r} WHERE d >= {k}),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r - 1} e
      JOIN kp{r} ku ON ku.u = e.u
      JOIN kp{r} kv ON kv.u = e.v
    )""")
    return f"""
    WITH {','.join(chain)}
    SELECT u AS id, CAST(count(*) AS BIGINT) AS core_degree
    FROM e{rounds} GROUP BY u HAVING count(*) >= {k}
    """


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark, sf_dir):
    # 3-core membership of the undirected star-schema graph (Seidman
    # cores / GDS kCore shape): iterative degree-threshold peeling, one
    # degree aggregate + two semi-joins per round on a shrinking edge
    # set. Beyond-reference analytics op; full unrolled-peeling oracle.
    g = _graph(spark, sf_dir)
    pairs = g.adj_pairs().select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return algorithms.k_core(pairs, k=3)


@register("graph_fastrp_gate", oracle="SELECT CAST(1 AS BIGINT) AS ok")
def graph_fastrp_gate(spark, sf_dir):
    # Driver-visible invariant gate for fastRP (the one inherently
    # rows-only embedding family member): on the IN-edge projection every
    # nation of a region has the identical neighborhood {region}, so the
    # structural embeddings must be (a) identical within each region,
    # (b) nonzero for every nation, and (c) bit-stable across two
    # independent runs (hash-seeded projection, no RNG — reference
    # fastrp.go:28-802 is likewise seed-deterministic). Rounded to 6
    # decimals to absorb float-sum partition-order noise. Single-row ok
    # pattern of the ANN recall gates (queries/search.py:230).
    g = _graph(spark, sf_dir)

    def rounded(df, name):
        return df.select(
            "id", F.transform("embedding", lambda x: F.round(x, 6)).alias(name)
        )

    e1 = rounded(algorithms.fastrp_embeddings(g, dim=16, rel_types=("IN",)), "emb")
    e2 = rounded(algorithms.fastrp_embeddings(g, dim=16, rel_types=("IN",)), "emb2")
    nations = Catalog(spark, sf_dir).table("nation").select(
        F.concat(F.lit("Nation:"), F.col("n_nationkey").cast("string")).alias("id"),
        F.col("n_regionkey").alias("region"),
    )
    per_region = (
        nations.join(e1, "id")
        .groupBy("region")
        .agg(
            F.countDistinct("emb").alias("n_emb"),
            F.min(
                F.aggregate("emb", F.lit(0.0), lambda a, x: a + x * x)
            ).alias("min_sq"),
        )
    )
    equiv = per_region.agg(
        (F.max("n_emb") == 1).cast("long").alias("one_per_region"),
        (F.min("min_sq") > 1e-6).cast("long").alias("nonzero"),
        (F.count(F.lit(1)) >= 2).cast("long").alias("multi_region"),
    )
    determinism = e1.join(e2, "id").agg(
        F.sum((F.col("emb") != F.col("emb2")).cast("long")).alias("n_diff"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    return equiv.crossJoin(determinism).select(
        (
            (F.col("one_per_region") == 1)
            & (F.col("nonzero") == 1)
            & (F.col("multi_region") == 1)
            & (F.col("n_diff") == 0)
            & (F.col("n_nodes") > 0)
        )
        .cast("long")
        .alias("ok")
    )


@register("graph_fastrp_embeddings")  # random-projection embeddings; rows-only
def graph_fastrp_embeddings(spark, sf_dir):
    # gds.fastRP.stream (reference pkg/cypher/fastrp.go:28-802) on the
    # full graph; deterministic hash-seeded projections, so the top-50
    # by id is stable across runs.
    g = _graph(spark, sf_dir)
    emb = algorithms.fastrp_embeddings(g, dim=16)
    return (
        emb.select(
            "id",
            F.size("embedding").alias("dim"),
            F.round(F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x)), 6).alias("norm"),
        )
        .orderBy("id")
        .limit(50)
    )


@register(
    "graph_khop_supplier",
    oracle="""
    SELECT 'Supplier:' || l_suppkey AS start_id,
           'Part:' || l_partkey AS end_id, 1 AS first_depth
    FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
    UNION ALL
    SELECT 'Supplier:' || s_suppkey, 'Nation:' || s_nationkey, 1 FROM supplier
    UNION ALL
    SELECT 'Supplier:' || s_suppkey, 'Region:' || n_regionkey, 2
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def graph_khop_supplier(spark, sf_dir):
    # apoc.neighbors.tohop (reference apoc_algorithms.go:448-551): all
    # nodes within 2 out-hops of each supplier with first-seen depth.
    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Supplier").select("id")
    return algorithms.k_hop_neighborhood(g, starts, k=2)


@register(
    "graph_shortest_path_supplier_region",
    oracle="""
    SELECT 'Supplier:' || s_suppkey AS start_id,
           'Region:' || n_regionkey AS end_id,
           2 AS distance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """,
)
def graph_shortest_path_supplier_region(spark, sf_dir):
    # shortestPath((s:Supplier)-[*..4]->(r:Region)) (reference
    # shortest_path.go:18-365): BFS with early exit; every supplier
    # reaches exactly its nation's region at hop 2.
    from nornicdb_spark.operators.paths import shortest_paths

    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Supplier").select("id")
    targets = g.nodes_by_label("Region").select("id")
    return shortest_paths(g, starts, targets, max_hops=4)


@register(
    "graph_all_shortest_paths_customer_parts",
    oracle="""
    SELECT 'Customer:' || o_custkey AS start_id,
           'Part:' || l_partkey AS end_id,
           2 AS distance,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_paths
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey, l_partkey
    """,
)
def graph_all_shortest_paths_customer_parts(spark, sf_dir):
    # allShortestPaths((c:Customer)-[*..2]->(p:Part)) (reference
    # traversal.go:1435-1553): every min-length node sequence survives —
    # one distinct path per intermediate order, so the per-pair path
    # count equals the distinct orders linking customer to part.
    from nornicdb_spark.operators.paths import all_shortest_paths

    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Customer").select("id")
    targets = g.nodes_by_label("Part").select("id")
    paths = all_shortest_paths(g, starts, targets, max_hops=2)
    return paths.groupBy("start_id", "end_id", "distance").agg(
        F.count(F.lit(1)).alias("n_paths")
    )


# WCC oracle by graph contraction: every non-Part node reaches its
# region through deterministic tree edges (Order→Customer→Nation→
# Region, Supplier→Nation→Region), so components of the full graph =
# components of the region-level quotient graph (regions bridged by
# parts whose lineitems touch several regions) + one singleton per
# part that appears in no lineitem. The recursive closure then runs
# over ≤5 region nodes instead of the full graph. Shared verbatim by
# stream_graph_wcc — the maintained index's labels are byte-identical
# to the batch recompute (min-node-id canonical labels), so the
# strongest correctness statement a streaming index can make applies.
_WCC_ORACLE = """
    WITH RECURSIVE
    li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk,
                  l_suppkey AS sk FROM lineitem),
    cust_reg AS MATERIALIZED (SELECT c_custkey AS ck, n_regionkey AS r
                 FROM customer JOIN nation ON c_nationkey = n_nationkey),
    ord_reg AS MATERIALIZED (SELECT o_orderkey AS ok, r
                FROM orders JOIN cust_reg ON o_custkey = ck),
    sup_reg AS MATERIALIZED (SELECT s_suppkey AS sk, n_regionkey AS r
                FROM supplier JOIN nation ON s_nationkey = n_nationkey),
    part_reg AS MATERIALIZED (
      SELECT DISTINCT pk, r FROM (
        SELECT li.pk, o.r FROM li JOIN ord_reg o USING (ok)
        UNION ALL
        SELECT li.pk, s.r FROM li JOIN sup_reg s USING (sk)
      )
    ),
    reg_edges AS MATERIALIZED (
      SELECT DISTINCT least(r, m) AS a, greatest(r, m) AS b
      FROM (SELECT pk, r, min(r) OVER (PARTITION BY pk) AS m FROM part_reg)
      WHERE r <> m
    ),
    und AS MATERIALIZED (SELECT a AS s, b AS d FROM reg_edges
            UNION SELECT b, a FROM reg_edges),
    reach(node, lbl) AS (
      SELECT r_regionkey, r_regionkey FROM region
      UNION
      SELECT u.d, reach.lbl FROM und u JOIN reach ON reach.node = u.s
    ),
    reg_comp AS MATERIALIZED (SELECT node AS r, min(lbl) AS comp FROM reach GROUP BY node),
    comp_sizes AS (
      SELECT comp, sum(cnt) AS size FROM (
        SELECT comp, count(*) AS cnt FROM reg_comp GROUP BY comp
        UNION ALL SELECT comp, count(*) FROM nation
          JOIN reg_comp ON n_regionkey = r GROUP BY comp
        UNION ALL SELECT comp, count(*) FROM cust_reg
          JOIN reg_comp USING (r) GROUP BY comp
        UNION ALL SELECT comp, count(*) FROM sup_reg
          JOIN reg_comp USING (r) GROUP BY comp
        UNION ALL SELECT comp, count(*) FROM ord_reg
          JOIN reg_comp USING (r) GROUP BY comp
        UNION ALL SELECT comp, count(*) FROM (
          SELECT pk, min(comp) AS comp FROM part_reg
          JOIN reg_comp USING (r) GROUP BY pk
        ) GROUP BY comp
      ) GROUP BY comp
    ),
    iso AS (SELECT count(*) AS n_iso FROM part
            WHERE p_partkey NOT IN (SELECT pk FROM li)),
    tot AS (SELECT (SELECT count(*) FROM customer)
                 + (SELECT count(*) FROM orders)
                 + (SELECT count(*) FROM part)
                 + (SELECT count(*) FROM supplier)
                 + (SELECT count(*) FROM nation)
                 + (SELECT count(*) FROM region) AS n_nodes)
    SELECT CAST((SELECT count(*) FROM comp_sizes) + iso.n_iso AS BIGINT)
             AS n_components,
           CAST(greatest((SELECT max(size) FROM comp_sizes),
                         CASE WHEN iso.n_iso > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS largest,
           CAST(tot.n_nodes AS BIGINT) AS n_nodes
    FROM iso, tot
    """


@register("graph_connected_components", oracle=_WCC_ORACLE)
def graph_connected_components(spark, sf_dir):
    # apoc.algo.wcc (reference apoc_community.go:332-429): component sizes
    # by label of the component representative.
    g = _graph(spark, sf_dir)
    cc = algorithms.connected_components(g)
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("size").alias("largest"),
            F.sum("size").alias("n_nodes"),
        )
    )


@register("stream_graph_wcc", oracle=_WCC_ORACLE)
def stream_graph_wcc(spark, sf_dir):
    # the reference's LIVE connectivity (storage CreateEdge keeps the
    # adjacency current; apoc.algo.wcc sees every committed edge): the
    # full edge set ingested in 3 deterministic batches through the
    # maintained union-find merge log (streaming/graphindex.py), then
    # components resolved by pointer-doubling over the log. Labels are
    # min-node-id canonical — byte-identical to the batch recompute —
    # so the summary shares graph_connected_components' oracle verbatim.
    import shutil

    from nornicdb_spark.streaming.graphindex import MaintainedGraphIndex

    g = _graph(spark, sf_dir)
    edges = g.adj_pairs()
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"/root/repo/.tmp/graphidx_{tag}"
    shutil.rmtree(path, ignore_errors=True)  # rebuild: deterministic run
    idx = MaintainedGraphIndex(spark, path)
    for b in range(3):
        idx.process_batch(
            edges.filter(F.pmod(F.xxhash64("src", "dst"), F.lit(3)) == b),
            batch_id=b,
        )
    cc = idx.components(g.nodes.select(F.col("id").alias("node")))
    return (
        cc.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("size").alias("largest"),
            F.sum("size").alias("n_nodes"),
        )
    )


@register(
    "graph_all_simple_paths",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS c_key,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_custkey
    """,
)
def graph_all_simple_paths(spark, sf_dir):
    # apoc.algo.allSimplePaths (reference apoc_algorithms.go:206-251):
    # Customer→Part simple paths within 2 hops over PLACED/CONTAINS.
    # The projection is a DAG, so every Customer→Order→Part walk is a
    # simple path and the per-customer path count equals the lineitem
    # count reached through that customer's orders.
    from nornicdb_spark.operators.paths import all_simple_paths

    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Customer").select("id")
    targets = g.nodes_by_label("Part").select("id")
    paths = all_simple_paths(
        g, starts, targets, max_hops=2, rel_types=("PLACED", "CONTAINS")
    )
    c_key = F.split(F.col("start_id"), ":").getItem(1).cast("long")
    return paths.groupBy(c_key.alias("c_key")).agg(
        F.count(F.lit(1)).alias("n_paths")
    )


@register(
    "graph_subgraph_nodes",
    oracle="""
    SELECT 'Supplier' AS label, CAST(0 AS INT) AS level,
           CAST(count(*) AS BIGINT) AS n_nodes FROM supplier
    UNION ALL
    SELECT 'Part', 1, CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'Nation', 1, CAST(count(DISTINCT s_nationkey) AS BIGINT) FROM supplier
    UNION ALL
    SELECT 'Region', 2, CAST(count(DISTINCT n_regionkey) AS BIGINT)
    FROM nation WHERE n_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
)
def graph_subgraph_nodes(spark, sf_dir):
    # apoc.path.subgraphNodes (reference call_apoc_path.go): distinct
    # reachable set from all Supplier nodes within 2 hops, tagged with
    # min BFS level, summarized per (label, level).
    from nornicdb_spark.operators.paths import subgraph_nodes

    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Supplier").select("id")
    reach = subgraph_nodes(g, starts, max_level=2)
    label = F.split(F.col("id"), ":").getItem(0)
    return reach.groupBy(label.alias("label"), F.col("level")).agg(
        F.count(F.lit(1)).alias("n_nodes")
    )


@register(
    "graph_spanning_tree",
    oracle="""
    SELECT 'Nation:' || CAST(n_nationkey AS VARCHAR) AS id,
           'Region:' || CAST(n_regionkey AS VARCHAR) AS parent,
           CAST(1 AS INT) AS level
    FROM nation
    UNION ALL
    SELECT 'Customer:' || CAST(c_custkey AS VARCHAR),
           'Nation:' || CAST(c_nationkey AS VARCHAR), 2
    FROM customer
    UNION ALL
    SELECT 'Supplier:' || CAST(s_suppkey AS VARCHAR),
           'Nation:' || CAST(s_nationkey AS VARCHAR), 2
    FROM supplier
    """,
)
def graph_spanning_tree(spark, sf_dir):
    # apoc.path.spanningTree (reference call_apoc_path.go): reverse BFS
    # tree rooted at the Region nodes over IN/FROM. Each Nation's sole
    # parent is its Region; each Customer/Supplier's sole parent is its
    # Nation — a unique, fully SQL-checkable tree.
    from nornicdb_spark.operators.paths import spanning_tree

    g = _graph(spark, sf_dir)
    starts = g.nodes_by_label("Region").select("id")
    return spanning_tree(
        g, starts, max_level=2, rel_types=("IN", "FROM"), direction="in"
    )


def _lpa_oracle(iterations: int = 5) -> str:
    """Synchronous LPA as an unrolled CTE chain — the exact update rule of
    operators/algorithms.py:label_propagation (most-frequent neighbor
    label with edge multiplicity, ties → min label, isolated nodes keep
    their own). The engine's early stop at a fixpoint is equivalence-
    preserving: a deterministic synchronous update applied to a fixpoint
    reproduces it, so 5 unrolled rounds match max_iterations=5."""
    chain = [
        _GRAPH_SQL + """,
    und AS MATERIALIZED (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst AS src, src AS dst FROM edges
    ),
    l0 AS MATERIALIZED (SELECT id, id AS community FROM nodes)"""
    ]
    for i in range(1, iterations + 1):
        chain.append(f"""
    c{i} AS MATERIALIZED (
      SELECT u.dst AS id, l.community, count(*) AS n
      FROM l{i - 1} l JOIN und u ON u.src = l.id
      GROUP BY u.dst, l.community
    ),
    b{i} AS MATERIALIZED (
      SELECT id, min(community) AS best FROM (
        SELECT *, max(n) OVER (PARTITION BY id) AS mx FROM c{i}
      ) WHERE n = mx GROUP BY id
    ),
    l{i} AS MATERIALIZED (
      SELECT l.id, coalesce(b.best, l.community) AS community
      FROM l{i - 1} l LEFT JOIN b{i} b ON b.id = l.id
    )""")
    return f"""
    WITH {','.join(chain)},
    sizes AS (
      SELECT community, count(*) AS size FROM l{iterations} GROUP BY community
    )
    SELECT CAST(count(*) AS BIGINT) AS n_communities,
           CAST(max(size) AS BIGINT) AS largest,
           CAST(sum(size) AS BIGINT) AS n_nodes
    FROM sizes
    """


@register("graph_label_propagation", oracle=_lpa_oracle())
def graph_label_propagation(spark, sf_dir):
    # apoc.algo.labelPropagation (reference apoc_community.go:225-329):
    # community sizes summarized, deterministic min-label tie-break;
    # oracle = the same 5 synchronous rounds unrolled as CTEs.
    g = _graph(spark, sf_dir)
    lp = algorithms.label_propagation(g, max_iterations=5)
    return (
        lp.groupBy("community")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.max("size").alias("largest"),
            F.sum("size").alias("n_nodes"),
        )
    )


@register(
    "graph_neighbors_byhop_customer",
    oracle="""
    WITH h1 AS (
      SELECT DISTINCT 'Customer:' || o_custkey AS start_id,
             'Order:' || o_orderkey AS end_id
      FROM orders WHERE o_custkey <= 100
      UNION
      SELECT 'Customer:' || c_custkey, 'Nation:' || c_nationkey
      FROM customer WHERE c_custkey <= 100
    ),
    h2 AS (
      SELECT DISTINCT 'Customer:' || o_custkey AS start_id,
             'Part:' || l_partkey AS end_id
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_custkey <= 100
      UNION
      SELECT 'Customer:' || c_custkey, 'Region:' || n_regionkey
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      WHERE c_custkey <= 100
    )
    SELECT start_id, CAST(1 AS BIGINT) AS hop,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM h1 GROUP BY start_id
    UNION ALL
    SELECT start_id, 2, count(*) FROM h2 GROUP BY start_id
    """,
)
def graph_neighbors_byhop_customer(spark, sf_dir):
    # apoc.neighbors.byhop (reference apoc_algorithms.go:448-551): nodes
    # grouped by FIRST-SEEN depth per start — the per-ring breakdown of
    # tohop. Reuses the frontier BFS; one extra groupBy. Customers and
    # Orders/Parts share no ids, so hop rings never overlap here.
    g = _graph(spark, sf_dir)
    starts = (
        g.nodes_by_label("Customer")
        .filter(F.col("key") <= 100)
        .select("id")
    )
    reach = algorithms.k_hop_neighborhood(g, starts, k=2)
    return (
        reach.groupBy("start_id", F.col("first_depth").cast("long").alias("hop"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )
