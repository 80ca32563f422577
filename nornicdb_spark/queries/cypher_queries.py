"""Registry queries executed through the Cypher FRONTEND (parse → AST →
DataFrame), not hand-built DataFrame code — so the driver's oracle gate
exercises the full §3 pipeline end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nornicdb_spark.engine import Engine
from nornicdb_spark.queries import register


def _run(spark, sf_dir, q, params=None):
    return Engine(spark, sf_dir).cypher(q, params)


@register(
    "cypher_top_balances",
    oracle="""
    SELECT c_name AS name, c_acctbal AS bal FROM customer
    ORDER BY c_acctbal DESC, c_name ASC LIMIT 10
    """,
)
def cypher_top_balances(spark, sf_dir):
    # SURVEY §7 phase-0 flagship shape: LabelScan→Filter→Project→Sort→Limit
    # through the parser.
    return _run(
        spark, sf_dir,
        """MATCH (c:Customer) WHERE c.c_acctbal > $min
           RETURN c.c_name AS name, c.c_acctbal AS bal
           ORDER BY bal DESC, name ASC LIMIT 10""",
        params={"min": -1e18},
    )


@register(
    "cypher_orders_pipeline",
    oracle="""
    SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey HAVING count(*) >= 20
    """,
)
def cypher_orders_pipeline(spark, sf_dir):
    # pattern join + implicit grouping + WITH...WHERE (HAVING) through the
    # frontend.
    return _run(
        spark, sf_dir,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           WITH c.c_custkey AS k, count(*) AS n WHERE n >= 20
           RETURN k, n""",
    )


@register(
    "cypher_optional_match",
    oracle="""
    SELECT n_name AS name, CAST(count(s_suppkey) AS BIGINT) AS n
    FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def cypher_optional_match(spark, sf_dir):
    return _run(
        spark, sf_dir,
        """MATCH (n:Nation) OPTIONAL MATCH (n)<-[:FROM]-(s:Supplier)
           RETURN n.n_name AS name, count(s.s_suppkey) AS n""",
    )


@register(
    "cypher_union_case",
    oracle="""
    SELECT r_name AS name, 'region' AS kind FROM region
    UNION
    SELECT n_name AS name,
           CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS kind
    FROM nation
    """,
)
def cypher_union_case(spark, sf_dir):
    return _run(
        spark, sf_dir,
        """MATCH (r:Region) RETURN r.r_name AS name, 'region' AS kind
           UNION
           MATCH (n:Nation)
           RETURN n.n_name AS name,
                  CASE WHEN n.n_regionkey < 2 THEN 'west' ELSE 'east' END AS kind""",
    )


@register(
    "cypher_unwind_functions",
    oracle="""
    SELECT w AS word, CAST(count(*) AS BIGINT) AS n,
           CAST(length(w) AS BIGINT) AS len
    FROM (SELECT unnest(string_split(p_name, ' ')) AS w FROM part)
    GROUP BY w
    """,
)
def cypher_unwind_functions(spark, sf_dir):
    return _run(
        spark, sf_dir,
        """MATCH (p:Part) UNWIND split(p.p_name, ' ') AS w
           RETURN w AS word, count(*) AS n, size(w) AS len""",
    )


@register(
    "cypher_write_pipeline",
    oracle="""
    WITH regions AS (
      SELECT r_regionkey, r_name FROM region
      UNION ALL SELECT 90, 'FRONTIER'
    ),
    nations AS (SELECT * FROM nation WHERE n_nationkey >= 3)
    SELECT r_regionkey AS r_key,
           CASE WHEN r_regionkey = 90 THEN 'FRONTIER*' ELSE r_name END AS name,
           CAST(count(n_nationkey) AS BIGINT) AS n_nations
    FROM regions LEFT JOIN nations ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def cypher_write_pipeline(spark, sf_dir):
    # SURVEY §2.7 through the FRONTEND: CREATE + MERGE(ON MATCH SET) +
    # DETACH DELETE against the session store, then a read over the
    # mutated state — the oracle restates the net effect in SQL.
    from nornicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.cypher("CREATE (r:Region {r_regionkey: 90, r_name: 'FRONTIER'})").collect()
    eng.cypher(
        """MERGE (r:Region {r_regionkey: 90})
           ON CREATE SET r.r_name = 'wrong'
           ON MATCH SET r.r_name = 'FRONTIER*'"""
    ).collect()
    eng.cypher(
        "MATCH (n:Nation) WHERE n.n_nationkey < 3 DETACH DELETE n"
    ).collect()
    return eng.cypher(
        """MATCH (r:Region) OPTIONAL MATCH (r)<-[:IN]-(n:Nation)
           RETURN r.r_regionkey AS r_key, r.r_name AS name,
                  count(n.n_nationkey) AS n_nations"""
    )


@register(
    "cypher_shortest_path",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS path_len,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    """,
)
def cypher_shortest_path(spark, sf_dir):
    # MATCH p = shortestPath(...) through the frontend (reference
    # shortest_path.go:18-365): every customer reaches its region in
    # exactly 2 hops (FROM → IN), so one row at length 2.
    return _run(
        spark, sf_dir,
        """MATCH p = shortestPath((c:Customer)-[*..4]->(r:Region))
           RETURN length(p) AS path_len, count(*) AS n_customers""",
    )


@register(
    "cypher_pattern_comprehension",
    oracle="""
    SELECT n_nationkey AS k,
           (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)::INT
           AS n_sups,
           EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
           AS has_cust
    FROM nation
    """,
)
def cypher_pattern_comprehension(spark, sf_dir):
    # pattern comprehension + EXISTS{} in RETURN position (reference
    # executor_mutations.go subquery expressions).
    return _run(
        spark, sf_dir,
        """MATCH (n:Nation)
           RETURN n.n_nationkey AS k,
                  size([(n)<-[:FROM]-(s:Supplier) | s.s_name]) AS n_sups,
                  EXISTS { (n)<-[:FROM]-(:Customer) } AS has_cust""",
    )


@register(
    "cypher_list_fold_quantifiers",
    oracle="""
    SELECT CAST(10 AS BIGINT) AS total, true AS all_pos, false AS any_big,
           true AS none_neg, true AS single_two
    """,
)
def cypher_list_fold_quantifiers(spark, sf_dir):
    # reduce + all/any/none/single higher-order predicates (SURVEY §2.6
    # list higher-order; reference functions_eval dispatch).
    return _run(
        spark, sf_dir,
        """RETURN reduce(s = 0, x IN [1,2,3,4] | s + x) AS total,
                  all(x IN [1,2,3] WHERE x > 0) AS all_pos,
                  any(x IN [1,2,3] WHERE x > 9) AS any_big,
                  none(x IN [1,2] WHERE x < 0) AS none_neg,
                  single(x IN [1,2,3] WHERE x = 2) AS single_two""",
    )


@register(
    "cypher_foreach_writes",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS n, CAST(60 AS BIGINT) AS total
    """,
)
def cypher_foreach_writes(spark, sf_dir):
    # FOREACH driver loop + dynamic (schema-free) labels (reference
    # clauses.go:1689-1797).
    from nornicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    eng.cypher("FOREACH (x IN [10, 20, 30] | CREATE (:Marker {v: x}))").collect()
    return eng.cypher("MATCH (m:Marker) RETURN count(*) AS n, sum(m.v) AS total")


@register(
    "cypher_vector_search",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    )
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS score
    FROM embeddings, q
    ORDER BY round(score, 9) DESC, vec_id LIMIT 10
    """,
)
def cypher_vector_search(spark, sf_dir):
    # CALL db.index.vector.queryNodes through the frontend (reference
    # call_vector.go:35-280) — exact cosine top-k, parameterized vector.
    from nornicdb_spark.catalog import Catalog
    from pyspark.sql import functions as F

    emb = Catalog(spark, sf_dir).embeddings
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    return _run(
        spark, sf_dir,
        """CALL db.index.vector.queryNodes('embeddings_cosine', 10, $qv)
           YIELD node, score RETURN node AS vec_id, score""",
        {"qv": qv},
    )


from nornicdb_spark.search.bm25 import bm25_oracle_sql as _bm25_oracle


@register(
    "cypher_fulltext_search",
    oracle=_bm25_oracle("spark shuffle partition", k=10),
)
def cypher_fulltext_search(spark, sf_dir):
    # CALL db.index.fulltext.queryNodes through the frontend (reference
    # call_fulltext.go) — BM25 top-k, full scoring oracle.
    return _run(
        spark, sf_dir,
        """CALL db.index.fulltext.queryNodes('documents_fulltext',
           'spark shuffle partition', 10)
           YIELD node, score RETURN node AS doc_id, score""",
    )


@register(
    "cypher_vector_spatial_functions",
    oracle="""
    SELECT CAST(1.0 AS DOUBLE) AS cos_same,
           CAST(1.0 / 26.0 AS DOUBLE) AS euc_sim,
           '[1,3]' AS sub,
           CAST(1 AS BIGINT) AS idx
    """,
)
def cypher_vector_spatial_functions(spark, sf_dir):
    # SURVEY §2.6 vector-similarity + APOC collection scalar functions
    # through the frontend (reference executor_show.go:151-152,
    # apoc_collections.go). The list result is JSON-serialized because
    # the correctness harness canonicalizes rows with a pandas sort,
    # which cannot order raw array cells.
    df = _run(
        spark, sf_dir,
        """RETURN vector.similarity.cosine([1.0, 0.0], [1.0, 0.0]) AS cos_same,
                  vector.similarity.euclidean([0.0, 0.0], [3.0, 4.0]) AS euc_sim,
                  apoc.coll.subtract([1,2,3], [2]) AS sub,
                  apoc.coll.indexOf([5,6,7], 6) AS idx""",
    )
    return df.withColumn("sub", F.to_json("sub"))


@register(
    "cypher_merge_rel",
    oracle="""
    SELECT r_name AS region, CAST(count(*) AS BIGINT) AS n
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def cypher_merge_rel(spark, sf_dir):
    # SURVEY §2.7 MERGE on relationship patterns through the frontend
    # (reference merge.go:14-1847 mergeRelationships): the first MERGE
    # creates one LOCATED_IN edge per (nation, region) pair, the re-run
    # matches all of them (idempotent, 0 created); ON CREATE / ON MATCH
    # SET stamp the relationship per fate, and the final read filters on
    # the ON MATCH value — so the result only matches the oracle if both
    # fates fired correctly.
    from nornicdb_spark.engine import Engine

    eng = Engine(spark, sf_dir)
    merge = """MATCH (n:Nation), (r:Region) WHERE n.n_regionkey = r.r_regionkey
               MERGE (n)-[l:LOCATED_IN]->(r)
               ON CREATE SET l.via = 'created'
               ON MATCH SET l.via = 'matched'"""
    eng.cypher(merge).collect()
    eng.cypher(merge).collect()
    return eng.cypher(
        """MATCH (n:Nation)-[l:LOCATED_IN {via: 'matched'}]->(r:Region)
           RETURN r.r_name AS region, count(*) AS n"""
    )


@register(
    "cypher_correlated_call",
    oracle="""
    SELECT nation, cust, bal FROM (
      SELECT n_name AS nation, c_name AS cust, c_acctbal AS bal,
             row_number() OVER (PARTITION BY n_nationkey
                                ORDER BY c_acctbal DESC, c_name) AS rk
      FROM nation JOIN customer ON c_nationkey = n_nationkey
    ) WHERE rk <= 2
    """,
)
def cypher_correlated_call(spark, sf_dir):
    # SURVEY §2.7 correlated CALL { WITH n ... } (reference
    # executor_subqueries.go:27-666): per-nation top-2 customers by
    # balance — the inner ORDER BY + LIMIT compiles to a windowed rank
    # partitioned by the correlation key (one shuffle), not a driver loop
    # or a global limit.
    return _run(
        spark, sf_dir,
        """MATCH (n:Nation)
           CALL { WITH n MATCH (c:Customer)-[:FROM]->(n)
                  RETURN c.c_name AS cust, c.c_acctbal AS bal
                  ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2 }
           RETURN n.n_name AS nation, cust, bal""",
    )


@register(
    "cypher_varlen_bound_endpoint",
    oracle="""
    SELECT c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_regionkey = 0
    GROUP BY c_mktsegment
    """,
)
def cypher_varlen_bound_endpoint(spark, sf_dir):
    # SURVEY §2.3 var-length pattern ending at a bound variable
    # (reference traversal.go:1127-1237): the only 2-hop out-path from a
    # Customer to a Region is FROM→IN, so the path count equals the
    # relational join.
    return _run(
        spark, sf_dir,
        """MATCH (c:Customer), (r:Region {r_regionkey: 0})
           MATCH (c)-[*2..2]->(r)
           RETURN c.c_mktsegment AS segment, count(*) AS n""",
    )


@register(
    "cypher_index_mgmt",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 7
    )
    SELECT vec_id,
           list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))) AS score
    FROM embeddings, q
    ORDER BY round(score, 9) DESC, vec_id LIMIT 5
    """,
)
def cypher_index_mgmt(spark, sf_dir):
    # SURVEY §2.8 index management (reference call.go:728-748,
    # call_index_mgmt.go): createNodeIndex registers catalog state, the
    # query resolves the index BY NAME through that state, drop removes
    # it — search driven by DDL, not ad-hoc calls.
    from nornicdb_spark.catalog import Catalog
    from nornicdb_spark.engine import Engine
    from pyspark.sql import functions as F

    eng = Engine(spark, sf_dir)
    eng.catalog._index_catalog = None  # fresh registry for the demo
    eng.cypher(
        """CALL db.index.vector.createNodeIndex(
             'mgmt_demo', 'Embedding', 'embedding', 64, 'cosine')"""
    ).collect()
    emb = Catalog(spark, sf_dir).embeddings
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 7).select("embedding").collect()[0][0]]
    out = eng.cypher(
        """CALL db.index.vector.queryNodes('mgmt_demo', 5, $qv)
           YIELD node, score RETURN node AS vec_id, score""",
        {"qv": qv},
    )
    eng.cypher("CALL db.index.vector.drop('mgmt_demo')").collect()
    return out


@register(
    "cypher_apoc_run",
    oracle="""
    SELECT '{"name":"' || n_name || '","rk":' || n_regionkey || '}' AS value
    FROM nation
    """,
)
def cypher_apoc_run(spark, sf_dir):
    # CALL apoc.cypher.run — re-entrant dynamic Cypher (reference
    # call_apoc_dynamic.go:14-75): every inner row surfaces as the JSON
    # `value` map, so the oracle rebuilds the exact serialization.
    return _run(
        spark, sf_dir,
        """CALL apoc.cypher.run(
             'MATCH (n:Nation) RETURN n.n_name AS name, n.n_regionkey AS rk',
             {})""",
    )


# ---- §2.9 tail routed through CALL (reference call.go:596-803 dispatch,
# apoc_algorithms.go:114-447, apoc_community.go, call_apoc_path.go,
# linkprediction.go:162-340) -------------------------------------------------


@register(
    "cypher_call_astar",
    oracle="""
    SELECT 'Customer:1' AS start, 'Region:4' AS "end", 2.0 AS cost
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey = 1 AND n_regionkey = 4
    """,
)
def cypher_call_astar(spark, sf_dir):
    # CALL apoc.algo.aStar (reference apoc_algorithms.go:114-205): the
    # only out-path from a Customer to a Region is FROM→IN at unit
    # weights, so the cost is 2 iff the customer belongs to the region.
    return _run(
        spark, sf_dir,
        """CALL apoc.algo.aStar('Customer:1', 'Region:4')
           YIELD start, end, cost RETURN start, end, cost""",
    )


@register(
    "cypher_call_simple_paths",
    oracle="""
    SELECT 'Customer:1' || '→' || 'Nation:' || c_nationkey || '→'
           || 'Region:4' AS path,
           CAST(2 AS INT) AS depth
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_custkey = 1 AND n_regionkey = 4
    """,
)
def cypher_call_simple_paths(spark, sf_dir):
    # CALL apoc.algo.allSimplePaths (apoc_algorithms.go:206-251): within
    # 3 hops the single Customer→Region simple path is FROM→IN. The CALL
    # yields path as array<string> (the correct API shape); the registry
    # projection stringifies it because the driver's pandas canonicalizer
    # cannot hash list cells.
    df = _run(
        spark, sf_dir,
        """CALL apoc.algo.allSimplePaths('Customer:1', 'Region:4', null, 3)
           YIELD path, depth RETURN path, depth""",
    )
    return df.select(F.array_join("path", "→").alias("path"), "depth")


@register(
    "cypher_call_betweenness",
    oracle="""
    WITH cnt AS (SELECT c_nationkey, count(*) AS k FROM customer
                 GROUP BY c_nationkey),
    tot AS (SELECT (SELECT count(*) FROM customer)
                 + (SELECT count(*) FROM nation)
                 + (SELECT count(*) FROM region) AS n)
    SELECT node, round(score, 9) AS score FROM (
      SELECT 'Nation:' || n_nationkey AS node,
             coalesce(k, 0) * (2.0 / ((n - 1) * (n - 2))) AS score
      FROM nation LEFT JOIN cnt ON c_nationkey = n_nationkey, tot
      UNION ALL
      SELECT 'Customer:' || c_custkey, 0.0 FROM customer
      UNION ALL
      SELECT 'Region:' || r_regionkey, 0.0 FROM region
    )
    """,
)
def cypher_call_betweenness(spark, sf_dir):
    # CALL apoc.algo.betweenness (apoc_algorithms.go:307-387) on the
    # Customer→Nation→Region membership chain: every customer's single
    # path to its region runs through its nation, so betweenness(nation)
    # = |customers| · 2/((N−1)(N−2)); customers and regions are never
    # intermediates. Directed Brandes, label-restricted BFS.
    df = _run(
        spark, sf_dir,
        """CALL apoc.algo.betweenness(['Customer', 'Nation', 'Region'])
           YIELD node, score RETURN node, score""",
    )
    return df.select("node", F.round("score", 9).alias("score"))


@register(
    "cypher_call_closeness",
    oracle="""
    WITH cnt AS (SELECT n_regionkey, count(*) AS k FROM nation
                 GROUP BY n_regionkey),
    tot AS (SELECT (SELECT count(*) FROM nation)
                 + (SELECT count(*) FROM region) AS n)
    SELECT node, round(score, 9) AS score FROM (
      SELECT 'Region:' || r_regionkey AS node,
             CASE WHEN k > 0 THEN CAST(k AS DOUBLE) / (n - 1)
                  ELSE 0.0 END AS score
      FROM region LEFT JOIN cnt ON n_regionkey = r_regionkey, tot
      UNION ALL
      SELECT 'Nation:' || n_nationkey,
             CAST(k * k AS DOUBLE) / ((2 * k - 1) * (n - 1))
      FROM nation JOIN cnt USING (n_regionkey), tot
    )
    """,
)
def cypher_call_closeness(spark, sf_dir):
    # CALL apoc.algo.closeness (apoc_algorithms.go:388-446) on the
    # Nation–Region membership stars — the same closed form as
    # graph_closeness_nation_region, now reached through CALL dispatch.
    df = _run(
        spark, sf_dir,
        """CALL apoc.algo.closeness(['Nation', 'Region'])
           YIELD node, score RETURN node, score""",
    )
    return df.select("node", F.round("score", 9).alias("score"))


@register(
    "cypher_call_louvain",
    oracle="""
    SELECT CAST((SELECT count(*) FROM region) AS BIGINT) AS n_communities,
           CAST((SELECT count(*) FROM nation)
                + (SELECT count(*) FROM region) AS BIGINT) AS n_nodes
    """,
)
def cypher_call_louvain(spark, sf_dir):
    # CALL apoc.algo.louvain (apoc_community.go:12-219) on the
    # Nation–Region membership graph: disjoint stars, so modularity
    # maximization must converge to exactly one community per region
    # star regardless of move order — the community COUNT is
    # deterministic even though the labels are not.
    df = _run(
        spark, sf_dir,
        """CALL apoc.algo.louvain(['Nation', 'Region'])
           YIELD node, community
           RETURN count(DISTINCT community) AS n_communities,
                  count(*) AS n_nodes""",
    )
    return df


@register(
    "cypher_call_subgraph_nodes",
    oracle="""
    SELECT 'Supplier:1' AS node
    UNION
    SELECT DISTINCT 'Part:' || l_partkey FROM lineitem WHERE l_suppkey = 1
    UNION
    SELECT 'Nation:' || s_nationkey FROM supplier WHERE s_suppkey = 1
    UNION
    SELECT 'Region:' || n_regionkey FROM nation
    WHERE n_nationkey = (SELECT s_nationkey FROM supplier WHERE s_suppkey = 1)
    """,
)
def cypher_call_subgraph_nodes(spark, sf_dir):
    # CALL apoc.path.subgraphNodes (call_apoc_path.go:42-108): distinct
    # reachable set from Supplier:1 within 2 hops = its parts, its
    # nation, and the nation's region.
    return _run(
        spark, sf_dir,
        """CALL apoc.path.subgraphNodes('Supplier:1', {maxLevel: 2})
           YIELD node RETURN node""",
    )


@register(
    "cypher_call_spanning_tree",
    oracle="""
    SELECT 'Supplier:1' || '→' || 'Part:' || pk AS path,
           CAST(1 AS INT) AS level
    FROM (SELECT DISTINCT l_partkey AS pk FROM lineitem WHERE l_suppkey = 1)
    UNION ALL
    SELECT 'Supplier:1' || '→' || 'Nation:' || s_nationkey, 1
    FROM supplier WHERE s_suppkey = 1
    UNION ALL
    SELECT 'Nation:' || n_nationkey || '→' || 'Region:' || n_regionkey, 2
    FROM nation
    WHERE n_nationkey = (SELECT s_nationkey FROM supplier WHERE s_suppkey = 1)
    """,
)
def cypher_call_spanning_tree(spark, sf_dir):
    # CALL apoc.path.spanningTree (call_apoc_path.go:697-765): BFS tree
    # edges as 2-node paths; from a Supplier the tree is exactly parts +
    # nation at level 1 and the region (parent = nation) at level 2.
    # Stringified for the driver canonicalizer; the CALL keeps arrays.
    df = _run(
        spark, sf_dir,
        """CALL apoc.path.spanningTree('Supplier:1', {maxLevel: 2})
           YIELD path, level RETURN path, level""",
    )
    return df.select(F.array_join("path", "→").alias("path"), "level")


@register(
    "cypher_call_path_expand",
    oracle="""
    SELECT 'Customer:1' || '→' || 'Order:' || o_orderkey || '→'
           || 'Part:' || l_partkey AS path
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_custkey = 1
    """,
)
def cypher_call_path_expand(spark, sf_dir):
    # CALL apoc.path.expand (call_apoc_path.go:380-430) with a
    # relationship filter: depth-exactly-2 PLACED→CONTAINS walks — one
    # path per CONTAINS edge (parallel edges per l_linenumber each count,
    # Cypher relationship-uniqueness). Stringified for the driver.
    df = _run(
        spark, sf_dir,
        """CALL apoc.path.expand('Customer:1', 'PLACED|CONTAINS', null, 2, 2)
           YIELD path RETURN path""",
    )
    return df.select(F.array_join("path", "→").alias("path"))


@register(
    "cypher_call_byhop",
    oracle="""
    SELECT string_agg(nbr, '→' ORDER BY nbr) AS nodes, CAST(1 AS INT) AS depth
    FROM (
      SELECT 'Part:' || l_partkey AS nbr FROM lineitem WHERE l_suppkey = 1
      UNION SELECT 'Nation:' || s_nationkey FROM supplier WHERE s_suppkey = 1
    )
    UNION ALL
    SELECT 'Region:' || n_regionkey, 2
    FROM nation
    WHERE n_nationkey = (SELECT s_nationkey FROM supplier WHERE s_suppkey = 1)
    """,
)
def cypher_call_byhop(spark, sf_dir):
    # CALL apoc.neighbors.byhop (apoc_algorithms.go:494-518): neighbor
    # ids grouped per minimum hop level, sorted for determinism.
    # Stringified (sorted-join) for the driver canonicalizer.
    df = _run(
        spark, sf_dir,
        """CALL apoc.neighbors.byhop('Supplier:1', 2)
           YIELD nodes, depth RETURN nodes, depth""",
    )
    return df.select(
        F.array_join(F.array_sort("nodes"), "→").alias("nodes"), "depth"
    )


@register(
    "cypher_call_link_prediction",
    oracle="""
    WITH supplies AS (
      SELECT DISTINCT 'Supplier:' || l_suppkey AS s, l_partkey AS p
      FROM lineitem
    ),
    deg AS (SELECT s, count(*) AS d FROM supplies GROUP BY s),
    pairs AS (
      SELECT a.s AS a, b.s AS b, CAST(count(*) AS BIGINT) AS common
      FROM supplies a JOIN supplies b ON a.p = b.p AND a.s < b.s
      GROUP BY a.s, b.s
    ),
    scored AS (
      SELECT a, b, common / (da.d + db.d - common) AS jaccard
      FROM pairs JOIN deg da ON da.s = pairs.a JOIN deg db ON db.s = pairs.b
    )
    SELECT 'Supplier:1' AS node1,
           CASE WHEN a = 'Supplier:1' THEN b ELSE a END AS node2,
           jaccard AS score
    FROM scored WHERE a = 'Supplier:1' OR b = 'Supplier:1'
    ORDER BY score DESC, node2 ASC LIMIT 5
    """,
)
def cypher_call_link_prediction(spark, sf_dir):
    # CALL gds.linkPrediction.jaccard.stream (linkprediction.go:162-340):
    # config-map dispatch onto the shared common_neighbors operator —
    # same scores as graph_link_prediction_suppliers, reached from Cypher.
    return _run(
        spark, sf_dir,
        """CALL gds.linkPrediction.jaccard.stream(
             {sourceNode: 'Supplier:1', topK: 5,
              relationshipTypes: ['SUPPLIES']})
           YIELD node1, node2, score RETURN node1, node2, score""",
    )


@register(
    "cypher_call_ppr",
    oracle=__import__(
        "nornicdb_spark.queries.graph", fromlist=["x"]
    )._ppr_oracle(
        iterations=5, k=25,
        src_sql="SELECT 'Customer:' || c_custkey AS id FROM customer "
                "WHERE c_custkey IN (1, 2, 3)",
    ),
)
def cypher_call_ppr(spark, sf_dir):
    # CALL gds.pageRank.stream with sourceNodes config → personalized
    # PageRank through the frontend (GDS-style config-map dispatch);
    # oracle = the unrolled-CTE chain seeded at the same three ids.
    df = _run(
        spark, sf_dir,
        """CALL gds.pageRank.stream(
             {sourceNodes: ['Customer:1', 'Customer:2', 'Customer:3'],
              maxIterations: 5})
           YIELD nodeId, score RETURN nodeId, score""",
    )
    return (
        df.select(F.col("nodeId").alias("id"), F.round("score", 9).alias("pagerank"))
        .orderBy(F.desc("pagerank"), F.asc("id"))
        .limit(25)
    )


@register(
    "cypher_apoc_load",
    oracle="""
    SELECT '{"name":"' || n_name || '","rk":' || n_regionkey || '}' AS value
    FROM nation
    """,
)
def cypher_apoc_load(spark, sf_dir):
    # CALL apoc.export.json.query → CALL apoc.load.json round trip
    # (reference apoc_load_export.go:25-63, 262-310): the export writes
    # distributed JSON lines, the load re-reads them as `value` maps —
    # content derives deterministically from the nation table so the
    # oracle rebuilds the exact serialization.
    import shutil

    eng = Engine(spark, sf_dir)
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"spark-warehouse/exports/apoc_load_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    eng.cypher(
        f"""CALL apoc.export.json.query(
             'MATCH (n:Nation) RETURN n.n_name AS name, n.n_regionkey AS rk',
             '{path}')"""
    ).collect()
    return _run(
        spark, sf_dir,
        f"CALL apoc.load.json('{path}') YIELD value RETURN value",
    )


@register(
    "cypher_apoc_import",
    oracle="""
    SELECT CAST((SELECT count(*) FROM customer) + (SELECT count(*) FROM orders)
         + (SELECT count(*) FROM part) + (SELECT count(*) FROM supplier)
         + (SELECT count(*) FROM nation) + (SELECT count(*) FROM region)
         AS BIGINT) AS nodes,
           CAST((SELECT count(*) FROM orders)
         + (SELECT count(*) FROM lineitem)
         + (SELECT count(*) FROM
              (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
         + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
         + (SELECT count(*) FROM nation) AS BIGINT) AS relationships
    """,
)
def cypher_apoc_import(spark, sf_dir):
    # CALL apoc.import.json (reference apoc_load_export.go:624) closing
    # the interchange loop: export the graph in Neo4j-export JSON lines
    # (sources/neo4j_json.py), import through CALL dispatch, and check
    # the reported entity counts against the base tables.
    import shutil

    from nornicdb_spark.catalog import Catalog
    from nornicdb_spark.sources import export_graph_json

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    path = f"spark-warehouse/exports/apoc_import_{tag}"
    shutil.rmtree(path, ignore_errors=True)
    export_graph_json(Catalog(spark, sf_dir).graph, path)
    return _run(
        spark, sf_dir,
        f"""CALL apoc.import.json('{path}')
           YIELD nodes, relationships RETURN nodes, relationships""",
    )


@register(
    "cypher_spatial_intersects",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 120) - 60 + 0.25  AS y,
             (c_custkey % 300) - 150 + 0.5  AS x
      FROM customer
    )
    SELECT c_custkey AS k,
           CASE WHEN abs(x) + abs(y) < 50 THEN TRUE
                WHEN abs(x) + abs(y) = 50 AND x < 0 AND y = 0 THEN TRUE
                ELSE FALSE END AS hit,
           CAST(2 AS INT) AS n_pts
    FROM pts
    """,
)
def cypher_spatial_intersects(spark, sf_dir):
    # point.intersects + lineString through the FRONTEND (reference
    # executor_show.go:141-148, functions_eval_math.go:1082-1160):
    # intersects(point, polygon) is the same ray caster as
    # point.contains with swapped argument order; lineString is the
    # vertex-list constructor (size = vertex count). Diamond polygon →
    # closed-form |x|+|y| oracle with the caster's half-open boundary.
    return _run(
        spark, sf_dir,
        """MATCH (c:Customer)
           WITH c.c_custkey AS k,
                point({x: toFloat(c.c_custkey % 300) - 150 + 0.5,
                       y: toFloat(c.c_custkey % 120) - 60 + 0.25}) AS p
           RETURN k,
                  point.intersects(p, polygon([
                    point({x: 50.0, y: 0.0}), point({x: 0.0, y: 50.0}),
                    point({x: -50.0, y: 0.0}), point({x: 0.0, y: -50.0})
                  ])) AS hit,
                  size(lineString([p, point({x: 0.0, y: 0.0})])) AS n_pts""",
    )


@register(
    "cypher_call_lp_predict",
    oracle="""
    WITH supplies AS (
      SELECT DISTINCT 'Supplier:' || l_suppkey AS s, l_partkey AS p
      FROM lineitem
    ),
    part_deg AS (SELECT p, count(*) AS pd FROM supplies GROUP BY p),
    pairs AS (
      SELECT a.s AS a, b.s AS b,
             round(sum(1.0 / ln(pd)) + 1e-12, 9) AS aa
      FROM supplies a JOIN supplies b ON a.p = b.p AND a.s < b.s
      JOIN part_deg ON part_deg.p = a.p
      GROUP BY a.s, b.s
    ),
    cand AS (
      SELECT 'Supplier:1' AS node1,
             CASE WHEN a = 'Supplier:1' THEN b ELSE a END AS node2,
             aa AS topo
      FROM pairs WHERE a = 'Supplier:1' OR b = 'Supplier:1'
      ORDER BY topo DESC, node2 ASC LIMIT 15
    ),
    stats AS (SELECT min(topo) AS mn, max(topo) AS mx FROM cand)
    SELECT node1, node2,
           round(0.5 * ts + 0.5 * 0.0 + 1e-12, 9) AS score,
           ts AS topology_score,
           0.0 AS semantic_score
    FROM (
      SELECT node1, node2,
             round((CASE WHEN mx = mn THEN 1.0
                         ELSE (topo - mn) / (mx - mn) END) + 1e-12, 9) AS ts
      FROM cand, stats
    )
    ORDER BY score DESC, node2 ASC LIMIT 5
    """,
)
def cypher_call_lp_predict(spark, sf_dir):
    # CALL gds.linkPrediction.predict.stream — the hybrid scorer
    # (linkpredict/hybrid.go:222-277): topK·3 adamic-adar candidates,
    # min-max normalized, blended 0.5/0.5 with the semantic cosine
    # (0.0 here: graph nodes carry no embeddings, same as the
    # reference's ChunkEmbeddings-absent path).
    return _run(
        spark, sf_dir,
        """CALL gds.linkPrediction.predict.stream(
             {sourceNode: 'Supplier:1', topK: 5,
              relationshipTypes: ['SUPPLIES']})
           YIELD node1, node2, score, topology_score, semantic_score
           RETURN node1, node2, score, topology_score, semantic_score""",
    )


def _lp_ensemble_oracle(k: int = 5) -> str:
    """gds.linkPrediction.predict.stream ensemble oracle: 5 per-metric
    top slices, each min-max normalized, weighted-summed (weights
    hybrid.go:168-174), aggregate normalized again, blended 0.5/0.5 with
    the 0.0 semantic term."""
    metrics = {
        "cn": ("CAST(common AS DOUBLE)", 0.1),
        "jac": ("jaccard", 0.2),
        "aa": ("adamic_adar", 0.3),
        "ra": ("resource_allocation", 0.25),
        "pa": ("CAST(preferential_attachment AS DOUBLE)", 0.15),
    }
    slices = []
    terms = []
    for nm, (expr, w) in metrics.items():
        slices.append(f"""
    {nm}_s AS MATERIALIZED (
      SELECT node2, {expr} AS topo FROM metrics
      ORDER BY topo DESC, node2 ASC LIMIT {k * 3}
    ),
    {nm}_n AS MATERIALIZED (
      SELECT node2,
             {w!r} * (CASE WHEN mx = mn THEN 1.0
                           ELSE (topo - mn) / (mx - mn) END) AS c
      FROM {nm}_s, (SELECT min(topo) AS mn, max(topo) AS mx FROM {nm}_s)
    )""")
        terms.append(f"SELECT node2, c FROM {nm}_n")
    return f"""
    WITH supplies AS MATERIALIZED (
      SELECT DISTINCT 'Supplier:' || l_suppkey AS s, l_partkey AS p
      FROM lineitem
    ),
    deg AS MATERIALIZED (SELECT s, count(*) AS d FROM supplies GROUP BY s),
    part_deg AS MATERIALIZED (SELECT p, count(*) AS pd FROM supplies GROUP BY p),
    pairs AS MATERIALIZED (
      SELECT a.s AS a, b.s AS b,
             CAST(count(*) AS BIGINT) AS common,
             round(sum(1.0 / ln(pd)) + 1e-12, 9) AS adamic_adar,
             round(sum(1.0 / pd) + 1e-12, 9) AS resource_allocation
      FROM supplies a JOIN supplies b ON a.p = b.p AND a.s < b.s
      JOIN part_deg ON part_deg.p = a.p
      GROUP BY a.s, b.s
    ),
    metrics AS MATERIALIZED (
      SELECT CASE WHEN a = 'Supplier:1' THEN b ELSE a END AS node2,
             common,
             common / (da.d + db.d - common) AS jaccard,
             adamic_adar, resource_allocation,
             CAST(da.d * db.d AS BIGINT) AS preferential_attachment
      FROM pairs JOIN deg da ON da.s = pairs.a JOIN deg db ON db.s = pairs.b
      WHERE a = 'Supplier:1' OR b = 'Supplier:1'
    ),{','.join(slices)},
    agg AS MATERIALIZED (
      SELECT node2, round(sum(c) + 1e-12, 9) AS topo
      FROM ({' UNION ALL '.join(terms)}) GROUP BY node2
    ),
    top AS MATERIALIZED (
      SELECT node2, topo FROM agg ORDER BY topo DESC, node2 ASC LIMIT {k * 3}
    )
    SELECT 'Supplier:1' AS node1, node2,
           round(0.5 * ts + 1e-12, 9) AS score,
           ts AS topology_score,
           0.0 AS semantic_score
    FROM (
      SELECT node2,
             round((CASE WHEN mx = mn THEN 1.0
                         ELSE (topo - mn) / (mx - mn) END) + 1e-12, 9) AS ts
      FROM top, (SELECT min(topo) AS mn, max(topo) AS mx FROM top)
    )
    ORDER BY score DESC, node2 ASC LIMIT {k}
    """


@register("cypher_call_lp_ensemble", oracle=_lp_ensemble_oracle(k=5))
def cypher_call_lp_ensemble(spark, sf_dir):
    # algorithm: 'ensemble' — all 5 topology metrics, each normalized
    # over its own top slice, weighted 0.1/0.2/0.3/0.25/0.15, aggregate
    # re-normalized (hybrid.go:280-340), blended with the semantic term.
    return _run(
        spark, sf_dir,
        """CALL gds.linkPrediction.predict.stream(
             {sourceNode: 'Supplier:1', topK: 5, algorithm: 'ensemble',
              relationshipTypes: ['SUPPLIES']})
           YIELD node1, node2, score, topology_score, semantic_score
           RETURN node1, node2, score, topology_score, semantic_score""",
    )
