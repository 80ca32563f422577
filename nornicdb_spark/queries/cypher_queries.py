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
    ORDER BY score DESC, vec_id LIMIT 10
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
    ORDER BY score DESC, vec_id LIMIT 5
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
