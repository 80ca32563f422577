"""Cypher frontend behavior tests — ported from the reference's corpus
style (pkg/cypher/e2e_query_test.go:50-262,
documentation_examples_test.go:16-706): one query per test, checked
against DuckDB SQL on the same tables, or exact expected rows.
"""

from __future__ import annotations

import pytest

from nornicdb_spark.engine import Engine
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def eng(spark, sf_dir):
    return Engine(spark, sf_dir)


def check(eng, duck, cypher_q, sql, params=None):
    compare(eng.cypher(cypher_q, params), duck, sql)


# ---- MATCH / WHERE / RETURN ---------------------------------------------

def test_match_label_scan_count(eng, duck):
    check(
        eng, duck,
        "MATCH (c:Customer) RETURN count(*) AS n",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM customer",
    )


def test_where_comparison_and_projection(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer) WHERE c.c_acctbal > 9000.0
           RETURN c.c_name AS name, c.c_acctbal AS bal""",
        "SELECT c_name AS name, c_acctbal AS bal FROM customer WHERE c_acctbal > 9000.0",
    )


def test_where_boolean_combinators(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           WHERE (c.c_acctbal < 0.0 OR c.c_acctbal > 9990.0)
             AND NOT c.c_mktsegment = 'BUILDING'
           RETURN c.c_custkey AS k""",
        """SELECT c_custkey AS k FROM customer
           WHERE (c_acctbal < 0.0 OR c_acctbal > 9990.0)
             AND NOT c_mktsegment = 'BUILDING'""",
    )


def test_inline_property_filter(eng, duck):
    check(
        eng, duck,
        "MATCH (n:Nation {n_nationkey: 7}) RETURN n.n_name AS name",
        "SELECT n_name AS name FROM nation WHERE n_nationkey = 7",
    )


def test_string_predicates_and_regex(eng, duck):
    check(
        eng, duck,
        """MATCH (p:Part)
           WHERE p.p_name STARTS WITH 'a' AND p.p_name CONTAINS 'o'
              OR p.p_name =~ '.*blue.*'
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM part
           WHERE p_name LIKE 'a%' AND p_name LIKE '%o%'
              OR regexp_matches(p_name, '.*blue.*')""",
    )


def test_in_list_and_is_null(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation) WHERE n.n_regionkey IN [0, 2]
           RETURN n.n_name AS name""",
        "SELECT n_name AS name FROM nation WHERE n_regionkey IN (0, 2)",
    )


def test_in_list_with_non_literal_items(eng, duck):
    # IN over a list holding expressions (not just literals) must not
    # silently drop the non-literal elements.
    check(
        eng, duck,
        """MATCH (n:Nation) WHERE n.n_name IN [n.n_name, 'ZZZ']
           RETURN count(*) AS n""",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM nation",
    )


def test_parameters(eng, duck):
    check(
        eng, duck,
        "MATCH (c:Customer) WHERE c.c_acctbal > $min RETURN count(*) AS n",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_acctbal > 5000.0",
        params={"min": 5000.0},
    )


# ---- patterns -----------------------------------------------------------

def test_one_hop_expand(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           RETURN c.c_custkey AS k, count(*) AS n""",
        """SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey""",
    )


def test_chained_pattern_with_edge_property(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)-[r:CONTAINS]->(p:Part)
           WHERE r.l_quantity > 45.0
           RETURN c.c_custkey AS k, count(*) AS n""",
        """SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey
           WHERE l_quantity > 45.0 GROUP BY o_custkey""",
    )


def test_incoming_direction(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)<-[:FROM]-(s:Supplier)
           RETURN n.n_name AS name, count(*) AS n""",
        """SELECT n_name AS name, CAST(count(*) AS BIGINT) AS n
           FROM nation JOIN supplier ON s_nationkey = n_nationkey GROUP BY n_name""",
    )


def test_undirected_pattern(eng, duck):
    check(
        eng, duck,
        "MATCH (n:Nation)-[:IN]-(x) RETURN n.n_name AS name, count(*) AS n",
        "SELECT n_name AS name, CAST(1 AS BIGINT) AS n FROM nation",
    )


def test_multi_rel_types(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)<-[:FROM|IN]-(x)
           RETURN n.n_nationkey AS k, count(*) AS n""",
        """SELECT n_nationkey AS k, CAST(
             (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
             + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
           AS BIGINT) AS n
           FROM nation""",
    )


def test_cartesian_product(eng, duck):
    check(
        eng, duck,
        "MATCH (r:Region), (n:Nation) RETURN count(*) AS n",
        "SELECT CAST((SELECT count(*) FROM region) * (SELECT count(*) FROM nation) AS BIGINT) AS n",
    )


def test_optional_match_nulls(eng, duck):
    # nations with no suppliers keep a row with null supplier → count(s) = 0
    check(
        eng, duck,
        """MATCH (n:Nation) OPTIONAL MATCH (n)<-[:FROM]-(s:Supplier)
           RETURN n.n_nationkey AS k, count(s.s_suppkey) AS n""",
        """SELECT n_nationkey AS k, CAST(count(s_suppkey) AS BIGINT) AS n
           FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
           GROUP BY n_nationkey""",
    )


def test_optional_match_after_relationship_match(eng, duck):
    # The PLACED match pads the frame with NULL edge-prop columns
    # (l_quantity etc. belong to CONTAINS edges); the optional rejoin must
    # not equate on those NULLs or every optional row comes back empty.
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           OPTIONAL MATCH (o)-[r:CONTAINS]->(p:Part)
           RETURN c.c_custkey AS k, count(p.p_partkey) AS n""",
        """SELECT c_custkey AS k, CAST(count(l_partkey) AS BIGINT) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           LEFT JOIN lineitem ON l_orderkey = o_orderkey
           GROUP BY c_custkey""",
    )


def test_chained_optional_matches(eng, duck):
    # A second OPTIONAL MATCH after one that produced NULL rows: the
    # NULL-supplier nations must still pick up their region.
    check(
        eng, duck,
        """MATCH (n:Nation)
           OPTIONAL MATCH (n)<-[:FROM]-(s:Supplier)
           OPTIONAL MATCH (n)-[:IN]->(r:Region)
           RETURN n.n_nationkey AS k, count(r.r_name) AS nr""",
        """SELECT n_nationkey AS k, CAST(count(r_name) AS BIGINT) AS nr
           FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
           LEFT JOIN region ON r_regionkey = n_regionkey
           GROUP BY n_nationkey""",
    )


def test_var_length_path(eng, duck):
    # (c)-[*1..2]->(x): depth1 = orders + nation, depth2 = parts + region
    check(
        eng, duck,
        """MATCH (c:Customer)-[*1..2]->(x) RETURN count(*) AS n""",
        """SELECT CAST(
             (SELECT count(*) FROM orders) + (SELECT count(*) FROM customer)
             + (SELECT count(*) FROM lineitem) + (SELECT count(*) FROM customer)
           AS BIGINT) AS n""",
    )


# ---- aggregation / WITH / ORDER ----------------------------------------

def test_implicit_grouping_aggregates(eng, duck):
    check(
        eng, duck,
        """MATCH (o:Order)
           RETURN o.o_orderstatus AS status, count(*) AS n,
                  sum(o.o_totalprice) AS total, avg(o.o_totalprice) AS mean,
                  min(o.o_totalprice) AS lo, max(o.o_totalprice) AS hi""",
        """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n,
                  sum(o_totalprice) AS total, avg(o_totalprice) AS mean,
                  min(o_totalprice) AS lo, max(o_totalprice) AS hi
           FROM orders GROUP BY o_orderstatus""",
    )


def test_count_distinct_and_collect(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           RETURN c.c_nationkey AS k, count(DISTINCT c.c_mktsegment) AS segs""",
        """SELECT c_nationkey AS k, CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS segs
           FROM customer GROUP BY c_nationkey""",
    )


def test_with_pipeline_having(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           WITH c.c_custkey AS k, count(*) AS n WHERE n >= 20
           RETURN k, n""",
        """SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey HAVING count(*) >= 20""",
    )


def test_with_node_passthrough_then_property(eng, duck):
    # WITH carries the node binding; later clauses still see c.c_name
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           WITH c, count(o) AS n WHERE n >= 25
           RETURN c.c_name AS name, n""",
        """SELECT c_name AS name, CAST(count(*) AS BIGINT) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey, c_name HAVING count(*) >= 25""",
    )


def test_order_skip_limit(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           RETURN c.c_custkey AS k, c.c_acctbal AS bal
           ORDER BY bal DESC, k ASC SKIP 5 LIMIT 10""",
        """SELECT c_custkey AS k, c_acctbal AS bal FROM customer
           ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10 OFFSET 5""",
    )


def test_return_distinct(eng, duck):
    check(
        eng, duck,
        "MATCH (c:Customer) RETURN DISTINCT c.c_mktsegment AS seg",
        "SELECT DISTINCT c_mktsegment AS seg FROM customer",
    )


# ---- UNWIND / UNION / CASE / expressions --------------------------------

def test_unwind_literal_list(eng, duck):
    check(
        eng, duck,
        "UNWIND [1, 2, 3] AS x RETURN x, x * 10 AS y",
        "SELECT x, x * 10 AS y FROM (VALUES (1), (2), (3)) t(x)",
    )


def test_unwind_split_column(eng, duck):
    check(
        eng, duck,
        """MATCH (r:Region) UNWIND split(r.r_name, ' ') AS w
           RETURN w, count(*) AS n""",
        """SELECT w, CAST(count(*) AS BIGINT) AS n
           FROM (SELECT unnest(string_split(r_name, ' ')) AS w FROM region)
           GROUP BY w""",
    )


def test_union_and_union_all(eng, duck):
    check(
        eng, duck,
        """MATCH (r:Region) RETURN r.r_name AS name
           UNION MATCH (n:Nation) RETURN n.n_name AS name""",
        "SELECT r_name AS name FROM region UNION SELECT n_name FROM nation",
    )
    check(
        eng, duck,
        """MATCH (r:Region) RETURN r.r_regionkey AS k
           UNION ALL MATCH (r:Region) RETURN r.r_regionkey AS k""",
        """SELECT r_regionkey AS k FROM region
           UNION ALL SELECT r_regionkey FROM region""",
    )


def test_case_expression(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           RETURN CASE WHEN c.c_acctbal < 0.0 THEN 'neg'
                       WHEN c.c_acctbal < 5000.0 THEN 'mid'
                       ELSE 'high' END AS band, count(*) AS n""",
        """SELECT CASE WHEN c_acctbal < 0.0 THEN 'neg'
                       WHEN c_acctbal < 5000.0 THEN 'mid'
                       ELSE 'high' END AS band, CAST(count(*) AS BIGINT) AS n
           FROM customer GROUP BY 1""",
    )


def test_scalar_function_soup(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           RETURN toLower(n.n_name) AS lo, size(n.n_name) AS len,
                  substring(n.n_name, 0, 3) AS pre,
                  abs(n.n_nationkey - 10) AS dist""",
        """SELECT lower(n_name) AS lo, CAST(length(n_name) AS BIGINT) AS len,
                  substring(n_name, 1, 3) AS pre,
                  CAST(abs(n_nationkey - 10) AS BIGINT) AS dist
           FROM nation""",
    )


def test_arithmetic_and_string_concat(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           RETURN n.n_name + '_' + toString(n.n_regionkey) AS tag,
                  n.n_nationkey % 5 AS m, n.n_nationkey / 2 AS half""",
        """SELECT n_name || '_' || CAST(n_regionkey AS VARCHAR) AS tag,
                  n_nationkey % 5 AS m, n_nationkey // 2 AS half
           FROM nation""",
    )


def test_list_literal_indexing_and_functions(eng, duck):
    check(
        eng, duck,
        """UNWIND [[1,2,3],[4,5,6]] AS xs
           RETURN head(xs) AS h, last(xs) AS l, xs[1] AS second,
                  size(xs) AS n, reverse(xs)[0] AS rev0""",
        """SELECT xs[1] AS h, xs[3] AS l, xs[2] AS second,
                  CAST(len(xs) AS BIGINT) AS n, list_reverse(xs)[1] AS rev0
           FROM (VALUES ([1,2,3]), ([4,5,6])) t(xs)""",
    )


def test_id_function_and_labels(eng, duck):
    check(
        eng, duck,
        "MATCH (r:Region) RETURN id(r) AS rid ORDER BY rid",
        """SELECT 'Region:' || CAST(r_regionkey AS VARCHAR) AS rid
           FROM region ORDER BY rid""",
    )


def test_xor_three_valued(eng):
    rows = eng.cypher(
        "UNWIND [1, 2, 3, 4] AS x RETURN x, (x > 1) XOR (x < 4) AS v"
    ).collect()
    assert {r.x: r.v for r in rows} == {1: True, 2: False, 3: False, 4: True}


def test_explain_produces_plan(eng):
    txt = Engine.explain(
        eng, "MATCH (c:Customer) WHERE c.c_acctbal > 0.0 RETURN c.c_name AS n"
    )
    assert "Cypher AST" in txt and "MatchClause" in txt


# ---- EXISTS subqueries / list comprehensions ----------------------------

def test_exists_pattern_subquery(eng, duck):
    check(
        eng, duck,
        """MATCH (p:Part) WHERE EXISTS { (p)<-[:SUPPLIES]-(s:Supplier) }
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM part
           WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""",
    )


def test_not_exists_pattern_subquery(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer) WHERE NOT EXISTS { (c)-[:PLACED]->(o:Order) }
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    )


def test_exists_with_inner_where(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           WHERE EXISTS { (c)-[:PLACED]->(o:Order) WHERE o.o_totalprice > 400000.0 }
             AND c.c_acctbal > 0.0
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
           WHERE EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             AND c_acctbal > 0.0""",
    )


def test_list_comprehension_filter_map(eng, duck):
    check(
        eng, duck,
        """MATCH (p:Part)
           RETURN p.p_partkey AS k,
                  size([w IN split(p.p_name, ' ') WHERE size(w) > 4]) AS n_long,
                  [w IN split(p.p_name, ' ') | toUpper(w)][0] AS first_up""",
        """SELECT p_partkey AS k,
                  CAST(len(list_filter(string_split(p_name, ' '),
                                       w -> length(w) > 4)) AS BIGINT) AS n_long,
                  list_transform(string_split(p_name, ' '), w -> upper(w))[1]
                    AS first_up
           FROM part""",
    )


def test_list_comprehension_in_where(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           WHERE size([w IN split(n.n_name, ' ') WHERE w CONTAINS 'A']) > 0
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM nation
           WHERE len(list_filter(string_split(n_name, ' '),
                                 w -> contains(w, 'A'))) > 0""",
    )


# ---- CALL procedures / COUNT{} ------------------------------------------

def test_call_standalone(eng, duck):
    check(
        eng, duck,
        "CALL db.labels()",
        """SELECT 'Customer' AS label, CAST(count(*) AS BIGINT) AS n_nodes FROM customer
           UNION ALL SELECT 'Order', count(*) FROM orders
           UNION ALL SELECT 'Part', count(*) FROM part
           UNION ALL SELECT 'Supplier', count(*) FROM supplier
           UNION ALL SELECT 'Nation', count(*) FROM nation
           UNION ALL SELECT 'Region', count(*) FROM region""",
    )


def test_call_yield_and_return(eng, duck):
    check(
        eng, duck,
        """CALL db.relationshipTypes() YIELD type, n_edges
           WITH type, n_edges WHERE n_edges > 100
           RETURN type ORDER BY type""",
        """SELECT type FROM (
             SELECT 'PLACED' AS type, (SELECT count(*) FROM orders) AS n
             UNION ALL SELECT 'CONTAINS', (SELECT count(*) FROM lineitem)
             UNION ALL SELECT 'SUPPLIES',
               (SELECT count(*) FROM (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem))
             UNION ALL SELECT 'FROM',
               (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)
             UNION ALL SELECT 'IN', (SELECT count(*) FROM nation)
           ) WHERE n > 100 ORDER BY type""",
    )


def test_count_pattern_subquery(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)
           WHERE COUNT { (c)-[:PLACED]->(o:Order) } >= 25
           RETURN count(*) AS n""",
        """SELECT CAST(count(*) AS BIGINT) AS n FROM customer
           WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 25""",
    )


def test_count_pattern_with_inner_where(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           WHERE COUNT { (n)<-[:FROM]-(s:Supplier)
                         WHERE s.s_acctbal > 0.0 } > 1
           RETURN n.n_nationkey AS k""",
        """SELECT n_nationkey AS k FROM nation
           WHERE (SELECT count(*) FROM supplier
                  WHERE s_nationkey = n_nationkey AND s_acctbal > 0.0) > 1""",
    )


# ---- named paths / shortestPath -----------------------------------------

def test_named_path_accessors(eng, duck):
    check(
        eng, duck,
        """MATCH p = (n:Nation)-[:IN]->(r:Region)
           RETURN length(p) AS l, size(nodes(p)) AS ns,
                  size(relationships(p)) AS rs, n.n_nationkey AS k""",
        """SELECT CAST(1 AS BIGINT) AS l, 2 AS ns, 1 AS rs,
                  n_nationkey AS k FROM nation""",
    )


def test_shortest_path_length(eng, duck):
    # Customer → Nation → Region is always the unique 2-hop min path
    check(
        eng, duck,
        """MATCH p = shortestPath((c:Customer)-[*..4]->(r:Region))
           RETURN length(p) AS l, count(*) AS n""",
        "SELECT CAST(2 AS BIGINT) AS l, CAST(count(*) AS BIGINT) AS n FROM customer",
    )


def test_named_path_var_length_nodes(eng):
    rows = eng.cypher(
        """MATCH p = (n:Nation)-[*1..2]->(x)
           RETURN length(p) AS l, size(nodes(p)) AS ns LIMIT 5"""
    ).collect()
    assert rows and all(r.ns == r.l + 1 for r in rows)


# ---- expression-level additions -----------------------------------------

def test_reduce_fold(eng):
    row = eng.cypher(
        "RETURN reduce(s = 0, x IN [1,2,3,4] | s + x) AS total"
    ).collect()[0]
    assert row.total == 10


def test_reduce_mixed_numeric(eng):
    row = eng.cypher(
        "RETURN reduce(s = 0, x IN [1.5, 2.5] | s + x) AS total"
    ).collect()[0]
    assert row.total == 4.0


def test_quantifier_predicates(eng):
    row = eng.cypher(
        """RETURN all(x IN [1,2,3] WHERE x > 0) AS a,
                  any(x IN [1,2,3] WHERE x > 2) AS b,
                  none(x IN [1,2] WHERE x > 5) AS c,
                  single(x IN [1,2,3] WHERE x = 2) AS d"""
    ).collect()[0]
    assert (row.a, row.b, row.c, row.d) == (True, True, True, True)


def test_map_literal_heterogeneous(eng):
    row = eng.cypher("RETURN {a: 1, b: 'x'} AS m").collect()[0]
    assert row.m.a == 1 and row.m.b == "x"


def test_properties_and_keys(eng):
    row = eng.cypher(
        "MATCH (r:Region) RETURN properties(r) AS p, keys(r) AS k LIMIT 1"
    ).collect()[0]
    assert "r_name" in row.k and row.p.r_name is not None


def test_missing_property_is_null(eng, duck):
    # schema-free semantics: absent property → null, not an error
    check(
        eng, duck,
        "MATCH (n:Nation) WHERE n.nope IS NULL RETURN count(*) AS n",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM nation",
    )


def test_duration_between_components(eng):
    row = eng.cypher(
        "RETURN duration.between(date('2024-01-01'), date('2024-03-15')) AS d"
    ).collect()[0]
    assert row.d.months == 2 and row.d.days == 14


# ---- pattern comprehension / COLLECT / CALL subquery ---------------------

def test_pattern_comprehension(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           RETURN n.n_nationkey AS k,
                  size([(n)<-[:FROM]-(s:Supplier) | s.s_name]) AS n_sups""",
        """SELECT n_nationkey AS k,
                  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)::INT
                  AS n_sups
           FROM nation""",
    )


def test_collect_subquery(eng):
    rows = eng.cypher(
        """MATCH (r:Region)
           RETURN r.r_regionkey AS k,
                  COLLECT { MATCH (r)<-[:IN]-(n:Nation) RETURN n.n_name } AS nations
           ORDER BY k"""
    ).collect()
    assert len(rows) == 5 and all(len(r.nations) == 5 for r in rows)


def test_call_subquery_uncorrelated(eng, duck):
    check(
        eng, duck,
        """CALL { MATCH (r:Region) RETURN count(*) AS n_regions }
           MATCH (n:Nation) RETURN n_regions, count(*) AS n_nations""",
        """SELECT CAST(5 AS BIGINT) AS n_regions,
                  CAST(count(*) AS BIGINT) AS n_nations FROM nation""",
    )


def test_exists_in_return_position(eng, duck):
    check(
        eng, duck,
        """MATCH (n:Nation)
           RETURN n.n_nationkey AS k,
                  EXISTS { (n)<-[:FROM]-(:Supplier) } AS has_sup""",
        """SELECT n_nationkey AS k,
                  EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
                  AS has_sup
           FROM nation""",
    )


# ---- ORDER BY on unprojected expressions --------------------------------

def test_order_by_unprojected_property(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer) RETURN c.c_name AS name
           ORDER BY c.c_acctbal DESC, c.c_custkey ASC LIMIT 5""",
        """SELECT c_name AS name FROM customer
           ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 5""",
    )


def test_order_by_aggregate_expression(eng, duck):
    check(
        eng, duck,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
           RETURN c.c_custkey AS k, count(o) AS n
           ORDER BY count(o) DESC, c.c_custkey ASC LIMIT 5""",
        """SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM customer JOIN orders ON o_custkey = c_custkey
           GROUP BY c_custkey ORDER BY n DESC, c_custkey ASC LIMIT 5""",
    )


# ---- CALL procedures with arguments (search surface) ---------------------

def test_call_vector_query_nodes(eng):
    from pyspark.sql import functions as F
    from nornicdb_spark.catalog import Catalog

    qv = [float(x) for x in (
        eng.catalog.embeddings.filter(F.col("vec_id") == 0)
        .select("embedding").collect()[0][0]
    )]
    rows = eng.cypher(
        """CALL db.index.vector.queryNodes('idx', 3, $qv)
           YIELD node, score RETURN node, score""",
        {"qv": qv},
    ).collect()
    assert len(rows) == 3 and rows[0].node == 0 and abs(rows[0].score - 1.0) < 1e-9


def test_call_fulltext_query_nodes(eng):
    rows = eng.cypher(
        """CALL db.index.fulltext.queryNodes('ft', 'spark shuffle', 5)
           YIELD node, score RETURN node, score"""
    ).collect()
    assert 0 < len(rows) <= 5
    assert all(rows[i].score >= rows[i + 1].score for i in range(len(rows) - 1))


def test_call_introspection_procedures(eng):
    assert eng.cypher("CALL db.ping()").collect()[0].status == "ok"
    names = {r.name for r in eng.cypher("CALL db.indexes()").collect()}
    assert "documents_fulltext" in names
    assert eng.cypher("CALL db.constraints()").count() > 0
    comp = eng.cypher("CALL dbms.components()").collect()[0]
    assert comp.name == "nornicdb-spark"


def test_vector_similarity_functions(eng):
    row = eng.cypher(
        """RETURN vector.similarity.cosine([1.0, 0.0], [0.0, 1.0]) AS orth,
                  vector.similarity.euclidean([0.0, 0.0], [3.0, 4.0]) AS euc"""
    ).collect()[0]
    assert abs(row.orth) < 1e-12 and abs(row.euc - 1 / 26) < 1e-12


def test_spatial_point_distance(eng):
    row = eng.cypher(
        """RETURN distance(point({longitude: 0.0, latitude: 0.0}),
                           point({longitude: 0.0, latitude: 1.0})) AS d"""
    ).collect()[0]
    assert abs(row.d - 111194.93) < 1.0  # one degree of latitude in meters


def test_spatial_cartesian_distance_is_euclidean(eng):
    # point({x, y}) builds srid-7203 cartesian points; distance() on them is
    # planar Euclidean, not haversine (reference functions_eval_math.go).
    row = eng.cypher(
        """RETURN distance(point({x: 0.0, y: 0.0}),
                           point({x: 3.0, y: 4.0})) AS d"""
    ).collect()[0]
    assert abs(row.d - 5.0) < 1e-9


def test_apoc_collection_function_surface(eng):
    row = eng.cypher(
        """RETURN apoc.coll.union([1,2], [2,3]) AS u,
                  apoc.coll.intersection([1,2,3], [2,3,4]) AS i,
                  apoc.coll.containsAll([1,2,3], [1,2]) AS ca,
                  apoc.coll.occurrences([1,1,2], 1) AS oc,
                  apoc.coll.partition([1,2,3,4,5], 2) AS pt"""
    ).collect()[0]
    assert sorted(row.u) == [1, 2, 3] and sorted(row.i) == [2, 3]
    assert row.ca is True and row.oc == 2
    assert [list(p) for p in row.pt] == [[1, 2], [3, 4], [5]]


# ---- algorithm procedures ------------------------------------------------

def test_call_pagerank_procedure(eng):
    rows = eng.cypher(
        """CALL apoc.algo.pageRank(3) YIELD node, score
           RETURN node, score ORDER BY score DESC, node ASC LIMIT 5"""
    ).collect()
    assert len(rows) == 5 and rows[0].score >= rows[-1].score


def test_call_wcc_and_lpa_procedures(eng):
    n_wcc = eng.cypher("CALL apoc.algo.wcc()").count()
    n_lpa = eng.cypher("CALL apoc.algo.labelPropagation(2)").count()
    n_nodes = eng.catalog.graph.nodes.count()
    assert n_wcc == n_lpa == n_nodes


def test_call_dijkstra_procedure(eng):
    # customer 1 sits in region 4 in the sf0.001 fixture; hop cost 2
    row = eng.cypher(
        """CALL apoc.algo.dijkstra('Customer:1', 'Region:4')
           YIELD start, end, cost RETURN start, end, cost"""
    ).collect()
    assert row and row[0].cost == 2.0


def test_call_khop_procedure(eng, duck):
    check(
        eng, duck,
        """CALL apoc.neighbors.tohop('Supplier:1', 2) YIELD node, depth
           RETURN depth, count(*) AS n""",
        """
        WITH l1(id) AS (
          SELECT DISTINCT 'Part:' || l_partkey FROM lineitem WHERE l_suppkey = 1
          UNION SELECT 'Nation:' || s_nationkey FROM supplier WHERE s_suppkey = 1
        ),
        l2(id) AS (
          SELECT 'Region:' || n_regionkey FROM nation
          WHERE n_nationkey IN (SELECT s_nationkey FROM supplier WHERE s_suppkey = 1)
        )
        SELECT 1 AS depth, CAST(count(*) AS BIGINT) AS n FROM l1
        UNION ALL
        SELECT 2, CAST(count(*) AS BIGINT) FROM l2 WHERE id NOT IN (SELECT id FROM l1)
        """,
    )


def test_call_fastrp_procedure(eng):
    rows = eng.cypher(
        "CALL gds.fastRP.stream(8) YIELD nodeId, embedding RETURN nodeId, embedding LIMIT 3"
    ).collect()
    assert len(rows) == 3 and all(len(r.embedding) == 8 for r in rows)


# ---- correlated CALL {} subqueries --------------------------------------

def test_call_subquery_correlated_agg(eng, duck):
    # per-region nation count via WITH-import; left-join identities keep
    # regions without matches (none here, but count() must be per-key)
    check(
        eng, duck,
        """MATCH (r:Region)
           CALL { WITH r MATCH (r)<-[:IN]-(n:Nation) RETURN count(*) AS n }
           RETURN r.r_name AS region, n ORDER BY region""",
        """SELECT r_name AS region,
                  CAST((SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey)
                       AS BIGINT) AS n
           FROM region ORDER BY region""",
    )


def test_call_subquery_correlated_rows_multiply(eng, duck):
    check(
        eng, duck,
        """MATCH (r:Region) WHERE r.r_regionkey < 2
           CALL { WITH r MATCH (r)<-[:IN]-(n:Nation) RETURN n.n_name AS nation }
           RETURN r.r_name AS region, nation ORDER BY region, nation""",
        """SELECT r_name AS region, n_name AS nation
           FROM region JOIN nation ON n_regionkey = r_regionkey
           WHERE r_regionkey < 2 ORDER BY region, nation""",
    )


def test_call_subquery_correlated_per_row_limit(eng, duck):
    # LIMIT inside the correlated subquery is per OUTER row (top-2 nations
    # per region by name) — the windowed cut, not a global limit
    check(
        eng, duck,
        """MATCH (r:Region)
           CALL { WITH r MATCH (r)<-[:IN]-(n:Nation)
                  RETURN n.n_name AS nation ORDER BY n.n_name LIMIT 2 }
           RETURN r.r_name AS region, nation ORDER BY region, nation""",
        """SELECT region, nation FROM (
             SELECT r_name AS region, n_name AS nation,
                    row_number() OVER (PARTITION BY r_regionkey ORDER BY n_name) AS rk
             FROM region JOIN nation ON n_regionkey = r_regionkey
           ) WHERE rk <= 2 ORDER BY region, nation""",
    )


def test_call_subquery_correlated_value_import(eng, duck):
    # import of a VALUE variable (not a node) through WITH
    check(
        eng, duck,
        """MATCH (r:Region) WITH r.r_regionkey AS k
           CALL { WITH k MATCH (n:Nation) WHERE n.n_regionkey = k
                  RETURN sum(n.n_nationkey) AS s }
           RETURN k, s ORDER BY k""",
        """SELECT r_regionkey AS k,
                  (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation
                   WHERE n_regionkey = r_regionkey) AS s
           FROM region ORDER BY k""",
    )


def test_call_subquery_correlated_empty_input_identities(eng):
    # a key with no inner matches must survive with count 0 / collect []
    rows = eng.cypher(
        """MATCH (c:Customer) WHERE c.c_custkey <= 2
           CALL { WITH c MATCH (c)-[:PLACED]->(o:Order)
                  WHERE o.o_totalprice < 0
                  RETURN count(*) AS n, collect(o.o_orderkey) AS ks }
           RETURN c.c_custkey AS k, n, ks ORDER BY k"""
    ).collect()
    assert [r.k for r in rows] == [0, 1, 2]
    assert all(r.n == 0 and r.ks == [] for r in rows)


def test_var_length_to_bound_endpoint(eng, duck):
    # MATCH (a),(b) then var-length between the two bound vars
    # (reference traversal.go:1127-1237)
    check(
        eng, duck,
        """MATCH (c:Customer {c_custkey: 1}), (r:Region)
           MATCH (c)-[*2..2]->(r)
           RETURN r.r_name AS region, count(*) AS n""",
        """SELECT r_name AS region, CAST(count(*) AS BIGINT) AS n
           FROM customer JOIN nation ON c_nationkey = n_nationkey
                         JOIN region ON n_regionkey = r_regionkey
           WHERE c_custkey = 1
           GROUP BY r_name""",
    )


def test_using_index_hints_parsed_and_ignored(eng, duck):
    # reference index_hints.go:107-160 — hinted queries must run; Catalyst
    # owns access-path selection so hints parse as no-ops
    check(
        eng, duck,
        """MATCH (c:Customer) USING INDEX c:Customer(c_custkey)
           WHERE c.c_custkey < 5 RETURN count(*) AS n""",
        "SELECT CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_custkey < 5",
    )
    check(
        eng, duck,
        """MATCH (n:Nation) USING SCAN n:Nation USING JOIN ON n
           MATCH (n)-[:IN]->(r:Region)
           RETURN r.r_regionkey AS k, count(*) AS n ORDER BY k""",
        """SELECT r_regionkey AS k, CAST(count(*) AS BIGINT) AS n
           FROM nation JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1 ORDER BY 1""",
    )


def test_kalman_scalar_function_surface(eng):
    # kalman.init/process/predict/state/reset as JSON-state scalar
    # functions (reference kalman_functions.go:290-470, 933)
    import json

    r = eng.cypher(
        """WITH kalman.init({measurementNoise: 10.0}) AS s0
           WITH kalman.process(5.0, s0) AS r1
           RETURN r1.value AS v1, kalman.state(r1.state) AS cur,
                  kalman.predict(r1.state, 2) AS pred,
                  kalman.reset(r1.state) AS fresh"""
    ).collect()[0]
    p1 = 30.0001
    k = p1 / (p1 + 10.0)
    assert abs(r.v1 - k * 5.0) < 1e-9
    assert r.cur == r.v1
    st = json.loads(r.fresh)
    assert st == {"x": 0.0, "lx": 0.0, "p": 30.0, "k": 0.0, "e": 1.0,
                  "q": 0.0001, "r": 88.0, "vs": 10.0, "n": 0}


def test_entity_and_point_accessor_functions(eng):
    r = eng.cypher(
        """MATCH (a:Nation {n_nationkey: 0})-[e:IN]->(b)
           RETURN startNode(e) AS s, endNode(e) AS t,
                  hasLabels(a, ['Nation']) AS hl,
                  point.x(point({x: 3.0, y: 4.0})) AS px,
                  point.crs(point({x: 1.0, y: 2.0})) AS crs,
                  point.latitude(point({longitude: 1.0, latitude: 2.0})) AS lat"""
    ).collect()[0]
    assert (r.s, r.t, r.hl) == ("Nation:0", "Region:0", True)
    assert (r.px, r.crs, r.lat) == (3.0, "cartesian", 2.0)


def test_introspection_procedure_tail(eng):
    assert eng.cypher("CALL db.schema.nodeTypeProperties").count() > 20
    assert eng.cypher("CALL db.schema.relTypeProperties").count() > 10
    assert eng.cypher("CALL dbms.listConfig").count() == 4
    procs = {r.name for r in eng.cypher("CALL dbms.procedures").collect()}
    assert "db.index.vector.createnodeindex" in procs
    assert eng.cypher("CALL db.awaitIndexes").collect()[0].state == "ONLINE"


def test_stats_and_connection_procedure_tail(eng):
    # db.stats.* / dbms.functions / clientConfig / listConnections /
    # tx.setMetaData (reference call.go:610-784) — the no-op-ish batch
    # analogues still answer with the reference's shapes
    stats = {r.name: r.value for r in eng.cypher(
        "CALL db.stats.retrieve('GRAPH COUNTS')").collect()}
    assert stats["nodes"] > 0 and stats["relationships"] > 0
    assert eng.cypher("CALL db.stats.collect").collect()[0].success
    assert eng.cypher("CALL db.stats.stop").collect()[0].success
    fns = {r.name for r in eng.cypher("CALL dbms.functions").collect()}
    assert "vector.similarity.cosine" in fns
    assert eng.cypher("CALL dbms.clientConfig").count() == 0
    assert eng.cypher("CALL dbms.listConnections").count() == 0
    assert eng.cypher("CALL tx.setMetaData({app: 'test'})").collect()[0].success


def test_show_commands(eng):
    # SHOW routing (reference executor_show.go) — each maps to the
    # matching procedure frame
    assert {r.name for r in eng.cypher("SHOW INDEXES").collect()} >= {
        "embeddings_cosine", "documents_fulltext"
    }
    assert eng.cypher("SHOW CONSTRAINTS").count() == 6
    fns = {r.name for r in eng.cypher("SHOW FUNCTIONS").collect()}
    assert {"point.contains", "kalman.process", "vector.similarity.cosine"} <= fns
    dbs = eng.cypher("SHOW DATABASES").collect()
    assert len(dbs) == 1 and dbs[0].default
    # SHOW must not shadow `show` as an identifier
    assert eng.cypher("WITH 1 AS show RETURN show + 1 AS x").collect()[0].x == 2


def test_explain_and_profile_prefixes(eng):
    e = eng.cypher("EXPLAIN MATCH (r:Region) RETURN count(*) AS n").collect()
    assert len(e) == 1 and "Physical plan" in e[0].plan
    p = eng.cypher("PROFILE MATCH (r:Region) RETURN count(*) AS n").collect()
    assert p[0].n == 5


def test_result_and_ast_caches(eng):
    # result cache (reference SmartQueryCache, cache.go:476-560): repeated
    # read-only query with identical params returns the SAME compiled
    # DataFrame; a write invalidates it
    q = "MATCH (c:Customer) WHERE c.c_acctbal > $x RETURN count(*) AS n"
    a = eng.cypher(q, {"x": 100})
    b = eng.cypher(q, {"x": 100})
    assert a is b
    assert eng.cypher(q, {"x": 500}) is not a  # params key the cache
    n_before = a.collect()[0].n
    eng.cypher("CREATE (c:Customer {c_custkey: 999999, c_acctbal: 101.0})")
    c = eng.cypher(q, {"x": 100})
    assert c is not a  # write → new store snapshot → miss
    assert c.collect()[0].n == n_before + 1
    # writes are never cached
    w = "CREATE (t:Tag {name: 'x'})"
    eng.cypher(w)
    from nornicdb_spark.engine import _is_read_only, _cached_parse
    assert not _is_read_only(_cached_parse(w))
    # index DDL invalidates introspection reads
    idx_before = eng.cypher("CALL db.indexes")
    eng.cypher(
        "CALL db.index.vector.createNodeIndex('cache_t', 'Embedding', 'embedding', 64)"
    )
    assert eng.cypher("CALL db.indexes") is not idx_before


# Every function name the reference advertises via SHOW FUNCTIONS
# (executor_show.go:73-160) — the surface-parity contract.
_REFERENCE_SHOW_FUNCTIONS = """
id elementId labels type keys properties coalesce head last tail size length
reverse range toString toInteger toFloat toBoolean toLower toUpper trim ltrim
rtrim replace split substring left right abs ceil floor round sign sqrt rand
randomUUID sin cos tan log log10 exp pi e timestamp datetime date time count
sum avg min max collect exists isEmpty all any none single point distance
polygon lineString point.intersects point.contains vector.similarity.cosine
vector.similarity.euclidean kalman.init kalman.process kalman.predict
kalman.state kalman.reset kalman.velocity.init kalman.velocity.process
kalman.velocity.predict kalman.adaptive.init kalman.adaptive.process
""".split()


def test_function_surface_covers_reference(eng):
    ours = {r.name for r in eng.cypher("SHOW FUNCTIONS").collect()}
    missing = [f for f in _REFERENCE_SHOW_FUNCTIONS if f not in ours]
    assert not missing, f"advertised surface missing: {missing}"


def test_time_and_scalar_exists(eng):
    r = eng.cypher(
        "RETURN time('2024-03-05 13:45:09') AS t, exists(1) AS e1, "
        "exists(null) AS e0"
    ).collect()[0]
    assert (r.t, r.e1, r.e0) == ("13:45:09", True, False)


def test_kalman_velocity_scalar_chain(eng):
    # two steps of a rising series: velocity must come out positive, and
    # predict() must extrapolate beyond the current position
    r = eng.cypher(
        """WITH kalman.velocity.init() AS s0
           WITH kalman.velocity.process(1.0, s0) AS r1
           WITH r1, kalman.velocity.process(2.0, r1.state) AS r2
           RETURN r2.value AS v, r2.velocity AS vel,
                  kalman.velocity.predict(r2.state, 3) AS p3"""
    ).collect()[0]
    assert r.vel > 0
    assert r.p3 > r.v
    # cross-check the filter math against a plain-python replica of the
    # reference's predict/update equations (kalman_functions.go:600-660)
    def step(z, pos, vel, p, qp=0.1, qv=0.01, rr=1.0, dt=1.0):
        pp = pos + vel * dt
        p00, p01, p10, p11 = p
        a = p00 + dt*p10 + dt*p01 + dt*dt*p11 + qp
        b2 = p01 + dt*p11
        c = p10 + dt*p11
        d = p11 + qv
        s = a + rr
        k0, k1 = a/s, c/s
        inn = z - pp
        return (pp + k0*inn, vel + k1*inn,
                [(1-k0)*a, (1-k0)*b2, c - k1*a, d - k1*b2])
    pos, vel, p = 0.0, 0.0, [100.0, 0.0, 0.0, 10.0]
    pos, vel, p = step(1.0, pos, vel, p)
    pos, vel, p = step(2.0, pos, vel, p)
    assert abs(r.v - pos) < 1e-9
    assert abs(r.vel - vel) < 1e-9


def test_kalman_adaptive_scalar_switches_mode(eng):
    # hysteresis=1 and a strong trend: one step in basic mode computes a
    # trend above the threshold and switches to velocity mode
    r = eng.cypher(
        """WITH kalman.adaptive.init({hysteresis: 1, trendThreshold: 0.001}) AS s0
           WITH kalman.adaptive.process(5.0, s0) AS r1
           WITH r1, kalman.adaptive.process(10.0, r1.state) AS r2
           RETURN r1.mode AS m1, r2.mode AS m2"""
    ).collect()[0]
    assert r.m2 == "velocity"
    # reset detects the filter family from the state JSON
    r2 = eng.cypher(
        """WITH kalman.velocity.init(3.0, 1.0) AS sv
           RETURN kalman.state(kalman.reset(sv)) IS NOT NULL AS ok,
                  kalman.velocity.predict(kalman.reset(sv), 5) AS p"""
    ).collect()[0]
    assert r2.p == 0.0  # reset → default zeroed velocity state


def test_scalar_function_tail(eng):
    import math

    r = eng.cypher(
        """RETURN sinh(1.0) AS sh, cot(1.0) AS ct, haversin(2.0) AS hv,
                  toBooleanList(['true', 'x', 'false']) AS bl,
                  toIntegerOrNull('abc') AS bad, toIntegerOrNull('7') AS ok,
                  valueType(1) AS vt_i, valueType('s') AS vt_s,
                  valueType([1]) AS vt_l,
                  btrim('xxaxx', 'x') AS bt, char_length('abc') AS cl,
                  format('%s-%d', 'a', 3) AS fm, indexOf('hello', 'll') AS ix,
                  normalize('café') AS nn"""
    ).collect()[0]
    assert abs(r.sh - math.sinh(1.0)) < 1e-12
    assert abs(r.ct - 1 / math.tan(1.0)) < 1e-12
    assert abs(r.hv - (1 - math.cos(2.0)) / 2) < 1e-12
    assert r.bl == [True, None, False]
    assert r.bad is None and r.ok == 7
    assert (r.vt_i, r.vt_s, r.vt_l) == ("INTEGER", "STRING", "LIST")
    assert r.bt == "a" and r.cl == 3 and r.fm == "a-3" and r.ix == 2
    assert r.nn == "café"  # NFC composes e + combining acute


def test_unicode_string_literals_roundtrip(eng):
    # regression: the lexer's bytes→unicode_escape round-trip latin-1-
    # mangled any non-ASCII literal ('café' → 'cafÃ©')
    r = eng.cypher(
        "RETURN 'café' AS c, 'naïve—旅' AS u, 'a\\nb' AS esc, '\\u0041' AS hex"
    ).collect()[0]
    assert r.c == "café" and r.u == "naïve—旅"
    assert r.esc == "a\nb" and r.hex == "A"


def test_use_prefix_and_call_in_transactions(eng):
    # :USE db prefix (reference executor.go:490-541) + CALL {} IN
    # TRANSACTIONS batching suffix (a no-op in one-snapshot batch runs)
    n1 = eng.cypher("USE neo4j MATCH (r:Region) RETURN count(*) AS n").collect()[0].n
    n2 = eng.cypher(
        """CALL { MATCH (r:Region) RETURN r.r_name AS name } IN TRANSACTIONS OF 100 ROWS
           RETURN count(*) AS n"""
    ).collect()[0].n
    assert n1 == n2 == 5
    import pytest as _pytest
    with _pytest.raises(ValueError, match="not attached"):
        eng.cypher("USE otherdb MATCH (n) RETURN n")


def test_apoc_surface_tail(eng):
    # apoc.coll.split / sortNodes, apoc.map.fromLists, apoc.meta.isType
    # (reference apoc_collections.go:339-359, 683-721, 1009-1035;
    # functions_eval_functions.go:2156-2171)
    r = eng.cypher(
        """RETURN apoc.coll.split([1, 0, 2, 0, 3], 0) AS s,
                  apoc.map.fromLists(['a', 'b'], [1, 2]) AS m,
                  apoc.meta.isType(1, 'integer') AS t1,
                  apoc.meta.isType('x', 'integer') AS t0"""
    ).collect()[0]
    assert r.s == [["1"], ["2"], ["3"]]
    assert dict(r.m) == {"a": 1, "b": 2}
    assert (r.t1, r.t0) == (True, False)
    r2 = eng.cypher(
        """WITH [{name: 'b', v: 3.0}, {name: 'a', v: 1.0}] AS ns
           RETURN apoc.coll.sortNodes(ns, 'v') AS sorted"""
    ).collect()[0]
    assert [x["name"] for x in r2.sorted] == ["a", "b"]


# ---- §2.9 tail CALL routing ---------------------------------------------

def test_call_astar_procedure(eng, duck):
    check(
        eng, duck,
        """CALL apoc.algo.aStar('Customer:1', 'Region:4')
           YIELD start, end, cost RETURN start, end, cost""",
        """SELECT 'Customer:1' AS start, 'Region:4' AS "end", 2.0 AS cost
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_custkey = 1 AND n_regionkey = 4""",
    )


def test_call_all_simple_paths_procedure(eng, duck):
    check(
        eng, duck,
        """CALL apoc.algo.allSimplePaths('Customer:1', 'Region:4', null, 3)
           YIELD path, depth RETURN path, depth""",
        """SELECT ['Customer:1', 'Nation:' || c_nationkey,
                   'Region:4'] AS path, CAST(2 AS INT) AS depth
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_custkey = 1 AND n_regionkey = 4""",
    )


def test_call_centrality_procedures(eng):
    # isolated single-label subgraph (all edges cross labels) → 0 scores
    rows = eng.cypher(
        "CALL apoc.algo.betweenness('Nation') YIELD node, score RETURN node, score"
    ).collect()
    assert len(rows) == 25 and all(r.score == 0.0 for r in rows)
    rows = eng.cypher(
        "CALL apoc.algo.closeness(['Nation', 'Region']) YIELD node, score "
        "RETURN count(*) AS n"
    ).collect()
    assert rows[0].n == 30
    # sampled mode: {samples: k} bounds the Brandes source set; on the
    # edge-free Nation subgraph every estimate is still exactly 0
    rows = eng.cypher(
        "CALL apoc.algo.betweenness('Nation', {samples: 5}) "
        "YIELD node, score RETURN node, score"
    ).collect()
    assert len(rows) == 25 and all(r.score == 0.0 for r in rows)


def test_call_louvain_star_collapse(eng):
    row = eng.cypher(
        """CALL apoc.algo.louvain(['Nation', 'Region']) YIELD node, community
           RETURN count(DISTINCT community) AS nc, count(*) AS nn"""
    ).collect()[0]
    assert row.nc == 5 and row.nn == 30


def test_call_path_procs(eng, duck):
    check(
        eng, duck,
        """CALL apoc.path.subgraphNodes('Supplier:1', {maxLevel: 2})
           YIELD node RETURN node""",
        """SELECT 'Supplier:1' AS node
           UNION SELECT DISTINCT 'Part:' || l_partkey FROM lineitem
                 WHERE l_suppkey = 1
           UNION SELECT 'Nation:' || s_nationkey FROM supplier
                 WHERE s_suppkey = 1
           UNION SELECT 'Region:' || n_regionkey FROM nation
                 WHERE n_nationkey = (SELECT s_nationkey FROM supplier
                                      WHERE s_suppkey = 1)""",
    )
    n = eng.cypher(
        """CALL apoc.path.expand('Customer:1', 'PLACED|CONTAINS', null, 2, 2)
           YIELD path RETURN count(*) AS n"""
    ).collect()[0].n
    want = eng.catalog.lineitem.join(
        eng.catalog.orders.filter("o_custkey = 1"),
        eng.catalog.lineitem.l_orderkey == eng.catalog.orders.o_orderkey,
    ).count()
    assert n == want


def test_call_byhop_procedure(eng):
    rows = {r.depth: r.nodes for r in eng.cypher(
        "CALL apoc.neighbors.byhop('Supplier:1', 2) YIELD nodes, depth "
        "RETURN nodes, depth").collect()}
    assert 1 in rows and 2 in rows
    assert rows[1] == sorted(rows[1]) and len(rows[2]) == 1


def test_call_link_prediction_stream(eng):
    rows = eng.cypher(
        """CALL gds.linkPrediction.adamicAdar.stream(
             {sourceNode: 'Supplier:1', topK: 3,
              relationshipTypes: ['SUPPLIES']})
           YIELD node1, node2, score RETURN node1, node2, score"""
    ).collect()
    assert len(rows) == 3
    assert all(r.node1 == 'Supplier:1' for r in rows)
    assert rows[0].score >= rows[-1].score
