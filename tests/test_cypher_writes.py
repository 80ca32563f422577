"""Cypher write-clause behavior tests (reference merge_test.go /
executor_mutations style): CREATE/MERGE/SET/REMOVE/DELETE against the
session store, reads observing writes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nornicdb_spark.engine import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    # function-scoped: each test gets a fresh store
    return Engine(spark, sf_dir)


def one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_create_node_then_read(eng):
    stats = one(eng.cypher("CREATE (r:Region {r_regionkey: 90, r_name: 'R90'})"))
    assert stats.nodes_created == 1
    row = one(eng.cypher(
        "MATCH (r:Region) WHERE r.r_regionkey = 90 RETURN r.r_name AS name"
    ))
    assert row.name == "R90"


def test_create_relationship_between_created(eng):
    stats = one(eng.cypher(
        """CREATE (a:Region {r_regionkey: 91, r_name: 'A'}),
                  (b:Region {r_regionkey: 92, r_name: 'B'}),
                  (a)-[:IN]->(b)"""
    ))
    assert stats.nodes_created == 2
    assert stats.relationships_created == 1
    row = one(eng.cypher(
        """MATCH (a:Region {r_regionkey: 91})-[:IN]->(b:Region)
           RETURN b.r_regionkey AS k"""
    ))
    assert row.k == 92


def test_set_property_and_new_property(eng):
    stats = one(eng.cypher(
        "MATCH (n:Nation) WHERE n.n_nationkey < 3 SET n.flag = 'X'"
    ))
    assert stats.properties_set == 3
    got = eng.cypher(
        "MATCH (n:Nation) WHERE n.flag = 'X' RETURN count(*) AS n"
    )
    assert one(got).n == 3


def test_set_expression_over_own_properties(eng):
    eng.cypher("MATCH (n:Nation) SET n.double_key = n.n_nationkey * 2")
    row = one(eng.cypher(
        "MATCH (n:Nation {n_nationkey: 7}) RETURN n.double_key AS d"
    ))
    assert row.d == 14


def test_remove_property(eng):
    eng.cypher("MATCH (n:Nation) SET n.flag = 'Y'")
    eng.cypher("MATCH (n:Nation) WHERE n.n_nationkey < 5 REMOVE n.flag")
    n = one(eng.cypher(
        "MATCH (n:Nation) WHERE n.flag IS NULL RETURN count(*) AS n"
    )).n
    assert n == 5


def test_delete_refuses_connected_nodes(eng):
    with pytest.raises(ValueError, match="DETACH"):
        eng.cypher("MATCH (n:Nation {n_nationkey: 0}) DELETE n")


def test_detach_delete_cascades(eng):
    stats = one(eng.cypher(
        "MATCH (n:Nation {n_nationkey: 0}) DETACH DELETE n"
    ))
    assert stats.nodes_deleted == 1
    assert stats.relationships_deleted > 0
    assert one(eng.cypher("MATCH (n:Nation) RETURN count(*) AS n")).n == 24
    # no edge in the store still touches the deleted node
    dangling = eng.store.edges.filter(
        (F.col("src") == "Nation:0") | (F.col("dst") == "Nation:0")
    ).count()
    assert dangling == 0


def test_merge_on_create_and_on_match(eng):
    s1 = one(eng.cypher(
        """MERGE (r:Region {r_regionkey: 95})
           ON CREATE SET r.r_name = 'fresh'
           ON MATCH SET r.r_name = 'seen'"""
    ))
    assert s1.nodes_created == 1
    assert one(eng.cypher(
        "MATCH (r:Region {r_regionkey: 95}) RETURN r.r_name AS name"
    )).name == "fresh"
    s2 = one(eng.cypher(
        """MERGE (r:Region {r_regionkey: 95})
           ON CREATE SET r.r_name = 'fresh'
           ON MATCH SET r.r_name = 'seen'"""
    ))
    assert s2.nodes_created == 0
    assert one(eng.cypher(
        "MATCH (r:Region {r_regionkey: 95}) RETURN r.r_name AS name"
    )).name == "seen"


def test_create_edges_from_matched_frame(eng):
    # bound-to-created: every nation of region 0 gets an edge to the new
    # hub node — one edge per matched row, one node total
    stats = one(eng.cypher(
        """MATCH (n:Nation) WHERE n.n_regionkey = 0
           CREATE (n)-[:IN]->(h:Region {r_regionkey: 98, r_name: 'H2'})"""
    ))
    assert stats.relationships_created == 5
    assert one(eng.cypher(
        "MATCH (n:Nation)-[:IN]->(h:Region {r_regionkey: 98}) RETURN count(*) AS n"
    )).n == 5


def test_parallel_created_edges_get_distinct_ids(eng):
    # Creating a second same-type edge between the same endpoints (or
    # re-running a CREATE) must yield a new edge_id — relationship
    # uniqueness in var-length traversal depends on distinct ids.
    eng.cypher(
        """CREATE (a:Region {r_regionkey: 93, r_name: 'P1'}),
                  (b:Region {r_regionkey: 94, r_name: 'P2'})"""
    )
    for _ in range(2):
        eng.cypher(
            """MATCH (a:Region {r_regionkey: 93}), (b:Region {r_regionkey: 94})
               CREATE (a)-[:LINK]->(b)"""
        )
    n = one(eng.cypher(
        "MATCH (a:Region {r_regionkey: 93})-[:LINK]->(b:Region) RETURN count(*) AS n"
    )).n
    assert n == 2
    n_var = one(eng.cypher(
        "MATCH (a:Region {r_regionkey: 93})-[*1..1]->(b) RETURN count(*) AS n"
    )).n
    assert n_var == 2


def test_foreach_creates_dynamic_label_nodes(eng):
    stats = one(eng.cypher("FOREACH (x IN [1,2,3] | CREATE (:Tmp {v: x}))"))
    assert stats.nodes_created == 3
    row = one(eng.cypher("MATCH (t:Tmp) RETURN count(*) AS n, sum(t.v) AS s"))
    assert (row.n, row.s) == (3, 6)


def test_foreach_range_and_nested(eng):
    one(eng.cypher(
        "FOREACH (x IN range(1, 2) | FOREACH (y IN [10] | CREATE (:Pt {v: x * y})))"
    ))
    row = one(eng.cypher("MATCH (p:Pt) RETURN count(*) AS n, sum(p.v) AS s"))
    assert (row.n, row.s) == (2, 30)


def test_set_plus_map_merge(eng):
    one(eng.cypher(
        "MATCH (r:Region {r_regionkey: 0}) SET r += {r_name: 'ZED', extra: 7}"
    ))
    row = one(eng.cypher(
        "MATCH (r:Region {r_regionkey: 0}) RETURN r.r_name AS n, r.extra AS e"
    ))
    assert (row.n, row.e) == ("ZED", 7)


def test_detach_delete_dynamic_label(eng):
    one(eng.cypher("FOREACH (x IN [1,2] | CREATE (:Tmp {v: x}))"))
    stats = one(eng.cypher("MATCH (t:Tmp) DETACH DELETE t"))
    assert stats.nodes_deleted == 2
    row = one(eng.cypher("MATCH (t:Tmp) RETURN count(*) AS n"))
    assert row.n == 0


def test_match_unknown_label_is_empty_not_error(eng):
    row = one(eng.cypher("MATCH (z:Nope) RETURN count(*) AS n"))
    assert row.n == 0


def test_merge_dynamic_label_upsert(eng):
    s1 = one(eng.cypher("MERGE (t:Tag {name: 'alpha'}) ON CREATE SET t.hits = 1"))
    assert s1.nodes_created == 1
    s2 = one(eng.cypher(
        "MERGE (t:Tag {name: 'alpha'}) ON MATCH SET t.hits = 2"
    ))
    assert s2.nodes_created == 0
    row = one(eng.cypher("MATCH (t:Tag {name: 'alpha'}) RETURN t.hits AS h"))
    assert row.h == 2


def test_call_subquery_with_write(eng):
    stats = one(eng.cypher(
        "CALL { CREATE (:Tmp {v: 1}) } CREATE (:Tmp {v: 2})"
    ))
    assert stats.nodes_created == 2


def test_merge_relationship_create_then_match(eng):
    q = """MATCH (a:Region {r_regionkey: 0}), (b:Region {r_regionkey: 1})
           MERGE (a)-[r:BRIDGE]->(b)
           ON CREATE SET r.status = 'new'
           ON MATCH SET r.status = 'seen'"""
    s1 = one(eng.cypher(q))
    assert s1.relationships_created == 1
    assert one(eng.cypher(
        "MATCH (:Region {r_regionkey: 0})-[r:BRIDGE]->(:Region) RETURN r.status AS s"
    )).s == "new"
    s2 = one(eng.cypher(q))
    assert s2.relationships_created == 0
    assert one(eng.cypher(
        "MATCH (:Region {r_regionkey: 0})-[r:BRIDGE]->(:Region) RETURN r.status AS s"
    )).s == "seen"


def test_merge_relationship_per_pair_fates(eng):
    # one (nation 0 → region 0) NEAR edge pre-exists; merging all five
    # nations of region 0 must create only the four missing edges
    eng.cypher(
        """MATCH (n:Nation {n_nationkey: 0}), (r:Region {r_regionkey: 0})
           MERGE (n)-[:NEAR]->(r)"""
    ).collect()
    s = one(eng.cypher(
        """MATCH (n:Nation)-[:IN]->(r:Region {r_regionkey: 0})
           MERGE (n)-[:NEAR]->(r)"""
    ))
    assert s.relationships_created == 4
    assert one(eng.cypher(
        "MATCH (:Nation)-[:NEAR]->(:Region) RETURN count(*) AS n"
    )).n == 5


def test_merge_rel_unbound_endpoints_creates_pattern(eng):
    s = one(eng.cypher("MERGE (a:Hub {hid: 1})-[:LINKS]->(b:Hub {hid: 2})"))
    assert s.nodes_created == 2
    assert s.relationships_created == 1
    s2 = one(eng.cypher("MERGE (a:Hub {hid: 1})-[:LINKS]->(b:Hub {hid: 2})"))
    assert s2.nodes_created == 0
    assert s2.relationships_created == 0


def test_merge_rel_chain_and_incoming_direction(eng):
    s = one(eng.cypher(
        "MERGE (a:Chn {x: 1})-[:N]->(b:Chn {x: 2})-[:N]->(c:Chn {x: 3})"
    ))
    assert s.nodes_created == 3
    assert s.relationships_created == 2
    # incoming direction: edge goes b → a
    s2 = one(eng.cypher("MERGE (a:Chn {x: 1})<-[:REV]-(b:Chn {x: 2})"))
    assert s2.nodes_created == 0
    assert s2.relationships_created == 1
    assert one(eng.cypher(
        "MATCH (b:Chn {x: 2})-[:REV]->(a:Chn {x: 1}) RETURN count(*) AS n"
    )).n == 1


def test_apoc_cypher_run_yields_json_value(eng):
    rows = eng.cypher(
        """CALL apoc.cypher.run(
             'MATCH (r:Region) RETURN r.r_regionkey AS k ORDER BY k LIMIT 2', {})"""
    ).collect()
    assert [r.value for r in rows] == ['{"k":0}', '{"k":1}']


def test_apoc_cypher_run_many_executes_writes(eng):
    rows = eng.cypher(
        """CALL apoc.cypher.runMany(
             'CREATE (:Batch {v: 1}); CREATE (:Batch {v: 2})', {})"""
    ).collect()
    assert len(rows) == 2
    assert one(eng.cypher("MATCH (b:Batch) RETURN count(*) AS n")).n == 2


def test_apoc_periodic_iterate_batched_writes(eng):
    r = one(eng.cypher(
        """CALL apoc.periodic.iterate(
             'MATCH (n:Nation) WHERE n.n_nationkey < 6 RETURN n.n_nationkey AS key',
             'MATCH (n:Nation {n_nationkey: $key}) SET n.batched = true',
             {batchSize: 2})"""
    ))
    assert (r.batches, r.total, r.committedOperations, r.failedOperations) == (3, 6, 6, 0)
    assert one(eng.cypher(
        "MATCH (n:Nation) WHERE n.batched = true RETURN count(*) AS n"
    )).n == 6


def test_apoc_periodic_commit_loops_until_no_updates(eng):
    # reference call_apoc_periodic.go:148-230 — re-run the LIMITed write
    # until an execution updates 0 rows: delete the 5 nations of region 0
    # two at a time → 3 deleting runs + 1 empty run
    r = one(eng.cypher(
        """CALL apoc.periodic.commit(
             'MATCH (n:Nation) WHERE n.n_regionkey = 0 WITH n LIMIT 2 DETACH DELETE n',
             {})"""
    ))
    assert r.updates >= 5          # 5 node deletions (+ cascaded edges)
    assert r.executions == 4       # ceil(5/2) deleting runs + terminal empty
    assert one(eng.cypher(
        "MATCH (n:Nation) WHERE n.n_regionkey = 0 RETURN count(*) AS n"
    )).n == 0


def test_apoc_periodic_iterate_one_statement_per_batch(eng, monkeypatch):
    # APOC binds batchSize rows per transaction (call_apoc_periodic.go:
    # 63-115): the action must compile/run once per CHUNK, not per outer
    # row — 7 rows at batchSize 3 → 1 CALL + 1 iterate + 3 actions.
    import nornicdb_spark.cypher.compiler as C

    calls = []
    orig = C.Compiler._compile_single

    def spy(self, q):
        calls.append(q)
        return orig(self, q)

    monkeypatch.setattr(C.Compiler, "_compile_single", spy)
    r = one(eng.cypher(
        """CALL apoc.periodic.iterate(
             'UNWIND range(1, 7) AS key RETURN key',
             'CREATE (:PBatch {k: $key})',
             {batchSize: 3})"""
    ))
    assert (r.batches, r.total, r.committedOperations) == (3, 7, 7)
    assert len(calls) == 5  # outer CALL + iterate + ceil(7/3) action runs
    assert one(eng.cypher("MATCH (p:PBatch) RETURN count(*) AS n")).n == 7


def test_create_per_row_with_expression_props(eng):
    # per-row CREATE: one node per pipeline row, property expressions
    # evaluated against the row (distributed bulk path, no driver loop)
    eng.cypher("UNWIND [1, 2, 3] AS x CREATE (:XCopy {v: x * 10})")
    rows = eng.cypher(
        "MATCH (c:XCopy) RETURN c.v AS v ORDER BY v"
    ).collect()
    assert [r.v for r in rows] == [10, 20, 30]
    eng.cypher("MATCH (r:Region) CREATE (:RegionCopy {rk: r.r_regionkey})")
    assert one(eng.cypher(
        "MATCH (c:RegionCopy) RETURN count(DISTINCT c.rk) AS n"
    )).n == 5


def test_create_per_row_binds_var_for_relationships(eng):
    # the created var binds per-row → chained relationship CREATE links
    # each new node to its source row's node
    eng.cypher(
        """MATCH (r:Region)
           CREATE (m:Mirror {rk: r.r_regionkey})-[:OF]->(r)"""
    )
    rows = eng.cypher(
        """MATCH (m:Mirror)-[:OF]->(r:Region)
           WHERE m.rk = r.r_regionkey RETURN count(*) AS n"""
    ).collect()
    assert rows[0].n == 5


def test_apoc_periodic_iterate_null_columns_and_string_literals(eng):
    # (a) an outer column that is null in every row must not kill the
    # chunk (explicit schema, not inference); (b) '$name' inside a string
    # literal of the action must survive the _row rewrite untouched
    r = one(eng.cypher(
        """CALL apoc.periodic.iterate(
             'UNWIND [1, 2] AS k RETURN k, null AS opt',
             'CREATE (:NullProbe {k: $k, note: \\'cost $k USD\\'})',
             {batchSize: 10})"""
    ))
    assert (r.total, r.committedOperations, r.failedOperations) == (2, 2, 0)
    rows = eng.cypher(
        "MATCH (p:NullProbe) RETURN p.note AS note, p.k AS k ORDER BY k"
    ).collect()
    assert [x.k for x in rows] == [1, 2]
    assert all(x.note == "cost $k USD" for x in rows)


def test_call_path_expand_label_filter_forms(eng):
    # '>Label' includes end labels, '-Label' excludes them
    n_inc = eng.cypher(
        """CALL apoc.path.expand('Customer:1', 'PLACED|CONTAINS', '>Part', 1, 2)
           YIELD path RETURN count(*) AS n"""
    ).collect()[0].n
    n_exc = eng.cypher(
        """CALL apoc.path.expand('Customer:1', 'PLACED|CONTAINS', '-Part', 1, 2)
           YIELD path RETURN count(*) AS n"""
    ).collect()[0].n
    n_all = eng.cypher(
        """CALL apoc.path.expand('Customer:1', 'PLACED|CONTAINS', null, 1, 2)
           YIELD path RETURN count(*) AS n"""
    ).collect()[0].n
    assert n_inc > 0 and n_exc > 0 and n_inc + n_exc == n_all


def test_call_null_numeric_args_fall_back_to_defaults(eng):
    rows = eng.cypher(
        """CALL apoc.algo.allSimplePaths('Customer:1', 'Region:4', null, null)
           YIELD path, depth RETURN count(*) AS n"""
    ).collect()
    assert rows[0].n >= 0  # no TypeError; default maxDepth applies
