"""Generate an sfN dataset (N/10 x sf0.1, default sf1 = 10 copies) for
scale validation.

The driver provides sf{0.001,0.01,0.1}; the 100x-design claims in
SCALING.md need at least one measured order of magnitude, so this script
derives sf1 from sf0.1 as 10 key-shifted copies:

- region/nation (the fixed spine) are copied once, unchanged;
- customer/supplier/part/orders/lineitem/events/documents/embeddings get
  10 copies with dense per-copy key offsets (copy i shifts each key by
  i * table_cardinality), preserving every FK relationship — the result
  is 10 disjoint star-schema subgraphs hanging off the same 25-nation
  spine, the same shape a real 10x TPC-H scale-up has;
- document text of copies >0 gets a per-copy suffix (so near-dup
  structure exists across copies without making every doc 10x-duplicated)
  and embeddings of copies >0 get a small deterministic hash jitter (so
  ANN top-k has no 10-way exact ties).

Deterministic (pure SQL over the parquet inputs, no RNG). Output:
.scale/sf1/*.parquet (gitignored artifact, ~200 MB).

Usage: python scripts/make_sf1.py [src_dir] [dst_dir] [copies]
(copies=100 with dst .scale/sf10 gives a measured-100x dataset)
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else str(
    pathlib.Path(__file__).resolve().parent.parent / ".scale" / "sf1"
)
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-copy key offsets = sf0.1 table cardinalities (keys are 0-based dense)
C, S, P, O, E, D, V = 15_000, 1_000, 20_000, 150_000, 100_000, 5_000, 2_000


def main() -> None:
    pathlib.Path(DST).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
        )

    out = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + i * {C} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer, copies""",
        "supplier": f"""
            SELECT s_suppkey + i * {S} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, copies""",
        "part": f"""
            SELECT p_partkey + i * {P} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM part, copies""",
        "orders": f"""
            SELECT o_orderkey + i * {O} AS o_orderkey,
                   o_custkey + i * {C} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM orders, copies""",
        "lineitem": f"""
            SELECT l_orderkey + i * {O} AS l_orderkey,
                   l_partkey + i * {P} AS l_partkey,
                   l_suppkey + i * {S} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, copies""",
        "events": f"""
            SELECT event_id + i * {E} AS event_id, ts,
                   user_id + i * {C} AS user_id, event_type, value, props
            FROM events, copies""",
        "documents": f"""
            SELECT doc_id + i * {D} AS doc_id,
                   CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text,
                   lang, source,
                   CAST(length(CASE WHEN i = 0 THEN text
                                    ELSE text || ' c' || i END) AS BIGINT)
                     AS n_chars
            FROM documents, copies""",
        "embeddings": f"""
            SELECT vec_id + i * {V} AS vec_id,
                   CASE WHEN i = 0 THEN embedding
                        ELSE CAST(list_transform(embedding, (x, j) ->
                               x + ((hash(vec_id * 131 + i * 17 + j) % 1000)
                                    / 1000.0 - 0.5) * 0.01)
                             AS FLOAT[]) END AS embedding,
                   label
            FROM embeddings, copies""",
    }
    for t, sql in out.items():
        con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
