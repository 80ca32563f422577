"""APOC collection / map / convert / text functions (SURVEY §2.6 APOC
rows; reference pkg/cypher/apoc_collections.go, 1041 LoC).

Each is a Column builder over native array/map expressions — the APOC
name appears in the docstring so the inventory maps 1:1. Higher-order
forms use Spark lambda expressions (still JVM codegen, never Python).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---- apoc.coll.* --------------------------------------------------------

def coll_to_set(arr: Column) -> Column:
    """apoc.coll.toSet — dedup preserving first occurrence order is not
    guaranteed by APOC either; we return sorted-distinct for determinism."""
    return F.array_sort(F.array_distinct(arr))


def coll_subtract(a: Column, b: Column) -> Column:
    """apoc.coll.subtract (set difference, deduped)."""
    return F.array_sort(F.array_except(a, b))


def coll_union(a: Column, b: Column) -> Column:
    """apoc.coll.union (deduped union)."""
    return F.array_sort(F.array_union(a, b))


def coll_union_all(a: Column, b: Column) -> Column:
    """apoc.coll.unionAll (concat, keeps duplicates)."""
    return F.concat(a, b)


def coll_intersection(a: Column, b: Column) -> Column:
    """apoc.coll.intersection."""
    return F.array_sort(F.array_intersect(a, b))


def coll_flatten(arr: Column) -> Column:
    """apoc.coll.flatten (one level)."""
    return F.flatten(arr)


def coll_index_of(arr: Column, value) -> Column:
    """apoc.coll.indexOf — 0-based, −1 when absent (array_position is
    1-based with 0-for-absent)."""
    return (F.array_position(arr, value) - 1).cast("long")


def coll_contains_all(a: Column, b: Column) -> Column:
    """apoc.coll.containsAll — every element of b appears in a."""
    return F.size(F.array_except(b, a)) == 0


def coll_contains_any(a: Column, b: Column) -> Column:
    """apoc.coll.containsAny."""
    return F.size(F.array_intersect(a, b)) > 0


def coll_occurrences(arr: Column, value) -> Column:
    """apoc.coll.occurrences — count of value in list."""
    return F.size(F.filter(arr, lambda x: x == value)).cast("long")


def coll_frequencies(arr: Column) -> Column:
    """apoc.coll.frequencies — array<struct<item, count>> sorted by item
    (APOC returns a list of {item, count} maps)."""
    return F.array_sort(
        F.transform(
            F.array_distinct(arr),
            lambda v: F.struct(
                v.alias("item"),
                F.size(F.filter(arr, lambda x: x == v)).cast("long").alias("count"),
            ),
        )
    )


def coll_pairs(arr: Column) -> Column:
    """apoc.coll.pairs — consecutive pairs [[a,b],[b,c],...] as
    array<struct<first, second>>."""
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - 1),
        lambda i: F.struct(
            F.element_at(arr, i).alias("first"),
            F.element_at(arr, i + 1).alias("second"),
        ),
    )


def coll_partition(arr: Column, n: int) -> Column:
    """apoc.coll.partition — chunks of n (last chunk may be short)."""
    return F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(arr) / F.lit(n)).cast("int") - 1),
        lambda i: F.slice(arr, i * n + 1, n),
    )


def coll_zip(a: Column, b: Column) -> Column:
    """apoc.coll.zip — pairwise zip to array<struct>."""
    return F.arrays_zip(a, b)


def coll_sort(arr: Column) -> Column:
    """apoc.coll.sort."""
    return F.array_sort(arr)


def coll_sum(arr: Column) -> Column:
    """apoc.coll.sum."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def coll_avg(arr: Column) -> Column:
    """apoc.coll.avg."""
    return coll_sum(arr) / F.size(arr)


def coll_min(arr: Column) -> Column:
    """apoc.coll.min."""
    return F.array_min(arr)


def coll_max(arr: Column) -> Column:
    """apoc.coll.max."""
    return F.array_max(arr)


# ---- apoc.map.* ---------------------------------------------------------

def map_merge(a: Column, b: Column) -> Column:
    """apoc.map.merge — right side wins on key conflicts (map_concat in
    Spark errors on duplicates by default; LAST_WIN policy matches APOC)."""
    return F.map_zip_with(
        a, b, lambda k, va, vb: F.coalesce(vb, va)
    )


def map_from_pairs(pairs: Column) -> Column:
    """apoc.map.fromPairs — array<struct<k,v>> → map."""
    return F.map_from_entries(pairs)


def map_set_key(m: Column, key, value) -> Column:
    """apoc.map.setKey."""
    return map_merge(m, F.create_map(F.lit(key), value))


def map_remove_key(m: Column, key) -> Column:
    """apoc.map.removeKey."""
    return F.map_filter(m, lambda k, v: k != key)


def map_clean(m: Column) -> Column:
    """apoc.map.clean — drop null/empty-string values."""
    return F.map_filter(m, lambda k, v: v.isNotNull() & (v.cast("string") != ""))


# ---- apoc.convert.* / apoc.text.* --------------------------------------

def convert_to_json(c: Column) -> Column:
    """apoc.convert.toJson — struct/map/array → JSON string."""
    return F.to_json(c)


def convert_from_json_map(c: Column, value_type: str = "string") -> Column:
    """apoc.convert.fromJsonMap."""
    return F.from_json(c, f"map<string,{value_type}>")


def convert_from_json_list(c: Column, element_type: str = "string") -> Column:
    """apoc.convert.fromJsonList."""
    return F.from_json(c, f"array<{element_type}>")


def text_join(arr: Column, sep: str) -> Column:
    """apoc.text.join."""
    return F.array_join(arr, sep)


def coll_split(arr: Column, value: Column) -> Column:
    """apoc.coll.split(list, value) — sublists between occurrences of the
    separator, empty segments dropped (reference
    apoc_collections.go:683-721: [1,0,2,0,3] split by 0 → [[1],[2],[3]]).
    Single aggregate over the array — no explode."""
    init = F.struct(
        F.array().cast("array<array<string>>").alias("parts"),
        F.array().cast("array<string>").alias("cur"),
    )

    def step(acc, x):
        xs = x.cast("string")
        is_sep = xs.eqNullSafe(value.cast("string"))
        flushed = F.when(
            is_sep & (F.size(acc.cur) > 0), F.array_append(acc.parts, acc.cur)
        ).otherwise(acc.parts)
        nxt = F.when(is_sep, F.array().cast("array<string>")).otherwise(
            F.array_append(acc.cur, xs)
        )
        return F.struct(flushed.alias("parts"), nxt.alias("cur"))

    return F.aggregate(
        F.transform(arr, lambda x: x.cast("string")),
        init,
        step,
        lambda acc: F.when(
            F.size(acc.cur) > 0, F.array_append(acc.parts, acc.cur)
        ).otherwise(acc.parts),
    )


def coll_sort_nodes(arr: Column, prop: str) -> Column:
    """apoc.coll.sortNodes(nodes, prop) — sort an array of node structs
    ascending by the (numeric) property (reference
    apoc_collections.go:339-359)."""
    return F.array_sort(
        arr,
        lambda a, b: F.when(a[prop] < b[prop], -1)
        .when(a[prop] > b[prop], 1)
        .otherwise(0),
    )


def map_from_lists(keys: Column, values: Column) -> Column:
    """apoc.map.fromLists(keys, values) (reference
    apoc_collections.go:1009-1035)."""
    return F.map_from_arrays(keys, values)


def cypher_type_name(c: Column) -> Column:
    """Spark type → the reference's Cypher type vocabulary
    (apoc_collections.go:910-937 getCypherType)."""
    t = F.typeof(c)
    return (
        F.when(c.isNull(), "NULL")
        .when(t == "boolean", "BOOLEAN")
        .when(t.isin("tinyint", "smallint", "int", "bigint"), "INTEGER")
        .when(t.isin("float", "double") | t.startswith("decimal"), "FLOAT")
        .when(t == "string", "STRING")
        .when(t.startswith("array"), "LIST")
        .when(t.startswith("map"), "MAP")
        .when(t.startswith("interval"), "DURATION")
        .otherwise("ANY")
    )


def meta_is_type(c: Column, type_name: Column) -> Column:
    """apoc.meta.isType(value, name) — case-insensitive check against the
    Cypher type name (reference functions_eval_functions.go:2156-2171)."""
    return cypher_type_name(c) == F.upper(type_name.cast("string"))
