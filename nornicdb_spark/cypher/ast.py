"""Cypher AST — the small logical tree the reference never built
(executor.go routes raw strings; our §3 translation parses once and
compiles declaratively).

Expressions and clauses are plain dataclasses; the compiler pattern-
matches on type. Everything is position-free and immutable.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---- expressions --------------------------------------------------------

@dataclass(frozen=True)
class Lit:
    value: object  # int | float | str | bool | None


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Param:
    name: str


@dataclass(frozen=True)
class Prop:
    subject: object  # expression (usually Var)
    name: str


@dataclass(frozen=True)
class ListLit:
    items: tuple


@dataclass(frozen=True)
class MapLit:
    items: tuple  # tuple[(str, expr), ...]


@dataclass(frozen=True)
class Func:
    name: str  # lower-cased, dots kept (e.g. "apoc.coll.sum")
    args: tuple
    distinct: bool = False


@dataclass(frozen=True)
class CountStar:
    pass


@dataclass(frozen=True)
class BinOp:
    op: str  # + - * / % = <> < > <= >= AND OR XOR IN STARTS ENDS CONTAINS =~
    left: object
    right: object


@dataclass(frozen=True)
class UnOp:
    op: str  # NOT | NEG
    operand: object


@dataclass(frozen=True)
class IsNull:
    operand: object
    negated: bool


@dataclass(frozen=True)
class Case:
    subject: object | None  # simple CASE has a subject; searched has None
    whens: tuple  # tuple[(cond_or_value, result), ...]
    default: object | None


@dataclass(frozen=True)
class Index:
    subject: object
    index: object  # expression; list[i] (0-based in Cypher)


@dataclass(frozen=True)
class ListComp:
    """[var IN list WHERE pred | expr] — filter and/or transform."""

    var: str
    source: object
    where: object | None
    map: object | None


@dataclass(frozen=True)
class Reduce:
    """reduce(acc = init, var IN list | expr) — Cypher list fold."""

    acc: str
    init: object
    var: str
    source: object
    expr: object


@dataclass(frozen=True)
class QuantPred:
    """all/any/none/single(var IN list WHERE pred)."""

    kind: str  # all | any | none | single
    var: str
    source: object
    where: object


@dataclass(frozen=True)
class PatternComp:
    """[(a)-[:T]->(b) WHERE p | expr] — pattern comprehension; one array
    element per pattern match of the current row."""

    path: object  # Path
    where: object | None
    map: object


@dataclass(frozen=True)
class CollectSubquery:
    """COLLECT { MATCH ... RETURN expr } — correlated collect subquery."""

    query: object  # Query whose last clause is a single-item Return


@dataclass(frozen=True)
class CountPattern:
    """COUNT { (a)-[:T]->(b) [WHERE ...] } — per-row pattern count
    (reference executor_mutations.go:1997). Compiled to a grouped
    left join keyed by a row tag."""

    paths: tuple
    where: object | None


@dataclass(frozen=True)
class ExistsPattern:
    """EXISTS { (a)-[:T]->(b) [WHERE ...] } — pattern-existence predicate
    (reference executor_mutations.go:1256-1313). Only valid in WHERE;
    compiled to a semi/anti join, not a per-row expression."""

    paths: tuple
    where: object | None


# ---- patterns -----------------------------------------------------------

@dataclass(frozen=True)
class NodePat:
    var: str | None
    label: str | None
    props: tuple = ()  # tuple[(str, expr), ...] inline {k: v} filters


@dataclass(frozen=True)
class RelPat:
    var: str | None
    types: tuple = ()  # [:A|B] disjunction
    direction: str = "out"  # out | in | both
    min_hops: int = 1
    max_hops: int = 1  # min/max > 1 → variable-length *n..m
    props: tuple = ()


@dataclass(frozen=True)
class Path:
    """Alternating node/rel sequence: n0, r0, n1, r1, n2 ...

    ``name`` set for ``MATCH p = ...`` named paths; ``func`` is
    ``shortestpath``/``allshortestpaths`` when the pattern is wrapped."""

    elements: tuple
    name: str | None = None
    func: str | None = None


# ---- clauses ------------------------------------------------------------

@dataclass(frozen=True)
class SortItem:
    expr: object
    ascending: bool = True


@dataclass(frozen=True)
class ReturnItem:
    expr: object
    alias: str | None


@dataclass(frozen=True)
class MatchClause:
    paths: tuple
    where: object | None = None
    optional: bool = False


@dataclass(frozen=True)
class UnwindClause:
    expr: object
    var: str = ""


@dataclass(frozen=True)
class WithClause:
    items: tuple
    distinct: bool = False
    where: object | None = None
    order: tuple = ()
    skip: object | None = None
    limit: object | None = None


@dataclass(frozen=True)
class ReturnClause:
    items: tuple
    distinct: bool = False
    order: tuple = ()
    skip: object | None = None
    limit: object | None = None


@dataclass(frozen=True)
class CreateClause:
    paths: tuple


@dataclass(frozen=True)
class MergeClause:
    path: object
    on_create: tuple = ()  # tuple[(Prop, expr), ...]
    on_match: tuple = ()


@dataclass(frozen=True)
class SetPlus:
    """SET n += {map} — merge map entries into the node's properties."""

    var: str
    map: object  # MapLit or Param


@dataclass(frozen=True)
class SetClause:
    items: tuple  # tuple[(Prop, expr) | SetPlus, ...]


@dataclass(frozen=True)
class ForeachClause:
    """FOREACH (var IN list | update clauses) — reference
    clauses.go:1689-1797."""

    var: str
    source: object
    updates: tuple  # update clause objects


@dataclass(frozen=True)
class CallSubquery:
    """CALL { subquery } — uncorrelated subquery composition
    (reference executor_subqueries.go:27-666)."""

    query: object  # Query


@dataclass(frozen=True)
class RemoveClause:
    props: tuple  # tuple[Prop, ...]


@dataclass(frozen=True)
class DeleteClause:
    vars: tuple
    detach: bool = False


@dataclass(frozen=True)
class CallClause:
    """CALL proc(args) [YIELD cols] — introspection procedures
    (reference call.go:596-803)."""

    proc: str
    args: tuple = ()
    yields: tuple = ()  # () = yield everything


@dataclass(frozen=True)
class Query:
    clauses: tuple  # reading clauses + final ReturnClause
    unions: tuple = ()  # tuple[(all: bool, Query), ...]
