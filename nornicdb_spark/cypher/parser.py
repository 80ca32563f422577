"""Recursive-descent Cypher parser over the subset the reference's test
corpus exercises (pkg/cypher/e2e_query_test.go,
documentation_examples_test.go): MATCH / OPTIONAL MATCH with node-rel
patterns (typed, multi-type, directed/undirected, variable-length),
WHERE expression grammar with Cypher precedence, WITH pipelines, UNWIND,
RETURN [DISTINCT] with ORDER BY / SKIP / LIMIT, UNION [ALL], parameters,
CASE, list/map literals, function calls.

Precedence (low→high): OR, XOR, AND, NOT, comparison (incl. IN / STARTS
WITH / ENDS WITH / CONTAINS / =~ / IS NULL), + -, * / %, unary -,
postfix (.prop, [idx]), primary.
"""

from __future__ import annotations

from nornicdb_spark.cypher import ast as A
from nornicdb_spark.cypher.lexer import Token, tokenize


class Parser:
    def __init__(self, text: str):
        self.toks: list[Token] = tokenize(text)
        self.i = 0

    # ---- token helpers --------------------------------------------------

    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, value: str | None = None, k: int = 0) -> bool:
        t = self.peek(k)
        if t.kind != kind:
            return False
        if value is None:
            return True
        if kind == "KEYWORD":
            return t.value.upper() == value
        return t.value == value

    def at_kw(self, *words: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value.upper() in words

    def take(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, value: str | None = None) -> Token:
        if not self.at(kind, value):
            t = self.peek()
            raise SyntaxError(
                f"cypher: expected {value or kind} at {t.pos}, got {t.value!r}"
            )
        return self.take()

    def expect_name(self) -> str:
        """An identifier position — keywords are legal names here
        (labels/types/properties like Order, End, Count)."""
        t = self.peek()
        if t.kind not in ("NAME", "KEYWORD"):
            raise SyntaxError(f"cypher: expected name at {t.pos}, got {t.value!r}")
        return self.take().value

    def at_name(self, k: int = 0) -> bool:
        return self.peek(k).kind in ("NAME", "KEYWORD")

    def accept(self, kind: str, value: str | None = None) -> bool:
        if self.at(kind, value):
            self.take()
            return True
        return False

    # ---- entry ----------------------------------------------------------

    def parse(self) -> A.Query:
        q = self.parse_single_query()
        unions = []
        while self.at_kw("UNION"):
            self.take()
            is_all = bool(self.at_kw("ALL") and self.take())
            unions.append((is_all, self.parse_single_query()))
        self.accept("OP", ";")
        self.expect("EOF")
        return A.Query(clauses=q.clauses, unions=tuple(unions))

    _SHOW_MAP = {
        "INDEXES": "db.indexes", "INDEX": "db.indexes",
        "CONSTRAINTS": "db.constraints", "CONSTRAINT": "db.constraints",
        "PROCEDURES": "dbms.procedures", "FUNCTIONS": "show.functions",
        "DATABASES": "show.databases", "DATABASE": "show.databases",
        "ALIASES": "show.aliases", "LIMITS": "show.limits",
        "SETTINGS": "dbms.listconfig",
    }

    def _parse_show(self) -> A.CallClause:
        """SHOW INDEXES/CONSTRAINTS/PROCEDURES/FUNCTIONS/DATABASE(S)/
        ALIASES/LIMITS/SETTINGS (reference executor_show.go) — routed to
        the matching procedure frame."""
        self.take()  # SHOW
        t = self.peek()
        word = t.value.upper() if t.kind in ("NAME", "KEYWORD") else None
        if word not in self._SHOW_MAP:
            raise SyntaxError(f"cypher: SHOW {t.value!r} not supported")
        self.take()
        # tolerate trailing qualifiers (e.g. SHOW ALL FUNCTIONS parsed as
        # SHOW ALL → no; qualifier tail like 'SHOW INDEXES BRIEF')
        while self.peek().kind == "NAME" and not self.at("EOF"):
            self.take()
        return A.CallClause(proc=self._SHOW_MAP[word])

    def parse_single_query(self) -> A.Query:
        clauses: list = []
        while True:
            t0 = self.peek()
            if (
                not clauses
                and t0.kind == "NAME"
                and t0.value.upper() == "SHOW"
                and self.peek(1).kind in ("NAME", "KEYWORD")
                and self.peek(1).value.upper() in self._SHOW_MAP
            ):
                clauses.append(self._parse_show())
                if self._at_query_end():
                    break
                continue
            if self.at_kw("MATCH"):
                clauses.append(self.parse_match(optional=False))
            elif self.at_kw("OPTIONAL"):
                self.take()
                self.expect("KEYWORD", "MATCH")
                clauses.append(self.parse_match(optional=True, consumed=True))
            elif self.at_kw("UNWIND"):
                self.take()
                expr = self.parse_expr()
                self.expect("KEYWORD", "AS")
                var = self.expect_name()
                clauses.append(A.UnwindClause(expr=expr, var=var))
            elif self.at_kw("WITH"):
                self.take()
                clauses.append(self.parse_projection(A.WithClause))
            elif self.at_kw("CREATE"):
                self.take()
                paths = [self.parse_path()]
                while self.accept("OP", ","):
                    paths.append(self.parse_path())
                clauses.append(A.CreateClause(paths=tuple(paths)))
                if self._at_query_end():
                    break
            elif self.at_kw("MERGE"):
                self.take()
                path = self.parse_path()
                on_create: list = []
                on_match: list = []
                while self.at_kw("ON"):
                    self.take()
                    which = self.expect_name().upper()
                    self.expect("KEYWORD", "SET")
                    items = self.parse_set_items()
                    (on_create if which == "CREATE" else on_match).extend(items)
                clauses.append(
                    A.MergeClause(
                        path=path, on_create=tuple(on_create), on_match=tuple(on_match)
                    )
                )
                if self._at_query_end():
                    break
            elif self.at_kw("SET"):
                self.take()
                clauses.append(A.SetClause(items=tuple(self.parse_set_items())))
                if self._at_query_end():
                    break
            elif self.at_kw("REMOVE"):
                self.take()
                props = [self.parse_postfix()]
                while self.accept("OP", ","):
                    props.append(self.parse_postfix())
                clauses.append(A.RemoveClause(props=tuple(props)))
                if self._at_query_end():
                    break
            elif self.at_kw("DELETE") or self.at_kw("DETACH"):
                detach = False
                if self.at_kw("DETACH"):
                    self.take()
                    detach = True
                self.expect("KEYWORD", "DELETE")
                names = [self.expect_name()]
                while self.accept("OP", ","):
                    names.append(self.expect_name())
                clauses.append(A.DeleteClause(vars=tuple(names), detach=detach))
                if self._at_query_end():
                    break
            elif self.at_kw("FOREACH"):
                self.take()
                clauses.append(self.parse_foreach())
                if self._at_query_end():
                    break
            elif self.at_kw("CALL"):
                self.take()
                if self.at("OP", "{"):
                    self.take()
                    sub = self.parse_single_query()
                    self.expect("OP", "}")
                    # CALL { } IN TRANSACTIONS [OF n ROWS] — batched
                    # commit is a wire/OLTP concern (reference
                    # executor_subqueries.go CALL..IN TRANSACTIONS); in a
                    # batch engine the whole job is one snapshot, so the
                    # suffix is accepted and ignored
                    nxt = self.peek()
                    if (
                        nxt.value.upper() == "IN"
                        and self.toks[self.i + 1].value.upper() == "TRANSACTIONS"
                    ):
                        self.take()
                        self.take()
                        if self.peek().value.upper() == "OF":
                            self.take()
                            self.take()  # row count
                            if self.peek().value.upper() != "ROWS":
                                raise SyntaxError(
                                    "cypher: expected ROWS after OF <n>"
                                )
                            self.take()
                    clauses.append(A.CallSubquery(query=sub))
                    continue
                clauses.append(self.parse_call())
                # standalone CALL may end the query (implicit yield-all)
                if self.at("EOF") or self.at("OP", ";") or self.at_kw("UNION"):
                    break
            elif self.at_kw("RETURN"):
                self.take()
                clauses.append(self.parse_projection(A.ReturnClause))
                break
            else:
                t = self.peek()
                raise SyntaxError(f"cypher: unexpected {t.value!r} at {t.pos}")
        return A.Query(clauses=tuple(clauses))

    # ---- clauses --------------------------------------------------------

    _HINT_STOP = (
        "USING", "WHERE", "MATCH", "OPTIONAL", "WITH", "RETURN", "CREATE",
        "MERGE", "SET", "REMOVE", "DELETE", "DETACH", "UNWIND", "CALL",
        "FOREACH", "ORDER", "SKIP", "LIMIT", "UNION",
    )

    def _at_using(self) -> bool:
        t = self.peek()  # USING is not a reserved word in this lexer
        return t.kind in ("NAME", "KEYWORD") and t.value.upper() == "USING"

    def _skip_index_hints(self) -> None:
        """USING INDEX / USING SCAN / USING JOIN hints (reference
        index_hints.go:107-160) — parsed and IGNORED: Catalyst owns access
        path selection here, but hinted queries must still run."""
        while self._at_using():
            self.take()
            while not (
                self.at("EOF")
                or self.at("OP", ";")
                or self._at_using()
                or any(self.at_kw(k) for k in self._HINT_STOP)
            ):
                self.take()

    def parse_match(self, optional: bool, consumed: bool = False) -> A.MatchClause:
        if not consumed:
            self.expect("KEYWORD", "MATCH")
        paths = [self.parse_match_path()]
        while self.accept("OP", ","):
            paths.append(self.parse_match_path())
        self._skip_index_hints()
        where = None
        if self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        return A.MatchClause(paths=tuple(paths), where=where, optional=optional)

    def parse_projection(self, cls):
        distinct = bool(self.at_kw("DISTINCT") and self.take())
        items = [self.parse_return_item()]
        while self.accept("OP", ","):
            items.append(self.parse_return_item())
        order: list = []
        skip = limit = where = None
        if self.at_kw("ORDER"):
            self.take()
            self.expect("KEYWORD", "BY")
            order.append(self.parse_sort_item())
            while self.accept("OP", ","):
                order.append(self.parse_sort_item())
        if self.at_kw("SKIP"):
            self.take()
            skip = self.parse_expr()
        if self.at_kw("LIMIT"):
            self.take()
            limit = self.parse_expr()
        if cls is A.WithClause and self.at_kw("WHERE"):
            self.take()
            where = self.parse_expr()
        kw = dict(
            items=tuple(items), distinct=distinct, order=tuple(order),
            skip=skip, limit=limit,
        )
        if cls is A.WithClause:
            kw["where"] = where
        return cls(**kw)

    def parse_return_item(self) -> A.ReturnItem:
        expr = self.parse_expr()
        alias = None
        if self.at_kw("AS"):
            self.take()
            alias = self.expect_name()
        return A.ReturnItem(expr=expr, alias=alias)

    def parse_sort_item(self) -> A.SortItem:
        expr = self.parse_expr()
        asc = True
        if self.at_kw("ASC", "ASCENDING"):
            self.take()
        elif self.at_kw("DESC", "DESCENDING"):
            self.take()
            asc = False
        return A.SortItem(expr=expr, ascending=asc)

    def _at_query_end(self) -> bool:
        # '}' ends a CALL { } / COLLECT { } subquery body
        return (
            self.at("EOF") or self.at("OP", ";") or self.at_kw("UNION")
            or self.at("OP", "}")
        )

    def parse_set_items(self) -> list:
        items = [self._parse_set_item()]
        while self.accept("OP", ","):
            items.append(self._parse_set_item())
        return items

    def _parse_set_item(self):
        target = self.parse_postfix()
        if self.at("OP", "+="):
            self.take()
            if not isinstance(target, A.Var):
                raise SyntaxError("cypher: SET += target must be a variable")
            return A.SetPlus(var=target.name, map=self.parse_expr())
        self.expect("OP", "=")
        return (target, self.parse_expr())

    def parse_match_path(self) -> A.Path:
        """A MATCH pattern element: ``[name =] [shortestPath(] path [)]``."""
        name = None
        if self.at("NAME") and self.at("OP", "=", k=1):
            name = self.take().value
            self.take()
        func = None
        if self.at("NAME") and self.peek().value.lower() in (
            "shortestpath", "allshortestpaths"
        ) and self.at("OP", "(", k=1):
            func = self.take().value.lower()
            self.expect("OP", "(")
            inner = self.parse_path()
            self.expect("OP", ")")
            return A.Path(elements=inner.elements, name=name, func=func)
        p = self.parse_path()
        return A.Path(elements=p.elements, name=name, func=func) if name else p

    def parse_foreach(self) -> A.ForeachClause:
        """FOREACH (var IN expr | update clauses)."""
        self.expect("OP", "(")
        var = self.expect_name()
        self.expect("KEYWORD", "IN")
        source = self.parse_expr()
        self.expect("OP", "|")
        updates: list = []
        while not self.at("OP", ")"):
            if self.at_kw("CREATE"):
                self.take()
                paths = [self.parse_path()]
                while self.accept("OP", ","):
                    paths.append(self.parse_path())
                updates.append(A.CreateClause(paths=tuple(paths)))
            elif self.at_kw("SET"):
                self.take()
                updates.append(A.SetClause(items=tuple(self.parse_set_items())))
            elif self.at_kw("DELETE") or self.at_kw("DETACH"):
                detach = bool(self.at_kw("DETACH") and self.take())
                self.expect("KEYWORD", "DELETE")
                names = [self.expect_name()]
                while self.accept("OP", ","):
                    names.append(self.expect_name())
                updates.append(A.DeleteClause(vars=tuple(names), detach=detach))
            elif self.at_kw("FOREACH"):
                self.take()
                updates.append(self.parse_foreach())
            else:
                t = self.peek()
                raise SyntaxError(
                    f"cypher: unexpected {t.value!r} in FOREACH at {t.pos}"
                )
        self.expect("OP", ")")
        return A.ForeachClause(var=var, source=source, updates=tuple(updates))

    def parse_call(self) -> A.CallClause:
        parts = [self.expect_name()]
        while self.accept("OP", "."):
            parts.append(self.expect_name())
        args: list = []
        if self.accept("OP", "("):
            if not self.at("OP", ")"):
                while True:
                    args.append(self.parse_expr())
                    if not self.accept("OP", ","):
                        break
            self.expect("OP", ")")
        yields: list = []
        if self.at_kw("YIELD"):
            self.take()
            yields.append(self.expect_name())
            while self.accept("OP", ","):
                yields.append(self.expect_name())
        return A.CallClause(
            proc=".".join(parts).lower(), args=tuple(args), yields=tuple(yields)
        )

    # ---- patterns -------------------------------------------------------

    def parse_path(self) -> A.Path:
        elems: list = [self.parse_node_pattern()]
        while self.at("OP", "-") or self.at("OP", "<-"):
            elems.append(self.parse_rel_pattern())
            elems.append(self.parse_node_pattern())
        return A.Path(elements=tuple(elems))

    def parse_node_pattern(self) -> A.NodePat:
        self.expect("OP", "(")
        var = label = None
        props: tuple = ()
        if self.at_name() and not self.at("OP", "(", k=1):
            var = self.take().value
        if self.accept("OP", ":"):
            label = self.expect_name()
        if self.at("OP", "{"):
            props = self.parse_map_pairs()
        self.expect("OP", ")")
        return A.NodePat(var=var, label=label, props=props)

    def parse_rel_pattern(self) -> A.RelPat:
        # <-[r:T]- | -[r:T]-> | -[r]- ; bare -- / --> / <--
        direction = "both"
        if self.accept("OP", "<-"):
            direction = "in"
        else:
            self.expect("OP", "-")
        var = None
        types: tuple = ()
        props: tuple = ()
        min_h = max_h = 1
        if self.accept("OP", "["):
            if self.at_name():
                var = self.take().value
            if self.accept("OP", ":"):
                types = (self.expect_name(),)
                while self.accept("OP", "|"):
                    self.accept("OP", ":")  # tolerate [:A|:B]
                    types = types + (self.expect_name(),)
            if self.accept("OP", "*"):
                min_h, max_h = self.parse_var_length()
            if self.at("OP", "{"):
                props = self.parse_map_pairs()
            self.expect("OP", "]")
        if self.accept("OP", "->"):
            if direction == "in":
                raise SyntaxError("cypher: <-...-> is not a valid relationship")
            direction = "out"
        else:
            self.expect("OP", "-")
            # direction stays "in" (if <-) or "both"
        return A.RelPat(
            var=var, types=types, direction=direction,
            min_hops=min_h, max_hops=max_h, props=props,
        )

    def parse_var_length(self) -> tuple[int, int]:
        # * | *n | *n..m | *..m | *n..
        default_max = 15  # bounded enumeration; reference caps depth too
        lo, hi = 1, default_max
        if self.at("INT"):
            lo = int(self.take().value)
            hi = lo
        if self.accept("OP", ".."):
            hi = default_max
            if self.at("INT"):
                hi = int(self.take().value)
        return lo, hi

    def parse_map_pairs(self) -> tuple:
        self.expect("OP", "{")
        pairs: list = []
        if not self.at("OP", "}"):
            while True:
                key = self.expect_name()
                self.expect("OP", ":")
                pairs.append((key, self.parse_expr()))
                if not self.accept("OP", ","):
                    break
        self.expect("OP", "}")
        return tuple(pairs)

    # ---- expressions (precedence climbing) ------------------------------

    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_xor()
        while self.at_kw("OR"):
            self.take()
            left = A.BinOp("OR", left, self.parse_xor())
        return left

    def parse_xor(self):
        left = self.parse_and()
        while self.at_kw("XOR"):
            self.take()
            left = A.BinOp("XOR", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_kw("AND"):
            self.take()
            left = A.BinOp("AND", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at_kw("NOT"):
            self.take()
            return A.UnOp("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_additive()
        while True:
            if self.at("OP") and self.peek().value in ("=", "<>", "<", ">", "<=", ">=", "=~"):
                op = self.take().value
                left = A.BinOp(op, left, self.parse_additive())
            elif self.at("OP", "<-"):
                # lexer greediness: `a < -5` tokenized as `<-`; in an
                # expression this can only mean `<` then unary minus
                self.take()
                left = A.BinOp("<", left, A.UnOp("NEG", self.parse_additive()))
            elif self.at_kw("IN"):
                self.take()
                left = A.BinOp("IN", left, self.parse_additive())
            elif self.at_kw("STARTS"):
                self.take()
                self.expect("KEYWORD", "WITH")
                left = A.BinOp("STARTS", left, self.parse_additive())
            elif self.at_kw("ENDS"):
                self.take()
                self.expect("KEYWORD", "WITH")
                left = A.BinOp("ENDS", left, self.parse_additive())
            elif self.at_kw("CONTAINS"):
                self.take()
                left = A.BinOp("CONTAINS", left, self.parse_additive())
            elif self.at_kw("IS"):
                self.take()
                negated = bool(self.at_kw("NOT") and self.take())
                self.expect("KEYWORD", "NULL")
                left = A.IsNull(operand=left, negated=negated)
            else:
                return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.at("OP") and self.peek().value in ("+", "-"):
            op = self.take().value
            left = A.BinOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.at("OP") and self.peek().value in ("*", "/", "%"):
            op = self.take().value
            left = A.BinOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.at("OP", "-"):
            self.take()
            return A.UnOp("NEG", self.parse_unary())
        if self.at("OP", "+"):
            self.take()
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            if self.at("OP", "."):
                self.take()
                e = A.Prop(subject=e, name=self.expect_name())
            elif self.at("OP", "["):
                self.take()
                idx = self.parse_expr()
                self.expect("OP", "]")
                e = A.Index(subject=e, index=idx)
            else:
                return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "INT":
            self.take()
            return A.Lit(int(t.value))
        if t.kind == "FLOAT":
            self.take()
            return A.Lit(float(t.value))
        if t.kind == "STRING":
            self.take()
            return A.Lit(t.value)
        if t.kind == "PARAM":
            self.take()
            return A.Param(t.value)
        if t.kind == "KEYWORD":
            kw = t.value.upper()
            if kw in ("TRUE", "FALSE"):
                self.take()
                return A.Lit(kw == "TRUE")
            if kw == "NULL":
                self.take()
                return A.Lit(None)
            if kw == "CASE":
                return self.parse_case()
            if kw == "EXISTS":
                if self.at("OP", "(", k=1):
                    # scalar exists(expr) — not-null test (reference
                    # executor_show.go:136); also exists((a)-[..]->(b))
                    # legacy pattern form is NOT supported, matching the
                    # modern EXISTS{} recommendation
                    self.take()
                    self.take()
                    inner = self.parse_expr()
                    self.expect("OP", ")")
                    return A.Func("exists", (inner,))
                self.take()
                self.expect("OP", "{")
                self.accept("KEYWORD", "MATCH")  # full-form tolerated
                paths = [self.parse_path()]
                while self.accept("OP", ","):
                    paths.append(self.parse_path())
                where = None
                if self.at_kw("WHERE"):
                    self.take()
                    where = self.parse_expr()
                self.expect("OP", "}")
                return A.ExistsPattern(paths=tuple(paths), where=where)
            if kw == "COUNT" and self.at("OP", "{", k=1):
                self.take()
                self.expect("OP", "{")
                self.accept("KEYWORD", "MATCH")  # full-form tolerated
                paths = [self.parse_path()]
                while self.accept("OP", ","):
                    paths.append(self.parse_path())
                where = None
                if self.at_kw("WHERE"):
                    self.take()
                    where = self.parse_expr()
                self.expect("OP", "}")
                return A.CountPattern(paths=tuple(paths), where=where)
            if kw == "ALL" and self.at("OP", "(", k=1):
                self.take()
                return self.parse_quantifier("all")
            # any other keyword in expression position is an identifier
            # (YIELD columns / properties named end, count, set, ...).
            # CASE excluded: it legitimately begins an expression; its
            # inner keywords are consumed by parse_case before the
            # expression parser ever sees them in primary position.
            # COUNT excluded: count(*) needs the dedicated branch below.
            if kw not in ("CASE", "COUNT"):
                if self.at("OP", "(", k=1) or (
                    self.at("OP", ".", k=1) and self._is_dotted_call()
                ):
                    return self.parse_func_call()
                self.take()
                return A.Var(t.value)
            if kw == "COUNT":
                # count(*) | count(expr) | count(DISTINCT expr)
                self.take()
                self.expect("OP", "(")
                if self.accept("OP", "*"):
                    self.expect("OP", ")")
                    return A.CountStar()
                distinct = bool(self.at_kw("DISTINCT") and self.take())
                arg = self.parse_expr()
                self.expect("OP", ")")
                return A.Func("count", (arg,), distinct=distinct)
        if t.kind == "OP" and t.value == "(":
            self.take()
            e = self.parse_expr()
            self.expect("OP", ")")
            return e
        if t.kind == "OP" and t.value == "[":
            # pattern comprehension [(a)-[:T]->(b) WHERE p | e]
            if self.at("OP", "(", k=1):
                saved = self.i
                try:
                    self.take()
                    path = self.parse_path()
                    where = None
                    if self.at_kw("WHERE"):
                        self.take()
                        where = self.parse_expr()
                    self.expect("OP", "|")
                    map_expr = self.parse_expr()
                    self.expect("OP", "]")
                    return A.PatternComp(path=path, where=where, map=map_expr)
                except SyntaxError:
                    self.i = saved  # plain list starting with a paren expr
            # list comprehension [x IN xs WHERE p | e] vs plain literal
            if self.at_name(k=1) and self.at("KEYWORD", "IN", k=2):
                self.take()
                var = self.expect_name()
                self.expect("KEYWORD", "IN")
                source = self.parse_expr()
                where = map_expr = None
                if self.at_kw("WHERE"):
                    self.take()
                    where = self.parse_expr()
                if self.accept("OP", "|"):
                    map_expr = self.parse_expr()
                self.expect("OP", "]")
                return A.ListComp(var=var, source=source, where=where, map=map_expr)
            self.take()
            items: list = []
            if not self.at("OP", "]"):
                while True:
                    items.append(self.parse_expr())
                    if not self.accept("OP", ","):
                        break
            self.expect("OP", "]")
            return A.ListLit(items=tuple(items))
        if t.kind == "OP" and t.value == "{":
            return A.MapLit(items=self.parse_map_pairs())
        if t.kind == "NAME":
            low = t.value.lower()
            if low == "collect" and self.at("OP", "{", k=1):
                self.take()
                self.expect("OP", "{")
                sub = self.parse_single_query()
                self.expect("OP", "}")
                return A.CollectSubquery(query=sub)
            if low == "reduce" and self.at("OP", "(", k=1):
                self.take()
                self.expect("OP", "(")
                acc = self.expect_name()
                self.expect("OP", "=")
                init = self.parse_expr()
                self.expect("OP", ",")
                var = self.expect_name()
                self.expect("KEYWORD", "IN")
                source = self.parse_expr()
                self.expect("OP", "|")
                expr = self.parse_expr()
                self.expect("OP", ")")
                return A.Reduce(acc=acc, init=init, var=var, source=source, expr=expr)
            if (
                low in ("any", "none", "single")
                and self.at("OP", "(", k=1)
                and self.at_name(k=2)
                and self.at("KEYWORD", "IN", k=3)
            ):
                self.take()
                return self.parse_quantifier(low)
            # function call?  name(.name)* "(" args ")"
            if self.at("OP", "(", k=1) or (self.at("OP", ".", k=1) and self._is_dotted_call()):
                return self.parse_func_call()
            self.take()
            return A.Var(t.value)
        raise SyntaxError(f"cypher: unexpected {t.value!r} at {t.pos}")

    def parse_quantifier(self, kind: str) -> A.QuantPred:
        """all/any/none/single(var IN list WHERE pred) — the leading
        name token is already consumed."""
        self.expect("OP", "(")
        var = self.expect_name()
        self.expect("KEYWORD", "IN")
        source = self.parse_expr()
        self.expect("KEYWORD", "WHERE")
        where = self.parse_expr()
        self.expect("OP", ")")
        return A.QuantPred(kind=kind, var=var, source=source, where=where)

    def _is_dotted_call(self) -> bool:
        """Disambiguate ``n.prop`` from ``apoc.coll.sum(...)`` — scan the
        dotted name chain; a call has '(' right after it. Keywords are
        legal name segments (apoc.coll.union, duration.in...)."""
        k = 0
        while self.at_name(k=k) and self.at("OP", ".", k=k + 1):
            k += 2
        return self.at_name(k=k) and self.at("OP", "(", k=k + 1)

    def parse_func_call(self) -> A.Func:
        parts = [self.expect_name()]
        while self.at("OP", ".") and self.at_name(k=1) and not self.at("OP", "(", k=1):
            self.take()
            parts.append(self.expect_name())
        self.expect("OP", "(")
        distinct = bool(self.at_kw("DISTINCT") and self.take())
        args: list = []
        if not self.at("OP", ")"):
            while True:
                args.append(self.parse_expr())
                if not self.accept("OP", ","):
                    break
        self.expect("OP", ")")
        return A.Func(".".join(parts).lower(), tuple(args), distinct=distinct)

    def parse_case(self) -> A.Case:
        self.expect("KEYWORD", "CASE")
        subject = None
        if not self.at_kw("WHEN"):
            subject = self.parse_expr()
        whens: list = []
        while self.at_kw("WHEN"):
            self.take()
            cond = self.parse_expr()
            self.expect("KEYWORD", "THEN")
            whens.append((cond, self.parse_expr()))
        default = None
        if self.at_kw("ELSE"):
            self.take()
            default = self.parse_expr()
        self.expect("KEYWORD", "END")
        return A.Case(subject=subject, whens=tuple(whens), default=default)


def parse(text: str) -> A.Query:
    return Parser(text).parse()
