"""Cypher tokenizer.

Mirrors the lexical surface the reference's hand parser accepts
(pkg/cypher/string_patterns.go, operators.go): case-insensitive
keywords, single- or double-quoted strings with backslash escapes,
``$param`` markers, backtick-quoted identifiers, line/block comments.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS", "ORDER",
    "BY", "ASC", "ASCENDING", "DESC", "DESCENDING", "SKIP", "LIMIT", "UNION",
    "ALL", "DISTINCT", "AND", "OR", "XOR", "NOT", "IN", "IS", "NULL", "TRUE",
    "FALSE", "STARTS", "ENDS", "CONTAINS", "CASE", "WHEN", "THEN", "ELSE",
    "END", "EXISTS", "COUNT", "CALL", "YIELD", "CREATE", "MERGE", "SET",
    "REMOVE", "DELETE", "DETACH", "ON", "FOREACH",
}

TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<FLOAT>\d+\.\d+([eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<INT>\d+)
  | (?P<STRING>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*")
  | (?P<PARAM>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<NAME>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP><=|>=|<>|=~|->|<-|\.\.|\+=|[()\[\]{},:;.+\-*/%=<>|])
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass
class Token:
    kind: str  # KEYWORD | NAME | INT | FLOAT | STRING | PARAM | OP | EOF
    value: str
    pos: int


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "\\": "\\", "'": "'", '"': '"'}


def _unescape(s: str) -> str:
    r"""Cypher string-literal escapes (\n, \t, \u-hex, quotes). Processed
    per-escape — NOT via the bytes/unicode_escape round-trip, which
    latin-1-mangles any non-ASCII character in the literal."""
    import re as _re

    def sub(m):
        g = m.group(1)
        if g.startswith("u"):
            return chr(int(g[1:], 16))
        return _ESCAPES.get(g, g)

    return _re.sub(r"\\(u[0-9a-fA-F]{4}|.)", sub, s)


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(text):
        m = TOKEN_RE.match(text, i)
        if not m:
            raise SyntaxError(f"cypher: unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind == "WS":
            continue
        if kind == "STRING":
            val = _unescape(val[1:-1])
        elif kind == "PARAM":
            val = val[1:]
        elif kind == "NAME":
            if val.startswith("`"):
                val = val[1:-1]
            elif val.upper() in KEYWORDS:
                # keyword kind, but keep the original spelling — labels,
                # rel types, and properties may collide with keywords
                # (e.g. the Order label) and need their case back
                kind = "KEYWORD"
        out.append(Token(kind, val, m.start()))
    out.append(Token("EOF", "", len(text)))
    return out
