"""Query DSL parser — grammar-identical to the reference.

Replicates ``/root/reference/src/search_core/QueryParser.cpp:28-254`` and its
AST (``include/search_core/QueryParser.hpp:13-43``):

* bare words  -> normalized ``Term`` (implicit AND with neighbors)
* "quoted"    -> ``Term(exact=True)`` with the RAW quoted text (no
                 normalization — QueryParser.cpp:104-117)
* AND / and   -> n-ary flattened ``And`` (left-fold)
* OR / or / | -> n-ary flattened ``Or``; binds over the accumulated left
                 group: ``a AND b OR c`` == ``(a b)|c`` (left-fold at
                 QueryParser.cpp:166-230)
* field:value -> ``Filter``; ``site:`` aliases to ``domain``
                 (QueryParser.cpp:68-71); edge cases ``:v`` -> term v,
                 ``f:`` -> term f (QueryParser.cpp:54-62)
* normalization keeps ``[a-z0-9-|:]`` lowercased (QueryParser.cpp:130-140)
* errors: empty query, unmatched quote, stray operator -> ``ParseError``

``to_redis()`` serialization is kept purely for golden-test parity with the
reference test suite (``tests/search_core/TestQueryParser.cpp``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ParseError(ValueError):
    """Mirror of hatef::search::ParseError."""


@dataclass
class Node:
    def to_redis(self) -> str:  # pragma: no cover - overridden
        raise NotImplementedError


@dataclass
class Term(Node):
    value: str
    exact: bool = False

    def to_redis(self) -> str:
        return f'"{self.value}"' if self.exact else self.value


@dataclass
class Filter(Node):
    field: str
    value: str

    def to_redis(self) -> str:
        return f"@{self.field}:{{{self.value}}}"


@dataclass
class And(Node):
    children: list[Node] = field(default_factory=list)

    def to_redis(self) -> str:
        return " ".join(c.to_redis() for c in self.children)


@dataclass
class Or(Node):
    children: list[Node] = field(default_factory=list)

    def to_redis(self) -> str:
        return "|".join(c.to_redis() for c in self.children)


_WORD, _QUOTED, _AND, _OR, _FILTER, _EOF = range(6)


def _normalize(text: str) -> str:
    # QueryParser.cpp:130-140 — keep alnum (ASCII via isalnum; we accept
    # str.isalnum for unicode terms, the reference is byte-wise but its own
    # unicode test only asserts non-empty output), '-', '|', ':'.
    out = []
    for ch in text:
        if ch.isalnum() or ch in "-|:":
            out.append(ch.lower())
    return "".join(out)


class _Lexer:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def next(self) -> tuple[int, str, str]:
        while self.pos < len(self.s) and self.s[self.pos].isspace():
            self.pos += 1
        if self.pos >= len(self.s):
            return (_EOF, "", "")
        if self.s[self.pos] == '"':
            return self._quoted()
        word = self._word()
        if not word:
            raise ParseError(f"Unexpected character at position {self.pos}")
        colon = word.find(":")
        if colon != -1:
            if colon == 0:
                return (_WORD, _normalize(word[1:]), "")
            if colon == len(word) - 1:
                return (_WORD, _normalize(word[:-1]), "")
            fld, val = word[:colon], word[colon + 1 :]
            if fld == "site":
                fld = "domain"
            return (_FILTER, val, fld)
        lower = word.lower()
        if lower == "and":
            return (_AND, "AND", "")
        if lower in ("or", "|"):
            return (_OR, "OR", "")
        return (_WORD, _normalize(word), "")

    def peek(self) -> tuple[int, str, str]:
        saved = self.pos
        tok = self.next()
        self.pos = saved
        return tok

    def _quoted(self) -> tuple[int, str, str]:
        self.pos += 1
        start = self.pos
        while self.pos < len(self.s) and self.s[self.pos] != '"':
            self.pos += 1
        if self.pos >= len(self.s):
            raise ParseError("Unmatched quote in query")
        value = self.s[start : self.pos]
        self.pos += 1
        return (_QUOTED, value, "")

    def _word(self) -> str:
        start = self.pos
        while self.pos < len(self.s) and not self.s[self.pos].isspace() and self.s[self.pos] != '"':
            self.pos += 1
        return self.s[start : self.pos]


class _Parser:
    def __init__(self, s: str):
        self.lexer = _Lexer(s)

    def parse(self) -> Node:
        result = self._expression()
        ttype, tval, _ = self.lexer.next()
        if ttype != _EOF:
            raise ParseError(f"Unexpected token: {tval}")
        if result is None:
            raise ParseError("Empty query")
        return result

    def _expression(self) -> Node | None:
        left = self._term()
        if left is None:
            return None
        while True:
            ttype, _, _ = self.lexer.peek()
            if ttype == _OR:
                self.lexer.next()
                right = self._term()
                if right is None:
                    raise ParseError("Expected term after OR")
                if isinstance(left, Or):
                    left.children.append(right)
                else:
                    left = Or(children=[left, right])
            elif ttype == _AND:
                self.lexer.next()
                right = self._term()
                if right is None:
                    raise ParseError("Expected term after AND")
                if isinstance(left, And):
                    left.children.append(right)
                else:
                    left = And(children=[left, right])
            elif ttype in (_WORD, _QUOTED, _FILTER):
                right = self._term()
                if right is None:
                    break
                if isinstance(left, And):
                    left.children.append(right)
                else:
                    left = And(children=[left, right])
            else:
                break
        return left

    def _term(self) -> Node | None:
        ttype, tval, tfield = self.lexer.peek()
        if ttype == _WORD:
            self.lexer.next()
            return Term(tval, exact=False)
        if ttype == _QUOTED:
            self.lexer.next()
            return Term(tval, exact=True)
        if ttype == _FILTER:
            self.lexer.next()
            return Filter(tfield, tval)
        return None


class QueryParser:
    """Entry point mirroring ``hatef::search::QueryParser``."""

    def parse(self, q: str) -> Node:
        stripped = q.strip(" \t\n\r")
        if not stripped:
            raise ParseError("Empty query")
        return _Parser(stripped).parse()

    def to_redis(self, q: str) -> str:
        return self.parse(q).to_redis()
