"""Query DSL: lexer/parser -> AST -> DataFrame plan."""

from search_engine_core_spark.plans.query_parser import (
    And,
    Filter,
    Node,
    Or,
    ParseError,
    QueryParser,
    Term,
)

__all__ = ["And", "Filter", "Node", "Or", "ParseError", "QueryParser", "Term"]
