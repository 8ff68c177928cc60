"""Parser goldens ported 1:1 from the reference Catch2 suite
(/root/reference/tests/search_core/TestQueryParser.cpp)."""

from __future__ import annotations

import pytest

from search_engine_core_spark.plans.query_parser import ParseError, QueryParser

P = QueryParser()


@pytest.mark.parametrize("q", ["apple", "banana", "search"])
def test_simple_word(q):
    assert P.to_redis(q) == q


def test_implicit_and():
    assert P.to_redis("apple banana") == "apple banana"


def test_exact_phrase():
    assert P.to_redis('"apple pie"') == '"apple pie"'


@pytest.mark.parametrize("q", ["", "   ", "\t\n"])
def test_empty_query_throws(q):
    with pytest.raises(ParseError):
        P.to_redis(q)


def test_explicit_and():
    assert P.to_redis("apple AND banana") == "apple banana"


@pytest.mark.parametrize("q", ["apple OR banana", "apple or banana"])
def test_or_operator(q):
    assert P.to_redis(q) == "apple|banana"


def test_mixed_operators():
    # left-fold: a AND b OR c == (a b)|c  (QueryParser.cpp:166-230)
    assert P.to_redis("apple AND banana OR cherry") == "apple banana|cherry"


def test_multiple_ors():
    assert P.to_redis("apple OR banana OR cherry") == "apple|banana|cherry"


def test_site_filter():
    assert P.to_redis("site:example.com") == "@domain:{example.com}"


def test_site_filter_with_search():
    assert P.to_redis("site:example.com apple") == "@domain:{example.com} apple"


@pytest.mark.parametrize("field", ["title", "body", "author"])
def test_generic_field_filter(field):
    assert P.to_redis(f"{field}:test") == "@" + field + ":{test}"


def test_multiple_filters():
    assert P.to_redis("site:example.com title:launch") == "@domain:{example.com} @title:{launch}"


def test_lowercase_conversion():
    assert P.to_redis("ApPlE") == "apple"


@pytest.mark.parametrize("q", ["apple,", "apple!", "apple.", "apple;"])
def test_punctuation_stripping(q):
    assert P.to_redis(q) == "apple"


def test_preserve_special_characters():
    assert P.to_redis('"apple pie"') == '"apple pie"'
    assert P.to_redis("site:test") == "@domain:{test}"
    assert P.to_redis("e-mail") == "e-mail"


@pytest.mark.parametrize("q", ["café", "résumé", "naïve"])
def test_unicode_terms(q):
    assert P.to_redis(q) != ""


@pytest.mark.parametrize("q", ['"unclosed', 'unclosed"'])
def test_unmatched_quotes(q):
    with pytest.raises(ParseError):
        P.to_redis(q)


@pytest.mark.parametrize("q", ["OR", "AND", "apple OR", "AND apple"])
def test_stray_operators(q):
    with pytest.raises(ParseError):
        P.to_redis(q)


def test_invalid_filters():
    assert P.to_redis(":value") == "value"
    assert P.to_redis("field:") == "field"


def test_combined_features():
    result = P.to_redis('site:example.com "apple pie" OR banana recipe')
    assert "@domain:{example.com}" in result
    assert '"apple pie"' in result
    assert "|" in result


def test_multiple_sites():
    assert (
        P.to_redis("site:example.com site:test.org apple")
        == "@domain:{example.com} @domain:{test.org} apple"
    )
