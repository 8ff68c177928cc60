"""HTML field extraction (S2-S6) as pure Catalyst column expressions.

The reference extracts title / meta-description / text / links with a full
Gumbo DOM parse (``src/crawler/ContentParser.cpp:85-207``). A DOM walk is
per-row imperative work; at 100 TB the same fields fall out of a handful of
regexes that Catalyst evaluates JVM-side inside whole-stage codegen — no
Python, no UDF, no shuffle. Semantics are matched to the reference with the
deviations documented per function (all are about malformed-HTML edge
cases, not well-formed pages).

Every expression here is deterministic and engine-portable: the DuckDB
oracle in ``entry_queries`` evaluates the same RE2-compatible patterns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ContentParser::isValidUrl (ContentParser.cpp:244-250) — the exact
# ECMAScript pattern, valid under Java regex and RE2 alike.
VALID_URL_RE = (
    r"^(https?://)[^\s/:?#]+(\.[^\s/:?#]+)*(:\d+)?(/[^\s?#]*)?(\?[^\s#]*)?(#[^\s]*)?$"
)


def extract_title(html: Column | str) -> Column:
    """S3 — first ``<title>`` text (``ContentParser::extractTitle``,
    ContentParser.cpp:85-131). NULL when absent or empty, mirroring the
    reference's ``std::nullopt``.

    Deviation: the reference walks only direct children of ``<head>`` and
    takes the first text node; this takes the first ``<title>`` element
    anywhere (well-formed pages have exactly one, in head).
    """
    c = F.col(html) if isinstance(html, str) else html
    return F.nullif(
        F.regexp_extract(c, r"(?is)<title[^>]*>([^<]*)</title>", 1), F.lit("")
    )


def extract_meta_description(html: Column | str) -> Column:
    """S4 — ``<meta name="description" content="...">``
    (``ContentParser::findMetaTag``, ContentParser.cpp:133-155 + 186-206).
    Handles both attribute orders; NULL when absent.

    Deviation: attribute-value match is case-insensitive here (the
    reference compares ``name`` case-sensitively); real pages use
    lowercase ``description`` so this only widens malformed-page coverage.
    """
    c = F.col(html) if isinstance(html, str) else html
    fwd = F.regexp_extract(
        c,
        r"""(?is)<meta\s[^>]*name\s*=\s*["']description["'][^>]*content\s*=\s*["']([^"']*)["']""",
        1,
    )
    rev = F.regexp_extract(
        c,
        r"""(?is)<meta\s[^>]*content\s*=\s*["']([^"']*)["'][^>]*name\s*=\s*["']description["']""",
        1,
    )
    return F.coalesce(F.nullif(fwd, F.lit("")), F.nullif(rev, F.lit("")))


def extract_text(html: Column | str) -> Column:
    """S5 — visible text: drop script/style subtrees and comments, strip
    tags, canonicalize whitespace (``ContentParser::extractTextFromNode``,
    ContentParser.cpp:156-169: every text node outside script/style is
    concatenated with a trailing space).

    Deviation: runs of whitespace collapse to one space and the result is
    trimmed — the reference keeps each text node's inner whitespace and a
    trailing separator; collapsing makes the output canonical for hashing
    and matches what the indexer's tokenizer sees either way.
    """
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def normalize_link(href: Column, base_url: Column) -> Column:
    """``ContentParser::normalizeUrl`` (ContentParser.cpp:209-242):
    absolute http(s) passes through; ``//`` gets ``https:``; ``/path``
    joins the base URL's scheme+host; anything else joins the base URL's
    directory (text up to and including the last ``/`` — the scheme's
    ``//`` guarantees one exists, reproducing the reference's quirk that a
    bare-host base resolves relatives against ``https://``)."""
    href = F.trim(href)
    host_root = F.regexp_extract(base_url, r"^(https?://[^/]+)", 1)
    # substr up to the LAST '/' of base (C++ find_last_of('/') + 1)
    base_dir = F.regexp_extract(base_url, r"^(.*/)", 1)
    return (
        F.when(href == "", F.lit(""))
        .when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(F.lit("https:"), href))
        .when(
            href.startswith("/"),
            F.when(host_root != "", F.concat(host_root, href)).otherwise(
                F.concat(base_url, href)
            ),
        )
        .otherwise(
            F.when(base_dir != "", F.concat(base_dir, href)).otherwise(
                F.concat(base_url, F.lit("/"), href)
            )
        )
    )


def extract_links(html: Column | str, base_url: Column | str) -> Column:
    """S6 — ``<a href>`` values, normalized against ``base_url`` and
    filtered through ``isValidUrl`` (``ContentParser::extractLinks`` +
    ``extractLinksFromNode``, ContentParser.cpp:69-83 + 171-184).
    Returns array<string> in document order, duplicates preserved (the
    reference push_backs every anchor)."""
    c = F.col(html) if isinstance(html, str) else html
    b = F.col(base_url) if isinstance(base_url, str) else base_url
    hrefs = F.regexp_extract_all(
        c, F.lit(r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["']"""), F.lit(1)
    )
    normalized = F.transform(hrefs, lambda h: normalize_link(h, b))
    return F.filter(normalized, lambda u: u.rlike(VALID_URL_RE))


def parse_document(df, html_col: str = "html", url_col: str = "url"):
    """S2 — the full parsed-page shape the crawler indexes
    (``ContentParser::parse``): one wide projection, single pass over the
    HTML column, all JVM-side."""
    h = F.col(html_col)
    return df.withColumns(
        {
            "title": extract_title(h),
            "meta_description": extract_meta_description(h),
            "text_content": extract_text(h),
            "links": extract_links(h, F.col(url_col)),
        }
    )
