"""PII detection counts and redaction for training-corpus scrubbing.

The standard pre-training scrub (emails, IP addresses, phone numbers —
the categories DataTrove's ``PIIFormatter`` and NeMo Curator's PII
modifier both target with regexes; BigCode/StarCoder documented the
same recipe for The Stack). Regex-based redaction is the public
state of practice for web-scale corpora — NER-based PII is a model
call, out of scope here and orders of magnitude more expensive.

Patterns are written to behave identically under Java regex (Spark's
``rlike``/``regexp_replace``/``regexp_count``) and Python ``re`` so the
tests can twin them verbatim: no inline flags Java lacks, no
possessive quantifiers Python lacks.

Scale shape: chained ``regexp_replace`` / ``regexp_count`` — pure
Catalyst expressions, map-side, no shuffle, no Python in the hot path.

IPv4 octets are range-checked in the pattern (0-255), so version
strings like ``10.1.2.300`` don't redact. Phone matching is the
deliberately conservative NANP-ish shape (optional +1 / (areacode),
then 3-3-4 with ``-``, ``.``, or space separators) — a looser "any 8+
digits" rule eats order ids and timestamps; callers with other locales
pass their own pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "redact_pii_df",
]

_EMAIL = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4 = r"\b" + _OCTET + r"(?:\." + _OCTET + r"){3}\b"
# BOTH edges need explicit guards, not just \b: without the left one
# the match can START mid-run inside a longer digit string ("order id
# 812345 678-9012" would redact "345 678-9012"); without the right one
# a phone-shaped PREFIX of a longer separated id matches ("ref
# 555-123-4567-8901" would redact to "<PHONE>-8901" — \b holds before
# '-'). (?<![\d.-]) / (?![-.]?\d) are fixed-width-enough for Java and
# Python alike; both deliberately refuse matches glued to '-'/'.' —
# conservative by design, same policy as the 3-3-4 shape itself.
_PHONE = (
    r"(?<![\d.-])(?:\+?1[-. ])?\(?[2-9][0-9]{2}\)?[-. ][0-9]{3}[-. ]"
    r"[0-9]{4}\b(?![-.]?\d)"
)

# kind -> (pattern, default replacement token)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (_EMAIL, "<EMAIL>"),
    "ipv4": (_IPV4, "<IP>"),
    "phone": (_PHONE, "<PHONE>"),
}


from search_engine_core_spark.functions.textprims import (  # noqa: E402
    text_or_empty as _text,
)


def pii_counts(text: Column | str, kinds: tuple[str, ...] = ("email", "ipv4", "phone")) -> Column:
    """struct of per-kind match counts (``n_email``, ``n_ipv4``,
    ``n_phone`` for the defaults) — the audit signal to log before
    deciding to redact, and the filter column for "drop docs with more
    than K PII hits" policies."""
    t = _text(text)
    fields = []
    for k in kinds:
        pat, _ = PII_PATTERNS[k]
        fields.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{k}"))
    return F.struct(*fields)


def redact_pii(
    text: Column | str,
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    replacements: dict[str, str] | None = None,
) -> Column:
    """The text with every match of each requested kind replaced by its
    token, applied in ``kinds`` order (email before phone matters:
    digits inside an already-redacted email can't double-match)."""
    out = _text(text)
    for k in kinds:
        pat, token = PII_PATTERNS[k]
        if replacements and k in replacements:
            token = replacements[k]
        out = F.regexp_replace(out, pat, token)
    return out


def redact_pii_df(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ipv4", "phone"),
    with_counts: bool = False,
) -> DataFrame:
    """``text_col`` redacted in place; with ``with_counts`` a
    ``pii_counts`` struct column is added FIRST (counts reflect the
    original text). One map-side projection either way."""
    out = df
    if with_counts:
        out = out.withColumn("pii_counts", pii_counts(text_col, kinds))
    return out.withColumn(text_col, redact_pii(text_col, kinds))
