"""robots.txt predicate (P8) as distributed dataflow.

The reference parses each domain's robots.txt into per-user-agent
allow/disallow glob rules and checks every URL's path against them
(``src/crawler/RobotsTxtParser.cpp``). On Spark the rules live in a small
rules TABLE (one row per directive) built by a pure-SQL parse of the raw
robots bodies, and the predicate is a broadcast join: at 100 TB the URL
set is the big side and the rules side is a few rows per crawled domain.

Replicated reference semantics (cited):
* line parse: trim, lowercase, skip blank/#; ``user-agent:`` switches the
  current group; directives bind to the most recent group header
  (``parseRobotsTxt``, RobotsTxtParser.cpp:15-62 — successive UA headers
  OVERWRITE, they do not accumulate a group like the RFC says);
* glob -> regex: ``*`` -> ``.*``, ``?`` -> ``.``, anchored ``^`` prefix
  SEARCH (``parseLine``, RobotsTxtParser.cpp:199-254 — other regex
  metacharacters pass through unescaped, quirk preserved);
* precedence: if rules exist for the specific user agent, ONLY they
  apply (allow first, then disallow, else allow); otherwise the ``*``
  group applies the same way; no rules -> allowed
  (``isAllowed``, RobotsTxtParser.cpp:77-156);
* ``crawl-delay: <seconds>`` -> milliseconds, float accepted
  (RobotsTxtParser.cpp:233-247).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def domain_of(url: Column | str) -> Column:
    """Host part of a URL (``RobotsTxtParser::isAllowed`` domain slice,
    RobotsTxtParser.cpp:81-95; also ``URLFrontier::extractDomain``)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.nullif(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)", 1), F.lit(""))


def path_of(url: Column | str) -> Column:
    """Path up to ``?`` — the static ``extractPath`` helper
    (RobotsTxtParser.cpp:64-76); ``/`` when the URL has no path."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/[^?]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(raw: DataFrame, domain_col: str = "domain", content_col: str = "content") -> DataFrame:
    """Parse raw robots.txt bodies into a rules table:
    (domain, user_agent, directive, pattern, regex, crawl_delay_ms, pos).

    The carried "current user-agent" state is a last-non-null window over
    the exploded line sequence — the dataflow twin of the parser's
    ``currentUserAgent`` variable. One narrow shuffle keyed by domain;
    robots bodies are tiny, the output is broadcastable.
    """
    lines = (
        raw.select(
            F.col(domain_col).alias("domain"),
            F.posexplode(F.split(F.col(content_col), "\n")).alias("pos", "line"),
        )
        .withColumn("line", F.lower(F.trim(F.regexp_replace("line", "\r", ""))))
        .filter((F.col("line") != "") & ~F.col("line").startswith("#"))
    )
    w = Window.partitionBy("domain").orderBy("pos")
    ua_header = F.when(
        F.col("line").startswith("user-agent:"),
        F.trim(F.substring("line", 12, 1 << 20)),
    )
    lines = lines.withColumn(
        "user_agent",
        # directives before any header bind to "*" (parser initial state)
        F.coalesce(F.last(ua_header, ignorenulls=True).over(w), F.lit("*")),
    ).filter(~F.col("line").startswith("user-agent:"))

    directive = F.regexp_extract("line", r"^(disallow|allow|crawl-delay):", 1)
    pattern = F.trim(F.regexp_replace("line", r"^(disallow|allow|crawl-delay):", ""))
    out = (
        lines.withColumn("directive", directive)
        .withColumn("pattern", pattern)
        .filter(F.col("directive") != "")
    )
    # glob -> anchored prefix regex, exactly the reference's two rewrites
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(F.regexp_replace("pattern", r"\*", ".*"), r"\?", "."),
    )
    return out.select(
        "domain",
        "user_agent",
        "directive",
        "pattern",
        F.when(F.col("directive").isin("allow", "disallow") & (F.col("pattern") != ""), rx).alias("regex"),
        F.when(
            F.col("directive") == "crawl-delay",
            # try_cast: a malformed delay value is ignored (null -> group
            # default), like the reference's tolerated std::stof failure —
            # ANSI-mode cast would fail the whole query on one bad line
            (F.col("pattern").try_cast("float") * 1000).try_cast("int"),
        ).alias("crawl_delay_ms"),
        "pos",
    )


def is_allowed(urls: DataFrame, rules: DataFrame, user_agent: str = "*", url_col: str = "url") -> DataFrame:
    """P8 predicate: ``urls`` + boolean ``allowed`` under ``rules``
    (the output of :func:`parse_robots`), reference precedence.

    Plan shape: broadcast the tiny rules table, LEFT join on domain (a
    URL row fans out only to its domain's few rules), one aggregation back
    to URL grain. The per-row regex is non-foldable so it evaluates via
    Java regex at match time — same search semantics as ``regex_search``
    with the ``^``-anchored pattern.
    """
    agent = user_agent.lower()
    u = urls.withColumn("_dom", domain_of(url_col)).withColumn("_path", path_of(url_col))
    r = rules.filter(F.col("regex").isNotNull()).select(
        F.col("domain").alias("_dom"), "user_agent", "directive", "regex"
    )
    j = u.join(F.broadcast(r), "_dom", "left")
    hit = F.expr("_path rlike regex")
    is_specific = F.col("user_agent") == agent
    is_default = F.col("user_agent") == "*"
    grouped = j.groupBy(*urls.columns).agg(
        F.max(F.when(is_specific, True)).alias("has_specific"),
        F.max(F.when(is_specific & (F.col("directive") == "allow") & hit, True)).alias("s_allow"),
        F.max(F.when(is_specific & (F.col("directive") == "disallow") & hit, True)).alias("s_deny"),
        F.max(F.when(is_default & (F.col("directive") == "allow") & hit, True)).alias("d_allow"),
        F.max(F.when(is_default & (F.col("directive") == "disallow") & hit, True)).alias("d_deny"),
    )
    allowed = F.when(
        F.coalesce(F.col("has_specific"), F.lit(False)),
        # specific group exists: allow-first, deny-second, default allow —
        # and NEVER falls back to the "*" group (isAllowed:129-132)
        F.coalesce(F.col("s_allow"), ~F.coalesce(F.col("s_deny"), F.lit(False))),
    ).otherwise(F.coalesce(F.col("d_allow"), ~F.coalesce(F.col("d_deny"), F.lit(False))))
    return grouped.select(*urls.columns, allowed.alias("allowed"))


def crawl_delay_ms(rules: DataFrame, user_agent: str = "*", group_default_ms: int = 1000) -> DataFrame:
    """Per-domain crawl delay, reference precedence (``getCrawlDelay``,
    RobotsTxtParser.cpp:158-185): if a group exists for the specific agent
    (any directive bound to it), its delay applies — the struct default
    1000 ms when the group never set one (``RobotsRule.crawlDelay{1000}``,
    RobotsTxtParser.h:34) — with NO fallback to the ``*`` group; otherwise
    the ``*`` group's delay (same 1000 ms default). Domains absent from
    ``rules`` get no row: callers use the reference's 100 ms
    no-robots-cached default (RobotsTxtParser.cpp:163-166)."""
    agent = user_agent.lower()
    per = rules.groupBy("domain").agg(
        F.max(F.col("user_agent") == agent).alias("has_specific"),
        F.max(
            F.when(F.col("user_agent") == agent, F.col("crawl_delay_ms"))
        ).alias("s_ms"),
        F.max(F.when(F.col("user_agent") == "*", F.col("crawl_delay_ms"))).alias("d_ms"),
    )
    delay = F.when(
        F.col("has_specific"), F.coalesce(F.col("s_ms"), F.lit(group_default_ms))
    ).otherwise(F.coalesce(F.col("d_ms"), F.lit(group_default_ms)))
    return per.select("domain", delay.alias("crawl_delay_ms"))
