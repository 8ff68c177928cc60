"""Crawl-side surface added in round 2: HTML extraction (S2-S6),
highlighting, robots.txt predicate (P8), domain health / circuit breaker /
politeness (T4/T5), seed-domain restriction (P7), JSON scorer config (X2).
Goldens mirror the cited reference behaviors."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from search_engine_core_spark.functions.highlight import highlight_expr
from search_engine_core_spark.functions.html import (
    extract_links,
    extract_meta_description,
    extract_text,
    extract_title,
    parse_document,
)
from search_engine_core_spark.streaming import frontier
from search_engine_core_spark.streaming.robots import (
    crawl_delay_ms,
    domain_of,
    is_allowed,
    parse_robots,
    path_of,
)

HTML = """<html><head>
<title>My Page</title>
<meta charset="utf-8">
<meta name="description" content="a nice page">
</head><body>
<p>Hello <b>world</b></p>
<script>var x = "<p>not text</p>";</script>
<style>.x { color: red }</style>
<!-- comment text -->
<a href="https://other.com/abs">abs</a>
<a href="//cdn.example.com/lib.js">proto</a>
<a href="/root">rooted</a>
<a href="sibling.html">rel</a>
<a href="not a url">bad</a>
</body></html>"""


def _one(spark, html=HTML, url="https://example.com/dir/page.html"):
    return spark.createDataFrame([(html, url)], "html string, url string")


class TestHtml:
    def test_title(self, spark):
        df = _one(spark)
        r = df.select(extract_title("html").alias("t")).first()
        assert r["t"] == "My Page"

    def test_title_missing_is_null(self, spark):
        df = _one(spark, html="<html><head></head><body>x</body></html>")
        assert df.select(extract_title("html").alias("t")).first()["t"] is None
        df = _one(spark, html="<title></title>")
        assert df.select(extract_title("html").alias("t")).first()["t"] is None

    def test_meta_description_both_attr_orders(self, spark):
        r = _one(spark).select(extract_meta_description("html").alias("d")).first()
        assert r["d"] == "a nice page"
        rev = '<meta content="rev order" name="description">'
        r = _one(spark, html=rev).select(extract_meta_description("html").alias("d")).first()
        assert r["d"] == "rev order"
        r = _one(spark, html="<html></html>").select(
            extract_meta_description("html").alias("d")
        ).first()
        assert r["d"] is None

    def test_text_strips_script_style_comments_tags(self, spark):
        r = _one(spark).select(extract_text("html").alias("x")).first()["x"]
        assert "Hello world" in r
        assert "not text" not in r  # whole script subtree dropped
        assert "var x" not in r
        assert "color" not in r
        assert "comment text" not in r
        assert "<" not in r

    def test_links_normalize_and_filter(self, spark):
        r = _one(spark).select(extract_links("html", "url").alias("l")).first()["l"]
        assert r == [
            "https://other.com/abs",
            "https://cdn.example.com/lib.js",
            "https://example.com/root",
            "https://example.com/dir/sibling.html",
        ]  # "not a url" fails isValidUrl

    def test_parse_document_shape(self, spark):
        out = parse_document(_one(spark))
        assert {"title", "meta_description", "text_content", "links"} <= set(out.columns)


class TestHighlight:
    def test_wraps_word_boundary_matches(self, spark):
        df = spark.createDataFrame([("Spark joins sparkle fast",)], "s string")
        r = df.select(highlight_expr("s", ["spark", "fast"]).alias("h")).first()["h"]
        assert r == "<b>Spark</b> joins sparkle <b>fast</b>"

    def test_engine_search_with_meta_highlight(self, spark, small_corpus):
        from search_engine_core_spark.engine import SearchEngine

        eng = SearchEngine(small_corpus)
        rows = eng.search_with_meta("spark merge", k=3, highlight=True).collect()
        assert rows
        assert any("<b>" in (r["snippet"] or "") for r in rows)
        eng.unpersist()


ROBOTS = """# global rules
Disallow: /pre-header
User-Agent: *
Disallow: /private*
Allow: /private/ok
Crawl-delay: 2.5
User-agent: specialbot
Disallow: /special?
User-agent: emptybot
"""


class TestRobots:
    @pytest.fixture(scope="class")
    def rules(self, spark):
        raw = spark.createDataFrame([("example.com", ROBOTS)], "domain string, content string")
        return parse_robots(raw).cache()

    def test_parse_group_binding(self, rules):
        rows = {(r["user_agent"], r["directive"], r["pattern"]) for r in rules.collect()}
        assert ("*", "disallow", "/pre-header") in rows  # pre-header binds to *
        assert ("*", "disallow", "/private*") in rows
        assert ("*", "allow", "/private/ok") in rows
        assert ("specialbot", "disallow", "/special?") in rows
        # glob conversion: * -> .*, ? -> .
        rx = {r["pattern"]: r["regex"] for r in rules.collect() if r["regex"]}
        assert rx["/private*"] == "^/private.*"
        assert rx["/special?"] == "^/special."

    def test_crawl_delay_float_seconds(self, rules):
        r = {x["domain"]: x["crawl_delay_ms"] for x in crawl_delay_ms(rules).collect()}
        assert r["example.com"] == 2500
        # specialbot's group exists (it has a disallow) but set no delay ->
        # the RobotsRule struct default 1000, NOT the '*' group's 2500
        r = {
            x["domain"]: x["crawl_delay_ms"]
            for x in crawl_delay_ms(rules, user_agent="SpecialBot").collect()
        }
        assert r["example.com"] == 1000
        # agent with no group -> '*' group's delay
        r = {
            x["domain"]: x["crawl_delay_ms"]
            for x in crawl_delay_ms(rules, user_agent="nobody").collect()
        }
        assert r["example.com"] == 2500

    def test_is_allowed_precedence(self, spark, rules):
        urls = spark.createDataFrame(
            [
                ("https://example.com/public/a",),
                ("https://example.com/private/x",),
                ("https://example.com/private/ok",),
                ("https://example.com/private/okx",),  # prefix SEARCH: allow wins
                ("https://example.com/special1",),
                ("https://unknown.org/anything",),
            ],
            "url string",
        )
        got = {r["url"]: r["allowed"] for r in is_allowed(urls, rules).collect()}
        assert got["https://example.com/public/a"] is True
        assert got["https://example.com/private/x"] is False
        assert got["https://example.com/private/ok"] is True
        assert got["https://example.com/private/okx"] is True
        assert got["https://example.com/special1"] is True  # '*' group for default agent
        assert got["https://unknown.org/anything"] is True  # no rules -> allowed

    def test_specific_agent_no_fallback(self, spark, rules):
        urls = spark.createDataFrame(
            [
                ("https://example.com/special1",),
                ("https://example.com/private/x",),  # '*' denies, but specialbot
                # group exists -> NO fallback (isAllowed:129-132)
            ],
            "url string",
        )
        got = {
            r["url"]: r["allowed"]
            for r in is_allowed(urls, rules, user_agent="SpecialBot").collect()
        }
        assert got["https://example.com/special1"] is False
        assert got["https://example.com/private/x"] is True

    def test_url_helpers(self, spark):
        df = spark.createDataFrame(
            [("https://a.com/x/y?q=1",), ("http://b.org",)], "url string"
        )
        got = df.select(domain_of("url").alias("d"), path_of("url").alias("p")).collect()
        assert (got[0]["d"], got[0]["p"]) == ("a.com", "/x/y")
        assert (got[1]["d"], got[1]["p"]) == ("b.org", "/")


class TestDomainHealth:
    NOW = 1_000_000

    def _log(self, spark, rows):
        return spark.createDataFrame(rows, "domain string, ts long, status int")

    def test_circuit_states(self, spark):
        now = self.NOW
        rows = (
            # healthy: successes only
            [("ok.com", now - 10_000 + i, 200) for i in range(3)]
            # open: 5 recent consecutive failures
            + [("bad.com", now - 5_000 + i, 500) for i in range(5)]
            # half-open: 5 failures but past the reset window
            + [("old.com", now - 400_000 + i, 500) for i in range(5)]
            # recovered: failures then a success resets the count
            + [("rec.com", now - 9_000 + i, 500) for i in range(5)]
            + [("rec.com", now - 1_000, 200)]
        )
        st = {
            r["domain"]: r
            for r in frontier.domain_states(self._log(spark, rows), now).collect()
        }
        assert st["ok.com"]["circuit_state"] == "CLOSED"
        assert st["ok.com"]["consecutive_failures"] == 0
        assert st["bad.com"]["circuit_state"] == "OPEN"
        assert st["bad.com"]["consecutive_failures"] == 5
        assert st["old.com"]["circuit_state"] == "HALF_OPEN"
        assert st["rec.com"]["circuit_state"] == "CLOSED"
        assert st["rec.com"]["consecutive_failures"] == 0

    def test_opens_despite_prior_successes(self, spark):
        """r2 driver bug (q40): with nulls-first rank ordering, a domain
        with ANY prior successes never crossed the threshold. Successes
        then >= threshold trailing failures must report OPEN, and
        circuit_opened_at must be the threshold-crossing failure's own
        ts (DomainManager.cpp:213-238)."""
        now = self.NOW
        rows = [("mix.com", now - 100_000 + i, 200) for i in range(10)] + [
            ("mix.com", now - 5_000 + i, 500) for i in range(5)
        ]
        st = frontier.domain_states(self._log(spark, rows), now).collect()[0]
        assert st["circuit_state"] == "OPEN"
        assert st["consecutive_failures"] == 5
        # opened at the 5th post-success failure, not offset by successes
        assert st["circuit_opened_at"] == now - 5_000 + 4

    def test_stays_closed_below_threshold_with_prior_successes(self, spark):
        """The dual false-positive of the r2 bug: 2 successes then 3
        failures ranked 3..5 with nulls-first ordering, falsely OPENing
        at threshold 5. Must stay CLOSED."""
        now = self.NOW
        rows = [("few.com", now - 50_000 + i, 200) for i in range(2)] + [
            ("few.com", now - 3_000 + i, 500) for i in range(3)
        ]
        st = frontier.domain_states(self._log(spark, rows), now).collect()[0]
        assert st["circuit_state"] == "CLOSED"
        assert st["consecutive_failures"] == 3
        assert st["circuit_opened_at"] is None

    def test_polite_blocks_open_domain_with_history(self, spark):
        """claim_order_polite must exclude a domain whose circuit opened
        after a success-heavy history (the regime the r2 fixtures never
        exercised)."""
        now = self.NOW
        log = self._log(
            spark,
            [("hist.com", now - 100_000 + i, 200) for i in range(20)]
            + [("hist.com", now - 500 + i, 500) for i in range(6)]
            + [("fine.com", now - 60_000, 200)],
        )
        states = frontier.domain_states(log, now)
        tasks = spark.createDataFrame(
            [("https://hist.com/a", 9, now - 1), ("https://fine.com/b", 1, now - 1)],
            "url string, priority int, ready_at long",
        )
        got = [r["url"] for r in frontier.claim_order_polite(tasks, states, now).collect()]
        assert got == ["https://fine.com/b"]

    def test_rate_limit_and_dynamic_delay(self, spark):
        now = self.NOW
        rows = [
            ("rl.com", now - 30_000, 429),
            ("slow.com", now - 2_000, 503),
            ("slow.com", now - 1_000, 503),
        ]
        st = {
            r["domain"]: r
            for r in frontier.domain_states(self._log(spark, rows), now).collect()
        }
        assert st["rl.com"]["rate_limited"] is True
        assert st["slow.com"]["rate_limited"] is False
        # 429: 500 * 1.5^1 * 2.0 = 1500
        assert st["rl.com"]["dynamic_delay_ms"] == 1500
        # two temporary failures: 500 * 1.5^2 * 1.5 = 1687
        assert st["slow.com"]["dynamic_delay_ms"] == 1687

    def test_last_fail_status_tiebreak_deterministic(self, spark):
        """Duplicate (domain, ts) failure rows with differing statuses:
        without a composite (ts, status) max_by key the last-fail status —
        and with it the 2.0x/1.5x delay multiplier — is partition-order
        dependent (r3 q40 driver divergence class). The deterministic rule
        is max status at the max failure ts: here 503 (TEMPORARY, x1.5)
        beats the tied 429 (RATE_LIMITED, x2.0)."""
        now = self.NOW
        t = now - 2_000
        rows = [
            ("tie.com", t - 100, 500),
            ("tie.com", t, 429),
            ("tie.com", t, 503),
        ]
        # repartition wide so any partition-order nondeterminism would show
        log = self._log(spark, rows).repartition(8)
        for _ in range(3):
            st = frontier.domain_states(log, now).collect()[0]
            assert st["consecutive_failures"] == 3
            # 500 * 1.5^3 * 1.5 (TEMPORARY via the 503 tiebreak winner)
            assert st["dynamic_delay_ms"] == 2531

    def test_claim_order_polite_blocks(self, spark):
        now = self.NOW
        log = self._log(
            spark,
            [("bad.com", now - 100 + i, 500) for i in range(5)]
            + [("ok.com", now - 60_000, 200)],
        )
        states = frontier.domain_states(log, now)
        tasks = spark.createDataFrame(
            [
                ("https://bad.com/a", 5, now - 1),
                ("https://ok.com/b", 1, now - 1),
                ("https://new.com/c", 3, now - 1),
            ],
            "url string, priority int, ready_at long",
        )
        got = [r["url"] for r in frontier.claim_order_polite(tasks, states, now).collect()]
        # bad.com circuit-open -> excluded; priority order among the rest
        assert got == ["https://new.com/c", "https://ok.com/b"]

    def test_half_open_admits_single_probe(self, spark):
        now = self.NOW
        # old.com: 5 failures past the reset window -> HALF_OPEN
        log = self._log(
            spark, [("old.com", now - 400_000 + i, 500) for i in range(5)]
        )
        states = frontier.domain_states(log, now)
        tasks = spark.createDataFrame(
            [
                ("https://old.com/a", 9, now - 1),
                ("https://old.com/b", 5, now - 1),
                ("https://old.com/c", 1, now - 1),
            ],
            "url string, priority int, ready_at long",
        )
        got = [r["url"] for r in frontier.claim_order_polite(tasks, states, now).collect()]
        assert got == ["https://old.com/a"]  # one probe, highest priority

    def test_restrict_to_seed_domain(self, spark):
        urls = spark.createDataFrame(
            [
                ("https://seed.com/a",),
                ("https://Seed.com/b",),
                ("https://www.seed.com/c",),  # www. stripped (Crawler.cpp:856-858)
                ("https://sub.seed.com/d",),  # subdomain is NOT same-domain
                ("https://other.com/e",),
            ],
            "url string",
        )
        got = {r["url"] for r in frontier.restrict_to_seed_domain(urls, "WWW.Seed.COM").collect()}
        assert got == {
            "https://seed.com/a",
            "https://Seed.com/b",
            "https://www.seed.com/c",
        }
        # empty seed -> allow all (Crawler.cpp:843-846)
        assert frontier.restrict_to_seed_domain(urls, "").count() == 5


class TestCompat:
    def test_escape_redis_string(self, spark):
        from search_engine_core_spark.functions.compat import (
            escape_redis_string,
            escape_redis_string_py,
        )

        s = 'say "hi"\nnew\rline'
        df = spark.createDataFrame([(s,)], "s string")
        got = df.select(escape_redis_string("s").alias("e")).first()["e"]
        assert got == "say 'hi' new line" == escape_redis_string_py(s)

    def test_count_term_occurrences(self, spark):
        from search_engine_core_spark.functions.compat import (
            count_term_occurrences,
            count_term_occurrences_py,
        )

        s = "Spark sparkle spark; spark-sql SPARK"
        df = spark.createDataFrame([(s,)], "s string")
        got = df.select(count_term_occurrences("s", "Spark").alias("n")).first()["n"]
        assert got == 4 == count_term_occurrences_py(s, "spark")


class TestJsonScorer:
    def test_load_reload_fallback(self, tmp_path):
        from search_engine_core_spark.plans.scorer_config import JsonScorer

        p = tmp_path / "scoring.json"
        p.write_text(json.dumps({"field_weights": {"title": 3.0, "body": 0.5, "bad": "x"}, "offset_boost": 0.2}))
        s = JsonScorer(str(p))
        assert s.config.field_weights == {"title": 3.0, "body": 0.5}
        assert s.config.offset_boost == 0.2
        assert s.build_args() == ["SCORER", "TFIDF"]
        assert s.algorithm == "tfidf"

        # constructor fallback on garbage (Scorer.cpp:14-21)
        bad = tmp_path / "bad.json"
        bad.write_text("{nope")
        s2 = JsonScorer(str(bad))
        assert s2.config.field_weights == {"title": 2.0, "body": 1.0}
        assert s2.config.offset_boost == 0.1

        # reload raises (Scorer.cpp:23-25)
        with pytest.raises(Exception):
            s.reload(str(bad))

    def test_hot_reload_on_mtime_change(self, tmp_path):
        import os

        from search_engine_core_spark.plans.scorer_config import JsonScorer

        p = tmp_path / "scoring.json"
        p.write_text(json.dumps({"field_weights": {"title": 1.0}}))
        s = JsonScorer(str(p))
        assert s.hot_reload() is False
        p.write_text(json.dumps({"field_weights": {"title": 9.0}}))
        os.utime(p, (1, 1))
        assert s.hot_reload() is True
        assert s.config.field_weights["title"] == 9.0

    def test_bridge_to_scoring_config(self, tmp_path):
        from search_engine_core_spark.plans.scorer_config import JsonScorer

        p = tmp_path / "scoring.json"
        p.write_text(json.dumps({"field_weights": {"title": 7.0, "body": 2.0}}))
        cfg = JsonScorer(str(p)).to_scoring_config()
        assert cfg.title_w == 7.0 and cfg.content_w == 2.0
        assert cfg.description_w == 3.0  # untouched default
