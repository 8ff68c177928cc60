"""Property tests for the robots.txt predicate (P8) against a pure-Python
twin of the documented reference semantics (RobotsTxtParser.cpp:15-254):
group binding with OVERWRITING user-agent headers, allow-first precedence,
specific-agent no-fallback, glob rewrites, crawl-delay float seconds.

Round-2 goldens covered the happy paths; these drive randomized bodies
through parse_robots + is_allowed + crawl_delay_ms and demand agreement
with the twin on every (body, path, agent) combination. The generation
alphabet excludes regex metacharacters the reference passes through
unescaped (quirk preserved in robots.py) — with them, BOTH engines throw
pattern errors and there is no defined behavior to agree on.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_core_spark.streaming.robots import (
    crawl_delay_ms,
    is_allowed,
    parse_robots,
)

AGENTS = ["*", "googlebot", "mybot"]
SEG = st.text(alphabet="abcz019-_", min_size=0, max_size=5)


def _pattern(draw):
    parts = draw(st.lists(st.sampled_from(["/", "*", "?", ".", "$"]) | SEG, max_size=6))
    return "".join(parts)


line_st = st.one_of(
    st.builds(lambda a: f"User-Agent: {a}", st.sampled_from(AGENTS)),
    st.composite(lambda draw: f"Disallow: {_pattern(draw)}")(),
    st.composite(lambda draw: f"Allow: {_pattern(draw)}")(),
    # delay values restricted to exactly float32-representable literals:
    # Spark casts the pattern to FLOAT (32-bit) while the twin parses
    # float64, and a value like 0.3 truncates to 299 ms in one width and
    # 300 in the other — a cast-width artifact, not a semantics question
    st.builds(
        lambda d: f"Crawl-Delay: {d}",
        st.sampled_from([0, 1, 2, 5, 9, "1.5", "0.5", "2.25", "oops"]),
    ),
    st.just("# comment"),
    st.just(""),
    st.just("unknown: directive"),
)

body_st = st.lists(line_st, min_size=0, max_size=10).map("\n".join)
path_st = st.composite(
    lambda draw: "/" + "/".join(draw(st.lists(SEG, min_size=0, max_size=3)))
)()


# ---- pure-Python twin ----------------------------------------------------

def parse_robots_py(content: str) -> list[tuple[str, str, str]]:
    """(user_agent, directive, pattern) rows, reference line semantics."""
    rules = []
    cur = "*"
    for line in content.split("\n"):
        line = line.replace("\r", "").strip(" ").lower()
        if not line or line.startswith("#"):
            continue
        if line.startswith("user-agent:"):
            cur = line[11:].strip(" ")
            continue
        m = re.match(r"^(disallow|allow|crawl-delay):", line)
        if not m:
            continue
        d = m.group(1)
        rules.append((cur, d, line[len(d) + 1 :].strip(" ")))
    return rules


def _hit(pattern: str, path: str) -> bool:
    if pattern == "":
        return False
    rx = "^" + pattern.replace("*", ".*").replace("?", ".")
    return re.search(rx, path) is not None


def is_allowed_py(rules, path: str, agent: str = "*") -> bool:
    agent = agent.lower()
    specific = [(d, p) for ua, d, p in rules if ua == agent and d in ("allow", "disallow")]
    default = [(d, p) for ua, d, p in rules if ua == "*" and d in ("allow", "disallow")]
    has_specific = any(ua == agent for ua, d, p in rules if d in ("allow", "disallow"))
    group = specific if has_specific else default
    if any(d == "allow" and _hit(p, path) for d, p in group):
        return True
    return not any(d == "disallow" and _hit(p, path) for d, p in group)


def crawl_delay_py(rules, agent: str = "*", default_ms: int = 1000):
    """Returns delay ms or None when the domain has no parsed rules."""
    if not rules:
        return None

    def _ms(p):
        try:
            return int(float(p) * 1000)
        except ValueError:
            return None

    agent = agent.lower()
    s = [_ms(p) for ua, d, p in rules if ua == agent and d == "crawl-delay"]
    d_ = [_ms(p) for ua, d, p in rules if ua == "*" and d == "crawl-delay"]
    has_specific = any(ua == agent for ua, _, _ in rules)
    vals = s if has_specific else d_
    vals = [v for v in vals if v is not None]
    return max(vals) if vals else default_ms


# ---- properties ----------------------------------------------------------

@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    bodies=st.lists(body_st, min_size=1, max_size=4),
    paths=st.lists(path_st, min_size=1, max_size=4),
    agent=st.sampled_from(AGENTS),
)
def test_is_allowed_matches_python_twin(spark, bodies, paths, agent):
    domains = [f"d{i}.com" for i in range(len(bodies))]
    raw = spark.createDataFrame(
        list(zip(domains, bodies)), "domain string, content string"
    )
    rules = parse_robots(raw)
    urls = spark.createDataFrame(
        [(f"https://{d}{p}",) for d in domains for p in paths], "url string"
    )
    got = {
        r["url"]: r["allowed"]
        for r in is_allowed(urls, rules, user_agent=agent).collect()
    }
    for d, body in zip(domains, bodies):
        py_rules = parse_robots_py(body)
        for p in paths:
            want = is_allowed_py(py_rules, p, agent)
            assert got[f"https://{d}{p}"] == want, (d, body, p, agent)


@settings(max_examples=12, deadline=None, derandomize=True)
@given(bodies=st.lists(body_st, min_size=1, max_size=4), agent=st.sampled_from(AGENTS))
def test_crawl_delay_matches_python_twin(spark, bodies, agent):
    domains = [f"d{i}.com" for i in range(len(bodies))]
    raw = spark.createDataFrame(
        list(zip(domains, bodies)), "domain string, content string"
    )
    got = {
        r["domain"]: r["crawl_delay_ms"]
        for r in crawl_delay_ms(parse_robots(raw), user_agent=agent).collect()
    }
    for d, body in zip(domains, bodies):
        want = crawl_delay_py(parse_robots_py(body), agent)
        assert got.get(d) == want, (d, body, agent)
