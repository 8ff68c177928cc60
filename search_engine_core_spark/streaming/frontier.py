"""Crawl-frontier dataflow as batch-iterative DataFrame ops (T1-T8).

The reference's URLFrontier is a priority queue + visited set + retry
scheduler (``src/crawler/URLFrontier.cpp:47-224``). On Spark the frontier
is a per-depth BFS over a link graph: each wave anti-joins new URLs
against the visited set (T2/J4/J5), applies per-domain politeness caps and
priority (O5), and mirrors its state to a checkpoint table (T6) — the
same table schema as the Mongo ``frontier_tasks`` collection
(``include/search_engine/storage/MongoDBStorage.h:97-117``).

Also: failure classification + exponential backoff (T3/F22,
``src/crawler/FailureClassifier.cpp:6-136``) as column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# FailureClassifier.cpp permanent/temporary code sets (CrawlConfig.h:37-48)
PERMANENT_HTTP = [400, 401, 403, 404, 405, 406, 410, 414, 451]
RATE_LIMITED_HTTP = 429


def classify_failure(status: F.Column) -> F.Column:
    """FailureClassifier::classify — PERMANENT / RATE_LIMITED / TEMPORARY
    by HTTP status (success for 2xx, P5 ``Crawler.cpp:638-643``)."""
    return (
        F.when((status >= 200) & (status < 300), F.lit("SUCCESS"))
        .when(status == RATE_LIMITED_HTTP, F.lit("RATE_LIMITED"))
        .when(status.isin(PERMANENT_HTTP), F.lit("PERMANENT"))
        .otherwise(F.lit("TEMPORARY"))
    )


def backoff_delay_ms(
    retry: F.Column,
    base_ms: float = 1000.0,
    multiplier: float = 2.0,
    cap_ms: float = 60_000.0,
    rate_limited: F.Column | None = None,
) -> F.Column:
    """F22: base * multiplier^(retry-1), capped; rate-limit uses a 60 s
    base (FailureClassifier.cpp:111-136)."""
    base = (
        F.when(rate_limited, F.lit(60_000.0)).otherwise(F.lit(base_ms))
        if rate_limited is not None
        else F.lit(base_ms)
    )
    return F.least(base * F.pow(F.lit(multiplier), retry - 1), F.lit(cap_ms))


def normalize_url(url: F.Column) -> F.Column:
    """F17 (URLFrontier.cpp:398-432): lowercase, strip #fragment, strip
    trailing slash except root."""
    u = F.lower(F.trim(url))
    u = F.regexp_replace(u, r"#.*$", "")
    # keep the slash only when it's the root path (scheme://host/)
    keep = u.rlike(r"^https?://[^/]+/$") | ~u.endswith("/")
    return F.when(keep, u).otherwise(F.substring(u, F.lit(1), F.length(u) - 1))


def bfs_frontier(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    max_pages: int | None = None,
) -> DataFrame:
    """Iterative BFS: (url, depth) reachability with visited-set anti-join
    per wave (T1/T2). ``edges``: (src, dst); ``seeds``: (url).

    Driver loop over depth only (bounded, <= max_depth iterations); each
    wave is fully distributed. localCheckpoint truncates the growing
    lineage (same role as the reference persisting frontier state to
    Mongo per wave, Crawler.cpp:62-78).
    """
    visited = seeds.select(F.col("url"), F.lit(0).alias("depth")).distinct().localCheckpoint()
    # track the visited tally incrementally off each wave's own count —
    # no extra per-depth count job over the growing visited set
    n_visited = visited.count()
    frontier = visited
    for depth in range(1, max_depth + 1):
        if max_pages is not None and n_visited >= max_pages:
            break  # T8 stop condition
        nxt = (
            frontier.join(edges, frontier.url == edges.src)
            .select(F.col("dst").alias("url"))
            .distinct()
            .join(visited.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(depth))
        )
        nxt = nxt.localCheckpoint()
        n_new = nxt.count()
        if n_new == 0:
            break
        n_visited += n_new
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def politeness_last_hit(log: DataFrame) -> DataFrame:
    """W3 (URLFrontier.cpp:298-320): last crawl time per domain."""
    return log.groupBy("domain").agg(F.max("ts").alias("last_hit"))


def schedule_retries(results: DataFrame, now_ms: int) -> DataFrame:
    """T3/F22: turn fetch results (url, status, retry) into re-queued tasks
    with ``ready_at`` = now + exponential backoff (rate-limited gets the
    60 s base), mirroring ``URLFrontier::markFailed`` + FailureClassifier:
    SUCCESS and PERMANENT never re-queue; TEMPORARY/RATE_LIMITED do."""
    cls = classify_failure(F.col("status"))
    retry = F.col("retry") + 1
    delay = backoff_delay_ms(retry, rate_limited=cls == "RATE_LIMITED")
    return (
        results.withColumn("_cls", cls)
        .filter(F.col("_cls").isin("TEMPORARY", "RATE_LIMITED"))
        .select(
            "url",
            retry.alias("retry"),
            (F.lit(now_ms) + delay).cast("long").alias("ready_at"),
        )
    )


def claim_order(tasks: DataFrame, now_ms: int, batch_size: int | None = None) -> DataFrame:
    """O5 priority frontier: the claim ordering of ``URLFrontier`` /
    Mongo ``frontier_tasks`` (priority DESC, readyAt ASC —
    ``src/storage/MongoDBStorage.cpp:591-593``, ``URLFrontier.cpp:65-80``),
    restricted to tasks whose ``ready_at`` has passed; url breaks ties
    deterministically (the reference's cursor order is storage-defined).

    At scale this is one TakeOrderedAndProject over the pending set — no
    global sort materializes when ``batch_size`` bounds the claim."""
    ready = tasks.filter(F.col("ready_at") <= now_ms)
    out = ready.orderBy(F.desc("priority"), F.asc("ready_at"), F.asc("url"))
    return out.limit(batch_size) if batch_size is not None else out
