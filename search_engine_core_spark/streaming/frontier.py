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

from pyspark.sql import DataFrame, Observation, Window
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
    max_duration_s: float | None = None,
) -> DataFrame:
    """Iterative BFS: (url, depth) reachability with visited-set anti-join
    per wave (T1/T2). ``edges``: (src, dst); ``seeds``: (url).

    Driver loop over depth only (bounded, <= max_depth iterations); each
    wave is fully distributed. localCheckpoint truncates the growing
    lineage (same role as the reference persisting frontier state to
    Mongo per wave, Crawler.cpp:62-78). ``max_duration_s`` is the T7
    session-duration stop condition (``CrawlConfig.h:35``
    maxSessionDuration — the reference kills a crawl session outliving
    its budget): the wave loop stops expanding once the wall-clock budget
    is spent; waves already computed are kept.
    """
    import time as _time

    t0 = _time.monotonic()
    # each wave's count rides an Observation on its own eager checkpoint
    # (zero extra jobs); the visited tally is tracked incrementally —
    # never a count job over the growing visited set
    obs0 = Observation()
    visited = (
        seeds.select(F.col("url"), F.lit(0).alias("depth"))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .localCheckpoint()
    )
    n_visited = obs0.get["n"]
    frontier = visited
    for depth in range(1, max_depth + 1):
        if max_pages is not None and n_visited >= max_pages:
            break  # T8 stop condition
        if max_duration_s is not None and _time.monotonic() - t0 >= max_duration_s:
            break  # T7 session-duration stop condition
        obs = Observation()
        nxt = (
            frontier.join(edges, frontier.url == edges.src)
            .select(F.col("dst").alias("url"))
            .distinct()
            .join(visited.select("url"), "url", "left_anti")
            .withColumn("depth", F.lit(depth))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint()
        )
        n_new = obs.get["n"]
        if n_new == 0:
            break
        n_visited += n_new
        # union of per-wave CHECKPOINTED frames: lineage stays <= max_depth
        # unions deep, and the old re-checkpoint of the whole visited set
        # (an O(|visited|) rewrite job EVERY wave) is gone
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def reap_expired_sessions(
    sessions: DataFrame, now_ms: int, max_duration_ms: int = 600_000
) -> DataFrame:
    """T7 session lifecycle: the reference runs one worker thread per
    crawl session and a cleanup thread that reaps sessions alive past
    ``maxSessionDuration`` (10 min default —
    ``src/crawler/CrawlerManager.cpp:44-76,316-330``,
    ``CrawlConfig.h:35``). The Spark twin is a pure column expression
    over the sessions table: ``running`` rows whose ``started_at_ms`` is
    older than the cap flip to ``expired``; terminal rows pass through
    untouched. Stateless and distributed — at 100 TB the "cleanup
    thread" is just this projection applied on whatever cadence the
    maintenance job runs."""
    overdue = (F.col("status") == "running") & (
        F.lit(now_ms) - F.col("started_at_ms") > F.lit(max_duration_ms)
    )
    return sessions.withColumn(
        "status", F.when(overdue, F.lit("expired")).otherwise(F.col("status"))
    )


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


def restrict_to_seed_domain(urls: DataFrame, seed_domain: str, url_col: str = "url") -> DataFrame:
    """P7 — keep only URLs on the crawl's seed domain
    (``Crawler::isSameDomain``, ``src/crawler/Crawler.cpp:842-872``:
    lowercase both sides, strip a leading ``www.``, compare equal; the
    first seed pins ``seedDomain``, ``Crawler.cpp:138-141``). A pushed-down
    string predicate — Catalyst evaluates it at the scan. Empty seed
    allows all (reference line 843-846)."""
    if not seed_domain:
        return urls
    from search_engine_core_spark.streaming.robots import domain_of

    norm = F.regexp_replace(F.lower(domain_of(url_col)), r"^www\.", "")
    seed = seed_domain.lower()
    seed = seed[4:] if seed.startswith("www.") else seed
    return urls.filter(norm == seed)


def domain_states(
    log: DataFrame,
    now_ms: int,
    politeness_ms: int = 500,
    failure_threshold: int = 5,
    reset_ms: int = 300_000,
    rate_limit_ms: int = 60_000,
) -> DataFrame:
    """T4/T5 — per-domain health from a fetch log (domain, ts, status):
    circuit-breaker state, rate-limit window, dynamic politeness delay —
    the dataflow twin of ``DomainManager`` (``src/crawler/DomainManager.cpp``),
    whose mutable per-domain struct becomes one windowed aggregation.

    Replicated semantics (defaults = ``CrawlConfig.h:11,50-52``):
    * consecutive failures = failures since the last success; success
      resets the count (``recordSuccess``/``recordFailure``,
      DomainManager.cpp:88-145);
    * circuit OPEN when consecutive >= threshold and the reset window has
      not elapsed since the failure that crossed it; HALF_OPEN after the
      window (one probe allowed) (``updateCircuitBreakerState``,
      DomainManager.cpp:213-238);
    * rate limited until last-429 + rate_limit_ms (``recordRateLimit``,
      DomainManager.cpp:147-173 — expiry is purely time-based, a later
      success does NOT clear it, quirk preserved);
    * dynamic delay = politeness * 1.5^min(consecutive,10), doubled again
      when the latest failure was a 429, x1.5 when temporary, capped at
      5 min (``calculateDynamicDelay``, DomainManager.cpp:240-260); a
      healthy domain (no failures since success) sits at the base delay —
      the reference's 0.8x decay-per-success converges there, batch
      dataflow jumps straight to the fixpoint.

    One shuffle keyed by domain; output is one row per domain, tiny and
    broadcastable into :func:`claim_order_polite`.
    """
    w = Window.partitionBy("domain")
    ok = (F.col("status") >= 200) & (F.col("status") < 300)
    fail_ts = F.when(~ok, F.col("ts"))
    last_success = F.max(F.when(ok, F.col("ts"))).over(w)
    after_success = F.col("_fail_ts").isNotNull() & (
        F.col("_last_success").isNull() | (F.col("_fail_ts") > F.col("_last_success"))
    )
    enriched = (
        log.withColumn("_fail_ts", fail_ts)
        .withColumn("_last_success", last_success)
        .withColumn("_consec_fail", F.when(after_success, F.col("_fail_ts")))
    )
    # nulls LAST: rows that are not post-success failures (_consec_fail
    # null — successes and pre-success failures) must not occupy ranks
    # 1..threshold, or a domain with any prior successes never crosses
    # the threshold (r2 driver bug: q40 hash mismatch)
    wf = Window.partitionBy("domain").orderBy(F.asc_nulls_last("_consec_fail"))
    # rank the post-success failures by time: the threshold-th one is the
    # moment the circuit opened
    enriched = enriched.withColumn(
        "_fail_rank", F.when(F.col("_consec_fail").isNotNull(), F.row_number().over(wf))
    )
    agg = enriched.groupBy("domain").agg(
        F.count(F.lit(1)).alias("total_requests"),
        F.sum(ok.cast("long")).alias("successful_requests"),
        F.sum(F.col("_consec_fail").isNotNull().cast("long")).alias("consecutive_failures"),
        F.max(F.when(F.col("_fail_rank") == failure_threshold, F.col("_consec_fail"))).alias(
            "circuit_opened_at"
        ),
        F.max("ts").alias("last_request"),
        F.max(F.when(F.col("status") == RATE_LIMITED_HTTP, F.col("ts"))).alias("last_429"),
        # deterministic tiebreak when two failures share the max ts: order by
        # (ts, status) via a scalar composite key (status < 1000, so
        # ts*1000+status is lexicographic). Without it max_by is
        # engine/partition-order dependent on duplicate-(domain, ts) logs,
        # which flips the 2.0x/1.5x delay multiplier (r3 driver q40 red).
        F.max_by(
            F.col("status"), F.when(~ok, F.col("ts") * 1000 + F.col("status"))
        ).alias("_last_fail_status"),
    )
    open_ = F.col("circuit_opened_at").isNotNull() & (
        F.lit(now_ms) < F.col("circuit_opened_at") + reset_ms
    )
    half_open = F.col("circuit_opened_at").isNotNull() & ~open_
    last_cls = classify_failure(F.col("_last_fail_status"))
    mult = F.pow(F.lit(1.5), F.least(F.col("consecutive_failures"), F.lit(10))) * (
        F.when(last_cls == "RATE_LIMITED", 2.0)
        .when(last_cls == "TEMPORARY", 1.5)
        .otherwise(1.0)
    )
    delay = F.when(
        F.col("consecutive_failures") > 0,
        F.least(F.lit(float(politeness_ms)) * mult, F.lit(300_000.0)),
    ).otherwise(F.lit(float(politeness_ms)))
    return agg.select(
        "domain",
        "total_requests",
        "successful_requests",
        "consecutive_failures",
        F.when(open_, "OPEN").when(half_open, "HALF_OPEN").otherwise("CLOSED").alias(
            "circuit_state"
        ),
        "circuit_opened_at",
        "last_request",
        (F.col("last_429").isNotNull() & (F.lit(now_ms) < F.col("last_429") + rate_limit_ms)).alias(
            "rate_limited"
        ),
        delay.cast("long").alias("dynamic_delay_ms"),
    )


def claim_order_polite(
    tasks: DataFrame,
    states: DataFrame,
    now_ms: int,
    batch_size: int | None = None,
) -> DataFrame:
    """O5 + T4/T5 combined: the priority claim order, minus tasks whose
    domain must wait — circuit OPEN, rate-limited, or inside its dynamic
    crawl delay (``DomainManager::shouldDelay``, DomainManager.cpp:12-47;
    the reference's frontier skips those URLs this cycle). A HALF_OPEN
    domain admits exactly ONE probe task (the highest-priority ready one)
    — success closes the circuit on the next :func:`domain_states` pass,
    failure re-opens it (DomainManager.cpp:226-237). ``states`` is
    :func:`domain_states` output — broadcast, no shuffle on the task side
    for healthy domains; only the (tiny) half-open subset pays a window."""
    from search_engine_core_spark.streaming.robots import domain_of

    blocked = (
        (F.col("circuit_state") == "OPEN")
        | F.col("rate_limited")
        | (F.lit(now_ms) < F.col("last_request") + F.col("dynamic_delay_ms"))
    )
    st = F.broadcast(
        states.withColumn("_blocked", blocked).select(
            F.col("domain").alias("_dom"), "_blocked", "circuit_state"
        )
    )
    t = tasks.withColumn("_dom", domain_of("url")).join(st, "_dom", "left")
    ready = t.filter(~F.coalesce(F.col("_blocked"), F.lit(False)))
    half = ready.filter(F.col("circuit_state") == "HALF_OPEN")
    rest = ready.filter(
        F.col("circuit_state").isNull() | (F.col("circuit_state") != "HALF_OPEN")
    )
    probe_w = Window.partitionBy("_dom").orderBy(
        F.desc("priority"), F.asc("ready_at"), F.asc("url")
    )
    probes = (
        half.filter(F.col("ready_at") <= now_ms)
        .withColumn("_rn", F.row_number().over(probe_w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    out = rest.unionByName(probes).drop("_dom", "_blocked", "circuit_state")
    return claim_order(out, now_ms, batch_size)


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
