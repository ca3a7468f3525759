"""Frontier maintenance operators: redirect-chain resolution,
conditional-GET (ETag / Last-Modified) recrawl decisions, and AIMD
adaptive per-host politeness budgets.

All three are standard production-crawler behaviors (RFC 9110 §15.4
redirection, §13.1 conditional requests; AIMD rate control per
Jacobson/Karels congestion-avoidance, the shape most large crawlers use
for per-host rate adaptation). The reference tree is empty (SURVEY.md
§0), so semantics are pinned by the DuckDB oracles in plans/queries.py
rather than reference file:line.

Scale notes are on each function; none of them ever shuffles page
bodies — they operate on narrow (url | host, small-ints) tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def resolve_redirects(
    frontier: DataFrame,
    redirects: DataFrame,
    max_hops: int = 3,
    url_col: str = "url",
) -> DataFrame:
    """Resolve HTTP 3xx redirect chains before frontier dedup.

    `redirects` is a narrow (src, dst) map harvested from fetch results
    (Location headers, already canonicalized). Following the chain BEFORE
    the URL-seen check is what keeps one target page from being fetched
    once per alias; crawlers that dedup on the *requested* URL refetch
    every mirror of a moved page.

    Returns frontier + (final_url, n_hops, resolved):
      - final_url: the chain endpoint after at most `max_hops` hops
      - n_hops:    hops actually taken (0 = not a redirect source)
      - resolved:  False iff the walk stopped at max_hops while the
                   endpoint is STILL a redirect source (loop or
                   over-long chain — production drops these as traps;
                   RFC 9110 §15.4 caps user-agent redirect following)

    Scale: each hop is one hash equi-join of the narrow frontier against
    the narrow redirect map on the current endpoint — `max_hops` joins
    total, unrolled into a single job (same bounded-iteration shape as
    graph_bfs_hops). The redirect map is usually ≪ frontier (only pages
    that 3xx'd) so AQE broadcasts it; no page content moves. A loop
    (a→b→a) never diverges: the walk is hop-bounded by construction.
    """
    r_src = redirects.select(
        F.col("src").alias("__r_src"), F.col("dst").alias("__r_dst")
    )
    out = frontier.select(
        "*",
        F.col(url_col).alias("final_url"),
        F.lit(0).cast("int").alias("n_hops"),
    )
    for _ in range(max_hops):
        out = (
            out.join(r_src, out["final_url"] == r_src["__r_src"], "left")
            .withColumn(
                "n_hops",
                F.when(F.col("__r_dst").isNotNull(), F.col("n_hops") + 1)
                .otherwise(F.col("n_hops")),
            )
            .withColumn("final_url", F.coalesce("__r_dst", "final_url"))
            .drop("__r_src", "__r_dst")
        )
    # unresolved = endpoint still redirects after max_hops
    out = (
        out.join(r_src, out["final_url"] == r_src["__r_src"], "left")
        .withColumn("resolved", F.col("__r_dst").isNull())
        .drop("__r_src", "__r_dst")
    )
    return out


def recrawl_decisions(
    inventory: DataFrame,
    now_ts: Column,
    ttl_secs: Column,
) -> DataFrame:
    """Conditional-GET recrawl planning (RFC 9110 §13.1 / §15.4.5).

    `inventory` carries one row per known page:
      (url, last_fetch_ts, etag_stored, etag_live) — etag_live is what a
      revalidation WOULD return (in production it arrives from the 304 /
      200 response; in tests it is synthesized deterministically).

    Decision ladder, exactly the ladder a polite crawler runs:
      age < ttl                  -> 'fresh'   (no request at all)
      age >= ttl, etag unchanged -> 'not_modified' (If-None-Match hit,
                                    304 — costs a request, no body)
      age >= ttl, etag changed   -> 'refetch' (full 200 + reparse)

    Returns inventory + (age_secs, decision). Pure map-side column
    arithmetic — zero shuffles; the downstream schedule only admits
    'refetch'/'not_modified' rows, so TTL freshness prunes the fetch
    set BEFORE politeness budgeting spends quota on it.
    """
    age = (now_ts.cast("long") - F.col("last_fetch_ts").cast("long")).alias(
        "age_secs"
    )
    decision = (
        F.when(F.col("age_secs") < ttl_secs, F.lit("fresh"))
        .when(F.col("etag_stored") == F.col("etag_live"), F.lit("not_modified"))
        .otherwise(F.lit("refetch"))
    )
    return inventory.withColumn("age_secs", age).withColumn(
        "decision", decision
    )


def adaptive_budget_round(
    budgets: DataFrame,
    round_stats: DataFrame,
    *,
    min_budget: int = 1,
    max_budget: int = 500,
    additive_step: int = 5,
    err_threshold_pct: int = 10,
) -> DataFrame:
    """One AIMD step of per-host politeness budgets.

    budgets:     (host, budget int)
    round_stats: (host, n_fetched int, n_errors int) for the round just
                 finished; hosts with no traffic this round keep their
                 budget unchanged.

    Multiplicative decrease on pain, additive increase on health — the
    TCP congestion-avoidance shape, which is what per-host crawl-rate
    controllers converge to in practice (overloaded hosts emit 429/5xx;
    halving backs off fast, +step probes back up slowly):

      err_rate >= threshold -> budget = max(min_budget, budget div 2)
      else                  -> budget = min(max_budget, budget + step)

    All-integer arithmetic (div, not /) so repeated application is exact
    and engine-independent — the oracle unrolls the same ladder.

    Scale: one hash join on host between two narrow tables, then
    map-side CASE arithmetic. round_stats is per-host aggregated
    upstream (map-side partial agg), so this is ≪ frontier-sized.
    """
    st = round_stats.select(
        F.col("host").alias("__s_host"), "n_fetched", "n_errors"
    )
    joined = budgets.join(st, budgets["host"] == st["__s_host"], "left")
    hot = (F.col("n_errors") * 100) >= (F.col("n_fetched") * err_threshold_pct)
    new_budget = (
        F.when(F.col("__s_host").isNull(), F.col("budget"))
        .when(
            hot,
            F.greatest(F.lit(min_budget), F.expr("budget div 2").cast("int")),
        )
        .otherwise(
            F.least(F.lit(max_budget), F.col("budget") + additive_step)
        )
    )
    return joined.select(
        "host", new_budget.cast("int").alias("budget")
    )
