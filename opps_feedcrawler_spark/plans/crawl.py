"""The crawl-round driver — the engine's flagship dataflow (SURVEY.md §3.1).

What the reference does serially per feed (Celery beat → processor →
feedparser fetch+parse → per-entry SELECT-dedup → ORM INSERT → update
last_polled_time; behavior-level [PK], SURVEY.md §3.1) becomes one
declarative DataFrame round:

  frontier → [seen anti-join] → [robots filter] → [salted politeness top-k]
           → [fetch = join pages corpus] → [pandas-UDF extract text/links/
             entries] → new frontier candidates → snapshot commit

Round semantics (pinned; the single-threaded oracle in
tests/oracle_crawler.py implements the SAME rules so scheduled order, the
URL-seen set and extracted text match exactly — BASELINE.json:6,14):

 R1  candidates = whole frontier (already canonical, not in seen)
 R2  robots verdict: disallowed rows leave the frontier AND enter `seen`
     (processed-but-not-fetched) so links cannot resurrect them
 R3  per-host budget = budget_for_delay(crawl_delay)
 R4  scheduled = per-host top-budget by (priority DESC, url_norm ASC);
     global order seq by the same key
 R5  seen += scheduled ∪ disallowed
 R6  fetch = left join against the pages corpus on url_norm
     (sandbox has no network — SURVEY.md A11; a real deploy swaps this
     single stage for a mapInPandas HTTP fetcher with per-partition
     connection pools, nothing else changes)
 R7  extract: text (A13), links (A14), entries (A12+A15)
 R8  new candidates = canonicalize(links), depth=parent+1, dedup by
     url_norm keeping MIN depth, anti-join seen
 R9  frontier' = (frontier - scheduled - disallowed) ∪ new candidates,
     dedup by url_norm keeping MIN depth
 R10 commit snapshot(round): frontier', seen, schedule, fetch_log, text,
     entries + metrics (A16-A18)

Determinism: every ordering carries the (priority DESC, url_norm ASC)
total-order key; depth ties collapse to one canonical row via min(depth);
all UDFs are pure; no wall clock in the data path. Hence a resume from
snapshot k replays rounds k+1..K bit-for-bit (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.extract import (
    extract_entries_udf,
    extract_links_udf,
    extract_text_udf,
)
from ..functions.urlnorm import NSALTS, with_url_cols
from ..operators.politeness import (
    BUDGET_BASE,
    MAX_BUDGET,
    priority_col,
    schedule_budgeted,
    with_global_sequence,
)
from ..operators.robots import with_robots
from ..operators.seen import build_seen_bloom, filter_new_urls
from .checkpoint import SnapshotLog

MAX_ENTRIES_PER_PAGE = 100  # the reference caps entries per feed [PK]

FRONTIER_COLS = ["url_norm", "host", "url_hash", "salt", "depth", "priority"]


def prepare_pages(pages: DataFrame) -> DataFrame:
    """Canonicalize the corpus url once; pre-repartition by url_hash so the
    per-round fetch join reuses one stable partitioning. Column-prune to
    exactly what fetch needs (html is the wide column — keep it last)."""
    return (
        with_url_cols(pages, "url")
        .select("url_norm", "html")
        .dropDuplicates(["url_norm"])
        .repartition("url_norm")
    )


def seeds_to_frontier(seeds: DataFrame) -> DataFrame:
    f = with_url_cols(seeds, "url").select("url_norm", "host", "url_hash", "salt")
    return (
        f.dropDuplicates(["url_norm"])
        .withColumn("depth", F.lit(0))
        .withColumn("priority", priority_col())
        .select(*FRONTIER_COLS)
    )


def _links_to_candidates(fetched: DataFrame) -> DataFrame:
    """R8: explode links, canonicalize, min-depth dedup."""
    links = (
        fetched.filter(F.col("html").isNotNull())
        .select(
            F.explode(extract_links_udf("html", "url_norm")).alias("url"),
            (F.col("depth") + 1).alias("depth"),
        )
    )
    cand = with_url_cols(links, "url").select(
        "url_norm", "host", "url_hash", "salt", "depth"
    )
    return (
        cand.groupBy("url_norm")
        .agg(
            F.first("host").alias("host"),
            F.first("url_hash").alias("url_hash"),
            F.first("salt").alias("salt"),
            F.min("depth").alias("depth"),
        )
        .withColumn("priority", priority_col())
        .select(*FRONTIER_COLS)
    )


def crawl_round(
    spark: SparkSession,
    frontier: DataFrame,
    seen: DataFrame,
    pages_prepared: DataFrame,
    robots: DataFrame,
    round_no: int,
    use_bloom: bool = True,
) -> dict:
    """Run one round; returns dict of result DataFrames (lazy)."""
    # R2 robots
    fr = with_robots(frontier, robots)
    disallowed = fr.filter(~F.col("allowed")).select("url_norm", "url_hash")
    allowed = fr.filter(F.col("allowed"))

    # R3-R4 politeness + global order
    budget = F.greatest(
        F.lit(1),
        F.least(
            F.lit(MAX_BUDGET),
            F.floor(F.lit(BUDGET_BASE) / F.col("crawl_delay")),
        ),
    ).cast("int")
    allowed = allowed.withColumn("budget", budget)
    scheduled = schedule_budgeted(allowed).drop("budget", "allowed", "crawl_delay")
    schedule = with_global_sequence(scheduled, round_no).select(
        "round", "seq", "url_norm", "host", "priority", "depth"
    )

    # R6 fetch
    fetched = scheduled.join(pages_prepared, "url_norm", "left")
    fetch_log = fetched.select(
        F.lit(round_no).alias("round"),
        "url_norm",
        "host",
        F.when(F.col("html").isNotNull(), 200).otherwise(404).alias("status"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("bytes"),
    )

    # R7 extraction (Arrow UDFs — the only Python in the path)
    hits = fetched.filter(F.col("html").isNotNull())
    text = hits.select(
        F.col("url_norm").alias("url"), extract_text_udf("html").alias("text")
    )
    entries = (
        hits.select(
            F.col("url_norm").alias("page_url"),
            F.posexplode(extract_entries_udf("html")).alias("pos", "e"),
        )
        .filter(F.col("pos") < MAX_ENTRIES_PER_PAGE)
        .select(
            "page_url",
            F.coalesce(F.col("e.entry_guid"), F.col("e.link")).alias("entry_guid"),
            F.trim(F.col("e.title")).alias("title"),
            F.col("e.link").alias("link"),
            F.col("e.published_ts").alias("published_ts"),
            F.trim(F.col("e.summary")).alias("summary"),
        )
        .dropDuplicates(["page_url", "entry_guid"])
    )

    # R5 seen'
    new_seen = (
        seen.select("url_norm", "url_hash")
        .unionByName(scheduled.select("url_norm", "url_hash"))
        .unionByName(disallowed)
    )

    # R8-R9 frontier'
    bloom = build_seen_bloom(new_seen) if use_bloom else None
    candidates = _links_to_candidates(fetched)
    fresh = filter_new_urls(candidates, new_seen, bloom)
    remainder = frontier.join(
        scheduled.select("url_norm"), "url_norm", "left_anti"
    ).join(disallowed.select("url_norm"), "url_norm", "left_anti")
    new_frontier = (
        remainder.select(*FRONTIER_COLS)
        .unionByName(fresh.select(*FRONTIER_COLS))
        .groupBy("url_norm")
        .agg(
            F.first("host").alias("host"),
            F.first("url_hash").alias("url_hash"),
            F.first("salt").alias("salt"),
            F.min("depth").alias("depth"),
        )
        .withColumn("priority", priority_col())
        .select(*FRONTIER_COLS)
    )
    return {
        "frontier": new_frontier,
        "seen": new_seen,
        "schedule": schedule,
        "fetch_log": fetch_log,
        "text": text,
        "entries": entries,
    }


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    robots: DataFrame,
    warehouse: str,
    rounds: int,
    use_bloom: bool = True,
    start_round: int | None = None,
) -> SnapshotLog:
    """Run (or resume) the crawl for `rounds` total rounds, one snapshot per
    round. Resume (A17): pass the same warehouse — the loop continues after
    the latest committed snapshot and reproduces exactly what an
    uninterrupted run would have (tested in tests/test_resume.py)."""
    log = SnapshotLog(warehouse)
    pages_prepared = prepare_pages(pages).persist()
    last = log.latest_snapshot_id()
    if start_round is not None:
        first = start_round
    else:
        first = (last + 1) if last is not None else 0
    if first == 0:
        frontier = seeds_to_frontier(seeds)
        seen = spark.createDataFrame([], "url_norm string, url_hash long")
    else:
        frontier = log.load_table(spark, first - 1, "frontier")
        seen = log.load_table(spark, first - 1, "seen")

    for round_no in range(first, rounds):
        out = crawl_round(
            spark, frontier, seen, pages_prepared, robots, round_no, use_bloom
        )
        manifests = {
            name: log.write_table(out[name], round_no, name)
            for name in ("frontier", "seen", "schedule", "fetch_log", "text", "entries")
        }
        # A18 per-round metrics from the just-written parquet (exact, cheap).
        m = {}
        for name in ("schedule", "fetch_log", "text", "entries", "frontier", "seen"):
            m[f"{name}_rows"] = spark.read.parquet(manifests[name]["path"]).count()
        ok = (
            spark.read.parquet(manifests["fetch_log"]["path"])
            .filter(F.col("status") == 200)
            .count()
        )
        m["fetched_ok"] = ok
        log.commit(round_no, manifests, m)
        # Next round reads from the committed snapshot (the materialization
        # barrier that makes every round a pure function of the previous
        # snapshot — no recomputation drift, no lineage blowup).
        frontier = log.load_table(spark, round_no, "frontier")
        seen = log.load_table(spark, round_no, "seen")
        if frontier.limit(1).count() == 0:
            break
    pages_prepared.unpersist()
    return log
