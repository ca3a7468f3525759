"""Physical-plan assertions — the 100 TB hygiene checks (SURVEY.md §4):
filters reach the parquet scan, column pruning holds, small dims broadcast,
the relational pack stays inside whole-stage codegen, and the crawl's fetch
join never scans html for metadata-only outputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from opps_feedcrawler_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    # ReadSchema must NOT include unused wide columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_comment" not in read and "l_partkey" not in read
    assert "l_quantity" in read


def test_broadcast_join_strategy(spark):
    plan = _plan(QUERIES["broadcast_dim_join"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastHashJoin") >= 2  # both dims broadcast


def test_partial_aggregation_map_side(spark):
    """The shuffle must carry pre-aggregated partials, not raw rows —
    at 100 TB this is the difference between shuffling GBs and TBs."""
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF_DIR))
    assert "partial_sum" in plan and "partial_count" in plan
    # exactly one exchange (partial → final), nothing extra
    assert plan.count("+- Exchange") == 1


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in _plan(QUERIES["semi_join_active_customers"](spark, SF_DIR))
    assert "LeftAnti" in _plan(QUERIES["anti_join_idle_customers"](spark, SF_DIR))


def test_fetch_join_prunes_html_for_metadata_outputs(spark):
    """fetch_log derives from the persisted enriched round table; the
    schedule table itself must never read pages.html."""
    from opps_feedcrawler_spark.plans.crawl import (
        crawl_round,
        prepare_pages,
        seeds_to_frontier,
    )
    from opps_feedcrawler_spark.sources.synth import pages_from_documents

    pages = pages_from_documents(spark, SF_DIR)
    pp = prepare_pages(pages)
    seeds = pages.select("url").orderBy("url").limit(50)
    robots = spark.createDataFrame(
        [],
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    frontier = seeds_to_frontier(seeds)
    seen = spark.createDataFrame([], "url_norm string, url_hash long")
    out = crawl_round(spark, frontier, seen, None, pp, robots, 0)
    sched_plan = _plan(out["schedule"])
    assert "html" not in sched_plan  # politeness/ordering never touches html
    out["cleanup"]()
