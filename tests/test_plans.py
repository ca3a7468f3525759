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


def test_prepare_pages_dedups_by_content_hash(spark):
    """Duplicate url_norms (canonical + messy aliases) collapse to ONE row,
    keeping the min-xxhash64 html — deterministic regardless of input order."""
    from opps_feedcrawler_spark.plans.crawl import prepare_pages

    rows = [
        ("http://A.example:80/p/1#frag", b"<p>alias-one</p>"),
        ("http://a.example/p/1", b"<p>canonical</p>"),
        ("http://a.example/p/2", b"<p>other</p>"),
        ("notaurl", b"<p>dropped</p>"),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.url_norm: bytes(r.html) for r in prepare_pages(pages).collect()}
    assert set(got) == {"http://a.example/p/1", "http://a.example/p/2"}
    # reversed input order → identical winner (content-hash, not first-wins)
    rev = spark.createDataFrame(list(reversed(rows)), "url string, html binary")
    got_rev = {r.url_norm: bytes(r.html) for r in prepare_pages(rev).collect()}
    assert got == got_rev


def test_prepare_pages_no_mapside_blob_sort(spark):
    """The dedup sort must sit ABOVE the exchange (reduce-side, bounded by
    shuffle partitions) — never below it next to the scan, where it would
    sort every input partition's full blob rows map-side."""
    from opps_feedcrawler_spark.plans.crawl import prepare_pages

    pages = spark.createDataFrame(
        [("http://a.example/p/1", b"x")], "url string, html binary"
    )
    prev = spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold")
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "0")
    try:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            prepare_pages(pages).explain()  # simple tree, printed top-down
        tree = buf.getvalue().splitlines()
    finally:
        spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", prev)
    sort_lines = [i for i, l in enumerate(tree) if "- Sort " in l]
    exch_lines = [i for i, l in enumerate(tree) if "- Exchange " in l]
    assert len(sort_lines) == 1 and len(exch_lines) == 1
    # tree prints top-down: everything printed AFTER the exchange runs
    # map-side; the single sort must sit above (before) it
    assert sort_lines[0] < exch_lines[0]


def test_fetch_join_streams_corpus_no_blob_sort(spark):
    """The per-round fetch must broadcast-SEMI-filter the corpus (blobs
    stream map-side) — never sort-merge-join it (which would re-sort the
    whole blob table every round)."""
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
    out = crawl_round(
        spark, seeds_to_frontier(seeds),
        spark.createDataFrame([], "url_norm string, url_hash long"),
        None, pp, robots, 0,
    )
    plan = _plan(out["fetch_log"])
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    out["cleanup"]()


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


def test_global_sequence_no_single_task_data_sort(spark):
    """with_global_sequence must range-partition the schedule (parallel
    sort) — never funnel the round's rows through one task. The only
    SinglePartition window allowed is the tiny per-partition-counts offset
    scan (input bounded by the partition count)."""
    from opps_feedcrawler_spark.operators.politeness import with_global_sequence

    rows = [
        (f"http://h{i % 7}.example/p/{i}", f"h{i % 7}.example", 1.0 / (1 + i % 3), i % 3)
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "url_norm string, host string, priority double, depth int"
    )
    out, unpersist = with_global_sequence(df, 0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the schedule rows flow through a RangePartitioning repartition...
    assert "REPARTITION_BY_NUM" in plan or "RepartitionByExpression" in plan
    # ...and the only global (unpartitioned) window is over the counts agg
    import re

    assert "sum(_n#" in plan  # the offsets prefix-sum window exists
    # no row_number window over the full schedule without partition keys:
    assert not re.search(r"Window \[row_number\(\)[^\n]*\]\s*$", plan, re.M)
    unpersist()


def test_bucketed_fetch_join_no_blob_exchange(spark, tmp_path):
    """fetch_mode='bucketed': with the corpus persisted as a
    url_norm-bucketed table, the per-round fetch semi-join must have NO
    Exchange on the blob side (only the narrow schedule shuffles into the
    bucket layout; the remaining corpus-side sort is bucket-local) — the
    documented swap for schedules too large to broadcast. Results must
    equal the broadcast path."""
    from opps_feedcrawler_spark.plans.crawl import (
        crawl_round,
        prepare_pages,
        prepare_pages_bucketed,
        seeds_to_frontier,
    )
    from opps_feedcrawler_spark.sources.synth import gen_corpus

    pages, seeds, robots_rows = gen_corpus(
        n_hosts=8, n_pages=120, n_seeds=30, seed=5
    )
    P = prepare_pages(spark.createDataFrame(pages))
    bucketed = prepare_pages_bucketed(
        spark, P, table="ofs_pages_bucketed_test", buckets=8
    )
    S = spark.createDataFrame(seeds)
    R = spark.createDataFrame(
        robots_rows,
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    frontier = seeds_to_frontier(S)
    seen = spark.createDataFrame([], "url_norm string, url_hash long")

    # plan-shape assertion on the fetch semi-join itself (the exact
    # expression crawl_round builds in bucketed mode), executed so AQE
    # finalizes: sort-merge, ONE exchange (schedule side only), ONE sort
    join = bucketed.join(
        frontier.select("url_norm").hint("merge"), "url_norm", "left_semi"
    )
    join.count()
    plan = join._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "LeftSemi" in plan, plan[:3000]
    assert plan.count("Exchange hashpartitioning(url_norm") == 1, plan[:3000]
    assert "Bucketed: true" in plan, plan[:3000]
    # the corpus-side Sort is bucket-LOCAL (no exchange feeds it); eliding
    # it needs spark.sql.legacy.bucketedTableScan.outputOrdering=true
    # (off by default since Spark 3.0) — the scale-critical property is
    # that the blob rows never cross the network, asserted above

    # end-to-end equality vs the broadcast path
    out_b = crawl_round(
        spark, frontier, seen, None, bucketed, R, 0, fetch_mode="bucketed"
    )
    out_c = crawl_round(spark, frontier, seen, None, P, R, 0)
    got_b = sorted(
        (r.url_norm, r.status, r.bytes) for r in out_b["fetch_log"].collect()
    )
    got_c = sorted(
        (r.url_norm, r.status, r.bytes) for r in out_c["fetch_log"].collect()
    )
    assert got_b == got_c
    out_b["cleanup"](), out_c["cleanup"]()
    spark.sql("DROP TABLE IF EXISTS ofs_pages_bucketed_test")
