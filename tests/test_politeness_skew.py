"""Salted-politeness skew tests (SURVEY.md §4.2.1): one zipfian mega-host
must (a) produce EXACTLY the unsalted per-host top-k result — salting is a
parallelization detail, never a semantics change — and (b) bound phase-2
input to NSALTS x budget rows per host regardless of host size."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from opps_feedcrawler_spark.functions.urlnorm import NSALTS
from opps_feedcrawler_spark.operators.politeness import schedule_budgeted

BUDGET = 10


def _frontier(spark, mega_n: int = 50_000, normal_hosts: int = 20):
    rows = spark.range(mega_n).select(
        F.lit("mega.example").alias("host"),
        F.concat(F.lit("http://mega.example/p/"), F.col("id")).alias("url_norm"),
    )
    for h in range(normal_hosts):
        rows = rows.unionByName(
            spark.range(25).select(
                F.lit(f"h{h}.example").alias("host"),
                F.concat(F.lit(f"http://h{h}.example/p/"), F.col("id")).alias(
                    "url_norm"
                ),
            )
        )
    return rows.select(
        "host",
        "url_norm",
        # non-trivial priorities with heavy ties (the hard ordering case)
        (F.pmod(F.xxhash64("url_norm"), F.lit(5)).cast("double") / 10.0).alias(
            "priority"
        ),
        F.pmod(F.xxhash64("url_norm"), F.lit(NSALTS)).cast("int").alias("salt"),
        F.lit(BUDGET).alias("budget"),
    )


def test_salted_topk_equals_unsalted(spark):
    fr = _frontier(spark)
    got = {
        (r.host, r.url_norm)
        for r in schedule_budgeted(fr).select("host", "url_norm").collect()
    }
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("url_norm").asc()
    )
    want = {
        (r.host, r.url_norm)
        for r in fr.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BUDGET)
        .select("host", "url_norm")
        .collect()
    }
    assert got == want
    assert len([1 for h, _ in got if h == "mega.example"]) == BUDGET


def test_phase2_input_bounded_per_host(spark):
    """Phase 1 caps each (host, salt) at budget rows, so the phase-2 window
    sees <= NSALTS x budget rows for ANY host size — the skew bound."""
    fr = _frontier(spark)
    order = [F.col("priority").desc(), F.col("url_norm").asc()]
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    pre = (
        fr.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= F.col("budget"))
    )
    per_host = pre.groupBy("host").count().collect()
    assert max(r["count"] for r in per_host) <= NSALTS * BUDGET
