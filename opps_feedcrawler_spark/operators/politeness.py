"""Per-host politeness budgets as window-ranked token buckets
(SURVEY.md §2 A8-A9; BASELINE.json:6 "per-host politeness budgets ...
enforced as window-ranked per-partition token buckets").

Reference behavior [PK]: one poll per feed per Celery-beat tick, feeds
processed serially — the per-host budget generalizes that to a per-round
token count derived from robots crawl_delay.

Skew design (SURVEY.md §4.2.1): a zipfian web has mega-hosts; a window
partitioned by host alone serializes them onto one task, and AQE does NOT
split skewed window partitions. The politeness window therefore runs in two
phases over the salt column (salt = pmod(url_hash, NSALTS), varies WITHIN a
host):

  phase 1  Window(host, salt)  → per-salt top-`budget`   (parallel, bounded)
  phase 2  Window(host)        → exact top-`budget` over ≤ NSALTS·budget rows

Phase 2's input per host is capped at NSALTS·budget rows regardless of how
hot the host is, so the result is EXACTLY the unsalted per-host top-k (the
determinism/ordering contract of BASELINE.json:6,14) while the heavy scan
parallelizes. Total order everywhere: (priority DESC, url_norm ASC).
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_CRAWL_DELAY = 1.0
# Env-tunable so the scaling bench can run rounds at production-scale
# schedule sizes (a 10^10-URL crawl schedules millions per round); the
# single-threaded oracle shares these constants, so engine and oracle stay
# in lock-step under any setting.
BUDGET_BASE = float(os.environ.get("OFS_BUDGET_BASE", "10.0"))
MAX_BUDGET = int(os.environ.get("OFS_MAX_BUDGET", "50"))


def budget_for_delay(crawl_delay: float | None) -> int:
    """Per-round token count for a host. Pure; shared verbatim with the
    single-threaded oracle (tests/oracle_crawler.py) so scheduled sets match."""
    if crawl_delay is None or crawl_delay <= 0:
        crawl_delay = DEFAULT_CRAWL_DELAY
    return max(1, min(MAX_BUDGET, int(BUDGET_BASE / crawl_delay)))


def priority_col() -> F.Column:
    """A8: deterministic priority — shallower pages first. Pure function of
    depth so resume/replay reproduce identical orders (BASELINE.json:6)."""
    return 1.0 / (1.0 + F.col("depth").cast("double"))


def schedule_budgeted(frontier: DataFrame, budget_col: str = "budget") -> DataFrame:
    """Take the per-host top-`budget` frontier rows by (priority DESC,
    url_norm) using the salted two-phase window. Expects columns:
    host, salt, priority, url_norm, <budget_col>."""
    order = [F.col("priority").desc(), F.col("url_norm").asc()]
    w1 = Window.partitionBy("host", "salt").orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    pre = (
        frontier.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= F.col(budget_col))
        .drop("_rn")
    )
    return (
        pre.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= F.col(budget_col))
        .drop("_rn")
    )


def with_global_sequence(
    scheduled: DataFrame, round_no: int
) -> Tuple[DataFrame, Callable[[], None]]:
    """Assign the round-global schedule order seq (1-based) by
    (priority DESC, url_norm) — the operational definition of "crawl
    ordering matches the reference" (SURVEY.md §4.2.2; BASELINE.json:6,14).

    Two-phase at scale: a bare ``Window.orderBy`` serializes the whole
    round's schedule through ONE task (the round-1 weak spot at the
    millions-per-round production profile). Instead the rows are
    range-partitioned on the sort key (parallel range sort; explicit
    partition count so AQE never re-splits it mid-plan), seq is computed
    per range partition, and per-partition row counts — one tiny row per
    partition — are prefix-summed and broadcast-joined back as offsets.
    seq values are byte-identical to the single-window form: range
    partitions respect the same total order, (priority, url_norm) is a
    unique key, and the prefix sum restores the global rank — for ANY
    boundary placement, which is what makes this safe: RangePartitioner's
    boundary sampling is seeded by the RDD id, so two materializations of
    the same subtree pick different boundaries (measured). The ranged rows
    are therefore persisted and both phases read that ONE materialization
    (the counts stage fills the cache, the probe side reads it; a lost
    block recomputes from the already-written shuffle whose boundaries are
    baked in). Returns ``(sequenced_df, unpersist)``: the caller owns the
    cached ranged rows and releases them via the returned callable once the
    round's sinks have consumed the schedule (crawl_round wires it into the
    round cleanup). Explicit pair instead of an ad-hoc attribute on the
    DataFrame, which was invisible to callers (VERDICT r3 #6)."""
    from pyspark.storagelevel import StorageLevel

    order = [F.col("priority").desc(), F.col("url_norm").asc()]
    # deployments may set the conf to a non-numeric value (e.g. "auto"
    # under some AQE setups) — fall back to the cluster default instead
    # of raising (ADVICE r2)
    try:
        nparts = int(
            scheduled.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    except (TypeError, ValueError):
        nparts = scheduled.sparkSession.sparkContext.defaultParallelism
    # monotonically_increasing_id over the range-sorted rows encodes
    # (partition index << 33) + within-partition offset — both phases in
    # one narrow projection, no second shuffle and no single-task window.
    local = (
        scheduled.repartitionByRange(nparts, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33))
        .withColumn(
            "_lseq", F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)) + 1
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = (
        Window.orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("seq", (F.col("_lseq") + F.col("_off")).cast("int"))
        .withColumn("round", F.lit(round_no))
        .drop("_pid", "_lseq", "_mid", "_off")
    )
    return out, lambda: local.unpersist()
