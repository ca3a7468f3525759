"""The reference's main API surface, re-expressed declaratively: a feed
registry + one process_feeds() pass (SURVEY.md §1.1, §3.1).

Reference behavior [PK]: opps-feedcrawler models a `Feed` row (title, slug,
source URL, group, processor dotted-path, max-entries cap, publish flag);
Celery beat iterates feeds serially — import processor → feedparser fetch+
parse → per-entry dedup → insert capped entries. Here the whole pass is one
DataFrame plan over all feeds at once:

  feeds ⋈ pages (fetch) → fused Arrow-UDF parse → explode →
  dedup by (feed_id, guid-else-link-else-position) →
  per-feed max_entries cap over the SURVIVORS (document order — the
  reference's skip-existing-then-insert-capped loop) → publish filter

Processor dispatch: the reference picks a parser class per feed; our fused
extractor sniffs RSS vs Atom per page (functions/extract.is_feed), so the
`processor` column is honored as a *filter* contract — 'auto' accepts any
feed flavor; 'rss'/'atom' drop pages whose detected flavor mismatches
(strict feeds, like a processor that would raise in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extract import extract_entries_udf
from ..functions.urlnorm import with_url_cols

FEEDS_SCHEMA = (
    "feed_id long, title string, slug string, source_url string, "
    "group_name string, processor string, max_entries int, publish boolean"
)

DEFAULT_MAX_ENTRIES = 100


def register_feeds(feeds: DataFrame) -> DataFrame:
    """Validate + canonicalize the feed registry: slug defaulted from title,
    source_url canonicalized (drops invalid rows, like admin validation),
    processor defaulted to 'auto', max_entries capped to the engine limit."""
    f = feeds.withColumn(
        "slug",
        F.coalesce(
            F.col("slug"),
            F.regexp_replace(F.lower(F.trim(F.col("title"))), r"[^a-z0-9]+", "-"),
        ),
    )
    f = with_url_cols(f, "source_url").withColumnRenamed("url_norm", "feed_url")
    return f.select(
        "feed_id",
        "title",
        "slug",
        "feed_url",
        F.coalesce(F.col("group_name"), F.lit("default")).alias("group_name"),
        F.coalesce(F.col("processor"), F.lit("auto")).alias("processor"),
        F.least(
            F.coalesce(F.col("max_entries"), F.lit(DEFAULT_MAX_ENTRIES)),
            F.lit(DEFAULT_MAX_ENTRIES),
        ).alias("max_entries"),
        F.coalesce(F.col("publish"), F.lit(True)).alias("publish"),
    )


def _detected_flavor(html_col: F.Column) -> F.Column:
    """Native feed-flavor sniff, mirroring extract.is_feed + the RSS/Atom
    root-tag split (first 2 KB prefix scan, JVM-side). The EARLIER element
    match wins — an Atom feed whose head happens to contain '<rss' later
    (comment/CDATA) must not be classified rss (round-2 review finding).
    The binary column is sliced BEFORE the string cast so only 2 KB per
    row are decoded, matching is_feed's raw[:2048] semantics."""
    head = F.substring(html_col, 1, 2048).cast("string")
    rss_pos = F.regexp_instr(head, F.lit(r"(?i)<\s*rss[\s>]"))
    atom_pos = F.regexp_instr(head, F.lit(r"(?i)<\s*feed[\s>]"))
    return (
        F.when(
            (rss_pos > 0) & ((atom_pos == 0) | (rss_pos < atom_pos)),
            F.lit("rss"),
        )
        .when(atom_pos > 0, F.lit("atom"))
        .otherwise(F.lit("html"))
    )


def process_feeds(
    registered: DataFrame, pages_prepared: DataFrame
) -> DataFrame:
    """One declarative pass over every registered feed (what the reference
    does serially per feed [PK]). Returns the published entries table:
    feed_id, slug, group_name, entry_guid, title, link, published_ts,
    summary, pos (document order within the feed).

    Join shape: the registry is the small side and sits on the BUILD side
    of an inner broadcast join, so the page corpus streams (no blob
    shuffle) — same discipline as the crawl fetch join (plans/crawl.py)."""
    reg = F.broadcast(
        registered.select(
            "feed_id", "slug", "group_name", "processor", "max_entries",
            "publish", F.col("feed_url").alias("url_norm"),
        )
    )
    fetched = pages_prepared.join(reg, "url_norm")
    flavor = _detected_flavor(F.col("html"))
    parsed = (
        fetched.withColumn("flavor", flavor)
        .filter(
            (F.col("processor") == "auto")
            | (F.col("processor") == F.col("flavor"))
        )
        .select(
            "feed_id", "slug", "group_name", "max_entries", "publish",
            F.posexplode(extract_entries_udf("html")).alias("pos", "e"),
        )
    )
    entries = parsed.select(
        "feed_id",
        "slug",
        "group_name",
        "max_entries",
        F.coalesce(F.col("e.entry_guid"), F.col("e.link")).alias("entry_guid"),
        F.trim(F.col("e.title")).alias("title"),
        F.col("e.link").alias("link"),
        F.col("e.published_ts").alias("published_ts"),
        F.trim(F.col("e.summary")).alias("summary"),
        "pos",
        "publish",
    )
    # Reference loop semantics [PK]: iterate items in document order,
    # SKIP entries that already exist (dedup by guid-else-link), INSERT
    # until the cap — so dedup runs FIRST and duplicates never consume
    # cap slots (round-2 review finding: cap-then-dedup under-publishes).
    # Dedup key: guid, else link, else a per-position sentinel — entries
    # with neither guid nor link are all distinct (the reference's
    # existence query 'link = NULL' never matches), so NULL keys must not
    # collapse into one window partition.
    dedup_key = F.coalesce(
        F.col("entry_guid"),
        F.concat(F.lit("::pos-"), F.col("pos").cast("string")),
    )
    wd = Window.partitionBy("feed_id", dedup_key).orderBy("pos")
    deduped = (
        entries.withColumn("_dn", F.row_number().over(wd))
        .filter(F.col("_dn") == 1)
        .drop("_dn")
    )
    w = Window.partitionBy("feed_id").orderBy("pos")
    return (
        deduped.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") <= F.col("max_entries")) & F.col("publish"))
        .drop("_rn", "max_entries", "publish")
    )
