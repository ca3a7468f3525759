"""The reference's main API surface, re-expressed declaratively: a feed
registry + one process_feeds() pass (SURVEY.md §1.1, §3.1).

Reference behavior [PK]: opps-feedcrawler models a `Feed` row (title, slug,
source URL, group, processor dotted-path, max-entries cap, publish flag);
Celery beat iterates feeds serially — import processor → feedparser fetch+
parse → per-entry dedup → insert capped entries. Here the whole pass is one
DataFrame plan over all feeds at once:

  feeds ⋈ pages (fetch) → fused Arrow-UDF parse → explode →
  per-feed max_entries cap (document order, deterministic) →
  dedup by (feed_id, entry_guid) → publish filter

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
    root-tag split (first 2 KB prefix scan, JVM-side)."""
    head = F.substring(html_col.cast("string"), 1, 2048)
    return (
        F.when(head.rlike(r"(?i)<\s*rss[\s>]"), F.lit("rss"))
        .when(head.rlike(r"(?i)<\s*feed[\s>]"), F.lit("atom"))
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
    w = Window.partitionBy("feed_id").orderBy("pos")
    capped = parsed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= F.col("max_entries")
    )
    entries = capped.select(
        "feed_id",
        "slug",
        "group_name",
        F.coalesce(F.col("e.entry_guid"), F.col("e.link")).alias("entry_guid"),
        F.trim(F.col("e.title")).alias("title"),
        F.col("e.link").alias("link"),
        F.col("e.published_ts").alias("published_ts"),
        F.trim(F.col("e.summary")).alias("summary"),
        "pos",
        "publish",
    )
    # deterministic dedup: FIRST occurrence in document order wins (the
    # reference's insert-if-absent loop semantics [PK]) — dropDuplicates
    # would keep an arbitrary row per guid
    wd = Window.partitionBy("feed_id", "entry_guid").orderBy("pos")
    return (
        entries.withColumn("_dn", F.row_number().over(wd))
        .filter((F.col("_dn") == 1) & F.col("publish"))
        .drop("_dn", "publish")
    )
