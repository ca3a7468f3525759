"""robots.txt rule filtering (SURVEY.md §2 A10; RFC 9309 longest-match,
incl. the `*` / `$` special characters of §2.2.3).

Not present in the reference (feeds are opt-in sources [PK]); mandated by
BASELINE.json:6,14 ("per-host politeness budgets and robots.txt rules").

Matching semantics (pinned, shared with the oracle):
- rules are (allow bool, pattern string) pairs per host, where the pattern
  is an RFC 9309 path pattern: literal prefix, `*` matches any character
  sequence, a FINAL `$` anchors end-of-path (elsewhere `$` is literal);
- the matching rule with the MOST OCTETS in its pattern wins
  (RFC 9309 §2.2.2 "most specific match");
- on equal length, allow wins;
- no matching rule / no rules / unknown host → allowed.

The Spark implementation is FULLY native (JVM-side higher-order array
functions — zero Python): matched rules become (len(pattern), allow)
structs and array_max picks the lexicographic winner, which is exactly
most-octets-then-allow. Wildcard-free patterns (the overwhelmingly common
case in real robots files) match via `startswith`; only patterns carrying
`*`/`$` pay the regexp path — both branches are codegen'd JVM expressions.
A robots.txt *parser* (text → rules) is provided for ingestion; at crawl
time rules live in the structured robots table.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .politeness import DEFAULT_CRAWL_DELAY


def _pattern_matches(path: str, pattern: str) -> bool:
    """RFC 9309 path-pattern match (pure Python; twin of the native
    expression): '*' = any char sequence, final '$' = end anchor."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "^" + ".*".join(re.escape(part) for part in body.split("*"))
    if anchored:
        rx += "$"
    return re.match(rx, path) is not None


def robots_allowed(path: str, rules: list | None) -> bool:
    """Pure-Python twin of the native expression (oracle + property tests)."""
    if not rules:
        return True
    best_len = -1
    best_allow = True
    for r in rules:
        allow, prefix = (
            (r["allow"], r["prefix"]) if isinstance(r, dict) else (r.allow, r.prefix)
        )
        if prefix is not None and _pattern_matches(path, prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def parse_robots_txt(text: str, agent: str = "*") -> dict:
    """RFC 9309 parser with §2.2.1 group selection: groups are runs of
    consecutive ``User-agent`` lines followed by their rules; the crawler
    uses ALL groups whose user-agent token equals its product token
    (case-insensitive), falling back to the ``*`` groups when none match.
    Returns {"crawl_delay": float|None, "rules": [{"allow","prefix"}...],
    "sitemaps": [url...]} with matched groups' rules merged in file order.
    ``Sitemap:`` directives (the sitemaps.org extension RFC 9309 §2.3
    tolerates as "other records") are GLOBAL — collected in file order from
    anywhere in the file, independent of agent groups, per the sitemaps.org
    spec. The default ``agent="*"`` keeps the generic-crawler behavior (the
    reference's feedparser-based fetcher does not identify specially [PK])."""
    groups: list[dict] = []
    sitemaps: list[str] = []
    cur: dict | None = None
    last_was_ua = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if key == "user-agent":
            if not last_was_ua or cur is None:
                cur = {"agents": set(), "rules": [], "crawl_delay": None}
                groups.append(cur)
            cur["agents"].add(value.lower())
            last_was_ua = True
            continue
        last_was_ua = False
        if cur is None:
            continue  # rules before any user-agent line are ignored
        if key in ("allow", "disallow"):
            if value:
                cur["rules"].append({"allow": key == "allow", "prefix": value})
        elif key == "crawl-delay":
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass
    tok = agent.lower()
    matched = [g for g in groups if tok != "*" and tok in g["agents"]]
    if not matched:
        matched = [g for g in groups if "*" in g["agents"]]
    rules = [r for g in matched for r in g["rules"]]
    crawl_delay = next(
        (g["crawl_delay"] for g in matched if g["crawl_delay"] is not None),
        None,
    )
    return {"crawl_delay": crawl_delay, "rules": rules, "sitemaps": sitemaps}


def parse_robots_udf():
    """Arrow-batched robots.txt parser UDF: raw text → struct(crawl_delay,
    rules, sitemaps) matching with_robots' expected rules shape. Built as a
    factory (pandas_udf registration touches the active session's config)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    struct = StructType(
        [
            StructField("crawl_delay", DoubleType()),
            StructField(
                "rules",
                ArrayType(
                    StructType(
                        [
                            StructField("allow", BooleanType()),
                            StructField("prefix", StringType()),
                        ]
                    )
                ),
            ),
            StructField("sitemaps", ArrayType(StringType())),
        ]
    )

    @pandas_udf(struct)
    def _parse(text: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_txt(t or "") for t in text]
        return pd.DataFrame(
            {
                "crawl_delay": [r["crawl_delay"] for r in rows],
                "rules": [r["rules"] for r in rows],
                "sitemaps": [r["sitemaps"] for r in rows],
            }
        )

    return _parse


def with_robots(frontier: DataFrame, robots: DataFrame) -> DataFrame:
    """Left-broadcast-join robots onto the frontier by host and evaluate the
    longest-prefix-match verdict natively. Adds:
      allowed boolean, crawl_delay double (defaulted when host unknown).

    Scale note: robots rows are one-per-host — small relative to the
    frontier even at 10^8 hosts (~GBs), so broadcast is the right default;
    drop the hint to fall back to a shuffle join beyond that.
    """
    path = F.regexp_replace(F.col("url_norm"), r"^https?://[^/]+", "")

    def rule_matches(r):
        p = r["prefix"]
        # RFC 9309 §2.2.3 wildcard path: escape Java-regex metachars in the
        # pattern, then re-open OUR specials — '*' (any sequence) anywhere,
        # '$' (end anchor) only as the final octet — and anchor the start.
        esc = F.regexp_replace(p, r"([\\.\[\]\{\}\(\)\*\+\?\^\$\|])", r"\\$1")
        esc = F.regexp_replace(esc, r"\\\*", ".*")
        esc = F.regexp_replace(esc, r"\\\$$", "\\$")
        rx = F.concat(F.lit("^"), esc)
        has_special = p.contains("*") | F.endswith(p, F.lit("$"))
        # wildcard-free fast path: plain prefix compare, no regex engine
        return F.when(has_special, F.regexp_like(path, rx)).otherwise(
            F.startswith(path, p)
        )

    matched = F.filter(F.col("rules"), rule_matches)
    # (len, allow) struct; array_max = lexicographic max = longest prefix,
    # ties broken toward allow=true (false < true).
    verdict = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["prefix"]).alias("l"), r["allow"].alias("a")
            ),
        )
    )
    return (
        frontier.join(F.broadcast(robots), "host", "left")
        .withColumn(
            "allowed",
            F.when(F.col("rules").isNull(), F.lit(True)).otherwise(
                F.coalesce(verdict["a"], F.lit(True))
            ),
        )
        .withColumn(
            "crawl_delay",
            F.coalesce(F.col("crawl_delay"), F.lit(DEFAULT_CRAWL_DELAY)),
        )
        .drop("rules")
    )
