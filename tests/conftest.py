from __future__ import annotations

import pytest

from opps_feedcrawler_spark.session import get_spark
from opps_feedcrawler_spark.sources.synth import gen_corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark("opps-feedcrawler-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus():
    """Small deterministic crawl corpus: (pages, seeds, robots) pandas."""
    return gen_corpus(n_hosts=20, n_pages=400, n_seeds=40, seed=42)


@pytest.fixture(scope="session")
def corpus_dfs(spark, corpus):
    pages_pdf, seeds_pdf, robots_pdf = corpus
    pages = spark.createDataFrame(pages_pdf)
    seeds = spark.createDataFrame(seeds_pdf)
    robots = spark.createDataFrame(
        robots_pdf,
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    return pages, seeds, robots
