from __future__ import annotations

from opps_feedcrawler_spark.functions.extract import extract_text_py
from opps_feedcrawler_spark.sources.synth import gen_corpus


def test_corpus_deterministic():
    p1, s1, r1 = gen_corpus(n_hosts=10, n_pages=100, n_seeds=10, seed=7)
    p2, s2, r2 = gen_corpus(n_hosts=10, n_pages=100, n_seeds=10, seed=7)
    assert p1.equals(p2) and s1.equals(s2) and r1.equals(r2)


def test_corpus_text_invariant(corpus):
    pages, _, _ = corpus
    for h, t in zip(pages["html"], pages["text"]):
        assert extract_text_py(h) == t  # FIXTURES.md invariant 2, bytes ==


def test_corpus_zipf_skew(corpus):
    pages, _, _ = corpus
    hosts = pages["url"].str.extract(r"//([^/:]+)", expand=False).str.lower()
    counts = hosts.value_counts()
    assert counts.iloc[0] > 4 * counts.iloc[-1]  # hot-host skew present
