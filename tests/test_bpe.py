"""Real BPE train+apply (functions/bpe.py): hand-worked textbook example,
algebraic properties, and the distributed stage."""

from __future__ import annotations

from opps_feedcrawler_spark.functions.bpe import (
    apply_bpe,
    encode_word,
    train_bpe_merges_py,
)


def test_textbook_merge_order():
    """Sennrich-style corpus: 'low' x5, 'lower' x2, 'newest' x6,
    'widest' x3 (as space-joined text). Hand-derived first merges:
    pair counts — (e,s)=9 and (s,t)=9 tie -> lexicographic picks
    ('e','s'); then ('es','t')=9; then ('l','o')=7; then ('lo','w')=7."""
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    merges = train_bpe_merges_py([corpus], 4)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est"]
    assert encode_word("newest", ranks) == ["n", "e", "w", "est"]
    assert encode_word("low", ranks) == ["low"]


def test_properties():
    texts = ["the cat sat on the mat 123", "concatenation of the nation"]
    prev = None
    for k in (0, 2, 8, 32):
        merges = train_bpe_merges_py(texts, k)
        ranks = {p: i for i, p in enumerate(merges)}
        total = sum(
            len(encode_word(w, ranks))
            for t in texts
            for w in __import__(
                "opps_feedcrawler_spark.functions.bpe", fromlist=["_pretokenize"]
            )._pretokenize(t)
        )
        # 0 merges -> pure characters; counts shrink monotonically with k
        if k == 0:
            assert total == sum(
                len(w)
                for t in texts
                for w in __import__(
                    "opps_feedcrawler_spark.functions.bpe",
                    fromlist=["_pretokenize"],
                )._pretokenize(t)
            )
        if prev is not None:
            assert total <= prev
        prev = total
    # encode concatenation invariant: tokens rejoin to the word
    merges = train_bpe_merges_py(texts, 16)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("concatenation", "the", "zzz", "a"):
        assert "".join(encode_word(w, ranks)) == w


def test_apply_bpe_distributed(spark):
    from opps_feedcrawler_spark.functions.bpe import train_bpe_merges

    docs = spark.createDataFrame(
        [(1, "aaab aaab cd"), (2, "aaab"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    merges = train_bpe_merges(docs, n_merges=2)
    # 'aaab' x3 dominates: merges are (a,a) then (aa,ab)? pair counts:
    # (a,a)=6, (a,b)=3, (c,d)=1 -> ('a','a'); then ('aa','a')=3,('a','b')=3
    # tie -> ('a','b'); so 'aaab' -> ['aa','ab'] = 2 tokens
    assert merges[0] == ("a", "a")
    rows = {r.doc_id: r for r in apply_bpe(docs, merges).collect()}
    assert rows[1].n_pretokens == 3 and rows[1].n_bpe_tokens == 2 + 2 + 2
    assert rows[2].n_bpe_tokens == 2
    assert rows[3].n_bpe_tokens == 0 and rows[4].n_bpe_tokens == 0
    assert rows[1].n_chars == len("aaab aaab cd")
