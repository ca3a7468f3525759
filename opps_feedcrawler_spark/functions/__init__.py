"""Vectorized column functions: URL canonicalization/hashing, HTML/feed
extraction, text statistics. All Python execution is Arrow-batched pandas
UDFs (BASELINE.json:16 — no per-row Python in the hot path)."""
