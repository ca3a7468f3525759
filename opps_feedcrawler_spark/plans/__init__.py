"""Plans: the deterministic crawl-round driver, Iceberg-style snapshot
checkpointing, and the Plane-B relational query pack."""
