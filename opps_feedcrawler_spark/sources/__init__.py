"""Sources: deterministic synthetic crawl corpus + parquet readers."""
