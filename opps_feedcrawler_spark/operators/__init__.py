"""Engine operators: URL-seen bloom filter, politeness token buckets,
robots.txt filtering, dedup family, similarity search."""
