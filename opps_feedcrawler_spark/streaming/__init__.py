"""Optional Structured Streaming ingestion variant (SURVEY.md §4.3)."""
