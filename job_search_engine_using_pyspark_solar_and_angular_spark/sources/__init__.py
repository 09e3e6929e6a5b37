"""Sources: raw-data readers (tweet-shaped nested JSON, CSV, parquet) and
their explicit schemas (SURVEY.md §2.1 S1-S7)."""
