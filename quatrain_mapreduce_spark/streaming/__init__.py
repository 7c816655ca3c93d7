"""HOP streaming/online-aggregation layer on Structured Streaming (SURVEY.md §2.8)."""
