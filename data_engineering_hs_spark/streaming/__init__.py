"""Structured Streaming pipelines (SURVEY.md §2.9, §2.1 S14-S23)."""
