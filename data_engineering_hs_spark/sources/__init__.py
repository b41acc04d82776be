"""Batch + incremental sources and sinks (SURVEY.md §2.1)."""
