"""Structured Streaming twins of the batch pipeline (SURVEY.md §2h)."""
