"""Structured Streaming jobs over the events stream (SURVEY.md §2.8:
the reference has no streaming at all — this is north-star surface)."""
