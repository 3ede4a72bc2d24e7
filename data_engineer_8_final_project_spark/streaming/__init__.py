"""Structured Streaming leg (SURVEY.md §2.9 T1-T3)."""
