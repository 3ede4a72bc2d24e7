"""Registered named queries, grouped by surface area.

- ``flagship``    — the standings conditional aggregation (SURVEY.md §7 phase 1)
- ``core``        — core relational set (aggs, joins, windows, sorts, set ops)
- ``scalar``      — cleaning/derivation scalar-function queries
- ``extended``    — dedup / similarity / text-analytics (training-data ops)
- ``streaming_q`` — Structured Streaming leg (availableNow replay)
"""
