"""Scalar function library (reference SURVEY.md §2.8, F1–F12)."""
