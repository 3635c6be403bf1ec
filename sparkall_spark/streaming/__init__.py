"""Structured Streaming helpers (extension; the reference has no
streaming surface — SURVEY.md §2.9)."""
