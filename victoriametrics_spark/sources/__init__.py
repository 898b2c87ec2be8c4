"""Ingest sources: adapters that normalize external data into the canonical
sample schema (SURVEY.md §2.1)."""
