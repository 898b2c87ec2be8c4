"""Ingestion & streaming layer (SURVEY.md §2.1, §2.8): line-protocol
parsers, relabeling, dedup, and stream aggregation — every transform works
identically on batch DataFrames and Structured Streaming DataFrames."""
