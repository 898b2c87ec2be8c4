"""Large-scale training-data-pipeline operators (beyond-reference scope):
deduplication, similarity search, text analysis, multimodal plumbing.

All hot paths are Catalyst expressions (no Python UDFs); the only
Python-side stage is the stubbed multimodal decode (Arrow-batched
mapInPandas)."""
