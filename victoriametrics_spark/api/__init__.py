from victoriametrics_spark.api.http import IngestAPI, LogsAPI, PromAPI, serve

__all__ = ["IngestAPI", "LogsAPI", "PromAPI", "serve"]
