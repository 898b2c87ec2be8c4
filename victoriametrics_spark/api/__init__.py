from victoriametrics_spark.api.http import LogsAPI, PromAPI, serve

__all__ = ["LogsAPI", "PromAPI", "serve"]
