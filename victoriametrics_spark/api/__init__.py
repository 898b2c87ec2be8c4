from victoriametrics_spark.api.http import PromAPI, serve

__all__ = ["PromAPI", "serve"]
