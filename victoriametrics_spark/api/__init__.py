from victoriametrics_spark.api.http import (
    GraphiteBrowseAPI,
    IngestAPI,
    LogsAPI,
    PromAPI,
    serve,
)

__all__ = ["GraphiteBrowseAPI", "IngestAPI", "LogsAPI", "PromAPI", "serve"]
