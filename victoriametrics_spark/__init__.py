"""victoriametrics_spark — a PySpark-native time-series analytics engine.

A from-scratch implementation of the query and data-processing
capabilities of VictoriaMetrics (MetricsQL / PromQL-superset evaluation,
streaming ingestion with relabeling + dedup + stream aggregation), built
idiomatically on Spark DataFrames / Catalyst / Structured Streaming, plus
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Public API:
    >>> from victoriametrics_spark import evaluate, EvalConfig
    >>> df = evaluate(spark, "sum(rate(http_requests_total[5m])) by (job)",
    ...               samples, EvalConfig(start=..., end=..., step=...))
"""

from victoriametrics_spark.engine.evalcfg import EvalConfig
from victoriametrics_spark.engine.planner import evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA, samples_from_columns

__all__ = [
    "EvalConfig",
    "SAMPLE_SCHEMA",
    "evaluate",
    "samples_from_columns",
]
