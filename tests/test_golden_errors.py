"""Negative golden corpus — queries the reference REJECTS
(app/vmselect/promql/exec_test.go:10455 TestExecError). Every one must
raise a parse or plan error here too; silently returning a result for a
malformed query is a parity bug."""

from __future__ import annotations

import pytest

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1000_000, end=2000_000, step=200_000)

ERROR_QUERIES = [
    # unknown function
    "nonexisting()",
    # wrong arity — transforms
    "abs()",
    "abs(1,2)",
    "clamp()",
    "clamp_max()",
    "clamp_min(1,2,3)",
    "hour(1,2)",
    "label_join()",
    "label_replace(1)",
    "label_transform(1)",
    "label_set()",
    'label_set(1, "foo")',
    "label_del()",
    "label_keep()",
    "round()",
    "round(1,2,3)",
    "sgn()",
    "scalar()",
    "sort(1,2)",
    "sort_desc()",
    "sort_by_label()",
    "timestamp()",
    "vector()",
    "histogram_quantile()",
    # wrong arity — range/running family
    "range_stddev()",
    "range_quantile()",
    "range_quantile(1, 2, 3)",
    "range_median()",
    "running_sum(1, 2)",
    "range_mad()",
    "range_trim_outliers()",
    "range_trim_spikes()",
    "range_zscore()",
    "range_linear_regression(1, 2)",
    "smooth_exponential()",
    "smooth_exponential(1)",
    "remove_resets()",
    "sin()",
    "cosh()",
    # wrong arity — aggregates
    "sum()",
    "count_values()",
    "quantile()",
    "topk()",
    "limitk()",
    "bottomk()",
    # scalars take no args
    "time(123)",
    "start(1)",
    "end(1)",
    "step(1)",
    # parse errors
    "sum(",
    'm{a="b"',
    "rate(m[5m)",
    "m offset",
    "1 +",
]


@pytest.fixture(scope="module")
def empty_samples(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


@pytest.mark.parametrize("query", ERROR_QUERIES)
def test_query_rejected(spark, empty_samples, query):
    with pytest.raises(Exception) as exc:
        df = evaluate(spark, query, empty_samples, CFG)
        # some arity errors only surface at plan/collect time
        df.collect()
    # must be OUR typed error surface, not a random Spark internal
    assert type(exc.value).__name__ in (
        "ParseError",
        "PlanError",
        "ValueError",
        "IndexError",
        "TypeError",
        "AnalysisException",
    ), f"{query}: {type(exc.value)} {exc.value}"
