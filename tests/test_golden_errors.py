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
    # round-6 expansion: the remaining TestExecError cases. The two
    # duplicate-OUTPUT-series rejections (`(foo{a=x}, bar{a=x}) + 10`)
    # are enforced at the presentation boundary exactly like VM
    # (timeseriesToResult, exec.go:130-149) — see
    # test_duplicate_output_series_rejected_at_api below; checking there
    # keeps the cost O(result) instead of taxing every evaluation with a
    # shuffle.
    'range_stdvar()',
    'absent(1, 2)',
    'label_map()',
    'label_map(1)',
    'label_match()',
    'label_mismatch()',
    'label_graphite_group()',
    'sort_by_label_desc()',
    'sort_by_label_numeric()',
    'sort_by_label_numeric_desc()',
    'timestamp_with_name()',
    'histogram_quantiles()',
    'any()',
    'group()',
    'topk_min()',
    'topk_max()',
    'topk_avg()',
    'topk_median()',
    'topk_last()',
    'bottomk_min()',
    'bottomk_max()',
    'bottomk_avg()',
    'bottomk_median()',
    'bottomk_last()',
    'range_sum(1, 2)',
    'range_trim_zscore()',
    'range_first(1,  2)',
    'range_last(1, 2)',
    'sinh()',
    'cos()',
    'asin()',
    'asinh()',
    'acos()',
    'acosh()',
    'rand(123, 456)',
    'rand_normal(123, 456)',
    'rand_exponential(122, 456)',
    'pi(123)',
    'now(123)',
    'label_copy()',
    'label_move()',
    'median_over_time()',
    'keep_last_value()',
    'keep_next_value()',
    'interpolate()',
    'distinct_over_time()',
    'distinct()',
    'alias()',
    'alias(1)',
    'alias(1, "foo", "bar")',
    'lifetime()',
    'lag()',
    'aggr_over_time()',
    'aggr_over_time(foo)',
    'aggr_over_time("foo", bar, 1)',
    'sum(aggr_over_time())',
    'sum(aggr_over_time(foo))',
    'count(aggr_over_time("foo", bar, 1))',
    'hoeffding_bound_lower()',
    'hoeffding_bound_lower(1)',
    'hoeffding_bound_lower(0.99, foo, 1)',
    'hoeffding_bound_upper()',
    'hoeffding_bound_upper(1)',
    'hoeffding_bound_upper(0.99, foo, 1)',
    'outliers_mad()',
    'outliers_mad(1)',
    'outliersk()',
    'outliersk(1)',
    'mode_over_time()',
    'rate_over_sum()',
    'zscore_over_time()',
    'mode()',
    'share()',
    'prometheus_buckets()',
    'buckets_limit()',
    'buckets_limit(1)',
    'duration_over_time()',
    'share_le_over_time()',
    'share_gt_over_time()',
    'count_le_over_time()',
    'count_gt_over_time()',
    'count_eq_over_time()',
    'count_ne_over_time()',
    'timezone_offset()',
    'bitmap_and()',
    'bitmap_or()',
    'bitmap_xor()',
    'quantiles()',
    'limit_offset()',
    'increase()',
    'increase_prometheus()',
    'changes()',
    'changes_prometheus()',
    'delta()',
    'delta_prometheus()',
    'rollup_candlestick()',
    'rollup()',
    'drop_empty_series()',
    'drop_common_labels()',
    'labels_equal()',
    'median_over_time({}, 2)',
    'smooth_exponential(1, 1 or label_set(2, "x", "y"))',
    'count_values(1, 2)',
    'count_values(1 or label_set(2, "xx", "yy"), 2)',
    'quantile(1 or label_set(2, "xx", "foo"), 1)',
    'clamp_max(1, 1 or label_set(2, "xx", "foo"))',
    'clamp_min(1, 1 or label_set(2, "xx", "foo"))',
    'topk(label_set(2, "xx", "foo") or 1, 12)',
    'topk_avg(label_set(2, "xx", "foo") or 1, 12)',
    'limitk(label_set(2, "xx", "foo") or 1, 12)',
    'limit_offet((alias(1,"foo"),alias(2,"bar")), 2, 10)',
    'limit_offet(1, (alias(1,"foo"),alias(2,"bar")), 10)',
    'round(1, 1 or label_set(2, "xx", "foo"))',
    'histogram_quantile(1 or label_set(2, "xx", "foo"), 1)',
    'histogram_quantiles("foo", 1 or label_set(2, "xxx", "foo"), 2)',
    'sort_by_label_numeric(1, 2)',
    'label_set(1, 2, 3)',
    'label_set(1, "foo", (label_set(1, "foo", bar") or label_set(2, "xxx", "yy")))',
    'label_set(1, "foo", 3)',
    'label_del(1, 2)',
    'label_copy(1, 2)',
    'label_move(1, 2, 3)',
    'label_move(1, "foo", 3)',
    'label_keep(1, 2)',
    'label_join(1, 2, 3)',
    'label_join(1, "foo", 2)',
    'label_join(1, "foo", "bar", 2)',
    'label_replace(1, 2, 3, 4, 5)',
    'label_replace(1, "foo", 3, 4, 5)',
    'label_replace(1, "foo", "bar", 4, 5)',
    'label_replace(1, "foo", "bar", "baz", 5)',
    'label_replace(1, "foo", "bar", "baz", "invalid(regexp")',
    'label_transform(1, 2, 3, 4)',
    'label_transform(1, "foo", 3, 4)',
    'label_transform(1, "foo", "bar", 4)',
    'label_transform(1, "foo", "invalid(regexp", "baz',
    'label_match(1, 2, 3)',
    'label_mismatch(1, 2, 3)',
    'label_uppercase()',
    'label_lowercase()',
    'alias(1, 2)',
    'aggr_over_time(1, 2)',
    'aggr_over_time(("foo", "bar"), 3)',
    'outliersk((label_set(1, "foo", "bar"), label_set(2, "x", "y")), 123)',
    '(label_set(1, "foo", "bar") or label_set(2, "foo", "baz"))\n\t\t+ on(xx)\n\t\t(label_set(1, "foo", "bar") or label_set(2, "foo", "baz"))',
    '1 + group_left() (label_set(1, "foo", bar"), label_set(2, "foo", "baz"))',
    '1 + on() group_left() (label_set(1, "foo", bar"), label_set(2, "foo", "baz"))',
    '1 + on(a) group_left(b) (label_set(1, "foo", bar"), label_set(2, "foo", "baz"))',
    'label_set(1, "foo", "bar") + on(foo) group_left() (label_set(1, "foo", "bar", "a", "b"), label_set(1, "foo", "bar", "a", "c"))',
    '(label_set(1, "foo", bar"), label_set(2, "foo", "baz")) + group_right 1',
    '(label_set(1, "foo", bar"), label_set(2, "foo", "baz")) + on() group_right 1',
    '(label_set(1, "foo", bar"), label_set(2, "foo", "baz")) + on(a) group_right(b,c) 1',
    '(label_set(1, "foo", bar"), label_set(2, "foo", "baz")) + on() 1',
    '(label_set(1, "foo", "bar", "a", "b"), label_set(1, "foo", "bar", "a", "c")) + on(foo) group_right() label_set(1, "foo", "bar")',
    '1 + on() (label_set(1, "foo", bar"), label_set(2, "foo", "baz"))',
    'sum(1) foo (bar)',
    'sum foo () (bar)',
    'sum(foo) by (1)',
    'ttf()',
    'ttf(1, 2)',
    'ru()',
    'ru(1)',
    'ru(1,3,3)',
    'rollup_rate(time()[5m], "")',
    'rollup_rate(time()[5m], "foo")',
    'rollup_rate(time()[5m], "foo", "bar")',
    'rollup_candlestick(time(), "foo")',
]


@pytest.fixture(scope="module")
def empty_samples(spark):
    return spark.createDataFrame([], SAMPLE_SCHEMA)


# TestExecError "duplicate metrics after binary op" (exec_test.go:10711):
# VM rejects when a name-erasing op collapses two source series onto the
# same output identity; the check lives at the result-rendering boundary
# (timeseriesToResult, exec.go:130-149) — same here (api/http.py _eval).
DUPLICATE_OUTPUT_QUERIES = [
    '(\n\t\tlabel_set(time(), "__name__", "foo", "a", "x"),\n'
    '\t\tlabel_set(time()+200, "__name__", "bar", "a", "x"),\n\t) > bool 1300',
    '(\n\t\tlabel_set(time(), "__name__", "foo", "a", "x"),\n'
    '\t\tlabel_set(time()+200, "__name__", "bar", "a", "x"),\n\t) + 10',
]


@pytest.mark.parametrize("query", DUPLICATE_OUTPUT_QUERIES)
def test_duplicate_output_series_rejected_at_api(spark, empty_samples, query):
    from victoriametrics_spark.api.http import PromAPI

    api = PromAPI(spark, empty_samples)
    with pytest.raises(ValueError, match="duplicate output timeseries"):
        api.query_range(query, "1000", "2000", "200")


def test_distinct_output_series_pass_at_api(spark, empty_samples):
    from victoriametrics_spark.api.http import PromAPI

    api = PromAPI(spark, empty_samples)
    out = api.query_range(
        '(label_set(time(), "a", "x"), label_set(time(), "a", "y")) + 10',
        "1000",
        "2000",
        "200",
    )
    assert len(out["data"]["result"]) == 2


@pytest.mark.parametrize("query", ERROR_QUERIES)
def test_query_rejected(spark, empty_samples, query):
    with pytest.raises(Exception) as exc:
        df = evaluate(spark, query, empty_samples, CFG)
        # some arity errors only surface at plan/collect time
        df.collect()
    # must be OUR typed error surface, not a random Spark internal
    assert type(exc.value).__name__ in (
        "LexError",
        "ParseError",
        # runtime validations surface as raise_error → USER_RAISED_EXCEPTION
        "SparkRuntimeException",
        "PlanError",
        "ValueError",
        "IndexError",
        "TypeError",
        "AnalysisException",
    ), f"{query}: {type(exc.value)} {exc.value}"
