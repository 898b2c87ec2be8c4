"""Graphite Render API subset — unit tests.

Semantics under test cite app/vmselect/graphite/transform.go and
aggr.go (see victoriametrics_spark/graphite/functions.py docstrings).
Fixture: two series on a 10s grid, 10 points, with a NULL hole in
srv2 to exercise None handling.
"""

import math

import pytest
from pyspark.sql import functions as F

from victoriametrics_spark.graphite import parse_target, render
from victoriametrics_spark.graphite.parser import (
    Call,
    GraphiteParseError,
    Literal,
    Path,
)

START, END, STEP = 0, 100_000, 10_000


@pytest.fixture(scope="module")
def samples(spark):
    rows = []
    for i in range(10):
        rows.append(("web.srv1.cpu", i * STEP, float(i)))
        if i != 4:  # hole at ts=40000 for srv2
            rows.append(("web.srv2.cpu", i * STEP, float(2 * i)))
    rows.append(("db.srv1.mem;dc=east;role=db", 0, 7.0))
    rows.append(("db.srv2.mem;dc=west;role=db", 0, 9.0))
    return spark.createDataFrame(rows, "name string, ts long, value double")


def run(spark, samples, target):
    df = render(spark, target, samples, START, END, STEP)
    out = {}
    for r in df.collect():
        out.setdefault(r["name"], {})[r["ts"]] = r["value"]
    return out


# ------------------------------------------------------------- parser


def test_parser_shapes():
    n = parse_target("movingAverage(web.*.cpu,'30s')")
    assert isinstance(n, Call) and n.func == "movingAverage"
    assert isinstance(n.args[0], Path) and n.args[0].pattern == "web.*.cpu"
    assert isinstance(n.args[1], Literal) and n.args[1].value == "30s"

    n = parse_target("summarize(a.{b,c}.d, \"1h\", func='sum')")
    assert n.args[0].pattern == "a.{b,c}.d"
    assert n.kwargs["func"].value == "sum"

    n = parse_target("foo.bar-baz.*.qux")
    assert isinstance(n, Path)

    with pytest.raises(GraphiteParseError):
        parse_target("sumSeries(a.b")
    with pytest.raises(GraphiteParseError):
        parse_target("")


def test_parser_numbers_vs_paths():
    assert parse_target("42").value == 42
    assert parse_target("-1.5").value == -1.5
    assert isinstance(parse_target("1min.count"), Path)


# ------------------------------------------------------------ combine


def test_sum_series_ignores_nulls_unless_all_null(spark, samples):
    out = run(spark, samples, "sumSeries(web.*.cpu)")
    s = out["sumSeries(web.*.cpu)"]
    assert s[10_000] == 1.0 + 2.0
    # srv2 hole: sum over the remaining non-null value (aggr.go:82-94)
    assert s[40_000] == 4.0


def test_average_and_count_series(spark, samples):
    # reference name format: averageSeries (formatAggrFuncForSeriesNames
    # with funcName "average"), paths deduped to the query glob
    avg = run(spark, samples, "averageSeries(web.*.cpu)")[
        "averageSeries(web.*.cpu)"
    ]
    assert avg[20_000] == pytest.approx(3.0)
    assert avg[40_000] == pytest.approx(4.0)  # single non-null
    cnt = run(spark, samples, "countSeries(web.*.cpu)")[
        "countSeries(web.*.cpu)"
    ]
    assert cnt[0] == 2.0


def test_diff_series_first_minus_rest(spark, samples):
    out = run(spark, samples, "diffSeries(web.srv2.cpu, web.srv1.cpu)")
    s = next(iter(out.values()))
    assert s[30_000] == 6.0 - 3.0
    # first (arg0) null at 40000 → base falls to next non-null
    # (aggr.go getFirstNonNaNPos)
    assert s[40_000] == 4.0


def test_percentile_of_series_nearest_rank(spark, samples):
    out = run(spark, samples, "percentileOfSeries(web.*.cpu, 50)")
    s = next(iter(out.values()))
    # values (1, 2) at ts=10000; idx = floor(0.5*(2-1)+0.5)=1 → 2.0
    assert s[10_000] == 2.0


def test_group_by_node(spark, samples):
    out = run(spark, samples, "groupByNode(web.*.cpu, 1, 'sum')")
    assert out["srv1"][30_000] == 3.0
    assert out["srv2"][30_000] == 6.0


def test_aggregate_with_wildcards(spark, samples):
    out = run(spark, samples, "sumSeriesWithWildcards(web.*.cpu, 1)")
    assert out["web.cpu"][10_000] == 3.0


# --------------------------------------------------------- transforms


def test_derivative_and_integral(spark, samples):
    d = run(spark, samples, "derivative(web.srv1.cpu)")[
        "derivative(web.srv1.cpu)"
    ]
    assert d[0] is None and d[50_000] == 1.0
    i = run(spark, samples, "integral(web.srv1.cpu)")[
        "integral(web.srv1.cpu)"
    ]
    assert i[30_000] == 6.0


def test_non_negative_derivative_null_gap_breaks_chain(spark, samples):
    d = run(spark, samples, "nonNegativeDerivative(web.srv2.cpu)")[
        "nonNegativeDerivative(web.srv2.cpu)"
    ]
    assert d[30_000] == 2.0
    # cur null → None; next point's prev is null → None
    # (transform.go:4574: prev := cur even when NaN)
    assert d[40_000] is None and d[50_000] is None
    assert d[60_000] == 2.0


def test_per_second(spark, samples):
    d = run(spark, samples, "perSecond(web.srv1.cpu)")[
        "perSecond(web.srv1.cpu)"
    ]
    assert d[10_000] == pytest.approx(1.0 / 10.0)


def test_keep_last_value(spark, samples):
    d = run(spark, samples, "keepLastValue(web.srv2.cpu)")[
        "keepLastValue(web.srv2.cpu)"
    ]
    assert d[40_000] == 6.0  # filled from ts=30000


def test_interpolate_linear(spark, samples):
    d = run(spark, samples, "interpolate(web.srv2.cpu)")[
        "interpolate(web.srv2.cpu)"
    ]
    assert d[40_000] == pytest.approx(8.0)  # midpoint of 6 and 10


def test_moving_average_excludes_current(spark, samples):
    d = run(spark, samples, "movingAverage(web.srv1.cpu, 2)")[
        "movingAverage(web.srv1.cpu,2)"
    ]
    # window = previous 2 points, excluding current
    # (transform.go:2795-2812: values in [tsEnd-W, tsEnd))
    assert d[20_000] == pytest.approx(0.5)
    assert d[90_000] == pytest.approx((7 + 8) / 2)


def test_moving_median(spark, samples):
    d = run(spark, samples, "movingMedian(web.srv1.cpu, 3)")[
        "movingMedian(web.srv1.cpu,3)"
    ]
    # window values (1,2,3) at ts=40000; idx=floor(0.5*2+0.5)+1=2 → 2.0
    assert d[40_000] == 2.0


def test_summarize_buckets(spark, samples):
    d = run(spark, samples, "summarize(web.srv1.cpu, '30s', 'max')")[
        "summarize(web.srv1.cpu,'30s','max')"
    ]
    assert d[0] == 2.0 and d[30_000] == 5.0 and d[90_000] == 9.0


def test_hitcount(spark, samples):
    d = run(spark, samples, "hitcount(web.srv1.cpu, '30s')")[
        "hitcount(web.srv1.cpu,'30s')"
    ]
    assert d[0] == pytest.approx((0 + 1 + 2) * 10.0)


def test_time_shift(spark, samples):
    d = run(spark, samples, "timeShift(web.srv1.cpu, '20s')")[
        "timeShift(web.srv1.cpu,'20s')"
    ]
    assert d[30_000] == 1.0  # value from ts=10000


def test_scale_to_seconds(spark, samples):
    d = run(spark, samples, "scaleToSeconds(web.srv1.cpu, 60)")[
        "scaleToSeconds(web.srv1.cpu,60)"
    ]
    assert d[10_000] == pytest.approx(6.0)


# ----------------------------------------------------- filters / sorts


def test_filter_and_top(spark, samples):
    out = run(spark, samples, "maximumAbove(web.*.cpu, 10)")
    assert set(out) == {"web.srv2.cpu"}
    out = run(spark, samples, "highestAverage(web.*.cpu, 1)")
    assert set(out) == {"web.srv2.cpu"}
    out = run(spark, samples, "lowestCurrent(web.*.cpu, 1)")
    assert set(out) == {"web.srv1.cpu"}
    out = run(spark, samples, "limit(web.*.cpu, 1)")
    assert set(out) == {"web.srv1.cpu"}
    out = run(spark, samples, "grep(web.*.cpu, 'srv2')")
    assert set(out) == {"web.srv2.cpu"}
    out = run(spark, samples, "exclude(web.*.cpu, 'srv2')")
    assert set(out) == {"web.srv1.cpu"}


def test_remove_above_below(spark, samples):
    d = run(spark, samples, "removeAboveValue(web.srv1.cpu, 5)")
    s = next(iter(d.values()))
    assert s[50_000] == 5.0 and s[60_000] is None


def test_n_percentile_constant(spark, samples):
    d = run(spark, samples, "nPercentile(web.srv1.cpu, 100)")
    s = next(iter(d.values()))
    assert s[0] == 9.0 and s[90_000] == 9.0


def test_remove_empty_series(spark, samples):
    out = run(spark, samples, "removeEmptySeries(web.*.cpu)")
    assert set(out) == {"web.srv1.cpu", "web.srv2.cpu"}


# ----------------------------------------------------------- renaming


@pytest.mark.slow
def test_alias_family(spark, samples):
    out = run(spark, samples, "alias(web.srv1.cpu, 'x')")
    assert set(out) == {"x"}
    out = run(spark, samples, "aliasByMetric(web.srv1.cpu)")
    assert set(out) == {"cpu"}
    out = run(spark, samples, "aliasByNode(web.*.cpu, 1)")
    assert set(out) == {"srv1", "srv2"}
    out = run(
        spark, samples, "aliasSub(web.srv1.cpu, 'srv(\\d)', 'node\\1')"
    )
    assert set(out) == {"web.node1.cpu"}
    out = run(spark, samples, "substr(movingAverage(web.srv1.cpu,2), 0, 2)")
    assert set(out) == {"web.srv1"}


# --------------------------------------------------------- binary ops


def test_as_percent_and_divide(spark, samples):
    out = run(
        spark, samples, "divideSeries(web.srv2.cpu, web.srv1.cpu)"
    )
    s = next(iter(out.values()))
    assert s[30_000] == pytest.approx(2.0)
    # Go float division: 0/0 → NaN (transformDivideSeries never guards
    # the divisor); a nonzero/0 would be ±Inf
    assert s[0] is None or math.isnan(s[0])

    out = run(spark, samples, "asPercent(web.*.cpu, 10)")
    assert out["asPercent(web.srv1.cpu,10)"][50_000] == pytest.approx(50.0)


def test_sum_series_lists(spark, samples):
    out = run(spark, samples, "sumSeriesLists(web.srv1.cpu, web.srv2.cpu)")
    s = next(iter(out.values()))
    assert s[30_000] == 9.0


# ------------------------------------------------------------ sources


def test_constant_and_time(spark, samples):
    out = run(spark, samples, "constantLine(4.5)")
    s = out["4.5"]
    assert set(s.values()) == {4.5} and len(s) >= 2
    # time() defaults to its OWN 60s step (transformTimeFunction),
    # end-inclusive — not the render grid
    out = run(spark, samples, "time('t')")
    assert out["t"][60_000] == pytest.approx(60.0)
    assert 20_000 not in out["t"]
    out = run(spark, samples, "time('t', 10)")
    assert out["t"][20_000] == pytest.approx(20.0)


def test_random_walk_deterministic(spark, samples):
    a = run(spark, samples, "randomWalk('x')")["x"]
    b = run(spark, samples, "randomWalk('x')")["x"]
    assert a == b
    assert all(abs(v) < 5.0 for v in a.values())


# ---------------------------------------------------------------- tags


def test_series_by_tag_and_group_by_tags(spark, samples):
    out = run(spark, samples, "seriesByTag('role=db')")
    assert set(out) == {
        "db.srv1.mem;dc=east;role=db",
        "db.srv2.mem;dc=west;role=db",
    }
    # without 'name' among the tags the group key's name part is the
    # CALLBACK (formatKeyFromTags, transform.go:3997-4006) — both db
    # series share role=db and collapse into one summed series
    out = run(spark, samples, "groupByTags(seriesByTag('role=db'), 'sum', 'role')")
    assert set(out) == {"sum;role=db"}
    assert out["sum;role=db"][0] == pytest.approx(16.0)  # 7 + 9
    # selecting 'name' keeps per-series identity
    out = run(
        spark, samples,
        "groupByTags(seriesByTag('role=db'), 'sum', 'role', 'name')",
    )
    assert set(out) == {
        "db.srv1.mem;role=db",
        "db.srv2.mem;role=db",
    }
    out = run(
        spark, samples, "aliasByTags(seriesByTag('dc=east'), 'dc')"
    )
    assert set(out) == {"east"}


# ------------------------------------------------------------- modifiers


def test_consolidate_by(spark, samples):
    out = run(spark, samples, "consolidateBy(web.srv1.cpu, 'max')")
    s = next(iter(out.values()))
    assert s[10_000] == 1.0  # one sample per bucket: same as avg


def test_aggregate_line_keep_step(spark, samples):
    out = run(
        spark, samples, "aggregateLine(web.srv1.cpu, 'avg', true)"
    )
    s = next(iter(out.values()))
    assert len(s) == 10 and s[0] == pytest.approx(4.5)


def test_linear_regression_on_line(spark, samples):
    out = run(spark, samples, "linearRegression(web.srv1.cpu)")
    s = next(iter(out.values()))
    # srv1 is exactly linear: fit reproduces it
    assert s[30_000] == pytest.approx(3.0, abs=1e-9)


def test_ema_seed_is_first_window_average(spark, samples):
    out = run(
        spark, samples, "exponentialMovingAverage(web.srv1.cpu, 3)"
    )
    s = next(iter(out.values()))
    assert len(s) == 10
    # no extension data before t=0 → seed empty, first EMA = v
    assert s[0] == pytest.approx(0.0)
    c = 2.0 / 4.0
    assert s[10_000] == pytest.approx(c * 1.0 + (1 - c) * 0.0)


def test_holt_winters_forecast_shapes(spark, samples):
    out = run(
        spark, samples,
        "holtWintersForecast(web.srv1.cpu, '30s', '20s')",
    )
    s = next(iter(out.values()))
    assert len(s) == 10
    # alpha=0.1 smoothing: prediction at i=1 is intercept+slope+seasonal
    # from i=0 where intercept=v0=0, slope=0 → ~0
    assert s[10_000] == pytest.approx(0.0, abs=1e-9)


def test_holt_winters_bands_and_aberration(spark, samples):
    out = run(
        spark, samples,
        "holtWintersConfidenceBands(web.srv1.cpu, 3, '30s', '20s')",
    )
    names = set(out)
    assert names == {
        "holtWintersConfidenceUpper(web.srv1.cpu)",
        "holtWintersConfidenceLower(web.srv1.cpu)",
    }
    ab = run(
        spark, samples,
        "holtWintersAberration(web.srv1.cpu, 3, '30s', '20s')",
    )
    s = next(iter(ab.values()))
    assert len(s) == 10


def test_events_placeholder(spark, samples):
    out = run(spark, samples, "events('tag1')")
    s = out["events('tag1')"]
    assert len(s) == 10 and all(v is None for v in s.values())


def test_alias_query(spark, samples):
    out = run(
        spark, samples,
        "aliasQuery(web.srv1.cpu, 'srv1', 'srv2', 'last %d')",
    )
    # srv2's last value is 18
    assert set(out) == {"last 18"}


def test_alias_query_batched_jobs(spark, samples):
    """aliasQuery resolves every derived target in ONE union-plan
    aggregation pass: the Spark job count must NOT grow with the number
    of matched series (it used to run one sequential job per name)."""
    sc = spark.sparkContext

    def jobs_for(target, group):
        sc.setJobGroup(group, "job-count probe")
        try:
            out = run(spark, samples, target)
        finally:
            sc.setJobGroup(None, None)
        tracker = sc._jsc.sc().statusTracker()
        return out, len(tracker.getJobIdsForGroup(group))

    one, n_one = jobs_for(
        "aliasQuery(web.srv1.cpu, 'srv[0-9]+', 'srv2', 'last %d')", "aq-one"
    )
    both, n_both = jobs_for(
        "aliasQuery(web.*.cpu, 'srv[0-9]+', 'srv2', 'last %d')", "aq-two"
    )
    assert set(one) == {"last 18"}
    assert set(both) == {"last 18"}
    # doubling the series count may add at most a couple of AQE stages,
    # never a per-name evaluation job
    assert n_both <= n_one + 2, f"{n_both} jobs for 2 series vs {n_one} for 1"


def test_unsupported_function_raises(spark, samples):
    from victoriametrics_spark.graphite.evaluator import GraphiteEvalError

    with pytest.raises(GraphiteEvalError):
        run(spark, samples, "definitelyNotAFunction(web.srv1.cpu)")


@pytest.mark.slow
def test_apply_by_node_batched_jobs(spark, samples):
    """applyByNode with a pure-selector template collapses every prefix
    into ONE brace-glob evaluation: the job count must not grow with the
    prefix count (it used to build one subplan per prefix)."""
    sc = spark.sparkContext

    def jobs_for(target, group):
        sc.setJobGroup(group, "job-count probe")
        try:
            out = run(spark, samples, target)
        finally:
            sc.setJobGroup(None, None)
        tracker = sc._jsc.sc().statusTracker()
        return out, len(tracker.getJobIdsForGroup(group))

    one, n_one = jobs_for(
        "applyByNode(web.srv1.cpu, 1, '%.cpu')", "abn-one"
    )
    both, n_both = jobs_for(
        "applyByNode(web.*.cpu, 1, '%.cpu')", "abn-two"
    )
    assert set(one) == {"web.srv1.cpu"}
    assert set(both) == {"web.srv1.cpu", "web.srv2.cpu"}
    assert n_both <= n_one + 2, f"{n_both} jobs for 2 prefixes vs {n_one}"
    # batched output == union of the per-prefix evaluations
    manual = run(spark, samples, "web.srv1.cpu")
    manual.update(run(spark, samples, "web.srv2.cpu"))
    assert both == manual
    # function-call templates keep the per-prefix union path and still work
    fn_both = run(
        spark, samples, "applyByNode(web.*.cpu, 1, 'sumSeries(%.cpu)')"
    )
    assert len(fn_both) == 2


def test_target_parser_fuzz_no_foreign_exceptions():
    """Random token-soup targets either parse or raise ValueError —
    never any other exception class (crash-free public front-end)."""
    import random

    from victoriametrics_spark.graphite.parser import parse_target

    rng = random.Random(5)
    toks = [
        "sumSeries", "(", ")", ",", "a.b.*", "'lit'", '"x"', "1",
        "-2.5", "=", "alias", "seriesByTag", "{a,b}", "[0-9]", "|",
        "&", "servers.web01.cpu", "True", "None", ".", "#", "\\",
        "%", "group", " ", "summarize", "'1h'",
    ]
    for _ in range(3000):
        q = "".join(rng.choice(toks) for _ in range(rng.randint(1, 10)))
        try:
            parse_target(q)
        except ValueError:
            pass
