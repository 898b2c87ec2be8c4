"""Optimizer rewrites: cross-side filter pushdown (optimizer.go:16-96)
and common-subexpression reuse in the planner."""

from __future__ import annotations

from victoriametrics_spark import EvalConfig, evaluate
from victoriametrics_spark.metricsql import parse
from victoriametrics_spark.metricsql.ast import BinaryOpExpr, MetricExpr, RollupExpr, FuncExpr
from victoriametrics_spark.metricsql.optimizer import get_common_label_filters, optimize
from victoriametrics_spark.schema import SAMPLE_SCHEMA

CFG = EvalConfig(start=1_000_000, end=2_000_000, step=200_000)


def _selector_filters(e):
    """All (label, op, value) of the first selector group under e."""
    from victoriametrics_spark.metricsql.ast import AggrFuncExpr

    while not isinstance(e, MetricExpr):
        if isinstance(e, RollupExpr):
            e = e.expr
        elif isinstance(e, (FuncExpr, AggrFuncExpr)):
            e = e.args[0]
        else:
            raise AssertionError(f"no selector under {e!r}")
    return {(f.label, f.op, f.value) for f in e.label_filterss[0]}


def test_pushdown_binop_both_sides():
    e = optimize(parse('foo{a="1"} * bar{b="2"}'))
    assert isinstance(e, BinaryOpExpr)
    assert ("a", "=", "1") in _selector_filters(e.right)
    assert ("b", "=", "2") in _selector_filters(e.left)


def test_pushdown_through_rollup_and_aggr():
    e = optimize(parse('sum(rate(foo{job="x"}[5m])) by (job) / sum(rate(bar[5m])) by (job)'))
    assert ("job", "=", "x") in _selector_filters(e.right)


def test_pushdown_respects_on_modifier():
    e = optimize(parse('foo{a="1", b="2"} * on(a) bar'))
    rf = _selector_filters(e.right)
    assert ("a", "=", "1") in rf
    assert ("b", "=", "2") not in rf


def test_no_pushdown_for_or():
    e = optimize(parse('foo{a="1"} or bar{b="2"}'))
    assert ("a", "=", "1") not in _selector_filters(e.right)


def test_unless_pushes_left_filters_right_only():
    e = optimize(parse('foo{a="1"} unless bar'))
    assert ("a", "=", "1") in _selector_filters(e.right)
    # left unchanged beyond its own filters
    assert _selector_filters(e.left) == {("__name__", "=", "foo"), ("a", "=", "1")}


def test_aggr_without_modifier_blocks_pushdown():
    # sum() drops all labels → a filter from the other side must not reach
    # below the aggregate
    e = optimize(parse('sum(foo) / bar{a="1"}'))
    assert ("a", "=", "1") not in _selector_filters(e.left.args[0])


def test_common_filters_of_metric_or_groups():
    e = parse('foo{a="1", c="3" or a="1", b="2"}')
    lfs = {(f.label, f.op, f.value) for f in get_common_label_filters(e)}
    assert lfs == {("a", "=", "1")}


def test_pushdown_result_equivalence(spark):
    rows = []
    for ts in range(0, 2_100_000, 200_000):
        for t in ("x", "y"):
            rows.append(("foo", {"t": t}, ts, 1.0 if t == "x" else 5.0, False))
            rows.append(("bar", {"t": t}, ts, 2.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(
        spark, 'last_over_time(foo{t="x"}[200s]) * last_over_time(bar[200s])',
        df, CFG,
    )
    got = {(r["labels"]["t"], r["ts"]): r["value"] for r in out.collect()}
    assert set(k[0] for k in got) == {"x"}
    assert got[("x", 1_000_000)] == 2.0


def test_cse_reused_exchange(spark):
    rows = [
        ("m", {"j": "a"}, ts, float(ts), False)
        for ts in range(0, 2_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    # abs() makes the sides non-fusable (fusion handles aggregate-over-
    # rollup shapes only), so this exercises the planner CSE cache path
    out = evaluate(
        spark,
        "abs(sum_over_time(m[400s])) / abs(sum_over_time(m[400s]))",
        df, CFG,
    )
    assert {r["value"] for r in out.collect()} == {1.0}
    plan = out._jdf.queryExecution().executedPlan().toString()
    # identical subtrees must plan as one computation + ReusedExchange
    assert "ReusedExchange" in plan


def test_fused_identical_sides_single_aggregation(spark):
    # identical sides fuse into ONE aggregation (better than CSE+join)
    rows = [
        ("m", {"j": "a"}, ts, float(ts + 1), False)
        for ts in range(0, 2_100_000, 100_000)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(
        spark,
        "sum(sum_over_time(m[400s])) / sum(sum_over_time(m[400s]))",
        df, CFG,
    )
    assert {r["value"] for r in out.collect()} == {1.0}
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()


def test_or_pushes_intersected_filters_both_sides():
    # both branches carry x="1" → pushed into both; disjoint filters not
    e = optimize(parse('foo{x="1",a="2"} or bar{x="1",b="3"}'))
    assert isinstance(e, BinaryOpExpr)
    assert ("x", "=", "1") in _selector_filters(e.left)
    assert ("x", "=", "1") in _selector_filters(e.right)
    assert ("a", "=", "2") not in _selector_filters(e.right)
    assert ("b", "=", "3") not in _selector_filters(e.left)


def test_count_values_label_not_propagated():
    # count_values rewrites `lbl` with sample values; a filter on it must
    # not be pushed into the sibling (would silently empty the join)
    e = optimize(
        parse('count_values("lbl", foo{lbl="x",j="a"}) by (lbl, j) * bar')
    )
    assert ("lbl", "=", "x") not in _selector_filters(e.right)
    assert ("j", "=", "a") in _selector_filters(e.right)


def test_count_values_pushdown_into_it_drops_its_label():
    e = optimize(
        parse('bar{lbl="q",k="1"} * count_values("lbl", foo) by (lbl, k)')
    )
    # k filter reaches foo; the stale lbl filter must not
    inner = _selector_filters(e.right.args[1])
    assert ("k", "=", "1") in inner
    assert ("lbl", "=", "q") not in inner


def _fused_rows(spark, df, q):
    out = evaluate(spark, q, df, CFG)
    return {
        (tuple(sorted((r["labels"] or {}).items())), r["ts"]): round(r["value"], 9)
        for r in out.collect()
    }


def test_fused_same_source_binop_values(spark):
    rows = []
    for ts in range(0, 2_100_000, 100_000):
        rows.append(("m", {"s": "a", "g": "x"}, ts, 10.0, False))
        rows.append(("m", {"s": "b", "g": "x"}, ts, 4.0, False))
        if ts <= 1_200_000:  # side b missing later at g=y
            rows.append(("m", {"s": "b", "g": "y"}, ts, 2.0, False))
        rows.append(("m", {"s": "a", "g": "y"}, ts, 6.0, False))
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    q = (
        'sum(sum_over_time(m{s="a"}[200s])) by (g)'
        ' / sum(sum_over_time(m{s="b"}[200s])) by (g)'
    )
    got = _fused_rows(spark, df, q)
    # manual expectation from separately evaluated sides
    la = _fused_rows(spark, df, 'sum(sum_over_time(m{s="a"}[200s])) by (g)')
    lb = _fused_rows(spark, df, 'sum(sum_over_time(m{s="b"}[200s])) by (g)')
    want = {
        k: round(la[k] / lb[k], 9) for k in la if k in lb
    }
    assert got == want
    # inner-join semantics: g=y cells where side b has no data are absent
    assert ((("g", "y"),), 2_000_000) not in got
    assert ((("g", "y"),), 1_000_000) in got


def test_fused_binop_single_scan_plan(spark, sf_dir):
    from victoriametrics_spark.sources.events import events_as_samples

    samples = events_as_samples(spark, sf_dir)
    cfg = EvalConfig(
        start=1704067200000, end=1704240000000, step=21_600_000
    )
    out = evaluate(
        spark,
        'sum(sum_over_time(events_value{event_type="purchase"}[1d]))'
        ' / sum(sum_over_time(events_value{event_type="click"}[1d]))',
        samples, cfg,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert len(re.findall(r"Scan parquet|FileScan parquet", plan)) == 1
    assert out.count() > 0


def test_fused_not_applied_on_mismatched_shapes(spark):
    # different aggregate names must fall back to the join plan and still
    # produce correct results
    rows = [
        ("m", {"s": t}, ts, float(i + 1), False)
        for ts in range(0, 2_100_000, 100_000)
        for i, t in enumerate(["a", "b"])
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA)
    out = evaluate(
        spark,
        'sum(sum_over_time(m{s="a"}[200s])) / max(sum_over_time(m{s="b"}[200s]))',
        df, CFG,
    )
    vals = {r["value"] for r in out.collect()}
    assert vals == {0.5}
