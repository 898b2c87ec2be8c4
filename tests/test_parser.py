"""MetricsQL parser unit tests (no Spark needed)."""

from __future__ import annotations

import math

import pytest

from victoriametrics_spark.metricsql import (
    AggrFuncExpr,
    BinaryOpExpr,
    DurationExpr,
    FuncExpr,
    MetricExpr,
    NumberExpr,
    RollupExpr,
    StringExpr,
    parse,
)
from victoriametrics_spark.metricsql.lexer import parse_number, tokenize


def test_lexer_basic():
    toks = tokenize('foo{bar="baz"} + rate(m[5m]) # comment')
    kinds = [t.kind for t in toks]
    assert kinds[-1] == "EOF"
    texts = [t.text for t in toks if t.kind != "EOF"]
    assert texts == ["foo", "{", "bar", "=", "baz", "}", "+", "rate", "(", "m", "[", "5m", "]", ")"]


def test_lexer_numbers():
    assert parse_number("1.5") == 1.5
    assert parse_number("0x1f") == 31.0
    assert parse_number("1k") == 1000.0
    assert parse_number("1Ki") == 1024.0
    assert parse_number("2.5M") == 2.5e6
    assert parse_number("Inf") == math.inf
    assert math.isnan(parse_number("NaN"))


def test_duration_ms():
    assert DurationExpr("5m").ms(0) == 300_000
    assert DurationExpr("1h30m").ms(0) == 5_400_000
    assert DurationExpr("1.5d").ms(0) == 129_600_000
    assert DurationExpr("300").ms(0) == 300_000  # bare number = seconds
    assert DurationExpr("2i").ms(30_000) == 60_000
    assert DurationExpr("-5m").ms(0) == -300_000
    assert DurationExpr("100ms").ms(0) == 100


def test_plain_metric():
    e = parse("http_requests_total")
    assert isinstance(e, MetricExpr)
    assert e.metric_name() == "http_requests_total"


def test_selector_filters():
    e = parse('foo{a="1", b!="2", c=~"x.*", d!~"y"}')
    assert isinstance(e, MetricExpr)
    (g,) = e.label_filterss
    assert [f.op for f in g] == ["=", "=", "!=", "=~", "!~"]
    assert g[0].label == "__name__" and g[0].value == "foo"


def test_selector_or_groups():
    e = parse('foo{a="1" or b="2", c="3"}')
    assert isinstance(e, MetricExpr)
    assert len(e.label_filterss) == 2
    assert [f.label for f in e.label_filterss[0]] == ["__name__", "a"]
    assert [f.label for f in e.label_filterss[1]] == ["__name__", "b", "c"]


def test_rollup_window():
    e = parse("m[5m]")
    assert isinstance(e, RollupExpr)
    assert e.window.ms(0) == 300_000
    assert not e.is_subquery


def test_subquery():
    e = parse("max_over_time(rate(m[1m])[5m:30s])")
    assert isinstance(e, FuncExpr)
    (r,) = e.args
    assert isinstance(r, RollupExpr)
    assert r.is_subquery
    assert r.step.ms(0) == 30_000
    assert isinstance(r.expr, FuncExpr)


def test_offset_and_at():
    e = parse("m offset 1h @ 1609746000")
    assert isinstance(e, RollupExpr)
    assert e.offset.ms(0) == 3_600_000
    assert isinstance(e.at, NumberExpr)
    e2 = parse("m offset -30m")
    assert e2.offset.ms(0) == -1_800_000


def test_aggr_modifiers():
    e = parse("sum by (job, instance) (rate(m[5m]))")
    assert isinstance(e, AggrFuncExpr)
    assert e.modifier.op == "by"
    assert e.modifier.args == ["job", "instance"]
    e2 = parse("sum(rate(m[5m])) without (job) limit 10")
    assert e2.modifier.op == "without"
    assert e2.limit == 10


def test_binop_precedence():
    e = parse("a + b * c")
    assert isinstance(e, BinaryOpExpr) and e.op == "+"
    assert isinstance(e.right, BinaryOpExpr) and e.right.op == "*"
    e2 = parse("a ^ b ^ c")  # right associative
    assert e2.op == "^" and isinstance(e2.right, BinaryOpExpr)
    e3 = parse("a or b and c")
    assert e3.op == "or" and isinstance(e3.right, BinaryOpExpr)
    e4 = parse("a == 1 + 2")
    assert e4.op == "==" and isinstance(e4.right, BinaryOpExpr)


def test_binop_modifiers():
    e = parse('a * on(job) group_left(instance) prefix "x_" b')
    assert e.group_modifier.op == "on" and e.group_modifier.args == ["job"]
    assert e.join_modifier.op == "group_left"
    assert e.join_modifier.args == ["instance"]
    assert e.join_modifier_prefix == "x_"
    e2 = parse("a >bool 1")
    assert e2.bool_modifier


def test_comparison_default_if():
    e = parse("a default 0")
    assert e.op == "default"
    e2 = parse("a if b ifnot c")
    assert e2.op in ("if", "ifnot")


def test_unary_minus():
    e = parse("-m")
    assert isinstance(e, BinaryOpExpr) and e.op == "*"
    assert isinstance(e.left, NumberExpr) and e.left.value == -1.0
    assert parse("-5").value == -5.0


def test_number_arith_parses():
    e = parse("1 + 2 * 3")
    assert isinstance(e, BinaryOpExpr)


def test_keep_metric_names():
    e = parse("rate(m[5m]) keep_metric_names")
    assert isinstance(e, FuncExpr) and e.keep_metric_names


def test_with_simple():
    e = parse('WITH (m = foo{a="b"}) rate(m[5m])')
    assert isinstance(e, FuncExpr)
    r = e.args[0]
    assert isinstance(r, RollupExpr)
    me = r.expr
    assert isinstance(me, MetricExpr)
    labels = [f.label for f in me.label_filterss[0]]
    assert "__name__" in labels and "a" in labels


def test_with_filter_merge():
    e = parse('WITH (m = foo{a="b"}) m{c="d"}')
    assert isinstance(e, MetricExpr)
    labels = [f.label for f in e.label_filterss[0]]
    assert labels == ["__name__", "a", "c"]


def test_with_function_template():
    e = parse("WITH (f(q) = sum(rate(q[5m]))) f(http_requests_total)")
    assert isinstance(e, AggrFuncExpr) and e.name == "sum"
    rate = e.args[0]
    assert isinstance(rate, FuncExpr) and rate.name == "rate"
    inner = rate.args[0]
    assert isinstance(inner, RollupExpr)
    assert inner.expr.metric_name() == "http_requests_total"


def test_union_parens():
    e = parse("(a, b)")
    assert isinstance(e, FuncExpr) and e.name == "union"
    assert len(e.args) == 2


def test_quoted_metric_name():
    e = parse('{"метрика", a="1"}')
    assert isinstance(e, MetricExpr)
    assert e.label_filterss[0][0].value == "метрика"


def test_quantile_args():
    e = parse("quantile(0.95, m)")
    assert isinstance(e, AggrFuncExpr)
    assert isinstance(e.args[0], NumberExpr) and e.args[0].value == 0.95


def test_duration_as_number():
    e = parse("time() % 1h")
    assert isinstance(e, BinaryOpExpr) and e.op == "%"
    assert isinstance(e.right, DurationExpr)


def test_parse_errors():
    for bad in ["sum(", "foo{a=}", "m[", "1 +", "foo{", ")"]:
        with pytest.raises(ValueError):
            parse(bad)
