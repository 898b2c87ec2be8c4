"""MetricsQL serializer (victoriametrics_spark/metricsql/serialize.py):
every serialized form must parse back to an IDENTICAL AST — repr() is
the engine's cache identity, so round-trip equality is the exact bar.
Backs /prettify-query and /expand-with-exprs (app/vmselect/main.go)."""
from __future__ import annotations

import pytest

from victoriametrics_spark.metricsql import parse
from victoriametrics_spark.metricsql.serialize import to_query_string

ROUND_TRIP = [
    "m",
    'm{a="b"}',
    'm{a="b", c!="d", e=~"f.*", g!~"h"}',
    '{__name__=~"m.*"}',
    'm{a="b" or c="d"}',
    '{a="b" or c="d", e="f"}',
    "rate(m[5m])",
    "sum(rate(m[5m])) by (a, b)",
    "sum(m) without (x) limit 3",
    "avg_over_time(m[1h:5m])",
    "max_over_time(m[1h:])",
    "m[5m:1m]",
    "rate(m[5m] offset 1h)",
    "rate(m[5m] offset -30m)",
    "last_over_time(m[5m] @ 1700000000)",
    "sum(m) @ end()",
    "rate(m[5m]) keep_metric_names",
    "a / on(x) group_left(y) b",
    "a / on(x) group_left() b",
    "a + bool b",
    "a unless ignoring(z) b",
    'a / on(x) group_left() prefix "p_" b',
    "a + fill(0) b",
    "a / fill_left(1) fill_right(2) b",
    "(a + b) * c",
    "a + b * c",
    "quantile(0.9, m)",
    'label_set(m, "a", "b")',
    "-m",
    "1 - m",
    "m > 0.5",
    "clamp_max(rate(m[1m]), 10)",
    "topk_max(3, m)",
    'topk_max(3, m, "other")',
    "histogram_quantile(0.95, sum(increase(b[5m])) by (le))",
    'alias(m, "x")',
    "round(m, 0.01)",
    "2 ^ 3 ^ 2",
    "(-3) ^ 2",
    "(-5m) ^ 2",
    "-3 ^ 2",
    "m offset 1h",
    'WITH (f(x) = rate(x[5m])) sum(f(m))',
    'WITH (t = m{a="b"}) t offset 5m',
]


@pytest.mark.parametrize("q", ROUND_TRIP)
def test_round_trip(q):
    e = parse(q)
    s = to_query_string(e)
    e2 = parse(s)
    assert repr(e2) == repr(e), f"{q!r} → {s!r}"


def test_with_expansion_serializes_to_plain_metricsql():
    s = to_query_string(
        parse('WITH (f(x) = rate(x[5m])) sum(f(m{job="a"})) by (job)')
    )
    assert "WITH" not in s and "f(" not in s
    assert repr(parse(s)) == repr(parse('sum(rate(m{job="a"}[5m])) by (job)'))


def test_prettify_shapes():
    """Short queries stay one line; long ones split like the reference
    prettifier (operator on its own line, one function arg per line,
    filters inside braces on their own lines)."""
    from victoriametrics_spark.metricsql.serialize import prettify

    assert prettify(parse("rate(m[5m])")) == "rate(m[5m])"
    long_q = (
        'sum(rate(http_requests_total{job="very-long-job-name-here",'
        'instance="some-long-instance:9090",code=~"5.."}[5m]))'
        " by (job) / on (job) group_left () "
        'sum(rate(http_requests_total{job="very-long-job-name-here"}'
        "[5m])) by (job)"
    )
    p = prettify(parse(long_q))
    lines = p.split("\n")
    assert len(lines) > 5
    # the binop operator sits alone on an indented line
    assert any(l.strip().startswith("/ on (job)") for l in lines)
    # filters split one per line inside the braces
    assert any(l.strip() == 'code=~"5.."' for l in lines)
    assert repr(parse(p)) == repr(parse(long_q))
