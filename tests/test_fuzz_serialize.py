"""Property-based fuzz of the parser↔serializer fixed point.

Hypothesis builds random MetricsQL expression STRINGS from a grammar
(selectors with all filter ops and OR-groups, rollups with windows/
steps/offsets/@, unary/binary ops with bool + vector-matching
modifiers, aggregates with by/without/limit, transforms, WITH-free
numeric literals incl. durations), then asserts the engine's exact
cache-identity bar: ``parse(to_query_string(parse(q)))`` must equal
``parse(q)`` by repr. Pure Python — no Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from victoriametrics_spark.metricsql import parse
from victoriametrics_spark.metricsql.serialize import to_query_string

name = st.sampled_from(["m", "http_requests_total", "foo_bar", "a:b:c"])
label = st.sampled_from(["job", "instance", "a", "x_y"])
# values exercise the string-escaping path
value = st.sampled_from(["b", "a b", 'q"x', "re.*", "", "\\d+", "ü"])
flt_op = st.sampled_from(["=", "!=", "=~", "!~"])
dur = st.sampled_from(["5m", "1h", "30s", "1h30m", "1d", "300"])


@st.composite
def selector(draw):
    n = draw(name) if draw(st.booleans()) else ""
    groups = []
    for _ in range(draw(st.integers(0, 2))):
        flts = [
            f'{draw(label)}{draw(flt_op)}"{draw(value).replace(chr(92), chr(92)*2).replace(chr(34), chr(92) + chr(34))}"'
            for _ in range(draw(st.integers(1, 3)))
        ]
        groups.append(", ".join(flts))
    if not n and not groups:
        n = draw(name)
    if groups:
        return f"{n}{{{' or '.join(groups)}}}"
    return n


@st.composite
def rollup_arg(draw):
    sel = draw(selector())
    win = draw(st.sampled_from(["[5m]", "[1h]", "[1h:5m]", "[1h:]", ""]))
    if not win:
        win = "[5m]"
    off = draw(st.sampled_from(["", " offset 1h", " offset -30m"]))
    at = draw(st.sampled_from(["", " @ 1700000000", " @ start()", " @ end()"]))
    return f"{sel}{win}{off}{at}"


@st.composite
def expr(draw, depth=2):
    kind = draw(
        st.sampled_from(
            ["num", "sel", "rollup", "agg", "binop", "transform", "unary"]
            if depth > 0
            else ["num", "sel", "rollup"]
        )
    )
    if kind == "num":
        return draw(st.sampled_from(["1", "2.5", "-3", "1e3", "0.5", "5m", "NaN", "Inf"]))
    if kind == "sel":
        return draw(selector())
    if kind == "rollup":
        fn = draw(st.sampled_from(["rate", "increase", "avg_over_time", "changes"]))
        kmn = draw(st.sampled_from(["", " keep_metric_names"]))
        return f"{fn}({draw(rollup_arg())}){kmn}"
    if kind == "agg":
        fn = draw(st.sampled_from(["sum", "avg", "topk", "quantile", "count"]))
        inner = draw(expr(depth=depth - 1))
        if fn in ("topk", "quantile"):
            inner = f"2, {inner}"
        mod = draw(st.sampled_from(["", " by (a)", " without (a, b)", " by (a) limit 2"]))
        return f"{fn}({inner}){mod}"
    if kind == "transform":
        fn = draw(st.sampled_from(["abs", "ceil", "clamp_max", "label_set"]))
        inner = draw(expr(depth=depth - 1))
        if fn == "clamp_max":
            return f"{fn}({inner}, 10)"
        if fn == "label_set":
            return f'{fn}({inner}, "a", "b")'
        return f"{fn}({inner})"
    if kind == "unary":
        return f"-({draw(expr(depth=depth - 1))})"
    # binop
    op = draw(st.sampled_from(["+", "-", "*", "/", ">", "<=", "and", "or", "unless", "^", "%"]))
    b = draw(st.sampled_from(["", " bool "])) if op in (">", "<=") else " "
    vm = draw(
        st.sampled_from(["", " on(x) ", " ignoring(x, y) ", " on(x) group_left() ", " on() group_right(z) "])
    )
    lhs = draw(expr(depth=depth - 1))
    rhs = draw(expr(depth=depth - 1))
    sep = vm if vm else (b if b else " ")
    return f"({lhs}) {op}{sep}({rhs})"


@settings(max_examples=300, deadline=None)
@given(expr())
def test_parse_serialize_fixed_point(q):
    try:
        ast1 = parse(q)
    except Exception:
        # grammar may compose a few genuinely invalid forms (e.g. bool
        # on set ops); only VALID queries are in scope for round-trip
        return
    s = to_query_string(ast1)
    ast2 = parse(s)
    assert repr(ast2) == repr(ast1), f"{q!r} -> {s!r}"
    # serialization is a fixed point: serialize(parse(s)) == s
    assert to_query_string(ast2) == s


@settings(max_examples=300, deadline=None)
@given(expr())
def test_prettify_round_trips(q):
    """prettify output must re-parse to the identical AST (the
    metricsql.Prettify contract) for every valid generated query."""
    from victoriametrics_spark.metricsql.serialize import prettify

    try:
        ast1 = parse(q)
    except Exception:
        return
    p = prettify(ast1)
    assert repr(parse(p)) == repr(ast1), f"{q!r} -> {p!r}"


def test_metricsql_parser_fuzz_no_foreign_exceptions():
    """Token-soup MetricsQL inputs either parse or raise ValueError —
    the public front-end must be crash-free on garbage."""
    import random

    rng = random.Random(3)
    toks = [
        "sum", "rate", "(", ")", "[", "]", "{", "}", "m", "5m", "by",
        "on", "+", "-", "*", "/", "^", "and", "or", "unless",
        "offset", "@", "bool", '"a"', "'b'", "1", "0.5", ",", "=",
        "!=", "=~", "job", "group_left", "with", "keep_metric_names",
        "topk", "quantile", "NaN", "Inf", ":", "default", "le",
        "without", "limit", "if", "!~", "<",
    ]
    for _ in range(3000):
        q = " ".join(rng.choice(toks) for _ in range(rng.randint(1, 12)))
        try:
            parse(q)
        except ValueError:
            pass
