"""MetricsQL AST → query-string serializer.

Backs the ``/prettify-query`` and ``/expand-with-exprs`` debug routes
(reference: app/vmselect/main.go prettify-query / expand-with-exprs
handlers; the reference prettifier lives in metricsql.Prettify). The
output is the canonical single-line normalized form — parseable back to
an identical AST (round-trip asserted in tests/test_serialize.py).
"""

from __future__ import annotations

import json

from victoriametrics_spark.metricsql.ast import (
    AggrFuncExpr,
    BinaryOpExpr,
    DurationExpr,
    Expr,
    FuncExpr,
    MetricExpr,
    ModifierExpr,
    NumberExpr,
    RollupExpr,
    StringExpr,
)


def _num(v: float) -> str:
    if v != v:  # NaN
        return "NaN"
    if v in (float("inf"), float("-inf")):
        return "Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _filters(group) -> str:
    return ", ".join(
        f"{f.label}{f.op}{json.dumps(f.value)}" for f in group
    )


def _metric(me: MetricExpr) -> str:
    if me.is_empty():
        return "{}"
    name = me.metric_name()
    simple_name = name is not None and all(
        any(f.label == "__name__" and f.op == "=" for f in g)
        for g in me.label_filterss
    )
    if simple_name:
        groups = [
            [f for f in g if not (f.label == "__name__" and f.op == "=")]
            for g in me.label_filterss
        ]
        if all(not g for g in groups) and len(groups) == 1:
            return name
        body = " or ".join(_filters(g) if g else "{}" for g in groups)
        # an empty OR alternative can't render inside braces; fall back
        if any(not g for g in groups) and len(groups) > 1:
            return "{" + " or ".join(_filters(g) for g in me.label_filterss) + "}"
        return f"{name}{{{body}}}"
    return "{" + " or ".join(_filters(g) for g in me.label_filterss) + "}"


def _modifier(m: ModifierExpr | None) -> str:
    if m is None:
        return ""
    return f" {m.op} ({', '.join(m.args)})"


def _paren(e: Expr, s: str) -> str:
    """Parenthesize operands whose re-parse would rebind otherwise."""
    if isinstance(e, BinaryOpExpr):
        return f"({s})"
    return s


def to_query_string(e: Expr) -> str:
    if isinstance(e, NumberExpr):
        return _num(e.value)
    if isinstance(e, StringExpr):
        return json.dumps(e.value)
    if isinstance(e, DurationExpr):
        return e.text
    if isinstance(e, MetricExpr):
        return _metric(e)
    if isinstance(e, RollupExpr):
        child = to_query_string(e.expr)
        if not isinstance(e.expr, MetricExpr):
            child = f"({child})"
        return child + _rollup_suffix(e)
    if isinstance(e, FuncExpr):
        args = ", ".join(to_query_string(a) for a in e.args)
        out = f"{e.name}({args})"
        if e.keep_metric_names:
            out += " keep_metric_names"
        return out
    if isinstance(e, AggrFuncExpr):
        args = ", ".join(to_query_string(a) for a in e.args)
        out = f"{e.name}({args})"
        out += _modifier(e.modifier)
        if e.limit:
            out += f" limit {e.limit}"
        return out
    if isinstance(e, BinaryOpExpr):
        left = _paren(e.left, to_query_string(e.left))
        right = _paren(e.right, to_query_string(e.right))
        if _pow_base_needs_parens(e):
            left = f"({left})"
        out = f"{left} {_binop_mid(e)} {right}"
        if e.keep_metric_names:
            out += " keep_metric_names"
        return out
    raise TypeError(f"cannot serialize {e!r}")


def _pow_base_needs_parens(e: "BinaryOpExpr") -> bool:
    """`^` binds tighter than unary minus: a negative number or
    duration base must keep its parens or `-3 ^ 1` re-parses as
    `-(3 ^ 1)` (same for `(-5m) ^ 2`). Shared by the single-line
    serializer AND the prettifier (a divergence here once dropped the
    guard from one of them)."""
    return e.op == "^" and (
        (isinstance(e.left, NumberExpr) and e.left.value < 0)
        or (
            isinstance(e.left, DurationExpr)
            and e.left.text.strip().startswith("-")
        )
    )


# ------------------------------------------------------------ prettify
# Multi-line pretty-printing of a MetricsQL AST — the metricsql.Prettify
# analog (vendor/.../metricsql/prettifier.go): a node whose single-line
# form fits in MAX_PRETTY_LINE chars stays on one line; longer nodes
# split by type exactly like the reference (binops put the operator on
# its own indented line, functions put one argument per line, metric
# selectors put each OR-group of filters on its own line). One
# deviation: WITH templates are expanded before prettifying (our parser
# expands eagerly); the output is still a canonical parseable query.

MAX_PRETTY_LINE = 80


def _ind(n: int) -> str:
    return "  " * n


def _binop_mid(e: BinaryOpExpr) -> str:
    mid = e.op
    if e.bool_modifier:
        mid += " bool"
    mid += _modifier(e.group_modifier)
    mid += _modifier(e.join_modifier)
    if e.join_modifier_prefix is not None:
        mid += f" prefix {json.dumps(e.join_modifier_prefix)}"
    if e.fill_left is not None and e.fill_left == e.fill_right:
        mid += f" fill({_num(e.fill_left)})"
    else:
        if e.fill_left is not None:
            mid += f" fill_left({_num(e.fill_left)})"
        if e.fill_right is not None:
            mid += f" fill_right({_num(e.fill_right)})"
    return mid


def _rollup_suffix(e: RollupExpr) -> str:
    out = ""
    if e.window is not None or e.step is not None or e.inherit_step:
        w = e.window.text if e.window is not None else ""
        if e.step is not None:
            out += f"[{w}:{e.step.text}]"
        elif e.inherit_step:
            out += f"[{w}:]"
        else:
            out += f"[{w}]"
    if e.offset is not None:
        out += f" offset {e.offset.text}"
    if e.at is not None:
        at = to_query_string(e.at)
        if not isinstance(e.at, (NumberExpr, DurationExpr, MetricExpr)):
            at = f"({at})"
        out += f" @ {at}"
    if e.keep_metric_names:
        out += " keep_metric_names"
    return out


def _pretty_func_args(args, indent: int) -> str:
    lines = ["("]
    for i, a in enumerate(args):
        tail = "," if i + 1 < len(args) else ""
        lines.append(_pretty(a, indent + 1, False) + tail)
    lines.append(_ind(indent) + ")")
    return "\n".join(lines)


def _pretty_filter_group(group, indent: int) -> str:
    one = _ind(indent) + _filters(group)
    if len(one) <= MAX_PRETTY_LINE:
        return one
    return ",\n".join(
        _ind(indent) + f"{f.label}{f.op}{json.dumps(f.value)}"
        for f in group
    )


def _pretty(e: Expr, indent: int, need_parens: bool) -> str:
    one = to_query_string(e)
    if need_parens:
        one = f"({one})"
    line = _ind(indent) + one
    if len(line) <= MAX_PRETTY_LINE:
        return line

    prefix = suffix = ""
    if need_parens:
        prefix = _ind(indent) + "(\n"
        suffix = "\n" + _ind(indent) + ")"
        indent += 1

    if isinstance(e, BinaryOpExpr):
        kmn = e.keep_metric_names
        if kmn:
            prefix += _ind(indent) + "(\n"
            suffix = "\n" + _ind(indent) + ") keep_metric_names" + suffix
            indent += 1
        body = (
            _pretty(
                e.left,
                indent,
                isinstance(e.left, BinaryOpExpr)
                or _pow_base_needs_parens(e),
            )
            + "\n"
            + _ind(indent + 1)
            + _binop_mid(e)
            + "\n"
            + _pretty(e.right, indent, isinstance(e.right, BinaryOpExpr))
        )
        return prefix + body + suffix
    if isinstance(e, RollupExpr):
        body = _pretty(
            e.expr, indent, not isinstance(e.expr, MetricExpr)
        ) + _rollup_suffix(e)
        return prefix + body + suffix
    if isinstance(e, (FuncExpr, AggrFuncExpr)):
        body = _ind(indent) + e.name + _pretty_func_args(e.args, indent)
        if isinstance(e, AggrFuncExpr):
            body += _modifier(e.modifier)
            if e.limit:
                body += f" limit {e.limit}"
        elif e.keep_metric_names:
            body += " keep_metric_names"
        return prefix + body + suffix
    if isinstance(e, MetricExpr) and not e.is_empty():
        name = e.metric_name()
        simple_name = name is not None and all(
            any(f.label == "__name__" and f.op == "=" for f in g)
            for g in e.label_filterss
        )
        if simple_name:
            groups = [
                [
                    f
                    for f in g
                    if not (f.label == "__name__" and f.op == "=")
                ]
                for g in e.label_filterss
            ]
            head = name
            if all(not g for g in groups) and len(groups) == 1:
                # a bare metric name longer than the budget: nothing
                # to split — emit as-is instead of `name{\n\n}`
                return prefix + _ind(indent) + name + suffix
            if any(not g for g in groups) and len(groups) > 1:
                groups = e.label_filterss
                head = ""
        else:
            groups = e.label_filterss
            head = ""
        lines = [_ind(indent) + (head or "") + "{"]
        for i, g in enumerate(groups):
            lines.append(_pretty_filter_group(g, indent + 1))
            if i + 1 < len(groups):
                lines.append(_ind(indent + 2) + "or")
        lines.append(_ind(indent) + "}")
        return prefix + "\n".join(lines) + suffix
    # scalars / strings / durations: nothing to split
    return prefix + _ind(indent) + to_query_string(e) + suffix


def prettify(e: Expr) -> str:
    """Prettified multi-line representation (metricsql.Prettify)."""
    return _pretty(e, 0, False)
