"""AST rewrites (the port of vendor/.../metricsql/optimizer.go:16-96).

Cross-side filter pushdown: ``foo{f1} * bar{f2}`` scans two series sets
whose join keys must match, so every common label filter can be ANDed
into BOTH sides: ``foo{f1,f2} * bar{f1,f2}``. At 100 TB this is the
difference between scanning one series subset and the whole table — the
added selector predicates reach the Parquet scan through Catalyst's
ordinary pushdown.

The rules mirror getCommonLabelFilters (optimizer.go:98-208):
- `or` intersects both sides' filters, everything else unions them;
- `unless` / `ifnot` propagate only the left side;
- on()/ignoring() trims the pushable set to the join key;
- group_left/group_right trim only the "many" side's contribution;
- by()/without() aggregations trim to the surviving labels;
- label-mutating transforms conservatively stop propagation (a filter on
  a rewritten label must not be pushed below the rewrite).
"""

from __future__ import annotations

from dataclasses import replace

from victoriametrics_spark.metricsql.ast import (
    AggrFuncExpr,
    BinaryOpExpr,
    Expr,
    FuncExpr,
    LabelFilter,
    MetricExpr,
    ModifierExpr,
    RollupExpr,
)

# transforms that change the label set → stop filter propagation through
# them (VM handles several precisely; conservative here is always correct)
_LABEL_MUTATORS = {
    "label_set", "label_replace", "label_join", "label_map", "label_transform",
    "label_copy", "label_move", "label_del", "label_keep", "label_uppercase",
    "label_lowercase", "label_value", "label_graphite_group", "drop_common_labels",
    "count_values_over_time", "quantiles_over_time", "histogram_over_time",
    "rollup", "rollup_candlestick", "rollup_delta", "rollup_deriv",
    "rollup_increase", "rollup_rate", "rollup_scrape_interval", "aggr_over_time",
    "prometheus_buckets", "buckets_limit", "histogram_quantile",
    "histogram_quantiles", "histogram_share", "histogram_fraction",
    "histogram_avg", "histogram_stddev", "histogram_stdvar",
    "absent", "absent_over_time", "scalar", "vector",
}


def _key(f: LabelFilter) -> tuple[str, str, str]:
    return (f.label, f.op, f.value)


def _union(a: list[LabelFilter], b: list[LabelFilter]) -> list[LabelFilter]:
    seen = {_key(f) for f in a}
    out = list(a)
    for f in b:
        if _key(f) not in seen:
            seen.add(_key(f))
            out.append(f)
    return out


def _intersect(a: list[LabelFilter], b: list[LabelFilter]) -> list[LabelFilter]:
    bk = {_key(f) for f in b}
    return [f for f in a if _key(f) in bk]


def _trim_by_group_modifier(
    lfs: list[LabelFilter], mod: ModifierExpr | None
) -> list[LabelFilter]:
    """on(keys) keeps only filters on the join keys; ignoring(keys) drops
    filters on the ignored keys (TrimFiltersByGroupModifier)."""
    if mod is None:
        return lfs
    keys = {str(k) for k in mod.args}
    if mod.op == "on":
        return [f for f in lfs if f.label in keys]
    if mod.op == "ignoring":
        return [f for f in lfs if f.label not in keys]
    return lfs


def _trim_by_aggr_modifier(
    lfs: list[LabelFilter], mod: ModifierExpr | None
) -> list[LabelFilter]:
    if mod is None:
        return []  # aggregation drops all labels by default
    keys = {str(k) for k in mod.args}
    if mod.op == "by":
        return [f for f in lfs if f.label in keys]
    return [f for f in lfs if f.label not in keys]  # without


def _series_arg(fe: FuncExpr) -> Expr | None:
    """The series-typed argument a transform/rollup passes through."""
    from victoriametrics_spark.engine.rollup import ROLLUP_ARG_IDX

    if not fe.args:
        return None
    idx = ROLLUP_ARG_IDX.get(fe.name, 0)
    if idx < len(fe.args):
        return fe.args[idx]
    return fe.args[0]


def get_common_label_filters(e: Expr) -> list[LabelFilter]:
    if isinstance(e, MetricExpr):
        if not e.label_filterss:
            return []
        common: list[LabelFilter] | None = None
        for group in e.label_filterss:
            fs = [f for f in group if f.label != "__name__"]
            common = fs if common is None else _intersect(common, fs)
        return common or []
    if isinstance(e, RollupExpr):
        return get_common_label_filters(e.expr)
    if isinstance(e, FuncExpr):
        if e.name in _LABEL_MUTATORS:
            return []
        if e.name in ("", "union", "range_normalize"):
            if not e.args:
                return []
            out = get_common_label_filters(e.args[0])
            for a in e.args[1:]:
                out = _intersect(out, get_common_label_filters(a))
            return out
        arg = _series_arg(e)
        return get_common_label_filters(arg) if arg is not None else []
    if isinstance(e, AggrFuncExpr):
        if not e.args:
            return []
        inner = e.args[-1] if e.name in ("quantiles",) else e.args[
            {"quantile": 1, "topk": 1, "bottomk": 1, "limitk": 1, "outliersk": 1,
             "outliers_mad": 1, "count_values": 1}.get(e.name, 0)
            if len(e.args) > 1 else 0
        ]
        lfs = get_common_label_filters(inner)
        lfs = _drop_count_values_label(e, lfs)
        return _trim_by_aggr_modifier(lfs, e.modifier)
    if isinstance(e, BinaryOpExpr):
        lfs_l = get_common_label_filters(e.left)
        lfs_r = get_common_label_filters(e.right)
        op = e.op.lower()
        if op == "or":
            return _trim_by_group_modifier(_intersect(lfs_l, lfs_r), e.group_modifier)
        if op in ("unless", "ifnot"):
            return _trim_by_group_modifier(lfs_l, e.group_modifier)
        jm = e.join_modifier.op if e.join_modifier else None
        if jm == "group_left":
            return _union(lfs_l, _trim_by_group_modifier(lfs_r, e.group_modifier))
        if jm == "group_right":
            return _union(_trim_by_group_modifier(lfs_l, e.group_modifier), lfs_r)
        return _trim_by_group_modifier(_union(lfs_l, lfs_r), e.group_modifier)
    return []


def _drop_count_values_label(
    e: AggrFuncExpr, lfs: list[LabelFilter]
) -> list[LabelFilter]:
    """count_values("lbl", q) rewrites `lbl` with stringified sample
    values, so filters on it must not propagate (reference:
    optimizer.go getCommonLabelFilters → dropLabelFiltersForLabelName);
    a stale lbl filter pushed into a binop sibling silently empties it."""
    from victoriametrics_spark.metricsql.ast import StringExpr

    if e.name != "count_values" or not e.args or not isinstance(
        e.args[0], StringExpr
    ):
        return lfs
    label = e.args[0].value
    return [f for f in lfs if f.label != label]


def _pushdown(e: Expr, lfs: list[LabelFilter]) -> Expr:
    """Return e with lfs ANDed into every reachable selector
    (pushdownBinaryOpFiltersInplace, optimizer.go:379-430)."""
    if not lfs:
        return e
    if isinstance(e, MetricExpr):
        groups = []
        for group in e.label_filterss or [[]]:
            seen = {_key(f) for f in group}
            groups.append(
                list(group) + [f for f in lfs if _key(f) not in seen]
            )
        return MetricExpr(label_filterss=groups)
    if isinstance(e, RollupExpr):
        return replace(e, expr=_pushdown(e.expr, lfs))
    if isinstance(e, FuncExpr):
        if e.name in _LABEL_MUTATORS:
            return e
        arg = _series_arg(e)
        if arg is None:
            return e
        new_args = [
            _pushdown(a, lfs) if a is arg else a for a in e.args
        ]
        return replace(e, args=new_args)
    if isinstance(e, AggrFuncExpr):
        lfs2 = _trim_by_aggr_modifier(lfs, e.modifier) if e.modifier else []
        lfs2 = _drop_count_values_label(e, lfs2)
        # only filters surviving the aggregation's label scope are valid
        # below it; when the aggregate drops all labels nothing pushes
        if e.modifier is None:
            return e
        new_args = [_pushdown(a, lfs2) for a in e.args]
        return replace(e, args=new_args)
    if isinstance(e, BinaryOpExpr):
        trimmed = _trim_by_group_modifier(lfs, e.group_modifier)
        return replace(
            e,
            left=_pushdown(e.left, trimmed),
            right=_pushdown(e.right, trimmed),
        )
    return e


def optimize(e: Expr) -> Expr:
    """Recursive rewrite: push common cross-side filters into both sides
    of every binary operation (optimizeInplace, optimizer.go:60-90)."""
    if isinstance(e, RollupExpr):
        out = replace(e, expr=optimize(e.expr))
        if e.at is not None:
            out = replace(out, at=optimize(e.at))
        return out
    if isinstance(e, (FuncExpr, AggrFuncExpr)):
        return replace(e, args=[optimize(a) for a in e.args])
    if isinstance(e, BinaryOpExpr):
        out = replace(e, left=optimize(e.left), right=optimize(e.right))
        lfs = get_common_label_filters(out)
        if not lfs:
            return out
        op = out.op.lower()
        if op == "or":
            # the intersected common filters hold on BOTH branches of an
            # `or`, so push them into both sides (optimizeInplace does the
            # same) — scan pruning would otherwise be lost entirely here
            return replace(
                out,
                left=_pushdown(out.left, lfs),
                right=_pushdown(out.right, lfs),
            )
        if op in ("unless", "ifnot"):
            # push left's filters into the right side only
            return replace(out, right=_pushdown(out.right, lfs))
        return replace(
            out,
            left=_pushdown(out.left, lfs),
            right=_pushdown(out.right, lfs),
        )
    return e
