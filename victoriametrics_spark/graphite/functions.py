"""Graphite render function registry — Spark-first implementations.

Reference: app/vmselect/graphite/transform.go (151 functions,
functions.json) + aggr.go (the shared aggregate table). Semantics
notes cite the reference file:line they mirror; all math runs as
Catalyst Column expressions over the dense series frame
``(name, ts, value)`` — no row-at-a-time Python.

Graphite None ≡ SQL NULL. The shared aggregate set (aggr.go:12-31)
ignores NULLs and yields NULL when every input is NULL, except
``count`` (0) and ``avg_zero`` (sum/len). ``xFilesFactor`` gates every
aggregate: non-null count must be ≥ len·xff (aggr.go:44-49).

Order-sensitive aggregates (diff, pow, multiply, first, last) depend
on series order, which a DataFrame doesn't have; we define it as
(argument position, series name) — deterministic and documented, where
the reference uses storage-arrival order.
"""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from victoriametrics_spark.gofmt import go_g, go_g_column
from victoriametrics_spark.graphite.evaluator import (
    GraphiteEvalError,
    RenderContext,
    constant_series,
    densify,
    empty_series,
    eval_series,
    evaluate_target,
    get_arg,
    get_bool,
    get_interval_or_points,
    get_number,
    get_string,
    parse_interval,
    parse_time_graphite,
)
from victoriametrics_spark.graphite.parser import Call, Literal, Node, Path

FUNCTIONS: dict = {}


def register(*names):
    def deco(fn):
        for n in names:
            FUNCTIONS[n] = fn
        return fn

    return deco


_ORD = "__ord"


def _with_ord(df: DataFrame, ord_val: int = 0) -> DataFrame:
    if _ORD in df.columns:
        return df
    return df.withColumn(_ORD, F.lit(ord_val))


def _arg_text(call: Call, name: str, pos: int, default: str = "") -> str:
    node = call.kwargs.get(name)
    if node is None and pos < len(call.args):
        node = call.args[pos]
    return node.text if node is not None else default


def _series_args(ctx: RenderContext, call: Call) -> DataFrame:
    """Union every positional seriesList argument, tagged with its arg
    index for order-sensitive aggregates (groupSeriesLists,
    transform.go:300-338)."""
    if not call.args:
        raise GraphiteEvalError(f"{call.func}: missing seriesList")
    out = None
    for i, node in enumerate(call.args):
        if isinstance(node, Literal):
            # every positional arg here must be a series list — the
            # reference's groupSeriesLists rejects numbers/strings
            # (TestExecExprFailure: averageSeries(time('a'),1))
            raise GraphiteEvalError(
                f"{call.func}: argument #{i} must be a series list, "
                f"got {node.text!r}"
            )
        df = _with_path(_with_ord(evaluate_target(ctx, node), i))
        out = (
            df
            if out is None
            else out.unionByName(df, allowMissingColumns=True)
        )
    # optional passengers may be present on only some branches — fill
    # the union nulls with their defaults
    if out is not None and _STEP in out.columns:
        out = out.withColumn(
            _STEP, F.coalesce(F.col(_STEP), F.lit(ctx.step))
        )
    if out is not None and _CF in out.columns:
        out = out.withColumn(_CF, F.coalesce(F.col(_CF), F.lit("avg")))
    return out


# ------------------------------------------------------- aggregate core

_AGG_ALIASES = {
    "average": "avg",
    "total": "sum",
    "current": "last",
    "rangeOf": "range",
}


def _canon_agg(name: str) -> str:
    n = name[: -len("Series")] if name.endswith("Series") else name
    return _AGG_ALIASES.get(n, n)


def _pct_index(n: Column, p: float) -> Column:
    """1-based nearest-rank index per valyala/histogram quantile
    (vendor/.../histogram.go:97-112): idx = ⌊phi·(n-1)+0.5⌋, clamped."""
    idx0 = F.floor(F.lit(float(p)) * (n - 1).cast("double") + F.lit(0.5))
    idx0 = F.least(idx0.cast("int"), n.cast("int") - 1)
    return F.greatest(idx0, F.lit(0)) + 1


def _agg_expr(
    agg: str,
    xff: float,
    p: float | None = None,
    time_order: bool = False,
) -> Column:
    """Aggregation Column for a groupBy context over (__ord, name,
    value) rows. NULL handling per aggr.go; xff gate per aggr.go:44.

    Order-sensitive aggregates (first/last/diff/pow) use
    (arg-position, name) order for cross-series combines; pass
    ``time_order=True`` for whole-series statistics where "last" means
    latest in time (filterSeries/highest*, transform.go:1645,1920)."""
    agg = _canon_agg(agg)
    v = F.col("value")
    n_all = F.count(F.lit(1))
    n = F.count(v)
    gate = n >= n_all.cast("double") * F.lit(float(xff))
    order_key = (
        (F.col("ts"),) if time_order else (F.col(_ORD), F.col("name"))
    )
    arr = F.array_sort(
        F.collect_list(F.when(v.isNotNull(), F.struct(*order_key, v)))
    )
    first = F.try_element_at(arr, F.lit(1))["value"]
    if agg == "count":
        return F.when(gate, n.cast("double"))
    if agg == "avg_zero":
        return F.when(
            gate, F.coalesce(F.sum(v), F.lit(0.0)) / n_all.cast("double")
        )
    gate = gate & (n > 0)
    if agg == "avg":
        out = F.avg(v)
    elif agg == "sum":
        out = F.sum(v)
    elif agg == "min":
        out = F.min(v)
    elif agg == "max":
        out = F.max(v)
    elif agg == "stddev":
        out = F.sqrt(F.var_pop(v))
    elif agg == "range":
        out = F.max(v) - F.min(v)
    elif agg == "median" or agg == "percentile":
        vs = F.array_sort(F.transform(arr, lambda x: x["value"]))
        out = F.try_element_at(vs, _pct_index(n, 0.5 if p is None else p))
    elif agg == "diff":
        out = F.lit(2.0) * first - F.sum(v)
    elif agg == "multiply":
        out = F.aggregate(arr, F.lit(1.0), lambda a, x: a * x["value"])
    elif agg == "pow":
        out = F.aggregate(
            arr,
            F.lit(None).cast("double"),
            lambda a, x: F.when(a.isNull(), x["value"]).otherwise(
                F.pow(a, x["value"])
            ),
        )
    elif agg == "first":
        out = first
    elif agg == "last":
        out = F.try_element_at(arr, F.lit(-1))["value"]
    else:
        raise GraphiteEvalError(f"unsupported aggregate function {agg!r}")
    return F.when(gate, out)


_PATH = "__path"
_STEP = "__step"
_CF = "__cf"

# order-sensitive aggregate names keep argument order in the formatted
# series name; the rest sort their paths (isSerialFunc, transform.go:3835)
_SERIAL_FUNCS = {"diff", "first", "last", "current", "pow"}


def _with_step(df: DataFrame, ctx) -> DataFrame:
    """Ensure the per-series step passenger column (the reference's
    series.step). Frames that lost it through a name,ts,value select
    fall back to the render/storage step — peekStep's default
    (transform.go:5666)."""
    if _STEP in df.columns:
        return df
    return df.withColumn(_STEP, F.lit(ctx.step))


_CONS_AGGS = {
    "avg": F.avg,
    "average": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "first": lambda c: F.min_by(c, F.col("ts")),
    "last": lambda c: F.max_by(c, F.col("ts")),
    "count": F.count,
}


def normalize_series(ctx, df: DataFrame, step_ms: int | None = None) -> DataFrame:
    """fetchNormalizedSeries (transform.go:3737-3752): pick the FIRST
    series' step (peekStep) as the common step, consolidate every
    series onto the end-EXCLUSIVE grid [start + k·step) with its
    consolidation function (default avg) and the xFilesFactor gate
    (series.consolidate → summarize, eval.go:99-150). "First" here is
    the deterministic (arg position, name) order standing in for the
    reference's arrival order. Lazy: the common step broadcasts as a
    1-row frame."""
    # peekStep short-circuit: a frame with NO step column gets
    # lit(ctx.step) from _with_step, so the min_by pick is statically
    # ctx.step — computing it through the 1-row crossJoin broadcast
    # would re-execute the whole frame once more for a constant
    if step_ms is None and _STEP not in df.columns:
        step_ms = ctx.step
    df = _with_path(_with_ord(_with_step(df, ctx)))
    has_cf = _CF in df.columns
    cf = F.col(_CF) if has_cf else F.lit("avg")
    if step_ms is not None:
        df = df.withColumn("__cstep", F.lit(int(step_ms)))
    else:
        first = df.agg(
            F.min_by(
                F.col(_STEP), F.struct(F.col(_ORD), F.col("name"))
            ).alias("__cstep")
        )
        df = df.crossJoin(F.broadcast(first))
    npts = F.floor(
        (F.lit(ctx.end) - F.lit(ctx.start)) / F.col("__cstep")
    ).cast("long")
    b = F.floor((F.col("ts") - F.lit(ctx.start)) / F.col("__cstep")).cast(
        "long"
    )
    df = df.withColumn(
        "__b", F.greatest(b, F.lit(0))
    ).filter(F.col("__b") < npts)
    aggs = [
        fn(F.col("value")).cast("double").alias(f"__c_{k}")
        for k, fn in _CONS_AGGS.items()
        if k != "average"
    ]
    g = df.groupBy(
        "name", F.col(_ORD), F.col(_PATH), F.col("__cstep"), F.col("__b")
    ).agg(
        *aggs,
        F.count("value").alias("__nn"),
        F.count(F.lit(1)).alias("__n"),
        F.first(cf).alias("__usecf"),
    )
    picked = F.col("__c_avg")
    for k in ("sum", "min", "max", "first", "last", "count"):
        picked = F.when(F.col("__usecf") == k, F.col(f"__c_{k}")).otherwise(
            picked
        )
    if ctx.xfiles_factor > 0:
        picked = F.when(
            F.col("__nn") >= F.lit(ctx.xfiles_factor) * F.col("__n"), picked
        )
    vals = g.select(
        "name", F.col(_ORD), F.col(_PATH), F.col("__cstep"),
        F.col("__b"), picked.alias("value"),
    )
    npts_l = F.floor(
        (F.lit(ctx.end) - F.lit(ctx.start)) / F.col("__cstep")
    ).cast("long")
    # single-branch densification (see evaluator.densify): the grid
    # length depends on the per-row __cstep, so the explode argument
    # stays a column expression
    per = vals.groupBy(
        "name", F.col(_ORD), F.col(_PATH), F.col("__cstep")
    ).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__b", "value"))
        ).alias("__m")
    )
    dense = per.select(
        "name",
        F.col(_ORD),
        F.col(_PATH),
        F.col("__cstep"),
        "__m",
        F.explode(
            F.when(npts_l > 0, F.sequence(F.lit(0), npts_l - 1)).otherwise(
                F.array().cast("array<long>")
            )
        ).alias("__b"),
    ).withColumn("value", F.try_element_at("__m", F.col("__b")))
    return dense.select(
        "name",
        F.col(_ORD),
        F.col(_PATH),
        (F.lit(ctx.start) + F.col("__b") * F.col("__cstep")).alias("ts"),
        "value",
        F.col("__cstep").alias(_STEP),
    )


def _go_div(v: Column, d: Column) -> Column:
    """Go float division: d == 0 yields ±Inf (NaN for 0/0) instead of
    SQL NULL — the reference never guards its divisions
    (transform.go:741, 1310, 3404)."""
    inf = float("inf")
    return (
        F.when(
            d == 0,
            F.when(v > 0, F.lit(inf))
            .when(v < 0, F.lit(-inf))
            .otherwise(F.lit(float("nan"))),
        )
        .otherwise(F.try_divide(v, d))
    )


def _with_path(df: DataFrame) -> DataFrame:
    """Ensure the pathExpression passenger column exists. Most reference
    transforms set pathExpression = Name after renaming; creation sites
    that differ (constantLine, alias keeping the old path) set __path
    explicitly."""
    if _PATH in df.columns:
        return df
    return df.withColumn(_PATH, F.col("name"))


def _agg_name_expr(fname: str) -> Column:
    """Aggregate expression for the reference aggregate series name:
    `<fname>Series(<paths>)`, paths deduped (order-preserving) and
    sorted unless fname is order-sensitive
    (formatAggrFuncForSeriesNames, transform.go:4026-4051)."""
    if fname in _SERIAL_FUNCS:
        ordered = F.array_sort(
            F.collect_set(
                F.struct(
                    F.col(_ORD).alias("o"),
                    F.col("name").alias("n"),
                    F.col(_PATH).alias("p"),
                )
            )
        )
        paths = F.array_distinct(F.transform(ordered, lambda s: s["p"]))
    else:
        paths = F.array_sort(F.array_distinct(F.collect_set(F.col(_PATH))))
    return F.concat(
        F.lit(f"{fname}Series("), F.array_join(paths, ","), F.lit(")")
    )


def _agg_series_name(df: DataFrame, fname: str) -> DataFrame:
    """1-row frame with the reference aggregate series name. Lazy —
    no driver collect."""
    df = _with_path(_with_ord(df))
    return df.agg(_agg_name_expr(fname).alias("__aggname"))


def _combine(
    df: DataFrame, agg: str, out_name, xff: float, p: float | None = None,
    fname: str | None = None, ctx=None,
) -> DataFrame:
    """Cross-series pointwise aggregation → one series
    (aggregateSeries, transform.go:339-420). With `fname`, the series
    name follows the reference format built from the inputs' path
    expressions instead of a caller-provided string. With `ctx`, the
    inputs are normalized to the first series' step beforehand
    (aggregateSeries consolidates every series onto peekStep's grid)."""
    df = _with_ord(df)
    normalized = ctx is not None
    if normalized:
        df = normalize_series(ctx, df)
    if fname is not None and normalized:
        # normalize_series output is DENSE (every series has a row at
        # every grid ts), so the per-ts path set equals the whole-frame
        # path set and the aggregate NAME can ride the same groupBy —
        # the former 1-row crossJoin broadcast re-executed the entire
        # normalized frame a second time just to format the name
        df = _with_path(df)
        out = df.groupBy("ts").agg(
            _agg_expr(agg, xff, p).alias("value"),
            _agg_name_expr(fname).alias("__aggname"),
        )
        return out.select(F.col("__aggname").alias("name"), "ts", "value")
    out = df.groupBy("ts").agg(_agg_expr(agg, xff, p).alias("value"))
    if fname is not None:
        named = _agg_series_name(df, fname)
        return out.crossJoin(F.broadcast(named)).select(
            F.col("__aggname").alias("name"), "ts", "value"
        )
    name_col = F.lit(out_name) if isinstance(out_name, str) else out_name
    return out.select(name_col.alias("name"), "ts", "value")


def _combine_by_key(
    df: DataFrame, key: Column, agg: str, xff: float
) -> DataFrame:
    """Grouped pointwise aggregation; result name = group key
    (groupByNodes, transform.go groupSeriesByNodes)."""
    df = _with_ord(df)
    return (
        df.withColumn("__key", key)
        .groupBy("__key", "ts")
        .agg(_agg_expr(agg, xff).alias("value"))
        .select(F.col("__key").alias("name"), "ts", "value")
    )


def _series_stats(df: DataFrame, agg: str, xff: float = 0.0) -> DataFrame:
    """Per-series whole-range statistic (name, __stat) — the basis of
    every filterSeries/highest/sort variant (transform.go:1645,1920).
    first/last here mean earliest/latest IN TIME (aggr.go:201-218
    walks the value array, which is time-ordered)."""
    df = _with_ord(df)
    return df.groupBy("name").agg(
        _agg_expr(agg, xff, time_order=True).alias("__stat")
    )


def _rename(df: DataFrame, name_col: Column) -> DataFrame:
    return df.select(name_col.alias("name"), "ts", "value")


def _rename_keep_path(df: DataFrame, name_col: Column) -> DataFrame:
    """Rename but keep the inner pathExpression (and the step/
    consolidation passengers) — the alias family never updates
    pathExpression in the reference (transformAlias:446-450)."""
    df = _with_path(df)
    extras = [c for c in (_PATH, _STEP, _CF) if c in df.columns]
    return df.select(name_col.alias("name"), "ts", "value", *extras)


def _wrap_name(df: DataFrame, prefix: str, suffix: str = ")") -> DataFrame:
    return _rename(
        df, F.concat(F.lit(prefix + "("), F.col("name"), F.lit(suffix))
    )


def _per_point(df: DataFrame, fn, prefix: str | None = None) -> DataFrame:
    out = df.withColumn("value", fn(F.col("value")))
    if prefix:
        out = _wrap_name(out, prefix)
    return out


def _split_path(c: Column) -> Column:
    return F.split(_path_of(c), r"\.")


def _path_of(c: Column) -> Column:
    """Extract the metric path from a (possibly function-wrapped)
    series name — stands in for the reference's per-series
    pathExpression tracking."""
    rx = r"([A-Za-z0-9_\-*?:%#$~@{}\[\]]+(?:\.[A-Za-z0-9_\-*?:%#$~@{}\[\]]+)+)"
    ex = F.regexp_extract(c, rx, 1)
    return F.when(ex == "", c).otherwise(ex)


def _align_time_unit(start_ms: int, s: str) -> int:
    """alignTimeUnit (transform.go:5017-5049): truncate the start down
    to the unit named by PREFIX (ms/s/min/h/d/w[N]/mon/y), weeks to the
    ISO weekday N (default Monday); unknown units error. UTC."""
    from datetime import datetime, timedelta, timezone

    t = datetime.fromtimestamp(start_ms / 1000.0, tz=timezone.utc)
    if s.startswith("ms"):
        t = t.replace(microsecond=t.microsecond // 1000 * 1000)
    elif s.startswith("s"):
        t = t.replace(microsecond=0)
    elif s.startswith("min"):
        t = t.replace(second=0, microsecond=0)
    elif s.startswith("h"):
        t = t.replace(minute=0, second=0, microsecond=0)
    elif s.startswith("d"):
        t = t.replace(hour=0, minute=0, second=0, microsecond=0)
    elif s.startswith("w"):
        iso = 1
        if s and s[-1].isdigit():
            iso = int(s[-1])
        # Go time.Weekday(): Sunday=0; daysToSubtract = weekday - iso
        go_weekday = (t.weekday() + 1) % 7
        days = go_weekday - iso
        if days < 0:
            days += 7
        t = t.replace(
            hour=0, minute=0, second=0, microsecond=0
        ) - timedelta(days=days)
    elif s.startswith("mon"):
        # Go time.Date(y, m, 0, ...) is the LAST day of the previous
        # month (day 0 normalizes backwards)
        t = t.replace(
            day=1, hour=0, minute=0, second=0, microsecond=0
        ) - timedelta(days=1)
    elif s.startswith("y"):
        # day 0 of month 0 normalizes to Nov 30 of the previous year
        t = t.replace(
            month=1, day=1, hour=0, minute=0, second=0, microsecond=0
        ) - timedelta(days=32)
        t = t.replace(day=30)
    else:
        raise GraphiteEvalError(f"unsupported interval {s!r}")
    return int(t.timestamp() * 1000)


def _py_path_from_name(name: str) -> str:
    """getPathFromName (transform.go:3706-3730): extract the metric path
    from a (possibly function-wrapped) series name by parsing it and
    walking to the first path-like argument."""
    from victoriametrics_spark.graphite.parser import parse_target as _pt

    try:
        node = _pt(name)
    except Exception:
        return name
    for _ in range(20):
        if isinstance(node, Path):
            return node.pattern
        if isinstance(node, Literal) and isinstance(node.value, str):
            return node.value
        if isinstance(node, Call):
            for a in node.args:
                if isinstance(a, Path):
                    return a.pattern
                # bare numerals parse as numbers here but are
                # MetricExprs in graphiteql ("500" is a valid path)
                if (
                    isinstance(a, Literal)
                    and isinstance(a.value, (int, float))
                    and not isinstance(a.value, bool)
                ):
                    return a.text
            if not node.args:
                return name
            node = node.args[0]
            continue
        return name
    return name


def _py_tags_from_name(name: str) -> dict:
    """Graphite tagged-name parse: base;k=v;... plus the implicit
    ``name`` tag (unmarshalTags)."""
    parts = name.split(";")
    tags = {"name": parts[0]}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            tags[k] = v
    return tags


def _name_map_expr(names: list[str], fn) -> Column:
    """CASE expression mapping each collected series name through the
    Python fn — the engine's stand-in for per-series Go renames that
    need real parsing (presentation-sized name sets)."""
    expr = F.col("name")
    for nm in names:
        expr = F.when(F.col("name") == nm, F.lit(fn(nm))).otherwise(expr)
    return expr


def _node_col(name_col: Column, idx: int) -> Column:
    nodes = _split_path(name_col)
    pos = idx + 1 if idx >= 0 else idx
    return F.coalesce(F.try_element_at(nodes, F.lit(pos)), F.lit(""))


def _nodes_key(name_col: Column, idxs: list[int]) -> Column:
    return F.concat_ws(".", *[_node_col(name_col, i) for i in idxs])


def _series_window() -> Window:
    return Window.partitionBy("name").orderBy("ts")


# ---------------------------------------------------- combine functions


def _aggregate_series(ctx, call, agg, fname=None):
    """fname = the reference's user-facing aggregate name used in the
    output series name (formatAggrFuncForSeriesNames) — e.g.
    averageSeries passes "average", rangeOfSeries passes "rangeOf"."""
    df = _series_args(ctx, call)
    return _combine(
        df, agg, None, ctx.xfiles_factor, fname=fname or _canon_agg(agg),
        ctx=ctx,
    )


@register("sumSeries", "sum")
def _f_sum_series(ctx, call):
    return _aggregate_series(ctx, call, "sum", fname="sum")


@register("averageSeries", "avg")
def _f_avg_series(ctx, call):
    return _aggregate_series(ctx, call, "avg", fname="average")


@register("minSeries")
def _f_min_series(ctx, call):
    return _aggregate_series(ctx, call, "min", fname="min")


@register("maxSeries")
def _f_max_series(ctx, call):
    return _aggregate_series(ctx, call, "max", fname="max")


@register("stddevSeries")
def _f_stddev_series(ctx, call):
    return _aggregate_series(ctx, call, "stddev", fname="stddev")


@register("multiplySeries")
def _f_multiply_series(ctx, call):
    return _aggregate_series(ctx, call, "multiply", fname="multiply")


@register("diffSeries")
def _f_diff_series(ctx, call):
    return _aggregate_series(ctx, call, "diff", fname="diff")


@register("rangeOfSeries")
def _f_range_series(ctx, call):
    return _aggregate_series(ctx, call, "range", fname="rangeOf")


@register("countSeries")
def _f_count_series(ctx, call):
    """Number of series in the list, as a constant line
    (transform.go transformCountSeries: len of the list)."""
    # aggrCount counts NON-NaN values per point (aggr.go:169-177), not
    # distinct names — a series with a hole contributes nothing there,
    # and duplicate same-named series each count
    df = _series_args(ctx, call)
    return _combine(
        df, "count", None, ctx.xfiles_factor, fname="count", ctx=ctx
    )


@register("powSeries")
def _f_pow_series(ctx, call):
    return _aggregate_series(ctx, call, "pow", fname="pow")


@register("aggregate")
def _f_aggregate(ctx, call):
    func = get_string(call, "func", 1)
    xff = get_number(call, "xFilesFactor", 2, ctx.xfiles_factor)
    df = _with_ord(eval_series(ctx, call, "seriesList", 0))
    # transformAggregate trims a 'Series' suffix before formatting
    # (transform.go:273) — aggregate(q,'sumSeries') names sumSeries(...)
    fname = func[: -len("Series")] if func.endswith("Series") else func
    return _combine(df, func, None, xff, fname=fname, ctx=ctx)


@register("percentileOfSeries")
def _f_percentile_of_series(ctx, call):
    n = get_number(call, "n", 1)
    df = normalize_series(
        ctx, _with_ord(eval_series(ctx, call, "seriesList", 0))
    )
    # name = percentileOfSeries(<first sorted path>,<n %g>)
    # (transform.go:2874-2876)
    named = df.agg(
        F.concat(
            F.lit("percentileOfSeries("),
            F.array_min(F.collect_set(F.col(_PATH))),
            F.lit(f",{go_g(n)})"),
        ).alias("__aggname")
    )
    out = df.groupBy("ts").agg(
        _agg_expr("percentile", ctx.xfiles_factor, n / 100.0).alias("value")
    )
    return out.crossJoin(F.broadcast(named)).select(
        F.col("__aggname").alias("name"), "ts", "value"
    )


@register("group")
def _f_group(ctx, call):
    # group() with no args is a legal empty series list (the reference
    # evalSeriesList of zero args — asPercent(q, group()) tests rely on it)
    if call.kwargs:
        raise GraphiteEvalError("group: unexpected keyword arguments")
    if not call.args:
        return _with_ord(empty_series(ctx))
    return _series_args(ctx, call)


@register("unique")
def _f_unique(ctx, call):
    """Keep the first occurrence of each name across the arg lists."""
    df = _series_args(ctx, call)
    w = Window.partitionBy("name")
    keep = F.min(F.col(_ORD)).over(w)
    return (
        df.withColumn("__keep", keep)
        .filter(F.col(_ORD) == F.col("__keep"))
        .select("name", "ts", "value")
    )


# ------------------------------------------------------- grouped combine


def _group_by_nodes(ctx, call, agg: str, idxs: list[int]):
    df = normalize_series(
        ctx, _with_ord(eval_series(ctx, call, "seriesList", 0))
    )
    return _combine_by_key(
        df, _nodes_key(F.col("name"), idxs), agg, ctx.xfiles_factor
    )


@register("groupByNode")
def _f_group_by_node(ctx, call):
    idx = int(get_number(call, "nodeNum", 1))
    cb = get_string(call, "callback", 2, "average")
    return _group_by_nodes(ctx, call, cb, [idx])


@register("groupByNodes")
def _f_group_by_nodes(ctx, call):
    cb = get_string(call, "callback", 1)
    idxs = [int(get_number(call, f"node{i}", i + 2)) for i in
            range(len(call.args) - 2)]
    return _group_by_nodes(ctx, call, cb, idxs)


def _with_wildcards(ctx, call, agg: str):
    """Name with the given node positions dropped; aggregate within
    each resulting name (aggregateSeriesWithWildcardsGeneric). The
    inputs are normalized to the first series' step beforehand like
    every multi-series aggregate."""
    if call.func == "aggregateWithWildcards":
        agg = get_string(call, "func", 1)
    # positions are the numeric literal args after the list (func may
    # arrive as a kwarg, shifting them left); anything else there is an
    # invalid node (getInts rejects it)
    idxs = set()
    for i, a in enumerate(call.args[1:]):
        if isinstance(a, Literal) and isinstance(a.value, (int, float)):
            idxs.add(int(a.value))
        elif (
            call.func == "aggregateWithWildcards"
            and i == 0
            and isinstance(a, Literal)
            and isinstance(a.value, str)
        ):
            continue  # the positional func name
        else:
            raise GraphiteEvalError(
                f"{call.func}: node positions must be numbers; got "
                f"{a.text!r}"
            )
    df = normalize_series(
        ctx, _with_ord(eval_series(ctx, call, "seriesList", 0))
    )
    nodes = _split_path(F.col("name"))
    kept = F.filter(
        F.transform(
            nodes, lambda x, i: F.struct(i.alias("i"), x.alias("s"))
        ),
        (lambda st: ~st["i"].isin(*sorted(idxs)))
        if idxs
        else (lambda st: F.lit(True)),
    )
    key = F.array_join(F.transform(kept, lambda st: st["s"]), ".")
    return _combine_by_key(df, key, agg, ctx.xfiles_factor)


@register("aggregateWithWildcards")
def _f_aggregate_with_wildcards(ctx, call):
    return _with_wildcards(ctx, call, "")


@register("sumSeriesWithWildcards")
def _f_sum_with_wildcards(ctx, call):
    return _with_wildcards(ctx, call, "sum")


@register("averageSeriesWithWildcards")
def _f_avg_with_wildcards(ctx, call):
    return _with_wildcards(ctx, call, "avg")


@register("multiplySeriesWithWildcards")
def _f_multiply_with_wildcards(ctx, call):
    return _with_wildcards(ctx, call, "multiply")


# --------------------------------------------------- per-point transforms


@register("absolute")
def _f_absolute(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0), F.abs, "absolute"
    )


@register("offset", "add")
def _f_offset(ctx, call):
    factor = get_number(call, "factor" if call.func == "offset" else
                        "constant", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn("value", F.col("value") + F.lit(float(factor)))
    return _rename(
        out,
        F.concat(
            F.lit(f"{call.func}("), F.col("name"), F.lit(f",{go_g(factor)})")
        ),
    )


@register("scale")
def _f_scale(ctx, call):
    factor = get_number(call, "factor", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn("value", F.col("value") * F.lit(float(factor)))
    return _rename(
        out,
        F.concat(F.lit("scale("), F.col("name"), F.lit(f",{go_g(factor)})")),
    )


@register("scaleToSeconds")
def _f_scale_to_seconds(ctx, call):
    """v · seconds/step_sec (transform.go transformScaleToSeconds)."""
    seconds = get_number(call, "seconds", 1)
    df = _with_step(eval_series(ctx, call, "seriesList", 0), ctx)
    # factor = seconds / series.step (transformScaleToSeconds)
    k = F.lit(float(seconds)) / (F.col(_STEP).cast("double") / 1000.0)
    out = df.withColumn("value", F.col("value") * k)
    return _rename(
        out,
        F.concat(
            F.lit("scaleToSeconds("), F.col("name"), F.lit(f",{go_g(seconds)})")
        ),
    )


@register("invert")
def _f_invert(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0),
        lambda v: F.try_divide(F.lit(1.0), F.nullif(v, F.lit(0.0))),
        "invert",
    )


@register("pow")
def _f_pow(ctx, call):
    factor = get_number(call, "factor", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn("value", F.pow(F.col("value"), F.lit(float(factor))))
    return _rename(
        out,
        F.concat(F.lit("pow("), F.col("name"), F.lit(f",{go_g(factor)})")),
    )


@register("squareRoot")
def _f_square_root(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0),
        lambda v: F.when(v >= 0, F.sqrt(v)),
        "squareRoot",
    )


@register("exp")
def _f_exp(ctx, call):
    return _per_point(eval_series(ctx, call, "seriesList", 0), F.exp, "exp")


@register("logarithm", "log")
def _f_log(ctx, call):
    base = get_number(call, "base", 1, 10.0)
    df = eval_series(ctx, call, "seriesList", 0)
    # Go math.Log(base<=0) is NaN → every value NaN (kept as nulls),
    # never a driver-side domain error
    log_base = (
        float(__import__("math").log(base)) if base > 0 else None
    )
    out = df.withColumn(
        "value",
        F.when(
            F.col("value") > 0,
            F.log(F.col("value"))
            / F.lit(log_base).cast("double"),
        ),
    )
    return _rename(
        out,
        F.concat(F.lit("log("), F.col("name"), F.lit(f",{go_g(base)})")),
    )


@register("sigmoid")
def _f_sigmoid(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0),
        lambda v: F.lit(1.0) / (F.lit(1.0) + F.exp(-v)),
        "sigmoid",
    )


@register("logit")
def _f_logit(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0),
        lambda v: F.when(
            (v > 0) & (v < 1), F.log(v / (F.lit(1.0) - v))
        ),
        "logit",
    )


@register("round")
def _f_round(ctx, call):
    has_precision = get_arg(call, "precision", 1, None) is not None
    precision = int(get_number(call, "precision", 1, 0))
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn("value", F.round(F.col("value"), precision))
    suffix = f",{precision})" if has_precision else ")"
    return _rename(
        out,
        F.concat(F.lit("round("), F.col("name"), F.lit(suffix)),
    )


@register("isNonNull")
def _f_is_non_null(ctx, call):
    return _per_point(
        eval_series(ctx, call, "seriesList", 0),
        lambda v: F.when(v.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0)),
        "isNonNull",
    )


@register("transformNull")
def _f_transform_null(ctx, call):
    default = get_number(call, "default", 1, 0.0)
    ref_node = get_arg(call, "referenceSeries", 2, None)
    df = eval_series(ctx, call, "seriesList", 0)
    filled = F.coalesce(F.col("value"), F.lit(float(default)))
    suffix = f",{go_g(default)})"
    if ref_node is not None:
        # both sides consolidate to the reference's normalized step
        # (transformTransformNull:4211-4240); fill only at instants
        # where SOME reference series has a value
        ref = normalize_series(ctx, evaluate_target(ctx, ref_node))
        ref_step_rows = ref.select(F.col(_STEP)).limit(1).collect()
        ref_step = (
            int(ref_step_rows[0][0]) if ref_step_rows else ctx.step
        )
        df = normalize_series(ctx, df, step_ms=ref_step)
        ref_ok = ref.filter(F.col("value").isNotNull()).select(
            F.col("ts").alias("__rts")
        ).distinct()
        df = df.join(
            F.broadcast(ref_ok), df["ts"] == F.col("__rts"), "left"
        )
        filled = F.when(
            F.col("__rts").isNotNull(),
            F.coalesce(F.col("value"), F.lit(float(default))),
        ).otherwise(F.col("value"))
        suffix = f",{go_g(default)},referenceSeries)"
    out = df.withColumn("value", filled).select("name", "ts", "value")
    return _rename(
        out,
        F.concat(F.lit("transformNull("), F.col("name"), F.lit(suffix)),
    )


@register("drawAsInfinite")
def _f_draw_as_infinite(ctx, call):
    return _wrap_name(
        eval_series(ctx, call, "seriesList", 0), "drawAsInfinite"
    )


@register("minMax")
def _f_min_max(ctx, call):
    """(v - min)/(max - min) per series; NaN min/max → 0; ±Inf → 0
    (transform.go:2593-2626)."""
    df = eval_series(ctx, call, "seriesList", 0)
    w = Window.partitionBy("name")
    mn = F.coalesce(F.min("value").over(w), F.lit(0.0))
    mx = F.coalesce(F.max("value").over(w), F.lit(0.0))
    raw = (F.col("value") - mn) / (mx - mn)
    v = F.when(
        raw.isin(float("inf"), float("-inf")) | raw.isNull(),
        F.when(F.col("value").isNull(), F.lit(None)).otherwise(F.lit(0.0)),
    ).otherwise(raw)
    out = df.withColumn("value", v)
    return _wrap_name(out, "minMax")


@register("offsetToZero")
def _f_offset_to_zero(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    w = Window.partitionBy("name")
    out = df.withColumn("value", F.col("value") - F.min("value").over(w))
    return _wrap_name(out, "offsetToZero")


# ------------------------------------------------- sequential transforms


@register("derivative")
def _f_derivative(ctx, call):
    """v[i] - v[i-1]; NULL when either side is NULL
    (transform.go:1245-1272)."""
    df = eval_series(ctx, call, "seriesList", 0)
    prev = F.lag("value").over(_series_window())
    out = df.withColumn("value", F.col("value") - prev)
    return _wrap_name(out, "derivative")


def _non_negative_delta(max_v: float | None, min_v: float | None) -> Column:
    """nonNegativeDelta (transform.go:4574-4595): counter delta with
    optional wrap bounds. NULL gaps break the chain (prev := cur even
    when cur is NULL)."""
    cur = F.col("value")
    prev = F.lag("value").over(_series_window())

    def oob(c):
        cond = F.lit(False)
        if max_v is not None:
            cond = cond | (c > F.lit(float(max_v)))
        if min_v is not None:
            cond = cond | (c < F.lit(float(min_v)))
        return cond

    out_of_bounds = oob(cur)
    # an out-of-bounds previous point left prevV = NaN
    # (nonNegativeDelta returns (nan, nan)) → this delta is NaN too
    prev = F.when(oob(prev), F.lit(None).cast("double")).otherwise(prev)
    inc = cur - prev
    if max_v is not None:
        wrap = (
            F.lit(float(max_v))
            + 1
            + cur
            - prev
            - F.lit(float(min_v if min_v is not None else 0.0))
        )
    elif min_v is not None:
        wrap = cur - F.lit(float(min_v))
    else:
        wrap = F.lit(None).cast("double")
    return F.when(out_of_bounds, F.lit(None).cast("double")).otherwise(
        F.when(
            cur.isNull() | prev.isNull(), F.lit(None).cast("double")
        ).otherwise(F.when(cur >= prev, inc).otherwise(wrap))
    )


def _opt_bound(call: Call, name: str, pos: int) -> float | None:
    node = get_arg(call, name, pos, None)
    if node is None or (isinstance(node, Literal) and node.value is None):
        return None
    return get_number(call, name, pos)


@register("nonNegativeDerivative")
def _f_non_negative_derivative(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    delta = _non_negative_delta(
        _opt_bound(call, "maxValue", 1), _opt_bound(call, "minValue", 2)
    )
    return _wrap_name(
        df.withColumn("value", delta), "nonNegativeDerivative"
    )


@register("perSecond")
def _f_per_second(ctx, call):
    """nonNegativeDelta / step-seconds (transform.go:4536-4572)."""
    df = eval_series(ctx, call, "seriesList", 0)
    delta = _non_negative_delta(
        _opt_bound(call, "maxValue", 1), _opt_bound(call, "minValue", 2)
    )
    # divide by the gap to the PREVIOUS point on the series' own grid
    # (transform.go:4558-4564); the first point has no step → NaN
    dt = (
        F.col("ts") - F.lag("ts").over(_series_window())
    ).cast("double") / F.lit(1000.0)
    out = df.withColumn("value", delta / dt)
    return _wrap_name(out, "perSecond")


@register("integral")
def _f_integral(ctx, call):
    """Running sum; NULL points stay NULL but don't reset the sum
    (transform.go:2160-2187)."""
    df = eval_series(ctx, call, "seriesList", 0)
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    run = F.sum("value").over(w)
    out = df.withColumn(
        "value", F.when(F.col("value").isNotNull(), run)
    )
    return _wrap_name(out, "integral")


@register("integralByInterval")
def _f_integral_by_interval(ctx, call):
    """Running sum resetting at each interval boundary
    (transform.go:2189-2236: bucket = ts / interval)."""
    unit = get_string(call, "intervalUnit", 1)
    interval = parse_interval(unit)
    df = eval_series(ctx, call, "seriesList", 0)
    bucket = F.floor(F.col("ts") / F.lit(interval))
    w = (
        Window.partitionBy("name", bucket)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = F.sum("value").over(w)
    out = df.withColumn(
        "value", F.when(F.col("value").isNotNull(), run)
    )
    return _rename(
        out,
        F.concat(
            F.lit("integralByInterval("),
            F.col("name"),
            F.lit(f",'{unit}')"),
        ),
    )


@register("cumulative")
def _f_cumulative(ctx, call):
    """cumulative(seriesList) ≡ consolidateBy(seriesList, 'sum') —
    including the consolidateBy(...) NAME (transformCumulative)."""
    ctx2 = replace(ctx, consolidation="sum")
    df = eval_series(ctx2, call, "seriesList", 0)
    wrapped = F.concat(
        F.lit("consolidateBy("), F.col("name"), F.lit(",'sum')")
    )
    return df.select(
        wrapped.alias("name"),
        "ts",
        "value",
        wrapped.alias(_PATH),
        F.lit("sum").alias(_CF),
    )


@register("delay")
def _f_delay(ctx, call):
    steps = int(get_number(call, "steps", 1))
    df = eval_series(ctx, call, "seriesList", 0)
    # transformDelay shifts VALUES by index within the series' own
    # timestamp array (copy(values[steps:], values[:len-steps]));
    # out-of-range steps blank the whole series — timestamps unchanged
    w = Window.partitionBy("name").orderBy("ts")
    shifted = F.lag("value", steps).over(w)
    out = df.withColumn("value", shifted)
    return _rename(
        out,
        F.concat(F.lit("delay("), F.col("name"), F.lit(f",{steps})")),
    )


@register("keepLastValue")
def _f_keep_last_value(ctx, call):
    """Forward-fill NULL runs of length ≤ limit
    (transform.go:2298-2333)."""
    limit = get_number(call, "limit", 1, float("inf"))
    df = eval_series(ctx, call, "seriesList", 0)
    w = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    last_v = F.last("value", ignorenulls=True).over(w)
    last_ts = F.last(
        F.when(F.col("value").isNotNull(), F.col("ts")), ignorenulls=True
    ).over(w)
    gap_pts = (F.col("ts") - last_ts) / F.lit(ctx.step)
    fill = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        F.when(gap_pts <= F.lit(float(limit)), last_v)
    )
    return _wrap_name(df.withColumn("value", fill), "keepLastValue")


@register("interpolate")
def _f_interpolate(ctx, call):
    """Linear fill across interior NULL runs of length ≤ limit
    (transform.go:2238-2296)."""
    limit = get_number(call, "limit", 1, float("inf"))
    df = eval_series(ctx, call, "seriesList", 0)
    wb = _series_window().rowsBetween(Window.unboundedPreceding, 0)
    wf = _series_window().rowsBetween(0, Window.unboundedFollowing)
    pv = F.last("value", ignorenulls=True).over(wb)
    pt = F.last(
        F.when(F.col("value").isNotNull(), F.col("ts")), ignorenulls=True
    ).over(wb)
    nv = F.first("value", ignorenulls=True).over(wf)
    nt = F.first(
        F.when(F.col("value").isNotNull(), F.col("ts")), ignorenulls=True
    ).over(wf)
    run_pts = (nt - pt) / F.lit(ctx.step) - 1
    interp = pv + (nv - pv) * (F.col("ts") - pt) / (nt - pt)
    fill = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        F.when(
            pv.isNotNull()
            & nv.isNotNull()
            & (run_pts <= F.lit(float(limit))),
            interp,
        )
    )
    return _wrap_name(df.withColumn("value", fill), "interpolate")


@register("changed")
def _f_changed(ctx, call):
    """1 when the value differs from the previous point, else 0
    (graphite-web changed; NULL prev or cur → 0)."""
    df = eval_series(ctx, call, "seriesList", 0)
    prev = F.lag("value").over(_series_window())
    v = F.when(
        F.col("value").isNotNull()
        & prev.isNotNull()
        & (F.col("value") != prev),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    return _wrap_name(df.withColumn("value", v), "changed")


# ------------------------------------------------------- moving windows


def _window_points(ctx: RenderContext, call: Call, name: str, pos: int):
    pts, interval = get_interval_or_points(call, name, pos)
    if pts is None:
        pts = max(1, interval // ctx.step)
    return int(pts)


def _agg_over_window(agg: str, xff: float, win, n_all=None) -> Column:
    """Windowed flavor of _agg_expr: trailing-frame aggregate in TIME
    order (movingWindow, transform.go:2758-2824: values in
    [tsEnd-W, tsEnd), output at tsEnd). `n_all` overrides the window
    population count when the frame mixes data rows with synthetic
    output-grid rows."""
    agg = _canon_agg(agg)
    v = F.col("value")
    if n_all is None:
        n_all = F.count(F.lit(1)).over(win)
    n = F.count(v).over(win)
    gate = n >= n_all.cast("double") * F.lit(float(xff))
    arr = F.array_sort(
        F.collect_list(
            F.when(v.isNotNull(), F.struct(F.col("ts"), v))
        ).over(win)
    )
    first = F.try_element_at(arr, F.lit(1))["value"]
    if agg == "count":
        return F.when(gate, n.cast("double"))
    if agg == "avg_zero":
        return F.when(
            gate,
            F.coalesce(F.sum(v).over(win), F.lit(0.0))
            / n_all.cast("double"),
        )
    gate = gate & (n > 0)
    if agg == "avg":
        out = F.avg(v).over(win)
    elif agg == "sum":
        out = F.sum(v).over(win)
    elif agg == "min":
        out = F.min(v).over(win)
    elif agg == "max":
        out = F.max(v).over(win)
    elif agg == "stddev":
        out = F.sqrt(F.var_pop(v).over(win))
    elif agg == "range":
        out = F.max(v).over(win) - F.min(v).over(win)
    elif agg == "median" or agg == "percentile":
        vs = F.array_sort(F.transform(arr, lambda x: x["value"]))
        out = F.try_element_at(vs, _pct_index(n, 0.5))
    elif agg == "diff":
        out = F.lit(2.0) * first - F.sum(v).over(win)
    elif agg == "multiply":
        out = F.aggregate(arr, F.lit(1.0), lambda a, x: a * x["value"])
    elif agg == "first":
        out = first
    elif agg == "last":
        out = F.try_element_at(arr, F.lit(-1))["value"]
    else:
        raise GraphiteEvalError(f"unsupported moving aggregate {agg!r}")
    return F.when(gate, out)


def _moving(ctx, call, agg: str, xff_pos: int = 2):
    """movingWindow core: evaluate the inner expression on a range
    extended back by the window, aggregate the k preceding grid points
    (EXCLUDING the current one), drop the extension
    (transform.go:2758-2824)."""
    n_pts, interval = get_interval_or_points(call, "windowSize", 1)
    xff = get_number(call, "xFilesFactor", xff_pos, ctx.xfiles_factor)
    window = interval if interval is not None else n_pts * ctx.step
    inner = ctx.with_range(start=ctx.start - window)
    df = eval_series(inner, call, "seriesList", 0)
    # a numeric windowSize counts INNER-SERIES steps: when the inner
    # expression changes the step (summarize et al), the window and the
    # extension are recomputed and the inner re-evaluated
    # (movingWindow, transform.go:2754-2786 peekStep + re-eval).
    # peekStep needs a JOB only when the frame actually carries a step
    # column; a frame without one falls back to the render step by
    # definition (_with_step), so collecting it would execute the whole
    # inner plan just to read back ctx.step (r14: this was the single
    # biggest driver-latency item in a grouped movingAverage render)
    if _STEP in df.columns:
        step_row = (
            _with_path(_with_ord(df))
            .select(
                F.min_by(
                    F.col(_STEP), F.struct(F.col(_ORD), F.col("name"))
                ).alias("__s")
            )
            .collect()
        )
        step = (
            int(step_row[0]["__s"])
            if step_row and step_row[0]["__s"]
            else ctx.step
        )
    else:
        step = ctx.step
    if interval is None and step != ctx.step:
        window = int(n_pts * step)
        inner = ctx.with_range(start=ctx.start - window)
        df = eval_series(inner, call, "seriesList", 0)
    # the reference emits at tsEnd = innerStart+window, +step, ...,
    # INCLUSIVE of the range end, aggregating the half-open window
    # [tsEnd-W, tsEnd) — tsEnd need not be a series point (interval
    # windows that aren't step multiples). Build the output grid
    # explicitly, union it with the data rows, and aggregate data rows
    # within a RANGE frame anchored at each grid row.
    grid_start = inner.start + window
    n_out = (ctx.end - grid_start) // step + 1
    if n_out <= 0:
        return empty_series(ctx)
    series = df.select("name").distinct()
    ogrid = series.withColumn(
        "__j",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(int(n_out - 1)).cast("long"))
        ),
    ).select(
        "name",
        (F.lit(int(grid_start)).cast("long")
         + F.col("__j") * F.lit(int(step)).cast("long")).alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(1).alias("__is_out"),
    )
    data = df.select("name", "ts", "value").withColumn(
        "__is_out", F.lit(0)
    )
    uni = data.unionByName(ogrid)
    win = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rangeBetween(-int(window), -1)
    )
    n_all = F.count(F.when(F.col("__is_out") == 0, F.lit(1))).over(win)
    out = (
        uni.withColumn(
            "value", _agg_over_window(agg, xff, win, n_all=n_all)
        )
        .filter(F.col("__is_out") == 1)
        .drop("__is_out")
    )
    # reference: tagName = "moving" + strings.Title(funcName) of the
    # name as passed (transform.go:2788)
    tag = "moving" + agg[:1].upper() + agg[1:]
    wtext = _arg_text(call, "windowSize", 1)
    return _rename(
        out,
        F.concat(F.lit(f"{tag}("), F.col("name"), F.lit(f",{wtext})")),
    )


@register("movingAverage")
def _f_moving_average(ctx, call):
    return _moving(ctx, call, "average")


@register("movingSum")
def _f_moving_sum(ctx, call):
    return _moving(ctx, call, "sum")


@register("movingMin")
def _f_moving_min(ctx, call):
    return _moving(ctx, call, "min")


@register("movingMax")
def _f_moving_max(ctx, call):
    return _moving(ctx, call, "max")


@register("movingMedian")
def _f_moving_median(ctx, call):
    return _moving(ctx, call, "median")


@register("movingWindow")
def _f_moving_window(ctx, call):
    func = get_string(call, "func", 2, "avg")
    return _moving(ctx, call, func, xff_pos=3)


@register("exponentialMovingAverage")
def _f_ema(ctx, call):
    """EMA with c = 2/(N+1), seeded by the average of the first window
    (graphite-web exponentialMovingAverage; reference
    transform.go transformExponentialMovingAverage). NULL points leave
    the EMA unchanged and emit NULL. Catalyst fold over the per-series
    point array — bounded by the render range, not corpus size."""
    # transformExponentialMovingAverage (transform.go:1520-1580):
    # string window → c = 2/(seconds+1), extension = the interval;
    # number window → c = 2/(n+1), extension = n·storageStep. The inner
    # expression is evaluated over [start-window, end); points before
    # the render start seed the average (NaN seed → 0) and only
    # in-range points are emitted.
    n_pts, interval = get_interval_or_points(call, "windowSize", 1)
    if interval is not None:
        c = 2.0 / (interval / 1000.0 + 1.0)
        window_ms = abs(interval)
    else:
        c = 2.0 / (n_pts + 1.0)
        window_ms = abs(n_pts) * ctx.step
    inner = ctx.with_range(start=ctx.start - window_ms)
    df = eval_series(inner, call, "seriesList", 0)
    pts = df.groupBy("name").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("value")))
        ).alias("__pts")
    )
    pre = F.filter(
        F.col("__pts"), lambda x: x["ts"] < F.lit(ctx.start)
    )
    pre_vals = F.filter(
        F.transform(pre, lambda x: x["value"]), lambda x: x.isNotNull()
    )
    seed = F.coalesce(
        F.when(
            F.size(pre_vals) > 0,
            F.aggregate(pre_vals, F.lit(0.0), lambda a, x: a + x)
            / F.size(pre_vals).cast("double"),
        ),
        F.lit(0.0),
    )
    rest = F.filter(
        F.col("__pts"), lambda x: x["ts"] >= F.lit(ctx.start)
    )
    folded = F.aggregate(
        rest,
        F.struct(
            seed.alias("ema"),
            F.array().cast(
                "array<struct<ts:bigint,value:double>>"
            ).alias("out"),
        ),
        lambda acc, x: F.struct(
            # NO NaN guard: transform.go:1568-1571 blends every point,
            # so one NaN hole poisons the EMA for the rest of the series
            (F.lit(c) * x["value"] + F.lit(1.0 - c) * acc["ema"]).alias(
                "ema"
            ),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["ts"].alias("ts"),
                        (
                            F.lit(c) * x["value"]
                            + F.lit(1.0 - c) * acc["ema"]
                        ).alias("value"),
                    )
                ),
            ).alias("out"),
        ),
    )["out"]
    wtext = _arg_text(call, "windowSize", 1)
    exploded = pts.select(
        "name", F.explode(folded).alias("__p")
    ).select(
        F.concat(
            F.lit("exponentialMovingAverage("),
            F.col("name"),
            F.lit(f",{wtext})"),
        ).alias("name"),
        F.col("__p.ts").alias("ts"),
        F.col("__p.value").alias("value"),
    )
    return exploded.filter(F.col("ts") >= F.lit(ctx.start))


@register("stdev")
def _f_stdev(ctx, call):
    """Trailing moving population stddev over `points` grid points
    INCLUDING the current one; NULL when the missing fraction exceeds
    windowTolerance (graphite-web stdev)."""
    k = int(get_number(call, "points", 1))
    tol = get_number(call, "windowTolerance", 2, 0.1)
    df = eval_series(ctx, call, "seriesList", 0)
    # transformStdev (transform.go:4700-4727): trailing window of k
    # points WITHOUT extending the range (partial windows at the
    # start), emitted when n/points >= windowTolerance; population
    # stddev via sqrt(n·Σv² − (Σv)²)/n
    win = _series_window().rowsBetween(-(k - 1), 0)
    n = F.count("value").over(win).cast("double")
    sm = F.sum("value").over(win)
    sm2 = F.sum(F.col("value") * F.col("value")).over(win)
    ok = (n > 0) & (n / F.lit(float(k)) >= F.lit(tol))
    sd = F.sqrt(n * sm2 - sm * sm) / n
    out = df.withColumn("value", F.when(ok, sd))
    return _rename(
        out, F.concat(F.lit("stdev("), F.col("name"), F.lit(f",{k})"))
    )


# ------------------------------------------------- summarize / hitcount


def _bucketize(
    ctx, call, interval: int, anchor: int, end2: int, agg: str, name_fmt,
    smart: bool = False,
):
    """Shared summarize/smartSummarize bucketing. summarize emits every
    bucket whose START is before the end (transformSummarize's
    `for ts < endTime` loop); smartSummarize goes through
    series.summarize() whose pointsLen = (end-start)/step FLOORS the
    count. Buckets are densified (NaN holes kept) and the output
    carries __step = interval for downstream normalization."""
    inner = ctx.with_range(start=min(anchor, ctx.start), end=end2)
    df = _with_ord(eval_series(inner, call, "seriesList", 0))
    df = df.filter(F.col("ts") >= F.lit(anchor))
    span = end2 - anchor
    nb = span // interval if smart else -(-span // interval)
    bucket = F.floor((F.col("ts") - F.lit(anchor)) / F.lit(interval))
    vals = (
        df.withColumn("__b", bucket)
        .filter(F.col("__b") < F.lit(nb))
        # duplicate same-named input series stay separate (keyed by
        # their arg position) — a summarize over group(x, x) yields TWO
        # series, not one merged bucket sum
        .groupBy("name", F.col(_ORD), "__b")
        .agg(_agg_expr(agg, ctx.xfiles_factor).alias("value"))
    )
    # single-branch densification (see evaluator.densify): per-series
    # bucket map + grid explode instead of distinct × join — the map
    # holds at most nb entries (render-bounded)
    bgrid = (
        # longs: an int sequence would int-multiply with the
        # interval downstream and overflow on epoch-scale anchors
        F.sequence(
            F.lit(0).cast("long"),
            F.lit(max(int(nb) - 1, -1)).cast("long"),
        )
        if nb > 0
        else F.array().cast("array<long>")
    )
    per = vals.groupBy("name", F.col(_ORD)).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__b", "value"))
        ).alias("__m")
    )
    out = per.select(
        "name", F.col(_ORD), "__m", F.explode(bgrid).alias("__b")
    ).select(
        "name",
        F.col(_ORD),
        (
            F.lit(int(anchor)).cast("long")
            + F.col("__b") * F.lit(int(interval)).cast("long")
        ).alias("ts"),
        F.try_element_at("__m", F.col("__b")).alias("value"),
    )
    return out.select(
        name_fmt(F.col("name")).alias("name"),
        F.col(_ORD),
        "ts",
        "value",
        F.lit(int(interval)).alias(_STEP),
    )


@register("summarize")
def _f_summarize(ctx, call):
    """Bucket aggregation at a coarser interval
    (transform.go:3284-3337). Without alignToFrom the range is aligned
    down/up to interval boundaries."""
    interval_s = get_string(call, "intervalString", 1)
    interval = parse_interval(interval_s)
    if interval <= 0:
        raise GraphiteEvalError("summarize: interval must be positive")
    func = get_string(call, "func", 2, "sum")
    align = get_bool(call, "alignToFrom", 3, False)
    if align:
        anchor, end2 = ctx.start, ctx.end
    else:
        # transformSummarize:3313-3316 — the end ALWAYS grows by a full
        # interval when already aligned (endTime += interval - end%interval)
        anchor = ctx.start - ctx.start % interval
        end2 = ctx.end + (interval - ctx.end % interval)
    suffix = (
        f",'{interval_s}','{func}',true)" if align
        else f",'{interval_s}','{func}')"
    )
    return _bucketize(
        ctx, call, interval, anchor, end2, func,
        lambda n: F.concat(F.lit("summarize("), n, F.lit(suffix)),
        smart=True,
    )


@register("smartSummarize")
def _f_smart_summarize(ctx, call):
    """summarize aligned to the render start (graphite-web
    smartSummarize with default alignTo)."""
    interval_s = get_string(call, "intervalString", 1)
    interval = parse_interval(interval_s)
    func = get_string(call, "func", 2, "sum")
    align = get_arg(call, "alignTo", 3, None)
    start = ctx.start
    if align is not None:
        unit = str(
            align.value if isinstance(align, Literal) else align.pattern
        )
        start = _align_time_unit(ctx.start, unit)
        ctx = ctx.with_range(start=start)
    return _bucketize(
        ctx, call, interval, start, ctx.end, func,
        lambda n: F.concat(
            F.lit("smartSummarize("),
            n,
            F.lit(f",'{interval_s}','{func}')"),
        ),
        smart=True,
    )


@register("hitcount")
def _f_hitcount(ctx, call):
    """Σ v·step_seconds per bucket — estimated hit count assuming
    per-second rates (transform.go:2040-2120)."""
    interval_s = get_string(call, "intervalString", 1)
    interval = parse_interval(interval_s)
    align = get_bool(call, "alignToInterval", 2, False)
    anchor = ctx.start
    if align:
        # snap the start down to the interval's natural unit
        # (transformHitcount:2060-2073) — day/hour/minute boundaries
        if interval >= 86_400_000:
            anchor -= anchor % 86_400_000
        elif interval >= 3_600_000:
            anchor -= anchor % 3_600_000
        elif interval >= 60_000:
            anchor -= anchor % 60_000
        ctx = ctx.with_range(start=anchor)
    df = eval_series(ctx, call, "seriesList", 0).filter(
        F.col("value").isNotNull()
    )
    # transformHitcount (2078-2114): each point contributes
    # v·(t − t_prev)/1e3 to the bucket CONTAINING it, where t_prev is
    # the previous point (clamped to the bucket start for the first
    # point in a bucket, which ALSO earns a carry of
    # v_prev·(t − bucket_start)/1e3); a zero bucket renders NaN
    w = _series_window()
    lag_t = F.lag("ts").over(w)
    lag_v = F.lag("value").over(w)
    b = F.floor((F.col("ts") - F.lit(anchor)) / F.lit(interval)).cast(
        "long"
    )
    bstart = F.lit(anchor) + b * F.lit(interval)
    first_in_bucket = lag_t.isNull() | (lag_t < bstart)
    contrib = F.when(
        first_in_bucket,
        (F.col("value") + F.coalesce(lag_v, F.lit(0.0)))
        * (F.col("ts") - bstart).cast("double")
        / 1000.0,
    ).otherwise(
        F.col("value") * (F.col("ts") - lag_t).cast("double") / 1000.0
    )
    sums = (
        df.withColumn("__b", b)
        .withColumn("__c", contrib)
        .groupBy("name", "__b")
        .agg(F.sum("__c").alias("__sum"))
    )
    # the reference emits EVERY bucket in [start, end) — an empty bucket
    # with a later sample still earns the carry
    # vPrev·(t_next − bucket_start)/1e3 (transform.go:2086-2091); no
    # samples yet / no samples after → 0 → NaN
    nbuckets = -(-(ctx.end - anchor) // interval)
    series = df.select("name").distinct()
    bgrid = series.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.lit(int(max(nbuckets - 1, 0))).cast("long"),
            )
        ),
    )
    markers = bgrid.select(
        "name",
        (
            F.lit(int(anchor)).cast("long")
            + F.col("__b") * F.lit(int(interval)).cast("long")
        ).alias("ts"),
        F.col("__b"),
        F.lit(1).alias("__m"),
    )
    pts = df.select(
        "name", "ts", F.lit(None).cast("long").alias("__b"),
        F.lit(0).alias("__m"), "value",
    )
    uni = markers.withColumn("value", F.lit(None).cast("double")).unionByName(
        pts
    )
    # markers sort BEFORE data at the same ts: a sample AT the bucket
    # start belongs to the bucket (non-empty), and counts as "next"
    w_prev = (
        Window.partitionBy("name")
        .orderBy("ts", F.col("__m").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("name")
        .orderBy("ts", F.col("__m").desc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    prev_v = F.last(
        F.when(F.col("__m") == 0, F.col("value")), ignorenulls=True
    ).over(w_prev)
    next_t = F.first(
        F.when(F.col("__m") == 0, F.col("ts")), ignorenulls=True
    ).over(w_next)
    carries = (
        uni.withColumn("__pv", prev_v)
        .withColumn("__nt", next_t)
        .filter(F.col("__m") == 1)
        .select(
            "name",
            F.col("__b"),
            F.when(
                F.col("__pv").isNotNull() & F.col("__nt").isNotNull(),
                F.col("__pv")
                * (F.col("__nt") - F.col("ts")).cast("double")
                / 1000.0,
            ).alias("__carry"),
        )
    )
    out = (
        carries.join(sums, ["name", "__b"], "left")
        .withColumn("value", F.coalesce(F.col("__sum"), F.col("__carry")))
        .withColumn(
            "value", F.when(F.col("value") != 0.0, F.col("value"))
        )
        .select(
            "name",
            (
                F.lit(int(anchor)).cast("long")
                + F.col("__b") * F.lit(int(interval)).cast("long")
            ).alias("ts"),
            "value",
        )
    )
    suffix = (
        f",'{interval_s}',true)" if align else f",'{interval_s}')"
    )
    return _rename(
        out,
        F.concat(F.lit("hitcount("), F.col("name"), F.lit(suffix)),
    )


# ------------------------------------------- series filters / selection


def _filter_by_stat(df: DataFrame, agg: str, op: str, threshold: float):
    """filterSeriesGeneric (transform.go:1645-1665): keep series whose
    whole-range statistic satisfies the comparison."""
    stats = _series_stats(df, agg)
    ops = {
        ">": F.col("__stat") > threshold,
        ">=": F.col("__stat") >= threshold,
        "<": F.col("__stat") < threshold,
        "<=": F.col("__stat") <= threshold,
        "=": F.col("__stat") == threshold,
        "!=": F.col("__stat") != threshold,
    }
    if op not in ops:
        raise GraphiteEvalError(f"unsupported operator {op!r}")
    keep = stats.filter(ops[op]).select("name")
    return df.join(F.broadcast(keep), "name", "left_semi")


def _make_stat_filter(agg: str, op: str):
    def f(ctx, call):
        n = get_number(call, "n", 1)
        df = eval_series(ctx, call, "seriesList", 0)
        return _filter_by_stat(df, agg, op, n)

    return f


register("averageAbove")(_make_stat_filter("average", ">"))
register("averageBelow")(_make_stat_filter("average", "<"))
register("currentAbove")(_make_stat_filter("last", ">"))
register("currentBelow")(_make_stat_filter("last", "<"))
register("maximumAbove")(_make_stat_filter("max", ">"))
register("maximumBelow")(_make_stat_filter("max", "<"))
register("minimumAbove")(_make_stat_filter("min", ">"))
register("minimumBelow")(_make_stat_filter("min", "<"))


@register("filterSeries")
def _f_filter_series(ctx, call):
    func = get_string(call, "func", 1)
    op = get_string(call, "operator", 2)
    threshold = get_number(call, "threshold", 3)
    df = eval_series(ctx, call, "seriesList", 0)
    return _filter_by_stat(df, func, op, threshold)


def _top_by_stat(df: DataFrame, agg: str, n: int, lowest: bool):
    """highestGeneric/lowestGeneric (transform.go:1920-1999) — two-phase
    top-k: per-series stat, rank (ties broken by name for determinism
    where the reference's heap order is arbitrary), broadcast semi-join
    back. Scale-safe: the window ranks series-level rows, not samples."""
    stats = _series_stats(df, agg)
    order = (
        [F.col("__stat").asc_nulls_last(), F.col("name")]
        if lowest
        else [F.col("__stat").desc_nulls_last(), F.col("name")]
    )
    w = Window.orderBy(*order)
    keep = (
        stats.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .select("name")
    )
    return df.join(F.broadcast(keep), "name", "left_semi")


def _make_top(agg: str, lowest: bool):
    def f(ctx, call):
        n = int(get_number(call, "n", 1, 1))
        df = eval_series(ctx, call, "seriesList", 0)
        return _top_by_stat(df, agg, n, lowest)

    return f


register("highestAverage")(_make_top("average", False))
register("highestCurrent")(_make_top("last", False))
register("highestMax")(_make_top("max", False))
register("lowestAverage")(_make_top("average", True))
register("lowestCurrent")(_make_top("last", True))


@register("highest")
def _f_highest(ctx, call):
    n = int(get_number(call, "n", 1, 1))
    func = get_string(call, "func", 2, "average")
    return _top_by_stat(
        eval_series(ctx, call, "seriesList", 0), func, n, False
    )


@register("lowest")
def _f_lowest(ctx, call):
    n = int(get_number(call, "n", 1, 1))
    func = get_string(call, "func", 2, "average")
    return _top_by_stat(
        eval_series(ctx, call, "seriesList", 0), func, n, True
    )


@register("mostDeviant")
def _f_most_deviant(ctx, call):
    n = int(get_number(call, "n", 1))
    return _top_by_stat(
        eval_series(ctx, call, "seriesList", 0), "stddev", n, False
    )


@register("limit")
def _f_limit(ctx, call):
    """First n series; series order is undefined in the reference
    (storage arrival) — we define it as name order."""
    n = int(get_number(call, "n", 1))
    df = _with_ord(eval_series(ctx, call, "seriesList", 0))
    w = Window.orderBy(F.col(_ORD), F.col("name"))
    keep = (
        df.select(_ORD, "name")
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .select("name")
    )
    return df.join(F.broadcast(keep), "name", "left_semi").select(
        "name", "ts", "value"
    )


@register("exclude")
def _f_exclude(ctx, call):
    pat = get_string(call, "pattern", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    return df.filter(~F.col("name").rlike(pat))


@register("grep")
def _f_grep(ctx, call):
    pat = get_string(call, "pattern", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    return df.filter(F.col("name").rlike(pat))


@register("removeAboveValue")
def _f_remove_above_value(ctx, call):
    n = get_number(call, "n", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn(
        "value", F.when(F.col("value") <= F.lit(float(n)), F.col("value"))
    )
    return _rename(
        out,
        F.concat(
            F.lit("removeAboveValue("), F.col("name"), F.lit(f",{go_g(n)})")
        ),
    )


@register("removeBelowValue")
def _f_remove_below_value(ctx, call):
    n = get_number(call, "n", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    out = df.withColumn(
        "value", F.when(F.col("value") >= F.lit(float(n)), F.col("value"))
    )
    return _rename(
        out,
        F.concat(
            F.lit("removeBelowValue("), F.col("name"), F.lit(f",{go_g(n)})")
        ),
    )


def _series_pct(df: DataFrame, p: float) -> DataFrame:
    """(name, __p): per-series nearest-rank percentile of all points."""
    return df.groupBy("name").agg(
        F.try_element_at(
            F.array_sort(F.collect_list("value")),
            _pct_index(F.count("value"), p),
        ).alias("__p")
    )


@register("removeAbovePercentile")
def _f_remove_above_percentile(ctx, call):
    n = get_number(call, "n", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    pcts = _series_pct(df, n / 100.0)
    out = df.join(F.broadcast(pcts), "name").withColumn(
        "value", F.when(F.col("value") <= F.col("__p"), F.col("value"))
    )
    return _rename(
        out,
        F.concat(
            F.lit("removeAbovePercentile("), F.col("name"), F.lit(f",{go_g(n)})")
        ),
    )


@register("removeBelowPercentile")
def _f_remove_below_percentile(ctx, call):
    n = get_number(call, "n", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    pcts = _series_pct(df, n / 100.0)
    out = df.join(F.broadcast(pcts), "name").withColumn(
        "value", F.when(F.col("value") >= F.col("__p"), F.col("value"))
    )
    return _rename(
        out,
        F.concat(
            F.lit("removeBelowPercentile("), F.col("name"), F.lit(f",{go_g(n)})")
        ),
    )


@register("removeBetweenPercentile")
def _f_remove_between_percentile(ctx, call):
    """Keep only series with at least one point OUTSIDE the
    [n, 100-n] percentile band of the pointwise cross-series
    distribution (graphite-web removeBetweenPercentile)."""
    n = get_number(call, "n", 1)
    lo, hi = min(n, 100 - n) / 100.0, max(n, 100 - n) / 100.0
    df = _with_ord(eval_series(ctx, call, "seriesList", 0))
    vs = F.array_sort(F.collect_list("value"))
    cnt = F.count("value")
    bands = df.groupBy("ts").agg(
        F.try_element_at(vs, _pct_index(cnt, lo)).alias("__lo"),
        F.try_element_at(vs, _pct_index(cnt, hi)).alias("__hi"),
    )
    joined = df.join(F.broadcast(bands), "ts")
    outside = joined.filter(
        (F.col("value") < F.col("__lo")) | (F.col("value") > F.col("__hi"))
    ).select("name").distinct()
    return df.join(F.broadcast(outside), "name", "left_semi")


@register("averageOutsidePercentile")
def _f_average_outside_percentile(ctx, call):
    """Keep series whose average lies outside the [n, 100-n]
    percentiles of all series' averages (transform.go
    transformAverageOutsidePercentile)."""
    n = get_number(call, "n", 1)
    lo, hi = min(n, 100 - n) / 100.0, max(n, 100 - n) / 100.0
    df = eval_series(ctx, call, "seriesList", 0)
    avgs = _series_stats(df, "average")
    vs = F.array_sort(F.collect_list("__stat"))
    cnt = F.count("__stat")
    band = avgs.agg(
        F.try_element_at(vs, _pct_index(cnt, lo)).alias("__lo"),
        F.try_element_at(vs, _pct_index(cnt, hi)).alias("__hi"),
    )
    keep = (
        avgs.crossJoin(F.broadcast(band))
        .filter(
            (F.col("__stat") < F.col("__lo"))
            | (F.col("__stat") > F.col("__hi"))
        )
        .select("name")
    )
    return df.join(F.broadcast(keep), "name", "left_semi")


@register("nPercentile")
def _f_n_percentile(ctx, call):
    """Constant per-series percentile line (graphite-web
    nPercentile)."""
    n = get_number(call, "n", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    pcts = _series_pct(df, n / 100.0)
    out = df.join(F.broadcast(pcts), "name").withColumn(
        "value", F.col("__p")
    )
    return _rename(
        out,
        F.concat(
            F.lit("nPercentile("), F.col("name"), F.lit(f",{go_g(n)})")
        ),
    )


@register("removeEmptySeries")
def _f_remove_empty_series(ctx, call):
    xff_node = get_arg(call, "xFilesFactor", 1, None)
    df = eval_series(ctx, call, "seriesList", 0)
    counts = df.groupBy("name").agg(
        F.count("value").alias("__n"), F.count(F.lit(1)).alias("__n_all")
    )
    if xff_node is None:
        keep = counts.filter(F.col("__n") > 0)
    else:
        xff = get_number(call, "xFilesFactor", 1)
        keep = counts.filter(
            F.col("__n").cast("double")
            >= F.col("__n_all").cast("double") * F.lit(float(xff))
        )
    return df.join(F.broadcast(keep.select("name")), "name", "left_semi")


@register("fallbackSeries")
def _f_fallback_series(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    if df.isEmpty():
        return eval_series(ctx, call, "fallback", 1)
    return df


@register("useSeriesAbove")
def _f_use_series_above(ctx, call):
    """For series with max > value, fetch the series named
    replace(name, search, replace) (graphite-web useSeriesAbove)."""
    from victoriametrics_spark.graphite.evaluator import densify as _d

    value = get_number(call, "value", 1)
    search = get_string(call, "search", 2)
    repl = get_string(call, "replace", 3)
    df = eval_series(ctx, call, "seriesList", 0)
    stats = _series_stats(df, "max")
    names2 = stats.filter(F.col("__stat") > value).select(
        F.regexp_replace("name", search, repl).alias("name")
    )
    raw = ctx.samples.join(F.broadcast(names2), "name").filter(
        (F.col("ts") >= ctx.start) & (F.col("ts") < ctx.end)
    )
    i = F.floor((F.col("ts") - F.lit(ctx.start)) / F.lit(ctx.step)).cast(
        "long"
    )
    cons = (
        raw.withColumn("__i", i)
        .groupBy("name", "__i")
        .agg(F.avg("value").alias("value"))
    )
    return _d(ctx, cons)


# ---------------------------------------------------------------- sorts


@register("sortByName")
def _f_sort_by_name(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    return df.orderBy("name", "ts")


@register("sortByTotal")
def _f_sort_by_total(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    stats = _series_stats(df, "sum")
    return (
        df.join(F.broadcast(stats), "name")
        .orderBy(F.col("__stat").desc_nulls_last(), "name", "ts")
        .select("name", "ts", "value")
    )


@register("sortByMaxima")
def _f_sort_by_maxima(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    stats = _series_stats(df, "max")
    return (
        df.join(F.broadcast(stats), "name")
        .orderBy(F.col("__stat").desc_nulls_last(), "name", "ts")
        .select("name", "ts", "value")
    )


@register("sortByMinima")
def _f_sort_by_minima(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    # series whose MAX is <= 0 (or all-NaN) are dropped first
    # (transformSortByMinima:4941-4948)
    maxes = _series_stats(df, "max").filter(F.col("__stat") > 0).select(
        "name"
    )
    df = df.join(F.broadcast(maxes), "name", "left_semi")
    stats = _series_stats(df, "min")
    return (
        df.join(F.broadcast(stats), "name")
        .orderBy(F.col("__stat").asc_nulls_last(), "name", "ts")
        .select("name", "ts", "value")
    )


@register("sortBy")
def _f_sort_by(ctx, call):
    func = get_string(call, "func", 1, "average")
    reverse = get_bool(call, "reverse", 2, False)
    df = eval_series(ctx, call, "seriesList", 0)
    stats = _series_stats(df, func)
    order = (
        F.col("__stat").desc_nulls_last()
        if reverse
        else F.col("__stat").asc_nulls_last()
    )
    return (
        df.join(F.broadcast(stats), "name")
        .orderBy(order, "name", "ts")
        .select("name", "ts", "value")
    )


# ---------------------------------------------------------------- alias


@register("alias")
def _f_alias(ctx, call):
    new = get_string(call, "newName", 1)
    df = eval_series(ctx, call, "seriesList", 0)
    return _rename_keep_path(df, F.lit(new))


@register("aliasByMetric")
def _f_alias_by_metric(ctx, call):
    df = eval_series(ctx, call, "seriesList", 0)
    names = [r[0] for r in df.select("name").distinct().collect()]

    def last_node(nm):
        return _py_path_from_name(nm).split(".")[-1]

    return _rename_keep_path(df, _name_map_expr(names, last_node))


@register("aliasByNode", "aliasByTags")
def _f_alias_by_node(ctx, call):
    """Join the selected path nodes (ints) and/or tag values (strings)
    with dots (transform.go transformAliasByNode; tags share the
    implementation as in graphite-web)."""
    df = eval_series(ctx, call, "seriesList", 0)
    specs = []
    for node in call.args[1:]:
        if isinstance(node, Literal) and isinstance(
            node.value, (int, float)
        ):
            specs.append(int(node.value))
        elif isinstance(node, Literal) and isinstance(node.value, str):
            specs.append(node.value)
        else:
            # unquoted words parse as metric exprs — getNodes rejects
            raise GraphiteEvalError(
                f"{call.func}: node must be a number or quoted string; "
                f"got {getattr(node, 'text', node)!r}"
            )
    if not specs:
        # zero nodes → empty name (getNameFromNodes over no selectors)
        return _rename_keep_path(df, F.lit(""))
    names = [r[0] for r in df.select("name").distinct().collect()]

    def from_nodes(nm):
        # getNameFromNodes (transform.go:3684-3704): int nodes index the
        # parsed path, string nodes look up tags; missing entries are
        # SKIPPED (no empty parts)
        parts = _py_path_from_name(nm).split(".")
        tags = _py_tags_from_name(nm)
        dst = []
        for sp in specs:
            if isinstance(sp, int):
                n = sp if sp >= 0 else len(parts) + sp
                if 0 <= n < len(parts):
                    dst.append(parts[n])
            else:
                v = tags.get(sp, "")
                if v:
                    dst.append(v)
        return ".".join(dst)

    return _rename_keep_path(df, _name_map_expr(names, from_nodes))


@register("aliasSub")
def _f_alias_sub(ctx, call):
    r"""regex-substitute on names; graphite \1 backrefs → Spark $1."""
    import re as _re

    search = get_string(call, "search", 1)
    repl = get_string(call, "replace", 2)
    repl = _re.sub(r"\\(\d)", r"$\1", repl)
    df = eval_series(ctx, call, "seriesList", 0)
    return _rename_keep_path(df, F.regexp_replace("name", search, repl))


@register("substr")
def _f_substr(ctx, call):
    start = int(get_number(call, "start", 1, 0))
    stop = int(get_number(call, "stop", 2, 0))
    df = eval_series(ctx, call, "seriesList", 0)
    names = [r[0] for r in df.select("name").distinct().collect()]

    def sub(nm):
        # transformSubstr (4653-4676): Python-slice clamping over the
        # PARSED path split on '.'; tags ride along on the last node
        parts = _py_path_from_name(nm).split(".")
        n = len(parts)
        lo, hi = start, stop
        if lo > n:
            lo = n
        elif lo < 0:
            lo = max(n + lo, 0)
        if hi == 0:
            hi = n
        elif hi > n:
            hi = n
        elif hi < 0:
            hi = max(n + hi, 0)
        if hi < lo:
            hi = lo
        return ".".join(parts[lo:hi])

    return _rename(df, _name_map_expr(names, sub))


# -------------------------------------------------------- binary combine


def _percent_total_name(names: list[str]) -> str:
    """formatAggrFuncForPercentSeriesNames (transform.go:4016-4024):
    one series keeps its own name; several become
    sumSeries(<sorted, deduped>)."""
    seen: dict[str, None] = {}
    for n in names:
        seen.setdefault(n, None)
    uniq = list(seen)
    if not uniq:
        return "None"
    if len(uniq) == 1:
        return uniq[0]
    return f"sumSeries({','.join(sorted(uniq))})"


def _as_percent_nodes(call: Call) -> list[int]:
    idxs = []
    for a in call.args[2:]:
        if isinstance(a, Literal) and isinstance(a.value, (int, float)):
            idxs.append(int(a.value))
    return idxs


@register("asPercent", "pct")
def _f_as_percent(ctx, call):
    """v / total · 100 — full transformAsPercent (transform.go:692-862)
    semantics: total may be None (pointwise sum of the list, optionally
    grouped by nodes), a number, a single series, a positionally paired
    list, or a node-grouped expression with asPercent(...,MISSING)
    markers for unmatched node keys."""
    df = _with_ord(eval_series(ctx, call, "seriesList", 0))
    total_node = get_arg(call, "total", 1, None)
    nodes = _as_percent_nodes(call)
    pct = lambda v, t: F.lit(100.0) * _go_div(v, t)  # noqa: E731

    total_is_none = total_node is None or (
        isinstance(total_node, Literal) and total_node.value is None
    )
    if total_is_none:
        # fetchNormalizedSeries[ByNodes] consolidates to the first
        # series' step before computing percentages
        df = normalize_series(ctx, df)
        key = (
            _nodes_key(F.col("name"), nodes) if nodes else F.lit("")
        )
        dfk = df.withColumn("__key", key)
        # per-key total name needs the (small) series metadata — built
        # from pathExpressions like the reference (a fetched glob
        # yields sumSeries(<glob>), not the expanded names)
        names = [
            (r["__key"], r[_PATH])
            for r in dfk.select("__key", _PATH).distinct().collect()
        ]
        by_key: dict[str, list[str]] = {}
        for k, n in names:
            by_key.setdefault(k, []).append(n)
        tname = F.lit("")
        for k, ns in by_key.items():
            tname = F.when(
                F.col("__key") == k, F.lit(_percent_total_name(ns))
            ).otherwise(tname)
        totals = dfk.groupBy("__key", "ts").agg(
            F.sum("value").alias("__total")
        )
        out = dfk.join(F.broadcast(totals), ["__key", "ts"], "left")
        out = out.withColumn("value", pct(F.col("value"), F.col("__total")))
        return _rename(
            out,
            F.concat(
                F.lit("asPercent("), F.col("name"), F.lit(","), tname,
                F.lit(")"),
            ),
        )

    if isinstance(total_node, Literal) and isinstance(
        total_node.value, (int, float)
    ):
        if nodes:
            raise GraphiteEvalError(
                "asPercent: unexpected non-empty nodes for numeric total"
            )
        t = float(total_node.value)
        out = df.withColumn(
            "value", F.col("value") / F.lit(t) * F.lit(100.0)
        )
        return _rename(
            out,
            F.concat(
                F.lit("asPercent("), F.col("name"), F.lit(f",{go_g(t)})")
            ),
        )

    tot = _with_ord(evaluate_target(ctx, total_node), 0)
    if not nodes:
        tnames = [
            (r[_ORD], r["name"])
            for r in tot.select(_ORD, "name").distinct().collect()
        ]
        if not tnames:
            # total matches zero series → empty response
            return df.filter(F.lit(False)).select("name", "ts", "value")
        if len(tnames) == 1:
            tname = tnames[0][1]
            t = tot.select(
                F.col("ts").alias("__tts"), F.col("value").alias("__total")
            )
            # the reference consolidates each series onto the total's
            # step before dividing (s.consolidate(ec, stepTotal),
            # transform.go:772-776) — needed when the total runs on a
            # coarser grid (constantLine's 3-point form)
            t_ts = sorted(r["__tts"] for r in t.select("__tts").distinct().collect())
            s_ts = sorted(
                r["ts"] for r in df.select("ts").distinct().collect()
            )
            if len(t_ts) >= 2 and t_ts != s_ts:
                step_t = t_ts[1] - t_ts[0]
                # s.consolidate(ec, stepTotal) is END-EXCLUSIVE
                # (pointsLen = (end-start)/step)
                bound = (
                    ctx.start
                    + (ctx.end - ctx.start) // step_t * step_t
                )
                bucket = (
                    F.floor((F.col("ts") - F.lit(t_ts[0])) / F.lit(step_t))
                    * F.lit(step_t)
                    + F.lit(t_ts[0])
                )
                df = (
                    df.groupBy("name", F.col(_ORD), bucket.alias("ts"))
                    .agg(F.avg("value").alias("value"))
                    .filter(F.col("ts") < F.lit(bound))
                )
                t = t.filter(F.col("__tts") < F.lit(bound))
            out = df.join(F.broadcast(t), df["ts"] == F.col("__tts"), "left")
            out = out.withColumn(
                "value", pct(F.col("value"), F.col("__total"))
            )
            return _rename(
                out,
                F.concat(
                    F.lit("asPercent("), F.col("name"), F.lit(f",{tname})")
                ),
            )
        # positional pairing (fetch order = (arg index, name) here):
        # series count must match the total count (transform.go:787-791);
        # both sides are normalized like fetchNormalizedSeries
        df = normalize_series(ctx, df)
        tot = normalize_series(ctx, tot)
        snames = [
            (r[_ORD], r["name"])
            for r in df.select(_ORD, "name").distinct().collect()
        ]
        if len(snames) != len(tnames):
            raise GraphiteEvalError(
                "asPercent: unexpected number of series returned by total "
                f"expression; got {len(tnames)}; want {len(snames)}"
            )
        pair_of = {
            sn: tn
            for (_, sn), (_, tn) in zip(sorted(snames), sorted(tnames))
        }
        tmap = F.create_map(
            *[F.lit(x) for kv in pair_of.items() for x in kv]
        )
        t = tot.select(
            F.col("name").alias("__tn2"),
            F.col("ts").alias("__tts"),
            F.col("value").alias("__total"),
        )
        out = df.withColumn("__tn", tmap[F.col("name")])
        out = out.join(
            F.broadcast(t),
            (out["__tn"] == t["__tn2"]) & (out["ts"] == t["__tts"]),
            "left",
        )
        out = out.withColumn("value", pct(F.col("value"), F.col("__total")))
        return _rename(
            out,
            F.concat(
                F.lit("asPercent("), F.col("name"), F.lit(","),
                F.col("__tn"), F.lit(")"),
            ),
        )

    # node-grouped total expression (transform.go:797-862)
    df = normalize_series(ctx, df)
    tot = normalize_series(ctx, tot)
    key = _nodes_key(F.col("name"), nodes)
    dfk = df.withColumn("__key", key)
    totk = tot.withColumn("__key", key)
    s_names = [
        (r["__key"], r["name"])
        for r in dfk.select("__key", "name").distinct().collect()
    ]
    t_names = [
        (r["__key"], r["name"])
        for r in totk.select("__key", "name").distinct().collect()
    ]
    t_by_key: dict[str, list[str]] = {}
    for k, n in t_names:
        t_by_key.setdefault(k, []).append(n)
    s_keys = {k for k, _ in s_names}
    tname = F.lit("")
    for k, ns in t_by_key.items():
        tname = F.when(
            F.col("__key") == k, F.lit(_percent_total_name(ns))
        ).otherwise(tname)
    totals = totk.groupBy("__key", "ts").agg(F.sum("value").alias("__total"))
    matched = (
        dfk.filter(F.col("__key").isin(*t_by_key) if t_by_key else F.lit(False))
        .join(F.broadcast(totals), ["__key", "ts"], "left")
        .withColumn("value", pct(F.col("value"), F.col("__total")))
    )
    matched = _rename(
        matched,
        F.concat(
            F.lit("asPercent("), F.col("name"), F.lit(","), tname, F.lit(")")
        ),
    )
    # series keys absent from total → asPercent(<name>,MISSING) all-NaN
    unmatched_s = (
        dfk.filter(
            ~F.col("__key").isin(*t_by_key) if t_by_key else F.lit(True)
        )
        .withColumn("value", F.lit(None).cast("double"))
    )
    unmatched_s = _rename(
        unmatched_s,
        F.concat(F.lit("asPercent("), F.col("name"), F.lit(",MISSING)")),
    )
    out = matched.select("name", "ts", "value").unionByName(
        unmatched_s.select("name", "ts", "value")
    )
    # total keys absent from series → asPercent(MISSING,<totalName>)
    missing_keys = [k for k in t_by_key if k not in s_keys]
    if missing_keys:
        grid = ctx.spark.range(ctx.npts).select(
            (F.lit(ctx.start) + F.col("id") * F.lit(ctx.step)).alias("ts")
        )
        for k in missing_keys:
            nm = f"asPercent(MISSING,{_percent_total_name(t_by_key[k])})"
            out = out.unionByName(
                grid.select(
                    F.lit(nm).alias("name"),
                    "ts",
                    F.lit(None).cast("double").alias("value"),
                )
            )
    return out


@register("divideSeries")
def _f_divide_series(ctx, call):
    """Pointwise division by a single divisor series
    (transform.go:1276-1340); NULL where the divisor is NULL or 0."""
    raw_df = eval_series(ctx, call, "dividendSeriesList", 0)
    divisor = normalize_series(
        ctx, eval_series(ctx, call, "divisorSeries", 1)
    )
    dnames = [r[0] for r in divisor.select("name").distinct().limit(2).collect()]
    df = normalize_series(ctx, raw_df) if dnames else raw_df
    if len(dnames) == 0:
        # empty divisor → all-NaN series named divideSeries(<n>,MISSING)
        # (transformDivideSeries missing-total branch)
        return df.select(
            F.concat(
                F.lit("divideSeries("), F.col("name"), F.lit(",MISSING)")
            ).alias("name"),
            "ts",
            F.lit(None).cast("double").alias("value"),
        )
    if len(dnames) != 1:
        raise GraphiteEvalError(
            "divideSeries: divisor must be exactly one series"
        )
    div = divisor.select(
        F.col("ts").alias("__dts"), F.col("value").alias("__dv")
    )
    out = df.join(F.broadcast(div), df["ts"] == F.col("__dts"), "left")
    out = out.withColumn(
        "value", _go_div(F.col("value"), F.col("__dv"))
    )
    return _rename(
        out,
        F.concat(
            F.lit("divideSeries("),
            F.col("name"),
            F.lit(f",{dnames[0]})"),
        ),
    )


def _zip_lists(ctx, call, agg: str, fname: str):
    """Pair the i-th series (name order) of two lists and combine
    pointwise (aggregateSeriesLists, transform.go — pairing is
    positional in the reference too)."""
    a = eval_series(ctx, call, "seriesListFirstPos", 0)
    b = eval_series(ctx, call, "seriesListSecondPos", 1)

    def ranked(df, ord_val):
        # pair order = (arg position within the list, name) — the
        # engine's deterministic stand-in for storage arrival order
        w = Window.orderBy(F.col("__o0"), F.col("name"))
        names = (
            df.select(F.col(_ORD).alias("__o0"), "name").distinct()
            .withColumn("__rk", F.row_number().over(w))
            .select("name", "__rk")
        )
        return (
            df.drop(_ORD)
            .join(F.broadcast(names), "name")
            .withColumn(_ORD, F.lit(ord_val))
        )

    a = normalize_series(ctx, a).select("name", _ORD, "ts", "value")
    b = normalize_series(ctx, b).select("name", _ORD, "ts", "value")
    na = a.select("name").distinct().count()
    nb = b.select("name").distinct().count()
    if na != nb:
        raise GraphiteEvalError(
            f"{fname}: series count mismatch: {na} vs {nb}"
        )
    ra, rb = ranked(a, 0), ranked(b, 1)
    names_a = ra.select("__rk", F.col("name").alias("__na")).distinct()
    names_b = rb.select(
        F.col("__rk").alias("__rkb"), F.col("name").alias("__nb")
    ).distinct()
    pairs = names_a.join(
        F.broadcast(names_b), F.col("__rk") == F.col("__rkb")
    )
    both = ra.unionByName(rb)
    out = (
        both.groupBy("__rk", "ts")
        .agg(_agg_expr(agg, ctx.xfiles_factor).alias("value"))
        .join(F.broadcast(pairs), "__rk")
        .select(
            F.concat(
                F.lit(f"{fname}("),
                F.col("__na"),
                F.lit(","),
                F.col("__nb"),
                F.lit(")"),
            ).alias("name"),
            "ts",
            "value",
        )
    )
    return out


@register("sumSeriesLists")
def _f_sum_series_lists(ctx, call):
    return _zip_lists(ctx, call, "sum", "sumSeries")


@register("diffSeriesLists")
def _f_diff_series_lists(ctx, call):
    return _zip_lists(ctx, call, "diff", "diffSeries")


@register("multiplySeriesLists")
def _f_multiply_series_lists(ctx, call):
    return _zip_lists(ctx, call, "multiply", "multiplySeries")


@register("divideSeriesLists")
def _f_divide_series_lists(ctx, call):
    a = eval_series(ctx, call, "dividendSeriesList", 0)
    b = eval_series(ctx, call, "divisorSeriesList", 1)

    def ranked(df):
        df = normalize_series(ctx, df)
        w = Window.orderBy(F.col("__o0"), F.col("name"))
        names = (
            df.select(F.col(_ORD).alias("__o0"), "name").distinct()
            .withColumn("__rk", F.row_number().over(w))
            .select("name", "__rk")
        )
        return df.select("name", "ts", "value").join(
            F.broadcast(names), "name"
        )

    na = a.select("name").distinct().count()
    nb_ = b.select("name").distinct().count()
    if na != nb_:
        raise GraphiteEvalError(
            f"divideSeriesLists: series count mismatch: {na} vs {nb_}"
        )
    ra = ranked(a)
    rb = ranked(b).select(
        F.col("__rk").alias("__rkb"),
        F.col("ts").alias("__tsb"),
        F.col("name").alias("__nb"),
        F.col("value").alias("__dv"),
    )
    out = ra.join(
        rb,
        (F.col("__rk") == F.col("__rkb")) & (F.col("ts") == F.col("__tsb")),
    )
    out = out.withColumn(
        "value", _go_div(F.col("value"), F.col("__dv"))
    )
    return out.select(
        F.concat(
            F.lit("divideSeries("),
            F.col("name"),
            F.lit(","),
            F.col("__nb"),
            F.lit(")"),
        ).alias("name"),
        "ts",
        "value",
    )


@register("aggregateSeriesLists")
def _f_aggregate_series_lists(ctx, call):
    func = get_string(call, "func", 2)
    return _zip_lists(ctx, call, func, f"{_canon_agg(func)}Series")


@register("weightedAverage")
def _f_weighted_average(ctx, call):
    """Σ_k avg_k·w_k / Σ_k w_k over node-matched pairs
    (transform.go:3339-3430)."""
    avg_df = normalize_series(
        ctx, eval_series(ctx, call, "seriesListAvg", 0)
    )
    w_df = normalize_series(
        ctx, eval_series(ctx, call, "seriesListWeight", 1)
    )
    idxs = []
    for a in call.args[2:]:
        if isinstance(a, Literal) and isinstance(a.value, (int, float)):
            idxs.append(int(a.value))
        else:
            raise GraphiteEvalError(
                f"weightedAverage: node must be a number; got "
                f"{getattr(a, 'text', a)!r}"
            )
    n_avg = avg_df.select("name").distinct().count()
    n_w = w_df.select("name").distinct().count()
    if n_avg != n_w:
        raise GraphiteEvalError(
            "weightedAverage: series len mismatch, got seriesListAvg: "
            f"{n_avg}, seriesListWeight: {n_w}"
        )
    key = _nodes_key(F.col("name"), idxs)

    def last_per_key(df):
        # the reference takes the LAST series of each node group
        # (transform.go:3375-3378) — last in (arg, name) order
        w = Window.partitionBy("__k").orderBy(
            F.col(_ORD).desc(), F.col("name").desc()
        )
        picked = (
            df.withColumn("__k", key)
            .select("__k", _ORD, "name")
            .distinct()
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select(
                F.col("__k").alias("__kp"), F.col("name").alias("__pick")
            )
        )
        return (
            df.withColumn("__k", key)
            .join(
                F.broadcast(picked),
                (F.col("__k") == F.col("__kp"))
                & (F.col("name") == F.col("__pick")),
            )
            .drop("__kp", "__pick")
        )

    a = last_per_key(avg_df).select(
        "__k", "ts", F.col("value").alias("__a")
    )
    wl = last_per_key(w_df).select(
        F.col("__k").alias("__kw"),
        F.col("ts").alias("__tsw"),
        F.col("value").alias("__w"),
    )
    joined = a.join(
        wl, (a["__k"] == F.col("__kw")) & (a["ts"] == F.col("__tsw"))
    )
    num = joined.groupBy("ts").agg(
        F.sum(F.col("__a") * F.col("__w")).alias("__num")
    )
    # the denominator sums EVERY weight series, matched or not
    # (transform.go:3397-3401)
    den = w_df.groupBy("ts").agg(F.sum("value").alias("__den"))
    out = num.join(den, "ts").select(
        "ts", _go_div(F.col("__num"), F.col("__den")).alias("value")
    )
    a_paths = avg_df.agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_set(F.col(_PATH)))), ","
        ).alias("__pa")
    )
    w_paths = w_df.agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_set(F.col(_PATH)))), ","
        ).alias("__pw")
    )
    nodes_str = ",".join(str(i) for i in idxs)
    return (
        out.crossJoin(F.broadcast(a_paths))
        .crossJoin(F.broadcast(w_paths))
        .select(
            F.concat(
                F.lit("weightedAverage("),
                F.col("__pa"),
                F.lit(","),
                F.col("__pw"),
                F.lit(f",{nodes_str})"),
            ).alias("name"),
            "ts",
            "value",
        )
    )


# ------------------------------------------------------------ time ops


@register("timeShift")
def _f_time_shift(ctx, call):
    """Plot data from `interval` ago at today's positions. An unsigned
    interval means the past (graphite-web parseTimeOffset default
    sign '-')."""
    s = get_string(call, "timeShift", 1)
    d = parse_interval(s)
    if not s.strip().startswith(("+", "-")):
        d = -d
    reset_end = get_bool(call, "resetEnd", 2, True)
    inner = ctx.with_range(start=ctx.start + d, end=ctx.end + d)
    df = eval_series(inner, call, "seriesList", 0)
    if reset_end:
        # resetEnd=true (default) drops points past the ORIGINAL end
        # before unshifting (transformTimeShift:4391-4398)
        df = df.filter(F.col("ts") <= F.lit(ctx.end))
    out = df.withColumn("ts", F.col("ts") - F.lit(d))
    return _rename(
        out,
        F.concat(F.lit("timeShift("), F.col("name"), F.lit(f",'{s}')")),
    )


@register("timeSlice")
def _f_time_slice(ctx, call):
    """NULL outside [startSliceAt, endSliceAt]. Accepts epoch seconds
    or signed intervals relative to the render start (documented
    simplification of graphite's absolute-date parsing)."""

    def bound(name, pos, default_ms):
        node = get_arg(call, name, pos, None)
        if node is None:
            return default_ms
        # the reference takes STRING time specs only (getString)
        return parse_time_graphite(ctx, get_string(call, name, pos))

    lo = bound("startSliceAt", 1, ctx.start)
    hi = bound("endSliceAt", 2, ctx.end)
    df = eval_series(ctx, call, "seriesList", 0)
    v = F.when(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)),
        F.col("value"),
    )
    out = df.withColumn("value", v)
    # name carries the ABSOLUTE bounds in seconds
    # (transformTimeSlice: timeSlice(<name>,<start>,<end>))
    return _rename(
        out,
        F.concat(
            F.lit("timeSlice("),
            F.col("name"),
            F.lit(f",{lo // 1000},{hi // 1000})"),
        ),
    )


@register("timeStack")
def _f_time_stack(ctx, call):
    """Union of timeShift evaluations i·unit for i in
    [timeShiftStart, timeShiftEnd) (graphite-web timeStack)."""
    unit_s = get_string(call, "timeShiftUnit", 1, "1d")
    d = parse_interval(unit_s)
    if not unit_s.strip().startswith(("+", "-")):
        d = -d
    i0 = int(get_number(call, "timeShiftStart", 2, 0))
    i1 = int(get_number(call, "timeShiftEnd", 3, 7))
    if i0 > i1:
        raise GraphiteEvalError(
            f"timeStack: timeShiftStart ({i0}) must not exceed "
            f"timeShiftEnd ({i1})"
        )
    out = None
    for i in range(i0, i1 + 1):
        shift = d * i
        inner = ctx.with_range(start=ctx.start + shift, end=ctx.end + shift)
        df = eval_series(inner, call, "seriesList", 0)
        df = df.withColumn("ts", F.col("ts") - F.lit(shift))
        df = _rename(
            df,
            F.concat(
                F.lit("timeShift("),
                F.col("name"),
                F.lit(f",{unit_s},{i})"),
            ),
        )
        out = df if out is None else out.unionByName(df)
    return out if out is not None else empty_series(ctx)


# --------------------------------------------------- generated sources


@register("constantLine")
def _f_constant_line(ctx, call):
    if len(call.args) + len(call.kwargs) != 1:
        raise GraphiteEvalError(
            f"constantLine: expecting a single arg; got "
            f"{len(call.args) + len(call.kwargs)}"
        )
    v = get_number(call, "value", 0)
    # pathExpression = the expression text (constantLine:1137
    # safePathExpression) while the NAME is the bare value
    return constant_series(ctx, f"{go_g(v)}", v).withColumn(
        _PATH, F.lit(f"constantLine({go_g(v)})")
    )


@register("threshold")
def _f_threshold(ctx, call):
    v = get_number(call, "value", 0)
    label = get_string(call, "label", 1, f"{go_g(v)}")
    get_string(call, "color", 2, "")
    return constant_series(ctx, label, v).withColumn(
        _PATH, F.lit(call.text or f"threshold({go_g(v)})")
    )


def _stepped_grid(ctx, step_ms: int, inclusive: bool) -> DataFrame:
    """(id, ts) frame on start + k·step; `inclusive` matches the
    reference's per-function loop bound (time: ts <= endTime,
    transform.go:3446; sin/identity/randomWalk: ts < endTime)."""
    span = ctx.end - ctx.start
    n = span // step_ms + 1 if inclusive else (span + step_ms - 1) // step_ms
    grid = ctx.spark.range(max(0, int(n)))
    return grid.select(
        F.col("id"),
        (F.lit(ctx.start) + F.col("id") * F.lit(step_ms)).alias("ts"),
    )


@register("time", "timeFunction")
def _f_time(ctx, call):
    """time(name[, step=60]) — its OWN step (default 60s), end
    INCLUSIVE (transformTimeFunction, transform.go:3429-3460)."""
    name = get_string(call, "name", 0)
    step_ms = int(get_number(call, "step", 1, 60) * 1000)
    if step_ms <= 0:
        raise GraphiteEvalError(f"step must be positive; got {step_ms}")
    grid = _stepped_grid(ctx, step_ms, inclusive=True)
    return grid.select(
        F.lit(name).alias("name"),
        F.col("ts"),
        (F.col("ts") / F.lit(1000.0)).alias("value"),
        F.lit(step_ms).alias(_STEP),
    )


@register("sin", "sinFunction")
def _f_sin(ctx, call):
    """sin(name[, amplitude=1[, step=60]]) — end EXCLUSIVE
    (transformSinFunction, transform.go:5054-5090)."""
    name = get_string(call, "name", 0)
    amp = get_number(call, "amplitude", 1, 1.0)
    step_ms = int(get_number(call, "step", 2, 60) * 1000)
    if step_ms <= 0:
        raise GraphiteEvalError(f"step must be positive; got {step_ms}")
    grid = _stepped_grid(ctx, step_ms, inclusive=False)
    return grid.select(
        F.lit(name).alias("name"),
        F.col("ts"),
        (F.lit(float(amp)) * F.sin(F.col("ts") / F.lit(1000.0))).alias(
            "value"
        ),
        F.lit(step_ms).alias(_STEP),
    )


@register("identity")
def _f_identity(ctx, call):
    """identity(name) — fixed 60s step, end EXCLUSIVE
    (transformIdentity, transform.go:2130-2158)."""
    name = get_string(call, "name", 0)
    grid = _stepped_grid(ctx, 60_000, inclusive=False)
    return grid.select(
        F.lit(name).alias("name"),
        F.col("ts"),
        (F.col("ts") / F.lit(1000.0)).alias("value"),
        F.lit(60_000).alias(_STEP),
    )


@register("randomWalk", "randomWalkFunction")
def _f_random_walk(ctx, call):
    """Deterministic random walk: md5-derived uniform steps in
    [-0.5, 0.5) cumulated over the grid — unlike the reference's
    rand(), reproducible by any engine with md5 (same trick as
    operators/knn.py md5_planes)."""
    name = get_string(call, "name", 0)
    step_ms = int(get_number(call, "step", 1, 60) * 1000)
    if step_ms <= 0:
        raise GraphiteEvalError(f"step must be positive; got {step_ms}")
    grid = _stepped_grid(ctx, step_ms, inclusive=False)
    ts = F.col("ts")
    r = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(name + ":"), F.col("id"))), 1, 13
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**51))
        - F.lit(1.0)
    ) / F.lit(2.0)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    return grid.select(
        F.lit(name).alias("name"),
        F.col("ts"),
        F.sum(r).over(w).alias("value"),
        F.lit(step_ms).alias(_STEP),
    )


# ----------------------------------------------------------------- tags


def _tag_col(name_col: Column, tag: str) -> Column:
    """Graphite tagged-series format ``metric;tag=value;...``; the
    ``name`` pseudo-tag is the part before the first ';'."""
    if tag == "name":
        return F.split(name_col, ";")[0]
    return F.coalesce(
        F.regexp_extract(name_col, f";{tag}=([^;]*)", 1), F.lit("")
    )


@register("seriesByTag")
def _f_series_by_tag(ctx, call):
    """Fetch series whose tags match every expression; supports
    ``=``, ``!=``, ``=~``, ``!~`` (tags_api semantics)."""
    import re as _re

    pred = None
    for node in call.args:
        expr = (
            node.value if isinstance(node, Literal) else node.pattern
        )
        m = _re.match(r"([^!=~]+)(=~|!~|!=|=)(.*)", expr)
        if not m:
            raise GraphiteEvalError(
                f"seriesByTag: cannot parse {expr!r}"
            )
        tag, op, val = m.group(1), m.group(2), m.group(3)
        col = _tag_col(F.col("name"), tag)
        if op == "=":
            p = col == val
        elif op == "!=":
            p = col != val
        elif op == "=~":
            p = col.rlike(f"^(?:{val})$")
        else:
            p = ~col.rlike(f"^(?:{val})$")
        pred = p if pred is None else (pred & p)
    raw = ctx.samples.filter(pred).filter(
        (F.col("ts") >= ctx.start) & (F.col("ts") < ctx.end)
    )
    i = F.floor((F.col("ts") - F.lit(ctx.start)) / F.lit(ctx.step)).cast(
        "long"
    )
    cons = (
        raw.withColumn("__i", i)
        .groupBy("name", "__i")
        .agg(F.avg("value").alias("value"))
    )
    return densify(ctx, cons)


@register("groupByTags")
def _f_group_by_tags(ctx, call):
    """Aggregate series sharing the given tag values; result name =
    ``<name-tag>;tag1=v1;...`` (graphite-web groupByTags)."""
    func = get_string(call, "callback", 1)
    tags = []
    for i in range(len(call.args) - 2):
        tags.append(get_string(call, f"tag{i}", i + 2))
    df = normalize_series(
        ctx, _with_ord(eval_series(ctx, call, "seriesList", 0))
    )
    # formatKeyFromTags (transform.go:3997-4006): name part = callback
    # unless 'name' is among the selected tags; selected tags sorted as
    # "k=v" strings; absent tags render as "k="
    name_part = (
        _tag_col(F.col("name"), "name")
        if "name" in tags
        else F.lit(func)
    )
    kvs = sorted(t for t in tags if t != "name")
    parts = [name_part]
    for t in kvs:
        parts.append(
            F.concat(
                F.lit(f";{t}="),
                F.coalesce(_tag_col(F.col("name"), t), F.lit("")),
            )
        )
    key = F.concat(*parts)
    return _combine_by_key(df, key, func, ctx.xfiles_factor)


# --------------------------------------------------------- ctx modifiers


@register("consolidateBy")
def _f_consolidate_by(ctx, call):
    """Re-evaluate the inner expression with a different
    storage-consolidation function (render_api consolidateBy)."""
    func = get_string(call, "consolidationFunc", 1)
    if _canon_agg(func) not in _CONS_AGGS:
        raise GraphiteEvalError(
            f"consolidateBy: unknown consolidation function {func!r}"
        )
    ctx2 = replace(ctx, consolidation=_canon_agg(func))
    df = eval_series(ctx2, call, "seriesList", 0)
    wrapped = F.concat(
        F.lit("consolidateBy("), F.col("name"), F.lit(f",'{func}')")
    )
    return df.select(
        wrapped.alias("name"),
        "ts",
        "value",
        wrapped.alias(_PATH),
        F.lit(_canon_agg(func)).alias(_CF),
    )


@register("setXFilesFactor", "xFilesFactor")
def _f_set_xff(ctx, call):
    xff = get_number(call, "xFilesFactor", 1)
    ctx2 = replace(ctx, xfiles_factor=float(xff))
    return eval_series(ctx2, call, "seriesList", 0)


# ------------------------------------------------------- line aggregates


@register("aggregateLine")
def _f_aggregate_line(ctx, call):
    """Horizontal line at the per-series aggregate; keepStep=True keeps
    the grid, else 3 points (transform.go:348-395)."""
    func = get_string(call, "func", 1, "avg")
    keep_step = get_bool(call, "keepStep", 2, False)
    df = eval_series(ctx, call, "seriesList", 0)
    stats = _series_stats(df, func)
    # name carries the aggregated VALUE (%g, or None when NaN) —
    # transform.go:380-384 aggregateLine(<name>,<v>).  Go-%g is the
    # SHORTEST round-trip form (gofmt.py); Java's Double.toString on
    # JDK 17 is not shortest (JDK-4511638: 1.2799358207999999E22 for
    # 1.2799358208e22), so the formatting runs through an Arrow-batched
    # UDF on the render-sized per-series stats frame
    v_str = go_g_column(F.col("__stat"))
    named = stats.select(
        F.col("name").alias("__n0"),
        F.concat(
            F.lit("aggregateLine("), F.col("name"), F.lit(","), v_str,
            F.lit(")"),
        ).alias("name"),
        F.col("__stat").alias("value"),
    )
    if keep_step:
        # keepStep keeps each series' OWN timestamps (transform.go:372-375
        # overwrites s.Values in place)
        pts = df.select(F.col("name").alias("__n0"), "ts")
        return pts.join(F.broadcast(named), "__n0").select(
            "name", "ts", "value"
        )
    grid = ctx.spark.createDataFrame(
        [
            (ctx.start,),
            ((ctx.start + ctx.end) // 2,),
            (ctx.end,),
        ],
        "ts long",
    )
    return named.crossJoin(F.broadcast(grid)).select(
        "name", "ts", "value"
    )


@register("linearRegression")
def _f_linear_regression(ctx, call):
    """Per-series OLS fit over the render range, emitted at every grid
    point (transform.go transformLinearRegression). Pure aggregate
    algebra: slope = cov(t,v)/var(t)."""
    df = normalize_series(
        ctx, eval_series(ctx, call, "seriesList", 0)
    ).select("name", "ts", "value")
    # optional source range (startSourceAt/endSourceAt): the fit runs
    # over a re-evaluation of the inner expression on that range
    # (transform.go:5213-5240); the OUTPUT stays on the render grid

    def src_bound(name, pos, default_ms):
        node = get_arg(call, name, pos, None)
        if node is None or (
            isinstance(node, Literal) and node.value is None
        ):
            return default_ms
        if isinstance(node, Literal) and isinstance(
            node.value, (int, float)
        ):
            return int(node.value) * 1000
        return parse_time_graphite(ctx, get_string(call, name, pos))

    src_start = src_bound("startSourceAt", 1, ctx.start)
    src_end = src_bound("endSourceAt", 2, ctx.end)
    if (src_start, src_end) != (ctx.start, ctx.end):
        inner = ctx.with_range(start=src_start, end=src_end)
        src = normalize_series(
            inner, eval_series(inner, call, "seriesList", 0)
        ).select("name", "ts", "value")
    else:
        src = df
    t = (F.col("ts") / F.lit(1000.0))
    fit = (
        src.filter(F.col("value").isNotNull())
        .groupBy("name")
        .agg(
            F.covar_pop(t, F.col("value")).alias("__cov"),
            F.var_pop(t).alias("__var"),
            F.avg(t).alias("__mt"),
            F.avg("value").alias("__mv"),
        )
        .withColumn(
            "__slope",
            F.when(F.col("__var") > 0, F.col("__cov") / F.col("__var"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "__icept", F.col("__mv") - F.col("__slope") * F.col("__mt")
        )
    )
    out = df.join(F.broadcast(fit), "name").withColumn(
        "value",
        F.col("__icept") + F.col("__slope") * (F.col("ts") / F.lit(1000.0)),
    )
    suffix = f", {src_start // 1000}, {src_end // 1000})"
    return _rename(
        out,
        F.concat(F.lit("linearRegression("), F.col("name"), F.lit(suffix)),
    )


# ----------------------------------------------------- display no-ops


def _make_display_passthrough(wrap: bool):
    def f(ctx, call):
        df = eval_series(ctx, call, "seriesList", 0)
        if wrap:
            return _wrap_name(df, call.func)
        return df

    return f


for _disp in (
    "alpha",
    "color",
    "lineWidth",
    "cactiStyle",
):
    register(_disp)(_make_display_passthrough(False))


@register("secondYAxis")
def _f_second_y_axis(ctx, call):
    """Display-only; wraps the name (transformSecondYAxis)."""
    df = eval_series(ctx, call, "seriesList", 0)
    return _rename_keep_path(
        df, F.concat(F.lit("secondYAxis("), F.col("name"), F.lit(")"))
    )


@register("stacked")
def _f_stacked(ctx, call):
    """Cumulative stacking across series in (arg, name) order per
    timestamp; names wrap as stacked(<name>) only under the default
    stack (transformStacked:4745-4775). Inputs are normalized to a
    common grid first (the running total needs aligned points)."""
    stack_name = get_string(call, "stackName", 1, "__DEFAULT__")
    df = normalize_series(
        ctx, _with_ord(eval_series(ctx, call, "seriesList", 0))
    )
    w = (
        Window.partitionBy("ts")
        .orderBy(F.col(_ORD), F.col("name"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.withColumn(
        "value",
        F.when(F.col("value").isNotNull(), F.sum("value").over(w)),
    )
    if stack_name == "__DEFAULT__":
        return _rename(
            out, F.concat(F.lit("stacked("), F.col("name"), F.lit(")"))
        )
    return out.select("name", "ts", "value")


@register("dashed")
def _f_dashed(ctx, call):
    """Display-only, but the name carries the dash length
    (transformDashed: dashed(<name>,<len %g>), default 5)."""
    d = get_number(call, "dashLength", 1, 5.0)
    df = eval_series(ctx, call, "seriesList", 0)
    return _rename_keep_path(
        df,
        F.concat(F.lit("dashed("), F.col("name"), F.lit(f",{go_g(d)})")),
    )


@register("areaBetween")
def _f_area_between(ctx, call):
    """Display-only; wraps every series name
    (transformAreaBetween: areaBetween(<name>)) — requires exactly TWO
    series (the area's bounds)."""
    df = eval_series(ctx, call, "seriesList", 0)
    n = len(df.select("name").distinct().limit(3).collect())
    if n != 2:
        raise GraphiteEvalError(
            f"areaBetween: expecting exactly 2 series; got {n}"
        )
    return _rename_keep_path(
        df, F.concat(F.lit("areaBetween("), F.col("name"), F.lit(")"))
    )


@register("legendValue")
def _f_legend_value(ctx, call):
    """Append aggregate values to the legend name
    (graphite-web legendValue)."""
    df = eval_series(ctx, call, "seriesList", 0)
    out = df
    suffix = F.lit("")
    for i, node in enumerate(call.args[1:]):
        vtype = (
            node.value if isinstance(node, Literal) else node.pattern
        )
        stats = _series_stats(df, vtype).select(
            "name", F.col("__stat").alias(f"__s{i}")
        )
        out = out.join(F.broadcast(stats), "name", "left")
        suffix = F.concat(
            suffix,
            F.lit(f" ({vtype}: "),
            F.coalesce(
                F.format_number(F.col(f"__s{i}"), 6), F.lit("None")
            ),
            F.lit(")"),
        )
    return _rename(out, F.concat(F.col("name"), suffix))


@register("verticalLine")
def _f_vertical_line(ctx, call):
    """Marker at the given epoch-seconds timestamp
    (transform.go transformVerticalLine)."""
    if len(call.args) + len(call.kwargs) > 3:
        raise GraphiteEvalError(
            "verticalLine: expecting at most 3 args"
        )
    node = get_arg(call, "ts", 0)
    if isinstance(node, Literal) and isinstance(node.value, (int, float)):
        ts_ms = int(node.value) * 1000
    else:
        ts_ms = parse_time_graphite(ctx, get_string(call, "ts", 0))
    if ts_ms < ctx.start or ts_ms > ctx.end:
        # the reference rejects markers outside the render window
        raise GraphiteEvalError(
            f"verticalLine: timestamp {ts_ms // 1000} is outside the "
            f"render range [{ctx.start // 1000}, {ctx.end // 1000}]"
        )
    label = get_string(call, "label", 1, "")
    get_string(call, "color", 2, "")
    return ctx.spark.createDataFrame(
        [(label, ts_ms, 1.0), (label, ts_ms, 1.0)],
        "name string, ts long, value double",
    )


# ----------------------------------------------------- map / reduce


@register("mapSeries", "map")
def _f_map_series(ctx, call):
    """Pass-through: the map key is recomputed by reduceSeries from
    the names (graphite-web mapSeries returns a list-of-lists; our
    frame keeps the full names, which preserve the key)."""
    return eval_series(ctx, call, "seriesList", 0)


@register("reduceSeries", "reduce")
def _f_reduce_series(ctx, call):
    """For each group of series identical except at reduceNode, match
    reduceMatchers to that node, apply reduceFunction in matcher
    order; result name has node[reduceNode] := "reduce.<fn>"
    (graphite-web reduceSeries)."""
    fn = get_string(call, "reduceFunction", 1)
    reduce_node = int(get_number(call, "reduceNode", 2))
    matchers = [
        get_string(call, f"m{i}", i + 3)
        for i in range(len(call.args) - 3)
    ]
    df = eval_series(ctx, call, "seriesListLists", 0)
    node_val = _node_col(F.col("name"), reduce_node)
    ord_expr = F.lit(None).cast("int")
    for i, m in reversed(list(enumerate(matchers))):
        ord_expr = F.when(node_val == m, F.lit(i)).otherwise(ord_expr)
    nodes = _split_path(F.col("name"))
    key = F.array_join(
        F.transform(
            nodes,
            lambda x, i: F.when(
                i == reduce_node, F.lit(f"reduce.{fn}")
            ).otherwise(x),
        ),
        ".",
    )
    tagged = (
        df.withColumn(_ORD, ord_expr)
        .filter(F.col(_ORD).isNotNull())
        .withColumn("__key", key)
    )
    agg = _canon_agg(
        fn[: -len("Series")] if fn.endswith("Series") else fn
    )
    if agg == "asPercent":
        per = (
            tagged.groupBy("__key", "ts")
            .agg(F.min(F.when(F.col(_ORD) == 0, F.col("value"))).alias("__a"),
                 F.min(F.when(F.col(_ORD) == 1, F.col("value"))).alias("__b"))
            .withColumn(
                "value",
                F.lit(100.0)
                * F.try_divide(
                    F.col("__a"), F.nullif(F.col("__b"), F.lit(0.0))
                ),
            )
        )
        return per.select(F.col("__key").alias("name"), "ts", "value")
    if agg == "divide":
        per = (
            tagged.groupBy("__key", "ts")
            .agg(
                F.min(F.when(F.col(_ORD) == 0, F.col("value"))).alias("__a"),
                F.min(F.when(F.col(_ORD) == 1, F.col("value"))).alias("__b"),
            )
            .withColumn(
                "value",
                F.try_divide(
                    F.col("__a"), F.nullif(F.col("__b"), F.lit(0.0))
                ),
            )
        )
        return per.select(F.col("__key").alias("name"), "ts", "value")
    return _combine_by_key(tagged, F.col("__key"), agg, ctx.xfiles_factor)


# ------------------------------------------------------- holt-winters


def _holt_winters_analysis(df: DataFrame, season_pts: int) -> DataFrame:
    """Triple-exponential-smoothing analysis per series
    (transform.go:5560-5646 holtWintersAnalysis: alpha=0.1,
    gamma=alpha, beta=0.0035; seasonals/deviations recurse on the
    value one season back). The recurrence is inherently sequential
    per series, so it runs as an Arrow-batched grouped-map pandas UDF
    — one small array per series (render range + bootstrap), full
    parallelism ACROSS series.

    Input dense (name, ts, value); output (name, ts, prediction,
    deviation)."""
    import math as _m

    import pandas as pd

    alpha, beta = 0.1, 0.0035
    gamma = alpha

    def analyze(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts").reset_index(drop=True)
        vals = pdf["value"].tolist()
        n = len(vals)
        intercepts = [0.0] * n
        slopes = [0.0] * n
        seasonals = [0.0] * n
        deviations = [0.0] * n
        predictions = [float("nan")] * n
        next_pred = float("nan")
        for i in range(n):
            v = vals[i]
            if v is None or (isinstance(v, float) and _m.isnan(v)):
                predictions[i] = next_pred
                next_pred = float("nan")
                continue
            if i == 0:
                last_intercept, last_slope, prediction = v, 0.0, v
            else:
                last_intercept = intercepts[i - 1]
                last_slope = slopes[i - 1]
                if _m.isnan(last_intercept):
                    last_intercept = v
                prediction = next_pred
            last_seasonal = seasonals[i - season_pts] if i >= season_pts else 0.0
            next_last_seasonal = (
                seasonals[i + 1 - season_pts] if i + 1 >= season_pts else 0.0
            )
            last_dev = deviations[i - season_pts] if i >= season_pts else 0.0
            intercept = alpha * (v - last_seasonal) + (1 - alpha) * (
                last_intercept + last_slope
            )
            slope = beta * (intercept - last_intercept) + (1 - beta) * last_slope
            seasonal = gamma * (v - intercept) + (1 - gamma) * last_seasonal
            next_pred = intercept + slope + next_last_seasonal
            pred_for_dev = 0.0 if _m.isnan(prediction) else prediction
            deviation = gamma * abs(v - pred_for_dev) + (1 - gamma) * last_dev
            intercepts[i] = intercept
            slopes[i] = slope
            seasonals[i] = seasonal
            predictions[i] = prediction
            deviations[i] = deviation
        pdf["prediction"] = predictions
        pdf["deviation"] = deviations
        return pdf[["name", "ts", "prediction", "deviation"]]

    return df.groupBy("name").applyInPandas(
        analyze,
        schema="name string, ts long, prediction double, deviation double",
    )


def _holt_winters_common(ctx, call, first_opt_pos: int):
    """Shared bootstrap-extended evaluation: returns (trimmed analysis
    frame, original-series frame, bootstrap ctx)."""
    shift = 1 if first_opt_pos == 2 else 0
    bootstrap_s = get_string(
        call, "bootstrapInterval", first_opt_pos, "7d"
    )
    season_s = get_string(call, "seasonality", first_opt_pos + 1, "1d")
    bootstrap = parse_interval(bootstrap_s)
    season_pts = max(1, parse_interval(season_s) // ctx.step)
    inner = ctx.with_range(start=ctx.start - bootstrap)
    df = normalize_series(
        inner, eval_series(inner, call, "seriesList", 0)
    ).select("name", "ts", "value")
    analysis = _holt_winters_analysis(df, season_pts).filter(
        F.col("ts") >= F.lit(ctx.start)
    )
    return analysis, df


@register("holtWintersForecast")
def _f_hw_forecast(ctx, call):
    analysis, _ = _holt_winters_common(ctx, call, 1)
    out = analysis.select(
        F.concat(
            F.lit("holtWintersForecast("), F.col("name"), F.lit(")")
        ).alias("name"),
        "ts",
        F.when(~F.isnan("prediction"), F.col("prediction")).alias("value"),
    )
    return out


@register("holtWintersConfidenceBands")
def _f_hw_bands(ctx, call):
    """forecast ± delta·deviation (transform.go:5330-5400)."""
    delta = get_number(call, "delta", 1, 3.0)
    analysis, _ = _holt_winters_common(ctx, call, 2)
    ok = (~F.isnan("prediction")) & (~F.isnan("deviation"))
    upper = analysis.select(
        F.concat(
            F.lit("holtWintersConfidenceUpper("), F.col("name"), F.lit(")")
        ).alias("name"),
        "ts",
        F.when(
            ok, F.col("prediction") + F.lit(delta) * F.col("deviation")
        ).alias("value"),
    )
    lower = analysis.select(
        F.concat(
            F.lit("holtWintersConfidenceLower("), F.col("name"), F.lit(")")
        ).alias("name"),
        "ts",
        F.when(
            ok, F.col("prediction") - F.lit(delta) * F.col("deviation")
        ).alias("value"),
    )
    return upper.unionByName(lower)


@register("holtWintersConfidenceArea")
def _f_hw_area(ctx, call):
    # the area variant additionally wraps each band in areaBetween(...)
    # (transformHoltWintersConfidenceArea)
    df = _f_hw_bands(ctx, call)
    return _rename(
        df, F.concat(F.lit("areaBetween("), F.col("name"), F.lit(")"))
    )


@register("holtWintersAberration")
def _f_hw_aberration(ctx, call):
    """Distance outside the confidence band, 0 inside
    (graphite-web holtWintersAberration)."""
    delta = get_number(call, "delta", 1, 3.0)
    analysis, df = _holt_winters_common(ctx, call, 2)
    cur = df.filter(F.col("ts") >= F.lit(ctx.start)).select(
        "name", "ts", F.col("value").alias("__v")
    )
    joined = analysis.join(cur, ["name", "ts"])
    ok = (~F.isnan("prediction")) & (~F.isnan("deviation"))
    up = F.col("prediction") + F.lit(delta) * F.col("deviation")
    lo = F.col("prediction") - F.lit(delta) * F.col("deviation")
    v = F.when(
        F.col("__v").isNull() | ~ok, F.lit(None).cast("double")
    ).otherwise(
        F.when(F.col("__v") > up, F.col("__v") - up).otherwise(
            F.when(F.col("__v") < lo, F.col("__v") - lo).otherwise(F.lit(0.0))
        )
    )
    return joined.select(
        F.concat(
            F.lit("holtWintersAberration("), F.col("name"), F.lit(")")
        ).alias("name"),
        "ts",
        v.alias("value"),
    )


@register("events")
def _f_events(ctx, call):
    """All-NULL placeholder series, as in the reference
    (transform.go:1452-1469: newNaNSeries)."""
    tags = ",".join(f"'{get_string(call, f't{i}', i)}'"
                    for i in range(len(call.args)))
    grid = ctx.spark.range(ctx.npts)
    return grid.select(
        F.lit(f"events({tags})").alias("name"),
        (F.lit(ctx.start) + F.col("id") * F.lit(ctx.step)).alias("ts"),
        F.lit(None).cast("double").alias("value"),
    )


@register("aliasQuery")
def _f_alias_query(ctx, call):
    """For each series, evaluate the target derived by regex-replacing
    its name and put that target's last value into the new name
    (transform.go:500-560). Presentation-sized driver loop over the
    series names."""
    import re as _re

    search = get_string(call, "search", 1)
    repl = _re.sub(r"\\(\d)", r"\\\1", get_string(call, "replace", 2))
    new_name = get_string(call, "newName", 3)
    df = eval_series(ctx, call, "seriesList", 0)
    names = [r[0] for r in df.select("name").distinct().collect()]
    # batched: build every derived target LAZILY, tag it with its source
    # name, union once, and read all last-values in ONE aggregation job
    # (instead of one sequential job per series name)
    tagged = None
    for nm in sorted(names):
        target = _re.sub(search, repl, nm)
        sub = evaluate_target(ctx, target).withColumn("__src", F.lit(nm))
        sub = sub.select("name", "ts", "value", "__src")
        tagged = sub if tagged is None else tagged.unionByName(sub)
    mapping = {}
    if tagged is not None:
        rows = (
            tagged.filter(F.col("value").isNotNull())
            .groupBy("__src")
            .agg(F.max_by("value", "ts").alias("__last"))
            .collect()
        )
        def _fmt(v):
            # literal %d/%g/%f substitution, NOT printf
            # (transformAliasQuery:538-541)
            out = new_name.replace("%d", str(int(v)))
            out = out.replace("%g", f"{go_g(v)}")
            return out.replace("%f", f"{v:f}")

        mapping = {r["__src"]: _fmt(r["__last"]) for r in rows}
    for nm in names:
        if nm not in mapping:
            raise GraphiteEvalError(
                f"aliasQuery: no values for target derived from {nm!r}"
            )
    expr = F.col("name")
    for nm, alias in mapping.items():
        expr = F.when(F.col("name") == nm, F.lit(alias)).otherwise(expr)
    return _rename(df, expr)


@register("applyByNode")
def _f_apply_by_node(ctx, call):
    """Evaluate templateFunction per node-prefix group: occurrences of
    '%' in the template are replaced by the group prefix
    (graphite-web applyByNode). The prefix set is discovered from the
    fetched names (presentation-sized collect).

    When the template is a PURE SELECTOR with a single '%' (the common
    shape, e.g. ``%.disk.bytes_free``), all prefixes collapse into ONE
    brace-glob target — one subplan and one evaluation regardless of the
    prefix count, the same batching aliasQuery got. Function-call
    templates keep the per-prefix union (each needs its own evaluation),
    still lazily unioned into a single downstream job."""
    import re as _re

    node_num = int(get_number(call, "nodeNum", 1))
    template = get_string(call, "templateFunction", 2)
    df = eval_series(ctx, call, "seriesList", 0)
    prefixes = sorted(
        r[0]
        for r in df.select(
            F.array_join(
                F.slice(_split_path(F.col("name")), 1, node_num + 1), "."
            ).alias("__p")
        )
        .distinct()
        .collect()
    )
    if not prefixes:
        return empty_series(ctx)
    pure_selector = (
        template.count("%") == 1
        and _re.fullmatch(r"[A-Za-z0-9._\-*%\[\]{}]*", template) is not None
        and not any(_re.search(r"[,{}]", p) for p in prefixes)
    )
    new_name = get_arg(call, "newName", 3, None)
    if new_name is not None and isinstance(new_name, Literal):
        # 4th arg: rename every result series to newName with '%'
        # substituted per prefix (transformApplyByNode newName)
        tmpl = str(new_name.value)
        out = None
        for p in prefixes:
            sub = evaluate_target(ctx, template.replace("%", p)).select(
                F.lit(tmpl.replace("%", p)).alias("name"), "ts", "value"
            )
            out = sub if out is None else out.unionByName(sub)
        return out
    if pure_selector:
        glob = (
            prefixes[0]
            if len(prefixes) == 1
            else "{" + ",".join(prefixes) + "}"
        )
        return evaluate_target(ctx, template.replace("%", glob))
    out = None
    for p in prefixes:
        sub = evaluate_target(ctx, template.replace("%", p)).select(
            "name", "ts", "value"
        )
        out = sub if out is None else out.unionByName(sub)
    return out

