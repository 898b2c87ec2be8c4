"""Graphite render evaluation core.

Reference: app/vmselect/graphite/render_api.go (entry),
eval.go (execExpr/evalExpr), transform.go (function bodies). Our
evaluator walks the parsed target AST; ``fetch`` turns a path glob into
a DENSE series frame ``(name, ts, value)`` on the render grid
``[start, end)`` step ``step`` (ms). Consolidation from raw samples to
a grid point is an aggregate over the bucket ``[t, t+step)``
(Graphite's storage-consolidation; default ``avg``, overridable via
``consolidateBy``).

Scale notes (100 TB posture): the name-glob filter is a pushed-down
``rlike`` on the scan; consolidation is a partial/final hash aggregate
on (name, bucket); densification cross-joins the distinct-name frame
with a BROADCAST npts-row grid — never data × data. Windowed
transforms run per-series over the dense grid (bounded by the render
range, never by corpus size).
"""

from __future__ import annotations

from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from victoriametrics_spark.engine.planner import (
    anchored_regex,
    graphite_glob_to_regex,
)
from victoriametrics_spark.graphite.parser import (
    Call,
    GraphiteParseError,
    Literal,
    Node,
    Path,
    parse_target,
)


class GraphiteEvalError(ValueError):
    pass


@dataclass(frozen=True)
class RenderContext:
    """Render window + options threaded through evaluation
    (reference: evalConfig, app/vmselect/graphite/eval.go:61-100)."""

    spark: SparkSession
    samples: DataFrame  # (name string, ts long-ms, value double)
    start: int  # inclusive, ms
    end: int  # exclusive, ms
    step: int  # ms
    xfiles_factor: float = 0.0
    consolidation: str = "avg"
    # "current time" for relative AT-style specs (evalConfig.currentTime);
    # None = the render end
    now: int | None = None

    @property
    def npts(self) -> int:
        return max(0, (self.end - self.start + self.step - 1) // self.step)

    def with_range(self, start: int | None = None, end: int | None = None):
        return replace(
            self,
            start=self.start if start is None else start,
            end=self.end if end is None else end,
        )


# ------------------------------------------------------------ intervals

_UNIT_MS = {
    "ms": 1,
    "s": 1000,
    "sec": 1000,
    "second": 1000,
    "seconds": 1000,
    "min": 60_000,
    "minute": 60_000,
    "minutes": 60_000,
    "h": 3_600_000,
    "hour": 3_600_000,
    "hours": 3_600_000,
    "d": 86_400_000,
    "day": 86_400_000,
    "days": 86_400_000,
    "w": 604_800_000,
    "week": 604_800_000,
    "weeks": 604_800_000,
    "mon": 2_592_000_000,  # 30d, graphite convention
    "month": 2_592_000_000,
    "months": 2_592_000_000,
    "y": 31_536_000_000,  # 365d
    "year": 31_536_000_000,
    "years": 31_536_000_000,
}


def parse_interval(s: str) -> int:
    """Graphite interval string → ms. Accepts a leading sign and
    concatenated terms ("1h30min"). A bare number means seconds
    (graphite-web parseTimeOffset)."""
    import re as _re

    s = s.strip()
    sign = 1
    if s[:1] in "+-":
        if s[0] == "-":
            sign = -1
        s = s[1:]
    if _re.fullmatch(r"\d+(\.\d+)?", s):
        return sign * int(float(s) * 1000)
    # the reference parses ONE numeric prefix and matches the suffix by
    # CASE-SENSITIVE prefix, ignoring any trailing text ('1h30m' is 1h;
    # '1H' errors) — render_api.go:208-252
    m = _re.match(r"\s*(\d+(?:\.\d+)?)\s*(.*)$", s)
    if not m or not m.group(2):
        raise GraphiteEvalError(f"cannot parse interval {s!r}")
    n, suffix = float(m.group(1)), m.group(2)
    if suffix.startswith("ms"):
        ms = 1
    elif suffix.startswith("s"):
        ms = 1000
    elif suffix.startswith("mo"):
        ms = 30 * 86_400_000
    elif suffix.startswith(("mi", "m")):
        ms = 60_000
    elif suffix.startswith("h"):
        ms = 3_600_000
    elif suffix.startswith("d"):
        ms = 86_400_000
    elif suffix.startswith("w"):
        ms = 604_800_000
    elif suffix.startswith("y"):
        ms = 365 * 86_400_000
    else:
        raise GraphiteEvalError(f"unsupported interval {s!r}")
    return sign * int(n * ms)


def parse_time_graphite(ctx: "RenderContext", s: str) -> int:
    """graphite AT-style time → epoch ms (parseTime,
    render_api.go:157-207): now/today/yesterday, RFC3339,
    HH:MM[_| ]YYYYMMDD, HH:MMYYYYMMDD, YYYYMMDD, YYYY-MM-DD, MM/DD/YY,
    unix seconds, or an interval relative to the current time."""
    from datetime import datetime, timezone

    s = s.strip()
    now_ms = ctx.now if ctx.now is not None else ctx.end
    day = 86_400_000
    if s == "now":
        return now_ms
    if s == "today":
        return now_ms - now_ms % day
    if s == "yesterday":
        return now_ms - now_ms % day - day
    for fmt in (
        "%Y-%m-%dT%H:%M:%S%z",
        "%H:%M_%Y%m%d",
        "%H:%M%Y%m%d",
        "%Y%m%d",
        "%H:%M %Y%m%d",
        "%Y-%m-%d",
        "%m/%d/%y",
    ):
        try:
            t = datetime.strptime(s, fmt)
        except ValueError:
            continue
        if t.tzinfo is None:
            t = t.replace(tzinfo=timezone.utc)
        return int(t.timestamp() * 1000)
    try:
        return int(s) * 1000
    except ValueError:
        pass
    return now_ms + parse_interval(s)


# ------------------------------------------------------------ arguments


def get_arg(call: Call, name: str, pos: int, default=...) -> Node | None:
    if name in call.kwargs:
        return call.kwargs[name]
    if pos < len(call.args):
        return call.args[pos]
    if default is ...:
        raise GraphiteEvalError(
            f"{call.func}: missing required argument {name!r}"
        )
    return None


def get_number(call: Call, name: str, pos: int, default=...) -> float:
    node = get_arg(call, name, pos, default)
    if node is None:
        return default
    if (
        isinstance(node, Literal)
        and isinstance(node.value, (int, float))
        and not isinstance(node.value, bool)
    ):
        return node.value
    raise GraphiteEvalError(f"{call.func}: argument {name!r} must be a number")


def get_string(call: Call, name: str, pos: int, default=...) -> str:
    node = get_arg(call, name, pos, default)
    if node is None:
        return default
    if isinstance(node, Literal) and isinstance(node.value, str):
        return node.value
    if isinstance(node, Path):  # unquoted word used as a string
        return node.pattern
    raise GraphiteEvalError(f"{call.func}: argument {name!r} must be a string")


def get_bool(call: Call, name: str, pos: int, default=...) -> bool:
    node = get_arg(call, name, pos, default)
    if node is None:
        return default
    if isinstance(node, Literal) and isinstance(node.value, bool):
        return node.value
    raise GraphiteEvalError(f"{call.func}: argument {name!r} must be a bool")


def get_interval_or_points(call: Call, name: str, pos: int):
    """Graphite windowSize: a number = that many grid points, a string
    = a time interval (transform.go getWindowSize)."""
    node = get_arg(call, name, pos)
    if isinstance(node, Literal) and isinstance(node.value, (int, float)):
        return int(node.value), None
    if isinstance(node, Literal) and isinstance(node.value, str):
        return None, abs(parse_interval(node.value))
    raise GraphiteEvalError(
        f"{call.func}: {name!r} must be a number of points or interval string"
    )


# ---------------------------------------------------------------- fetch


def fetch(ctx: RenderContext, pattern: str) -> DataFrame:
    """Path glob → dense consolidated series frame.

    Grid point t_i = start + i·step holds cons(samples with
    ts ∈ [t_i, t_i + step)); series with no sample anywhere in the range
    do not appear (same as the reference's storage search)."""
    rx = anchored_regex(graphite_glob_to_regex(pattern))
    raw = ctx.samples.filter(
        F.col("name").rlike(rx)
        & (F.col("ts") >= F.lit(ctx.start))
        & (F.col("ts") < F.lit(ctx.end))
    )
    i = F.floor((F.col("ts") - F.lit(ctx.start)) / F.lit(ctx.step)).cast(
        "long"
    )
    cons_fn = {
        "avg": F.avg,
        "average": F.avg,
        "sum": F.sum,
        "min": F.min,
        "max": F.max,
        "first": lambda c: F.min_by(c, F.col("ts")),
        "last": lambda c: F.max_by(c, F.col("ts")),
        "count": F.count,
    }.get(ctx.consolidation)
    if cons_fn is None:
        raise GraphiteEvalError(
            f"unknown consolidation {ctx.consolidation!r}"
        )
    cons = (
        raw.withColumn("__i", i)
        .groupBy("name", "__i")
        .agg(cons_fn(F.col("value")).cast("double").alias("value"))
    )
    # pathExpression of a fetched series = the query pattern (the
    # reference stores the path expression on every storage series, so
    # sumSeries(web.*.cpu) formats with the GLOB, not the series names)
    return densify(ctx, cons).withColumn("__path", F.lit(pattern))


def densify(ctx: RenderContext, cons: DataFrame) -> DataFrame:
    """(name, __i, value) partial frame → dense (name, ts, value).

    Single-branch shape (r14): one per-series map aggregation + a grid
    explode + ``try_element_at`` — a missing grid point is a null value
    exactly like the old left join's. The former
    ``names.distinct × broadcast-grid crossJoin + left join`` ran the
    consolidated frame through a second exchange, a broadcast and two
    joins per densification (and the pruned distinct branch never
    reused the cons exchange), which multiplied AQE query stages —
    the dominant cost of a warm render. The per-series map holds at
    most npts entries: bounded by the RENDER grid, never by corpus
    size."""
    npts = int(ctx.npts)
    grid = (
        F.sequence(F.lit(0).cast("long"), F.lit(npts - 1).cast("long"))
        if npts > 0
        else F.array().cast("array<long>")
    )
    per = cons.groupBy("name").agg(
        F.map_from_entries(
            F.collect_list(F.struct("__i", "value"))
        ).alias("__m")
    )
    return per.select("name", "__m", F.explode(grid).alias("__i")).select(
        "name",
        (F.lit(ctx.start) + F.col("__i") * F.lit(ctx.step)).alias("ts"),
        F.try_element_at("__m", F.col("__i")).alias("value"),
    )


def empty_series(ctx: RenderContext) -> DataFrame:
    return ctx.spark.createDataFrame(
        [], "name string, ts long, value double"
    )


def constant_series(
    ctx: RenderContext, name: str, value, three_points: bool = True
) -> DataFrame:
    """constantLine/threshold emit 3 points (start, mid, end) —
    transform.go transformConstantLine."""
    if three_points:
        # series.step = (end-start)/2 (constantLine, transform.go:1130)
        step = (ctx.end - ctx.start) // 2
        pts = [ctx.start, (ctx.start + ctx.end) // 2, ctx.end]
        rows = [(name, int(t), float(value), int(step)) for t in pts]
        return ctx.spark.createDataFrame(
            rows, "name string, ts long, value double, __step long"
        )
    grid = ctx.spark.range(ctx.npts)
    return grid.select(
        F.lit(name).alias("name"),
        (F.lit(ctx.start) + F.col("id") * F.lit(ctx.step)).alias("ts"),
        F.lit(float(value)).cast("double").alias("value"),
    )


# ------------------------------------------------------------ evaluate


def evaluate_target(ctx: RenderContext, node: Node | str) -> DataFrame:
    """Evaluate a target AST (or source text) → dense series frame."""
    if isinstance(node, str):
        node = parse_target(node)
    if isinstance(node, Path):
        return fetch(ctx, node.pattern)
    if isinstance(node, Call):
        from victoriametrics_spark.graphite.functions import FUNCTIONS

        fn = FUNCTIONS.get(node.func)
        if fn is None:
            raise GraphiteEvalError(
                f"unsupported graphite function {node.func!r}"
            )
        return fn(ctx, node)
    # bare numbers/strings/bools are NOT series lists — the reference's
    # evalSeriesList rejects them (TestExecExprFailure: absolute(1),
    # alias(1,'aa'), "123"); numeric constants become series only via
    # constantLine()/threshold()
    raise GraphiteEvalError(f"cannot evaluate {node!r} as a series list")


def eval_series(ctx: RenderContext, call: Call, name: str, pos: int):
    """Evaluate the seriesList argument of a call."""
    node = get_arg(call, name, pos)
    return evaluate_target(ctx, node)


def render(
    spark: SparkSession,
    targets: list[str] | str,
    samples: DataFrame,
    start: int,
    end: int,
    step: int,
    **opts,
) -> DataFrame:
    """Evaluate render targets, union their series frames.

    The Graphite /render entrypoint (render_api.go:60): one DataFrame
    per target, all on the same grid, unioned by name."""
    if isinstance(targets, str):
        targets = [targets]
    ctx = RenderContext(
        spark=spark, samples=samples, start=start, end=end, step=step, **opts
    )
    out = None
    for t in targets:
        # per-target frames carry heterogeneous passenger columns
        # (__path/__step/__ord) — the render boundary keeps only the
        # presentation schema so multi-target unions line up
        df = evaluate_target(ctx, t).select("name", "ts", "value")
        out = df if out is None else out.unionByName(df)
    return out if out is not None else empty_series(ctx)


__all__ = [
    "RenderContext",
    "GraphiteEvalError",
    "GraphiteParseError",
    "render",
    "evaluate_target",
    "eval_series",
    "fetch",
    "densify",
    "parse_interval",
    "empty_series",
    "constant_series",
    "get_arg",
    "get_number",
    "get_string",
    "get_bool",
    "get_interval_or_points",
]
