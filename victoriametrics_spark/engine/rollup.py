"""Rollup function implementations (SURVEY.md §2.3) — 80 functions from
vendor/.../metricsql/rollup.go:7-98, realized as Catalyst aggregate
expressions over the contribution-exploded grid (engine/grid.py).

Each spec declares:
  needs_prev — requires per-sample lag columns (prev_value/prev_ts/dv/dt/
               pos_dv), computed once per series before the explode
               (VM's prevValue machinery, rollup.go:780-805)
  keep_name  — function keeps the metric name (rollupFuncsKeepMetricName,
               rollup.go:267)
  aggs(a)    — list of aliased aggregate Columns evaluated per
               (series, grid-point) group
  post(a)    — final value expression over the agg aliases; NULL ⇒ no point

All column expressions are built lazily (PySpark requires an active
session to construct Columns, so nothing is created at import time).

Semantics notes (documented decisions, chosen for SQL-oracle parity):
- Counter functions (rate/increase/…) use per-sample reset-adjusted deltas
  (pos_dv). A sample's delta refers to its previous sample even when that
  sample lies before the window start — VM's prevValue behavior; the
  ``*_prometheus`` variants restrict to strictly in-window pairs.
- stddev/stdvar are population moments, like the reference.
- quantile_over_time is exact linear-interpolated (VM sorts window
  samples; Spark `percentile` matches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class RollupArgs:
    window_ms: int
    step_ms: int
    scalars: list[float] = field(default_factory=list)  # non-series args

    @property
    def window_s(self) -> float:
        return self.window_ms / 1000.0


@dataclass
class Decomposed:
    """Two-level (step-bucket) form of a rollup for the wide-window/
    fine-step cutover (engine/grid.py prepare_step_buckets): ``partials``
    aggregates raw samples per (series, step bucket); ``merges``
    aggregates those partial columns per (series, grid point), producing
    the SAME aliases the spec's ``post`` expects. Only decomposable
    (associative-mergeable) rollups declare one; everything else keeps
    the exact contribution-explode plan."""

    partials: Callable[[RollupArgs], list[Column]]
    merges: Callable[[RollupArgs], list[Column]]


@dataclass
class PrefixForm:
    """Prefix-sum (marker) form for SUM-shaped rollups (engine/prefix.py):
    ``contribs`` lists (alias, per-sample contribution expression); the
    machinery produces ``__d_<alias>`` window sums with exact SUM-NULL
    semantics; ``finalize`` maps them onto the aliases ``post`` expects."""

    contribs: Callable[[RollupArgs], list[tuple[str, Column]]]
    finalize: Callable[[RollupArgs], list[Column]]


@dataclass
class RollupSpec:
    aggs: Callable[[RollupArgs], list[Column]]
    post: Callable[[RollupArgs], Column]
    needs_prev: bool = False
    needs_fwd: bool = False
    keep_name: bool = False
    two_level: Decomposed | None = None
    prefix: PrefixForm | None = None


ROLLUPS: dict[str, RollupSpec] = {}


def _reg(name: str, spec: RollupSpec) -> None:
    ROLLUPS[name] = spec


def _simple(
    name: str,
    agg: Callable[[RollupArgs], Column],
    *,
    needs_prev: bool = False,
    keep_name: bool = False,
    two_level: Decomposed | None = None,
) -> None:
    _reg(
        name,
        RollupSpec(
            aggs=lambda a, agg=agg: [agg(a).alias("__v")],
            post=lambda a: F.col("__v"),
            needs_prev=needs_prev,
            keep_name=keep_name,
            two_level=two_level,
        ),
    )


def _dec(
    partial: Callable[[RollupArgs], Column],
    merge: Callable[[RollupArgs], Column],
) -> Decomposed:
    """Single-column decomposition onto the ``__v`` alias."""
    return Decomposed(
        partials=lambda a: [partial(a).alias("__v")],
        merges=lambda a: [merge(a).alias("__v")],
    )


# lazy column helpers (safe to call only at plan time)
def V() -> Column:
    return F.col("value")


def TS() -> Column:
    return F.col("ts")


def PV() -> Column:  # previous sample's value (series order)
    return F.col("prev_value")


def PTS() -> Column:
    return F.col("prev_ts")


def DV() -> Column:
    return F.col("dv")


def DT() -> Column:
    return F.col("dt")


def POS_DV() -> Column:  # counter-reset-adjusted delta
    return F.col("pos_dv")


def GTS() -> Column:
    return F.col("gts")


def _first_v() -> Column:
    return F.min_by(V(), TS())


def _last_v() -> Column:
    return F.max_by(V(), TS())


def _first_ts() -> Column:
    return F.min(TS())


def _last_ts() -> Column:
    return F.max(TS())


# ---------------------------------------------------------------- simple
_simple("sum_over_time", lambda a: F.sum(V()))
_simple("avg_over_time", lambda a: F.avg(V()), keep_name=True)
_simple("min_over_time", lambda a: F.min(V()), keep_name=True)
_simple("max_over_time", lambda a: F.max(V()), keep_name=True)
_simple("count_over_time", lambda a: F.count(V()).cast("double"))
_simple("sum2_over_time", lambda a: F.sum(V() * V()))
_simple("last_over_time", lambda a: _last_v(), keep_name=True)
_simple("default_rollup", lambda a: _last_v(), keep_name=True)
_simple("first_over_time", lambda a: _first_v(), keep_name=True)
_simple("stddev_over_time", lambda a: F.stddev_pop(V()))
_simple("stdvar_over_time", lambda a: F.var_pop(V()))
_simple("distinct_over_time", lambda a: F.count_distinct(V()).cast("double"))
_simple("geomean_over_time", lambda a: F.exp(F.avg(F.log(V()))), keep_name=True)
_simple("median_over_time", lambda a: F.percentile(V(), F.lit(0.5)), keep_name=True)
_simple("tmin_over_time", lambda a: F.min_by(TS(), V()) / 1000.0)
_simple("tmax_over_time", lambda a: F.max_by(TS(), V()) / 1000.0)
_simple("tfirst_over_time", lambda a: _first_ts() / 1000.0)
_simple("tlast_over_time", lambda a: _last_ts() / 1000.0)
_simple("timestamp", lambda a: _last_ts() / 1000.0)
_simple("timestamp_with_name", lambda a: _last_ts() / 1000.0, keep_name=True)
_simple("present_over_time", lambda a: F.lit(1.0))
_simple("range_over_time", lambda a: F.max(V()) - F.min(V()))
_simple("mode_over_time", lambda a: F.mode(V()), keep_name=True)
_simple(
    "zscore_over_time",
    # d == 0 → 0 even when stddev is 0 (rollupZScoreOverTime,
    # rollup.go:2368-2371)
    lambda a: F.when(_last_v() - F.avg(V()) == 0, F.lit(0.0)).otherwise(
        F.try_divide(_last_v() - F.avg(V()), F.stddev_pop(V()))
    ),
)

# integrate (rollupIntegrate, rollup.go:2417-2451): left-Riemann area.
# When a sample exists BEFORE the window, the first segment runs from the
# WINDOW START at that prev value; without one, the first in-window
# sample is only a base point. The final segment extends to the grid
# timestamp only when the series has a sample after the window
# (realNextValue guard, issue #9474).
def _integrate_post(a: RollupArgs) -> Column:
    sp = F.col("__sp")
    first = F.element_at(sp, 1)
    last = F.element_at(sp, -1)
    has_prev = first["pv"].isNotNull()
    win_start = F.col("gts") - F.lit(float(a.window_ms))
    # pairwise in-window segments: each sample i>=2 contributes
    # v[i-1] * (t[i] - t[i-1])
    idx = F.sequence(F.lit(2), F.size(sp))
    pair_sum = F.when(
        F.size(sp) >= 2,
        F.aggregate(
            idx,
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(sp, (i - 1).cast("int"))["v"]
            * (
                F.element_at(sp, i.cast("int"))["t"]
                - F.element_at(sp, (i - 1).cast("int"))["t"]
            )
            / F.lit(1000.0),
        ),
    ).otherwise(F.lit(0.0))
    head = F.when(
        has_prev, first["pv"] * (first["t"] - win_start) / F.lit(1000.0)
    ).otherwise(F.lit(0.0))
    tail = F.when(
        last["nt"].isNotNull(),
        last["v"] * (F.col("gts") - last["t"]) / F.lit(1000.0),
    ).otherwise(F.lit(0.0))
    return head + pair_sum + tail


_reg(
    "integrate",
    RollupSpec(
        needs_prev=True,
        needs_fwd=True,
        aggs=lambda a: [
            F.array_sort(
                F.collect_list(
                    F.struct(
                        TS().alias("t"),
                        V().alias("v"),
                        PV().alias("pv"),
                        PTS().alias("pt"),
                        F.col("next_ts").alias("nt"),
                    )
                )
            ).alias("__sp")
        ],
        post=_integrate_post,
    ),
)


# --------------------------------------------------- conditional families
def _cond(op: str, a: RollupArgs) -> Column:
    phi = F.lit(a.scalars[0])
    if op == "eq":
        return V() == phi
    if op == "ne":
        return V() != phi
    if op == "gt":
        return V() > phi
    return V() <= phi


def _make_cond(kind: str, op: str):
    if kind == "count":
        return lambda a: F.sum(F.when(_cond(op, a), 1).otherwise(0)).cast("double")
    if kind == "sum":
        return lambda a: F.sum(F.when(_cond(op, a), V()).otherwise(F.lit(0.0)))
    return lambda a: (
        F.sum(F.when(_cond(op, a), 1).otherwise(0)) / F.count(V())
    ).cast("double")


for _op in ("eq", "ne", "gt", "le"):
    _simple(f"count_{_op}_over_time", _make_cond("count", _op))
for _op in ("eq", "gt", "le"):
    _simple(f"sum_{_op}_over_time", _make_cond("sum", _op))
    _simple(f"share_{_op}_over_time", _make_cond("share", _op))


# ------------------------------------------------------- counter semantics
# NOTE (round 7): the specs below for rate / irate / increase /
# increase_pure / delta / idelta / deriv_fast / ideriv are SUPERSEDED by
# engine/span.py (VM-exact span-normalized semantics: per-series
# scrape-interval estimate, anchor eligibility, implicit-window
# widening, empty-window ghosts). The planner routes SPAN_ROLLUPS there
# before consulting this table; the entries remain registered only so
# the function names stay introspectable as rollups.
def _inc() -> Column:
    return F.sum(POS_DV())


_simple("increase", lambda a: _inc(), needs_prev=True)
_simple("increase_pure", lambda a: _inc(), needs_prev=True)
_simple("rate", lambda a: _inc() / F.lit(a.window_s), needs_prev=True)


def _inc_prom(a: RollupArgs) -> Column:
    in_win = PTS().isNotNull() & (PTS() > GTS() - F.lit(a.window_ms))
    return F.sum(F.when(in_win, POS_DV()))


_simple("increase_prometheus", _inc_prom, needs_prev=True)
_simple(
    "rate_prometheus", lambda a: _inc_prom(a) / F.lit(a.window_s), needs_prev=True
)
# rollupDeltaPrometheus (rollup.go:1993-2002): strictly in-window,
# fewer than 2 samples → NaN (no point)
_simple(
    "delta_prometheus",
    lambda a: F.when(F.count(V()) >= 2, _last_v() - _first_v()),
)

# delta (VM flavor): last - first, using prev-of-first as base when present
_reg(
    "delta",
    RollupSpec(
        needs_prev=True,
        aggs=lambda a: [
            _last_v().alias("__last"),
            _first_v().alias("__first"),
            F.min_by(PV(), TS()).alias("__pfirst"),
        ],
        post=lambda a: F.col("__last")
        - F.coalesce(F.col("__pfirst"), F.col("__first")),
    ),
)

_simple(
    "irate",
    lambda a: F.max_by(
        F.when(DT() > 0, POS_DV() / DT() * 1000.0), F.when(DT().isNotNull(), TS())
    ),
    needs_prev=True,
)
_simple(
    "ideriv",
    lambda a: F.max_by(
        F.when(DT() > 0, DV() / DT() * 1000.0), F.when(DT().isNotNull(), TS())
    ),
    needs_prev=True,
)
_simple(
    "idelta",
    lambda a: F.max_by(DV(), F.when(DV().isNotNull(), TS())),
    needs_prev=True,
)
# deriv / deriv_fast are computed over a ts-sorted array with a sequential
# left fold so the result is BIT-DETERMINISTIC regardless of partition
# count or scan order: Spark's partial-agg summation order (e.g. inside
# regr_slope) can flip the 6th rounded decimal vs a single-threaded oracle
# when the quotient lands on a representation boundary. The DuckDB oracle
# mirrors the identical fold (list_sort + list_reduce), so both sides
# perform the same IEEE operations in the same order.
def _sorted_pairs() -> Column:
    """Window samples as array<struct<t,v>> sorted by (ts, value)."""
    return F.array_sort(F.collect_list(F.struct(TS().alias("t"), V().alias("v"))))


def _deriv_fast_post(a: RollupArgs) -> Column:
    """rollupDerivFast (rollup.go:1954-1989): the base point is the
    sample just BEFORE the window (rfa.prevValue) when one exists; only
    without it does the first in-window sample serve, and then a
    single-sample window is NaN (can't attribute a duration)."""
    sp = F.col("__sp")
    first = F.element_at(sp, 1)
    last = F.element_at(sp, -1)
    pv = F.coalesce(F.col("__pfv"), first["v"])
    pt = F.coalesce(F.col("__pft"), first["t"])
    return F.try_divide(last["v"] - pv, last["t"] - pt) * F.lit(1000.0)


_reg(
    "deriv_fast",
    RollupSpec(
        needs_prev=True,
        aggs=lambda a: [
            _sorted_pairs().alias("__sp"),
            F.min_by(PV(), TS()).alias("__pfv"),
            F.min_by(PTS(), TS()).alias("__pft"),
        ],
        post=_deriv_fast_post,
    ),
)


# deriv: least-squares slope per second (VM linearRegression). Timestamps
# are centered on the grid point before the regression — mathematically
# identical slope, numerically stable (raw unix-seconds x-values lose ~10
# digits to cancellation in var(x)).
def _xs() -> Column:
    return (TS() - GTS()) / 1000.0


def _deriv_post(a: RollupArgs) -> Column:
    sp = F.col("__sp")

    def x(e: Column) -> Column:
        return (e["t"] - F.col("gts")) / F.lit(1000.0)

    acc0 = F.struct(
        F.lit(0.0).alias("sx"),
        F.lit(0.0).alias("sy"),
        F.lit(0.0).alias("sxy"),
        F.lit(0.0).alias("sxx"),
    )
    s = F.aggregate(
        sp,
        acc0,
        lambda acc, e: F.struct(
            (acc["sx"] + x(e)).alias("sx"),
            (acc["sy"] + e["v"]).alias("sy"),
            (acc["sxy"] + x(e) * e["v"]).alias("sxy"),
            (acc["sxx"] + x(e) * x(e)).alias("sxx"),
        ),
    )
    n = F.size(sp).cast("double")
    # linearRegression (rollup.go:1099-1133): constant values (incl. a
    # single sample) → slope 0; |tDiff| < 1e-6 → slope 0 (not NaN)
    all_const = F.forall(sp, lambda e: e["v"] == F.element_at(sp, 1)["v"])
    tdiff = s["sxx"] - s["sx"] * s["sx"] / n
    k = s["sxy"] - s["sx"] * s["sy"] / n
    return (
        F.when(all_const, F.lit(0.0))
        .when(F.abs(tdiff) >= 1e-6, k / tdiff)
        .otherwise(F.lit(0.0))
    )


_reg(
    "deriv",
    RollupSpec(
        aggs=lambda a: [_sorted_pairs().alias("__sp")],
        post=_deriv_post,
    ),
)

_reg(
    "predict_linear",
    RollupSpec(
        aggs=lambda a: [
            F.regr_slope(V(), _xs()).alias("__k"),
            F.regr_intercept(V(), _xs()).alias("__b"),
        ],
        # x centered at the grid ts ⇒ prediction t secs ahead = b + k*t
        # (VM: value at tEnd + k*secs)
        post=lambda a: F.col("__b") + F.col("__k") * F.lit(a.scalars[0]),
        keep_name=True,
    ),
)

_simple(
    "resets",
    lambda a: F.sum(F.when(PV().isNotNull() & (V() < PV()), 1).otherwise(0)).cast(
        "double"
    ),
    needs_prev=True,
)

# ------------------------------------------------------- change detection
_simple(
    "changes",
    lambda a: F.sum(F.when(PV().isNotNull() & (V() != PV()), 1).otherwise(0)).cast(
        "double"
    ),
    needs_prev=True,
)


def _changes_prom(a: RollupArgs) -> Column:
    in_win = PTS().isNotNull() & (PTS() > GTS() - F.lit(a.window_ms))
    return F.sum(F.when(in_win & (V() != PV()), 1).otherwise(0)).cast("double")


_simple("changes_prometheus", _changes_prom, needs_prev=True)
_simple(
    "increases_over_time",
    lambda a: F.sum(F.when(PV().isNotNull() & (V() > PV()), 1).otherwise(0)).cast(
        "double"
    ),
    needs_prev=True,
)
_simple(
    "decreases_over_time",
    lambda a: F.sum(F.when(PV().isNotNull() & (V() < PV()), 1).otherwise(0)).cast(
        "double"
    ),
    needs_prev=True,
)
_simple(
    "ascent_over_time",
    lambda a: F.sum(F.when(PV().isNotNull() & (DV() > 0), DV())),
    needs_prev=True,
)
_simple(
    "descent_over_time",
    lambda a: F.sum(F.when(PV().isNotNull() & (DV() < 0), -DV())),
    needs_prev=True,
)
_simple(
    "tlast_change_over_time",
    lambda a: F.max(F.when(PV().isNotNull() & (V() != PV()), TS())) / 1000.0,
    needs_prev=True,
)

# ------------------------------------------------------------ distribution
_reg(
    "quantile_over_time",
    RollupSpec(
        aggs=lambda a: [F.percentile(V(), F.lit(a.scalars[0])).alias("__v")],
        post=lambda a: F.col("__v"),
        keep_name=True,
    ),
)


def _median_of_array(arr: Column) -> Column:
    """Exact linear-interpolated median of an array column."""
    s = F.array_sort(arr)
    n = F.size(s)
    lo = F.element_at(s, ((n + 1) / 2).cast("int"))
    hi = F.element_at(s, ((n + 2) / 2).cast("int"))
    return F.when(n > 0, (lo + hi) / 2.0)


_reg(
    "mad_over_time",
    RollupSpec(
        aggs=lambda a: [
            F.collect_list(V()).alias("__vals"),
            F.percentile(V(), F.lit(0.5)).alias("__med"),
        ],
        post=lambda a: _median_of_array(
            F.transform(F.col("__vals"), lambda v: F.abs(v - F.col("__med")))
        ),
    ),
)

_reg(
    "outlier_iqr_over_time",
    RollupSpec(
        # last value if outside [q25-1.5*iqr, q75+1.5*iqr], else no point
        aggs=lambda a: [
            F.percentile(V(), F.lit(0.25)).alias("__q25"),
            F.percentile(V(), F.lit(0.75)).alias("__q75"),
            _last_v().alias("__last"),
        ],
        post=lambda a: F.when(
            (
                F.col("__last")
                < F.col("__q25") - 1.5 * (F.col("__q75") - F.col("__q25"))
            )
            | (
                F.col("__last")
                > F.col("__q75") + 1.5 * (F.col("__q75") - F.col("__q25"))
            ),
            F.col("__last"),
        ),
    ),
)


def _hoeffding(a: RollupArgs, upper: bool) -> Column:
    # avg ± range*sqrt(ln(1/(1-phi)) / (2n))  (rollup.go rollupHoeffdingBound*)
    phi = a.scalars[0]
    bound = (
        (F.max(V()) - F.min(V()))
        * F.lit(math.sqrt(math.log(1.0 / max(1e-300, 1.0 - phi)) / 2.0))
        / F.sqrt(F.count(V()))
    )
    return F.avg(V()) + bound if upper else F.avg(V()) - bound


_simple("hoeffding_bound_upper", lambda a: _hoeffding(a, True), keep_name=True)
_simple("hoeffding_bound_lower", lambda a: _hoeffding(a, False), keep_name=True)

# ------------------------------------------------------------- timing/meta
# gts may only appear inside aggregate args or in post; lag needs it in post
_reg(
    "lag",
    RollupSpec(
        aggs=lambda a: [_last_ts().alias("__lts")],
        post=lambda a: (F.col("gts") - F.col("__lts")) / 1000.0,
    ),
)
_simple("lifetime", lambda a: (_last_ts() - _first_ts()) / 1000.0)
_simple(
    "scrape_interval",
    lambda a: F.try_divide((_last_ts() - _first_ts()) / 1000.0, F.count(V()) - 1),
)
_simple("rate_over_sum", lambda a: F.sum(V()) / F.lit(a.window_s))


def _duration_over_time(a: RollupArgs) -> Column:
    # total time the series existed within the window, counting only gaps
    # shorter than max_interval (scalar arg, seconds).  VM starts from
    # tPrev = timestamps[0] (rollup.go:1151-1178): the FIRST in-window
    # sample contributes no gap — so subtract the earliest in-window
    # row's counted dt (its gap reaches back to the pre-window anchor).
    max_gap_ms = (a.scalars[0] if a.scalars else a.window_s) * 1000.0
    counted = F.when(DT().isNotNull() & (DT() <= F.lit(max_gap_ms)), DT())
    return (
        F.sum(counted)
        - F.coalesce(F.min_by(counted, F.col("__sts")), F.lit(0.0))
    ) / 1000.0


_simple("duration_over_time", _duration_over_time, needs_prev=True)

# ------------------------------------------- two-level decompositions
# Step-bucket partial/merge forms for the wide-window/fine-step cutover
# (see Decomposed). Only registered where the merge is exactly
# associative; order-sensitive float reductions (stddev, geomean, ...)
# and per-grid-point-conditioned aggs (``*_prometheus``, integrate) keep
# the one-level explode plan.
from dataclasses import replace as _dc_replace  # noqa: E402


def _set_two_level(name: str, d: Decomposed) -> None:
    ROLLUPS[name] = _dc_replace(ROLLUPS[name], two_level=d)


def _last_pair() -> list[Column]:
    return [_last_v().alias("__lv"), _last_ts().alias("__lt")]


_set_two_level("sum_over_time", _dec(lambda a: F.sum(V()), lambda a: F.sum("__v")))
_set_two_level(
    "count_over_time",
    _dec(lambda a: F.count(V()).cast("double"), lambda a: F.sum("__v")),
)
_set_two_level("sum2_over_time", _dec(lambda a: F.sum(V() * V()), lambda a: F.sum("__v")))
_set_two_level("min_over_time", _dec(lambda a: F.min(V()), lambda a: F.min("__v")))
_set_two_level("max_over_time", _dec(lambda a: F.max(V()), lambda a: F.max("__v")))
_set_two_level(
    "present_over_time", _dec(lambda a: F.max(F.lit(1.0)), lambda a: F.max("__v"))
)
_set_two_level(
    "range_over_time",
    Decomposed(
        partials=lambda a: [F.min(V()).alias("__mn"), F.max(V()).alias("__mx")],
        merges=lambda a: [(F.max("__mx") - F.min("__mn")).alias("__v")],
    ),
)
_set_two_level(
    "avg_over_time",
    Decomposed(
        partials=lambda a: [
            F.sum(V()).alias("__s"),
            F.count(V()).alias("__c"),
        ],
        merges=lambda a: [(F.sum("__s") / F.sum("__c")).alias("__v")],
    ),
)
for _n in ("last_over_time", "default_rollup"):
    _set_two_level(
        _n,
        Decomposed(
            partials=lambda a: _last_pair(),
            merges=lambda a: [F.max_by("__lv", "__lt").alias("__v")],
        ),
    )
_set_two_level(
    "first_over_time",
    Decomposed(
        partials=lambda a: [_first_v().alias("__fv"), _first_ts().alias("__ft")],
        merges=lambda a: [F.min_by("__fv", "__ft").alias("__v")],
    ),
)
for _n in ("timestamp", "timestamp_with_name", "tlast_over_time"):
    _set_two_level(
        _n,
        _dec(lambda a: _last_ts(), lambda a: F.max("__v") / F.lit(1000.0)),
    )
_set_two_level(
    "tfirst_over_time",
    _dec(lambda a: _first_ts(), lambda a: F.min("__v") / F.lit(1000.0)),
)
_set_two_level(
    "lifetime",
    Decomposed(
        partials=lambda a: [_first_ts().alias("__f"), _last_ts().alias("__l")],
        merges=lambda a: [
            ((F.max("__l") - F.min("__f")) / F.lit(1000.0)).alias("__v")
        ],
    ),
)
_set_two_level(
    "lag",
    Decomposed(
        partials=lambda a: [_last_ts().alias("__lts")],
        merges=lambda a: [F.max("__lts").alias("__lts")],
    ),
)
_set_two_level(
    "scrape_interval",
    Decomposed(
        partials=lambda a: [
            F.min(TS()).alias("__f"),
            F.max(TS()).alias("__l"),
            F.count(V()).alias("__c"),
        ],
        merges=lambda a: [
            F.try_divide(
                (F.max("__l") - F.min("__f")) / F.lit(1000.0),
                F.sum("__c") - F.lit(1),
            ).alias("__v")
        ],
    ),
)
_set_two_level(
    "rate_over_sum",
    _dec(lambda a: F.sum(V()), lambda a: F.sum("__v") / F.lit(a.window_s)),
)
for _n in ("increase", "increase_pure"):
    _set_two_level(_n, _dec(lambda a: F.sum(POS_DV()), lambda a: F.sum("__v")))
_set_two_level(
    "rate",
    _dec(lambda a: F.sum(POS_DV()), lambda a: F.sum("__v") / F.lit(a.window_s)),
)
_set_two_level(
    "resets",
    _dec(
        lambda a: F.sum(
            F.when(PV().isNotNull() & (V() < PV()), 1).otherwise(0)
        ).cast("double"),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "changes",
    _dec(
        lambda a: F.sum(
            F.when(PV().isNotNull() & (V() != PV()), 1).otherwise(0)
        ).cast("double"),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "increases_over_time",
    _dec(
        lambda a: F.sum(
            F.when(PV().isNotNull() & (V() > PV()), 1).otherwise(0)
        ).cast("double"),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "decreases_over_time",
    _dec(
        lambda a: F.sum(
            F.when(PV().isNotNull() & (V() < PV()), 1).otherwise(0)
        ).cast("double"),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "ascent_over_time",
    _dec(
        lambda a: F.sum(F.when(PV().isNotNull() & (DV() > 0), DV())),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "descent_over_time",
    _dec(
        lambda a: F.sum(F.when(PV().isNotNull() & (DV() < 0), -DV())),
        lambda a: F.sum("__v"),
    ),
)
_set_two_level(
    "tlast_change_over_time",
    _dec(
        lambda a: F.max(F.when(PV().isNotNull() & (V() != PV()), TS())),
        lambda a: F.max("__v") / F.lit(1000.0),
    ),
)
for _op in ("eq", "ne", "gt", "le"):
    _set_two_level(
        f"count_{_op}_over_time",
        _dec(
            lambda a, op=_op: F.sum(F.when(_cond(op, a), 1).otherwise(0)).cast(
                "double"
            ),
            lambda a: F.sum("__v"),
        ),
    )
for _op in ("eq", "gt", "le"):
    _set_two_level(
        f"sum_{_op}_over_time",
        _dec(
            lambda a, op=_op: F.sum(
                F.when(_cond(op, a), V()).otherwise(F.lit(0.0))
            ),
            lambda a: F.sum("__v"),
        ),
    )
    _set_two_level(
        f"share_{_op}_over_time",
        Decomposed(
            partials=lambda a, op=_op: [
                F.sum(F.when(_cond(op, a), 1).otherwise(0)).alias("__m"),
                F.count(V()).alias("__c"),
            ],
            merges=lambda a: [
                (F.sum("__m") / F.sum("__c")).cast("double").alias("__v")
            ],
        ),
    )
_set_two_level(
    "distinct_over_time",
    Decomposed(
        partials=lambda a: [F.collect_set(V()).alias("__set")],
        merges=lambda a: [
            F.size(F.array_distinct(F.flatten(F.collect_list("__set"))))
            .cast("double")
            .alias("__v")
        ],
    ),
)

# --------------------------------------------------- prefix-sum forms
# Marker/prefix registrations for the strictly sum-shaped subset — the
# output-optimal plan at any window/step ratio (engine/prefix.py). The
# planner prefers these over the slice two-level when both exist.
def _set_prefix(name: str, p: PrefixForm) -> None:
    ROLLUPS[name] = _dc_replace(ROLLUPS[name], prefix=p)


def _prefix1(
    name: str,
    contrib: Callable[[RollupArgs], Column],
    final: Callable[[RollupArgs], Column] | None = None,
) -> None:
    """Single-contribution prefix form onto the ``__v`` alias."""
    _set_prefix(
        name,
        PrefixForm(
            contribs=lambda a, c=contrib: [("x", c(a))],
            finalize=lambda a, f=final: [
                (F.col("__d_x") if f is None else f(a)).alias("__v")
            ],
        ),
    )


_prefix1("sum_over_time", lambda a: V())
_prefix1(
    "count_over_time",
    lambda a: F.lit(1.0),
    lambda a: F.col("__d_x"),
)
_prefix1("sum2_over_time", lambda a: V() * V())
_set_prefix(
    "avg_over_time",
    PrefixForm(
        contribs=lambda a: [("s", V()), ("c", F.lit(1.0))],
        finalize=lambda a: [
            F.try_divide(F.col("__d_s"), F.col("__d_c")).alias("__v")
        ],
    ),
)
for _n in ("increase", "increase_pure"):
    _prefix1(_n, lambda a: POS_DV())
_prefix1("rate", lambda a: POS_DV(), lambda a: F.col("__d_x") / F.lit(a.window_s))
_prefix1(
    "rate_over_sum", lambda a: V(), lambda a: F.col("__d_x") / F.lit(a.window_s)
)
_prefix1(
    "resets",
    lambda a: F.when(PV().isNotNull() & (V() < PV()), 1.0).otherwise(0.0),
)
_prefix1(
    "changes",
    lambda a: F.when(PV().isNotNull() & (V() != PV()), 1.0).otherwise(0.0),
)
_prefix1(
    "increases_over_time",
    lambda a: F.when(PV().isNotNull() & (V() > PV()), 1.0).otherwise(0.0),
)
_prefix1(
    "decreases_over_time",
    lambda a: F.when(PV().isNotNull() & (V() < PV()), 1.0).otherwise(0.0),
)
_prefix1(
    "ascent_over_time",
    lambda a: F.when(PV().isNotNull() & (DV() > 0), DV()),
)
_prefix1(
    "descent_over_time",
    lambda a: F.when(PV().isNotNull() & (DV() < 0), -DV()),
)
for _op in ("eq", "ne", "gt", "le"):
    _prefix1(
        f"count_{_op}_over_time",
        lambda a, op=_op: F.when(_cond(op, a), 1.0).otherwise(0.0),
    )
for _op in ("eq", "gt", "le"):
    _prefix1(
        f"sum_{_op}_over_time",
        lambda a, op=_op: F.when(_cond(op, a), V()).otherwise(F.lit(0.0)),
    )
    _set_prefix(
        f"share_{_op}_over_time",
        PrefixForm(
            contribs=lambda a, op=_op: [
                ("m", F.when(_cond(op, a), 1.0).otherwise(0.0)),
                ("c", F.lit(1.0)),
            ],
            finalize=lambda a: [
                F.try_divide(F.col("__d_m"), F.col("__d_c")).alias("__v")
            ],
        ),
    )

# absent_over_time handled by the planner (needs anti-grid semantics);
# multi-output and stateful rollups are planner-level too.

PLANNER_LEVEL_ROLLUPS = {
    "absent_over_time",
    "stale_samples_over_time",
    "aggr_over_time",
    "rollup",
    "rollup_candlestick",
    "rollup_delta",
    "rollup_deriv",
    "rollup_increase",
    "rollup_rate",
    "rollup_scrape_interval",
    "histogram_over_time",
    "count_values_over_time",
    "quantiles_over_time",
    "holt_winters",
}

# rollup arg position when not 0 (VM getRollupArgIdx)
ROLLUP_ARG_IDX = {
    "quantile_over_time": 1,
    "hoeffding_bound_lower": 1,
    "hoeffding_bound_upper": 1,
}

# argument-count bounds for the per-series ROLLUPS table (VM rejects
# wrong arities in newRollupFuncOneArg/TwoArgs, rollup.go:1003-1030);
# default is exactly one arg, parameterized funcs listed explicitly
ROLLUP_ARITY: dict[str, tuple[int, int]] = {
    "quantile_over_time": (2, 2),
    "hoeffding_bound_lower": (2, 2),
    "hoeffding_bound_upper": (2, 2),
    "predict_linear": (2, 2),
    "duration_over_time": (1, 2),
    **{f"count_{op}_over_time": (2, 2) for op in ("eq", "ne", "gt", "le")},
    **{f"sum_{op}_over_time": (2, 2) for op in ("eq", "gt", "le")},
    **{f"share_{op}_over_time": (2, 2) for op in ("eq", "gt", "le")},
}
