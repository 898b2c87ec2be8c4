"""Evaluation context for a range query.

Mirrors the reference's EvalConfig (app/vmselect/promql/eval.go:115-165):
a query is always evaluated on the inclusive grid
``[start, start+step, ..., end]`` (end is pre-aligned DOWN to
start + k*step — the grid truncates at end, eval.go:234 getTimestamps);
an instant query is simply ``start == end`` (eval.go:115-118).
All times are unix milliseconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class EvalConfig:
    start: int  # unix ms, first grid point
    end: int  # unix ms, last grid point (aligned down to start + k*step)
    step: int  # ms, > 0
    # Extra lookback applied when a selector has no explicit [window]:
    # default_rollup looks back up to max(step, max_lookback) for the most
    # recent sample (VM: maxSilenceInterval + step default, rollup.go:738-757).
    max_lookback: int = 300_000
    # LookbackDelta (-query.lookback-delta / the `max_lookback` query
    # param, prometheus.go getMaxLookback): 0 = unset. When > 0 it CAPS
    # the per-series maxPrevInterval (rollup.go:730-733), caps the
    # implicit default_rollup window (rollup.go:753), and gates
    # realPrevValue on (first-in-window ts − prev ts) < delta
    # (rollup.go:788-805).
    lookback_delta: int = 0
    # `@` modifier / offset support adjusts these per-subtree.
    at: int | None = None
    # Dedup-on-read: -dedup.minScrapeInterval analog (lib/storage/dedup.go:
    # 29-60) — every selector scan keeps only the last sample per aligned
    # interval bucket per series. 0 disables.
    dedup_interval_ms: int = 0
    # Enforced extra filters (multi-tenant safety) — the extra_label /
    # extra_filters[] query args (searchutil.JoinTagFilterss /
    # EnforcedTagFilterss, eval.go:144-146). Shape: a tuple of GROUPS,
    # each group a tuple of (label, op, value) triples; the groups OR
    # together and AND into every selector scan (multiple
    # extra_filters[] params are alternatives in VM). A flat tuple of
    # triples is accepted as a single group (legacy shape).
    enforced_filters: tuple = ()
    # Wide-window/fine-step cutover: when window/step exceeds this ratio
    # (and the window is a step multiple), decomposable rollups switch
    # from the contribution-explode plan (amplification = window/step per
    # SAMPLE) to step-bucket two-level aggregation (amplification =
    # window/step per BUCKET PARTIAL — bounded by the grid, not the data).
    two_level_cutover: int = 16
    # -search.maxUniqueTimeseries analog (lib/storage/index_db.go
    # errTooManyTimeseries): a selector scan matching more unique
    # series than this fails the query. 0 disables (no probe job runs).
    max_unique_timeseries: int = 0
    # -search.maxSamplesPerQuery / -search.maxSamplesPerSeries analogs
    # (netstorage.go:1114 / :464): caps on raw samples a query may
    # scan, total and per series. 0 disables; any non-zero limit
    # shares ONE probe aggregation with the series-count check.
    max_samples_per_query: int = 0
    max_samples_per_series: int = 0

    def __post_init__(self):
        if self.step <= 0:
            raise ValueError("step must be positive")
        if self.end < self.start:
            raise ValueError("end < start")
        # the grid is start + k*step for k = 0..floor((end-start)/step):
        # it TRUNCATES at end, never exceeding it (eval.go:234-254
        # getTimestamps, `points := 1 + (end-start)/step`) — an
        # unaligned range keeps the start's phase and drops the tail
        n = (self.end - self.start) // self.step
        object.__setattr__(self, "end", self.start + n * self.step)

    @property
    def num_points(self) -> int:
        return (self.end - self.start) // self.step + 1

    def grid(self) -> list[int]:
        return list(range(self.start, self.end + 1, self.step))

    def enforced_groups(self) -> tuple:
        """Normalized enforced filters: tuple of OR-groups of triples."""
        ef = self.enforced_filters
        if not ef:
            return ()
        if isinstance(ef[0][0], str):  # flat triples → one group
            return (tuple(ef),)
        return tuple(tuple(g) for g in ef)

    def with_range(self, start: int, end: int, step: int | None = None) -> EvalConfig:
        return replace(self, start=start, end=end, step=step or self.step)
