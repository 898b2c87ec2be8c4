"""Graphite Render API subset — Spark-first implementation.

The reference implements the Graphite render protocol with 151
registered functions (app/vmselect/graphite/functions.json, evaluator
app/vmselect/graphite/transform.go, aggregates aggr.go). This package
re-expresses that surface over a long-format DataFrame
``(name string, ts long-ms, value double-nullable)`` kept DENSE on the
render grid: every series carries a row for every grid point, with NULL
standing in for Graphite's None/NaN. Dense grids make every pointwise
series-combine a plain groupBy(ts) and every windowed transform a
fixed-frame window — no per-row Python anywhere.
"""

from victoriametrics_spark.graphite.evaluator import (
    RenderContext,
    evaluate_target,
    render,
)
from victoriametrics_spark.graphite.parser import parse_target

__all__ = ["RenderContext", "evaluate_target", "render", "parse_target"]
