"""AST → Spark DataFrame planner (filled in engine core milestone)."""

from __future__ import annotations


def evaluate(spark, query, samples, cfg):  # pragma: no cover - stub
    raise NotImplementedError
