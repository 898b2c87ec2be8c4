#!/usr/bin/env python
"""Capture .explain("formatted") for named queries() entries, before and
after execution (the post-AQE Final Plan only materializes on the
DataFrame's own QueryExecution after an action — a noop write creates a
NEW QueryExecution, so we collect() the df itself; see r13 notes).

Usage: python scripts/capture_plans.py <outdir> <suffix> <query> [...]
Writes <outdir>/<query>_<suffix>.txt with INITIAL and FINAL sections.
"""

from __future__ import annotations

import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry

    from victoriametrics_spark.session import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = fn(spark, sf_dir)
        initial = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        t0 = time.time()
        n = len(df.collect())
        dt = time.time() - t0
        final = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        buf = io.StringIO()
        buf.write(f"== {name} ({suffix}) rows={n} exec={dt:.2f}s ==\n\n")
        buf.write("==== INITIAL PLAN ====\n")
        buf.write(initial)
        buf.write("\n==== FINAL (post-AQE, executed) PLAN ====\n")
        buf.write(final)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({n} rows, {dt:.2f}s)", file=sys.stderr)


if __name__ == "__main__":
    main()
