"""Triage runner for the graphite TestExecExprFailure corpus: every
query must raise (at plan time or on collect)."""

import json
import sys

sys.path.insert(0, "/root/repo")

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.graphite import render  # noqa: E402

S, E, ST = 120000, 420000, 60000


def main():
    cases = json.load(open("/root/repo/tests/graphite_error_cases.json"))
    spark = get_spark("gerr")
    spark.sparkContext.setLogLevel("ERROR")
    empty = spark.createDataFrame([], "name string, ts long, value double")
    rejected, accepted = [], []
    for i, q in enumerate(cases):
        try:
            render(spark, q, empty, S, E, ST).collect()
            accepted.append((i, q))
        except Exception:
            rejected.append(i)
    print(f"REJECTED {len(rejected)} ACCEPTED {len(accepted)}")
    for i, q in accepted:
        print(f"--- ACCEPTED #{i}: {q!r}")


if __name__ == "__main__":
    main()
