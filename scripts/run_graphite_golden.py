"""Triage runner for the ported graphite golden corpus: run every case
through render() and report pass/fail with diffs. Used to curate
tests/test_graphite_golden.py (passing cases become the frozen suite;
failures are individually audited)."""

import json
import math
import sys

sys.path.insert(0, "/root/repo")

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.graphite import render  # noqa: E402

S, E, ST = 120000, 210000, 30000


def norm(rows):
    out = {}
    for name, ts, v in rows:
        if v is not None and math.isnan(v):
            v = None
        out.setdefault(name, {})[ts] = v
    return out


def close(a, b):
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    if math.isinf(a) or math.isinf(b):
        return a == b
    return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))


def main():
    cases = json.load(open("/root/repo/tests/graphite_golden_cases.json"))
    sel = sys.argv[1:] if len(sys.argv) > 1 else None
    spark = get_spark("ggolden")
    spark.sparkContext.setLogLevel("ERROR")
    empty = spark.createDataFrame([], "name string, ts long, value double")
    passed, failed, errored = [], [], []
    for i, case in enumerate(cases):
        if sel and str(i) not in sel:
            continue
        q = case["query"]
        try:
            rows = [
                (r["name"], r["ts"], r["value"])
                for r in render(spark, q, empty, S, E, ST).collect()
            ]
        except Exception as exc:
            errored.append((i, q, str(exc)[:160]))
            continue
        got = norm(rows)
        want = {
            s["name"]: {p[0]: p[1] for p in s["points"]}
            for s in case["series"]
        }
        ok = set(got) == set(want)
        if ok:
            for name in want:
                w, g = want[name], got[name]
                if set(w) != set(g) or not all(
                    close(w[t], g[t]) for t in w
                ):
                    ok = False
                    break
        if ok:
            passed.append(i)
        else:
            failed.append((i, q, want, got))
    print(f"PASS {len(passed)} FAIL {len(failed)} ERR {len(errored)}")
    print("passed:", ",".join(map(str, passed)))
    for i, q, err in errored:
        print(f"--- ERR #{i}: {q[:100]!r}\n    {err}")
    for i, q, want, got in failed:
        print(f"--- FAIL #{i}: {q[:120]!r}")
        print(f"    want: {json.dumps(want, default=str)[:300]}")
        print(f"    got:  {json.dumps(got, default=str)[:300]}")


if __name__ == "__main__":
    main()
