"""Extract the reference's graphite TestExecExprSuccess corpus
(app/vmselect/graphite/eval_test.go) into JSON cases runnable against
victoriametrics_spark.graphite.render.

Reference evalConfig: startTime=120e3 ms, endTime=210e3 ms,
storageStep=30e3 ms. Expected-series Timestamps/Values are Go literals
with a small expression vocabulary (ec.startTime etc.) substituted
here. Tags are dropped (the Spark engine carries tags inline in the
name, graphite-style). Output: tests/graphite_golden_cases.json
"""

from __future__ import annotations

import json
import re
import sys

SRC = "/root/reference/app/vmselect/graphite/eval_test.go"

# ordered: longer/specific forms first so a later bare-word replacement
# can't corrupt an earlier expansion
SUBS = [
    ("ec.startTime", "120000"),
    ("ec.endTime", "210000"),
    ("ec.storageStep", "30000"),
    ("math.Inf(1)", "(1e999)"),
    ("math.Inf(-1)", "(-1e999)"),
    ("float64", "float"),
    ("nan", "(float('nan'))"),
    ("inf", "(1e999)"),
]


def _find_blocks(text: str):
    """Yield (query, seriess_literal) for each top-level f(...) call."""
    i = 0
    n = len(text)
    while True:
        m = re.compile(r"\n\tf\(").search(text, i)
        if not m:
            return
        start = m.end() - 1  # at '('
        depth = 0
        j = start
        in_str = None
        while j < n:
            c = text[j]
            if in_str:
                if c == "\\" and in_str in "\"'":
                    j += 2
                    continue
                if c == in_str:
                    in_str = None
            elif c in "\"'`":
                in_str = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        body = text[start + 1 : j]
        i = j
        yield body


def _split_args(body: str):
    """Split `f(` body into (query_literal, rest)."""
    body = body.strip()
    q = None
    if body.startswith("`"):
        end = body.index("`", 1)
        q = body[1:end]
        rest = body[end + 1 :]
    elif body.startswith('"'):
        j = 1
        out = []
        while j < len(body):
            if body[j] == "\\":
                out.append(body[j + 1])
                j += 2
                continue
            if body[j] == '"':
                break
            out.append(body[j])
            j += 1
        q = "".join(out)
        rest = body[j + 1 :]
    else:
        return None, None
    rest = rest.lstrip().lstrip(",").strip()
    return q, rest


def _parse_series_list(rest: str):
    """Parse `[]*series{ {...}, {...} }` into [(name, [(ts, v)...])]."""
    m = re.match(r"\[\]\*series\{", rest)
    if not m:
        return None
    inner = rest[m.end() : rest.rfind("}")]
    out = []
    # each series literal is { ... } at depth 1
    depth = 0
    cur = []
    for c in inner:
        if c == "{":
            depth += 1
            if depth == 1:
                cur = []
                continue
        if c == "}":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(c)
    cases = []
    for lit in out:
        name_m = re.search(r"Name:\s*(`[^`]*`|\"(?:[^\"\\]|\\.)*\")", lit)
        ts_m = re.search(r"Timestamps:\s*\[\]int64\{([^}]*)\}", lit)
        v_m = re.search(r"Values:\s*\[\]float64\{([^}]*)\}", lit)
        if not name_m or not ts_m or not v_m:
            return None
        raw_name = name_m.group(1)
        if raw_name.startswith("`"):
            name = raw_name[1:-1]
        else:
            name = raw_name[1:-1].encode().decode("unicode_escape")
        ts_src = ts_m.group(1)
        v_src = v_m.group(1)
        for k, v in SUBS:
            ts_src = ts_src.replace(k, v)
            v_src = v_src.replace(k, v)
        try:
            tss = [int(eval(x)) for x in ts_src.split(",") if x.strip()]
            vals = [float(eval(x)) for x in v_src.split(",") if x.strip()]
        except Exception:
            return None
        if len(tss) != len(vals):
            return None
        cases.append(
            {"name": name,
             "points": [
                 [t, None if v != v else v] for t, v in zip(tss, vals)
             ]}
        )
    return cases


def main():
    text = open(SRC).read()
    ported, skipped = [], 0
    for body in _find_blocks(text):
        q, rest = _split_args(body)
        if q is None:
            skipped += 1
            continue
        if rest == "[]*series{}" or rest.rstrip(", \n\t") == "[]*series{}":
            ported.append({"query": q, "series": []})
            continue
        series = _parse_series_list(rest)
        if series is None:
            skipped += 1
            continue
        ported.append({"query": q, "series": series})
    json.dump(ported, open("tests/graphite_golden_cases.json", "w"),
              indent=0)
    print(f"ported {len(ported)} cases, skipped {skipped}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
