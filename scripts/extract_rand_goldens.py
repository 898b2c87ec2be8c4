"""Port the Go-rand-dependent subtests from the reference's
app/vmselect/promql/exec_test.go into tests/rand_golden_cases.json.

These cases were excluded from the golden suites until round 13 because
they need Go's exact math/rand bit stream; engine/gorand.py now provides
it, so every rand() case becomes portable.  Expected VALUES come from the
reference's own test expectations (data, not code)."""

from __future__ import annotations

import json
import re

SRC = "/root/reference/app/vmselect/promql/exec_test.go"
OUT = "/root/repo/tests/rand_golden_cases.json"

text = open(SRC).read()

# t.Run blocks, non-greedy to the closing "\t})" at one-tab indent
blocks = re.findall(
    r"\tt\.Run\((?:`[^`]*`|\"[^\"]*\")\s*,\s*func\(t \*testing\.T\) \{(.*?)\n\t\}\)",
    text,
    re.S,
)

cases = []
seen = set()
for body in blocks:
    mq = re.search(r"q := `([^`]*)`", body)
    if not mq:
        continue
    q = mq.group(1)
    if "rand(" not in q and "rand_normal(" not in q and "rand_exponential(" not in q:
        continue
    if q in seen:
        continue
    seen.add(q)
    # each result: Values + optional MetricGroup + Tags, in declared order
    results = []
    # split on netstorage.Result declarations
    parts = re.split(r"\w+ := netstorage\.Result\{", body)[1:]
    ok = True
    for part in parts:
        mv = re.search(r"Values:\s*\[\]float64\{([^}]*)\}", part)
        if not mv:
            ok = False
            break
        vals = []
        for tok in mv.group(1).split(","):
            tok = tok.strip()
            if not tok:
                continue
            vals.append(None if tok == "nan" else float(tok))
        mg = re.search(r'MetricGroup = \[\]byte\("([^"]*)"\)', part)
        name = mg.group(1) if mg else ""
        tags = dict(
            re.findall(
                r'Key:\s*\[\]byte\("([^"]*)"\),\s*Value:\s*\[\]byte\("([^"]*)"\)',
                part,
            )
        )
        results.append([name, tags, vals])
    if not ok:
        continue
    # empty resultExpected (f(q, nil)) has no Result blocks — keep those
    # only when explicitly nil
    if not parts and "f(q, nil)" not in body:
        continue
    cases.append({"q": q, "expected": results})

with open(OUT, "w") as f:
    json.dump(cases, f, indent=1)
print(f"extracted {len(cases)} rand-dependent golden cases -> {OUT}")
for c in cases:
    print(" ", c["q"].replace("\n", " ")[:90], f"({len(c['expected'])} series)")
