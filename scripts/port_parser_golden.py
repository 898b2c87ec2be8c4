#!/usr/bin/env python
"""Port the reference ingest-parser test corpora to JSON fixtures.

Extracts every ``f(input, &Rows{...})`` success case and every
``f(input)`` failure case from
lib/protoparser/{prometheus,graphite,influx,opentsdb}/parser_test.go
into tests/parser_golden_cases.json, by scanning the Go source with a
string/brace-aware tokenizer and converting the Go literals to Python
values (no Go toolchain needed). tests/test_parser_golden.py replays
the corpus through the Spark parsers.
"""

from __future__ import annotations

import json
import math
import os
import re
import sys

REF = "/root/reference/lib/protoparser"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "parser_golden_cases.json",
)

DIALECTS = ["prometheus", "graphite", "influx", "opentsdb", "opentsdbhttp"]


def _find_func(src: str, name: str) -> "str | None":
    m = re.search(rf"func {name}\(t \*testing\.T\) \{{", src)
    if not m:
        return None
    i = m.end()
    depth = 1
    j = i
    while depth > 0 and j < len(src):
        c = src[j]
        if c == "`":  # raw string — skip to closing backtick
            j = src.index("`", j + 1)
        elif c == '"':
            j += 1
            while src[j] != '"':
                j += 2 if src[j] == "\\" else 1
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
        j += 1
    return src[i : j - 1]


def _iter_f_calls(body: str, with_pos: bool = False):
    """Yield the full argument text of each top-level f(...) call
    (optionally with the call's start offset)."""
    i = 0
    n = len(body)
    while True:
        m = re.compile(r"\bf\(").search(body, i)
        if not m:
            return
        j = m.end()
        depth = 1
        start = j
        while depth > 0 and j < n:
            c = body[j]
            if c == "`":
                j = body.index("`", j + 1)
            elif c == '"':
                j += 1
                while body[j] != '"':
                    j += 2 if body[j] == "\\" else 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if with_pos:
            yield m.start(), body[start : j - 1]
        else:
            yield body[start : j - 1]
        i = j


def _split_top(args: str) -> list[str]:
    """Split argument text on top-level commas."""
    parts, depth, cur = [], 0, []
    i, n = 0, len(args)
    while i < n:
        c = args[i]
        if c == "`":
            k = args.index("`", i + 1)
            cur.append(args[i : k + 1])
            i = k + 1
            continue
        if c == '"':
            k = i + 1
            while args[k] != '"':
                k += 2 if args[k] == "\\" else 1
            cur.append(args[i : k + 1])
            i = k + 1
            continue
        if c in "({[":
            depth += 1
        elif c in ")}]":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


_GO_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
    "'": "'", "a": "\a", "b": "\b", "f": "\f", "v": "\v", "0": "\0",
}


def _go_string_expr(expr: str) -> "str | None":
    """Evaluate a Go string expression: quoted/backtick literals
    joined with +."""
    out = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c in " \t\n+":
            i += 1
            continue
        if c == "`":
            k = expr.index("`", i + 1)
            out.append(expr[i + 1 : k])
            i = k + 1
            continue
        if c == '"':
            k = i + 1
            buf = []
            while expr[k] != '"':
                if expr[k] == "\\":
                    nxt = expr[k + 1]
                    if nxt == "x":
                        buf.append(chr(int(expr[k + 2 : k + 4], 16)))
                        k += 4
                        continue
                    buf.append(_GO_ESCAPES.get(nxt, "\\" + nxt))
                    k += 2
                    continue
                buf.append(expr[k])
                k += 1
            out.append("".join(buf))
            i = k + 1
            continue
        return None  # not a plain string expression (vars, fmt, ...)
    return "".join(out)


def _go_value(tok: str):
    tok = tok.strip()
    bm = re.match(r"^\[\]byte\((.*)\)$", tok, re.S)
    if bm:
        return _go_string_expr(bm.group(1))
    if tok in ("math.NaN()",):
        return "NaN"
    if tok in ("math.Inf(1)", "math.Inf(+1)", "inf"):
        return "Inf"
    if tok == "math.Inf(-1)":
        return "-Inf"
    if tok.startswith(('"', "`")):
        return _go_string_expr(tok)
    try:
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        return float(tok)
    except ValueError:
        return None


def _parse_struct(text: str):
    """Parse a Go composite literal (&Rows{...}, Row{...}, []Tag{{...}},
    nested, incl. anonymous ``{...}`` slice elements) into dicts/lists.
    Returns None when something non-literal appears."""
    text = text.strip()
    if text.startswith("&"):
        text = text[1:].strip()
    m_list = re.match(r"^\[\][A-Za-z_.]*\s*\{", text)
    m_named = re.match(r"^[A-Za-z_][A-Za-z0-9_.]*\s*\{", text)
    m_anon = text.startswith("{")
    if m_list:
        inner = text[m_list.end() : _match_brace(text, m_list.end() - 1)]
        items = [it for it in _split_top(inner) if it.strip()]
        return [_parse_struct(it) for it in items]
    if m_named or m_anon:
        open_idx = text.index("{") if m_anon else (m_named.end() - 1)
        inner = text[open_idx + 1 : _match_brace(text, open_idx)]
        fields = {}
        parts = [p for p in _split_top(inner) if p.strip()]
        for part in parts:
            km = re.match(
                r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*(.*)$", part, re.S
            )
            if not km:
                # positional composite literal (e.g. Point{ts, v}) —
                # return the elements as a list
                return [_parse_struct(p.strip()) for p in parts]
            k, v = km.group(1), km.group(2).strip()
            fields[k] = _parse_struct(v)
        return fields
    return _go_value(text)


def _match_brace(text: str, open_idx: int) -> int:
    depth = 0
    i = open_idx
    n = len(text)
    while i < n:
        c = text[i]
        if c == "`":
            i = text.index("`", i + 1)
        elif c == '"':
            i += 1
            while text[i] != '"':
                i += 2 if text[i] == "\\" else 1
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced braces")


def _rows_from_literal(lit):
    """&Rows{...} literal → list of row dicts (anonymous inner structs
    come back as dicts already)."""
    if lit is None:
        return None
    if isinstance(lit, dict):
        rows = lit.get("Rows", [])
    else:
        rows = lit
    out = []
    for r in rows or []:
        if not isinstance(r, dict):
            return None
        row = dict(r)
        for tag_field in ("Tags", "Fields"):
            if tag_field in row and row[tag_field] is not None:
                tags = []
                for t in row[tag_field]:
                    if not isinstance(t, dict):
                        return None
                    tags.append(
                        {"Key": t.get("Key", ""), "Value": t.get("Value", 0)}
                    )
                row[tag_field] = tags
        out.append(row)
    return out


def _anon_list_fix(text: str):
    """[]Row{{...},{...}} — the anonymous elements start with '{'."""
    return text


# Failure shapes the reference REJECTS but its own test corpus doesn't
# include — kept here so a corpus regeneration preserves them.
# prometheus: junk after the timestamp — the whole tail after the value
# is ONE timestamp token, so `1 2 3` fails fastfloat.Parse("2 3")
# (lib/protoparser/prometheus/parser.go:206-229).
LOCAL_FAILURE_EXTRAS = {
    "prometheus": [
        'm{a="b"} 1 2 3',
        "bare 4 5 6",
        'm{a="b"} 1 1000 extra',
    ],
}


def main() -> int:
    corpus = {}
    for d in DIALECTS:
        path = f"{REF}/{d}/parser_test.go"
        src = open(path, encoding="utf-8").read()
        succ_body = _find_func(src, "TestRowsUnmarshalSuccess") or _find_func(
            src, "TestRowsUnmarshal_Success"
        )
        fail_body = _find_func(src, "TestRowsUnmarshalFailure") or _find_func(
            src, "TestRowsUnmarshal_Failure"
        )
        succ, fail, skipped = [], [], 0
        if succ_body:
            for call in _iter_f_calls(succ_body):
                parts = _split_top(call)
                if len(parts) != 2:
                    skipped += 1
                    continue
                inp = _go_string_expr(parts[0])
                if inp is None:
                    skipped += 1
                    continue
                lit = _parse_struct(parts[1])
                rows = _rows_from_literal(lit)
                if rows is None:
                    skipped += 1
                    continue
                succ.append({"input": inp, "rows": rows})
        if fail_body:
            for call in _iter_f_calls(fail_body):
                parts = _split_top(call)
                if len(parts) != 1:
                    skipped += 1
                    continue
                inp = _go_string_expr(parts[0])
                if inp is None:
                    skipped += 1
                    continue
                fail.append(inp)
        fail += LOCAL_FAILURE_EXTRAS.get(d, [])
        corpus[d] = {"success": succ, "failure": fail, "skipped": skipped}
        print(
            f"{d}: {len(succ)} success, {len(fail)} failure, "
            f"{skipped} skipped (non-literal)"
        )
    # zabbixconnector: flags toggle MID-FUNCTION, so walk assignments
    # and calls in order and attach the active flag state to each case
    src = open(
        f"{REF}/zabbixconnector/parser_test.go", encoding="utf-8"
    ).read()
    zb = {"success": [], "failure": [], "skipped": 0}
    flag_re = re.compile(r"\*add(\w+)\s*=\s*\"([^\"]*)\"")
    for kind, fname in (
        ("success", "TestRowsUnmarshalSuccess"),
        ("failure", "TestRowsUnmarshalFailure"),
    ):
        body = _find_func(src, fname)
        if not body:
            continue
        events = [
            ("flag", m.start(), (m.group(1), m.group(2)))
            for m in flag_re.finditer(body)
            if "original" not in body[max(0, m.start() - 40) : m.start()]
        ] + [
            ("call", p, a) for p, a in _iter_f_calls(body, with_pos=True)
        ]
        events.sort(key=lambda e: e[1])
        flags = {
            "GroupsValue": "",
            "EmptyTagsValue": "",
            "DuplicateTagsSeparator": "",
        }
        for ev, _p, payload in events:
            if ev == "flag":
                name, val = payload
                if name in flags and "original" not in val:
                    flags[name] = val
                continue
            parts = _split_top(payload)
            inp = _go_string_expr(parts[0])
            if inp is None:
                zb["skipped"] += 1
                continue
            if kind == "failure":
                zb["failure"].append({"input": inp, "flags": dict(flags)})
                continue
            rows = _rows_from_literal(_parse_struct(parts[1]))
            if rows is None:
                zb["skipped"] += 1
                continue
            zb["success"].append(
                {"input": inp, "rows": rows, "flags": dict(flags)}
            )
    corpus["zabbix"] = zb
    print(
        f"zabbix: {len(zb['success'])} success, {len(zb['failure'])} "
        f"failure, {zb['skipped']} skipped"
    )

    # csvimport: f(format, input[, []Row{...}]) — the format spec is
    # part of each case
    src = open(f"{REF}/csvimport/parser_test.go", encoding="utf-8").read()
    cv = {"success": [], "failure": [], "skipped": 0}
    for kind, fname in (
        ("success", "TestRowsUnmarshalSuccess"),
        ("failure", "TestRowsUnmarshalFailure"),
    ):
        body = _find_func(src, fname)
        if not body:
            continue
        for call in _iter_f_calls(body):
            parts = _split_top(call)
            fmt_s = _go_string_expr(parts[0]) if parts else None
            inp = _go_string_expr(parts[1]) if len(parts) > 1 else None
            if fmt_s is None or inp is None:
                cv["skipped"] += 1
                continue
            if kind == "failure":
                cv["failure"].append({"format": fmt_s, "input": inp})
                continue
            rows = []
            if len(parts) > 2 and parts[2].strip() != "nil":
                rows = _rows_from_literal(_parse_struct(parts[2]))
                if rows is None:
                    cv["skipped"] += 1
                    continue
            cv["success"].append(
                {"format": fmt_s, "input": inp, "rows": rows}
            )
    corpus["csvimport"] = cv
    print(
        f"csvimport: {len(cv['success'])} success, "
        f"{len(cv['failure'])} failure, {cv['skipped']} skipped"
    )

    # datadogv1/v2: f(input, &Request{Series: [...]}) — keep the raw
    # Request literal dict; the replay flattens it per the insert
    # handler's mapping (request_handler.go)
    for d, fnames in (
        ("datadogv1",
         [("success", "TestRequestUnmarshalSuccess"),
          ("failure", "TestRequestUnmarshalFailure")]),
        ("datadogv2",
         [("success", "TestRequestUnmarshalJSONSuccess"),
          ("failure", "TestRequestUnmarshalJSONFailure")]),
    ):
        src = open(f"{REF}/{d}/parser_test.go", encoding="utf-8").read()
        dd = {"success": [], "failure": [], "skipped": 0}
        for kind, fname in fnames:
            body = _find_func(src, fname)
            if not body:
                continue
            for call in _iter_f_calls(body):
                parts = _split_top(call)
                inp = _go_string_expr(parts[0]) if parts else None
                if inp is None:
                    dd["skipped"] += 1
                    continue
                if kind == "failure":
                    dd["failure"].append(inp)
                    continue
                req = _parse_struct(parts[1])
                if req is None:
                    dd["skipped"] += 1
                    continue
                dd["success"].append({"input": inp, "request": req})
        corpus[d] = dd
        print(
            f"{d}: {len(dd['success'])} success, "
            f"{len(dd['failure'])} failure, {dd['skipped']} skipped"
        )

    # newrelic: f(input, []Row{Tags, Samples, Timestamp}) — Tag keys/
    # values are []byte literals, handled by _go_value
    src = open(f"{REF}/newrelic/parser_test.go", encoding="utf-8").read()
    nr = {"success": [], "failure": [], "skipped": 0}
    for kind, fname in (
        ("success", "TestRowsUnmarshalSuccess"),
        ("failure", "TestRowsUnmarshalFailure"),
    ):
        body = _find_func(src, fname)
        if not body:
            continue
        for call in _iter_f_calls(body):
            parts = _split_top(call)
            inp = _go_string_expr(parts[0]) if parts else None
            if inp is None:
                nr["skipped"] += 1
                continue
            if kind == "failure":
                nr["failure"].append(inp)
                continue
            rows = []
            if len(parts) > 1 and parts[1].strip() != "nil":
                rows = _parse_struct(parts[1])
                if rows is None:
                    nr["skipped"] += 1
                    continue
            nr["success"].append({"input": inp, "rows": rows})
    corpus["newrelic"] = nr
    print(
        f"newrelic: {len(nr['success'])} success, "
        f"{len(nr['failure'])} failure, {nr['skipped']} skipped"
    )
    with open(OUT, "w", encoding="utf-8") as fh:
        json.dump(corpus, fh, indent=1)
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
