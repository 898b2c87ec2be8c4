"""MetricsQL lexer.

Token kinds: IDENT, NUMBER, DURATION, STRING, OP (operators/punct), EOF.
Behavioral reference: vendor/github.com/VictoriaMetrics/metricsql/lexer.go
(number suffixes k/Ki/M/Mi/G/Gi/T/Ti, hex/binary literals, inf/nan,
durations with ms/s/m/h/d/w/y/i units, # comments, quoted UTF-8 idents).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class LexError(ValueError):
    pass


@dataclass
class Token:
    kind: str  # IDENT NUMBER DURATION STRING OP EOF
    text: str
    pos: int


_IDENT_START = re.compile(r"[a-zA-Z_:.]")
_IDENT_CHAR = re.compile(r"[a-zA-Z0-9_:.]")
# longest-first operator table
_OPS = [
    "==", "!=", "<=", ">=", "=~", "!~",
    "+", "-", "*", "/", "%", "^",
    "<", ">", "=",
    "(", ")", "{", "}", "[", "]", ",", "@", ";", ":",
]

_NUM_SUFFIX = {
    "kib": 1024.0, "ki": 1024.0,
    "mib": 1024.0**2, "mi": 1024.0**2,
    "gib": 1024.0**3, "gi": 1024.0**3,
    "tib": 1024.0**4, "ti": 1024.0**4,
    "kb": 1e3, "k": 1e3,
    "mb": 1e6, "m": 1e6,
    "gb": 1e9, "g": 1e9,
    "tb": 1e12, "t": 1e12,
}

# duration units are case-insensitive EXCEPT bare `m` (minutes) — `M`
# would collide with the 1e6 number suffix (lexer.go behavior; exec_test
# `1h23m5S` relies on uppercase S)
# lowercase bare `m` is minutes ONLY when not followed by i/b (`5mib` is
# a size suffix, lexer.go:701-718); uppercase `M` alone is 1e6
_DUR_UNIT = r"(?:[mM][sS]|[sShHdDwWyY]|m(?![iIbB])|i)"
_DURATION_RE = re.compile(
    rf"\d+(?:\.\d+)?{_DUR_UNIT}(?:\d+(?:\.\d+)?{_DUR_UNIT})*"
)
# underscores allowed between digits: 123_456_789, 1_2.3_456_789
_NUMBER_RE = re.compile(
    r"(?:0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+"
    r"|\d[\d_]*(?:\.[\d_]*)?(?:[eE][+-]?\d+)?|\.\d[\d_]*(?:[eE][+-]?\d+)?)"
)


def parse_number(text: str) -> float:
    t = text.lower().replace("_", "")
    if t in ("inf", "+inf"):
        return float("inf")
    if t == "-inf":
        return float("-inf")
    if t == "nan":
        return float("nan")
    if t.startswith(("0x", "0b", "0o")):
        return float(int(t, 0))
    for suf, mult in sorted(_NUM_SUFFIX.items(), key=lambda kv: -len(kv[0])):
        if t.endswith(suf):
            return float(t[: -len(suf)]) * mult
    return float(t)


def _unquote(s: str) -> str:
    q = s[0]
    if q == "`":
        return s[1:-1]
    body = s[1:-1]
    out = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            n = body[i + 1]
            mapping = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\", '"': '"', "'": "'"}
            if n in mapping:
                out.append(mapping[n])
                i += 2
                continue
            if n == "x" and i + 3 < len(body):
                out.append(chr(int(body[i + 2 : i + 4], 16)))
                i += 4
                continue
            if n == "u" and i + 5 < len(body):
                out.append(chr(int(body[i + 2 : i + 6], 16)))
                i += 6
                continue
            out.append(n)
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def tokenize(q: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "#":  # comment to end of line
            j = q.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c in "'\"`":
            j = i + 1
            while j < n:
                if q[j] == "\\" and c != "`":
                    j += 2
                    continue
                if q[j] == c:
                    break
                j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("STRING", _unquote(q[i : j + 1]), i))
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and q[i + 1].isdigit()):
            m = _DURATION_RE.match(q, i)
            # duration must consume beyond a plain number (has a unit char)
            nm = _NUMBER_RE.match(q, i)
            num_end = None
            if nm:
                end = nm.end()
                # greedy size suffix: 1Ki, 5M, 2.5Gb, 1.23mib ...
                rest = q[end : end + 3].lower()
                for suf in sorted(_NUM_SUFFIX, key=len, reverse=True):
                    if rest.startswith(suf):
                        nxt = end + len(suf)
                        if nxt >= n or not _IDENT_CHAR.match(q[nxt]):
                            end = nxt
                            break
                num_end = end
            # duration wins when it consumes more than the BARE number
            # (`5m` = 5 minutes); the m-not-before-i/b lookahead in
            # _DUR_UNIT already yields `1.23mib` to the size-suffix path
            if m and nm and m.end() > nm.end():
                toks.append(Token("DURATION", m.group(0), i))
                i = m.end()
                continue
            if num_end is not None:
                toks.append(Token("NUMBER", q[i:num_end], i))
                i = num_end
                continue
            raise LexError(f"bad number at {i}: {q[i:i+10]!r}")
        if _IDENT_START.match(c) or (c == "\\" and i + 1 < n):
            j = i
            while j < n and (_IDENT_CHAR.match(q[j]) or q[j] == "\\"):
                if q[j] == "\\":
                    j += 2
                else:
                    j += 1
            text = q[i:j]
            low = text.lower()
            if low in ("inf", "nan"):
                toks.append(Token("NUMBER", text, i))
            else:
                toks.append(Token("IDENT", text.replace("\\", ""), i))
            i = j
            continue
        for op in _OPS:
            if q.startswith(op, i):
                toks.append(Token("OP", op, i))
                i += len(op)
                break
        else:
            raise LexError(f"unexpected char {c!r} at {i}")
    toks.append(Token("EOF", "", n))
    return toks
