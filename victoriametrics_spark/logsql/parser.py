"""LogsQL text front-end: lexer + recursive-descent parser + Spark compiler.

Grammar follows the vendored VictoriaLogs parser
(vendor/.../logstorage/parser.go:2190-2262 filter dispatch,
pipe.go:209-276 pipe-name registry, per-pipe ``String()`` methods for the
canonical argument shapes).  A query is::

    <filterExpr> [ | <pipe> ]*

where ``filterExpr`` is an and/or/not tree of field filters (bare word,
"phrase", prefix*, field:value, comparison/range operators, function-style
filters like ``in(...)``, ``re(...)``, ``seq(...)``) and each pipe compiles
onto the DataFrame combinators in :mod:`victoriametrics_spark.logsql.pipes`
so Catalyst sees one logical plan: filters stay predicate-pushdown-able,
pipes compose as narrow projections unless they inherently shuffle
(stats/sort/top/uniq).

Log frames are ordinary DataFrames; the message column is ``_msg`` and the
timestamp column ``_time`` (see sources/logs.py).  Any other column is a
log field.  This keeps the front-end storage-agnostic: 100 TB of parquet
logs partitioned by day works the same as a 5-row test frame.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field as _dfield
from datetime import datetime, timedelta
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import pipes

__all__ = ["parse_query", "run_logsql", "LogsQLError", "Query"]


def _int_arg(v, what: str = "argument") -> int:
    """Coerce a parsed string argument to int with a LogsQLError (a
    bare int() leaks a context-free ValueError — fuzz finding)."""
    try:
        return int(v)
    except (TypeError, ValueError):
        raise LogsQLError(f"expected integer {what}, got {v!r}") from None


class LogsQLError(ValueError):
    """Raised on any LogsQL syntax or compile error."""


# --------------------------------------------------------------------- lexer
_PUNCT2 = ("!=", "!~", "<=", ">=")
_PUNCT1 = "|()[]{},:*=~!<>-+/%^"
_WORD_START = _re.compile(r"[A-Za-z0-9_\.@\\]")
_WORD_CONT = _re.compile(r"[A-Za-z0-9_\.@\\-]")


@dataclass
class Tok:
    val: str
    kind: str  # word | str | punct | eof
    spaced: bool  # whitespace between this token and the previous one
    pos: int


def tokenize(s: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(s)
    spaced = True
    while i < n:
        ch = s[i]
        if ch.isspace():
            i += 1
            spaced = True
            continue
        start = i
        if ch in "\"'`":
            q = ch
            i += 1
            buf = []
            while i < n and s[i] != q:
                if q != "`" and s[i] == "\\" and i + 1 < n:
                    esc = s[i + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                    i += 2
                else:
                    buf.append(s[i])
                    i += 1
            if i >= n:
                raise LogsQLError(f"unterminated string at offset {start}")
            i += 1
            toks.append(Tok("".join(buf), "str", spaced, start))
        elif s[i : i + 2] in _PUNCT2:
            toks.append(Tok(s[i : i + 2], "punct", spaced, start))
            i += 2
        elif _WORD_START.match(ch):
            j = i + 1
            while j < n and _WORD_CONT.match(s[j]):
                j += 1
            toks.append(Tok(s[i:j], "word", spaced, start))
            i = j
        elif ch in _PUNCT1:
            toks.append(Tok(ch, "punct", spaced, start))
            i += 1
        else:
            raise LogsQLError(f"unexpected character {ch!r} at offset {i}")
        spaced = False
    toks.append(Tok("", "eof", True, n))
    return toks


# ----------------------------------------------------------------- filter AST
@dataclass
class FNode:
    """Filter node. op is one of: and, or, not, word, phrase, prefix,
    exact, exact_prefix, regexp, any_case, any_case_prefix, in, seq, cmp,
    range, len_range, string_range, ipv4_range, ipv6_range, value_type,
    contains_all, contains_any, eq_field, le_field, lt_field,
    pattern_match, star, time, day_range, week_range, stream."""

    op: str
    fld: str = ""
    args: tuple = ()
    kids: list["FNode"] = _dfield(default_factory=list)


_DUR_RE = _re.compile(r"^(?:\d+(?:\.\d+)?(?:ms|s|m|h|d|w|y))+$")
_DUR_PART = _re.compile(r"(\d+(?:\.\d+)?)(ms|s|m|h|d|w|y)")
_DUR_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 7 * 86_400_000,
    "y": 365 * 86_400_000,
}


def parse_duration_ms(s: str) -> float:
    neg = s.startswith("-")
    if neg:
        s = s[1:]
    if not _DUR_RE.match(s):
        raise LogsQLError(f"invalid duration {s!r}")
    total = sum(float(v) * _DUR_MS[u] for v, u in _DUR_PART.findall(s))
    return -total if neg else total


def _parse_time_str(s: str) -> datetime:
    """RFC3339 / date-only timestamp → naive UTC datetime."""
    t = s.strip()
    if t.endswith("Z"):
        t = t[:-1]
    # offset suffix +hh:mm / -hh:mm
    m = _re.match(r"^(.*?T.*?)([+-]\d{2}:\d{2})$", t)
    off = timedelta(0)
    if m:
        t = m.group(1)
        sign = -1 if m.group(2)[0] == "+" else 1
        hh, mm = int(m.group(2)[1:3]), int(m.group(2)[4:6])
        off = sign * timedelta(hours=hh, minutes=mm)
    for fmt in (
        "%Y-%m-%dT%H:%M:%S.%f",
        "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M",
        "%Y-%m-%d",
        "%Y-%m",
        "%Y",
    ):
        try:
            return datetime.strptime(t, fmt) + off
        except ValueError:
            continue
    raise LogsQLError(f"invalid timestamp {s!r}")


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


_FILTER_FUNCS = {
    "contains_all",
    "contains_any",
    "eq_field",
    "exact",
    "i",
    "in",
    "ipv4_range",
    "ipv6_range",
    "json_array_contains_any",
    "le_field",
    "len_range",
    "lt_field",
    "pattern_match",
    "range",
    "re",
    "seq",
    "string_range",
    "value_type",
    "day_range",
    "week_range",
}

# tokens that terminate an AND-juxtaposition filter run
_FILTER_STOP = {"|", ")", ""}


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    # --- token helpers
    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at(self, *vals: str) -> bool:
        t = self.peek()
        return t.kind != "str" and t.val.lower() in vals

    def eat(self, *vals: str) -> bool:
        if self.at(*vals):
            self.next()
            return True
        return False

    def int_next(self) -> int:
        """Next token as an integer, or a positioned LogsQLError — a
        bare int() here leaks a context-free ValueError for queries
        like `| limit x` (found by fuzzing)."""
        t = self.next()
        try:
            return int(t.val)
        except ValueError:
            raise LogsQLError(
                f"expected integer, got {t.val!r} at offset {t.pos}"
            ) from None

    def expect(self, val: str) -> Tok:
        t = self.next()
        if t.kind == "str" or t.val.lower() != val:
            raise LogsQLError(f"expected {val!r}, got {t.val!r} at offset {t.pos}")
        return t

    def err(self, msg: str) -> LogsQLError:
        t = self.peek()
        return LogsQLError(f"{msg} (at {t.val!r}, offset {t.pos})")

    def _at_pipe_end(self) -> bool:
        """End of the current pipe (lexer.isQueryPartTrailer analog):
        the next token starts another pipe, closes a subquery, or ends
        the query."""
        t = self.peek()
        return t.kind == "eof" or (t.kind != "str" and t.val in ("|", ")"))

    # --- filter grammar -------------------------------------------------
    def parse_filter_expr(self) -> FNode:
        node = self._filter_and()
        while self.at("or"):
            self.next()
            rhs = self._filter_and()
            if node.op == "or":
                node.kids.append(rhs)
            else:
                node = FNode("or", kids=[node, rhs])
        return node

    def _filter_and(self) -> FNode:
        kids = [self._filter_unary()]
        while True:
            t = self.peek()
            if t.kind == "eof" or (t.kind == "punct" and t.val in _FILTER_STOP):
                break
            if self.at("or"):
                break
            self.eat("and")
            t = self.peek()
            if t.kind == "eof" or (t.kind == "punct" and t.val in _FILTER_STOP):
                break
            kids.append(self._filter_unary())
        return kids[0] if len(kids) == 1 else FNode("and", kids=kids)

    def _filter_unary(self) -> FNode:
        if self.at("!", "-", "not"):
            self.next()
            return FNode("not", kids=[self._filter_unary()])
        if self.at("("):
            self.next()
            node = self.parse_filter_expr()
            self.expect(")")
            return node
        return self._filter_simple("")

    def _filter_simple(self, fld: str) -> FNode:
        t = self.peek()
        # quoted phrase (or quoted field name)
        if t.kind == "str":
            self.next()
            if fld == "" and self.at(":"):
                self.next()
                return self._filter_value(t.val)
            if self.peek().val == "*" and not self.peek().spaced:
                self.next()
                return FNode("prefix", fld, (t.val,))
            return FNode("phrase", fld, (t.val,))
        if t.val == "*" and t.kind == "punct":
            self.next()
            return FNode("star", fld)
        if t.kind == "word":
            low = t.val.lower()
            nxt = self.peek(1)
            if low in _FILTER_FUNCS and nxt.val in ("(", "[") and not nxt.spaced:
                self.next()
                return self._filter_func(fld, low)
            self.next()
            if fld == "" and self.at(":"):
                self.next()
                if t.val == "_time":
                    return self._filter_time()
                if t.val == "_stream":
                    return self._filter_stream()
                if t.val == "_stream_id":
                    return self._filter_stream_id()
                return self._filter_value(t.val)
            # bare word filter (maybe prefix)
            if self.peek().val == "*" and not self.peek().spaced:
                self.next()
                return FNode("prefix", fld, (t.val,))
            return FNode("word", fld, (t.val,))
        raise self.err("expected filter")

    def _filter_value(self, fld: str) -> FNode:
        """Everything after ``field:``."""
        t = self.peek()
        if t.kind == "punct":
            if t.val == "*":
                self.next()
                return FNode("star", fld)
            if t.val == "(":  # field:(or-expr) distributes the field
                self.next()
                node = self._field_group(fld)
                self.expect(")")
                return node
            if t.val in (">", ">=", "<", "<=", "=", "!="):
                self.next()
                if t.val == "=" and self.peek().kind == "str":
                    v = self.next()
                    if self.peek().val == "*" and not self.peek().spaced:
                        self.next()
                        return FNode("exact_prefix", fld, (v.val,))
                    return FNode("exact", fld, (v.val,))
                if t.val == "!=":
                    v = self.next()
                    return FNode("not", kids=[FNode("exact", fld, (v.val,))])
                v = self.next()
                sval = v.val
                if v.kind == "punct" and sval == "-":
                    sval = "-" + self.next().val
                if _DUR_RE.match(sval.lstrip("-")):
                    return FNode(
                        "cmp", fld, (t.val, parse_duration_ms(sval) / 1000.0)
                    ) if not _is_number(sval) else FNode(
                        "cmp", fld, (t.val, float(sval))
                    )
                if not _is_number(sval):
                    if t.val == "=":
                        return FNode("exact", fld, (sval,))
                    raise self.err(f"number expected after {t.val}")
                return FNode("cmp", fld, (t.val, float(sval)))
            if t.val == "~":
                self.next()
                v = self.next()
                return FNode("regexp", fld, (v.val,))
            if t.val == "!~":
                self.next()
                v = self.next()
                return FNode("not", kids=[FNode("regexp", fld, (v.val,))])
            if t.val == "-":  # negative number comparison value
                raise self.err("unexpected '-'")
        if t.kind == "str":
            self.next()
            if self.peek().val == "*" and not self.peek().spaced:
                self.next()
                return FNode("prefix", fld, (t.val,))
            return FNode("phrase", fld, (t.val,))
        if t.kind == "word":
            low = t.val.lower()
            nxt = self.peek(1)
            if low in _FILTER_FUNCS and nxt.val in ("(", "[") and not nxt.spaced:
                self.next()
                return self._filter_func(fld, low)
            self.next()
            if self.peek().val == "*" and not self.peek().spaced:
                self.next()
                return FNode("prefix", fld, (t.val,))
            return FNode("word", fld, (t.val,))
        raise self.err(f"expected value for field {fld!r}")

    def _field_group(self, fld: str) -> FNode:
        """``field:(v1 OR v2 ...)`` — each leaf gets the field."""
        node = self._group_and(fld)
        while self.at("or"):
            self.next()
            rhs = self._group_and(fld)
            if node.op == "or":
                node.kids.append(rhs)
            else:
                node = FNode("or", kids=[node, rhs])
        return node

    def _group_and(self, fld: str) -> FNode:
        kids = []
        while True:
            t = self.peek()
            if t.kind == "eof" or (t.kind == "punct" and t.val in (")", "|")):
                break
            if self.at("or"):
                break
            self.eat("and")
            if self.at("!", "-", "not"):
                self.next()
                kids.append(FNode("not", kids=[self._filter_value(fld)]))
            else:
                kids.append(self._filter_value(fld))
        if not kids:
            raise self.err("empty field group")
        return kids[0] if len(kids) == 1 else FNode("and", kids=kids)

    def _filter_func(self, fld: str, name: str) -> FNode:
        opener = self.next().val  # ( or [
        if name in ("range", "day_range", "week_range") or opener == "[":
            lo_inc = opener == "["
            args = self._func_args(stop=(")", "]"))
            closer = self.next().val
            hi_inc = closer == "]"
            if name == "range":
                lo = float(args[0]) if args[0].lower() != "-inf" else float("-inf")
                hi = float(args[1]) if args[1].lower() != "inf" else float("inf")
                return FNode("range", fld, (lo, hi, lo_inc, hi_inc))
            if name == "day_range":
                return FNode("day_range", fld, (args[0], args[1], lo_inc, hi_inc))
            if name == "week_range":
                return FNode("week_range", fld, (args[0], args[1], lo_inc, hi_inc))
        args = self._func_args(stop=(")",))
        self.expect(")")
        if name == "in":
            return FNode("in", fld, tuple(args))
        if name == "re":
            return FNode("regexp", fld, (args[0],))
        if name == "i":
            v = args[0]
            if v.endswith("*"):
                return FNode("any_case_prefix", fld, (v[:-1],))
            return FNode("any_case", fld, (v,))
        if name == "exact":
            v = args[0]
            if v.endswith("*"):
                return FNode("exact_prefix", fld, (v[:-1],))
            return FNode("exact", fld, (v,))
        if name == "seq":
            return FNode("seq", fld, tuple(args))
        if name == "contains_all":
            return FNode("contains_all", fld, tuple(args))
        if name == "contains_any":
            return FNode("contains_any", fld, tuple(args))
        if name == "json_array_contains_any":
            return FNode("json_array_contains_any", fld, tuple(args))
        if name in ("eq_field", "le_field", "lt_field"):
            return FNode(name, fld, (args[0],))
        if name == "len_range":
            return FNode(
                "len_range",
                fld,
                (
                    _int_arg(args[0], "len_range bound"),
                    _int_arg(args[1], "len_range bound"),
                ),
            )
        if name == "string_range":
            return FNode("string_range", fld, (args[0], args[1]))
        if name == "ipv4_range":
            if len(args) == 1:  # single IP
                return FNode("ipv4_range", fld, (args[0], args[0]))
            return FNode("ipv4_range", fld, (args[0], args[1]))
        if name == "ipv6_range":
            return FNode("ipv6_range", fld, (args[0], args[1]))
        if name == "value_type":
            return FNode("value_type", fld, (args[0],))
        if name == "pattern_match":
            return FNode("pattern_match", fld, (args[0],))
        raise self.err(f"unsupported filter function {name!r}")

    def _func_args(self, stop: tuple[str, ...]) -> list[str]:
        args: list[str] = []
        while not (self.peek().kind != "str" and self.peek().val in stop):
            t = self.next()
            if t.kind == "eof":
                raise self.err("unterminated argument list")
            if t.val == "," and t.kind == "punct":
                continue
            if t.kind == "punct" and t.val == "-" and self.peek().kind == "word":
                args.append("-" + self.next().val)
            elif (
                t.kind == "punct"
                and t.val == ":"
                and args
                and not t.spaced
            ):
                # rejoin colon-split compounds: HH:MM, RFC3339 timestamps
                args[-1] += ":" + self.next().val
            else:
                args.append(t.val)
        return args

    def _filter_time(self) -> FNode:
        """``_time:5m`` / ``_time:[a, b)`` / ``_time:>ts`` /
        ``_time:day_range[...]`` / ``_time:week_range[...]``."""
        t = self.peek()
        if t.kind == "word" and t.val.lower() in ("day_range", "week_range"):
            self.next()
            return self._filter_func("_time", t.val.lower())
        if t.val in ("[", "("):
            lo_inc = t.val == "["
            self.next()
            args = self._func_args(stop=(")", "]"))
            closer = self.next().val
            hi_inc = closer == "]"
            lo = _parse_time_str(args[0])
            hi = _parse_time_str(args[1])
            return FNode("time", "_time", (lo, hi, lo_inc, hi_inc))
        if t.val in (">", ">=", "<", "<="):
            self.next()
            sval = self._compound_word()
            ts = _parse_time_str(sval)
            if t.val in (">", ">="):
                return FNode("time", "_time", (ts, None, t.val == ">=", False))
            return FNode("time", "_time", (None, ts, False, t.val == "<="))
        sval = self._compound_word()
        if _DUR_RE.match(sval):
            return FNode("time", "_time", (parse_duration_ms(sval), None, True, True, "rel"))
        # bare timestamp selects the whole unit (e.g. _time:2024-01-01)
        ts = _parse_time_str(sval)
        unit = {4: "y", 7: "mo", 10: "d", 13: "h", 16: "m"}.get(len(sval.rstrip("Z")), "s")
        spans = {
            "y": timedelta(days=366),
            "mo": timedelta(days=31),
            "d": timedelta(days=1),
            "h": timedelta(hours=1),
            "m": timedelta(minutes=1),
            "s": timedelta(seconds=1),
        }
        if unit == "y":
            hi = datetime(ts.year + 1, 1, 1)
        elif unit == "mo":
            hi = datetime(ts.year + (ts.month == 12), ts.month % 12 + 1, 1)
        else:
            hi = ts + spans[unit]
        return FNode("time", "_time", (ts, hi, True, False))

    def _filter_stream_id(self) -> FNode:
        """``_stream_id:in(id1, id2)`` / ``_stream_id:id``
        (filter_stream_id.go) — ids are xxhash64 of the canonical
        _stream string (pipes.stream_id_filter)."""
        t = self.peek()
        if t.kind == "word" and t.val.lower() == "in" and self.peek(1).val == "(":
            self.next()
            self.expect("(")
            args = self._func_args(stop=(")",))
            self.expect(")")
            return FNode(
                "stream_id",
                "_stream",
                tuple(_int_arg(a, "stream_id") for a in args),
            )
        neg = self.eat("-")  # xxhash64 ids are signed longs
        v = _int_arg(self._compound_word(), "stream_id")
        return FNode("stream_id", "_stream", (-v if neg else v,))

    def _compound_word(self) -> str:
        """A word possibly containing lexer-split ':' (timestamps)."""
        out = self.next().val
        while (
            self.peek().kind == "punct"
            and self.peek().val == ":"
            and not self.peek().spaced
        ):
            self.next()
            out += ":" + self.next().val
        return out

    def _filter_stream(self) -> FNode:
        self.expect("{")
        conds: list[tuple[str, str, str]] = []
        while not self.at("}"):
            if self.peek().kind == "eof":
                raise self.err("unterminated _stream filter")
            name = self.next().val
            op = self.next().val
            # the lexer splits '=~' into '=', '~'
            if op == "=" and self.peek().val == "~" and not self.peek().spaced:
                self.next()
                op = "=~"
            if op not in ("=", "!=", "=~", "!~", "~"):
                raise self.err(f"bad _stream operator {op!r}")
            val = self.next().val
            conds.append((name, op, val))
            self.eat(",")
        self.expect("}")
        return FNode("stream", "_stream", tuple(conds))

    # --- pipes grammar --------------------------------------------------
    def parse_pipes(self) -> list[tuple]:
        out: list[tuple] = []
        while self.eat("|"):
            out.append(self._parse_pipe())
        t = self.peek()
        if t.kind != "eof" and t.val != ")":
            raise self.err("unexpected token after query")
        return out

    def _fields_list(self, parens: str = "optional") -> list[str]:
        fields: list[str] = []
        has_paren = self.eat("(")
        if parens == "required" and not has_paren:
            raise self.err("expected '('")
        while True:
            t = self.peek()
            if t.kind in ("word", "str"):
                self.next()
                fields.append(t.val)
            elif t.val == "*" and t.kind == "punct":
                self.next()
                fields.append("*")
            else:
                break
            if not self.eat(","):
                break
        if has_paren:
            self.expect(")")
        return fields

    def _order_list(self) -> list[tuple[str, bool]]:
        """(f1 desc, f2) — returns [(field, desc)]."""
        out: list[tuple[str, bool]] = []
        has_paren = self.eat("(")
        while True:
            t = self.peek()
            if t.kind not in ("word", "str"):
                break
            self.next()
            desc = False
            if self.at("desc"):
                self.next()
                desc = True
            elif self.at("asc"):
                self.next()
            out.append((t.val, desc))
            if not self.eat(","):
                break
        if has_paren:
            self.expect(")")
        return out

    def _parse_pipe(self) -> tuple:
        t = self.peek()
        name = t.val.lower() if t.kind == "word" else ""
        # stats pipe without the keyword
        if name in ("stats", "stats_remote", "stats_local") or (
            name in _STATS_FUNC_NAMES
            and self.peek(1).val == "("
            and not self.peek(1).spaced
        ) or (name == "by" and t.kind == "word"):
            if name.startswith("stats"):
                self.next()
            return self._pipe_stats()
        if name in _PIPE_PARSERS:
            self.next()
            return _PIPE_PARSERS[name](self)
        # bare filter pipe (e.g. `| foo:>10`)
        return ("filter", self.parse_filter_expr())

    def _pipe_stats(self) -> tuple:
        by: list[tuple] = []
        if self.at("by"):
            self.next()
            by = self._by_stats_fields()
        funcs: list[tuple] = []
        while True:
            funcs.append(self._stats_func())
            if not self.eat(","):
                break
        return ("stats", by, funcs)

    def _by_stats_fields(self) -> list[tuple]:
        """``by (f1, _time:1h offset 30m, size:100)``
        (pipe_stats.go:1643 parseByStatsFields): each field may carry a
        bucket size (duration for _time, number otherwise) + offset."""
        self.expect("(")
        out: list[tuple] = []
        while not self.eat(")"):
            if self.peek().kind == "eof":
                raise self.err("unterminated by(...)")
            name = self.next().val
            spec = None
            if self.peek().val == ":" and not self.peek().spaced:
                self.next()
                raw = self._compound_word()
                offset = 0.0
                kind = "num"
                if _DUR_RE.match(raw):
                    kind, size = "dur", parse_duration_ms(raw)
                elif _is_number(raw):
                    size = float(raw)
                else:
                    raise self.err(f"bad bucket size {raw!r}")
                if self.at("offset"):
                    self.next()
                    off_raw = self._compound_word()
                    offset = (
                        parse_duration_ms(off_raw)
                        if _DUR_RE.match(off_raw)
                        else float(off_raw)
                    )
                spec = (kind, size, offset)
            out.append((name, spec))
            self.eat(",")
        return out

    def _stats_func(self) -> tuple:
        t = self.next()
        fname = t.val.lower()
        if fname not in _STATS_FUNC_NAMES:
            raise self.err(f"unknown stats function {t.val!r}")
        self.expect("(")
        args = self._func_args(stop=(")",))
        self.expect(")")
        cond = None
        if self.at("if"):
            # `f(...) if (<filter>)` — per-func row condition
            # (pipe_stats.go pipeStatsFunc.iff)
            self.next()
            self.expect("(")
            cond = self.parse_filter_expr()
            self.expect(")")
        alias = None
        if self.at("as"):
            self.next()
            alias = self.next().val
        if alias is None:
            alias = f"{fname}({', '.join(args)})"
        return (fname, args, alias, cond)

    # individual pipes ---------------------------------------------------
    def _pipe_sort(self) -> tuple:
        by: list[tuple[str, bool]] = []
        if self.at("by"):
            self.next()
            by = self._order_list()
        elif self.peek().val == "(":
            by = self._order_list()
        if self.at("desc"):
            self.next()
            by = [(f, not d) for f, d in by]
        partition: list[str] = []
        if self.at("partition"):
            self.next()
            self.expect("by")
            partition = self._fields_list("required")
        offset = limit = None
        rank = None
        while True:
            if self.at("offset"):
                self.next()
                offset = self.int_next()
            elif self.at("limit"):
                self.next()
                limit = self.int_next()
            elif self.at("rank"):
                self.next()
                rank = "rank"
                if self.at("as"):
                    self.next()
                    rank = self.next().val
            else:
                break
        return ("sort", by, limit, offset or 0, partition, rank)

    def _pipe_first_last(self, desc: bool) -> tuple:
        n = 1
        if self.peek().kind == "word" and self.peek().val.isdigit():
            n = self.int_next()
        by: list[tuple[str, bool]] = []
        if self.at("by"):
            self.next()
            by = self._order_list()
        partition: list[str] = []
        if self.at("partition"):
            self.next()
            self.expect("by")
            partition = self._fields_list("required")
        if desc:
            by = [(f, not d) for f, d in by]
        return ("first", by, n, partition, desc)

    def _pipe_limit(self) -> tuple:
        return ("limit", self.int_next())

    def _pipe_offset(self) -> tuple:
        return ("offset", self.int_next())

    def _pipe_fields(self) -> tuple:
        return ("fields", self._fields_list())

    def _pipe_delete(self) -> tuple:
        return ("delete", self._fields_list())

    def _as_mapping(self) -> list[tuple[str, str]]:
        mapping: list[tuple[str, str]] = []
        while True:
            src = self.next().val
            if self.at("as"):
                self.next()
            elif self.eat(","):  # `copy a, b` is invalid; tolerate `a as b`
                raise self.err("expected 'as'")
            dst = self.next().val
            mapping.append((src, dst))
            if not self.eat(","):
                break
        return mapping

    def _pipe_copy(self) -> tuple:
        return ("copy", self._as_mapping())

    def _pipe_rename(self) -> tuple:
        return ("rename", self._as_mapping())

    def _pipe_filter(self) -> tuple:
        return ("filter", self.parse_filter_expr())

    def _pipe_math(self) -> tuple:
        entries: list[tuple] = []
        while True:
            expr = self._math_expr()
            self.expect("as")
            dst = self.next().val
            entries.append((expr, dst))
            if not self.eat(","):
                break
        return ("math", entries)

    # math expression — precedence climbing
    _MATH_PREC = {"+": 1, "-": 1, "*": 2, "/": 2, "%": 2, "^": 3,
                  "&": 0, "or": 0, "xor": 0, "default": 0}

    def _math_expr(self, min_prec: int = 0):
        lhs = self._math_unary()
        while True:
            t = self.peek()
            op = t.val.lower() if t.kind in ("punct", "word") else ""
            if op not in self._MATH_PREC or self._MATH_PREC[op] < min_prec:
                return lhs
            if op == "as":
                return lhs
            self.next()
            rhs = self._math_expr(self._MATH_PREC[op] + (0 if op == "^" else 1))
            lhs = ("bin", op, lhs, rhs)

    _MATH_FUNCS = {"abs", "exp", "ln", "log2", "round", "ceil", "floor",
                   "min", "max", "pow", "trunc"}

    def _math_unary(self):
        t = self.peek()
        if t.val == "-" and t.kind == "punct":
            self.next()
            return ("neg", self._math_unary())
        if t.val == "(" and t.kind == "punct":
            self.next()
            e = self._math_expr()
            self.expect(")")
            return e
        if t.kind == "word" and t.val.lower() in self._MATH_FUNCS and \
                self.peek(1).val == "(" and not self.peek(1).spaced:
            self.next()
            self.expect("(")
            args = [self._math_expr()]
            while self.eat(","):
                args.append(self._math_expr())
            self.expect(")")
            return ("fn", t.val.lower(), args)
        tok = self.next()
        if tok.kind == "str":
            return ("field", tok.val)
        if _is_number(tok.val):
            return ("num", float(tok.val))
        if tok.kind == "word":
            return ("field", tok.val)
        raise self.err("bad math expression")

    def _pipe_format(self) -> tuple:
        fmt = self.next().val
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return ("format", fmt, dst)

    def _src_as(self, default_src: str = "_msg") -> tuple[str, Optional[str]]:
        src, dst = default_src, None
        if self.at("from"):
            self.next()
            src = self.next().val
        if self.at("as"):
            self.next()
            dst = self.next().val
        return src, dst

    def _pipe_extract(self) -> tuple:
        pattern = self.next().val
        src, _ = self._src_as()
        return ("extract", src, pattern)

    def _pipe_extract_regexp(self) -> tuple:
        pattern = self.next().val
        src, _ = self._src_as()
        return ("extract_regexp", src, pattern)

    def _pipe_unpack_json(self) -> tuple:
        src, fields, prefix = "_msg", [], ""
        if self.at("from"):
            self.next()
            src = self.next().val
        if self.at("fields"):
            self.next()
            fields = self._fields_list("required")
        if self.at("result_prefix"):
            self.next()
            prefix = self.next().val
        return ("unpack_json", src, fields, prefix)

    def _pipe_unpack_logfmt(self) -> tuple:
        src, fields = "_msg", []
        if self.at("from"):
            self.next()
            src = self.next().val
        if self.at("fields"):
            self.next()
            fields = self._fields_list("required")
        return ("unpack_logfmt", src, fields)

    def _pipe_unpack_syslog(self) -> tuple:
        src, prefix = "_msg", ""
        if self.at("from"):
            self.next()
            src = self.next().val
        if self.at("result_prefix"):
            self.next()
            prefix = self.next().val
        return ("unpack_syslog", src, prefix)

    def _pipe_unpack_words(self) -> tuple:
        src, dst = self._src_as()
        drop_dup = False
        if self.at("drop_duplicates"):
            self.next()
            drop_dup = True
        return ("unpack_words", src, dst or src, drop_dup)

    def _pipe_uniq(self) -> tuple:
        fields: list[str] = []
        if self.at("by"):
            self.next()
            fields = self._fields_list("required")
        with_hits = False
        if self.at("with"):
            self.next()
            self.expect("hits")
            with_hits = True
        limit = None
        if self.at("limit"):
            self.next()
            limit = self.int_next()
        return ("uniq", fields, with_hits, limit)

    def _pipe_top(self) -> tuple:
        k = 10
        if self.peek().kind == "word" and self.peek().val.isdigit():
            k = self.int_next()
        fields: list[str] = []
        if self.at("by"):
            self.next()
            fields = self._fields_list("required")
        hits_name = "hits"
        if self.at("hits"):
            self.next()
            self.expect("as")
            hits_name = self.next().val
        return ("top", fields, k, hits_name)

    def _pipe_len(self) -> tuple:
        self.expect("(")
        fld = self.next().val
        self.expect(")")
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return ("len", fld, dst)

    def _pipe_hash(self) -> tuple:
        self.expect("(")
        fld = self.next().val
        self.expect(")")
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return ("hash", fld, dst)

    def _pipe_unroll(self) -> tuple:
        if self.at("by"):
            self.next()
        fields = self._fields_list()
        return ("unroll", fields[0])

    def _pipe_replace(self, regex: bool) -> tuple:
        self.expect("(")
        old = self.next().val
        self.expect(",")
        new = self.next().val
        self.expect(")")
        fld = "_msg"
        if self.at("at"):
            self.next()
            fld = self.next().val
        limit = 0
        if self.at("limit"):
            self.next()
            limit = self.int_next()
        return ("replace", fld, old, new, regex, limit)

    def _pipe_split(self) -> tuple:
        if self.eat("("):
            sep = self.next().val
            self.expect(")")
        else:
            sep = self.next().val
        src, dst = self._src_as()
        return ("split", src, sep, dst)

    def _pipe_sample(self) -> tuple:
        return ("sample", self.int_next())

    def _pipe_time_add(self) -> tuple:
        neg = self.eat("-")
        off = self.next().val
        ms = parse_duration_ms(off)
        if neg:
            ms = -ms
        fld = "_time"
        if self.at("at"):
            self.next()
            fld = self.next().val
        return ("time_add", fld, ms)

    def _pipe_field_values(self) -> tuple:
        fld = self.next().val
        limit = 0
        if self.at("limit"):
            self.next()
            limit = self.int_next()
        return ("field_values", fld, limit)

    def _pipe_facets(self) -> tuple:
        k = 10
        if self.peek().kind == "word" and self.peek().val.isdigit():
            k = self.int_next()
        return ("facets", k)

    def _pipe_collapse_nums(self) -> tuple:
        fld = "_msg"
        if self.at("at"):
            self.next()
            fld = self.next().val
        if self.at("prettify"):
            self.next()
        return ("collapse_nums", fld)

    def _pipe_decolorize(self) -> tuple:
        fld = "_msg"
        t = self.peek()
        if t.kind in ("word", "str"):
            self.next()
            fld = t.val
        return ("decolorize", fld)

    def _pipe_pack(self, kind: str) -> tuple:
        fields: list[str] = []
        if self.at("fields"):
            self.next()
            fields = self._fields_list("required")
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return (kind, fields, dst)

    def _pipe_union(self) -> tuple:
        self.expect("(")
        sub = self._parse_subquery()
        self.expect(")")
        return ("union", sub)

    def _pipe_join(self) -> tuple:
        self.expect("by")
        fields = self._fields_list("required")
        self.expect("(")
        sub = self._parse_subquery()
        self.expect(")")
        how = "left"
        if self.at("inner"):
            self.next()
            how = "inner"
        prefix = ""
        if self.at("prefix"):
            self.next()
            prefix = self.next().val
        return ("join", fields, sub, how, prefix)

    def _parse_subquery(self) -> "Query":
        flt = self.parse_filter_expr()
        ppipes: list[tuple] = []
        while self.eat("|"):
            ppipes.append(self._parse_pipe())
        return Query(flt, ppipes)

    def _pipe_drop_empty_fields(self) -> tuple:
        return ("drop_empty_fields",)

    def _pipe_field_names(self) -> tuple:
        return ("field_names",)

    def _pipe_blocks_count(self) -> tuple:
        return ("blocks_count",)

    def _pipe_block_stats(self) -> tuple:
        return ("block_stats",)

    def _pipe_json_array_len(self) -> tuple:
        self.expect("(")
        fld = self.next().val
        self.expect(")")
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return ("json_array_len", fld, dst)

    def _pipe_coalesce(self) -> tuple:
        """``coalesce(f1, f2, ...) [default d] [as dst]``
        (pipe_coalesce.go:160-205)."""
        self.expect("(")
        srcs: list[str] = []
        while not self.at(")"):
            srcs.append(self.next().val)
            if not self.eat(","):
                break
        self.expect(")")
        if not srcs:
            raise self.err("coalesce requires at least one field name")
        default = None
        if self.at("default"):
            self.next()
            default = self.next().val
        dst = "_msg"
        if self.at("as"):
            self.next()
            dst = self.next().val
        return ("coalesce", srcs, dst, default)

    def _pipe_json_array_concat(self) -> tuple:
        """``json_array_concat [delimiter] [from f] [as r]``
        (pipe_json_array_concat.go:153-198)."""
        delimiter = ""
        if not self._at_pipe_end() and not self.at("from") and not self.at("as"):
            delimiter = self.next().val
        src = "_msg"
        if not self._at_pipe_end() and not self.at("as"):
            if self.at("from"):
                self.next()
            src = self.next().val
        dst = src
        if not self._at_pipe_end():
            if self.at("as"):
                self.next()
            dst = self.next().val
        return ("json_array_concat", src, dst, delimiter)

    def _pipe_running_stats(self, total: bool) -> tuple:
        by: list[str] = []
        if self.at("by"):
            self.next()
            by = self._fields_list("required")
        funcs: list[tuple] = []
        while True:
            funcs.append(self._stats_func())
            if not self.eat(","):
                break
        return ("running_stats", by, funcs, total)

    def _pipe_stream_context(self) -> tuple:
        before = after = 0
        while True:
            if self.at("before"):
                self.next()
                before = self.int_next()
            elif self.at("after"):
                self.next()
                after = self.int_next()
            elif self.at("time_window"):
                self.next()
                self.next()  # duration accepted, row-window semantics used
            else:
                break
        return ("stream_context", before, after)

    def _pipe_set_stream_fields(self) -> tuple:
        return ("set_stream_fields", self._fields_list("required"))

    def _pipe_generate_sequence(self) -> tuple:
        return ("generate_sequence", self.int_next())


_STATS_FUNC_NAMES = {
    "count", "count_empty", "count_uniq", "count_uniq_hash", "sum", "min",
    "max", "avg", "median", "quantile", "stddev", "uniq_values", "values",
    "any", "row_any", "row_min", "row_max", "sum_len", "rate", "rate_sum",
    "histogram", "json_values", "field_min", "field_max",
}

_PIPE_PARSERS: dict[str, Callable[[Parser], tuple]] = {
    "sort": Parser._pipe_sort,
    "order": Parser._pipe_sort,
    "first": lambda p: p._pipe_first_last(False),
    "last": lambda p: p._pipe_first_last(True),
    "limit": Parser._pipe_limit,
    "head": Parser._pipe_limit,
    "offset": Parser._pipe_offset,
    "skip": Parser._pipe_offset,
    "fields": Parser._pipe_fields,
    "keep": Parser._pipe_fields,
    "delete": Parser._pipe_delete,
    "del": Parser._pipe_delete,
    "drop": Parser._pipe_delete,
    "rm": Parser._pipe_delete,
    "copy": Parser._pipe_copy,
    "cp": Parser._pipe_copy,
    "rename": Parser._pipe_rename,
    "mv": Parser._pipe_rename,
    "filter": Parser._pipe_filter,
    "where": Parser._pipe_filter,
    "math": Parser._pipe_math,
    "eval": Parser._pipe_math,
    "format": Parser._pipe_format,
    "extract": Parser._pipe_extract,
    "extract_regexp": Parser._pipe_extract_regexp,
    "unpack_json": Parser._pipe_unpack_json,
    "unpack_logfmt": Parser._pipe_unpack_logfmt,
    "unpack_syslog": Parser._pipe_unpack_syslog,
    "unpack_words": Parser._pipe_unpack_words,
    "uniq": Parser._pipe_uniq,
    "top": Parser._pipe_top,
    "len": Parser._pipe_len,
    "hash": Parser._pipe_hash,
    "unroll": Parser._pipe_unroll,
    "replace": lambda p: p._pipe_replace(False),
    "replace_regexp": lambda p: p._pipe_replace(True),
    "split": Parser._pipe_split,
    "sample": Parser._pipe_sample,
    "time_add": Parser._pipe_time_add,
    "field_values": Parser._pipe_field_values,
    "facets": Parser._pipe_facets,
    "collapse_nums": Parser._pipe_collapse_nums,
    "decolorize": Parser._pipe_decolorize,
    "pack_json": lambda p: p._pipe_pack("pack_json"),
    "pack_logfmt": lambda p: p._pipe_pack("pack_logfmt"),
    "union": Parser._pipe_union,
    "join": Parser._pipe_join,
    "drop_empty_fields": Parser._pipe_drop_empty_fields,
    "field_names": Parser._pipe_field_names,
    "blocks_count": Parser._pipe_blocks_count,
    "block_stats": Parser._pipe_block_stats,
    "json_array_len": Parser._pipe_json_array_len,
    "json_array_concat": Parser._pipe_json_array_concat,
    "coalesce": Parser._pipe_coalesce,
    "running_stats": lambda p: p._pipe_running_stats(False),
    "total_stats": lambda p: p._pipe_running_stats(True),
    "stream_context": Parser._pipe_stream_context,
    "set_stream_fields": Parser._pipe_set_stream_fields,
    "generate_sequence": Parser._pipe_generate_sequence,
}


@dataclass
class Query:
    filter: FNode
    pipes: list[tuple]
    options: dict = _dfield(default_factory=dict)


def _parse_options(p: Parser) -> dict:
    """Leading ``options(key=value, ...)`` (parser.go:2010-2100).
    Execution-tuning keys (concurrency, parallel_readers,
    allow_partial_response) are recorded but have no effect — Spark's
    scheduler owns parallelism; ``global_filter=(...)`` and
    ``time_offset`` are honored."""
    opts: dict = {}
    if not (
        p.peek().kind == "word"
        and p.peek().val.lower() == "options"
        and p.peek(1).val == "("
    ):
        return opts
    p.next()
    p.expect("(")
    while not p.eat(")"):
        if p.peek().kind == "eof":
            raise p.err("unterminated options(...)")
        key = p.next().val.lower()
        p.expect("=")
        if key == "global_filter":
            p.expect("(")
            opts[key] = p.parse_filter_expr()
            p.expect(")")
        elif key == "time_offset":
            neg = p.eat("-")
            v = parse_duration_ms(p._compound_word())
            opts[key] = -v if neg else v
        else:
            opts[key] = p._compound_word()
        p.eat(",")
    return opts


def parse_query(text: str) -> Query:
    p = Parser(tokenize(text))
    opts = _parse_options(p)
    flt = p.parse_filter_expr()
    ppipes = p.parse_pipes()
    return Query(flt, ppipes, opts)


# ------------------------------------------------------------------ compiler
@dataclass
class _Cfg:
    now_ms: Optional[int] = None
    msg_field: str = "_msg"
    time_field: str = "_time"
    # filled while compiling the filter: [start, end] datetimes if a
    # _time filter is present (used by rate()/rate_sum())
    time_range: Optional[tuple] = None


def _num_or_str(col: Column, value: str):
    if _is_number(value):
        return col.cast("double") == float(value)
    return col.cast("string") == value


def compile_filter(node: FNode, df: DataFrame, cfg: _Cfg) -> Column:
    def col(fld: str) -> Column:
        name = fld or cfg.msg_field
        if name not in df.columns:
            raise LogsQLError(f"unknown field {name!r}")
        return F.col(name)

    def scol(fld: str) -> Column:
        return col(fld).cast("string")

    op = node.op
    if op == "and":
        return pipes.and_filter(*[compile_filter(k, df, cfg) for k in node.kids])
    if op == "or":
        return pipes.or_filter(*[compile_filter(k, df, cfg) for k in node.kids])
    if op == "not":
        return pipes.not_filter(compile_filter(node.kids[0], df, cfg))
    if op == "star":
        if node.fld:
            c = col(node.fld)
            return c.isNotNull() & (c.cast("string") != "")
        return F.lit(True)
    if op == "word":
        return pipes.word_filter(scol(node.fld), node.args[0])
    if op == "phrase":
        return pipes.phrase_filter(scol(node.fld), node.args[0])
    if op == "prefix":
        # word-prefix: token starting with the prefix (filter_prefix.go)
        return scol(node.fld).rlike(
            rf"(?:^|\W){_re.escape(node.args[0])}"
        )
    if op == "exact":
        return pipes.exact_filter(scol(node.fld), node.args[0])
    if op == "exact_prefix":
        return pipes.exact_prefix_filter(scol(node.fld), node.args[0])
    if op == "regexp":
        return pipes.regexp_filter(scol(node.fld), node.args[0])
    if op == "any_case":
        return pipes.any_case_phrase_filter(scol(node.fld), node.args[0])
    if op == "any_case_prefix":
        return pipes.any_case_prefix_filter(scol(node.fld), node.args[0])
    if op == "in":
        vals = list(node.args)
        if vals and all(_is_number(v) for v in vals):
            return col(node.fld).cast("double").isin([float(v) for v in vals])
        return scol(node.fld).isin(vals)
    if op == "seq":
        return pipes.sequence_filter(scol(node.fld), list(node.args))
    if op == "cmp":
        sym, v = node.args
        c = col(node.fld).cast("double")
        return {
            ">": c > v, ">=": c >= v, "<": c < v, "<=": c <= v, "=": c == v,
        }[sym]
    if op == "range":
        lo, hi, lo_inc, hi_inc = node.args
        c = col(node.fld).cast("double")
        lo_c = (c >= lo) if lo_inc else (c > lo)
        hi_c = (c <= hi) if hi_inc else (c < hi)
        return lo_c & hi_c
    if op == "len_range":
        return pipes.len_range_filter(scol(node.fld), node.args[0], node.args[1])
    if op == "string_range":
        return pipes.string_range_filter(scol(node.fld), node.args[0], node.args[1])
    if op == "ipv4_range":
        return pipes.ipv4_range_filter(scol(node.fld), node.args[0], node.args[1])
    if op == "ipv6_range":
        return pipes.ipv6_range_filter(scol(node.fld), node.args[0], node.args[1])
    if op == "value_type":
        return pipes.value_type_filter(scol(node.fld), node.args[0])
    if op == "contains_all":
        return pipes.contains_all_filter(scol(node.fld), list(node.args))
    if op == "contains_any":
        return pipes.contains_any_filter(scol(node.fld), list(node.args))
    if op == "json_array_contains_any":
        return pipes.json_array_contains_any_filter(scol(node.fld), list(node.args))
    if op == "eq_field":
        return pipes.eq_field_filter(col(node.fld), col(node.args[0]))
    if op == "le_field":
        return pipes.le_field_filter(col(node.fld), col(node.args[0]))
    if op == "lt_field":
        return col(node.fld) < col(node.args[0])
    if op == "pattern_match":
        return pipes.pattern_match_filter(scol(node.fld), node.args[0])
    if op == "day_range":
        lo, hi, lo_inc, hi_inc = node.args

        def tod_ms(s: str) -> int:
            hh, mm = s.split(":")
            return (int(hh) * 60 + int(mm)) * 60_000

        return pipes.day_range_filter(
            col(cfg.time_field),
            tod_ms(lo),
            tod_ms(hi),
            include_start=lo_inc,
            include_end=hi_inc,
        )
    if op == "week_range":
        lo, hi, lo_inc, hi_inc = node.args
        days = {
            "sun": 0, "sunday": 0, "mon": 1, "monday": 1, "tue": 2,
            "tuesday": 2, "wed": 3, "wednesday": 3, "thu": 4, "thursday": 4,
            "fri": 5, "friday": 5, "sat": 6, "saturday": 6,
        }
        return pipes.week_range_filter(
            col(cfg.time_field),
            days[lo.lower()],
            days[hi.lower()],
            include_start=lo_inc,
            include_end=hi_inc,
        )
    if op == "time":
        c = col(cfg.time_field)
        if len(node.args) == 5 and node.args[4] == "rel":
            if cfg.now_ms is None:
                raise LogsQLError(
                    "relative _time filter needs cfg.now_ms (pass now_ms=...)"
                )
            dur_ms = node.args[0]
            end = datetime.utcfromtimestamp(cfg.now_ms / 1000.0)
            start = end - timedelta(milliseconds=dur_ms)
            cfg.time_range = (start, end)
            return (c >= F.lit(start)) & (c <= F.lit(end))
        lo, hi, lo_inc, hi_inc = node.args
        conds = []
        if lo is not None:
            conds.append(c >= F.lit(lo) if lo_inc else c > F.lit(lo))
        if hi is not None:
            conds.append(c <= F.lit(hi) if hi_inc else c < F.lit(hi))
        if lo is not None and hi is not None:
            cfg.time_range = (lo, hi)
        if not conds:
            return F.lit(True)
        out = conds[0]
        for x in conds[1:]:
            out = out & x
        return out
    if op == "stream_id":
        if "_stream" not in df.columns:
            raise LogsQLError(
                "_stream_id filter needs a _stream column "
                "(set_stream_fields or a stream-partitioned source)"
            )
        return pipes.stream_id_filter(F.col("_stream"), list(node.args))
    if op == "stream":
        conds = []
        for name, sym, val in node.args:
            if name not in df.columns:
                raise LogsQLError(f"unknown stream field {name!r}")
            c = F.col(name).cast("string")
            if sym == "=":
                conds.append(c == val)
            elif sym == "!=":
                conds.append(c != val)
            elif sym in ("=~", "~"):
                conds.append(c.rlike(val))
            elif sym == "!~":
                conds.append(~c.rlike(val))
        return pipes.and_filter(*conds) if conds else F.lit(True)
    raise LogsQLError(f"unsupported filter op {op!r}")


def _compile_math_expr(expr, df: DataFrame) -> Column:
    kind = expr[0]
    if kind == "num":
        return F.lit(expr[1])
    if kind == "field":
        if expr[1] not in df.columns:
            raise LogsQLError(f"unknown field {expr[1]!r} in math expr")
        return F.col(expr[1]).cast("double")
    if kind == "neg":
        return -_compile_math_expr(expr[1], df)
    if kind == "bin":
        _, op, l, r = expr
        lc, rc = _compile_math_expr(l, df), _compile_math_expr(r, df)
        if op == "+":
            return lc + rc
        if op == "-":
            return lc - rc
        if op == "*":
            return lc * rc
        if op == "/":
            return lc / rc
        if op == "%":
            return lc % rc
        if op == "^":
            return F.pow(lc, rc)
        if op == "default":
            return F.coalesce(lc, rc)
        raise LogsQLError(f"unsupported math op {op!r}")
    if kind == "fn":
        _, name, args = expr
        cols = [_compile_math_expr(a, df) for a in args]
        if name == "abs":
            return F.abs(cols[0])
        if name == "exp":
            return F.exp(cols[0])
        if name == "ln":
            return F.log(cols[0])
        if name == "log2":
            return F.log2(cols[0])
        if name == "ceil":
            return F.ceil(cols[0]).cast("double")
        if name == "floor":
            return F.floor(cols[0]).cast("double")
        if name == "trunc":
            return cols[0].cast("long").cast("double")
        if name == "round":
            if len(cols) == 1:
                return F.round(cols[0])
            # round to nearest multiple
            return F.round(cols[0] / cols[1]) * cols[1]
        if name == "min":
            return F.least(*cols)
        if name == "max":
            return F.greatest(*cols)
        if name == "pow":
            return F.pow(cols[0], cols[1])
        raise LogsQLError(f"unsupported math function {name!r}")
    raise LogsQLError(f"bad math expr node {expr!r}")


def _stats_agg_column(
    fname: str, args: list[str], df: DataFrame, cfg: _Cfg, mask: Column | None = None
):
    def col(a: str) -> Column:
        if a not in df.columns:
            raise LogsQLError(f"unknown field {a!r} in stats func")
        if mask is not None:
            return F.when(mask, F.col(a))
        return F.col(a)

    def ncol(a: str) -> Column:
        return col(a).cast("double")

    if fname == "count":
        if not args or args == ["*"]:
            if mask is not None:
                return F.count_if(mask)
            return F.count(F.lit(1))
        return F.count(col(args[0]))
    if fname == "count_empty":
        c = F.col(args[0])
        empty = c.isNull() | (c.cast("string") == "")
        return F.count_if(empty if mask is None else (mask & empty))
    if fname == "count_uniq":
        return F.count_distinct(*[col(a) for a in args])
    if fname == "count_uniq_hash":
        return F.approx_count_distinct(col(args[0]))
    if fname == "sum":
        return F.sum(ncol(args[0]))
    if fname == "min":
        return F.min(ncol(args[0]))
    if fname == "max":
        return F.max(ncol(args[0]))
    if fname in ("field_min", "field_max"):
        agg = F.min if fname == "field_min" else F.max
        return agg(col(args[0]).cast("string"))
    if fname == "avg":
        return F.avg(ncol(args[0]))
    if fname == "median":
        return F.percentile(ncol(args[0]), F.lit(0.5))
    if fname == "quantile":
        return pipes.quantile(ncol(args[1]), float(args[0]))
    if fname == "stddev":
        return F.stddev_pop(ncol(args[0]))
    if fname == "uniq_values":
        return F.array_sort(F.collect_set(col(args[0]).cast("string")))
    if fname == "values":
        return F.collect_list(col(args[0]).cast("string"))
    if fname in ("any", "row_any"):
        return pipes.row_any(*args) if fname == "row_any" else F.first(col(args[0]))
    if fname == "row_min":
        return pipes.row_min(args[0], *args[1:])
    if fname == "row_max":
        return pipes.row_max(args[0], *args[1:])
    if fname == "sum_len":
        return F.sum(F.length(col(args[0]).cast("string")))
    if fname in ("rate", "rate_sum"):
        if cfg.time_range is None:
            raise LogsQLError(f"{fname}() needs an explicit _time range filter")
        lo, hi = cfg.time_range
        step_s = (hi - lo).total_seconds()
        if fname == "rate":
            if mask is not None:
                return F.count_if(mask) / F.lit(float(step_s))
            return pipes.rate_stats(step_s)(F.lit(1))
        return pipes.rate_sum_stats(step_s)(ncol(args[0]))
    if fname == "json_values":
        return pipes.json_values(*args)
    raise LogsQLError(f"stats function {fname!r} is not aggregable here")


def _apply_stats(df: DataFrame, by: list, funcs: list[tuple], cfg: _Cfg) -> DataFrame:
    # normalize: plain strings (internal callers) or (name, bucket-spec)
    norm = [(b, None) if isinstance(b, str) else b for b in by]
    names = [n for n, _ in norm]
    for name, spec in norm:
        if spec is None:
            continue
        kind, size, offset = spec
        if kind == "dur":
            # time bucket: floor((t - offset) / size) * size + offset
            ms = F.unix_millis(F.col(name).cast("timestamp")) - F.lit(
                int(offset)
            )
            bucketed = F.timestamp_millis(
                (F.floor(ms / int(size)) * int(size)).cast("long")
                + F.lit(int(offset))
            )
            df = df.withColumn(name, bucketed)
            if name == cfg.time_field:
                # rate()/rate_sum() inside time-bucketed stats use the
                # bucket as the step (pipe_stats.go:420-421)
                from datetime import timedelta as _td

                cfg.time_range = (datetime(1970, 1, 1),
                                  datetime(1970, 1, 1) + _td(milliseconds=size))
        else:
            c = F.col(name).cast("double") - offset
            df = df.withColumn(
                name, F.floor(c / size) * F.lit(size) + F.lit(offset)
            )
    if len(funcs) == 1 and funcs[0][0] == "histogram":
        fname, args, alias, _cond = funcs[0]
        return pipes.histogram_stats(df, names, args[0], alias=alias)
    aggs = {}
    for f, a, alias, cond in funcs:
        mask = compile_filter(cond, df, cfg) if cond is not None else None
        aggs[alias] = _stats_agg_column(f, a, df, cfg, mask=mask)
    return pipes.stats(df, names, aggs)


def _apply_pipe(df: DataFrame, p: tuple, cfg: _Cfg, base_df: DataFrame) -> DataFrame:
    name = p[0]
    if name == "stats":
        return _apply_stats(df, p[1], p[2], cfg)
    if name == "filter":
        return pipes.filter_pipe(df, compile_filter(p[1], df, cfg))
    if name == "sort":
        _, by, limit, offset, partition, rank = p
        if partition:
            cols = [F.col(c).desc() if d else F.col(c).asc() for c, d in by]
            w = Window.partitionBy(*partition).orderBy(*cols)
            out = df.withColumn("__rn", F.row_number().over(w))
            if limit is not None:
                out = out.filter(F.col("__rn") > offset) if offset else out
                out = out.filter(F.col("__rn") <= offset + limit)
            if rank:
                return out.withColumnRenamed("__rn", rank)
            return out.drop("__rn")
        if offset:
            return pipes.limit_offset(
                df, limit if limit is not None else (1 << 31), offset, order=by
            )
        out = pipes.sort(df, by, limit)
        if rank:
            w = Window.orderBy(
                *[F.col(c).desc() if d else F.col(c).asc() for c, d in by]
            )
            out = out.withColumn(rank, F.row_number().over(w))
        return out
    if name == "first":
        _, by, n, partition, desc = p
        order = by or [(cfg.time_field, desc)]
        if partition:
            cols = [F.col(c).desc() if d else F.col(c).asc() for c, d in order]
            w = Window.partitionBy(*partition).orderBy(*cols)
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= n)
                .drop("__rn")
            )
        return pipes.sort(df, order, n)
    if name == "limit":
        return df.limit(p[1])
    if name == "offset":
        return pipes.limit_offset(df, 1 << 31, p[1])
    if name == "fields":
        return pipes.fields_pipe(df, p[1])
    if name == "delete":
        return pipes.delete_fields(df, p[1])
    if name == "copy":
        return pipes.copy_fields(df, p[1])
    if name == "rename":
        return pipes.rename_fields(df, p[1])
    if name == "math":
        out = df
        for expr, dst in p[1]:
            out = out.withColumn(dst, _compile_math_expr(expr, out))
        return out
    if name == "format":
        return pipes.format_pipe(df, p[1], p[2])
    if name == "extract":
        return pipes.extract(df, p[1], p[2])
    if name == "extract_regexp":
        pat = p[2]
        groups = {
            m.group(1): i + 1
            for i, m in enumerate(_re.finditer(r"\(\?P?<([A-Za-z_][A-Za-z0-9_]*)>", pat))
        }
        # named groups → positional for regexp_extract
        clean = _re.sub(r"\(\?P?<[A-Za-z_][A-Za-z0-9_]*>", "(", pat)
        return pipes.extract_regexp(df, p[1], clean, groups)
    if name == "unpack_json":
        _, src, fields, prefix = p
        if not fields:
            raise LogsQLError(
                "unpack_json requires an explicit fields (...) list here "
                "(schema-on-read inference is not lazy-plan friendly)"
            )
        return pipes.unpack_json(df, src, fields, prefix)
    if name == "unpack_logfmt":
        _, src, fields = p
        if not fields:
            raise LogsQLError("unpack_logfmt requires fields (...) here")
        return pipes.unpack_logfmt(df, src, fields)
    if name == "unpack_syslog":
        return pipes.unpack_syslog(df, p[1], p[2])
    if name == "unpack_words":
        _, src, dst, drop_dup = p
        return pipes.unpack_words(df, src, dst, drop_duplicates=drop_dup)
    if name == "uniq":
        _, fields, with_hits, limit = p
        if with_hits:
            out = df.groupBy(*fields).agg(F.count(F.lit(1)).alias("hits"))
        else:
            out = pipes.uniq(df, fields)
        return out.limit(limit) if limit else out
    if name == "top":
        _, fields, k, hits_name = p
        out = pipes.top(df, fields, k)
        if hits_name != "hits":
            out = out.withColumnRenamed("hits", hits_name)
        return out
    if name == "len":
        return pipes.len_pipe(df, p[1], p[2])
    if name == "hash":
        return pipes.hash_pipe(df, p[1], p[2])
    if name == "unroll":
        fld = p[1]
        dtype = dict(df.dtypes).get(fld, "string")
        if dtype.startswith("array"):
            return pipes.unroll(df, fld)
        return df.withColumn(
            fld, F.explode(F.from_json(F.col(fld), "array<string>"))
        )
    if name == "replace":
        _, fld, old, new, regex, limit = p
        if regex:
            return pipes.replace_regexp_pipe(df, fld, old, new, limit=limit)
        return pipes.replace_pipe(df, fld, old, new)
    if name == "split":
        _, src, sep, dst = p
        return pipes.split(df, src, sep, dst)
    if name == "sample":
        return pipes.sample(df, 1.0 / p[1])
    if name == "time_add":
        return pipes.time_add(df, p[1], int(p[2]))
    if name == "field_values":
        return pipes.field_values(df, p[1], p[2])
    if name == "facets":
        fields = [c for c in df.columns if c not in (cfg.time_field,)]
        return pipes.facets(df, fields, p[1])
    if name == "collapse_nums":
        return pipes.collapse_nums(df, p[1])
    if name == "decolorize":
        return pipes.decolorize(df, p[1])
    if name == "pack_json":
        _, fields, dst = p
        return pipes.pack_json(df, fields or df.columns, dst)
    if name == "pack_logfmt":
        _, fields, dst = p
        return pipes.pack_logfmt(df, fields or df.columns, dst)
    if name == "union":
        sub_df = _compile(p[1], base_df, cfg)
        return pipes.union_pipe(df, sub_df)
    if name == "join":
        _, fields, sub, how, prefix = p
        sub_df = _compile(sub, base_df, cfg)
        return pipes.join(df, sub_df, fields, how=how, prefix=prefix)
    if name == "drop_empty_fields":
        return pipes.drop_empty_fields(df)
    if name == "field_names":
        return pipes.field_names(df)
    if name == "blocks_count":
        return pipes.blocks_count(df)
    if name == "block_stats":
        return pipes.block_stats(df)
    if name == "json_array_len":
        return pipes.json_array_len(df, p[1], p[2])
    if name == "json_array_concat":
        return pipes.json_array_concat(df, p[1], p[2], p[3])
    if name == "coalesce":
        return pipes.coalesce_pipe(df, p[1], p[2], p[3])
    if name == "running_stats":
        _, by, funcs, total = p
        aggs = {}
        for f, a, alias, cond in funcs:
            mask = compile_filter(cond, df, cfg) if cond is not None else None
            aggs[alias] = _stats_agg_column(f, a, df, cfg, mask=mask)
        if cfg.time_field in df.columns:
            order = [(cfg.time_field, False)]
        else:
            order = [(c, False) for c in df.columns]
        if total and not by:
            return pipes.total_stats(df, order, aggs)
        return pipes.running_stats(df, by, order, aggs)
    if name == "set_stream_fields":
        return pipes.set_stream_fields(df, p[1])
    if name == "generate_sequence":
        return pipes.generate_sequence(df.sparkSession, p[1])
    if name == "stream_context":
        raise LogsQLError(
            "stream_context must be the first pipe (optionally after "
            "set_stream_fields) so the pre-filter frame is still available"
        )
    raise LogsQLError(f"unsupported pipe {name!r}")


def _compile(q: Query, base_df: DataFrame, cfg: _Cfg) -> DataFrame:
    if "time_offset" in q.options and cfg.now_ms is not None:
        # time_offset shifts the evaluated range: -1d → query yesterday
        cfg.now_ms = int(cfg.now_ms + q.options["time_offset"])
    ppipes = list(q.pipes)
    # `<filter> | stream_context before N after M` applies the filter as
    # the MATCH condition over the unfiltered frame (context rows come
    # from the full stream), so it must consume the filter itself.
    pre = base_df
    if ppipes and ppipes[0][0] == "set_stream_fields" and len(ppipes) > 1 \
            and ppipes[1][0] == "stream_context":
        pre = pipes.set_stream_fields(base_df, ppipes[0][1])
        ppipes = ppipes[1:]
    if ppipes and ppipes[0][0] == "stream_context":
        _, before, after = ppipes[0]
        cond = compile_filter(q.filter, pre, cfg)
        stream_col = "_stream"
        if stream_col not in pre.columns:
            pre = pre.withColumn("_stream", F.lit("{}"))
        df = pipes.stream_context(
            pre, cond, before=before, after=after,
            stream_col="_stream", ts_col=cfg.time_field,
        )
        ppipes = ppipes[1:]
    else:
        cond = compile_filter(q.filter, pre, cfg)
        if "global_filter" in q.options:
            cond = cond & compile_filter(q.options["global_filter"], pre, cfg)
        df = pre.filter(cond)
    for p in ppipes:
        df = _apply_pipe(df, p, cfg, base_df)
    return df


def _index_phrases(node: FNode, cfg: _Cfg) -> list[str]:
    """Word/phrase values on the query's top-level AND spine — the terms
    every matching row must satisfy, i.e. the ones safe to prune the
    scan with via the token skip-index. OR/NOT subtrees contribute
    nothing (pruning on them could drop matches)."""
    if node.op in ("word", "phrase", "seq", "contains_all") and (
        node.fld in ("", cfg.msg_field)
    ):
        return [a for a in node.args]
    if node.op == "and":
        out: list[str] = []
        for k in node.kids:
            out.extend(_index_phrases(k, cfg))
        return out
    return []


def run_logsql(
    df: DataFrame,
    query: str,
    now_ms: Optional[int] = None,
    msg_field: str = "_msg",
    time_field: str = "_time",
    token_index_path: Optional[str] = None,
) -> DataFrame:
    """Parse and run a textual LogsQL query against a log DataFrame.

    The frame's message column is ``msg_field`` (default ``_msg``) and its
    timestamp column ``time_field`` (default ``_time``); every other
    column is addressable as a LogsQL field.  ``now_ms`` anchors relative
    ``_time:5m`` filters (required for those; explicit ranges don't need
    it) — passing it explicitly keeps query plans deterministic and
    cache-keyable instead of embedding wall-clock time.

    ``token_index_path`` (optional) points at a skip-index built by
    :func:`victoriametrics_spark.logsql.index.build_token_index`; the
    scan is pre-pruned to the (day, stream) buckets that can contain the
    query's required message tokens before the exact filters run.
    """
    return run_parsed(
        df,
        parse_query(query),
        now_ms=now_ms,
        msg_field=msg_field,
        time_field=time_field,
        token_index_path=token_index_path,
    )


def run_parsed(
    df: DataFrame,
    q: "Query",
    now_ms: Optional[int] = None,
    msg_field: str = "_msg",
    time_field: str = "_time",
    token_index_path: Optional[str] = None,
) -> DataFrame:
    """Run an already-parsed :class:`Query` (callers that rewrite the
    pipe list programmatically — e.g. /select/logsql/stats_query_range
    appends a ``_time:step`` bucket to the trailing stats pipe)."""
    cfg = _Cfg(now_ms=now_ms, msg_field=msg_field, time_field=time_field)
    if token_index_path:
        from victoriametrics_spark.logsql.index import pruned_scan

        for phrase in _index_phrases(q.filter, cfg):
            df = pruned_scan(df.sparkSession, df, token_index_path, phrase)
    return _compile(q, df, cfg)
