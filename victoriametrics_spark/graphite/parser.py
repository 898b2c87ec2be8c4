"""Graphite render-target parser.

Grammar per the public Graphite render API (reference evaluator:
app/vmselect/graphite/eval.go + its graphiteql package): a target is
either a metric path expression — dotted segments with ``*``/``?``
globs, ``[a-z]`` character classes and ``{a,b}`` alternatives — or a
function call ``fn(arg, ..., kw=value)`` whose arguments are targets,
quoted strings, numbers, or booleans. Every node keeps its source text:
Graphite derives result series names from the literal expression text.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class GraphiteParseError(ValueError):
    pass


@dataclass
class Node:
    text: str


@dataclass
class Path(Node):
    pattern: str = ""


@dataclass
class Literal(Node):
    value: object = None


@dataclass
class Call(Node):
    func: str = ""
    args: list = field(default_factory=list)
    kwargs: dict = field(default_factory=dict)


# Characters that may appear in an unquoted metric path (outside
# brackets/braces). '=' and ',' are excluded: '=' introduces a kwarg,
# ',' separates args (commas inside {} are handled by depth tracking).
_PATH_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "_-.*?:%#/$~+@<>;="
)

_NUM_RE = re.compile(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def error(self, msg: str) -> GraphiteParseError:
        return GraphiteParseError(
            f"{msg} at position {self.pos} in target {self.s!r}"
        )

    def skip_ws(self) -> None:
        while self.pos < len(self.s) and self.s[self.pos].isspace():
            self.pos += 1

    def peek(self) -> str:
        return self.s[self.pos] if self.pos < len(self.s) else ""

    def parse_expr(self) -> Node:
        node = self._parse_primary()
        # graphiteql pipe chaining: `expr | func(a, b)` ≡ func(expr, a, b),
        # `expr | func` ≡ func(expr) (parser.go parsePipes)
        while True:
            self.skip_ws()
            if self.peek() != "|":
                return node
            self.pos += 1
            self.skip_ws()
            m = _IDENT_RE.match(self.s, self.pos)
            if m is None:
                raise self.error("expected function name after '|'")
            fname = m.group(0)
            self.pos = m.end()
            self.skip_ws()
            if self.peek() == "(":
                call = self._parse_call(fname, self.pos)
                call.args.insert(0, node)
                node = call
            else:
                node = Call(
                    text=f"{node.text}|{fname}", func=fname, args=[node]
                )

    def _parse_primary(self) -> Node:
        self.skip_ws()
        c = self.peek()
        if not c:
            raise self.error("unexpected end of target")
        if c in "'\"":
            return self._parse_string()
        # A number only counts as a literal when the token ends there —
        # "1.5" is a number, "1.5x.cpu" is a path, "10min" stays a path
        # segment (interval strings must be quoted, as in Graphite).
        m = _NUM_RE.match(self.s, self.pos)
        if m and not self._continues_as_path(m.end()):
            self.pos = m.end()
            txt = m.group(0)
            val = float(txt)
            if re.fullmatch(r"[+-]?\d+", txt):
                val = int(txt)
            return Literal(text=txt, value=val)
        m = _IDENT_RE.match(self.s, self.pos)
        if m and m.end() < len(self.s) and self.s[m.end()] == "(":
            return self._parse_call(m.group(0), m.end())
        if m and not self._continues_as_path(m.end()):
            word = m.group(0)
            if word in ("True", "true"):
                self.pos = m.end()
                return Literal(text=word, value=True)
            if word in ("False", "false"):
                self.pos = m.end()
                return Literal(text=word, value=False)
            if word in ("None", "none"):
                self.pos = m.end()
                return Literal(text=word, value=None)
        return self._parse_path()

    def _continues_as_path(self, end: int) -> bool:
        if end >= len(self.s):
            return False
        return self.s[end] in _PATH_CHARS or self.s[end] in "[{"

    def _parse_string(self) -> Node:
        quote = self.peek()
        start = self.pos
        self.pos += 1
        out = []
        while self.pos < len(self.s):
            c = self.s[self.pos]
            if c == "\\" and self.pos + 1 < len(self.s):
                nxt = self.s[self.pos + 1]
                # only quote/backslash escapes collapse; regex escapes
                # like \d pass through intact (graphite strings carry
                # regexes for aliasSub/grep)
                if nxt in ("'", '"', "\\"):
                    out.append(nxt)
                else:
                    out.append(c)
                    out.append(nxt)
                self.pos += 2
                continue
            if c == quote:
                self.pos += 1
                return Literal(
                    text=self.s[start : self.pos], value="".join(out)
                )
            out.append(c)
            self.pos += 1
        raise self.error("unterminated string")

    def _parse_call(self, func: str, lparen: int) -> Node:
        start = self.pos
        self.pos = lparen + 1
        args: list[Node] = []
        kwargs: dict[str, Node] = {}
        self.skip_ws()
        if self.peek() == ")":
            self.pos += 1
            return Call(
                text=self.s[start : self.pos], func=func, args=args
            )
        while True:
            self.skip_ws()
            km = _IDENT_RE.match(self.s, self.pos)
            if km is not None:
                # kwarg lookahead: ident '=' not followed by path chars
                # that would make it part of a path ('=' never appears
                # in unquoted paths)
                j = km.end()
                while j < len(self.s) and self.s[j].isspace():
                    j += 1
                if j < len(self.s) and self.s[j] == "=":
                    name = km.group(0)
                    self.pos = j + 1
                    kwargs[name] = self.parse_expr()
                    self.skip_ws()
                    if self.peek() == ",":
                        self.pos += 1
                        self.skip_ws()
                        if self.peek() == ")":
                            self.pos += 1
                            return Call(
                                text=self.s[start : self.pos],
                                func=func,
                                args=args,
                                kwargs=kwargs,
                            )
                        continue
                    if self.peek() == ")":
                        self.pos += 1
                        return Call(
                            text=self.s[start : self.pos],
                            func=func,
                            args=args,
                            kwargs=kwargs,
                        )
                    raise self.error("expected ',' or ')'")
            args.append(self.parse_expr())
            self.skip_ws()
            if self.peek() == ",":
                self.pos += 1
                # graphiteql accepts a trailing comma: group(a, b,)
                self.skip_ws()
                if self.peek() == ")":
                    self.pos += 1
                    return Call(
                        text=self.s[start : self.pos],
                        func=func,
                        args=args,
                        kwargs=kwargs,
                    )
                continue
            if self.peek() == ")":
                self.pos += 1
                return Call(
                    text=self.s[start : self.pos],
                    func=func,
                    args=args,
                    kwargs=kwargs,
                )
            raise self.error("expected ',' or ')'")

    def _parse_path(self) -> Node:
        start = self.pos
        depth_brace = 0
        depth_brack = 0
        while self.pos < len(self.s):
            c = self.s[self.pos]
            if c == "{":
                depth_brace += 1
            elif c == "}":
                if depth_brace == 0:
                    break
                depth_brace -= 1
            elif c == "[":
                depth_brack += 1
            elif c == "]":
                if depth_brack == 0:
                    break
                depth_brack -= 1
            elif c == "," and (depth_brace > 0):
                pass  # alternatives inside {}
            elif c not in _PATH_CHARS:
                break
            self.pos += 1
        if self.pos == start:
            raise self.error("empty path")
        if depth_brace or depth_brack:
            raise self.error("unbalanced braces in path")
        txt = self.s[start : self.pos]
        return Path(text=txt, pattern=txt)


def parse_target(s: str) -> Node:
    p = _Parser(s.strip())
    node = p.parse_expr()
    p.skip_ws()
    if p.pos != len(p.s):
        raise p.error("trailing input")
    return node
