"""MetricsQL Pratt parser with WITH-template expansion.

Behavioral reference: vendor/github.com/VictoriaMetrics/metricsql/parser.go
(grammar, modifier placement, WITH expansion at parser.go:2201-2247);
precedence table vendor/.../metricsql/binary_op.go:40-67. This is a
from-scratch Python implementation, not a translation.
"""

from __future__ import annotations

import copy

from victoriametrics_spark.metricsql.ast import (
    AggrFuncExpr,
    BinaryOpExpr,
    DurationExpr,
    Expr,
    FuncExpr,
    LabelFilter,
    MetricExpr,
    ModifierExpr,
    NumberExpr,
    RollupExpr,
    StringExpr,
)
from victoriametrics_spark.metricsql.funcs import (
    BINARY_OP_PRIORITY,
    RIGHT_ASSOCIATIVE,
    is_aggr_func,
    is_binary_op,
)
from victoriametrics_spark.metricsql.lexer import Token, parse_number, tokenize


class ParseError(ValueError):
    pass


class _WithDef:
    __slots__ = ("params", "body")

    def __init__(self, params: list[str], body: Expr):
        self.params = params
        self.body = body


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0
        self.with_env: list[dict[str, _WithDef]] = []

    # --- token helpers -------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.toks[self.i]

    def peek(self, k: int = 1) -> Token:
        j = min(self.i + k, len(self.toks) - 1)
        return self.toks[j]

    def advance(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def expect_op(self, op: str) -> None:
        t = self.advance()
        if t.kind != "OP" or t.text != op:
            raise ParseError(f"expected {op!r}, got {t.text!r} at {t.pos}")

    def at_op(self, op: str) -> bool:
        return self.cur.kind == "OP" and self.cur.text == op

    def at_ident(self, *names: str) -> bool:
        return self.cur.kind == "IDENT" and self.cur.text.lower() in names

    def lookup_with(self, name: str) -> _WithDef | None:
        for env in reversed(self.with_env):
            if name in env:
                return env[name]
        return None

    # --- entry ---------------------------------------------------------
    def parse(self) -> Expr:
        e = self.parse_expr(-100)
        if self.cur.kind != "EOF":
            raise ParseError(f"unexpected token {self.cur.text!r} at {self.cur.pos}")
        return e

    # --- Pratt loop ----------------------------------------------------
    def parse_expr(self, min_prec: int) -> Expr:
        left = self.parse_unary()
        while True:
            t = self.cur
            op = None
            if t.kind == "OP" and t.text in BINARY_OP_PRIORITY:
                op = t.text
            elif t.kind == "IDENT" and is_binary_op(t.text):
                op = t.text.lower()
            if op is None:
                break
            prec = BINARY_OP_PRIORITY[op]
            if prec < min_prec:
                break
            self.advance()
            be = BinaryOpExpr(op=op)
            # modifiers: bool, on/ignoring, group_left/group_right [prefix "p"]
            if self.at_ident("bool"):
                self.advance()
                be.bool_modifier = True
            if self.at_ident("on", "ignoring"):
                be.group_modifier = self.parse_modifier()
                if self.at_ident("group_left", "group_right"):
                    # the label list is optional: `group_left 2` is a
                    # bare modifier followed by the right operand
                    jm_op = self.advance().text.lower()
                    names: list[str] = []
                    if self.at_op("("):
                        self.advance()
                        while not self.at_op(")"):
                            tok = self.advance()
                            if tok.kind not in ("IDENT", "STRING") and \
                                    tok.text != "*":
                                raise ParseError(
                                    f"expected label name at {tok.pos}"
                                )
                            names.append(tok.text)
                            if self.at_op(","):
                                self.advance()
                        self.expect_op(")")
                    be.join_modifier = ModifierExpr(op=jm_op, args=names)
                    if self.at_ident("prefix"):
                        self.advance()
                        tok = self.advance()
                        if tok.kind != "STRING":
                            raise ParseError(f"prefix needs a string at {tok.pos}")
                        be.join_modifier_prefix = tok.text
            # fill()/fill_left()/fill_right() NaN-fill modifiers
            # (parser.go:546-555)
            while self.at_ident("fill", "fill_left", "fill_right"):
                kind = self.cur.text.lower()
                self.advance()
                if not self.at_op("("):
                    raise ParseError(f"{kind} needs (N) at {self.cur.pos}")
                self.advance()
                neg = False
                if self.at_op("-"):
                    neg = True
                    self.advance()
                tok = self.advance()
                if tok.kind != "NUMBER":
                    raise ParseError(f"{kind} needs a number at {tok.pos}")
                n = parse_number(tok.text)
                if neg:
                    n = -n
                if not self.at_op(")"):
                    raise ParseError(f"{kind}: expected ) at {self.cur.pos}")
                self.advance()
                if kind in ("fill", "fill_left"):
                    be.fill_left = n
                if kind in ("fill", "fill_right"):
                    be.fill_right = n
            next_min = prec + 1 if op not in RIGHT_ASSOCIATIVE else prec
            right = self.parse_expr(next_min)
            be.left, be.right = left, right
            # trailing keep_metric_names binds to the BINOP when the right
            # operand didn't consume it (parser.go:419-424)
            if self.at_ident("keep_metric_names"):
                self.advance()
                be.keep_metric_names = True
            left = self.parse_rollup_suffix(be)
        return left

    def parse_unary(self) -> Expr:
        if self.at_op("-") or self.at_op("+"):
            neg = self.cur.text == "-"
            self.advance()
            # `^` binds tighter than unary minus: -4^0.5 == -(4^0.5)
            e = self._parse_pow_chain()
            if not neg:
                return e
            if isinstance(e, NumberExpr):
                return NumberExpr(-e.value)
            if isinstance(e, DurationExpr):
                return DurationExpr("-" + e.text)
            return BinaryOpExpr(op="*", left=NumberExpr(-1.0), right=e)
        return self.parse_single()

    def _parse_pow_chain(self) -> Expr:
        """Operand of a unary sign: a primary plus any right-associative
        `^` chain (consumed here so the sign applies to the whole
        power)."""
        e = self.parse_unary()
        if self.at_op("^"):
            self.advance()
            rhs = self._parse_pow_chain()
            return BinaryOpExpr(op="^", left=e, right=rhs)
        return e

    # --- primaries -----------------------------------------------------
    def parse_single(self) -> Expr:
        was_parens = self.at_op("(")
        e = self.parse_primary()
        # a bare keep_metric_names after non-binop parens belongs to the
        # ENCLOSING binary op (parser.go:419 vs :670 — parens only pass
        # the modifier inward for a contained BinaryOpExpr)
        allow_keep = not was_parens or isinstance(e, BinaryOpExpr)
        return self.parse_rollup_suffix(e, allow_keep=allow_keep)

    def parse_primary(self) -> Expr:
        t = self.cur
        if t.kind == "NUMBER":
            self.advance()
            return NumberExpr(parse_number(t.text))
        if t.kind == "DURATION":
            self.advance()
            return DurationExpr(t.text)
        if t.kind == "STRING":
            self.advance()
            return StringExpr(t.text)
        if t.kind == "OP" and t.text == "(":
            return self.parse_parens()
        if t.kind == "OP" and t.text == "{":
            return self.parse_metric_expr(name=None)
        if t.kind == "IDENT":
            return self.parse_ident_expr()
        raise ParseError(f"unexpected token {t.text!r} at {t.pos}")

    def parse_parens(self) -> Expr:
        self.expect_op("(")
        exprs = []
        if not self.at_op(")"):
            exprs.append(self.parse_expr(-100))
            while self.at_op(","):
                self.advance()
                if self.at_op(")"):  # trailing comma
                    break
                exprs.append(self.parse_expr(-100))
        self.expect_op(")")
        if len(exprs) == 1:
            return exprs[0]
        return FuncExpr(name="union", args=exprs)

    def parse_ident_expr(self) -> Expr:
        t = self.advance()
        name = t.text
        low = name.lower()
        if low == "with" and self.at_op("("):
            return self.parse_with()
        # WITH-defined name?
        wd = self.lookup_with(name)
        if wd is not None:
            return self.expand_with(name, wd)
        if self.at_op("("):
            if is_aggr_func(low):
                return self.parse_aggr_func(low)
            return self.parse_func(name)
        if is_aggr_func(low) and (self.at_ident("by", "without") or self.at_op("(")):
            return self.parse_aggr_func(low)
        if self.at_op("{"):
            return self.parse_metric_expr(name=name)
        return MetricExpr([[LabelFilter("__name__", "=", name)]])

    def parse_func(self, name: str) -> Expr:
        args = self.parse_arg_list()
        fe = FuncExpr(name=name.lower(), args=args)
        if self.at_ident("keep_metric_names"):
            self.advance()
            fe.keep_metric_names = True
        return fe

    def parse_aggr_func(self, name: str) -> Expr:
        ae = AggrFuncExpr(name=name)
        if self.at_ident("by", "without"):
            ae.modifier = self.parse_modifier()
        ae.args = self.parse_arg_list()
        # trailing modifiers: by/without and/or limit N, any order
        while True:
            if ae.modifier is None and self.at_ident("by", "without"):
                ae.modifier = self.parse_modifier()
                continue
            if self.at_ident("limit"):
                self.advance()
                tok = self.advance()
                if tok.kind != "NUMBER":
                    raise ParseError(f"limit needs a number at {tok.pos}")
                ae.limit = int(parse_number(tok.text))
                continue
            break
        return ae

    def parse_arg_list(self) -> list[Expr]:
        self.expect_op("(")
        args: list[Expr] = []
        if not self.at_op(")"):
            args.append(self.parse_expr(-100))
            while self.at_op(","):
                self.advance()
                if self.at_op(")"):  # trailing comma
                    break
                args.append(self.parse_expr(-100))
        self.expect_op(")")
        return args

    def parse_modifier(self) -> ModifierExpr:
        op = self.advance().text.lower()
        self.expect_op("(")
        names: list[str] = []
        if not self.at_op(")"):
            while True:
                tok = self.advance()
                if tok.kind not in ("IDENT", "STRING"):
                    raise ParseError(f"expected label name at {tok.pos}")
                names.append(tok.text)
                if self.at_op(","):
                    self.advance()
                    if self.at_op(")"):  # trailing comma
                        break
                    continue
                break
        self.expect_op(")")
        return ModifierExpr(op=op, args=names)

    # --- selectors -----------------------------------------------------
    def parse_metric_expr(self, name: str | None) -> Expr:
        """``name{f1, f2 or f3, f4}`` → OR-groups of AND filters
        (parser.go:2389-2397)."""
        self.expect_op("{")
        groups: list[list[LabelFilter]] = [[]]
        while not self.at_op("}"):
            tok = self.advance()
            if tok.kind not in ("IDENT", "STRING"):
                raise ParseError(f"expected label name at {tok.pos}")
            if tok.kind == "IDENT" and tok.text.lower() == "or" and groups[-1]:
                groups.append([])
                continue
            label = tok.text
            if self.at_op(",") or self.at_op("}") or self.at_ident("or"):
                # bare name inside braces = metric name filter: {"foo"}
                groups[-1].append(LabelFilter("__name__", "=", label))
            else:
                op_tok = self.advance()
                if op_tok.kind != "OP" or op_tok.text not in ("=", "!=", "=~", "!~"):
                    raise ParseError(
                        f"expected label filter op, got {op_tok.text!r} at {op_tok.pos}"
                    )
                val_tok = self.advance()
                if val_tok.kind == "STRING":
                    value = val_tok.text
                elif val_tok.kind in ("NUMBER", "DURATION", "IDENT"):
                    wd = (
                        self.lookup_with(val_tok.text)
                        if val_tok.kind == "IDENT"
                        else None
                    )
                    if wd is not None and not wd.params and isinstance(
                        wd.body, StringExpr
                    ):
                        value = wd.body.value
                    else:
                        value = val_tok.text
                else:
                    raise ParseError(f"expected label value at {val_tok.pos}")
                op = "=" if op_tok.text == "=" else op_tok.text
                groups[-1].append(LabelFilter(label, op, value))
            if self.at_op(","):
                self.advance()
            elif self.at_ident("or"):
                self.advance()
                groups.append([])
        self.expect_op("}")
        if name is not None:
            for g in groups:
                g.insert(0, LabelFilter("__name__", "=", name))
        return MetricExpr([g for g in groups if g] or [[]])

    # --- rollup suffixes ----------------------------------------------
    def parse_rollup_suffix(self, e: Expr, allow_keep: bool = True) -> Expr:
        window = step = offset = None
        at = None
        inherit_step = False
        keep_metric_names = False
        saw = False
        saw_rollup_part = False
        while True:
            if self.at_op("["):
                saw = saw_rollup_part = True
                self.advance()
                window, step, inherit_step = self.parse_window_and_step()
            elif self.at_ident("offset"):
                saw = saw_rollup_part = True
                self.advance()
                offset = self.parse_duration_operand()
            elif self.at_op("@"):
                saw = saw_rollup_part = True
                self.advance()
                at = self.parse_unary()
            elif (allow_keep or saw_rollup_part) and self.at_ident(
                "keep_metric_names"
            ):
                self.advance()
                keep_metric_names = True
                saw = True
            else:
                break
        if not saw:
            return e
        if (
            keep_metric_names
            and window is None
            and step is None
            and offset is None
            and at is None
        ):
            if isinstance(e, (FuncExpr, BinaryOpExpr)):
                e.keep_metric_names = True
                return e
        return RollupExpr(
            expr=e,
            window=window,
            step=step,
            offset=offset,
            at=at,
            inherit_step=inherit_step,
            keep_metric_names=keep_metric_names,
        )

    def _maybe_split_colon(self) -> None:
        """Metric names may contain ``:`` so the lexer can glue ``:30s`` into
        one IDENT inside ``[w:step]``; re-split it here where ``:`` is
        structural."""
        t = self.cur
        if t.kind == "IDENT" and t.text.startswith(":"):
            new = [Token("OP", ":", t.pos)]
            rest = t.text[1:]
            if rest:
                for s in tokenize(rest)[:-1]:
                    new.append(Token(s.kind, s.text, t.pos + 1 + s.pos))
            self.toks[self.i : self.i + 1] = new

    def parse_window_and_step(self):
        window = step = None
        inherit_step = False
        self._maybe_split_colon()
        if not self.at_op(":") and not self.at_op("]"):
            window = self.parse_duration_operand()
        self._maybe_split_colon()
        if self.at_op(":"):
            self.advance()
            if self.at_op("]"):
                inherit_step = True
            else:
                step = self.parse_duration_operand()
        self.expect_op("]")
        return window, step, inherit_step

    def parse_duration_operand(self) -> DurationExpr:
        neg = False
        if self.at_op("-"):
            self.advance()
            neg = True
        tok = self.advance()
        if tok.kind == "DURATION":
            text = tok.text
        elif tok.kind == "NUMBER":
            text = tok.text  # bare number → seconds
        elif tok.kind == "IDENT":
            wd = self.lookup_with(tok.text)
            if wd is not None and not wd.params and isinstance(
                wd.body, (DurationExpr, NumberExpr)
            ):
                b = wd.body
                text = b.text if isinstance(b, DurationExpr) else repr(b.value)
            else:
                raise ParseError(f"expected duration at {tok.pos}")
        else:
            raise ParseError(f"expected duration at {tok.pos}")
        return DurationExpr(("-" if neg else "") + text)

    # --- WITH templates -------------------------------------------------
    def parse_with(self) -> Expr:
        """``WITH (a = m{x="y"}, f(p) = rate(p[5m])) expr`` —
        parse-time macro expansion (parser.go:2201-2247)."""
        self.expect_op("(")
        env: dict[str, _WithDef] = {}
        self.with_env.append(env)
        try:
            while not self.at_op(")"):
                name_tok = self.advance()
                if name_tok.kind != "IDENT":
                    raise ParseError(f"expected WITH name at {name_tok.pos}")
                params: list[str] = []
                if self.at_op("("):
                    self.advance()
                    while not self.at_op(")"):
                        p = self.advance()
                        if p.kind != "IDENT":
                            raise ParseError(f"expected param at {p.pos}")
                        params.append(p.text)
                        if self.at_op(","):
                            self.advance()
                    self.expect_op(")")
                self.expect_op("=")
                # params shadow outer WITH defs while parsing the body
                shadow = {p: _WithDef([], MetricExpr([[LabelFilter("__name__", "=", p)]])) for p in params}
                self.with_env.append(shadow)
                body = self.parse_expr(-100)
                self.with_env.pop()
                env[name_tok.text] = _WithDef(params, body)
                if self.at_op(","):
                    self.advance()
            self.expect_op(")")
            return self.parse_expr(-100)
        finally:
            self.with_env.pop()

    def expand_with(self, name: str, wd: _WithDef) -> Expr:
        if wd.params:
            if not self.at_op("("):
                raise ParseError(f"WITH template {name} needs arguments")
            args = self.parse_arg_list()
            if len(args) != len(wd.params):
                raise ParseError(
                    f"WITH template {name}: want {len(wd.params)} args, got {len(args)}"
                )
            body = copy.deepcopy(wd.body)
            return substitute_names(body, dict(zip(wd.params, args)))
        body = copy.deepcopy(wd.body)
        if self.at_op("{"):
            extra = self.parse_metric_expr(name=None)
            assert isinstance(extra, MetricExpr)
            body = merge_label_filters(body, extra.label_filterss[0])
        return body


def substitute_names(e: Expr, mapping: dict[str, Expr]) -> Expr:
    """Replace bare-metric references to template params with arg exprs."""
    if isinstance(e, MetricExpr):
        if (
            len(e.label_filterss) == 1
            and len(e.label_filterss[0]) == 1
            and e.label_filterss[0][0].label == "__name__"
            and e.label_filterss[0][0].op == "="
            and e.label_filterss[0][0].value in mapping
        ):
            return copy.deepcopy(mapping[e.label_filterss[0][0].value])
        return e
    if isinstance(e, RollupExpr):
        e.expr = substitute_names(e.expr, mapping)
        if e.at is not None:
            e.at = substitute_names(e.at, mapping)
        return e
    if isinstance(e, (FuncExpr, AggrFuncExpr)):
        e.args = [substitute_names(a, mapping) for a in e.args]
        return e
    if isinstance(e, BinaryOpExpr):
        e.left = substitute_names(e.left, mapping)
        e.right = substitute_names(e.right, mapping)
        return e
    return e


def merge_label_filters(e: Expr, extra: list[LabelFilter]) -> Expr:
    """``foo{a="b"}`` where foo = bar{c="d"} → bar{c="d",a="b"}."""
    if isinstance(e, MetricExpr):
        return MetricExpr([g + list(extra) for g in e.label_filterss])
    if isinstance(e, RollupExpr):
        e.expr = merge_label_filters(e.expr, extra)
        return e
    raise ParseError("cannot apply label filters to a non-selector WITH template")


# Default WITH templates, preloaded into every parse — the reference
# ships ru/ttf/range_median as built-in WITH macros
# (vendor/.../metricsql/parser.go:57-70 getDefaultWithArgExprs; alias is
# a native transform here).
_DEFAULT_WITH_SRC: list[tuple[str, list[str], str]] = [
    ("ru", ["freev", "maxv"],
     "clamp_min(maxv - clamp_min(freev, 0), 0) / clamp_min(maxv, 0) * 100"),
    ("ttf", ["freev"],
     "smooth_exponential(clamp_max(clamp_max(-freev, 0)"
     " / clamp_max(deriv_fast(freev), 0), 365*24*3600),"
     " clamp_max(step()/300, 1))"),
    ("range_median", ["q"], "range_quantile(0.5, q)"),
]
_default_with_env: dict[str, _WithDef] | None = None


def _get_default_with_env() -> dict[str, _WithDef]:
    global _default_with_env
    if _default_with_env is None:
        env: dict[str, _WithDef] = {}
        for name, params, src in _DEFAULT_WITH_SRC:
            pr = Parser(tokenize(src))
            pr.with_env.append(
                {
                    prm: _WithDef(
                        [], MetricExpr([[LabelFilter("__name__", "=", prm)]])
                    )
                    for prm in params
                }
            )
            env[name] = _WithDef(params, pr.parse_expr(-100))
        _default_with_env = env
    return _default_with_env


def parse(query: str) -> Expr:
    """Parse a MetricsQL query string into an AST."""
    pr = Parser(tokenize(query))
    pr.with_env.append(_get_default_with_env())
    return pr.parse()
