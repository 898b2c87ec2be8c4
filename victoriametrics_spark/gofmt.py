"""Go ``%g`` float formatting (``strconv.FormatFloat(v, 'g', -1, 64)``
as used by ``fmt.Sprintf("%%g", v)``).

The reference embeds float values into series NAMES with ``%g``
(graphite transform.go: aggregateLine, scale, asPercent, …), which is
the SHORTEST round-trip digit string with scientific notation when the
decimal exponent is < -4 or >= 6.  Neither Python's ``%g`` (fixed 6
significant digits) nor Java's ``Double.toString`` (non-shortest on
JDK < 19 — JDK-4511638) reproduces it, so name-string parity needs
this explicit implementation.

Python's ``repr`` produces the same shortest correctly-rounded digit
sequence Go's ftoa does (both are exact shortest-round-trip), so we
parse repr's digits/exponent and re-assemble with Go's layout rules.
"""

from __future__ import annotations

import math


def go_g(v: float) -> str:
    """``fmt.Sprintf("%g", v)`` for float64."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    sign = "-" if math.copysign(1.0, v) < 0 else ""
    if v == 0:
        return sign + "0"
    s = repr(abs(v))
    # extract shortest digits + decimal exponent (value = d.igits x 10^exp)
    if "e" in s:
        mant, _, e = s.partition("e")
        exp = int(e)
        digits = mant.replace(".", "")
    else:
        ip, _, fp = s.partition(".")
        if ip == "0":
            stripped = fp.lstrip("0")
            exp = -(len(fp) - len(stripped)) - 1
            digits = stripped
        else:
            exp = len(ip) - 1
            digits = ip + fp
    digits = digits.rstrip("0") or "0"
    # Go 'g' shortest: scientific iff exp < -4 or exp >= 6 (eprec=6)
    if exp < -4 or exp >= 6:
        m = digits[0] + ("." + digits[1:] if len(digits) > 1 else "")
        return f"{sign}{m}e{'+' if exp >= 0 else '-'}{abs(exp):02d}"
    if exp >= len(digits) - 1:
        return sign + digits + "0" * (exp - len(digits) + 1)
    if exp >= 0:
        return sign + digits[: exp + 1] + "." + digits[exp + 1 :]
    return sign + "0." + "0" * (-exp - 1) + digits


def go_g_column(col):
    """Column-side go_g for per-series computed values embedded in
    names (aggregateLine).  Arrow-batched pandas UDF — runs on
    render-sized frames (one stat per series), not the sample path."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fmt(s):
        return s.map(lambda v: "None" if v is None or v != v else go_g(v))

    return _fmt(col)
