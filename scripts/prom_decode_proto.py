#!/usr/bin/env python
"""Prototype A/B: single-pass mapInArrow prometheus-text decode vs the
Catalyst regex cascade (VERDICT r13 next-round item 3).

The Python pass does ONLY the regex work (brace match once, pair
extraction once, body validation once, unescape); value/timestamp
parsing and the labels map stay in Catalyst so the try_cast semantics
are bit-identical to the production path.

Usage: python scripts/prom_decode_proto.py [n_lines] [runs]
Prints min-of-N for both paths and an exceptAll equivalence check.
"""

from __future__ import annotations

import os
import re
import sys
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from victoriametrics_spark.session import get_spark  # noqa: E402
from victoriametrics_spark.sources.tables import load_table  # noqa: E402
from victoriametrics_spark.streaming.parsers import (  # noqa: E402
    _try_double,
    parse_prometheus_text,
)

# exactly the Catalyst patterns, compiled once per worker; re.A pins
# \s to ASCII like Java's
_BODY = r'((?:[^"}]|"(?:[^"\\]|\\.)*")*)'
_BRACED = re.compile(r"^([^{\s]*)\s*\{" + _BODY + r"\}\s*(.*)$", re.A)
_PAIR = re.compile(
    r'("(?:[^"\\]|\\.)*"|[^=,\s"]+)\s*=\s*"((?:[^"\\]|\\.)*)"', re.A
)
_QNAME = re.compile(r'(?:^|,)\s*"((?:[^"\\]|\\.)*)"\s*(?=,|$)', re.A)
_QS = r'"(?:[^"\\]|\\.)*"'
_ELEM = rf'(?:{_QS}\s*=\s*{_QS}|[^=,"]*=\s*{_QS}|{_QS})'
_BODY_OK = re.compile(
    rf"^\s*(?:{_ELEM}\s*(?:,\s*{_ELEM}\s*)?(?:,\s*{_ELEM}\s*)*(?:,\s*)?)?$",
    re.A,
)
_WS = re.compile(r"^\s+|\s+$", re.A)
_COMMENT_TAIL = re.compile(r"#.*$")
_SPLITWS = re.compile(r"\s+", re.A)
_FIRST_TOK = re.compile(r"^(\S+)", re.A)


def _unescape(s: str) -> str:
    pieces = s.split("\\\\")
    pieces = [p.replace('\\"', '"').replace("\\n", "\n") for p in pieces]
    return "\\".join(pieces)


def _decode_line(raw: str):
    """→ (name|None, keys, vals, val_str, ts_str) mirroring
    parse_prometheus_text's column cascade, one regex pass each."""
    l = _WS.sub("", raw)
    if l == "" or l.startswith("#"):
        return None
    m = _BRACED.match(l)
    if m is not None:
        name_classic, body, rest = m.group(1), m.group(2), m.group(3)
        pairs = _PAIR.findall(body)
        qnames = _QNAME.findall(body)
        body_ok = _BODY_OK.match(body) is not None
        name_ok = body_ok and (
            len(qnames) == 0 or (len(qnames) == 1 and name_classic == "")
        )
        if name_ok:
            name = (
                name_classic
                if name_classic != ""
                else (_unescape(qnames[0]) if qnames else "")
            )
        else:
            name = None
        # strip only the OUTER quotes like regexp_replace(^"|"$)
        keys = []
        vals = []
        for k, v in pairs:
            k2 = re.sub(r'^"|"$', "", k)
            keys.append(_unescape(k2))
            vals.append(_unescape(v))
        rest = _COMMENT_TAIL.sub("", rest)
        rest = _WS.sub("", rest)
        toks = _SPLITWS.split(rest) if rest != "" else [""]
        braced = True
    else:
        if "{" in l:
            return (None, [], [], "", "", True)
        fm = _FIRST_TOK.match(l)
        name = fm.group(1) if fm else ""
        rest = re.sub(r"^\S+\s*", "", l, flags=re.A)
        rest = _COMMENT_TAIL.sub("", rest)
        rest = _WS.sub("", rest)
        toks = _SPLITWS.split(rest) if rest != "" else [""]
        keys, vals = [], []
        braced = False
    val = toks[0] if len(toks) >= 1 else ""
    ts = toks[1] if len(toks) >= 2 else ""
    if len(toks) > 2:
        ts = "junk"
    return (name, keys, vals, val, ts, braced)


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for raw in pdf["value"]:
            r = _decode_line(raw)
            if r is None:
                continue
            rows.append(r)
        yield pd.DataFrame(
            rows, columns=["name", "keys", "vals", "val", "tss", "braced"]
        )


def parse_prometheus_text_arrow(lines, default_ts_ms: int):
    decoded = lines.mapInPandas(
        _decode_batches,
        "name string, keys array<string>, vals array<string>, "
        "val string, tss string, braced boolean",
    )
    tsd = _try_double(F.col("tss"))
    ts = (
        F.when(F.col("tss") == "", F.lit(default_ts_ms).cast("long"))
        .when(tsd.isNull(), F.lit(None).cast("long"))
        .when(
            (tsd >= -2147483648.0) & (tsd < 2147483648.0),
            (tsd * 1000).try_cast("long"),
        )
        .otherwise(tsd.try_cast("long"))
    )
    from victoriametrics_spark.streaming.parsers import _finish

    return _finish(
        decoded.select(
            F.col("name"),
            F.when(
                F.col("braced"),
                F.map_from_arrays(F.col("keys"), F.col("vals")),
            )
            .otherwise(F.create_map().cast("map<string,string>"))
            .alias("labels"),
            ts.alias("ts"),
            _try_double(F.col("val")).alias("value"),
        )
    )


def main() -> None:
    n_lines = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("prom-decode-proto")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    # same adversarial line shape as the op_ingest_prom_escapes gate
    bucket = (F.col("user_id") % 10).cast("string")
    lines = ev.select(
        F.concat(
            F.lit('m_total{et="d\\\\s'),
            F.col("event_type"),
            F.lit(',x}b",ub="u\\"'),
            bucket,
            F.lit('"} '),
            F.col("value").cast("string"),
            F.lit(" "),
            (F.unix_millis(F.col("ts").cast("timestamp"))).cast("string"),
        ).alias("value")
    )
    poison = spark.createDataFrame(
        [
            ("# comment",),
            ("",),
            ('broken{a="b} 1 2',),
            ("m 1 2 3",),
            ('{"quoted name", "l"="v"} 2.5',),
            ('dup{x="1"} notanumber',),
            ("bare_metric 4.25 1700000000",),
        ],
        "value string",
    )
    n_rep = max(1, n_lines // max(ev.count(), 1))
    big = lines.crossJoin(
        F.broadcast(spark.range(n_rep).withColumnRenamed("id", "__r"))
    ).select("value").unionByName(poison).repartition(32).localCheckpoint()
    n = big.count()
    print(f"# input: {n} lines", file=sys.stderr)

    variants = {
        "catalyst": lambda: parse_prometheus_text(big, 0),
        "arrow": lambda: parse_prometheus_text_arrow(big, 0),
    }
    res = {k: [] for k in variants}
    for r in range(runs):
        for k, b in variants.items():
            spark.sparkContext.setJobDescription(f"{k}#r{r}")
            t0 = time.time()
            df = b()
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.xxhash64(
                        "name",
                        F.array_sort(F.map_entries("labels")).cast("string"),
                        "ts",
                        "value",
                    )
                    % F.lit(1_000_003)
                ).alias("h"),
            ).first()
            dt = time.time() - t0
            res[k].append(dt)
            print(
                f"# {k} run{r}: {dt:.2f}s rows={row['n']} h={row['h']}",
                file=sys.stderr,
            )
    for k, v in res.items():
        print(f"{k}: min={min(v):.2f}s all={[round(x, 2) for x in v]}")
    def canon(df):
        # set ops reject MAP columns — compare on sorted entries
        return df.select(
            "name",
            F.array_sort(F.map_entries("labels")).cast("string").alias("l"),
            "ts",
            "value",
            "is_stale",
        )

    a = canon(parse_prometheus_text(big, 0))
    b = canon(parse_prometheus_text_arrow(big, 0))
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    print(f"equivalence: exceptAll {d1}/{d2}")


if __name__ == "__main__":
    main()
