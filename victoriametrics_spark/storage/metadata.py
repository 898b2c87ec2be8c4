"""Metric metadata registry — /api/v1/metadata backing store.

Reference: lib/storage/metricsmetadata/storage.go (capped in-memory
store, evicting least-recently-written rows past the size budget,
keyed per (tenant, metric family)), lib/timeserieslimits
IsMetricMetadataExceeding (entries with a name/help/unit over 64 KiB
are silently skipped at ingest), and the prometheus text HELP/TYPE
comment parser (lib/protoparser/prometheus/parser.go:783-910
unmarshalMetadata — sequential HELP/TYPE lines for the same family
merge into one record; an invalid TYPE value discards the record).

This is presentation-scale metadata (one record per metric FAMILY, not
per series), so an in-process dict is the right home — the reference
keeps it off the LSM tree for the same reason.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

# lib/timeserieslimits: metricMetadataMaxFieldValueSize = 64 KiB - 1
MAX_FIELD_VALUE_SIZE = 65535

# prompb.MetricType → Prometheus API type string (lib/prompb/prompb.go
# MetricType.String)
METRIC_TYPE_NAMES = {
    0: "unknown",
    1: "counter",
    2: "gauge",
    3: "histogram",
    4: "gauge histogram",
    5: "summary",
    6: "info",
    7: "stateset",
}

# prometheus exposition TYPE token → prompb.MetricType
# (parser.go:876-899; "untyped" is the exposition name, "unknown" the
# OpenMetrics one)
_TEXT_TYPE_TOKENS = {
    "counter": 1,
    "gauge": 2,
    "histogram": 3,
    "summary": 5,
    "untyped": 0,
    "unknown": 0,
    "info": 6,
    "gaugehistogram": 4,
    "stateset": 7,
}


def _unescape_help(s: str) -> str:
    """HELP values escape backslash and newline (parser.go
    unescapeValue)."""
    if "\\" not in s:
        return s
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "\\":
                out.append("\\")
                i += 2
                continue
            if nxt == "n":
                out.append("\n")
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_text_metadata(lines) -> list[dict]:
    """``# HELP`` / ``# TYPE`` comment lines → metadata records, with
    the reference's sequential-merge behavior (parser.go:814-910):
    consecutive HELP/TYPE lines naming the same family produce ONE
    record; an invalid TYPE discards the in-progress record."""
    dst: list[dict] = []
    for raw in lines:
        s = raw.rstrip("\r").lstrip()
        if len(s) < 2 or s[0] != "#" or s[1] != " ":
            continue
        s = s[2:]
        head, _, rest = s.partition(" ")
        if head not in ("HELP", "TYPE"):
            continue
        metric, sep, data = rest.partition(" ")
        if not sep:
            # bare "# HELP name" (empty help) is valid but skippable;
            # a TYPE line needs the type token
            continue
        if not dst or dst[-1]["metric_family_name"] != metric:
            dst.append(
                {"metric_family_name": metric, "help": "", "unit": "",
                 "type": 0}
            )
        md = dst[-1]
        if head == "TYPE":
            t = _TEXT_TYPE_TOKENS.get(data)
            if t is None:
                dst.pop()
                continue
            md["type"] = t
        else:
            md["help"] = _unescape_help(data)
    return dst


class MetricsMetadataStore:
    """Capped per-tenant metadata registry. ``tenant=None`` is the
    single-node (tenant-less) keyspace; cluster reads pass a tenant
    token, ``"multitenant"`` merges every tenant (netstorage
    GetMetricsMetadata)."""

    def __init__(self, max_items: int = 10000):
        self.max_items = max_items
        # (tenant, family) -> record; ordered by last write for the
        # least-recently-written eviction (storage.go lastWriteHeap).
        # The lock serializes handler threads (serve() uses
        # ThreadingHTTPServer: concurrent ingest adds vs status reads).
        self._lock = threading.Lock()
        self._rows: OrderedDict[tuple, dict] = OrderedDict()

    def add(self, records, tenant: str | None = None) -> int:
        """Store records ({metric_family_name, help, unit, type}) —
        entries with any field value over 64 KiB are skipped
        (IsMetricMetadataExceeding)."""
        n = 0
        with self._lock:
            return self._add_locked(records, tenant)

    def _add_locked(self, records, tenant) -> int:
        n = 0
        for r in records:
            name = r.get("metric_family_name", "")
            if not name:
                continue
            help_ = r.get("help", "") or ""
            unit = r.get("unit", "") or ""
            if (
                len(name.encode()) > MAX_FIELD_VALUE_SIZE
                or len(help_.encode()) > MAX_FIELD_VALUE_SIZE
                or len(unit.encode()) > MAX_FIELD_VALUE_SIZE
            ):
                continue
            key = (tenant, name)
            self._rows.pop(key, None)
            self._rows[key] = {
                "metric_family_name": name,
                "help": help_,
                "unit": unit,
                "type": int(r.get("type", 0) or 0),
            }
            n += 1
        while len(self._rows) > self.max_items:
            self._rows.popitem(last=False)
        return n

    def add_text(self, lines, tenant: str | None = None) -> int:
        return self.add(parse_text_metadata(lines), tenant=tenant)

    def get(
        self,
        limit: int = 0,
        metric: str | None = None,
        tenant: str | None = None,
    ) -> list[dict]:
        """Rows sorted by family name; ``limit`` applies after the sort
        (storage.go GetForTenant). ``tenant="multitenant"`` merges
        every tenant's rows (deduped by family, newest write wins);
        ``tenant=None`` reads the single-node tenant-less keyspace
        only; a canonical "A:P" token reads that tenant's rows."""
        merge_all = tenant == "multitenant"
        out: dict[str, dict] = {}
        with self._lock:
            items = list(self._rows.items())
        for (tkey, name), row in items:
            if not merge_all and tkey != tenant:
                continue
            if metric and name != metric:
                continue
            out[name] = row  # iteration is oldest→newest: newest wins
        rows = [out[k] for k in sorted(out)]
        if limit and limit > 0:
            rows = rows[:limit]
        return rows

    def as_response(
        self,
        limit: int = 0,
        metric: str | None = None,
        tenant: str | None = None,
    ) -> dict:
        """/api/v1/metadata body (metadata_response.qtpl): data maps
        family → [{"type", "unit"?, "help"}], unit only when set."""
        data = {}
        for row in self.get(limit=limit, metric=metric, tenant=tenant):
            entry = {"type": METRIC_TYPE_NAMES.get(row["type"], "unknown")}
            if row["unit"]:
                entry["unit"] = row["unit"]
            entry["help"] = row["help"]
            data[row["metric_family_name"]] = [entry]
        return {"status": "success", "data": data}
