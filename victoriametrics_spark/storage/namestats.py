"""Metric-name usage tracker — /api/v1/status/metric_names_stats.

Reference: lib/storage/metricnamestats/tracker.go (capped in-memory
tracker behind -storage.trackMetricNamesStats): ingest registers a
name with zero query count (storage.go:2065 RegisterIngestRequest),
every series a search touches bumps its name's counter by one
(search.go:310 RegisterQueryRequest — so one query over N series of a
name adds N), and /api/v1/status/metric_names_stats serves records
sorted by metric name with ``limit``, ``le`` (keep counts <= le) and
``match_pattern`` filters (app/vmselect/stats/stats.go). The response
shape follows metric_names_usage_response.qtpl.
"""

from __future__ import annotations

import re
import threading
import time
from collections import OrderedDict


class MetricNamesTracker:
    def __init__(self, max_items: int = 20000):
        self.max_items = max_items
        self.collected_since = int(time.time())
        # name -> [query_requests_count, last_query_ts_seconds];
        # reinsert-on-update keeps dict order = write recency so cap
        # eviction drops the least-recently-written entries. The lock
        # serializes ThreadingHTTPServer handler threads (ingest
        # registration vs status reads).
        self._lock = threading.Lock()
        self._rows: OrderedDict[str, list] = OrderedDict()

    def _evict(self) -> None:
        while len(self._rows) > self.max_items:
            self._rows.popitem(last=False)

    def register_ingest(self, names) -> None:
        """Ingested metric names appear with a zero query count."""
        with self._lock:
            for n in names:
                if n and n not in self._rows:
                    self._rows[n] = [0, 0]
            self._evict()

    def register_query(self, name: str, hits: int = 1) -> None:
        if not name:
            return
        with self._lock:
            st = self._rows.pop(name, None) or [0, 0]
            st[0] += hits
            st[1] = int(time.time())
            self._rows[name] = st
            self._evict()

    def query_count(self, name: str) -> int:
        st = self._rows.get(name)
        return st[0] if st else 0

    def records(
        self,
        limit: int = 1000,
        le: int = -1,
        match_pattern: str | None = None,
    ) -> list[dict]:
        rx = re.compile(match_pattern) if match_pattern else None
        with self._lock:
            items = list(self._rows.items())
        recs = [
            {
                "metricName": n,
                "queryRequestsCount": c,
                "lastQueryRequestTimestamp": ts,
            }
            for n, (c, ts) in items
            if (rx is None or rx.search(n)) and (le < 0 or c <= le)
        ]
        recs.sort(key=lambda r: r["metricName"])
        if limit and limit > 0:
            recs = recs[:limit]
        return recs

    def as_response(
        self,
        limit: int = 1000,
        le: int = -1,
        match_pattern: str | None = None,
    ) -> dict:
        return {
            "status": "success",
            "statsCollectedSince": self.collected_since,
            "statsCollectedRecordsTotal": len(self._rows),
            "records": self.records(limit, le, match_pattern),
        }

    def reset(self) -> None:
        with self._lock:
            self._rows.clear()
            self.collected_since = int(time.time())
