"""Ingest-time series-cardinality limiters — the
-storage.maxHourlySeries / -storage.maxDailySeries analogs.

Mirrors lib/storage/storage.go:2151-2167 registerSeriesCardinality +
lib/bloomfilter/limiter: each unique series (xxhash64 of its canonical
identity — the metricNameRaw hash) registers into the current
hour/day window's limiter; once the window holds ``max_items`` unique
series, rows of NEW series are dropped and counted
(vm_hourly_series_limit_rows_dropped_total /
vm_daily_series_limit_rows_dropped_total, app/vmstorage/main.go:506-514)
while rows of already-registered series keep ingesting. The window
rolls over on the hour/day boundary, emptying the limiter.

State is one int per tracked series, capped at ``max_items`` — the
same RAM envelope as the reference's bloom filter, exact instead of
probabilistic (no false "already seen" lets a over-cap series slip
in). At 100 TB scale the limiter guards the INGEST path, whose
batches are presentation-sized HTTP bodies; the batch's distinct
series set is aggregated executor-side and only (hash, rowcount)
pairs reach the driver."""

from __future__ import annotations


class SeriesLimiter:
    """One rolling-window unique-series limiter (hourly or daily)."""

    def __init__(self, max_items: int, window_ms: int, now_ms_fn=None):
        import threading
        import time

        self.max_items = int(max_items)
        self.window_ms = int(window_ms)
        self.now_ms = now_ms_fn or (lambda: int(time.time() * 1000))
        self._window_start = -1
        self._seen: set[int] = set()
        self.rows_dropped_total = 0
        # ingest handlers run on concurrent ThreadingHTTPServer
        # threads; the check-then-add must be atomic or the cap races
        # past max_items (the reference's limiter is likewise
        # mutex-guarded)
        self._lock = threading.Lock()

    def _roll_locked(self) -> None:
        ws = self.now_ms() // self.window_ms
        if ws != self._window_start:
            self._window_start = ws
            self._seen.clear()

    def current_items(self) -> int:
        with self._lock:
            self._roll_locked()
            return len(self._seen)

    def add(self, h: int) -> bool:
        """True = series accepted (already tracked, or added under
        cap); False = limiter full and series is new → drop its rows
        (bloomfilter/limiter.go Add)."""
        with self._lock:
            self._roll_locked()
            if h in self._seen:
                return True
            if len(self._seen) >= self.max_items:
                return False
            self._seen.add(h)
            return True

    def count_dropped(self, n: int) -> None:
        with self._lock:
            self.rows_dropped_total += n
