"""Remote-write client (streaming/remotewrite_client.py) — the
vmagent shipper analog, tested against a live capture server that
decodes blocks with this repo's own remote-write DECODER (full
round-trip through both directions of the wire format), plus the
sendBlockHTTP status-code contract of
app/vmagent/remotewrite/client.go:422-530.
"""

from __future__ import annotations

import http.server
import threading

import pytest

from victoriametrics_spark.streaming.remotewrite import (
    decode_write_request,
    rw_uncompress,
)
from victoriametrics_spark.streaming.remotewrite_client import (
    RemoteWriteClient,
    parse_retry_after,
    remote_write_df,
)


class _Capture(http.server.BaseHTTPRequestHandler):
    received: list = []
    responses: list = []  # queued (status, headers) overrides

    def log_message(self, *a):
        pass

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        _Capture.received.append(
            (self.headers.get("Content-Encoding"), body, dict(self.headers))
        )
        if _Capture.responses:
            status, hdrs = _Capture.responses.pop(0)
        else:
            status, hdrs = 204, {}
        self.send_response(status)
        for k, v in hdrs.items():
            self.send_header(k, v)
        self.end_headers()


@pytest.fixture()
def server():
    _Capture.received = []
    _Capture.responses = []
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Capture)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}/api/v1/write", _Capture
    httpd.shutdown()


def _decode_all(cap):
    """Decode every captured block with the repo's own decoder;
    returns {(sorted full-label items): [(ts, value), ...]}."""
    out: dict = {}
    for enc, body, _ in cap.received:
        raw = rw_uncompress(body, enc)
        for name, labels, ts, value in decode_write_request(
            raw, compressed=False
        ):
            key = tuple(sorted({"__name__": name, **labels}.items()))
            out.setdefault(key, []).append((ts, value))
    return out


def test_round_trip_snappy(server):
    url, cap = server
    c = RemoteWriteClient(url)
    c.send_rows(
        [
            ("up", {"job": "a"}, 1000, 1.0),
            ("up", {"job": "a"}, 2000, 0.0),
            ("temp", {"room": "x"}, 1000, 21.5),
        ]
    )
    assert c.blocks_sent == 1 and c.rows_sent == 3
    assert cap.received[0][0] == "snappy"
    assert cap.received[0][2]["X-Prometheus-Remote-Write-Version"] == "0.1.0"
    got = _decode_all(cap)
    assert got[
        (("__name__", "up"), ("job", "a"))
    ] == [(1000, 1.0), (2000, 0.0)]
    assert got[(("__name__", "temp"), ("room", "x"))] == [(1000, 21.5)]


def test_block_chunking(server):
    url, cap = server
    c = RemoteWriteClient(url, max_rows_per_block=10)
    c.send_rows(
        [("m", {"i": str(i % 3)}, i * 1000, float(i)) for i in range(25)]
    )
    assert c.blocks_sent == 3  # 10 + 10 + 5
    assert c.rows_sent == 25
    assert sum(len(pts) for pts in _decode_all(cap).values()) == 25


def test_409_drops_block(server):
    url, cap = server
    cap.responses.append((409, {}))
    c = RemoteWriteClient(url)
    c.send_rows([("m", {}, 1000, 1.0)])
    assert c.blocks_dropped == 1 and c.blocks_sent == 0


def test_400_snappy_drops_block(server):
    url, cap = server
    cap.responses.append((400, {}))
    c = RemoteWriteClient(url)
    c.send_rows([("m", {}, 1000, 1.0)])
    assert c.blocks_dropped == 1 and c.blocks_sent == 0


def test_retry_then_success(server):
    url, cap = server
    cap.responses.extend([(503, {}), (503, {})])
    c = RemoteWriteClient(url, retry_min_interval=0.01)
    c.send_rows([("m", {}, 1000, 1.0)])
    assert c.blocks_sent == 1 and c.retries == 2
    assert len(cap.received) == 3


def test_retry_after_header(server):
    url, cap = server
    cap.responses.append((429, {"Retry-After": "0.05"}))
    c = RemoteWriteClient(url, retry_min_interval=5.0)  # header must win
    import time

    t0 = time.time()
    c.send_rows([("m", {}, 1000, 1.0)])
    assert time.time() - t0 < 2.0  # not the 5s default
    assert c.blocks_sent == 1


def test_retry_exhaustion(server):
    url, cap = server
    cap.responses.extend([(500, {})] * 3)
    c = RemoteWriteClient(url, retry_min_interval=0.01, max_retries=2)
    with pytest.raises(IOError, match="failed after 2 retries"):
        c.send_rows([("m", {}, 1000, 1.0)])


def test_parse_retry_after():
    assert parse_retry_after(None) == 0.0
    assert parse_retry_after("7") == 7.0
    assert parse_retry_after("junk") == 0.0
    # HTTP-date in the past -> 0
    assert parse_retry_after("Mon, 02 Jan 2006 15:04:05 GMT") == 0.0


def test_remote_write_df_executors(spark, server):
    url, cap = server
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    rows = [
        ("m", {"p": str(i % 4)}, 1000 * i, float(i), False)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, SAMPLE_SCHEMA).repartition(4)
    stats = remote_write_df(df, url, max_rows_per_block=30).collect()
    assert sum(r["rows_sent"] for r in stats) == 100
    assert sum(r["blocks_sent"] for r in stats) == len(cap.received)
    assert sum(len(pts) for pts in _decode_all(cap).values()) == 100


def test_remote_write_streaming_sink(spark, server, tmp_path):
    from victoriametrics_spark.schema import SAMPLE_SCHEMA
    from victoriametrics_spark.streaming.remotewrite_client import (
        remote_write_sink,
    )

    url, cap = server
    rows = [("m", {"s": str(i % 2)}, 1000 * i, float(i), False) for i in range(20)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SAMPLE_SCHEMA).write.parquet(src)
    sdf = spark.readStream.schema(SAMPLE_SCHEMA).parquet(src)
    q = remote_write_sink(
        sdf.select("name", "labels", "ts", "value"),
        url,
        str(tmp_path / "ckpt"),
    )
    # availableNow isn't set on the sink; stop after the first batch
    q.processAllAvailable()
    q.stop()
    assert sum(len(pts) for pts in _decode_all(cap).values()) == 20
