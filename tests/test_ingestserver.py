"""Raw-socket ingest listeners (lib/ingestserver/{graphite,opentsdb,
influx}/server.go): Graphite plaintext, OpenTSDB telnet (+HTTP demux),
and Influx line protocol over TCP and UDP, feeding the same
IngestAPI.import_lines path as the HTTP routes."""
from __future__ import annotations

import json
import socket
import time

import pytest

from victoriametrics_spark.api.http import IngestAPI
from victoriametrics_spark.streaming.ingestserver import (
    LineIngestServer,
    send_lines_udp,
    start_ingest_servers,
)


@pytest.fixture()
def ing(spark):
    captured = []
    api = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    return api, captured


def _send_tcp(port: int, payload: str) -> None:
    with socket.create_connection(("127.0.0.1", port), timeout=5) as s:
        s.sendall(payload.encode())


def _wait(captured, n_batches=1, timeout=30.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if len(captured) >= n_batches:
            return
        time.sleep(0.05)
    raise AssertionError(
        f"expected {n_batches} ingest batches, saw {len(captured)}"
    )


def _rows(captured):
    out = []
    for df in captured:
        out += [
            (r["name"], dict(r["labels"] or {}), r["ts"], r["value"])
            for r in df.collect()
        ]
    return out


def test_graphite_tcp_and_udp(ing):
    api, captured = ing
    srv = LineIngestServer(api, "graphite", port=0)
    srv.start()
    try:
        _send_tcp(srv.port, "tcp.metric;dc=east 1.5 1700000000\n")
        _wait(captured, 1)
        send_lines_udp("127.0.0.1", srv.port, "udp.metric 2 1700000001\n")
        _wait(captured, 2)
        rows = _rows(captured)
        assert ("tcp.metric", {"dc": "east"}, 1700000000000, 1.5) in rows
        assert ("udp.metric", {}, 1700000001000, 2.0) in rows
    finally:
        srv.stop()


def test_opentsdb_telnet_version_and_put(ing):
    api, captured = ing
    srv = LineIngestServer(api, "opentsdb", port=0)
    srv.start()
    try:
        with socket.create_connection(
            ("127.0.0.1", srv.port), timeout=5
        ) as s:
            s.sendall(b"version\n")
            assert b"opentsdb" in s.recv(128)
            s.sendall(b"put otsdb.m 1700000000 4.2 host=a\n")
        _wait(captured, 1)
        rows = _rows(captured)
        assert ("otsdb.m", {"host": "a"}, 1700000000000, 4.2) in rows
    finally:
        srv.stop()


def test_opentsdb_http_demux_on_telnet_port(ing):
    api, captured = ing
    srv = LineIngestServer(api, "opentsdb", port=0)
    srv.start()
    try:
        body = json.dumps(
            {
                "metric": "http.m",
                "timestamp": 1700000000,
                "value": 7.0,
                "tags": {"host": "b"},
            }
        )
        req = (
            "POST /api/put HTTP/1.1\r\nHost: x\r\n"
            f"Content-Length: {len(body)}\r\n\r\n{body}"
        )
        with socket.create_connection(
            ("127.0.0.1", srv.port), timeout=5
        ) as s:
            s.sendall(req.encode())
            assert b"204" in s.recv(256)
        _wait(captured, 1)
        rows = _rows(captured)
        assert ("http.m", {"host": "b"}, 1700000000000, 7.0) in rows
    finally:
        srv.stop()


def test_influx_tcp_with_escapes_and_poison(ing):
    api, captured = ing
    srv = LineIngestServer(api, "influx", port=0)
    srv.start()
    try:
        _send_tcp(
            srv.port,
            "cpu,host=a\\ b usage=0.5 1000000000\n"
            "bad line that is not influx\n"
            "mem used=2i 1000000000\n",
        )
        _wait(captured, 1)
        names = {r[0] for r in _rows(captured)}
        assert names == {"cpu_usage", "mem_used"}
        assert api.rows_invalid_total.get("influx") == 1
    finally:
        srv.stop()


def test_start_ingest_servers_end_to_end_query(spark):
    """Write over a raw socket → samples queryable via /api/v1/query."""
    from victoriametrics_spark.api.http import PromAPI
    from victoriametrics_spark.schema import SAMPLE_SCHEMA

    store: list = []
    api_ing = IngestAPI(spark, sink=lambda df, kind: store.append(df))
    (srv,) = start_ingest_servers(api_ing, graphite_port=0)
    try:
        _send_tcp(srv.port, "sock.metric 9.5 1700000000\n")
        _wait(store, 1)
        samples = store[0]
        papi = PromAPI(spark, samples)
        out = papi.query("sock.metric", time="1700000000")
        res = out["data"]["result"]
        assert len(res) == 1
        assert res[0]["value"][1] == "9.5"
    finally:
        srv.stop()


def test_tcp_trickle_flushes_on_open_connection(ing):
    """A long-lived connection trickling lines (collectd-style) must
    flush on the time interval — not buffer until disconnect."""
    api, captured = ing
    srv = LineIngestServer(api, "graphite", port=0, flush_interval_s=0.3)
    srv.start()
    try:
        with socket.create_connection(
            ("127.0.0.1", srv.port), timeout=5
        ) as s:
            s.sendall(b"trickle.metric 1 1700000000\n")
            # connection stays OPEN; the interval flush must land it
            _wait(captured, 1, timeout=30.0)
            rows = _rows(captured)
            assert ("trickle.metric", {}, 1700000000000, 1.0) in rows
            # a second batch over the same open connection
            s.sendall(b"trickle.metric 2 1700000060\n")
            _wait(captured, 2, timeout=30.0)
    finally:
        srv.stop()
