"""Raw-socket ingest listeners — the lib/ingestserver family rebuilt.

The reference accepts Graphite plaintext (port 2003), OpenTSDB
telnet/HTTP (port 4242) and Influx line protocol over raw TCP and UDP
sockets (lib/ingestserver/{graphite,opentsdb,influx}/server.go), so a
collectd/statsite/telegraf pointed at the port ingests without HTTP.
This module serves the same dialects over TCP + UDP and feeds every
payload through the SAME ``IngestAPI.import_lines`` path the HTTP
routes use — parse and write fan out over Spark; the listener threads
are thin framers (the reference's goroutine-per-conn readers play the
same role).

Batching: TCP connections are long-lived line streams; lines buffer
until ``flush_lines`` or connection close, so one Spark write serves
many lines (the reference's streamparser reads block-sized chunks the
same way). UDP treats each packet as a standalone line batch.

The OpenTSDB listener demuxes telnet ``put`` lines from HTTP
``POST /api/put`` requests on the same port, as the reference does
(opentsdb/server.go:31-69 wraps both a telnet reader and an
opentsdbhttp server behind one listener).
"""

from __future__ import annotations

import socket
import socketserver
import threading

_DIALECTS = ("graphite", "opentsdb", "influx")


class LineIngestServer:
    """One TCP + one UDP listener for a text line dialect
    (graphite / opentsdb / influx), writing through an IngestAPI."""

    def __init__(
        self,
        ingest_api,
        fmt: str,
        host: str = "127.0.0.1",
        port: int = 0,
        flush_lines: int = 10_000,
        flush_interval_s: float = 1.0,
    ):
        if fmt not in _DIALECTS:
            raise ValueError(f"unsupported ingest dialect {fmt!r}")
        self.ingest = ingest_api
        self.fmt = fmt
        self.flush_lines = int(flush_lines)
        self.flush_interval_s = float(flush_interval_s)
        self._threads: list[threading.Thread] = []
        outer = self

        class _TCPHandler(socketserver.StreamRequestHandler):
            def handle(self):  # noqa: D401
                """Chunked recv with a read timeout: long-lived
                connections trickling lines (collectd keeps the socket
                open) flush every ``flush_interval_s`` instead of
                buffering until disconnect — the reference's stream
                parsers likewise process per read chunk."""
                buf: list[str] = []
                tail = b""
                first = True
                self.connection.settimeout(outer.flush_interval_s)
                while True:
                    try:
                        chunk = self.connection.recv(65536)
                    except (TimeoutError, socket.timeout):
                        if buf:
                            outer._flush(buf)
                            buf = []
                        continue
                    except (ConnectionError, OSError):
                        break
                    if not chunk:
                        break
                    tail += chunk
                    if first and outer.fmt == "opentsdb":
                        head = tail.split(b"\n", 1)[0].decode(
                            "latin-1", "replace"
                        )
                        if head.split(" ", 1)[0] in ("POST", "PUT"):
                            # HTTP /api/put on the telnet port
                            # (opentsdb/server.go demux): hand the
                            # whole buffered request over
                            outer._handle_opentsdb_http(
                                tail, self.connection, self.wfile
                            )
                            return
                    *complete, tail = tail.split(b"\n")
                    for raw in complete:
                        line = raw.decode("utf-8", "replace").rstrip("\r")
                        if outer.fmt == "opentsdb" and line.strip() == "version":
                            # telnet `version` probe (OpenTSDB wire
                            # compat; agents use it as a liveness
                            # check before streaming puts)
                            self.wfile.write(
                                b"victoriametrics_spark opentsdb\n"
                            )
                            continue
                        first = False
                        buf.append(line)
                        if len(buf) >= outer.flush_lines:
                            outer._flush(buf)
                            buf = []
                if tail:
                    buf.append(tail.decode("utf-8", "replace").rstrip("\r"))
                outer._flush(buf)

        class _UDPHandler(socketserver.BaseRequestHandler):
            def handle(self):
                data = self.request[0].decode("utf-8", "replace")
                outer._flush(data.splitlines())

        class _TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        class _UDP(socketserver.ThreadingUDPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = _TCP((host, port), _TCPHandler)
        # UDP binds the SAME resolved port (ephemeral port 0 resolves
        # at TCP bind time), mirroring the reference's paired
        # TCP+UDP listeners on one -graphiteListenAddr
        self.port = self._tcp.server_address[1]
        self._udp = _UDP((host, self.port), _UDPHandler)

    # ------------------------------------------------------------ internals
    def _flush(self, lines: list[str]) -> None:
        body = "\n".join(ln for ln in lines if ln.strip())
        if not body:
            return
        try:
            self.ingest.import_lines(body, self.fmt)
        except Exception:  # noqa: BLE001
            # a failed write must not kill the listener thread; the
            # parse layer already skips-and-counts malformed lines
            pass

    def _handle_opentsdb_http(self, pending: bytes, conn, wfile) -> None:
        """Minimal HTTP /api/put on the telnet port: ``pending`` holds
        the bytes received so far (starting at the request line); read
        until headers + Content-Length body arrive, ingest as OpenTSDB
        HTTP JSON, reply 204."""
        conn.settimeout(10.0)
        while b"\r\n\r\n" not in pending and b"\n\n" not in pending:
            try:
                chunk = conn.recv(65536)
            except OSError:
                return
            if not chunk:
                return
            pending += chunk
        sep = b"\r\n\r\n" if b"\r\n\r\n" in pending else b"\n\n"
        head, body = pending.split(sep, 1)
        head_lines = head.decode("latin-1", "replace").splitlines()
        request_line = head_lines[0] if head_lines else ""
        length = 0
        for h in head_lines[1:]:
            k, _, v = h.partition(":")
            if k.strip().lower() == "content-length":
                try:
                    length = int(v.strip())
                except ValueError:
                    length = 0
        while len(body) < length:
            try:
                chunk = conn.recv(65536)
            except OSError:
                return
            if not chunk:
                break
            body += chunk
        status = b"204 No Content"
        try:
            parts = request_line.split(" ")
            if len(parts) > 1 and "/api/put" in parts[1]:
                self.ingest.ingest_json(
                    body[:length].decode("utf-8", "replace"),
                    "opentsdb_http",
                )
            else:
                status = b"404 Not Found"
        except Exception:  # noqa: BLE001
            status = b"400 Bad Request"
        try:
            wfile.write(
                b"HTTP/1.1 " + status + b"\r\nContent-Length: 0\r\n\r\n"
            )
        except OSError:
            pass

    # ------------------------------------------------------------ lifecycle
    def start(self) -> None:
        for srv, name in ((self._tcp, "tcp"), (self._udp, "udp")):
            t = threading.Thread(
                target=srv.serve_forever,
                name=f"vm-ingestserver-{self.fmt}-{name}",
                daemon=True,
            )
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._tcp.shutdown()
        self._udp.shutdown()
        self._tcp.server_close()
        self._udp.server_close()
        self._threads = []


def start_ingest_servers(
    ingest_api,
    graphite_port: "int | None" = None,
    opentsdb_port: "int | None" = None,
    influx_port: "int | None" = None,
    host: str = "127.0.0.1",
) -> list[LineIngestServer]:
    """-graphiteListenAddr / -opentsdbListenAddr / -influxListenAddr
    analog: start one paired TCP+UDP listener per configured port
    (None = disabled; 0 = ephemeral). Returns the started servers."""
    servers = []
    for fmt, port in (
        ("graphite", graphite_port),
        ("opentsdb", opentsdb_port),
        ("influx", influx_port),
    ):
        if port is None:
            continue
        s = LineIngestServer(ingest_api, fmt, host=host, port=port)
        s.start()
        servers.append(s)
    return servers


def send_lines_udp(host: str, port: int, lines: str) -> None:
    """Test helper: fire a line batch at a UDP listener."""
    with socket.socket(socket.AF_INET, socket.SOCK_DGRAM) as s:
        s.sendto(lines.encode(), (host, port))
