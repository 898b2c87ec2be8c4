"""Prometheus remote-write CLIENT — the vmagent shipper analog.

The reference's vmagent batches samples into prompb WriteRequest
blocks and ships them to ``/api/v1/write`` endpoints with the retry
contract of ``app/vmagent/remotewrite/client.go:422-530``:

- 2xx        -> block delivered;
- 409        -> DROP the block (Prometheus behavior, issues 873/1149);
- 400 / 415  -> if the block was zstd (VM protocol), repack to snappy,
                permanently downgrade the connection to the Prometheus
                protocol and retry; else drop;
- other / IO -> retry with exponential backoff, honoring a
                ``Retry-After`` header (seconds or HTTP-date) as the
                next delay.

Scale design: ``remote_write_df`` ships a sample frame from the
EXECUTORS — ``mapInPandas`` partitions group rows into series, encode
blocks of ``max_rows_per_block`` and POST in parallel, which is
vmagent's sharded-queue model (each Spark task = one shard).  The
driver only sees per-partition delivery stats.
``remote_write_sink`` wraps it for Structured Streaming foreachBatch.
"""

from __future__ import annotations

import email.utils
import time
import urllib.error
import urllib.request

from victoriametrics_spark.streaming.remotewrite import (
    encode_write_request,
    snappy_compress,
)

_STATS_SCHEMA = (
    "blocks_sent long, rows_sent long, blocks_dropped long, retries long"
)


def _zstd_compress(data: bytes) -> bytes | None:
    try:
        import zstandard  # type: ignore

        return zstandard.ZstdCompressor().compress(data)
    except ImportError:
        pass
    try:
        import zstd  # type: ignore

        return zstd.compress(data)
    except ImportError:
        return None


def parse_retry_after(value: str | None) -> float:
    """client.go parseRetryAfterHeader: seconds or HTTP-date."""
    if not value:
        return 0.0
    try:
        return float(value)
    except ValueError:
        pass
    try:
        dt = email.utils.parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - time.time())
    except Exception:
        return 0.0


class RemoteWriteClient:
    """One remote-write connection with vmagent's send semantics."""

    def __init__(
        self,
        url: str,
        bearer_token: str | None = None,
        headers: dict[str, str] | None = None,
        use_vm_proto: bool = False,
        max_rows_per_block: int = 10_000,
        retry_min_interval: float = 0.1,
        retry_max_interval: float = 30.0,
        max_retries: int = 10,
    ):
        self.url = url
        self.headers = dict(headers or {})
        if bearer_token:
            self.headers["Authorization"] = f"Bearer {bearer_token}"
        # VM protocol = zstd-compressed blocks; silently fall back to
        # the Prometheus protocol when no zstd binding exists
        self.use_vm_proto = use_vm_proto and _zstd_compress(b"") is not None
        self.max_rows_per_block = max_rows_per_block
        self.retry_min_interval = retry_min_interval
        self.retry_max_interval = retry_max_interval
        self.max_retries = max_retries
        self.blocks_sent = 0
        self.rows_sent = 0
        self.blocks_dropped = 0
        self.retries = 0

    # ------------------------------------------------------------ http
    def _post(self, body: bytes, encoding: str):
        req = urllib.request.Request(self.url, data=body, method="POST")
        req.add_header("Content-Type", "application/x-protobuf")
        req.add_header("Content-Encoding", encoding)
        req.add_header(
            "X-Prometheus-Remote-Write-Version", "0.1.0"
        )
        for k, v in self.headers.items():
            req.add_header(k, v)
        try:
            resp = urllib.request.urlopen(req, timeout=30)
            return resp.status, resp.headers
        except urllib.error.HTTPError as e:
            e.read()
            return e.code, e.headers
        except Exception:
            return None, None  # network error

    def send_block(self, raw_payload: bytes, n_rows: int = 0) -> bool:
        """Ship one uncompressed WriteRequest payload with the
        sendBlockHTTP retry contract.  Returns True when the block was
        delivered OR deliberately dropped (409/400/415), False when
        retries were exhausted."""
        use_zstd = self.use_vm_proto
        delay = self.retry_min_interval
        attempts = 0
        while True:
            if use_zstd:
                body, encoding = _zstd_compress(raw_payload), "zstd"
            else:
                body, encoding = snappy_compress(raw_payload), "snappy"
            status, headers = self._post(body, encoding)
            if status is not None and status // 100 == 2:
                self.blocks_sent += 1
                self.rows_sent += n_rows
                return True
            if status == 409:
                # drop like Prometheus (client.go:456-464)
                self.blocks_dropped += 1
                return True
            if status in (400, 415):
                if use_zstd:
                    # repack zstd->snappy + permanent protocol
                    # downgrade (client.go:470-492)
                    use_zstd = False
                    self.use_vm_proto = False
                    self.retries += 1
                    continue
                self.blocks_dropped += 1
                return True
            # network error or unexpected status: backoff retry with
            # Retry-After override (client.go:505-512)
            attempts += 1
            if attempts > self.max_retries:
                return False
            ra = parse_retry_after(
                headers.get("Retry-After") if headers else None
            )
            time.sleep(ra if ra > 0 else delay)
            delay = min(delay * 2, self.retry_max_interval)
            self.retries += 1

    # ----------------------------------------------------------- rows
    def send_rows(self, rows) -> None:
        """rows: iterable of (name, labels_dict, ts_ms, value) —
        grouped into series, chunked into blocks of
        max_rows_per_block."""
        block: dict[tuple, list[tuple[int, float]]] = {}
        n = 0
        for name, labels, ts, value in rows:
            full = {"__name__": name, **(labels or {})}
            key = tuple(sorted(full.items()))
            block.setdefault(key, []).append((int(ts), float(value)))
            n += 1
            if n >= self.max_rows_per_block:
                self._flush(block, n)
                block, n = {}, 0
        if n:
            self._flush(block, n)

    def _flush(self, block: dict, n: int) -> None:
        series = [(dict(k), sorted(v)) for k, v in block.items()]
        payload = encode_write_request(series, compress=False)
        if not self.send_block(payload, n):
            raise IOError(
                f"remote write to {self.url} failed after "
                f"{self.max_retries} retries"
            )


# ------------------------------------------------------------ dataframe
def remote_write_df(
    df,
    url: str,
    bearer_token: str | None = None,
    use_vm_proto: bool = False,
    max_rows_per_block: int = 10_000,
    max_retries: int = 10,
):
    """Ship a canonical sample frame from the executors (one shipper
    per partition — vmagent's sharded queues).  Returns a stats frame;
    the shipping happens when the stats frame is consumed."""
    import pandas as pd

    def ship(batches):
        client = RemoteWriteClient(
            url,
            bearer_token=bearer_token,
            use_vm_proto=use_vm_proto,
            max_rows_per_block=max_rows_per_block,
            max_retries=max_retries,
        )
        for pdf in batches:
            client.send_rows(
                zip(pdf["name"], pdf["labels"], pdf["ts"], pdf["value"])
            )
        yield pd.DataFrame(
            [
                (
                    client.blocks_sent,
                    client.rows_sent,
                    client.blocks_dropped,
                    client.retries,
                )
            ],
            columns=[
                "blocks_sent",
                "rows_sent",
                "blocks_dropped",
                "retries",
            ],
        )

    cols = df.select("name", "labels", "ts", "value")
    return cols.mapInPandas(ship, _STATS_SCHEMA)


def remote_write_sink(sdf, url: str, checkpoint_dir: str, **kwargs):
    """Structured Streaming sink: every microbatch ships via
    remote_write_df; returns the StreamingQuery."""
    from pyspark.sql import functions as F

    def handle(batch_df, _batch_id):
        stats = remote_write_df(batch_df, url, **kwargs).agg(
            F.sum("rows_sent")
        )
        stats.collect()  # force the send

    return (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
