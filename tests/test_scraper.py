"""Embedded scraper (lib/promscrape static subset): scrape a local
in-process exposition endpoint, land samples through the normal ingest
path, report real target state at /api/v1/targets."""

from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from victoriametrics_spark.api import PromAPI, serve
from victoriametrics_spark.api.http import IngestAPI
from victoriametrics_spark.schema import SAMPLE_SCHEMA
from victoriametrics_spark.storage.layout import (
    drop_samples_table,
    write_samples_table,
)

EXPOSITION = """\
# HELP scraped_metric A scraped gauge.
# TYPE scraped_metric gauge
scraped_metric{foo="bar"} 42
scraped_metric{foo="baz",job="inner"} 7
"""


class _Exposition(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path != "/metrics":
            self.send_error(404)
            return
        body = EXPOSITION.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; version=0.0.4")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def exposition_port():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Exposition)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1]
    srv.shutdown()


def _get(base, path, **q):
    qs = urllib.parse.urlencode(q)
    url = f"{base}{path}" + (f"?{qs}" if qs else "")
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


@pytest.mark.slow
def test_scrape_lands_samples_and_reports_targets(
    spark, exposition_port
):
    """serve(scrape_configs=[...]) scrapes the endpoint, samples become
    queryable via /api/v1/query, and /api/v1/targets reports the target
    up with its identity labels (the round-10 verdict's Done clause)."""
    table = "scraper_samples"
    write_samples_table(spark.createDataFrame([], SAMPLE_SCHEMA), table)
    try:
        ingest = IngestAPI(spark, samples_table=table)
        api = PromAPI(spark, spark.table(table), samples_table=table)
        srv = serve(
            api,
            port=0,
            ingest_api=ingest,
            scrape_configs=[
                {
                    "job_name": "testjob",
                    "scrape_interval": "1s",
                    "static_configs": [
                        {
                            "targets": [f"127.0.0.1:{exposition_port}"],
                            "labels": {"dc": "local"},
                        }
                    ],
                }
            ],
        )
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"

        # wait for the background loop's first scrape
        import time

        deadline = time.time() + 30
        tgt = None
        while time.time() < deadline:
            out = _get(base, "/api/v1/targets")
            active = out["data"]["activeTargets"]
            if active and active[0]["health"] == "up":
                tgt = active[0]
                break
            time.sleep(0.2)
        assert tgt is not None, "target never came up"
        assert tgt["labels"]["job"] == "testjob"
        assert tgt["labels"]["instance"] == f"127.0.0.1:{exposition_port}"
        assert tgt["labels"]["dc"] == "local"
        assert tgt["scrapeUrl"].endswith("/metrics")
        assert tgt["lastError"] == ""
        assert tgt["lastSamplesScraped"] == 2
        assert tgt["scrapePool"] == "testjob"
        assert tgt["discoveredLabels"]["__address__"] == (
            f"127.0.0.1:{exposition_port}"
        )

        # scraped samples are queryable end-to-end (nocache: evaluate
        # at the literal current instant — samples landed "now", inside
        # the 30s latency offset)
        _get(base, "/internal/force_flush")
        out = _get(
            base, "/api/v1/query", query="scraped_metric", nocache="1"
        )
        res = out["data"]["result"]
        by_foo = {r["metric"]["foo"]: r for r in res}
        assert float(by_foo["bar"]["value"][1]) == 42.0
        # honor_labels defaults false: the body's job label moved to
        # exported_job, the target's job won
        assert by_foo["baz"]["metric"]["job"] == "testjob"
        assert by_foo["baz"]["metric"]["exported_job"] == "inner"
        assert all(
            r["metric"]["instance"] == f"127.0.0.1:{exposition_port}"
            for r in res
        )

        # auto-metrics ride the same path (scrapework addAutoMetrics)
        up = _get(
            base, "/api/v1/query",
            query='up{job="testjob"}', nocache="1",
        )["data"]["result"]
        assert up and float(up[0]["value"][1]) == 1.0
        dur = _get(
            base, "/api/v1/query",
            query='scrape_duration_seconds{job="testjob"}', nocache="1",
        )["data"]["result"]
        assert dur and float(dur[0]["value"][1]) >= 0.0

        # /api/v1/status/config and /config dump the scrape config
        cfgy = _get(base, "/api/v1/status/config")["data"]["yaml"]
        assert "testjob" in cfgy
        srv.shutdown()
        assert srv.scraper._threads == []  # loops stopped with server
    finally:
        drop_samples_table(spark, table)


def test_scrape_down_target_and_honor_labels(spark, exposition_port):
    """A dead target reports health=down with lastError and up=0;
    honor_labels=true keeps the body's clashing labels."""
    from victoriametrics_spark.streaming.scraper import Scraper

    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        [
            {
                "job_name": "dead",
                "static_configs": [{"targets": ["127.0.0.1:1"]}],
            },
            {
                "job_name": "honor",
                "honor_labels": True,
                "static_configs": [
                    {"targets": [f"127.0.0.1:{exposition_port}"]}
                ],
            },
        ],
    )
    sc.scrape_once()
    st = {
        t["scrapePool"]: t
        for t in sc.targets_status()["data"]["activeTargets"]
    }
    assert st["dead"]["health"] == "down"
    assert st["dead"]["lastError"] != ""
    assert st["honor"]["health"] == "up"
    rows = [r for df in captured for r in df.collect()]
    by_name: dict = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r)
    # the dead target still emitted its auto-metrics with up=0
    ups = {r["labels"]["job"]: r["value"] for r in by_name["up"]}
    assert ups["dead"] == 0.0 and ups["honor"] == 1.0
    # honor_labels=true: body's job=inner survived, target job only
    # fills series without one
    jobs = {
        r["labels"]["foo"]: r["labels"]["job"]
        for r in by_name["scraped_metric"]
        if r["labels"]["job"] in ("honor", "inner")
    }
    assert jobs == {"bar": "honor", "baz": "inner"}
    assert all(
        "exported_job" not in (r["labels"] or {})
        for r in by_name["scraped_metric"]
    )


def test_honor_labels_false_exported_collision(spark):
    """A body already carrying exported_job next to job (the output of
    federating another honor_labels=false scraper) must not fail the
    map build — the renamed job overwrites the body's exported_job
    like Prometheus does."""
    from victoriametrics_spark.streaming.scraper import (
        ingest_scrape_labels,
    )

    df = spark.createDataFrame(
        [
            ("m1", {"job": "inner", "exported_job": "stale", "x": "1"}),
            ("m2", {"x": "2"}),
        ],
        "name string, labels map<string,string>",
    )
    out = df.withColumn(
        "labels",
        ingest_scrape_labels({"job": "outer", "instance": "i:1"}, False),
    ).collect()
    lbls = {r["name"]: dict(r["labels"]) for r in out}
    assert lbls["m1"] == {
        "exported_job": "inner",  # renamed body job wins
        "x": "1",
        "job": "outer",
        "instance": "i:1",
    }
    assert lbls["m2"] == {"x": "2", "job": "outer", "instance": "i:1"}


def test_target_relabeling_and_dropped_targets(spark, exposition_port):
    """scrape_config.relabel_configs: a `drop` rule removes a target
    (reported as droppedTargets with its discovered labels,
    WriteDroppedTargetsJSON); survivors can rewrite their identity
    (__metrics_path__/job/extra labels) before finalization."""
    from victoriametrics_spark.streaming.scraper import Scraper

    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        [
            {
                "job_name": "relab",
                "relabel_configs": [
                    # drop the canary-labeled target
                    {
                        "action": "drop",
                        "source_labels": ["tier"],
                        "regex": "canary",
                    },
                    # rewrite the job and add a region label
                    {
                        "action": "replace",
                        "target_label": "job",
                        "replacement": "renamed",
                    },
                    {
                        "action": "replace",
                        "target_label": "region",
                        "replacement": "eu",
                    },
                ],
                "static_configs": [
                    {
                        "targets": [f"127.0.0.1:{exposition_port}"],
                        "labels": {"tier": "prod"},
                    },
                    {
                        "targets": ["127.0.0.1:1"],
                        "labels": {"tier": "canary"},
                    },
                ],
            }
        ],
    )
    assert len(sc.targets) == 1 and len(sc.dropped) == 1
    assert sc.dropped[0]["tier"] == "canary"
    assert sc.dropped[0]["__address__"] == "127.0.0.1:1"
    t = sc.targets[0]
    assert t.job == "renamed"
    assert t.labels["region"] == "eu"
    assert t.labels["tier"] == "prod"
    # discoveredLabels keep the PRE-relabel identity
    assert t.discovered["job"] == "relab"
    out = sc.targets_status()["data"]
    assert len(out["droppedTargets"]) == 1
    assert out["droppedTargets"][0]["discoveredLabels"]["tier"] == "canary"
    sc.scrape_once()
    rows = [r for df in captured for r in df.collect()]
    sm = [r for r in rows if r["name"] == "scraped_metric"]
    assert sm and all(r["labels"]["job"] == "renamed" for r in sm)
    assert all(r["labels"]["region"] == "eu" for r in sm)


@pytest.mark.slow
def test_metric_relabel_and_sample_limit(spark, exposition_port):
    """metric_relabel_configs apply after target labels attach;
    sample_limit fails the whole scrape with the reference's message
    (scrapework.go:556-562) and exposes scrape_samples_limit."""
    from victoriametrics_spark.streaming.scraper import Scraper

    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        [
            {
                "job_name": "mr",
                "metric_relabel_configs": [
                    {"action": "drop", "source_labels": ["foo"],
                     "regex": "baz"},
                ],
                "static_configs": [
                    {"targets": [f"127.0.0.1:{exposition_port}"]}
                ],
            },
            {
                "job_name": "lim",
                "sample_limit": 1,  # exposition has 2 samples
                "static_configs": [
                    {"targets": [f"127.0.0.1:{exposition_port}"]}
                ],
            },
        ],
    )
    sc.scrape_once()
    st = {
        t["scrapePool"]: t
        for t in sc.targets_status()["data"]["activeTargets"]
    }
    # metric relabeling dropped the foo=baz series from the WRITE, but
    # lastSamplesScraped reports the PARSED count like the reference
    # (samplesScraped = len(wc.rows.Rows) BEFORE relabeling,
    # scrapework.go:552; the post-relabel count is the separate
    # scrape_samples_post_metric_relabeling auto metric)
    assert st["mr"]["health"] == "up"
    assert st["mr"]["lastSamplesScraped"] == 2
    rows = [r for df in captured for r in df.collect()]
    mr = [r for r in rows if r["name"] == "scraped_metric"
          and r["labels"]["job"] == "mr"]
    assert len(mr) == 1 and mr[0]["labels"]["foo"] == "bar"
    # sample_limit target failed, nothing landed, message matches;
    # the REAL parsed count still reports (reference computes
    # samplesScraped before the limit check)
    assert st["lim"]["health"] == "down"
    assert "exceeds sample_limit=1" in st["lim"]["lastError"]
    assert st["lim"]["lastSamplesScraped"] == 2
    assert not any(
        r["name"] == "scraped_metric" and r["labels"]["job"] == "lim"
        for r in rows
    )
    # auto metrics carry up=0 + the advertised limit
    autos = {
        r["name"]: r["value"] for r in rows
        if r["labels"].get("job") == "lim"
    }
    assert autos["up"] == 0.0
    assert autos["scrape_samples_limit"] == 1.0


def test_global_config_section(spark, exposition_port):
    """A full Prometheus-shaped config dict: global scrape_interval /
    sample_limit defaults, global metric_relabel_configs prepended,
    and external_labels attached at lowest precedence
    (GlobalConfig, config.go:278-287,958-981)."""
    from victoriametrics_spark.streaming.scraper import Scraper

    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        {
            "global": {
                "scrape_interval": "5s",
                "external_labels": {"cluster": "c1", "foo": "global"},
                "metric_relabel_configs": [
                    {"action": "drop_metrics", "regex": "scraped_dropme"},
                ],
            },
            "scrape_configs": [
                {
                    "job_name": "g1",
                    "static_configs": [
                        {"targets": [f"127.0.0.1:{exposition_port}"]}
                    ],
                },
                {
                    "job_name": "g2",
                    "scrape_interval": "1s",  # overrides global
                    "static_configs": [
                        {"targets": [f"127.0.0.1:{exposition_port}"]}
                    ],
                },
            ],
        },
    )
    assert sc.targets[0].interval_s == 5.0
    assert sc.targets[1].interval_s == 1.0
    sc.scrape_once()
    rows = [r for df in captured for r in df.collect()]
    sm = [r for r in rows if r["name"] == "scraped_metric"]
    # external labels attach after relabeling with honor_labels
    # duplicate handling (appendExtraLabels, scrapework.go:1202-1236):
    # the body's clashing foo renames to exported_foo, external wins
    assert sm and all(r["labels"]["cluster"] == "c1" for r in sm)
    assert all(r["labels"]["foo"] == "global" for r in sm)
    assert {r["labels"]["exported_foo"] for r in sm} == {"bar", "baz"}
    # config yaml dump keeps the global section
    assert "external_labels" in sc.config_yaml()


def test_file_sd_configs_live_rotation(spark, exposition_port, tmp_path):
    """file_sd_configs (config.go:438-444, getFileSDScrapeWork): targets
    load from JSON files, carry __meta_filepath, and a file rewrite
    swaps the target set on the next mtime check."""
    from victoriametrics_spark.streaming.scraper import Scraper

    sd = tmp_path / "targets.json"
    sd.write_text(
        json.dumps(
            [{"targets": [f"127.0.0.1:{exposition_port}"],
              "labels": {"env": "a"}}]
        )
    )
    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        [
            {
                "job_name": "fsd",
                "file_sd_configs": [{"files": [str(sd)]}],
            }
        ],
    )
    assert len(sc.targets) == 1
    t = sc.targets[0]
    assert t.discovered["__meta_filepath"] == str(sd)
    assert t.labels["env"] == "a"
    sc.scrape_once()
    rows = [r for df in captured for r in df.collect()]
    assert any(
        r["name"] == "scraped_metric" and r["labels"].get("env") == "a"
        for r in rows
    )

    # rotate the file: new label set + a second (dead) target
    import os
    import time as _time

    _time.sleep(0.01)
    sd.write_text(
        json.dumps(
            [
                {"targets": [f"127.0.0.1:{exposition_port}"],
                 "labels": {"env": "b"}},
                {"targets": ["127.0.0.1:1"], "labels": {"env": "dead"}},
            ]
        )
    )
    os.utime(sd)
    assert sc.check_file_sd() is True
    assert t.removed is True
    assert len(sc.targets) == 2
    assert {x.labels["env"] for x in sc.targets} == {"b", "dead"}
    # unchanged files do not reload
    assert sc.check_file_sd() is False

    # a YAML file_sd also loads (loadStaticConfigs accepts both)
    sd_yaml = tmp_path / "more.yaml"
    sd_yaml.write_text(
        f"- targets: ['127.0.0.1:{exposition_port}']\n  labels: {{env: y}}\n"
    )
    sc2 = Scraper(
        ingest,
        [
            {
                "job_name": "fsdy",
                "file_sd_configs": [{"files": [str(tmp_path / "*.yaml")]}],
            }
        ],
    )
    assert len(sc2.targets) == 1 and sc2.targets[0].labels["env"] == "y"


def test_http_sd_configs_live_swap(spark, exposition_port):
    """http_sd_configs (lib/promscrape/discovery/http): targets come
    from a GET returning [{targets, labels}], carry __meta_url, swap
    only when the response bytes change, keep last-known-good on a
    fetch error, and count fetch/parse errors."""
    from victoriametrics_spark.streaming.scraper import Scraper

    state = {"body": json.dumps(
        [{"targets": [f"127.0.0.1:{exposition_port}"],
          "labels": {"env": "a"}}]
    ), "code": 200, "headers": []}

    class _SD(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            state["headers"].append(dict(self.headers))
            if state["code"] != 200:
                self.send_error(state["code"])
                return
            body = state["body"].encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    sd_srv = ThreadingHTTPServer(("127.0.0.1", 0), _SD)
    threading.Thread(target=sd_srv.serve_forever, daemon=True).start()
    sd_url = f"http://127.0.0.1:{sd_srv.server_address[1]}/sd"
    try:
        captured = []
        ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
        sc = Scraper(
            ingest,
            [
                {
                    "job_name": "hsd",
                    "http_sd_configs": [
                        {"url": sd_url, "refresh_interval": "10s"}
                    ],
                }
            ],
        )
        assert len(sc.targets) == 1
        t = sc.targets[0]
        assert t.discovered["__meta_url"] == sd_url
        assert t.labels["env"] == "a"
        # reference header set (api.go:126-135)
        h = state["headers"][-1]
        assert h.get("Accept") == "application/json"
        assert "X-Prometheus-Refresh-Interval-Seconds" in h
        sc.scrape_once()
        rows = [r for df in captured for r in df.collect()]
        assert any(
            r["name"] == "scraped_metric" and r["labels"].get("env") == "a"
            for r in rows
        )

        # unchanged response bytes → no swap (api.go:111-113)
        assert sc.check_http_sd(force=True) is False
        assert sc.targets[0] is t and t.removed is False

        # mutate the endpoint: new label set + a second (dead) target
        state["body"] = json.dumps([
            {"targets": [f"127.0.0.1:{exposition_port}"],
             "labels": {"env": "b"}},
            {"targets": ["127.0.0.1:1"], "labels": {"env": "dead"}},
        ])
        assert sc.check_http_sd(force=True) is True
        assert t.removed is True
        assert len(sc.targets) == 2
        assert {x.labels["env"] for x in sc.targets} == {"b", "dead"}

        # fetch error: last-known-good targets stay, counter ticks
        state["code"] = 500
        assert sc.check_http_sd(force=True) is False
        assert len(sc.targets) == 2
        assert sc.http_sd_errors_total["fetch"] == 1

        # parse error: same
        state["code"] = 200
        state["body"] = "{not json["
        assert sc.check_http_sd(force=True) is False
        assert len(sc.targets) == 2
        assert sc.http_sd_errors_total["parse"] == 1

        # recovery re-swaps even though the last GOOD bytes differ only
        # via the error episodes (prev reset on error)
        state["body"] = json.dumps(
            [{"targets": [f"127.0.0.1:{exposition_port}"],
              "labels": {"env": "c"}}]
        )
        assert sc.check_http_sd(force=True) is True
        assert {x.labels["env"] for x in sc.targets} == {"c"}
    finally:
        sd_srv.shutdown()


def test_scrape_auth_headers(spark, tmp_path):
    """basic_auth / bearer_token(_file) / authorization blocks send the
    right Authorization header (lib/promauth HTTPClientConfig)."""
    import base64

    from victoriametrics_spark.streaming.scraper import Scraper

    seen = []

    class _AuthExpo(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            seen.append(self.headers.get("Authorization"))
            body = b"authed_metric 1\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _AuthExpo)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        tokf = tmp_path / "tok"
        tokf.write_text("file-token\n")
        captured = []
        ingest = IngestAPI(
            spark, sink=lambda df, kind: captured.append(df)
        )
        sc = Scraper(
            ingest,
            [
                {
                    "job_name": "ba",
                    "basic_auth": {"username": "u", "password": "p"},
                    "static_configs": [{"targets": [f"127.0.0.1:{port}"]}],
                },
                {
                    "job_name": "bt",
                    "bearer_token": "tok123",
                    "static_configs": [{"targets": [f"127.0.0.1:{port}"]}],
                },
                {
                    "job_name": "btf",
                    "bearer_token_file": str(tokf),
                    "static_configs": [{"targets": [f"127.0.0.1:{port}"]}],
                },
            ],
        )
        sc.scrape_once()
        expect_basic = "Basic " + base64.b64encode(b"u:p").decode()
        assert seen == [expect_basic, "Bearer tok123", "Bearer file-token"]
    finally:
        srv.shutdown()


def test_honor_timestamps(spark):
    """honor_timestamps defaults FALSE contrary to Prometheus
    (config.go:299-302): body timestamps are replaced with the scrape
    time; honor_timestamps: true keeps them (and a literal 0 still
    takes scrape time, scrapework.go:1169)."""
    from victoriametrics_spark.streaming.scraper import Scraper

    class _TsExpo(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            body = b"ts_metric 5 1234\nzero_ts_metric 6 0\nno_ts_metric 7\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _TsExpo)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]
    try:
        captured = []
        ingest = IngestAPI(
            spark, sink=lambda df, kind: captured.append(df)
        )
        scrape_ms = 9_999_000
        sc = Scraper(
            ingest,
            [
                {
                    "job_name": "default",
                    "static_configs": [{"targets": [f"127.0.0.1:{port}"]}],
                },
                {
                    "job_name": "honored",
                    "honor_timestamps": True,
                    "static_configs": [{"targets": [f"127.0.0.1:{port}"]}],
                },
            ],
            now_ms_fn=lambda: scrape_ms,
        )
        sc.scrape_once()
        rows = [r for df in captured for r in df.collect()]
        by = {
            (r["labels"].get("job"), r["name"]): r["ts"]
            for r in rows
            if not r["name"].startswith(("up", "scrape_"))
        }
        # default: every body timestamp replaced with scrape time
        assert by[("default", "ts_metric")] == scrape_ms
        assert by[("default", "zero_ts_metric")] == scrape_ms
        assert by[("default", "no_ts_metric")] == scrape_ms
        # honored: body ts kept (1234 reads as OpenMetrics seconds,
        # parser.go:218-229); 0 and missing take scrape time
        assert by[("honored", "ts_metric")] == 1_234_000
        assert by[("honored", "zero_ts_metric")] == scrape_ms
        assert by[("honored", "no_ts_metric")] == scrape_ms
    finally:
        srv.shutdown()


def test_scrape_request_headers(spark):
    """Scrape requests carry the Prometheus header set
    (promscrape/client.go:143-160): Accept, User-Agent, and
    X-Prometheus-Scrape-Timeout-Seconds (PushProx-style exporters
    read it)."""
    from victoriametrics_spark.streaming.scraper import Scraper

    seen = {}

    class _HdrExpo(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            seen.update(
                {
                    "accept": self.headers.get("Accept"),
                    "ua": self.headers.get("User-Agent"),
                    "timeout": self.headers.get(
                        "X-Prometheus-Scrape-Timeout-Seconds"
                    ),
                }
            )
            body = b"hdr_metric 1\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _HdrExpo)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ingest = IngestAPI(spark, sink=lambda df, kind: None)
        sc = Scraper(
            ingest,
            [
                {
                    "job_name": "h",
                    "scrape_timeout": "7s",
                    "scrape_interval": "30s",
                    "static_configs": [
                        {"targets": [f"127.0.0.1:{srv.server_address[1]}"]}
                    ],
                }
            ],
        )
        sc.scrape_once()
        assert seen["ua"] == "vm_promscrape"
        assert seen["accept"].startswith("text/plain;version=0.0.4")
        assert seen["timeout"] == "7"
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_stale_markers_on_series_and_target_disappearance(spark):
    """Prometheus staleness markers (scrapework.go:330-360,614-618):
    a series missing from the next scrape gets a stale marker; a
    failed scrape marks everything once (repeats stay silent); a
    target dropped by SD discovery marks all its series + the auto
    series; no_stale_markers disables the whole mechanism."""
    import math

    from victoriametrics_spark.streaming.scraper import (
        Scraper,
        scrape_rows_diff,
    )

    # --- diff identity unit checks (quote-aware, order-insensitive)
    last = 'm{a="x,y",b="1"} 5\nm{b="2",a="z"} 6\nplain 7'
    curr = 'm{b="1",a="x,y"} 50\nplain 70'
    assert scrape_rows_diff(last, curr) == 'm{b="2",a="z"} 6'
    assert scrape_rows_diff(last, "") == last.replace("\n", "\n")

    state = {"body": 'g1{k="v"} 1\ng2 2\n', "fail": False}

    class _Exp(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if state["fail"]:
                self.send_error(500)
                return
            b = state["body"].encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Exp)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    sd = {"body": json.dumps(
        [{"targets": [f"127.0.0.1:{srv.server_address[1]}"]}]
    )}

    class _SD(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            b = sd["body"].encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

        def log_message(self, *a):
            pass

    sd_srv = ThreadingHTTPServer(("127.0.0.1", 0), _SD)
    threading.Thread(target=sd_srv.serve_forever, daemon=True).start()
    try:
        rows = []
        ingest = IngestAPI(spark, sink=lambda df, kind: rows.extend(df.collect()))
        sc = Scraper(
            ingest,
            [{
                "job_name": "st",
                "http_sd_configs": [
                    {"url": f"http://127.0.0.1:{sd_srv.server_address[1]}/sd"}
                ],
            }],
        )

        def stale_rows():
            return [r for r in rows if r["is_stale"]]

        sc.scrape_once()
        assert stale_rows() == []
        # g2 disappears → exactly one stale marker for g2
        state["body"] = 'g1{k="v"} 1\n'
        sc.scrape_once()
        st = stale_rows()
        assert [r["name"] for r in st] == ["g2"]
        assert math.isnan(st[0]["value"])
        rows.clear()
        # scrape failure → marker for the remaining g1, ONCE
        state["fail"] = True
        sc.scrape_once()
        assert [r["name"] for r in stale_rows()] == ["g1"]
        rows.clear()
        sc.scrape_once()  # repeated failure stays silent
        assert stale_rows() == []
        # recovery re-establishes, then target removal via SD swap
        state["fail"] = False
        sc.scrape_once()
        rows.clear()
        sd["body"] = json.dumps([])  # target gone
        assert sc.check_http_sd(force=True) is True
        names = sorted({r["name"] for r in stale_rows()})
        assert "g1" in names and "up" in names
        assert "scrape_duration_seconds" in names

        # no_stale_markers silences everything
        rows.clear()
        sd2 = json.dumps(
            [{"targets": [f"127.0.0.1:{srv.server_address[1]}"]}]
        )
        sd["body"] = sd2
        sc2 = Scraper(
            ingest,
            [{
                "job_name": "st2",
                "no_stale_markers": True,
                "http_sd_configs": [
                    {"url": f"http://127.0.0.1:{sd_srv.server_address[1]}/sd"}
                ],
            }],
        )
        sc2.scrape_once()
        state["body"] = ""
        sc2.scrape_once()
        assert stale_rows() == []
    finally:
        srv.shutdown()
        sd_srv.shutdown()


def test_auto_metrics_full_set(spark, exposition_port):
    """The full reference auto-metric family (addAutoMetrics,
    scrapework.go:993-1016): response size, post-relabel count,
    series_added (new-series diff vs last scrape, disabled by
    no_stale_markers)."""
    from victoriametrics_spark.streaming.scraper import Scraper

    captured = []
    ingest = IngestAPI(spark, sink=lambda df, kind: captured.append(df))
    sc = Scraper(
        ingest,
        [{
            "job_name": "am",
            "static_configs": [
                {"targets": [f"127.0.0.1:{exposition_port}"]}
            ],
            "metric_relabel_configs": [
                {"action": "drop",
                 "source_labels": ["foo"], "regex": "baz"}
            ],
        }],
    )
    sc.scrape_once()
    rows = [r for df in captured for r in df.collect()]
    by = {r["name"]: r["value"] for r in rows}
    assert by["scrape_samples_scraped"] == 2.0       # parsed rows
    assert by["scrape_samples_post_metric_relabeling"] == 1.0  # drop hit
    assert by["scrape_response_size_bytes"] == float(
        len(EXPOSITION.encode())
    )
    assert by["scrape_series_added"] == 2.0          # first scrape: all new
    captured.clear()
    sc.scrape_once()  # identical body → nothing new
    rows = [r for df in captured for r in df.collect()]
    by = {r["name"]: r["value"] for r in rows}
    assert by["scrape_series_added"] == 0.0
