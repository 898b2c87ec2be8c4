"""Embedded Prometheus scraper — the -promscrape.config static subset.

Mirrors lib/promscrape: scrape_configs with static_configs,
scrape_interval / scrape_timeout, metrics_path (default /metrics),
scheme (default http), honor_labels and job_name
(lib/promscrape/config.go:281-297,1333-1392), scraping over plain HTTP
and feeding each response body through the SAME exposition-parse →
ingest path as /api/v1/import/prometheus. Per-scrape auto-metrics
(`up`, `scrape_duration_seconds`, `scrape_samples_scraped`,
`scrape_timeout_seconds`, ... — scrapework.go:1013-1044 addAutoMetrics)
are appended with the target's identity labels. Target state feeds
/api/v1/targets in the reference's JSON shape
(targetstatus.go:256-292 WriteActiveTargetsJSON).

Scraping is driver-side by design: scrape bodies are
presentation-sized HTTP responses arriving once per interval; the
parse and append fan out over Spark exactly like every other ingest
route, so at scale the scraper is a thin scheduler in front of the
distributed write path (the reference's vmagent plays the same role
in front of vminsert).
"""

from __future__ import annotations

import threading
import time
import urllib.request
from datetime import datetime, timezone

from pyspark.sql import functions as F

DEFAULT_SCRAPE_INTERVAL_S = 60.0
DEFAULT_METRICS_PATH = "/metrics"


def _parse_duration_s(v, default: float) -> float:
    """scrape_interval/scrape_timeout YAML values: a number (seconds)
    or a Prometheus duration string (30s, 1m, ...)."""
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return float(v)
    from victoriametrics_spark.metricsql.ast import DurationExpr

    return DurationExpr(str(v)).ms(0) / 1000.0


def _auth_header(cfg: dict) -> "str | None":
    """Authorization header from a scrape config's client-auth fields
    (lib/promauth HTTPClientConfig, config.go:281-340): ``basic_auth``
    (username + password or password_file), ``bearer_token``,
    ``bearer_token_file``, or the generic ``authorization`` block
    (type default Bearer, credentials or credentials_file)."""

    def _read(path) -> str:
        with open(path, encoding="utf-8") as fh:
            return fh.read().strip()

    ba = cfg.get("basic_auth")
    if ba:
        import base64

        user = str(ba.get("username") or "")
        pwd = ba.get("password")
        if pwd is None and ba.get("password_file"):
            pwd = _read(ba["password_file"])
        raw = f"{user}:{pwd or ''}".encode()
        return "Basic " + base64.b64encode(raw).decode()
    tok = cfg.get("bearer_token")
    if not tok and cfg.get("bearer_token_file"):
        tok = _read(cfg["bearer_token_file"])
    if tok:
        return "Bearer " + str(tok)
    az = cfg.get("authorization")
    if az:
        typ = str(az.get("type") or "Bearer")
        cred = az.get("credentials")
        if cred is None and az.get("credentials_file"):
            cred = _read(az["credentials_file"])
        if cred:
            return f"{typ} {cred}"
    return None


def _series_key(line: str) -> "str | None":
    """Canonical series identity of one exposition line: metric name +
    SORTED label pairs (quote-aware — a ``}``/``,`` inside a quoted
    value must not truncate the block). The GetRowsDiff analog's
    identity function (lib/protoparser/prometheus GetRowsDiff): two
    scrapes expose the same series iff these keys match."""
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    brace = line.find("{")
    sp = line.find(" ")
    if brace == -1 or (sp != -1 and sp < brace):
        # bare metric
        name = line.split(None, 1)[0]
        return name if name else None
    name = line[:brace].strip()
    i, n = brace + 1, len(line)
    labels = []
    start = i
    in_q = False
    while i < n:
        c = line[i]
        if in_q:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_q = False
        elif c == '"':
            in_q = True
        elif c == ",":
            if line[start:i].strip():
                labels.append(line[start:i].strip())
            start = i + 1
        elif c == "}":
            if line[start:i].strip():
                labels.append(line[start:i].strip())
            return name + "{" + ",".join(sorted(labels)) + "}"
        i += 1
    return None  # unterminated block — not a series


def scrape_rows_diff(last_body: str, curr_body: str) -> str:
    """Lines of ``last_body`` whose series identity does NOT appear in
    ``curr_body`` (parser.GetRowsDiff): the disappeared series that
    need staleness markers. A failed scrape passes curr_body=''."""
    curr_keys = {
        k
        for k in (_series_key(ln) for ln in curr_body.splitlines())
        if k is not None
    }
    out = []
    for ln in last_body.splitlines():
        k = _series_key(ln)
        if k is not None and k not in curr_keys:
            out.append(ln.strip())
    return "\n".join(out)


class ScrapeTarget:
    """One resolved static target: config identity + mutable scrape
    state (targetStatus, targetstatus.go:307-317)."""

    def __init__(
        self,
        job: str,
        address: str,
        scheme: str,
        metrics_path: str,
        interval_s: float,
        timeout_s: float,
        honor_labels: bool,
        labels: dict[str, str],
        relabeled: "dict[str, str] | None" = None,
        metric_relabel_configs: "list | None" = None,
        sample_limit: int = 0,
        honor_timestamps: bool = False,
        auth_header: "str | None" = None,
        group: str = "static",
    ):
        self.job = job
        # honor_timestamps defaults FALSE like the reference
        # (config.go:299-302, contrary to Prometheus)
        self.honor_timestamps = bool(honor_timestamps)
        # Authorization header from basic_auth / bearer_token(_file) /
        # authorization config (lib/promauth HTTPClientConfig)
        self.auth_header = auth_header
        # which discovery group owns this target ("static" or the
        # file_sd group key) — file_sd reloads replace only their own
        self.group = group
        # set when a file_sd reload drops this target; its scrape loop
        # exits on the next tick
        self.removed = False
        # staleness-marker state (scrapework.go lastScrape /
        # lastScrapeSuccess): the last SUCCESSFUL scrape body and
        # whether the previous scrape succeeded; no_stale_markers is
        # set from the scrape config by the candidate builders
        self.last_scrape_body: "str | None" = None
        self.last_scrape_success = False
        self.no_stale_markers = False
        # the scrape pool stays the CONFIG's job_name even when
        # relabel_configs rewrite the job label (jobNameOriginal,
        # targetstatus.go:262)
        self.pool = job
        self.interval_s = interval_s
        self.timeout_s = timeout_s
        self.honor_labels = honor_labels
        self.metric_relabel_configs = metric_relabel_configs or []
        self.sample_limit = int(sample_limit)
        # discovered labels (pre-relabel identity: __address__ etc.,
        # config.go:1388-1392)
        self.discovered = {
            "__address__": address,
            "__metrics_path__": metrics_path,
            "__scheme__": scheme,
            "__scrape_interval__": f"{interval_s:g}s",
            "__scrape_timeout__": f"{timeout_s:g}s",
            "job": job,
            **labels,
        }
        # relabel_configs may rewrite the scrape identity
        # (__address__/__scheme__/__metrics_path__/job) before
        # finalization (config.go getScrapeWorkConfig → promrelabel)
        eff = dict(relabeled) if relabeled is not None else dict(
            self.discovered
        )
        self.address = address = eff.get("__address__", address)
        self.scheme = scheme = eff.get("__scheme__", scheme)
        self.metrics_path = metrics_path = eff.get(
            "__metrics_path__", metrics_path
        )
        self.job = job = eff.get("job", job)
        # final identity labels: FinalizeLabels drops __*-prefixed
        # labels, instance defaults to __address__
        # (config.go:1333-1336)
        self.labels = {
            k: v for k, v in eff.items() if not k.startswith("__")
        }
        self.labels.setdefault("job", job)
        if not self.labels.get("instance"):
            self.labels["instance"] = address
        path = metrics_path if metrics_path.startswith("/") else "/" + metrics_path
        self.url = f"{scheme}://{address}{path}"
        # mutable state
        self.up = False
        self.last_scrape_ms = 0
        self.last_duration_s = 0.0
        self.last_samples = 0
        self.last_error = ""
        self.scrapes_total = 0
        self.scrapes_failed = 0


class Scraper:
    """Background scraper over an IngestAPI (the vmagent-in-vmsingle
    analog, app/victoria-metrics/main.go promscrape.Init)."""

    def __init__(
        self, ingest_api, scrape_configs, now_ms_fn=None,
        no_stale_markers: bool = False,
    ):
        """``scrape_configs``: a list of scrape-config dicts, or a full
        Prometheus-shaped config dict with a ``global`` section
        (GlobalConfig, config.go:278-287): global
        scrape_interval/scrape_timeout/sample_limit defaults,
        relabel_configs/metric_relabel_configs prepended to every
        job's own (config.go:958-972), and external_labels attached
        to every scraped sample at lowest precedence."""
        self.ingest = ingest_api
        self.now_ms = now_ms_fn or (lambda: int(time.time() * 1000))
        # -promscrape.noStaleMarkers analog (config.go:55)
        self.no_stale_markers = bool(no_stale_markers)
        self.targets: list[ScrapeTarget] = []
        self._configs = scrape_configs
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._lock = threading.Lock()
        if isinstance(scrape_configs, dict):
            g = scrape_configs.get("global") or {}
            cfg_list = scrape_configs.get("scrape_configs") or []
        else:
            g, cfg_list = {}, scrape_configs
        g_interval = _parse_duration_s(
            g.get("scrape_interval"), DEFAULT_SCRAPE_INTERVAL_S
        )
        g_timeout = _parse_duration_s(g.get("scrape_timeout"), 10.0)
        g_sample_limit = int(g.get("sample_limit") or 0)
        g_relabel = g.get("relabel_configs") or []
        g_metric_relabel = g.get("metric_relabel_configs") or []
        self.external_labels = {
            str(k): str(v)
            for k, v in (g.get("external_labels") or {}).items()
        }
        # targets dropped by relabel_configs, reported at
        # /api/v1/targets droppedTargets (WriteDroppedTargetsJSON,
        # targetstatus.go:415-428: discoveredLabels only)
        self.dropped: list[dict] = []
        # file-based service discovery groups (config.go:438-444 +
        # getFileSDScrapeWork): re-read on mtime change, like
        # -promscrape.fileSDCheckInterval (refresh_interval is ignored
        # by the reference too)
        self.file_sd_check_interval_s = float(
            (g.get("file_sd_check_interval") or 30.0)
            if isinstance(g, dict)
            else 30.0
        )
        self._file_sd_groups: list[dict] = []
        # HTTP-based service discovery groups (discovery/http/api.go):
        # GET url → JSON [{targets, labels}], swap on content change.
        # Check cadence = max(SDCheckInterval/2, 1s) in the reference;
        # here per-group refresh_interval (Prometheus key) with the
        # same floor.
        self._http_sd_groups: list[dict] = []
        self.http_sd_errors_total: dict[str, int] = {}
        self._running = False
        for ci, cfg in enumerate(cfg_list):
            job = cfg.get("job_name") or "unnamed"
            interval = _parse_duration_s(
                cfg.get("scrape_interval"), g_interval
            )
            # Prometheus clamps scrape_timeout to scrape_interval
            # (config.go:916)
            timeout = min(
                _parse_duration_s(cfg.get("scrape_timeout"), g_timeout),
                interval,
            )
            ctx = {
                "job": job,
                "interval": interval,
                "timeout": timeout,
                "scheme": cfg.get("scheme") or "http",
                "path": cfg.get("metrics_path") or DEFAULT_METRICS_PATH,
                "honor": bool(cfg.get("honor_labels")),
                # false by default, contrary to Prometheus
                # (config.go:299-302)
                "honor_timestamps": bool(cfg.get("honor_timestamps")),
                "relabel_rules": g_relabel
                + (cfg.get("relabel_configs") or []),
                "metric_rules": g_metric_relabel
                + (cfg.get("metric_relabel_configs") or []),
                "sample_limit": int(
                    cfg.get("sample_limit") or g_sample_limit
                ),
                "auth_header": _auth_header(cfg),
                # per-config no_stale_markers overrides the global
                # -promscrape.noStaleMarkers analog (config.go:982,1021)
                "no_stale_markers": bool(
                    cfg.get(
                        "no_stale_markers", self.no_stale_markers
                    )
                ),
            }
            self.targets.extend(
                self._finalize_candidates(
                    self._make_candidates(
                        ctx, cfg.get("static_configs", ()), {}
                    ),
                    ctx,
                )
            )
            for fsd in cfg.get("file_sd_configs", ()) or ():
                group = {
                    "key": f"file_sd:{ci}:{job}",
                    "ctx": ctx,
                    "files": list(fsd.get("files") or ()),
                    "sig": None,  # (path, mtime) snapshot
                }
                self._file_sd_groups.append(group)
                self._reload_file_sd_group(group)
            for hi, hsd in enumerate(cfg.get("http_sd_configs", ()) or ()):
                url = str(hsd.get("url") or "")
                if not url:
                    continue
                group = {
                    "key": f"http_sd:{ci}:{hi}:{job}",
                    "ctx": ctx,
                    "url": url,
                    "refresh_s": max(
                        _parse_duration_s(
                            hsd.get("refresh_interval"), 60.0
                        ) / 2,
                        1.0,
                    ),
                    "auth_header": _auth_header(hsd),
                    "prev": None,  # last response bytes (content sig)
                    "due": 0.0,  # monotonic next-check time
                }
                self._http_sd_groups.append(group)
                self._reload_http_sd_group(group)

    # ------------------------------------------------- target construction
    def _make_candidates(self, ctx, static_configs, extra_labels):
        candidates = []
        for sc in static_configs:
            lbls = {
                str(k): str(v) for k, v in (sc.get("labels") or {}).items()
            }
            lbls.update(extra_labels)
            for addr in sc.get("targets", ()) or ():
                candidates.append(
                    ScrapeTarget(
                        ctx["job"], str(addr), ctx["scheme"], ctx["path"],
                        ctx["interval"], ctx["timeout"], ctx["honor"],
                        lbls,
                        metric_relabel_configs=ctx["metric_rules"],
                        sample_limit=ctx["sample_limit"],
                        honor_timestamps=ctx["honor_timestamps"],
                        auth_header=ctx["auth_header"],
                    )
                )
        return candidates

    def _finalize_candidates(self, candidates, ctx, group="static"):
        """Apply the config's relabel_configs: a candidate relabeled
        away becomes a droppedTarget, survivors rebuild their scrape
        identity from the relabeled label set."""
        for c in candidates:
            c.group = group
            c.no_stale_markers = bool(ctx.get("no_stale_markers"))
        if not ctx["relabel_rules"]:
            return candidates
        out_targets = []
        relabeled = self._target_relabel(candidates, ctx["relabel_rules"])
        for cand, out in zip(candidates, relabeled):
            if out is None:
                self.dropped.append(dict(cand.discovered))
                continue
            t = ScrapeTarget(
                cand.job, cand.discovered["__address__"],
                ctx["scheme"], ctx["path"], ctx["interval"],
                ctx["timeout"], ctx["honor"], {},
                relabeled=out,
                metric_relabel_configs=ctx["metric_rules"],
                sample_limit=ctx["sample_limit"],
                honor_timestamps=ctx["honor_timestamps"],
                auth_header=ctx["auth_header"],
                group=group,
            )
            # discoveredLabels stay the PRE-relabel identity
            # (Config.OriginalLabels in WriteActiveTargetsJSON)
            t.discovered = dict(cand.discovered)
            t.no_stale_markers = bool(ctx.get("no_stale_markers"))
            out_targets.append(t)
        return out_targets

    # ----------------------------------------------------------- file_sd
    @staticmethod
    def _file_sd_paths(group) -> list[str]:
        import glob as _glob

        paths = []
        for pattern in group["files"]:
            if any(ch in pattern for ch in "*?["):
                paths.extend(sorted(_glob.glob(pattern)))
            else:
                paths.append(pattern)
        return paths

    def _file_sd_signature(self, group):
        sig = []
        import os as _os

        for p in self._file_sd_paths(group):
            try:
                sig.append((p, _os.stat(p).st_mtime_ns))
            except OSError:
                sig.append((p, None))
        return tuple(sig)

    def _reload_file_sd_group(self, group) -> None:
        """(Re)read the group's files and swap its targets in. JSON and
        YAML static-config lists are accepted (loadStaticConfigs); a
        broken file is skipped, the other files still load
        (config.go:1110-1119). Each target gets the __meta_filepath
        meta label (config.go:1129)."""
        import json as _json

        group["sig"] = self._file_sd_signature(group)
        candidates = []
        for p in self._file_sd_paths(group):
            try:
                with open(p, encoding="utf-8") as fh:
                    text = fh.read()
                try:
                    stcs = _json.loads(text)
                except ValueError:
                    import yaml as _yaml

                    stcs = _yaml.safe_load(text)
                if not isinstance(stcs, list):
                    continue
            except Exception:  # noqa: BLE001 — skip broken file
                continue
            candidates.extend(
                self._make_candidates(
                    group["ctx"], stcs, {"__meta_filepath": p}
                )
            )
        fresh = self._finalize_candidates(
            candidates, group["ctx"], group=group["key"]
        )
        with self._lock:
            dropped = [t for t in self.targets if t.group == group["key"]]
            for t in dropped:
                t.removed = True
            self.targets = [
                t for t in self.targets if t.group != group["key"]
            ] + fresh
        for t in dropped:
            self.send_target_removed_markers(t)
        if self._running:
            for t in fresh:
                self._spawn(t)

    def check_file_sd(self) -> bool:
        """Re-read any file_sd group whose files changed on disk
        (mtime/path-set signature); returns True when something
        reloaded. The background watcher calls this every
        ``file_sd_check_interval_s``; tests call it synchronously."""
        changed = False
        for group in self._file_sd_groups:
            if self._file_sd_signature(group) != group["sig"]:
                self._reload_file_sd_group(group)
                changed = True
        return changed

    # ----------------------------------------------------------- http_sd
    def _http_sd_fetch(self, group) -> bytes:
        """GET the http_sd url with the reference's header set
        (discovery/http/api.go:126-135:
        X-Prometheus-Refresh-Interval-Seconds + Accept json)."""
        import urllib.request as _rq

        req = _rq.Request(group["url"])
        req.add_header(
            "X-Prometheus-Refresh-Interval-Seconds",
            f"{group['refresh_s']:.0f}",
        )
        req.add_header("Accept", "application/json")
        if group.get("auth_header"):
            req.add_header("Authorization", group["auth_header"])
        with _rq.urlopen(req, timeout=group["ctx"]["timeout"]) as r:
            return r.read()

    def _reload_http_sd_group(self, group) -> bool:
        """Fetch the target list; swap the group's targets only when
        the response bytes changed (refreshTargetsIfNeeded,
        api.go:104-124: bytes-equal short-circuit). Fetch/parse errors
        count into promscrape_discovery_http_errors_total and KEEP the
        last-known-good targets (promscrape keeps stale targets on SD
        failure rather than scaling to zero)."""
        import json as _json

        try:
            data = self._http_sd_fetch(group)
        except Exception:  # noqa: BLE001 — fetch error: retry next tick
            self.http_sd_errors_total["fetch"] = (
                self.http_sd_errors_total.get("fetch", 0) + 1
            )
            group["prev"] = None
            return False
        if group["prev"] is not None and data == group["prev"]:
            return False
        try:
            stcs = _json.loads(data)
            if not isinstance(stcs, list):
                raise ValueError("http_sd response is not a list")
            for tg in stcs:
                if not isinstance(tg, dict):
                    raise ValueError("http_sd target group is not an object")
        except Exception:  # noqa: BLE001 — parse error: count, keep old
            self.http_sd_errors_total["parse"] = (
                self.http_sd_errors_total.get("parse", 0) + 1
            )
            group["prev"] = None
            return False
        group["prev"] = data
        # the [{targets, labels}] shape matches static_configs, so the
        # same candidate builder applies; __meta_url per
        # addHTTPTargetLabels (http.go:58-73)
        candidates = self._make_candidates(
            group["ctx"], stcs, {"__meta_url": group["url"]}
        )
        fresh = self._finalize_candidates(
            candidates, group["ctx"], group=group["key"]
        )
        with self._lock:
            dropped = [t for t in self.targets if t.group == group["key"]]
            for t in dropped:
                t.removed = True
            self.targets = [
                t for t in self.targets if t.group != group["key"]
            ] + fresh
        for t in dropped:
            # staleness markers for the disappeared targets' series
            # (scrapework.go:347-355)
            self.send_target_removed_markers(t)
        if self._running:
            for t in fresh:
                self._spawn(t)
        return True

    def check_http_sd(self, force: bool = False) -> bool:
        """Refresh http_sd groups whose refresh interval elapsed
        (or all, with force=True — tests call this synchronously)."""
        import time as _time

        changed = False
        now = _time.monotonic()
        for group in self._http_sd_groups:
            if not force and now < group["due"]:
                continue
            group["due"] = now + group["refresh_s"]
            if self._reload_http_sd_group(group):
                changed = True
        return changed

    def _target_relabel(self, candidates, rules) -> "list[dict | None]":
        """Apply relabel_configs to every candidate's discovered label
        set in ONE Spark frame; None = target dropped by relabeling.

        Deliberately Spark-backed even though the candidate list is
        driver-sized: the 18-action relabel DSL lives as Column
        expressions (streaming/relabel.py), and re-implementing it
        driver-side would fork the semantics the samples path is
        tested against. Cost: one Spark job at construction per
        relabeled scrape_config — static configs resolve once, never
        per scrape."""
        from victoriametrics_spark.streaming.relabel import relabel

        spark = self.ingest.spark
        df = spark.createDataFrame(
            [
                (i, "", dict(c.discovered), 0, 0.0, False)
                for i, c in enumerate(candidates)
            ],
            "idx long, name string, labels map<string,string>, "
            "ts long, value double, is_stale boolean",
        )
        out = relabel(df, rules)
        kept = {
            r["idx"]: dict(r["labels"] or {})
            for r in out.select("idx", "labels").collect()
        }
        return [kept.get(i) for i in range(len(candidates))]

    # ---------------------------------------------------------- scraping
    def _fetch(self, t: ScrapeTarget) -> str:
        # the header set Prometheus/vmagent send (promscrape/client.go:
        # 143-160): exporters like PushProx read the timeout header
        headers = {
            "User-Agent": "vm_promscrape",
            "Accept": "text/plain;version=0.0.4;q=1,*/*;q=0.1",
            "X-Prometheus-Scrape-Timeout-Seconds": f"{t.timeout_s:g}",
        }
        if t.auth_header:
            headers["Authorization"] = t.auth_header
        req = urllib.request.Request(t.url, headers=headers)
        with urllib.request.urlopen(req, timeout=t.timeout_s) as resp:
            return resp.read().decode("utf-8", "replace")

    def scrape_target(self, t: ScrapeTarget) -> None:
        """One scrape of one target: fetch, ingest body with target
        identity labels (honor_labels semantics), append auto-metrics,
        update target state."""
        ts_ms = self.now_ms()
        t0 = time.monotonic()
        t.scrapes_total += 1
        counts: dict = {}
        body = ""
        try:
            body = self._fetch(t)
            n = self.ingest.ingest_scrape(
                body, t.labels, t.honor_labels, ts_ms,
                metric_relabel_configs=t.metric_relabel_configs,
                sample_limit=t.sample_limit,
                scrape_url=t.url,
                external_labels=self.external_labels,
                honor_timestamps=t.honor_timestamps,
                counts=counts,
            )
            dur = time.monotonic() - t0
            # samplesScraped = PARSED rows (pre-relabel), like the
            # reference computes it before any drop (scrapework.go)
            up, err = True, ""
            samples = int(counts.get("parsed", n))
        except Exception as e:  # noqa: BLE001 — any failure = target down
            dur = time.monotonic() - t0
            # a sample_limit breach still reports the REAL parsed count
            # (the reference computes samplesScraped before the check)
            up, err = False, str(e)
            samples = int(getattr(e, "samples", counts.get("parsed", 0)))
        # auto-metrics ride the normal ingest path with the target's
        # identity labels (scrapework.go addAutoMetrics; the subset
        # that doesn't require relabel/series-limit state) — ingested
        # BEFORE the status publishes, so a /api/v1/targets reader that
        # sees health=up can already query this scrape's `up` series
        post_relabel = counts.get(
            "post_relabel", counts.get("parsed", samples)
        )
        auto = [
            ("scrape_duration_seconds", dur),
            ("scrape_response_size_bytes", float(len(body.encode()))),
            ("scrape_samples_post_metric_relabeling", float(post_relabel)),
            ("scrape_samples_scraped", float(samples)),
            ("scrape_timeout_seconds", t.timeout_s),
            ("up", 1.0 if up else 0.0),
        ]
        if not t.no_stale_markers:
            # new-series count vs the last scrape, by the same identity
            # diff staleness uses; -promscrape.noStaleMarkers disables
            # populating it (config.go:55)
            last_keys = {
                k
                for k in (
                    _series_key(ln)
                    for ln in (t.last_scrape_body or "").splitlines()
                )
                if k is not None
            }
            curr_keys = {
                k
                for k in (_series_key(ln) for ln in body.splitlines())
                if k is not None
            }
            auto.append(
                ("scrape_series_added", float(len(curr_keys - last_keys)))
            )
        if t.sample_limit > 0:
            # scrape_samples_limit is exposed when sample_limit is set
            # (scrapework.go:1026-1029)
            auto.insert(2, ("scrape_samples_limit", float(t.sample_limit)))
        lines = "\n".join(f"{name} {value:.10g}" for name, value in auto)
        try:
            self.ingest.ingest_scrape(
                lines, t.labels, False, ts_ms,
                external_labels=self.external_labels,
            )
        except Exception:
            pass  # auto-metrics are best-effort
        with self._lock:
            t.up = up
            t.last_error = err
            t.last_samples = samples
            if not up:
                t.scrapes_failed += 1
            t.last_scrape_ms = ts_ms
            t.last_duration_s = dur
        # Staleness markers for disappeared series (scrapework.go:614-618:
        # send when the series set changed AND the previous scrape
        # succeeded or this one did — so a failure sends markers for
        # everything ONCE, and repeated failures stay silent)
        curr_body = body if up else ""
        if (
            not t.no_stale_markers
            and t.last_scrape_body is not None
            and (t.last_scrape_success or up)
        ):
            diff = scrape_rows_diff(t.last_scrape_body, curr_body)
            if diff:
                self._send_stale_markers(t, diff, self.now_ms())
        if up:
            # only a successful scrape updates the last-scrape body
            # (scrapework.go:620-624, issue 10653)
            t.last_scrape_body = body
        t.last_scrape_success = up

    def _send_stale_markers(self, t: ScrapeTarget, lines: str, ts_ms: int) -> None:
        """Ingest staleness markers through the SAME identity pipeline
        as a live scrape (labels, honor semantics, metric relabeling),
        value → stale marker at the real timestamp."""
        try:
            self.ingest.ingest_scrape(
                lines, t.labels, t.honor_labels, ts_ms,
                metric_relabel_configs=t.metric_relabel_configs,
                external_labels=self.external_labels,
                stale_marker=True,
            )
        except Exception:  # noqa: BLE001 — markers are best-effort
            pass

    _AUTO_SERIES = (
        "scrape_duration_seconds",
        "scrape_response_size_bytes",
        "scrape_samples_post_metric_relabeling",
        "scrape_samples_scraped",
        "scrape_series_added",
        "scrape_timeout_seconds",
        "up",
    )

    def send_target_removed_markers(self, t: ScrapeTarget) -> None:
        """Target disappeared from discovery (SD swap): staleness
        markers for every series of its last scrape PLUS the auto
        series (scrapework.go:347-355, addAutoSeries=true). Graceful
        scraper shutdown deliberately does NOT call this
        (scrapework.go:337-340, issue 2013)."""
        if t.no_stale_markers:
            return
        lines = [f"{name} 0" for name in self._AUTO_SERIES]
        if t.sample_limit > 0:
            lines.append("scrape_samples_limit 0")
        body = (t.last_scrape_body or "") + "\n" + "\n".join(lines)
        self._send_stale_markers(t, body, self.now_ms())

    def scrape_once(self) -> None:
        """Synchronously scrape every target once (tests + first tick)."""
        with self._lock:
            targets = list(self.targets)
        for t in targets:
            self.scrape_target(t)

    # ---------------------------------------------------------- lifecycle
    def _spawn(self, t: ScrapeTarget) -> None:
        def _loop():
            while not self._stop.is_set() and not t.removed:
                started = time.monotonic()
                self.scrape_target(t)
                elapsed = time.monotonic() - started
                self._stop.wait(max(0.05, t.interval_s - elapsed))

        th = threading.Thread(
            target=_loop,
            name=f"vm-promscrape-{t.job}-{t.address}",
            daemon=True,
        )
        th.start()
        self._threads.append(th)

    def start(self) -> None:
        """One thread per target (the reference runs one goroutine per
        scrapeWork, scraper.go) — a dead target blocking in its fetch
        up to scrape_timeout never delays any other target past its
        own interval. With file_sd groups, a watcher thread re-reads
        changed files every ``file_sd_check_interval_s`` and swaps the
        affected targets (the -promscrape.fileSDCheckInterval loop)."""
        if self._threads:
            return
        self._stop.clear()
        self._running = True
        with self._lock:
            targets = list(self.targets)
        for t in targets:
            self._spawn(t)
        if self._file_sd_groups or self._http_sd_groups:
            wait_s = self.file_sd_check_interval_s
            if self._http_sd_groups:
                wait_s = min(
                    wait_s,
                    min(g["refresh_s"] for g in self._http_sd_groups),
                )

            def _watch():
                while not self._stop.is_set():
                    self._stop.wait(wait_s)
                    if self._stop.is_set():
                        return
                    try:
                        if self._file_sd_groups:
                            self.check_file_sd()
                        self.check_http_sd()
                    except Exception:  # noqa: BLE001 — keep watching
                        pass

            th = threading.Thread(
                target=_watch, name="vm-promscrape-sd", daemon=True
            )
            th.start()
            self._threads.append(th)

    def stop(self) -> None:
        self._stop.set()
        self._running = False
        for th in self._threads:
            th.join(timeout=5)
        self._threads = []

    # ---------------------------------------------------------- status
    def targets_status(self) -> dict:
        """/api/v1/targets JSON (WriteAPIV1Targets,
        targetstatus.go:74-97 + WriteActiveTargetsJSON shape)."""
        active = []
        with self._lock:
            for t in self.targets:
                last = (
                    datetime.fromtimestamp(
                        t.last_scrape_ms / 1000.0, tz=timezone.utc
                    ).isoformat().replace("+00:00", "Z")
                    if t.last_scrape_ms
                    else "1970-01-01T00:00:00Z"
                )
                active.append(
                    {
                        "discoveredLabels": dict(t.discovered),
                        "labels": dict(t.labels),
                        "scrapePool": t.pool,
                        "scrapeUrl": t.url,
                        "lastError": t.last_error,
                        "lastScrape": last,
                        "lastScrapeDuration": t.last_duration_s,
                        "lastSamplesScraped": t.last_samples,
                        "health": "up" if t.up else "down",
                    }
                )
        return {
            "status": "success",
            "data": {
                "activeTargets": active,
                "droppedTargets": [
                    {"discoveredLabels": dict(d)} for d in self.dropped
                ],
            },
        }

    def config_yaml(self) -> str:
        """-promscrape.config dump for /api/v1/status/config and
        /config (vminsert main.go:351)."""
        import yaml

        cfg = (
            self._configs
            if isinstance(self._configs, dict)
            else {"scrape_configs": self._configs}
        )
        return yaml.safe_dump(cfg, sort_keys=False)


def ingest_scrape_labels(target_labels: dict, honor_labels: bool):
    """Column transform applying scrape identity labels to a parsed
    exposition frame's `labels` map.

    honor_labels=false (default): clashing exposition labels are
    renamed to `exported_<name>` and the target's labels win;
    honor_labels=true: exposition labels win, target labels fill gaps
    (prometheus.io relabeling docs; config.go HonorLabels)."""
    lbl = F.coalesce(F.col("labels"), F.expr("map()"))
    tgt_entries = F.array(
        *[
            F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
            for k, v in target_labels.items()
        ]
    )
    if honor_labels:
        # keep body labels; add only target labels absent from the body
        fill = F.filter(
            tgt_entries, lambda e: ~F.map_contains_key(lbl, e["key"])
        )
        return F.map_from_entries(
            F.concat(fill, F.map_entries(lbl))
        )
    keys = list(target_labels.keys())
    if not keys:
        return lbl
    # a body that ALREADY carries exported_<k> next to <k> (the normal
    # output of federating another honor_labels=false scraper) would
    # collide after the rename — Prometheus overwrites the body's
    # exported_<k> with the renamed one, so drop the shadowed entries
    # first (map_from_entries throws on duplicate keys otherwise)
    renamed = F.transform(
        F.filter(
            F.map_entries(lbl),
            lambda e: ~_shadowed_pred(e, keys, lbl),
        ),
        lambda e: F.struct(
            F.when(
                e["key"].isin(*keys),
                F.concat(F.lit("exported_"), e["key"]),
            )
            .otherwise(e["key"])
            .alias("key"),
            e["value"].alias("value"),
        ),
    )
    return F.map_from_entries(F.concat(renamed, tgt_entries))


def _shadowed_pred(e, keys: list, lbl):
    """True for a body entry `exported_<k>` that the rename of the
    body's own `<k>` is about to overwrite."""
    pred = F.lit(False)
    for k in keys:
        pred = pred | (
            (e["key"] == f"exported_{k}") & F.map_contains_key(lbl, k)
        )
    return pred
