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
    ):
        self.job = job
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

    def __init__(self, ingest_api, scrape_configs, now_ms_fn=None):
        """``scrape_configs``: a list of scrape-config dicts, or a full
        Prometheus-shaped config dict with a ``global`` section
        (GlobalConfig, config.go:278-287): global
        scrape_interval/scrape_timeout/sample_limit defaults,
        relabel_configs/metric_relabel_configs prepended to every
        job's own (config.go:958-972), and external_labels attached
        to every scraped sample at lowest precedence."""
        self.ingest = ingest_api
        self.now_ms = now_ms_fn or (lambda: int(time.time() * 1000))
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
        for cfg in cfg_list:
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
            scheme = cfg.get("scheme") or "http"
            path = cfg.get("metrics_path") or DEFAULT_METRICS_PATH
            honor = bool(cfg.get("honor_labels"))
            relabel_rules = g_relabel + (cfg.get("relabel_configs") or [])
            metric_rules = g_metric_relabel + (
                cfg.get("metric_relabel_configs") or []
            )
            sample_limit = int(cfg.get("sample_limit") or g_sample_limit)
            candidates = []
            for sc in cfg.get("static_configs", ()):
                lbls = {
                    str(k): str(v)
                    for k, v in (sc.get("labels") or {}).items()
                }
                for addr in sc.get("targets", ()):
                    candidates.append(
                        ScrapeTarget(
                            job, str(addr), scheme, path, interval,
                            timeout, honor, lbls,
                            metric_relabel_configs=metric_rules,
                            sample_limit=sample_limit,
                        )
                    )
            if not relabel_rules:
                self.targets.extend(candidates)
                continue
            # target relabeling over ALL of this config's candidates in
            # one frame (the same DSL samples relabel with); a candidate
            # relabeled away becomes a droppedTarget, survivors rebuild
            # their scrape identity from the relabeled label set
            relabeled = self._target_relabel(candidates, relabel_rules)
            for cand, out in zip(candidates, relabeled):
                if out is None:
                    self.dropped.append(dict(cand.discovered))
                    continue
                t = ScrapeTarget(
                    cand.job, cand.discovered["__address__"],
                    scheme, path, interval, timeout, honor, {},
                    relabeled=out,
                    metric_relabel_configs=metric_rules,
                    sample_limit=sample_limit,
                )
                # discoveredLabels stay the PRE-relabel identity
                # (Config.OriginalLabels in WriteActiveTargetsJSON)
                t.discovered = dict(cand.discovered)
                self.targets.append(t)

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
        req = urllib.request.Request(
            t.url, headers={"User-Agent": "vm_promscrape"}
        )
        with urllib.request.urlopen(req, timeout=t.timeout_s) as resp:
            return resp.read().decode("utf-8", "replace")

    def scrape_target(self, t: ScrapeTarget) -> None:
        """One scrape of one target: fetch, ingest body with target
        identity labels (honor_labels semantics), append auto-metrics,
        update target state."""
        ts_ms = self.now_ms()
        t0 = time.monotonic()
        t.scrapes_total += 1
        try:
            body = self._fetch(t)
            n = self.ingest.ingest_scrape(
                body, t.labels, t.honor_labels, ts_ms,
                metric_relabel_configs=t.metric_relabel_configs,
                sample_limit=t.sample_limit,
                scrape_url=t.url,
                external_labels=self.external_labels,
            )
            dur = time.monotonic() - t0
            up, err, samples = True, "", int(n)
        except Exception as e:  # noqa: BLE001 — any failure = target down
            dur = time.monotonic() - t0
            # a sample_limit breach still reports the REAL parsed count
            # (the reference computes samplesScraped before the check)
            up, err = False, str(e)
            samples = int(getattr(e, "samples", 0))
        # auto-metrics ride the normal ingest path with the target's
        # identity labels (scrapework.go addAutoMetrics; the subset
        # that doesn't require relabel/series-limit state) — ingested
        # BEFORE the status publishes, so a /api/v1/targets reader that
        # sees health=up can already query this scrape's `up` series
        auto = [
            ("scrape_duration_seconds", dur),
            ("scrape_samples_scraped", float(samples)),
            ("scrape_timeout_seconds", t.timeout_s),
            ("up", 1.0 if up else 0.0),
        ]
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

    def scrape_once(self) -> None:
        """Synchronously scrape every target once (tests + first tick)."""
        for t in self.targets:
            self.scrape_target(t)

    # ---------------------------------------------------------- lifecycle
    def start(self) -> None:
        """One thread per target (the reference runs one goroutine per
        scrapeWork, scraper.go) — a dead target blocking in its fetch
        up to scrape_timeout never delays any other target past its
        own interval."""
        if self._threads:
            return
        self._stop.clear()

        def _loop(t: ScrapeTarget):
            while not self._stop.is_set():
                started = time.monotonic()
                self.scrape_target(t)
                elapsed = time.monotonic() - started
                self._stop.wait(max(0.05, t.interval_s - elapsed))

        for t in self.targets:
            th = threading.Thread(
                target=_loop,
                args=(t,),
                name=f"vm-promscrape-{t.job}-{t.address}",
                daemon=True,
            )
            th.start()
            self._threads.append(th)

    def stop(self) -> None:
        self._stop.set()
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
