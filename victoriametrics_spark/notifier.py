"""Alertmanager notification delivery — the vmalert notifier rebuilt.

Mirrors app/vmalert/notifier: firing/resolved alerts POST to each
configured Alertmanager URL at ``/api/v2/alerts``
(alertmanager.go:168 alertManagerPath) as a JSON array of
``{startsAt, generatorURL, endsAt?, labels, annotations}`` objects
(alertmanager_request.qtpl:8-34 amRequest — endsAt only present once
the alert resolved). ``/api/v1/notifiers`` lists the targets in the
reference's ApiNotifier/ApiTarget shape (notifier/web.go:4-19,
web.go listNotifiers).

State lives driver-side by design: active-alert maps are
presentation-sized (one entry per firing alert), exactly vmalert's
in-memory alerting-rule state.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.request
from datetime import datetime, timezone

ALERTMANAGER_PATH = "/api/v2/alerts"


def _rfc3339(ms: int) -> str:
    return (
        datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        .isoformat()
        .replace("+00:00", "Z")
    )


class AlertmanagerNotifier:
    """POST alert batches to static Alertmanager addresses
    (-notifier.url analog)."""

    def __init__(self, urls: list[str], timeout_s: float = 10.0):
        self.targets = [
            {"address": u.rstrip("/") + ALERTMANAGER_PATH, "lastError": ""}
            for u in urls
        ]
        self.timeout_s = timeout_s
        self._lock = threading.Lock()

    def send(self, payload: list[dict]) -> None:
        """One delivery attempt per target; failures are recorded on
        the target (ApiTarget.LastError), never raised — one dead
        Alertmanager must not break the rule tick or the other
        targets (alertmanager.go Send error handling)."""
        if not payload:
            return
        body = json.dumps(payload).encode()
        for t in self.targets:
            req = urllib.request.Request(
                t["address"],
                data=body,
                method="POST",
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s):
                    pass
                err = ""
            except Exception as e:  # noqa: BLE001
                err = str(e)
            with self._lock:
                t["lastError"] = err

    def api_notifiers(self) -> dict:
        """/api/v1/notifiers (web.go:674-693 listNotifiers)."""
        with self._lock:
            targets = [
                {
                    "address": t["address"],
                    "labels": {},
                    "lastError": t["lastError"],
                }
                for t in self.targets
            ]
        return {
            "status": "success",
            "data": {
                "notifiers": [{"kind": "alertmanager", "targets": targets}]
            },
        }


class AlertStateTracker:
    """Active-alert map across rule ticks (vmalert alerting.go: the
    rule's ``alerts`` map keyed by labels hash).

    ``update(firing, now_ms)`` takes the CURRENTLY firing alerts
    (label+annotation dicts) and returns the Alertmanager payload for
    this tick: every firing alert (startsAt = when it first fired,
    resent each tick like vmalert's resend loop) plus alerts that
    stopped firing since last tick, once, with endsAt = now."""

    def __init__(self, external_url: str = "http://localhost:8428"):
        self.active: dict[str, dict] = {}
        self.external_url = external_url.rstrip("/")

    @staticmethod
    def _key(labels: dict) -> str:
        return json.dumps(sorted(labels.items()))

    def _generator_url(self, labels: dict) -> str:
        # external.url/vmalert/alert?... analog; the alert identity is
        # enough for a test sink — the reference builds a UI deep-link
        name = labels.get("alertname", "")
        return f"{self.external_url}/vmalert/alert?alertname={name}"

    def update(self, firing: list[dict], now_ms: int) -> list[dict]:
        payload = []
        seen = set()
        for a in firing:
            labels = dict(a.get("labels") or {})
            k = self._key(labels)
            seen.add(k)
            st = self.active.get(k)
            if st is None:
                st = {"starts_ms": now_ms, "labels": labels}
                self.active[k] = st
            st["annotations"] = dict(a.get("annotations") or {})
            payload.append(
                {
                    "startsAt": _rfc3339(st["starts_ms"]),
                    "generatorURL": self._generator_url(labels),
                    "labels": labels,
                    "annotations": st["annotations"],
                }
            )
        # resolved: active last tick, absent now → endsAt = now, sent
        # once (amRequest includes endsAt only when End is set)
        for k in list(self.active):
            if k in seen:
                continue
            st = self.active.pop(k)
            payload.append(
                {
                    "startsAt": _rfc3339(st["starts_ms"]),
                    "generatorURL": self._generator_url(st["labels"]),
                    "endsAt": _rfc3339(now_ms),
                    "labels": st["labels"],
                    "annotations": st.get("annotations", {}),
                }
            )
        return payload


class RulesNotifierRunner:
    """Background rule ticker: every ``interval_s`` evaluate the API's
    alerting rules at "now" and push firing/resolved transitions to the
    notifier (vmalert's group.start eval loop + notifier send)."""

    def __init__(
        self,
        prom_api,
        notifier: AlertmanagerNotifier,
        interval_s: float = 30.0,
        now_ms_fn=None,
    ):
        self.api = prom_api
        self.notifier = notifier
        self.interval_s = interval_s
        self.now_ms = now_ms_fn or (lambda: int(time.time() * 1000))
        self.tracker = AlertStateTracker()
        # latest full alert list (pending+firing) from the background
        # tick — /api/v1/alerts serves THIS without a Spark job, like
        # vmalert's web handler reading the group eval state
        # (app/vmalert/web.go APIv1 alerts)
        self.last_alerts: "list[dict] | None" = None
        self.last_eval_ms = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        # attach so PromAPI.alerts() can serve runner state by default
        prom_api.notifier_runner = self

    def tick(self, now_ms: int | None = None) -> list[dict]:
        """One evaluation+notification pass; returns the payload sent
        (tests call this synchronously)."""
        now_ms = self.now_ms() if now_ms is None else now_ms
        out = self.api.alerts(time=str(now_ms / 1000.0))
        alerts = out["data"]["alerts"]
        firing = [a for a in alerts if a.get("state") == "firing"]
        payload = self.tracker.update(firing, now_ms)
        self.notifier.send(payload)
        self.last_alerts = alerts
        self.last_eval_ms = now_ms
        return payload

    def start(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def _loop():
            while not self._stop.is_set():
                try:
                    self.tick()
                except Exception:  # noqa: BLE001 — keep ticking
                    pass
                self._stop.wait(self.interval_s)

        self._thread = threading.Thread(
            target=_loop, name="vm-rules-notifier", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
