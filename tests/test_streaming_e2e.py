"""End-to-end Structured Streaming ingest proof.

One pipeline, wired exactly like a production deployment
(vmagent scrape -> relabel -> streamaggr -> storage -> query):

  readStream file source (3 microbatches via maxFilesPerTrigger=1)
    -> Prometheus exposition parse (streaming/parsers.py)
    -> relabel DSL (drop + replace, streaming/relabel.py)
    -> stateful streamaggr counters (MicroBatchCounterAggregator)
    -> bucketed storage layout sink (storage/layout.py append_samples)
    -> live /api/v1/query freshness probe after every microbatch

and the final stored result must equal the same data replayed as ONE
batch through the identical operators (the replay==batch property the
streamaggr engine guarantees).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from victoriametrics_spark.api import PromAPI
from victoriametrics_spark.storage.layout import (
    append_samples,
    read_samples_table,
)
from victoriametrics_spark.streaming.parsers import parse_prometheus_text
from victoriametrics_spark.streaming.relabel import relabel
from victoriametrics_spark.streaming.streamaggr import (
    MicroBatchCounterAggregator,
    StreamAggrConfig,
)

T0 = 1_700_000_000_000  # epoch ms — unambiguous vs the seconds rule
IV = 120_000

RULES = [
    # vmagent-style scrape relabeling: drop a junk job, stamp env
    {"action": "drop", "source_labels": ["job"], "regex": "spam"},
    {"action": "replace", "target_label": "env", "replacement": "prod"},
]


def _scrape_lines(k: int) -> str:
    """One scrape body per microbatch: two counter series sampled twice
    inside window k, plus a junk series the relabel rules must drop."""
    out = []
    for job, mult in (("a", 10), ("b", 3)):
        for dt in (0, 60_000):
            ts = T0 + k * IV + dt
            v = mult * ((ts - T0) // 60_000 + 1)
            out.append(f'http_requests_total{{job="{job}"}} {v} {ts}')
    out.append(f'junk_metric{{job="spam"}} 1 {T0 + k * IV}')
    return "\n".join(out) + "\n"


def _pipeline(df):
    return relabel(parse_prometheus_text(df, default_ts_ms=T0), RULES)


def _table_rows(spark, table):
    return sorted(
        (r["name"], tuple(sorted(r["labels"].items())), r["ts"], r["value"])
        for r in read_samples_table(spark, table).collect()
    )


@pytest.fixture()
def cfg():
    return StreamAggrConfig(
        interval_ms=IV, outputs=["increase", "total"], by=["job", "env"]
    )


@pytest.mark.slow
def test_stream_ingest_end_to_end(spark, tmp_path, cfg):
    src = str(tmp_path / "scrapes")
    os.makedirs(src)
    for k in range(3):
        p = os.path.join(src, f"{k:03d}.txt")
        with open(p, "w") as f:
            f.write(_scrape_lines(k))
        os.utime(p, (k + 1, k + 1))  # deterministic batch order

    stream_table = "e2e_stream_sink"
    batch_table = "e2e_batch_sink"
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:"
    )
    for t in (stream_table, batch_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        import shutil

        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    agg = MicroBatchCounterAggregator(spark, cfg, str(tmp_path / "state"))
    probes: list[tuple[int, int, int]] = []  # (batch, rows_in_table, max_ts)

    def handle(df, batch_id):
        flushed = agg.process(_pipeline(df))
        if flushed.count():
            append_samples(
                flushed.withColumn("is_stale", F.lit(False)), stream_table
            )
        # live query-path freshness probe against the bucketed table
        stored = read_samples_table(spark, stream_table)
        api = PromAPI(spark, stored)
        out = api.query(
            'last_over_time({__name__=~"http_requests_total:.*_increase"}[1h])',
            time=str((T0 + (int(batch_id) + 1) * IV) // 1000),
        )
        assert out["status"] == "success"
        mx = stored.agg(F.max("ts")).collect()[0][0]
        probes.append((int(batch_id), stored.count(), int(mx or 0)))

    sdf = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    q = sdf.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination(300)
    rest = agg.flush_all()
    if rest.count():
        append_samples(
            rest.withColumn("is_stale", F.lit(False)), stream_table
        )

    # three microbatches ran; the table got strictly fresher each time
    assert [b for b, _, _ in probes] == [0, 1, 2]
    counts = [n for _, n, _ in probes]
    max_ts = [m for _, _, m in probes]
    assert counts == sorted(counts) and counts[-1] > counts[0]
    assert max_ts == sorted(max_ts) and max_ts[-1] > max_ts[0]

    got = _table_rows(spark, stream_table)
    # relabel proof: junk series gone, env=prod stamped into the output
    assert got and all("junk" not in name for name, *_ in got)
    assert all(dict(lbls)["env"] == "prod" for _, lbls, *_ in got)
    # streamaggr proof: per-window counter increase is exact
    inc = [
        r for r in got if r[0] == "http_requests_total:2m_by_env_job_increase"
    ]
    assert inc, f"no increase series in {sorted({r[0] for r in got})}"
    # windowed increases must sum to the total counter growth (new
    # series count their first value): job a reaches 60, job b 18 —
    # the same numbers the `total` output and the API probe report
    per_job: dict[str, float] = {}
    for _, lbls, _, v in inc:
        per_job[dict(lbls)["job"]] = per_job.get(dict(lbls)["job"], 0.0) + v
    assert per_job == {"a": 60.0, "b": 18.0}

    # ---- replay==batch: same operators, one batch, equal result ----
    all_lines = spark.createDataFrame(
        [(line,) for k in range(3) for line in _scrape_lines(k).splitlines()],
        ["value"],
    )
    agg2 = MicroBatchCounterAggregator(spark, cfg, str(tmp_path / "state2"))
    out2 = agg2.process(_pipeline(all_lines))
    if out2.count():
        append_samples(
            out2.withColumn("is_stale", F.lit(False)), batch_table
        )
    rest2 = agg2.flush_all()
    if rest2.count():
        append_samples(
            rest2.withColumn("is_stale", F.lit(False)), batch_table
        )
    assert got == _table_rows(spark, batch_table)

    # ---- /api/v1/query end state: exact values through the API ----
    api = PromAPI(spark, read_samples_table(spark, stream_table))
    out = api.query(
        'last_over_time({__name__="http_requests_total:2m_by_env_job_total"}[1h])',
        time=str((T0 + 4 * IV) // 1000),
    )
    vals = {
        r["metric"]["job"]: float(r["value"][1])
        for r in out["data"]["result"]
    }
    # totals after 3 windows x 2 samples/window: a: +10/min, b: +3/min
    assert vals == {"a": 60.0, "b": 18.0}

    for t in (stream_table, batch_table):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
