"""Canonical streaming throughput anchor (round 13).

Rounds 10-12 each measured streaming throughput with ad-hoc scripts
whose parameters (warm-up, micro-batch count, payload shape) were
described in BASELINE.md but never committed — so cross-round numbers
kept diverging for METHOD reasons (round 12's 47.6k ev/s registry
figure vs round 13's first re-measure at 15k was entirely the
batch-count difference: a single-batch availableNow drain vs a
4-micro-batch incremental drain, measured 60.2k vs 21.4k same-session
same-HEAD). This tool IS the method now:

* bench-style warm-up (one relational query, the Python-worker fleet,
  the events scan) so the first drain doesn't pay session startup;
* the three reference pipelines via bench._streaming_throughput
  (32 source files, maxFilesPerTrigger=8 -> 4 watermarked
  micro-batches, parquet sink, availableNow), best of ``--passes``;
* registry-validated ingest (4-property / 3-required JSON payload ->
  from_json validation -> typed txlog tables + DLQ, exactly-once) in
  BOTH configurations, best of ``--passes`` each:
  - ``single_batch``: whole corpus in one trigger — the hot-path
    ceiling (validation + write throughput, minimal per-batch
    overhead); comparable to round 12's 47.6k record;
  - ``incremental``: maxFilesPerTrigger=8 — the steady-trigger figure
    including per-batch txlog commit + checkpoint overhead.

Prints one ``RESULT {...}`` JSON line with 1-minute loadavg markers
(start / post-warm / end) so BASELINE.md entries carry their load
context. Round 15 (VERDICT r14 What's-wrong #1): the line also carries
the bench reference vectors (``refs`` — cpu / single- and 32-thread
memory-bandwidth probes at start / post-warm / between sections / end)
and executor task seconds per pipeline and per registry drain (the
same REST stage watermark bench.py uses) — so a throughput dip is
attributable to the host (task flat, mem_ref_mt spiking) vs the code
(task up) from the committed artifact alone, instead of the round-14
situation where a 25–50 % all-surface dip was only *probably* host.
Round 16 (VERDICT r15 What's-wrong #2 + #6): the anchor now ACTS on
its references — each measurement window (a pipelines pass, a registry
configuration) is classified against ``bench.MEM_REF_MT_QUIET_MAX``
and the RESULT line carries a ``degraded`` map (machine-flagged, not
narrated); the incremental registry drain also records per-micro-batch
``triggerExecution`` durations from the query progress log
(``registry_incremental_batch_ms``) so the steady-trigger figure's
per-batch shape is visible.
Usage: ``python tools/stream_anchor.py [--passes N]``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# task attribution reads the status REST API -> UI on for this session
# (must be set before the session is built)
os.environ.setdefault("SPARK_GRAFT_UI", "true")

from pyspark.sql import functions as F

REGISTRY_SCHEMA = {
    "type": "object",
    "properties": {
        "event_id": {"type": "integer"},
        "user_id": {"type": "integer"},
        "event_type": {"type": "string"},
        "value": {"type": "number"},
    },
    "required": ["event_id", "user_id", "event_type"],
}


def _registry_drain(
    spark,
    raw,
    n: int,
    single_batch: bool,
    wm=None,
    tasks=None,
    batch_ms=None,
) -> float:
    from real_time_video_streaming_analytics_lakehouse_spark.sources.registry import (
        SchemaRegistry,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        run_registry_ingest,
        stream_events_from_files,
    )

    work = tempfile.mkdtemp(prefix="stream_anchor_reg_")
    try:
        src_dir = f"{work}/src"
        raw.repartition(32).write.parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        reg = SchemaRegistry()
        reg.register("video-events-value", REGISTRY_SCHEMA)
        kwargs = {} if single_batch else {"max_files_per_trigger": 8}
        src = stream_events_from_files(spark, src_dir, schema, **kwargs)
        if wm is not None:
            wm.advance()
        t0 = time.perf_counter()
        q = run_registry_ingest(
            src, reg,
            table_root=f"{work}/tables",
            dlq_path=f"{work}/dlq",
            checkpoint_path=f"{work}/ckpt",
        )
        finished = q.awaitTermination(600)
        elapsed = time.perf_counter() - t0
        if not finished:
            q.stop()
            raise RuntimeError("registry drain did not finish in 600s")
        if wm is not None and tasks is not None:
            task_ms = wm.delta_ms()
            if task_ms is not None:
                tasks.append(round(task_ms / 1000.0, 3))
        if batch_ms is not None:
            # Per-micro-batch trigger durations from the query's own
            # progress log (round 16, VERDICT r15 #6): the incremental
            # path's figure is a 4-micro-batch mean — the per-batch
            # vector shows WHERE time went (skewed first batch vs
            # uniform per-trigger cost) without any extra measurement.
            batch_ms.append(
                [
                    p.durationMs.get("triggerExecution")
                    for p in q.recentProgress
                    if p.get("durationMs")
                ]
            )
        return round(n / elapsed, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
    )
    args = ap.parse_args()

    # the warm-up, loadavg, reference and task-attribution helpers are
    # bench.py's OWN (shared, not copied): the whole point of this
    # tool is one method that cannot drift between the batch bench and
    # the streaming anchor
    from bench import (
        TaskTimeWatermark,
        _load1,
        _streaming_throughput,
        ref_vector,
        warm_up,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark
    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import (
        load_table,
    )

    spark = get_spark("stream_anchor")
    spark.sparkContext.setLogLevel("ERROR")
    wm = TaskTimeWatermark(spark)
    refs = [ref_vector()]
    out: dict = {"load_start": _load1(), "passes": args.passes}

    warm_up(spark, args.sf_dir)
    events = load_table(spark, args.sf_dir, "events")
    out["load_post_warm"] = _load1()
    refs.append(ref_vector())

    # Round 16 (VERDICT r15 What's-wrong #2): the anchor ACTS on its
    # own references instead of leaving interpretation to the reader —
    # every measurement window (one pipelines pass / one registry
    # configuration) is classified against the committed quiet band,
    # and the RESULT line carries a 'degraded' map so a future
    # throughput dip (like r14's 9.7k-20.1k) is machine-flagged.
    from bench import MEM_REF_MT_QUIET_MAX

    def _window_degraded(i_before: int, i_after: int) -> bool:
        return (
            max(
                refs[i_before]["mem_ref_mt_sec"],
                refs[i_after]["mem_ref_mt_sec"],
            )
            > MEM_REF_MT_QUIET_MAX
        )

    degraded: dict = {}
    best: dict = {}
    task_best: dict = {}
    pipeline_windows: list = []
    for _ in range(args.passes):
        tasks: dict = {}
        i_before = len(refs) - 1
        rates = _streaming_throughput(spark, args.sf_dir, task_out=tasks)
        refs.append(ref_vector())
        pipeline_windows.append(
            _window_degraded(i_before, len(refs) - 1)
        )
        for k, v in rates.items():
            best[k] = max(best.get(k, 0.0), v)
        for k, v in tasks.items():
            # min task = the least-disturbed execution (bench rule)
            task_best[k] = min(task_best.get(k, float("inf")), v)
    out["pipelines_ev_s"] = best
    if task_best:
        out["pipelines_task_sec"] = task_best
    degraded["pipelines_passes"] = pipeline_windows

    n = events.count()
    raw = events.select(
        F.lit("video-events").alias("topic"),
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value")
        ).alias("value"),
    )
    for tag, single in (("single_batch", True), ("incremental", False)):
        tasks_l: list = []
        batches_l: list = []
        rates: list = []
        pass_flags: list = []
        # one bracket per DRAIN, not per configuration (review
        # finding, round 16): a burst confined to one pass must not
        # hide behind the other pass's quiet end-sample
        for _ in range(args.passes):
            i_before = len(refs) - 1
            rates.append(
                _registry_drain(
                    spark, raw, n, single,
                    wm=wm, tasks=tasks_l,
                    batch_ms=None if single else batches_l,
                )
            )
            refs.append(ref_vector())
            pass_flags.append(_window_degraded(i_before, len(refs) - 1))
        degraded[f"registry_{tag}"] = pass_flags
        out[f"registry_{tag}_ev_s"] = max(rates)
        out[f"registry_{tag}_runs"] = rates
        if tasks_l:
            out[f"registry_{tag}_task_sec"] = min(tasks_l)
        if batches_l:
            out[f"registry_{tag}_batch_ms"] = batches_l
    out["load_end"] = _load1()
    out["refs"] = refs
    out["degraded"] = degraded
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
