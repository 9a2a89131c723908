"""Benchmark harness: runs the catalog's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}``.

Each query is fully materialized through the ``noop`` sink (forces
execution of every operator, no driver-side collect skew). One warm-up
run of a small query absorbs JVM/codegen startup so per-query numbers
reflect steady-state execution.

Per-query times are the MIN over ``$SPARK_GRAFT_BENCH_RUNS`` (default
3) full passes: round-2 showed host-load noise swinging unchanged
relational queries 3-7x run-to-run, which buried real regressions —
min-of-N is the standard load-noise filter (the minimum is the run
least disturbed by the host). The JSON carries ``runs`` so rounds stay
comparable.

Round 6 de-noising (the 46-54 s same-HEAD band at runs=3 hid sub-25%
per-query regressions): the TOP-10 most expensive queries get extra
passes up to ``$SPARK_GRAFT_BENCH_TOP_RUNS`` (default 5) total — they
dominate the total AND its variance, so min-of-5 there buys most of
min-of-5-everywhere at a fifth of the wall-clock cost — and the JSON
records 1-minute ``os.getloadavg()`` markers (start, post-warmup, after
each pass) so cross-round diffs can discard passes taken on a loaded
host instead of guessing which deltas are noise.

Round 12 (VERDICT r11 #6): per-query EXECUTOR TASK TIME lands next to
wall-clock as ``task_sec`` (min over the same passes). Source: the
status REST API's per-stage ``executorRunTime``, summed over the
stages each timed execution creates (a stage-id watermark attributes
stages to queries; ids are globally sequential, so eviction of OLD
retained stages can never corrupt a delta). The bench enables the UI
for its own session via ``SPARK_GRAFT_UI`` — everything else keeps it
off. An external process competing for cores inflates wall-clock
~proportionally to load but task time only by the CPU share actually
lost, so cross-round regressions are attributable WITHOUT a quiet
host: a query whose wall_sec rose while task_sec held is host noise;
a task_sec rise is real added work. The two minima may come from
different passes — task_sec is a per-statistic min, not the task time
of the min-wall pass (min is the right load filter for both).
Driver-side time (plan construction, bounded collects, job
round-trips) is by design NOT in task_sec — a wall-vs-task gap that
persists on a quiet host measures driver orchestration, real cost
too; judge totals on wall, attribute deltas with task.

Round 15 (VERDICT r14 What's-wrong #2): the bench ACTS on its own
references — every timing pass is bracketed by a reference vector
(``ref_vector``: single-core sha256, single-thread and 32-thread
memory-bandwidth reductions), a pass whose ``mem_ref_mt_sec`` bracket
leaves the committed quiet band (``MEM_REF_MT_QUIET_MAX``) is flagged
degraded, and if NO full pass ran quiet the bench adds up to
``MAX_CONTENTION_RETRIES`` extra full passes so min-of-N has a
defensible member. The final line carries ``degraded_passes`` so the
driver artifact itself states whether the headline wall is
trustworthy or should be read via task_total + the detail line's
reference vectors.

Round 13 (VERDICT r12 #1): the driver captures only the last ~2000
stdout chars, and round 12's task_sec map pushed the single line past
that window (BENCH_r12.json parsed null). Output is now TWO lines:
an earlier ``bench_attribution`` detail line (per-query task_sec,
top10_runs, full loadavg pass markers, rest_degraded) and a compact
FINAL line (metric/value/unit/runs/loadavg start+end/task_total/
queries/sf) asserted < 1950 chars and contract-pinned by
tests/test_bench_contract.py. ``task_total`` is null when the REST
endpoint died mid-bench (a partial sum would read as a fake win).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG
from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark
from real_time_video_streaming_analytics_lakehouse_spark.sources import readers


# Must stay under the driver's observed ~2000-char stdout tail capture
# with margin; tests/test_bench_contract.py imports this same constant
# and build_final_line so test and runtime cannot drift (ADVICE r13).
FINAL_LINE_BUDGET = 1950

#: Committed quiet-band ceiling for :func:`mem_ref_mt_sec` on this
#: host (round 15, VERDICT r14 What's-wrong #2). Round-14 observed:
#: quiet passes 0.025–0.047 s; hypervisor-contended passes
#: 0.114–0.197 s (3.5–6× with cpu_ref flat) — 0.07 is the geometric
#: midpoint, separating the two populations with margin on both sides
#: (mild self-load right after a pass measured up to ~0.06, which must
#: NOT flag). A pass bracketed by a sample above the band is flagged
#: ``degraded`` and the bench re-runs full passes (bounded by
#: :data:`MAX_CONTENTION_RETRIES`) until at least one full pass ran
#: quiet — so min-of-N has a defensible member, and when the host
#: never offers one the final line's ``degraded_passes`` says so in
#: the driver artifact itself.
MEM_REF_MT_QUIET_MAX = 0.07

#: extra full catalog passes the contention gate may add (bounded: a
#: persistently noisy host must not turn the bench into a spin loop).
MAX_CONTENTION_RETRIES = 2


def ref_vector() -> dict:
    """One sample of the three host references (shared by bench.py,
    tools/stream_anchor.py and tools/arm_probe.py — VERDICT r14
    What's-wrong #1: wall-only tool outputs were uninterpretable on a
    drift-prone host)."""
    return {
        "cpu_ref_sec": cpu_ref_sec(),
        "mem_ref_sec": mem_ref_sec(),
        "mem_ref_mt_sec": mem_ref_mt_sec(),
    }


def degraded_pass_indices(
    mem_mt_samples: list[float],
    quiet_max: float = MEM_REF_MT_QUIET_MAX,
) -> list[int]:
    """Indices of timing passes flagged as contention-degraded.

    Pass ``i`` runs between reference samples ``i`` (taken before it)
    and ``i+1`` (taken right after it); the pass is degraded when
    EITHER bracketing ``mem_ref_mt_sec`` sample exceeds the quiet
    band — conservative by design (a spike on one side means the bus
    was contended within seconds of the pass), and retries are bounded
    so over-flagging costs at most two extra passes."""
    return [
        i
        for i in range(max(0, len(mem_mt_samples) - 1))
        if max(mem_mt_samples[i], mem_mt_samples[i + 1]) > quiet_max
    ]


class TaskTimeWatermark:
    """Attribute executor task time to timed sections via the status
    REST API's per-stage ``executorRunTime`` and a stage-id watermark
    (stage ids are globally sequential, so eviction of OLD retained
    stages never corrupts a delta — see the module docstring).
    Factored out of ``main()`` (round 15) so the committed tools stamp
    the same attribution; a REST failure degrades to wall-only
    (``delta_ms`` returns None and ``dead`` latches), never a crash."""

    def __init__(self, spark) -> None:
        self.rest_base = None
        self.dead = False
        self._watermark = -1
        if spark.sparkContext.uiWebUrl:
            self.rest_base = (
                f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
                f"{spark.sparkContext.applicationId}/stages"
                f"?status=complete&status=active&status=failed"
            )

    def delta_ms(self) -> int | None:
        """Sum executorRunTime of stages created since the watermark,
        then advance it. One HTTP GET per call."""
        import urllib.request

        if self.rest_base is None or self.dead:
            return None
        try:
            with urllib.request.urlopen(self.rest_base, timeout=30) as r:
                rows = json.load(r)
        except Exception:
            self.dead = True
            return None
        new = [r for r in rows if r["stageId"] > self._watermark]
        if rows:
            self._watermark = max(
                self._watermark, max(r["stageId"] for r in rows)
            )
        return sum(r.get("executorRunTime", 0) for r in new)

    def advance(self) -> None:
        self.delta_ms()


def build_final_line(
    timings: dict,
    *,
    runs: int,
    load_start: float,
    load_end: float,
    task_total,
    sf,
    streaming_rates: dict | None = None,
    degraded_passes: int = 0,
) -> str:
    """Serialize the compact final stdout line the driver parses.

    Single construction point for the line: bench.main() emits exactly
    this string, and the contract test calls it with worst-case widths
    — a field added here is automatically budget-checked by the test
    before it can overflow the driver's capture window at runtime.

    ``degraded_passes`` (round 15): how many timing passes ran with
    the aggregate memory-bandwidth reference outside its quiet band —
    0 means every pass's wall is defensible; equal to the total pass
    count means the host never offered a quiet window and the headline
    should be read via task_total + the detail line's reference
    vectors instead."""
    out = {
        "metric": "catalog_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "runs": runs,
        "loadavg_1min": {"start": load_start, "end": load_end},
        "task_total": task_total,
        "degraded_passes": degraded_passes,
        "queries": timings,
        "sf": sf,
    }
    if streaming_rates is not None:
        # key kept from rounds 5-9 (single-pipeline figure) so
        # cross-round diffs stay mechanical
        out["streaming_events_per_sec"] = streaming_rates["user_activity"]
        out["streaming_events_per_sec_by_pipeline"] = streaming_rates
    return json.dumps(out)


def _load1() -> float:
    """1-minute loadavg marker (shared with tools/stream_anchor.py so
    every recorded measurement carries comparable load context)."""
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-POSIX
        return -1.0


def cpu_ref_sec() -> float:
    """Single-core CPU reference: seconds to sha256 a fixed buffer a
    fixed number of times. Round 14: four same-HEAD quiet-start bench
    runs spread over one hour measured 57.8→72.4 s wall with loadavg
    ~0 at each start — the GUEST-visible load markers cannot see
    hypervisor-level contention/thermal drift, so each pass now
    records this reference too. Comparing walls across runs, divide
    out the ref ratio; a wall rise WITH a flat ref is real added work,
    a proportional rise of both is the host."""
    import hashlib
    import time as _time

    buf = b"\xa5" * 4096
    start = _time.perf_counter()
    h = hashlib.sha256()
    for _ in range(20_000):
        h.update(buf)
    return round(_time.perf_counter() - start, 4)


def mem_ref_sec() -> float:
    """Memory-bandwidth reference: seconds to reduce a 256 MB float64
    array (far beyond cache, numpy C loop — bandwidth-bound). The
    round-14 drift held cpu_ref flat while walls swung ±25 %, pointing
    at shared memory bandwidth as the contended resource; recording
    both references per pass lets a cross-run diff separate
    slower-cores (cpu_ref moves) from starved-bandwidth (mem_ref
    moves) from genuinely-added work (neither moves)."""
    import time as _time

    import numpy as np

    a = np.ones(32 * 1024 * 1024, dtype=np.float64)  # 256 MB
    a[::4096] = 2.0  # defeat any constant-folding
    start = _time.perf_counter()
    s = float(a.sum())
    el = _time.perf_counter() - start
    assert s > 0
    return round(el, 4)


def mem_ref_mt_sec(n_threads: int = 32) -> float:
    """AGGREGATE memory-bandwidth reference: wall seconds for
    ``n_threads`` concurrent 64 MB numpy reductions (sum releases the
    GIL, so the threads genuinely compete for bandwidth the way the
    executor's 32 task threads do). The single-thread
    :func:`mem_ref_sec` stayed near-flat through round-14 runs whose
    walls swung ±25 % — one thread cannot saturate the bus, so it
    under-observes contention that only binds under full parallel
    load; this reference observes it directly."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    arrays = [
        np.ones(8 * 1024 * 1024, dtype=np.float64) for _ in range(n_threads)
    ]
    for a in arrays:
        a[::4096] = 2.0
    start = _time.perf_counter()
    with ThreadPoolExecutor(n_threads) as ex:
        totals = list(ex.map(lambda a: float(a.sum()), arrays))
    el = _time.perf_counter() - start
    assert all(t > 0 for t in totals)
    return round(el, 4)


def warm_up(spark, sf_dir: str) -> None:
    """Session warm-up: JVM, codegen, parquet footer caches — AND the
    Python worker fleet (the first mapInPandas in a session forks 32
    Arrow workers, a one-time ~2 s cost that otherwise lands on
    whichever measured item reaches Python first instead of on session
    startup where it belongs). Shared with tools/stream_anchor.py so
    the two measurement methods cannot drift apart."""
    CATALOG["event_type_rank"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(64).repartition(32).mapInPandas(
        lambda batches: batches, "id LONG"
    ).write.format("noop").mode("overwrite").save()
    for warm_table in ("documents", "embeddings"):
        readers.load_table(spark, sf_dir, warm_table).write.format(
            "noop"
        ).mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # task-time attribution reads the status REST API -> UI on for the
    # bench session only (must be set before the session is built)
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    loadavg: dict = {"start": _load1(), "passes": []}
    warm_up(spark, sf_dir)

    wm = TaskTimeWatermark(spark)

    def _time_query(name: str) -> None:
        wm.advance()  # move the watermark to just-before the query
        start = time.perf_counter()
        CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        elapsed = round(time.perf_counter() - start, 3)
        if name not in timings or elapsed < timings[name]:
            timings[name] = elapsed
        task_ms = wm.delta_ms()
        if task_ms is not None:
            task = round(task_ms / 1000.0, 3)
            if name not in task_timings or task < task_timings[name]:
                task_timings[name] = task

    loadavg["post_warmup"] = _load1()
    refs = [ref_vector()]

    def _timed_pass(names) -> None:
        for name in names:
            _time_query(name)
        loadavg["passes"].append(_load1())
        refs.append(ref_vector())

    def _mem_mt() -> list[float]:
        return [r["mem_ref_mt_sec"] for r in refs]

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    top_runs = int(os.environ.get("SPARK_GRAFT_BENCH_TOP_RUNS", "5"))
    timings: dict[str, float] = {}
    task_timings: dict[str, float] = {}
    for run in range(n_runs):
        _timed_pass(sorted(CATALOG))
    # Contention gate (round 15, VERDICT r14 What's-wrong #2): if NO
    # full pass ran with the bandwidth reference inside its quiet
    # band, min-of-N is min-of-degraded — add full passes (bounded)
    # until one is quiet or the retry budget is spent. The flags are
    # recomputed over the growing sample list each time.
    contention_retries = 0
    while (
        contention_retries < MAX_CONTENTION_RETRIES
        and len(loadavg["passes"]) > 0  # RUNS=0: nothing to defend
        and len(degraded_pass_indices(_mem_mt())) >= len(loadavg["passes"])
    ):
        contention_retries += 1
        _timed_pass(sorted(CATALOG))
    # Extra min-of-N passes for the queries that dominate the total
    # (and its noise): their current minima pick the top-10, then each
    # gets (top_runs - n_runs) more timed executions. Also bracketed
    # by reference samples so the degraded accounting covers them.
    top10 = sorted(timings, key=timings.get, reverse=True)[:10]
    for _ in range(max(0, top_runs - n_runs)):
        _timed_pass(top10)
    degraded = degraded_pass_indices(_mem_mt())

    # A partial task_timings map (REST died mid-bench) would sum to a
    # misleadingly SMALL total that a cross-round diff reads as a big
    # task-time win — emit the total only when every timed query got an
    # attribution, else null + an explicit degradation flag.
    task_complete = len(task_timings) == len(timings) and bool(timings)
    # Round 12 lesson (VERDICT r12 #1): the driver tail-captures only
    # the LAST ~2000 stdout chars, and the single fat JSON line
    # overflowed it — BENCH_r12.json lost the headline. Bulky detail
    # (per-query task_sec, full loadavg pass markers) goes on an
    # EARLIER line; the FINAL line stays compact (< ~1900 chars with
    # all 50 queries at worst-case widths — pinned by
    # tests/test_bench_contract.py).
    detail = {
        "detail": "bench_attribution",
        "task_sec": task_timings,
        "top10_runs": max(top_runs, n_runs),
        "loadavg_1min": loadavg,
        "cpu_ref_sec": [r["cpu_ref_sec"] for r in refs],
        "mem_ref_sec": [r["mem_ref_sec"] for r in refs],
        "mem_ref_mt_sec": [r["mem_ref_mt_sec"] for r in refs],
        "degraded_pass_indices": degraded,
        "contention_retries": contention_retries,
        "rest_degraded": wm.dead,
    }
    print(json.dumps(detail))
    rates = (
        _streaming_throughput(spark, sf_dir)
        if os.environ.get("SPARK_GRAFT_BENCH_STREAMING")
        else None
    )
    line = build_final_line(
        timings,
        runs=n_runs,
        load_start=loadavg["start"],
        load_end=loadavg["passes"][-1] if loadavg["passes"] else -1.0,
        task_total=(
            round(sum(task_timings.values()), 3) if task_complete else None
        ),
        sf=float(sf) if sf.replace(".", "").isdigit() else sf,
        streaming_rates=rates,
        degraded_passes=len(degraded),
    )
    # fail LOUD before the driver's capture window truncates silently
    # (an explicit raise, not assert — asserts vanish under python -O
    # and the truncation would return exactly as silently as r12's)
    if len(line) >= FINAL_LINE_BUDGET:
        raise RuntimeError(f"final bench line too long: {len(line)}")
    print(line)


def _streaming_throughput(
    spark, sf_dir: str, task_out: dict | None = None
) -> dict[str, float]:
    """Drain the events table through each of the reference's three
    streaming pipelines (file source → watermarked window agg →
    parquet sink) via Trigger.AvailableNow and report events/second
    per pipeline. Opt-in (SPARK_GRAFT_BENCH_STREAMING=1) so the
    driver's default bench run stays fast.

    ``task_out`` (round 15, for tools/stream_anchor.py): when given a
    dict, it is filled with per-pipeline executor task seconds via
    :class:`TaskTimeWatermark` — the load-resistant companion to the
    wall-derived rate (requires the UI; silently absent without)."""
    wm = TaskTimeWatermark(spark) if task_out is not None else None
    import shutil
    import tempfile
    import time as _t

    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import load_table
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        anomaly_stream,
        content_popularity_stream,
        stream_events_from_files,
        user_activity_stream,
    )

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        from pyspark.sql import functions as F

        events = load_table(spark, sf_dir, "events").withColumn(
            # watermarks require TIMESTAMP (not NTZ); session is UTC so
            # the wall-clock values are unchanged
            "ts", F.col("ts").cast("timestamp")
        )
        n = events.count()
        src_dir = f"{work}/src"
        # 32 files so maxFilesPerTrigger batches into multiple triggers
        events.repartition(32).write.parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        rates: dict[str, float] = {}
        for tag, build in (
            ("user_activity", user_activity_stream),
            ("content_popularity", content_popularity_stream),
            ("anomaly", anomaly_stream),
        ):
            src = stream_events_from_files(
                spark, src_dir, schema, max_files_per_trigger=8
            )
            if wm is not None:
                wm.advance()
            start = _t.perf_counter()
            q = (
                build(src)
                .writeStream.format("parquet")
                .option("path", f"{work}/out_{tag}")
                .option("checkpointLocation", f"{work}/ckpt_{tag}")
                .trigger(availableNow=True)
                .start()
            )
            finished = q.awaitTermination(600)
            elapsed = _t.perf_counter() - start
            if not finished:
                # A partial drain would overstate events/s, and deleting
                # the work dir under a live query corrupts the run —
                # fail loud.
                q.stop()
                raise RuntimeError(
                    f"streaming drain ({tag}) did not finish within "
                    f"600s ({elapsed:.0f}s elapsed); no throughput "
                    f"reported"
                )
            rates[tag] = round(n / elapsed, 1)
            if wm is not None:
                task_ms = wm.delta_ms()
                if task_ms is not None:
                    task_out[tag] = round(task_ms / 1000.0, 3)
        return rates
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
