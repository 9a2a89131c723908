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

Round 16 (VERDICT r15 #1/#3 + ADVICE r15): three self-certification
gaps closed. (a) The burst reference probes sample ~30 ms instants and
provably under-observe sustained contention (r15 attempt 1: every
burst ref in band, wall still 18 % over the r13 record) — each pass
now also records a SUSTAINED yardstick: the per-pass wall of the
pinned ``YARDSTICK_QUERY`` (a full bandwidth-bound scan+agg through
the real Spark path, already timed in every pass, zero added cost)
plus a ~1 s continuous bandwidth probe (``sustained_ref``) at start
and end; the final line carries ``wall_norm`` — the headline scaled
by the yardstick's committed quiet value — so walls compare across
host regimes. (b) Per-query MIN PROVENANCE: the detail line records
which pass supplied each query's minimum and which of those passes
were degraded; the final line's ``min_degraded`` count makes the
headline self-certifying per query, not just per run. (c) The final
line's ``retries`` field discloses contention-gate extra passes next
to ``runs`` (ADVICE r15: the declared run count must match the passes
that produced the minima).

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

#: The per-pass SUSTAINED in-band reference workload (round 16,
#: VERDICT r15 #1): one pinned catalog query whose per-PASS wall is
#: recorded alongside the burst reference probes. ``pricing_summary``
#: is the TPC-H Q1 shape — one full lineitem scan + grouped aggregate,
#: bandwidth-bound for ~2 s through the exact JVM/parquet/shuffle path
#: the bench measures — so it observes sustained contention the ~30 ms
#: burst probes structurally cannot (the r15 open question: attempt 1
#: ran every burst ref in band and still landed 18 % above the r13
#: record). It is already timed in every pass (and sits in the top-10
#: re-measure set), so the yardstick costs ZERO extra wall.
YARDSTICK_QUERY = "pricing_summary"

#: Committed quiet-day value for :data:`YARDSTICK_QUERY`'s per-pass
#: wall at sf0.1. Round-16 calibration (dated 2026-08-17): 1.74, the
#: min-of-pass observations on the two fully quiet-certified anchor
#: attempts. RECALIBRATED 2026-08-18 (VERDICT r16 #7): the host now
#: reproducibly beats that value — r16 end-of-round attempt 4 observed
#: per-pass minima 1.542–1.601, and the round-17 opening anchor
#: (sustained_ref med 0.017/0.018, p90 0.020-0.023 — quiet by the
#: sustained probe on both brackets) observed 1.632 — so 1.74 made
#: ``wall_norm`` OVER-correct (scale a quiet wall UP) whenever the
#: yardstick ran at its true quiet speed. 1.60 is the median of the
#: quiet-regime minima observed across those runs (1.542, 1.601,
#: 1.632). pricing_summary's plan was untouched in both rounds
#: (git-verified), so this is a host-regime recalibration, not a
#: query change. ``wall_norm`` on the final line is
#: ``value * (this / observed yardstick min)`` — an estimate of what
#: the headline would read on a quiet host, making round-over-round
#: walls comparable across host regimes.
YARDSTICK_QUIET_SEC = 1.60


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
    retries: int = 0,
    min_degraded: int = 0,
    wall_norm: float | None = None,
    cpus: int | None = None,
    parallelism: int | None = None,
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
    vectors instead.

    Round 16 additions (VERDICT r15 #3 + ADVICE r15):

    * ``retries`` — contention-gate extra full passes actually run, so
      the artifact's pass accounting is ``runs + retries`` (+ top-10
      passes), not just the declared ``runs``;
    * ``min_degraded`` — how many queries' reported minima came from a
      pass flagged degraded: 0 makes the headline fully
      self-certifying (every per-query min has a quiet provenance)
      even when some passes were contended; the per-query list is on
      the detail line (``min_degraded_queries``);
    * ``wall_norm`` — the headline scaled by the sustained in-band
      yardstick (:data:`YARDSTICK_QUERY`) against its committed quiet
      value: an estimate of the quiet-host wall, null when the
      yardstick was not observed.

    Round 17 (VERDICT r16 #2): ``cpus`` (the honored
    ``$SPARK_GRAFT_CPUS`` → ``local[N]`` master) and ``parallelism``
    (``sc.defaultParallelism`` actually observed in the session) — the
    artifact's own witness that the env contract was honored, so a
    scaling sweep whose walls barely move (overhead-bound SFs) is
    distinguishable from a bench that ignored the env
    (``suspect_cpus_ignored`` fired in PERF_r16 on exactly that
    ambiguity)."""
    out = {
        "metric": "catalog_total_wall_clock",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "runs": runs,
        "retries": retries,
        "cpus": cpus,
        "parallelism": parallelism,
        "loadavg_1min": {"start": load_start, "end": load_end},
        "task_total": task_total,
        "degraded_passes": degraded_passes,
        "min_degraded": min_degraded,
        "wall_norm": wall_norm,
        "queries": timings,
        "sf": sf,
    }
    if streaming_rates is not None:
        # round 16: the two redundant streaming keys (full map + a
        # duplicated single-pipeline value) compacted to one — the
        # final-line budget absorbed the new provenance fields instead.
        # Safe: the driver's default bench run never sets
        # SPARK_GRAFT_BENCH_STREAMING, so no driver artifact carries
        # the old keys; BASELINE.md streaming history comes from
        # tools/stream_anchor.py.
        out["streaming_ev_s"] = streaming_rates
    # Compact separators (round 17): the default ", "/": " spends one
    # budget char per key and per comma (~130 chars at 50 queries) on
    # whitespace the JSON parser ignores — dropping it funds the
    # cpus/parallelism witness fields (VERDICT r16 #2) without
    # retiring any existing field or headroom test.
    return json.dumps(out, separators=(",", ":"))


def _master_cores(master: str) -> int | None:
    """Core count parsed from a ``local[N]`` master, else None — the
    final line's witness that ``$SPARK_GRAFT_CPUS`` reached the
    session (VERDICT r16 #2). Parsed from the LIVE SparkContext, not
    the env var, so a bug that dropped the env on the way to the
    master would be visible in the artifact."""
    if master.startswith("local[") and master.endswith("]"):
        inner = master[len("local["):-1]
        if inner.isdigit():
            return int(inner)
    return None


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


def _bandwidth_arrays(n_threads: int) -> list:
    """One 64 MB float64 array per thread, poked to defeat constant
    folding — the shared workload of the burst (:func:`mem_ref_mt_sec`)
    and sustained (:func:`sustained_ref`) aggregate-bandwidth probes.
    Shared so a calibration change (array size, poke stride) cannot
    silently decouple the burst quiet band from the sustained one it
    is read against."""
    import numpy as np

    arrays = [
        np.ones(8 * 1024 * 1024, dtype=np.float64) for _ in range(n_threads)
    ]
    for a in arrays:
        a[::4096] = 2.0
    return arrays


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

    arrays = _bandwidth_arrays(n_threads)
    start = _time.perf_counter()
    with ThreadPoolExecutor(n_threads) as ex:
        totals = list(ex.map(lambda a: float(a.sum()), arrays))
    el = _time.perf_counter() - start
    assert all(t > 0 for t in totals)
    return round(el, 4)


def yardstick_quiet_min(
    yardstick: list, degraded_set: set
) -> float | None:
    """Min yardstick observation, preferring quiet-flagged passes.

    ``yardstick`` holds ``[pass_idx, elapsed]`` observations. A
    degraded pass's yardstick is itself contention-inflated, so using
    it for normalization under-corrects — quiet-pass observations win
    whenever any exist; an all-degraded run falls back to the overall
    min (the least-bad estimate, and the final line's
    ``degraded_passes`` already tells the reader to distrust it).

    Pass 0 is additionally excluded whenever any later observation
    exists (round 17): the FIRST execution of the yardstick query in a
    process pays its own whole-stage-codegen compilation, so its wall
    is structurally inflated (observed 2.99–17.4 s against a 1.6–1.8 s
    steady state). A run whose only quiet pass was pass 0 previously
    normalized against that cold value and emitted a nonsense
    ``wall_norm`` (observed 30.8 for a 57.6 s run)."""
    obs = [o for o in yardstick if o[0] != 0] or yardstick
    quiet = [el for p, el in obs if p not in degraded_set]
    return min(quiet or (el for _, el in obs), default=None)


def sustained_ref(duration_sec: float = 1.2, n_threads: int = 32) -> dict:
    """SUSTAINED aggregate-bandwidth reference (round 16, VERDICT r15
    #1): the :func:`mem_ref_mt_sec` reduction repeated back-to-back for
    ~``duration_sec`` over arrays allocated once. The burst probe
    samples a ~30 ms instant; hypervisor contention that arrives in
    bursts longer than the probe but shorter than a pass can dodge it
    (the r15 attempt-1 signature: every burst ref in band, wall still
    18 % high). Reporting the per-iteration MEDIAN and P90 over a
    ~1 s window observes the sustained regime directly: med ≈ quiet
    band + p90 ≈ med means genuinely quiet; med in band + p90 spiking
    means bursty contention the single-sample probe may have missed."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    arrays = _bandwidth_arrays(n_threads)
    iters: list[float] = []
    with ThreadPoolExecutor(n_threads) as ex:
        # one unrecorded warm iteration absorbs pool spin-up
        list(ex.map(lambda a: float(a.sum()), arrays))
        t_end = _time.perf_counter() + duration_sec
        while _time.perf_counter() < t_end:
            t0 = _time.perf_counter()
            totals = list(ex.map(lambda a: float(a.sum()), arrays))
            iters.append(_time.perf_counter() - t0)
            assert all(t > 0 for t in totals)
    iters.sort()
    n = len(iters)
    return {
        "iters": n,
        "med_sec": round(iters[n // 2], 4),
        "p90_sec": round(iters[min(n - 1, int(n * 0.9))], 4),
    }


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
        pass_idx = len(loadavg["passes"])  # pass currently running
        if name == YARDSTICK_QUERY:
            yardstick.append([pass_idx, elapsed])
        if name not in timings or elapsed < timings[name]:
            timings[name] = elapsed
            min_pass[name] = pass_idx
        task_ms = wm.delta_ms()
        if task_ms is not None:
            task = round(task_ms / 1000.0, 3)
            if name not in task_timings or task < task_timings[name]:
                task_timings[name] = task

    loadavg["post_warmup"] = _load1()
    refs = [ref_vector()]
    sustained = [sustained_ref()]

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
    min_pass: dict[str, int] = {}
    yardstick: list[list] = []  # [pass_idx, elapsed] per observation
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
    sustained.append(sustained_ref())
    # Per-query min provenance (round 16, VERDICT r15 #3): which
    # queries' reported minima came from a degraded pass. Contention
    # only ever inflates a wall, so in practice minima land on quiet
    # passes — recording it makes that checkable per query instead of
    # argued per round.
    degraded_set = set(degraded)
    min_degraded_queries = sorted(
        n for n, p in min_pass.items() if p in degraded_set
    )
    # Quiet-host wall estimate via the sustained yardstick (round 16,
    # VERDICT r15 #1): min over the yardstick's per-pass observations
    # (min = least-disturbed, the bench's standing rule), PREFERRING
    # observations from quiet-flagged passes when any exist — on a
    # contended run a degraded-pass yardstick is itself inflated and
    # would under-correct (r16 attempt 3: degraded-pass min 1.96 gave
    # wall_norm 59.0 against a plausible quiet ~55). Only at sf0.1 —
    # the committed quiet value is an sf0.1 measurement, so at any
    # other SF the ratio would be meaningless; null there.
    yard_min = yardstick_quiet_min(yardstick, degraded_set)
    wall_norm = (
        round(sum(timings.values()) * YARDSTICK_QUIET_SEC / yard_min, 3)
        if yard_min and sf == "0.1"
        else None
    )

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
        "sustained_ref": sustained,
        "yardstick": {
            "query": YARDSTICK_QUERY,
            "quiet_sec": YARDSTICK_QUIET_SEC,
            "per_pass": yardstick,
        },
        "min_pass": min_pass,
        "min_degraded_queries": min_degraded_queries,
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
        retries=contention_retries,
        min_degraded=len(min_degraded_queries),
        wall_norm=wall_norm,
        cpus=_master_cores(spark.sparkContext.master),
        parallelism=spark.sparkContext.defaultParallelism,
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
