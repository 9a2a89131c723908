"""Per-stage task-time attribution for one catalog query (guide §1.1,
§7.1): run the query to the noop sink N times and dump every stage's
executorRunTime / shuffle bytes / task count from the status REST API,
sorted by run time — the empirical loop's "which stage is slow" answer
when no interactive UI is available.

Usage: python tools/stage_profile.py <query> [runs=2] [sf_dir]

Prints one line per stage of the LAST run (warm steady state — what
the bench's min-of-N measures) plus totals for every run, and stamps
host references (ref_vector) so a contended window is visible in the
output rather than silently poisoning it.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from bench import ref_vector  # noqa: E402
from real_time_video_streaming_analytics_lakehouse_spark.plans import (  # noqa: E402
    CATALOG,
)
from real_time_video_streaming_analytics_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)


def stages_since(rest: str, watermark: int) -> list[dict]:
    with urllib.request.urlopen(rest, timeout=10) as r:
        data = json.load(r)
    return [s for s in data if s["stageId"] > watermark]


def main() -> int:
    name = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    spark = get_spark("stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    rest = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages"
        f"?status=complete&status=active&status=failed"
    )
    fn = CATALOG[name].fn
    print("refs_before", ref_vector())
    wall = []
    last_stages: list[dict] = []
    for i in range(runs):
        wm = max(
            (s["stageId"] for s in stages_since(rest, -1)), default=-1
        )
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall.append(round(time.monotonic() - t0, 3))
        last_stages = stages_since(rest, wm)
        task_s = sum(s["executorRunTime"] for s in last_stages) / 1e3
        print(
            f"run {i}: wall {wall[-1]} s, task {task_s:.2f} s, "
            f"{len(last_stages)} stages"
        )
    print("refs_after", ref_vector())
    print(f"\n--- per-stage, last run (wall {wall[-1]} s) ---")
    for s in sorted(
        last_stages, key=lambda s: -s["executorRunTime"]
    ):
        if s["executorRunTime"] < 20:
            continue
        nm = s["name"].split("\n")[0][:72]
        print(
            f"{s['executorRunTime']/1e3:8.2f}s run "
            f"{s.get('executorCpuTime', 0)/1e9:7.2f}s cpu "
            f"{s['numCompleteTasks']:4d} tasks "
            f"in {s['inputBytes']>>20:5d}MB "
            f"sh-r {s['shuffleReadBytes']>>20:4d}MB "
            f"sh-w {s['shuffleWriteBytes']>>20:4d}MB  {nm}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
