"""Measured scaling curves for every catalog query.

Runs the full catalog at several scale factors (default sf0.001 /
sf0.01 / sf0.1 — two decades of data growth), takes min-of-N wall
clock per (query, sf) like bench.py, and reports each query's growth
ratio over the top decade: ``r = t(sf_hi) / t(sf_mid)`` for 10× the
data. Linear work scales at r ≤ 10; a quadratic plan shows r → 100.

Honest limitation: fixed per-query overhead (planning, job launch,
small-file constants — ~0.2-0.5 s at these sizes) DEFLATES r, so the
raw ratio understates growth and this is a detector for *egregious*
super-linearity only — a query whose raw decade ratio clears the
threshold despite the overhead cushion is certainly super-linear and
would not survive a 100× corpus, while small quadratic terms can still
hide under the overhead at sf0.1 (the plan-shape guards in
tests/test_plan_quality.py — no nested-loop joins, no unbounded
collects — are the structural complement).

Usage::

    python tools/scale_probe.py [--runs N] [--out SCALING.json]

Prints one JSON object: per-query seconds at each sf, the top-decade
ratio, and the flagged list (ratio > threshold after subtracting the
measured per-query floor). The committed SCALING.md narrates the
latest run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG
from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark

SF_DIRS = [
    ("0.001", "/root/testdata/sf0.001"),
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]

#: raw decade growth ratio above which a query is flagged. 10 = linear
#: with zero overhead; overhead only pulls the measured ratio DOWN, so
#: clearing 12 despite the cushion means genuinely super-linear.
FLAG_RATIO = 12.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*", help="subset of catalog names")
    args = ap.parse_args()

    names = args.queries or sorted(CATALOG)
    unknown = set(names) - set(CATALOG)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up absorbs JVM/codegen startup
    CATALOG["event_type_rank"].fn(spark, SF_DIRS[0][1]).write.format(
        "noop"
    ).mode("overwrite").save()

    timings: dict[str, dict[str, float]] = {n: {} for n in names}
    for _ in range(args.runs):
        for sf, sf_dir in SF_DIRS:
            for name in names:
                start = time.perf_counter()
                CATALOG[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = round(time.perf_counter() - start, 3)
                cur = timings[name].get(sf)
                if cur is None or el < cur:
                    timings[name][sf] = el

    report: dict[str, dict] = {}
    flagged: list[str] = []
    _, mid, hi = (sf for sf, _ in SF_DIRS)
    for name in names:
        t = timings[name]
        ratio = round(t[hi] / t[mid], 2)
        report[name] = {**t, "decade_ratio": ratio}
        if ratio > FLAG_RATIO and t[hi] > 1.0:
            flagged.append(name)

    out = {
        "metric": "decade_growth_ratio",
        "sfs": [sf for sf, _ in SF_DIRS],
        "runs": args.runs,
        "flag_threshold": FLAG_RATIO,
        "queries": report,
        "flagged_superlinear": sorted(flagged),
    }
    text = json.dumps(out)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
