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

#: the documents/embeddings-heavy queries that dominate the bench —
#: the ones worth one synthetic tier above sf0.1 (--extra-tier).
HEAVY = [
    "doc_dedup_fingerprints",
    "hash_dedup_candidates",
    "ngram_jaccard_top_pairs",
    "embedding_dedup_clusters_lsh",
    "embedding_dedup_clusters",
]


def _materialize_x3(spark, base_dir: str, out_dir: str) -> str:
    """A 3× (sf0.3-equivalent) documents+embeddings tier under /tmp.

    /root/testdata is read-only and tops out at sf0.1, so the tier is
    derived: three copies with offset ids and PERTURBED content —
    copy 1 reverses the text / flips the embedding sign, copy 2
    upper-cases the text / reverses the vector — so the copies are NOT
    near-duplicates of each other. Naive exact copies would be
    dishonest for exactly the queries this probes: every LSH band
    bucket would triple-collide and the in-bucket verify would grow
    quadratically BY CONSTRUCTION, masking (or faking) a plan problem.
    Content statistics (lengths, token counts, vector norms) are
    preserved, which is what throughput linearity is measured against.
    """
    import pyspark.sql.functions as F

    done = os.path.join(out_dir, "_READY")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, base_dir, "documents")
    emb = load_table(spark, base_dir, "embeddings")
    doc_variants = [
        docs,
        docs.withColumn("text", F.reverse(F.col("text"))),
        docs.withColumn("text", F.upper(F.col("text"))),
    ]
    doc3 = None
    for i, v in enumerate(doc_variants):
        v = v.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
        )
        doc3 = v if doc3 is None else doc3.unionByName(v)
    emb_variants = [
        emb,
        emb.withColumn(
            "embedding", F.transform(F.col("embedding"), lambda x: -x)
        ),
        emb.withColumn("embedding", F.reverse(F.col("embedding"))),
    ]
    emb3 = None
    for i, v in enumerate(emb_variants):
        v = v.withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000_000))
        emb3 = v if emb3 is None else emb3.unionByName(v)
    doc3.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    emb3.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--extra-tier", action="store_true",
        help="also time the HEAVY queries on a synthetic 3x (sf0.3) "
             "documents/embeddings tier derived from sf0.1",
    )
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

    extra: dict[str, float] = {}
    if args.extra_tier:
        tier_dir = _materialize_x3(
            spark, SF_DIRS[-1][1], "/tmp/spark_graft_sf0.3"
        )
        heavy = [n for n in HEAVY if n in names]
        for _ in range(args.runs):
            for name in heavy:
                start = time.perf_counter()
                CATALOG[name].fn(spark, tier_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = round(time.perf_counter() - start, 3)
                if name not in extra or el < extra[name]:
                    extra[name] = el

    report: dict[str, dict] = {}
    flagged: list[str] = []
    _, mid, hi = (sf for sf, _ in SF_DIRS)
    for name in names:
        t = timings[name]
        ratio = round(t[hi] / t[mid], 2)
        report[name] = {**t, "decade_ratio": ratio}
        if name in extra:
            # 3x the sf0.1 data; linear work lands at <= ~3 (fixed
            # overhead pulls it down, skew pulls it up slightly)
            report[name]["0.3"] = extra[name]
            report[name]["x3_ratio"] = round(extra[name] / t[hi], 2)
        if ratio > FLAG_RATIO and t[hi] > 1.0:
            flagged.append(name)

    out = {
        "metric": "decade_growth_ratio",
        "sfs": [sf for sf, _ in SF_DIRS]
        + (["0.3(synthetic 3x)"] if extra else []),
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
