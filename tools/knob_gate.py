"""Knob-path witness gate (round 16, VERDICT r15 #5).

The catalog's non-default knob paths — ``doc_token_stats``'s
distributed BPE trainer, ``text_quality``'s column families, every
fused entry's single-``arms=`` slices — were verified by one-off
``check_correctness`` invocations and identity tests whose green runs
lived as PROSE in COVERAGE.md. This tool turns that evidence into a
dated artifact: one invocation runs every knob path against a
machine-checkable identity at driver-gate scale (sf0.01 by default)
and writes ``KNOBGATE.json``.

Three check modes, strongest available per knob:

* ``oracle`` — ``doc_token_stats(trainer="distributed")`` compared
  against the catalog entry's own DuckDB oracle SQL (full rows /
  columns / order-insensitive value-hash, the check_correctness
  machinery): the distributed trainer feeds the same ``bpe_merge``/
  ``bpe_encode`` arms, so it must reproduce the ENTIRE oracled result.
* ``stacked_union`` — for fused entries whose arms are stacked ROWS
  (hash_dedup_candidates, embedding_dedup_clusters, ann_topk,
  sessionize_rollup, ngram_jaccard_top_pairs): the concatenation of
  every single-arm frame must value-hash-equal the fused default
  frame. This witnesses both directions at once — no arm row is lost
  or changed when selected alone, and the arms partition the fused
  output.
* ``family_projection`` — for fused entries whose arms are column
  FAMILIES over a shared base (doc_dedup_fingerprints, text_quality):
  each single-family frame must value-hash-equal the fused frame
  projected onto exactly that frame's columns.

Usage::

    python tools/knob_gate.py [--sf-dir DIR] [--out KNOBGATE.json]

Exit code 1 if any check fails; the JSON records per-check pass/fail
either way so a red run is still a complete artifact.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from check_correctness import table_hash  # noqa: E402

from real_time_video_streaming_analytics_lakehouse_spark.plans import (  # noqa: E402
    CATALOG,
    llm_ops,
)
from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark  # noqa: E402
from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import TABLES  # noqa: E402

#: fused entries whose arms are stacked rows: union-of-singles must
#: hash-equal the fused default. (ngram's exact arm IS included here —
#: unlike the ×30 scale probe, sf0.01 is the catalog's own anchor
#: scale for it.)
STACKED: dict[str, tuple[str, ...]] = {
    "hash_dedup_candidates": ("minhash", "simhash"),
    "embedding_dedup_clusters": (
        "exact", "centroid_outlier", "semdedup_k4",
    ),
    "ann_topk": (
        "brute", "ivf_full_probe", "pq_full_refine", "ivfpq_persisted",
    ),
    "sessionize_rollup": ("gap_lag", "native_window"),
    "ngram_jaccard_top_pairs": ("exact", "stopcap"),
}

#: fused entries whose arms are column families over a shared base:
#: each single-family frame must hash-equal the fused frame projected
#: onto that frame's columns. () = the base alone.
FAMILIES: dict[str, tuple[tuple[str, ...], ...]] = {
    "doc_dedup_fingerprints": ((), ("holdout",), ("winnow",), ("span",)),
    "text_quality": (
        (), ("lang_id",), ("lm",), ("repetition",), ("tfidf",),
        ("bm25",), ("gate_exact",), ("gate_approx",),
    ),
}


def _query_fn(name: str):
    # the catalog IS the registry — resolving through it (rather than
    # a getattr sweep over the plans modules) guarantees the gate
    # witnesses exactly the function the driver runs, and fails loudly
    # for retired names (review finding, round 16)
    return CATALOG[name].fn


def _frame_hash(df) -> tuple[str, int, list[str]]:
    rows = [tuple(r) for r in df.collect()]
    return table_hash(rows, df.columns), len(rows), df.columns


def check_distributed_trainer(spark, con, sf_dir: str) -> dict:
    """The distributed BPE trainer through the full DuckDB oracle."""
    sdf = llm_ops.doc_token_stats(spark, sf_dir, trainer="distributed")
    srows = [tuple(r) for r in sdf.collect()]
    cur = con.execute(CATALOG["doc_token_stats"].oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    sh = table_hash(srows, sdf.columns)
    oh = table_hash(orows, ocols)
    return {
        "mode": "oracle",
        "pass": (
            len(srows) == len(orows)
            and sorted(sdf.columns) == sorted(ocols)
            and sh == oh
        ),
        "rows": len(srows),
        "spark_hash": sh,
        "oracle_hash": oh,
    }


def check_stacked(spark, sf_dir: str, name: str, arms) -> dict:
    fn = _query_fn(name)
    fused_hash, fused_rows, fused_cols = _frame_hash(fn(spark, sf_dir))
    all_rows: list[tuple] = []
    per_arm: dict[str, int] = {}
    cols_ok = True
    for a in arms:
        adf = fn(spark, sf_dir, arms=(a,))
        if adf.columns != fused_cols:
            # a schema drift is already a FAIL — do not feed the
            # mismatched rows to the hasher, whose column indexing
            # would crash and abort the whole gate (the artifact must
            # stay complete on a red run; review finding, round 16)
            cols_ok = False
            per_arm[a] = -1
            continue
        rows = [tuple(r) for r in adf.collect()]
        per_arm[a] = len(rows)
        all_rows.extend(rows)
    union_hash = (
        table_hash(all_rows, fused_cols) if cols_ok else None
    )
    return {
        "mode": "stacked_union",
        "pass": cols_ok and union_hash == fused_hash,
        "fused_rows": fused_rows,
        "arm_rows": per_arm,
        "fused_hash": fused_hash,
        "union_hash": union_hash,
    }


def check_families(spark, sf_dir: str, name: str, families) -> dict:
    fn = _query_fn(name)
    # execute the fused plan ONCE and project column subsets
    # driver-side — per-family fused.select() re-executions would
    # multiply this check's wall by the family count for identical
    # hashes (review finding, round 16)
    fused = fn(spark, sf_dir)
    fused_rows = [tuple(r) for r in fused.collect()]
    idx = {c: i for i, c in enumerate(fused.columns)}
    results: dict[str, bool] = {}
    ok = True
    for fam in families:
        label = "+".join(fam) if fam else "base"
        fdf = fn(spark, sf_dir, arms=fam)
        fam_hash, fam_rows, fam_cols = _frame_hash(fdf)
        if any(c not in idx for c in fam_cols):
            results[label] = False
            ok = False
            continue
        proj = [
            tuple(r[idx[c]] for c in fam_cols) for r in fused_rows
        ]
        good = (
            fam_hash == table_hash(proj, fam_cols)
            and fam_rows == len(proj)
        )
        results[label] = good
        ok = ok and good
    return {"mode": "family_projection", "pass": ok, "families": results}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default="/root/testdata/sf0.01",
        help="driver-gate scale: the same sf the driver oracles at",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spark = get_spark("knob_gate")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    checks: dict[str, dict] = {}
    checks["doc_token_stats[trainer=distributed]"] = (
        check_distributed_trainer(spark, con, args.sf_dir)
    )
    for name, arms in STACKED.items():
        checks[name] = check_stacked(spark, args.sf_dir, name, arms)
    for name, fams in FAMILIES.items():
        checks[name] = check_families(spark, args.sf_dir, name, fams)

    out_obj = {
        "date": datetime.date.today().isoformat(),
        "sf_dir": args.sf_dir,
        "note": (
            "knob-path witnesses (VERDICT r15 #5): oracle = vs the "
            "catalog's DuckDB SQL; stacked_union = concat of "
            "single-arm frames hash-equals the fused default; "
            "family_projection = each single-family frame hash-equals "
            "the fused frame projected onto its columns (hashes via "
            "check_correctness.table_hash, order-insensitive)"
        ),
        "checks": checks,
        "all_pass": all(c["pass"] for c in checks.values()),
    }
    for k, c in checks.items():
        print(f"{'PASS' if c['pass'] else 'FAIL'}  {k} ({c['mode']})")
    if args.out:
        with open(args.out, "w") as f:
            f.write(json.dumps(out_obj, indent=1) + "\n")
    print(json.dumps({"knob_gate": {"all_pass": out_obj["all_pass"]}}))
    return 0 if out_obj["all_pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
