"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every catalog query in Spark and its oracle in DuckDB on the same
parquet tables, then compares row count, column names, and order-
insensitive value hashes.

Floats are canonicalized via FULL-PRECISION ``repr`` — stricter than any
plausible driver policy. Round 1 taught us the driver hashes tighter
than ``round(v, 9)``: the only safe target is bit-identical IEEE values
on both engines (see plans/catalog.py for the arithmetic policy that
achieves this).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       python tools/check_correctness.py --diff [sf_dir] [query ...]
           (prints per-column value diffs for failing queries)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG
from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark
from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import TABLES


def canon_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def table_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def diff_rows(srows, scols, orows, ocols, max_print: int = 8) -> None:
    """Print differences between canonical row sets.

    Equal-cardinality sides are compared pairwise in sorted order
    (cell-level diffs); unequal sides are compared as multisets — a
    positional zip would misalign every row after the first extra/
    missing one and print spurious diffs.
    """
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    cols = [scols[i] for i in order_s]
    skey = sorted(tuple(canon_cell(r[i]) for i in order_s) for r in srows)
    okey = sorted(tuple(canon_cell(r[i]) for i in order_o) for r in orows)
    shown = 0
    if len(skey) != len(okey):
        from collections import Counter

        sc, oc = Counter(skey), Counter(okey)
        for label, extra in (("spark-only", sc - oc), ("oracle-only", oc - sc)):
            for row in list(extra.elements())[:max_print]:
                print(f"    {label}: {dict(zip(cols, row))}")
        return
    for sk, ok in zip(skey, okey):
        if sk == ok:
            continue
        for c, a, b in zip(cols, sk, ok):
            if a != b:
                print(f"    col {c}: spark={a} oracle={b}")
                shown += 1
                if shown >= max_print:
                    return


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--diff"]
    want_diff = "--diff" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, spec in sorted(CATALOG.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        if not problems:
            sh, oh = table_hash(srows, scols), table_hash(orows, ocols)
            if sh != oh:
                problems.append(f"hash {sh} vs {oh}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if want_diff:
                diff_rows(srows, scols, orows, ocols)
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
