"""Operator-side parallelism + local-filesystem helpers."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


class ScaleGuardrailError(ValueError):
    """An operator refused to run because a derived corpus bound was
    exceeded without an explicit opt-in (round 14: the ngram exact
    arm's all-pairs ceiling). A DEDICATED type so tooling (the scale
    probe) can distinguish an intentional refusal from any other
    ValueError a construction path might raise."""


def require_local_dir(path: str) -> str:
    """Validate that ``path`` is a local-filesystem directory path.

    The parquet fallbacks for table maintenance swap directories with
    ``os.rename`` — local-FS-only semantics. Object stores (s3://,
    hdfs://, ...) have no atomic directory rename; those deployments
    must use the Delta path instead, so refuse loudly rather than
    corrupt a table.
    """
    scheme = path.split("://", 1)[0] if "://" in path else ""
    if scheme not in ("", "file"):
        raise ValueError(
            f"parquet table-swap fallback is local-FS-only, got scheme "
            f"{scheme!r} for {path!r}; use the Delta code path for "
            f"object-store tables"
        )
    return path.removeprefix("file://")


def atomic_swap_dir(live_path: str, tmp_path: str) -> None:
    """Replace directory ``live_path`` with ``tmp_path`` crash-safely.

    Ordering matters: the live table is *renamed aside* first
    (``<live>__old``), the new data renamed into place, and only then is
    the old copy deleted. A crash between any two steps leaves the table
    recoverable (either still live, or intact at ``<live>__old``) —
    unlike rmtree-then-move, which has a window where the data is gone.
    ``os.rename`` is atomic on a local filesystem (same-FS assumed; see
    :func:`require_local_dir`).
    """
    live = require_local_dir(live_path).rstrip("/")
    tmp = require_local_dir(tmp_path).rstrip("/")
    # The aside name starts with "_" AND contains no "=" so that if a
    # crash leaves it behind INSIDE a table root (the partitioned-merge
    # case swaps partition dirs under the live table), Spark's file
    # listing ignores it — the filter drops "_"-prefixed names only
    # when they don't look like partition dirs ("=" present), so
    # "_day=X__old" would still be parsed as a phantom partition column.
    head, tail = os.path.split(live)
    old = os.path.join(head, "_" + tail.replace("=", "~") + "__old")
    shutil.rmtree(old, ignore_errors=True)  # leftover from a prior crash
    if os.path.exists(live):
        os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old, ignore_errors=True)


def local_relation(spark, rows, schema: str) -> DataFrame:
    """Bounded driver-side rows → DataFrame, evaluated in the JVM.

    A plain ``createDataFrame(list_of_tuples)`` builds a PICKLED Python
    RDD: every materialization (each broadcast build, each action) runs
    a ``defaultParallelism``-task Python-worker stage, and on this
    Spark/Python build each such task pays ~0.15-0.4 s of worker
    protocol overhead (``worker_util.setup_spark_files`` calls
    ``importlib.invalidate_caches()`` per task, and Python 3.11's
    ``zipimporter.invalidate_caches`` unconditionally re-reads the
    whole pyspark.zip table of contents) — measured 11 s task-time /
    0.7 s wall for a SEVEN-ROW mapping table on local[32] (guide §4:
    eliminate the Python boundary; §1.2: per-task work). The Arrow
    path (``createDataFrame(pandas_df)`` with
    ``spark.sql.execution.arrow.pyspark.enabled``) ships the same rows
    as Arrow record batches decoded entirely JVM-side: measured
    0.1 s wall, ZERO Python tasks, identical values and schema.

    Rows must be position-aligned tuples/lists matching ``schema`` (a
    DDL string). Falls back to the plain path for empty input (nothing
    ever evaluates) or when pandas is unavailable.
    """
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd
    except ImportError:  # pragma: no cover - pandas ships with the env
        return spark.createDataFrame(rows, schema)
    # top-level DDL column names (commas inside array<...>/struct<...>
    # and decimal(p,s) do not split fields)
    names, depth, start = [], 0, 0
    for i, ch in enumerate(schema + ","):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(schema[start:i].strip().split()[0])
            start = i + 1
    pdf = pd.DataFrame(
        {n: [r[i] for r in rows] for i, n in enumerate(names)},
        # object dtype end-to-end: None stays None (never coerced to
        # NaN by a numeric column), ints never become floats; the
        # explicit schema drives the Arrow cast.
        dtype=object,
    )
    return spark.createDataFrame(pdf, schema)


#: compressed-input bytes per repartition target partition for
#: :func:`ensure_parallelism` — ~64 KB of compressed text is ~0.5–1 MB
#: raw ≈ 0.1–0.3 s of shingle/hash CPU per task, comfortably above the
#: measured per-task fixed overhead (~20–50 ms scheduling + Python
#: worker protocol) while still fanning real work out. Round 16: the
#: previous target (always ``defaultParallelism``) spread a 584 KB
#: corpus over 32 near-empty tasks; interleaved A/B at sf0.1 measured
#: doc_dedup_fingerprints wall 4.4 → 3.1 s (task 92 → 20 s) and
#: ngram_jaccard_top_pairs wall 3.5 → 2.6 s (task 59 → 20 s) at the
#: bytes-derived count vs 32 (guide §2: derive partitioning from input
#: size, not a constant tuned for either local mode or the cluster).
ENSURE_PARALLELISM_BYTES_PER_PARTITION = 64 * 1024


def _scan_bytes(df: DataFrame) -> int | None:
    """Total size of the local files feeding ``df``'s scan, or None
    when the plan has no file scan (ExistingRDD, in-memory relation)
    or any file is not local/stat-able.

    Single-scan assumption (ADVICE r16): ``inputFiles`` sums over
    EVERY scan in the plan, so on a multi-table frame (a join) this
    would overcount and over-provision the repartition target. Every
    current caller passes a single-table scan; a caller wrapping a
    join should derive its own target instead."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        total = 0
        for f in files:
            path = f.removeprefix("file:")
            if "://" in path:
                return None
            total += os.path.getsize(path)
        return total
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input is under-parallelized.

    Small dimension-style tables often arrive as a single parquet file →
    one partition → a CPU-bound operator (shingling, hashing, vector
    math) runs single-threaded. One cheap round-robin shuffle of the
    narrow input unlocks the cores the input can actually feed.

    The target is derived from the INPUT SIZE (round 16, guide §2.5):
    one partition per :data:`ENSURE_PARALLELISM_BYTES_PER_PARTITION`
    of compressed input, clamped to [2, defaultParallelism] — a tiny
    corpus must not be sprayed across ``defaultParallelism`` near-empty
    tasks whose fixed per-task overhead (scheduling, Python worker
    protocol, block-manager round trips) dwarfs their work; a corpus
    big enough to feed every core still gets every core. When the
    input size is unknowable (no file scan under ``df``) the target
    falls back to ``defaultParallelism`` (the pre-round-16 behavior).

    At 100 TB inputs already carry thousands of partitions, so this is a
    no-op there — it never *reduces* partitioning and never repartitions
    a well-partitioned input.
    """
    sc = df.sparkSession.sparkContext
    if min_partitions is not None:
        target = min_partitions
    else:
        nbytes = _scan_bytes(df)
        # Floor at 2 ONLY when the session has ≥2 cores (ADVICE r16):
        # on local[1] the old max(2, ...) exceeded defaultParallelism
        # and added a repartition shuffle that buys nothing.
        floor = min(2, sc.defaultParallelism)
        target = (
            sc.defaultParallelism
            if nbytes is None
            else max(
                floor,
                min(
                    sc.defaultParallelism,
                    -(-nbytes // ENSURE_PARALLELISM_BYTES_PER_PARTITION),
                ),
            )
        )
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
