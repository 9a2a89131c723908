"""Table-maintenance operators (SURVEY §2.10 D1-D8).

delta-spark is not on this container's classpath, so the Delta-specific
surface (MERGE via DeltaTable, VACUUM, time travel, CDF) is gated behind
an import-try: with Delta present the functions delegate to the real
API; without it, the semantically equivalent parquet operations run
(compaction = partition rewrite; merge = logical upsert from
:mod:`.merge`) and the Delta-only ops raise a clear error instead of
silently no-oping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .util import atomic_swap_dir

try:  # pragma: no cover - exercised only when delta-spark is installed
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except ImportError:
    DeltaTable = None
    HAVE_DELTA = False


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
    partitions: list[str] | None = None,
) -> None:
    """OPTIMIZE-style small-file compaction (reference
    ``delta-lake/delta_setup.py:523-546``).

    With Delta: ``OPTIMIZE`` (``executeCompaction``). Without: rewrite
    coalesced to ~``target_file_mb`` files based on on-disk size.

    ``partitions`` selects hive partition directories (e.g.
    ``["day=2024-01-01"]``) to compact individually — at 100 TB you
    compact recently-written partitions, never the whole table; each
    partition dir is rewritten and swapped independently, so a failure
    affects at most one partition.
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return
    import os

    targets = (
        [os.path.join(path.rstrip("/"), p) for p in partitions]
        if partitions
        else [path]
    )
    for tgt in targets:
        df = spark.read.format(fmt).load(tgt)
        size_bytes = sum(
            int(f.stat().st_size)
            for f in __import__("pathlib").Path(tgt).rglob("*.parquet")
        )
        n_files = max(1, size_bytes // (target_file_mb * 1024 * 1024))
        # The tmp dir must be INVISIBLE to Spark partition discovery if
        # a crash leaves it behind: leading "_" and no "=" in the name
        # (a `day=X__compacting` sibling inside the table root would
        # parse as a phantom partition and can double-read or flip the
        # inferred partition type — see util.atomic_swap_dir's aside
        # naming and the listing-filter rule it documents).
        clean = tgt.rstrip("/")
        tmp = os.path.join(
            os.path.dirname(clean),
            "_" + os.path.basename(clean).replace("=", "~") + "__compacting",
        )
        df.coalesce(int(n_files)).write.format(fmt).mode("overwrite").save(
            tmp
        )
        atomic_swap_dir(tgt, tmp)


def _rank_surrogate(df: DataFrame, col: str) -> "F.Column":
    """Order-preserving numeric surrogate for any orderable column, so
    quantile bucketing works uniformly: numerics pass through,
    timestamps/dates become epoch numbers, strings fold their first 8
    characters into an int64 (lexicographic order preserved for ASCII —
    the same prefix treatment Delta's Z-ORDER applies)."""
    t = dict(df.dtypes)[col].lower()
    c = F.col(col)
    if t.startswith("timestamp"):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    if t == "date":
        return F.unix_date(c).cast("double")
    if t in ("string", "varchar"):
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(8)),
            F.lit(0).cast("long"),
            lambda acc, i: acc * 256
            + F.coalesce(F.ascii(c.substr(i, F.lit(1))), F.lit(0)).cast(
                "long"
            ),
        ).cast("double")
    return c.cast("double")


def _zvalue(df: DataFrame, cols: list[str], bits: int = 8) -> "F.Column":
    """Morton (Z-curve) value: per-column rank buckets, bits interleaved.

    Each column is reduced to a per-column bucket by ranking its
    order-preserving numeric surrogate against approximate quantile
    cutpoints — ONE multi-column ``approxQuantile`` pass for all
    columns, with relativeError sized to the bucket width so adjacent
    cutpoints don't collapse (rank-based, so skewed columns bucket as
    evenly as uniform ones; a percent_rank window would funnel the
    table through a single-partition sort). Bucket bits are then
    interleaved MSB-first: z = b1[7] b2[7] b1[6] b2[6] ... Sorting by z
    gives every column locality, unlike a lexicographic sort which
    gives trailing columns none.

    Bit budget: bits is capped at 63 // len(cols) so the interleaved
    value never reaches the int64 sign bit (which would sort the top
    half of the leading column FIRST and silently destroy clustering).
    """
    bits = max(1, min(bits, 63 // max(1, len(cols))))
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    surrogates = {c: _rank_surrogate(df, c) for c in cols}
    proj = df.select(
        *[s.alias(f"_zq{i}") for i, s in enumerate(surrogates.values())]
    )
    all_cuts = proj.approxQuantile(
        [f"_zq{i}" for i in range(len(cols))], probs, 1.0 / (2 * n_buckets)
    )
    def fold_for(s):
        # closure (NOT a default arg: pyspark reads lambda arity to pick
        # the 2- vs 3-parameter HOF form)
        return lambda acc, x: acc + F.when(s >= x, 1).otherwise(0).cast(
            "long"
        )

    buckets = []
    for (c, surrogate), cuts in zip(surrogates.items(), all_cuts):
        cuts = sorted(set(cuts))
        # bucket = #cutpoints <= value (map-side fold over a literal
        # array; distinct cutpoints keep it <= 2^bits-1 comparisons)
        b = F.aggregate(
            F.lit(cuts), F.lit(0).cast("long"), fold_for(surrogate)
        )
        # Rescale to the FULL bit range: a low-cardinality column dedups
        # to few cutpoints, and raw counts {1..k} live in the low bits —
        # the interleave would then be dominated by high-cardinality
        # columns. Spreading over [0, 2^bits-1] keeps every column's
        # split in the TOP interleaved bits.
        b = F.call_function(
            "div", b * F.lit(n_buckets - 1), F.lit(max(1, len(cuts)))
        )
        buckets.append(b)
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for bit in range(bits - 1, -1, -1):
        for b in buckets:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(b, bit).bitwiseAND(one)
            )
    return z


def zorder_by(
    spark: SparkSession, path: str, cols: list[str], num_files: int | None = None
) -> None:
    """Z-ORDER data clustering (reference delta_setup.py:536).

    With Delta: ``executeZOrderBy``. Without: a true Morton-curve
    rewrite — rows are range-partitioned and sorted by the interleaved
    z-value of the requested columns, so parquet min/max footers prune
    on ANY of the columns, not just the leading one (a plain
    lexicographic sort clusters only its first column). The partition
    count is pinned explicitly (AQE would coalesce small inputs to one
    partition, destroying the clustering).

    Cost profile matches Delta's OPTIMIZE ZORDER: one distributed
    multi-column quantile pass plus the rewrite shuffle (clustering is
    an offline maintenance op, run per partition predicate at scale).
    Numeric, temporal, and string columns are supported (strings rank
    by their 8-char prefix, like Delta).
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).optimize().executeZOrderBy(*cols)
        return
    df = spark.read.parquet(path)
    n = num_files or max(2, spark.sparkContext.defaultParallelism)
    tmp = path.rstrip("/") + "__zordering"
    zcol = "_z__morton_tmp"
    while zcol in df.columns:  # never clobber a real column
        zcol += "_"
    (
        df.withColumn(zcol, _zvalue(df, cols))
        .repartitionByRange(n, F.col(zcol))
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    atomic_swap_dir(path, tmp)


def vacuum(spark: SparkSession, path: str, retention_hours: int = 168) -> None:
    """VACUUM (delta_setup.py:548-566).

    Delta when installed; otherwise the native transaction log
    (:mod:`.txlog`) provides the identical semantics — delete files
    tombstoned longer than ``retention_hours`` ago plus crash
    stragglers. Raises only for a plain parquet dir with NO log, where
    "stale file" is genuinely undefined.
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).vacuum(retention_hours)
        return
    from .txlog import TxTable

    if TxTable.exists(spark, path):
        TxTable(spark, path).vacuum(retention_hours)
        return
    raise NotImplementedError(
        "VACUUM needs a transaction log (Delta or txlog); plain parquet "
        "has no stale-file concept — create the table via TxTable to "
        "get vacuum/time-travel/CDF without delta-spark"
    )


def table_history(spark: SparkSession, path: str, limit: int = 20) -> DataFrame:
    """History / time travel (delta_setup.py:568-596).

    Delta when installed; otherwise served from the native transaction
    log for :class:`.txlog.TxTable` tables (same core columns).
    """
    if HAVE_DELTA:
        return DeltaTable.forPath(spark, path).history(limit)
    from .txlog import TxTable

    if TxTable.exists(spark, path):
        return TxTable(spark, path).history(limit)
    raise NotImplementedError(
        "history/time travel needs a transaction log (Delta or txlog)"
    )
