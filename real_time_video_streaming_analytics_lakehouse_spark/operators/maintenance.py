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
) -> None:
    """OPTIMIZE-style small-file compaction (reference
    ``delta-lake/delta_setup.py:523-546``).

    With Delta: ``OPTIMIZE`` (``executeCompaction``). Without: rewrite
    the table coalesced to ~``target_file_mb`` files based on its
    on-disk size. At 100 TB run this per partition predicate, not
    table-wide.
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return
    df = spark.read.format(fmt).load(path)
    size_bytes = sum(
        int(f.stat().st_size)
        for f in __import__("pathlib").Path(path).rglob("*.parquet")
    )
    n_files = max(1, size_bytes // (target_file_mb * 1024 * 1024))
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(int(n_files)).write.format(fmt).mode("overwrite").save(tmp)
    atomic_swap_dir(path, tmp)


def _zvalue(cols: list[str], bits: int = 8) -> "F.Column":
    """Morton (Z-curve) value: per-column rank buckets, bits interleaved.

    Each column is reduced to a ``bits``-bit bucket via a percent_rank
    window (rank-based, so it is distribution-agnostic — skewed or
    categorical columns bucket as evenly as uniform ones), then bucket
    bits are interleaved MSB-first: z = b1[7] b2[7] b1[6] b2[6] ...
    Sorting by z gives every column locality that degrades gracefully
    with dimension count, unlike a lexicographic multi-column sort which
    gives the trailing columns none.
    """
    from pyspark.sql.window import Window

    buckets = [
        F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                F.percent_rank().over(Window.orderBy(F.col(c)))
                * (1 << bits)
            ).cast("long"),
        )
        for c in cols
    ]
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

    The percent_rank bucketing runs a global-order window per column —
    one pass over the data being rewritten, which is the same cost
    profile as Delta's OPTIMIZE ZORDER (clustering is an offline
    maintenance op, run per partition predicate at scale).
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).optimize().executeZOrderBy(*cols)
        return
    df = spark.read.parquet(path)
    n = num_files or max(2, spark.sparkContext.defaultParallelism)
    tmp = path.rstrip("/") + "__zordering"
    (
        df.withColumn("_z", _zvalue(cols))
        .repartitionByRange(n, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(tmp)
    )
    atomic_swap_dir(path, tmp)


def vacuum(spark: SparkSession, path: str, retention_hours: int = 168) -> None:
    """Delta VACUUM (delta_setup.py:548-566) — Delta-only."""
    if not HAVE_DELTA:
        raise NotImplementedError(
            "VACUUM requires delta-spark (transaction log retention); "
            "plain parquet has no stale-file concept"
        )
    DeltaTable.forPath(spark, path).vacuum(retention_hours)


def table_history(spark: SparkSession, path: str, limit: int = 20) -> DataFrame:
    """Delta history/time-travel (delta_setup.py:568-596) — Delta-only."""
    if not HAVE_DELTA:
        raise NotImplementedError(
            "history/time travel requires the Delta transaction log"
        )
    return DeltaTable.forPath(spark, path).history(limit)
