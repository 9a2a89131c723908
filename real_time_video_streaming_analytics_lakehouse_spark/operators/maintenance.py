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


def _zvalue(df: DataFrame, cols: list[str], bits: int = 8) -> "F.Column":
    """Morton (Z-curve) value: per-column rank buckets, bits interleaved.

    Each column is reduced to a ``bits``-bit bucket by ranking against
    its own approximate quantile cutpoints (``approxQuantile`` — one
    distributed pass, 2^bits-1 cutpoints to the driver; rank-based, so
    skewed columns bucket as evenly as uniform ones). A percent_rank
    window would be simpler but funnels the whole table through a
    single-partition sort. Bucket bits are then interleaved MSB-first:
    z = b1[7] b2[7] b1[6] b2[6] ... Sorting by z gives every column
    locality, unlike a lexicographic multi-column sort which gives the
    trailing columns none.
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    buckets = []
    for c in cols:
        cuts = sorted(set(df.approxQuantile(c, probs, 0.01)))
        # bucket = #cutpoints <= value (map-side fold over a literal
        # array; distinct cutpoints keep it <= 2^bits-1 comparisons)
        b = F.aggregate(
            F.lit(cuts),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(F.col(c) >= x, 1).otherwise(0).cast("long"),
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
    quantile pass per column plus the rewrite shuffle (clustering is an
    offline maintenance op, run per partition predicate at scale).
    Numeric columns only in the parquet fallback (approxQuantile).
    """
    if HAVE_DELTA:
        DeltaTable.forPath(spark, path).optimize().executeZOrderBy(*cols)
        return
    df = spark.read.parquet(path)
    n = num_files or max(2, spark.sparkContext.defaultParallelism)
    tmp = path.rstrip("/") + "__zordering"
    (
        df.withColumn("_z", _zvalue(df, cols))
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
