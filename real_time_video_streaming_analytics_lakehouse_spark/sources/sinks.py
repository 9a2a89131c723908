"""Partitioned batch sinks.

Mirrors the reference's Delta/file sinks (SURVEY §2.1 S5-S7, S12):
date-partitioned append/overwrite writers. Plain parquet here; the same
calls take ``format("delta")`` when delta-spark is on the classpath.

Scale notes: hive-style year/month/day partitioning is what makes the
views' date-range predicates prune at 100 TB (reference
``etl_framework.py:286-291``). Writers repartition by the partition
columns first so each task writes one file per partition instead of
every task writing into every partition (the small-files problem the
reference fights with OPTIMIZE, delta_setup.py:523-546).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def add_date_partitions(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive year/month/day partition columns from a timestamp
    (reference etl_framework.py:286-291)."""
    return (
        df.withColumn("year", F.year(ts_col))
        .withColumn("month", F.month(ts_col))
        .withColumn("day", F.dayofmonth(ts_col))
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_cols: tuple[str, ...] = ("year", "month", "day"),
    fmt: str = "parquet",
) -> None:
    """Date-partitioned write with one-file-per-partition layout."""
    (
        df.repartition(*[F.col(c) for c in partition_cols])
        .write.format(fmt)
        .mode(mode)
        .partitionBy(*partition_cols)
        .save(path)
    )
