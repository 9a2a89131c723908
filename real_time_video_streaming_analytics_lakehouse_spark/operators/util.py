"""Operator-side parallelism helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input is under-parallelized.

    Small dimension-style tables often arrive as a single parquet file →
    one partition → a CPU-bound operator (shingling, hashing, vector
    math) runs single-threaded. One cheap round-robin shuffle of the
    narrow input unlocks every core.

    At 100 TB inputs already carry thousands of partitions, so this is a
    no-op there — it never *reduces* partitioning and never repartitions
    a well-partitioned input.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
