"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in :mod:`..session`) covers sort-merge
joins. For *decomposable* aggregates (sum/count/min/max) a plain
``groupBy`` already resists key skew: map-side partial aggregation sends
at most one row per (key, input partition) to the reducer. Salting earns
its extra shuffle only where partial aggregation can't compress —
``count_distinct`` being the canonical case: every distinct value of a
hot key ships to one reducer. :func:`salted_count_distinct` is the
two-stage rewrite for exactly that.

:func:`salted_aggregate` remains for sum/count pipelines whose first
stage benefits from an explicit intermediate (e.g. feeding several
downstream rollups); its salt is a hash of the row's value columns so
each hot key genuinely fans out across ``salt_buckets`` reducers
regardless of input partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    count_alias: str = "cnt",
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-stage salted groupBy: ``sums`` maps input column → output
    alias (summed); a row count is always produced. Result is identical
    to ``df.groupBy(keys).agg(sum..., count(*))`` — the salt only
    changes the physical shuffle shape.

    The salt hashes the summed value columns (NOT ``spark_partition_id``,
    which would confine each (key, salt) group to its input partition
    and reproduce what map-side partial aggregation already does), so a
    hot key's rows spread over ``salt_buckets`` stage-1 reducers.
    """
    # Count-only use (sums={}) still needs a salt: fall back to hashing
    # every column so hot-key rows spread across buckets.
    salt_cols = list(sums) or df.columns
    salt = F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(salt_buckets))
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        F.count("*").alias("_c"),
        *[F.sum(src).alias(f"_s_{alias}") for src, alias in sums.items()],
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_c").alias(count_alias),
        *[F.sum(f"_s_{alias}").alias(alias) for alias in sums.values()],
    )


def salted_count_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    alias: str = "distinct_cnt",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact ``count_distinct(value_col)`` per key, skew-safe.

    Plain ``groupBy(keys).agg(count_distinct(v))`` funnels every
    distinct value of a hot key through a single reducer — the one agg
    shape partial aggregation cannot compress. Salting by
    ``hash(value)`` partitions each key's *value space* across
    ``salt_buckets`` reducers: every distinct value lands in exactly one
    (key, salt) group, so stage 1's per-bucket exact distinct counts
    sum to the exact global count.
    """
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(salt_buckets))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(value_col)).alias("_d"))
    )
    return stage1.groupBy(*keys).agg(F.sum("_d").alias(alias))


def top_frequency_keys(df: DataFrame, key: Column | str, n: int = 10) -> DataFrame:
    """Identify skewed keys (frequency profile) — the diagnostic used to
    decide whether salting is worth the extra shuffle."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc())
        .limit(n)
    )
