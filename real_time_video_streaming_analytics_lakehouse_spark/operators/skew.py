"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in :mod:`..session`) covers sort-merge
joins; *aggregations* over heavily skewed keys still funnel each hot key
through one reducer. :func:`salted_aggregate` is the classic two-stage
rewrite: salt the key, pre-aggregate per (key, salt), then combine —
turning one hot partition into ``salt_buckets`` parallel ones.

Only decomposable aggregates (sum/count/min/max — anything with an
associative merge) can be salted this way; avg is expressed as
sum+count and divided after the combine.
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
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        F.count("*").alias("_c"),
        *[F.sum(src).alias(f"_s_{alias}") for src, alias in sums.items()],
    )
    return stage1.groupBy(*keys).agg(
        F.sum("_c").alias(count_alias),
        *[F.sum(f"_s_{alias}").alias(alias) for alias in sums.values()],
    )


def top_frequency_keys(df: DataFrame, key: Column | str, n: int = 10) -> DataFrame:
    """Identify skewed keys (frequency profile) — the diagnostic used to
    decide whether salting is worth the extra shuffle."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc())
        .limit(n)
    )
