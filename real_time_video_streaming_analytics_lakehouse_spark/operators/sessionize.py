"""Gap-based sessionization + session rollup.

The reference rolls events up to sessions via a pre-assigned
``session_id`` (``spark-jobs/etl_framework.py:606-618``, A1 in SURVEY
§2.4). The driver's generic ``events`` table has no session column, so
this operator derives sessions the standard way: a new session starts
when a user's inter-event gap exceeds ``gap`` seconds (lag + running
sum over a per-user window).

Scale note: one shuffle on ``user_id``; both window functions reuse the
same partitioning/ordering so Catalyst plans a single sort. Skewed
power-users are bounded by per-user event counts, not table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.dialect import epoch_us, money_sum


def gap_sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Assign ``session_num`` (1-based per user) by inactivity gap."""
    order = [F.col(ts_col), F.col(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    us = epoch_us(F.col(ts_col))
    new_sess = (
        F.when(us - F.lag(us).over(w) > gap_sec * 1_000_000, 1)
        .when(F.lag(us).over(w).isNull(), 1)
        .otherwise(0)
    )
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new", new_sess).withColumn(
        "session_num", F.sum("_new").over(run)
    ).drop("_new")


def session_rollup(
    sessionized: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """Session-level aggregate (reference A1 shape: min/max/count/
    countDistinct/sum-when per session)."""
    us = epoch_us(F.col(ts_col))
    return sessionized.groupBy(user_col, "session_num").agg(
        F.count("*").alias("events"),
        F.count_distinct(type_col).alias("distinct_event_types"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        ((F.max(us) - F.min(us)) / F.lit(1_000_000)).cast("long").alias(
            "duration_sec"
        ),
        money_sum(F.col(value_col), 2).alias("total_value"),
        F.count(F.when(F.col(type_col) == "purchase", 1)).alias("purchases"),
    )
