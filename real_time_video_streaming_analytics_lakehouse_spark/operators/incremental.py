"""Incremental aggregate refresh (incremental view maintenance).

Completes the reference's incremental-load pattern
(``spark-jobs/etl_framework.py:210-239``: watermark read → filtered
extract) into a full maintenance loop for decomposable gold aggregates:
only NEW events (beyond the gold table's stored watermark) are scanned
and aggregated, and their partial aggregates are COMBINED with the
existing gold rows — sum+sum, count+count, max(max) — instead of
recomputing the table.

At 100 TB this is the difference between scanning a day of new events
and scanning years of history on every refresh. Only decomposable
aggregates qualify (sum/count/min/max and anything derived from them at
read time, e.g. avg = sum/count); exact count_distinct does not — route
those through :func:`..skew.salted_count_distinct` over the raw table
or persist mergeable HLL sketch columns (:mod:`.sketches` — build per
delta, union with the stored sketches; estimate-identical to a rebuild).

The gold table carries a ``_watermark_us`` column (same value on every
row — the max event time folded into the table so no side-channel state
store is needed, matching the reference's pattern of reading the
watermark from the target itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dialect import epoch_us

_WM = "_watermark_us"


def _aggregate_partials(
    events: DataFrame, keys: list[str], ts_col: str
) -> tuple[DataFrame, int | None]:
    """One evaluation of the per-key partial aggregate, shared by every
    downstream reader: the frame is localCheckpoint'd (lazily) BEFORE
    the 1-row watermark collect, so that collect materializes it and
    all later consumers (the combine join, the caller's actions) read
    the materialization instead of re-running the scan+aggregate."""
    agg = events.groupBy(*keys).agg(
        F.count("*").alias("events_cnt"),
        F.sum("value").alias("value_sum"),
        F.max("value").alias("value_max"),
        F.max(epoch_us(F.col(ts_col))).alias("_max_us"),
    ).localCheckpoint(eager=False)
    wm = agg.agg(F.max("_max_us")).collect()[0][0]  # 1-row driver read
    return agg.drop("_max_us"), wm


def aggregate_events(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """The refreshable gold aggregate shape: per-key decomposable
    partials + the fold-in watermark column."""
    agg, wm = _aggregate_partials(events, keys, ts_col)
    return agg.withColumn(_WM, F.lit(wm).cast("long"))


def incremental_refresh(
    gold: DataFrame,
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Combine ``gold`` with the aggregate of events NEWER than its
    watermark. Result is row-identical to ``aggregate_events`` over the
    full event table (tested), but scans only the new slice: the
    ``ts > watermark`` predicate pushes into the parquet scan and, on a
    time-partitioned table, prunes whole partitions.

    One shuffle on ``keys`` for the delta aggregate + one outer join
    against gold (both sides partitioned by key); existing keys combine
    partials, new keys insert, untouched keys pass through. The delta
    aggregate is evaluated exactly ONCE (materialized by
    :func:`_aggregate_partials`'s watermark read — the combine join
    reads the materialization, and the advanced watermark comes back
    from that same read instead of a second aggregation).
    """
    wm = gold.agg(F.max(_WM)).collect()[0][0]  # 1-row driver read
    delta_events = events.filter(epoch_us(F.col(ts_col)) > F.lit(wm))
    delta, delta_wm = _aggregate_partials(delta_events, keys, ts_col)

    g = gold.select(
        *keys,
        F.col("events_cnt").alias("_g_cnt"),
        F.col("value_sum").alias("_g_sum"),
        F.col("value_max").alias("_g_max"),
    )
    d = delta.select(
        *keys,
        F.col("events_cnt").alias("_d_cnt"),
        F.col("value_sum").alias("_d_sum"),
        F.col("value_max").alias("_d_max"),
    )
    # NULL discipline, so the result stays row-identical to a full
    # recompute: a side's ROW is absent iff its count is NULL (counts
    # are never NULL on a present row), in which case the other side
    # passes through unchanged — including NULL partials (a key whose
    # values are all NULL must keep value_sum/value_max NULL, not
    # coalesce to 0 / -inf). When both rows are present, SUM follows
    # SQL semantics (NULL only if both partials are NULL) and
    # ``greatest`` already skips NULLs.
    absent_g = F.col("_g_cnt").isNull()
    absent_d = F.col("_d_cnt").isNull()
    combined = (
        g.join(d, keys, "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col("_g_cnt"), F.lit(0))
                + F.coalesce(F.col("_d_cnt"), F.lit(0))
            ).alias("events_cnt"),
            F.when(absent_g, F.col("_d_sum"))
            .when(absent_d, F.col("_g_sum"))
            .when(
                F.col("_g_sum").isNull() & F.col("_d_sum").isNull(),
                F.lit(None).cast("double"),
            )
            .otherwise(
                F.coalesce(F.col("_g_sum"), F.lit(0.0))
                + F.coalesce(F.col("_d_sum"), F.lit(0.0))
            )
            .alias("value_sum"),
            F.when(absent_g, F.col("_d_max"))
            .when(absent_d, F.col("_g_max"))
            .otherwise(F.greatest(F.col("_g_max"), F.col("_d_max")))
            .alias("value_max"),
        )
    )
    final_wm = wm if delta_wm is None else max(wm, delta_wm)
    return combined.withColumn(_WM, F.lit(final_wm).cast("long"))
