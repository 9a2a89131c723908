"""Mergeable HLL sketches (operators/sketches.py): accuracy, the
union-equals-rebuild property that incremental maintenance leans on,
and idempotent re-delivery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
    combine_sketch_tables,
    rollup_sketches,
    sketch_distinct,
)
from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )


def test_estimate_accuracy_vs_exact(spark, events):
    exact = events.select("user_id").distinct().count()
    est = (
        rollup_sketches(
            sketch_distinct(events, ["day"], "user_id"), [], estimate_col="e"
        )
        .collect()[0]["e"]
    )
    assert abs(est - exact) / exact < 0.05  # lg_k=12 → ~1.6% typical


def test_union_of_daily_equals_sketch_of_all(spark, events):
    """Register-wise max: the union of per-day sketches estimates
    IDENTICALLY to one sketch built over all events — the property
    that makes persisted sketches a safe substitute for rescans."""
    via_days = (
        rollup_sketches(
            sketch_distinct(events, ["day"], "user_id"), [], estimate_col="e"
        )
        .collect()[0]["e"]
    )
    direct = events.select(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("e")
    ).collect()[0]["e"]
    assert via_days == direct


def test_incremental_combine_matches_rebuild(spark, events):
    """Maintaining a per-day sketch table against a late-arriving delta
    gives the same estimates as rebuilding from all raw data."""
    cutoff = events.select(
        F.expr("percentile(unix_micros(ts::timestamp), 0.7)")
    ).first()[0]
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    old = events.filter(us <= cutoff)
    new = events.filter(us > cutoff)
    assert old.count() > 0 and new.count() > 0

    maintained = combine_sketch_tables(
        sketch_distinct(old, ["day"], "user_id"),
        sketch_distinct(new, ["day"], "user_id"),
        ["day"],
    )
    rebuilt = sketch_distinct(events, ["day"], "user_id")
    m = {
        r["day"]: r["e"]
        for r in maintained.select(
            "day", F.hll_sketch_estimate("sketch").alias("e")
        ).collect()
    }
    b = {
        r["day"]: r["e"]
        for r in rebuilt.select(
            "day", F.hll_sketch_estimate("sketch").alias("e")
        ).collect()
    }
    assert m == b


def test_streaming_sketch_maintenance_matches_batch(spark, tmp_path):
    """Streaming + sketches + native log integration: daily distinct
    users maintained by run_sketch_stream across micro-batches equal a
    batch rebuild over all events; a second drain commits nothing."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import Row

    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.streaming import (
        run_sketch_stream,
        stream_events_from_files,
    )

    src_dir = str(tmp_path / "sketch_src")
    d1, d2 = dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 2, 10, 0)
    batches = [
        # day 1: users 1,2 — day 2: user 1
        [Row(event_id=1, ts=d1, user_id=1), Row(event_id=2, ts=d1, user_id=2),
         Row(event_id=3, ts=d2, user_id=1)],
        # later batch touches day 1 again: user 2 repeats, user 3 is new
        [Row(event_id=4, ts=d1, user_id=2), Row(event_id=5, ts=d1, user_id=3)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100,) * 2)

    table = str(tmp_path / "sketch_table")
    ckpt = str(tmp_path / "sketch_ckpt")

    def drain():
        src = stream_events_from_files(
            spark, src_dir, spark.read.parquet(src_dir).schema,
            max_files_per_trigger=1,
        ).withColumn("day", F.to_date("ts"))
        q = run_sketch_stream(src, table, ckpt, ["day"], "user_id")
        q.awaitTermination(120)

    drain()
    tx = TxTable(spark, table)
    got = {
        str(r["day"]): r["e"]
        for r in tx.read()
        .select("day", F.hll_sketch_estimate("sketch").alias("e"))
        .collect()
    }
    all_events = spark.read.parquet(src_dir).withColumn("day", F.to_date("ts"))
    want = {
        str(r["day"]): r["e"]
        for r in sketch_distinct(all_events, ["day"], "user_id")
        .select("day", F.hll_sketch_estimate("sketch").alias("e"))
        .collect()
    }
    assert got == want == {"2024-01-01": 3, "2024-01-02": 1}

    v = tx.snapshot().version
    drain()  # no new files: the checkpoint replays nothing
    assert TxTable(spark, table).snapshot().version == v


def test_redelivery_is_idempotent(spark, events):
    """Unioning the same delta twice changes nothing — sketch columns
    are safe under at-least-once delivery."""
    day = sketch_distinct(events, ["day"], "user_id")
    once = combine_sketch_tables(day, day, ["day"])
    est_once = {
        r["day"]: r["e"]
        for r in once.select(
            "day", F.hll_sketch_estimate("sketch").alias("e")
        ).collect()
    }
    est_base = {
        r["day"]: r["e"]
        for r in day.select(
            "day", F.hll_sketch_estimate("sketch").alias("e")
        ).collect()
    }
    assert est_once == est_base
