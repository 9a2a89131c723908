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


# --- count-min sketch ------------------------------------------------------

def test_cms_never_undercounts_and_bounds_overcount(spark, events):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    width, depth = 1024, 5
    e = events.select(F.lit(1).alias("g"), F.col("user_id"))
    sketch = cms_build(e, ["g"], "user_id", depth=depth, width=width)
    exact = e.groupBy("g", "user_id").agg(F.count("*").alias("true_cnt"))
    est = cms_estimate(
        sketch, exact.select("g", "user_id"), ["g"], "user_id",
        depth=depth, width=width,
    )
    joined = exact.join(est, ["g", "user_id"]).collect()
    n = e.count()
    assert len(joined) > 0
    bound = 2.72 * n / width  # e*N/width, the CMS tail bound
    for r in joined:
        assert r["freq_est"] >= r["true_cnt"], "CMS must never undercount"
        assert r["freq_est"] - r["true_cnt"] <= bound


def test_cms_merge_is_row_identical_to_rebuild(spark, events):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_merge,
    )

    e = events.select(
        F.to_date("ts").alias("day"), F.col("user_id")
    ).withColumn("g", F.lit(1))
    days = sorted(r["day"] for r in e.select("day").distinct().collect())
    split = days[len(days) // 2]
    a = cms_build(e.filter(F.col("day") <= split), ["g"], "user_id")
    b = cms_build(e.filter(F.col("day") > split), ["g"], "user_id")
    merged = cms_merge(a, b, ["g"])
    rebuilt = cms_build(e, ["g"], "user_id")
    # counter addition is exact: merged table == full rebuild, row-wise
    assert merged.exceptAll(rebuilt).count() == 0
    assert rebuilt.exceptAll(merged).count() == 0


def test_cms_heavy_hitters_surface_hot_keys(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    # 3 hot keys (1000 each) in 10k rows of long-tail noise
    hot = spark.range(3000).select(
        F.lit(1).alias("g"), (F.col("id") % 3).alias("k")
    )
    noise = spark.range(10_000).select(
        F.lit(1).alias("g"), (F.col("id") % 2000 + 100).alias("k")
    )
    data = hot.unionByName(noise)
    sketch = cms_build(data, ["g"], "k", depth=5, width=512)
    candidates = data.select("g", "k").distinct()
    est = cms_estimate(sketch, candidates, ["g"], "k", depth=5, width=512)
    top = [
        r["k"]
        for r in est.orderBy(F.col("freq_est").desc()).limit(3).collect()
    ]
    assert set(top) == {0, 1, 2}


def test_combine_sketch_tables_merges_null_key_groups(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        combine_sketch_tables,
        sketch_distinct,
    )

    old = sketch_distinct(
        spark.createDataFrame(
            [(None, 1), (None, 2), ("a", 1)], "day STRING, v INT"
        ),
        ["day"], "v",
    )
    new = sketch_distinct(
        spark.createDataFrame(
            [(None, 2), (None, 3)], "day STRING, v INT"
        ),
        ["day"], "v",
    )
    merged = combine_sketch_tables(old, new, ["day"])
    rows = merged.select(
        "day", F.hll_sketch_estimate("sketch").alias("est")
    ).collect()
    by_key = {r["day"]: round(r["est"]) for r in rows}
    # ONE row for the NULL key, unioned to {1,2,3}
    assert len(rows) == 2
    assert by_key[None] == 3 and by_key["a"] == 1


def test_cms_excludes_nulls_like_hll(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    data = spark.createDataFrame(
        [(1, None)] * 50 + [(1, "x")] * 3, "g INT, v STRING"
    )
    sketch = cms_build(data, ["g"], "v", depth=3, width=64)
    # total mass in any hash row == non-null rows only
    per_row = sketch.groupBy("_d").agg(F.sum("cnt").alias("m")).collect()
    assert all(r["m"] == 3 for r in per_row)
    est = cms_estimate(
        sketch, spark.createDataFrame([(1, "x")], "g INT, v STRING"),
        ["g"], "v", depth=3, width=64,
    ).collect()[0]["freq_est"]
    assert est == 3


def test_cms_rejects_reserved_names(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import cms_build

    df = spark.createDataFrame([(1, 1)], "g INT, cnt INT")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="reserve"):
        cms_build(df, ["cnt"], "g")


def test_streaming_cms_maintenance_matches_batch(spark, tmp_path):
    """run_cms_stream across micro-batches is ROW-IDENTICAL to a batch
    cms_build over all events (CMS linearity), estimates never
    undercount true frequencies, and a replayed drain commits nothing
    (addition is NOT idempotent — the txn gate is the correctness
    mechanism)."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import Row

    from real_time_video_streaming_analytics_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.streaming import (
        run_cms_stream,
        stream_events_from_files,
    )

    src_dir = str(tmp_path / "cms_src")
    d1, d2 = dt.datetime(2024, 1, 1, 10, 0), dt.datetime(2024, 1, 2, 10, 0)
    batches = [
        [Row(event_id=1, ts=d1, user_id=1), Row(event_id=2, ts=d1, user_id=2),
         Row(event_id=3, ts=d2, user_id=1)],
        [Row(event_id=4, ts=d1, user_id=2), Row(event_id=5, ts=d1, user_id=2)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100,) * 2)

    table = str(tmp_path / "cms_table")
    ckpt = str(tmp_path / "cms_ckpt")

    def drain():
        src = stream_events_from_files(
            spark, src_dir, spark.read.parquet(src_dir).schema,
            max_files_per_trigger=1,
        ).withColumn("day", F.to_date("ts"))
        q = run_cms_stream(src, table, ckpt, ["day"], "user_id",
                           depth=3, width=64)
        q.awaitTermination(120)

    drain()
    tx = TxTable(spark, table)
    got = sorted(map(tuple, tx.read().collect()))
    all_events = spark.read.parquet(src_dir).withColumn("day", F.to_date("ts"))
    want = sorted(map(tuple, cms_build(
        all_events, ["day"], "user_id", depth=3, width=64
    ).collect()))
    assert got == want  # linearity: streamed == rebuilt, row-identical

    probes = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 2), (dt.date(2024, 1, 1), 1),
         (dt.date(2024, 1, 2), 1)],
        "day date, user_id int",
    )
    est = {
        (str(r["day"]), r["user_id"]): r["freq_est"]
        for r in cms_estimate(tx.read(), probes, ["day"], "user_id",
                              depth=3, width=64).collect()
    }
    # true counts: day1 user2 x3, day1 user1 x1, day2 user1 x1
    assert est[("2024-01-01", 2)] >= 3
    assert est[("2024-01-01", 1)] >= 1
    assert est[("2024-01-02", 1)] >= 1

    v = tx.snapshot().version
    drain()  # checkpoint replays nothing; counters NOT double-added
    assert TxTable(spark, table).snapshot().version == v
    assert sorted(map(tuple, TxTable(spark, table).read().collect())) == want
