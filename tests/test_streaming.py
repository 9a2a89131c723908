"""Streaming semantics tests (SURVEY §5.2): file-source streams drained
with Trigger.AvailableNow into parquet sinks; assertions on window
boundaries [start, end), append-mode emission (windows flush only once
the watermark passes their end), late-data drop, and checkpoint
idempotence."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import Row

from real_time_video_streaming_analytics_lakehouse_spark.streaming import (
    anomaly_stream,
    dedup_stream,
    run_available_now,
    run_merge_stream,
    stream_events_from_files,
    user_activity_stream,
)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_src") / "data")
    rows = [
        # window [10:00, 10:05)
        Row(event_id=1, ts=dt.datetime(2024, 1, 1, 10, 0, 30), user_id=1,
            event_type="view", value=10.0),
        Row(event_id=2, ts=dt.datetime(2024, 1, 1, 10, 4, 59), user_id=2,
            event_type="view", value=20.0),
        # boundary: 10:05:00 belongs to the NEXT window
        Row(event_id=3, ts=dt.datetime(2024, 1, 1, 10, 5, 0), user_id=1,
            event_type="view", value=30.0),
        # error burst for anomaly: 2 events same user same minute
        Row(event_id=4, ts=dt.datetime(2024, 1, 1, 10, 7, 1), user_id=3,
            event_type="error", value=1.0),
        Row(event_id=5, ts=dt.datetime(2024, 1, 1, 10, 7, 2), user_id=3,
            event_type="error", value=1.0),
        # watermark advancer: pushes the watermark past every window end
        # above so append mode flushes them; its own window never emits.
        Row(event_id=99, ts=dt.datetime(2024, 1, 1, 11, 0, 0), user_id=99,
            event_type="advance", value=0.0),
    ]
    spark.createDataFrame(rows).write.parquet(path)
    return path


def _drain(stream_df, tmp_path, name):
    out, ckpt = f"{tmp_path}/{name}_out", f"{tmp_path}/{name}_ckpt"
    q = run_available_now(stream_df, out, ckpt)
    q.awaitTermination(120)
    return out, ckpt


def test_user_activity_tumbling_windows(spark, events_dir, tmp_path):
    src = stream_events_from_files(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    out, ckpt = _drain(user_activity_stream(src), tmp_path, "ua")
    got = {
        (r["window_start"], r["event_type"]): (r["events_cnt"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    w0 = dt.datetime(2024, 1, 1, 10, 0)
    w1 = dt.datetime(2024, 1, 1, 10, 5)
    assert got[(w0, "view")] == (2, 30.0)  # 10:05:00 excluded from first window
    assert got[(w1, "view")] == (1, 30.0)
    assert got[(w1, "error")] == (2, 2.0)
    # the advancer's own window ([11:00,11:05)) is still open → not emitted
    assert all(ws < dt.datetime(2024, 1, 1, 11, 0) for ws, _ in got)

    # checkpoint idempotence (T6): re-running the same drain adds nothing
    src2 = stream_events_from_files(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    q2 = run_available_now(user_activity_stream(src2), out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)


def test_anomaly_stream_flags_error_burst_only(spark, events_dir, tmp_path):
    src = stream_events_from_files(
        spark, events_dir, spark.read.parquet(events_dir).schema
    )
    out, _ = _drain(anomaly_stream(src), tmp_path, "anom")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["user_id"], r["anomaly_type"], r["events_cnt"]) == (3, "error_burst", 2)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """A duplicated (event_id, ts) arriving in a LATER micro-batch is
    suppressed by the watermarked dropDuplicates state."""
    src_dir = str(tmp_path / "dup_src")
    e1 = Row(event_id=1, ts=dt.datetime(2024, 1, 1, 12, 0, 0), user_id=1,
             event_type="view", value=1.0)
    e2 = Row(event_id=2, ts=dt.datetime(2024, 1, 1, 12, 1, 0), user_id=1,
             event_type="view", value=2.0)
    batches = [[e1], [e1, e2]]  # e1 redelivered in batch 2
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema, max_files_per_trigger=1
    )
    out, _ = _drain(dedup_stream(src), tmp_path, "dedup")
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_dedup_within_watermark_catches_restamped_redelivery(spark, tmp_path):
    """``dropDuplicatesWithinWatermark`` dedups on the business key
    alone: a redelivered event whose retry was RESTAMPED with a newer
    event time (the normal at-least-once producer behavior, which
    ``dropDuplicates([id, ts])`` cannot catch) is still suppressed,
    as long as the two arrivals are within the watermark delay."""
    from real_time_video_streaming_analytics_lakehouse_spark.streaming import (
        dedup_stream_within_watermark,
    )

    src_dir = str(tmp_path / "restamp_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    e1 = Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0)
    # redelivery of id=1, restamped 2 minutes later (< 30 min watermark)
    e1b = Row(event_id=1, ts=t + dt.timedelta(minutes=2), user_id=1,
              event_type="view", value=1.0)
    e2 = Row(event_id=2, ts=t + dt.timedelta(minutes=1), user_id=1,
             event_type="view", value=2.0)
    batches = [[e1], [e1b, e2]]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema, max_files_per_trigger=1
    )
    out, _ = _drain(dedup_stream_within_watermark(src), tmp_path, "dedup_wm")
    rows = spark.read.parquet(out).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2]
    # the SURVIVING id=1 row is the first arrival, not the restamp
    assert [r["ts"] for r in rows if r["event_id"] == 1] == [t]


def test_quarantine_stream_splits_good_and_bad(spark, tmp_path):
    """Streaming DQ gate: valid rows land in the good table, violating
    rows land in quarantine WITH their rule names; a second drain
    commits nothing to either table."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.quality import DQRuleSet
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.streaming import (
        run_quarantine_stream,
    )
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "dq_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0),
         Row(event_id=2, ts=t, user_id=None, event_type="view", value=2.0)],
        [Row(event_id=3, ts=t, user_id=3, event_type="view", value=-5.0),
         Row(event_id=4, ts=t, user_id=4, event_type="view", value=4.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(
            rows,
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE",
        ).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100,) * 2)

    rules = (
        DQRuleSet()
        .not_null("user_id")
        .add_rule("value", "non_negative", F.col("value") < 0)
    )
    good_p, quar_p = str(tmp_path / "good"), str(tmp_path / "quarantine")
    ckpt = str(tmp_path / "dq_ckpt")

    def drain():
        src = stream_events_from_files(
            spark, src_dir, spark.read.parquet(src_dir).schema,
            max_files_per_trigger=1,
        )
        q = run_quarantine_stream(src, rules, good_p, quar_p, ckpt)
        q.awaitTermination(120)

    drain()
    good = TxTable(spark, good_p).read()
    quar = TxTable(spark, quar_p).read()
    assert sorted(r["event_id"] for r in good.collect()) == [1, 4]
    bad = {r["event_id"]: r["_dq_errors"] for r in quar.collect()}
    assert bad == {2: "user_id.not_null", 3: "value.non_negative"}
    assert "_dq_errors" not in good.columns  # good table stays clean

    vg = TxTable(spark, good_p).snapshot().version
    vq = TxTable(spark, quar_p).snapshot().version
    drain()  # no new files
    assert TxTable(spark, good_p).snapshot().version == vg
    assert TxTable(spark, quar_p).snapshot().version == vq


def test_run_merge_stream_upserts_per_batch(spark, tmp_path):
    """foreachBatch MERGE sink: later micro-batches update matching keys
    and insert new ones; final target holds exactly the latest row per
    key (the reference's streaming run + MERGE load path). Unpartitioned
    targets route to the versioned transaction-log sink (round 4), so
    the result reads back through TxTable."""
    src_dir = str(tmp_path / "merge_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0),
         Row(event_id=2, ts=t, user_id=2, event_type="view", value=2.0)],
        # update id=1 (newer ts), insert id=3
        [Row(event_id=1, ts=t + dt.timedelta(minutes=1), user_id=1,
             event_type="click", value=10.0),
         Row(event_id=3, ts=t, user_id=3, event_type="view", value=3.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema, max_files_per_trigger=1
    )
    target = f"{tmp_path}/merge_target"
    q = run_merge_stream(src, target, f"{tmp_path}/merge_ckpt",
                         keys=["event_id"], precedence_col="ts")
    q.awaitTermination(120)
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable

    out = {r["event_id"]: (r["event_type"], r["value"])
           for r in TxTable(spark, target).read().collect()}
    assert out == {1: ("click", 10.0), 2: ("view", 2.0), 3: ("view", 3.0)}


def test_run_merge_stream_accepts_file_uri_target(spark, tmp_path):
    """A file:// target URI must behave identically to a plain path:
    the sink normalizes it before its os.path.exists checks, so batch 2
    MERGES into batch 1's keys instead of silently taking the
    first-batch overwrite path every time."""
    src_dir = str(tmp_path / "uri_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0)],
        [Row(event_id=2, ts=t, user_id=2, event_type="view", value=2.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema, max_files_per_trigger=1
    )
    q = run_merge_stream(
        src, f"file://{tmp_path}/uri_target", f"{tmp_path}/uri_ckpt",
        keys=["event_id"], precedence_col="ts",
    )
    q.awaitTermination(120)
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable

    rows = TxTable(spark, f"{tmp_path}/uri_target").read().collect()
    # both batches' keys survive — batch 2 merged, not overwrote
    assert sorted(r["event_id"] for r in rows) == [1, 2]


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Rows older than the current watermark are dropped (T1/T3).

    Four single-file micro-batches (maxFilesPerTrigger=1, file order
    pinned via mtime): 12:00 → watermark 11:50; 13:00 → watermark
    12:50; then a 9:00 straggler arrives hours behind the watermark in
    its own batch and is dropped (numRowsDroppedByWatermark); a 14:00
    advancer flushes [13:00,13:05). The straggler's window must never
    appear. (Observed Spark nuance: a straggler SHARING a micro-batch
    with the row that advances the watermark can still be admitted —
    the drop is enforced against the watermark at batch start.)"""
    src_dir = str(tmp_path / "late_src")
    batches = [
        [Row(event_id=1, ts=dt.datetime(2024, 1, 1, 12, 0, 0), user_id=1,
             event_type="view", value=1.0)],
        [Row(event_id=2, ts=dt.datetime(2024, 1, 1, 13, 0, 0), user_id=1,
             event_type="view", value=1.0)],
        [Row(event_id=3, ts=dt.datetime(2024, 1, 1, 9, 0, 0), user_id=1,
             event_type="view", value=1.0)],  # hours late, own batch
        [Row(event_id=4, ts=dt.datetime(2024, 1, 1, 14, 0, 0), user_id=1,
             event_type="view", value=1.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        # FileStreamSource orders files by modification time; pin it so
        # micro-batch order matches write order.
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))

    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema, max_files_per_trigger=1
    )
    out, _ = _drain(
        user_activity_stream(src, watermark="10 minutes"), tmp_path, "late"
    )
    emitted = {r["window_start"] for r in spark.read.parquet(out).collect()}
    assert emitted == {
        dt.datetime(2024, 1, 1, 12, 0),
        dt.datetime(2024, 1, 1, 13, 0),
    }


def test_run_merge_stream_partitioned_rewrites_only_touched(spark, tmp_path):
    """With partition_col, a micro-batch touching one partition rewrites
    only that partition dir: the untouched partition's data file is the
    same inode afterwards (VERDICT #6)."""
    src_dir = str(tmp_path / "pmerge_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    batches = [
        # batch 1 seeds both partitions
        [Row(event_id=1, day=d1, ts=t, value=1.0),
         Row(event_id=2, day=d2, ts=t, value=2.0)],
        # batch 2 touches only day=2024-01-02
        [Row(event_id=2, day=d2, ts=t + dt.timedelta(minutes=1), value=20.0),
         Row(event_id=3, day=d2, ts=t, value=3.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    target = f"{tmp_path}/pmerge_target"

    # Drain batch 1 only (maxFilesPerTrigger=1 + two separate runs keeps
    # batch boundaries deterministic via the checkpoint).
    schema = spark.read.parquet(src_dir).schema

    def drain(n_files):
        src = stream_events_from_files(
            spark, src_dir, schema, max_files_per_trigger=n_files
        )
        q = run_merge_stream(src, target, f"{tmp_path}/pmerge_ckpt",
                             keys=["event_id"], precedence_col="ts",
                             partition_col="day")
        q.awaitTermination(120)

    drain(1)  # processes both files as two sequential micro-batches
    p1 = f"{target}/day=2024-01-01"
    p2 = f"{target}/day=2024-01-02"
    assert os.path.isdir(p1) and os.path.isdir(p2)
    out = {r["event_id"]: r["value"]
           for r in spark.read.parquet(target).collect()}
    assert out == {1: 1.0, 2: 20.0, 3: 3.0}

    # day=2024-01-01 was only written by batch 1: its file survived
    # batch 2 untouched (same inode => not rewritten).
    files1 = sorted(glob.glob(f"{p1}/*.parquet"))
    assert files1
    inode_before = os.stat(files1[0]).st_ino

    # batch 3: update partition day=2024-01-02 again
    rows3 = [Row(event_id=3, day=d2, ts=t + dt.timedelta(minutes=2),
                 value=30.0)]
    before = set(glob.glob(f"{src_dir}/*.parquet"))
    spark.createDataFrame(rows3).coalesce(1).write.mode("append").parquet(src_dir)
    for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
        os.utime(f, (1700000300, 1700000300))
    drain(1)
    assert os.stat(sorted(glob.glob(f"{p1}/*.parquet"))[0]).st_ino == inode_before
    out = {r["event_id"]: r["value"]
           for r in spark.read.parquet(target).collect()}
    assert out == {1: 1.0, 2: 20.0, 3: 30.0}


def test_run_merge_stream_rejects_object_store_paths(spark, tmp_path):
    import pytest

    from real_time_video_streaming_analytics_lakehouse_spark.operators.util import require_local_dir

    with pytest.raises(ValueError, match="local-FS-only"):
        require_local_dir("s3://bucket/table")
    assert require_local_dir("file:///tmp/x") == "/tmp/x"


def test_stream_monitor_prunes_failed_and_restarts(spark, tmp_path):
    """An intentionally failing query is detected on poll, restarted
    once via its factory, then the healthy restart drains and finishes;
    a query without a restart budget is pruned as failed (T8)."""
    import time

    from real_time_video_streaming_analytics_lakehouse_spark.streaming import StreamMonitor

    src_dir = str(tmp_path / "mon_src")
    spark.createDataFrame(
        [Row(event_id=1, ts=dt.datetime(2024, 1, 1), value=1.0)]
    ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def start(batch_fn, ckpt):
        src = stream_events_from_files(spark, src_dir, schema)
        return (src.writeStream.foreachBatch(batch_fn)
                .option("checkpointLocation", f"{tmp_path}/{ckpt}")
                .trigger(availableNow=True).start())

    def boom(df, bid):
        raise ValueError("intentional failure")

    sink: list[int] = []

    def good(df, bid):
        sink.append(df.count())

    def wait_inactive(q, timeout=60):
        t0 = time.time()
        while q.isActive and time.time() - t0 < timeout:
            time.sleep(0.2)
        assert not q.isActive

    # -- failing query WITH a restart budget: restarted then finishes --
    mon = StreamMonitor(max_restarts=1)
    q1 = start(boom, "ck_fail_restart")
    wait_inactive(q1)
    mon.register("flaky", q1,
                 restart=lambda: start(good, "ck_restarted"))
    snap = mon.poll_once()
    assert snap["queries"]["flaky"]["state"] == "restarted"
    assert "intentional failure" in snap["queries"]["flaky"]["exception"]
    # let the restarted query drain, then it reports finished
    wait_inactive(mon._tracked["flaky"].query)
    snap = mon.poll_once()
    assert snap["queries"]["flaky"]["state"] == "finished"
    assert sink == [1]

    # -- failing query WITHOUT restart budget: pruned as failed --
    mon2 = StreamMonitor()
    q2 = start(boom, "ck_fail_prune")
    wait_inactive(q2)
    mon2.register("doomed", q2)
    q3 = start(good, "ck_healthy")
    mon2.register("healthy", q3)
    snap = mon2.poll_once()
    assert snap["queries"]["doomed"]["state"] == "failed"
    assert mon2.failed_names == ["doomed"]
    # failed query stays excluded from later sweeps
    wait_inactive(q3)
    snap = mon2.poll_once()
    assert snap["queries"]["doomed"]["state"] == "failed"
    assert snap["queries"]["healthy"]["state"] == "finished"
    assert snap["active"] == 0


def test_purchase_attribution_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join: a purchase within 30 min of a
    same-user view is attributed; outside the window or cross-user it
    is not."""
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        purchase_attribution_stream,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    views = [
        Row(event_id=1, ts=t, user_id=1, event_type="view", value=0.0),
        Row(event_id=2, ts=t, user_id=2, event_type="view", value=0.0),
    ]
    purchases = [
        # in-window, same user → attributed
        Row(event_id=10, ts=t + dt.timedelta(minutes=10), user_id=1,
            event_type="purchase", value=9.99),
        # same user but 45 min later → outside window
        Row(event_id=11, ts=t + dt.timedelta(minutes=45), user_id=1,
            event_type="purchase", value=5.0),
        # different user → no join
        Row(event_id=12, ts=t + dt.timedelta(minutes=5), user_id=3,
            event_type="purchase", value=1.0),
    ]
    vdir, pdir = str(tmp_path / "views"), str(tmp_path / "purch")
    spark.createDataFrame(views).write.parquet(vdir)
    spark.createDataFrame(purchases).write.parquet(pdir)
    schema = spark.read.parquet(vdir).schema
    out = purchase_attribution_stream(
        stream_events_from_files(spark, vdir, schema),
        stream_events_from_files(spark, pdir, schema),
    )
    out_dir = str(tmp_path / "attr_out")
    q = (out.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", f"{tmp_path}/attr_ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    assert [(r["view_id"], r["purchase_id"], r["purchase_value"])
            for r in rows] == [(1, 10, 9.99)]


def test_stream_monitor_survives_failing_restart_factory(spark, tmp_path):
    """A restart factory that itself raises must not abort the sweep:
    the query is pruned as failed and other queries are still swept."""
    import time

    from real_time_video_streaming_analytics_lakehouse_spark.streaming import StreamMonitor

    src_dir = str(tmp_path / "mon2_src")
    spark.createDataFrame(
        [Row(event_id=1, ts=dt.datetime(2024, 1, 1), value=1.0)]
    ).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def boom(df, bid):
        raise ValueError("intentional failure")

    src = stream_events_from_files(spark, src_dir, schema)
    q = (src.writeStream.foreachBatch(boom)
         .option("checkpointLocation", f"{tmp_path}/mon2_ckpt")
         .trigger(availableNow=True).start())
    t0 = time.time()
    while q.isActive and time.time() - t0 < 60:
        time.sleep(0.2)

    def bad_factory():
        raise RuntimeError("checkpoint locked")

    src2 = stream_events_from_files(spark, src_dir, schema)
    q2 = (src2.writeStream.format("noop")
          .option("checkpointLocation", f"{tmp_path}/mon2_ok_ckpt")
          .trigger(availableNow=True).start())

    mon = StreamMonitor(max_restarts=2)
    mon.register("flaky", q, restart=bad_factory)
    mon.register("healthy", q2)
    snap = mon.poll_once()
    assert snap["queries"]["flaky"]["state"] == "failed"
    assert "restart failed" in snap["queries"]["flaky"]["exception"]
    assert "healthy" in snap["queries"]  # sweep continued past the failure
    q2.awaitTermination(60)


def test_run_merge_stream_null_partition_rows_survive(spark, tmp_path):
    """Rows in the NULL partition must merge, not be overwritten: isin()
    never matches NULL, so the null partition needs explicit handling."""
    src_dir = str(tmp_path / "nmerge_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [Row(event_id=1, day=None, ts=t, value=1.0)],
        [Row(event_id=2, day=None, ts=t, value=2.0)],  # same NULL partition
    ]
    schema = "event_id BIGINT, day DATE, ts TIMESTAMP, value DOUBLE"
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    target = f"{tmp_path}/nmerge_target"
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema,
        max_files_per_trigger=1,
    )
    q = run_merge_stream(src, target, f"{tmp_path}/nmerge_ckpt",
                         keys=["event_id"], precedence_col="ts",
                         partition_col="day")
    q.awaitTermination(120)
    out = {r["event_id"]: r["value"]
           for r in spark.read.parquet(target).collect()}
    assert out == {1: 1.0, 2: 2.0}  # event 1 must NOT be dropped


def test_user_activity_sliding_windows_stream(spark, tmp_path):
    """Sliding streaming windows: one event lands in window/slide
    overlapping windows (5 min / 1 min => 5 rows per event type)."""
    src_dir = str(tmp_path / "slide_src")
    t = dt.datetime(2024, 1, 1, 12, 2, 30)
    spark.createDataFrame(
        [
            Row(event_id=1, ts=t, user_id=1, event_type="view", value=2.0),
            # watermark advancer: append mode only flushes windows the
            # watermark has passed
            Row(event_id=99, ts=t + dt.timedelta(hours=2), user_id=99,
                event_type="advance", value=0.0),
        ]
    ).write.parquet(src_dir)
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema
    )
    out, _ = _drain(
        user_activity_stream(src, slide="1 minute"), tmp_path, "slide"
    )
    rows = [r for r in spark.read.parquet(out).collect()
            if r["event_type"] == "view"]
    assert len(rows) == 5  # 5-min window, 1-min slide
    starts = sorted(r["window_start"] for r in rows)
    assert starts[0] == dt.datetime(2024, 1, 1, 11, 58)
    assert starts[-1] == dt.datetime(2024, 1, 1, 12, 2)


def test_run_merge_stream_versioned_evolves_schema(spark, tmp_path):
    """schema.autoMerge parity for the streaming MERGE sink: a restarted
    stream whose frames carry a new column evolves the versioned table
    (old rows null-filled) instead of failing the micro-batch."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        run_merge_stream_versioned,
    )

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    table = f"{tmp_path}/evo_table"

    # phase 1: original schema
    src1 = str(tmp_path / "evo_src1")
    spark.createDataFrame(
        [Row(event_id=1, ts=t, value=1.0)]
    ).coalesce(1).write.mode("append").parquet(src1)
    q = run_merge_stream_versioned(
        stream_events_from_files(spark, src1, spark.read.parquet(src1).schema),
        table, f"{tmp_path}/evo_ckpt1", keys=["event_id"],
        precedence_col="ts", app_id="phase1",
    )
    q.awaitTermination(120)

    # phase 2 (restarted pipeline, evolved producer): adds a column
    src2 = str(tmp_path / "evo_src2")
    spark.createDataFrame(
        [Row(event_id=1, ts=t + dt.timedelta(minutes=1), value=10.0,
             src="mobile"),
         Row(event_id=2, ts=t, value=2.0, src="web")]
    ).coalesce(1).write.mode("append").parquet(src2)
    q = run_merge_stream_versioned(
        stream_events_from_files(spark, src2, spark.read.parquet(src2).schema),
        table, f"{tmp_path}/evo_ckpt2", keys=["event_id"],
        precedence_col="ts", app_id="phase2", merge_schema=True,
    )
    q.awaitTermination(120)

    out = {r["event_id"]: (r["value"], r["src"])
           for r in TxTable(spark, table).read().collect()}
    assert out == {1: (10.0, "mobile"), 2: (2.0, "web")}


def test_run_merge_stream_versioned_bootstraps_pre_txlog_target(
    spark, tmp_path
):
    """Upgrade path (round-5 ADVICE fix): a stream resuming over a
    PLAIN-parquet target — written before the versioned sink existed —
    must adopt the existing files as version 0, not shadow them with a
    fresh empty log (which would make every accumulated row invisible
    and leave it for VACUUM to delete as an untracked stray)."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable

    target = str(tmp_path / "upg_target")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    # pre-txlog accumulated state: key 9 appears ONLY here — under the
    # old create-over-strays behavior it silently vanished
    spark.createDataFrame(
        [Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0),
         Row(event_id=9, ts=t, user_id=9, event_type="view", value=9.0)]
    ).write.parquet(target)
    src_dir = str(tmp_path / "upg_src")
    spark.createDataFrame(
        [Row(event_id=1, ts=t + dt.timedelta(minutes=1), user_id=1,
             event_type="click", value=10.0),
         Row(event_id=2, ts=t, user_id=2, event_type="view", value=2.0)]
    ).write.parquet(src_dir)
    src = stream_events_from_files(
        spark, src_dir, spark.read.parquet(src_dir).schema
    )
    q = run_merge_stream(src, target, f"{tmp_path}/upg_ckpt",
                         keys=["event_id"], precedence_col="ts")
    q.awaitTermination(120)
    tx = TxTable(spark, target)
    out = {r["event_id"]: (r["event_type"], r["value"])
           for r in tx.read().collect()}
    assert out == {
        1: ("click", 10.0),  # pre-existing key: MERGED, not duplicated
        2: ("view", 2.0),    # new key: inserted
        9: ("view", 9.0),    # untouched pre-txlog key: SURVIVES
    }
    # the adopted files are tracked: version 0 is the bootstrap commit
    assert tx.history().collect()[-1].operation == "BOOTSTRAP"


def test_bronze_to_silver_chain_on_native_log(spark, tmp_path):
    """S3/T7 composition — the reference's raw→bronze→silver medallion
    wiring (spark-jobs/real_time_streaming.py:424-445) on this engine's
    own transaction log: txtable streaming source over bronze →
    watermarked tumbling-window aggregation → versioned MERGE sink into
    silver, drained three times on ONE checkpoint to prove exactly-once
    across the whole chain (state resumes, updated windows MERGE
    instead of duplicating, idle drains commit nothing)."""
    from pyspark.sql import functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.sources.txstream import (
        TxTableDataSource,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        run_merge_stream_versioned,
    )

    spark.dataSource.register(TxTableDataSource)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    schema = "event_id long, ts timestamp, user_id long, value double"
    bronze = TxTable.create(
        spark, str(tmp_path / "bronze"),
        spark.createDataFrame([], schema).schema,
    )
    bronze.write(spark.createDataFrame(
        [(1, t0, 1, 1.0), (2, t0 + dt.timedelta(minutes=1), 1, 2.0),
         (3, t0, 2, 3.0)], schema))
    silver, ckpt = str(tmp_path / "silver"), str(tmp_path / "ckpt")

    def drain():
        src = (spark.readStream.format("txtable")
               .option("path", bronze.root).load())
        agg = (
            src.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "5 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total"))
            .select(F.col("w.start").alias("ws"), "user_id",
                    "n_events", "total")
        )
        q = run_merge_stream_versioned(
            agg, silver, ckpt, keys=["ws", "user_id"],
            precedence_col="n_events", output_mode="update",
        )
        q.awaitTermination(120)

    drain()
    s = TxTable(spark, silver)
    got = {(r.ws, r.user_id): (r.n_events, r.total)
           for r in s.read().collect()}
    assert got == {(t0, 1): (2, 3.0), (t0, 2): (1, 3.0)}
    v1 = s.snapshot().version

    # one in-window update + one new window land in bronze; the SAME
    # checkpoint resumes the stream state and MERGES into silver
    bronze.write(spark.createDataFrame(
        [(4, t0 + dt.timedelta(minutes=2), 1, 4.0),
         (5, t0 + dt.timedelta(minutes=7), 2, 5.0)], schema))
    drain()
    got = {(r.ws, r.user_id): (r.n_events, r.total)
           for r in s.read().collect()}
    assert got == {
        (t0, 1): (3, 7.0),                            # window updated
        (t0, 2): (1, 3.0),                            # untouched
        (t0 + dt.timedelta(minutes=5), 2): (1, 5.0),  # new window
    }
    v2 = s.snapshot().version
    assert v2 > v1
    # idle drain: no new bronze commits -> no new silver versions
    drain()
    assert s.snapshot().version == v2


def test_streaming_asof_enrichment_matches_batch(spark, tmp_path):
    """Temporal-table enrichment (the Flink temporal-join pattern on
    micro-batches): each event picks up the latest dimension row at or
    before its event time via asof_join inside foreachBatch. As-of
    matching is per-row against a static snapshot, so WHICH micro-batch
    an event arrives in cannot change its result — drained one file per
    trigger, the union of batch outputs must equal the one-shot batch
    join."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import asof_join

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    dim_rows = [
        Row(user_id=1, ts=t - dt.timedelta(hours=2), plan="free"),
        Row(user_id=1, ts=t + dt.timedelta(minutes=15), plan="pro"),
        Row(user_id=2, ts=t - dt.timedelta(hours=1), plan="team"),
    ]
    dim = spark.createDataFrame(dim_rows).withColumnRenamed("ts", "valid_from")
    # two source files → two micro-batches with maxFilesPerTrigger=1
    ev_a = [Row(event_id=1, ts=t, user_id=1, event_type="view", value=1.0),
            Row(event_id=2, ts=t + dt.timedelta(minutes=30), user_id=1,
                event_type="view", value=2.0)]
    ev_b = [Row(event_id=3, ts=t, user_id=2, event_type="view", value=3.0),
            Row(event_id=4, ts=t, user_id=3, event_type="view", value=4.0)]
    src_dir = str(tmp_path / "ev_src")
    spark.createDataFrame(ev_a).coalesce(1).write.mode("append").parquet(src_dir)
    spark.createDataFrame(ev_b).coalesce(1).write.mode("append").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema
    events = spark.read.parquet(src_dir)

    expected = {
        (r["event_id"], r["plan"])
        for r in asof_join(
            events, dim, on="user_id", left_ts="ts", right_ts="valid_from"
        ).collect()
    }
    assert expected == {(1, "free"), (2, "pro"), (3, "team"), (4, None)}

    out_dir = str(tmp_path / "enriched")

    def enrich(batch_df, batch_id):
        asof_join(
            batch_df, dim, on="user_id", left_ts="ts",
            right_ts="valid_from",
        ).write.mode("append").parquet(out_dir)

    src = stream_events_from_files(
        spark, src_dir, schema, max_files_per_trigger=1
    )
    q = (src.writeStream.foreachBatch(enrich)
         .option("checkpointLocation", f"{tmp_path}/enrich_ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["plan"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == expected


def test_run_merge_stream_preserves_numeric_looking_string_partitions(
    spark, tmp_path
):
    """Regression: the partitioned merge sink reads its target with the
    batch's explicit schema. Partition-type inference would retype a
    string partition value like '01' as INT 1, so the rewrite emitted
    day=1 alongside the stale day=01 — fragmenting the partition and
    rewriting stored values. Two sequential batches over day='01' must
    update in place, keep ONE partition dir, and keep the value '01'."""
    src_dir = str(tmp_path / "numpart_src")
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    batches = [
        [Row(event_id=1, day="01", ts=t, value=1.0)],
        [Row(event_id=1, day="01", ts=t + dt.timedelta(minutes=1),
             value=10.0)],
    ]
    for i, rows in enumerate(batches):
        before = set(glob.glob(f"{src_dir}/*.parquet"))
        spark.createDataFrame(rows).coalesce(1).write.mode("append").parquet(
            src_dir
        )
        for f in set(glob.glob(f"{src_dir}/*.parquet")) - before:
            os.utime(f, (1700000000 + i * 100, 1700000000 + i * 100))
    target = f"{tmp_path}/numpart_target"
    schema = spark.read.parquet(src_dir).schema
    src = stream_events_from_files(spark, src_dir, schema,
                                   max_files_per_trigger=1)
    q = run_merge_stream(src, target, f"{tmp_path}/numpart_ckpt",
                         keys=["event_id"], precedence_col="ts",
                         partition_col="day")
    q.awaitTermination(120)
    part_dirs = [d for d in os.listdir(target) if d.startswith("day=")]
    assert part_dirs == ["day=01"], part_dirs
    rows = spark.read.schema(schema).parquet(target).collect()
    assert [(r["event_id"], r["day"], r["value"]) for r in rows] == [
        (1, "01", 10.0)
    ]
