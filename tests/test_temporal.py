"""As-of join: point-in-time matching semantics + plan shape.

Covers the contract matrix of operators/temporal.py::asof_join —
backward latest-match, exact-tie inclusion/exclusion, tolerance
nulling, no-candidate NULLs, key isolation, name collisions, tie
determinism — and pins the union-window plan (ONE shuffle, no range
join) that makes it survive 100 TB.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import asof_join


def _ts(minute, second=0):
    # naive UTC: the test session pins spark.sql.session.timeZone=UTC,
    # and collect() hands back naive datetimes in session time
    return dt.datetime(2024, 3, 1, 10, minute, second)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(10), "p1"),
            (1, _ts(30), "p2"),
            (1, _ts(5), "p0"),   # before any right row
            (2, _ts(20), "p3"),  # key with no right rows at all
        ],
        "user_id INT, ts TIMESTAMP, pid STRING",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(8), "v1"),
            (1, _ts(10), "v2"),   # exactly at p1's ts
            (1, _ts(29), "v3"),
            (3, _ts(9), "vx"),    # key absent from left
        ],
        "user_id INT, ts TIMESTAMP, vid STRING",
    )
    return left, right


def _rows(df):
    return {
        r["pid"]: (r["vid"], r["ts_right"])
        for r in df.collect()
    }


def test_backward_latest_match_with_exact_ties(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="user_id")
    assert set(out.columns) == {"user_id", "ts", "pid", "ts_right", "vid"}
    got = _rows(out)
    assert got["p1"] == ("v2", _ts(10))   # exact tie included
    assert got["p2"] == ("v3", _ts(29))   # latest preceding, not v1/v2
    assert got["p0"] == (None, None)      # nothing at or before
    assert got["p3"] == (None, None)      # key has no right rows


def test_exclusive_matching_skips_equal_timestamps(spark, frames):
    left, right = frames
    got = _rows(
        asof_join(left, right, on="user_id", allow_exact_matches=False)
    )
    assert got["p1"] == ("v1", _ts(8))    # v2 (== ts) now excluded
    assert got["p2"] == ("v3", _ts(29))


def test_tolerance_nulls_stale_matches_but_keeps_left_rows(spark, frames):
    left, right = frames
    out = asof_join(
        left, right, on="user_id", tolerance_us=60 * 1_000_000
    )
    got = _rows(out)
    assert got["p1"] == ("v2", _ts(10))   # gap 0 <= 60s
    assert got["p2"] == ("v3", _ts(29))   # gap 60s, boundary inclusive
    assert got["p0"] == (None, None)
    assert out.count() == 4               # every left row survives


def test_right_only_keys_do_not_leak(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="user_id")
    assert out.filter(F.col("user_id") == 3).count() == 0


def test_tiebreak_picks_last_by_column(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "p")], "k INT, ts TIMESTAMP, pid STRING"
    )
    right = spark.createDataFrame(
        [(1, _ts(9), "a"), (1, _ts(9), "b"), (1, _ts(9), "c")],
        "k INT, ts TIMESTAMP, vid STRING",
    )
    for _ in range(3):
        got = asof_join(
            left, right, on="k", tiebreak="vid"
        ).collect()[0]["vid"]
        assert got == "c"  # last in tiebreak order wins, every run


def test_matches_merge_asof_reference(spark):
    """Property check against pandas.merge_asof on a seeded random
    frame — same keys, same backward semantics, same tolerance."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    base = dt.datetime(2024, 3, 1)
    lpd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 200),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in np.sort(rng.randint(0, 10_000, 200))
            ],
            "lid": np.arange(200),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 300),
            "ts": [
                base + dt.timedelta(seconds=int(s))
                for s in np.sort(rng.randint(0, 10_000, 300))
            ],
            "rid": np.arange(300),
        }
    )
    # drop duplicate (k, ts) on the right: merge_asof keeps the last
    # row per timestamp, which is only well-defined with unique ts
    rpd = rpd.drop_duplicates(["k", "ts"], keep="last")
    expected = pd.merge_asof(
        lpd.sort_values("ts"),
        rpd.sort_values("ts"),
        on="ts",
        by="k",
        tolerance=pd.Timedelta(seconds=600),
        suffixes=("", "_right"),
    )
    out = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on="k",
        tolerance_us=600 * 1_000_000,
    ).toPandas()
    merged = expected.merge(
        out[["lid", "rid"]], on="lid", suffixes=("_pd", "_spark")
    )
    assert len(merged) == 200
    pd.testing.assert_series_equal(
        merged["rid_pd"], merged["rid_spark"],
        check_names=False, check_dtype=False,
    )


def test_plan_has_one_shuffle_and_no_range_join(spark, frames):
    left, right = frames
    plan = asof_join(
        left, right, on="user_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # union-window, not a join at all
    # exactly one exchange partitions by the key for the window
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


# --- interval_join ---------------------------------------------------------

def _random_intervals(spark, n, max_dur_sec, seed, tag, keys=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(n):
        s = int(rng.randint(0, 20_000))
        d = int(rng.randint(0, max_dur_sec))
        rows.append(
            (
                int(rng.randint(0, keys)),
                base + dt.timedelta(seconds=s),
                base + dt.timedelta(seconds=s + d),
                f"{tag}{i}",
            )
        )
    return spark.createDataFrame(
        rows, "k INT, start TIMESTAMP, fin TIMESTAMP, rid STRING"
    )


def _brute_pairs(left, right, keyed):
    cond = (
        (left.start <= right.fin2) & (right.start2 <= left.fin)
    )
    if keyed:
        cond = cond & (left.k == right.k2)
    return {
        (r["rid"], r["rid2"])
        for r in left.join(
            right, cond, "inner"
        ).select(left.rid, right.rid2).collect()
    }


@pytest.mark.parametrize("bin_sec", [60, 600, 7200])
def test_interval_join_matches_brute_force_any_bin_width(spark, bin_sec):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import interval_join

    left = _random_intervals(spark, 120, 1800, 11, "L")
    right = (
        _random_intervals(spark, 150, 1800, 22, "R")
        .withColumnRenamed("rid", "rid2")
        .withColumnRenamed("start", "start2")
        .withColumnRenamed("fin", "fin2")
        .withColumnRenamed("k", "k2")
    )
    expected = _brute_pairs(left, right, keyed=False)
    out = interval_join(
        left,
        right.withColumnRenamed("start2", "start").withColumnRenamed(
            "fin2", "fin"
        ).withColumnRenamed("k2", "k").withColumnRenamed("rid2", "rid"),
        "start", "fin", "start", "fin",
        bin_width_us=bin_sec * 1_000_000,
    )
    got = [
        (r["rid"], r["rid_right"])
        for r in out.select("rid", "rid_right").collect()
    ]
    assert len(got) == len(set(got)), "duplicate pairs emitted"
    assert set(got) == expected


def test_interval_join_with_equality_key(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import interval_join

    left = _random_intervals(spark, 100, 3600, 33, "L")
    right_rn = (
        _random_intervals(spark, 100, 3600, 44, "R")
        .withColumnRenamed("rid", "rid2")
        .withColumnRenamed("start", "start2")
        .withColumnRenamed("fin", "fin2")
        .withColumnRenamed("k", "k2")
    )
    expected = _brute_pairs(left, right_rn, keyed=True)
    out = interval_join(
        left,
        right_rn.withColumnRenamed("start2", "start")
        .withColumnRenamed("fin2", "fin")
        .withColumnRenamed("k2", "k")
        .withColumnRenamed("rid2", "rid"),
        "start", "fin", "start", "fin",
        on="k",
        bin_width_us=600 * 1_000_000,
    )
    got = {
        (r["rid"], r["rid_right"])
        for r in out.select("rid", "rid_right").collect()
    }
    assert got == expected


def test_interval_join_plan_is_equi_join_not_nlj(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import interval_join

    left = _random_intervals(spark, 50, 1800, 55, "L")
    right = _random_intervals(spark, 50, 1800, 66, "R")
    plan = interval_join(
        left, right, "start", "fin", "start", "fin",
        bin_width_us=600 * 1_000_000,
    )._jdf.queryExecution().executedPlan().toString()
    # keyless overlap join: naive Spark gives BroadcastNestedLoopJoin;
    # the bin rewrite must be a hash/sort-merge EQUI join on _bin
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# --- scd2_from_history -----------------------------------------------------

def test_scd2_intervals_partition_timeline_and_collapse(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import scd2_from_history

    hist = spark.createDataFrame(
        [
            (1, _ts(0), "free", None),
            (1, _ts(10), "free", None),    # re-asserted, no change
            (1, _ts(20), "pro", "card"),
            (1, _ts(30), "pro", "card"),   # re-asserted again
            (1, _ts(40), "pro", None),     # attr → NULL is a change
            (2, _ts(5), "team", "invoice"),
        ],
        "user_id INT, ts TIMESTAMP, plan STRING, pay STRING",
    )
    out = scd2_from_history(
        hist, keys="user_id", order_col="ts", attr_cols=["plan", "pay"]
    )
    rows = sorted(
        out.collect(), key=lambda r: (r["user_id"], r["valid_from"])
    )
    as_tuples = [
        (r["user_id"], r["plan"], r["pay"], r["valid_from"],
         r["valid_to"], r["is_current"])
        for r in rows
    ]
    assert as_tuples == [
        (1, "free", None, _ts(0), _ts(20), 0),
        (1, "pro", "card", _ts(20), _ts(40), 0),
        (1, "pro", None, _ts(40), None, 1),
        (2, "team", "invoice", _ts(5), None, 1),
    ]
    # intervals partition each key's timeline: valid_to chains to the
    # next valid_from, exactly one current row per key
    assert sum(r["is_current"] for r in rows) == 2


def test_scd2_without_collapse_keeps_every_version(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import scd2_from_history

    hist = spark.createDataFrame(
        [(1, _ts(0), "a"), (1, _ts(10), "a")],
        "k INT, ts TIMESTAMP, v STRING",
    )
    out = scd2_from_history(
        hist, "k", "ts", ["v"], collapse_unchanged=False
    )
    assert out.count() == 2


def test_scd2_asof_enrichment_is_point_in_time_lookup(spark):
    """The composition contract: asof_join(facts, scd2, on=key,
    right_ts=valid_from) lands every fact in the interval covering its
    timestamp — SCD2 + as-of IS the point-in-time lookup."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import (
        asof_join,
        scd2_from_history,
    )

    hist = spark.createDataFrame(
        [(1, _ts(0), "free"), (1, _ts(20), "pro")],
        "user_id INT, ts TIMESTAMP, plan STRING",
    )
    dim = scd2_from_history(hist, "user_id", "ts", ["plan"])
    facts = spark.createDataFrame(
        [(1, _ts(5), "f1"), (1, _ts(20), "f2"), (1, _ts(25), "f3")],
        "user_id INT, ts TIMESTAMP, fid STRING",
    )
    got = {
        (r["fid"], r["plan"])
        for r in asof_join(
            facts, dim, on="user_id", left_ts="ts", right_ts="valid_from"
        ).collect()
    }
    assert got == {("f1", "free"), ("f2", "pro"), ("f3", "pro")}
    # every match's interval truly covers the fact timestamp
    covered = asof_join(
        facts, dim, on="user_id", left_ts="ts", right_ts="valid_from"
    ).filter(
        F.col("valid_to").isNotNull() & (F.col("ts") >= F.col("valid_to"))
    )
    assert covered.count() == 0


def test_scd2_from_native_change_feed(spark, tmp_path):
    """E2E over the engine's own CDF: merges into a TxTable produce
    insert/update_postimage change rows; scd2_from_history over them
    yields one validity interval per attribute version, ordered by
    commit version."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import scd2_from_history
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable

    from pyspark.sql.types import StructType

    ddl = "id INT, plan STRING"
    t = TxTable.create(spark, str(tmp_path / "dim"), StructType.fromDDL(ddl))
    t.write(spark.createDataFrame([(1, "free"), (2, "team")], ddl))
    t.merge(spark.createDataFrame([(1, "pro")], ddl), keys=["id"])
    t.merge(spark.createDataFrame([(1, "max"), (3, "free")], ddl),
            keys=["id"])
    changes = t.change_feed(from_version=0).filter(
        F.col("_change_type").isin("insert", "update_postimage")
    )
    dim = scd2_from_history(
        changes, keys="id", order_col="_commit_version",
        attr_cols=["plan"],
    )
    got = {
        (r["id"], r["plan"], r["valid_from"], r["is_current"])
        for r in dim.collect()
    }
    rows = sorted(got, key=lambda r: (r[0], r[2]))
    assert [(i, p, c) for i, p, _, c in rows] == [
        (1, "free", 0), (1, "pro", 0), (1, "max", 1),
        (2, "team", 1), (3, "free", 1),
    ]


def test_reserved_internal_names_are_rejected(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import (
        asof_join,
        interval_join,
    )

    l = spark.createDataFrame([(1, _ts(0), 1)], "k INT, ts TIMESTAMP, _r INT")
    r = spark.createDataFrame([(1, _ts(0))], "k INT, vts TIMESTAMP")
    with pytest.raises(ValueError, match="reserves column names"):
        asof_join(l, r, on="k", left_ts="ts", right_ts="vts")
    l2 = spark.createDataFrame(
        [(1, _ts(0), _ts(1), 1)], "k INT, s TIMESTAMP, e TIMESTAMP, _bin INT"
    )
    with pytest.raises(ValueError, match="reserves column names"):
        interval_join(l2, r.withColumnRenamed("vts", "s")
                      .withColumn("e", F.col("s")), "s", "e", "s", "e")


def test_null_right_timestamps_never_match(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _ts(10), "p")], "k INT, ts TIMESTAMP, pid STRING"
    )
    right = spark.createDataFrame(
        [(1, None, "bad")], "k INT, ts TIMESTAMP, vid STRING"
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["vid"] is None and row["ts_right"] is None


def test_suffix_collision_is_rejected(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _ts(0), 1, 2)], "k INT, ts TIMESTAMP, x INT, x_right INT"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 3)], "k INT, vts TIMESTAMP, x INT"
    )
    with pytest.raises(ValueError, match="duplicate columns"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="vts")


def test_scd2_rejects_reserved_chg_column(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import scd2_from_history

    hist = spark.createDataFrame(
        [(1, _ts(0), "a")], "k INT, ts TIMESTAMP, _chg STRING"
    )
    with pytest.raises(ValueError, match="_chg"):
        scd2_from_history(hist, "k", "ts", ["_chg"])


def test_interval_join_rejects_s_us_collision(spark):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [(1, _ts(0), _ts(1), 7)], "k INT, s TIMESTAMP, e TIMESTAMP, s_us INT"
    )
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(1))], "k INT, s TIMESTAMP, e TIMESTAMP"
    )
    with pytest.raises(ValueError, match="reserves column names"):
        interval_join(left, right, "s", "e", "s", "e")


@pytest.mark.parametrize("max_dur_sec,seed", [(900, 31), (14 * 86_400, 32)])
def test_interval_join_auto_bin_width_bounds_replication(
    spark, max_dur_sec, seed
):
    """bin_width_us=None derives the width from the data (p75 of
    interval lengths), so replication stays bounded on BOTH a
    seconds-scale and a days-scale distribution without tuning —
    and the result still matches brute force exactly."""
    import numpy as np

    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import interval_join

    left = _random_intervals(spark, 100, max_dur_sec, seed, "L")
    right = (
        _random_intervals(spark, 110, max_dur_sec, seed + 50, "R")
        .withColumnRenamed("rid", "rid2")
        .withColumnRenamed("start", "start2")
        .withColumnRenamed("fin", "fin2")
        .withColumnRenamed("k", "k2")
    )
    expected = _brute_pairs(left, right, keyed=False)
    out = interval_join(
        left,
        right.withColumnRenamed("start2", "start")
        .withColumnRenamed("fin2", "fin")
        .withColumnRenamed("k2", "k")
        .withColumnRenamed("rid2", "rid"),
        "start", "fin", "start", "fin",
    )
    got = [
        (r["rid"], r["rid_right"])
        for r in out.select("rid", "rid_right").collect()
    ]
    assert len(got) == len(set(got))
    assert set(got) == expected

    # the replication bound the derived width guarantees: each row is
    # copied duration/width + 1 times; with width = p75 of durations
    # the AVERAGE copy count is bounded by a small constant whatever
    # the interval scale (pinned ≤ 3 for these tail-bounded uniforms).
    durs = np.array([
        (r["fin"] - r["start"]).total_seconds() * 1e6
        for r in left.unionByName(
            right.withColumnRenamed("start2", "start")
            .withColumnRenamed("fin2", "fin")
            .withColumnRenamed("k2", "k")
            .withColumnRenamed("rid2", "rid")
        ).collect()
    ])
    width = max(int(np.percentile(durs, 75)), 1)
    copies = durs // width + 1
    assert copies.mean() <= 3.0
    assert copies.max() <= durs.max() / width + 1


def test_interval_join_bin_replication_guard(spark):
    """Round 15 (VERDICT r14 #6): a degenerate bin width (tiny vs the
    interval lengths) must raise at execution instead of silently
    exploding each row into millions of bin copies; the default
    ceiling never fires on sane widths; None opts in."""
    import datetime as dt

    import pytest

    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import (
        interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1))], "id INT, s TIMESTAMP, e TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(2, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(hours=2))],
        "rid INT, s2 TIMESTAMP, e2 TIMESTAMP",
    )
    # sane width: overlap found, guard silent
    ok = interval_join(left, right, "s", "e", "s2", "e2",
                       bin_width_us=3_600_000_000)
    assert ok.count() == 1
    # degenerate width: 1h / 100us = 36M bins per row -> raises
    bad = interval_join(left, right, "s", "e", "s2", "e2",
                        bin_width_us=100)
    with pytest.raises(Exception, match="max_bins_per_row"):
        bad.count()
    # explicit opt-in restores the old behavior at a small scale
    small = interval_join(left, right, "s", "e", "s2", "e2",
                          bin_width_us=60_000_000,
                          max_bins_per_row=None)
    assert small.count() == 1


def test_interval_join_guard_passes_null_intervals(spark):
    """Review finding (round 15): assert_true raises on NULL input, so
    the guard condition must treat a NULL bin count as pass-through —
    NULL start/end rows are dropped by explode(sequence(NULL,..)) as
    before, never turned into a job abort. Pinned with constraint
    propagation disabled (the default config masks the bug via
    inferred IsNotNull filters)."""
    import datetime as dt

    from real_time_video_streaming_analytics_lakehouse_spark.operators.temporal import (
        interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, t0, t0 + dt.timedelta(hours=1)), (2, None, t0)],
        "id INT, s TIMESTAMP, e TIMESTAMP",
    )
    right = spark.createDataFrame(
        [(3, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(hours=2))],
        "rid INT, s2 TIMESTAMP, e2 TIMESTAMP",
    )
    old = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        out = interval_join(
            left, right, "s", "e", "s2", "e2",
            bin_width_us=3_600_000_000,
        ).collect()
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", old)
    assert [r["id"] for r in out] == [1]
