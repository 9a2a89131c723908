"""Deletion-vector (merge-on-read) DML on the native transaction log.

Delta's answer to copy-on-write rewrite amplification: a small DELETE /
UPDATE / MERGE marks row positions in a deletion-vector bundle instead
of rewriting gigabyte files (the reference's pipelines leans on
frequent MERGE — ``etl_framework.py:639-647`` — so at 100 TB this is
the DML cost center). Pinned here:

* a 1-row delete writes NO data file — the original parquet survives
  byte-identical, the commit re-adds it with a DV reference;
* a scripted DML matrix (delete / update / merge / accumulate /
  threshold-fallback / optimize / restore) produces ROW-IDENTICAL
  reads, time travel, and change feeds with DVs on vs off, on both the
  local-FS and the in-memory conditional-PUT commit stores;
* DV lifecycle: accumulation unions positions, crossing
  ``dv.maxDeletedFraction`` falls back to rewrite, OPTIMIZE /
  purge_deletion_vectors compact holes with ``dataChange=false``,
  RESTORE resurrects bundle references, and VACUUM collects
  unreferenced bundles past retention (time travel then raises the
  documented error).
"""

from __future__ import annotations

import json
import os
import pathlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from real_time_video_streaming_analytics_lakehouse_spark.operators.commitstore import (
    InMemoryCommitStore,
)
from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import (
    TxTable,
    VacuumedFileError,
    _read_commit,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("day", StringType()),
        StructField("v", IntegerType()),
    ]
)

DV_PROPS = {"dv.enabled": "true", "dv.maxDeletedFraction": "0.5"}


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _mk(spark, path, dv: bool, store=None, partition_by=None,
        interval=None):
    t = TxTable.create(
        spark, path, SCHEMA, partition_by=partition_by,
        properties=DV_PROPS if dv else {},
        store=store,
    )
    if interval is not None:
        t.checkpoint_interval = interval
    return t


def _data_parquets(root):
    return sorted(
        str(p.relative_to(root))
        for p in pathlib.Path(root).rglob("*.parquet")
        if not any(s.startswith(("_", ".")) for s in p.relative_to(root).parts)
    )


def _rows(df):
    return sorted(
        (r["id"], r["day"], r["v"]) for r in df.select("id", "day", "v").collect()
    )


def _feed(t):
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["day"], r["v"])
        for r in t.change_feed(0).collect()
    )


# --------------------------------------------------------------------------


def test_one_row_delete_writes_no_data_file(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i * 10) for i in range(100)]).coalesce(1))
    files_before = _data_parquets(t.root)
    assert len(files_before) == 1
    stat_before = os.stat(os.path.join(t.root, files_before[0]))

    v = t.delete(F.col("id") == 7)
    # the original parquet is untouched — same path, same bytes
    assert _data_parquets(t.root) == files_before
    stat_after = os.stat(os.path.join(t.root, files_before[0]))
    assert (stat_before.st_mtime_ns, stat_before.st_size) == (
        stat_after.st_mtime_ns, stat_after.st_size,
    )
    # the commit re-adds the same file with a DV reference
    c = _read_commit(t.root, v)
    assert c["remove"] == files_before
    assert [a["path"] for a in c["add"]] == files_before
    assert c["add"][0]["dv"]["cardinality"] == 1
    assert c["add"][0]["dv"]["path"].startswith("_deletion_vectors/")
    # and the read no longer sees the row
    assert t.read().count() == 99
    assert t.read().filter("id = 7").count() == 0
    # change feed shows exactly the one delete
    feed = t.change_feed(v, v).collect()
    assert [(r["_change_type"], r["id"]) for r in feed] == [("delete", 7)]
    # detail: logical rows exclude the deleted one
    d = t.detail()
    assert d["numRecords"] == 99
    assert d["numDeletedRecords"] == 1


def _dml_script(spark, t: TxTable):
    """The shared DML matrix; yields after every commit so the caller
    can diff states version-by-version."""
    # three files: a (10 rows), b (5 rows), c (4 rows incl. NULL v)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    yield
    t.write(_df(spark, [(100 + i, "b", 100 + i) for i in range(5)]).coalesce(1))
    yield
    t.write(
        _df(spark, [(200, "c", None), (201, "c", 7), (202, "c", 300),
                    (203, "c", 301)]).coalesce(1)
    )
    yield
    # mixed-route delete: 10% of file a (DV), 80% of file b (rewrite);
    # NULL-v rows in c must survive the v>... predicate untouched
    t.delete(F.col("id").isin([0, 100, 101, 102, 103]))
    yield
    # accumulate on file a
    t.delete(F.col("id").isin([1, 2]))
    yield
    # update: small fraction of a -> DV route; NULL-cond rows kept
    t.update(F.col("v") >= 8, {"v": F.col("v") + 1000})
    yield
    # merge: update one key of a, one of c, insert two new
    src = _df(spark, [(5, "a", -5), (202, "c", -202), (900, "z", 900),
                      (901, "z", 901)])
    t.merge(src, keys=["id"])
    yield
    # push file a over the deleted-fraction threshold -> rewrite
    t.delete(F.col("id").isin([3, 4, 6]))
    yield
    t.optimize(target_files=2)
    yield
    t.restore_to_version(5)
    yield


def _run_matrix(spark, tmp_path, store_factory):
    t_dv = _mk(spark, str(tmp_path / "dv"), dv=True,
               store=store_factory())
    t_cw = _mk(spark, str(tmp_path / "cw"), dv=False,
               store=store_factory())
    it_dv, it_cw = _dml_script(spark, t_dv), _dml_script(spark, t_cw)
    step = 0
    for _ in zip(it_dv, it_cw):
        step += 1
        assert _rows(t_dv.read()) == _rows(t_cw.read()), f"step {step}"
    # time travel: every version row-identical
    last = t_dv.snapshot().version
    assert last == t_cw.snapshot().version
    for v in range(1, last + 1):
        assert _rows(t_dv.read(version=v)) == _rows(t_cw.read(version=v)), v
    # change feed: identical row-level history (timestamps excluded)
    assert _feed(t_dv) == _feed(t_cw)
    # the DV table did use the merge-on-read route
    hist = {r["operation"] for r in t_dv.history(100).collect()}
    assert "DELETE" in hist and "MERGE" in hist
    dv_dir = pathlib.Path(t_dv.root) / "_deletion_vectors"
    assert dv_dir.is_dir() and any(dv_dir.iterdir())
    assert not (pathlib.Path(t_cw.root) / "_deletion_vectors").exists()


def test_dml_matrix_row_identical_local_store(spark, tmp_path):
    _run_matrix(spark, tmp_path, lambda: None)


def test_dml_matrix_row_identical_inmemory_store(spark, tmp_path):
    _run_matrix(spark, tmp_path, InMemoryCommitStore)


def test_dv_accumulation_then_threshold_fallback(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    orig = _data_parquets(t.root)

    t.delete(F.col("id").isin([0, 1]))
    e = next(iter(t.snapshot().files.values()))
    assert e["dv"]["cardinality"] == 2
    b1 = e["dv"]["path"]

    t.delete(F.col("id").isin([2, 3]))
    e = next(iter(t.snapshot().files.values()))
    assert e["dv"]["cardinality"] == 4  # union, not replace
    assert e["dv"]["path"] != b1
    assert _data_parquets(t.root) == orig  # still never rewritten
    assert sorted(r.id for r in t.read().collect()) == [4, 5, 6, 7, 8, 9]

    # 4 existing + 2 new = 6/10 > 0.5 -> copy-on-write fallback
    t.delete(F.col("id").isin([4, 5]))
    e = next(iter(t.snapshot().files.values()))
    assert "dv" not in e
    assert _data_parquets(t.root) != orig
    assert sorted(r.id for r in t.read().collect()) == [6, 7, 8, 9]


def test_merge_dv_keeps_unmatched_rows_in_place(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    orig = set(_data_parquets(t.root))
    t.merge(_df(spark, [(3, "a", -3), (999, "q", 999)]), keys=["id"])
    # the original file is still live (DV'd), plus new files for the
    # updated + inserted rows
    snap = t.snapshot()
    paths = set(snap.files)
    assert orig <= paths and len(paths) > 1
    e = snap.files[next(iter(orig))]
    assert e["dv"]["cardinality"] == 1
    got = {(r["id"], r["v"]) for r in t.read().collect()}
    assert (3, -3) in got and (999, 999) in got and (3, 3) not in got
    assert len(got) == 11
    feed = t.change_feed(snap.version, snap.version).collect()
    kinds = sorted(r["_change_type"] for r in feed)
    assert kinds == ["insert", "update_postimage", "update_preimage"]


def test_purge_and_vacuum_lifecycle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    v_base = t.delete(F.col("id") == 0)
    assert any(e.get("dv") for e in t.snapshot().files.values())

    v_purge = t.purge_deletion_vectors()
    assert not any(e.get("dv") for e in t.snapshot().files.values())
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 10))
    # purge is dataChange=false: invisible to the change feed
    assert t.change_feed(v_purge, v_purge).count() == 0
    # time travel to the DV version still works (bundle retained)
    assert t.read(version=v_base).count() == 9

    # retention respected: nothing collected at a long horizon
    assert t.vacuum(retention_hours=1000, dry_run=True) == []
    gone = t.vacuum(retention_hours=0)
    assert any(p.startswith("_deletion_vectors/") for p in gone)
    assert not any(
        pathlib.Path(t.root, "_deletion_vectors").glob("*")
    ) or not (pathlib.Path(t.root) / "_deletion_vectors").exists()
    with pytest.raises(VacuumedFileError):
        t.read(version=v_base).count()


def test_restore_resurrects_dv_reference(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    v_dv = t.delete(F.col("id") == 0)
    t.delete(F.col("id") == 1)
    t.restore_to_version(v_dv)
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 10))
    # the re-referenced bundle survives vacuum even at zero retention
    t.vacuum(retention_hours=0)
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 10))
    t.restore_to_version(v_dv - 1)
    assert t.read().count() == 10


def test_dv_survives_checkpoint_and_new_handle(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True, partition_by=["day"],
            interval=2)
    t.write(_df(spark, [(i, "a", i) for i in range(8)]
                ).coalesce(1))
    t.write(_df(spark, [(100 + i, "b", i) for i in range(4)]).coalesce(1))
    t.delete(F.col("id").isin([2, 101]))   # DV on both partitions
    t.write(_df(spark, [(300, "c", 3)]))
    t.write(_df(spark, [(301, "c", 4)]))   # forces a checkpoint past the DV
    t2 = TxTable(spark, t.root)
    from real_time_video_streaming_analytics_lakehouse_spark.operators.manifest import FileManifest

    snap = t2.snapshot()
    assert isinstance(snap.files, FileManifest)
    assert sorted(r.id for r in t2.read().collect()) == (
        [0, 1, 3, 4, 5, 6, 7, 100, 102, 103, 300, 301]
    )
    assert t2.read(predicates=[("day", "=", "a")]).count() == 7
    d = t2.detail()
    assert d["numRecords"] == 12
    assert d["numDeletedRecords"] == 2


def test_update_dv_route_cdf_pre_post_images(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    v = t.update(F.col("id") == 4, {"v": F.lit(400)})
    got = {(r["id"], r["v"]) for r in t.read().collect()}
    assert (4, 400) in got and (4, 4) not in got and len(got) == 10
    feed = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in t.change_feed(v, v).collect()
    )
    assert feed == [("update_postimage", 4, 400), ("update_preimage", 4, 4)]
    # the matched row's file was not rewritten: entry carries a DV and
    # the updated image landed in a NEW file
    snap = t.snapshot()
    dv_entries = [e for e in snap.files.values() if e.get("dv")]
    assert len(dv_entries) == 1 and dv_entries[0]["dv"]["cardinality"] == 1
    assert len(snap.files) == 2


def test_json_commit_roundtrip_carries_dv(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(4)]).coalesce(1))
    v = t.delete(F.col("id") == 0)
    c = _read_commit(t.root, v)
    assert json.loads(json.dumps(c)) == c  # plain-JSON commit action
    assert c["dvc"][0] == c["add"][0]["dv"]["path"]


def test_vacuum_after_cleanup_log_keeps_live_dv_bundle(spark, tmp_path):
    """Round-8 advice (high): after cleanup_log prunes the commits
    below the latest checkpoint, a bundle referenced only by
    checkpoint-era entries must NOT be collected as a crash leftover —
    vacuum seeds the live set from the resolved checkpoint state."""
    t = _mk(spark, str(tmp_path / "t"), dv=True, interval=2)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    t.delete(F.col("id") == 0)                      # v2: DV commit (+ckpt)
    t.write(_df(spark, [(100, "b", 1)]))            # v3
    t.write(_df(spark, [(101, "b", 2)]))            # v4: checkpoint
    assert t.cleanup_log(retention_hours=0)         # prunes v0..v3
    gone = t.vacuum(retention_hours=0)              # may drop CDC files
    assert not [p for p in gone if p.startswith("_deletion_vectors/")]
    t2 = TxTable(spark, t.root)
    assert sorted(r.id for r in t2.read().collect()) == (
        list(range(1, 10)) + [100, 101]
    )


def test_vacuum_after_cleanup_log_respects_dv_tombstone_time(
    spark, tmp_path
):
    """A bundle whose last reference was dropped AFTER the checkpoint
    (its add commit pruned) is tombstoned at the remove commit's
    timestamp, not treated as an untracked leftover aged by mtime."""
    import time as _time

    t = _mk(spark, str(tmp_path / "t"), dv=True, interval=2)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    v_dv = t.delete(F.col("id") == 0)               # v2: DV commit + ckpt
    t.write(_df(spark, [(100, "b", 1)]))            # v3
    t.write(_df(spark, [(101, "b", 2)]))            # v4: checkpoint
    t.purge_deletion_vectors()                      # v5: drops the DV ref
    assert t.cleanup_log(retention_hours=0)
    # age the bundle file itself far past any retention horizon
    dv_dir = pathlib.Path(t.root, "_deletion_vectors")
    old = _time.time() - 10 * 3600
    for p in dv_dir.rglob("*"):
        os.utime(p, (old, old))
    for p in dv_dir.iterdir():
        os.utime(p, (old, old))
    # the DROP is recent -> retained at a 1h horizon (time travel works)
    assert not [
        p for p in t.vacuum(retention_hours=1)
        if p.startswith("_deletion_vectors/")
    ]
    assert t.read(version=v_dv).count() == 9
    # and collected once the horizon passes the drop
    gone = t.vacuum(retention_hours=0)
    assert any(p.startswith("_deletion_vectors/") for p in gone)
    with pytest.raises(VacuumedFileError):
        t.read(version=v_dv).count()


def test_change_feed_serves_deletes_for_pruned_add_commits(
    spark, tmp_path
):
    """Round-8 advice (medium): an overwrite that removes files whose
    add commit was pruned by cleanup_log must still emit their delete
    rows (reconstructed from the checkpoint-seeded state), never
    silently drop them."""
    t = _mk(spark, str(tmp_path / "t"), dv=False, interval=2)
    t.write(_df(spark, [(i, "a", i) for i in range(5)]).coalesce(1))
    t.write(_df(spark, [(10, "b", 1)]).coalesce(1))  # v2: checkpoint
    assert t.cleanup_log(retention_hours=0)          # prunes v0..v1
    v_ow = t.write(
        _df(spark, [(99, "c", 9)]).coalesce(1), mode="overwrite"
    )
    feed = t.change_feed(v_ow, v_ow)
    by_type = {
        k: sorted(r["id"] for r in rows)
        for k, rows in (
            ("insert", feed.filter(F.col("_change_type") == "insert")
             .collect()),
            ("delete", feed.filter(F.col("_change_type") == "delete")
             .collect()),
        )
    }
    assert by_type["insert"] == [99]
    assert by_type["delete"] == [0, 1, 2, 3, 4, 10]


def test_change_feed_seed_commit_removal_over_delivers_dv_rows(
    spark, tmp_path
):
    """Round-9 pin of the documented CONSERVATIVE edge
    (``txlog.change_feed``): when cleanup_log pruned a DV'd file's add
    commit AND the file is absent from the checkpoint-seeded state
    because the SEED COMMIT ITSELF removed it, its delete rows are
    reconstructed without the (unrecoverable — checkpoints store live
    entries only) DV reference. Contract: rows the DV had already
    deleted are RE-delivered as deletes (over-delivery), the
    still-live rows are never dropped.

    v1 writes one file, v2 DV-deletes ids {0, 3}, v3 overwrites —
    removing the DV'd file — and lands the checkpoint (interval=3), so
    after cleanup_log the walk's seed commit is the remover."""
    t = _mk(spark, str(tmp_path / "t"), dv=True, interval=3)
    t.write(_df(spark, [(i, "a", i) for i in range(5)]).coalesce(1))
    t.delete(F.col("id").isin([0, 3]))                # v2: DV route
    assert len(_read_commit(t.root, 2)["add"][0].get("dv", "")) > 0
    v_ow = t.write(
        _df(spark, [(99, "c", 9)]).coalesce(1), mode="overwrite"
    )  # v3 = checkpoint = seed commit
    assert t.cleanup_log(retention_hours=0) == [0, 1, 2]
    feed = t.change_feed(v_ow, v_ow)
    inserts = sorted(
        r["id"] for r in
        feed.filter(F.col("_change_type") == "insert").collect()
    )
    deletes = sorted(
        r["id"] for r in
        feed.filter(F.col("_change_type") == "delete").collect()
    )
    assert inserts == [99]
    # live rows 1/2/4 present (never silently dropped); DV-deleted
    # rows 0/3 over-delivered — the pinned conservative semantics
    assert deletes == [0, 1, 2, 3, 4]


def test_dv_read_from_root_with_spaces_and_unicode(spark, tmp_path):
    """Round-8 advice (low): _metadata.file_path renders a percent-
    encoded URI, so a root with spaces / non-ASCII must still strip to
    exact relative paths for the DV anti-join and DML probes."""
    root = tmp_path / "sp ace" / "täble"
    root.parent.mkdir(parents=True, exist_ok=True)
    t = _mk(spark, str(root), dv=True)
    t.write(_df(spark, [(i, "a", i) for i in range(10)]).coalesce(1))
    t.delete(F.col("id").isin([0, 3]))
    assert sorted(r.id for r in t.read().collect()) == (
        [1, 2, 4, 5, 6, 7, 8, 9]
    )
    t.update(F.col("id") == 4, {"v": F.lit(400)})
    got = {(r["id"], r["v"]) for r in t.read().collect()}
    assert (4, 400) in got and (4, 4) not in got and len(got) == 8
