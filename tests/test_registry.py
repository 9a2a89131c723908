"""Per-topic schema registry + validated ingest
(sources/registry.py; reference kafka-setup/topics.py:76-165 —
versioned SchemaRegistry — and :599-663 — per-topic JSON schemas with
required fields, validated at the producer; here composed as the
Spark-first ingest gate with DLQ routing).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row

from real_time_video_streaming_analytics_lakehouse_spark.sources.registry import (
    SchemaRegistry,
    annotate_against_registry,
    backward_incompatibilities,
    json_schema_to_struct,
    parse_topic,
    registry_ingest_frames,
)

VIDEO = {
    "type": "object",
    "properties": {
        "event_id": {"type": "integer"},
        "event_type": {"type": "string"},
        "user_id": {"type": "integer"},
        "playback_position": {"type": "integer"},
        "video_quality": {"type": "string"},
    },
    "required": ["event_id", "event_type", "user_id"],
}
INTERACTIONS = {
    "type": "object",
    "properties": {
        "event_id": {"type": "integer"},
        "event_type": {"type": "string"},
        "user_id": {"type": "integer"},
    },
    "required": ["event_id", "event_type", "user_id"],
}


# ---------------------------------------------------------------- registry

def test_json_schema_compiles_to_struct_types():
    st = json_schema_to_struct({
        "type": "object",
        "properties": {
            "s": {"type": "string"},
            "i": {"type": "integer"},
            "n": {"type": "number"},
            "b": {"type": "boolean"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "nested": {
                "type": "object",
                "properties": {"k": {"type": "integer"}},
            },
            "bag": {"type": "object"},
        },
    })
    kinds = {f.name: f.dataType.simpleString() for f in st.fields}
    assert kinds == {
        "s": "string", "i": "bigint", "n": "double", "b": "boolean",
        "tags": "array<string>", "nested": "struct<k:bigint>",
        "bag": "map<string,string>",
    }
    with pytest.raises(ValueError, match="object"):
        json_schema_to_struct({"type": "array"})
    with pytest.raises(ValueError, match="unsupported"):
        json_schema_to_struct(
            {"type": "object", "properties": {"x": {"type": "uuid"}}}
        )


def test_registry_versions_idempotence_and_latest(tmp_path):
    for root in (None, str(tmp_path / "reg")):
        reg = SchemaRegistry(root)
        assert reg.register("video_events-value", VIDEO) == 1
        # idempotent re-register of the latest schema
        assert reg.register("video_events-value", VIDEO) == 1
        v2 = dict(VIDEO)
        v2["properties"] = {
            **VIDEO["properties"], "bitrate": {"type": "integer"},
        }
        assert reg.register("video_events-value", v2) == 2
        assert reg.get("video_events-value") == v2
        assert reg.get("video_events-value", 1) == VIDEO
        assert reg.versions("video_events-value") == [1, 2]
        assert reg.subjects() == ["video_events-value"]
        assert reg.get("missing") is None


def test_registry_persistence_survives_reopen(tmp_path):
    root = str(tmp_path / "reg")
    SchemaRegistry(root).register("t-value", VIDEO)
    reopened = SchemaRegistry(root)
    assert reopened.get("t-value") == VIDEO
    # versions are immutable put-if-absent files
    files = glob.glob(os.path.join(root, "t-value", "v*.json"))
    assert [os.path.basename(f) for f in files] == ["v1.json"]


def test_backward_compatibility_gate():
    # type change on a shared property -> rejected
    changed = {
        "type": "object",
        "properties": {**VIDEO["properties"], "user_id": {"type": "string"}},
        "required": VIDEO["required"],
    }
    assert backward_incompatibilities(VIDEO, changed)
    reg = SchemaRegistry()
    reg.register("v-value", VIDEO)
    with pytest.raises(ValueError, match="not backward-compatible"):
        reg.register("v-value", changed)
    # newly-required field that old data never had -> rejected
    stricter = {
        "type": "object",
        "properties": {**VIDEO["properties"], "device_id": {"type": "string"}},
        "required": VIDEO["required"] + ["device_id"],
    }
    with pytest.raises(ValueError, match="newly required"):
        reg.register("v-value", stricter)
    # opting out admits both
    loose = SchemaRegistry(compatibility="none")
    loose.register("v-value", VIDEO)
    assert loose.register("v-value", changed) == 2


def test_topic_subject_resolution():
    reg = SchemaRegistry()
    reg.register("video_events-value", VIDEO)
    reg.register("bare_topic", INTERACTIONS)
    assert reg.topic_subject("video_events") == "video_events-value"
    assert reg.topic_subject("bare_topic") == "bare_topic"
    assert reg.topic_subject("nope") is None


# ---------------------------------------------------------------- ingest

def _registry():
    reg = SchemaRegistry()
    reg.register("video_events-value", VIDEO)
    reg.register("user_interactions-value", INTERACTIONS)
    return reg


def _raw(spark):
    rows = [
        # valid video event
        Row(topic="video_events",
            value='{"event_id":1,"event_type":"play","user_id":7,'
                  '"playback_position":30,"video_quality":"hd"}'),
        # missing required user_id
        Row(topic="video_events",
            value='{"event_id":2,"event_type":"pause"}'),
        # malformed payload
        Row(topic="video_events", value='{"event_id":'),
        # null payload
        Row(topic="video_events", value=None),
        # valid interaction
        Row(topic="user_interactions",
            value='{"event_id":5,"event_type":"like","user_id":9}'),
        # type-mismatched field: PERMISSIVE parse marks the RECORD
        # corrupt (Spark's record-level contract), so it routes as
        # malformed_json
        Row(topic="user_interactions",
            value='{"event_id":"abc","event_type":"like","user_id":9}'),
        # unregistered topic
        Row(topic="ad_events",
            value='{"event_id":6,"event_type":"ad_start"}'),
    ]
    return spark.createDataFrame(rows, "topic STRING, value STRING")


def test_annotate_against_registry_routes_every_failure_mode(spark):
    ann = annotate_against_registry(_raw(spark), _registry())
    got = {
        (r["topic"], r["value"]): (r["_dq_valid"], r["_dq_errors"],
                                   r["_dq_subject"], r["_dq_version"])
        for r in ann.collect()
    }
    assert got[("video_events",
                '{"event_id":1,"event_type":"play","user_id":7,'
                '"playback_position":30,"video_quality":"hd"}')] == (
        1, "", "video_events-value", 1)
    assert got[("video_events", '{"event_id":2,"event_type":"pause"}')] == (
        0, "missing:user_id", "video_events-value", 1)
    assert got[("video_events", '{"event_id":')] == (
        0, "malformed_json", "video_events-value", 1)
    assert got[("video_events", None)] == (
        0, "null_payload", "video_events-value", 1)
    assert got[("user_interactions",
                '{"event_id":5,"event_type":"like","user_id":9}')] == (
        1, "", "user_interactions-value", 1)
    assert got[("user_interactions",
                '{"event_id":"abc","event_type":"like","user_id":9}')] == (
        0, "malformed_json", "user_interactions-value", 1)
    assert got[("ad_events", '{"event_id":6,"event_type":"ad_start"}')] == (
        0, "unregistered_topic", None, None)


def test_registry_ingest_frames_split_and_flatten(spark):
    good, dlq = registry_ingest_frames(
        _raw(spark), _registry(), keep_cols=("topic",)
    )
    assert set(good) == {"video_events", "user_interactions"}
    v = good["video_events"].collect()
    assert len(v) == 1 and v[0]["event_id"] == 1
    assert v[0]["playback_position"] == 30 and v[0]["topic"] == "video_events"
    assert "_corrupt_record" not in good["video_events"].columns
    ui = good["user_interactions"].collect()
    assert [r["event_id"] for r in ui] == [5]
    bad = {r["_dq_errors"] for r in dlq.collect()}
    assert bad == {"missing:user_id", "malformed_json", "null_payload",
                   "unregistered_topic"}
    # the DLQ keeps the ORIGINAL payload for replay
    assert dlq.count() == 5 and "value" in dlq.columns


def test_parse_topic_unregistered_raises(spark):
    with pytest.raises(KeyError, match="no registered subject"):
        parse_topic(_raw(spark), _registry(), "ad_events")


def test_annotation_is_single_projection_no_shuffle(spark):
    """Plan gate: the registry gate must be ONE projection over the
    source — no join, no union-of-branches, no exchange (a multiplexed
    Kafka stream must not be scanned once per topic)."""
    ann = annotate_against_registry(_raw(spark), _registry())
    plan = ann._jdf.queryExecution().executedPlan().toString()
    for op in ("Exchange", "Join", "Union"):
        assert op not in plan, f"unexpected {op} in registry gate:\n{plan}"


def test_run_registry_ingest_streaming_exactly_once(spark, tmp_path):
    """Composed streaming surface: per-topic typed tables + one DLQ
    from a single drain; a replayed second drain commits nothing."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.txlog import TxTable
    from real_time_video_streaming_analytics_lakehouse_spark.streaming.pipelines import (
        run_registry_ingest,
        stream_events_from_files,
    )

    src_dir = str(tmp_path / "raw_src")
    _raw(spark).coalesce(1).write.mode("append").parquet(src_dir)

    root = str(tmp_path / "tables")
    dlq_p = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        src = stream_events_from_files(
            spark, src_dir, spark.read.parquet(src_dir).schema
        )
        q = run_registry_ingest(src, _registry(), root, dlq_p, ckpt)
        q.awaitTermination(120)

    drain()
    video = TxTable(spark, os.path.join(root, "video_events")).read()
    ui = TxTable(spark, os.path.join(root, "user_interactions")).read()
    dlq = TxTable(spark, dlq_p).read()
    assert [r["event_id"] for r in video.collect()] == [1]
    assert [r["event_id"] for r in ui.collect()] == [5]
    assert dlq.count() == 5
    errs = sorted(r["_dq_errors"] for r in dlq.collect())
    assert errs == sorted(["missing:user_id", "malformed_json",
                           "malformed_json", "null_payload",
                           "unregistered_topic"])
    # replay: no new files to read -> second drain is a no-op; and the
    # txn guard holds even if the same batch id were re-delivered
    drain()
    assert video.count() == 1 and ui.count() == 1 and dlq.count() == 5
