"""Property-based checks (hypothesis) for the merge and dedup operators:
algebraic invariants that must hold for ANY input, not just goldens."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from real_time_video_streaming_analytics_lakehouse_spark.operators.dedup import (
    dedup_keep_latest,
)
from real_time_video_streaming_analytics_lakehouse_spark.operators.merge import (
    merge_upsert,
)

rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100)), min_size=1, max_size=12
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(t=rows, s=rows)
def test_merge_upsert_invariants(spark, t, s):
    target = spark.createDataFrame(
        [Row(id=k, v=f"t{v}") for k, v in {k: v for k, v in t}.items()]
    )
    source = spark.createDataFrame(
        [Row(id=k, v=f"s{v}") for k, v in {k: v for k, v in s}.items()]
    )
    out = {r["id"]: r["v"] for r in merge_upsert(target, source, ["id"]).collect()}
    tkeys = {k for k, _ in t}
    skeys = {k for k, _ in s}
    assert set(out) == tkeys | skeys  # one row per key, no loss
    for k in skeys:
        assert out[k].startswith("s")  # source always wins on conflict
    for k in tkeys - skeys:
        assert out[k].startswith("t")  # unmatched target rows survive


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[2],
    )
)
def test_dedup_keep_latest_invariants(spark, data):
    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(k=k, ts=base + dt.timedelta(seconds=sec), event_id=eid)
            for k, sec, eid in data
        ]
    )
    out = dedup_keep_latest(df, ["k"], "ts", tiebreak=["event_id"]).collect()
    by_key = {}
    for k, sec, eid in data:
        cur = by_key.get(k)
        if cur is None or (sec, eid) > cur:
            by_key[k] = (sec, eid)
    assert len(out) == len(by_key)  # exactly one row per key
    for r in out:
        sec, eid = by_key[r["k"]]
        assert (r["ts"], r["event_id"]) == (
            base + dt.timedelta(seconds=sec),
            eid,
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=20,
    ),
    divisor=st.integers(min_value=1, max_value=10**9),
)
def test_floor_div_matches_python_everywhere(spark, vals, divisor):
    """floor_div must equal Python's // (exact floor division) for any
    int64 input and positive divisor — including beyond double's
    53-bit mantissa and for negatives."""
    import pyspark.sql.functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.functions.dialect import floor_div

    df = spark.createDataFrame([(v,) for v in vals], "x BIGINT")
    got = {
        r["x"]: r["d"]
        for r in df.select(
            "x", floor_div(F.col("x"), divisor).alias("d")
        ).collect()
    }
    for v in vals:
        assert got[v] == v // divisor, (v, divisor)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee", "zz"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_top_tfidf_term_matches_python_reference(spark, docs):
    """top_tfidf_term must pick, for every doc, the term maximizing
    tf/df with the lexicographically greatest term on exact ties —
    for ANY corpus, matching a pure-Python recomputation (the same
    contract the DuckDB oracle pins at catalog scale)."""
    import pyspark.sql.functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        top_tfidf_term,
    )

    rows = [(i, w) for i, ws in enumerate(docs) for w in ws]
    words = spark.createDataFrame(rows, "doc_id BIGINT, w STRING")
    got = {
        r["doc_id"]: (r["top_tfidf_term"], r["top_tfidf_tf"], r["top_tfidf_df"])
        for r in top_tfidf_term(words).collect()
    }

    dfs: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            dfs[w] = dfs.get(w, 0) + 1
    for i, ws in enumerate(docs):
        tfs = {w: ws.count(w) for w in set(ws)}
        best = max(
            tfs, key=lambda w: (tfs[w] / dfs[w], w)
        )
        assert got[i] == (best, tfs[best], dfs[best]), (i, ws)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee", "zz"]),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_bm25_scores_match_python_reference(spark, docs):
    """bm25_scores must equal the Okapi formula (Lucene-smoothed idf,
    corpus avgdl) recomputed in pure Python, for ANY corpus, to 1e-12."""
    import math

    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        bm25_scores,
    )

    k1, b = 1.2, 0.75
    n = len(docs)
    rows = [(i, w) for i, ws in enumerate(docs) for w in ws]
    words = spark.createDataFrame(rows, "doc_id BIGINT, w STRING")
    got = {
        (r["doc_id"], r["w"]): r["score"]
        for r in bm25_scores(words, n_docs=n, k1=k1, b=b).collect()
    }

    dfs: dict[str, int] = {}
    for ws in docs:
        for w in set(ws):
            dfs[w] = dfs.get(w, 0) + 1
    avgdl = sum(len(ws) for ws in docs) / n
    expected_keys = set()
    for i, ws in enumerate(docs):
        for w in set(ws):
            expected_keys.add((i, w))
            tf = ws.count(w)
            idf = math.log(1 + (n - dfs[w] + 0.5) / (dfs[w] + 0.5))
            want = idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(ws) / avgdl)
            )
            assert abs(got[(i, w)] - want) < 1e-12, (i, w)
    assert set(got) == expected_keys


# BMP alphabet — kept for the guarantee test's embedding contexts
# (the full-range equivalence sweep below uses _uni_text; round 11
# verified ascii()/split()/length() are codepoint-exact beyond BMP)
_bmp_text = st.text(
    alphabet=st.characters(
        min_codepoint=1, max_codepoint=0xD7FF
    ),
    max_size=64,
)

#: full Unicode minus the surrogate block (Cs) — hypothesis would
#: otherwise emit LONE surrogates, which are not well-formed text (the
#: engine handles them too: pinned separately in test_operators).
_uni_text = st.text(
    alphabet=st.characters(
        min_codepoint=1,
        max_codepoint=0x10FFFF,
        exclude_categories=["Cs"],
    ),
    max_size=64,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_uni_text | st.none(), min_size=1, max_size=8))
def test_winnow_selection_matches_reference_on_arbitrary_text(
    spark, texts
):
    """Both winnowing implementations must equal the paper's algorithm
    for ANY well-formed Unicode string — since round 11 the strategy
    spans the FULL codepoint range including astral planes, retiring
    the BMP-only equivalence caveat (Spark 4's split/ascii/length all
    operate on codepoints, matching the vec path's UTF-32 view;
    hypothesis explores boundary lengths around k=8 and k+w-1=11,
    repeated chars, exotic codepoints, NULLs)."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        winnow_fingerprints_col,
        winnow_fingerprints_vec,
    )

    from .test_operators import _winnow_reference

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    for col in (winnow_fingerprints_col, winnow_fingerprints_vec):
        got = {
            r["doc_id"]: (None if r["fp"] is None else list(r["fp"]))
            for r in df.select(
                "doc_id", col("text").alias("fp")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _winnow_reference(t), (col.__name__, repr(t))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    passage=st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0xD7FF),
        min_size=11,
        max_size=20,
    ),
    pre_a=_bmp_text,
    post_a=_bmp_text,
    pre_b=_bmp_text,
    post_b=_bmp_text,
)
def test_winnowing_guarantee_holds_for_arbitrary_embeddings(
    spark, passage, pre_a, post_a, pre_b, post_b
):
    """The SIGMOD'03 guarantee for ANY embedding of a >= w+k-1 = 11
    char passage into any two contexts: the docs share a selected
    fingerprint."""
    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        winnow_fingerprints_vec,
    )

    df = spark.createDataFrame(
        [(0, pre_a + passage + post_a), (1, pre_b + passage + post_b)],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: set(r["fp"])
        for r in df.select(
            "doc_id", winnow_fingerprints_vec("text").alias("fp")
        ).collect()
    }
    assert got[0] & got[1], repr((passage, pre_a, post_a, pre_b, post_b))


# --- registry ingest gate: total routing on arbitrary payloads --------

def _as_json(d):
    import json

    return json.dumps(d)


_fuzz_payloads = st.lists(
    st.tuples(
        st.sampled_from(["video_events", "user_interactions", "ad_events"]),
        st.one_of(
            st.none(),
            # arbitrary junk text (includes things that LOOK like JSON)
            st.text(max_size=40),
            # structurally-valid JSON objects with adversarial fields
            st.dictionaries(
                st.sampled_from(
                    ["event_id", "event_type", "user_id", "extra", ""]
                ),
                st.one_of(
                    st.none(),
                    st.integers(-(2**62), 2**62),
                    st.text(max_size=10),
                    st.booleans(),
                ),
                max_size=5,
            ).map(_as_json),
        ),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(payloads=_fuzz_payloads)
def test_registry_gate_routes_totally_on_arbitrary_payloads(
    spark, payloads
):
    """The ingest gate's totality contract, fuzzed: for ANY (topic,
    payload) input — junk text, null, adversarial JSON, wrong types —
    annotation never crashes, every input row lands in exactly one of
    good/DLQ (counts partition the input), good rows parse with every
    required field non-null, and DLQ rows keep their original payload
    byte-for-byte (the replay contract)."""
    from real_time_video_streaming_analytics_lakehouse_spark.sources.registry import (
        SchemaRegistry,
        registry_ingest_frames,
    )

    reg = SchemaRegistry()
    schema = {
        "type": "object",
        "properties": {
            "event_id": {"type": "integer"},
            "event_type": {"type": "string"},
            "user_id": {"type": "integer"},
        },
        "required": ["event_id", "user_id"],
    }
    reg.register("video_events-value", schema)
    reg.register("user_interactions-value", schema)

    df = spark.createDataFrame(
        [Row(topic=t, value=v) for t, v in payloads],
        "topic STRING, value STRING",
    )
    good, dlq = registry_ingest_frames(df, reg)
    n_good = {t: f.count() for t, f in good.items()}
    dlq_rows = dlq.collect()
    assert sum(n_good.values()) + len(dlq_rows) == len(payloads)
    for t, f in good.items():
        for r in f.collect():
            assert r["event_id"] is not None and r["user_id"] is not None
    # DLQ keeps originals verbatim and machine-readable reasons
    originals = {}
    for t, v in payloads:
        originals.setdefault(t, []).append(v)
    for r in dlq_rows:
        assert r["value"] in originals[r["topic"]]
        assert r["_dq_errors"] != ""
        if r["topic"] == "ad_events":
            assert r["_dq_errors"] == "unregistered_topic"


def _ref_winnow_spans(texts: dict, k=8, w=4, min_anchors=2):
    """Pure-Python reference of the full winnow_dup_spans pipeline
    (positional winnowing with leftmost-min ties → ≥2-distinct-doc
    anchors → gap merge → min_anchors gate)."""
    def positions(t):
        if t is None or len(t) < k:
            return []
        m = len(t) - k + 1
        h = []
        for i in range(m):
            v = 0
            for j in range(k):
                v = (v * 131 + ord(t[i + j])) % 10**15
            h.append(v)
        if m < w:
            p = min(range(m), key=lambda i: (h[i], i))
            return [(h[p], p)]
        sel = set()
        for j in range(m - w + 1):
            off = min(range(w), key=lambda x: (h[j + x], x))
            sel.add((h[j + off], j + off))
        return sorted(sel, key=lambda x: x[1])

    pos = {d: positions(t) for d, t in texts.items()}
    docs_of: dict = {}
    for d, ps in pos.items():
        for fp, _ in set(ps):
            docs_of.setdefault(fp, set()).add(d)
    shared = {fp for fp, ds in docs_of.items() if len(ds) >= 2}
    out = set()
    gap = w + k - 1
    for d, ps in pos.items():
        runs: list = []
        for fp, p in ((fp, p) for fp, p in ps if fp in shared):
            if runs and p - runs[-1][-1][1] <= gap:
                runs[-1].append((fp, p))
            else:
                runs.append([(fp, p)])
        for run in runs:
            if len(run) >= min_anchors:
                out.add((d, run[0][1], run[-1][1] + k,
                         min(fp for fp, _ in run), len(run)))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    n_docs=st.integers(3, 7),
    plant_len=st.integers(12, 60),
)
def test_winnow_dup_spans_matches_reference_on_random_corpora(
    spark, data, n_docs, plant_len
):
    """Property fuzz (round 12): on ANY random corpus — arbitrary
    unicode-ish bodies, a random planted passage inserted into a
    random subset of docs at random offsets, plus NULL/short edge docs
    — the distributed span extractor is row-identical to the pure-
    Python reference of the whole pipeline."""
    texts: dict = {}
    passage = data.draw(
        st.text(min_size=plant_len, max_size=plant_len), label="passage"
    )
    planted = data.draw(
        st.sets(st.integers(0, n_docs - 1), min_size=1), label="planted"
    )
    for d in range(n_docs):
        body = data.draw(st.text(max_size=120), label=f"body{d}")
        if d in planted and body:
            off = data.draw(
                st.integers(0, len(body)), label=f"off{d}"
            )
            texts[d] = body[:off] + passage + body[off:]
        elif d in planted:
            texts[d] = passage
        else:
            texts[d] = body
    texts[n_docs] = None  # NULL doc
    texts[n_docs + 1] = "tiny"  # sub-k doc

    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        winnow_dup_spans,
    )

    df = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id LONG, text STRING"
    )
    got = {
        (r["doc_id"], r["start"], r["end"], r["dup_group"], r["n_anchors"])
        for r in winnow_dup_spans(df, min_anchors=2).collect()
    }
    assert got == _ref_winnow_spans(texts)


def test_percentile_approx_equals_duckdb_discrete_quantile(spark):
    """The q80_keep_approx oracle (round 14) rests on one cross-engine
    identity: on integer scores, Spark's percentile_approx equals
    DuckDB's quantile_disc. The catalog verifies it on the fixed
    corpus; this pins it on 60 seeded RANDOM groups (sizes 1..400,
    duplicate-heavy and spread values, quantiles 0.5/0.8/0.95) in ONE
    Spark job per quantile — if either engine's discrete-quantile
    definition drifts, this fails before the driver gate does."""
    import random

    import duckdb
    import pyspark.sql.functions as F

    rng = random.Random(1404)
    rows = []
    for g in range(60):
        n = rng.randint(1, 400)
        hi = rng.choice([3, 10, 100, 10_000])
        for _ in range(n):
            rows.append((g, rng.randint(0, hi)))
    df = spark.createDataFrame(rows, "g INT, x INT")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (g INT, x INT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    for q in (0.5, 0.8, 0.95):
        got = {
            r["g"]: r["p"]
            for r in df.groupBy("g")
            .agg(F.percentile_approx("x", q).alias("p"))
            .collect()
        }
        want = dict(
            con.execute(
                f"SELECT g, quantile_disc(x, {q}) FROM t GROUP BY g"
            ).fetchall()
        )
        assert got == want, (q, {
            g: (got[g], want[g]) for g in got if got[g] != want[g]
        })
