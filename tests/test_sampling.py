"""Deterministic sampling / corpus mixing (operators/sampling.py).

The load-bearing property throughout: membership is a pure function of
(key values, seed) — invariant under repartitioning, row order, and
corpus growth — because each row's draw is a content hash, not Spark's
per-partition RNG.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from real_time_video_streaming_analytics_lakehouse_spark.operators.sampling import (
    deterministic_sample,
    mix_corpora,
    quota_sample,
    sample_key,
    stratified_sample,
)

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_deterministic_and_partitioning_invariant(spark, docs):
    a = _ids(deterministic_sample(docs, ["doc_id"], 0.5, seed="s1"))
    b = _ids(deterministic_sample(docs, ["doc_id"], 0.5, seed="s1"))
    assert a == b
    # membership survives arbitrary repartitioning (Spark's df.sample
    # does NOT have this property — the point of hash sampling)
    c = _ids(
        deterministic_sample(docs.repartition(7, "lang"), ["doc_id"], 0.5, "s1")
    )
    assert a == c
    # a different seed draws a different set
    d = _ids(deterministic_sample(docs, ["doc_id"], 0.5, seed="s2"))
    assert a != d


def test_fraction_accuracy_and_nesting(spark, docs):
    n = docs.count()
    for frac in (0.2, 0.5, 0.8):
        got = deterministic_sample(docs, ["doc_id"], frac, "acc").count()
        # 5-sigma binomial envelope
        sigma = math.sqrt(n * frac * (1 - frac))
        assert abs(got - n * frac) <= 5 * sigma, (frac, got, n)
    # threshold monotonicity: the 20% sample is a subset of the 50%
    s20 = set(_ids(deterministic_sample(docs, ["doc_id"], 0.2, "acc")))
    s50 = set(_ids(deterministic_sample(docs, ["doc_id"], 0.5, "acc")))
    assert s20 <= s50
    assert deterministic_sample(docs, ["doc_id"], 0.0, "acc").count() == 0
    assert deterministic_sample(docs, ["doc_id"], 1.0, "acc").count() == n


def test_fraction_validation(docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, ["doc_id"], 1.5)


def test_stratified_fractions(spark, docs):
    fr = {"en": 0.25, "de": 1.0}
    out = stratified_sample(
        docs, "lang", fr, key_cols=["doc_id"], default_fraction=0.0, seed="st"
    )
    by_lang = {
        r.lang: r.cnt
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(by_lang) <= {"en", "de"}  # unlisted strata dropped
    assert by_lang.get("de") == totals["de"]  # fraction 1.0 keeps all
    n_en = totals["en"]
    sigma = math.sqrt(n_en * 0.25 * 0.75)
    assert abs(by_lang.get("en", 0) - 0.25 * n_en) <= 5 * sigma
    # rows, not rescaled: output is a strict subset of the input
    assert out.exceptAll(docs).count() == 0


def test_quota_exact_counts_and_stability(spark, docs):
    out = quota_sample(docs, "lang", 5, key_cols=["doc_id"], seed="q")
    counts = {
        r.lang: r.cnt
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    totals = {
        r.lang: r.cnt
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    for lang, total in totals.items():
        assert counts.get(lang, 0) == min(5, total)
    # same rows under different partitioning
    again = quota_sample(
        docs.repartition(11), "lang", 5, key_cols=["doc_id"], seed="q"
    )
    assert _ids(out) == _ids(again)
    # per-stratum dict quotas; absent strata are dropped
    d = quota_sample(
        docs, "lang", {"en": 3, "de": 2}, key_cols=["doc_id"], seed="q"
    )
    dc = {
        r.lang: r.cnt
        for r in d.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert dc == {"en": 3, "de": 2}


def test_quota_rank_prefix_property(spark, docs):
    """The first k ranks of a quota-n sample ARE the quota-k sample —
    the property that lets one materialized sample serve any smaller
    budget."""
    big = quota_sample(
        docs, "lang", 8, key_cols=["doc_id"], seed="p", rank_col="rk"
    )
    small = quota_sample(docs, "lang", 3, key_cols=["doc_id"], seed="p")
    assert _ids(big.filter(F.col("rk") <= 3)) == _ids(small)


def test_mix_corpora_provenance_and_weights(spark, docs):
    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")
    out = mix_corpora(
        {"en": (en, 0.5), "rest": (rest, 1.0)}, key_cols=["doc_id"], seed="m"
    )
    counts = {
        r.mix_source: r.cnt
        for r in out.groupBy("mix_source").agg(F.count("*").alias("cnt")).collect()
    }
    assert counts["rest"] == rest.count()
    n = en.count()
    assert abs(counts["en"] - 0.5 * n) <= 5 * math.sqrt(n * 0.25)
    # sources draw independently: the en survivors under the mix seed
    # differ from a bare same-seed sample (derived seeds)
    bare = set(_ids(deterministic_sample(en, ["doc_id"], 0.5, seed="m")))
    mixed = set(_ids(out.filter(F.col("mix_source") == "en")))
    assert mixed != bare


def test_split_corpus_disjoint_exhaustive(spark, docs):
    from real_time_video_streaming_analytics_lakehouse_spark.operators.sampling import (
        split_corpus,
    )

    splits = split_corpus(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed="sp"
    )
    ids = {name: set(_ids(df)) for name, df in splits.items()}
    # exhaustive and pairwise disjoint — no row lost, none leaked
    assert sum(len(v) for v in ids.values()) == docs.count()
    assert ids["train"] | ids["val"] | ids["test"] == set(_ids(docs))
    assert not (ids["train"] & ids["val"])
    assert not (ids["val"] & ids["test"])
    assert not (ids["train"] & ids["test"])
    # reproducible
    again = split_corpus(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed="sp"
    )
    assert set(_ids(again["val"])) == ids["val"]
    n = docs.count()
    assert abs(len(ids["train"]) - 0.8 * n) <= 5 * math.sqrt(n * 0.16)
    with pytest.raises(ValueError):
        split_corpus(docs, ["doc_id"], {"a": 0.5, "b": 0.4})


def test_sample_key_is_fixed_width_hex(spark, docs):
    bad = docs.select(sample_key(["doc_id"], "x").alias("k")).filter(
        ~F.col("k").rlike("^[0-9a-f]{8}$")
    )
    assert bad.count() == 0
