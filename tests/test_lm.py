"""Bigram LM training + perplexity scoring vs closed-form expectations."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_time_video_streaming_analytics_lakehouse_spark.operators.lm import (
    score_documents,
    train_bigram_lm,
)

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the rat"),
    (2, "a cat and a rat"),
]


def _df(spark, rows=CORPUS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ref_counts(texts):
    uni, bi = Counter(), Counter()
    for t in texts:
        w = t.split()
        for a, b in zip(w, w[1:]):
            bi[(a, b)] += 1
            uni[a] += 1
    return uni, bi


def test_count_tables_match_reference(spark):
    uni, bi = train_bigram_lm(_df(spark))
    ref_uni, ref_bi = _ref_counts([t for _, t in CORPUS])
    assert {(r.w1, r.c1) for r in uni.collect()} == set(ref_uni.items())
    assert {((r.w1, r.w2), r.c12) for r in bi.collect()} == set(ref_bi.items())


def test_min_count_prunes_bigrams_not_unigrams(spark):
    uni, bi = train_bigram_lm(_df(spark), min_count=2)
    kept = {(r.w1, r.w2) for r in bi.collect()}
    ref_uni, ref_bi = _ref_counts([t for _, t in CORPUS])
    assert kept == {p for p, c in ref_bi.items() if c >= 2}
    assert uni.count() == len(ref_uni)  # normalizer stays exact


def test_scores_match_closed_form(spark):
    uni, bi = train_bigram_lm(_df(spark))
    ref_uni, ref_bi = _ref_counts([t for _, t in CORPUS])
    v = len(ref_uni)
    got = {
        r.doc_id: r
        for r in score_documents(_df(spark), uni, bi, k=1.0).collect()
    }
    for doc_id, text in CORPUS:
        w = text.split()
        pairs = list(zip(w, w[1:]))
        logps = [
            math.log((ref_bi[p] + 1.0) / (ref_uni[p[0]] + 1.0 * v))
            for p in pairs
        ]
        r = got[doc_id]
        assert r.n_bigrams == len(pairs)
        assert r.lm_hits == len(pairs)  # trained on itself: all present
        assert r.lm_oov == 0
        assert r.lm_hit_weight == sum(ref_bi[p] for p in pairs)
        assert r.avg_logprob == pytest.approx(
            sum(logps) / len(logps), rel=1e-12
        )
        assert r.ppl == pytest.approx(
            math.exp(-sum(logps) / len(logps)), rel=1e-12
        )


def test_oov_floor_and_every_doc_emitted(spark):
    uni, bi = train_bigram_lm(_df(spark))
    v = uni.count()
    probe = spark.createDataFrame(
        [(10, "zz qq"), (11, "x"), (12, None), (13, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in score_documents(probe, uni, bi).collect()}
    # fully-OOV bigram: uniform floor 1/V
    r = got[10]
    assert (r.n_bigrams, r.lm_hits, r.lm_oov, r.lm_hit_weight) == (1, 0, 1, 0)
    assert r.avg_logprob == pytest.approx(math.log(1.0 / v), rel=1e-12)
    # single-token / NULL / empty docs: zero bigrams, NULL score, row kept
    for doc_id in (11, 12, 13):
        r = got[doc_id]
        assert (r.n_bigrams, r.lm_hits, r.avg_logprob, r.ppl) == (
            0, 0, None, None,
        )


def test_in_distribution_text_scores_lower_ppl_than_garbage(spark):
    uni, bi = train_bigram_lm(_df(spark))
    probe = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "mat the on sat zz cat qq")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.ppl for r in score_documents(probe, uni, bi).collect()}
    assert got[0] < got[1]


def test_partitioning_invariant(spark):
    df = _df(spark)
    uni1, bi1 = train_bigram_lm(df.coalesce(1))
    uni7, bi7 = train_bigram_lm(df.repartition(7))
    assert sorted(map(tuple, uni1.collect())) == sorted(map(tuple, uni7.collect()))
    assert sorted(map(tuple, bi1.collect())) == sorted(map(tuple, bi7.collect()))
