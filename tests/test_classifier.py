"""Distributed logistic regression vs a sequential numpy reference."""

from __future__ import annotations

import math
import random

import pytest

from real_time_video_streaming_analytics_lakehouse_spark.operators.classifier import (
    apply_logreg,
    train_logreg,
)


def _ref_train(rows, p, iters, lr, l2=0.0):
    import numpy as np

    X = np.array([[r[j] for j in range(p)] for r in rows], dtype=float)
    y = np.array([r[p] for r in rows], dtype=float)
    means, stds = X.mean(axis=0), X.std(axis=0)
    stds[stds == 0.0] = 1.0
    Xs = (X - means) / stds
    w, b = np.zeros(p), 0.0
    n = len(rows)
    for _ in range(iters):
        z = np.clip(Xs @ w + b, -30, 30)
        err = 1.0 / (1.0 + np.exp(-z)) - y
        b -= lr * err.sum() / n
        w = w - lr * ((Xs.T @ err) / n + l2 * w)
    return w, b, means, stds


def _synth(n=400, seed=7):
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        label = rng.random() < 0.5
        # two informative features, one noise feature
        x0 = rng.gauss(2.0 if label else -2.0, 1.0)
        x1 = rng.gauss(-1.0 if label else 1.0, 1.0)
        x2 = rng.gauss(0.0, 1.0)
        rows.append((x0, x1, x2, 1 if label else 0))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "x0 double, x1 double, x2 double, y int")


def test_matches_numpy_reference(spark):
    rows = _synth()
    model = train_logreg(
        _df(spark, rows).coalesce(1), ["x0", "x1", "x2"], "y",
        iters=40, lr=1.0,
    )
    w, b, means, stds = _ref_train(rows, 3, iters=40, lr=1.0)
    assert model["bias"] == pytest.approx(b, rel=1e-6, abs=1e-9)
    for j in range(3):
        assert model["weights"][j] == pytest.approx(w[j], rel=1e-6)
        assert model["means"][j] == pytest.approx(means[j], rel=1e-9)
        assert model["stds"][j] == pytest.approx(stds[j], rel=1e-9)


def test_l2_shrinks_weights(spark):
    rows = _synth()
    df = _df(spark, rows).coalesce(1)
    free = train_logreg(df, ["x0", "x1", "x2"], "y", iters=30)
    ridge = train_logreg(df, ["x0", "x1", "x2"], "y", iters=30, l2=0.5)
    assert sum(w * w for w in ridge["weights"]) < sum(
        w * w for w in free["weights"]
    )
    w, b, _, _ = _ref_train(rows, 3, iters=30, lr=1.0, l2=0.5)
    for j in range(3):
        assert ridge["weights"][j] == pytest.approx(w[j], rel=1e-6)


def test_separable_data_classified_accurately(spark):
    rows = _synth(n=600)
    df = _df(spark, rows).repartition(8)
    model = train_logreg(df, ["x0", "x1", "x2"], "y", iters=60)
    scored = apply_logreg(df, model, threshold=0.5)
    got = scored.selectExpr(
        "avg(cast(quality_score_pass = y as int)) as acc"
    ).collect()[0]["acc"]
    assert got > 0.95
    # informative features carry the signal, noise stays small
    assert abs(model["weights"][0]) > 5 * abs(model["weights"][2])
    assert model["weights"][0] > 0 > model["weights"][1]


def test_null_features_excluded_and_score_null(spark):
    rows = _synth(n=100)
    df = _df(spark, rows)
    with_nulls = df.unionByName(
        spark.createDataFrame(
            [(None, 0.0, 0.0, 1), (1.0, None, 0.0, None)],
            "x0 double, x1 double, x2 double, y int",
        )
    )
    m_clean = train_logreg(df.coalesce(1), ["x0", "x1", "x2"], "y", iters=10)
    m_nulls = train_logreg(
        with_nulls.coalesce(1), ["x0", "x1", "x2"], "y", iters=10
    )
    assert m_nulls["weights"] == pytest.approx(m_clean["weights"], rel=1e-9)
    scored = apply_logreg(with_nulls, m_nulls)
    assert scored.filter("x0 IS NULL AND quality_score IS NOT NULL").count() == 0


def test_empty_training_set_raises(spark):
    df = _df(spark, []).filter("1=0")
    with pytest.raises(ValueError, match="no rows"):
        train_logreg(df, ["x0"], "y", iters=1)


def test_quality_filter_end_to_end_on_text_features(spark):
    """The intended composition: add_text_features -> labeled seed set
    -> train -> gate the corpus on the learned probability."""
    from pyspark.sql import functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
        add_text_features,
    )

    rng = random.Random(3)
    good = [
        (i, "the quick brown fox jumps over the lazy dog and runs on "
            * rng.randint(3, 6))
        for i in range(40)
    ]
    junk = [
        (100 + i, "zzz " * rng.randint(1, 2) + "!!!###" * rng.randint(2, 5))
        for i in range(40)
    ]
    docs = spark.createDataFrame(good + junk, "doc_id long, text string")
    feats = add_text_features(docs)
    labeled = feats.withColumn(
        "y", (F.col("doc_id") < 100).cast("int")
    )
    cols = ["n_tokens", "avg_token_len", "punct_ratio", "stopword_ratio"]
    model = train_logreg(labeled, cols, "y", iters=60)
    gated = apply_logreg(labeled, model, threshold=0.5)
    acc = gated.selectExpr(
        "avg(cast(quality_score_pass = y as int)) as acc"
    ).collect()[0]["acc"]
    assert acc > 0.95
