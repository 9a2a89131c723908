"""Distributed Lloyd's k-means vs a sequential reference."""

from __future__ import annotations

import hashlib
import random

import pytest

from real_time_video_streaming_analytics_lakehouse_spark.operators.clustering import (
    assign_clusters,
    kmeans,
)

DIM = 8


def _blobs(n_per=40, seed=5):
    rng = random.Random(seed)
    centers = [
        [6.0] * DIM,
        [-6.0] * DIM,
        [6.0] * (DIM // 2) + [-6.0] * (DIM // 2),
    ]
    rows = []
    i = 0
    for ci, c in enumerate(centers):
        for _ in range(n_per):
            rows.append((i, ci, [x + rng.gauss(0, 0.5) for x in c]))
            i += 1
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, blob int, embedding array<double>"
    )


def _ref_kmeans(rows, k, iters, seed="kmeans", normalize=False, tol=1e-9):
    """Sequential Lloyd's with the SAME md5 seeding + update rules."""
    import numpy as np

    order = sorted(
        rows,
        key=lambda r: (
            hashlib.md5(f"{seed}|{r[0]}".encode()).hexdigest(), r[0]
        ),
    )
    cent = np.array([r[2] for r in order[:k]], dtype=np.float64)
    if normalize:
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    v = np.array([r[2] for r in rows], dtype=np.float64)
    if normalize:
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
    inertia = []
    for _ in range(iters):
        d2 = (
            (v * v).sum(axis=1, keepdims=True)
            - 2.0 * (v @ cent.T)
            + (cent * cent).sum(axis=1)
        )
        a = d2.argmin(axis=1)
        inertia.append(float(d2[np.arange(len(a)), a].sum()))
        new = cent.copy()
        for ci in range(k):
            m = a == ci
            if m.any():
                new[ci] = v[m].mean(axis=0)
        if normalize:
            norms = np.linalg.norm(new, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            new = new / norms
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift < tol:
            break
    return cent, inertia


def test_matches_sequential_reference(spark):
    rows = _blobs()
    model = kmeans(_df(spark, rows), k=3, iters=6)
    ref_cent, ref_inertia = _ref_kmeans(rows, k=3, iters=6)
    assert model["inertia"] == pytest.approx(ref_inertia, rel=1e-9)
    for got, ref in zip(model["centroids"], ref_cent):
        assert got == pytest.approx(list(ref), rel=1e-9)


def test_inertia_non_increasing_and_partition_invariant(spark):
    rows = _blobs()
    df = _df(spark, rows)
    m1 = kmeans(df.coalesce(1), k=3, iters=5)
    m7 = kmeans(df.repartition(7), k=3, iters=5)
    for a, b in zip(m1["inertia"], m1["inertia"][1:]):
        assert b <= a + 1e-9
    assert m7["inertia"] == pytest.approx(m1["inertia"], rel=1e-9)
    for c1, c7 in zip(m1["centroids"], m7["centroids"]):
        assert c7 == pytest.approx(c1, rel=1e-9)


def test_recovers_blob_structure_and_assignment(spark):
    rows = _blobs()
    df = _df(spark, rows)
    model = kmeans(df, k=3, iters=10)
    assigned = assign_clusters(df, model["centroids"]).collect()
    # every true blob maps to exactly one learned cluster, bijectively
    blob_to_cluster = {}
    for r in assigned:
        blob_to_cluster.setdefault(r["blob"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in blob_to_cluster.values())
    assert len({next(iter(v)) for v in blob_to_cluster.values()}) == 3


def test_empty_clusters_keep_centroids_and_early_stop(spark):
    rows = [(i, 0, [float(i % 2)] * DIM) for i in range(10)]
    df = _df(spark, rows)
    model = kmeans(df, k=5, iters=8)  # only 2 distinct points
    assert model["k"] == 5
    assert model["iterations"] < 8  # converges and stops early
    # SSE reaches 0: the two point-clusters are exactly recovered
    assert model["inertia"][-1] == pytest.approx(0.0, abs=1e-12)


def test_normalize_unit_centroids(spark):
    import numpy as np

    model = kmeans(_df(spark, _blobs()), k=3, iters=4, normalize=True)
    for c in model["centroids"]:
        assert np.linalg.norm(c) == pytest.approx(1.0, rel=1e-9)


def test_null_vectors_excluded_and_assigned_null(spark):
    rows = _blobs(n_per=10)
    df = _df(spark, rows).unionByName(
        _df(spark, []).sparkSession.createDataFrame(
            [(999, 0, None)], "vec_id long, blob int, embedding array<double>"
        )
    )
    model = kmeans(df, k=3, iters=3)
    ref_model = kmeans(_df(spark, rows), k=3, iters=3)
    for a, b in zip(model["centroids"], ref_model["centroids"]):
        assert a == pytest.approx(b, rel=1e-9)
    got = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(df, model["centroids"]).collect()}
    assert got[999] is None


def test_full_corpus_centroids_feed_ivf(spark):
    """The integration: clustering.kmeans(normalize=True) centroids
    drive ann_ivf_topk; at full probe the result equals brute force."""
    from pyspark.sql import functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    model = kmeans(emb, k=8, iters=5, normalize=True)
    pred = F.col("vec_id") < 3
    ivf = ann_ivf_topk(
        emb, pred, k=5, n_probe=8, centroids=model["centroids"]
    )
    brute = cosine_topk(emb, pred, k=5)
    got = sorted(
        (r["query_id"], r["rk"], r["vec_id"]) for r in ivf.collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["vec_id"]) for r in brute.collect()
    )
    assert got == want


def test_assign_clusters_zero_norm_guarded(spark):
    """ADVICE r11: an all-zero embedding or centroid must not divide
    by zero — sim_col stays finite (0.0 against any centroid) and the
    assignment itself is unaffected."""
    import math

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    cents = [[0.0, 0.0], [1.0, 0.0]]
    for normalize in (False, True):
        got = {
            r["vec_id"]: r
            for r in assign_clusters(
                df, cents, normalize=normalize, sim_col="cos"
            ).collect()
        }
        for r in got.values():
            assert r["cluster"] is not None
            assert r["cos"] is not None and not math.isnan(r["cos"])
        assert got[1]["cos"] == 0.0  # zero vector: cosine defined as 0
        assert got[2]["cluster"] == 1 and got[2]["cos"] == 1.0
