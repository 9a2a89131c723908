"""Distributed logistic-regression quality classifier.

The model-based complement to the lexical (``text.py``) and
distributional (``lm.py``) quality signals: train a linear classifier
on per-document features (the fastText-quality-filter pattern — label
a seed set "reference vs garbage", train, score the whole corpus,
gate on the probability). The reference repo has no model surface;
this completes the north-star quality-filtering triad.

Training is BATCH GRADIENT DESCENT AS AGGREGATION — the same
driver-coordinated iterative-aggregate shape as BPE training
(``bpe.py``) and Lloyd's k-means:

* the model (a handful of floats) is DRIVER state, embedded into the
  next iteration's expressions as literals;
* one iteration = ONE map-side-combinable aggregate job: per-row
  ``err = sigmoid(w·x + b) - y`` and per-feature ``sum(err · x_j)``
  — pure built-in expressions inside whole-stage codegen, no UDF, no
  per-row Python;
* the 1-row gradient collect per iteration is bounded by construction
  (p+2 doubles), exactly like the BPE merge-rule argmax.

At 100 TB each epoch is one full-scan aggregate — the standard cost of
batch GD (Spark MLlib's ``LogisticRegression`` pays the same per
tree-aggregate iteration; this implementation keeps the entire hot
path in codegen and the model inspectable). Features are standardized
(one extra aggregate up front) so a single learning rate works across
scales; ``sigmoid`` input is clamped to ±30 to keep ``exp`` finite.

Determinism note: gradient sums are IEEE double sums, so the last few
ulps depend on partitioning (unlike the repo's exact decimal money
sums — gradients live on no fixed grid). Tests therefore pin equality
with a sequential numpy reference to 1e-6 relative tolerance and pin
PREDICTIONS (the decision surface) exactly on separable data.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sigmoid(z: Column) -> Column:
    # least/greatest SKIP nulls (they're not null-propagating like
    # arithmetic), so clamp only non-null z — a NULL feature must score
    # NULL, not sigmoid(±30)
    zc = F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0))
    return F.when(
        z.isNotNull(), F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))
    )


def _z(model: dict, feature_cols: list[str]) -> Column:
    """w·x + b with standardization folded in, as one expression."""
    z: Column = F.lit(float(model["bias"]))
    for j, c in enumerate(feature_cols):
        x = (F.col(c).cast("double") - F.lit(model["means"][j])) / F.lit(
            model["stds"][j]
        )
        z = z + F.lit(float(model["weights"][j])) * x
    return z


def train_logreg(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 100,
    lr: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Train by batch gradient descent; returns the model dict
    ``{weights, bias, means, stds, feature_cols, n}`` (weights are in
    STANDARDIZED feature space; :func:`apply_logreg` folds the
    standardization back in). NULL labels or features are excluded
    from training (they cannot contribute a gradient); ``l2`` adds
    ridge shrinkage on the weights (never the bias)."""
    cond = F.col(label_col).isNotNull()
    for c in feature_cols:
        cond = cond & F.col(c).isNotNull()
    d = df.filter(cond)
    # one standardization aggregate; degenerate (constant) features get
    # std 1 so they contribute a zero standardized value, not a NaN
    stat_aggs = []
    for c in feature_cols:
        x = F.col(c).cast("double")
        stat_aggs += [F.avg(x).alias(f"_m_{c}"), F.stddev_pop(x).alias(f"_s_{c}")]
    stats = d.agg(F.count("*").alias("_n"), *stat_aggs).collect()[0]
    n = stats["_n"]
    if n == 0:
        raise ValueError("train_logreg: no rows with non-null features/label")
    means = [float(stats[f"_m_{c}"]) for c in feature_cols]
    stds = [
        float(s) if (s := stats[f"_s_{c}"]) and s > 0.0 else 1.0
        for c in feature_cols
    ]

    model = {
        "weights": [0.0] * len(feature_cols),
        "bias": 0.0,
        "means": means,
        "stds": stds,
        "feature_cols": list(feature_cols),
        "n": n,
    }
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        err = _sigmoid(_z(model, feature_cols)) - y
        aggs = [F.sum(err).alias("_gb")]
        for j, c in enumerate(feature_cols):
            x = (F.col(c).cast("double") - F.lit(model["means"][j])) / F.lit(
                model["stds"][j]
            )
            aggs.append(F.sum(err * x).alias(f"_g{j}"))
        g = d.agg(*aggs).collect()[0]  # bounded: one row of p+1 doubles
        model["bias"] -= lr * g["_gb"] / n
        model["weights"] = [
            w - lr * (g[f"_g{j}"] / n + l2 * w)
            for j, w in enumerate(model["weights"])
        ]
    return model


def apply_logreg(
    df: DataFrame,
    model: dict,
    out_col: str = "quality_score",
    threshold: float | None = None,
) -> DataFrame:
    """Score rows with a trained model: ``out_col`` is the probability
    of the positive class (NULL when any feature is NULL); with
    ``threshold`` an additional ``{out_col}_pass`` 0/1 column gates on
    it — the corpus-filtering mode."""
    score = _sigmoid(_z(model, model["feature_cols"]))
    out = df.withColumn(out_col, score)
    if threshold is not None:
        out = out.withColumn(
            f"{out_col}_pass",
            (F.col(out_col) >= F.lit(threshold)).cast("int"),
        )
    return out
