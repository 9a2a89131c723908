"""Deduplication operators.

* :func:`dedup_keep_latest` — the reference's keep-latest-record dedup
  (``spark-jobs/etl_framework.py:251-277``), expressed as a
  ``row_number`` window so "latest" is well-defined under ties.
* :func:`exact_dedup_groups` — exact content dedup via hash-groupBy.
* :func:`minhash_lsh_candidates` — MinHash + LSH banding near-duplicate
  candidate generation, the 100 TB-scale path where exact pairwise
  Jaccard is infeasible.

Scale notes:
  * keep-latest is a single hash-partition shuffle on the key columns;
    skewed keys are handled by AQE skew-join/partition splitting.
  * MinHash signatures are computed with ONE groupBy over exploded
    shingles using 64 independent ``xxhash64`` aggregates (JVM-side,
    no Python). LSH banding turns the O(n²) pair search into a
    shuffle-on-bucket join; at 100 TB the band-bucket groupBy is the
    only wide stage and buckets are tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_latest(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep exactly one (the latest) row per key.

    Ordering is ``order_col DESC`` with explicit tie-breaks so results
    are deterministic (the reference's version, etl_framework.py:259-264,
    is nondeterministic under equal timestamps).
    """
    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup_groups(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact-duplicate groups by content hash.

    Returns one row per distinct content value: ``(text_hash, dup_count,
    canonical_<id>)`` where the canonical id is the smallest id in the
    group. A single map-side-combinable groupBy — linear at any scale.
    """
    return df.groupBy(F.md5(F.col(content_col)).alias("text_hash")).agg(
        F.count("*").alias("dup_count"),
        F.min(id_col).alias(f"canonical_{id_col}"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash signatures + LSH banding.

    Pipeline (all built-in functions, fully distributed):
      1. word shingles per doc (``split`` + ``transform`` over a
         ``sequence`` of offsets),
      2. explode → one row per (doc, distinct shingle),
      3. ONE groupBy(doc) computing the 64-slot signature as
         ``min(xxhash64(seed_i, shingle))`` per slot,
      4. slice the signature into ``bands`` bands, hash each band,
         explode → groupBy (band, band_hash) → candidate buckets,
      5. pair docs within a bucket (self-join on bucket), dedupe pairs,
      6. estimate Jaccard as the fraction of matching signature slots.

    Returns ``(id_a, id_b, est_jaccard)`` with ``id_a < id_b``.
    """
    rows_per_band = num_perm // bands
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_shingles = F.greatest(F.size(words) - (shingle_size - 1), F.lit(1))
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_shingles - 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, (i + k + 1).cast("int")) for k in range(shingle_size)]
            ),
        )
    )
    exploded = df.select(
        F.col(id_col), F.explode(shingle_arr).alias("shingle")
    )
    sig = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )
    sig = sig.withColumn("sig", F.array(*[f"h{i}" for i in range(num_perm)])).select(
        id_col, "sig"
    )
    banded = sig.withColumn(
        "band", F.explode(F.sequence(F.lit(0), F.lit(bands - 1)))
    ).withColumn(
        "band_hash",
        F.xxhash64("band", F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band)),
    )
    left = banded.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "band_hash"
    )
    right = banded.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "band_hash"
    )
    pairs = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        / F.lit(float(num_perm)),
        6,
    )
    return (
        pairs.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )
