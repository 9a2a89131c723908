"""Deterministic sampling & corpus-mixing operators.

A 100 TB training-data pipeline samples constantly — to rebalance
languages/domains, to carve eval splits, to downweight boilerplate
sources — and the sampling must be REPRODUCIBLE (same corpus + same
seed ⇒ the same rows, on any cluster, at any partitioning) and
DISTRIBUTED (no global randomness, no driver state). Spark's
``df.sample``/``sampleBy`` are per-partition pseudo-random and change
membership whenever partitioning changes, which silently breaks
train/eval splits across reruns. These operators instead derive each
row's fate from a **content hash of its key**:

* :func:`sample_key` — uniform per-row draw in hex: the first 8 hex
  chars of ``md5(seed | key)``. Lexicographic comparison of
  fixed-width lowercase hex equals numeric comparison of the 32-bit
  value, so a fraction-``f`` filter is ``sample_key < format(f·2³²,
  '08x')`` — one deterministic string compare per row, no UDF, and the
  same expression is portable SQL (any engine with ``md5``).
* :func:`deterministic_sample` — Bernoulli(fraction) by key hash.
* :func:`stratified_sample` — per-stratum Bernoulli fractions
  (language/domain rebalancing; the deterministic ``sampleBy``).
* :func:`quota_sample` — EXACT per-stratum row quotas via
  ``row_number`` over the hash ordering (a deterministic reservoir:
  the quota-k rows are the k smallest hashes, so membership is stable
  under any partitioning and monotone under corpus growth only at the
  hash boundary).
* :func:`split_corpus` — disjoint, exhaustive train/val/test splits
  (consecutive hash intervals), leak-free by construction and stable
  across reruns.
* :func:`mix_corpora` — weighted multi-source mixture: per-source
  Bernoulli retention + provenance column + union, the standard
  training-mixture construction.

Scale notes: Bernoulli arms are map-only (a filter on a per-row
expression — no shuffle, predicate-pushdown friendly). ``quota_sample``
shuffles once on the stratum key for its window; at 100 TB prefer
modest per-stratum quotas (the window sort is per-stratum, and AQE
splits skewed strata). Reference has no sampling surface; this is part
of the north-star training-pipeline additions (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: separator between seed and key inside the md5 input; also joins
#: multi-column keys. Chosen printable and vanishingly rare in ids.
_SEP = "|"


def _hex_threshold(fraction: float) -> str:
    """``fraction`` of the 32-bit hash space as 8 lowercase hex chars.

    Fraction 1.0 returns ``"g"`` — lexicographically above every hex
    string — so a full-fraction filter keeps ALL rows (a ``<
    "ffffffff"`` comparison would drop the ~1-in-4-billion keys hashing
    to the top value)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * (1 << 32)), "08x")


def sample_key(key_cols: list[str | Column], seed: str = "") -> Column:
    """Deterministic uniform draw for a row: first 8 hex chars of
    ``md5(seed | key₁ | key₂ | …)`` (lowercase, fixed width — string
    order ≡ numeric order on the 32-bit value).

    Each key component is tagged with a one-char null marker —
    ``'n'`` for NULL, ``'v' + CAST(c AS STRING)`` otherwise — so NULL
    never collides with ANY value (including a genuine NUL byte or a
    value casting to one; a bare ``coalesce(c, sentinel)`` encoding
    collides with rows whose value IS the sentinel). It also keeps
    ``('x', NULL)`` ≠ ``(NULL, 'x')``: ``concat_ws`` alone would drop
    NULL elements AND their separator. SQL mirror per component:
    ``CASE WHEN c IS NULL THEN 'n' ELSE 'v' || CAST(c AS VARCHAR) END``.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    parts: list[Column] = [F.lit(seed)]
    for c in cols:
        parts.append(
            F.when(c.isNull(), F.lit("n"))
            .otherwise(F.concat(F.lit("v"), c.cast("string")))
        )
    return F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 8)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    seed: str = "",
) -> DataFrame:
    """Keep each row iff its key hashes below ``fraction`` of the hash
    space — Bernoulli(fraction) with reproducible membership: the kept
    set depends only on (key values, seed), never on partitioning, row
    order, or cluster size. Rows sharing a key share a fate (useful:
    key on ``user_id`` to sample whole users without leakage)."""
    return df.filter(
        sample_key(key_cols, seed) < F.lit(_hex_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sampling — the deterministic ``sampleBy``.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction`` of their rows. Implemented as one
    when-chain selecting the stratum's hex threshold, compared against
    the row's hash — map-only, no shuffle, no UDF.

    ``key_cols`` is REQUIRED and must vary within each stratum (a
    row-id, not the stratum label): hashing the stratum value itself
    would give every row in the stratum the same draw, silently
    keeping 100% or 0% of it depending on the seed instead of the
    requested fraction.
    """
    keys = key_cols
    if not keys or list(keys) == [strata_col]:
        raise ValueError(
            "stratified_sample key_cols must identify rows within a "
            f"stratum; hashing the stratum column {strata_col!r} alone "
            "makes sampling all-or-nothing per stratum"
        )
    thr: Column = F.lit(_hex_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thr = (
            F.when(F.col(strata_col) == value, F.lit(_hex_threshold(fraction)))
            .otherwise(thr)
        )
    return df.filter(sample_key(keys, seed) < thr)


def quota_sample(
    df: DataFrame,
    strata_col: str,
    quota: int | dict[str, int],
    key_cols: list[str],
    seed: str = "",
    rank_col: str | None = None,
) -> DataFrame:
    """EXACTLY ``quota`` rows per stratum (fewer iff the stratum is
    smaller): rank the stratum's rows by (hash, key) and keep the first
    ``quota`` — a deterministic distributed reservoir. ``quota`` may be
    a single int or a per-stratum dict (strata absent from the dict are
    dropped). ``key_cols`` must uniquely identify rows within a stratum
    (they tie-break equal hashes, making the rank total).

    Pass ``rank_col`` to keep the 1-based sample rank in the output —
    e.g. for downstream sub-sampling by prefix (the first k ≤ quota
    ranks are exactly the quota-k sample of the same seed).
    """
    order = [sample_key(key_cols, seed)] + [F.col(c) for c in key_cols]
    w = Window.partitionBy(strata_col).orderBy(*order)
    rn = "_sample_rn" if rank_col is None else rank_col
    ranked = df.withColumn(rn, F.row_number().over(w))
    if isinstance(quota, int):
        limit: Column = F.lit(quota)
    else:
        limit = F.lit(None).cast("int")
        for value, q in sorted(quota.items()):
            limit = F.when(F.col(strata_col) == value, F.lit(q)).otherwise(
                limit
            )
    kept = ranked.filter(F.col(rn) <= limit)
    return kept.drop(rn) if rank_col is None else kept


def split_corpus(
    df: DataFrame,
    key_cols: list[str],
    weights: dict[str, float],
    seed: str = "",
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive train/val/test splits: ``weights`` maps
    split name → fraction (must sum to 1 within float tolerance). Each
    row lands in exactly one split — the hash space is carved into
    consecutive half-open intervals, one per split in sorted-name
    order — so no row leaks across splits, reruns reproduce the same
    assignment, and (because the draw is keyed) rows sharing a key
    (e.g. all of a user's events) land in the same split. Map-only:
    each returned frame is a filter over ``df``, no shuffle."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    key = sample_key(key_cols, seed)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    names = sorted(weights)
    for i, name in enumerate(names):
        hi = lo + weights[name]
        lower = F.lit(_hex_threshold(lo))
        # the last interval is closed above via the 1.0 sentinel so
        # float rounding can't orphan the top of the hash space
        upper = F.lit(_hex_threshold(1.0 if i == len(names) - 1 else hi))
        out[name] = df.filter((key >= lower) & (key < upper))
        lo = hi
    return out


def mix_corpora(
    parts: dict[str, tuple[DataFrame, float]],
    key_cols: list[str],
    source_col: str = "mix_source",
    seed: str = "",
) -> DataFrame:
    """Weighted training mixture: for each named source, keep a
    deterministic Bernoulli(weight) sample (weight ≤ 1) tagged with a
    provenance column, and union the survivors. All frames must share
    a schema (``unionByName``). Each source uses a distinct derived
    seed so e.g. identical ids in two sources draw independently."""
    out: DataFrame | None = None
    for name, (frame, weight) in sorted(parts.items()):
        kept = deterministic_sample(
            frame, key_cols, weight, seed=f"{seed}{_SEP}{name}"
        ).withColumn(source_col, F.lit(name))
        out = kept if out is None else out.unionByName(kept)
    if out is None:
        raise ValueError("mix_corpora needs at least one source")
    return out
