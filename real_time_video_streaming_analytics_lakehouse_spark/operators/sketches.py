"""Mergeable cardinality sketches (Datasketches HLL, Spark 4 built-ins).

Exact ``count_distinct`` is the one aggregate incremental view
maintenance cannot combine (``incremental.py``: sum+sum and max(max)
decompose; distinct-over-history does not — every distinct value of a
key would have to ship to one reducer, and yesterday's count can't be
added to today's). The standard at-scale answer is to PERSIST THE
SKETCH, not the number: an HLL sketch is a fixed-size (~2^lg_k bytes)
binary summary whose union is register-wise max — associative,
commutative, idempotent — so

* per-partition/day sketches build in one map-side-combinable pass,
* any rollup (week over days, global over shards) is a tiny union over
  stored sketches instead of a rescan of raw history,
* re-delivering a batch is harmless (idempotent union), which makes
  sketch columns safe in exactly-once streaming sinks.

All three functions are thin compositions of the JVM-side built-ins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_union`` /
``hll_sketch_estimate``) — no UDFs. Estimates carry the usual HLL
error (~1.04/√2^lg_k ≈ 1.6% at the default lg_k=12); the estimate of
a union of sketches is IDENTICAL to the estimate of one sketch over
the concatenated input (register-wise max), pinned by test.

The reference's closest surface is Snowflake ``APPROX_COUNT_DISTINCT``
inside its views (sql-scripts/analytics_views.sql); persisting
mergeable sketches extends that to incremental maintenance, which the
reference recomputes from raw history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    sketch_col: str = "sketch",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One HLL sketch per key group over ``value_col`` — the build
    pass. Map-side combinable like any hash aggregate; the shuffled
    payload is one ~2^lg_k-byte binary per (key, input partition)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col)
    )


def rollup_sketches(
    df: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
    estimate_col: str = "distinct_est",
    keep_sketch: bool = False,
) -> DataFrame:
    """Union stored sketches up to coarser keys (days → week, shards →
    global) and estimate — the read path that replaces a raw-history
    rescan. With ``keep_sketch`` the merged binary is kept so the
    rollup itself remains further-mergeable."""
    merged = F.hll_union_agg(sketch_col)
    aggs = [F.hll_sketch_estimate(merged).alias(estimate_col)]
    if keep_sketch:
        aggs.insert(0, merged.alias(sketch_col))
    return df.groupBy(*keys).agg(*aggs)


def combine_sketch_tables(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Incremental maintenance step: merge a stored per-key sketch
    table with the sketches of newly arrived data — one full-outer key
    join, union where both sides exist, pass-through otherwise. The
    result is row-identical (in estimate) to rebuilding from all raw
    data, at the cost of scanning only the delta."""
    e = existing.select(*keys, F.col(sketch_col).alias("_old"))
    d = delta.select(*keys, F.col(sketch_col).alias("_new"))
    both = F.hll_union("_old", "_new")
    return (
        e.join(d, keys, "full_outer")
        .withColumn(
            sketch_col,
            F.when(F.col("_old").isNull(), F.col("_new"))
            .when(F.col("_new").isNull(), F.col("_old"))
            .otherwise(both),
        )
        .drop("_old", "_new")
    )


# --- count-min sketch (frequency / heavy-hitter counterpart) --------------

def _cms_bucket(value_col: str, row: int, width: int, seed: int):
    # independent row hash via per-row seed; pmod keeps buckets >= 0
    return F.pmod(F.xxhash64(F.lit(seed + row), value_col), F.lit(width))


def cms_build(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    depth: int = 5,
    width: int = 2048,
    seed: int = 0x5EED,
) -> DataFrame:
    """Count-min sketch per key group over ``value_col``, as a TABLE:
    one row per (keys, hash row ``_d``, bucket ``_b``) with the exact
    collision count ``cnt`` — ≤ ``depth×width`` rows per group however
    many distinct values the group holds, which is the entire point
    (a frequency table over a high-cardinality column at 100 TB cannot
    be kept exact; ~10k sketch rows per group can).

    Tabular instead of an opaque binary deliberately: the build is one
    explode + one map-side-combinable count aggregate (JVM built-ins,
    no UDF), merging is ``groupBy.sum`` (exact integer addition — CMS
    is linear, so a merged table is ROW-IDENTICAL to rebuilding over
    the concatenated input, pinned by test), and estimates are plain
    equi-joins — every piece stays inside Catalyst, unlike Spark's
    ``count_min_sketch`` binary which has no union builtin at all.

    Standard CMS guarantees apply: estimates never undercount, and
    overcount by more than ``e·N/width`` with probability at most
    ``e^-depth`` (N = group row count).
    """
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(d).alias("_d"),
                _cms_bucket(value_col, d, width, seed).alias("_b"),
            )
            for d in range(depth)
        ])
    ).alias("_rb")
    return (
        df.select(*keys, rows)
        .select(*keys, "_rb._d", "_rb._b")
        .groupBy(*keys, "_d", "_b")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two sketch tables built with the SAME (depth, width,
    seed): union + sum — associative and commutative; counter addition
    makes the result exactly the sketch of the concatenated inputs."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "_d", "_b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    keys: list[str],
    value_col: str,
    depth: int = 5,
    width: int = 2048,
    seed: int = 0x5EED,
    estimate_col: str = "freq_est",
) -> DataFrame:
    """Frequency estimate for each (keys, value) row of ``items``:
    min over the ``depth`` matched buckets, 0 when a bucket row is
    absent (absent bucket = nothing ever hashed there). The sketch side
    is ≤ depth×width rows per group — broadcastable; the probe is
    ``depth`` equi-join rows per item, no wide stage beyond the final
    per-item min."""
    probes = items.select(
        *keys,
        F.col(value_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("_d"),
                    _cms_bucket(value_col, d, width, seed).alias("_b"),
                )
                for d in range(depth)
            ])
        ).alias("_rb"),
    ).select(*keys, value_col, "_rb._d", "_rb._b")
    return (
        probes.join(sketch, [*keys, "_d", "_b"], "left_outer")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*keys, value_col)
        .agg(F.min("cnt").alias(estimate_col))
    )
