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
