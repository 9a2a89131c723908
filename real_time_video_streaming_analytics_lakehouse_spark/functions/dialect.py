"""Scalar-function helpers, including the Snowflake-dialect mappings the
reference relies on (SURVEY.md §2.7 F11-F12; reference
``spark-jobs/snowflake_pipeline.py:305-345``,
``sql-scripts/snowflake/analytics_views.sql``).

All helpers return plain Column expressions — JVM-side, codegen-friendly,
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_name(col: Column | str) -> Column:
    """Snowflake ``MONTHNAME`` → full month name ('January')."""
    return F.date_format(col, "MMMM")


def day_name(col: Column | str) -> Column:
    """Snowflake ``DAYNAME`` → full day name ('Monday')."""
    return F.date_format(col, "EEEE")


def time_key(col: Column | str) -> Column:
    """Star-schema surrogate date key ``y*10000 + m*100 + d``
    (reference ``snowflake_pipeline.py:319``)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch as BIGINT, timezone-stable.

    TIMESTAMP_NTZ columns are interpreted as UTC wall clock (the session
    timezone is pinned to UTC by :mod:`..session`), matching DuckDB's
    timezone-naive ``epoch_us``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def money_sum(col: Column, scale: int) -> Column:
    """Order-independent SUM for measures on a fixed decimal grid.

    Each addend is cast to its exact decimal grid (2dp money, 4dp
    price*(1-disc), 6dp *(1+tax)); the SUM then runs in decimal —
    int128-backed and exact in both Spark and DuckDB, so the total is
    identical under ANY partitioning, thread count, or engine version —
    and only the final total converts back to double (a deterministic
    IEEE operation on identical inputs). Plain double sums rounded
    after the fact are NOT order-independent once ``n * Σ|x| * ε``
    approaches the rounding grid (caught live by
    ``tools/check_correctness.py --perturb`` on ``pricing_summary``:
    ~6e4 addends of ~1e5 magnitude rounded at 6dp flip bits between
    partitionings). Cost: decimal partial aggregates instead of double
    — still map-side combinable, no extra shuffle.

    DuckDB oracle mirror: ``CAST(SUM(CAST(x AS DECIMAL(30, scale))) AS
    DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


def floor_div(col: Column, divisor: int) -> Column:
    """Exact integer floor-division for BIGINT columns.

    Pure integer arithmetic — double division then truncation is
    off-by-±1 once values exceed 2^53 (epoch *nanoseconds* already do),
    and truncates toward zero for negatives. ``col - pmod`` snaps to the
    largest multiple ≤ col (true floor even for negative inputs), then
    integral ``div`` is exact at any magnitude.
    """
    d = F.lit(divisor)
    return F.call_function("div", col - F.pmod(col, d), d)


def window_start_sec(ts: Column | str, width_sec: int) -> Column:
    """Tumbling-window start in epoch seconds.

    Batch-side equivalent of ``F.window(ts, f"{width_sec} seconds")
    .start`` — emitted as a BIGINT so Spark and the DuckDB oracle agree
    bit-for-bit (no timestamp round-tripping).
    """
    return floor_div(epoch_us(ts), width_sec * 1_000_000) * width_sec
