"""Physical-plan regression guards: the optimizations the engine relies
on at scale must survive refactors — filter pushdown into the parquet
scan, broadcast of bounded dims, and no forced broadcast of sides that
scale with data volume."""

from __future__ import annotations

from real_time_video_streaming_analytics_lakehouse_spark.plans import CATALOG

from .conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = CATALOG[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().optimizedPlan().toString() + "\n" + (
        df._jdf.queryExecution().executedPlan().toString()
    )


def test_pricing_summary_pushes_filter_to_scan(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan


def test_top_revenue_orders_pushes_all_three_filters(spark):
    plan = _plan(spark, "top_revenue_orders")
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan


def test_region_rollup_broadcasts_bounded_dims(spark):
    plan = _plan(spark, "region_revenue_rollup")
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_unused_columns(spark):
    plan = _plan(spark, "latest_event_per_user")
    # props is never referenced → must not be read from parquet
    assert "props" not in plan.split("ReadSchema")[-1]
