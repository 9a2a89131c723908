"""Connected-components unit tests: chain, cycle, singleton."""

from __future__ import annotations

from pyspark.sql import Row

from real_time_video_streaming_analytics_lakehouse_spark.operators.graph import (
    connected_components,
)


def test_connected_components_chain_cycle_singleton(spark):
    # chain 1-2-3, cycle 4-5-6-4, singleton 7
    edges = spark.createDataFrame(
        [
            Row(id_a=1, id_b=2),
            Row(id_a=2, id_b=3),
            Row(id_a=4, id_b=5),
            Row(id_a=5, id_b=6),
            Row(id_a=6, id_b=4),
        ]
    )
    nodes = spark.createDataFrame([Row(id=i) for i in range(1, 8)])
    out = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges, nodes).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}
