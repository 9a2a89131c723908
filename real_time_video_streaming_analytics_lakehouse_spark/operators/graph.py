"""Iterative graph operators over DataFrames.

:func:`connected_components` — min-label propagation until fixpoint.
Used to turn near-duplicate PAIRS (MinHash/SimHash/cosine output) into
duplicate CLUSTERS with one canonical id per cluster — the step that
makes pair-wise dedup actionable in a training-data pipeline ("keep the
canonical doc, drop the rest").

This is the engine's one genuinely iterative algorithm: a driver loop
over DataFrame joins with a convergence check. Scale notes:
  * each iteration is one join + one aggregate on (node, label) — the
    classic large-scale CC formulation; iterations needed ≈ graph
    diameter (small for near-dup clusters, bounded by ``max_iter``).
  * intermediate label frames are localCheckpointed every few rounds to
    cut the growing lineage (otherwise plan size, not data, becomes
    the bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    node_col: str = "id",
    max_iter: int = 50,
    strict: bool = True,
) -> DataFrame:
    """Assign each node min-reachable-id as its ``cluster_id``.

    ``edges`` is undirected input (one row per pair); isolated nodes in
    ``nodes`` become singleton clusters of themselves.

    If the loop exhausts ``max_iter`` while labels are still changing,
    the result is NOT a full closure (graphs of diameter > max_iter).
    ``strict=True`` (default) raises rather than silently returning
    wrong cluster ids; ``strict=False`` logs a warning and returns the
    partial labels.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # Materialize the edge list ONCE: without this, the (possibly very
    # expensive) upstream pair computation re-executes in every
    # iteration AND in every convergence check — measured 43 s → 5 s at
    # sf0.1 for the cosine-pair graph.
    sym = sym.distinct().localCheckpoint(eager=True)
    # Propagate over the EDGE SUBGRAPH only: a node with no edges can
    # never change its label, so it never needs to enter the iteration.
    # In a near-dup corpus the components are typically a tiny fraction
    # of the nodes — at scale this turns per-round shuffles of the
    # whole corpus into shuffles of just the duplicate clusters;
    # isolated nodes re-join as singleton clusters after the fixpoint.
    all_nodes = nodes.select(F.col(node_col).alias("u"))
    edge_nodes = all_nodes.join(sym.select("u"), "u", "left_semi")
    labels = edge_nodes.select(
        "u", F.col("u").alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("u", "v2"), sym.v == F.col("v2"))
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # One materialization per iteration carrying a `changed` flag:
        # the convergence read then scans the checkpointed result
        # instead of re-running the join.
        # (Pointer-halving via a label(label(u)) self-join was tried and
        # rejected: it barely cut iterations on near-dup chain graphs
        # and the iterated self-join degraded super-linearly per round
        # in Spark 4.1 — 0.4s → 39s by iteration 12 at sf0.1.)
        new_labels = (
            labels.join(neighbor_min, "u", "left_outer")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                (
                    F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")
                ).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").limit(1).count()
        labels = new_labels.select("u", F.col("new_label").alias("label"))
        if changed == 0:
            break
    else:
        msg = (
            f"connected_components: labels still changing after "
            f"{max_iter} iterations — cluster ids may be incomplete; "
            f"raise max_iter (label propagation needs ~graph diameter "
            f"rounds)"
        )
        if strict:
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    singletons = all_nodes.join(sym.select("u"), "u", "left_anti").select(
        "u", F.col("u").alias("label")
    )
    return labels.unionByName(singletons).select(
        F.col("u").alias(node_col), F.col("label").alias("cluster_id")
    )
