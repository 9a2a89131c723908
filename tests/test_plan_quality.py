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


def test_top_revenue_orders_uses_take_ordered_not_global_window(spark):
    """Round-9 audit: the top-10 must come from a parallel
    TakeOrdered (per-partition top-k + merge), never a global rank
    window — that would funnel every order's revenue through ONE
    partition's sort at scale."""
    plan = _plan(spark, "top_revenue_orders")
    assert "TakeOrdered" in plan


def test_region_rollup_broadcasts_bounded_dims(spark):
    plan = _plan(spark, "region_revenue_rollup")
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_unused_columns(spark):
    plan = _plan(spark, "latest_event_per_user")
    # props is never referenced → must not be read from parquet
    assert "props" not in plan.split("ReadSchema")[-1]


def test_no_unbounded_driver_collect_at_construction(spark):
    """Guard against driver-side corpus materialization (round-1's
    cosine_pairs collected the whole embedding table): constructing ANY
    catalog query must not call DataFrame.collect()/toPandas(), except
    the documented BOUNDED reads (each with its bound pinned below).

    Round 12: the patch target is the CLASSIC DataFrame class —
    Spark 4 split pyspark.sql.DataFrame into an abstract base and
    pyspark.sql.classic.dataframe.DataFrame, whose own collect/
    toPandas overrides made a base-class monkeypatch a no-op, i.e.
    this gate had been silently blind. Re-pointed and the allowance
    table rebuilt from the real measured reads."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from real_time_video_streaming_analytics_lakehouse_spark.operators.graph import (
        DRIVER_CC_MAX_EDGES,
    )

    # per-CALL row ceilings for the sanctioned bounded reads; every
    # entry names its source
    ALLOWED_BOUNDED = {
        # 1-row watermark read
        "merge_upsert_events": 1,
        # IVF/PQ codebook sample: limit(sample_size) = 4096
        "ann_topk": 4096,
        # k-means: k seed rows, then k*(d+2) partial-aggregate rows
        # per iteration (k=8, d=64 -> 528)
        "embedding_centroids": 8 * (64 + 2),
        # connected components: 1-row convergence signatures + the
        # adaptive union-find's edge read, bounded by construction
        # (embedding_dedup_clusters left this table in round 13: its
        # arms use cc_strategy="bounded_lazy", zero construction reads)
        "embedding_dedup_clusters_lsh": DRIVER_CC_MAX_EDGES,
        # interval_join's data-derived bin width: one 1-row
        # percentile_approx aggregate
        "customer_order_profile": 1,
    }

    real_collect = CDF.collect
    real_topandas = CDF.toPandas
    calls: list[int] = []

    def counting_collect(self):
        rows = real_collect(self)
        calls.append(len(rows))
        return rows

    def counting_topandas(self):
        pdf = real_topandas(self)
        calls.append(len(pdf))
        return pdf

    CDF.collect = counting_collect
    CDF.toPandas = counting_topandas
    try:
        saw_bounded = False
        for name, spec in sorted(CATALOG.items()):
            calls.clear()
            spec.fn(spark, SF_DIR)  # construction only — no action here
            if name in ALLOWED_BOUNDED:
                saw_bounded = saw_bounded or bool(calls)
                assert all(n <= ALLOWED_BOUNDED[name] for n in calls), (
                    name, calls)
            else:
                assert not calls, (
                    f"{name} collected {calls} rows to the driver during "
                    f"construction — not scale-safe"
                )
        # the patch must actually intercept (the pre-round-12 blindness
        # would make this gate vacuous again without noticing)
        assert saw_bounded, (
            "no construction-time collect was observed at all — the "
            "monkeypatch target has gone stale again"
        )
    finally:
        CDF.collect = real_collect
        CDF.toPandas = real_topandas


def test_purchase_attribution_uses_equi_join_not_nested_loop(spark):
    """The interval join must key on user_id (hash/sort-merge) with the
    time bounds as post-join filters — a BroadcastNestedLoopJoin over
    events x events would be quadratic at scale."""
    plan = _plan(spark, "purchase_attribution")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan  # attribution dedup stays a semi join


def test_folded_queries_avoid_nested_loop_joins(spark):
    """The round-3 folds added joins (buyer stats, dedup groups,
    multimodal frame rollup, star dim): all must stay hash/broadcast
    equi-joins — a BroadcastNestedLoopJoin over a fact table would be
    quadratic at scale."""
    for name in (
        "segment_buyers",
        "star_schema_monthly",
        "device_platform_quality",
        "doc_dedup_fingerprints",
        "multimodal_pipeline",
        "text_quality",
    ):
        assert "BroadcastNestedLoopJoin" not in _plan(spark, name), name


def test_text_quality_single_documents_scan(spark):
    """The round-3 fold scanned documents three times (features, lang
    join, language-ID) and tokenized twice. Round 4 shares ONE scan: the
    feature projection carries lang + the token array and is lazily
    checkpointed, so every consumer reads the checkpoint (ExistingRDD in
    the plan) and the parquet source appears in no other branch."""
    plan = _plan(spark, "text_quality")
    assert "ExistingRDD" in plan
    assert plan.count("documents.parquet") == 0, (
        "a consumer bypassed the shared checkpoint and re-scans documents"
    )


def test_star_schema_broadcasts_generated_dim(spark):
    """The 366-row generated calendar dim must broadcast; the events
    fact side must never be the built side of anything."""
    plan = _plan(spark, "star_schema_monthly")
    assert "BroadcastHashJoin" in plan


def test_daily_user_metrics_single_scan_single_shuffle(spark):
    """The gold rollup is one scan and one shuffle on the grouping key;
    collect_set must not introduce extra exchanges."""
    plan = _plan(spark, "daily_user_metrics")
    executed = plan.split("\n\n")[-1]
    assert executed.count("Exchange") <= 2  # agg shuffle (+AQE read)
    assert "props" not in plan.split("ReadSchema")[-1]  # column pruning


def test_reanchored_vector_queries_avoid_nested_loop_joins(spark):
    """The round-4 re-anchors (LSH clustering at 0.9 with injected
    duplicates; IVF at full probe) must keep every join an equi-join:
    banding joins on (band, code), vector re-attach on id, bucket join
    on bucket — a nested-loop join over the corpus would be quadratic
    at scale. Exception by design: the brute-force arm of ``ann_topk``
    is ONE corpus × bounded-query cross join with the query side
    explicitly broadcast (that IS the scale plan for exact brute-force
    ANN), and the PQ arm's ADC pass has the same justified shape — so
    the fused query allows those two BNLJs, and the IVF arm is checked
    standalone for zero."""
    from pyspark.sql import functions as F

    from real_time_video_streaming_analytics_lakehouse_spark.operators.similarity import (
        ann_ivf_topk,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import (
        load_table,
    )

    assert "BroadcastNestedLoopJoin" not in _plan(
        spark, "embedding_dedup_clusters_lsh"
    )
    # brute arm + the PQ arm's ADC pass: each is ONE corpus ×
    # bounded-broadcast-queries cross join (counted twice — optimized +
    # executed plan text)
    assert _plan(spark, "ann_topk").count("BroadcastNestedLoopJoin") <= 4
    ivf = ann_ivf_topk(
        load_table(spark, SF_DIR, "embeddings"), F.col("vec_id") < 5,
        k=5, n_clusters=16, n_probe=16,
    )
    qe = ivf._jdf.queryExecution()
    ivf_plan = qe.optimizedPlan().toString() + qe.executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in ivf_plan


def test_round5_catalog_changes_avoid_nested_loop_joins(spark):
    """Round-5 entries: the planted-duplicate hash-dedup anchor and the
    chunk→pack rollup join (chunk side × pack side on shard) must stay
    equi-joins; a nested-loop join over candidates or chunks would be
    quadratic at scale."""
    for name in ("hash_dedup_candidates", "chunk_pack_rollup"):
        assert "BroadcastNestedLoopJoin" not in _plan(spark, name), name


def test_top_query_shuffle_exchange_counts_pinned(spark):
    """Round-11 gate (VERDICT r10 #6): per-query SHUFFLE exchange
    ceilings for the most expensive catalog queries. The job-count
    gate (SCALING.json, round 10) catches data-bound driver loops at
    probe time; this catches a silently-added shuffle at AUTHORING
    time — before it costs a bench round. Ceilings are the measured
    counts at the round-11 plans; a refactor that REMOVES a shuffle
    should lower the pin, one that adds a shuffle must justify it
    here. BroadcastExchange is deliberately not counted: broadcasts
    are the cure (a broadcast replacing a shuffle join must not trip
    the gate), and the NLJ/broadcast pins above guard their own
    pathologies."""
    import re

    # Round 12: widened from the 11 most expensive queries to the FULL
    # catalog — every query's measured exchange count at this HEAD is
    # its ceiling, so ANY silently-added shuffle anywhere trips the
    # gate at authoring time (a refactor that removes one should lower
    # the pin). Caveat: localCheckpoint severs the visible plan, so
    # checkpoint-internal stages (e.g. the ngram/LSH pipelines' joins)
    # are pinned by their own job/SCALING gates, not here — this table
    # pins the exchanges of the FINAL returned frame.
    ceilings = {
        "ann_topk": 6,
        "anomaly_1min": 1,
        "chunk_pack_rollup": 4,
        "churn_risk": 1,
        "clean_standardize_customers": 0,
        "content_popularity_10min": 2,
        "content_trends_daily": 2,
        "customer_ltv_segments": 2,
        "customer_order_profile": 3,
        "customers_without_orders": 0,
        "daily_active_users": 2,
        # round 17 (VERDICT r16 #4): 2 -> 1 — the two COUNT(DISTINCT)
        # aggregates became size(collect_set(...)), removing the
        # planner's Expand x3 rewrite and its second exchange
        "daily_user_metrics": 1,
        "device_platform_quality": 2,
        "dim_time_generate": 0,
        # round 16 (optimization): 9 -> 13 — the four extra are the
        # bytes-derived ensure_parallelism round-robin repartitions of
        # the 584 KB documents scan, one per consumer subtree of `d`
        # (per-doc projection, exact-dup groups, winnow, span); the
        # subtrees are identical so AQE collapses them to ONE
        # ReusedExchange at runtime. Measured wall 5.9 -> 3.0 s at
        # sf0.1 (the scan was single-partition and every per-doc
        # expression ran single-task).
        "doc_dedup_fingerprints": 13,
        # round 14: +5 for the BPE arms, all over the BOUNDED
        # every-17th-doc mini-corpus — word-type groupBy, the
        # single-group applyInPandas trainer, the merge-array agg
        # (partial+final) feeding the broadcast encode join
        "doc_token_stats": 6,
        "dq_validation_events": 2,
        "embedding_centroids": 4,
        "embedding_cosine_pairs": 1,
        # round 13: was 2 when localCheckpoints severed the visible
        # plan; cc_strategy="bounded_lazy" removed every checkpoint
        # (zero construction jobs), so the WHOLE pipeline's exchanges
        # are now visible here, repeated per policy/arm branch —
        # ReusedExchange collapses the identical subtrees at runtime
        # (measured task_sec 37.3 -> ~16 s at sf0.1 on the switch)
        "embedding_dedup_clusters": 26,
        "embedding_dedup_clusters_lsh": 0,
        "event_type_rank": 3,
        "executive_kpis": 4,
        "hash_dedup_candidates": 2,
        "latest_event_per_user": 1,
        "merge_upsert_events": 1,
        "multimodal_pipeline": 1,
        # Round 16: the checkpoint moved BELOW the stop-shingle df
        # aggregate + anti join (the explode now runs once and every
        # stage keys on xxhash64 longs — see ngram_jaccard_pairs_grouped),
        # so the df-agg exchange is now VISIBLE in the final plan once
        # per consuming subtree (static count 13). At runtime the
        # identical df-agg subtrees collapse to ONE exchange +
        # ReusedBroadcast (stage-profiled: one 228k-row df-agg stage
        # per execution, same as before the refactor); the per-arm
        # pair/sizes joins are unchanged. The all-pairs scored frame
        # stays un-checkpointed (materializing it measured ~2x wall at
        # the 10x tier).
        "ngram_jaccard_top_pairs": 13,
        "order_priority_profile": 2,
        "part_supp_multikey": 2,
        "part_type_share": 2,
        "party_union": 1,
        "pricing_summary": 1,
        "props_key_distribution": 3,
        "purchase_attribution": 3,
        "region_revenue_rollup": 2,
        "segment_buyers": 2,
        "sessionize_rollup": 2,
        "star_schema_monthly": 1,
        "supplier_nation_revenue": 2,
        # round 13: +1 for the q80_keep quantile-gate arm's per-lang
        # percent_rank window (one exchange on the stratum key — the
        # operator's exact path, stratum-partitioned by design)
        # round 14: +2 for the q80_keep_approx arm — the approx path's
        # per-stratum percentile_approx aggregate (partial+final on the
        # tiny lang-keyed table; the corpus pass itself joins the
        # broadcast thresholds map-only, the 100 TB contract)
        # round 17 (VERDICT r16 #3): 23 -> 17 — the lang-id, tfidf,
        # bm25 and token-mode families now read ONE shared
        # materialized per-(doc, lang, word) count instead of each
        # re-exploding the checkpoint and re-aggregating (task_sec
        # 11.9 -> 4.9 at sf0.1; plans/r17/text_quality_{before,after})
        "text_quality": 17,
        "top_revenue_orders": 1,
        "training_mix_sample": 1,
        "user_activity_5min": 4,
        "user_cohorts": 3,
        "user_event_enrichment": 1,
        "user_segments": 2,
        "user_value_timeline": 3,
        "value_bucket_dropoff": 2,
        "weekly_revenue_growth": 2,
    }
    assert set(ceilings) == set(CATALOG), (
        "pin table out of sync with the catalog"
    )
    # "Exchange " (with trailing space) matches shuffle exchanges
    # (hashpartitioning / SinglePartition / range) but NOT
    # BroadcastExchange; executedPlan is pre-AQE, which is the
    # authoring-time shape this gate pins.
    pat = re.compile(r"\bExchange ")
    for name, ceiling in ceilings.items():
        df = CATALOG[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = len(pat.findall(plan))
        assert shuffles <= ceiling, (
            f"{name}: {shuffles} shuffle exchanges > pinned {ceiling}\n"
            f"{plan}"
        )


def test_embedding_dedup_clusters_constructs_with_zero_jobs(spark):
    """Round 13 (VERDICT r12 #6): the anchor query's arms run their
    union-find lazily executor-side (cc_strategy="bounded_lazy"), so
    CONSTRUCTING the query must launch no Spark job at all — the
    round-12 ThreadPoolExecutor existed only to hide construction-time
    CC actions and is gone."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # warm construct OUTSIDE the probe group: the first read of a
    # parquet table pays a one-task schema-inference job that
    # readers.load_table caches away for every later read
    CATALOG["embedding_dedup_clusters"].fn(spark, SF_DIR)
    # a unique job group isolates this test from the shared session
    sc.setJobGroup("cc-construct-probe", "construction-only probe")
    try:
        CATALOG["embedding_dedup_clusters"].fn(spark, SF_DIR)
        probe_jobs = tracker.getJobIdsForGroup("cc-construct-probe") or []
        assert not probe_jobs, (
            f"constructing embedding_dedup_clusters launched Spark jobs "
            f"{probe_jobs} — a construction-time action crept back in"
        )
    finally:
        sc.setJobGroup("", "")


def test_embedding_dedup_clusters_reuses_shared_exchanges(spark):
    """Round 14 (VERDICT r13 What's-wrong #1): the bounded-lazy CC
    switch removed every localCheckpoint from embedding_dedup_clusters,
    so the shared semantic_dedup pass appears in MULTIPLE plan branches
    and the not-doubling-the-work claim rests on runtime exchange
    reuse. Pin it: the EXECUTED (final adaptive) plan must contain
    ReusedExchange nodes — a refactor that perturbs one branch enough
    to break subplan identity would silently execute the shared pass
    twice and shows up here as the reuse count collapsing (7 measured
    at this fixture's local[4]/4-partition config; >= 5 allows plan
    drift without admitting a full reuse collapse)."""
    df = CATALOG["embedding_dedup_clusters"].fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    # the noop write runs a separate QueryExecution; re-execute the
    # DataFrame's own so its adaptive plan finalizes for inspection
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    reused = plan.count("ReusedExchange")
    assert reused >= 5, (
        f"only {reused} ReusedExchange nodes in the executed plan — "
        f"subplan identity between the arm branches has broken and "
        f"the shared semantic_dedup pass is executing repeatedly\n"
        f"{plan}"
    )
