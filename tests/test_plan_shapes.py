"""Physical-plan regression tests: the scale properties the engine is
designed around must be visible in `.explain` output, not just assumed.
A refactor that silently turns a broadcast join into a shuffle join or
un-pushes a filter passes value-equality tests but fails these."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.queries.catalog import registry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_monthly_trend_filter_pushes_to_parquet(spark, sf_dir):
    """The flagship's year predicate must reach the scan as a plain date
    range (PushedFilters), not evaluate post-scan -- function-wrapped
    predicates (year(col) = y) would defeat row-group skipping."""
    plan = _plan(registry()["monthly_trend"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan.split("PushedFilters")[1][:300]


def test_star_joins_broadcast_never_shuffle(spark, sf_dir):
    """demand_by_zone joins two dims: both must be BroadcastHashJoin.
    A SortMergeJoin here means a full fact shuffle at 100 TB."""
    plan = _plan(registry()["demand_by_zone"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_demand_by_zone_prunes_fact_columns(spark, sf_dir):
    """Column pruning: the orders scan must read only the two columns the
    query touches (o_custkey, o_orderdate), not the full 9-column fact."""
    plan = _plan(registry()["demand_by_zone"].fn(spark, sf_dir))
    orders_scan = next(
        seg for seg in plan.split("FileScan parquet") if "orders.parquet" in seg[:400]
    )
    schema = orders_scan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_custkey" in schema and "o_orderdate" in schema
    assert "o_totalprice" not in schema and "o_comment" not in schema


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """The canonical aggregate must run map-side partial + final
    (two HashAggregate levels around one Exchange) -- the shape that
    shuffles group states, not raw rows."""
    plan = _plan(registry()["pricing_summary"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan  # map-side combine present


def test_whole_stage_codegen_on_relational_path(spark, sf_dir):
    """Relational queries must run inside whole-stage codegen spans; an
    interpreted hot path would show a bare Project/Filter chain. AQE
    wraps plans as AdaptiveSparkPlan(isFinalPlan=false) before
    execution, hiding codegen nodes -- disable it for the inspection."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("pricing_summary", "quality_filter", "case_flags"):
            plan = _plan(registry()[name].fn(spark, sf_dir))
            # codegen'd operators carry a *(stage_id) marker in the
            # simple plan string
            assert "*(1)" in plan, f"{name}: no codegen span\n{plan[:800]}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_dedup_pipelines_have_no_cartesian(spark, sf_dir):
    """Candidate generation is equi-bucketed everywhere: no
    CartesianProduct / BroadcastNestedLoopJoin may appear in any dedup
    plan at any scale."""
    for name in (
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_lsh",
    ):
        plan = _plan(registry()[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_funnel_stages_single_shuffle_no_join(spark, sf_dir):
    """The funnel resolves the whole stage chain from ONE hash aggregate
    of per-step sorted arrays -- the plan must contain no join at all and
    exactly one exchange (the groupBy). A k-step funnel written as k
    self-joins re-shuffles the event table k times at 100 TB."""
    from taxi_data_pipeline_pset2_spark.operators.funnel import funnel_stages
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    events = load_table(spark, sf_dir, "events")
    plan = _plan(funnel_stages(events, steps=("view", "click", "purchase")))
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_decontamination_broadcasts_bench_side(spark, sf_dir):
    """The collision join must broadcast the eval-sized benchmark
    shingle set; a shuffle join here re-partitions the 100 TB train
    side on the 8-byte shingle hash."""
    from taxi_data_pipeline_pset2_spark.operators.decontamination import (
        contamination_scores,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = contamination_scores(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        k=8,
    )
    plan = _plan(scores)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_pivot_one_scan_map_side_combine(spark, sf_dir):
    """pivot_agg with an explicit value list must read the fact ONCE
    (the values-less overload adds a distinct discovery scan) and keep
    map-side combine on both aggregate levels; the second exchange
    carries only (group x pivot-value) states, never raw rows."""
    from taxi_data_pipeline_pset2_spark.queries.catalog import registry as _reg

    plan = _plan(_reg()["pivot_category_totals"].fn(spark, sf_dir))
    assert plan.count("FileScan") == 1, plan  # no discovery scan
    assert plan.count("Exchange") <= 2, plan
    assert "partial_pivotfirst" in plan and "partial_sum" in plan


def test_chunking_rides_the_scan(spark, sf_dir):
    """chunk_documents is bind -> explode -> slice: zero exchanges, so
    at 100 TB chunking fuses into the corpus scan it rides."""
    from taxi_data_pipeline_pset2_spark.operators.text import chunk_documents
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(chunk_documents(docs, max_tokens=32, overlap=8))
    assert "Exchange" not in plan, plan


def test_gopher_flags_scan_only(spark, sf_dir):
    """The Gopher rule table is a projection: no join, no aggregate --
    the flags ride the scan at any corpus size. The only Exchange
    allowed is the conditional small-input spread (a no-op on any
    at-scale source with enough splits)."""
    plan = _plan(registry()["gopher_quality_flags"].fn(spark, sf_dir))
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan
    assert "HashAggregate" not in plan


def test_winsorize_thresholds_broadcast_back(spark, sf_dir):
    """Winsorization joins the group-sized threshold frame back onto the
    scan: must be a broadcast join, never a corpus shuffle join."""
    plan = _plan(registry()["winsorized_price_stats"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_per_group_sample_no_join(spark, sf_dir):
    """n-per-group sampling is one window over the group key -- no join
    anywhere (a join-based formulation would re-derive the corpus)."""
    plan = _plan(registry()["per_group_sample_rows"].fn(spark, sf_dir))
    assert "Window" in plan
    assert "Join" not in plan


def test_semantic_decon_scan_shaped_no_join(spark, sf_dir):
    """Exact semantic decontamination is ONE pass over the train scan
    against the driver-collected bench matrix (int64 matmul per Arrow
    batch): no join, no Exchange anywhere in the plan."""
    plan = _plan(registry()["semantic_decontamination"].fn(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_dsir_models_broadcast_and_no_python(spark, sf_dir):
    """DSIR scoring: both bucket models must broadcast-join back onto
    the candidate features (a shuffle join on a <=512-row side at 100 TB
    is a planning failure) and the whole path stays JVM-side."""
    plan = _plan(registry()["dsir_topk_selection"].fn(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_locf_single_sort_shuffle_per_side(spark, sf_dir):
    """The LOCF fill needs exactly one (key, time)-ordered window; the
    plan must not degenerate into a nested-loop or cartesian join
    between spine and observations."""
    plan = _plan(registry()["hourly_value_locf"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_phrase_search_no_explode_of_positions(spark, sf_dir):
    """Phrase adjacency is higher-order array arithmetic: the plan may
    explode TOKENS (index build) but never positions, and the per-term
    posting joins must be hash joins."""
    plan = _plan(registry()["phrase_search_hits"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_changelog_maintenance_never_rescans_like_join_shapes(spark, sf_dir):
    """Rollup maintenance: the rollup-side/delta-side combine must be a
    hash or sort-merge equi-join (NULL-safe keys still plan as equi);
    nested-loop means the NULL-safe condition fell off the join keys."""
    plan = _plan(registry()["rollup_changelog_maintenance"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_variants_single_key_shuffle(spark, sf_dir):
    """Forward as-of: exactly one Exchange on the join key (the
    union+window composition's whole point). Nearest: the two
    directional passes must still plan equi-shaped -- no nested-loop,
    no cartesian -- and at most the key exchanges (backward pass +
    forward pass windows share partitioning)."""
    plan = _plan(registry()["asof_next_purchase"].fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    near = _plan(registry()["asof_nearest_purchase"].fn(spark, sf_dir))
    assert "CartesianProduct" not in near
    assert "BroadcastNestedLoopJoin" not in near
    assert near.count("Exchange hashpartitioning") <= 2, near


def test_tfidf_cosine_joins_stay_hash_shaped(spark, sf_dir):
    """The inverted-index self-join must be an equi-join on the term
    (hash/sort-merge), never nested-loop; the whole pipeline is
    expression-only (no Python eval in the plan)."""
    plan = _plan(registry()["tfidf_cosine_docs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ewma_single_shuffle_arrow_kernel(spark, sf_dir):
    """EWMA is one hash exchange on the key feeding one Arrow grouped
    kernel (FlatMapGroupsInPandas) -- no window, no join, no second
    shuffle of the series."""
    plan = _plan(registry()["ewma_user_value"].fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan


def test_grouped_auc_windows_partitioned_no_python(spark, sf_dir):
    """binary_auc with group_cols: every window must be partitioned (no
    single-partition global sort of the data) and the whole metric is
    expression-only -- per-score hash aggregates feeding a
    group-partitioned running sum."""
    plan = _plan(registry()["auc_order_status"].fn(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for seg in plan.split("Window ")[1:]:
        spec = seg[:400]
        # grouped AUC: the window partitions by the group columns
        assert "o_orderpriority" in spec, spec


def test_calibration_single_hash_aggregate(spark, sf_dir):
    """calibration_bins is one partial+final hash aggregate to n_bins
    rows over the scan (plus the broadcast min/max extremes) -- no sort,
    no window, no Python."""
    plan = _plan(registry()["calibration_price_prob"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastExchange" in plan  # the min/max extremes row


def test_kappa_broadcast_marginals_no_shuffle_join(spark, sf_dir):
    """cohen_kappa joins two category-sized marginal frames broadcast;
    the raw rows are never shuffle-joined."""
    plan = _plan(registry()["kappa_price_status"].fn(spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or "BuildRight, Cross" in plan
    assert "CartesianProduct" not in plan


def test_decile_lift_tiebreak_window_partitioned_by_score(spark, sf_dir):
    """decile_lift's row_number tie-break must be partitioned BY SCORE
    (scalable); the only unpartitioned windows run over per-score /
    per-tile aggregates, never the raw rows. The offsets join back onto
    the rows is an equi-join, not nested-loop."""
    plan = _plan(registry()["decile_lift_orders"].fn(spark, sf_dir))
    # the only nested-loop is the deliberate 1-row broadcast of the
    # (N, n_pos) totals; anything else is a plan regression
    for seg in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert seg[:20].strip().startswith("BuildRight, Cross"), seg[:120]
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the per-row window (row_number over _k) is partitioned by the
    # score: windowspecdefinition's first argument is _s
    assert "row_number() windowspecdefinition(_s#" in plan, plan


def test_association_rules_no_cartesian_broadcast_totals(spark, sf_dir):
    """The basket self-join must stay equi-keyed on the basket id (a
    cartesian over items would be quadratic in the vocabulary), and the
    item-frequency/total frames must broadcast onto the pair aggregate,
    never shuffle it."""
    plan = _plan(registry()["brand_association_rules"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row totals crossJoin (broadcast)
    bnl = plan.count("BroadcastNestedLoopJoin")
    assert bnl <= 1, plan
    assert plan.count("BroadcastHashJoin") >= 2  # part dim + item freqs


def test_attribution_equi_join_not_nested_loop(spark, sf_dir):
    """The touch-conversion join carries the lookback range predicate
    INSIDE a user-equi-keyed join: the plan must be a hash/sort-merge
    join on user id, never BroadcastNestedLoop over the events table."""
    plan = _plan(registry()["purchase_attribution"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_survival_reduces_before_windows(spark, sf_dir):
    """Kaplan-Meier windows must run over the (group, t) aggregate, not
    raw subjects: a HashAggregate must appear BELOW the first Window in
    the plan tree (aggregate executes first)."""
    plan = _plan(registry()["fulfillment_survival_km"].fn(spark, sf_dir))
    assert "Window" in plan and "HashAggregate" in plan
    # executedPlan prints top-down: the aggregate that feeds the window
    # appears after (deeper than) the Window node, and no Python
    # evaluation anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_pure_codegen_no_python(spark, sf_dir):
    """The sketch is explode + hash aggregate only: no Python eval, no
    join on the build side, map-side partial aggregation present."""
    from taxi_data_pipeline_pset2_spark.operators.cms import cms_sketch
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = _plan(cms_sketch(li, "l_partkey", width=512, depth=4))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Join" not in plan
    assert "partial_" in plan  # map-side combine of sketch cells


def test_paths_no_window_shuffle_single_exchange(spark, sf_dir):
    """top_paths sorts array-side: the plan must contain no Window node
    and shuffle only for the two hash aggregates (user, then path) +
    the TakeOrdered head."""
    plan = _plan(registry()["top_user_paths"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_seasonal_naive_single_aggregate_then_join(spark, sf_dir):
    """The series reduces to (key, bucket) BEFORE the seasonal
    self-join; the final metrics are one more hash aggregate. No
    nested-loop anywhere."""
    plan = _plan(registry()["seasonal_naive_mase"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 levels


def test_changepoint_no_self_join(spark, sf_dir):
    """The CUSUM identity keeps change-point detection join-free: two
    window passes over one user-partitioned sort, no per-split
    rescan joins."""
    plan = _plan(registry()["user_value_changepoint"].fn(spark, sf_dir))
    assert "Join" not in plan, plan


def test_gini_aggregate_feeds_rank_window(spark, sf_dir):
    """Gini runs its rank window over the customer-sized aggregate; the
    fact scan must reduce through a HashAggregate before any Window,
    and the customer dim joins broadcast."""
    plan = _plan(registry()["gini_customer_spend"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangles_equi_joins_only(spark, sf_dir):
    """The wedge/closure joins are equi-keyed on node ids with the
    ordering predicates as residuals: no cartesian, no nested-loop over
    the edge set, no Python eval."""
    plan = _plan(registry()["part_triangle_stats"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_spearman_value_vocab_windows(spark, sf_dir):
    """Ranks come from cumulative-offset windows over the DISTINCT
    value frames (an aggregate feeds each window -- never a raw-row
    sort window), hash-joined back; no nested loop anywhere."""
    plan = _plan(registry()["spearman_qty_price"].fn(spark, sf_dir))
    assert plan.count("Window") == 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # each window's input subtree must aggregate first (the per-value
    # count): raw-row rank windows are banned
    assert "partial_count" in plan


def test_acf_single_window_pass(spark, sf_dir):
    """All 14 lag columns materialize in ONE window pass over one sort
    (no per-lag self-joins -- the oracle does that; the engine must
    not), then a single aggregate + constant-width explode."""
    plan = _plan(registry()["acf_daily_orders"].fn(spark, sf_dir))
    assert plan.count("Window") == 1, plan
    # the only join builds the zero-filled spine (date grid left join)
    assert "CartesianProduct" not in plan


def test_interval_coverage_linear_sweep(spark, sf_dir):
    """The sweep-line must stay join-free: one sort drives both windows
    (island flag + running id), then two hash aggregates."""
    plan = _plan(registry()["user_event_coverage"].fn(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pareto_no_self_join(spark, sf_dir):
    """The frontier is the sorted-window sweep, never the quadratic
    NOT EXISTS anti-join."""
    plan = _plan(registry()["pareto_parts_price_size"].fn(spark, sf_dir))
    assert "Join" not in plan, plan
    assert "Window" in plan


def test_item_similarity_basket_equi_join(spark, sf_dir):
    """Like association_rules: the pair join stays equi-keyed on the
    basket id, the frequency lookups broadcast."""
    plan = _plan(registry()["brand_item_neighbors"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_theilsen_group_keyed_pair_join(spark, sf_dir):
    """The quadratic pair generation must ride a group-keyed equi-join
    (x_i < x_j as residual), never a nested loop over the rollup."""
    plan = _plan(registry()["theilsen_monthly_revenue"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interarrival_join_free(spark, sf_dir):
    """One lag window + one hash aggregate; no join anywhere."""
    plan = _plan(registry()["user_interarrival_stats"].fn(spark, sf_dir))
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1


def test_spatial_grid_equi_join(spark, sf_dir):
    """The radius join must plan as an equi-join on the cell keys with
    the squared-distance residual -- never BroadcastNestedLoop over the
    point sets."""
    plan = _plan(registry()["customers_near_suppliers"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivm_deltas_broadcast(spark, sf_dir):
    """Both incremental joins must carry the delta side as a broadcast
    (cost tracks the delta, never a full-side shuffle pair)."""
    plan = _plan(registry()["ivm_join_view_maintenance"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_rolling_distinct_constant_explode(spark, sf_dir):
    """The sliding distinct must be the pair-explode shape: no
    per-day rescan joins of the fact (only the spine left join), no
    window functions, no Python."""
    plan = _plan(registry()["rolling_7day_users"].fn(spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" in plan  # the constant-width explode


def test_skew_report_two_aggregates_no_join(spark, sf_dir):
    plan = _plan(registry()["user_key_skew"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert "partial_" in plan  # map-side combine on the key counts


def test_hashed_features_pure_codegen(spark, sf_dir):
    """Tokenize-explode + one hash aggregate: no join, no window, no
    Python anywhere."""
    plan = _plan(registry()["hashed_doc_features"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_" in plan  # map-side combine


def test_table_checksum_single_aggregate(spark, sf_dir):
    """Scan + one partial/final aggregate; the checksum must never
    shuffle rows by any key."""
    plan = _plan(registry()["orders_table_checksum"].fn(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") <= 1  # only the final single-partition


def test_twap_one_sort_window(spark, sf_dir):
    plan = _plan(registry()["user_value_twap"].fn(spark, sf_dir))
    assert "Join" not in plan
    assert plan.count("Window") == 1


def test_ks_price_windows_on_distinct_value_frame(spark, sf_dir):
    """KS works over cumulative windows on the DISTINCT (status, value)
    frame (an aggregate feeds each window), never a raw-row global sort;
    both windows are partition-keyed and no join degenerates."""
    plan = _plan(registry()["ks_price_by_urgency"].fn(spark, sf_dir))
    assert plan.count("Window") == 2
    assert "partial_count" in plan  # distinct-value aggregate feeds them
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan  # pure codegen


def test_quantile_normalize_no_single_partition_sort(spark, sf_dir):
    """Global positions come from per-score offsets + a score-partitioned
    tie-break window -- the single-partition global rank is banned. The
    one BroadcastNestedLoopJoin is the 1-row total-count scalar
    crossJoin (scale-free); a second one would mean a real join
    degenerated."""
    plan = _plan(registry()["quantile_normalized_length"].fn(spark, sf_dir))
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    # the unpartitioned window is the per-DISTINCT-SCORE offset pass
    # (score-count-sized); every row-sized window must carry a
    # partitionBy. 4 windows total: source rank, source count, offset,
    # score-partitioned tiebreak.
    assert plan.count("Window") == 4


def test_lsh_tuned_audit_bucket_join_no_allpairs_sketch_side(spark, sf_dir):
    """The tuned 14x4 sketch side must stay bucket-joined (band,sig
    equi-join via collect_list buckets) -- only the TRUTH side (the
    audit's exact baseline, 500-vector test corpus) and the three 1-row
    scalar crossJoins may be nested-loop shaped."""
    plan = _plan(registry()["lsh_tuned_recall_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # candidate generation is an aggregate-then-explode, never a
    # sketch-side theta-join: the explode of bucket pair arrays exists
    assert "Generate explode" in plan or "Generate" in plan


def test_scalable_rank_in_bucket_window_is_partitioned(spark, sf_dir):
    """The row-sized window MUST be bucket-partitioned (parallel); the
    only unpartitioned window is the offset pass over the <=1024-row
    bucket-count frame (its input subtree is the per-bucket aggregate).
    The two BroadcastNestedLoopJoins are the 1-row (min,max) scalar
    crossJoins -- scale-free by construction."""
    plan = _plan(registry()["scalable_rank_positions"].fn(spark, sf_dir))
    assert plan.count("Window") == 2
    # the row_number window carries the bucket partition key
    assert "row_number() windowspecdefinition(_bkt" in plan
    assert "partial_count" in plan  # bucket counts aggregate feeds offsets
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_brp_lsh_bucket_join_no_cartesian(spark, sf_dir):
    """The r9 deterministic euclidean BRP (ann_brp_lsh): candidates come
    from the bounded (table, bucket) equi-join + verify kernel -- never
    an all-pairs stage; the sketch and verify both ride Arrow
    (MapInPandas), no row-at-a-time Python."""
    plan = _plan(registry()["ann_brp_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time UDF


def test_packing_single_shuffle_scan_shaped(spark, sf_dir):
    """packing_assignments: ONE shuffle total (the shard groupBy feeding
    applyInPandas); shard count, not corpus size, bounds per-task state."""
    plan = _plan(registry()["packing_assignments"].fn(spark, sf_dir))
    assert plan.count("Exchange") <= 2, plan  # shard hash + AQE read
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_returns_materialized_topk(spark, sf_dir):
    """bm25_topk eagerly localCheckpoints the top-k rows so its two
    persisted frames (doc lengths, query-term postings) can be released
    before returning: the frame handed back must be a checkpoint scan
    (scale-free, already computed), not a live corpus-sized lineage."""
    df = registry()["bm25_topk_docs"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "Scan ExistingRDD" in plan, plan
    assert "FileScan" not in plan
    assert df.count() <= 30


def test_recall_audits_no_cartesian(spark, sf_dir):
    """The r11 recall-audit compositions must keep their components'
    bucketed shapes: no CartesianProduct, and the ONLY nested-loop
    joins are the two scale-free scalar cross-joins combining the
    three single-row count aggregates (the _recall_audit_frame shape).
    The exhaustive Levenshtein truth itself is a deliberately-capped
    single-bucket chunk expansion, never a pair-generating nested
    loop."""
    from taxi_data_pipeline_pset2_spark.queries import registry

    reg = registry()
    for name in (
        "fuzzy_blocking_recall_audit",
        "minhash_recall_audit",
        "simhash_recall_audit",
    ):
        plan = _plan(reg[name].fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        # toString prints each node once in the tree: exactly the two
        # scalar combiners, no data-sized nested loop
        assert plan.count("BroadcastNestedLoopJoin") == 2, name


def test_sketch_audit_plans_have_no_cartesian_and_bounded_joins(
    spark, sf_dir
):
    """r12 sketch-accuracy audits: the sketch probe join must stay
    broadcast (the sketch is fixed-size by construction), the KMV
    k-smallest must be TakeOrderedAndProject (never a full sort), and
    the only BroadcastNestedLoopJoin allowed is the single-row total
    crossJoin each audit carries."""
    p = _plan(registry()["cms_error_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # single-row N total
    assert "BroadcastHashJoin" in p  # the (row,bucket) sketch probe

    p = _plan(registry()["kmv_error_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1
    assert "TakeOrderedAndProject" in p  # k-smallest, not a global sort

    p = _plan(registry()["misra_gries_bound_audit"].fn(spark, sf_dir))
    assert "CartesianProduct" not in p
    assert p.count("BroadcastNestedLoopJoin") <= 1  # single-row N total
