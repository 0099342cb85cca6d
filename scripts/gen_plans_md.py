"""Regenerate PLANS.md: the formatted physical plan of each headline
catalog query at sf0.001, with the scale property each plan is expected
to exhibit. Run: python scripts/gen_plans_md.py

The file is the round-over-round plan-audit record: a refactor that
silently changes a broadcast join into a shuffle join shows up as a
PLANS.md diff even before the plan-shape tests run.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

SF_DIR = "/root/testdata/sf0.001"

# (entry name, the scale property the plan must show)
AUDITED = [
    ("monthly_trend", "date range reaches the scan as PushedFilters; "
     "partial+final hash aggregate; no join"),
    ("demand_by_zone", "both dimension joins are BroadcastHashJoin; "
     "fact scan reads only the touched columns"),
    ("price_band_totals", "range join planned as bucket equi-join "
     "(broadcast of the exploded band dim), never BroadcastNestedLoop"),
    ("dedup_minhash_lsh", "candidate generation joins on band-signature "
     "keys; the only wide operators are hash aggregates"),
    ("dedup_embedding_lsh", "sign-LSH bucket join + Arrow-batched "
     "verify kernel; no cartesian anywhere"),
    ("knn_bruteforce_vectorized", "one mapInPandas matmul per batch; "
     "top-k per query via window over pair frame"),
    ("dsir_topk_selection", "two <=512-row bucket models broadcast back; "
     "global top-k is TakeOrderedAndProject, not a full sort"),
    ("decontamination_scores", "bench side broadcast; single-pass left "
     "join + aggregate"),
    ("hourly_value_locf", "spine/observation join is a hash join; one "
     "(key,time) window sort carries the LOCF fill"),
    ("funnel_conversion", "one scan, one shuffle: per-user ordered "
     "aggregation, no self-joins"),
    ("snapshot_diff_orders", "one full-outer co-shuffle of the two "
     "snapshots; change classification is a projection"),
    ("event_transitions", "one window shuffle (lead), one "
     "state-vocabulary-sized aggregate"),
    ("asof_next_purchase", "forward as-of is the union+window "
     "composition: exactly one Exchange on the key"),
    ("asof_nearest_purchase", "backward+forward passes share the key "
     "partitioning; pick rule is a projection, no nested-loop"),
    ("ewma_user_value", "one key Exchange feeding one Arrow grouped "
     "kernel (FlatMapGroupsInPandas); no window, no join"),
    ("tfidf_cosine_docs", "df-pruned inverted-index self-join stays a "
     "hash equi-join on the term; exact-int weights, no Python eval"),
    ("leakage_safe_split_docs", "components over the dup-sized edge "
     "set; one left join back to the corpus; hash assignment is a "
     "projection"),
    ("hard_negatives_topk", "broadcast-anchors scored pairs -> one "
     "anti-join against the dup edge set -> ONE ranking window (no "
     "pre-rank sort is ever discarded)"),
    ("auc_order_status", "per-distinct-score hash aggregate feeding a "
     "group-partitioned running-sum window; no raw-row sort, no Python"),
    ("decile_lift_orders", "exact global rank tiles from per-score "
     "offsets + score-partitioned tie-break; only the distinct-score "
     "window is unpartitioned"),
    ("bootstrap_ci_price", "replicates exploded into rows map-side; "
     "partial aggregate collapses 40x rows to groups x n_boot keys "
     "before the shuffle; bigint sums on the hot path"),
    ("retrieval_eval_knn", "run/qrels equi-joins + query-partitioned "
     "ideal-ranking window; no nested-loop joins"),
    ("quantile_normalized_length", "source-partitioned rank window + "
     "per-score global offsets; final lookup is an equi-join on the "
     "integer position"),
    ("jaro_winkler_matches", "prefix-blocked bounded bucket expansion; "
     "the only Python in the plan is the Arrow JW verify kernel on "
     "candidate pairs"),
    ("brand_association_rules", "ONE basket-keyed aggregate feeds "
     "width bounding, item/total frames and the in-place chunked pair "
     "explode (r13; no basket self-join, two source reads total) -- "
     "never an item cartesian; item-frequency/total frames broadcast "
     "onto the pair aggregate"),
    ("fulfillment_survival_km", "subjects reduce to a (group,t) hash "
     "aggregate BEFORE the risk-set windows; no Python eval"),
    ("user_value_changepoint", "CUSUM identity keeps it join-free: two "
     "window passes over one user sort, no per-split rescan"),
    ("purchase_attribution", "lookback predicate rides the user "
     "equi-join (hash/sort-merge, no nested-loop); millionth-exact "
     "credit sums"),
    ("seasonal_naive_mase", "series reduces to (key,bucket) before the "
     "time-shift self-join; metrics are one more aggregate"),
    ("cms_partkey_counts", "explode + hash aggregate only, map-side "
     "combined; probe join broadcasts the fixed-size sketch"),
    ("pagerank_supplier_customer", "edges partitioned once and "
     "persisted; per-round the node-sized rank frame broadcasts, "
     "dangling mass is an in-plan broadcast aggregate"),
    ("part_triangle_stats", "degree-oriented wedge generation: three "
     "node-keyed equi-joins + one explode/aggregate, no cartesian, "
     "no Python"),
    ("spearman_qty_price", "ranks from cumulative-offset windows over "
     "the DISTINCT value frames (aggregate feeds each window), "
     "hash-joined back -- never a raw-row sort window"),
    ("user_event_coverage", "join-free sweep-line: one (key,start) "
     "sort drives both windows, then two hash aggregates"),
    ("customers_near_suppliers", "3x3 neighbor-cell equi-join with the "
     "squared-distance residual; never BroadcastNestedLoop over the "
     "point sets"),
    ("ivm_join_view_maintenance", "both incremental joins broadcast "
     "the delta side; refresh cost tracks the delta, not the view"),
    ("lsh_tuned_recall_audit", "derived 14x4 sketch stays bucket-joined "
     "(aggregate-then-explode pair generation); only the 500-vector "
     "truth baseline and three 1-row scalar crossJoins are nested-loop "
     "shaped"),
    ("scalable_rank_positions", "bucketed global rank: the row-sized "
     "window is bucket-PARTITIONED; the only unpartitioned window runs "
     "on the <=1024-row bucket-count frame; 1-row (min,max) broadcast"),
    ("rolling_7day_users", "constant-width window-end explode + dedup "
     "+ hash aggregate; no per-day fact rescans, no window functions"),
    ("ann_brp_lsh", "deterministic BRP: Arrow bucket kernel -> bounded "
     "(table,bucket) equi-join pair generation -> Arrow integer "
     "verify; no cartesian, no row-at-a-time Python"),
    ("packing_assignments", "ONE shuffle total (the shard groupBy "
     "feeding the Arrow BFD kernel); shard count bounds per-task "
     "state, never corpus size"),
    ("kmeans_clusters", "driver-cap-bounded corpora (this one) run "
     "the whole exact-integer Lloyd loop on one collected matrix and "
     "return a LocalTableScan (r13); above the cap, per-round: one "
     "cached-corpus Arrow scan + a k*D-sized exact-integer aggregate "
     "to the driver, no corpus shuffle in any round"),
    ("kmv_rollup_weekly_users", "sketches are aggregate-first: rank "
     "windows run over DISTINCT (group, hash) frames; weekly merge "
     "touches k-row partials, never raw events"),
    ("fuzzy_blocking_recall_audit", "exhaustive truth is the capped "
     "single-bucket chunk expansion (in-plan assert), candidates the "
     "bounded affix buckets; only nested loops are the two scalar "
     "count combiners"),
    ("minhash_recall_audit", "truth = df-bounded shingle index "
     "self-join, candidates = band-bucket equi-join; no cartesian, "
     "scalar-only cross joins"),
    ("simhash_recall_audit", "candidates = Manku block-key bucket "
     "equi-join over chunk-bounded posting lists; truth shares the "
     "shingle-index shape; only nested loops are the two scalar "
     "count combiners"),
    ("cms_error_audit", "sketch probe is a broadcast (row,bucket) "
     "equi-join against the fixed-size sketch; est-vs-exact join is "
     "key-vocabulary-sized; only nested loop is the single-row N "
     "total"),
    ("kmv_error_audit", "k-smallest via TakeOrderedAndProject, never "
     "a global sort; single-row estimate crossed with the single-row "
     "exact count"),
    ("misra_gries_bound_audit", "summary-sized state localCheckpointed "
     "per merge; final full-outer join is summary x heavy-set sized; "
     "only nested loop is the single-row N total"),
]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from taxi_data_pipeline_pset2_spark.queries.catalog import registry
    from taxi_data_pipeline_pset2_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()

    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        "Auto-generated by `scripts/gen_plans_md.py` (sf0.001, "
        "`explain('formatted')`). Each section states the scale property "
        "the plan must exhibit; `tests/test_plan_shapes.py` enforces the "
        "machine-checkable subset. Regenerate after any operator change "
        "touching these queries.",
        "",
    ]
    for name, claim in AUDITED:
        df = reg[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        out += [
            f"## `{name}`",
            "",
            f"**Must hold:** {claim}.",
            "",
            "```",
            plan,
            "```",
            "",
        ]
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {len(AUDITED)} plans to {path}")


if __name__ == "__main__":
    main()
