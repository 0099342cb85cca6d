"""SQL-surface parity: a SQL-first user of the reference must be able to
run plain ANSI SQL against this engine. The catalog's oracle strings are
written to a portable ANSI subset for the relational queries; this test
executes them through SPARK SQL (``spark.sql`` over ``register_views``)
-- not DuckDB -- and asserts result equality with the DataFrame-API
implementation of the same catalog entry.

Entries whose oracle needs DuckDB-specific list/lambda syntax (the dedup
/ text pipelines) are out of scope by listing, not by try/except: the
parity set is an explicit contract, and a new relational entry should be
added here when registered.
"""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.queries import registry
from taxi_data_pipeline_pset2_spark.sources.readers import register_views

from .oracle_utils import canonical_rows

# Catalog entries whose oracle SQL is Spark-SQL-portable ANSI.
ANSI_PARITY = [
    "demand_by_zone",
    "pricing_summary",
    "coverage_matrix",
    "value_by_daypart",
    "demand_grid",
    "monthly_trend",
    "dim_with_default_member",
    "quality_filter",
    "distinct_segments",
    "ranked_in_group",
    "rollup_revenue",
    "set_ops_customers",
    # trip_duration_metrics is excluded: its oracle needs an
    # epoch-seconds diff, which has no spelling shared by DuckDB
    # (epoch(a - b)) and Spark SQL (unix_timestamp(a) - unix_timestamp(b)).
    "case_flags",
    "events_hourly",
    "session_counts",
    "recent_clicks_before_error",
    # round-5 additions (winsorized_price_stats is excluded: DuckDB's
    # quantile_cont(x, p) has no Spark SQL spelling; mixture/gopher/
    # sampling oracles need DuckDB hex-cast or list lambdas)
    "price_band_totals",
    "snapshot_diff_orders",
    "rollup_grouping_sets",
    "zscore_price_outliers",
    "supplier_balance_by_region",
    "quality_mass_selection",
    # round-7 additions (asof_* excluded: ASOF JOIN is DuckDB syntax;
    # oov/rolling/weighted-median need string_split_regex or named-
    # window frame refinements Spark SQL lacks)
    "temporal_split_events",
    "status_priority_association",
    # Spark 4 runs the recursive CTE bit-identically -- the EWMA
    # recursion is portable ANSI now
    "ewma_user_value",
    # late-round-7 additions (epoch_ms / quantile_cont / generate_series /
    # string_split_regex / '0x' hex-casts keep the others DuckDB-only)
    "k_anonymity_audit",
    "modal_priority_by_status",
    "inferred_dim_members",
    "pareto_parts_price_size",
    "spearman_qty_price",
    "brand_item_neighbors",
    "part_triangle_stats",
    "part_graph_assortativity",
    "cohort_ltv_curves",
    "pseudonymized_customers",
    "ivm_join_view_maintenance",
    "multimodal_png_dims",
]


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    register_views(spark, sf_dir)
    return spark


@pytest.mark.parametrize("name", ANSI_PARITY)
def test_oracle_sql_runs_on_spark_sql(views, sf_dir, name):
    entry = registry()[name]
    assert entry.oracle is not None
    got = views.sql(entry.oracle).toPandas()
    want = entry.fn(views, sf_dir).toPandas()
    assert sorted(got.columns) == sorted(want.columns), name
    assert canonical_rows(got) == canonical_rows(want), name
