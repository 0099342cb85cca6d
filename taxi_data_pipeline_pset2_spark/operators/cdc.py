"""Change-data-capture by snapshot comparison: diff two full table
snapshots into an insert/update/delete changelog (SURVEY.md 2b
extension surface; the complement of plans/scd.py -- scd2 consumes
stacked snapshots into history, snapshot_diff emits the per-refresh
changelog a MERGE/upsert (sources/sinks.py merge_upsert) or downstream
cache invalidation consumes).

The reference's ingest is full-reload-per-month (``README.md`` load
loop); real warehouses refresh dimensions by full re-extract and need
the delta, not the snapshot. This is the standard "diff the snapshots"
pattern (dbt ``snapshot`` check-strategy internals, Delta Lake CDF's
logical equivalent) in plain DataFrame algebra.

Plan shape: ONE full outer join on the business key (a single co-shuffle
of both snapshots), then a projection classifying each key into
insert / delete / update / unchanged via NULL-safe attribute
comparison. No window, no second scan. At 100 TB both sides shuffle
once on the same key -- if the snapshots are bucketed on the key
(sources/sinks.py bucketed_write), the join is zero-Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
) -> DataFrame:
    """Changelog between two snapshots keyed by ``key_cols``.

    Returns one row per key present in either snapshot:
    (key_cols..., change_type, old_<attr>..., new_<attr>...) where
    ``change_type`` is 'insert' (key only in ``new``), 'delete' (only
    in ``old``), 'update' (present in both, any ``compare_cols``
    attribute differs NULL-safely), or 'unchanged' (emitted only with
    ``include_unchanged=True``).

    ``compare_cols`` defaults to every non-key column shared by both
    snapshots. Old/new attribute values ride along prefixed, so a MERGE
    consumer has the full before/after image without re-joining.
    """
    # `is None`, not falsy: an explicit compare_cols=[] is the
    # presence-only diff (key membership, no attribute comparison) and
    # must not silently widen to every shared column
    if compare_cols is None:
        compare_cols = sorted(
            (set(old.columns) & set(new.columns)) - set(key_cols)
        )
    missing = [c for c in key_cols + compare_cols if c not in old.columns]
    missing += [c for c in key_cols + compare_cols if c not in new.columns]
    if missing:
        raise ValueError(f"columns absent from a snapshot: {sorted(set(missing))}")

    o = old.select(
        *key_cols,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    # NULL-safe key join, like scd2_apply_snapshot: a NULL-keyed row
    # present in both snapshots is ONE row (the NULL cohort), not a
    # perpetual delete+insert pair on every refresh. Aliased sides:
    # old/new often derive from the SAME source frame, and unqualified
    # key references would be ambiguous in the self-join.
    o, n = o.alias("_cdc_o"), n.alias("_cdc_n")
    cond = None
    for c in key_cols:
        eq = F.col(f"_cdc_o.{c}").eqNullSafe(F.col(f"_cdc_n.{c}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"_cdc_o.{c}"), F.col(f"_cdc_n.{c}")).alias(c)
            for c in key_cols
        ],
        "_in_old",
        "_in_new",
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )

    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(differs, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn(CHANGE_COL, change).drop("_in_old", "_in_new")
    if not include_unchanged:
        out = out.filter(F.col(CHANGE_COL) != "unchanged")
    return out.select(
        *key_cols,
        CHANGE_COL,
        *[f"old_{c}" for c in compare_cols],
        *[f"new_{c}" for c in compare_cols],
    )
