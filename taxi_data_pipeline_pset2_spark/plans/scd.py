"""Type-2 slowly-changing dimension builder (dbt ``snapshot``
semantics -- the reference is a dbt project, and snapshots are the dbt
feature its dimension layer would grow into next; cf. dbt's
``check_cols`` strategy).

Input: periodic FULL snapshots of a dimension stacked in one DataFrame
with a ``snapshot_ts`` column. Output: one row per (business key,
change run) with ``effective_from`` / ``effective_to`` / ``is_current``
-- the effective-dated history table that lets facts join the dimension
AS OF their event time (see ``operators/asof.py``).

Plan shape: one shuffle on the business key; two window passes (change
detection via lag, run numbering via running sum) and one aggregate --
the same single-shuffle lag/running-sum composition as gap
sessionization (queries/pipeline_ops.py session_counts), applied to
attribute change-tracking instead of time gaps.

dbt-default deletion semantics: a key absent from a later snapshot
keeps its last record open (no hard-delete invalidation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_from_snapshots(
    snapshots: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "snapshot_ts",
) -> DataFrame:
    """Collapse stacked snapshots into effective-dated SCD2 history.

    A new version starts at the first snapshot where any tracked
    attribute differs from the key's previous snapshot (NULL-safe
    comparison). ``effective_to`` is the start of the next version
    (half-open intervals, no gaps/overlaps); the latest version has
    ``effective_to`` NULL and ``is_current`` true.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    changed = F.lit(False)
    for a in attr_cols:
        # eqNullSafe: NULL -> NULL is "no change"; NULL -> value is one
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    # first row per key via row_number, NOT lag(ts).isNull(): the lag
    # form conflates "no previous row" with "previous row has a NULL
    # snapshot_ts", splitting a spurious extra version on NULL-ts input
    is_new_version = F.when(
        F.row_number().over(w) == 1, F.lit(True)
    ).otherwise(changed)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versioned = snapshots.withColumn(
        "_ver", F.sum(is_new_version.cast("int")).over(wsum)
    )
    per_version = versioned.groupBy(*key_cols, "_ver").agg(
        F.min(ts_col).alias("effective_from"),
        *[F.first(a).alias(a) for a in attr_cols],
    )
    wv = Window.partitionBy(*key_cols).orderBy("_ver")
    return (
        per_version.withColumn(
            "effective_to", F.lead("effective_from").over(wv)
        )
        .withColumn("is_current", F.col("effective_to").isNull())
        .drop("_ver")
        .select(
            *key_cols, *attr_cols, "effective_from", "effective_to", "is_current"
        )
    )


def scd2_as_of(
    history: DataFrame, as_of, ts_from: str = "effective_from",
    ts_to: str = "effective_to",
) -> DataFrame:
    """Point-in-time dimension reconstruction: the version of each key
    effective at ``as_of`` (half-open: from <= t < to, open current row
    qualifies via NULL ``ts_to``). One partition-prunable filter -- with
    history stored partitioned/sorted by ``effective_from``, the scan
    skips every version that started after ``as_of``. Inverse of
    :func:`scd2_from_snapshots`: reconstructing at a snapshot's
    timestamp returns exactly that snapshot's rows for tracked keys."""
    t_ = F.lit(as_of).cast("timestamp")
    return history.filter(
        (F.col(ts_from) <= t_)
        & (F.col(ts_to).isNull() | (t_ < F.col(ts_to)))
    )


def scd2_apply_snapshot(
    history: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    as_of,
) -> DataFrame:
    """Incrementally apply one new full snapshot (taken at ``as_of``,
    strictly after every existing version start) to SCD2 history --
    without rescanning prior snapshots. The maintenance twin of
    :func:`scd2_from_snapshots`: applying snapshots one at a time yields
    exactly the frame a full rebuild over all snapshots yields (the
    catalog oracle pins this equality).

    Semantics per key (matching the rebuild):
    - present in both, attributes NULL-safe equal: current row unchanged;
    - present in both, any attribute differs: current row closes at
      ``as_of`` and a new open version starts there;
    - new key: one open version from ``as_of``;
    - key absent from the snapshot: its open row stays open (a full
      snapshot that drops a key simply contributes no observation --
      same as the rebuild, where the key's series just ends).

    One join of the CURRENT rows against the snapshot (both sides
    key-partitioned; closed history is untouched, appended back as-is)
    -- at 100 TB the nightly cost is the current-rows join, never the
    history rescan."""
    t_ = F.lit(as_of).cast("timestamp")
    cur = history.filter(F.col("is_current"))
    closed = history.filter(~F.col("is_current"))

    # NULL keys are a legitimate cohort: presence on each side rides as
    # a literal marker (key nullness can't distinguish "absent" from
    # "NULL-keyed"), and the join condition is NULL-safe
    snap = snapshot.select(
        F.lit(True).alias("_in_snap"),
        *[F.col(k).alias(f"_sk_{k}") for k in key_cols],
        *[F.col(a).alias(f"_sa_{a}") for a in attr_cols],
    )
    # a full snapshot must carry each business key ONCE: a dirty
    # extract with a duplicated key would fan the current row out in
    # the join, emitting the old version closed twice and TWO open
    # is_current rows -- a silently corrupted dimension. Fail loudly
    # instead (the per-key count shares the join's key shuffle).
    wk = Window.partitionBy(*[f"_sk_{k}" for k in key_cols])
    snap = snap.withColumn(
        "_in_snap",
        F.when(
            F.count("*").over(wk) > 1,
            F.raise_error(
                F.lit(
                    "scd2_apply_snapshot: duplicate business key in snapshot"
                )
            ).cast("boolean"),
        ).otherwise(F.col("_in_snap")),
    )
    cond = None
    for k in key_cols:
        eq = F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = cur.withColumn("_in_hist", F.lit(True)).join(snap, cond, "full_outer")
    in_hist = F.coalesce(F.col("_in_hist"), F.lit(False))
    in_snap = F.coalesce(F.col("_in_snap"), F.lit(False))

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.col(f"_sa_{a}"))

    keys_out = [
        F.coalesce(F.col(k), F.col(f"_sk_{k}")).alias(k) for k in key_cols
    ]
    # unchanged current rows + keys absent from the snapshot: pass through
    keep = j.filter(in_hist & (~in_snap | ~changed)).select(
        *keys_out, *attr_cols, "effective_from", "effective_to", "is_current"
    )
    # changed keys: close the old version at as_of
    close = j.filter(in_hist & in_snap & changed).select(
        *keys_out,
        *attr_cols,
        "effective_from",
        t_.alias("effective_to"),
        F.lit(False).alias("is_current"),
    )
    # changed + brand-new keys: open a version at as_of
    opened = j.filter(in_snap & (~in_hist | changed)).select(
        *keys_out,
        *[F.col(f"_sa_{a}").alias(a) for a in attr_cols],
        t_.alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    cols = [*key_cols, *attr_cols, "effective_from", "effective_to", "is_current"]
    return (
        closed.select(*cols)
        .unionByName(keep.select(*cols))
        .unionByName(close.select(*cols))
        .unionByName(opened.select(*cols))
    )


def infer_members(
    dim: DataFrame,
    facts: DataFrame,
    dim_key: str,
    fact_key: str,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Late-arriving-dimension handling (Kimball's "inferred members"):
    fact keys with no dimension row yet get a placeholder member so the
    fact load never drops or orphans rows -- the dim row is fleshed out
    when the real attributes arrive (an SCD update against the same
    key). Returns the dimension plus placeholders, with an
    ``is_inferred`` flag; every attribute not in ``defaults`` is NULL
    on placeholders.

    The companion to quality.py's relationships test: that test FINDS
    orphaned fact keys, this repairs the referential break the standard
    warehouse way (contrast dim_zone's single static 'Unknown' member
    -- U2 -- which collapses all strays into one row; inferred members
    keep per-key identity so facts re-join correctly after backfill).

    Shape: one distinct on the fact key (the only fact-sized work) +
    one left-anti join against the dim (broadcast when the dim is
    dim-sized); the union appends placeholder-count rows. NULL fact
    keys are not members (the reference's COALESCE(sk, 0) default-row
    convention covers those)."""
    defaults = defaults or {}
    unknown = set(defaults) - set(dim.columns)
    if unknown:
        raise ValueError(f"defaults for non-dim columns: {sorted(unknown)}")
    missing = (
        facts.filter(F.col(fact_key).isNotNull())
        .select(F.col(fact_key).alias(dim_key))
        .distinct()
        .join(dim, dim_key, "left_anti")
    )
    placeholders = missing.select(
        dim_key,
        *[
            (F.lit(defaults[c]) if c in defaults else F.lit(None))
            .cast(dim.schema[c].dataType)
            .alias(c)
            for c in dim.columns
            if c != dim_key
        ],
        F.lit(True).alias("is_inferred"),
    )
    return dim.withColumn("is_inferred", F.lit(False)).unionByName(
        placeholders
    )
