"""Pivot / unpivot reshaping operators (SURVEY.md §2 extension).

The reference's BI layer builds wide matrices by hand with CASE-bucket
aggregates (operator A6, ``value_by_daypart``; coverage matrix A3);
pivot is the general form, and unpivot the inverse a warehouse needs to
re-normalize wide exports. Spark has both natively (`RelationalGroupedData
.pivot`, `DataFrame.unpivot`); these wrappers pin the scale discipline:

- ``pivot_agg`` REQUIRES the pivot-value list. Spark's values-less
  overload first runs a distinct scan to discover the columns -- an
  extra corpus pass -- and an unbounded value domain becomes an
  unbounded column explosion (the 100 TB failure mode: pivoting on a
  high-cardinality key makes a million-column frame). An explicit list
  makes both costs visible at the call site and keeps the plan one
  aggregate.
- ``unpivot_longify`` is pure row expansion (Expand node): no shuffle,
  scales with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def pivot_agg(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    values: list,
    agg: Column,
) -> DataFrame:
    """Wide aggregate: one row per ``group_cols``, one column per entry
    of ``values`` (rows whose ``pivot_col`` is outside ``values`` are
    ignored), each holding ``agg`` over the matching rows.

    Single hash aggregate -- the pivot columns are CASE-bucketed partial
    aggregates exactly like the hand-written A6 form, so map-side
    combine applies and the shuffle carries one row per group per
    partition regardless of the value-list width."""
    if not values:
        raise ValueError(
            "pivot_agg requires an explicit pivot-value list: the "
            "values-less form adds a distinct discovery scan and risks "
            "unbounded column explosion at scale"
        )
    return df.groupBy(*group_cols).pivot(pivot_col, values).agg(agg)


def unpivot_longify(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Melt wide columns back to (id_cols, variable, value) rows.

    Pure per-row Expand -- no shuffle, no UDF; the inverse of
    ``pivot_agg`` up to the usual lossy-aggregation caveat."""
    return df.unpivot(
        [df[c] for c in id_cols],
        [df[c] for c in value_cols],
        var_name,
        value_name,
    )
