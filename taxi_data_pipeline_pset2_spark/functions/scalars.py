"""Scalar function library (SURVEY.md section 2.8, F1-F14).

Everything here is a thin composition of built-in ``pyspark.sql.functions``
-- JVM-side, codegen-friendly, no Python UDFs. Each helper cites the
reference construct it replaces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surrogate_id(*cols: Column) -> Column:
    """MD5 surrogate key over '|'-joined columns.

    Reference: ``fct_trips.sql:10``
    ``MD5(CONCAT(service_type,'|',pickup_datetime,...,total_amount))`` (F1).
    Callers must pre-format float columns (e.g. ``cast('decimal(18,2)')``)
    so the string rendering is engine-stable (SURVEY.md section 7 item 5).
    """
    return F.md5(F.concat_ws("|", *cols))


def duration_hours(start_ts: Column, end_ts: Column) -> Column:
    """Elapsed hours between two timestamps as exact epoch-second
    subtraction / 3600.0.

    Reference: ``fct_trips.sql:23`` ``DATEDIFF(SECOND, pickup, dropoff)/3600.0``
    (F4); exact subtraction matches because source timestamps carry no
    sub-second component (SURVEY.md section 7 item 2).
    """
    return (F.unix_timestamp(end_ts) - F.unix_timestamp(start_ts)) / 3600.0


def guarded_pct(numerator: Column, denominator: Column, digits: int = 6) -> Column:
    """CASE-guarded division: 0.0 instead of NULL/inf when the denominator
    is not positive.

    Reference: ``fct_trips.sql:27,48`` avg_speed_mph / tip_percentage
    guards (F2+F11).
    """
    return (
        F.when(denominator > 0, F.round(numerator / denominator, digits))
        .otherwise(F.lit(0.0))
        .alias("guarded_pct")
    )
