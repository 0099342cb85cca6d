"""Cross-system reconciliation: order-independent row fingerprints and
table checksums -- "is the copy over there byte-identical to ours?"
answered with one aggregate per side instead of shipping either table.

The migration/replication primitive every warehouse move needs (and
the external check this repo itself lives by: the driver hash-compares
Spark against DuckDB; this operator productizes that mechanism):

- row_fingerprints: one 64-bit portable hash per row over the chosen
  columns. Each field is length-prefixed (netstring-style
  ``len ':' value``, NULL encoded as the bare token ``N``) before the
  '\\x01'-joined concat, so the payload parses back to exactly one
  field tuple: ('a', NULL) never collides with ('aNULL', ...), and --
  the r11 fix -- a field CONTAINING the separator cannot shift the
  boundaries either (('a\\x01b', 'c') vs ('a', 'b\\x01c') hashed
  identically under the bare separator scheme, which broke the
  "agree iff multisets agree" claim precisely on the adversarial
  inputs a reconciliation tool exists for).
- table_checksum: the SUM of row fingerprints mod 2^63 plus the exact
  row count. Addition is commutative, so the checksum is independent
  of partitioning and row order on BOTH engines -- two tables agree
  iff (n, checksum) agree (up to 1/2^63 collision odds per differing
  multiset). Duplicate rows count multiply (bag semantics, matching
  what a real diff must detect).

Scale shape: scan + one hash aggregate; the checksum is one row. The
md5 construction is the house engine-portable hashing, so ANY system
that can run md5 (DuckDB, Trino, Snowflake, psql) can compute the same
checksum -- that cross-engine portability is the entire point.
"""

from __future__ import annotations

from collections.abc import Sequence as _Seq

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MOD = 2**63


def _row_hash(cols: _Seq[str]) -> Column:
    """Portable 64-bit row hash: first 15 md5 hex digits (60 bits) of
    the length-prefixed field concatenation. Per field:
    ``len(value) ':' value`` (character length, like DuckDB's len()),
    NULL as the bare token ``N`` -- unambiguous under concatenation, so
    distinct field tuples always produce distinct payloads. DuckDB twin
    per field: CASE WHEN x IS NULL THEN 'N' ELSE
    len(CAST(x AS VARCHAR)) || ':' || CAST(x AS VARCHAR) END, joined
    with chr(1); hash = CAST('0x' || substr(md5(payload), 1, 15) AS
    BIGINT)."""

    def enc(c: str) -> Column:
        s = F.col(c).cast("string")
        return F.when(s.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(s).cast("string"), F.lit(":"), s)
        )

    payload = F.concat_ws("\x01", *[enc(c) for c in cols])
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def row_fingerprints(
    df: DataFrame, cols: _Seq[str] | None = None, out: str = "row_fp"
) -> DataFrame:
    """The input plus a 64-bit ``out`` fingerprint column over ``cols``
    (default: every column, in schema order -- pin the list explicitly
    when comparing tables whose column order may differ)."""
    cols = list(cols) if cols else list(df.columns)
    if not cols:
        raise ValueError("need at least one column")
    return df.withColumn(out, _row_hash(cols))


def table_checksum(
    df: DataFrame, cols: _Seq[str] | None = None
) -> DataFrame:
    """One row (n_rows, checksum): exact count + order/partitioning-
    independent sum of row fingerprints mod 2^63. Two systems'
    (n_rows, checksum) pairs agree iff the column multisets agree."""
    cols = list(cols) if cols else list(df.columns)
    if not cols:
        raise ValueError("need at least one column")
    fp = _row_hash(cols)
    return df.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        (
            F.coalesce(
                F.sum(fp.cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)")
            )
            # 2^63 exceeds a Java long literal: spell it as a decimal
            % F.expr(f"CAST({_MOD} AS DECIMAL(38,0))")
        )
        .cast("bigint")
        .alias("checksum"),
    )
