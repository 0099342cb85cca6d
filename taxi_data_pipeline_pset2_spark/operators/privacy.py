"""Governance primitives: deterministic pseudonymization and
k-anonymity auditing -- the minimum a pipeline feeding shared/training
datasets needs before identifiers leave the trust boundary (the
de-identification companion to operators/text.py's PII redaction,
which handles free text; this handles STRUCTURED identifiers).

Design choices that matter at 100 TB:
- pseudonymize is a salted-hash projection (scan-shaped, codegen-only):
  DETERMINISTIC so joins/groupBys still work across tables tokenized
  with the same salt -- the property random tokens destroy. Rotating
  the salt rotates the entire pseudonym space (unlinkability between
  releases). It is NOT encryption and NOT differential privacy: a
  brute-forceable domain (e.g. phone numbers) needs a secret salt, and
  the docstring says so rather than implying more.
- k_anonymity reports the quasi-identifier groups smaller than k (the
  violating-rows contract of quality.py): small groups are the
  re-identification risk Sweeney 2002 defined k-anonymity around. One
  hash aggregate; group-sized output.
"""

from __future__ import annotations

from collections.abc import Sequence as _Seq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pseudonymize(
    df: DataFrame,
    cols: _Seq[str],
    salt: str,
    length: int = 16,
) -> DataFrame:
    """Replace each of ``cols`` with a deterministic salted token
    (first ``length`` hex chars of md5(salt:value)): equal values get
    equal tokens -- joins and aggregates survive -- and nothing else
    about the value does. NULLs stay NULL (absence is not an
    identifier). The salt must be secret and high-entropy when the
    value domain is enumerable; rotate it per data release to break
    cross-release linkage.

    Token width (r11 note): the default ``length=16`` is 64 bits --
    birthday collisions appear around 2^32 distinct values, so a
    column with ~1e9+ distinct identifiers should pass ``length=32``
    (the full md5) or two different identities will eventually share a
    token and silently merge downstream."""
    if not cols:
        raise ValueError("need at least one column")
    if not 8 <= length <= 32:
        raise ValueError(f"length must be in [8, 32], got {length}")
    out = df
    for c in cols:
        tok = F.substring(
            F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string"))),
            1,
            length,
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), tok))
    return out


def k_anonymity(
    df: DataFrame,
    quasi_cols: _Seq[str],
    k: int = 5,
) -> DataFrame:
    """Quasi-identifier combinations observed FEWER than ``k`` times:
    (quasi_cols..., n) ordered by (n, quasi_cols) -- each row is a
    cohort small enough to re-identify (Sweeney's k-anonymity
    criterion). Empty result = the table is k-anonymous over these
    columns. NULL is a legitimate quasi-value (a NULL birthdate still
    narrows a cohort). One hash aggregate; emit-then-suppress or
    generalize upstream until this audit is empty."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") < k)
        .orderBy("n", *quasi_cols)
    )
