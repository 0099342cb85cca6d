"""Semi-structured (JSON) column operators: schema inference, typed
parsing, and path extraction for the free-form payload columns every
event feed carries (events.props here; the reference's raw zone keeps
vendor payloads the same way).

The Spark-first split:

 - ``infer_json_schema``: sample-bounded schema discovery via Spark's
   own JSON reader (the same inference `spark.read.json` applies to a
   file), so the expensive full-corpus scan is never needed to learn a
   payload's shape. Deterministic: the sample is the first
   ``sample_cap`` rows in a stable order.
 - ``parse_json_column``: ``from_json`` into a typed struct -- JVM-side
   Jackson parsing inside codegen, no Python -- optionally flattened
   one level so downstream queries see plain columns. Malformed rows
   yield NULL structs (Spark's PERMISSIVE default), they are not
   dropped.
 - ``json_path``: thin ``get_json_object`` wrapper for one-off path
   pulls where a full parse is overkill (still JVM-side).

At 100 TB the rule the module encodes: parse ONCE into typed columns
at the silver boundary and store parquet -- repeated get_json_object
over raw strings re-parses the corpus per query. ``parse_json_column``
is that boundary operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def infer_json_schema(
    df: DataFrame, col: str, sample_cap: int = 10_000
) -> StructType:
    """Infer the JSON payload schema from a bounded sample: the first
    ``sample_cap`` non-null strings (stable order via the column's own
    sort -- content-deterministic across partitionings). Returns the
    struct schema Spark's JSON reader infers."""
    sample = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("j"))
        .orderBy("j")
        .limit(sample_cap)
    )
    rdd = sample.rdd.map(lambda r: r["j"])
    return df.sparkSession.read.json(rdd).schema


def parse_json_column(
    df: DataFrame,
    col: str,
    schema: StructType | None = None,
    flatten: bool = True,
    prefix: str = "",
    sample_cap: int = 10_000,
) -> DataFrame:
    """Parse a JSON string column into typed columns. With ``flatten``
    the struct's top-level fields become ``prefix + field`` columns
    next to the original frame (the original JSON column is kept for
    audit); otherwise one ``prefix or col + '_parsed'`` struct column
    is added. ``schema=None`` infers from a bounded sample first --
    pass the schema explicitly in production so a drifting payload
    fails loudly instead of silently re-shaping."""
    schema = schema or infer_json_schema(df, col, sample_cap)
    parsed = F.from_json(F.col(col).cast("string"), schema)
    if not flatten:
        return df.withColumn(prefix or f"{col}_parsed", parsed)
    out = df.withColumn("__parsed", parsed)
    for f in schema.fields:
        out = out.withColumn(
            f"{prefix}{f.name}", F.col("__parsed")[f.name]
        )
    return out.drop("__parsed")


def json_path(col: str | Column, path: str) -> Column:
    """One-off JSON path pull (returns string; cast at the call site):
    ``json_path("props", "$.k").cast("long")``. JVM-side, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c.cast("string"), path)
