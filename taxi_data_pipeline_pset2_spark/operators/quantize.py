"""Int8 embedding quantization with a per-vector accuracy audit -- the
storage-side companion to the ANN family (operators/similarity.py,
operators/pq.py): absmax-scaled int8 is the standard 4x shrink for
embedding columns at rest (the same scheme llama.cpp Q8 / faiss
SQ8 use), and the audit answers the only question that matters before
flipping a 100 TB corpus to it: how much cosine fidelity survives.

Arithmetic discipline (the similarity.py int-scaling contract): float
embeddings enter as exact SCALE-scaled integers, the int8 code is
round(iv * 127 / absmax) -- one double division, identical IEEE on any
engine -- and every dot product / norm in the audit is an exact
integer fold, so cosine(original, quantized) hash-matches a DuckDB
list-lambda twin bit-exactly. Scan-shaped: higher-order array
expressions only, no UDF, no shuffle beyond the caller's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.similarity import SCALE


def _iv(vec_col: str):
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * SCALE).cast("bigint"),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """(id_col, scale, qvec): per-vector absmax int8 quantization --
    qvec elements in [-127, 127], original value ~= qvec[i] * scale.
    All-zero vectors get scale 0 and an all-zero code; NULL vectors
    drop."""
    iv = _iv(vec_col)
    absmax = F.array_max(F.transform(iv, lambda v: F.abs(v)))
    q = F.when(
        absmax > 0,
        F.transform(
            iv,
            lambda v: F.round(
                (v * 127).cast("double") / absmax.cast("double")
            ).cast("int"),
        ),
    ).otherwise(F.transform(iv, lambda v: F.lit(0)))
    return df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        (absmax.cast("double") / F.lit(float(127 * SCALE))).alias("scale"),
        q.alias("qvec"),
    )


def quantization_audit(
    df: DataFrame, vec_col: str, id_col: str
) -> DataFrame:
    """Per-vector fidelity of the int8 code: (id_col, n_dims, cosine_q,
    max_abs_err) where cosine_q is cos(original, dequantized) -- the
    quantity ANN recall degrades with (scales cancel, so it is the
    exact integer dot of the scaled original against the int8 code) --
    and max_abs_err is the worst per-element reconstruction error in
    original units. 6-dp; all-zero vectors yield NULL cosine."""
    iv = _iv(vec_col)
    base = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), iv.alias("_iv")
    )
    absmax = F.array_max(F.transform(F.col("_iv"), lambda v: F.abs(v)))
    withq = base.select(
        id_col,
        "_iv",
        absmax.alias("_am"),
        F.when(
            absmax > 0,
            F.transform(
                F.col("_iv"),
                lambda v: F.round(
                    (v * 127).cast("double") / absmax.cast("double")
                ).cast("bigint"),
            ),
        ).otherwise(F.transform(F.col("_iv"), lambda v: F.lit(0).cast("bigint"))).alias("_q"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("_iv"), F.col("_q"), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_iv = F.aggregate(
        F.transform(F.col("_iv"), lambda v: v * v),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_q = F.aggregate(
        F.transform(F.col("_q"), lambda v: v * v),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # |iv/SCALE - q*am/(127*SCALE)| = |iv*127 - q*am| / (127*SCALE)
    err = F.aggregate(
        F.zip_with(
            F.col("_iv"),
            F.col("_q"),
            lambda a, b: F.abs(
                (a * 127 - b * F.col("_am")).cast("double")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    ) / F.lit(float(127 * SCALE))
    cos = F.when(
        (n_iv > 0) & (n_q > 0),
        dot.cast("double")
        / (F.sqrt(n_iv.cast("double")) * F.sqrt(n_q.cast("double"))),
    )
    return withq.select(
        id_col,
        F.size("_iv").cast("int").alias("n_dims"),
        F.round(cos, 6).alias("cosine_q"),
        F.round(err, 6).alias("max_abs_err"),
    ).orderBy(id_col)
