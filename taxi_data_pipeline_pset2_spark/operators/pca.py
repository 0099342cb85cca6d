"""PCA over embedding columns: distributed second moments, driver-side
eigendecomposition, broadcast projection.

The standard embedding-pipeline compressor/whitener (SemDeDup and
IVF-style indexes routinely run on PCA-reduced vectors): the only
corpus-sized work is one scan accumulating (n, sum x, sum x x^T) as
numpy partials per Arrow batch -- D x D floats per PARTITION, not per
row -- and the (D, D) eigenproblem is driver-side linear algebra on a
64 x 64 matrix, the same split as operators/clustering.py (k x D
centroid traffic) and operators/bpe.py (vocab-sized merge loop).

Sign convention: eigenvectors are sign-ambiguous, so each component is
flipped to make its largest-|coefficient| entry positive -- projections
are then deterministic given the fitted model.

EXACT INTEGER MOMENTS (r9, the same hardening as the exact-integer
k-means): inputs quantize once to the repo-standard 1e-6 grid and the
(n, sum x, sum x x^T) accumulation is pure integer -- int64 inside each
Arrow partial with an overflow-guarded flush, arbitrary-precision
python int across partials (shipped as decimal strings; driver traffic
is still O(D^2)). The covariance matrix handed to ``eigh`` is therefore
a pure function of the data CONTENT -- identical under any
partitioning, task order, or batch size -- where the old float partials
drifted with addition order. What remains float is the driver-side
eigendecomposition itself: deterministic given the (now deterministic)
moment matrix on a given LAPACK build, but not expressible in SQL,
which is why semdedup_survivors stays a rows-only catalog entry.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: list[float]
    components: list[list[float]]  # (k, D) rows = principal axes
    explained_variance_ratio: list[float]
    n: int


# second level of the moment reduce: partials re-sum Arrow-side down to
# this many partitions before collect, so driver traffic is O(D^2), not
# O(corpus_partitions x D^2) -- at D=1024 on 10^5 partitions the naive
# collect would ship hundreds of GB to the driver.
_COMBINE_PARTITIONS = 32


def _moments(emb: DataFrame, vec_col: str) -> DataFrame:
    """(n, sum iv, sum iv iv^T) EXACT integer partials on the 1e-6 grid:
    one row per input partition (more only if the int64 overflow guard
    flushes), tree-combined down to <= _COMBINE_PARTITIONS rows before
    collect. Sums travel as decimal strings so the combine stage can
    accumulate in arbitrary-precision python int -- no float addition
    anywhere, so the moment set is a pure function of the data content.

    Validation (no NULL vectors, uniform dimension) happens INSIDE the
    partials kernel, so the fit stays a single corpus scan -- a NULL or
    ragged column raises a clear ValueError from the task instead of an
    opaque numpy shape/object-dtype error (fit_pca re-surfaces it
    driver-side). Dimension agreement ACROSS partitions is checked on
    the collected partials."""
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        SCALE,
        _grid_int64,
    )

    schema = "n long, s array<string>, ss array<string>"
    # flush a partial before its |ss| entries could cross this; the
    # next batch's worst-case increment is checked against the headroom
    _SS_CAP = 1 << 61

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        d = None
        s = ss = None

        def emit():
            return pd.DataFrame(
                {
                    "n": [n],
                    "s": [[str(int(v)) for v in s]],
                    "ss": [[str(int(v)) for v in ss.ravel()]],
                }
            )

        for pdf in batches:
            col = pdf[vec_col]
            if col.isna().any():
                raise ValueError(
                    f"{vec_col} has NULL vectors; filter or impute first"
                )
            if not len(col):
                continue
            lens = col.map(len)
            if d is None:
                d = int(lens.iloc[0])
                s = np.zeros(d, dtype=np.int64)
                ss = np.zeros((d, d), dtype=np.int64)
            if (lens != d).any():
                raise ValueError(
                    f"{vec_col} dimensions vary within a partition"
                )
            # _grid_int64, not np.round: the moments must sit on the
            # SAME grid integers as every other quantizer (Spark
            # int_embedding / DuckDB round(x*1e6) are HALF_UP;
            # np.round is half-to-even -- ADVICE r9)
            X = _grid_int64(np.array(list(col), dtype=np.float64))
            # overflow guard: flush the running partial if adding this
            # batch could push any |ss| entry past the cap (python-int
            # arithmetic on the bound itself, so the check cannot wrap)
            peak = int(np.abs(X).max(initial=0))
            if n and int(np.abs(ss).max()) + len(X) * peak * peak > _SS_CAP:
                yield emit()
                n, s, ss = 0, np.zeros(d, np.int64), np.zeros((d, d), np.int64)
            if len(X) * peak * peak > _SS_CAP:
                raise ValueError(
                    f"{vec_col} magnitudes too large for exact int64 "
                    f"moment accumulation (|x| ~ {peak / SCALE:.1f})"
                )
            n += len(X)
            s += X.sum(axis=0)
            ss += X.T @ X
        if n:
            yield emit()

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s: list[int] | None = None
        ss: list[int] | None = None
        for pdf in batches:
            for _, r in pdf.iterrows():
                rs = [int(v) for v in r["s"]]
                rss = [int(v) for v in r["ss"]]
                if s is None:
                    s, ss = [0] * len(rs), [0] * len(rss)
                if len(rs) != len(s):
                    raise ValueError("dimensions vary across partitions")
                n += int(r["n"])
                s = [a + b for a, b in zip(s, rs)]
                ss = [a + b for a, b in zip(ss, rss)]
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "s": [[str(v) for v in s]],
                    "ss": [[str(v) for v in ss]],
                }
            )

    part = emb.select(vec_col).mapInPandas(partials, schema=schema)
    if part.rdd.getNumPartitions() <= _COMBINE_PARTITIONS:
        return part  # already driver-sized: skip the second Arrow stage
    # repartition, NOT coalesce: coalesce is a narrow dependency that
    # would collapse the scan+partials pipeline itself into
    # _COMBINE_PARTITIONS tasks, serializing the O(N*D^2) accumulation
    # onto 32 cores of a 1000-executor cluster. The shuffle moves one
    # (1 + D + D^2)-double row per original partition -- cheap.
    return part.repartition(_COMBINE_PARTITIONS).mapInPandas(
        combine, schema=schema
    )


def fit_pca(
    emb: DataFrame, k: int, vec_col: str = "embedding"
) -> PCAModel:
    """Fit top-``k`` principal components. ONE corpus scan (validation
    rides the partials kernel); the reduce payload is one
    (1 + D + D*D)-float row per partition, tree-combined to
    <= _COMBINE_PARTITIONS rows before the driver collect."""
    if k < 1:
        raise ValueError("k must be >= 1")
    try:
        rows = _moments(emb, vec_col).collect()
    except Exception as exc:  # re-surface kernel validation as ValueError
        msg = str(exc)
        for marker in ("NULL vectors", "dimensions vary"):
            if marker in msg:
                raise ValueError(
                    f"{vec_col} validation failed: {marker} "
                    "(filter or impute first)"
                ) from None
        raise
    if not rows:
        raise ValueError("empty input")
    dims = {len(r["s"]) for r in rows}
    if len(dims) > 1:
        raise ValueError(f"{vec_col} dimensions vary across partitions: {sorted(dims)}")
    d = dims.pop()
    if k > d:
        raise ValueError(f"k={k} exceeds dimension {d}")
    # exact python-int sums: order-free, so no sort is needed for
    # determinism anymore -- the float world only starts below, from a
    # moment set that is a pure function of the data content
    from taxi_data_pipeline_pset2_spark.operators.similarity import SCALE

    n = sum(int(r["n"]) for r in rows)
    s_int = [0] * d
    ss_int = [0] * (d * d)
    for r in rows:
        for i, v in enumerate(r["s"]):
            s_int[i] += int(v)
        for i, v in enumerate(r["ss"]):
            ss_int[i] += int(v)
    if n < 2:
        raise ValueError("need at least 2 vectors")
    s = np.array([float(v) for v in s_int]) / SCALE
    ss = np.array([float(v) for v in ss_int]).reshape(d, d) / (SCALE * SCALE)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, D)
    # sign fix: largest-|coef| entry positive
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total_var = float(np.clip(evals.sum(), 1e-300, None))
    ratios = [float(evals[j] / total_var) for j in order]
    return PCAModel(
        mean=mean.tolist(),
        components=comps.tolist(),
        explained_variance_ratio=ratios,
        n=int(n),
    )


def project_pca(
    emb: DataFrame,
    model: PCAModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """(id, out_col): centered projections onto the model's components.
    The model broadcasts; one matmul per Arrow batch. A NULL vector
    projects to NULL (row-local NULL-in/NULL-out, the media-kernel
    discipline) -- fit_pca raises on NULLs by contract, but transform
    may legitimately see rows the fit filtered out, and one None must
    not TypeError the whole task."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast((np.array(model.mean), np.array(model.components)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps = b.value
        for pdf in batches:
            vecs = list(pdf[vec_col])
            ok = [i for i, v in enumerate(vecs) if v is not None]
            out: list = [None] * len(vecs)
            if ok:
                X = np.array([vecs[i] for i in ok], dtype=np.float64)
                proj = (X - mean) @ comps.T
                for j, i in enumerate(ok):
                    out[i] = proj[j].tolist()
            yield pd.DataFrame({id_col: pdf[id_col], out_col: out})

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, {out_col} array<double>"
    )


def l2_normalize(vec_col: str = "embedding"):
    """Expression: unit-normalized copy of an array<float/double> column
    (NULL-safe; a zero vector stays zero rather than dividing by 0)."""
    v = F.col(vec_col)
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.when(
        norm > 0, F.transform(v, lambda x: x / norm)
    ).otherwise(v)
