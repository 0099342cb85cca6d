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
are then deterministic given the fitted model. Run-to-run the model
itself is stable to float addition order only (partials combine in
driver-sorted order, but upstream task scheduling can still reorder
rows within a partition after a repartition) -- tests pin agreement
with numpy to 1e-9, not bit equality; pin the MODEL artifact (not the
fit) for strict reproducibility, the same contract as k-means
centroids.
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
    """(n, sum x, sum x x^T) partials: one row per input partition,
    tree-combined down to <= _COMBINE_PARTITIONS rows before collect.

    Validation (no NULL vectors, uniform dimension) happens INSIDE the
    partials kernel, so the fit stays a single corpus scan -- a NULL or
    ragged column raises a clear ValueError from the task instead of an
    opaque numpy shape/object-dtype error (fit_pca re-surfaces it
    driver-side). Dimension agreement ACROSS partitions is checked on
    the collected partials."""
    schema = "n long, s array<double>, ss array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        d = None
        s = ss = None
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
                s = np.zeros(d)
                ss = np.zeros((d, d))
            if (lens != d).any():
                raise ValueError(
                    f"{vec_col} dimensions vary within a partition"
                )
            X = np.array(list(col), dtype=np.float64)
            n += len(X)
            s += X.sum(axis=0)
            ss += X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = ss = None
        for pdf in batches:
            for _, r in pdf.iterrows():
                rs = np.asarray(r["s"], dtype=np.float64)
                rss = np.asarray(r["ss"], dtype=np.float64)
                if s is None:
                    s, ss = np.zeros(len(rs)), np.zeros(len(rss))
                if len(rs) != len(s):
                    raise ValueError("dimensions vary across partitions")
                n += int(r["n"])
                s += rs
                ss += rss
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.tolist()]}
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
    # combine in a fixed (sorted) order so the driver-side sum is
    # deterministic given the same partial set
    rows = sorted(rows, key=lambda r: (r["n"], r["s"]))
    n = sum(r["n"] for r in rows)
    s = np.sum([np.array(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.array(r["ss"]).reshape(d, d) for r in rows], axis=0)
    if n < 2:
        raise ValueError("need at least 2 vectors")
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
    The model broadcasts; one matmul per Arrow batch."""
    sc = emb.sparkSession.sparkContext
    b = sc.broadcast((np.array(model.mean), np.array(model.components)))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mean, comps = b.value
        for pdf in batches:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            proj = (X - mean) @ comps.T if len(X) else np.zeros((0, len(comps)))
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [p.tolist() for p in proj]}
            )

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
