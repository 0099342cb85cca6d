"""Product quantization for embedding-scale ANN (Jegou, Douze &
Schmid, TPAMI 2011 -- the FAISS IndexPQ design, re-expressed on Spark).

The 100 TB problem PQ solves: an exact float32 corpus of 10^10 x 1024-d
embeddings is ~40 TB -- too big to scan per query and too big to cache.
PQ splits each vector into ``m`` subvectors, k-means-quantizes each
subspace to ``k`` centroids, and stores only the m centroid ids:
m * ceil(log2 k) bits per vector (D=64, m=8, k=16 -> 4 bytes vs 256,
a 64x compression), searched by Asymmetric Distance Computation (ADC):
per query, one m x k lookup table of exact query-to-centroid squared
distances, then every stored code scores as a sum of m table gathers --
no float vector is ever touched at query time.

Spark mapping of the three phases:

 - TRAIN: codebooks fit on a DETERMINISTIC BOUNDED SAMPLE (first
   ``train_cap`` ids) with driver-side numpy Lloyd per subspace --
   the FAISS convention (codebooks are m*k*D/m floats; fitting them
   on the full corpus buys nothing but cost). Init = first k sample
   vectors per subspace; empty clusters keep their previous centroid;
   everything is deterministic, no RNG.
 - ENCODE: one ``mapInPandas`` pass; per Arrow batch the subspace
   argmins are m small matmuls. Output (id, codes array<int>) -- the
   compressed corpus, the only thing the search path ever scans.
 - SEARCH (ADC): the query's m x k LUT broadcasts (tiny); a second
   Arrow kernel gathers+sums per batch; TakeOrdered returns top-k.

Composition: ``knn_ivf`` (operators/similarity.py) prunes WHICH
vectors to score; PQ compresses HOW each vector is stored/scored --
production ANN (IVFPQ) stacks both.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lloyd(X: "np.ndarray", k: int, n_iter: int) -> "np.ndarray":
    """Deterministic EXACT-INTEGER numpy Lloyd (r9, the same update
    rule as the distributed operators/clustering.py): X int64 on the
    1e-6 grid, init = first k rows, centroids stay on the grid via
    round_half_up(S/n) = floor((2S+n)/(2n)) from exact component sums,
    argmin ties to the lowest code, empty clusters keep their previous
    centroid. Returns (k, d) int64 -- every distance comparison
    downstream is an exact integer comparison, which is what lets the
    pq_ann_topk catalog entry carry a full unrolled DuckDB oracle."""
    cent = X[:k].copy()
    for _ in range(n_iter):
        d2 = (
            (X * X).sum(axis=1)[:, None]
            - 2 * (X @ cent.T)
            + (cent * cent).sum(axis=1)[None, :]
        )
        idx = d2.argmin(axis=1)
        for j in range(k):
            mask = idx == j
            if mask.any():
                S = X[mask].sum(axis=0)
                n = int(mask.sum())
                cent[j] = np.floor_divide(2 * S + n, 2 * n)
    return cent


# the repo-standard quantization grid and its int64-headroom cap
# (operators/similarity.py SCALE / MAX_ABS_IV): |iv| < 2^25 keeps every
# subspace (dsub <= 2048) dot and squared distance exact --
# dsub * (2 * 2^25)^2 < 2^63
from taxi_data_pipeline_pset2_spark.operators.similarity import (
    MAX_ABS_IV as _MAX_ABS,
    SCALE as _SCALE,
)


def _to_grid(X: "np.ndarray") -> "np.ndarray":
    # _grid_int64, NOT np.round: every quantizer in the repo (Spark
    # int_embedding, the DuckDB oracles' round(x * 1e6), this kernel)
    # must share HALF_UP tie-breaking -- np.round's half-to-even would
    # disagree on exact .5 products (ADVICE r9)
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _grid_int64,
    )

    iv = _grid_int64(np.asarray(X, dtype=np.float64))
    if iv.size and np.abs(iv).max() >= _MAX_ABS:
        raise ValueError(
            "component magnitudes too large for exact int64 PQ arithmetic"
        )
    return iv


def train_pq(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int = 50_000,
) -> "np.ndarray":
    """Fit PQ codebooks: returns (m, k, D/m) float64. D must divide by
    ``m``; the training sample is the first ``train_cap`` rows by id
    (deterministic across partitionings)."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .filter(F.col("v").isNotNull())
        .orderBy(id_col)
        .limit(train_cap)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need >= k={k} training vectors, got {len(rows)}")
    dims = {len(r["v"]) for r in rows}
    if len(dims) != 1:  # fail here, not as an opaque numpy shape error
        raise ValueError(f"mixed embedding dimensions in sample: {sorted(dims)}")
    X = _to_grid(np.array([r["v"] for r in rows], dtype=np.float64))  # (N, D)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    # public contract stays float64 centroids in ORIGINAL units; the
    # values sit on the 1e-6 grid, so every consumer kernel recovers
    # the exact integers with one round(x * SCALE)
    return (
        np.stack(
            [
                _lloyd(X[:, s * dsub : (s + 1) * dsub], k, n_iter)
                for s in range(m)
            ]
        ).astype(np.float64)
        / _SCALE
    )


def encode_pq(
    emb: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress the corpus: (id, codes array<int>), codes[s] = argmin
    centroid of subspace s. One Arrow pass, m small matmuls per batch."""
    import pandas as pd

    spark = emb.sparkSession
    m, k, dsub = codebooks.shape
    b = spark.sparkContext.broadcast(codebooks)

    def run(batches):
        # re-quantize the float codebooks: their values sit on the grid
        # by construction, so this recovers the fit's exact integers
        C = _to_grid(b.value)
        c_sq = (C * C).sum(axis=2)  # (m, k) exact int64
        for pdf in batches:
            X = _to_grid(np.array(list(pdf["v"]), dtype=np.float64))
            if X.shape[1] != m * dsub:
                raise ValueError(
                    f"embedding dim {X.shape[1]} != m*dsub {m * dsub}"
                )
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                # exact integer argmin; first min = lowest code id
                d2 = -2 * (Xs @ C[s].T) + c_sq[s][None, :]
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "codes": list(codes)})

    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).filter(F.col("v").isNotNull())
    return base.mapInPandas(run, schema=f"{id_col} long, codes array<int>")


def search_pq(
    codes_df: DataFrame,
    codebooks: "np.ndarray",
    query: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the compressed corpus: (id, adc_dist) ascending
    (squared-L2 approximation), ties by id. The query never meets a
    stored float vector -- only the broadcast m x k LUT."""
    import pandas as pd

    spark = codes_df.sparkSession
    m, k, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != {m * dsub}")
    qi = _to_grid(q)
    Ci = _to_grid(codebooks)
    # exact int64 LUT (grid^2 units): per-code ADC sums are then exact
    # integers -- cross-engine reproducible, ties deterministic
    lut = np.empty((m, k), dtype=np.int64)
    for s in range(m):
        diff = Ci[s] - qi[s * dsub : (s + 1) * dsub][None, :]
        lut[s] = (diff * diff).sum(axis=1)
    b = spark.sparkContext.broadcast(lut)

    def run(batches):
        L = b.value
        rows = np.arange(m)
        for pdf in batches:
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (N, m)
            # exact integer sum, reported in original squared units
            # (int < 2^53, so the double conversion is exact)
            dist = L[rows[None, :], codes].sum(axis=1) / (
                float(_SCALE) * float(_SCALE)
            )
            yield pd.DataFrame({id_col: pdf[id_col], "adc_dist": dist})

    scored = codes_df.mapInPandas(
        run, schema=f"{id_col} long, adc_dist double"
    )
    return (
        scored.orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(top_k)
        .select(id_col, F.round("adc_dist", 6).alias("adc_dist"))
    )


def ivfpq_search(
    emb: DataFrame,
    query: list[float],
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 8,
    k: int = 16,
    top_k: int = 10,
    kmeans_iter: int = 3,
    pq_iter: int = 10,
    train_cap: int = 50_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFPQ (the FAISS IndexIVFPQ composition): coarse k-means cells
    prune WHICH vectors get scored (scan ~n_probe/n_cells of the
    corpus), RESIDUAL product quantization compresses HOW -- codes
    encode x - centroid[cell], so each cell's codebook error is
    centered (the Jegou et al. 2011 design; unresidualized IVF+PQ
    wastes the codebook range on the coarse offsets).

    Flow: coarse assign (operators/clustering.py Lloyd, deterministic
    init) -> one Arrow pass emits residuals -> codebooks fit on the
    first ``train_cap`` residuals by id -> one Arrow pass encodes ->
    query ranks POPULATED cells driver-side against the same centroid
    table that partitioned the corpus, builds one per-probed-cell ADC
    LUT from (q - centroid[cell]), and a final Arrow kernel scores only
    rows in probed cells. Returns (id, cell, adc_dist) ascending, ties
    by id. Recall vs exact brute force pinned in tests/test_pq.py."""
    import pandas as pd

    from taxi_data_pipeline_pset2_spark.operators.clustering import (
        kmeans_fit_assign,
    )

    spark = emb.sparkSession
    q = np.asarray(query, dtype=np.float64)
    assigned, cents = kmeans_fit_assign(
        emb,
        k=n_cells,
        n_iter=kmeans_iter,
        id_col=id_col,
        vec_col=vec_col,
        return_centroids=True,
    )
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).filter(F.col("v").isNotNull())
    joined = base.join(
        assigned.select(id_col, F.col("cluster").alias("cell")), id_col
    )
    b_cents = spark.sparkContext.broadcast(cents)

    def make_residuals(batches):
        # residuals on the 1e-6 grid EXACTLY (r9): riv = iv_x - c_q as
        # integers, reported in original units. Float X - C would leave
        # the downstream re-quantization one ulp from a rounding
        # boundary; this form makes the residual grid value a pure
        # integer subtraction both engines reproduce.
        C = _to_grid(b_cents.value)
        for pdf in batches:
            Xi = _to_grid(np.array(list(pdf["v"]), dtype=np.float64))
            cells = pdf["cell"].to_numpy()
            R = (Xi - C[cells]).astype(np.float64) / _SCALE
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "cell": cells,
                    "v": list(R),
                }
            )

    residuals = joined.mapInPandas(
        make_residuals, schema=f"{id_col} long, cell int, v array<double>"
    ).persist()
    try:
        cb = train_pq(
            residuals.select(id_col, F.col("v").alias("embedding")),
            m=m,
            k=k,
            n_iter=pq_iter,
            id_col=id_col,
            train_cap=train_cap,
        )
        codes = encode_pq(
            residuals.select(id_col, "cell", F.col("v").alias("embedding")),
            cb,
            id_col=id_col,
        )
        # encode_pq drops extra columns; rejoin cell (node-sized join on id)
        codes = codes.join(residuals.select(id_col, "cell"), id_col)

        populated = sorted(
            r.cell for r in residuals.select("cell").distinct().collect()
        )
        # exact integer cell ranking (r9): d2 in grid^2 units; stable
        # argsort ties to the lower populated cell id -- no float sum
        # order anywhere in the probe decision
        qi = _to_grid(q)
        Ci = _to_grid(cents)
        d2cells = ((Ci[populated] - qi[None, :]) ** 2).sum(axis=1)
        probe = [populated[i] for i in np.argsort(d2cells, kind="stable")[:n_probe]]
        dsub = cb.shape[2]
        cbi = _to_grid(cb)
        luts = {}
        for c in probe:
            r = qi - Ci[c]  # exact integer query residual
            lut = np.empty((m, k), dtype=np.int64)
            for s in range(m):
                diff = cbi[s] - r[s * dsub : (s + 1) * dsub][None, :]
                lut[s] = (diff * diff).sum(axis=1)
            # kept int64: the ADC sum must be exact BEFORE the single
            # division to original units (per-entry division would
            # accumulate float error across the m gathers)
            luts[c] = lut
        b_luts = spark.sparkContext.broadcast(luts)

        def score(batches):
            L = b_luts.value
            rows = np.arange(m)
            for pdf in batches:
                if not len(pdf):
                    continue
                cds = np.array(list(pdf["codes"]), dtype=np.int64)
                cells = pdf["cell"].to_numpy()
                dist = np.empty(len(pdf), dtype=np.float64)
                for c, lut in L.items():
                    mask = cells == c
                    if mask.any():
                        # exact int64 sum, ONE division to original
                        # units (int < 2^53 -> exact double)
                        dist[mask] = lut[
                            rows[None, :], cds[mask]
                        ].sum(axis=1) / (float(_SCALE) * float(_SCALE))
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "cell": cells,
                        "adc_dist": dist,
                    }
                )

        scored = codes.filter(F.col("cell").isin(probe)).mapInPandas(
            score, schema=f"{id_col} long, cell int, adc_dist double"
        )
        return (
            scored.orderBy(F.asc("adc_dist"), F.asc(id_col))
            .limit(top_k)
            .select(
                id_col, "cell", F.round("adc_dist", 6).alias("adc_dist")
            )
        )
    finally:
        residuals.unpersist()
