"""Maximal Marginal Relevance re-ranking of similarity-search results
(Carbonell & Goldstein, SIGIR'98) -- the standard diversification
post-pass: from a query's top-N candidates, greedily pick the item
maximizing lam * relevance - (1 - lam) * max_similarity_to_already_
picked, so near-duplicate neighbors don't crowd out coverage. In a
training-data pipeline this is the retrieval-side twin of SemDeDup:
dedup the RESULT SET instead of the corpus.

Plan shape: the candidate set per query is top-N (operator contract:
N is small -- it came out of knn_topk), so the greedy loop runs inside
``applyInPandas`` per query group: one shuffle on query_id, an N x N
numpy similarity matrix per group, never corpus-sized state. The greedy
selection is sequential BY DEFINITION (each pick conditions the next),
which is why this is a legitimate python-kernel group op rather than a
Catalyst expression.

Determinism: int-scaled vectors (the similarity.py contract), ties on
the MMR score break by lower neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.similarity import _prepared


def mmr_rerank(
    neighbors: DataFrame,
    emb: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-rank a (query_id, neighbor_id, cosine) frame (e.g. from
    ``knn_topk`` with a larger k) down to ``k`` diverse picks per query.
    Returns (query_id, neighbor_id, mmr_rank, relevance, mmr_score)."""
    import numpy as np
    import pandas as pd

    prep = _prepared(emb, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "iv", "norm2"
    )
    cands = neighbors.select("query_id", "neighbor_id", F.col("cosine").alias("rel")).join(
        prep, "neighbor_id"
    )

    out_schema = (
        "query_id long, neighbor_id long, mmr_rank int, "
        "relevance double, mmr_score double"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        X = np.array(list(pdf["iv"]), dtype=np.int64)  # (N, D)
        norms = np.sqrt(pdf["norm2"].to_numpy(dtype=np.float64))
        # an all-zero vector (every |component| < 5e-7 on the grid) has
        # norm 0: without the floor its similarity column is 0/0 = NaN,
        # and np.argmax over a NaN-bearing mmr vector returns the NaN
        # index -- the degenerate vector would be greedily picked with
        # mmr_score = NaN. Flooring to 1 makes its similarities exactly
        # 0 (the zero vector is orthogonal to everything).
        norms = np.where(norms == 0.0, 1.0, norms)
        sim = (X @ X.T) / (norms[:, None] * norms[None, :])  # exact int dots
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        n = len(pdf)
        picked: list[int] = []
        scores: list[float] = []
        remaining = list(range(n))
        while remaining and len(picked) < k:
            if picked:
                penalty = sim[np.ix_(remaining, picked)].max(axis=1)
            else:
                penalty = np.zeros(len(remaining))
            mmr = lam * rel[remaining] - (1.0 - lam) * penalty
            best = int(np.argmax(mmr))  # ties: lowest index = lowest id
            picked.append(remaining.pop(best))
            scores.append(float(mmr[best]))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[picked].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].iloc[picked].to_numpy(),
                "mmr_rank": np.arange(1, len(picked) + 1, dtype=np.int32),
                "relevance": rel[picked],
                "mmr_score": np.array(scores),
            }
        )

    return (
        cands.groupBy("query_id")
        .applyInPandas(run, schema=out_schema)
        .orderBy("query_id", "mmr_rank")
    )
