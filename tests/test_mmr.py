"""MMR re-ranking: brute-force reference equality, diversity behavior
on planted duplicate candidates, lambda extremes, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.mmr import mmr_rerank
from taxi_data_pipeline_pset2_spark.operators.similarity import knn_topk
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def _neighbors(spark, sf_dir, n=10):
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.col("vec_id") < 5
    return emb, knn_topk(emb, q, k=n).select(
        "query_id", "neighbor_id", "cosine"
    )


def test_mmr_matches_bruteforce_reference(spark, sf_dir):
    import numpy as np

    emb, nb = _neighbors(spark, sf_dir)
    k, lam = 5, 0.7
    got = mmr_rerank(nb, emb, k=k, lam=lam).collect()

    # python reference with the same int-scaled vectors
    vecs = {
        r.vec_id: np.array(
            [round(float(x) * 1e6) for x in r.embedding], dtype=np.int64
        )
        for r in emb.collect()
    }
    by_q: dict = {}
    for r in nb.collect():
        by_q.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))
    want = {}
    for qid, cands in by_q.items():
        cands = sorted(cands)  # by neighbor id, like the kernel
        ids = [c[0] for c in cands]
        rel = {c[0]: c[1] for c in cands}
        picked = []
        while len(picked) < k and len(picked) < len(ids):
            best, best_s = None, None
            for i in ids:
                if i in picked:
                    continue
                pen = 0.0
                if picked:
                    pen = max(
                        float(vecs[i] @ vecs[j])
                        / (
                            float(np.linalg.norm(vecs[i].astype(float)))
                            * float(np.linalg.norm(vecs[j].astype(float)))
                        )
                        for j in picked
                    )
                s = lam * rel[i] - (1 - lam) * pen
                if best_s is None or s > best_s + 1e-12:
                    best, best_s = i, s
            picked.append(best)
        want[qid] = picked
    got_by_q: dict = {}
    for r in got:
        got_by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got_by_q == want


def test_mmr_skips_duplicate_candidates(spark, sf_dir):
    """Two identical candidate vectors: plain top-k keeps both adjacent;
    MMR must not pick the second copy right after the first."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    qid = emb.orderBy("vec_id").limit(1).collect()[0].vec_id
    # duplicate the query's BEST neighbor so both copies rank at the top
    base_nb = knn_topk(emb, F.col("vec_id") == qid, k=1).collect()
    top_id = base_nb[0].neighbor_id
    top_vec = emb.filter(F.col("vec_id") == top_id).collect()[0]
    dup = spark.createDataFrame(
        [(7_000_000, list(top_vec.embedding), top_vec.label)], emb.schema
    )
    emb2 = emb.unionByName(dup)
    nb = knn_topk(emb2, F.col("vec_id") == qid, k=10).select(
        "query_id", "neighbor_id", "cosine"
    )
    pairs = {r.neighbor_id: r.cosine for r in nb.collect()}
    assert 7_000_000 in pairs and top_id in pairs  # both copies candidates
    got = [
        r.neighbor_id
        for r in mmr_rerank(nb, emb2, k=4, lam=0.5).collect()
    ]
    # the identical pair must not occupy adjacent MMR ranks
    assert top_id in got
    if 7_000_000 in got:
        assert abs(got.index(top_id) - got.index(7_000_000)) > 1


def test_mmr_lambda_one_is_pure_relevance(spark, sf_dir):
    emb, nb = _neighbors(spark, sf_dir)
    got = mmr_rerank(nb, emb, k=5, lam=1.0).collect()
    by_q: dict = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.mmr_rank, r.relevance))
    for ranks in by_q.values():
        rels = [rel for _, rel in sorted(ranks)]
        assert rels == sorted(rels, reverse=True)


def test_mmr_deterministic(spark, sf_dir):
    emb, nb = _neighbors(spark, sf_dir)
    a = [(r.query_id, r.neighbor_id) for r in mmr_rerank(nb, emb, k=5).collect()]
    b = [(r.query_id, r.neighbor_id) for r in mmr_rerank(nb, emb, k=5).collect()]
    assert a == b
