"""Product-quantization tests: codebook shape, encode determinism,
ADC-vs-numpy equality, recall against exact brute force, compression."""

import numpy as np
import pytest

from taxi_data_pipeline_pset2_spark.operators.pq import (
    encode_pq,
    search_pq,
    train_pq,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(42)
    # 400 vectors in 4 well-separated 32-d gaussian clusters
    centers = rng.normal(0, 5, (4, 32))
    X = np.concatenate(
        [centers[i] + rng.normal(0, 1, (100, 32)) for i in range(4)]
    )
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, X


class TestTrainEncode:
    def test_codebook_shape_and_determinism(self, spark, emb_df):
        df, _ = emb_df
        cb1 = train_pq(df, m=4, k=8, n_iter=5)
        cb2 = train_pq(df.repartition(7), m=4, k=8, n_iter=5)
        assert cb1.shape == (4, 8, 8)
        np.testing.assert_array_equal(cb1, cb2)  # sample is id-ordered

    def test_dim_validation(self, spark, emb_df):
        df, _ = emb_df
        with pytest.raises(ValueError, match="not divisible"):
            train_pq(df, m=5, k=8)

    def test_encode_codes_in_range(self, spark, emb_df):
        df, X = emb_df
        cb = train_pq(df, m=4, k=8, n_iter=5)
        codes = encode_pq(df, cb).collect()
        assert len(codes) == len(X)
        for r in codes:
            assert len(r.codes) == 4
            assert all(0 <= c < 8 for c in r.codes)

    def test_encode_matches_numpy(self, spark, emb_df):
        df, X = emb_df
        cb = train_pq(df, m=4, k=8, n_iter=5)
        got = {r.vec_id: list(r.codes) for r in encode_pq(df, cb).collect()}
        dsub = 8
        for i in [0, 57, 399]:
            want = [
                int(
                    ((cb[s] - X[i, s * dsub : (s + 1) * dsub]) ** 2)
                    .sum(axis=1)
                    .argmin()
                )
                for s in range(4)
            ]
            assert got[i] == want


class TestSearch:
    def test_adc_matches_numpy(self, spark, emb_df):
        df, X = emb_df
        cb = train_pq(df, m=4, k=8, n_iter=5)
        codes_df = encode_pq(df, cb)
        q = X[123]
        out = search_pq(codes_df, cb, [float(v) for v in q], top_k=5).collect()
        # manual ADC
        codes = {r.vec_id: np.array(r.codes) for r in codes_df.collect()}
        dsub = 8
        lut = np.stack(
            [((cb[s] - q[s * dsub : (s + 1) * dsub]) ** 2).sum(axis=1) for s in range(4)]
        )
        manual = sorted(
            (float(lut[np.arange(4), c].sum()), i) for i, c in codes.items()
        )[:5]
        assert [r.vec_id for r in out] == [i for _, i in manual]
        for r, (d, _) in zip(out, manual):
            assert r.adc_dist == pytest.approx(d, abs=1e-5)

    def test_recall_vs_bruteforce(self, spark, emb_df):
        df, X = emb_df
        # m=16/k=64 resolves intra-cluster noise (m=8/k=16 gives ~0.25
        # here -- recall among 100 near-duplicates needs fine cells)
        cb = train_pq(df, m=16, k=64, n_iter=10)
        codes_df = encode_pq(df, cb).persist()
        hits = 0
        for qi in [5, 150, 250, 350]:
            exact = set(
                np.argsort(((X - X[qi]) ** 2).sum(axis=1))[:10].tolist()
            )
            approx = {
                r.vec_id
                for r in search_pq(
                    codes_df, cb, [float(v) for v in X[qi]], top_k=10
                ).collect()
            }
            hits += len(exact & approx)
        recall = hits / 40
        assert recall >= 0.5, f"recall@10 {recall}"

    def test_query_dim_validation(self, spark, emb_df):
        df, _ = emb_df
        cb = train_pq(df, m=4, k=8, n_iter=2)
        with pytest.raises(ValueError, match="query dim"):
            search_pq(encode_pq(df, cb), cb, [0.0] * 31)

    def test_compression_ratio(self, spark, emb_df):
        df, X = emb_df
        cb = train_pq(df, m=4, k=8, n_iter=2)
        # 32 floats (128 bytes f32) -> 4 codes of 3 bits; stored as ints
        # the logical compression is D*4 bytes -> m*ceil(log2 k)/8
        logical = (32 * 4) / (4 * np.ceil(np.log2(8)) / 8)
        assert logical > 80  # ~85x


class TestIvfPq:
    def test_recall_and_cell_pruning(self, spark, emb_df):
        from taxi_data_pipeline_pset2_spark.operators.pq import ivfpq_search

        import numpy as np

        df, X = emb_df
        hits = 0
        for qi in [5, 150, 250, 350]:
            out = ivfpq_search(
                df,
                [float(v) for v in X[qi]],
                n_cells=4,
                n_probe=2,
                m=16,
                k=64,
                top_k=10,
                kmeans_iter=4,
            ).collect()
            assert len(out) == 10
            # pruning: results come from at most n_probe cells
            assert len({r.cell for r in out}) <= 2
            exact = set(
                np.argsort(((X - X[qi]) ** 2).sum(axis=1))[:10].tolist()
            )
            hits += len(exact & {r.vec_id for r in out})
        recall = hits / 40
        assert recall >= 0.5, f"ivfpq recall@10 {recall}"

    def test_query_finds_own_neighborhood(self, spark, emb_df):
        from taxi_data_pipeline_pset2_spark.operators.pq import ivfpq_search

        df, X = emb_df
        out = ivfpq_search(
            df, [float(v) for v in X[42]], n_cells=4, n_probe=1,
            m=8, k=16, top_k=5, kmeans_iter=4,
        ).collect()
        # all results from the query's own gaussian cluster (ids 0..99)
        assert all(0 <= r.vec_id < 100 for r in out)
