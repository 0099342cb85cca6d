"""Out-of-fold target encoding: hand-computed cells, leakage safety,
NULL-category cohort, unseen-category shrink to prior."""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.operators.encoding import target_encode_oof


def _df(spark, rows):
    return spark.createDataFrame(rows, "cat string, fold int, y double")


class TestTargetEncodeOof:
    def test_hand_computed_no_smoothing(self, spark):
        rows = [
            ("a", 0, 10.0), ("a", 0, 20.0),  # fold 0: sum 30, n 2
            ("a", 1, 40.0),                   # fold 1: sum 40, n 1
            ("b", 0, 100.0), ("b", 1, 200.0),
        ]
        out = target_encode_oof(_df(spark, rows), "cat", "y", "fold", 0.0)
        got = {(r.cat, r.fold): r for r in out.collect()}
        # a/fold0: oof = fold1 only -> mean 40
        assert got[("a", 0)].encoding == 40.0
        assert got[("a", 0)].n_oof == 1
        # a/fold1: oof = fold0 -> mean 15
        assert got[("a", 1)].encoding == 15.0
        # priors: fold0's prior = mean of fold1 rows = (40+200)/2
        assert got[("a", 0)].prior == 120.0

    def test_leakage_safety(self, spark):
        """Perturbing a row's own target must NOT move its own
        (cat, fold) encoding -- the defining property."""
        rows = [
            ("a", 0, 10.0), ("a", 1, 40.0), ("a", 2, 70.0),
            ("b", 0, 5.0), ("b", 1, 6.0), ("b", 2, 7.0),
        ]
        before = {
            (r.cat, r.fold): r.encoding
            for r in target_encode_oof(
                _df(spark, rows), "cat", "y", "fold", 5.0
            ).collect()
        }
        rows2 = [("a", 0, 99999.0)] + rows[1:]  # blow up a's fold-0 target
        after = {
            (r.cat, r.fold): r.encoding
            for r in target_encode_oof(
                _df(spark, rows2), "cat", "y", "fold", 5.0
            ).collect()
        }
        assert after[("a", 0)] == before[("a", 0)]  # own fold unmoved
        assert after[("a", 1)] != before[("a", 1)]  # other folds see it

    def test_smoothing_shrinks_rare_to_prior(self, spark):
        rows = [("rare", 0, 1000.0), ("rare", 1, 1000.0)] + [
            ("common", f, 10.0) for f in (0, 1) for _ in range(50)
        ]
        out = target_encode_oof(_df(spark, rows), "cat", "y", "fold", 100.0)
        got = {(r.cat, r.fold): r for r in out.collect()}
        r0 = got[("rare", 0)]
        # n_oof = 1 against smoothing 100: encoding sits near the prior
        assert abs(r0.encoding - r0.prior) < abs(1000.0 - r0.prior) * 0.05

    def test_null_category_is_a_cohort(self, spark):
        rows = [(None, 0, 10.0), (None, 1, 30.0), ("x", 0, 5.0), ("x", 1, 7.0)]
        out = target_encode_oof(_df(spark, rows), "cat", "y", "fold", 0.0)
        got = {(r.cat, r.fold): r.encoding for r in out.collect()}
        assert got[(None, 0)] == 30.0
        assert got[(None, 1)] == 10.0

    def test_zero_smoothing_single_fold_category_null(self, spark):
        rows = [("only0", 0, 50.0), ("z", 0, 1.0), ("z", 1, 2.0)]
        out = target_encode_oof(_df(spark, rows), "cat", "y", "fold", 0.0)
        got = {(r.cat, r.fold): r.encoding for r in out.collect()}
        # only0 never appears outside fold 0: 0/0 must be NULL, not NaN
        assert got[("only0", 0)] is None

    def test_negative_smoothing_rejected(self, spark):
        with pytest.raises(ValueError, match="smoothing"):
            target_encode_oof(
                _df(spark, [("a", 0, 1.0)]), "cat", "y", "fold", -1.0
            )


class TestHashedFeatures:
    def test_reference_equality(self, spark):
        import hashlib

        from taxi_data_pipeline_pset2_spark.operators.encoding import (
            hashed_features,
        )

        docs = [(1, "the cat sat"), (2, "the the dog"), (3, None), (4, "  ")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id, r.idx): r.weight
            for r in hashed_features(df, "text", "doc_id", dim=64).collect()
        }

        def ref(text):
            out = {}
            for tok in text.strip().lower().split():
                h = hashlib.md5(tok.encode()).hexdigest()
                idx = int(h[:8], 16) % 64
                sign = 1 if int(h[8], 16) % 2 == 0 else -1
                out[idx] = out.get(idx, 0) + sign
            return {k: v for k, v in out.items() if v != 0}

        want = {}
        for i, text in docs:
            if text and text.strip():
                for idx, w in ref(text).items():
                    want[(i, idx)] = w
        assert got == want

    def test_same_token_same_slot_across_docs(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.encoding import (
            hashed_features,
        )

        df = spark.createDataFrame(
            [(1, "apple"), (2, "apple banana")], "doc_id long, text string"
        )
        rows = hashed_features(df, "text", "doc_id", dim=128).collect()
        apple_slots = {r.idx for r in rows if r.id == 1}
        assert apple_slots <= {r.idx for r in rows if r.id == 2}

    def test_dim_validation(self, spark):
        import pytest as _pytest

        from taxi_data_pipeline_pset2_spark.operators.encoding import (
            hashed_features,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pytest.raises(ValueError, match="dim"):
            hashed_features(df, "text", "doc_id", dim=1)
