"""Association-rule tests: hand-computed example, width cap, filters."""

import pytest

from taxi_data_pipeline_pset2_spark.operators.basket import association_rules


def _rows(df):
    return {(r.item_a, r.item_b): r for r in df.collect()}


class TestAssociationRules:
    def test_hand_example(self, spark):
        # 4 baskets: {a,b,c} {a,b} {a,c} {d}
        data = [
            (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"),
            (3, "a"), (3, "c"),
            (4, "d"),
        ]
        df = spark.createDataFrame(data, "b int, i string")
        out = _rows(association_rules(df, "b", "i", min_support=0.01))
        ab = out[("a", "b")]
        assert ab.n_ab == 2 and ab.n_a == 3 and ab.n_b == 2
        assert ab.support == pytest.approx(0.5)
        assert ab.conf_a_b == pytest.approx(2 / 3, abs=1e-6)
        assert ab.conf_b_a == pytest.approx(1.0)
        # lift(a,b) = (2/4) / ((3/4)*(2/4)) = 4/3
        assert ab.lift == pytest.approx(4 / 3, abs=1e-6)
        assert ("a", "c") in out and ("b", "c") in out
        # d co-occurs with nothing
        assert not any("d" in k for k in out)

    def test_duplicates_collapse_and_nulls_dropped(self, spark):
        data = [
            (1, "a"), (1, "a"), (1, "b"),
            (2, "a"), (2, "b"),
            (None, "a"), (2, None),
        ]
        df = spark.createDataFrame(data, "b int, i string")
        out = _rows(association_rules(df, "b", "i", min_support=0.01))
        assert out[("a", "b")].n_ab == 2  # dup (1,a) counted once
        assert out[("a", "b")].support == pytest.approx(1.0)

    def test_width_cap_drops_basket(self, spark):
        wide = [(1, f"i{k}") for k in range(5)] + [(2, "i0"), (2, "i1")]
        df = spark.createDataFrame(wide, "b int, i string")
        out = _rows(association_rules(df, "b", "i", min_support=0.01,
                                      max_basket_items=4))
        # basket 1 (5 items) excluded entirely, incl. from n_baskets
        assert set(out) == {("i0", "i1")}
        assert out[("i0", "i1")].support == pytest.approx(1.0)

    def test_min_support_filters(self, spark):
        data = [(k, "a") for k in range(10)] + [(k, "b") for k in range(10)]
        data += [(0, "c")]  # (a,c)/(b,c) support 0.1
        df = spark.createDataFrame(data, "b int, i string")
        out = _rows(association_rules(df, "b", "i", min_support=0.5))
        assert set(out) == {("a", "b")}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "b int, i string")
        with pytest.raises(ValueError):
            association_rules(df, "b", "i", min_support=0.0)
        with pytest.raises(ValueError):
            association_rules(df, "b", "i", max_basket_items=1)


class TestItemSimilarity:
    def test_hand_computed_cosine(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.basket import (
            item_similarity,
        )

        # baskets: ab ab abc c c
        rows = (
            [("b1", i) for i in "ab"]
            + [("b2", i) for i in "ab"]
            + [("b3", i) for i in "abc"]
            + [("b4", "c"), ("b5", "c")]
        )
        df = spark.createDataFrame(rows, "bk string, item string")
        out = item_similarity(df, "bk", "item", min_cooccur=1, top_k=5)
        got = {(r.item, r.neighbor): (r.n_ab, r.cosine) for r in out.collect()}
        # n_a=3, n_b=3, n_c=3; ab co-occurs 3x, ac/bc 1x
        assert got[("a", "b")] == (3, 1.0)
        assert got[("b", "a")] == (3, 1.0)
        assert got[("a", "c")][0] == 1
        assert got[("a", "c")][1] == pytest.approx(1 / 3, abs=1e-6)
        # ranking: b's best neighbor is a, then c
        ranks = {
            (r.item, r.rank): r.neighbor for r in out.collect()
        }
        assert ranks[("b", 1)] == "a" and ranks[("b", 2)] == "c"

    def test_min_cooccur_and_topk(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.basket import (
            item_similarity,
        )

        rows = (
            [("b1", i) for i in "ab"]
            + [("b2", i) for i in "ab"]
            + [("b3", i) for i in "ac"]
        )
        df = spark.createDataFrame(rows, "bk string, item string")
        out = item_similarity(df, "bk", "item", min_cooccur=2, top_k=1)
        got = {(r.item, r.neighbor) for r in out.collect()}
        # ac co-occurs once -> filtered; only the ab edge survives
        assert got == {("a", "b"), ("b", "a")}

    def test_symmetric_pairs(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.basket import (
            item_similarity,
        )

        rng = random.Random(2)
        rows = [
            (f"b{i}", rng.choice("pqrst"))
            for i in range(40)
            for _ in range(3)
        ]
        df = spark.createDataFrame(rows, "bk string, item string")
        out = item_similarity(df, "bk", "item", min_cooccur=1, top_k=99)
        got = {(r.item, r.neighbor): r.cosine for r in out.collect()}
        for (a, b), c in got.items():
            assert got[(b, a)] == c  # cosine is symmetric
