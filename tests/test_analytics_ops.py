"""Unit tests: Benford audit, PMI collocations, RFM segmentation."""

import math

import pytest

from taxi_data_pipeline_pset2_spark.operators.profiling import benford_audit
from taxi_data_pipeline_pset2_spark.operators.segmentation import rfm_segments
from taxi_data_pipeline_pset2_spark.operators.text import pmi_collocations


class TestBenfordAudit:
    def test_digit_extraction_and_exclusions(self, spark):
        df = spark.createDataFrame(
            [(123.45,), (0.071,), (-800.0,), (0.0,), (None,), (9.0,)],
            "x double",
        )
        rows = {r.digit: r for r in benford_audit(df, "x").collect()}
        assert len(rows) == 9  # all digits present, zero-filled
        assert rows["1"].n == 1  # 123.45
        assert rows["7"].n == 1  # 0.071
        assert rows["8"].n == 1  # -800 (sign ignored)
        assert rows["9"].n == 1
        assert rows["2"].n == 0
        total = sum(r.n for r in rows.values())
        assert total == 4  # 0.0 and NULL excluded

    def test_benford_distribution_scores_low_chi2(self, spark):
        # Log-uniform over exactly 10 decades -> near-perfect Benford
        vals = [(10.0 ** (i / 2000.0),) for i in range(20000)]
        df = spark.createDataFrame(vals, "x double")
        rows = benford_audit(df, "x").collect()
        chi2 = sum(r.chi2_contrib for r in rows)
        assert chi2 < 30
        r1 = [r for r in rows if r.digit == "1"][0]
        assert r1.frac_observed == pytest.approx(math.log10(2), abs=0.01)

    def test_uniform_distribution_flagged(self, spark):
        # Uniform 100..999: each first digit ~1/9 -- wildly non-Benford
        df = spark.createDataFrame(
            [(float(v),) for v in range(100, 1000)], "x double"
        )
        chi2 = sum(r.chi2_contrib for r in benford_audit(df, "x").collect())
        assert chi2 > 100

    def test_power_of_ten_digit(self, spark):
        # the float-log pitfall case: exact powers of ten
        df = spark.createDataFrame(
            [(1000.0,), (10.0,), (0.001,)], "x double"
        )
        rows = {r.digit: r for r in benford_audit(df, "x").collect()}
        assert rows["1"].n == 3


class TestPmiCollocations:
    def test_glued_pair_ranks_first(self, spark):
        # "new york" always together; "the" everywhere dilutes its PMI
        docs = [
            ("new york is big",),
            ("the new york subway",),
            ("visit new york now",),
            ("the cat sat on the mat",),
            ("the dog ran to the cat",),
        ] * 3
        df = spark.createDataFrame(docs, "text string")
        # min_count=4: the x3-replicated singleton pairs (count 3) are
        # excluded -- at count 3 "dog ran" would legitimately out-PMI
        # "new york" (rarer unigrams), the classic low-count pathology
        out = pmi_collocations(df, min_count=4, top_k=10).collect()
        assert (out[0].w1, out[0].w2) == ("new", "york")
        assert out[0].n_pair == 9
        # reference PMI
        tu = sum(len(d[0].split()) for d in docs)
        tb = sum(len(d[0].split()) - 1 for d in docs)
        ref = math.log((9 / tb) / ((9 / tu) * (9 / tu)))
        assert out[0].pmi == pytest.approx(ref, abs=1e-5)

    def test_min_count_suppresses_hapax(self, spark):
        df = spark.createDataFrame(
            [("alpha beta",), ("gamma delta gamma delta",)], "text string"
        )
        out = pmi_collocations(df, min_count=2, top_k=10).collect()
        pairs = {(r.w1, r.w2) for r in out}
        assert ("alpha", "beta") not in pairs
        assert ("gamma", "delta") in pairs

    def test_empty_and_single_token_docs(self, spark):
        df = spark.createDataFrame([("solo",), ("a b a b",)], "text string")
        out = pmi_collocations(df, min_count=2, top_k=10).collect()
        assert {(r.w1, r.w2) for r in out} == {("a", "b")}


class TestRfmSegments:
    def test_scores_and_convention(self, spark):
        import datetime as dt

        rows = []
        # customer c{i}: i orders of 100 each, last order day i
        for i in range(1, 11):
            for j in range(i):
                rows.append(
                    (i, dt.datetime(2024, 1, min(1 + i, 28)), 100.0)
                )
        df = spark.createDataFrame(rows, "c int, d timestamp, amt double")
        out = {r.customer: r for r in rfm_segments(df, "c", "d", "amt").collect()}
        # customer 10: most recent, most frequent, biggest spend -> 555
        assert out[10].rfm == 555
        assert out[1].rfm == 111
        assert out[10].frequency == 10
        assert out[10].monetary == pytest.approx(1000.0)
        assert out[10].recency_days == 0
        assert out[1].recency_days == 9

    def test_ntile_sizes_balanced(self, spark):
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, 1 + (i % 28)), float(i))
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "c int, d timestamp, amt double")
        out = rfm_segments(df, "c", "d", "amt").collect()
        from collections import Counter

        for col in ("r_score", "f_score", "m_score"):
            counts = Counter(getattr(r, col) for r in out)
            assert set(counts) == {1, 2, 3, 4, 5}
            assert all(v == 20 for v in counts.values())

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, None, 1.0)], "c int, d timestamp, amt double")
        with pytest.raises(ValueError):
            rfm_segments(df, "c", "d", "amt", n_bins=1)

    def test_unknown_metric_scores_worst_not_best(self, spark):
        """r11 finding: NULLS LAST put a customer with no dated order in
        the TOP recency tile and a NULL total spend in the TOP monetary
        tile. Unknown must rank at the metric's worst end."""
        import datetime as dt

        rows = [
            (i, dt.datetime(2024, 1, i), 100.0 * i) for i in range(1, 10)
        ]
        rows.append((99, None, None))  # activity, but no date and no amount
        df = spark.createDataFrame(rows, "c int, d timestamp, amt double")
        out = {r.customer: r for r in rfm_segments(df, "c", "d", "amt").collect()}
        assert out[99].recency_days is None
        assert out[99].monetary is None
        assert out[99].r_score == 1
        assert out[99].m_score == 1
        # the genuinely-best customer still tops every tile
        assert out[9].rfm == 555
