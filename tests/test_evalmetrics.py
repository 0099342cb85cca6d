"""Model-evaluation metrics vs from-scratch numpy references.

The catalog oracles (auc_order_status, calibration_price_prob,
kappa_price_status, decile_lift_orders) prove DuckDB equivalence; these
tests prove the METRICS themselves are right -- tie-aware average-rank
AUC, reliability bins, chance-corrected kappa, exact rank tiles --
against independent numpy implementations on adversarial small data.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
    binary_auc,
    calibration_bins,
    cohen_kappa,
    decile_lift,
    expected_calibration_error,
)


def _ref_auc(y: np.ndarray, s: np.ndarray) -> float:
    """Average-rank Mann-Whitney AUC (ties get average ranks)."""
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s), dtype=float)
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and sorted_s[j + 1] == sorted_s[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_matches_numpy_with_ties(spark):
    rng = np.random.default_rng(7)
    n = 400
    y = rng.integers(0, 2, n)
    # quantized scores force heavy ties
    s = np.round(rng.normal(loc=y * 0.8, scale=1.0, size=n), 1)
    df = spark.createDataFrame(
        [(bool(a), float(b)) for a, b in zip(y, s)], "y boolean, s double"
    )
    got = binary_auc(df, "y", "s").collect()[0]
    assert got["n_pos"] == int(y.sum())
    assert got["n_neg"] == n - int(y.sum())
    assert got["auc"] == pytest.approx(_ref_auc(y, s), abs=1e-6)


def test_auc_grouped_and_degenerate(spark):
    rows = [
        # group a: perfect separation -> 1.0
        ("a", True, 10.0), ("a", True, 9.0), ("a", False, 1.0), ("a", False, 2.0),
        # group b: all scores tied -> 0.5
        ("b", True, 5.0), ("b", False, 5.0), ("b", True, 5.0), ("b", False, 5.0),
        # group c: inverted -> 0.0
        ("c", True, 1.0), ("c", False, 9.0),
        # group d: no negatives -> NULL
        ("d", True, 3.0), ("d", True, 4.0),
        # group e: NULL score/label rows excluded entirely
        ("e", True, None), ("e", None, 1.0), ("e", True, 2.0), ("e", False, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, y boolean, s double")
    out = {r["g"]: r for r in binary_auc(df, "y", "s", ["g"]).collect()}
    assert out["a"]["auc"] == 1.0
    assert out["b"]["auc"] == 0.5
    assert out["c"]["auc"] == 0.0
    assert out["d"]["auc"] is None
    assert out["e"]["auc"] == 1.0 and out["e"]["n_pos"] == 1


def test_calibration_bins_and_ece(spark):
    rng = np.random.default_rng(11)
    n = 500
    p = rng.uniform(0, 1, n)
    y = rng.uniform(0, 1, n) < p  # well-calibrated by construction
    df = spark.createDataFrame(
        [(bool(a), float(b)) for a, b in zip(y, p)], "y boolean, p double"
    )
    bins = {r["bin"]: r for r in calibration_bins(df, "y", "p", 10).collect()}
    # numpy reference
    idx = np.minimum((p * 10).astype(int), 9)
    for b in range(10):
        m = idx == b
        if not m.any():
            assert b not in bins
            continue
        r = bins[b]
        assert r["n"] == int(m.sum())
        assert r["n_pos"] == int(y[m].sum())
        assert r["conf"] == pytest.approx(p[m].mean(), abs=1e-5)
        assert r["acc"] == pytest.approx(y[m].mean(), abs=1e-6)
        assert r["gap"] == pytest.approx(abs(y[m].mean() - p[m].mean()), abs=1e-5)
    ece_row = expected_calibration_error(df, "y", "p", 10).collect()[0]
    ref_ece = sum(
        (idx == b).sum() / n * abs(y[idx == b].mean() - p[idx == b].mean())
        for b in range(10)
        if (idx == b).any()
    )
    assert ece_row["n"] == n
    assert ece_row["ece"] == pytest.approx(ref_ece, abs=1e-5)
    assert ece_row["ece"] < 0.1  # calibrated by construction
    assert ece_row["mce"] >= ece_row["ece"]


def test_calibration_excludes_out_of_range(spark):
    df = spark.createDataFrame(
        [(True, 0.0), (False, 1.0), (True, 1.5), (False, -0.1), (True, None)],
        "y boolean, p double",
    )
    rows = calibration_bins(df, "y", "p", 10).collect()
    assert sum(r["n"] for r in rows) == 2  # only p=0.0 and p=1.0 kept
    assert {r["bin"] for r in rows} == {0, 9}  # p=1.0 clamps into bin 9


def test_cohen_kappa_reference(spark):
    # classic textbook table: 2 raters, 3 categories
    #      B=x  B=y  B=z
    # A=x   20    5    5
    # A=y   10   15    5
    # A=z    5    5   30
    rows = (
        [("x", "x")] * 20 + [("x", "y")] * 5 + [("x", "z")] * 5
        + [("y", "x")] * 10 + [("y", "y")] * 15 + [("y", "z")] * 5
        + [("z", "x")] * 5 + [("z", "y")] * 5 + [("z", "z")] * 30
    )
    df = spark.createDataFrame(rows, "a string, b string")
    n = len(rows)
    po = (20 + 15 + 30) / n
    pe = (30 * 35 + 30 * 25 + 40 * 40) / (n * n)
    want = (po - pe) / (1 - pe)
    got = cohen_kappa(df, "a", "b").collect()[0]
    assert got["n"] == n
    assert got["po"] == pytest.approx(po, abs=1e-6)
    assert got["pe"] == pytest.approx(pe, abs=1e-6)
    assert got["kappa"] == pytest.approx(want, abs=1e-6)


def test_cohen_kappa_edges(spark):
    # perfect agreement -> kappa 1; NULL==NULL counts as agreement
    df = spark.createDataFrame(
        [("x", "x"), ("y", "y"), (None, None)], "a string, b string"
    )
    got = cohen_kappa(df, "a", "b").collect()[0]
    assert got["po"] == 1.0 and got["kappa"] == 1.0
    # both raters constant -> pe = 1 -> NULL kappa
    df2 = spark.createDataFrame([("x", "x"), ("x", "x")], "a string, b string")
    got2 = cohen_kappa(df2, "a", "b").collect()[0]
    assert got2["pe"] == 1.0 and got2["kappa"] is None


def test_decile_lift_exact_tiles(spark):
    rng = np.random.default_rng(3)
    n = 237  # deliberately not divisible by 10
    s = np.round(rng.uniform(0, 100, n), 0)  # ties across rows
    y = rng.uniform(0, 100, n) < s  # higher score -> more positives
    df = spark.createDataFrame(
        [(int(i), float(sc), bool(lb)) for i, (sc, lb) in enumerate(zip(s, y))],
        "k bigint, s double, y boolean",
    )
    rows = decile_lift(df, "y", "s", "k", 10).collect()
    assert [r["tile"] for r in rows] == list(range(1, 11))
    assert sum(r["n"] for r in rows) == n
    assert sum(r["n_pos"] for r in rows) == int(y.sum())
    # numpy reference: rank by (-s, k), tile = floor((rank-1)*10/n)+1
    order = np.lexsort((np.arange(n), -s))
    tiles_ref = np.empty(n, dtype=int)
    tiles_ref[order] = (np.arange(n) * 10) // n + 1
    for r in rows:
        m = tiles_ref == r["tile"]
        assert r["n"] == int(m.sum())
        assert r["n_pos"] == int(y[m].sum())
    # monotone cumulative gain ending at 1.0; top decile lift > 1
    assert rows[-1]["cum_gain"] == pytest.approx(1.0, abs=1e-6)
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains)
    assert rows[0]["lift"] > 1.0


def test_decile_lift_tile_sizes_match_formula(spark):
    # 23 rows, 4 tiles: sizes by floor formula are 6/6/6/5
    df = spark.createDataFrame(
        [(i, float(i), i % 2 == 0) for i in range(23)], "k bigint, s double, y boolean"
    )
    rows = decile_lift(df, "y", "s", "k", 4).collect()
    assert [r["n"] for r in rows] == [6, 6, 6, 5]


def test_retrieval_eval_hand_computed(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import retrieval_eval

    runs = spark.createDataFrame(
        # q1: rel docs at ranks 1 and 3; q2: none relevant; q3: rank 2 only
        [("q1", "a", 1), ("q1", "b", 2), ("q1", "c", 3),
         ("q2", "a", 1), ("q2", "b", 2),
         ("q3", "x", 1), ("q3", "y", 2),
         ("q3", "z", 9)],  # rank 9 > k=3 is ignored
        "query_id string, doc_id string, rank bigint",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1.0), ("q1", "c", 1.0), ("q1", "zz", 1.0),
         ("q3", "y", 2.0), ("q3", "w", 1.0),
         ("q4", "a", 1.0)],  # q4 has no run rows -> scores 0 (r11)
        "query_id string, doc_id string, rel double",
    )
    out = {r["query_id"]: r for r in retrieval_eval(runs, qrels, k=3).collect()}
    assert set(out) == {"q1", "q2", "q3", "q4"}
    q4 = out["q4"]
    assert (q4["n_rel"], q4["hits"], q4["precision_at_k"], q4["rr"]) == (
        1, 0, 0.0, 0.0
    )
    assert q4["recall_at_k"] == 0.0 and q4["ndcg_at_k"] == 0.0
    import math

    q1 = out["q1"]
    assert q1["n_rel"] == 3 and q1["hits"] == 2
    assert q1["precision_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["recall_at_k"] == pytest.approx(2 / 3, abs=1e-6)
    assert q1["rr"] == 1.0
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-5)

    q2 = out["q2"]
    assert q2["n_rel"] == 0 and q2["hits"] == 0
    assert q2["recall_at_k"] is None and q2["rr"] == 0.0
    assert q2["ndcg_at_k"] is None  # no qrels -> IDCG 0

    q3 = out["q3"]
    assert q3["hits"] == 1 and q3["rr"] == 0.5
    # graded: run DCG = 2/log2(3); ideal = 2/log2(2) + 1/log2(3)
    dcg3 = 2 / math.log2(3)
    idcg3 = 2 / math.log2(2) + 1 / math.log2(3)
    assert q3["ndcg_at_k"] == pytest.approx(dcg3 / idcg3, abs=1e-5)


def test_retrieval_eval_perfect_run(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import retrieval_eval

    runs = spark.createDataFrame(
        [("q", "a", 1), ("q", "b", 2)], "query_id string, doc_id string, rank bigint"
    )
    qrels = spark.createDataFrame(
        [("q", "a", 2.0), ("q", "b", 1.0)],
        "query_id string, doc_id string, rel double",
    )
    r = retrieval_eval(runs, qrels, k=2).collect()[0]
    assert r["precision_at_k"] == 1.0
    assert r["recall_at_k"] == 1.0
    assert r["rr"] == 1.0
    assert r["ndcg_at_k"] == 1.0  # run order matches ideal order


def test_rrf_fuse_hand_computed(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import rrf_fuse

    runs = spark.createDataFrame(
        # run1 ranks: a=1, b=2, c=3 ; run2 ranks: b=1, a=2, d=3
        [("q", "a", 1, "r1"), ("q", "b", 2, "r1"), ("q", "c", 3, "r1"),
         ("q", "b", 1, "r2"), ("q", "a", 2, "r2"), ("q", "d", 3, "r2")],
        "query_id string, doc_id string, rank bigint, run_id string",
    )
    out = rrf_fuse(runs, k=60).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # a: 1/61 + 1/62 ; b: 1/62 + 1/61 (tie with a, doc id breaks it)
    assert by_doc["a"]["rrf_score"] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert by_doc["a"]["rrf_score"] == by_doc["b"]["rrf_score"]
    assert by_doc["a"]["fused_rank"] == 1 and by_doc["b"]["fused_rank"] == 2
    # c (1/63) and d (1/63) tie at ranks 3/4 by doc id
    assert by_doc["c"]["fused_rank"] == 3 and by_doc["d"]["fused_rank"] == 4
    assert rrf_fuse(runs, k=60, top=2).count() == 2


def test_rrf_consensus_beats_single_run_winner(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import rrf_fuse

    # x is rank 2 in all three runs; y is rank 1 once, absent twice
    rows = [("q", "x", 2, r) for r in ("a", "b", "c")] + [("q", "y", 1, "a")]
    runs = spark.createDataFrame(
        rows, "query_id string, doc_id string, rank bigint, run_id string"
    )
    out = {r["doc_id"]: r["fused_rank"] for r in rrf_fuse(runs).collect()}
    assert out["x"] == 1 and out["y"] == 2


def _pava_ref(pos, cnt):
    """O(n^2) reference PAVA: pool any adjacent violator until stable."""
    blocks = [[p, c] for p, c in zip(pos, cnt)]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][0] * blocks[i + 1][1] >= blocks[i + 1][0] * blocks[i][1]:
                a = blocks.pop(i + 1)
                blocks[i][0] += a[0]
                blocks[i][1] += a[1]
                changed = True
                break
    return blocks


def test_isotonic_matches_bruteforce_reference(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import fit_isotonic

    rng = np.random.default_rng(17)
    n = 600
    s = np.round(rng.uniform(0, 10, n), 0)
    y = rng.uniform(0, 12, n) < s  # noisy but increasing
    df = spark.createDataFrame(
        [(float(a), bool(b)) for a, b in zip(s, y)], "s double, y boolean"
    )
    rows = sorted(fit_isotonic(df, "y", "s").collect(), key=lambda r: r["score"])
    # build reference from per-score aggregates
    uniq = sorted(set(s))
    pos = [int(y[s == u].sum()) for u in uniq]
    cnt = [int((s == u).sum()) for u in uniq]
    blocks = _pava_ref(pos, cnt)
    # expand: walk blocks over the distinct scores by consumed count
    expanded = []
    import math

    for p, c in blocks:
        took = 0
        while took < c:
            idx = len(expanded)
            # same 6-dp expression as the kernel (floor half-up, not
            # python banker's round) so the equality stays bit-exact
            expanded.append(math.floor((p / c) * 1e6 + 0.5) / 1e6)
            took += cnt[idx]
    got = [r["fitted_p"] for r in rows]
    assert [r["score"] for r in rows] == [float(u) for u in uniq]
    assert got == expanded
    assert got == sorted(got)  # monotone


def test_isotonic_already_monotone_identity_and_groups(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import fit_isotonic

    # strictly increasing rates survive unchanged; decreasing pool to one
    rows = (
        [("inc", 1.0, False)] * 4 + [("inc", 1.0, True)] * 1
        + [("inc", 2.0, False)] * 2 + [("inc", 2.0, True)] * 2
        + [("inc", 3.0, True)] * 3
        + [("dec", 1.0, True)] * 3 + [("dec", 2.0, False)] * 3
    )
    df = spark.createDataFrame(rows, "g string, s double, y boolean")
    out = fit_isotonic(df, "y", "s", ["g"]).collect()
    inc = {r["score"]: r["fitted_p"] for r in out if r["g"] == "inc"}
    assert inc == {1.0: 0.2, 2.0: 0.5, 3.0: 1.0}
    dec = {r["score"]: r["fitted_p"] for r in out if r["g"] == "dec"}
    assert dec == {1.0: 0.5, 2.0: 0.5}  # violators pooled


class TestPinballLoss:
    def test_hand_computed_asymmetry(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.forecast import (
            pinball_loss,
        )

        # y=10 f=8 (under-forecast by 2); y=10 f=12 (over by 2)
        df = spark.createDataFrame(
            [(10.0, 8.0), (10.0, 12.0)], "y double, f double"
        )
        got = {r.q: r.pinball for r in pinball_loss(df, "y", "f", (0.9,)).collect()}
        # q=0.9: under costs 0.9*2=1.8, over costs 0.1*2=0.2 -> mean 1.0
        assert got[0.9] == 1.0

    def test_median_quantile_is_half_mae(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.forecast import (
            pinball_loss,
        )

        rng = random.Random(12)
        rows = [
            (float(rng.randint(0, 100)), float(rng.randint(0, 100)))
            for _ in range(60)
        ]
        df = spark.createDataFrame(rows, "y double, f double")
        r = pinball_loss(df, "y", "f", (0.5,)).collect()[0]
        mae = sum(abs(y - f) for y, f in rows) / len(rows)
        assert r.pinball == pytest.approx(mae / 2, abs=1e-6)

    def test_perfect_forecast_zero_and_validation(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.forecast import (
            pinball_loss,
        )

        df = spark.createDataFrame([(5.0, 5.0)], "y double, f double")
        assert pinball_loss(df, "y", "f", (0.5, 0.9)).collect()[0].pinball == 0.0
        with pytest.raises(ValueError, match="quantiles"):
            pinball_loss(df, "y", "f", (1.5,))


def test_cohen_kappa_empty_input_yields_null_metrics(spark):
    """ANSI regression: an empty input has n = 0 with non-null zero
    numerators -- the metrics must come back NULL, not DIVIDE_BY_ZERO."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import cohen_kappa

    empty = spark.createDataFrame([], "a string, b string")
    row = cohen_kappa(empty, "a", "b").collect()[0]
    assert row.n == 0 and row.po is None and row.pe is None and row.kappa is None


def test_ece_shares_bin_formula_and_validation(spark):
    """expected_calibration_error must reject n_bins < 1 exactly like
    calibration_bins (the shared _calibration_agg owns the formula)."""
    import pytest as _pytest

    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
        expected_calibration_error,
    )

    df = spark.createDataFrame([(1, 0.9), (0, 0.2)], "y int, p double")
    with _pytest.raises(ValueError, match="n_bins"):
        expected_calibration_error(df, "y", "p", n_bins=0)


def test_seasonal_naive_keeps_null_key_series(spark):
    """A NULL key value is a legitimate series: the time-shift
    self-join must pair it with itself (eqNullSafe), not silently drop
    the whole cohort."""
    from taxi_data_pipeline_pset2_spark.operators.forecast import (
        seasonal_naive_eval,
    )

    rows = [
        (None, f"2024-01-0{d} {h:02d}:00:00", float(10 * d + h))
        for d in (1, 2, 3)
        for h in (0, 1)
    ]
    df = spark.createDataFrame(
        rows, "zone string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = seasonal_naive_eval(
        df, ["zone"], "ts", "value", split_ts="2024-01-03 00:00:00",
        bucket="hour", season_buckets=24,
    ).collect()
    assert len(out) == 1 and out[0].zone is None
    assert out[0].n_train == 2 and out[0].n_test == 2


def test_nan_scores_excluded_like_null(spark):
    """Spark's total order ranks NaN above every real score: an
    undefined score must not occupy tile 1 / count as the most
    confident prediction (r11). NaN rows drop from auc, decile_lift
    and fit_isotonic exactly like NULL rows."""
    rows = [
        (1, True, float("nan")),
        (2, True, 10.0),
        (3, False, 5.0),
        (4, True, 8.0),
        (5, False, 1.0),
    ]
    df = spark.createDataFrame(rows, ["k", "y", "s"])
    clean = spark.createDataFrame(rows[1:], ["k", "y", "s"])

    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
        binary_auc,
        decile_lift,
        fit_isotonic,
    )

    got = binary_auc(df, "y", "s").collect()[0]
    want = binary_auc(clean, "y", "s").collect()[0]
    assert (got.n_pos, got.n_neg, got.auc) == (want.n_pos, want.n_neg, want.auc)
    assert got.n_pos == 2  # the NaN-scored positive is gone

    lift = decile_lift(df, "y", "s", "k", 4).collect()
    lift_clean = decile_lift(clean, "y", "s", "k", 4).collect()
    assert [r.asDict() for r in lift] == [r.asDict() for r in lift_clean]
    assert sum(r.n for r in lift) == 4

    iso = fit_isotonic(df, "y", "s").collect()
    assert all(not (r.score != r.score) for r in iso)  # no NaN score rows
    assert len(iso) == 4


def test_retrieval_eval_empty_result_query_scores_zero(spark):
    """trec_eval convention (r11): a query with relevant qrels but an
    empty top-k result list scores 0 -- it must not vanish from the
    output and silently inflate a macro-average."""
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
        retrieval_eval,
    )

    runs = spark.createDataFrame(
        [("q1", "d1", 1), ("q1", "d2", 2), ("q3", "d9", 7)],
        ["query_id", "doc_id", "rank"],
    )  # q3's only row is past k; q2 has no run rows at all
    qrels = spark.createDataFrame(
        [("q1", "d1", 1.0), ("q2", "d5", 2.0), ("q3", "d9", 1.0)],
        ["query_id", "doc_id", "rel"],
    )
    out = {r.query_id: r for r in retrieval_eval(runs, qrels, k=2).collect()}
    assert set(out) == {"q1", "q2", "q3"}
    for q in ("q2", "q3"):
        r = out[q]
        assert (r.hits, r.precision_at_k, r.recall_at_k, r.rr, r.ndcg_at_k) == (
            0, 0.0, 0.0, 0.0, 0.0
        )
        assert r.n_rel == 1 or q == "q2"
    assert out["q1"].hits == 1 and out["q1"].rr == 1.0


def test_rrf_negative_k_rejected(spark):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import rrf_fuse

    runs = spark.createDataFrame(
        [("q", "d", 1, "r1")], ["query_id", "doc_id", "rank", "run_id"]
    )
    with pytest.raises(ValueError, match="k must be >= 0"):
        rrf_fuse(runs, k=-1)


def test_ece_empty_input_reports_zero_n(spark):
    from taxi_data_pipeline_pset2_spark.operators.evalmetrics import (
        expected_calibration_error,
    )

    df = spark.createDataFrame([(True, 2.5)], ["y", "p"])  # out of range
    row = expected_calibration_error(df, "y", "p").collect()[0]
    assert row.n == 0 and row.ece is None and row.mce is None
