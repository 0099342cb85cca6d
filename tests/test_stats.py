"""Grouped linear regression and weighted percentile semantics vs
numpy / hand-computed references."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.robust import weighted_percentile
from taxi_data_pipeline_pset2_spark.operators.stats import grouped_linreg


def test_linreg_matches_numpy_polyfit(spark):
    rng = np.random.RandomState(7)
    rows = []
    for g, (a, b) in {"g1": (2.5, -3.0), "g2": (-0.75, 10.0)}.items():
        xs = rng.uniform(0, 100, 40).round(2)
        ys = (a * xs + b + rng.normal(0, 1, 40)).round(2)
        rows += [(g, float(x), float(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: (r.slope, r.intercept, r.r2) for r in grouped_linreg(df, "x", "y", ["g"]).collect()}
    for g in ("g1", "g2"):
        xs = np.array([x for gg, x, _ in rows if gg == g])
        ys = np.array([y for gg, _, y in rows if gg == g])
        slope, intercept = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert got[g][0] == pytest.approx(slope, abs=1e-5)
        assert got[g][1] == pytest.approx(intercept, abs=1e-4)
        assert got[g][2] == pytest.approx(r * r, abs=1e-5)


def test_linreg_degenerate_groups(spark):
    rows = [("one", 1.0, 5.0),               # n=1
            ("flat", 2.0, 1.0), ("flat", 2.0, 9.0),  # zero x-variance
            ("ok", 0.0, 0.0), ("ok", 1.0, 2.0),
            ("nulls", None, 1.0), ("nulls", 1.0, None),
            ("nulls", 0.0, 0.0), ("nulls", 2.0, 4.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r.g: r for r in grouped_linreg(df, "x", "y", ["g"]).collect()}
    assert got["one"].slope is None and got["flat"].slope is None
    assert got["ok"].slope == 2.0 and got["ok"].intercept == 0.0
    # NULL x or y rows excluded from the fit (n counts complete pairs)
    assert got["nulls"].n == 2 and got["nulls"].slope == 2.0


def test_weighted_percentile_by_mass(spark):
    # values 1..4 with weights 1,1,1,7: half the mass sits on value 4
    rows = [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 7.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = weighted_percentile(df, "v", "w", 0.5, ["g"]).collect()
    assert got[0]["wp_v"] == 4.0
    # unweighted (all-equal weights) p=0.5 -> classic lower median
    eq = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (10, 20, 30, 40)], "g string, v double, w double"
    )
    assert weighted_percentile(eq, "v", "w", 0.5, ["g"]).collect()[0]["wp_v"] == 20.0
    with pytest.raises(ValueError):
        weighted_percentile(df, "v", "w", 0.0, ["g"])


def test_corr_matrix_matches_numpy(spark):
    import numpy as np
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.stats import corr_matrix

    rng = np.random.RandomState(5)
    x = rng.randn(200)
    rows = [
        (float(a), float(2 * a + 0.1 * rng.randn()), float(rng.randn()))
        for a in x
    ]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {
        (r.col_a, r.col_b): (r.n, r.corr)
        for r in corr_matrix(df, ["a", "b", "c"]).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    arr = np.array(rows)
    for (ca, cb), (n, corr) in out.items():
        i, j = "abc".index(ca), "abc".index(cb)
        want = np.corrcoef(arr[:, i], arr[:, j])[0, 1]
        assert n == 200
        assert corr == pytest.approx(round(want, 6), abs=1e-5), (ca, cb)
    assert out[("a", "b")][1] > 0.99  # planted linear relation
    # NULL pairwise deletion + zero-variance guard
    df2 = spark.createDataFrame(
        [(1.0, None, 7.0), (2.0, 2.0, 7.0), (3.0, 1.0, 7.0)],
        "a double, b double, c double",
    )
    out2 = {
        (r.col_a, r.col_b): (r.n, r.corr)
        for r in corr_matrix(df2, ["a", "b", "c"]).collect()
    }
    assert out2[("a", "b")][0] == 2          # NULL row excluded pairwise
    assert out2[("a", "c")] == (3, None)     # constant column -> NULL
    import pytest as _p

    with _p.raises(ValueError):
        corr_matrix(df2, ["a"])


def test_mutual_information_extremes(spark):
    import math

    import pytest

    from taxi_data_pipeline_pset2_spark.operators.stats import mutual_information

    # perfect dependence: MI = H = ln 2 for a 50/50 binary, nmi = 1
    perfect = spark.createDataFrame(
        [("x", "p")] * 5 + [("y", "q")] * 5, "a string, b string"
    )
    r = mutual_information(perfect, "a", "b").collect()[0]
    assert r.mi == pytest.approx(math.log(2), abs=1e-5)
    assert r.nmi == pytest.approx(1.0, abs=1e-5)
    # independence: MI ~ 0
    indep = spark.createDataFrame(
        [(a, b) for a in "xy" for b in "pq" for _ in range(5)],
        "a string, b string",
    )
    r2 = mutual_information(indep, "a", "b").collect()[0]
    assert abs(r2.mi) < 1e-6 and abs(r2.nmi) < 1e-6
    # degenerate: constant column -> zero entropy -> NULL nmi, MI 0
    degen = spark.createDataFrame([("x", "p"), ("x", "q")], "a string, b string")
    r3 = mutual_information(degen, "a", "b").collect()[0]
    assert r3.mi == 0.0 and r3.nmi is None
    # NULL categories count as cohorts
    withnull = spark.createDataFrame(
        [("x", "p")] * 4 + [(None, "q")] * 4, "a string, b string"
    )
    r4 = mutual_information(withnull, "a", "b").collect()[0]
    assert r4.nmi == pytest.approx(1.0, abs=1e-5)


class TestPoissonBootstrapCI:
    def test_ci_brackets_mean_and_matches_clt_width(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            poisson_bootstrap_ci,
        )

        import numpy as np

        rng = np.random.default_rng(9)
        vals = rng.normal(100.0, 15.0, 2000)
        df = spark.createDataFrame(
            [(int(i), float(v)) for i, v in enumerate(vals)], "doc_id bigint, v double"
        )
        r = poisson_bootstrap_ci(df, "v", id_col="doc_id", n_boot=60).collect()[0]
        assert r["n"] == 2000
        assert r["ci_lo"] < r["mean"] < r["ci_hi"]
        # CLT 95% width = 2 * 1.96 * sd / sqrt(n); bootstrap should be
        # the same order (generous 2x factor band: 60 replicates is noisy)
        clt = 2 * 1.96 * vals.std() / np.sqrt(len(vals))
        width = r["ci_hi"] - r["ci_lo"]
        assert clt / 2 < width < clt * 2, (width, clt)

    def test_deterministic_and_grouped(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            poisson_bootstrap_ci,
        )

        df = spark.createDataFrame(
            [(i, "ab"[i % 2], float(i % 50)) for i in range(500)],
            "doc_id bigint, g string, v double",
        )
        a = sorted(map(tuple, poisson_bootstrap_ci(df, "v", ["g"]).collect()))
        b = sorted(
            map(tuple, poisson_bootstrap_ci(df.repartition(13), "v", ["g"]).collect())
        )
        assert a == b  # partitioning-independent
        assert len(a) == 2
        for row in a:
            assert row[3] <= row[2] <= row[4]  # ci_lo <= mean <= ci_hi

    def test_salt_changes_replicates_not_mean(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            poisson_bootstrap_ci,
        )

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(300)], "doc_id bigint, v double"
        )
        a = poisson_bootstrap_ci(df, "v", salt="s1").collect()[0]
        b = poisson_bootstrap_ci(df, "v", salt="s2").collect()[0]
        assert a["mean"] == b["mean"]
        assert (a["ci_lo"], a["ci_hi"]) != (b["ci_lo"], b["ci_hi"])

    def test_tiny_group_survives(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            poisson_bootstrap_ci,
        )

        df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "doc_id bigint, v double")
        r = poisson_bootstrap_ci(df, "v", n_boot=20).collect()[0]
        assert r["mean"] == 6.0
        assert r["ci_lo"] is not None and r["ci_hi"] is not None
        assert r["ci_lo"] <= r["ci_hi"]


class TestWelchTTest:
    def test_matches_numpy_reference(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import welch_ttest

        import numpy as np

        rng = np.random.default_rng(21)
        a = rng.normal(10.0, 2.0, 300)
        b = rng.normal(10.8, 5.0, 120)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t_ref = (a.mean() - b.mean()) / np.sqrt(se2)
        df_ref = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert r["n_a"] == 300 and r["n_b"] == 120
        assert r["mean_a"] == pytest.approx(a.mean(), abs=1e-5)
        assert r["t_stat"] == pytest.approx(t_ref, abs=1e-4)
        assert r["df"] == pytest.approx(df_ref, rel=1e-5)

    def test_degenerate_groups_null_stat(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import welch_ttest

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "g string, v double"
        )
        r = welch_ttest(df, "v", "g", "a", "b").collect()[0]
        assert r["mean_diff"] == -1.0
        assert r["t_stat"] is None and r["df"] is None  # zero variance
        df2 = spark.createDataFrame([("a", 1.0), ("b", 2.0)], "g string, v double")
        r2 = welch_ttest(df2, "v", "g", "a", "b").collect()[0]
        assert r2["t_stat"] is None  # n < 2


class TestMannWhitneyU:
    def test_matches_reference_with_ties(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import mannwhitney_u

        import numpy as np

        rng = np.random.default_rng(13)
        a = np.round(rng.normal(10, 3, 150), 0)  # heavy ties
        b = np.round(rng.normal(11, 3, 90), 0)
        rows = [("a", float(v)) for v in a] + [("b", float(v)) for v in b]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
        # reference: average ranks over pooled sample
        pooled = np.concatenate([a, b])
        order = np.argsort(pooled, kind="stable")
        ranks = np.empty(len(pooled))
        srt = pooled[order]
        i = 0
        while i < len(pooled):
            j = i
            while j + 1 < len(pooled) and srt[j + 1] == srt[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        na, nb = len(a), len(b)
        u_ref = ranks[:na].sum() - na * (na + 1) / 2
        assert r["u_a"] == pytest.approx(u_ref, abs=1e-6)
        assert r["auc"] == pytest.approx(u_ref / (na * nb), abs=1e-6)
        _, counts = np.unique(pooled, return_counts=True)
        tie_sum = float((counts**3 - counts).sum())
        n = na + nb
        var = na * nb / 12 * ((n + 1) - tie_sum / (n * (n - 1)))
        z_ref = (u_ref - na * nb / 2) / np.sqrt(var)
        assert r["z"] == pytest.approx(z_ref, abs=1e-5)

    def test_all_tied_gives_null_z(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import mannwhitney_u

        df = spark.createDataFrame(
            [("a", 5.0)] * 3 + [("b", 5.0)] * 4, "g string, v double"
        )
        r = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
        assert r["auc"] == 0.5 and r["z"] is None

    def test_consistent_with_binary_auc(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.evalmetrics import binary_auc
        from taxi_data_pipeline_pset2_spark.operators.stats import mannwhitney_u

        import numpy as np

        rng = np.random.default_rng(2)
        rows = [("ab"[i % 2], float(rng.integers(0, 20))) for i in range(200)]
        df = spark.createDataFrame(rows, "g string, v double")
        mwu = mannwhitney_u(df, "v", "g", "a", "b").collect()[0]
        auc = binary_auc(
            df.withColumn("y", df.g == "a"), "y", "v"
        ).collect()[0]
        assert mwu["auc"] == auc["auc"]


class TestCupedAdjustedTTest:
    def test_variance_reduction_and_reference(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            cuped_adjusted_ttest,
            welch_ttest,
        )

        import numpy as np

        rng = np.random.default_rng(31)
        n = 1200
        x = rng.normal(50, 10, n)  # pre-experiment covariate
        arm = np.array(["a", "b"])[rng.integers(0, 2, n)]
        y = 2.0 * x + (arm == "a") * 1.5 + rng.normal(0, 3, n)
        rows = [(str(g), float(xx), float(yy)) for g, xx, yy in zip(arm, x, y)]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        r = cuped_adjusted_ttest(df, "y", "x", "g", "a", "b").collect()[0]
        # theta ~ pooled cov/var
        xc = x - x.mean()
        theta_ref = (xc * (y - y.mean())).sum() / (xc * xc).sum()
        assert r["theta"] == pytest.approx(theta_ref, rel=1e-4)
        # adjusted means reference
        y_adj = y - theta_ref * (x - x.mean())
        ma = y_adj[arm == "a"].mean()
        mb = y_adj[arm == "b"].mean()
        assert r["mean_a_adj"] == pytest.approx(ma, abs=1e-4)
        assert r["mean_diff"] == pytest.approx(ma - mb, abs=1e-4)
        # the covariate explains most variance -> big reduction
        assert r["var_reduction"] > 0.9
        # and the adjusted test is far more sensitive than raw Welch
        w = welch_ttest(df, "y", "g", "a", "b").collect()[0]
        assert abs(r["t_stat"]) > 2 * abs(w["t_stat"])

    def test_constant_covariate_nulls(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            cuped_adjusted_ttest,
        )

        df = spark.createDataFrame(
            [("a", 1.0, 5.0), ("a", 1.0, 6.0), ("b", 1.0, 9.0), ("b", 1.0, 7.0)],
            "g string, x double, y double",
        )
        r = cuped_adjusted_ttest(df, "y", "x", "g", "a", "b").collect()[0]
        assert r["theta"] is None and r["t_stat"] is None


class TestSpearman:
    @staticmethod
    def _ref_rho(xs, ys):
        """Average-rank Spearman via numpy Pearson on fractional ranks."""
        import numpy as np

        def avg_ranks(v):
            v = np.asarray(v, dtype=float)
            order = np.argsort(v, kind="stable")
            ranks = np.empty(len(v))
            i = 0
            sv = v[order]
            while i < len(v):
                j = i
                while j + 1 < len(v) and sv[j + 1] == sv[i]:
                    j += 1
                ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
                i = j + 1
            return ranks

        rx, ry = avg_ranks(xs), avg_ranks(ys)
        c = np.corrcoef(rx, ry)
        return float(c[0, 1])

    def test_matches_numpy_reference_with_ties(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            spearman_corr,
        )

        xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 8.0]
        ys = [3.0, 1.0, 4.0, 4.0, 6.0, 9.0, 6.0, 10.0]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        row = spearman_corr(df, "x", "y").collect()[0]
        assert row.n == 8
        assert row.rho == pytest.approx(self._ref_rho(xs, ys), abs=1e-6)

    def test_perfect_monotone_and_reverse(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            spearman_corr,
        )

        xs = [1.0, 2.0, 3.0, 4.0]
        df = spark.createDataFrame(
            [(x, x * x * x, -x, "g") for x in xs],
            "x double, up double, down double, g string",
        )
        assert spearman_corr(df, "x", "up", ["g"]).collect()[0].rho == 1.0
        assert spearman_corr(df, "x", "down", ["g"]).collect()[0].rho == -1.0

    def test_constant_column_null_and_null_rows_excluded(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            spearman_corr,
        )

        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (None, 1.0), (4.0, None)],
            "x double, y double",
        )
        row = spearman_corr(df, "x", "y").collect()[0]
        assert row.n == 3  # NULL rows excluded before ranking
        assert row.rho is None  # zero rank variance in y

    def test_random_data_matches_reference_per_group(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.stats import (
            spearman_corr,
        )

        rng = random.Random(11)
        rows = [
            (g, float(rng.randint(0, 9)), float(rng.randint(0, 9)))
            for g in ("a", "b")
            for _ in range(40)
        ]
        df = spark.createDataFrame(rows, "g string, x double, y double")
        got = {r.g: r.rho for r in spearman_corr(df, "x", "y", ["g"]).collect()}
        for g in ("a", "b"):
            xs = [x for gg, x, _ in rows if gg == g]
            ys = [y for gg, _, y in rows if gg == g]
            assert got[g] == pytest.approx(self._ref_rho(xs, ys), abs=1e-6)


class TestTheilSen:
    def test_matches_numpy_median_of_slopes(self, spark):
        import numpy as np

        from taxi_data_pipeline_pset2_spark.operators.stats import theil_sen

        xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        ys = [2.0, 2.9, 4.2, 5.0, 6.1, 6.8]
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        row = theil_sen(df, "x", "y").collect()[0]
        slopes = [
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        ]
        exp_m = float(np.median(slopes))
        assert row.n == 6 and row.n_slopes == 15
        assert row.slope == pytest.approx(exp_m, abs=1e-6)
        exp_b = float(np.median([y - exp_m * x for x, y in zip(xs, ys)]))
        assert row.intercept == pytest.approx(exp_b, abs=1e-6)

    def test_robust_to_outlier_where_ols_is_not(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            grouped_linreg,
            theil_sen,
        )

        rows = [(float(i), 2.0 * i) for i in range(10)]
        rows[9] = (9.0, 500.0)  # one wild outlier
        df = spark.createDataFrame(rows, "x double, y double")
        ts = theil_sen(df, "x", "y").collect()[0]
        ols = grouped_linreg(df, "x", "y").collect()[0]
        assert ts.slope == pytest.approx(2.0, abs=0.1)
        assert ols.slope > 10  # least squares chased the outlier

    def test_no_pairs_yields_null_slope(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import theil_sen

        df = spark.createDataFrame(
            [("g", 1.0, 5.0), ("g", 1.0, 9.0), ("h", 2.0, 1.0)],
            "g string, x double, y double",
        )
        got = {r.g: r for r in theil_sen(df, "x", "y", ["g"]).collect()}
        assert got["g"].n == 2 and got["g"].n_slopes == 0
        assert got["g"].slope is None and got["g"].intercept is None
        assert got["h"].n_slopes == 0

    def test_group_cap_fails_loudly(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import theil_sen

        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(30)], "x double, y double"
        )
        with pytest.raises(Exception, match="max_group_rows"):
            theil_sen(df, "x", "y", max_group_rows=10).collect()


class TestInterarrivalStats:
    def test_periodic_vs_bursty(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            interarrival_stats,
        )

        rows = [
            ("cron", f"2024-01-01 00:{m:02d}:00") for m in range(0, 50, 10)
        ] + [
            ("burst", t)
            for t in (
                "2024-01-01 00:00:00", "2024-01-01 00:00:01",
                "2024-01-01 00:00:02", "2024-01-01 01:00:00",
                "2024-01-01 01:00:01",
            )
        ]
        df = spark.createDataFrame(rows, "k string, ts string").select(
            "k", F.col("ts").cast("timestamp").alias("ts")
        )
        got = {r.k: r for r in interarrival_stats(df, ["k"], "ts").collect()}
        assert got["cron"].mean_gap == 600.0
        assert got["cron"].sd_gap == 0.0
        assert got["cron"].burstiness == -1.0  # perfectly periodic
        assert got["burst"].burstiness > 0.2   # bursty (0.267 here)
        assert got["cron"].n_events == 5 and got["cron"].n_gaps == 4

    def test_single_event_and_simultaneous(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            interarrival_stats,
        )

        rows = [("solo", "2024-01-01 00:00:00")] + [
            ("same", "2024-01-01 00:00:00"),
            ("same", "2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "k string, ts string").select(
            "k", F.col("ts").cast("timestamp").alias("ts")
        )
        got = {r.k: r for r in interarrival_stats(df, ["k"], "ts").collect()}
        assert got["solo"].n_gaps == 0 and got["solo"].mean_gap is None
        # simultaneous events: gap 0, mean 0 -> cv/burstiness undefined
        assert got["same"].mean_gap == 0.0
        assert got["same"].cv is None and got["same"].burstiness is None

    def test_matches_numpy(self, spark):
        import random

        import numpy as np

        from taxi_data_pipeline_pset2_spark.operators.stats import (
            interarrival_stats,
        )

        rng = random.Random(9)
        secs = sorted(rng.sample(range(100000), 50))
        rows = [("u", s) for s in secs]
        df = spark.createDataFrame(rows, "k string, s long").select(
            "k", F.timestamp_seconds("s").alias("ts")
        )
        r = interarrival_stats(df, ["k"], "ts").collect()[0]
        gaps = np.diff(secs)
        assert r.mean_gap == pytest.approx(gaps.mean(), abs=1e-6)
        assert r.sd_gap == pytest.approx(gaps.std(), abs=1e-4)
        assert r.cv == pytest.approx(gaps.std() / gaps.mean(), abs=1e-6)


class TestMixDecomposition:
    def test_effects_sum_to_total_change(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.stats import (
            mix_decomposition,
        )

        rng = random.Random(14)
        base = [(rng.choice("ABC"), float(rng.randint(1, 100))) for _ in range(300)]
        comp = [(rng.choice("ABCD"), float(rng.randint(1, 120))) for _ in range(260)]
        db = spark.createDataFrame(base, "seg string, v double")
        dc = spark.createDataFrame(comp, "seg string, v double")
        rows = mix_decomposition(db, dc, "seg", "v").collect()
        total_effects = sum(
            r.within_effect + r.mix_effect + r.interaction for r in rows
        )
        mean_b = sum(v for _, v in base) / len(base)
        mean_c = sum(v for _, v in comp) / len(comp)
        assert total_effects == pytest.approx(mean_c - mean_b, abs=1e-4)

    def test_simpsons_paradox_surfaced(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            mix_decomposition,
        )

        # every segment IMPROVES, but the mix shifts toward the cheap
        # segment: the overall mean falls -- mix_effect must carry the drop
        base = [("hi", 100.0)] * 80 + [("lo", 10.0)] * 20
        comp = [("hi", 110.0)] * 20 + [("lo", 12.0)] * 80
        db = spark.createDataFrame(base, "seg string, v double")
        dc = spark.createDataFrame(comp, "seg string, v double")
        rows = {r.segment: r for r in mix_decomposition(db, dc, "seg", "v").collect()}
        assert rows["hi"].within_effect > 0 and rows["lo"].within_effect > 0
        assert rows["hi"].mix_effect < 0  # the real story
        total = sum(
            r.within_effect + r.mix_effect + r.interaction
            for r in rows.values()
        )
        assert total < 0  # overall mean fell despite per-segment gains

    def test_entering_segment_is_pure_mix(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.stats import (
            mix_decomposition,
        )

        db = spark.createDataFrame([("a", 10.0)], "seg string, v double")
        dc = spark.createDataFrame(
            [("a", 10.0), ("new", 50.0)], "seg string, v double"
        )
        rows = {r.segment: r for r in mix_decomposition(db, dc, "seg", "v").collect()}
        assert rows["new"].n_base == 0 and rows["new"].mean_base is None
        assert rows["new"].within_effect == 0.0  # w_base = 0
        assert rows["new"].mix_effect != 0.0


def test_mix_decomposition_empty_side_yields_null_weights(spark):
    """ANSI regression: an all-NULL-value (or empty) side makes the
    weight denominators 0 -- the rows must carry NULL effects, not
    crash with DIVIDE_BY_ZERO."""
    from taxi_data_pipeline_pset2_spark.operators.stats import mix_decomposition

    base = spark.createDataFrame(
        [("a", None), ("b", None)], "seg string, v double"
    )
    comp = spark.createDataFrame([("a", 4.0)], "seg string, v double")
    out = mix_decomposition(base, comp, "seg", "v").collect()
    assert len(out) >= 1  # no ANSI crash; rows flow through with NULLs
