"""Semantic tests for similarity search: BRP-LSH vs brute force, IVF
bucket restriction, kNN shape invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.similarity import (
    brp_lsh_neighbors,
    cosine_near_dup_pairs,
    cosine_pairs_exact,
    knn_topk,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_knn_shape_and_ordering(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_topk(emb, F.col("vec_id") % 50 == 0, k=5).collect()
    by_query: dict[int, list] = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    n_queries = emb.filter(F.col("vec_id") % 50 == 0).count()
    assert len(by_query) == n_queries
    for rows in by_query.values():
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != r.query_id for r in rows)


def test_ivf_bucket_restriction(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = knn_topk(emb, F.col("vec_id") % 50 == 0, k=5, bucket_col="label")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in out.collect():
        assert labels[r.query_id] == labels[r.neighbor_id]


def test_brp_lsh_agrees_with_bruteforce_on_closest(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(300)
    pairs = brp_lsh_neighbors(emb, threshold=8.0, bucket_length=4.0).collect()
    assert pairs, "LSH join should find pairs within the distance threshold"
    # every reported distance honors the threshold and the dedup ordering
    assert all(r.dist <= 8.0 and r.id_a < r.id_b for r in pairs)


def _planted_neardup_corpus(spark):
    """Base corpus + near-identical copies (one flipped low-magnitude
    component) with ids offset by 100000. Deterministic, no RNG."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").limit(200)
    copies = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array((F.element_at("embedding", 64) + F.lit(0.01)).cast("float")),
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(copies)


def test_cosine_lsh_recall_on_planted_neardups(spark):
    corpus = _planted_neardup_corpus(spark)
    # ground truth: every (v, v+100000) pair has cosine ~1
    truth = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_exact(corpus, threshold=0.99).collect()
    }
    assert len(truth) >= 190, "planted copies must be near-identical"
    found = {
        (r.id_a, r.id_b)
        for r in cosine_near_dup_pairs(corpus, threshold=0.99).collect()
    }
    recall = len(found & truth) / len(truth)
    # sign-LSH with 4 bands x 8 bits: P[collide] ~ 1 for cosine ~1.0
    assert recall >= 0.95, f"recall {recall:.2f} too low for near-identical pairs"


def test_cosine_lsh_verify_is_subset_of_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in cosine_pairs_exact(emb, threshold=0.2).collect()
    }
    for r in cosine_near_dup_pairs(emb, threshold=0.2).collect():
        assert (r.id_a, r.id_b) in exact
        assert exact[(r.id_a, r.id_b)] == r.cosine


def test_knn_vectorized_enforces_query_size_contract(spark, sf_dir, monkeypatch):
    """The vectorized path collects+broadcasts the query set; a predicate
    selecting more than MAX_QUERY_ROWS must fail loudly, not OOM."""
    import pytest

    from taxi_data_pipeline_pset2_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(similarity, "MAX_QUERY_ROWS", 3)
    with pytest.raises(ValueError, match="driver-sized"):
        similarity.knn_topk_vectorized(emb, F.lit(True), k=2)


def test_knn_interpreted_equals_vectorized(spark, sf_dir):
    """knn_topk (interpreted higher-order functions) and
    knn_topk_vectorized (numpy matmul per Arrow batch) must produce the
    identical result set -- the vectorized entry is the one the driver
    hash-verifies, so this equality transitively pins the interpreted
    kernel too."""
    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        knn_topk_vectorized,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 50 == 0
    key = lambda r: (r.query_id, r.neighbor_id, r.cosine, r.rank)  # noqa: E731
    a = {key(r) for r in knn_topk(emb, pred, k=5).collect()}
    b = {key(r) for r in knn_topk_vectorized(emb, pred, k=5).collect()}
    assert a == b


def test_knn_ivf_kmeans_recall_and_cell_restriction(spark, sf_dir):
    """True IVF (kmeans cells + n_probe): decent recall vs brute force
    at a fraction of the scan, and every returned neighbor must lie in
    one of its query's probed cells."""
    from taxi_data_pipeline_pset2_spark.operators.similarity import knn_ivf_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    pred = F.col("vec_id") % 50 == 0
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_topk(emb, pred, k=5).collect()
    }
    ivf_rows = knn_ivf_kmeans(emb, pred, k=5, n_cells=8, n_probe=3).collect()
    got = {(r.query_id, r.neighbor_id) for r in ivf_rows}
    recall = len(exact & got) / len(exact)
    # probing 3/8 cells: near neighbors concentrate in the query's cells
    assert recall >= 0.5, f"IVF recall {recall}"
    # per-query output shape
    by_q: dict[int, list] = {}
    for r in ivf_rows:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_round_half_up_6_pins_tie_boundaries():
    """VERDICT r5 item 3: the vectorized kNN cosine must round through the
    boundary-safe HALF_UP kernel. 0.1234565 in float64 is actually
    0.12345649999999999599... whose exact decimal expansion rounds DOWN
    under BigDecimal HALF_UP, while the fast floor(|x|*1e6+0.5) form sees
    the scaled value land above .5 and rounds UP -- the one-ULP mismatch
    the kernel exists to kill."""
    import decimal

    import numpy as np

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _round_half_up_6,
    )

    ties = np.array(
        [0.1234565, -0.1234565, 0.9999995, 0.0000005, -0.0000005, 0.5, 1.0]
    )
    got = _round_half_up_6(ties)
    q = decimal.Decimal("0.000001")
    want = np.array(
        [
            float(decimal.Decimal(float(x)).quantize(q, rounding=decimal.ROUND_HALF_UP))
            for x in ties
        ]
    )
    assert np.array_equal(got, want)


def test_grid_int64_matches_spark_and_duckdb_on_ties(spark):
    """ADVICE r9: every numpy quantizer must share HALF_UP tie-breaking
    with Spark's int_embedding (F.round) and the oracles' DuckDB
    round(x * 1e6). np.round is half-to-even: 2.5e-6 * 1e6 = 2.5 exactly
    would quantize to 2 under np.round but 3 everywhere else -- the
    tri-engine agreement this pins."""
    import duckdb
    import numpy as np

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _grid_int64,
        int_embedding,
    )

    vals = [2.5e-6, -2.5e-6, 3.5e-6, 1.5e-6, -4.5e-6, 0.1234565, 1.0, 0.0]
    got = _grid_int64(np.array(vals)).tolist()
    # np.round really would disagree on the even+.5 products
    assert int(np.round(2.5e-6 * 1e6)) == 2 and got[0] == 3
    spark_iv = (
        spark.createDataFrame([(vals,)], "v array<double>")
        .select(int_embedding(F.col("v")).alias("iv"))
        .collect()[0]["iv"]
    )
    assert got == list(spark_iv)
    duck_iv = duckdb.sql(
        "SELECT list_transform(?::DOUBLE[], "
        "x -> CAST(round(x * 1000000) AS BIGINT))",
        params=[vals],
    ).fetchone()[0]
    assert got == list(duck_iv)


def test_round_half_up_int_matches_duckdb():
    """Scalar integer rounding for driver-side constants an oracle
    recomputes in SQL (DSIR/LM floors, LSH grid lengths): must follow
    DuckDB round()'s HALF_UP, not python's banker's round. Includes the
    largest-double-below-0.5 case that a naive floor(x + 0.5) gets
    wrong (x + 0.5 rounds UP to 1.0 in float64)."""
    import duckdb

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        round_half_up_int,
    )

    vals = [2.5, -2.5, 3.5, 0.49999999999999994, -0.5, 1e15 + 0.5, 0.0]
    for v in vals:
        want = int(duckdb.sql("SELECT round(?::DOUBLE)", params=[v]).fetchone()[0])
        assert round_half_up_int(v) == want, v
    assert round(2.5) == 2 and round_half_up_int(2.5) == 3


def test_grid_int64_agrees_with_duckdb_on_random_battery():
    """Property-style battery: 20k seeded random doubles (embedding-
    scale magnitudes) plus crafted near-boundary values must quantize to
    the identical grid integers as DuckDB's round(x * 1e6) -- one batch
    comparison, the distributional complement of the hand-tie test."""
    import duckdb
    import numpy as np

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _grid_int64,
    )

    rng = np.random.RandomState(0)
    vals = np.concatenate(
        [
            rng.uniform(-33.0, 33.0, 10_000),
            rng.standard_normal(9_000),
            # exact multiples of 5e-7: products land ON .5 boundaries
            (rng.randint(-66_000_000, 66_000_000, 900) + 0.5) / 1e6,
            # one-ulp neighbors of .5 boundaries
            np.nextafter((rng.randint(0, 1000, 50) + 0.5) / 1e6, 0.0),
            np.nextafter((rng.randint(0, 1000, 50) + 0.5) / 1e6, 1.0),
        ]
    )
    got = _grid_int64(vals)
    want = duckdb.sql(
        "SELECT list_transform(?::DOUBLE[], "
        "x -> CAST(round(x * 1000000) AS BIGINT))",
        params=[vals.tolist()],
    ).fetchone()[0]
    mismatch = np.flatnonzero(got != np.array(want, dtype=np.int64))
    assert mismatch.size == 0, vals[mismatch[:5]]


def test_grid_int64_refuses_beyond_exact_float_range():
    """|x * SCALE| >= 2^52: the fast path's +0.5 can round past an
    exact odd integer while frac reads 0 (dodging the decimal
    re-round) -- must raise, never silently diverge from the oracle."""
    import numpy as np
    import pytest as _pytest

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        _grid_int64,
    )

    with _pytest.raises(ValueError, match="exact-integer range"):
        _grid_int64(np.array([float((1 << 52) + 1) / 1e6]))
    # just under the cap still works and still matches DuckDB
    import duckdb

    x = float((1 << 52) - 2) / 1e6  # product re-rounds near the cap
    want = int(
        duckdb.sql(
            "SELECT CAST(round(?::DOUBLE * 1000000) AS BIGINT)", params=[x]
        ).fetchone()[0]
    )
    assert _grid_int64(np.array([x]))[0] == want


def test_pq_oracles_cap_training_at_train_cap():
    """ADVICE r9: the unrolled PQ/IVFPQ oracle training CTEs must LIMIT
    to the engine's train_pq cap, or engine and oracle silently diverge
    once the corpus outgrows 50k rows."""
    from taxi_data_pipeline_pset2_spark.queries.analytics import (
        _ivfpq_oracle,
        _pq_oracle,
    )

    assert "LIMIT 50000" in _pq_oracle()
    assert "LIMIT 50000" in _ivfpq_oracle()
    assert "LIMIT 7" in _pq_oracle(train_cap=7)
    assert "LIMIT 7" in _ivfpq_oracle(train_cap=7)


def test_mine_hard_negatives_excludes_dups_before_ranking(spark):
    import numpy as np

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        mine_hard_negatives,
    )

    # anchor 0; ids 1,2 are near-copies of it (known dups); 3..6 progressively
    # farther. With k=2 the negatives must be 3 and 4 -- the near-misses --
    # never the excluded dups, and never fewer than k because of them.
    base = np.eye(8)[0]
    rows = [(0, base.tolist())]
    for i, eps in [(1, 0.01), (2, 0.02), (3, 0.3), (4, 0.5), (5, 0.9), (6, 1.5)]:
        v = base + eps * np.eye(8)[1]
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dups = spark.createDataFrame([(0, 1), (2, 0)], "id_a long, id_b long")

    from pyspark.sql import functions as F

    out = mine_hard_negatives(emb, dups, F.col("vec_id") == 0, k=2).collect()
    got = [(r.neighbor_id, r.rank) for r in sorted(out, key=lambda r: r.rank)]
    assert got == [(3, 1), (4, 2)]
    assert all(r.query_id == 0 for r in out)
    # both orientations of the dup set were excluded
    assert {r.neighbor_id for r in out}.isdisjoint({0, 1, 2})


class TestQuantization:
    def test_roundtrip_reconstruction(self, spark):
        import numpy as np

        from taxi_data_pipeline_pset2_spark.operators.quantize import (
            quantize_embeddings,
        )

        vecs = [
            (1, [0.5, -1.0, 0.25, 0.0]),
            (2, [0.001, 0.002, -0.003, 0.004]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ]
        df = spark.createDataFrame(vecs, "vid long, embedding array<float>")
        got = {r.vid: r for r in quantize_embeddings(df, "embedding", "vid").collect()}
        for vid, vec in vecs:
            q, s = got[vid].qvec, got[vid].scale
            assert all(-127 <= c <= 127 for c in q)
            recon = np.array(q, dtype=float) * s
            err = np.abs(recon - np.array(vec))
            # absmax scheme: error bounded by half a code step
            assert err.max() <= s / 2 + 1e-9, vid
        assert got[3].scale == 0.0 and all(c == 0 for c in got[3].qvec)

    def test_audit_cosine_near_one_and_zero_vector_null(self, spark):
        import random

        from taxi_data_pipeline_pset2_spark.operators.quantize import (
            quantization_audit,
        )

        rng = random.Random(31)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(32)]) for i in range(40)
        ] + [(99, [0.0] * 32)]
        df = spark.createDataFrame(rows, "vid long, embedding array<float>")
        out = {r.vid: r for r in quantization_audit(df, "embedding", "vid").collect()}
        for i in range(40):
            assert out[i].cosine_q is not None and out[i].cosine_q > 0.999
            assert out[i].max_abs_err < 0.01
        assert out[99].cosine_q is None


class TestLshParamsFor:
    """The banding-parameter selector (VERDICT r7 item #3)."""

    def test_curve_math_matches_closed_form(self):
        import math

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            lsh_banding_recall,
        )

        s = 1.0 - math.acos(0.9) / math.pi
        assert abs(lsh_banding_recall(0.9, 4, 8) - (1 - (1 - s**8) ** 4)) < 1e-12

    def test_selected_design_meets_floor_within_budget(self):
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            lsh_banding_recall,
            lsh_params_for,
        )

        for thr in (0.3, 0.4, 0.5, 0.7, 0.9):
            for floor in (0.8, 0.9, 0.95):
                b, r = lsh_params_for(thr, floor)
                assert b * r <= 64
                assert lsh_banding_recall(thr, b, r) >= floor
                # b is minimal for this r: one band fewer breaks the floor
                if b > 1:
                    assert lsh_banding_recall(thr, b - 1, r) < floor

    def test_prefers_most_selective_feasible_rows(self):
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            lsh_banding_recall,
            lsh_params_for,
        )

        b, r = lsh_params_for(0.4, 0.9, max_planes=64)
        assert (b, r) == (14, 4)
        # r+1 is infeasible within the budget: its minimal band count
        # overflows 64 planes (that's WHY r=4 was chosen)
        import math

        s = 1.0 - math.acos(0.4) / math.pi
        b5 = math.ceil(math.log(0.1) / math.log(1 - s**5))
        assert b5 * 5 > 64

    def test_infeasible_raises(self):
        import pytest

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            lsh_params_for,
        )

        with pytest.raises(ValueError):
            lsh_params_for(0.05, 0.999, max_planes=8)

    def test_tuned_audit_measured_recall_meets_floor(self, spark, sf_dir):
        from taxi_data_pipeline_pset2_spark.queries.dedup import (
            lsh_tuned_recall_audit,
        )

        row = lsh_tuned_recall_audit(spark, sf_dir).collect()[0]
        assert row.recall >= row.recall_floor
        assert row.predicted_recall >= row.recall_floor
        assert row.n_bands * row.n_rows <= 64

    def test_selector_properties_hypothesis(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            lsh_banding_recall,
            lsh_params_for,
        )

        @settings(max_examples=200, deadline=None)
        @given(
            thr=st.floats(min_value=0.05, max_value=0.95),
            floor=st.floats(min_value=0.5, max_value=0.99),
            budget=st.integers(min_value=8, max_value=256),
        )
        def check(thr, floor, budget):
            try:
                b, r = lsh_params_for(thr, floor, max_planes=budget)
            except ValueError:
                # infeasible is a legal outcome; it must then really be
                # infeasible for EVERY r at its minimal band count
                import math

                s = 1.0 - math.acos(thr) / math.pi
                for r in range(1, budget + 1):
                    p = s**r
                    if p < 1e-12 or p >= 1.0:
                        continue  # minimal b is astronomically over budget
                    bb = math.ceil(math.log(1 - floor) / math.log1p(-p))
                    assert bb * r > budget
                return
            assert b >= 1 and r >= 1 and b * r <= budget
            assert lsh_banding_recall(thr, b, r) >= floor
            # minimality: one band fewer misses the floor
            if b > 1:
                assert lsh_banding_recall(thr, b - 1, r) < floor

        check()


class TestDeterministicBRP:
    """brp_lsh_neighbors_det: the oracle-able euclidean LSH (r9 upgrade
    of the ann_brp_lsh catalog entry from rows-only)."""

    def test_subset_of_exact_and_threshold(self, spark, sf_dir):
        """Every reported pair is a TRUE pair: dist <= threshold against
        a brute-force integer-exact distance, ids ordered, no dups."""
        import itertools
        import math

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            SCALE,
            brp_lsh_neighbors_det,
        )

        emb = load_table(spark, sf_dir, "embeddings").limit(200)
        vecs = {
            r.vec_id: [round(float(x) * SCALE) for x in r.embedding]
            for r in emb.collect()
        }
        t2 = round(1.2 * SCALE) ** 2
        truth = {}
        for ia, ib in itertools.combinations(sorted(vecs), 2):
            a, b = vecs[ia], vecs[ib]
            d2 = sum((x - y) * (x - y) for x, y in zip(a, b))
            if d2 <= t2:
                truth[(ia, ib)] = d2
        got = brp_lsh_neighbors_det(emb, threshold=1.2).collect()
        assert got, "planted corpus tail must produce pairs"
        seen = set()
        for r in got:
            assert r.id_a < r.id_b
            assert (r.id_a, r.id_b) not in seen
            seen.add((r.id_a, r.id_b))
            assert (r.id_a, r.id_b) in truth, "reported pair not within threshold"
            want = round(math.sqrt(truth[(r.id_a, r.id_b)]) / SCALE, 6)
            assert r.dist == pytest.approx(want, abs=2e-6)

    def test_recall_on_planted_neardups(self, spark):
        """Planted near-identical copies sit at dist ~0.01 -- far inside
        one bucket width -- so the 8-table OR must recover essentially
        all of them."""
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            brp_lsh_neighbors_det,
        )

        corpus = _planted_neardup_corpus(spark)
        pairs = {
            (r.id_a, r.id_b)
            for r in brp_lsh_neighbors_det(corpus, threshold=0.05).collect()
        }
        base_ids = [r.vec_id for r in corpus.filter(F.col("vec_id") < 100000).collect()]
        planted = {(v, v + 100000) for v in base_ids}
        recall = len(pairs & planted) / len(planted)
        assert recall >= 0.95, f"recall {recall:.2f} too low for dist~0.01 pairs"

    def test_partitioning_invariant(self, spark, sf_dir):
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            brp_lsh_neighbors_det,
        )

        emb = load_table(spark, sf_dir, "embeddings").limit(150)
        a = sorted(map(tuple, brp_lsh_neighbors_det(emb, threshold=1.2).collect()))
        b = sorted(
            map(
                tuple,
                brp_lsh_neighbors_det(emb.repartition(13), threshold=1.2).collect(),
            )
        )
        assert a == b


class TestExactEuclidTopk:
    """exact_euclid_topk: the ground-truth side of pq_recall_audit."""

    def _emb(self, spark, rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    def test_hand_distances_and_order(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            exact_euclid_topk,
        )

        rows = [
            (1, [0.0, 0.0]),
            (2, [3.0, 4.0]),   # d2 = 25
            (3, [1.0, 1.0]),   # d2 = 2
            (4, [0.0, 2.0]),   # d2 = 4
        ]
        got = exact_euclid_topk(self._emb(spark, rows), [0.0, 0.0], k=3).collect()
        assert [(r.vec_id, r.d2_int) for r in got] == [
            (1, 0),
            (3, 2 * 10**12),
            (4, 4 * 10**12),
        ]
        assert got[1].dist2 == 2.0

    def test_ties_break_by_id_and_k_guard(self, spark):
        import pytest as _pytest

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            exact_euclid_topk,
        )

        rows = [(7, [1.0, 0.0]), (3, [0.0, 1.0]), (9, [-1.0, 0.0])]
        got = exact_euclid_topk(self._emb(spark, rows), [0.0, 0.0], k=3).collect()
        assert [r.vec_id for r in got] == [3, 7, 9]  # equal d2 -> id asc
        with _pytest.raises(ValueError, match="k must be"):
            exact_euclid_topk(self._emb(spark, rows), [0.0, 0.0], k=0)

    def test_matches_pq_ground_truth_definition(self, spark, sf_dir):
        """The audit's exact side must rank by the SAME integer grid the
        PQ chain quantizes on: re-derive top-5 with numpy over
        _grid_int64 and require identity."""
        import numpy as np

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            _grid_int64,
            exact_euclid_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = emb.orderBy("vec_id").limit(200).collect()
        q = [float(x) for x in rows[0].embedding]
        got = exact_euclid_topk(
            spark.createDataFrame(rows, emb.schema), q, k=5
        ).collect()
        iv = np.stack([_grid_int64([float(x) for x in r.embedding]) for r in rows])
        qiv = _grid_int64(q)
        d2 = ((iv - qiv) ** 2).sum(axis=1)
        ids = np.array([r.vec_id for r in rows])
        order = sorted(range(len(rows)), key=lambda i: (d2[i], ids[i]))[:5]
        assert [r.vec_id for r in got] == [int(ids[i]) for i in order]
        assert [r.d2_int for r in got] == [int(d2[i]) for i in order]

    def test_ground_truth_guards_fail_loud(self, spark):
        """Ground-truth hardening: dimension mismatch and over-cap
        magnitudes must raise, never rank as NULL-first / wrapped
        distances (a silently-wrong exact side corrupts every recall
        number downstream)."""
        import pytest as _pytest
        from pyspark.errors import SparkRuntimeException

        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            exact_euclid_topk,
        )

        mixed = self._emb(spark, [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])])
        with _pytest.raises(SparkRuntimeException, match="length != query dim"):
            exact_euclid_topk(mixed, [0.0, 0.0], k=2).collect()
        big = self._emb(spark, [(1, [40.0, 0.0])])  # 4e7 > 2^25 on the grid
        with _pytest.raises(SparkRuntimeException, match="2\\^25 grid cap"):
            exact_euclid_topk(big, [0.0, 0.0], k=1).collect()
        with _pytest.raises(ValueError, match="grid cap"):
            exact_euclid_topk(big, [40.0, 0.0], k=1)
        with _pytest.raises(ValueError, match="overflows"):
            exact_euclid_topk(big, [0.0] * 2048, k=1)
        # NULL poison: a NULL component (or a NULL vector) must raise --
        # under three-valued logic it would otherwise slip past the
        # magnitude exists() and sort NULLS FIRST into the exact top-k
        nulled = spark.createDataFrame(
            [(1, [0.5, 0.5]), (2, [1.0, None])],
            "vec_id long, embedding array<float>",
        )
        with _pytest.raises(SparkRuntimeException, match="NULL component"):
            exact_euclid_topk(nulled, [0.0, 0.0], k=2).collect()
        allnull = spark.createDataFrame(
            [(1, [0.5, 0.5]), (2, None)],
            "vec_id long, embedding array<float>",
        )
        with _pytest.raises(SparkRuntimeException, match="vector is NULL"):
            exact_euclid_topk(allnull, [0.0, 0.0], k=2).collect()


def test_vectorized_knn_excludes_null_vectors(spark, sf_dir):
    """_prepared drops NULL embeddings: the Arrow matmul kernel must not
    see a None (TypeError per batch); a NULL row is neither query nor
    neighbor, matching the SQL kernels' NULL-cosine self-exclusion."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        knn_topk_vectorized,
    )
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qid = emb.orderBy("vec_id").limit(1).collect()[0].vec_id
    with_null = emb.unionByName(
        emb.limit(1).select(
            (F.col("vec_id") + 7_000_000).alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
        )
    )
    base = [
        (r.neighbor_id, r.cosine)
        for r in knn_topk_vectorized(emb, F.col("vec_id") == qid, k=5).collect()
    ]
    got = [
        (r.neighbor_id, r.cosine)
        for r in knn_topk_vectorized(with_null, F.col("vec_id") == qid, k=5).collect()
    ]
    assert got == base


def test_verify_cosine_null_element_fails_loud(spark):
    """r14 (ADVICE r13): a NULL ELEMENT inside an embedding list makes
    the Arrow flatten come back float64-with-NaN; the kernel must raise
    (like the pre-Arrow pandas kernel did), never silently demote the
    exact int64 dot and drop the pair."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    from taxi_data_pipeline_pset2_spark.operators.similarity import (
        verify_cosine_pairs,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, None]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(PythonException, match="NULL"):
        verify_cosine_pairs(emb, cands, threshold=0.0).collect()
