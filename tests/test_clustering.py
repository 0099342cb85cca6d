"""Iterative k-means: convergence, determinism, cluster sanity."""

from __future__ import annotations

import pytest

from taxi_data_pipeline_pset2_spark.operators.clustering import (
    kmeans_fit_assign,
    kmeans_inertia,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_kmeans_inertia_decreases_and_assigns_all(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    one = kmeans_fit_assign(emb, k=8, n_iter=1)
    five = kmeans_fit_assign(emb, k=8, n_iter=5)
    assert one.count() == emb.count() == five.count()
    i1, i5 = kmeans_inertia(one), kmeans_inertia(five)
    assert i5 <= i1 * 1.0001, (i1, i5)
    clusters = {r.cluster for r in five.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))
    assert len(clusters) >= 2


def test_kmeans_deterministic_rerun(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=3).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=3).collect()}
    assert a == b


def test_kmeans_iteration_uses_cached_corpus(spark, sf_dir, monkeypatch):
    """The projected corpus must be persisted across Lloyd rounds: the
    per-round partial-sums pass has to read an InMemoryRelation, not
    re-scan and re-project the source n_iter times (r4 finding #3). Also
    pins that the cache is released (unpersist) by the time the fit
    returns."""
    emb = load_table(spark, sf_dir, "embeddings")
    # patch the CONCRETE DataFrame class (pyspark.sql.classic...), not the
    # abstract pyspark.sql.DataFrame facade, or the spies never fire
    cls = type(emb)

    plans: list[str] = []
    unpersisted: list[bool] = []
    orig_collect = cls.collect
    orig_unpersist = cls.unpersist

    def spy_collect(self):
        plans.append(self._jdf.queryExecution().optimizedPlan().toString())
        return orig_collect(self)

    def spy_unpersist(self, blocking=False):
        unpersisted.append(True)
        return orig_unpersist(self, blocking)

    monkeypatch.setattr(cls, "collect", spy_collect)
    monkeypatch.setattr(cls, "unpersist", spy_unpersist)
    # driver_cell_cap=0 forces the distributed Lloyd loop -- the path
    # whose cache discipline this test pins (the r13 driver fast path
    # does no per-round cluster work at all)
    out = kmeans_fit_assign(emb, k=4, n_iter=2, driver_cell_cap=0)
    monkeypatch.undo()

    round_plans = [p for p in plans if "MapInPandas" in p]
    assert len(round_plans) == 2  # one centroid-update collect per round
    for p in round_plans:
        assert "InMemoryRelation" in p, p
    assert unpersisted == [True]
    # and the rewrite stays deterministic across reruns
    a = {r.vec_id: r.cluster for r in out.collect()}
    b = {
        r.vec_id: r.cluster
        for r in kmeans_fit_assign(
            emb, k=4, n_iter=2, driver_cell_cap=0
        ).collect()
    }
    assert a == b


def test_kmeans_driver_fast_path_matches_distributed(spark, sf_dir):
    """The r13 driver fast path (whole Lloyd loop on one collected
    matrix) and the distributed loop share the exact-integer update, so
    (cluster, dist) and the returned centroids must be bit-identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    fast, cf = kmeans_fit_assign(emb, k=4, n_iter=3, return_centroids=True)
    dist_, cd = kmeans_fit_assign(
        emb, k=4, n_iter=3, return_centroids=True, driver_cell_cap=0
    )
    a = {r.vec_id: (r.cluster, r.dist) for r in fast.collect()}
    b = {r.vec_id: (r.cluster, r.dist) for r in dist_.collect()}
    assert a == b
    assert (cf == cd).all()


def test_kmeans_empty_corpus_both_paths(spark):
    """r14 (ADVICE r13): an empty corpus returns an empty assignment
    (and (0, 1) centroids) from BOTH paths -- the distributed loop used
    to IndexError on its zero-row init."""
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    for cap in (None, 0):
        kw = {} if cap is None else {"driver_cell_cap": 0}
        out, cents = kmeans_fit_assign(
            emb, k=3, n_iter=2, return_centroids=True, **kw
        )
        assert out.count() == 0
        assert cents.shape == (0, 1)


def test_kmeans_null_id_sorts_like_distributed_init(spark):
    """r14 (ADVICE r13): a NULL id must not TypeError the driver fast
    path's probe sort; both paths agree (NULLs-first init order, the
    distributed orderBy's asc_nulls_first)."""
    # exactly one NULL id: two NULL-id rows would make the init order
    # WITHIN the tie engine-arbitrary in both paths (not what this pins)
    rows = [(None, [9.0, 9.0])] + [
        (int(i), [0.0, float(i)]) for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fast = kmeans_fit_assign(emb, k=2, n_iter=2)
    dist_ = kmeans_fit_assign(emb, k=2, n_iter=2, driver_cell_cap=0)
    key = lambda r: (r.vec_id is not None, r.vec_id, r.cluster, r.dist)  # noqa: E731
    assert sorted(fast.collect(), key=key) == sorted(dist_.collect(), key=key)


def test_kmeans_exact_integer_reference(spark):
    """r9 exact-integer Lloyd's: the full trajectory (assignments AND
    quantized centroids) must equal a from-scratch python integer
    implementation -- the property that makes the unrolled DuckDB
    oracle possible. Planted points include exact argmin TIES (same
    distance to two centroids) to pin the lowest-cluster tie-break."""
    import math

    SCALE = 1_000_000
    # 1-D points embedded in 2-D; ids fix the init (two lowest = a, b)
    pts = {
        1: [0.0, 0.0],     # init c0
        2: [10.0, 0.0],    # init c1
        3: [5.0, 0.0],     # exactly equidistant -> tie -> cluster 0
        4: [1.0, 0.0],
        5: [9.0, 0.0],
        6: [4.0, 0.0],
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in pts.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_fit_assign(df, k=2, n_iter=3).collect()
    }

    iv = {i: [round(x * SCALE) for x in v] for i, v in pts.items()}
    cents = [iv[1][:], iv[2][:]]
    for _ in range(3):
        assign = {}
        for i, v in iv.items():
            d2s = [
                sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents
            ]
            assign[i] = d2s.index(min(d2s))  # first min = lowest cluster
        for c_idx in range(2):
            members = [iv[i] for i, a in assign.items() if a == c_idx]
            if not members:
                continue
            n = len(members)
            cents[c_idx] = [
                (2 * sum(col) + n) // (2 * n) for col in zip(*members)
            ]
    for i, v in iv.items():
        d2s = [sum((a - b) * (a - b) for a, b in zip(v, c)) for c in cents]
        c_ref = d2s.index(min(d2s))
        dist_ref = round(math.sqrt(min(d2s)) / SCALE, 6)
        assert got[i][0] == c_ref, f"vec {i}: cluster {got[i][0]} != {c_ref}"
        assert got[i][1] == pytest.approx(dist_ref, abs=2e-6)
    # the planted tie really is a tie and broke low
    assert got[3][0] == 0


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Integer sums + integer argmin: the fitted assignment is
    bit-identical under any input partitioning (float centroid means
    were only 'equal up to shuffle order')."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in kmeans_fit_assign(emb, k=4, n_iter=3).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster, r.dist)
        for r in kmeans_fit_assign(emb.repartition(17), k=4, n_iter=3).collect()
    )
    assert a == b


def test_kmeans_excludes_null_vectors(spark, sf_dir):
    """A NULL embedding has no cluster: the row is absent from the
    assignment (the _prepared/pq.py discipline), not a numpy TypeError
    that kills the task."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with_null = emb.unionByName(
        emb.limit(1).select(
            (F.col("vec_id") + 7_000_000).alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
        )
    )
    out = kmeans_fit_assign(with_null, k=4, n_iter=2)
    assert out.count() == emb.count()
    # and the clean-corpus assignment is unchanged by the NULL row
    base = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=2).collect()}
    got = {r.vec_id: r.cluster for r in out.collect()}
    assert got == base
