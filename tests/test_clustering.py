"""Iterative k-means: convergence, determinism, cluster sanity."""

from __future__ import annotations

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
    out = kmeans_fit_assign(emb, k=4, n_iter=2)
    monkeypatch.undo()

    round_plans = [p for p in plans if "MapInPandas" in p]
    assert len(round_plans) == 2  # one centroid-update collect per round
    for p in round_plans:
        assert "InMemoryRelation" in p, p
    assert unpersisted == [True]
    # and the rewrite stays deterministic across reruns
    a = {r.vec_id: r.cluster for r in out.collect()}
    b = {r.vec_id: r.cluster for r in kmeans_fit_assign(emb, k=4, n_iter=2).collect()}
    assert a == b
