"""Domain-mixture sampling: realized proportions track targets, exact
mode hits counts exactly, upsampling replicates with epochs, and every
mode is deterministic / reshuffle-stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.mixing import (
    domain_profile,
    sample_mixture,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def _shares(df, col="source"):
    rows = df.groupBy(col).count().collect()
    total = sum(r["count"] for r in rows)
    return {r[col]: r["count"] / total for r in rows}, total


@pytest.fixture(scope="module")
def skewed(spark):
    # 6000/3000/1000 docs -- big enough that binomial noise on the
    # threshold kernel stays well inside the share tolerances below
    rows = [
        (i, "web" if i < 6000 else ("books" if i < 9000 else "code"))
        for i in range(10_000)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source"]).cache()


def test_domain_profile_shares(skewed):
    prof = {r.domain: (r.n_docs, r.share) for r in domain_profile(skewed).collect()}
    assert prof == {
        "web": (6000, 0.6),
        "books": (3000, 0.3),
        "code": (1000, 0.1),
    }


def test_downsample_mixture_tracks_targets(skewed):
    # equal thirds: cap = 1000/(1/3) = 3000 total, web keeps 1/6
    weights = {"web": 1.0, "books": 1.0, "code": 1.0}
    out = sample_mixture(skewed, weights)
    shares, total = _shares(out)
    assert set(shares) == set(weights)
    assert total == pytest.approx(3000, rel=0.1)
    for d in weights:
        assert shares[d] == pytest.approx(1 / 3, abs=0.05), (d, shares[d])
    # the binding domain (code, rate 1.0) is fully kept -- exactly
    assert out.filter(F.col("source") == "code").count() == 1000


def test_mixture_deterministic_and_reshuffle_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
    observed = {r.domain for r in domain_profile(docs).collect()}
    assert set(weights) <= observed, f"fixture domains: {observed}"
    out = sample_mixture(docs, weights)
    again = sample_mixture(docs.repartition(13), weights)
    assert {r.doc_id for r in again.select("doc_id").collect()} == {
        r.doc_id for r in out.select("doc_id").collect()
    }
    # domains weighted 0 / absent are dropped entirely
    assert {r.source for r in out.select("source").distinct().collect()} <= set(
        weights
    )


def test_exact_mixture_hits_counts_exactly(spark, sf_dir):
    # fixture: 20 uniform domains x 25 docs; 50/50 over two of them
    # caps at 50 total
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 0.5, "src1": 0.5}
    out = sample_mixture(docs, weights, total=40, exact=True)
    shares, total = _shares(out)
    assert total == 40
    assert shares["src0"] == pytest.approx(0.5, abs=1e-9)
    # exact mode refuses upsampling mixtures
    with pytest.raises(ValueError, match="downsample-only"):
        sample_mixture(docs, weights, total=60, exact=True)


def test_upsampling_replicates_with_epoch_column(spark):
    rows = [(i, "small" if i < 100 else "big") for i in range(1100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    # 50/50 mix of 2000 docs needs 1000 from a 100-doc domain: 10 epochs
    out = sample_mixture(
        docs, {"small": 0.5, "big": 0.5}, total=2000, allow_upsample=True
    )
    assert "epoch" in out.columns
    shares, total = _shares(out)
    assert total == pytest.approx(2000, rel=0.05)
    assert shares["small"] == pytest.approx(0.5, abs=0.05)
    small_epochs = (
        out.filter(F.col("source") == "small").groupBy("doc_id").count().collect()
    )
    assert all(r["count"] >= 10 for r in small_epochs)

    # refusal without the explicit flag
    with pytest.raises(ValueError, match="upsampl"):
        sample_mixture(docs, {"small": 0.5, "big": 0.5}, total=2000)


def test_float_noise_rate_stays_downsample(spark):
    # weights {2, 9} over counts {113, 495}: floor(feasible)=605 makes
    # r_b = (9/11)*605/495 = 1.0000000000000002 in float arithmetic.
    # Unclamped, that flipped exact mode into a spurious "needs
    # upsampling" refusal and the default path into the epoch branch.
    rows = [(i, "a" if i < 113 else "b") for i in range(113 + 495)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sample_mixture(docs, {"a": 2.0, "b": 9.0})
    assert "epoch" not in out.columns
    exact = sample_mixture(docs, {"a": 2.0, "b": 9.0}, exact=True)
    assert exact.count() == 605


def test_exact_mixture_apportions_odd_totals(spark):
    # 0.5/0.5 of total=25: independent round() would banker's-round
    # both 12.5 shares to 12 and return 24 rows
    rows = [(i, "a" if i < 50 else "b") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sample_mixture(docs, {"a": 0.5, "b": 0.5}, total=25, exact=True)
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert sum(per.values()) == 25
    assert sorted(per.values()) == [12, 13]


def test_weight_validation(spark):
    docs = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError, match="absent"):
        sample_mixture(docs, {"nope": 1.0})
    with pytest.raises(ValueError, match="positive"):
        sample_mixture(docs, {"a": 0.0})


def test_exact_sampler_bucketed_rank_equals_naive_window(spark):
    """The r9 bucketed per-domain rank must select the IDENTICAL rows
    as the naive single-window rank it replaced (hash-prefix buckets
    are a prefix of the (hash, id) total order)."""
    from pyspark.sql import Window

    from taxi_data_pipeline_pset2_spark.operators.mixing import (
        sample_mixture,
    )
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        salted_hash,
    )

    docs = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    got = sorted(
        r.doc_id
        for r in sample_mixture(
            docs, {"a": 1.0, "b": 1.0}, total=100, exact=True
        ).collect()
    )
    # naive reference: one window per domain over the raw rows
    h = salted_hash(F.col("doc_id"), "mixture")
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    ranked = docs.withColumn("__rk", F.row_number().over(w))
    per_dom = {
        r.source: r.cnt
        for r in sample_mixture(
            docs, {"a": 1.0, "b": 1.0}, total=100, exact=True
        )
        .groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    ref = sorted(
        r.doc_id
        for r in ranked.filter(
            F.col("__rk")
            <= F.when(F.col("source") == "a", per_dom.get("a", 0)).otherwise(
                per_dom.get("b", 0)
            )
        ).collect()
    )
    assert got == ref
    assert len(got) == 100


def test_negative_weights_rejected(spark):
    """Mixed-sign weights slipped past the sum>0 check: wsum included
    the negative weight but norm dropped it, so surviving normalized
    weights summed past 1 and both selection paths returned the wrong
    number of docs."""
    from taxi_data_pipeline_pset2_spark.operators.mixing import sample_mixture

    docs = spark.createDataFrame(
        [(i, "a" if i % 3 else "b") for i in range(30)],
        "doc_id long, domain string",
    )
    with pytest.raises(ValueError, match="non-negative"):
        sample_mixture(docs, {"a": 2.0, "b": -1.0}, domain_col="domain")


def test_upsample_boundary_is_monotonic_with_downsample(spark):
    """The module's monotonicity guarantee must hold ACROSS the
    downsample/upsample path boundary: raising a fractional rate via
    allow_upsample keeps every doc the pure-downsample path selected
    at the lower rate (epoch 0 draws on the identical id-only hash and
    truncated threshold)."""
    from taxi_data_pipeline_pset2_spark.operators.mixing import sample_mixture

    docs = spark.createDataFrame(
        [(i, "a" if i < 800 else "b") for i in range(1000)],
        "doc_id long, domain string",
    )
    # all rates <= 1: pure downsample path; b rate = 0.2*500/200 = 0.5
    low = sample_mixture(docs, {"a": 0.8, "b": 0.2}, domain_col="domain", total=500)
    low_b = {r.doc_id for r in low.filter("domain = 'b'").collect()}
    # force the upsample path (a needs epochs), b rate rises to 0.75
    high = sample_mixture(
        docs, {"a": 0.9, "b": 0.1}, domain_col="domain", total=1500,
        allow_upsample=True,
    )
    high_b = {r.doc_id for r in high.filter("domain = 'b'").collect()}
    # b's rate rose 0.5 -> 0.75: every previously selected b doc stays
    assert low_b <= high_b, sorted(low_b - high_b)[:5]
