"""Deterministic sampling/split operators: reshuffle stability, split
exhaustiveness, monotone sample composition, and a DuckDB twin proving
the hash derivation is engine-portable."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.sampling import (
    HASH_SPACE,
    hash_split,
    stratified_sample,
    top_n_by_hash,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_leakage_safe_split_groups_near_dups_together(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # planted near-dup edge set: chain {1,2,3} plus pair {10, 11}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(
        docs, pairs, weights={"train": 0.5, "test": 0.5}
    )
    rows = {r.doc_id: (r.group_id, r.split) for r in out.collect()}
    assert len(rows) == docs.count()  # no row lost or duplicated
    # every member of a component shares group AND split
    assert rows[1] == rows[2] == rows[3]
    assert rows[1][0] == 1  # component min
    assert rows[10] == rows[11] and rows[10][0] == 10
    # singletons group as themselves
    assert rows[5][0] == 5
    # a plain per-id split would separate some planted pair across
    # enough salts; the group split never does, under ANY salt
    for salt in ("a", "b", "c"):
        o = {
            r.doc_id: r.split
            for r in leakage_safe_split(
                docs, pairs, weights={"train": 0.5, "test": 0.5}, salt=salt
            ).collect()
        }
        assert o[1] == o[2] == o[3] and o[10] == o[11]
    # deterministic under physical reshuffles
    again = {
        r.doc_id: (r.group_id, r.split)
        for r in leakage_safe_split(
            docs.repartition(13), pairs, weights={"train": 0.5, "test": 0.5}
        ).collect()
    }
    assert rows == again


def test_hash_split_exhaustive_disjoint_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = hash_split(docs, weights=w)
    n = docs.count()
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n  # every row in exactly one split
    assert 0.7 < counts["train"] / n < 0.9  # ~binomial tolerance at n=500
    # reshuffle stability: a different physical partitioning gives the
    # IDENTICAL assignment per id
    again = hash_split(docs.repartition(7), weights=w)
    a = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in again.select("doc_id", "split").collect()}
    assert a == b


def test_hash_split_matches_duckdb_twin(spark, sf_dir):
    """The split must be reproducible OUTSIDE Spark from the documented
    hash formula -- the portability contract that lets any engine agree
    on which rows are validation."""
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: r.split
        for r in hash_split(docs, weights={"train": 0.8, "val": 0.2}, salt="s1")
        .select("doc_id", "split")
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    bound = int(0.8 * HASH_SPACE)
    want = {
        row[0]: row[1]
        for row in con.execute(
            f"""
            SELECT doc_id,
                   CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|s1'), 1, 8))
                             AS BIGINT) < {bound}
                        THEN 'train' ELSE 'val' END AS split
            FROM documents
            """
        ).fetchall()
    }
    assert got == want


def test_stratified_sample_monotone_and_per_stratum(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in stratified_sample(docs, 0.1).select("doc_id").collect()}
    large = {r.doc_id for r in stratified_sample(docs, 0.4).select("doc_id").collect()}
    assert small <= large  # same salt: smaller fraction nests in larger
    n = docs.count()
    assert 0.02 < len(small) / n < 0.25
    assert 0.25 < len(large) / n < 0.55
    # per-stratum override: a stratum with fraction 1.0 keeps every row
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    boosted = stratified_sample(
        docs, 0.05, strata_col="lang", fractions={langs[0]: 1.0}
    )
    kept = boosted.filter(F.col("lang") == langs[0]).count()
    assert kept == docs.filter(F.col("lang") == langs[0]).count()


def test_top_n_by_hash_fixed_size_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in top_n_by_hash(docs, 50).select("doc_id").collect()}
    b = {r.doc_id for r in top_n_by_hash(docs.repartition(13), 50).select("doc_id").collect()}
    assert len(a) == 50
    assert a == b  # partitioning-independent
    c = {r.doc_id for r in top_n_by_hash(docs, 50, salt="other").select("doc_id").collect()}
    assert a != c  # a different salt is an independent draw


def test_sampling_plans_are_shuffle_free(spark, sf_dir):
    """Split/sample are row-local decisions: their physical plans must
    contain no Exchange -- at 100 TB a sampling pass that shuffles is a
    bug, not a slow path."""
    docs = load_table(spark, sf_dir, "documents")
    for df in (
        hash_split(docs),
        stratified_sample(docs, 0.1),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan


def test_null_ids_are_one_deterministic_cohort(spark):
    """Regression: NULL ids must hash as a sentinel -- not fall through
    to the last split in hash_split while being dropped entirely by
    stratified_sample."""
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c"), (2, "d")], "doc_id long, x string"
    )
    split = hash_split(df, weights={"train": 0.5, "val": 0.5})
    assert split.filter(F.col("split").isNull()).count() == 0
    null_splits = {r.split for r in split.filter(F.col("doc_id").isNull()).collect()}
    assert len(null_splits) == 1  # one cohort, one deterministic split
    # the full-fraction sample keeps null-id rows instead of dropping them
    assert stratified_sample(df, 1.0).count() == 4


def test_weighted_sample_properties(spark, sf_dir):
    import pytest
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.sampling import weighted_sample_n
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    got = weighted_sample_n(docs, 50, "n_chars")
    ids = [r.doc_id for r in got.collect()]
    assert len(ids) == 50 and len(set(ids)) == 50

    # deterministic + reshuffle-stable
    re_ids = [
        r.doc_id
        for r in weighted_sample_n(docs.repartition(7), 50, "n_chars").collect()
    ]
    assert sorted(ids) == sorted(re_ids)

    # weight-proportional inclusion: heavy rows must be overrepresented.
    # Give the lowest-id half weight 10, the rest weight 1; the sample
    # of 100 should be dominated by heavy rows (E[heavy] ~ 91%).
    mid = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    weighted = docs.withColumn(
        "w", F.when(F.col("doc_id") <= mid, F.lit(10.0)).otherwise(F.lit(1.0))
    )
    sample = weighted_sample_n(weighted, 100, "w", salt="bias-test")
    heavy = sample.filter(F.col("doc_id") <= mid).count()
    assert heavy > 70, heavy

    # zero-weight rows never appear
    zw = docs.withColumn(
        "w", F.when(F.col("doc_id") % 2 == 0, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    s2 = weighted_sample_n(zw, 50, "w")
    assert s2.filter(F.col("doc_id") % 2 == 0).count() == 0

    with pytest.raises(ValueError, match="positive"):
        weighted_sample_n(docs, 0, "n_chars")


def test_epoch_shuffle_deterministic_and_epoch_independent(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.sampling import epoch_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    e0 = [r.doc_id for r in epoch_shuffle(docs, 0, n_files=4).collect()]
    e0_again = [
        r.doc_id for r in epoch_shuffle(docs.repartition(7), 0, n_files=4).collect()
    ]
    e1 = [r.doc_id for r in epoch_shuffle(docs, 1, n_files=4).collect()]
    # same epoch: identical global order regardless of input layout
    assert e0 == e0_again
    # different epoch: same membership, different permutation
    assert sorted(e0) == sorted(e1)
    assert e0 != e1
    # it is a real shuffle, not the input order
    assert e0 != sorted(e0)


def test_read_jsonl_quarantine_splits_good_and_bad(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from taxi_data_pipeline_pset2_spark.sources.readers import read_jsonl_quarantine
    from taxi_data_pipeline_pset2_spark.sources.sinks import export_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha"}\n'
        'not json at all\n'
        '{"doc_id": 3, "text": "gamma"}\n'
        '{"doc_id": "x4", "text": "bad type"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    good, bad = read_jsonl_quarantine(spark, str(p), schema)
    assert {r.doc_id for r in good.collect()} == {1, 3}
    raw = {r.raw_record for r in bad.collect()}
    assert "not json at all" in raw
    assert any("x4" in r for r in raw)

    # export round-trip: written corpus reads back identically
    out = str(tmp_path / "export")
    export_jsonl(good, out, compression=None)
    back = spark.read.schema(schema).json(out)
    assert {(r.doc_id, r.text) for r in back.collect()} == {(1, "alpha"), (3, "gamma")}


def test_per_group_sample(spark, sf_dir):
    """n per group, small groups whole, reshuffle-stable."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import per_group_sample
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = per_group_sample(docs, 3, "source")
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert counts and all(c == 3 for c in counts.values())
    # tiny group passes through whole
    tiny = docs.limit(2)
    assert per_group_sample(tiny.withColumn("g", F.lit("x")), 5, "g").count() == 2
    # layout-independent draw
    a = {r.doc_id for r in out.select("doc_id").collect()}
    b = {
        r.doc_id
        for r in per_group_sample(docs.repartition(7), 3, "source")
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_select_quality_mass(spark):
    """Boundary row included; >= 1 row per group; layout-independent."""
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        select_quality_mass,
    )

    rows = [
        # group a: weights 50, 30, 20 (scores = weights) -> p=0.5 keeps
        # the 50 only (prefix before it = 0 < 50; before 30 = 50 >= 50)
        ("a", 1, 50.0), ("a", 2, 30.0), ("a", 3, 20.0),
        # group b: equal weights -> p=0.5 keeps 2 of 4 (ids break ties)
        ("b", 10, 10.0), ("b", 11, 10.0), ("b", 12, 10.0), ("b", 13, 10.0),
        # group c: single row always kept even at tiny p
        ("c", 20, 100.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, w double")
    got = {
        (r.g, r.id)
        for r in select_quality_mass(df, "w", "w", 0.5, ["g"], id_col="id").collect()
    }
    assert got == {("a", 1), ("b", 10), ("b", 11), ("c", 20)}
    tiny = select_quality_mass(df, "w", "w", 0.01, ["g"], id_col="id")
    assert {r.g for r in tiny.collect()} == {"a", "b", "c"}  # one each
    shuffled = {
        (r.g, r.id)
        for r in select_quality_mass(
            df.repartition(5), "w", "w", 0.5, ["g"], id_col="id"
        ).collect()
    }
    assert shuffled == got
    with pytest.raises(ValueError, match="p"):
        select_quality_mass(df, "w", "w", 0.0, ["g"], id_col="id")


def test_select_quality_mass_null_weight_kept(spark):
    """ADVICE r5: a NULL-weight row costs no mass but must not vanish --
    the top-scored row is kept even when its weight is NULL."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        select_quality_mass,
    )

    df = spark.createDataFrame(
        [("g", 1, 9.0, None), ("g", 2, 5.0, 10.0), ("g", 3, 1.0, 10.0)],
        "g string, id int, score double, w double",
    )
    kept = {
        r["id"]
        for r in select_quality_mass(df, "score", "w", 0.5, ["g"], id_col="id").collect()
    }
    # NULL-weight best row is free; id=2 crosses the 50% boundary
    assert kept == {1, 2}


def test_group_kfold_cohesion_and_range(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.sampling import group_kfold

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r.doc_id: (r.group_id, r.fold) for r in group_kfold(docs, pairs, k=5).collect()}
    assert len(out) == docs.count()
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11]
    assert all(0 <= f < 5 for _, f in out.values())
    # all folds populated at corpus size
    assert len({f for _, f in out.values()}) == 5
    import pytest as _p

    with _p.raises(ValueError):
        group_kfold(docs, pairs, k=1)


def test_temporal_split_embargo_semantics(spark):
    from taxi_data_pipeline_pset2_spark.operators.sampling import temporal_split

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-10 00:00:00"),  # == train_end -> train
            (3, "2024-01-10 00:30:00"),  # inside embargo -> dropped
            (4, "2024-01-11 00:00:00"),  # == cutoff -> dropped (gap is (end, end+embargo])
            (5, "2024-01-11 00:00:01"),  # past cutoff -> test
        ],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.id: r.split
        for r in temporal_split(df, "ts", "2024-01-10 00:00:00", "1 day").collect()
    }
    assert out == {1: "train", 2: "train", 5: "test"}
    # zero embargo: plain boundary split, nothing dropped
    out0 = {
        r.id: r.split
        for r in temporal_split(df, "ts", "2024-01-10 00:00:00").collect()
    }
    assert out0 == {1: "train", 2: "train", 3: "test", 4: "test", 5: "test"}


def test_inverse_frequency_weights_balance_classes(spark):
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        inverse_frequency_weights,
    )

    df = spark.createDataFrame(
        [(i, "a") for i in range(8)] + [(100, "b"), (101, "b")] + [(200, None)],
        "id long, lbl string",
    )
    out = inverse_frequency_weights(df, "lbl")
    rows = {r.id: r.sample_weight for r in out.collect()}
    assert len(rows) == 11  # every row kept, incl. the NULL-label one
    # N=11, k=3: w(a)=11/24, w(b)=11/6, w(NULL)=11/3
    assert rows[0] == round(11 / 24, 6)
    assert rows[100] == round(11 / 6, 6)
    assert rows[200] == round(11 / 3, 6)
    # balanced: each class's total mass is ~N/k
    import collections

    mass = collections.defaultdict(float)
    for r in out.collect():
        mass[r.lbl] += r.sample_weight
    for m in mass.values():
        assert abs(m - 11 / 3) < 1e-4


def test_rolling_origin_folds_never_train_on_future(spark):
    import pytest

    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        rolling_origin_folds,
    )

    df = spark.createDataFrame(
        [(i, f"2024-01-{i + 1:02d} 00:00:00") for i in range(10)],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = rolling_origin_folds(
        df, "ts", ["2024-01-03 00:00:00", "2024-01-06 00:00:00"], "1 day"
    )
    rows = {(r.fold, r.id): r.role for r in out.collect()}
    # fold 0: train days 1-3, embargo day 4 (absent), test days 5+
    assert rows[(0, 0)] == rows[(0, 2)] == "train"
    assert (0, 3) not in rows  # embargoed
    assert rows[(0, 4)] == rows[(0, 9)] == "test"
    # fold 1: train days 1-6, embargo day 7, test days 8+
    assert rows[(1, 5)] == "train"
    assert (1, 6) not in rows
    assert rows[(1, 7)] == "test"
    # invariant: no fold ever trains on a row later than its boundary
    for (fold, rid), role in rows.items():
        if role == "train":
            assert rid <= (2 if fold == 0 else 5)
    with pytest.raises(ValueError):
        rolling_origin_folds(df, "ts", [])


def test_quality_mass_zero_total_group_keeps_top_row_and_rejects_negative(spark):
    """An all-zero-mass group must still keep its top-scored row (the
    documented at-least-one guarantee; 0 < 0 kept nothing before), and
    a negative weight fails loudly (it would make the running prefix
    non-monotone)."""
    import pytest as _pytest

    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        select_quality_mass,
    )

    df = spark.createDataFrame(
        [(1, "g", 5.0, 0), (2, "g", 3.0, 0), (3, "h", 1.0, 10)],
        "doc_id long, grp string, score double, w int",
    )
    out = select_quality_mass(df, "score", "w", p=0.5, group_cols=["grp"])
    got = {(r.grp, r.doc_id) for r in out.collect()}
    assert ("g", 1) in got and ("g", 2) not in got and ("h", 3) in got
    neg = spark.createDataFrame(
        [(1, "g", 5.0, -1)], "doc_id long, grp string, score double, w int"
    )
    with _pytest.raises(Exception, match="negative weight"):
        select_quality_mass(neg, "score", "w", p=0.5, group_cols=["grp"]).collect()


def test_temporal_split_drops_null_timestamps(spark):
    """An undated row can sit on either side of the cutoff; guessing
    'train' would leak post-cutoff rows into training. NULL ts rows
    are dropped with the embargo band (definition audit, r12)."""
    from taxi_data_pipeline_pset2_spark.operators.sampling import (
        temporal_split,
    )

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, None), (3, "2024-02-01 00:00:00")],
        "id int, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        r.id: r.split
        for r in temporal_split(df, "ts", "2024-01-10 00:00:00").collect()
    }
    assert out == {1: "train", 3: "test"}  # the NULL-ts row is absent
