"""Table profiling (one-job per-column stats) and schema-drift
detection at the ingest boundary."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from taxi_data_pipeline_pset2_spark.operators.profiling import (
    profile_table,
    schema_drift,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table


def test_profile_table_matches_duckdb_exact_stats(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    prof = {r.column: r for r in profile_table(docs).collect()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    n, n_langs, min_c, max_c = con.execute(
        "SELECT count(*), count(DISTINCT lang), min(n_chars), max(n_chars) FROM documents"
    ).fetchone()
    assert prof["doc_id"].n_rows == n and prof["doc_id"].n_nulls == 0
    assert prof["n_chars"].min_value == str(min_c)
    assert prof["n_chars"].max_value == str(max_c)
    # HLL at rsd=0.05 on a handful of languages is exact
    assert prof["lang"].approx_distinct == n_langs
    assert set(prof) == {"doc_id", "lang", "n_chars"}


def test_profile_table_null_fractions(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "id long, s string"
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["s"].n_nulls == 2 and prof["s"].null_frac == 0.5
    assert prof["id"].null_frac == 0.0


def test_schema_drift_classification(spark, tmp_path):
    path = str(tmp_path / "drifted")
    spark.createDataFrame(
        [(1, "x", 2.5)], "id long, renamed string, value double"
    ).write.parquet(path)
    expected = StructType(
        [
            StructField("id", LongType()),
            StructField("legacy_col", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    drift = schema_drift(spark, expected, path)
    assert drift.missing == ("legacy_col",)
    assert drift.added == ("renamed",)
    assert drift.type_changed == ()
    assert drift.breaking and not drift.clean

    # identical schema -> clean; numeric widening -> absorbed, not drift
    clean = schema_drift(
        spark,
        StructType(
            [
                StructField("id", LongType()),
                StructField("renamed", StringType()),
                StructField("value", LongType()),  # numeric vs double: absorbed
            ]
        ),
        path,
    )
    assert clean.clean

    # type change string -> double IS breaking
    retyped = schema_drift(
        spark,
        StructType(
            [
                StructField("id", LongType()),
                StructField("renamed", DoubleType()),
                StructField("value", DoubleType()),
            ]
        ),
        path,
    )
    assert retyped.type_changed == (("renamed", "double", "string"),)
    assert retyped.breaking


def test_column_histogram_matches_duckdb(spark, sf_dir):
    from taxi_data_pipeline_pset2_spark.operators.profiling import column_histogram
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    from .oracle_utils import duckdb_connection

    bins = 8
    got = {
        r.bin: (r.lo, r.hi, r.n)
        for r in column_histogram(
            load_table(spark, sf_dir, "orders"), "o_totalprice", bins
        ).collect()
    }
    con = duckdb_connection(sf_dir)
    mn, mx = con.execute(
        "SELECT min(o_totalprice), max(o_totalprice) FROM orders"
    ).fetchone()
    width = (mx - mn) / bins
    want = dict(
        con.execute(
            f"""
            SELECT CAST(least({bins - 1}, floor((o_totalprice - {mn!r}) / {width!r})) AS INT) AS bin,
                   count(*) AS n
            FROM orders WHERE o_totalprice IS NOT NULL GROUP BY bin
            """
        ).fetchall()
    )
    assert sum(v[2] for v in got.values()) == sum(want.values())
    for b, (lo, hi, n) in got.items():
        assert n == want.get(b, 0), b
        assert abs(lo - (mn + b * width)) < 1e-9
    # full coverage: every bin row present, even empty ones
    assert set(got) == set(range(bins))


def test_quantile_bin_equal_frequency(spark, sf_dir):
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.profiling import quantile_bin
    from taxi_data_pipeline_pset2_spark.sources.readers import load_table

    orders = load_table(spark, sf_dir, "orders")
    binned = quantile_bin(orders, "o_totalprice", bins=10)
    counts = {
        r.o_totalprice_bin: r.n
        for r in binned.groupBy("o_totalprice_bin").agg(F.count("*").alias("n")).collect()
    }
    total = sum(counts.values())
    assert set(counts) == set(range(10))
    # equal frequency within sketch tolerance: every bin within 30% of ideal
    ideal = total / 10
    for b, n in counts.items():
        assert 0.7 * ideal < n < 1.3 * ideal, (b, n, ideal)
    # monotone: higher bins hold strictly higher value ranges
    edges = binned.groupBy("o_totalprice_bin").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    ).orderBy("o_totalprice_bin").collect()
    for prev, cur in zip(edges, edges[1:]):
        assert prev.hi <= cur.lo or abs(prev.hi - cur.lo) < 1e-9
    # null passthrough
    with_null = orders.withColumn(
        "o_totalprice", F.when(F.col("o_orderkey") % 97 == 0, None).otherwise(F.col("o_totalprice"))
    )
    nb = quantile_bin(with_null, "o_totalprice", bins=5)
    assert nb.filter(F.col("o_totalprice").isNull() & F.col("o_totalprice_bin").isNotNull()).count() == 0


def test_quantile_bin_exact_empty_input(spark):
    """ADVICE r5: exact-mode percentile over an empty frame returns NULL;
    the boundary set must degrade to [] (single bin 0), not TypeError."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import quantile_bin

    empty = spark.createDataFrame([], "v double")
    out = quantile_bin(empty, "v", bins=4, exact=True)
    assert out.count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    got = quantile_bin(nulls, "v", bins=4, exact=True).collect()
    assert [r["v_bin"] for r in got] == [None, None]


def test_source_profile_semantics(spark):
    import math

    import pytest

    from taxi_data_pipeline_pset2_spark.operators.profiling import source_profile

    docs = spark.createDataFrame(
        [
            (1, "s1", "en", "the quick brown fox jumps over the lazy dog"),
            (2, "s1", "en", "the quick brown fox jumps over the lazy dog"),  # dup
            (3, "s1", "de", "der schnelle braune fuchs springt hier"),
            (4, "s2", "en", "a completely different single document"),
        ],
        "doc_id long, source string, lang string, text string",
    )
    out = {r.source: r for r in source_profile(docs).collect()}
    s1 = out["s1"]
    assert s1.n_docs == 3 and s1.n_unique == 2
    assert s1.dup_rate == pytest.approx(round(1 - 2 / 3, 6), abs=1e-9)
    # entropy of {en: 2/3, de: 1/3} with 6-dp per-term rounding
    want = round(-(2 / 3) * math.log(2 / 3) * 1e6) + round(
        -(1 / 3) * math.log(1 / 3) * 1e6
    )
    assert s1.lang_entropy == pytest.approx(want / 1e6, abs=1e-9)
    s2 = out["s2"]
    assert (s2.n_docs, s2.n_unique, s2.dup_rate) == (1, 1, 0.0)
    assert s2.lang_entropy == 0.0  # monolingual source
    assert 0.0 <= s2.avg_quality <= 1.0


class TestSkewReport:
    def test_hand_built_skew(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.profiling import (
            skew_report,
        )

        rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 4 + [(None,)]
        df = spark.createDataFrame(rows, "k string")
        r = skew_report(df, ["k"]).collect()[0]
        assert r.n_rows == 100 and r.n_keys == 4
        assert r.max_key_rows == 90
        assert r.top1_share == 0.9
        assert r.mean_key_rows == 25.0
        assert r.skew_ratio == 3.6  # 90 / 25
        # NULL is a counted key (often the worst offender in practice)

    def test_uniform_ratio_one(self, spark):
        from taxi_data_pipeline_pset2_spark.operators.profiling import (
            skew_report,
        )

        rows = [(f"k{i % 10}",) for i in range(100)]
        df = spark.createDataFrame(rows, "k string")
        r = skew_report(df, ["k"]).collect()[0]
        assert r.skew_ratio == 1.0 and r.top1_share == 0.1


class TestColumnStorageReport:
    def test_matches_pyarrow_on_written_table(self, spark, tmp_path):
        import pyarrow.parquet as pq

        from taxi_data_pipeline_pset2_spark.operators.storage import (
            column_storage_report,
        )

        path = str(tmp_path / "t")
        spark.range(0, 5000).selectExpr(
            "id", "cast(id % 7 as string) as cat", "id * 1.5 as val"
        ).repartition(3).write.parquet(path)
        got = {
            r.column: (r.n_row_groups, r.compressed_bytes, r.uncompressed_bytes)
            for r in column_storage_report(spark, path).collect()
        }
        # independent driver-side pyarrow sweep over the same footers
        import os

        want: dict = {}
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    c = g.column(ci)
                    k = c.path_in_schema
                    n, cb, ub = want.get(k, (0, 0, 0))
                    want[k] = (
                        n + 1,
                        cb + c.total_compressed_size,
                        ub + c.total_uncompressed_size,
                    )
        assert got == want
        assert set(got) == {"id", "cat", "val"}

    def test_empty_dir_rejected(self, spark, tmp_path):
        import os

        import pytest as _pytest

        from taxi_data_pipeline_pset2_spark.operators.storage import (
            column_storage_report,
        )

        d = str(tmp_path / "empty")
        os.makedirs(d)
        with _pytest.raises(ValueError, match="no parquet"):
            column_storage_report(spark, d)


def test_storage_report_walks_partitioned_layout(spark, tmp_path):
    """r11: key=value partition subdirectories (the layout
    clustered_write produces) must be included -- the flat listdir
    missed them entirely."""
    from taxi_data_pipeline_pset2_spark.operators.storage import (
        column_storage_report,
    )

    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(100)], "k long, part long, v string"
    )
    out = str(tmp_path / "ptab")
    df.write.partitionBy("part").parquet(out)
    rep = {r.column: r for r in column_storage_report(spark, out).collect()}
    assert set(rep) == {"k", "v"}  # partition col lives in the path, not the files
    assert rep["k"].compressed_bytes > 0 and rep["k"].n_row_groups >= 3


def test_benford_survives_trillion_scale_values(spark):
    """r11: the (18,6) decimal rendering cast ANSI-aborted on values
    >= 1e12 -- a forensic audit must survive big magnitudes."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import (
        benford_audit,
    )

    df = spark.createDataFrame(
        [(1.23e14,), (4.5e12,), (9.0e13,), (2.0,), (0.0,), (None,)],
        "v double",
    )
    rows = {r.digit: r.n for r in benford_audit(df, "v").collect()}
    assert sum(rows.values()) == 4  # zero and NULL excluded
    assert rows["1"] == 1 and rows["4"] == 1 and rows["9"] == 1 and rows["2"] == 1


def test_column_histogram_excludes_nan(spark):
    """r11: one NaN row became max_value, turning width NaN and folding
    the whole histogram into a single NaN-edged bin."""
    from math import nan

    from taxi_data_pipeline_pset2_spark.operators.profiling import (
        column_histogram,
    )

    df = spark.createDataFrame(
        [(float(i),) for i in range(10)] + [(nan,)], "v double"
    )
    rows = column_histogram(df, "v", bins=5).collect()
    assert len(rows) == 5
    assert all(r.hi == r.hi and r.lo == r.lo for r in rows)  # no NaN edges
    assert sum(r.n for r in rows) == 10  # NaN contributes nowhere


def test_source_profile_keeps_null_source_cohort(spark):
    """r11: plain equi-joins dropped the NULL-source cohort the groupBy
    had correctly built (the seasonal-naive NULL-key class)."""
    from taxi_data_pipeline_pset2_spark.operators.profiling import (
        source_profile,
    )

    df = spark.createDataFrame(
        [
            ("web", "en", "the quick brown fox jumps over the lazy dog"),
            (None, "en", "a reasonably long document with and the of words"),
            (None, "de", "der schnelle braune fuchs и and the of words here"),
        ],
        "source string, lang string, text string",
    )
    rows = {r.source: r for r in source_profile(df).collect()}
    assert None in rows
    assert rows[None].n_docs == 2
    assert rows[None].lang_entropy > 0  # two languages in the NULL cohort
