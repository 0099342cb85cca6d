"""JSON operator tests: inference, typed parse, malformed handling,
path pulls."""

import pytest
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.operators.json_ops import (
    infer_json_schema,
    json_path,
    parse_json_column,
)


@pytest.fixture()
def json_df(spark):
    rows = [
        (1, '{"a": 1, "b": "x", "c": 1.5}'),
        (2, '{"a": 2, "b": "y"}'),
        (3, None),
        (4, "not json at all"),
    ]
    return spark.createDataFrame(rows, "id int, payload string")


class TestJsonOps:
    def test_infer_schema_fields(self, spark, json_df):
        schema = infer_json_schema(json_df, "payload")
        names = {f.name for f in schema.fields if not f.name.startswith("_")}
        assert {"a", "b", "c"} <= names

    def test_parse_flatten_types(self, spark, json_df):
        out = parse_json_column(json_df, "payload", prefix="p_")
        rows = {r.id: r for r in out.collect()}
        assert rows[1].p_a == 1 and rows[1].p_b == "x"
        assert rows[1].p_c == pytest.approx(1.5)
        assert rows[2].p_c is None  # absent field -> NULL
        assert rows[3].p_a is None  # NULL payload
        assert rows[4].p_a is None  # malformed -> NULL, row kept
        assert "payload" in out.columns  # original kept for audit

    def test_parse_struct_mode(self, spark, json_df):
        out = parse_json_column(json_df, "payload", flatten=False)
        r = {x.id: x for x in out.collect()}[1]
        assert r.payload_parsed.a == 1

    def test_explicit_schema_wins(self, spark, json_df):
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType([StructField("a", LongType())])
        out = parse_json_column(json_df, "payload", schema=schema)
        assert "a" in out.columns and "b" not in out.columns

    def test_json_path(self, spark, json_df):
        out = json_df.select(
            "id", json_path("payload", "$.a").cast("long").alias("a")
        )
        rows = {r.id: r.a for r in out.collect()}
        assert rows[1] == 1 and rows[4] is None

    def test_inference_partitioning_invariant(self, spark, json_df):
        s1 = infer_json_schema(json_df, "payload")
        s2 = infer_json_schema(json_df.repartition(5), "payload")
        assert s1 == s2
