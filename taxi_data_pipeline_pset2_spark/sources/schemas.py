"""Pinned raw-source schemas (FIXTURES.md; reference bronze DDL at
``.file_versions/data_exporters/exporter_taxi.py/1759109036:141-170`` and
``models/raw/sources.yml:13-109``).

The reference infers schemas in pandas and reconciles later; Spark-first
we pin an explicit ``StructType`` per source so types never drift with
file contents (the 100 TB failure mode: one odd month flips a column to
string). Yellow and green diverge: green has ``ehail_fee`` and no
``airport_fee``; yellow the reverse (``stg_trips_unified.sql:36,77``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _trip_common_head(pickup: str, dropoff: str) -> list[StructField]:
    return [
        StructField("vendorid", IntegerType()),
        StructField(pickup, TimestampNTZType()),
        StructField(dropoff, TimestampNTZType()),
        StructField("passenger_count", IntegerType()),
        StructField("trip_distance", DoubleType()),
        StructField("ratecodeid", IntegerType()),
        StructField("store_and_fwd_flag", StringType()),
        StructField("pulocationid", IntegerType()),
        StructField("dolocationid", IntegerType()),
        StructField("payment_type", IntegerType()),
        StructField("fare_amount", DoubleType()),
        StructField("extra", DoubleType()),
        StructField("mta_tax", DoubleType()),
        StructField("tip_amount", DoubleType()),
        StructField("tolls_amount", DoubleType()),
        StructField("improvement_surcharge", DoubleType()),
        StructField("total_amount", DoubleType()),
        StructField("congestion_surcharge", DoubleType()),
    ]


YELLOW_SCHEMA = StructType(
    _trip_common_head("tpep_pickup_datetime", "tpep_dropoff_datetime")
    + [StructField("airport_fee", DoubleType())]
)

GREEN_SCHEMA = StructType(
    _trip_common_head("lpep_pickup_datetime", "lpep_dropoff_datetime")
    + [StructField("ehail_fee", DoubleType())]
)

ZONES_SCHEMA = StructType(
    [
        StructField("locationid", IntegerType(), nullable=False),
        StructField("borough", StringType()),
        StructField("zone", StringType()),
        StructField("service_zone", StringType()),
    ]
)

# The 21-column unified silver layout (stg_trips_unified.sql:5-95).
SILVER_COLUMNS = [
    "service_type",
    "vendorid",
    "pickup_datetime",
    "dropoff_datetime",
    "passenger_count",
    "trip_distance",
    "ratecodeid",
    "store_and_fwd_flag",
    "pulocationid",
    "dolocationid",
    "payment_type",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "congestion_surcharge",
    "airport_fee",
    "ehail_fee",
]
