"""Deterministic taxi-shaped fixture generator (FIXTURES.md domains).

Generated *inside Spark* from ``spark.range`` + murmur3 hash draws -- no
driver-side loops, no RNG state: row ``id`` fully determines every value,
so any scale factor regenerates bit-identically under any partitioning.
(That is the 100 TB-safe way to synthesize data; ``F.rand`` is only
seed-stable per partition layout.)

Domains follow FIXTURES.md sections 1-3, including the dirty rows that
exercise the quality gates: NULL datetimes, negative distances/fares,
passenger_count 0, dropoff <= pickup, out-of-range years, unknown
location ids, whitespace/case variants in zones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.sources.schemas import (
    GREEN_SCHEMA,
    YELLOW_SCHEMA,
    ZONES_SCHEMA,
)

BOROUGHS = ["Manhattan", "Brooklyn", "Queens", "Bronx", "Staten Island", "EWR"]


def _h(salt: str, mod: int):
    """Deterministic uniform int in [0, mod) derived from the row id."""
    return F.pmod(F.hash(F.col("id"), F.lit(salt)), F.lit(mod))


def _gen_trips(spark: SparkSession, n: int, service: str) -> DataFrame:
    """Shared trip generator; yellow spans 2015-2025, green 2015..2019-03
    (service discontinued, reference README.md:146)."""
    yellow = service == "yellow"
    prefix = "tpep" if yellow else "lpep"
    span_days = (11 * 365) if yellow else (4 * 365 + 90)
    base = F.to_timestamp(F.lit("2015-01-01 00:00:00"))

    df = spark.range(n)
    pickup = F.timestamp_add(
        "SECOND", _h("sec", 86_400), F.timestamp_add("DAY", _h("day", span_days), base)
    )
    # dirty rows: ~0.2% NULL pickup, ~0.1% out-of-range (2009)
    pickup = (
        F.when(_h("null_pu", 500) == 0, F.lit(None).cast("timestamp"))
        .when(_h("oor", 1000) == 0, F.to_timestamp(F.lit("2009-06-01 12:00:00")))
        .otherwise(pickup)
    )
    duration_s = 60 + _h("dur", 10_740)
    dropoff = F.timestamp_add("SECOND", duration_s, pickup)
    dropoff = (
        F.when(_h("null_do", 500) == 0, F.lit(None).cast("timestamp"))
        .when(_h("neg_dur", 500) == 0, F.timestamp_add("SECOND", F.lit(-100), pickup))
        .otherwise(dropoff)
    )
    distance = F.round(_h("dist", 4000) / 100.0, 2)
    distance = F.when(_h("neg_dist", 400) == 0, F.lit(-1.5)).otherwise(distance)
    fare = F.round(F.lit(2.5) + _h("fare", 14_750) / 100.0, 2)
    fare = F.when(_h("neg_fare", 400) == 0, F.lit(-5.0)).otherwise(fare)
    tip = F.round(fare * (_h("tip", 40) / 100.0), 2)
    tolls = F.when(_h("tolls", 10) == 0, F.lit(6.55)).otherwise(F.lit(0.0))
    extra = F.element_at(
        F.array(F.lit(0.0), F.lit(0.5), F.lit(1.0), F.lit(2.5)), _h("extra", 4) + 1
    )
    mta = F.when(_h("mta", 10) < 9, F.lit(0.5)).otherwise(F.lit(0.0))
    surcharge = F.element_at(
        F.array(F.lit(0.0), F.lit(0.3), F.lit(1.0)), _h("sur", 3) + 1
    )
    congestion = F.element_at(
        F.array(F.lit(None).cast("double"), F.lit(0.0), F.lit(2.5)), _h("cong", 3) + 1
    )
    total = F.round(fare + tip + tolls + extra + mta + surcharge + F.coalesce(congestion, F.lit(0.0)), 2)
    total = F.when(_h("neg_total", 500) == 0, F.lit(-2.0)).otherwise(total)

    cols = [
        (_h("vendor", 2) + 1).cast("int").alias("vendorid"),
        pickup.cast("timestamp_ntz").alias(f"{prefix}_pickup_datetime"),
        dropoff.cast("timestamp_ntz").alias(f"{prefix}_dropoff_datetime"),
        F.when(_h("null_pc", 200) == 0, F.lit(None).cast("int"))
        .when(_h("zero_pc", 100) == 0, F.lit(0))
        .otherwise((_h("pc", 4) + 1).cast("int"))
        .alias("passenger_count"),
        distance.alias("trip_distance"),
        F.when(_h("null_rc", 100) == 0, F.lit(None).cast("int"))
        .otherwise((_h("rc", 6) + 1).cast("int"))
        .alias("ratecodeid"),
        F.when(_h("saf", 20) == 0, "Y").otherwise("N").alias("store_and_fwd_flag"),
        # ids 1..265 plus a few 266..270 missing from the zone lookup
        F.when(_h("pu_unk", 150) == 0, (266 + _h("pu_unk2", 5)).cast("int"))
        .otherwise((_h("pu", 265) + 1).cast("int"))
        .alias("pulocationid"),
        (_h("do", 265) + 1).cast("int").alias("dolocationid"),
        (_h("pay", 6) + 1).cast("int").alias("payment_type"),
        fare.alias("fare_amount"),
        extra.alias("extra"),
        mta.alias("mta_tax"),
        tip.alias("tip_amount"),
        tolls.alias("tolls_amount"),
        surcharge.alias("improvement_surcharge"),
        total.alias("total_amount"),
        congestion.alias("congestion_surcharge"),
    ]
    if yellow:
        cols.append(
            F.element_at(
                F.array(F.lit(None).cast("double"), F.lit(0.0), F.lit(1.25), F.lit(1.75)),
                _h("apt", 4) + 1,
            ).alias("airport_fee")
        )
        schema = YELLOW_SCHEMA
    else:
        cols.append(
            F.element_at(
                F.array(F.lit(None).cast("double"), F.lit(0.0), F.lit(1.95)),
                _h("ehail", 3) + 1,
            ).alias("ehail_fee")
        )
        schema = GREEN_SCHEMA
    out = df.select(*cols)
    got = [(f.name, f.dataType) for f in out.schema.fields]
    want = [(f.name, f.dataType) for f in schema.fields]
    assert got == want, f"{service} generator drifted from pinned schema: {got} != {want}"
    return out


def gen_yellow(spark: SparkSession, n: int = 60_000) -> DataFrame:
    return _gen_trips(spark, n, "yellow")


def gen_green(spark: SparkSession, n: int = 12_000) -> DataFrame:
    return _gen_trips(spark, n, "green")


def gen_zones(spark: SparkSession) -> DataFrame:
    """265 zones incl. airports and deliberately-dirty whitespace/case
    variants (exercises dim_zone cleanup, ``dim_zone.sql:15,21-34``)."""
    df = spark.range(1, 266)
    borough = F.element_at(
        F.array(*[F.lit(b) for b in BOROUGHS]), _h("boro", len(BOROUGHS)) + 1
    )
    # dirty variants: stray whitespace / lowercase
    borough = (
        F.when(_h("dirty_b", 20) == 0, F.concat(F.lit("  "), borough, F.lit(" ")))
        .when(_h("lower_b", 20) == 0, F.lower(borough))
        .otherwise(borough)
    )
    zone = F.concat(F.lit("Zone "), F.col("id"))
    zone = (
        F.when(F.col("id") == 132, F.lit("JFK Airport"))
        .when(F.col("id") == 138, F.lit("LaGuardia Airport"))
        .when(F.col("id") == 1, F.lit("Newark Airport"))
        .when(F.col("id") == 264, F.lit("Unknown"))
        .otherwise(zone)
    )
    service_zone = F.element_at(
        F.array(F.lit("Yellow Zone"), F.lit("Green Zone"), F.lit("Boro Zone"), F.lit("EWR")),
        _h("sz", 4) + 1,
    )
    service_zone = F.when(_h("sz_case", 15) == 0, F.upper(service_zone)).otherwise(service_zone)
    out = df.select(
        F.col("id").cast("int").alias("locationid"),
        borough.alias("borough"),
        zone.alias("zone"),
        service_zone.alias("service_zone"),
    )
    assert out.schema.fieldNames() == ZONES_SCHEMA.fieldNames()
    return out
