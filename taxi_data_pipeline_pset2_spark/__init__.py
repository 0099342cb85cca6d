"""PySpark-native analytics engine with the capabilities of
Crescendum429/taxi-data-pipeline-pset2.

The reference (surveyed in /root/repo/SURVEY.md) is a batch ELT pipeline:
pandas/Mage ingestion -> Snowflake/dbt medallion models -> analytic SQL.
This package re-expresses that entire surface as idiomatic PySpark:

- ``session``    : tuned SparkSession factory (AQE, UTC, shuffle sizing)
- ``sources``    : typed readers, schemas, availability manifest, sinks
- ``functions``  : scalar-function library (SURVEY.md section 2.8)
- ``queries``    : the analytics catalog -- every operator as a named query
                   with a DuckDB oracle twin
- ``plans``      : dbt-like DAG runner + the taxi medallion models
- ``operators``  : LLM-data-pipeline extensions (dedup, similarity, text)
- ``streaming``  : Structured Streaming over the events table
- ``quality``    : dbt-style data tests (not_null/unique/relationships/...)

Everything is stock PySpark DataFrame/SQL; Catalyst+AQE do the physical
planning. No RDDs, no row-level Python UDFs in hot paths.
"""

__version__ = "0.1.0"
