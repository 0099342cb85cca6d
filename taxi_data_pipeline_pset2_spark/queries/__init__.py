from taxi_data_pipeline_pset2_spark.queries.catalog import (
    entries_tagged,
    oracle_sqls,
    registry,
    spark_queries,
)

__all__ = ["entries_tagged", "oracle_sqls", "registry", "spark_queries"]
