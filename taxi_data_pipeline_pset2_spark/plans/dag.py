"""dbt-like DAG runner (SURVEY.md section 2.11, 3.2).

The reference's orchestration is Mage block DAGs + dbt refs; here a node
is ``fn(spark, upstreams) -> DataFrame`` and "ref" is a dict lookup.
Materialization is per-node: ``table`` writes parquet into the warehouse
dir (optionally partitioned+sorted -- the X1 clustering equivalent) and
re-reads it, so downstream nodes scan materialized storage exactly like
dbt's table materialization; ``ephemeral`` passes the lazy plan through.

Execution is sequential in topological order -- within each node Spark
already parallelizes across all cores, so node-level threading (dbt's
4/8 threads, ``profiles.yml:12,24``) only helps when the cluster is
underutilized by a single node; at 100 TB per-node it is not.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Node:
    name: str
    fn: Callable[..., DataFrame]  # fn(spark, **upstream_dataframes)
    deps: tuple[str, ...] = ()
    materialization: str = "table"  # "table" | "ephemeral"
    partition_by: tuple[str, ...] = ()
    sort_within_partitions_by: tuple[str, ...] = ()


@dataclass
class NodeResult:
    name: str
    status: str
    seconds: float
    rows: int | None = None
    error: str | None = None


@dataclass
class Pipeline:
    warehouse_dir: str
    nodes: list[Node] = field(default_factory=list)

    def add(self, node: Node) -> "Pipeline":
        self.nodes.append(node)
        return self

    def _topo_order(self) -> list[Node]:
        by_name = {n.name: n for n in self.nodes}
        seen: dict[str, int] = {}  # 0=visiting, 1=done
        order: list[Node] = []

        def visit(name: str) -> None:
            state = seen.get(name)
            if state == 1:
                return
            if state == 0:
                raise ValueError(f"cycle at {name}")
            seen[name] = 0
            for d in by_name[name].deps:
                if d not in by_name:
                    raise ValueError(f"{name} depends on unknown node {d}")
                visit(d)
            seen[name] = 1
            order.append(by_name[name])

        for n in self.nodes:
            visit(n.name)
        return order

    def run(self, spark: SparkSession) -> tuple[dict[str, DataFrame], list[NodeResult]]:
        """Materialize all nodes in dependency order; returns the final
        DataFrames (reading from materialized storage for tables) and
        per-node status, mirroring Mage's per-block status tracking
        (``pipelines/taxi_zones/metadata.yaml:5-33``)."""
        built: dict[str, DataFrame] = {}
        results: list[NodeResult] = []
        for node in self._topo_order():
            t0 = time.perf_counter()
            try:
                upstream = {d: built[d] for d in node.deps}
                df = node.fn(spark, **upstream)
                rows = None
                if node.materialization == "table":
                    path = f"{self.warehouse_dir}/{node.name}"
                    writer = df
                    if node.sort_within_partitions_by:
                        writer = writer.sortWithinPartitions(
                            *node.sort_within_partitions_by
                        )
                    w = writer.write.mode("overwrite")
                    if node.partition_by:
                        w = w.partitionBy(*node.partition_by)
                    w.parquet(path)
                    df = spark.read.parquet(path)
                    rows = df.count()
                built[node.name] = df
                results.append(
                    NodeResult(node.name, "success", time.perf_counter() - t0, rows)
                )
            except Exception as e:  # noqa: BLE001 - per-node status like Mage
                results.append(
                    NodeResult(node.name, "failed", time.perf_counter() - t0, None, str(e))
                )
                raise
        return built, results


def taxi_pipeline(
    warehouse_dir: str,
    yellow: DataFrame,
    green: DataFrame,
    zones: DataFrame,
) -> Pipeline:
    """The full medallion DAG for given raw inputs. Gold fact is written
    partitioned by service_type + sorted by pickup_date within partitions
    (X1: partition pruning + row-group min/max skipping on the BASELINE
    benchmark query's predicates)."""
    from taxi_data_pipeline_pset2_spark.plans import taxi_models as m

    return (
        Pipeline(warehouse_dir)
        .add(Node("stg_trips_unified", lambda spark: m.stg_trips_unified(yellow, green)))
        .add(Node("dim_date", lambda spark: m.dim_date(spark)))
        .add(Node("dim_zone", lambda spark: m.dim_zone(zones)))
        .add(Node("dim_payment_type", lambda spark: m.dim_payment_type(spark)))
        .add(Node("dim_rate_code", lambda spark: m.dim_rate_code(spark)))
        .add(
            Node(
                "fct_trips",
                lambda spark, stg_trips_unified, dim_date, dim_zone: m.fct_trips(
                    stg_trips_unified, dim_date, dim_zone
                ),
                deps=("stg_trips_unified", "dim_date", "dim_zone"),
                partition_by=("service_type",),
                sort_within_partitions_by=("pickup_date",),
            )
        )
    )
