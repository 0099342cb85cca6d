"""Round-7 analytics catalog entries: association rules, survival,
change-point, Benford audit, collocations, RFM segmentation.

Every entry follows the catalog determinism contract (catalog.py): exact
integer counts, decimal-accumulated money sums, single 6-dp rounding of
each ratio, full tiebreaker sort keys, identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from taxi_data_pipeline_pset2_spark.queries._helpers import t
from taxi_data_pipeline_pset2_spark.queries.catalog import query

_BASKET_ORACLE = """
    WITH bi AS (
      SELECT DISTINCT l_orderkey AS b, p_brand AS i
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_orderkey IS NOT NULL AND p_brand IS NOT NULL
    ),
    ok AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 256),
    bi2 AS (SELECT bi.* FROM bi JOIN ok USING (b)),
    nb AS (SELECT count(DISTINCT b) AS n FROM bi2),
    ic AS (SELECT i, count(*) AS c FROM bi2 GROUP BY i),
    pc AS (SELECT x.i AS item_a, y.i AS item_b,
                  CAST(count(*) AS BIGINT) AS n_ab
           FROM bi2 x JOIN bi2 y ON x.b = y.b AND x.i < y.i
           GROUP BY 1, 2)
    SELECT item_a, item_b, n_ab,
           CAST(ca.c AS BIGINT) AS n_a, CAST(cb.c AS BIGINT) AS n_b,
           round(n_ab / n.n, 6) AS support,
           round(n_ab / ca.c, 6) AS conf_a_b,
           round(n_ab / cb.c, 6) AS conf_b_a,
           round((n_ab * n.n) / (ca.c * cb.c), 6) AS lift
    FROM pc
    JOIN ic ca ON pc.item_a = ca.i
    JOIN ic cb ON pc.item_b = cb.i
    CROSS JOIN nb n
    WHERE n_ab / n.n >= 0.005
    ORDER BY n_ab DESC, item_a, item_b
"""


@query("brand_association_rules", oracle=_BASKET_ORACLE, tags=("basket", "join", "bench"))
def brand_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise brand association rules over order baskets
    (operators/basket.py): support / confidence / lift for every brand
    pair co-occurring in >= 0.5% of orders. The pair generation is a
    basket-key self-join (bounded width), never an item cartesian; item
    frequencies and the basket total broadcast onto the pair aggregate."""
    from taxi_data_pipeline_pset2_spark.operators.basket import (
        association_rules,
    )

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("l_orderkey", "p_brand")
    return association_rules(
        baskets, "l_orderkey", "p_brand", min_support=0.005
    )
