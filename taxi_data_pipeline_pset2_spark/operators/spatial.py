"""Grid-bucketed planar radius join: all (left, right) pairs within
``radius`` in one equi-join -- the 2-D sibling of the bucketed range
join (operators/rangejoin.py).

Why not ``left.join(right, dist <= r)``: a non-equi spatial predicate
plans as BroadcastNestedLoopJoin / cartesian -- O(n*m) at 100 TB. The
scalable plan is the standard grid-file / geohash-bucket scheme (the
same shape Sedona's partitioned spatial join and Uber's H3 pipelines
use): quantize the plane into square cells of side ``cell`` (default =
radius), explode each LEFT point to its 3x3 neighborhood of cells, key
RIGHT points by their single home cell, equi-join on the cell id, and
keep pairs passing the exact distance residual. With cell >= radius a
qualifying pair ALWAYS shares one of the 9 probed cells, and since
each right point lives in exactly one cell, no pair is emitted twice
-- correctness needs no dedup shuffle.

Scale notes: the left side explodes exactly 9x (a constant, not a
span); the join is a plain hash/sort-merge equi-join on (cx, cy);
dense-cell skew is the LSH-bucket problem and gets the same treatment
(AQE skew split; pick ``cell`` ~ radius so occupancy tracks the data
density, not the domain size). The distance residual compares SQUARED
planar distance (dx*dx + dy*dy <= r*r): products and sums of identical
doubles are identical IEEE on any engine, so the operator is exactly
oracle-able -- no trig in the hot path (geodetic haversine would make
boundary pairs engine-dependent in the last ulp; callers needing true
great-circle semantics can post-filter the survivors, a tiny set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    radius: float,
    cell: float | None = None,
) -> DataFrame:
    """All pairs (left row, right row) with planar distance <= radius:
    every column of both inputs plus ``dist`` (6-dp). ``cell`` must be
    >= radius (default: = radius); NULL coordinates drop. Column names
    must not collide across the two inputs (select/alias first)."""
    if radius <= 0:
        raise ValueError(f"radius must be > 0, got {radius}")
    cell = float(radius) if cell is None else float(cell)
    if cell < radius:
        raise ValueError(
            f"cell ({cell}) must be >= radius ({radius}): a qualifying "
            "pair could otherwise sit more than one cell apart"
        )
    # Strictly widen the working cell by a relative margin (r11): with
    # cell == radius EXACTLY, a pair at distance exactly r can straddle
    # TWO cell boundaries -- floor(lx/cell) and floor(rx/cell) are each
    # one division-rounding away from their true quotients t and t+1,
    # and when t sits within half an ulp below an integer the computed
    # quotients can floor to n-1 and n+1, skipping the +-1 probe band
    # while dx*dx == r*r still passes the residual. A 1e-12 relative
    # margin (>> the ~2e-16 rounding of one division) makes the true
    # quotient gap strictly < 1 - margin, so the computed floors can
    # never land 2 apart for a qualifying pair. Occupancy is unchanged
    # to 12 significant digits; the exact residual keeps the match set
    # identical.
    cell *= 1.0 + 1e-12
    lx, ly = (F.col(c).cast("double") for c in left_xy)
    rx, ry = (F.col(c).cast("double") for c in right_xy)
    l_ = left.filter(lx.isNotNull() & ly.isNotNull())
    r_ = right.filter(rx.isNotNull() & ry.isNotNull()).withColumns(
        {
            "_cx": F.floor(rx / cell),
            "_cy": F.floor(ry / cell),
        }
    )
    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    probes = (
        l_.withColumn("_ox", off)
        .withColumn("_oy", off)
        .withColumns(
            {
                "_cx": F.floor(lx / cell) + F.col("_ox"),
                "_cy": F.floor(ly / cell) + F.col("_oy"),
            }
        )
        .drop("_ox", "_oy")
    )
    d2 = (lx - rx) * (lx - rx) + (ly - ry) * (ly - ry)
    return (
        probes.join(r_, ["_cx", "_cy"])
        .filter(d2 <= F.lit(float(radius) * float(radius)))
        .drop("_cx", "_cy")
        .withColumn("dist", F.round(F.sqrt(d2), 6))
    )
