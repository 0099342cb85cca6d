"""Incremental maintenance of a JOIN view under append-only deltas --
the join-side sibling of the changelog-maintained rollup
(operators/rollup.py apply_changelog_to_rollup) and incremental SCD2
(plans/scd.py): keep a materialized A JOIN B current without
re-joining the full sides.

The classic delta rule (Blakeley, Larson & Tompa, SIGMOD 1986; every
IVM paper since): for inserts Delta_A / Delta_B,

    V_new = V_old
          UNION ALL  Delta_A JOIN B_new      (new left rows see ALL of B)
          UNION ALL  A_old   JOIN Delta_B    (old left rows see only new B
                                              -- pairing Delta_A with B_new
                                              already covered Delta x Delta)

Cost tracks the DELTA, not the view: both incremental joins carry a
delta-sized side, so Spark broadcasts it and the 100 TB base sides are
touched only by a broadcast hash probe (with partitioned storage, also
partition-pruned by the delta's key range). The from-scratch
alternative re-shuffles both full tables every refresh.

Append-only is the contract (event/fact feeds): updates/deletes need
counted multiplicities -- that machinery lives in the CDC/MERGE family
(operators/cdc.py + sources/sinks.py merge_upsert), and composing it
with this rule is the documented path. Correctness is proven the
strongest way available: the maintained view hash-equals a from-scratch
join in both the pytest suite and the catalog oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_join_view(
    view_old: DataFrame,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_new: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """The maintained inner-join view after applying append-only deltas:
    ``view_old UNION ALL (delta_a JOIN b_new) UNION ALL (a_old JOIN
    delta_b)``, column-aligned to ``view_old`` (join keys first, then
    the remaining view columns by name). ``b_new`` must already include
    ``delta_b``; duplicate rows are legitimate join multiplicities, so
    no distinct runs -- bag semantics exactly match the from-scratch
    join."""
    if not on:
        raise ValueError("need at least one join key")
    cols = view_old.columns
    inc_a = b_new.join(F.broadcast(delta_a), on).select(*cols)
    inc_b = a_old.join(F.broadcast(delta_b), on).select(*cols)
    return view_old.unionByName(inc_a).unionByName(inc_b)
