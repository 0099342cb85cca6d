"""Stateful streaming EWMA: the continuous form of the batch
``operators/timeseries.py ewma`` recursion, with the per-key running
average carried across micro-batches as keyed state.

The batch kernel's contract (adjust=False: ewma_0 = x_0, ewma_t =
alpha*x_t + (1-alpha)*ewma_{t-1}) is replayed exactly: within a batch
rows fold in (ts, tie) order; across batches the state stores the
UNROUNDED running value (rounding only the emitted copy, like the batch
kernel), so a stream drained over any batch slicing is bit-identical to
the batch operator over the concatenated rows -- pinned in
tests/test_streaming_smoothing.py.

Ordering contract: per-key event-time must be monotone ACROSS batches
(the file-source ingest-order guarantee the other streaming modules
rely on); rows inside a batch may arrive unordered and are sorted by
(ts, tie) before folding. A genuinely late row -- older than state the
key has already folded -- is smoothed in arrival order, the standard
online-EWMA behavior; exact-order replay of late data is the batch
operator's job.

State: one double per active key -- the minimum any online smoothing
holds; no timers (NoTimeout), so state lives for the key's lifetime.
Keys are dropped from state only with the query; for unbounded key
spaces put a TTL policy upstream (sessionize shows the timer pattern).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_ewma(
    stream: DataFrame,
    alpha: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """One output row per input event: (key, tie, ts, value, ewma 6-dp),
    the running EWMA at that event. ``value_col`` must be non-NULL
    (same contract as the batch kernel)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")

    out_schema = (
        f"{key_col} long, {tie_col} long, {ts_col} timestamp, "
        f"{value_col} double, ewma double"
    )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (k,) = key
        from taxi_data_pipeline_pset2_spark.operators.similarity import (
            _round_half_up_6,
        )

        rows = pd.concat(list(pdfs)).sort_values([ts_col, tie_col])
        prev = state.get[0] if state.exists else None
        raw = []
        for v in rows[value_col]:
            prev = float(v) if prev is None else alpha * float(v) + (1.0 - alpha) * prev
            raw.append(prev)
        # the shared HALF_UP rounder, matching the batch kernel
        # (operators/timeseries.py ewma) bit-for-bit -- the stream ==
        # batch contract is pinned in tests/test_streaming_smoothing.py
        out = _round_half_up_6(raw).tolist()
        state.update((float(prev),))
        yield pd.DataFrame(
            {
                key_col: [k] * len(out),
                tie_col: rows[tie_col].tolist(),
                ts_col: rows[ts_col].tolist(),
                value_col: rows[value_col].tolist(),
                "ewma": out,
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="e double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
