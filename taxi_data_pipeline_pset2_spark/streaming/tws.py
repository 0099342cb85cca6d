"""Gap sessionization on Spark 4's transformWithState API.

``streaming/events.py::sessionize`` implements gap sessions on
``applyInPandasWithState`` (the Spark 3.4 stateful API). This module is
the same operator on the successor API -- ``transformWithStateInPandas``
(SPARK-49560 / the TransformWithState processor model), which Spark 4
positions as the long-term custom-stateful surface: typed state handles
(value/list/map) instead of one tuple, first-class named timers, and a
RocksDB-backed state store.

Semantics are identical to ``sessionize`` by construction (the tests
assert output equality): events closer than ``gap_minutes`` chain into
one session per user; a session closes either inline (a later event
arrives past the gap) or via an event-time timer once the watermark
passes session_end + gap.

State per key is one (start_ms, end_ms, n, timer_ms) value -- bounded by
active users exactly like the old API; timers replace the manual
``state.hasTimedOut`` protocol.

Dependency marker (CI): ``transformWithStateInPandas`` requires the
``protobuf`` package -- its Python worker speaks a protobuf-framed
state-server protocol to the JVM (upstream: ``python/pyspark/sql/
streaming/proto/StateMessage_pb2.py`` in the Spark distribution imports
``google.protobuf``). This container ships without protobuf and without
network access (install attempt logged round 5: ``pip download
protobuf`` -> DNS failure ``Name or service not known`` against the
configured index; the build environment also forbids package installs;
re-attempted rounds 8-11 -- r11: ``pip download`` still dead, no
protobuf wheel/sdist anywhere on disk, and pyspark's own
``sql/protobuf`` package is the from_protobuf SQL wrapper, not
``google.protobuf``),
so the runtime path is exercised only on environments that have it --
``tests/test_streaming.py::test_transformwithstate_sessionize_matches_legacy_api``
runs the full stream≡legacy equality there and pins the ImportError
contract here. Everything else in this module (processor logic, state
shape, timer bookkeeping) is plain pandas/python and is covered by the
equality test whenever the dependency exists.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from taxi_data_pipeline_pset2_spark.streaming.events import SESSION_SCHEMA

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithStateInPandas speaks a protobuf-based state-server
    protocol: without the ``protobuf`` package the Python driver worker
    crashes at query start. Gate callers (and tests) on this probe
    instead of failing mid-stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _session_row(user_id, start_ms: int, end_ms: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_ms, unit="ms")],
            "session_end": [pd.Timestamp(end_ms, unit="ms")],
            "n_events": [n],
        }
    )


class GapSessionProcessor(StatefulProcessor):
    """One open session per user in a ValueState; an event-time timer at
    end_ms + gap flushes the session when the watermark passes it."""

    def __init__(self, gap_ms: int):
        self.gap_ms = gap_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # timer_ms is the timestamp actually passed to registerTimer (which
        # may have been clamped to watermark+1, see below) -- deleteTimer
        # must be given that exact value, not a recomputed end_ms+gap,
        # or a clamped stale timer survives and later fires mid-session,
        # splitting it.
        self.session = handle.getValueState(
            "session", "start_ms long, end_ms long, n long, timer_ms long"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(rows)).sort_values("ts")
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
        if self.session.exists():
            start_ms, end_ms, n, old_timer = self.session.get()
        else:
            start_ms, end_ms, n = ts_ms[0], ts_ms[0], 0
            old_timer = None
        closed: list[tuple[int, int, int]] = []
        for t in ts_ms:
            if t - end_ms > self.gap_ms:
                closed.append((start_ms, end_ms, n))
                start_ms, end_ms, n = t, t, 1
            else:
                end_ms = max(end_ms, t)
                n += 1
        # named timers are explicit on this API: drop the stale one, arm
        # the new close time (strictly ahead of the watermark so an
        # already-passed watermark still fires it on the next advance)
        new_timer = max(
            end_ms + self.gap_ms, timerValues.getCurrentWatermarkInMs() + 1
        )
        if old_timer is not None and old_timer != new_timer:
            self.handle.deleteTimer(old_timer)
        self.handle.registerTimer(new_timer)
        self.session.update((start_ms, end_ms, n, new_timer))
        for s, e, c in closed:
            yield _session_row(user_id, s, e, c)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if self.session.exists():
            start_ms, end_ms, n, _timer_ms = self.session.get()
            self.session.clear()
            yield _session_row(user_id, start_ms, end_ms, n)

    def close(self) -> None:
        pass


def sessionize_tws(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """transformWithState twin of ``events.sessionize``. Requires the
    RocksDB state store provider (set on the session here -- the HDFS
    provider does not support this operator) and the ``protobuf``
    package (see :func:`tws_available`)."""
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state-server protocol); use streaming.events.sessionize "
            "(applyInPandasWithState) on environments without it"
        )
    spark = stream.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            GapSessionProcessor(gap_minutes * 60 * 1000),
            outputStructType=SESSION_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
