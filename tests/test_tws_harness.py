"""Executes GapSessionProcessor's logic without the protobuf runtime.

The transformWithStateInPandas ENGINE needs the ``protobuf`` package
(state-server protocol), which this container cannot install (no
network: ``pip download protobuf`` -> DNS ``Name or service not
known``; the build rules also forbid installs). The processor CLASS,
however, is plain pandas + the pyspark ABC -- so this harness drives
``init``/``handleInputRows``/``handleExpiredTimer`` through a faithful
in-memory engine (per-key value state, named event-time timers fired
when the watermark passes them) and pins the semantics the skipped
integration test (tests/test_streaming.py::
test_transformwithstate_sessionize_matches_legacy_api) would check,
including the ADVICE-r5 stale-timer fix that had never executed
anywhere: a CLAMPED registered timer must be deleted by its exact
registered value, not a recomputed end_ms+gap.
"""

from __future__ import annotations

import pandas as pd
import pytest

from taxi_data_pipeline_pset2_spark.streaming.tws import GapSessionProcessor

GAP_MS = 30 * 60 * 1000  # 30 min


class FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeHandle:
    """Per-key handle: one value state + a named-timer set with the real
    API's contract -- deleteTimer removes an armed timer by exact value.
    Deleting a timer that is not armed is recorded: that is precisely
    the recompute bug the r5 fix addressed (the processor recomputing
    end_ms+gap instead of remembering the clamped registered value)."""

    def __init__(self):
        self.state = FakeValueState()
        self.timers: set[int] = set()
        self.bad_deletes: list[int] = []

    def getValueState(self, name, schema):
        return self.state

    def registerTimer(self, ts_ms: int):
        self.timers.add(int(ts_ms))

    def deleteTimer(self, ts_ms: int):
        ts_ms = int(ts_ms)
        if ts_ms in self.timers:
            self.timers.discard(ts_ms)
        else:
            self.bad_deletes.append(ts_ms)


class _TimerValues:
    def __init__(self, wm_ms: int):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm

    def getCurrentProcessingTimeInMs(self):  # pragma: no cover - unused
        return self._wm


class _ExpiredTimerInfo:
    def __init__(self, ts_ms: int):
        self._ts = ts_ms

    def getExpiryTimeInMs(self):
        return self._ts


class FakeEngine:
    """Event-time microbatch loop: feed per-key batches, advance the
    watermark to max(event_ts) - delay after each batch, then fire every
    armed timer whose expiry <= watermark (expiry order), exactly the
    real engine's EventTime timeMode behavior."""

    def __init__(self, gap_ms: int = GAP_MS, delay_ms: int = 60 * 60 * 1000):
        self.delay_ms = delay_ms
        self.wm = -1
        self.procs: dict = {}
        self.out: list[pd.DataFrame] = []
        self.gap_ms = gap_ms

    def _proc(self, key):
        if key not in self.procs:
            p = GapSessionProcessor(self.gap_ms)
            h = FakeHandle()
            p.init(h)
            p._fake_handle = h
            self.procs[key] = p
        return self.procs[key]

    def feed(self, batch: list[tuple[str, int]]):
        by_key: dict[str, list[int]] = {}
        for user, ts_ms in batch:
            by_key.setdefault(user, []).append(ts_ms)
        for user, tss in by_key.items():
            p = self._proc(user)
            pdf = pd.DataFrame({"ts": pd.to_datetime(tss, unit="ms")})
            self.out.extend(
                p.handleInputRows((user,), iter([pdf]), _TimerValues(self.wm))
            )
        self.wm = max(self.wm, max(ts for _, ts in batch) - self.delay_ms)
        self._fire()

    def _fire(self):
        for user, p in self.procs.items():
            h = p._fake_handle
            for t in sorted(x for x in h.timers if x <= self.wm):
                h.timers.discard(t)
                self.out.extend(
                    p.handleExpiredTimer(
                        (user,), _TimerValues(self.wm), _ExpiredTimerInfo(t)
                    )
                )

    def finish(self):
        # end of stream: watermark jumps past everything
        self.wm = 2**62
        self._fire()
        if not self.out:
            return pd.DataFrame(
                columns=["user_id", "session_start", "session_end", "n_events"]
            )
        return (
            pd.concat(self.out, ignore_index=True)
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )


def _reference_sessions(events: list[tuple[str, int]], gap_ms: int = GAP_MS):
    """Plain-python gap sessionization oracle."""
    out = []
    by_user: dict[str, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, tss in by_user.items():
        tss = sorted(tss)
        start = end = tss[0]
        n = 1
        for t in tss[1:]:
            if t - end > gap_ms:
                out.append((u, start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = max(end, t), n + 1
        out.append((u, start, end, n))
    return sorted(out)


MIN = 60 * 1000


def test_processor_matches_reference_across_batches():
    events = [
        ("a", 0), ("a", 5 * MIN), ("b", 2 * MIN),
        ("a", 50 * MIN),            # a: new session (45 min gap > 30)
        ("b", 20 * MIN),            # b: same session
        ("a", 60 * MIN), ("b", 70 * MIN),
        ("a", 200 * MIN),           # both: far future -> closes everything
        ("b", 200 * MIN),
    ]
    eng = FakeEngine()
    # three microbatches, uneven split
    eng.feed(events[:3])
    eng.feed(events[3:7])
    eng.feed(events[7:])
    got = eng.finish()
    got_tuples = sorted(
        (
            r.user_id,
            int(r.session_start.timestamp() * 1000),
            int(r.session_end.timestamp() * 1000),
            int(r.n_events),
        )
        for r in got.itertuples()
    )
    assert got_tuples == _reference_sessions(events)
    for p in eng.procs.values():
        assert p._fake_handle.bad_deletes == []


def test_clamped_timer_is_deleted_by_registered_value():
    """The r5 timer bug: when end_ms+gap <= watermark the registered
    timer is clamped to watermark+1; on the next batch the processor
    must delete THAT stored value. Recomputing end_ms+gap would log a
    bad delete here and leave the clamped timer armed to fire
    mid-session, splitting it.

    The clamp needs an event older than watermark-gap; the real engine
    filters fully-late rows, but a session can land in this state via
    batches racing the watermark -- the fake engine feeds the late row
    directly to pin the processor-side contract."""
    eng = FakeEngine(delay_ms=10 * MIN)
    eng.feed([("u", 0), ("x", 100 * MIN)])
    # wm = 90 min; u's 30-min timer fired and closed session (0,0,1)
    eng.feed([("u", 50 * MIN)])
    # late event: end+gap = 80 min <= wm -> timer CLAMPED to wm+1ms;
    # wm unchanged (50-10=40 < 90), so the clamped timer has not fired
    p = eng.procs["u"]
    clamped = 90 * MIN + 1
    assert p._fake_handle.timers == {clamped}
    assert p._fake_handle.state.get()[3] == clamped  # stored timer_ms
    eng.feed([("u", 70 * MIN)])
    # same session (20-min gap): the clamped timer must have been
    # deleted by its exact stored value and replaced by end+gap=100min
    assert p._fake_handle.bad_deletes == []
    assert p._fake_handle.timers == {100 * MIN}
    got = eng.finish()
    u = got[got.user_id == "u"]
    assert [
        (int(r.session_start.timestamp() * 1000 // MIN),
         int(r.session_end.timestamp() * 1000 // MIN),
         int(r.n_events))
        for r in u.itertuples()
    ] == [(0, 0, 1), (50, 70, 2)]


def test_harness_only_runs_where_engine_cannot():
    """Record of WHY this harness exists: the real engine needs protobuf,
    which is absent and uninstallable here (no network / no installs).
    If protobuf ever appears, the integration equality test un-skips and
    this assertion reminds us the harness is then redundant."""
    from taxi_data_pipeline_pset2_spark.streaming.tws import tws_available

    if tws_available():
        pytest.skip("protobuf present: the real integration test covers TWS")
    with pytest.raises(ModuleNotFoundError):
        import google.protobuf  # noqa: F401
