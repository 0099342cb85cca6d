"""Funnel analysis: DuckDB oracle equality on real events, hand-built
sequencing semantics, window cutoff, and summary math."""

from __future__ import annotations

import datetime as dt

from taxi_data_pipeline_pset2_spark.operators.funnel import (
    funnel_stages,
    funnel_summary,
)
from taxi_data_pipeline_pset2_spark.sources.readers import load_table

from .oracle_utils import compare_frames, duckdb_connection

STAGES_ORACLE = """
WITH s0 AS (
    SELECT user_id, min(ts) AS t_0 FROM events
    WHERE event_type = 'view' GROUP BY user_id),
s1 AS (
    SELECT e.user_id, min(e.ts) AS t_1
    FROM events e JOIN s0 ON e.user_id = s0.user_id
    WHERE e.event_type = 'click' AND e.ts > s0.t_0
    GROUP BY e.user_id),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t_2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s1.t_1
    GROUP BY e.user_id)
SELECT s0.user_id, s0.t_0, s1.t_1, s2.t_2,
       CAST(1 + (s1.t_1 IS NOT NULL)::INT + (s2.t_2 IS NOT NULL)::INT AS BIGINT)
           AS n_stages
FROM s0 LEFT JOIN s1 ON s0.user_id = s1.user_id
        LEFT JOIN s2 ON s1.user_id = s2.user_id
"""


def test_funnel_stages_match_duckdb_oracle(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = funnel_stages(ev, ("view", "click", "purchase")).toPandas()
    con = duckdb_connection(sf_dir)
    want = con.execute(STAGES_ORACLE).df()
    assert compare_frames(got, want) == []
    assert len(got) > 0


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_funnel_sequencing_semantics(spark):
    rows = [
        # user 1: full ordered funnel
        (1, _ts(0), "view"), (1, _ts(5), "click"), (1, _ts(9), "purchase"),
        # user 2: purchase BEFORE click -> stops at click stage
        (2, _ts(0), "view"), (2, _ts(3), "purchase"), (2, _ts(6), "click"),
        # user 3: click before any view -> that click cannot count,
        # later click does
        (3, _ts(1), "click"), (3, _ts(2), "view"), (3, _ts(4), "click"),
        # user 4: never viewed -> absent from the funnel
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: (r.t_0, r.t_1, r.t_2, r.n_stages)
           for r in funnel_stages(ev, ("view", "click", "purchase")).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (_ts(0), _ts(5), _ts(9), 3)
    assert got[2][1] == _ts(6) and got[2][2] is None and got[2][3] == 2
    assert got[3] == (_ts(2), _ts(4), None, 2)


def test_funnel_window_cutoff(spark):
    rows = [
        (1, _ts(0), "view"), (1, _ts(5), "click"),    # inside 10-min window
        (2, _ts(0), "view"), (2, _ts(15), "click"),   # outside window
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r.n_stages
           for r in funnel_stages(ev, ("view", "click"), within_minutes=10).collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_summary_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    stages = funnel_stages(ev, ("view", "click", "purchase"))
    summary = {r.stage: (r.users, r.conversion_from_start)
               for r in funnel_summary(stages, 3).collect()}
    s0, s1, s2 = (summary[i][0] for i in range(3))
    assert s0 >= s1 >= s2 > 0
    assert summary[0][1] == 1.0
    assert summary[2][1] == round(s2 / s0, 6)


class TestFunnelStepTimings:
    def test_hand_built_latencies(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.funnel import (
            funnel_step_timings,
        )

        b = dt.datetime(2024, 1, 1)

        def ev(u, t, mins):
            return (u, t, b + dt.timedelta(minutes=mins))

        rows = [
            # u1: view@0 click@10 purchase@40  -> gaps 600, 1800
            ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 40),
            # u2: view@0 click@30 (no purchase) -> gap 1800
            ev(2, "view", 0), ev(2, "click", 30),
            # u3: click before view: click never counts
            ev(3, "click", 0), ev(3, "view", 5),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r.step: r
            for r in funnel_step_timings(
                df, ("view", "click", "purchase")
            ).collect()
        }
        assert got[1].n_users == 2
        assert got[1].median_s == 1200.0  # interpolated between 600, 1800
        assert got[1].mean_s == 1200.0
        assert got[1].transition == "view->click"
        assert got[2].n_users == 1 and got[2].median_s == 1800.0

    def test_uncompleted_transition_reports_zero(self, spark):
        import datetime as dt

        from taxi_data_pipeline_pset2_spark.operators.funnel import (
            funnel_step_timings,
        )

        rows = [(1, "view", dt.datetime(2024, 1, 1))]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        got = {
            r.step: r
            for r in funnel_step_timings(df, ("view", "click")).collect()
        }
        assert got[1].n_users == 0 and got[1].median_s is None


def test_step_timings_emit_spine_rows_when_funnel_is_empty(spark):
    """No stage-0 completers: the timing frame must still carry one row
    per transition with n_users = 0 and NULL latencies (the oracle's
    unconditional UNION ALL), not return zero rows."""
    from pyspark.sql import functions as F

    from taxi_data_pipeline_pset2_spark.operators.funnel import (
        funnel_step_timings,
    )

    events = spark.createDataFrame(
        [(1, "click", "2024-01-01 00:00:00")],
        "user_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = funnel_step_timings(events, ["view", "click", "purchase"]).collect()
    assert [(r.step, r.transition, r.n_users, r.median_s) for r in out] == [
        (1, "view->click", 0, None),
        (2, "click->purchase", 0, None),
    ]
