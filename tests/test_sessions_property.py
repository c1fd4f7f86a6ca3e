"""Property test: window-based sessionization equals a direct
simulation (sort, split on gap) on arbitrary event layouts — including
exact-gap boundaries, duplicate timestamps, and single-event users."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from thrivefinancedatapipeline_spark.plans.events_queries import sessionize

BASE = datetime.datetime(2024, 1, 1)
GAP_MIN = 30

# minute offsets chosen so exact-30-minute gaps occur often
event = st.tuples(st.integers(0, 1), st.sampled_from([0, 10, 30, 40, 60, 90, 120]))
scenario = st.lists(event, min_size=1, max_size=12)


def simulate(rows):
    """sessions per user: split when gap > GAP_MIN (strictly)."""
    out = []
    for u in {r[1] for r in rows}:
        times = sorted(t for i, uu, t in [(r[0], r[1], r[2]) for r in rows] if uu == u)
        start = prev = times[0]
        n = 1
        for t in times[1:]:
            if (t - prev).total_seconds() > GAP_MIN * 60:
                out.append((u, start, prev, n))
                start, n = t, 0
            n += 1
            prev = t
        out.append((u, start, prev, n))
    return sorted(out)


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(scenario)
def test_sessionize_matches_simulation(spark, scn):
    rows = [
        (i, u, BASE + datetime.timedelta(minutes=m), 1.0)
        for i, (u, m) in enumerate(scn)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, GAP_MIN).collect()
    )
    assert got == simulate(rows)
