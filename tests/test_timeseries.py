"""Time-series operators: as-of join, hierarchical rollup,
sessionization (pipeline/timeseries.py).

Semantics are pinned against hand-computed expectations, and the as-of
join's plan shape is pinned: ONE hash exchange, no range join, no
broadcast-nested-loop / cartesian product — the property that makes it
survive 100 TB."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filters_spark.pipeline import (
    asof_join,
    interval_join,
    sessionize,
    time_rollup,
)


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01 10:00:00")),
            (2, "u1", _ts("2024-01-01 12:00:00")),
            (3, "u2", _ts("2024-01-01 09:00:00")),
            (4, "u3", _ts("2024-01-01 09:00:00")),
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), 10.0),
            ("u1", _ts("2024-01-01 11:00:00"), 20.0),
            ("u2", _ts("2024-01-01 09:00:00"), 30.0),  # same instant
            ("u2", _ts("2024-01-01 09:30:00"), 40.0),  # after left
        ],
        "user_id string, ts timestamp, price double",
    )
    return left, right


def test_asof_join_backward_inclusive(frames):
    left, right = frames
    out = asof_join(left, right, on="user_id").orderBy("event_id").collect()
    by_id = {r["event_id"]: r for r in out}
    assert len(out) == 4
    # u1@10:00 -> 09:30 row; u1@12:00 -> 11:00 row
    assert by_id[1]["price_right"] == 10.0
    assert by_id[2]["price_right"] == 20.0
    # equal timestamps match (inclusive backward)
    assert by_id[3]["price_right"] == 30.0
    assert by_id[3]["ts_right"] == _ts("2024-01-01 09:00:00")
    # no right rows for u3 -> nulls, left row preserved
    assert by_id[4]["price_right"] is None
    assert by_id[4]["ts_right"] is None


def test_asof_join_tolerance_and_tiebreak(spark, frames):
    left, right = frames
    # 10:00 left vs 09:30 right = 1800s gap; tolerance 900s drops it
    out = asof_join(
        left, right, on="user_id", tolerance_seconds=900.0
    ).collect()
    by_id = {r["event_id"]: r for r in out}
    assert by_id[1]["price_right"] is None  # too old
    assert by_id[3]["price_right"] == 30.0  # 0s gap survives

    # two right rows at the SAME (key, ts): largest tiebreak wins
    dup = spark.createDataFrame(
        [
            ("u9", _ts("2024-01-01 08:00:00"), 1.0),
            ("u9", _ts("2024-01-01 08:00:00"), 5.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    l9 = spark.createDataFrame(
        [(1, "u9", _ts("2024-01-01 09:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    r = asof_join(l9, dup, on="user_id", tiebreak="price").collect()[0]
    assert r["price_right"] == 5.0


def test_asof_join_forward_and_nearest(spark, frames):
    left, right = frames
    fwd = asof_join(left, right, on="user_id", direction="forward")
    by_id = {r["event_id"]: r for r in fwd.collect()}
    # u1@10:00 -> next right at 11:00; u1@12:00 -> nothing after
    assert by_id[1]["price_right"] == 20.0
    assert by_id[2]["price_right"] is None
    # equal ts matches inclusively in forward mode too
    assert by_id[3]["price_right"] == 30.0

    near = asof_join(left, right, on="user_id", direction="nearest")
    by_id = {r["event_id"]: r for r in near.collect()}
    # u1@10:00: backward 09:30 (1800s) vs forward 11:00 (3600s)
    assert by_id[1]["price_right"] == 10.0
    # u1@12:00: only backward exists
    assert by_id[2]["price_right"] == 20.0
    # u2@09:00: exact-tie distance zero -> backward candidate
    assert by_id[3]["price_right"] == 30.0
    assert by_id[4]["price_right"] is None

    # nearest at a genuine tie: 10:00 left, rights at 09:00 and 11:00
    lt = spark.createDataFrame(
        [(1, "u5", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    rt = spark.createDataFrame(
        [
            ("u5", _ts("2024-01-01 09:00:00"), 1.0),
            ("u5", _ts("2024-01-01 11:00:00"), 2.0),
        ],
        "user_id string, ts timestamp, price double",
    )
    r = asof_join(lt, rt, on="user_id", direction="nearest").collect()[0]
    assert r["price_right"] == 1.0  # backward wins exact ties

    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", direction="sideways")


def test_asof_join_nearest_plan_still_single_exchange(frames):
    left, right = frames
    plan = asof_join(
        left, right, on="user_id", direction="nearest"
    )._jdf.queryExecution().executedPlan().toString()
    # both frames ride the same partition/order spec: one shuffle+sort
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Sort ") <= 1 or plan.count("hashpartitioning") == 1
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin"):
        assert bad not in plan


def test_asof_join_plan_single_exchange_no_range_join(frames):
    left, right = frames
    plan = asof_join(left, right, on="user_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    for bad in ("CartesianProduct", "BroadcastNestedLoop", "SortMergeJoin"):
        assert bad not in plan


def test_interval_join_bucketed_containment(spark):
    """Half-open [start, end) containment via the bucketed equi-join:
    boundary inclusion/exclusion, intervals crossing bucket boundaries,
    multiple overlapping intervals, and no pair duplication."""
    points = spark.createDataFrame(
        [
            (1, "u1", 100.0),
            (2, "u1", 150.0),  # == start of iv B: included
            (3, "u1", 200.0),  # == end of iv A: excluded from A
            (4, "u1", 5000.0),  # bucket far away
            (5, "u2", 100.0),  # other key
        ],
        "event_id long, user_id string, ts double",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 50.0, 200.0, "A"),  # crosses bucket boundary at 128
            ("u1", 150.0, 260.0, "B"),  # overlaps A
            ("u2", 90.0, 110.0, "C"),
        ],
        "user_id string, start double, end double, tag string",
    )
    got = interval_join(
        points,
        intervals,
        on="user_id",
        point_ts="ts",
        bucket_width=128.0,
    )
    pairs = sorted(
        (r["event_id"], r["tag_i"]) for r in got.collect()
    )
    assert pairs == [
        (1, "A"),
        (2, "A"),
        (2, "B"),
        (3, "B"),
        (5, "C"),
    ]
    plan = got._jdf.queryExecution().executedPlan().toString()
    for bad in ("CartesianProduct", "BroadcastNestedLoop"):
        assert bad not in plan

    # pathological interval fan-out fails loudly, not silently
    wide = spark.createDataFrame(
        [("u1", 0.0, 1e9, "W")],
        "user_id string, start double, end double, tag string",
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        interval_join(
            points,
            wide,
            on="user_id",
            bucket_width=1.0,
            max_buckets_per_interval=1000,
        ).collect()
    assert "interval_join" in str(ei.value)


def test_time_rollup_hierarchy(spark):
    ev = spark.createDataFrame(
        [
            # two hours of one day (a Wednesday), one event next Monday
            (_ts("2024-01-03 10:15:00"), "click", 2.0),
            (_ts("2024-01-03 10:45:00"), "click", 4.0),
            (_ts("2024-01-03 11:05:00"), "click", 6.0),
            (_ts("2024-01-08 00:00:01"), "click", 8.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    out = time_rollup(
        ev, keys=["event_type"], grains=("hour", "day", "week")
    ).collect()
    rows = {
        (r["grain"], str(r["bucket_ts"])): r for r in out
    }
    h10 = rows[("hour", "2024-01-03 10:00:00")]
    assert (h10["n_events"], h10["sum_value"]) == (2, 6.0)
    assert (h10["min_value"], h10["max_value"]) == (2.0, 4.0)
    d3 = rows[("day", "2024-01-03 00:00:00")]
    assert (d3["n_events"], d3["sum_value"], d3["avg_value"]) == (3, 12.0, 4.0)
    # ISO weeks start Monday: Jan 3 rolls to Jan 1, Jan 8 starts its own
    w1 = rows[("week", "2024-01-01 00:00:00")]
    assert (w1["n_events"], w1["sum_value"]) == (3, 12.0)
    w2 = rows[("week", "2024-01-08 00:00:00")]
    assert (w2["n_events"], w2["sum_value"]) == (1, 8.0)
    # 3 grains but only the finest touches the raw table: the executed
    # plan re-aggregates partials instead of rescanning
    plan = time_rollup(
        ev, keys=["event_type"], grains=("hour", "day", "week")
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1 or plan.count("Relation") <= 1


def test_asof_join_composite_keys(spark):
    """Multi-column key: matches require BOTH key columns equal."""
    left = spark.createDataFrame(
        [(1, "u1", "a", 100.0), (2, "u1", "b", 100.0)],
        "event_id long, user_id string, region string, ts double",
    )
    right = spark.createDataFrame(
        [("u1", "a", 50.0, 1.0), ("u1", "b", 60.0, 2.0)],
        "user_id string, region string, ts double, price double",
    )
    got = {
        r["event_id"]: r["price_right"]
        for r in asof_join(
            left, right, on=["user_id", "region"]
        ).collect()
    }
    assert got == {1: 1.0, 2: 2.0}


def test_asof_join_right_side_with_no_value_columns(spark):
    """right_cols=[] defaults the tiebreak to the timestamp column —
    which must survive TIMESTAMP_NTZ (no direct double cast)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01 09:00:00"))],
        "user_id string, ts timestamp",
    )
    got = asof_join(left, right, on="user_id").collect()[0]
    assert got["ts_right"] == _ts("2024-01-01 09:00:00")


def test_interval_join_timestamp_columns(spark):
    """Timestamp-typed point/start/end columns route through the
    NTZ-safe epoch helper; bucket_width is in seconds."""
    points = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01 10:05:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 10:00:00"),
             _ts("2024-01-01 10:30:00"), "in"),
            ("u1", _ts("2024-01-01 11:00:00"),
             _ts("2024-01-01 11:30:00"), "out"),
        ],
        "user_id string, start timestamp, end timestamp, tag string",
    )
    got = interval_join(
        points, intervals, on="user_id", bucket_width=600.0
    ).collect()
    assert [(r["event_id"], r["tag_i"]) for r in got] == [(1, "in")]


def test_interval_join_left_keeps_unmatched_points(spark):
    points = spark.createDataFrame(
        [(1, "u1", 100.0), (2, "u1", 900.0), (3, "u2", 100.0)],
        "event_id long, user_id string, ts double",
    )
    intervals = spark.createDataFrame(
        [("u1", 50.0, 200.0, "A")],
        "user_id string, start double, end double, tag string",
    )
    got = {
        r["event_id"]: r["tag_i"]
        for r in interval_join(
            points, intervals, on="user_id", bucket_width=128.0,
            how="left",
        ).collect()
    }
    assert got == {1: "A", 2: None, 3: None}
    with pytest.raises(ValueError):
        interval_join(points, intervals, on="user_id", how="outer")


def test_interval_join_fuzz_vs_bruteforce(spark):
    """Randomised layouts vs a brute-force pandas containment filter:
    the bucketing must never add or lose a pair, whatever the
    bucket_width."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(data=st.data())
    def run(data):
        keys = st.integers(0, 1)
        pts = data.draw(
            st.lists(
                st.tuples(keys, st.integers(0, 200)),
                min_size=1, max_size=12,
            )
        )
        ivs = data.draw(
            st.lists(
                st.tuples(
                    keys, st.integers(0, 200), st.integers(0, 220)
                ),
                min_size=1, max_size=8,
            )
        )
        width = float(data.draw(st.sampled_from([1, 7, 64, 300])))
        pdf = spark.createDataFrame(
            [(i, k, float(t)) for i, (k, t) in enumerate(pts)],
            "event_id long, user_id long, ts double",
        )
        idf = spark.createDataFrame(
            [
                (j, k, float(s), float(e))
                for j, (k, s, e) in enumerate(ivs)
            ],
            "iv_id long, user_id long, start double, end double",
        )
        got = sorted(
            (r["event_id"], r["iv_id_i"])
            for r in interval_join(
                pdf,
                idf,
                on="user_id",
                interval_cols=["iv_id"],
                bucket_width=width,
            ).collect()
        )
        expect = sorted(
            (i, j)
            for i, (pk, pt) in enumerate(pts)
            for j, (ik, s, e) in enumerate(ivs)
            if pk == ik and s <= pt < e
        )
        assert got == expect

    run()


def test_time_rollup_no_keys(spark):
    """keys=[] rolls the whole table into one bucket series."""
    ev = spark.createDataFrame(
        [
            (_ts("2024-01-03 10:15:00"), 2.0),
            (_ts("2024-01-03 11:15:00"), 4.0),
        ],
        "ts timestamp, value double",
    )
    out = time_rollup(ev, keys=[], grains=("hour", "day")).collect()
    by = {(r["grain"], str(r["bucket_ts"])): r for r in out}
    assert by[("day", "2024-01-03 00:00:00")]["n_events"] == 2
    assert by[("day", "2024-01-03 00:00:00")]["sum_value"] == 6.0
    assert len([r for r in out if r["grain"] == "hour"]) == 2


def test_sessionize_gap_islands(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00")),
            (2, 7, _ts("2024-01-01 10:20:00")),  # 1200s -> same session
            (3, 7, _ts("2024-01-01 11:00:00")),  # 2400s -> new session
            (4, 8, _ts("2024-01-01 10:00:00")),  # other user independent
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = sessionize(ev, gap_seconds=1800.0, order_tiebreak="event_id")
    rows = {r["event_id"]: r for r in out.collect()}
    assert rows[1]["session_seq"] == 0 and rows[2]["session_seq"] == 0
    assert rows[3]["session_seq"] == 1
    assert rows[4]["session_seq"] == 0
    assert rows[3]["session_id"] == "7#1"
    # exactly-at-gap boundary stays in the SAME session (strict >)
    ev2 = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 10:00:00")),
            (2, 7, _ts("2024-01-01 10:30:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    r2 = sessionize(ev2, gap_seconds=1800.0, order_tiebreak="event_id")
    assert {r["session_seq"] for r in r2.collect()} == {0}


def test_asof_join_string_tiebreak(spark):
    """A STRING tiebreak must stay in its native orderable type: the
    old double-cast nulled it out and the duplicate-(key, ts) winner
    became partition-dependent (ADVICE r3)."""
    dup = spark.createDataFrame(
        [
            ("u9", _ts("2024-01-01 08:00:00"), "alpha"),
            ("u9", _ts("2024-01-01 08:00:00"), "zeta"),
            ("u9", _ts("2024-01-01 08:00:00"), "mid"),
        ],
        "user_id string, ts timestamp, label string",
    )
    l9 = spark.createDataFrame(
        [(1, "u9", _ts("2024-01-01 09:00:00"))],
        "event_id long, user_id string, ts timestamp",
    )
    r = asof_join(l9, dup, on="user_id", tiebreak="label").collect()[0]
    assert r["label_right"] == "zeta"  # largest string wins, always
    # default tiebreak = last projected right col (a string here) too
    r2 = asof_join(l9, dup, on="user_id").collect()[0]
    assert r2["label_right"] == "zeta"


def test_asof_join_non_orderable_tiebreak_raises(spark):
    right = spark.createDataFrame(
        [("u1", 1.0, {"k": 1})],
        "user_id string, ts double, meta map<string, int>",
    )
    left = spark.createDataFrame(
        [(1, "u1", 2.0)], "event_id long, user_id string, ts double"
    )
    with pytest.raises(ValueError, match="non-orderable"):
        asof_join(left, right, on="user_id", tiebreak="meta")


def test_time_rollup_week_never_feeds_calendar_grains(spark):
    """Weeks do not nest in months (ADVICE r3, high): an event in a
    month-straddling week must land in ITS month, and the week bucket
    must still aggregate across the boundary."""
    ev = spark.createDataFrame(
        [
            # ISO week starting Mon 2024-01-29 straddles Jan/Feb
            (_ts("2024-01-29 10:00:00"), "click", 1.0),
            (_ts("2024-02-01 10:00:00"), "click", 2.0),
        ],
        "ts timestamp, event_type string, value double",
    )
    out = time_rollup(
        ev, keys=["event_type"], grains=("day", "week", "month")
    ).collect()
    by = {(r["grain"], str(r["bucket_ts"])): r for r in out}
    # the straddling week aggregates BOTH events
    w = by[("week", "2024-01-29 00:00:00")]
    assert (w["n_events"], w["sum_value"]) == (2, 3.0)
    # months split correctly: Feb 1 must NOT leak into January
    jan = by[("month", "2024-01-01 00:00:00")]
    feb = by[("month", "2024-02-01 00:00:00")]
    assert (jan["n_events"], jan["sum_value"]) == (1, 1.0)
    assert (feb["n_events"], feb["sum_value"]) == (1, 2.0)


def test_time_rollup_week_plus_coarse_only(spark):
    """week + month with no sub-week grain: an internal day base keeps
    both correct without emitting day rows."""
    ev = spark.createDataFrame(
        [
            (_ts("2024-01-29 10:00:00"), 1.0),
            (_ts("2024-02-01 10:00:00"), 2.0),
        ],
        "ts timestamp, value double",
    )
    out = time_rollup(ev, keys=[], grains=("week", "month")).collect()
    grains = {r["grain"] for r in out}
    assert grains == {"week", "month"}  # day base is internal only
    by = {(r["grain"], str(r["bucket_ts"])): r for r in out}
    assert by[("week", "2024-01-29 00:00:00")]["n_events"] == 2
    assert by[("month", "2024-02-01 00:00:00")]["sum_value"] == 2.0

    # week alone aggregates the raw table directly
    wk = time_rollup(ev, keys=[], grains=("week",)).collect()
    assert {r["grain"] for r in wk} == {"week"}
    assert wk[0]["n_events"] == 2

    with pytest.raises(ValueError, match="unknown grain"):
        time_rollup(ev, keys=[], grains=("fortnight",))


def test_sessionize_entity_ts_only_frame(spark):
    """No third column: ordering falls back to ts alone instead of
    raising StopIteration (ADVICE r3)."""
    ev = spark.createDataFrame(
        [
            (7, _ts("2024-01-01 10:00:00")),
            (7, _ts("2024-01-01 11:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    out = sessionize(ev, gap_seconds=1800.0).collect()
    assert sorted(r["session_seq"] for r in out) == [0, 1]


def test_interval_join_auto_bucket_width(spark):
    """bucket_width='auto' (the default) derives a width from the
    interval-length p90/max so mixed-width intervals neither flood nor
    trip the fan-out guard, and the result matches an explicit width."""
    points = spark.createDataFrame(
        [(i, "u1", float(t)) for i, t in enumerate([5, 55, 500, 5000])],
        "event_id long, user_id string, ts double",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 0.0, 10.0, "tiny"),
            ("u1", 50.0, 60.0, "tiny2"),
            ("u1", 0.0, 6000.0, "huge"),  # 600x wider than the tiny ones
        ],
        "user_id string, start double, end double, tag string",
    )
    auto = sorted(
        (r["event_id"], r["tag_i"])
        for r in interval_join(
            points, intervals, on="user_id",
            max_buckets_per_interval=8,  # tight guard: auto must clear it
        ).collect()
    )
    explicit = sorted(
        (r["event_id"], r["tag_i"])
        for r in interval_join(
            points, intervals, on="user_id", bucket_width=750.0
        ).collect()
    )
    assert auto == explicit
    assert ("tiny", ) not in auto  # sanity: tags come paired

    with pytest.raises(ValueError, match="positive"):
        interval_join(points, intervals, on="user_id", bucket_width=0.0)


def test_interval_join_point_id_fast_path(spark):
    """how='left' with point_id= anti-joins on the id alone and must
    produce the same rows as the full-row null-safe recovery."""
    points = spark.createDataFrame(
        [(1, "u1", 100.0), (2, "u1", 900.0), (3, "u2", None)],
        "event_id long, user_id string, ts double",
    )
    intervals = spark.createDataFrame(
        [("u1", 50.0, 200.0, "A")],
        "user_id string, start double, end double, tag string",
    )
    kw = dict(on="user_id", bucket_width=128.0, how="left")
    slow = {
        r["event_id"]: r["tag_i"]
        for r in interval_join(points, intervals, **kw).collect()
    }
    fast = {
        r["event_id"]: r["tag_i"]
        for r in interval_join(
            points, intervals, point_id="event_id", **kw
        ).collect()
    }
    assert slow == fast == {1: "A", 2: None, 3: None}
    with pytest.raises(ValueError, match="point_id"):
        interval_join(
            points, intervals, point_id="nope", **kw
        )
