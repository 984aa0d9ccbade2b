"""Fuzzed parity for the time-series operators.

``pandas.merge_asof`` is an independent, battle-tested as-of join —
hypothesis generates adversarial key/timestamp layouts (duplicate left
timestamps, empty per-key right partitions, boundary gaps) and every
direction of ``asof_join`` must agree with it row by row.  ``sessionize``
is compared against a 10-line pure-Python gaps-and-islands reference.
Numeric time columns keep the arithmetic exact (no FP timestamps)."""

from __future__ import annotations

import pandas as pd
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from filters_spark.pipeline import asof_join, sessionize  # noqa: E402

_KEYS = st.integers(min_value=0, max_value=2)
_TS = st.integers(min_value=0, max_value=300)

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frames(spark, lt, rt):
    left_pd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lt)],
        columns=["event_id", "user_id", "ts"],
    )
    right_pd = pd.DataFrame(
        [(k, t, float(k * 1000 + t), t) for k, t in rt],
        columns=["user_id", "ts", "price", "rts"],
    )
    sl = spark.createDataFrame(
        left_pd, "event_id long, user_id long, ts long"
    )
    sr = spark.createDataFrame(
        right_pd, "user_id long, ts long, price double, rts long"
    )
    return left_pd, right_pd, sl, sr


def _expected(left_pd, right_pd, direction, tolerance=None):
    return (
        pd.merge_asof(
            left_pd.sort_values(["ts", "event_id"]),
            right_pd.sort_values("ts"),
            on="ts",
            by="user_id",
            direction=direction,
            tolerance=tolerance,
        )
        .set_index("event_id")
        .sort_index()
    )


def _same(a, b):
    return (pd.isna(a) and pd.isna(b)) or a == b


@_SLOW
@given(data=st.data())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    rt = data.draw(
        st.lists(st.tuples(_KEYS, _TS), unique=True, min_size=1, max_size=15)
    )
    lt = data.draw(
        st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=15)
    )
    left_pd, right_pd, sl, sr = _frames(spark, lt, rt)

    results = {}
    for d in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                sl,
                sr,
                on="user_id",
                right_cols=["price", "rts"],
                tiebreak="price",
                direction=d,
            )
            .toPandas()
            .set_index("event_id")
            .sort_index()
        )
        results[d] = got

    exp_b = _expected(left_pd, right_pd, "backward")
    exp_f = _expected(left_pd, right_pd, "forward")
    for d in ("backward", "forward"):
        exp = exp_b if d == "backward" else exp_f
        for eid in exp.index:
            assert _same(
                results[d].loc[eid, "price_right"], exp.loc[eid, "price"]
            ), (d, eid)
            assert _same(
                results[d].loc[eid, "rts_right"], exp.loc[eid, "rts"]
            ), (d, eid)

    exp_n = _expected(left_pd, right_pd, "nearest")
    got_n = results["nearest"]
    for eid in exp_n.index:
        ts = exp_n.loc[eid, "ts"]
        db = (
            abs(ts - exp_b.loc[eid, "rts"])
            if not pd.isna(exp_b.loc[eid, "rts"])
            else None
        )
        df_ = (
            abs(ts - exp_f.loc[eid, "rts"])
            if not pd.isna(exp_f.loc[eid, "rts"])
            else None
        )
        if db is not None and df_ is not None and db == df_:
            # exact-distance tie: our contract picks the backward
            # candidate (pandas' tie choice is unspecified)
            assert _same(
                got_n.loc[eid, "price_right"], exp_b.loc[eid, "price"]
            ), eid
        else:
            assert _same(
                got_n.loc[eid, "price_right"], exp_n.loc[eid, "price"]
            ), eid


@_SLOW
@given(data=st.data())
def test_asof_join_tolerance_matches_pandas(spark, data):
    rt = data.draw(
        st.lists(st.tuples(_KEYS, _TS), unique=True, min_size=1, max_size=12)
    )
    lt = data.draw(st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=12))
    tol = data.draw(st.integers(min_value=0, max_value=60))
    left_pd, right_pd, sl, sr = _frames(spark, lt, rt)
    got = (
        asof_join(
            sl,
            sr,
            on="user_id",
            right_cols=["price", "rts"],
            tiebreak="price",
            tolerance_seconds=float(tol),
        )
        .toPandas()
        .set_index("event_id")
        .sort_index()
    )
    exp = _expected(left_pd, right_pd, "backward", tolerance=tol)
    for eid in exp.index:
        assert _same(got.loc[eid, "price_right"], exp.loc[eid, "price"]), eid


def _sessions_reference(left_pd, gap):
    out = {}
    for _, grp in left_pd.sort_values(["ts", "event_id"]).groupby("user_id"):
        seq, prev = -1, None
        for r in grp.itertuples():
            if prev is None or r.ts - prev > gap:
                seq += 1
            out[r.event_id] = seq
            prev = r.ts
    return out


@_SLOW
@given(data=st.data())
def test_sessionize_matches_reference(spark, data):
    lt = data.draw(st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=25))
    gap = data.draw(st.integers(min_value=1, max_value=100))
    left_pd = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lt)],
        columns=["event_id", "user_id", "ts"],
    )
    sl = spark.createDataFrame(left_pd, "event_id long, user_id long, ts long")
    got = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(
            sl, gap_seconds=float(gap), order_tiebreak="event_id"
        ).collect()
    }
    assert got == _sessions_reference(left_pd, gap)
