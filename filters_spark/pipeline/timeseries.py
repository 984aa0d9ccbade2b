"""Time-series operators over event streams: as-of join, hierarchical
time-bucket rollup, sessionization.

These are the "operators Spark lacks" tier (as-of/range joins, hyper-
table-style continuous aggregates) re-expressed as compositions of
built-in DataFrame ops — no Python in any path, so every plan stays
inside whole-stage codegen.

Scale designs (the part that must survive 100 TB):

- :func:`asof_join` — the naive formulation is a range join (per left
  row, max right ts <= left ts), which Catalyst executes as a
  broadcast-nested-loop or a sort-merge with an inequality post-filter:
  O(|L|·|R|) per key on hot keys.  Instead both sides are UNIONED with
  a side tag and shuffled ONCE on the join key; a single running
  ``last(right_payload, ignorenulls=True)`` window ordered by
  ``(ts, side)`` carries the latest right row forward onto each left
  row.  Cost: one hash shuffle of L+R + one per-key sort — the same
  shape Pandas' ``merge_asof`` and kdb's ``aj`` use, and it stays
  skew-safe under AQE because a hot key is still a single sorted run.
- :func:`time_rollup` — hypertable-style multi-granularity rollup.
  Only the FINEST grain aggregates the raw table; every coarser grain
  re-aggregates the previous grain's (already tiny) partials, so the
  raw-data shuffle happens exactly once no matter how many grains are
  requested.  Requires re-aggregable stats (count/sum/min/max; mean is
  derived at the end) — the same restriction continuous aggregates
  have.
- :func:`sessionize` — gaps-and-islands: one shuffle on the entity
  key, ``lag`` + running sum inside the window, no self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "interval_join", "time_rollup", "sessionize"]


def _epoch_seconds(df: DataFrame, col_name: str) -> Column:
    """Fractional epoch seconds for gap/tolerance arithmetic.
    TIMESTAMP_NTZ (the parquet default under a UTC session) does not
    cast to double directly — route it through TIMESTAMP first; numeric
    time columns pass through."""
    dt = df.schema[col_name].dataType
    c = F.col(col_name)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return c.cast("timestamp").cast("double")
    return c.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_seconds: float | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with ``pandas.merge_asof`` direction semantics: every
    ``left`` row gains the matching ``right`` row with the same key(s),
    as nullable ``<col><suffix>`` columns.

    - ``backward`` (default): most recent right row with
      ``right_ts <= left_ts`` (inclusive).
    - ``forward``: earliest right row with ``right_ts >= left_ts``
      (inclusive; same algorithm on the reversed time order).
    - ``nearest``: whichever of the two is closer in time; the backward
      candidate wins exact-distance ties.  Still ONE shuffle and ONE
      sort — backward comes from a running ``last`` over the preceding
      frame, forward from a ``first`` over the following frame of the
      same sorted run (an equal-ts right row sorts before the left row,
      so the forward frame misses it — harmless, since backward matches
      it at distance zero and wins the tie).

    ``tolerance_seconds`` drops matches farther than the window (like
    ``pandas.merge_asof(tolerance=...)``).  When two right rows share
    ``(key, right_ts)``, ``tiebreak`` names a column whose LARGEST
    value wins deterministically (default: last projected right col).

    Plan shape: union with a side tag → one shuffle on ``on`` → one
    window sort ``(ts, side, tiebreak)`` → filter back to left rows.
    No range join, no per-key explosion; hot keys are one sorted run.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', got "
            f"{direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    if tiebreak is None:
        tiebreak = right_cols[-1] if right_cols else right_ts
    # the tiebreak stays in its NATIVE orderable type: casting to double
    # (the old behaviour) turned every string tiebreak into NULL, so the
    # documented "largest tiebreak wins" silently degraded to an
    # arbitrary partition-dependent pick among duplicate (key, ts) rows
    tie_type = right.schema[tiebreak].dataType
    if isinstance(tie_type, T.MapType):
        raise ValueError(
            f"asof_join: tiebreak column {tiebreak!r} has non-orderable "
            f"type {tie_type.simpleString()}; pass tiebreak= explicitly"
        )

    payload = F.struct(
        F.col(right_ts).alias("__asof_ts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        F.col(tiebreak).alias("__tie"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(None).cast(tie_type).alias("__tie"),
    )
    # right rows order before left rows at equal ts (inclusive match);
    # among equal-ts right rows the largest tiebreak lands last, so the
    # running last() picks it deterministically.  forward = the same
    # algorithm on reversed time order.
    ts_dir = (
        F.col("__ts").desc() if direction == "forward"
        else F.col("__ts").asc()
    )
    base = Window.partitionBy(*keys).orderBy(
        ts_dir, F.col("__side").asc(), F.col("__tie").asc_nulls_last()
    )
    w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = F.last(F.col("__payload"), ignorenulls=True).over(w)
    unioned = l.select(
        *left.columns, "__ts", "__side", "__payload", "__tie"
    ).unionByName(
        r.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c not in keys
                else F.col(c)
                for c in left.columns
            ],
            "__ts",
            "__side",
            "__payload",
            "__tie",
        )
    )
    ts_type = unioned.schema["__ts"].dataType
    as_s = (
        (lambda c: c.cast("timestamp").cast("double"))
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType))
        else (lambda c: c.cast("double"))
    )
    if direction == "nearest":
        # same sorted run, second frame: earliest right row after the
        # current left row (equal-ts rights sort earlier and are
        # covered by the backward frame at distance zero)
        wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fwd = F.first(F.col("__payload"), ignorenulls=True).over(wf)
        gap_b = F.abs(
            as_s(F.col("__back.__asof_ts")) - as_s(F.col("__ts"))
        )
        gap_f = F.abs(
            as_s(F.col("__fwd.__asof_ts")) - as_s(F.col("__ts"))
        )
        out = (
            unioned.withColumn("__back", carried)
            .withColumn("__fwd", fwd)
            .filter(F.col("__side") == 1)
            .withColumn(
                "__match",
                F.when(F.col("__fwd").isNull(), F.col("__back")).when(
                    F.col("__back").isNull(), F.col("__fwd")
                ).when(gap_b <= gap_f, F.col("__back"))
                .otherwise(F.col("__fwd")),
            )
        )
    else:
        out = unioned.withColumn("__match", carried).filter(
            F.col("__side") == 1
        )
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                F.abs(
                    as_s(F.col("__match.__asof_ts")) - as_s(F.col("__ts"))
                )
                <= F.lit(tolerance_seconds),
                F.col("__match"),
            ),
        )
    proj = [F.col(c) for c in left.columns]
    proj.append(F.col("__match.__asof_ts").alias(right_ts + suffix))
    proj += [F.col(f"__match.{c}").alias(c + suffix) for c in right_cols]
    return out.select(*proj)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    interval_cols: list[str] | None = None,
    suffix: str = "_i",
    bucket_width: float | str = "auto",
    max_buckets_per_interval: int = 4096,
    how: str = "inner",
    point_id: str | None = None,
) -> DataFrame:
    """Range join without the range-join plan: every ``points`` row is
    paired with every ``intervals`` row of the same key(s) whose
    half-open window ``[start, end)`` contains ``point_ts``.
    ``how="left"`` keeps non-matching points once with null interval
    columns (an extra anti-join branch over the matched point ids).

    Catalyst executes a raw inequality join as a broadcast-nested-loop
    (O(|P|·|I|) per key) — the classic 100 TB killer.  Instead both
    sides are BUCKETED on time: each interval explodes to the fixed-
    width buckets it covers (``sequence`` — ~length/width rows), each
    point maps to exactly ONE bucket, and the pairing becomes a hash
    equi-join on ``(keys..., bucket)`` plus a cheap containment
    post-filter.  A (point, interval) pair can only meet in the point's
    single bucket, so no dedup pass is needed.  ``bucket_width`` (in
    the time unit: seconds for timestamps, column units for numerics)
    trades interval fan-out against bucket population;
    ``max_buckets_per_interval`` fails LOUDLY (``assert_true``) on an
    interval that would fan out pathologically instead of silently
    materialising it.

    ``bucket_width="auto"`` (default) derives the width from the
    interval frame itself — one tiny aggregate computing the p90
    interval length and the max length; the width is
    ``max(p90_len, max_len / (0.9 * max_buckets_per_interval))`` so a
    typical interval covers ~1-2 buckets and the fan-out guard can
    never trip.  The join RESULT is width-independent, so the
    approximate percentile costs nothing in determinism.  NOTE:
    ``"auto"`` makes this call EAGER — the width aggregate is a Spark
    action executed at plan-build time, scanning the interval frame
    once more (projected to two columns, so pruned at the source).  If
    ``intervals`` is an expensive derived frame, either ``.persist()``
    it before calling or pass a numeric width (e.g. a known domain
    bucket size) to keep the builder fully lazy.

    ``how="left"`` keeps unmatched points with null interval columns.
    When the point frame has a unique id column, pass ``point_id=`` —
    the unmatched recovery then anti-joins on that single narrow key
    instead of the full (null-safe) point row, a much cheaper shuffle
    at scale.

    Output: all ``points`` columns + ``interval_cols`` (default: the
    interval frame's non-key extra columns) suffixed with ``suffix``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if interval_cols is None:
        interval_cols = [
            c
            for c in intervals.columns
            if c not in keys and c not in (start_col, end_col)
        ]
    if bucket_width == "auto":
        stats = (
            intervals.select(
                (
                    _epoch_seconds(intervals, end_col)
                    - _epoch_seconds(intervals, start_col)
                ).alias("__len")
            )
            .filter(F.col("__len") > 0)
            .agg(
                F.expr("approx_percentile(__len, 0.9)").alias("p90"),
                F.max("__len").alias("mx"),
            )
            .first()
        )
        if stats is None or stats["mx"] is None:
            w = 3600.0  # empty interval frame: any width works
        else:
            w = max(
                float(stats["p90"]),
                float(stats["mx"]) / (0.9 * max_buckets_per_interval),
            )
    else:
        w = float(bucket_width)
    if not w > 0:
        raise ValueError(f"bucket_width must be positive, got {w!r}")
    p_s = _epoch_seconds(points, point_ts)
    i_start = _epoch_seconds(intervals, start_col)
    i_end = _epoch_seconds(intervals, end_col)

    span_buckets = (
        F.floor(i_end / F.lit(w)) - F.floor(i_start / F.lit(w)) + 1
    )
    # the guard lives INSIDE the bucket expression so column pruning
    # can never drop it: a pathological interval fails the job loudly
    # instead of silently materialising millions of bucket rows
    guarded_seq = F.when(
        span_buckets <= F.lit(max_buckets_per_interval),
        F.sequence(
            F.floor(i_start / F.lit(w)).cast("long"),
            F.floor(i_end / F.lit(w)).cast("long"),
        ),
    ).otherwise(
        F.raise_error(
            F.lit(
                "interval_join: an interval spans more than "
                f"{max_buckets_per_interval} buckets; raise "
                "bucket_width or max_buckets_per_interval"
            )
        )
    )
    iv = (
        intervals.filter(i_end > i_start)
        .withColumn("__bucket", F.explode(guarded_seq))
        .select(
            *[F.col(k).alias(f"__k_{k}") for k in keys],
            "__bucket",
            i_start.alias("__start_s"),
            i_end.alias("__end_s"),
            *[F.col(c).alias(c + suffix) for c in interval_cols],
        )
    )
    pt = points.withColumn(
        "__bucket", F.floor(p_s / F.lit(w)).cast("long")
    ).withColumn("__p_s", p_s)
    cond = [pt["__bucket"] == iv["__bucket"]] + [
        pt[k] == iv[f"__k_{k}"] for k in keys
    ]
    joined = pt.join(iv, cond, "inner").filter(
        (F.col("__p_s") >= F.col("__start_s"))
        & (F.col("__p_s") < F.col("__end_s"))
    )
    matched = joined.select(
        *[pt[c] for c in points.columns],
        *[F.col(c + suffix) for c in interval_cols],
    )
    if how == "inner":
        return matched
    if point_id is not None:
        # unique-id fast path: the anti-join shuffles only the id
        # column instead of the full (null-safe) point row
        if point_id not in points.columns:
            raise ValueError(
                f"point_id column {point_id!r} not in points frame"
            )
        anti_key = [point_id]
        mpts = matched.select(*anti_key).alias("__m")
    else:
        anti_key = list(points.columns)
        mpts = matched.select(*anti_key).alias("__m")
    lp = points.alias("__p")
    anti_cond = [
        F.col(f"__p.{c}").eqNullSafe(F.col(f"__m.{c}"))
        for c in anti_key
    ]  # null-safe: a NULL-bearing matched point must not reappear
    unmatched = lp.join(mpts, anti_cond, "left_anti").select(
        "*",
        *[
            F.lit(None)
            .cast(intervals.schema[c].dataType)
            .alias(c + suffix)
            for c in interval_cols
        ],
    )
    return matched.unionByName(unmatched)


_GRAIN_ORDER = ("minute", "hour", "day", "week", "month", "quarter", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
    grains: tuple = ("hour", "day", "week"),
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: for each grain in
    ``grains``, per-``keys`` buckets of ``count / sum / min / max /
    mean`` over ``value_col``.

    Output: ``grain, bucket_ts, *keys, n_events, sum_value, min_value,
    max_value, avg_value``.  Only the finest grain touches the raw
    table; each coarser grain re-aggregates the previous grain's
    partials (sum-of-sums, min-of-mins...), so the raw shuffle happens
    once and the coarse aggregations are near-free — the continuous-
    aggregate design, not one full groupBy per grain.

    ``week`` does NOT nest in month/quarter/year (a week can straddle a
    month boundary), so it is always a LEAF: re-aggregated from the
    finest sub-week level (minute/hour/day — days DO nest in weeks) and
    never used as the source for a coarser calendar grain.  When
    ``week`` is requested together with a coarser grain and no sub-week
    grain, an internal day-level partial (not emitted) serves as the
    shared base, keeping the raw shuffle single.
    """
    keys = list(keys or [])
    for g in grains:
        if g not in _GRAIN_ORDER:
            raise ValueError(
                f"unknown grain {g!r}; expected one of {_GRAIN_ORDER}"
            )
    ordered = sorted(set(grains), key=_GRAIN_ORDER.index)
    want_week = "week" in ordered
    # calendar chain: every member nests in the next (min⊂hour⊂day⊂
    # month⊂quarter⊂year) so partial re-aggregation is exact
    cal = [g for g in ordered if g != "week"]
    emit_cal = set(cal)
    if want_week and cal and _GRAIN_ORDER.index(cal[0]) > _GRAIN_ORDER.index(
        "day"
    ):
        # week + coarser-only: insert an internal (unemitted) day base
        # so week re-aggregates from something that nests in it
        cal = ["day"] + cal

    def _agg_raw(grain: str) -> DataFrame:
        return df.groupBy(
            F.date_trunc(grain, F.col(ts_col)).alias("bucket_ts"),
            *[F.col(k) for k in keys],
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("sum_value"),
            F.min(F.col(value_col)).alias("min_value"),
            F.max(F.col(value_col)).alias("max_value"),
        )

    def _reagg(src: DataFrame, grain: str) -> DataFrame:
        return src.groupBy(
            F.date_trunc(grain, F.col("bucket_ts")).alias("bucket_ts"),
            *[F.col(k) for k in keys],
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )

    levels: list[DataFrame] = []
    if not cal:
        # week is the only grain: aggregate the raw table by week
        levels.append(_agg_raw("week").withColumn("grain", F.lit("week")))
    else:
        cur = _agg_raw(cal[0])
        week_base = cur if _GRAIN_ORDER.index(cal[0]) <= _GRAIN_ORDER.index(
            "day"
        ) else None
        if cal[0] in emit_cal:
            levels.append(cur.withColumn("grain", F.lit(cal[0])))
        for grain in cal[1:]:
            cur = _reagg(cur, grain)
            if _GRAIN_ORDER.index(grain) <= _GRAIN_ORDER.index("day"):
                week_base = cur
            if grain in emit_cal:
                levels.append(cur.withColumn("grain", F.lit(grain)))
        if want_week:
            levels.append(
                _reagg(week_base, "week").withColumn("grain", F.lit("week"))
            )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "grain",
        "bucket_ts",
        *keys,
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
        (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
    )


def sessionize(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts whenever the
    entity's inter-event gap exceeds ``gap_seconds`` (gaps-and-islands
    — ``lag`` marks session starts, a running sum numbers them).

    Adds ``session_seq`` (0-based per entity) and ``session_id``
    (``entity || '#' || seq``).  One shuffle on the entity key; ties on
    ``ts_col`` break by ``order_tiebreak`` (default: the first other
    column; on a frame with ONLY the entity and timestamp columns the
    ordering falls back to ``ts_col`` alone) so numbering is
    deterministic up to exact-duplicate rows.
    """
    tiebreak = order_tiebreak or next(
        (c for c in df.columns if c not in (entity_col, ts_col)), None
    )
    order_cols = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order_cols.append(F.col(tiebreak).asc())
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    cur_s = _epoch_seconds(df, ts_col)
    prev_s = F.lag(cur_s).over(w)
    is_start = (
        prev_s.isNull() | (cur_s - prev_s > F.lit(gap_seconds))
    ).cast("long")
    seq = (
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1
    )
    return df.withColumn("session_seq", seq).withColumn(
        "session_id",
        F.concat_ws("#", F.col(entity_col).cast("string"),
                    F.col("session_seq").cast("string")),
    )
