"""Referential-integrity checks (BASELINE.json north_star: "every turn's
conv_id resolves, turn_idx gapless per conversation via window lag").

Two gaplessness strategies:

- :func:`gapless_by_agg` — the SCALE path.  ``0..n-1`` gapless ≡
  ``min(idx)=0 ∧ max(idx)=count-1 ∧ count_distinct(idx)=count``, which is
  a pure hash aggregation: no sort, no window state, partial-aggregates
  map-side, and composes with :func:`salted_agg` for hot conversations.
- :func:`gaps_by_window` — the REPORTING path: ``lag`` over
  ``Window.partitionBy(conv).orderBy(idx)`` pinpoints each gap position.
  A window sort over a 10^8-turn conversation is exactly the skew trap
  the agg path avoids, so this is for violation drill-down, not the
  per-partition verdict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def orphans(
    child: DataFrame,
    parent: DataFrame,
    on: str | list[str],
    broadcast_parent: bool | None = None,
) -> DataFrame:
    """Child rows whose FK has no match in ``parent`` (anti join).

    ``broadcast_parent=True`` forces a broadcast hash anti-join (right
    side is a dimension table); default leaves the choice to AQE, which
    also splits skewed shuffle partitions for hot FK values.
    """
    keys = [on] if isinstance(on, str) else list(on)
    p = parent.select(*keys).dropDuplicates(keys)
    if broadcast_parent:
        p = F.broadcast(p)
    return child.join(p, on=keys, how="left_anti")


def gapless_by_agg(
    df: DataFrame, conv: str = "conv_id", idx: str = "turn_idx"
) -> DataFrame:
    """Per-conversation gaplessness verdict via hash aggregation only.

    Returns ``(conv, n_turns, distinct_turns, min_idx, max_idx,
    is_gapless)``.  Duplicates are tolerated here (count_distinct);
    uniqueness is a separate check.
    """
    return df.groupBy(conv).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_distinct(F.col(idx)).alias("distinct_turns"),
        F.min(idx).alias("min_idx"),
        F.max(idx).alias("max_idx"),
    ).select(
        F.col(conv),
        "n_turns",
        "distinct_turns",
        "min_idx",
        "max_idx",
        (
            (F.col("min_idx") == 0)
            & (F.col("max_idx") == F.col("distinct_turns") - 1)
        ).alias("is_gapless"),
    )


def gaps_by_window(
    df: DataFrame, conv: str = "conv_id", idx: str = "turn_idx"
) -> DataFrame:
    """Exact gap locations: rows where ``idx - lag(idx) > 1`` (or the
    first idx ≠ 0).  Returns ``(conv, prev_idx, idx)`` per gap."""
    w = Window.partitionBy(conv).orderBy(idx)
    lagged = df.select(conv, idx).withColumn("prev_idx", F.lag(idx).over(w))
    return lagged.where(
        (F.col("prev_idx").isNull() & (F.col(idx) != 0))
        | (F.col(idx) - F.col("prev_idx") > 1)
    ).select(conv, "prev_idx", F.col(idx).alias("gap_at"))


def monotone_ts_violations(
    df: DataFrame,
    conv: str = "conv_id",
    idx: str = "turn_idx",
    ts: str = "ts",
) -> DataFrame:
    """Rows whose timestamp decreases within a conversation (window path,
    reporting granularity)."""
    w = Window.partitionBy(conv).orderBy(idx)
    lagged = df.select(conv, idx, ts).withColumn("prev_ts", F.lag(ts).over(w))
    return lagged.where(F.col(ts) < F.col("prev_ts"))
