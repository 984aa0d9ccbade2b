"""Uniqueness / keyed-aggregation checks with explicit skew handling.

``duplicate_keys`` is a hash aggregation on the candidate key.  Spark's
partial (map-side) aggregation already collapses duplicates before the
shuffle, so for a *unique-ish* key the shuffle volume is ~#groups, not
#rows — that's the 10^12-row safe path.

``salted_agg`` is for the opposite regime: aggregating BY a skewed key
(e.g. per-``conv_id`` counts where one conversation has 10^8 turns).  AQE
splits skewed *join* partitions but not skewed hash aggregations
(SURVEY.md §4.3), so we do the classic two-level rewrite:
``groupBy(key, salt) → partial merge → groupBy(key)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def duplicate_keys(
    df: DataFrame, keys: list[str], sample_limit: int | None = None
) -> DataFrame:
    """Rows per key with count > 1.  Returns ``keys + [dup_count]``."""
    out = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )
    return out.limit(sample_limit) if sample_limit else out


SUPPORTED_MERGES = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    key: str | list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
    pin_input: bool = False,
) -> DataFrame:
    """Two-level salted aggregation for skewed grouping keys.

    ``aggs`` maps output column → ``(agg_name, input_col)`` with
    ``agg_name`` in ``count|sum|min|max`` (the decomposable aggregates;
    avg = sum/count on top).

    Phase 1 groups by ``(key, salt)`` where salt spreads one hot key over
    ``salt_buckets`` reducers; phase 2 merges the partials.  Both phases
    are standard hash aggregations — the point is that no single reducer
    ever sees more than ~1/salt_buckets of a hot key's rows.

    **Retry caveat (ADVICE r2):** the per-row salt is
    ``monotonically_increasing_id``, a nondeterministic expression.  The
    AGGREGATED results are salt-invariant (any salt assignment merges to
    the same totals), but if the input lineage is itself
    order-nondeterministic (e.g. reads an upstream shuffle) a
    shuffle-fetch-failure retry can recompute only some map tasks with
    different row orders, double-counting or dropping rows mid-flight.
    Use this on deterministic lineage (file scans, cached frames), or
    pass ``pin_input=True`` to persist the input first — the escape
    hatch that makes retries replay identical rows at the cost of a
    materialisation.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if pin_input:
        df = df.persist()
    # Per-ROW salt, not a hash of the row's values: a hot key flooded
    # with byte-identical duplicate rows would hash to ONE salt bucket
    # and land on a single reducer again (the exact case salting exists
    # for).  monotonically_increasing_id is a per-partition counter, so
    # consecutive duplicates round-robin across all salt_buckets.
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    phase1_aggs = []
    phase2_aggs = []
    for out_name, (agg_name, in_col) in aggs.items():
        try:
            partial_fn, merge_fn = SUPPORTED_MERGES[agg_name]
        except KeyError:
            raise ValueError(
                f"unsupported salted agg {agg_name!r}; use count|sum|min|max"
            ) from None
        partial_name = f"__p_{out_name}"
        partial_in = F.lit(1) if in_col in (None, "*") else F.col(in_col)
        phase1_aggs.append(partial_fn(partial_in).alias(partial_name))
        phase2_aggs.append(merge_fn(F.col(partial_name)).alias(out_name))
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *phase1_aggs
    )
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def uniqueness_report(
    df: DataFrame, keys: list[str]
) -> DataFrame:
    """One-row summary: total rows, distinct keys, duplicated keys,
    surplus rows.  Single aggregation over the duplicate_keys output."""
    dups = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    return dups.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("dup_keys"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt") - 1).otherwise(0)).alias(
            "surplus_rows"
        ),
    )
