"""Streaming validation operators.

Scale notes: :func:`validate_stream` is a stateless projection — it adds
zero state to the stream and keeps the micro-batch plan identical to the
batch plan (same whole-stage codegen + Arrow kernels).
:func:`windowed_violation_counts` is a standard watermarked streaming
aggregation (state = one row per (window, key, code)).
:func:`conversation_monitor` keeps ONE small state row per conversation
(last index, count, flags) with a processing-time timeout so idle
conversations are evicted — state size is O(active conversations), not
O(turns).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from filters_spark.core.compiler import validate


def validate_stream(
    stream_df: DataFrame,
    rules: dict,
    violations_col: str = "_violations",
    valid_col: str = "_is_valid",
) -> DataFrame:
    """Apply compiled validation chains to a streaming DataFrame.

    The compiler emits a pure projection (no shuffle, no state), so the
    same ``rules`` dict used in batch works unchanged on a stream —
    append-mode safe, watermark-agnostic.
    """
    return validate(
        stream_df,
        rules,
        violations_col=violations_col,
        valid_col=valid_col,
    )


def windowed_violation_counts(
    stream_df: DataFrame,
    rules: dict,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window violation-code counts with late-data handling.

    Watermark bounds the aggregation state (windows older than
    ``watermark`` are finalized and evicted); output is append-mode
    compatible: ``(window_start, window_end, key, code, n)``.

    The watermark must advance with the WHOLE event stream, not just
    its violating rows: a bare ``explode(_violations)`` lets Catalyst
    infer ``size(_violations) > 0`` and push it below the
    EventTimeWatermark node, so only violating rows would update the
    max-event-time stats — a violation-free stretch would stall the
    watermark and pin every open window's state forever (oracle-found
    at sf0.001: the last hour-windows never finalised).  Exploding a
    never-empty array (violations, or a single null placeholder for
    valid rows) keeps the inferred filter vacuous; the placeholder is
    dropped by a filter on the GENERATOR output, which cannot be pushed
    below the Generate and therefore never below the watermark.
    """
    rows = validate_stream(stream_df, rules)
    placeholder = F.array(
        F.struct(
            F.lit(None).cast("string").alias("key"),
            F.lit(None).cast("string").alias("code"),
            F.lit(None).cast("string").alias("message"),
        )
    )
    exploded = (
        rows.withWatermark(ts_col, watermark)
        .select(
            F.col(ts_col),
            F.explode(
                F.when(F.size("_violations") > 0, F.col("_violations"))
                .otherwise(placeholder)
            ).alias("v"),
        )
        .where(F.col("v.key").isNotNull())
    )
    return (
        exploded.groupBy(
            F.window(ts_col, window).alias("w"),
            F.col("v.key").alias("key"),
            F.col("v.code").alias("code"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "code",
            "n",
        )
    )


def stream_dedup(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on ``keys`` with bounded state.

    Uses ``dropDuplicatesWithinWatermark``: state holds one entry per
    distinct key seen within the watermark horizon and is evicted as
    event time advances — the streaming analogue of the batch
    ``exact_dedup``/uniqueness pass, safe on unbounded streams (plain
    ``dropDuplicates`` would grow state forever).  Duplicates arriving
    later than ``watermark`` are passed through (the same late-data
    contract as every watermarked operator).
    """
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stream_sessionize(
    stream_df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Streaming session aggregation — the unbounded-stream analogue of
    the batch ``pipeline.sessionize`` gaps-and-islands pass.

    Uses the built-in ``session_window`` (dynamic-gap merging inside
    the streaming state store): a session closes once event time passes
    its last event + ``gap``, the watermark finalises and EVICTS the
    window state, so memory is O(active sessions), not O(history).
    Output (append mode, one row per closed session):
    ``(entity, session_start, session_end, n_events[, sum_value])``.
    """
    agg = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        agg.append(F.sum(F.col(value_col)).alias("sum_value"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(entity_col),
        )
        .agg(*agg)
        .select(
            F.col(entity_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


#: output schema of conversation_monitor
MONITOR_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("max_idx", T.LongType()),
        T.StructField("n_dups", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_out_of_order", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_idx", T.LongType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("n_dups", T.LongType()),
        T.StructField("n_gaps", T.LongType()),
        T.StructField("n_out_of_order", T.LongType()),
        T.StructField("seen_bits", T.BinaryType()),
    ]
)

_MAX_TRACKED = 1 << 16  # bitmap caps per-conv memory at 8 KiB


def _monitor_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.hasTimedOut:
        max_idx, n_turns, n_dups, n_gaps, n_ooo, _bits = state.get
        state.remove()
        yield pd.DataFrame(
            [(conv_id, n_turns, max_idx, n_dups, n_gaps, n_ooo, True)],
            columns=[f.name for f in MONITOR_SCHEMA.fields],
        )
        return

    if state.exists:
        max_idx, n_turns, n_dups, n_gaps, n_ooo, bits = state.get
        seen = bytearray(bits)
    else:
        max_idx, n_turns, n_dups, n_gaps, n_ooo = -1, 0, 0, 0, 0
        seen = bytearray(_MAX_TRACKED // 8)

    for pdf in pdfs:
        for idx in pdf["turn_idx"]:
            idx = int(idx)
            n_turns += 1
            if 0 <= idx < _MAX_TRACKED:
                byte, bit = idx >> 3, 1 << (idx & 7)
                if seen[byte] & bit:
                    n_dups += 1
                    continue
                seen[byte] |= bit
            if idx < max_idx:
                n_ooo += 1
            elif idx > max_idx + 1:
                # covers the first-turn case too: max_idx=-1, idx>0
                n_gaps += 1
            max_idx = max(max_idx, idx)

    state.update((max_idx, n_turns, n_dups, n_gaps, n_ooo, bytes(seen)))
    state.setTimeoutDuration(30_000)
    yield pd.DataFrame(
        [(conv_id, n_turns, max_idx, n_dups, n_gaps, n_ooo, False)],
        columns=[f.name for f in MONITOR_SCHEMA.fields],
    )


def conversation_monitor(
    stream_df: DataFrame,
    conv: str = "conv_id",
    idx: str = "turn_idx",
) -> DataFrame:
    """Stateful per-conversation progress monitor over a stream.

    Emits one row per conversation per micro-batch with cumulative
    duplicate / gap / out-of-order counters; a processing-time timeout
    (30 s idle) closes the conversation and evicts its state.  State per
    conversation is a fixed-size bitmap + counters (≤ 8 KiB), so total
    state is bounded by ACTIVE conversations regardless of stream length.
    """
    return (
        stream_df.select(F.col(conv).alias("conv_id"), F.col(idx).alias("turn_idx"))
        .groupBy("conv_id")
        .applyInPandasWithState(
            _monitor_fn,
            outputStructType=MONITOR_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
