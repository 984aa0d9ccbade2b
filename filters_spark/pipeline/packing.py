"""Deterministic sequence packing (concat-and-chunk planning).

Pretraining consumes fixed-length token sequences built by concatenating
documents in a fixed order and slicing the stream every ``budget``
tokens — documents straddle pack boundaries (the standard GPT-style
packing).  Doing that naively needs a *global* running token total,
i.e. a total order — which is exactly what doesn't scale.

This operator computes the same plan with a two-phase distributed
prefix sum:

1. every document gets a deterministic position: shard =
   ``hash60(id # salt) mod n_shards``, ordered by ``(hash, id)`` inside
   the shard — reproducible at any parallelism, like everything in
   :mod:`~filters_spark.pipeline.sampling`;
2. a per-shard running token total (window ``SUM`` over the shard — a
   streaming running aggregate, spill-safe);
3. shard start offsets from the per-shard totals — an ``n_shards``-row
   aggregate, prefix-summed on one tiny partition and broadcast back;
4. each document's global token interval ``[start, end)`` then yields
   the packs it intersects via one ``sequence`` explode, with the token
   slice it contributes to each.

Output: one row per (document, pack) intersection —
``(id, pack_id, tok_start, tok_end)`` with ``tok_start``/``tok_end``
the half-open *within-document* token slice.  Every pack except the
last holds exactly ``budget`` tokens by construction.

At 100 TB the cost is one shuffle (the shard window sort) plus a tiny
aggregate; ``n_shards`` sets the parallelism of the sort.  Engine
addition (no reference counterpart — SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filters_spark.pipeline.dedup import portable_hash60
from filters_spark.pipeline.textstats import _tokens

__all__ = ["pack_plan"]


def pack_plan(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Plan packing of the corpus into ``budget``-token sequences.

    ``tokens_col`` names a precomputed per-doc token count; when absent,
    whitespace tokens of ``text_col`` are counted (same convention as
    :func:`~filters_spark.pipeline.textstats.token_counts`).  Zero-token
    documents contribute nothing to the stream and are dropped from the
    plan.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    n_tok = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(_tokens(F.col(text_col)))
    ).cast("long")
    h = portable_hash60(F.col(id_col).cast("string"), salt)
    base = df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        h.alias("h"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
    ).where(F.col("n_tokens") > 0)

    w_shard = (
        Window.partitionBy("shard")
        .orderBy("h", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_shard = base.withColumn(
        "cum_end_in_shard", F.sum("n_tokens").over(w_shard)
    )

    # Phase 2: n_shards-row prefix sum — tiny by construction, so the
    # single-partition window and the broadcast back are both O(shards).
    w_off = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_total"))
        .select(
            "shard",
            F.coalesce(F.sum("shard_total").over(w_off), F.lit(0)).alias(
                "shard_offset"
            ),
        )
    )

    g_start = (
        F.col("shard_offset")
        + F.col("cum_end_in_shard")
        - F.col("n_tokens")
    )
    g_end = F.col("shard_offset") + F.col("cum_end_in_shard")
    b = F.lit(int(budget)).cast("long")
    placed = in_shard.join(F.broadcast(offsets), "shard").select(
        "id",
        "n_tokens",
        g_start.alias("g_start"),
        F.floor(g_start / b).alias("pack_first"),
        F.floor((g_end - 1) / b).alias("pack_last"),
    )
    pack = F.col("pack_id")
    return placed.select(
        "id",
        "n_tokens",
        "g_start",
        F.explode(
            F.sequence(F.col("pack_first"), F.col("pack_last"))
        ).alias("pack_id"),
    ).select(
        "id",
        pack,
        F.greatest(F.lit(0).cast("long"), pack * b - F.col("g_start"))
        .alias("tok_start"),
        F.least(F.col("n_tokens"), (pack + 1) * b - F.col("g_start"))
        .alias("tok_end"),
    )
