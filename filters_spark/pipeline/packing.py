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

__all__ = ["pack_plan", "pack_sequences"]


def pack_plan(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    n_shards: int = 32,
    salt: str = "pack",
    keep_positions: bool = False,
) -> DataFrame:
    """Plan packing of the corpus into ``budget``-token sequences.

    ``tokens_col`` names a precomputed per-doc token count; when absent,
    whitespace tokens of ``text_col`` are counted (same convention as
    :func:`~filters_spark.pipeline.textstats.token_counts`).  Zero-token
    documents contribute nothing to the stream and are dropped from the
    plan.  ``keep_positions=True`` appends the document's global stream
    offset ``g_start`` (the within-pack ordering key
    :func:`pack_sequences` needs).
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
    # The explicit shard-notnull filter matters: the offsets join would
    # otherwise push isnotnull(shard) into only ONE consumer branch,
    # making the two hashpartitioning(shard) Exchanges canonically
    # different and defeating ReuseExchange (upstream would run twice).
    base = df.select(
        F.col(id_col).alias("id"),
        n_tok.alias("n_tokens"),
        h.alias("h"),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
    ).where((F.col("n_tokens") > 0) & F.col("shard").isNotNull())

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
    # Shard totals come from the SAME window output (max of the running
    # sum), not from a second aggregation over `base`: both consumers
    # then sit on one hashpartitioning(shard) Exchange, which
    # ReuseExchange executes once — otherwise the entire upstream (scan,
    # filters, any dedup shuffle feeding the pack) runs twice.
    w_off = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        in_shard.groupBy("shard")
        .agg(F.max("cum_end_in_shard").alias("shard_total"))
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
    out = placed.select(
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
        F.col("g_start"),
    )
    return out if keep_positions else out.drop("g_start")


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    n_shards: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Apply step of :func:`pack_plan`: materialise the packed
    sequences, documents concatenated in the deterministic stream order
    and sliced at pack boundaries.

    Two modes:

    - default: whitespace-tokenise ``text_col`` (:func:`pack_plan`'s
      counting convention) and emit ``(pack_id, n_tokens, text)`` with
      ``text`` the space-joined token stream of the pack;
    - ``tokens_col=``: pack a pretokenised ARRAY column (e.g. BPE ids
      from your tokeniser) verbatim and emit
      ``(pack_id, n_tokens, tokens)`` — the exact fixed-length training
      sequences, element type preserved.

    Every pack except the last holds exactly ``budget`` tokens.  Plan:
    the packing plan (with positions) equi-joins the tokenised corpus
    on id — each document's token array crosses the shuffle once per
    pack it intersects (almost always once; twice at a boundary) — the
    per-pack pieces are ``slice``-d, then one hash aggregation per pack
    sorts pieces by their global offset (``array_sort`` over
    ``(pos, piece)`` structs; ``pos`` is unique so the array payload is
    never compared) and flattens.  No global sort, no driver
    materialisation; a pack's contents (~``budget`` tokens) is the unit
    of executor memory.
    """
    if tokens_col is not None:
        src = df.withColumn(
            "__fs_n_tok", F.size(F.col(tokens_col)).cast("long")
        )
        plan = pack_plan(
            src,
            budget,
            id_col=id_col,
            tokens_col="__fs_n_tok",
            n_shards=n_shards,
            salt=salt,
            keep_positions=True,
        )
        toks = df.select(
            F.col(id_col).alias("id"),
            F.col(tokens_col).alias("__fs_toks"),
        )
    else:
        plan = pack_plan(
            df,
            budget,
            text_col=text_col,
            id_col=id_col,
            n_shards=n_shards,
            salt=salt,
            keep_positions=True,
        )
        # Same tokenizer pack_plan counts with — counts and slices must
        # never drift, so both sides call _tokens.
        toks = df.select(
            F.col(id_col).alias("id"),
            _tokens(F.col(text_col)).alias("__fs_toks"),
        )
    piece = F.slice(
        F.col("__fs_toks"),
        (F.col("tok_start") + 1).cast("int"),
        (F.col("tok_end") - F.col("tok_start")).cast("int"),
    )
    pieces = plan.join(toks, "id").select(
        "pack_id",
        F.struct(
            (F.col("g_start") + F.col("tok_start")).alias("pos"),
            (
                piece
                if tokens_col is not None
                else F.array_join(piece, " ")
            ).alias("piece"),
            (F.col("tok_end") - F.col("tok_start")).alias("n"),
        ).alias("p"),
    )
    packed = pieces.groupBy("pack_id").agg(
        F.array_sort(F.collect_list("p")).alias("ps")
    )
    n_tokens = F.aggregate(
        "ps", F.lit(0).cast("long"), lambda acc, x: acc + x["n"]
    ).alias("n_tokens")
    if tokens_col is not None:
        payload = F.flatten(
            F.transform("ps", lambda x: x["piece"])
        ).alias("tokens")
    else:
        payload = F.array_join(
            F.transform("ps", lambda x: x["piece"]), " "
        ).alias("text")
    return packed.select("pack_id", n_tokens, payload)
