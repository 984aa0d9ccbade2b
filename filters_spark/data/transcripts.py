"""Deterministic synthetic transcripts generator (BASELINE.json input_hint:
``conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp``).

Everything is pure Spark expressions over ``spark.range`` — no driver-side
data, no RNG state: every value derives from ``xxhash64`` of stable keys,
so the same parameters always produce byte-identical tables at any
parallelism.  This is the engine's test/bench input (FIXTURES.md §1); at
cluster scale the same generator shape works for 10^12 turns because each
conversation row explodes to its turns via ``sequence`` and all seeding is
expression-level.

Seeded data quality issues (each deterministic, each with a generator
parameter so known-answer tests can assert exact counts):

- duplicate ``(conv_id, turn_idx)`` pairs
- ``turn_idx`` gaps (a dropped turn mid-conversation)
- roles / tools outside the Choice domain
- null / empty / overlong text
- non-NFC text and CRLF line endings (per-turn text-equality oracle)
- hot conversations (skew): every ``hot_every``-th conversation has
  ``hot_size`` turns instead of 4-16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ("system", "user", "assistant", "tool")
TOOLS = ("search", "code", "browser")

#: text fragments, chosen by hash — includes NFC/NFD variants, emoji,
#: multibyte, and plain ASCII
_FRAGMENTS = (
    "Let me check the weather for you.",
    "café au lait, s'il vous plaît",  # NFC
    "The answer is 42, naturally.",
    "日本語のテキストです",
    "Running the query now... done \U0001f600",
    "Here is the summary you asked for.",
    "Σίσυφος rolls the stone.",
    "I'll search the docs for that.",
)
#: NFD variant (e + combining acute) — normalises to fragment[1]'s prefix
_NFD_TEXT = "café au lait, s'il vous plaît"


def _h(*cols):
    return F.xxhash64(*cols)


def transcripts(
    spark: SparkSession,
    n_convs: int = 2000,
    seed: int = 42,
    hot_every: int = 97,
    hot_size: int = 400,
    dup_mod: int = 311,
    gap_mod: int = 53,
    bad_role_mod: int = 211,
    bad_tool_mod: int = 223,
    null_text_mod: int = 101,
    empty_text_mod: int = 103,
    long_text_mod: int = 107,
    nfd_text_mod: int = 19,
    crlf_text_mod: int = 23,
    tool_bias: float = 0.0,
) -> DataFrame:
    """Build the synthetic transcripts table.

    ``tool_bias`` shifts tool-call frequency (0.0 = baseline distribution);
    use a non-zero value to create a drifted "current" snapshot for the
    KL/PSI checks.
    """
    conv = spark.range(n_convs).select(
        F.col("id").alias("cid"),
        F.format_string("conv-%010d", F.col("id")).alias("conv_id"),
    )
    size = F.when(
        F.col("cid") % hot_every == hot_every - 1, F.lit(hot_size)
    ).otherwise(4 + F.pmod(_h("cid", F.lit(seed)), F.lit(13)))
    turns = conv.select(
        "cid",
        "conv_id",
        F.explode(F.sequence(F.lit(0), size - 1)).alias("turn_idx"),
    )

    k = _h("conv_id", "turn_idx", F.lit(seed))  # per-turn deterministic key

    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.pmod(k, F.lit(bad_role_mod)) == 5, F.lit("robot"))  # seeded bad
        .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
        .when(F.pmod(k, F.lit(11)) < 3, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    tool_thresh = int(3 + tool_bias * 8)
    tool = (
        F.when(F.pmod(k, F.lit(bad_tool_mod)) == 7, F.lit("laser"))  # seeded bad
        .when(
            (role == "tool") | (F.pmod(k, F.lit(29)) < tool_thresh),
            F.element_at(
                F.array(*[F.lit(t) for t in TOOLS]),
                (F.pmod(k, F.lit(len(TOOLS))) + 1).cast("int"),
            ),
        )
        .otherwise(F.lit(None).cast("string"))
    )

    base_text = F.element_at(
        F.array(*[F.lit(t) for t in _FRAGMENTS]),
        (F.pmod(_h(k), F.lit(len(_FRAGMENTS))) + 1).cast("int"),
    )
    text = (
        F.when(F.pmod(k, F.lit(null_text_mod)) == 11, F.lit(None).cast("string"))
        .when(F.pmod(k, F.lit(empty_text_mod)) == 12, F.lit(""))
        .when(
            F.pmod(k, F.lit(long_text_mod)) == 13,
            F.concat(base_text, F.lit(" "), F.repeat(F.lit("pad "), 2000)),
        )
        .when(F.pmod(k, F.lit(nfd_text_mod)) == 3, F.lit(_NFD_TEXT))
        .when(
            F.pmod(k, F.lit(crlf_text_mod)) == 4,
            F.concat(base_text, F.lit("\r\nsecond line\r")),
        )
        .otherwise(base_text)
    )

    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=(F.col("cid") * 3600 + F.col("turn_idx") * 30).cast("double")
    )

    df = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

    # seeded duplicates: re-emit a deterministic subset with the same key
    dup_rows = df.where(
        F.pmod(_h("conv_id", "turn_idx", F.lit(seed + 1)), F.lit(dup_mod)) == 17
    )
    df = df.unionAll(dup_rows)

    # seeded gaps: drop turn 2 of selected conversations (leaves 0,1,3,...)
    df = df.where(
        ~(
            (F.pmod(_h("conv_id", F.lit(seed + 2)), F.lit(gap_mod)) == 9)
            & (F.col("turn_idx") == 2)
        )
    )
    return df


def transcripts_baseline(spark: SparkSession, n_convs: int = 2000, seed: int = 7):
    """Undrifted snapshot for the drift checks: clean distributions (no
    seeded violations) at a different seed."""
    return transcripts(
        spark,
        n_convs=n_convs,
        seed=seed,
        dup_mod=10**9,
        gap_mod=10**9,
        bad_role_mod=10**9,
        bad_tool_mod=10**9,
        null_text_mod=10**9,
        empty_text_mod=10**9,
        long_text_mod=10**9,
        tool_bias=0.0,
    )
