"""Training-data curation operators beyond dedup: repetition statistics
(Gopher-style repetition filters), benchmark decontamination via n-gram
overlap, and PII redaction.

All deterministic and DuckDB-oracle-able (``__spark_entry__.py``):
repetition ratios are exact integer divisions in double, decontamination
joins on literal word n-grams, and the PII patterns are RE2/Java-common
syntax so both engines substitute identically.

Scale notes per operator are on the functions; none performs an
all-pairs product, and the only Python in any path is zero (pure
expressions + hash-partitioned joins/aggregations throughout).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filters_spark.pipeline.dedup import word_shingles

__all__ = [
    "ngram_overlap",
    "redact_pii",
    "repetition_stats",
    "PII_PATTERNS",
]


def _tokens(text) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Repetition signals per document (Gopher §A.1.1-style filters):
    ``(id, n_lines, dup_line_frac, top_ngram_frac)``.

    - ``dup_line_frac``: 1 − distinct/total over newline-split lines —
      a pure expression, no shuffle;
    - ``top_ngram_frac``: occurrences of the most frequent word
      ``n``-gram / total ``n``-grams — explode + two-level hash agg
      keyed by (id, ngram) then id; map-side combine keeps the shuffle
      at distinct-ngrams volume.  Boilerplate-heavy documents (nav
      bars, SEO spam) score high on either and get filtered upstream
      of training.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n", -1)
    n_lines = F.when(text.isNull(), F.lit(0)).otherwise(F.size(lines))
    dup_line_frac = F.when(
        text.isNull() | (F.size(lines) == 0), F.lit(0.0)
    ).otherwise(
        F.lit(1.0)
        - F.size(F.array_distinct(lines)).cast("double") / F.size(lines)
    )
    base = df.select(
        F.col(id_col).alias("id"),
        n_lines.cast("long").alias("n_lines"),
        dup_line_frac.alias("dup_line_frac"),
    )

    toks = _tokens(text)
    n_grams = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    starts = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    counts = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .groupBy("id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("mx"), F.sum("c").alias("tot"))
    )
    return base.join(counts, "id", "left").select(
        "id",
        "n_lines",
        "dup_line_frac",
        F.coalesce(
            F.col("mx").cast("double") / F.col("tot"), F.lit(0.0)
        ).alias("top_ngram_frac"),
    )


def ngram_overlap(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    n: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: ``(id, n_hits, contaminated)`` where
    ``n_hits`` counts distinct word ``n``-grams a document shares with
    ANY benchmark text (the GPT-3-style n-gram collision test, with
    exact grams instead of hashes so the oracle replays it).

    Scale shape: the benchmark's distinct gram set is tiny next to the
    corpus, so it broadcasts; the corpus side is one shingle explode →
    broadcast-hash semi-join → per-doc count.  The corpus is never
    shuffled by gram — only matching (doc, gram) rows reach the count,
    and that aggregation is keyed by doc id.
    """
    doc_sh = word_shingles(df, text_col, id_col, n)
    bench_sh = (
        word_shingles(
            benchmark, bench_text_col or text_col, id_col, n
        )
        .select("shingle")
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


#: redaction patterns in RE2/Java-common syntax (no lookaround), applied
#: in this order; counts are taken against the ORIGINAL text
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact common PII shapes: ``(id, clean_text, n_email, n_ip,
    n_phone)``.  Pure ``regexp_replace`` projection — runs at scan
    speed; patterns are deliberately RE2-compatible so the exact same
    substitution happens in the DuckDB oracle (and in any RE2-based
    downstream scrubber)."""
    text = F.col(text_col)
    out_cols = [F.col(id_col).alias("id")]
    cleaned = text
    for name, pat, repl in PII_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, repl)
    out_cols.append(cleaned.alias("clean_text"))
    for name, pat, _ in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(text, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
    return df.select(*out_cols)
