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
    "boilerplate_texts",
    "domain_counts",
    "domain_filter",
    "extract_urls",
    "html_strip",
    "ngram_overlap",
    "redact_pii",
    "repetition_stats",
    "text_sanity",
    "CONTROL_CHAR_PATTERN",
    "HTML_BLOCK_PATTERNS",
    "HTML_ENTITIES",
    "PII_PATTERNS",
    "URL_PATTERN",
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


#: URL shape in RE2/Java-common syntax (no lookaround, no backrefs) so
#: the DuckDB oracle extracts the exact same spans
URL_PATTERN: str = r"""https?://[^\s<>"']+"""


def _url_domain(url: Column) -> Column:
    """Registrable-host normalisation of a matched URL: the authority
    component lowered, with userinfo, port, a trailing dot, and a
    leading ``www.`` stripped.  Pure regex chain — identical in RE2 and
    Java regex."""
    host = F.lower(F.regexp_extract(url, r"https?://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^[^@]*@", "")
    host = F.regexp_replace(host, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"\.$", "")
    return F.regexp_replace(host, r"^www\.", "")


def extract_urls(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per URL occurrence: ``(id, pos, url, domain)`` where
    ``pos`` is the occurrence index within the document (the same URL
    string appearing twice yields two rows) and ``domain`` is the
    normalised host (see :func:`_url_domain`).

    Scale shape: a single ``regexp_extract_all`` + ``posexplode``
    projection — no shuffle at all; output volume is the corpus's URL
    count, and the regex runs JVM-side at scan speed.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(urls))
        .withColumnRenamed("col", "url")
        .select(
            "id",
            F.col("pos").cast("int").alias("pos"),
            "url",
            _url_domain(F.col("url")).alias("domain"),
        )
    )


def domain_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus statistics: ``(domain, n_urls, n_docs)`` —
    the source-quality census every web pipeline starts from (rank
    domains, then decide crawl/block lists from the head of this
    table).

    Scale shape: explode → ONE hash aggregation keyed by domain with
    map-side combine; the shuffle carries (domain, partial count,
    partial HLL-free distinct via (domain, id) pre-agg).  Distinct
    doc counts use an exact two-level aggregation rather than
    ``countDistinct`` over the raw explode so the wide shuffle row is
    (domain, id) once per pair, not once per URL occurrence.
    """
    u = extract_urls(df, text_col, id_col)
    per_pair = u.groupBy("domain", "id").agg(
        F.count(F.lit(1)).alias("n_in_doc")
    )
    return per_pair.groupBy("domain").agg(
        F.sum("n_in_doc").cast("long").alias("n_urls"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )


def _domain_suffixes(domain: Column) -> Column:
    """All dot-suffixes of a host (``a.b.c`` → [``a.b.c``, ``b.c``,
    ``c``]) so a blocklist entry blocks its whole subtree, the way
    adblock/URL-category lists are interpreted."""
    parts = F.split(domain, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n - i + 1), "."),
    )


def domain_filter(
    df: DataFrame,
    blocked,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Blocklist filtering by URL domain: ``(id, n_urls, n_blocked,
    blocked)`` where a URL is blocked when any dot-suffix of its
    normalised domain appears in ``blocked`` (a list of domain strings,
    or a DataFrame with a ``domain`` column).

    Scale shape: blocklists are tiny next to a web corpus, so the
    blocklist side always broadcasts; the corpus side is ONE pass —
    URL explode → bounded suffix explode (≤ label count per URL) →
    broadcast-hash LEFT join → per-(doc, url) verdict agg → per-doc
    agg (totals and hits in the same aggregation, so the corpus text
    is scanned once, not once per statistic), plus one narrow id-only
    scan to give url-free docs their verdict row.  The corpus is never
    shuffled by domain.
    """
    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        bl = blocked.select(F.col("domain").alias("__bl"))
    else:
        bl = spark.createDataFrame(
            [(d,) for d in blocked], "`__bl` string"
        )
    u = extract_urls(df, text_col, id_col)
    per_url = (
        u.select(
            "id",
            "pos",
            F.explode(_domain_suffixes(F.col("domain"))).alias("suf"),
        )
        .join(F.broadcast(bl), F.col("suf") == F.col("__bl"), "left")
        .groupBy("id", "pos")
        .agg(F.max(F.col("__bl").isNotNull()).alias("hit"))
    )
    per_doc = per_url.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum(F.col("hit").cast("long")).alias("n_blocked"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_urls", F.lit(0)).cast("long").alias("n_urls"),
            F.coalesce("n_blocked", F.lit(0)).cast("long").alias("n_blocked"),
            (F.coalesce("n_blocked", F.lit(0)) > 0).alias("blocked"),
        )
    )


#: block-level HTML removals, applied before tag stripping; RE2/Java
#: common (inline flags + lazy quantifiers, NO backreferences — RE2 has
#: none, so script/style are separate patterns)
HTML_BLOCK_PATTERNS: tuple[str, ...] = (
    r"(?is)<script\b[^>]*>.*?</script>",
    r"(?is)<style\b[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
)

#: literal entity decodes applied after tag stripping; ``&amp;`` is
#: deliberately LAST so ``&amp;lt;`` decodes to ``&lt;`` (one level),
#: matching a single-pass HTML entity decoder
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def html_strip(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """C4-style HTML boilerplate removal: ``(id, clean_text, n_tags)``.
    Drops ``<script>``/``<style>`` blocks and comments, strips remaining
    tags to spaces, decodes the six universal entities, and collapses
    whitespace; ``n_tags`` counts tags in the ORIGINAL text (a useful
    markup-density quality signal — pages that are mostly tags are
    boilerplate).

    Pure ``regexp_replace``/``replace`` projection — scan speed, no
    shuffle, JVM-side; every pattern is RE2-compatible so the DuckDB
    oracle (and any RE2-based scrubber) byte-matches.
    """
    text = F.col(text_col)
    cleaned = text
    for pat in HTML_BLOCK_PATTERNS:
        cleaned = F.regexp_replace(cleaned, pat, " ")
    cleaned = F.regexp_replace(cleaned, r"(?s)<[^>]*>", " ")
    for ent, repl in HTML_ENTITIES:
        cleaned = F.replace(cleaned, F.lit(ent), F.lit(repl))
    cleaned = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return df.select(
        F.col(id_col).alias("id"),
        cleaned.alias("clean_text"),
        F.size(F.regexp_extract_all(text, F.lit(r"(?s)<[^>]*>"), 0))
        .cast("long")
        .alias("n_tags"),
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


#: C0 controls minus tab/newline/carriage-return, plus DEL — the
#: characters no legitimate transcript text contains (RE2/Java-common).
CONTROL_CHAR_PATTERN = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
#: invisible formatting characters: ZWSP, ZWNJ, ZWJ, ZWNBSP/BOM
ZERO_WIDTH_PATTERN = "[\u200b\u200c\u200d\ufeff]"
#: U+FFFD — the scar a lossy decode leaves behind
REPLACEMENT_PATTERN = "\ufffd"


def text_sanity(
    df: DataFrame,
    text_col: str = "text",
    keys: str | tuple = ("doc_id",),
    only_violations: bool = False,
) -> DataFrame:
    """Per-row text-encoding sanity census: ``(keys…, n_chars,
    n_control, n_replacement, n_zero_width, is_blank, ok)`` — the
    mojibake check a transcripts pipeline runs before any text operator
    trusts the column.  ``n_replacement`` counts U+FFFD (a lossy
    re-decode upstream), ``n_control`` counts C0 controls other than
    tab/LF/CR plus DEL (binary spill / terminal escapes),
    ``n_zero_width`` counts invisible formatting characters (ZWSP /
    ZWNJ / ZWJ / BOM — copy-paste contamination that breaks exact-match
    dedup and tokenizer determinism), and ``is_blank`` flags non-empty
    whitespace-only text (passes NotEmpty, still contentless).  ``ok``
    requires non-null text with all counts zero and not blank.

    ``only_violations=True`` returns just the failing rows — the
    bounded reporting shape.

    Scale shape: a pure projection (JVM ``regexp_count`` — RE2/Java
    common syntax so a DuckDB oracle substitutes identically; no
    Python, no shuffle); the violation filter composes with parquet
    scan pruning to read only the text and key columns.
    """
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    t = F.col(text_col)
    present = t.isNotNull()

    def cnt(pattern: str) -> Column:
        return F.when(present, F.regexp_count(t, F.lit(pattern)))

    # explicit class, not \s or trim(): Spark's trim strips spaces only,
    # and Java/RE2 disagree on \x0b membership in \s (\x0b and \x0c are
    # n_control's problem anyway)
    is_blank = F.when(present, t.rlike("^[ \\t\\n\\r]+$"))
    out = df.select(
        *key_cols,
        F.when(present, F.length(t)).alias("n_chars"),
        cnt(CONTROL_CHAR_PATTERN).alias("n_control"),
        cnt(REPLACEMENT_PATTERN).alias("n_replacement"),
        cnt(ZERO_WIDTH_PATTERN).alias("n_zero_width"),
        is_blank.alias("is_blank"),
    )
    ok = (
        F.col("n_chars").isNotNull()
        & (F.col("n_control") == 0)
        & (F.col("n_replacement") == 0)
        & (F.col("n_zero_width") == 0)
        & ~F.col("is_blank")
    )
    out = out.select("*", F.coalesce(ok, F.lit(False)).alias("ok"))
    if only_violations:
        out = out.where(~F.col("ok"))
    return out


def boilerplate_texts(
    df: DataFrame,
    conv: str = "conv_id",
    text_col: str = "text",
    min_convs: int = 3,
) -> DataFrame:
    """Canned-response detection: every distinct text that appears in at
    least ``min_convs`` DISTINCT conversations, as ``(fp, text, n_convs,
    n_rows)`` — the cross-conversation contamination census.  Exact
    whole-corpus dedup (``exact_dedup``) groups identical rows; this
    asks the transcripts question instead: which texts recur *across*
    conversations (templated assistant openers, stuck retry loops
    leaking one canned apology into thousands of conversations,
    injected boilerplate) — exactly the rows a training run
    over-weights.

    Scale shape: a two-level hash aggregation on ``(fp, conv)`` then
    ``fp`` (``fp`` = md5 of the text — both levels map-side combine, so
    a conversation repeating one line a million times collapses inside
    its mapper; the first shuffle carries one row per distinct
    (text, conversation) pair, the second one row per distinct text).
    Output is bounded by the number of distinct texts clearing the
    threshold.  Null texts are excluded (presence drift, not
    boilerplate).
    """
    fp = F.md5(F.encode(F.col(text_col), "UTF-8"))
    per_conv = (
        df.where(F.col(text_col).isNotNull())
        .groupBy(fp.alias("fp"), F.col(conv).alias("__conv"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(text_col).alias("__t"),
        )
    )
    return (
        per_conv.groupBy("fp")
        .agg(
            F.min("__t").alias("text"),
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.sum("__c").cast("long").alias("n_rows"),
        )
        .where(F.col("n_convs") >= int(min_convs))
    )
