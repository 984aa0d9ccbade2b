"""Corpus deduplication: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Engine additions (the reference has no corpus-level operators — SURVEY.md
§2.9); designed for 100 TB scale:

- every hash is a **portable 60-bit integer** derived from md5
  (``conv(substr(md5(x), 1, 15), 16, 10)``) so the DuckDB oracle queries
  reproduce results exactly and re-runs are deterministic at any
  parallelism;
- all-pairs comparison is never materialised: candidate pairs come from an
  inverted index (shingle → docs), LSH band buckets, or SimHash bands —
  each a hash-partitioned equi-join Catalyst can shuffle-hash or
  sort-merge, with AQE splitting skewed buckets;
- stop-shingles (document frequency above ``max_df``) are dropped before
  the self-join — at web scale a single hot shingle ("click here") would
  otherwise create a quadratic bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "dedup_groups",
    "dedup_resolve",
    "release",
    "remove_repeated_spans",
    "repeated_spans",
    "simhash",
    "simhash_pairs",
    "portable_hash60",
]


def _track_persisted(result: DataFrame, persisted: list[DataFrame]) -> DataFrame:
    """Attach the intermediate frames an operator persisted to its result
    so callers can release executor storage once the result is
    materialised (long-running sessions would otherwise leak one cached
    table per call).  Release with :func:`release`."""
    result._fs_persisted = persisted  # type: ignore[attr-defined]
    return result


def release(df: DataFrame) -> None:
    """Unpersist every intermediate frame a pipeline operator cached on
    behalf of ``df`` (no-op for frames that cached nothing)."""
    for p in getattr(df, "_fs_persisted", ()):  # type: ignore[attr-defined]
        p.unpersist()


def portable_hash60(col, salt=None):
    """60-bit integer hash of a string column, reproducible anywhere md5
    exists: ``int(md5(x || '#' || salt)[:15], 16)``.

    15 hex digits = 60 bits < 2^63, so the value fits a signed BIGINT in
    every engine (Spark LongType, DuckDB BIGINT).  Used instead of
    ``xxhash64`` for all dedup sketches so golden tests and the DuckDB
    oracle can replay them.
    """
    x = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        salt_col = salt if not isinstance(salt, (int, str)) else F.lit(str(salt))
        x = F.concat(x, F.lit("#"), salt_col)
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def _join_sizes(
    inter: DataFrame, sizes: DataFrame, cand: DataFrame | None = None
) -> DataFrame:
    """Attach per-doc shingle-set sizes to intersection counts and emit
    ``(a, b, jaccard)``.

    ``sizes`` has one row per document in the corpus, so it must NEVER
    carry a broadcast hint — at 10^8-10^9 docs a forced broadcast is a
    multi-GB driver collect (OOM / broadcast-limit failure).  Instead it
    is candidate-restricted first: a left-semi join keeps only the ids
    that actually appear in the candidate pairs, so the join that
    follows shuffles O(|candidates|) size rows, not O(|corpus|).  AQE is
    then free to broadcast the restricted side when it turns out tiny
    (the usual case at any scale), which is the plan you want both at
    sf0.1 and 100 TB.

    ``cand`` supplies the candidate-id relation when the caller has a
    CHEAPER (ideally cached) source of the same ids than ``inter``
    itself — the id sets need not match exactly, only cover ``inter``'s
    — so the expensive intersection aggregation is not recomputed just
    to restrict the sizes.
    """
    src = cand if cand is not None else inter
    ids = (
        src.select(F.col("a").alias("id"))
        .union(src.select(F.col("b").alias("id")))
        .distinct()
    )
    sz = sizes.join(ids, "id", "left_semi")
    sz_a = sz.select(F.col("id").alias("a"), F.col("sz").alias("sz_a"))
    sz_b = sz.select(F.col("id").alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "a")
        .join(sz_b, "b")
        .select(
            "a",
            "b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup groups via hash-groupBy on the text digest.

    Returns one row per distinct text: ``(keep_id, group_size)`` where
    ``keep_id`` is the smallest id in the group (deterministic survivor
    pick).  Grouping on ``md5(text)`` instead of the text itself keeps
    shuffle rows at 32 bytes + id regardless of document length — at
    100 TB the shuffle moves digests, not documents.  Collisions: md5 on
    non-adversarial data; swap for ``sha2`` 256 if needed.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("_digest"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .drop("_digest")
    )


def word_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Distinct word n-gram shingles per document: ``(id, shingle)``.

    Tokenises on whitespace (trim + split, empty tokens dropped) and forms
    ``n``-word shingles with a pure-expression ``transform(sequence(...))``
    — no Python, no explode until the caller needs it.  Output is
    exploded + distinct: one row per (doc, distinct shingle).

    The token array is materialised as its own projection FIRST: an
    expression captured inside a higher-order-function lambda is
    re-evaluated per element access, so referencing the raw
    ``split(trim(text))`` tree from the lambda re-tokenised the whole
    document once per shingle (measured ~30µs/shingle; a column
    reference makes it O(1)).
    """
    toks = F.col("__fs_toks")
    tokenised = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("__fs_toks"),
    )
    # element_at is 1-based; sequence(1, size-n+1) enumerates shingle
    # starts.  Guard size < n: Spark's sequence(1, 0) counts DOWN ([1,0]),
    # it is not empty — short docs must yield zero shingles instead.
    starts = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        starts,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return (
        tokenised.select("id", F.explode(sh).alias("shingle")).distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Document pairs with word-``n``-gram Jaccard similarity ≥ threshold.

    Plan shape (all hash-partitioned, no all-pairs product):

    1. shingle inverted index ``(shingle → id)`` — one explode pass;
    2. optional stop-shingle filter: drop shingles with document
       frequency > ``max_df`` (hot-key guard; a shingle shared by 10^6
       docs contributes a 10^12-row self-join otherwise);
    3. self-equi-join on ``shingle`` with ``a.id < b.id`` → intersection
       counts via groupBy (map-side partial agg shrinks the shuffle);
    4. join per-doc set sizes; ``J = inter / (|A|+|B|-inter)``.

    The size join carries NO broadcast hint: ``sizes`` has one row per
    document in the corpus, so a forced broadcast is a driver OOM at
    10^8+ docs.  AQE converts it to a broadcast join at small scale on
    its own; at 100 TB it stays a shuffle join on id.
    """
    sh = word_shingles(df, text_col, id_col, n).cache()
    persisted = [sh]
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    index = sh
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("shingle")
        )
        index = sh.join(F.broadcast(hot), "shingle", "left_anti")
    a = index.select(F.col("id").alias("a"), "shingle")
    b = index.select(F.col("id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # inter (the shingle self-join) feeds the size semi-join twice plus
    # the final join — persist so the self-join runs once (small: two
    # ids + a count per candidate pair)
    inter = inter.persist()
    persisted.append(inter)
    out = _join_sizes(inter, sizes).where(F.col("jaccard") >= threshold)
    return _track_persisted(out, persisted)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    num_hashes: int = 32,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signatures: ``(id, h0..h{k-1})``.

    One explode + ONE hash aggregation computes all ``num_hashes`` minima;
    Spark's partial aggregation gives the map-side combine, so the
    shuffle carries ``num_hashes`` longs per document, not the shingle
    stream.

    The permutation family is Carter-Wegman over ONE md5 per shingle:
    split the digest into two 48-bit halves ``(a, b)`` and take
    ``h_i = a + i·(2b+1)`` — a universal hash family at ~1/32 the cost
    of per-permutation salted digests (measured: the 32-salted-md5
    variant spent 8 core-µs per hash on ``md5``+``conv`` alone), and
    every term stays < 2^54 so the arithmetic is exact ``BIGINT`` in any
    engine — the DuckDB oracle replays it bit-for-bit.
    """
    sh = (
        shingles
        if shingles is not None
        else word_shingles(df, text_col, id_col, n)
    )
    digest = F.md5(F.col("shingle"))
    a = F.conv(F.substring(digest, 1, 12), 16, 10).cast("long")
    b = F.conv(F.substring(digest, 13, 12), 16, 10).cast("long")
    step = b * 2 + 1  # odd -> nonzero stride
    aggs = [
        F.min(a + F.lit(i) * step).alias(f"h{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    bands: int = 16,
    rows: int = 2,
    verify_threshold: float | None = None,
    cache: bool = True,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    ``bands × rows`` minhashes; band key = md5 of the band's row slice;
    candidates = pairs sharing ≥1 band bucket (equi-join on
    ``(band, key)`` — never an all-pairs product).  With ``rows=2,
    bands=16`` the S-curve crosses ~50% at J≈0.17; tune per corpus.

    ``verify_threshold`` re-checks candidates with exact Jaccard (join
    back to shingle sets) — the standard verify step so LSH false
    positives don't survive.

    ``max_bucket`` guards the self-join against FLOODED buckets: a
    document duplicated k times shares ALL its band keys, so one flood
    contributes k² candidate pairs per band — at web scale a 10^5-copy
    boilerplate page alone is 10^10 pairs.  Buckets larger than
    ``max_bucket`` are dropped (their members are near-identical by
    construction and are captured by the cheap ``exact_dedup`` pass,
    which should run first in any pipeline).  ``None`` disables the
    guard; the default is far above any honest bucket size at test SFs,
    so oracle replay is unaffected.

    ``cache=True`` persists the signature table (``num_hashes`` longs
    per doc) and, when verifying, the shingle index: both sit on BOTH
    sides of a self-join, which would otherwise re-run the signature
    aggregation twice.  At corpus scale the equivalent is writing
    signatures to a table and joining from there.
    """
    # ONE shingle pass feeds BOTH the signature aggregation and (when
    # verifying) the exact-Jaccard check — at corpus scale that is a
    # full scan + tokenisation saved; the cache makes the sharing real
    # (signatures and verify would otherwise recompute lineage).
    persisted: list[DataFrame] = []
    sh = word_shingles(df, text_col, id_col, n)
    if cache and verify_threshold is not None:
        sh = sh.persist()
        persisted.append(sh)
    sig = minhash_signatures(
        df, text_col, id_col, n, bands * rows, shingles=sh
    )
    if cache:
        sig = sig.persist()
        persisted.append(sig)
    # ONE pass over the signatures: band keys as an array-of-structs
    # column, then explode.  (A per-band unionAll would re-run the whole
    # signature aggregation `bands` times.)
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"h{b * rows + r}") for r in range(rows)]
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(entries).alias("e")).select(
        "id", "e.band", "e.band_key"
    )
    if max_bucket is not None:
        hot = (
            buckets.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("sz"))
            .where(F.col("sz") > max_bucket)
            .select("band", "band_key")
        )
        buckets = buckets.join(
            F.broadcast(hot), ["band", "band_key"], "left_anti"
        )
    a = buckets.select(F.col("id").alias("a"), "band", "band_key")
    b_ = buckets.select(F.col("id").alias("b"), "band", "band_key")
    cand = (
        a.join(b_, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    if verify_threshold is None:
        return _track_persisted(cand, persisted)
    # candidate-restricted exact Jaccard: join the candidate pairs back
    # to the (shared, cached) shingle sets instead of computing
    # all-pairs similarity — verification cost scales with
    # |candidates|, not |docs|².  cand sits under THREE consumers now
    # (the intersection join + both sides of the size semi-join in
    # _join_sizes), and it is the expensive bucket self-join — persist
    # it so the verify reuses one materialisation (measured: without
    # this the self-join ran 3x and the verify was ~4x slower).  Small:
    # two longs per candidate pair.
    if cache:
        cand = cand.persist()
        persisted.append(cand)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a_sh = sh.select(F.col("id").alias("a"), "shingle")
    b_sh = sh.select(F.col("id").alias("b"), "shingle")
    inter = (
        cand.join(a_sh, "a")
        .join(b_sh, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = _join_sizes(inter, sizes, cand=cand).where(
        F.col("jaccard") >= verify_threshold
    )
    return _track_persisted(out, persisted)


def dedup_groups(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    df: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-dup pairs: ``(id, group_id)`` with
    ``group_id`` = the smallest id reachable through the pair graph — the
    survivor-selection step that turns pairwise candidates
    (:func:`jaccard_pairs` / :func:`minhash_lsh_pairs` /
    :func:`simhash_pairs` / ``embedding_near_dups``) into dedup groups.

    Min-label propagation: each iteration joins the symmetric adjacency
    with the current labels and takes the per-node min — one shuffle
    join + one hash agg per iteration, converging in O(component
    diameter) rounds.  LSH/simhash near-dup components are bucket-join
    cliques in practice (diameter ~2-3), so the loop ends after a
    handful of rounds; for adversarial long-chain graphs raise
    ``max_iter`` (non-convergence raises rather than returning wrong
    groups).  Each round's label table is ``localCheckpoint``-ed
    (materialised by the round's single action), which TRUNCATES THE
    LOGICAL PLAN to a scan of the cached result — without that, the
    plan tree doubles every round (each round references the previous
    labels twice) and after ~15 rounds the driver OOMs just
    *stringifying* the plan, long before any executor limit.  Storage
    for superseded label tables (two longs per node) is released by
    Spark's ContextCleaner as their RDDs go out of scope, so the
    working set stays ~2 label tables regardless of iteration count.
    ``localCheckpoint`` storage does not survive executor loss; on a
    lossy cluster set a checkpoint dir and swap in reliable
    ``checkpoint()`` at a coarser interval (the GraphFrames pattern).
    At web scale this is the standard alternating-contraction regime;
    the classic large-star/small-star variant drops in here if
    components with huge diameters ever appear.

    ``df`` (optional) appends singleton groups (``group_id = id``) for
    documents that appear in no pair, so the output is a total
    assignment over the corpus.

    Id columns must be integral: a silent ``cast("long")`` on string doc
    ids would NULL every node and collapse the adjacency into garbage,
    so non-integral id types raise instead.  For string ids, map them to
    longs first (e.g. ``xxhash64(id)`` plus a collision check, or a
    ``monotonically_increasing_id`` lookup table) and join back after.
    """
    _integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

    def _is_integral(dt: T.DataType) -> bool:
        # Zero-scale decimals up to 18 digits cast to long losslessly
        # (warehouse/Parquet sources often type ids DECIMAL(n,0)); wider
        # or scaled decimals could silently truncate, so they still raise.
        if isinstance(dt, T.DecimalType):
            return dt.scale == 0 and dt.precision <= 18
        return isinstance(dt, _integral)

    id_checks = [(pairs, a_col), (pairs, b_col)] + (
        [(df, id_col)] if df is not None else []
    )
    for frame, col_name in id_checks:
        dt = frame.schema[col_name].dataType
        if not _is_integral(dt):
            raise TypeError(
                f"dedup_groups: id column {col_name!r} has type "
                f"{dt.simpleString()}; ids must be integral (hash string "
                "ids to longs explicitly, e.g. xxhash64, and join back)"
            )
    e = pairs.select(
        F.col(a_col).cast("long").alias("u"),
        F.col(b_col).cast("long").alias("v"),
    )
    adj = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).persist()
    labels = (
        adj.select(F.col("u").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    converged = False
    prev = labels
    for _ in range(max_iter):
        nb = adj.join(labels, F.col("v") == F.col("node")).groupBy(
            "u"
        ).agg(F.min("label").alias("nb_label"))
        merged = (
            labels.join(nb, F.col("node") == F.col("u"), "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nb_label"), F.col("label")),
                ).alias("label"),
            )
            # lazy localCheckpoint: materialised by the action below,
            # truncating lineage so the plan doesn't double per round
            .localCheckpoint(eager=False)
        )
        # ONE action per iteration: the changed-count aggregation fills
        # the checkpoint as a side effect; next round's join reads it
        changed = merged.agg(
            F.sum((F.col("label") != F.col("old_label")).cast("int"))
        ).first()[0]
        labels = merged.select("node", "label")
        prev.unpersist()
        prev = merged
        if not changed:
            converged = True
            break
    adj.unpersist()
    labels = prev.select("node", "label")
    if not converged:
        prev.unpersist()
        raise RuntimeError(
            f"dedup_groups did not converge in {max_iter} iterations - "
            "a component has a longer diameter; raise max_iter"
        )
    out = labels.select(
        F.col("node").alias("id"), F.col("label").alias("group_id")
    )
    if df is not None:
        singles = (
            df.select(F.col(id_col).cast("long").alias("id"))
            .join(out.select("id"), "id", "left_anti")
            .withColumn("group_id", F.col("id"))
        )
        out = out.union(singles)
    return _track_persisted(out, [prev])


def dedup_resolve(
    groups: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    rank_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """Survivor selection after grouping: ``(id, group_id, keep)`` —
    exactly one ``keep = true`` row per dedup group, the final step that
    turns :func:`dedup_groups` output into a retention decision the
    writer can filter on.

    The keeper is the group's best row by ``rank_col`` (``descending``
    by default — e.g. keep the LONGEST text or the highest quality
    score), with the smallest id as a total tiebreak so the choice is
    deterministic under any partitioning.  With ``rank_col=None`` the
    keeper is simply the smallest id (which for
    :func:`dedup_groups` output equals ``group_id``, making that case a
    pure projection — no shuffle at all).

    Scale shape (ranked case): one shuffle keyed by ``group_id`` for the
    ``row_number`` window — the same key cardinality the grouping step
    already shuffled on; ranks ride as a narrow (id, group, rank)
    projection, never the document text.
    """
    if rank_col is None:
        return groups.select(
            "id",
            "group_id",
            (F.col("id") == F.col("group_id")).alias("keep"),
        )
    from pyspark.sql.window import Window

    # nulls (docs absent from ``df``) always rank WORST, spelled out
    # because engines disagree on default null order (Spark: last on
    # DESC; DuckDB/Postgres: first on DESC)
    rank = (
        F.col("__rank").desc_nulls_last()
        if descending
        else F.col("__rank").asc_nulls_last()
    )
    ranked = groups.join(
        df.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(rank_col).alias("__rank"),
        ),
        "id",
        "left",
    )
    w = Window.partitionBy("group_id").orderBy(
        rank, F.col("id").asc()
    )
    return ranked.select(
        "id",
        "group_id",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Cross-corpus duplicated ``k``-token spans, merged per document —
    substring-level dedup in the style of Lee et al. 2022,
    *Deduplicating Training Data Makes Language Models Better*
    (arXiv:2107.06499): a span is "duplicated" when its ``k``-gram
    occurs at least ``min_count`` times across the whole corpus
    (within-document repeats count).

    Returns ``(doc_id, span_start, span_end, n_tokens)`` with 0-based
    token indices, end exclusive; overlapping and adjacent duplicated
    spans are merged per document.

    Plan shape (100-TB honest):

    1. positional ``k``-gram hashes ``(id, pos, h)`` — pure
       expressions, one explode; the downstream shuffle payload is
       ~24 bytes per shingle, never the text;
    2. duplicate detection = hash-partitioned count (map-side partial)
       inner-joined back on ``h``.  Both branches shuffle the same
       relation by the same key, so Catalyst's ``ReuseExchange`` scans
       the shingles once; hot boilerplate spans ("all rights
       reserved …") that repeat millions of times skew the join and
       are split by AQE's skew-join handling — and they are *payload*
       here, not noise, so there is no ``max_df`` drop;
    3. per-document overlap merge = gaps-and-islands over a
       ``(id, pos)`` window — one extra shuffle partitioned by
       document, bounded by document length.  No Python anywhere.
    """
    from pyspark.sql import Window

    toks = F.col("__fs_toks")
    tokenised = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
        ).alias("__fs_toks"),
    )
    # sequence(1,0) counts DOWN (see word_shingles) — guard short docs.
    starts = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        starts,
        lambda i: F.struct(
            (i - 1).cast("int").alias("pos"),
            F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ).alias("sh"),
        ),
    )
    pos_sh = tokenised.select("id", F.explode(grams).alias("g")).select(
        "id",
        F.col("g.pos").alias("pos"),
        portable_hash60(F.col("g.sh")).alias("h"),
    )
    dup_h = pos_sh.groupBy("h").agg(F.count(F.lit(1)).alias("cnt")).where(
        F.col("cnt") >= min_count
    )
    dup = pos_sh.join(dup_h, "h").select("id", "pos")

    w = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "__new",
        F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0),
    )
    island = F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("__isl", island)
        .groupBy("id", "__isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + k).cast("long").alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    spans: DataFrame | None = None,
) -> DataFrame:
    """The apply step of substring-level dedup: rewrite ``text_col``
    with every corpus-wide duplicated span (see :func:`repeated_spans`)
    removed, keeping all other columns.

    The span table collapses to ONE small array row per affected
    document (documents hold few merged spans), so the join back to the
    corpus is a plain equi-join on the id — broadcast-able when the
    affected set is small, AQE-decided otherwise — and the actual token
    drop is a pure higher-order-function expression: re-tokenise,
    filter token indices not covered by any span, re-join with single
    spaces.  No Python, no explode of the corpus.

    Whitespace is canonicalised to single spaces in the rewritten
    column (token-level surgery can't preserve the original runs);
    documents without duplicated spans keep their text verbatim.

    Pass ``spans=`` to reuse an already-computed
    :func:`repeated_spans` result (it is recomputed otherwise).
    """
    if spans is None:
        spans = repeated_spans(
            df, text_col=text_col, id_col=id_col, k=k, min_count=min_count
        )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__fs_spans")
    )
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    # index each token, drop those covered by any [start, end) span,
    # stitch the survivors back together
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__fs_spans"),
            lambda sp: (s["i"] >= sp["span_start"])
            & (s["i"] < sp["span_end"]),
        ),
    )
    cleaned = F.concat_ws(" ", F.transform(kept, lambda s: s["t"]))
    return (
        df.join(per_doc, id_col, "left")
        .withColumn(
            text_col,
            F.when(F.col("__fs_spans").isNull(), F.col(text_col)).otherwise(
                cleaned
            ),
        )
        .drop("__fs_spans")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
) -> DataFrame:
    """SimHash fingerprint per document: ``(id, simhash)``.

    Each whitespace token (with multiplicity) hashes to 60 bits; bit ``j``
    of the fingerprint is the sign of ``Σ_tokens (±1)`` where the token
    votes +1 iff its hash has bit ``j`` set.  Implemented as one explode +
    one groupBy with ``bits`` SUM aggregates — all JVM expressions,
    partial-aggregated map-side, no per-token blowup beyond the explode.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("token")
    ).withColumn("th", portable_hash60(F.col("token")))
    votes = [
        F.sum(
            F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("id").agg(*votes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v{j}") > 0, F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return agg.select("id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """SimHash near-dup pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole blocking: split the fingerprint into ``bands`` contiguous
    bit-blocks; any pair within Hamming ``bands - 1`` must agree on at
    least one whole block, so candidates come from ``bands`` equi-joins on
    block value (union + distinct), then the exact popcount filter runs
    only on candidates.  ``max_hamming`` must be < ``bands`` for the
    blocking to be lossless.

    ``max_bucket`` is the same duplicate-flood guard as in
    :func:`minhash_lsh_pairs`: identical documents share the whole
    fingerprint (every block), so a k-copy flood is k² pairs per band
    without it.  Oversized blocks are dropped — losslessness then holds
    for everything except flooded content, which is ``exact_dedup``'s
    job.  ``None`` disables; the default is inert at test SFs.
    """
    if max_hamming >= bands:
        raise ValueError("pigeonhole blocking needs max_hamming < bands")
    fps = simhash(df, text_col, id_col, bits)
    width = bits // bands
    # one pass: block keys as array-of-structs + explode (see
    # minhash_lsh_pairs — unionAll would recompute the fingerprints)
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bkey"),
            )
            for b in range(bands)
        ]
    )
    buckets = fps.select(
        "id", "simhash", F.explode(entries).alias("e")
    ).select("id", "simhash", "e.band", "e.bkey")
    if max_bucket is not None:
        hot = (
            buckets.groupBy("band", "bkey")
            .agg(F.count(F.lit(1)).alias("sz"))
            .where(F.col("sz") > max_bucket)
            .select("band", "bkey")
        )
        buckets = buckets.join(
            F.broadcast(hot), ["band", "bkey"], "left_anti"
        )
    a = buckets.select(
        F.col("id").alias("a"), F.col("simhash").alias("fa"), "band", "bkey"
    )
    b_ = buckets.select(
        F.col("id").alias("b"), F.col("simhash").alias("fb"), "band", "bkey"
    )
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        a.join(b_, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
