"""Deterministic, shuffle-free sampling and split assignment.

Training-data pipelines need samples and train/val/test splits that are
*reproducible*: the same rows selected on every run, at any parallelism,
on any cluster size, across task retries.  ``df.sample(seed=...)`` does
NOT give that — Spark seeds its RNG per partition, so the selected set
changes whenever the partition layout does (repartition, AQE coalesce,
different input splits).

Everything here keys off the salted portable 60-bit md5 hash of a stable
id column (:func:`filters_spark.pipeline.dedup.portable_hash60`), so:

- selection is a pure row-local predicate/projection — **no shuffle, no
  RNG state, scan-speed at 100 TB**, and the predicate pushes into the
  scan where the source supports it;
- the same row lands in the same sample/split on every engine that has
  md5 — the DuckDB oracle replays selections bit-for-bit;
- disjointness and coverage of splits hold by construction (half-open
  hash ranges).

Engine additions (the reference has no table-level operators —
SURVEY.md §2.9/§2.10).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filters_spark.pipeline.dedup import portable_hash60

__all__ = [
    "deterministic_sample",
    "deterministic_topn",
    "split_assign",
    "split_column",
    "stratified_sample",
    "temperature_weights",
]

_HASH_SPACE = 1 << 60


def _unit_hash(id_col: str, salt: str) -> Column:
    """Salted hash mapped to [0, 1) as a fraction of the 60-bit space."""
    return portable_hash60(F.col(id_col).cast("string"), salt)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose salted id-hash falls in ``[0, rate)`` of the hash
    space — a reproducible Bernoulli(``rate``) sample.

    Different ``salt`` values give independent samples; the same salt
    always selects the same rows.  Nested samples: a rate-0.01 sample
    with the same salt is a subset of the rate-0.1 sample (ranges are
    nested), which makes scale-up experiments comparable.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HASH_SPACE)
    return df.where(_unit_hash(id_col, salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling: each row's keep
    threshold is looked up from ``rates`` by its ``strata_col`` value
    (``default_rate`` for unlisted strata).

    The workhorse of corpus mixing — e.g. down-sample ``lang='en'`` to
    0.3 while keeping low-resource languages at 1.0.  Same shape as
    :func:`deterministic_sample`: a pure row-local predicate, no
    shuffle, reproducible at any parallelism, and nested across rates
    per stratum (raising one stratum's rate only *adds* rows).
    """
    bad = {k: v for k, v in rates.items() if not 0.0 <= v <= 1.0}
    if bad or not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"rates must be in [0, 1]: {bad or default_rate}")
    # Literal map lookup stays in whole-stage codegen; NULL strata and
    # unlisted values both fall to the default threshold.
    pairs: list[Column] = []
    for k, v in rates.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(int(v * _HASH_SPACE)))
    default = F.lit(int(default_rate * _HASH_SPACE))
    if pairs:
        threshold = F.coalesce(
            F.element_at(
                F.create_map(*pairs), F.col(strata_col).cast("string")
            ),
            default,
        )
    else:
        threshold = default
    return df.where(_unit_hash(id_col, salt) < threshold)


def temperature_weights(
    counts: dict[str, int | float],
    alpha: float = 0.3,
    budget: float | None = None,
) -> dict[str, float]:
    """Per-stratum keep rates from temperature-flattened multinomial
    weights — the standard low-resource up-weighting rule (sample
    stratum *i* with probability ∝ ``(n_i/N)^alpha``; ``alpha=1`` keeps
    natural proportions, ``alpha→0`` flattens toward uniform).

    Returns rates for :func:`stratified_sample` such that the expected
    kept size is ≈ ``budget`` rows (default: the corpus size ``N``)
    distributed by the flattened weights.  Rates cap at 1.0 — a stratum
    too small to fill its flattened share keeps everything and the
    total lands under budget (capped strata don't steal from others;
    deterministic, no iteration).

    Driver-side arithmetic over one tiny dict — feed it the output of
    ``df.groupBy(strata_col).count()``.
    """
    if not counts or any(v < 0 for v in counts.values()):
        raise ValueError(f"counts must be non-empty and >= 0: {counts}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    total = float(sum(counts.values()))
    if total <= 0:
        raise ValueError("counts must sum > 0")
    q = {k: (v / total) ** alpha if v > 0 else 0.0 for k, v in counts.items()}
    z = sum(q.values())
    target = float(budget) if budget is not None else total
    return {
        k: min(1.0, (q[k] / z) * target / counts[k]) if counts[k] else 0.0
        for k in counts
    }


def deterministic_topn(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Exactly-``n``-row reproducible sample: the ``n`` rows with the
    smallest salted id-hashes.

    Where :func:`deterministic_sample` gives Binomial(N, rate) rows,
    this gives an exact count — the deterministic analogue of reservoir
    sampling.  Plan: ``TakeOrderedAndProject`` — each partition keeps
    its local top-``n`` by hash and only those ``n``-row heads merge, so
    no global sort and no full shuffle; driver/merge memory is O(n).
    Use for bounded eval sets (n ≤ ~10^6); for proportional sampling at
    100 TB use the rate-based form.  Nested: the top-``m`` (m < n) under
    the same salt is a prefix of the top-``n``.
    """
    if n < 0:
        raise ValueError(f"n must be >= 0, got {n}")
    h = _unit_hash(id_col, salt)
    return (
        df.orderBy(h.asc(), F.col(id_col).asc())
        .limit(n)
        .select(df.columns)
    )


def split_column(
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> Column:
    """The split-label expression behind :func:`split_assign` — usable
    directly in ``select``/``withColumn``.

    ``weights`` maps label → relative weight (normalised internally);
    iteration order fixes the hash-range order, so pass the same dict
    ordering to reproduce an assignment.
    """
    if not weights:
        raise ValueError("weights must be a non-empty mapping")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be non-negative and sum > 0: {weights}")
    total = float(sum(weights.values()))
    h = _unit_hash(id_col, salt)
    expr = None
    acc = 0.0
    labels = list(weights)
    for label in labels[:-1]:
        acc += weights[label] / total
        bound = int(acc * _HASH_SPACE)
        clause = h < F.lit(bound)
        expr = (
            F.when(clause, F.lit(label))
            if expr is None
            else expr.when(clause, F.lit(label))
        )
    last = F.lit(labels[-1])
    return (last if expr is None else expr.otherwise(last)).alias("split")


def split_assign(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column partitioning the corpus
    into the given labels (default 98/1/1 train/val/test).

    Every row gets exactly one label (half-open hash ranges: disjoint
    and covering by construction); expected sizes are proportional to
    the weights and exact in distribution.  Pure projection — at 100 TB
    this costs a scan, and the downstream
    ``df.where(col('split') == 'train')`` predicate is pushable once
    the column is persisted.
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    return df.withColumn(
        "split", split_column(weights, id_col=id_col, salt=salt)
    )
