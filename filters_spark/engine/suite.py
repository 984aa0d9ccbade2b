"""ValidationSuite: the full table-level validation job (BASELINE.json
north rule) — row-chain validation + column stats + uniqueness +
referential + drift, producing per-partition pass/fail verdicts and
structured violation rows.

Pipeline shape (what actually runs):

1. ONE projection pass compiles all row chains (``validate``), carries
   tiny RAW copies of the key/drift columns, and tags each row with its
   conv-bucket — no shuffle.
2. Per-bucket verdict aggregation — hash agg keyed by bucket
   (``n_buckets`` groups; map-side combine reduces each task's output to
   ``n_buckets`` rows before the shuffle).
3. Uniqueness + gaplessness — hash aggs keyed by (conv_id, turn_idx) /
   conv_id, rolled up to buckets, reading the PERSISTED narrow
   projection (raw-key copies), not a second input scan.
4. Column stats — one agg pass over the input (HLL + approx quantiles).
5. Drift — current side from the persisted raw copies (pre-bucketed
   lengths), baseline side one scan, driver-side KL/PSI.

Input scans at 10^12 rows: the chain pass and the stats pass — every
other stage reads the cached narrow projection.

Buckets default to ``pmod(xxhash64(conv_id), n_buckets)``; pass
``bucket_fn=filters_spark.sources.iceberg.iceberg_bucket_fn(spark)`` on
an Iceberg ``bucket(N, conv_id)``-partitioned table (Iceberg's transform
is Murmur3-32) so per-bucket verdicts line up with physical partitions
and the checkpoint/resume filter prunes at the storage layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filters_spark.core.compiler import validate
from filters_spark.engine.drift import (
    dist_profile,
    kl_from_dicts,
    length_bucket,
    psi_from_dicts,
)
from filters_spark.engine.stats import column_stats

BUCKET_COL = "_bucket"

#: raw-copy columns carried through the row pass so the uniqueness
#: aggregation and the current-side drift profile read the narrow
#: persisted projection instead of rescanning the input (chains REPLACE
#: validated columns with cleaned values, so the raw key/drift values
#: must ride along; they are small — two keys, the categorical drift
#: columns, and a pre-computed length-bucket int, never the text)
RAW_PREFIX = "__raw_"  # NOT "__fs_": validate() prunes its own temps by that prefix
RULEF_COL = "__rule_fails"  # per-row count of failed table rules


def bucket_of(conv_col, n_buckets: int):
    return F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int")


@dataclass
class SuiteResult:
    rows: DataFrame  # cleaned rows + _violations + _is_valid + _bucket (lazy)
    verdicts: DataFrame  # per-bucket pass/fail + counters
    stats: DataFrame  # long-format column stats
    violations: DataFrame  # exploded violation rows (key, code, message)
    metrics: dict = field(default_factory=dict)  # drift + thresholds
    #: narrow persisted projection feeding verdicts/violations (see
    #: ValidationSuite.run); call :meth:`unpersist` when done
    keyed: DataFrame | None = None

    @property
    def passed(self) -> bool:
        failed = self.verdicts.where(~F.col("bucket_pass")).limit(1).count()
        return failed == 0 and not self.metrics.get("drift_failed", False)

    def unpersist(self) -> None:
        if self.keyed is not None:
            self.keyed.unpersist()


class ValidationSuite:
    def __init__(
        self,
        rules: dict,
        conv: str = "conv_id",
        idx: str = "turn_idx",
        n_buckets: int = 64,
        drift_cols: tuple = ("role", "tool"),
        length_col: str | None = "text",
        max_invalid_rate: float = 0.05,
        kl_threshold: float = 0.10,
        psi_threshold: float = 0.25,
        stat_columns: list[str] | None = None,
        bucket_fn=None,
        table_rules: dict | None = None,
    ) -> None:
        self.rules = rules
        #: named TABLE-level boolean predicates (engine/rules.py) —
        #: cross-field invariants evaluated on the RAW input row
        #: (before chains clean/null columns), strict null semantics.
        #: When set, verdicts gain a per-bucket ``rule_fails`` count and
        #: ``bucket_pass`` additionally requires it to be zero.
        self.table_rules = table_rules
        self.conv = conv
        self.idx = idx
        self.n_buckets = n_buckets
        self.drift_cols = drift_cols
        self.length_col = length_col
        self.max_invalid_rate = max_invalid_rate
        self.kl_threshold = kl_threshold
        self.psi_threshold = psi_threshold
        self.stat_columns = stat_columns
        #: bucket assignment ``(conv_col, n_buckets) -> int column``;
        #: default mirrors Iceberg's ``bucket(N, conv_id)`` transform via
        #: xxhash64.  Override with a portable expression (e.g.
        #: ``pmod(key, n)``) when results must replay in other engines.
        self.bucket_fn = bucket_fn or bucket_of

    # -- pieces ---------------------------------------------------------

    def _raw_copy_cols(self, df: DataFrame) -> dict:
        keep = [self.conv, self.idx] + [
            c for c in self.drift_cols if c in df.columns
        ]
        raws = {RAW_PREFIX + c: F.col(c) for c in dict.fromkeys(keep)}
        if self.length_col and self.length_col in df.columns:
            raws[RAW_PREFIX + "lenbucket"] = length_bucket(self.length_col)
        return raws

    def row_results(self, df: DataFrame) -> DataFrame:
        extra = self._raw_copy_cols(df)
        if self.table_rules:
            from filters_spark.engine.rules import _fail, _pred

            # evaluated on the RAW input projection (chains may null or
            # clean the very columns the rules reference); one int per
            # row, summed per bucket in verdicts()
            fails: Column | None = None
            for expr in self.table_rules.values():
                f = _fail(_pred(expr), null_fails=True).cast("int")
                fails = f if fails is None else fails + f
            extra[RULEF_COL] = fails
        rows = validate(df.withColumns(extra), self.rules)
        return rows.withColumn(
            BUCKET_COL, self.bucket_fn(F.col(self.conv), self.n_buckets)
        )

    def verdicts(self, df: DataFrame, rows: DataFrame) -> DataFrame:
        """Per-bucket verdict: row validity + uniqueness + gaplessness.

        Uniqueness and gaplessness derive from ONE aggregation cascade
        over the RAW key copies carried in ``rows`` — ``(conv, idx)``
        counts → per-conversation stats (dup counters AND gapless flags
        computed together) → bucket rollup — so the big keyed shuffle
        runs exactly once AND reads the narrow persisted projection
        instead of rescanning the input (chains replace validated
        columns, so cleaned keys could be nulled; the ``__raw_`` copies
        preserve the raw-key contract without a second scan).
        (An earlier design aggregated dups and gaplessness as two
        branches over the shared pre-agg, counting on exchange reuse;
        measured plans showed Spark does NOT dedupe those exchanges, so
        the cascade makes single-execution structural instead of
        optimizer-dependent.)
        """
        with_rules = RULEF_COL in rows.columns
        validity_aggs = [
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(~F.col("_is_valid"), 1).otherwise(0)).alias(
                "n_invalid"
            ),
        ]
        if with_rules:
            validity_aggs.append(F.sum(RULEF_COL).alias("rule_fails"))
        validity = rows.groupBy(BUCKET_COL).agg(*validity_aggs)
        raw_src = rows.select(
            F.col(RAW_PREFIX + self.conv).alias(self.conv),
            F.col(RAW_PREFIX + self.idx).alias(self.idx),
        )
        level1 = raw_src.groupBy(self.conv, self.idx).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        conv_stats = level1.groupBy(self.conv).agg(
            F.count(F.lit(1)).alias("distinct_turns"),
            F.min(self.idx).alias("min_idx"),
            F.max(self.idx).alias("max_idx"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias(
                "dup_keys"
            ),
            F.sum(
                F.greatest(F.col("cnt") - 1, F.lit(0))
            ).alias("surplus_rows"),
        )
        keyed = (
            conv_stats.select(
                F.col(self.conv),
                "dup_keys",
                "surplus_rows",
                (
                    (F.col("min_idx") == 0)
                    & (F.col("max_idx") == F.col("distinct_turns") - 1)
                ).alias("is_gapless"),
            )
            .groupBy(self.bucket_fn(F.col(self.conv), self.n_buckets).alias(BUCKET_COL))
            .agg(
                F.sum("dup_keys").alias("dup_keys"),
                F.sum("surplus_rows").alias("surplus_rows"),
                F.count(F.lit(1)).alias("n_convs"),
                F.sum(F.when(~F.col("is_gapless"), 1).otherwise(0)).alias(
                    "gappy_convs"
                ),
            )
        )
        v = validity.join(keyed, BUCKET_COL, "left").fillna(
            0, subset=["dup_keys", "surplus_rows", "gappy_convs"]
        )
        bucket_pass = (
            (F.col("n_invalid") / F.col("n_rows") <= self.max_invalid_rate)
            & (F.col("dup_keys") == 0)
            & (F.col("gappy_convs") == 0)
        )
        if with_rules:
            bucket_pass = bucket_pass & (F.col("rule_fails") == 0)
        return v.select(
            F.col(BUCKET_COL).alias("bucket"),
            "n_rows",
            "n_invalid",
            (F.col("n_invalid") / F.col("n_rows")).alias("invalid_rate"),
            *(["rule_fails"] if with_rules else []),
            "dup_keys",
            "surplus_rows",
            "n_convs",
            "gappy_convs",
            bucket_pass.alias("bucket_pass"),
        )

    def _cur_profile_from_rows(self, rows: DataFrame) -> dict:
        """Current-side drift profile from the raw copies riding the
        (persisted) row-pass output — no rescan of the input.  The
        length dimension uses the pre-computed bucket int, so the text
        itself never enters the cache."""
        from filters_spark.engine.drift import (
            cat_entry,
            len_entry,
            profile_from_entries,
        )

        entries = [
            cat_entry(c, F.col(RAW_PREFIX + c))
            for c in self.drift_cols
            if RAW_PREFIX + c in rows.columns
        ]
        if self.length_col and RAW_PREFIX + "lenbucket" in rows.columns:
            entries.append(
                len_entry(self.length_col, F.col(RAW_PREFIX + "lenbucket"))
            )
        return profile_from_entries(rows, entries)

    def drift(
        self,
        df: DataFrame,
        baseline: DataFrame,
        cur_profile: dict | None = None,
    ) -> dict:
        """All drift dimensions in ONE scan per side (dist_profile);
        KL/PSI math runs on the collected frequency dicts (tiny).
        ``cur_profile`` (from :meth:`_cur_profile_from_rows`) skips the
        current-side scan; the baseline side is scanned here — at real
        scale the baseline profile is computed once and stored."""
        cur = cur_profile or dist_profile(df, self.drift_cols, self.length_col)
        base = dist_profile(baseline, self.drift_cols, self.length_col)
        metrics: dict = {}
        failed = False
        for c in self.drift_cols:
            kl = kl_from_dicts(
                cur.get(f"cat:{c}", {}), base.get(f"cat:{c}", {})
            )
            metrics[f"kl_{c}"] = kl
            failed = failed or kl > self.kl_threshold
        if self.length_col:
            p = psi_from_dicts(
                cur.get(f"len:{self.length_col}", {}),
                base.get(f"len:{self.length_col}", {}),
            )
            metrics[f"psi_{self.length_col}_len"] = p
            failed = failed or p > self.psi_threshold
        metrics["drift_failed"] = failed
        return metrics

    # -- the job ----------------------------------------------------------

    def run(
        self,
        df: DataFrame,
        baseline: DataFrame | None = None,
        persist: bool = True,
    ) -> SuiteResult:
        """Run the whole suite.

        Raises ``ValueError`` when a configured drift/length column is
        missing from ``df`` — the raw-copy carriers silently skip absent
        columns (``row_results`` is also used verdict-only on frames
        without drift columns), and an unchecked typo would otherwise
        yield an empty current-side profile: KL ≡ 0.0, i.e. a drift
        check that silently always passes.

        ``persist=True`` caches a NARROW projection of the row-validation
        output — ``(conv, idx, bucket, _is_valid, _violations)`` only —
        so verdicts and violation reporting don't re-execute the full
        chain per action, while the wide cleaned rows stay a lazy
        projection the caller streams to its own sink.  Persisting the
        wide rows instead moves every cleaned text through the block
        manager: at bench scale that single-box cache write dominated
        wall time and capped core-scaling; on a cluster it would be a
        second full materialisation.  Call ``result.unpersist()`` when
        done.
        """
        from pyspark import StorageLevel

        missing = [c for c in self.drift_cols if c not in df.columns]
        if self.length_col and self.length_col not in df.columns:
            missing.append(self.length_col)
        if missing:
            raise ValueError(
                f"suite drift config references columns missing from the "
                f"input frame: {missing} (available: {df.columns}); pass "
                f"drift_cols=()/length_col=None to disable those checks"
            )
        rows = self.row_results(df)
        raw_cols = [c for c in rows.columns if c.startswith(RAW_PREFIX)]
        rule_cols = [RULEF_COL] if RULEF_COL in rows.columns else []
        keyed = None
        if persist:
            keyed = rows.select(
                self.conv,
                self.idx,
                BUCKET_COL,
                "_is_valid",
                "_violations",
                *rule_cols,
                *raw_cols,
            ).persist(StorageLevel.MEMORY_AND_DISK)
        agg_src = keyed if keyed is not None else rows
        verdicts = self.verdicts(df, agg_src)
        stats = column_stats(df, self.stat_columns)
        violations = (
            agg_src.select(
                self.conv,
                self.idx,
                BUCKET_COL,
                F.explode("_violations").alias("v"),
            ).select(
                self.conv,
                self.idx,
                F.col(BUCKET_COL).alias("bucket"),
                F.col("v.key").alias("key"),
                F.col("v.code").alias("code"),
                F.col("v.message").alias("message"),
            )
        )
        metrics = (
            self.drift(
                df, baseline, cur_profile=self._cur_profile_from_rows(agg_src)
            )
            if baseline is not None
            else {}
        )
        return SuiteResult(
            rows=rows.drop(*raw_cols, *rule_cols),
            verdicts=verdicts,
            stats=stats,
            violations=violations,
            metrics=metrics,
            keyed=keyed,
        )


def violations_with_values(
    violations: DataFrame,
    df: DataFrame,
    conv: str = "conv_id",
    idx: str = "turn_idx",
    columns: list[str] | None = None,
    max_chars: int = 256,
) -> DataFrame:
    """Attach the OFFENDING VALUE to each violation row (north rule:
    violation rows carry filter code, chain path, offending value).

    The violation struct itself stays narrow — ``(key, code, message)``
    — so VALID rows never ship document text through the suite's
    shuffles; the offending value is recovered after the fact by ONE
    equi-join back to the input on the row key (on an Iceberg table
    bucketed by ``conv_id`` both sides co-locate and the join is
    shuffle-light) plus a key→value map lookup that projects only the
    violating column.  Values are stringified and truncated to
    ``max_chars`` so a pathological cell cannot widen the reporting
    table.  Dotted chain paths (``FilterMapper`` sub-keys like
    ``meta.tags.0``) resolve to their top-level column's value.

    ``columns`` limits the map to the validated columns (default: every
    input column except the join keys).
    """
    if columns is None:
        columns = [c for c in df.columns if c not in (conv, idx)]
    pairs: list = []
    for c in columns:
        pairs.append(F.lit(c))
        pairs.append(F.substring(F.col(c).cast("string"), 1, max_chars))
    src = df.select(conv, idx, F.create_map(*pairs).alias("__vals"))
    top_key = F.split(F.col("key"), r"\.").getItem(0)
    return violations.join(src, [conv, idx]).select(
        *violations.columns,
        F.element_at(F.col("__vals"), top_key).alias("value"),
    )
