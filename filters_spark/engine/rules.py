"""Declarative table-level constraint rules.

The reference library validates one VALUE at a time through a filter
chain (``src/filters/base.py`` FilterChain); the north rule's engine
also needs TABLE-level invariants that no per-column chain can express
— cross-field conditions ("tool is only set on assistant turns"),
business bounds ("totalprice under the contract cap"), shape contracts
("clerk ids match 'Clerk#%'").  This module is the declarative home for
those: a rule is just a named boolean SQL expression / Column, and the
engine evaluates EVERY rule in ONE pass over the corpus.

Null semantics are explicit because they are where CHECK-style systems
disagree: ``null_fails=True`` (default) treats a NULL predicate as a
violation (strict validation — an unknown is not evidence of
compliance); ``null_fails=False`` gives ANSI SQL ``CHECK`` semantics
(NULL passes).

Scale shape:

- :func:`rule_summary` — ALL rules in ONE hash-free global aggregation
  (one conditional sum per rule inside a single Aggregate node,
  map-side partial aggregation, whole-stage codegen); the per-rule
  long-form output is an explode of the single aggregated row, so the
  shuffle carries exactly one row however many rules and input rows.
- :func:`rule_violations` — the reporting path: one projection builds a
  per-row array of failed-rule structs, ``filter`` + ``explode`` emit
  one row per (row, failed rule).  Output volume is bounded by the
  violation count, never the rule count × corpus; a fully-clean corpus
  emits nothing (the explode of an empty array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pred(expr: str | Column) -> Column:
    return F.expr(expr) if isinstance(expr, str) else expr


def _fail(pred: Column, null_fails: bool) -> Column:
    if null_fails:
        return ~F.coalesce(pred, F.lit(False))
    return F.coalesce(~pred, F.lit(False))


def rule_summary(
    df: DataFrame,
    rules: dict[str, str | Column],
    null_fails: bool = True,
) -> DataFrame:
    """Evaluate every rule over the whole frame in ONE aggregation.

    Returns one row per rule: ``(rule, n_rows, n_fail, fail_rate, ok)``,
    ordered by rule name via the output's deterministic construction
    (the consumer sorts; no order is promised).  ``ok`` is
    ``n_fail == 0`` — the per-rule verdict a suite gate consumes.

    ``rules`` maps rule name → boolean predicate (SQL string or
    Column).  All predicates are evaluated in the same projection, so a
    10-rule summary costs one corpus scan, not ten.
    """
    if not rules:
        raise ValueError("rule_summary needs at least one rule")
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, name in enumerate(names):
        fail = _fail(_pred(rules[name]), null_fails)
        aggs.append(
            # coalesce: sum over an empty frame is NULL, not 0
            F.coalesce(F.sum(fail.cast("long")), F.lit(0)).alias(f"__f{i}")
        )
    one = df.agg(*aggs)
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("__n").alias("n_rows"),
            F.col(f"__f{i}").alias("n_fail"),
        )
        for i, name in enumerate(names)
    ]
    return one.select(F.explode(F.array(*entries)).alias("e")).select(
        F.col("e.rule").alias("rule"),
        F.col("e.n_rows").alias("n_rows"),
        F.col("e.n_fail").alias("n_fail"),
        F.when(F.col("e.n_rows") > 0, F.col("e.n_fail") / F.col("e.n_rows"))
        .otherwise(F.lit(0.0))
        .alias("fail_rate"),
        (F.col("e.n_fail") == 0).alias("ok"),
    )


def rule_violations(
    df: DataFrame,
    rules: dict[str, str | Column],
    keys: str | list[str],
    capture: dict[str, str | Column] | None = None,
    null_fails: bool = True,
) -> DataFrame:
    """Structured violation rows for every (row, failed rule) pair.

    Returns ``(*keys, rule, value)`` — the north-rule reporting shape
    (identifying keys, the violated constraint's code, the offending
    value).  ``capture`` maps rule name → the expression whose
    string-rendered value should be reported for that rule (e.g. the
    column the rule constrains); rules without a capture entry report a
    NULL value.  Key columns ride through untouched, so downstream can
    join any further context back.

    Scale shape: one projection computes every predicate, an array of
    per-rule structs is ``filter``-ed to the failed ones and exploded —
    whole-stage codegen end to end, output bounded by violations.
    """
    if not rules:
        raise ValueError("rule_violations needs at least one rule")
    key_cols = [keys] if isinstance(keys, str) else list(keys)
    capture = capture or {}
    entries = []
    for name, expr in rules.items():
        fail = _fail(_pred(expr), null_fails)
        cap = capture.get(name)
        value = (
            _pred(cap).cast("string") if cap is not None
            else F.lit(None).cast("string")
        )
        entries.append(
            F.when(
                fail,
                F.struct(
                    F.lit(name).alias("rule"), value.alias("value")
                ),
            )
        )
    failed = F.filter(
        F.array(*entries), lambda x: x.isNotNull()
    )
    return df.select(
        *key_cols, F.explode(failed).alias("__v")
    ).select(
        *key_cols,
        F.col("__v.rule").alias("rule"),
        F.col("__v.value").alias("value"),
    )


def fd_violations(
    df: DataFrame,
    determinant: str | list[str],
    dependent: str,
) -> DataFrame:
    """Functional-dependency check: every group of rows sharing the
    ``determinant`` key(s) must agree on ``dependent`` (the classic
    "conv_id determines user", "order determines customer" contract —
    a referential invariant :func:`~filters_spark.engine.orphans` and
    gaplessness don't cover).  Returns one row per VIOLATING key:
    ``(*determinant, n_rows, n_values, v_min, v_max)`` where
    ``n_values`` is the number of distinct dependent values observed
    (> 1 by construction) and ``v_min`` / ``v_max`` are the extreme
    offending values (string-rendered) so the report shows WHAT
    disagreed without shipping the group.

    NULL dependents count as the distinct value ``'__null__'`` — a key
    mapping to {x, NULL} is a real disagreement, and two engines fold
    it identically.

    Scale shape: ONE hash aggregation keyed by the determinant
    (map-side combine; composes with AQE skew splitting for hot keys),
    then a filter on the aggregated table.  No window, no join, no
    driver action.
    """
    det = [determinant] if isinstance(determinant, str) else list(determinant)
    v = F.coalesce(F.col(dependent).cast("string"), F.lit("__null__"))
    return (
        df.select(*det, v.alias("__v"))
        .groupBy(*det)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("__v")).alias("n_values"),
            F.min("__v").alias("v_min"),
            F.max("__v").alias("v_max"),
        )
        .where(F.col("n_values") > 1)
    )
