"""Handler surface — the Spark analogues of the reference's pluggable
invalid-value handlers (SURVEY.md §2.8).

The reference routes every invalid value through a handler object:

- ``ExceptionHandler`` raises ``FilterError`` on the first invalid value
  (``src/filters/base.py:525-537``), with the violation context attached
  (``FilterError.context``, ``base.py:510-523``);
- ``LogHandler`` sends each violation to a ``logging.Logger``
  (``src/filters/handlers.py:18-45``);
- ``MemoryHandler``/``FilterRunner`` accumulate coded messages keyed by
  dotted path and expose ``errors`` / ``error_codes`` dicts
  (``src/filters/handlers.py:216-290``).

In this engine violations are *data* (an ``array<struct<key, code,
message>>`` column produced by :func:`filters_spark.validate`), so the
handlers become small functions over that column:

- :func:`fail_fast` — abort the job on the first invalid row;
- :func:`log_violations` — stream violations into a logger;
- :func:`errors_by_key` / :func:`error_codes` — the FilterRunner
  reporting dicts, aggregated table-wide;
- :func:`errors_by_record` — the same dict shape per record, as a
  distributed DataFrame column (no driver collect).
"""

from __future__ import annotations

from logging import ERROR, Logger

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FilterError",
    "errors_by_key",
    "error_codes",
    "errors_by_record",
    "fail_fast",
    "log_violations",
]


class FilterError(ValueError):
    """A value could not be filtered because it was invalid — mirrors
    the reference ``FilterError`` (``base.py:509-523``): a ``ValueError``
    carrying a ``context`` dict for troubleshooting."""

    def __init__(self, *args) -> None:
        super().__init__(*args)
        self.context: dict = {}


def fail_fast(
    df: DataFrame,
    violations_col: str = "_violations",
    context_cols: list[str] | None = None,
) -> DataFrame:
    """ExceptionHandler semantics over a validated frame: if ANY row has
    violations, raise :class:`FilterError` carrying the first violation's
    ``{key, code, message}`` plus the identifying columns of the
    offending row; otherwise return ``df`` unchanged (so the call chains
    into a pipeline).

    "First" means the first invalid row Spark encounters — the scan
    stops early (``where(size>0).limit(1)`` plans as an incremental
    CollectLimit: Spark runs one partition, then 4, ... until a row is
    found), so a clean table costs one full scan and a dirty table
    usually costs far less.  Mirrors ``ExceptionHandler.handle_invalid_
    value`` (``base.py:525-537``) — the reference raises mid-stream on
    exactly the first invalid value of the record it is processing.

    ``context_cols`` defaults to every non-violation column of the row,
    captured into ``FilterError.context['row']``.
    """
    hit = (
        df.where(F.size(F.col(violations_col)) > 0)
        .limit(1)
        .collect()
    )
    if not hit:
        return df
    row = hit[0].asDict(recursive=True)
    viol = row[violations_col][0]
    ctx_cols = (
        context_cols
        if context_cols is not None
        else [c for c in df.columns if c != violations_col]
    )
    err = FilterError(viol["message"])
    err.context = {
        "key": viol["key"],
        "code": viol["code"],
        "message": viol["message"],
        "violations": row[violations_col],
        "row": {c: row.get(c) for c in ctx_cols},
    }
    raise err


def explode_violations(
    df: DataFrame, violations_col: str = "_violations"
) -> DataFrame:
    """Flatten the violations column: one output row per violation with
    columns ``key, code, message`` (plus all other input columns)."""
    others = [c for c in df.columns if c != violations_col]
    return df.select(
        *others, F.explode(violations_col).alias("__v")
    ).select(
        *others,
        F.col("__v.key").alias("key"),
        F.col("__v.code").alias("code"),
        F.col("__v.message").alias("message"),
    )


def errors_by_key(
    df: DataFrame,
    violations_col: str = "_violations",
    max_rows: int | None = 100_000,
) -> dict[str, list[dict[str, str]]]:
    """The FilterRunner ``errors`` dict (``handlers.py:216-245``),
    aggregated across the whole frame::

        {'text': [{'code': 'empty', 'message': '...'}, ...], ...}

    Message lists are ordered (code, message) for determinism; duplicate
    (key, code, message) triples across rows are collapsed with the
    distinct aggregation running map-side (this is a groupBy on the
    violation triple — shuffle volume is #distinct violations, not
    #rows).

    Chain messages are templated constants, so the distinct-triple
    count is normally tiny (#keys × #codes); ``max_rows`` bounds the
    driver collect anyway in case a custom ``Call``/macro interpolates
    row values into messages — truncation keeps the
    (key, code, message)-ordered prefix, deterministically.  ``None``
    disables the bound."""
    agg = (
        explode_violations(
            df.select(violations_col), violations_col
        )
        .groupBy("key", "code", "message")
        .count()
        .orderBy("key", "code", "message")
    )
    if max_rows is not None:
        agg = agg.limit(max_rows)
    rows = agg.collect()
    out: dict[str, list[dict[str, str]]] = {}
    for r in rows:
        out.setdefault(r["key"], []).append(
            {"code": r["code"], "message": r["message"]}
        )
    return out


def error_codes(
    df: DataFrame, violations_col: str = "_violations"
) -> dict[str, list[str]]:
    """The FilterRunner ``error_codes`` dict (``handlers.py:283-290``):
    key → ordered list of distinct codes."""
    return {
        k: sorted({m["code"] for m in msgs})
        for k, msgs in errors_by_key(df, violations_col).items()
    }


def errors_by_record(
    df: DataFrame,
    violations_col: str = "_violations",
    out_col: str = "_errors",
) -> DataFrame:
    """Per-record ``errors`` dict as a DataFrame column — the
    distributed form of :func:`errors_by_key` (no driver collect).

    Adds ``out_col: map<string, array<struct<code, message>>>`` keyed by
    dotted path, built with pure expressions (aggregate over the
    violations array → map), exactly the reference's per-record
    ``FilterRunner.errors`` shape."""
    v = F.col(violations_col)
    keys = F.array_distinct(F.transform(v, lambda x: x["key"]))
    entries = F.transform(
        keys,
        lambda k: F.struct(
            k.alias("key"),
            F.transform(
                F.filter(v, lambda x: x["key"] == k),
                lambda x: F.struct(
                    x["code"].alias("code"), x["message"].alias("message")
                ),
            ).alias("msgs"),
        ),
    )
    return df.withColumn(out_col, F.map_from_entries(entries))


def log_violations(
    df: DataFrame,
    logger: Logger,
    level: int = ERROR,
    violations_col: str = "_violations",
    limit: int | None = None,
) -> int:
    """LogHandler semantics (``handlers.py:18-45``): send each violation
    to ``logger`` at ``level``, with the violation context in
    ``extra={'context': ...}`` exactly like the reference.

    Streams ``toLocalIterator()`` over the exploded violations frame, so
    driver memory stays bounded at one partition regardless of violation
    count; ``limit`` caps the number of logged rows.  (At 100 TB scale
    you'd write the violations frame to a sink table instead — this is
    the reference-parity convenience for interactive use.)  Returns the
    number of violations logged.
    """
    flat = explode_violations(
        df.select(violations_col), violations_col
    )
    if limit is not None:
        flat = flat.limit(limit)
    n = 0
    for r in flat.toLocalIterator():
        logger.log(
            level,
            r["message"],
            extra={
                "context": {"key": r["key"], "code": r["code"]},
            },
        )
        n += 1
    return n
