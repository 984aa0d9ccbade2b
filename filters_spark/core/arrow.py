"""Arrow pandas-kernel plumbing — the fenced "Python-only" path.

A handful of reference semantics have no JVM equivalent (NFC
normalisation, ``str.casefold``, codepoint-safe byte truncation, TOML,
``dateutil`` fuzzy parsing, IPv6 canonicalisation — see SURVEY.md §4.3).
Those compile to **one Arrow-batched pandas UDF per step** returning a
``struct<value, code>``; everything else stays in whole-stage codegen.

Never row-at-a-time Python UDFs: all kernels are ``pandas_udf`` (Arrow
batch transfer), and the compiler materialises each kernel call once per
chain so it is evaluated exactly once per batch.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from filters_spark.core.spec import CODE_EXCEPTION


def kernel_schema(value_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("value", value_type),
            T.StructField("code", T.StringType()),
        ]
    )


def _is_null(x) -> bool:
    if x is None:
        return True
    try:
        return bool(pd.isna(x))
    except (TypeError, ValueError):
        return False


def elementwise(f: Callable):
    """Lift a scalar function ``x -> (value, code|None)`` into a batch
    function ``pd.Series -> pd.DataFrame{value, code}``.

    Nulls skip the function entirely (the None-passes rule,
    ``base.py:226-233``); exceptions become the ``exception`` code
    (``base.py:71-73`` catch-all).
    """

    def run(s: pd.Series) -> pd.DataFrame:
        vals, codes = [], []
        append_v, append_c = vals.append, codes.append
        for x in s:
            if _is_null(x):
                append_v(None)
                append_c(None)
                continue
            try:
                v, c = f(x)
            except Exception:  # noqa: BLE001 — mirrors apply()'s catch-all
                v, c = None, CODE_EXCEPTION
            append_v(v)
            append_c(c)
        return pd.DataFrame({"value": vals, "code": codes})

    return run


def make_struct_kernel(
    batch_fn: Callable[[pd.Series], pd.DataFrame],
    value_type: T.DataType,
) -> Callable[[Column], Column]:
    """Wrap a batch function into a pandas_udf producing
    ``struct<value, code>``."""
    schema = kernel_schema(value_type)

    @pandas_udf(schema)
    def k(s: pd.Series) -> pd.DataFrame:
        out = batch_fn(s)
        return out

    return k


def scalar_kernel(
    f: Callable, value_type: T.DataType
) -> Callable[[Column], Column]:
    """Shorthand: elementwise scalar fn → struct kernel."""
    return make_struct_kernel(elementwise(f), value_type)
