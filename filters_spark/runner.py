"""Drop-in scalar façade: ``FilterRunner`` / ``FilterMessage``.

The reference's most-used entry point is the Django-forms-style
``FilterRunner(chain, value)`` over ONE value
(``src/filters/handlers.py:155-346``).  This module reproduces that API
on top of the compiled engine so reference scripts port verbatim::

    runner = filters_spark.FilterRunner(fs.Required() | fs.Unicode(), "x")
    runner.is_valid()      # True
    runner.cleaned_data    # "x"
    runner.errors          # {} / {"": [{"code": ..., "message": ...}]}

Each ``full_clean`` runs the chain through a real 1-row DataFrame on the
active SparkSession — exactly the production code path, with Spark
round-trip latency (~100 ms).  It exists for porting, testing, and
interactive use; table-scale work goes through
:func:`filters_spark.validate` directly.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from filters_spark.core.compiler import attach_chain
from filters_spark.core.spec import as_chain

__all__ = [
    "BaseInvalidValueHandler",
    "ExceptionHandler",
    "FilterMessage",
    "FilterRunner",
    "LogHandler",
    "MemoryHandler",
    "scalar_apply",
]


@dataclass
class FilterMessage:
    """One coded validation message — mirrors the reference
    ``FilterMessage`` (``handlers.py:48-97``)."""

    code: str
    message: str
    context: dict = field(default_factory=dict)

    def as_dict(self, with_context: bool = False) -> dict:
        out = {"code": self.code, "message": self.message}
        if with_context:
            out["context"] = dict(self.context)
        return out

    def __str__(self) -> str:  # handlers.py:86-88
        return self.message


class BaseInvalidValueHandler:
    """Scalar-facade handler base — reference ``base.py:479-507``.

    The columnar engine models violations as DATA (DEVIATIONS #14);
    these classes exist so reference code that instantiates/attaches
    handler objects (``chain.set_handler(MemoryHandler())``,
    ``Unicode().apply(value)``) ports verbatim through the scalar
    facade."""

    def handle_invalid_value(self, message, exc_info, context):
        raise NotImplementedError(
            f"Not implemented in {type(self).__name__}."
        )

    def handle_exception(self, message, exc):
        """Reference ``base.py:501-507``."""
        return self.handle_invalid_value(
            message=message,
            exc_info=True,
            context=getattr(exc, "context", {}),
        )


class ExceptionHandler(BaseInvalidValueHandler):
    """Raises ``FilterError`` — reference ``base.py:526-537``; the
    default handler for ``spec.apply(value)``."""

    def handle_invalid_value(self, message, exc_info, context):
        from filters_spark.engine.handlers import FilterError

        error = FilterError(message)
        error.context = context
        raise error


class LogHandler(BaseInvalidValueHandler):
    """Sends invalid-value details to a logger — reference
    ``handlers.py:18-45``."""

    def __init__(self, logger, level: int | None = None) -> None:
        import logging

        self.logger = logger
        self.level = logging.ERROR if level is None else level

    def handle_invalid_value(self, message, exc_info, context):
        self.logger.log(
            level=self.level,
            msg=message,
            exc_info=exc_info,
            extra={"context": context},
        )


class MemoryHandler(BaseInvalidValueHandler):
    """Stores messages locally — reference ``handlers.py:100-152``.

    ``capture_exc_info`` is accepted for parity; the columnar engine
    rejects mis-typed chains at compile time, so there is no runtime
    filter exception stream to capture (DEVIATIONS #11) —
    ``has_exceptions`` only becomes true via an explicit
    ``handle_exception`` call."""

    def __init__(self, capture_exc_info: bool = False) -> None:
        self.messages: dict[str, list[FilterMessage]] = {}
        self.has_exceptions = False
        self.capture_exc_info = capture_exc_info
        self.exc_info: list = []

    def handle_invalid_value(self, message, exc_info, context):
        key = context.get("key", "")
        self.messages.setdefault(key, []).append(
            FilterMessage(
                code=context.get("code") or message,
                message=message,
                context=dict(context),
            )
        )

    def handle_exception(self, message, exc):
        import sys

        self.has_exceptions = True
        if self.capture_exc_info:
            self.exc_info.append(sys.exc_info())
        return super().handle_exception(message, exc)


def scalar_apply(spec, value, handler=None):
    """Reference ``BaseFilter.apply`` semantics (``base.py:226-249``)
    over the compiled engine: return the cleaned value, or hand each
    violation to ``handler`` (default :class:`ExceptionHandler`, which
    raises ``FilterError`` on the first) and return the handler's
    result.

    Limitation: the input column type is inferred from ``value``
    (strings for ``None``), so ``Min(0).apply(None)`` on a numeric
    chain needs ``FilterRunner(chain, None, dtype=...)`` instead — the
    ``CompileError`` message says so."""
    runner = FilterRunner(spec, value)
    messages = runner.filter_messages
    if not messages:
        return runner.cleaned_data
    h = handler if handler is not None else ExceptionHandler()
    result = None
    for key, msgs in messages.items():
        for m in msgs:
            context = dict(m.context)
            context.setdefault("code", m.code)
            context.setdefault("key", key)
            result = h.handle_invalid_value(
                message=m.message, exc_info=False, context=context
            )
    return result


_PY_TO_SPARK = [
    (bool, T.BooleanType()),
    (int, T.LongType()),
    (float, T.DoubleType()),
    (_decimal.Decimal, T.DecimalType(38, 18)),
    (str, T.StringType()),
    ((bytes, bytearray), T.BinaryType()),
    (_dt.datetime, T.TimestampType()),
    (_dt.date, T.DateType()),
]


def _spark_type(value) -> T.DataType:
    for py_t, spark_t in _PY_TO_SPARK:
        if isinstance(value, py_t):
            return spark_t
    if isinstance(value, (list, tuple)):
        elem = next((x for x in value if x is not None), None)
        return T.ArrayType(
            _spark_type(elem) if elem is not None else T.StringType()
        )
    if isinstance(value, dict):
        return T.StructType(
            [T.StructField(str(k), _spark_type(v)) for k, v in value.items()]
        )
    return T.StringType()  # None / unknown: chains treat null as null-pass


class FilterRunner:
    """Scalar validation façade with the reference API surface
    (``handlers.py:155-346``): ``is_valid()``, ``cleaned_data``,
    ``errors``, ``error_codes``, ``filter_messages``, ``apply()``.

    ``dtype`` (Spark DataType or DDL string) overrides the inferred
    column type — needed when ``data`` is ``None`` and the chain is not
    string-typed.

    ``capture_exc_info`` matches the reference's third positional
    parameter (``handlers.py:166``) so ported call sites don't
    ``TypeError``; it is a documented no-op (DEVIATIONS #11: the
    columnar engine rejects mis-typed chains at COMPILE time, so no
    runtime filter exception stream exists to capture).
    ``has_exceptions`` is accordingly always ``False`` and ``exc_info``
    always empty.
    """

    def __init__(self, starting_filter, incoming_data=None,
                 capture_exc_info: bool = False, *, dtype=None,
                 spark: SparkSession | None = None) -> None:
        self.filter_chain = as_chain(starting_filter)
        self.data = incoming_data
        self.capture_exc_info = capture_exc_info  # accepted for parity; no-op
        self._dtype = dtype
        self._spark = spark
        self._result = None  # (cleaned, messages)

    def __str__(self) -> str:
        return repr(self.filter_chain)

    def apply(self, incoming_data) -> None:
        """Rerun the chain against a new value (``handlers.py:193-202``)."""
        self.data = incoming_data
        self._result = None

    # -- execution -----------------------------------------------------------

    def full_clean(self) -> None:
        if self._result is not None:
            return
        spark = self._spark or SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                "FilterRunner needs an active SparkSession (create one, or "
                "pass spark=...)"
            )
        dtype = self._dtype
        if dtype is None:
            dtype = _spark_type(self.data)
        elif isinstance(dtype, str):
            dtype = T._parse_datatype_string(dtype)
        df = spark.createDataFrame(
            [(self.data,)], T.StructType([T.StructField("v", dtype)])
        )
        out, val_col, viol_col = attach_chain(df, "v", self.filter_chain, key="")
        row = out.select(val_col, viol_col).first()
        cleaned = row[val_col]
        messages: dict[str, list[FilterMessage]] = {}
        for x in row[viol_col]:
            messages.setdefault(x["key"], []).append(
                FilterMessage(code=x["code"], message=x["message"])
            )
        self._result = (cleaned, messages)

    # -- reference API surface ----------------------------------------------

    @property
    def cleaned_data(self):
        self.full_clean()
        return self._result[0]

    @property
    def filter_messages(self) -> dict[str, list[FilterMessage]]:
        self.full_clean()
        return self._result[1]

    def get_errors(self, with_context: bool = False) -> dict:
        return {
            key: [m.as_dict(with_context) for m in msgs]
            for key, msgs in self.filter_messages.items()
        }

    @property
    def errors(self) -> dict:
        return self.get_errors()

    @property
    def error_codes(self) -> dict[str, list[str]]:
        return {
            key: [m.code for m in msgs]
            for key, msgs in self.filter_messages.items()
        }

    def is_valid(self) -> bool:
        return not self.filter_messages

    @property
    def has_exceptions(self) -> bool:
        """Always ``False`` — see ``capture_exc_info`` above."""
        return False

    @property
    def exc_info(self) -> list:
        """Always empty — see ``capture_exc_info`` above."""
        return []
