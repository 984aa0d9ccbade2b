"""filters_spark — a from-scratch, PySpark-native validation engine.

Re-expresses the semantics of the ``phx-filters`` reference library
(todofixthis/filters) as vectorized Spark column kernels: each pipe-chained
filter chain (``Required() | Unicode() | MaxLength(500)``) compiles to a DAG
of Spark ``Column`` expressions plus (where Python semantics demand it)
Arrow-batched pandas kernels, evaluated in a single per-partition pass.

This is NOT a port: the reference is a scalar-at-a-time interpreted pipeline
(``/root/reference/src/filters/base.py:226-233``); this engine is
DataFrame-native and columnar.  Reference citations in docstrings are
``file:line`` into ``/root/reference/``.

Public surface mirrors the reference export list
(``src/filters/__init__.py:4-68``) plus the table-level validation engine
(stats / uniqueness / referential / drift) that the reference lacks.
"""

from filters_spark.core.spec import (
    BaseSpec,
    Chain,
    CompileError,
    Ctx,
    FilterCompatible,
    Step,
)
from filters_spark.core.compiler import attach_chain, compile_chain_expr, validate
from filters_spark.operators.presence import Empty, NoOp, NotEmpty, Optional, Required
from filters_spark.operators.lengths import Len, Length, MaxLength, MinLength
from filters_spark.operators.numbers import Decimal, Int, Max, Min, Round
from filters_spark.operators.strings import (
    Base64Decode,
    ByteString,
    CaseFold,
    Choice,
    IpAddress,
    JsonDecode,
    MaxBytes,
    MaxChars,
    Regex,
    Split,
    Strip,
    TomlDecode,
    Unicode,
    Uuid,
)
from filters_spark.operators.temporal import Date, Datetime
from filters_spark.operators.structural import (
    Array,
    ByteArray,
    Call,
    FilterMapper,
    FilterRepeater,
    FilterSwitch,
    Item,
    NamedTuple,
    Omit,
    Pick,
    Type,
)
from filters_spark.operators.macros import (
    FilterExtensionRegistry,
    FilterMacroType,
    filter_macro,
)
from filters_spark.engine.handlers import (
    FilterError,
    error_codes,
    errors_by_key,
    errors_by_record,
    fail_fast,
    log_violations,
)

from filters_spark.runner import (
    BaseInvalidValueHandler,
    ExceptionHandler,
    FilterMessage,
    FilterRunner,
    LogHandler,
    MemoryHandler,
)

#: Ready extension-registry instance, mirroring the reference's exported
#: ``ext`` namespace object (``src/filters/__init__.py:67``).
ext = FilterExtensionRegistry()

#: Reference-name aliases for drop-in ports (semantics match exactly:
#: chains are immutable pipe-composed specs, the metaclass lets classes
#: start chains).  The handler OBJECT hierarchy is reproduced for the
#: scalar ``spec.apply(value)`` facade; table-scale runs keep
#: violations as data — see DEVIATIONS.md #14.
FilterChain = Chain
BaseFilter = BaseSpec
from filters_spark.core.spec import SpecMeta as FilterMeta  # noqa: E402

__version__ = "0.3.0"

# Error-code CLASS attributes, mirrored from the reference so ported
# suites can write ``fs.Max.CODE_TOO_BIG`` etc.  Source of truth:
# src/filters/{base.py:546, complex.py:27,171-172, number.py:18-19,
# 116,148,207, simple.py:152,260,348,373,391,471-472,558-559,603,645,
# 702,877, string.py:41,140,199,276,312,521,611,786,817,983-984}.
# The string values are the codes the compiled chains already emit.
_REFERENCE_CODES: dict[str, dict[str, str]] = {
    "Type": {"CODE_WRONG_TYPE": "wrong_type"},
    "FilterRepeater": {"CODE_EXTRA_KEY": "unexpected"},
    "FilterMapper": {"CODE_EXTRA_KEY": "unexpected", "CODE_MISSING_KEY": "missing"},
    "Decimal": {"CODE_INVALID": "not_numeric", "CODE_NON_FINITE": "not_finite"},
    "Int": {"CODE_DECIMAL": "not_int", "CODE_INVALID": "not_numeric",
            "CODE_NON_FINITE": "not_finite"},
    "Max": {"CODE_TOO_BIG": "too_big"},
    "Min": {"CODE_TOO_SMALL": "too_small"},
    "ByteArray": {"CODE_BAD_ENCODING": "bad_encoding"},
    "Datetime": {"CODE_INVALID": "not_datetime"},
    "Date": {"CODE_INVALID": "not_date"},
    "Empty": {"CODE_NOT_EMPTY": "not_empty"},
    "Item": {"CODE_MISSING_KEY": "missing"},
    "Len": {"CODE_TOO_LONG": "too_long", "CODE_TOO_SHORT": "too_short"},
    "Length": {"CODE_TOO_LONG": "too_long", "CODE_TOO_SHORT": "too_short"},
    "MaxLength": {"CODE_TOO_LONG": "too_long"},
    "MinLength": {"CODE_TOO_SHORT": "too_short"},
    "NotEmpty": {"CODE_EMPTY": "empty"},
    "Required": {"CODE_EMPTY": "empty"},
    "Pick": {"CODE_MISSING_KEY": "missing"},
    "Base64Decode": {"CODE_INVALID": "not_base64"},
    "Choice": {"CODE_INVALID": "not_valid_choice"},
    "IpAddress": {"CODE_INVALID": "not_ip_address"},
    "JsonDecode": {"CODE_INVALID": "not_json"},
    "MaxBytes": {"CODE_TOO_LONG": "too_long"},
    "MaxChars": {"CODE_TOO_LONG": "too_long"},
    "Regex": {"CODE_INVALID": "malformed"},
    "TomlDecode": {"CODE_INVALID": "not_toml"},
    "Unicode": {"CODE_DECODE_ERROR": "wrong_encoding"},
    "Uuid": {"CODE_INVALID": "not_uuid", "CODE_WRONG_VERSION": "wrong_version"},
}
for _cls_name, _codes in _REFERENCE_CODES.items():
    for _attr, _code in _codes.items():
        setattr(globals()[_cls_name], _attr, _code)
del _cls_name, _codes, _attr, _code
# Inherited by every filter class, as on the reference's BaseFilter
# (base.py:69).
BaseSpec.CODE_EXCEPTION = "exception"

__all__ = [
    "Array", "Base64Decode", "BaseSpec", "ByteArray", "ByteString", "Call",
    "CaseFold", "Chain", "Choice", "CompileError", "Ctx", "Date", "Datetime",
    "BaseFilter", "BaseInvalidValueHandler", "Decimal", "Empty",
    "ExceptionHandler", "FilterChain", "FilterCompatible", "FilterError",
    "FilterExtensionRegistry", "FilterMacroType", "FilterMessage",
    "FilterMeta", "FilterRunner", "LogHandler", "MemoryHandler",
    "FilterMapper", "FilterRepeater", "FilterSwitch", "Int", "IpAddress",
    "Item", "JsonDecode", "Len", "Length", "Max", "MaxBytes", "MaxChars",
    "MaxLength", "Min", "MinLength", "NamedTuple", "NoOp", "NotEmpty",
    "Omit", "Optional", "Pick", "Regex", "Required", "Round", "Split",
    "Step", "Strip", "TomlDecode", "Type", "Unicode", "Uuid",
    "attach_chain", "compile_chain_expr", "error_codes", "errors_by_key",
    "errors_by_record", "ext", "fail_fast", "filter_macro",
    "log_violations", "validate",
]
