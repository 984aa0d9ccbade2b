"""Structural combinators (``complex.py``) and projection/type specs
(``simple.py``, ``base.py:543-633``).

These map the reference's dynamic, dict-shaped records onto Spark's
static ``StructType`` / ``ArrayType`` / ``MapType`` columns:

- ``FilterMapper``  → per-field chains over struct fields; missing/extra
  key policy is *static* against the schema (``complex.py:158-344``).
- ``FilterRepeater`` → ``F.transform`` with the chain compiled as a pure
  element-level expression; per-index dotted violation keys
  (``complex.py:16-155``).
- ``FilterSwitch``  → ``CASE WHEN`` dispatch (``complex.py:347-390``).
- ``NamedTuple``    → struct with exact fields (``complex.py:393-481``).
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from filters_spark.core.arrow import scalar_kernel
from filters_spark.core.spec import (
    CODE_EXCEPTION,
    MSG_EXCEPTION,
    VIOLATION_SCHEMA,
    BaseSpec,
    CompileError,
    Step,
    Violation,
    as_chain,
    null_of,
)

CODE_MISSING_KEY = "missing"  # complex.py:172, simple.py:391
CODE_EXTRA_KEY = "unexpected"  # complex.py:27,171
CODE_WRONG_TYPE = "wrong_type"  # base.py:546

MSG_MISSING = "{key} is required."
MSG_EXTRA = 'Unexpected key "{actual_key}".'

_VIOL_ARRAY = T.ArrayType(VIOLATION_SCHEMA)


def _empty_viols() -> Column:
    return F.array().cast(_VIOL_ARRAY)


def _chain_expr(chain, value, dtype, ctx, key, allow_pre=False):
    # local import to avoid a circular module dependency
    from filters_spark.core.compiler import compile_chain_expr

    return compile_chain_expr(chain, value, dtype, ctx, key, allow_pre=allow_pre)


# -- Type / Array -----------------------------------------------------------

#: Python type → acceptable Spark types (static schema analysis)
_TYPE_MAP = {
    str: (T.StringType,),
    bytes: (T.BinaryType,),
    bytearray: (T.BinaryType,),
    bool: (T.BooleanType,),
    int: (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    float: (T.FloatType, T.DoubleType),
    decimal.Decimal: (T.DecimalType,),
    datetime.datetime: (T.TimestampType,),
    datetime.date: (T.DateType, T.TimestampType),
    list: (T.ArrayType,),
    tuple: (T.ArrayType,),
    dict: (T.MapType, T.StructType),
}


#: Spark type → the Python type a value of it arrives as (for naming the
#: incoming side of the wrong_type message)
_SPARK_TO_PY = {
    T.StringType: str,
    T.BinaryType: bytes,
    T.BooleanType: bool,
    T.ByteType: int,
    T.ShortType: int,
    T.IntegerType: int,
    T.LongType: int,
    T.FloatType: float,
    T.DoubleType: float,
    T.DecimalType: decimal.Decimal,
    T.TimestampType: datetime.datetime,
    T.DateType: datetime.date,
    T.ArrayType: list,
    T.MapType: dict,
    T.StructType: dict,
}


class Type(BaseSpec):
    """isinstance check (``base.py:543-633``).

    With a fixed table schema this is fully *static*: a mismatch is a
    compile-time error instead of a per-row violation.  (The reference's
    per-row behaviour only matters for dynamically-typed inputs, which
    don't exist in a Spark column.)
    """

    templates = {
        CODE_WRONG_TYPE: "{incoming} is not valid (allowed types: {allowed})."
    }

    def __init__(self, allowed_types, allow_subclass: bool = True,
                 aliases=None) -> None:
        if not isinstance(allowed_types, tuple):
            allowed_types = (allowed_types,)
        self.allowed_types = allowed_types
        self.allow_subclass = allow_subclass
        # base.py:564-575: type→name mapping masking Python names in the
        # wrong_type message (e.g. filters_spark.aliases.JSON_ALIASES)
        self.aliases = dict(aliases or {})

    def get_type_name(self, type_, aliased: bool = True) -> str:
        """Display name for a type, alias first (``base.py:633-660``,
        incl. the typing-generic ``_name`` dance of bpo-34422)."""
        candidates = [
            getattr(type_, "_name", None),
            getattr(type_, "__name__", None),
            str(type_),
        ]
        if aliased:
            candidates.insert(0, self.aliases.get(type_))
        return next(n for n in candidates if n)

    def get_allowed_type_names(self, aliased: bool = True) -> str:
        """Sorted, deduplicated allowed-type names (``base.py:622-631``)."""
        return ", ".join(
            sorted({self.get_type_name(t, aliased) for t in self.allowed_types})
        )

    def render_wrong_type(self, incoming: type) -> str:
        """The reference's ``wrong_type`` message, byte-identical
        (``base.py:546-551`` template + aliased names)."""
        return self.templates[CODE_WRONG_TYPE].format(
            incoming=self.get_type_name(incoming),
            allowed=self.get_allowed_type_names(),
        )

    def compile(self, value, dtype, ctx, key) -> Step:
        ok_spark: tuple = ()
        for py_t in self.allowed_types:
            ok_spark += _TYPE_MAP.get(py_t, ())
        if ok_spark and not isinstance(dtype, ok_spark):
            incoming = _SPARK_TO_PY.get(type(dtype), object)
            raise CompileError(
                f"column {key!r} has Spark type {dtype}, which cannot hold "
                f"{self.get_allowed_type_names(aliased=False)} (Type filter "
                f"would reject every row: "
                f"{self.render_wrong_type(incoming)})"
            )
        return Step(value=value, dtype=dtype)

    def __repr__(self):
        names = ", ".join(t.__name__ for t in self.allowed_types)
        return f"Type(({names}))"


class Array(Type):
    """Non-string Sequence check (``simple.py:121-146``) — static: the
    column must be an ``ArrayType``.  ``aliases=`` mirrors the
    reference's error-message type-name mapping (forwarded to
    :class:`Type`)."""

    def __init__(self, aliases=None) -> None:
        super().__init__((list, tuple), aliases=aliases)


# -- projections ------------------------------------------------------------


class Item(BaseSpec):
    """Extract one item from a struct/map/array (``simple.py:388-448``);
    default = first struct field / element 0.  Missing → ``missing``."""

    templates = {CODE_MISSING_KEY: MSG_MISSING}

    def __init__(self, key=None) -> None:
        self.item_key = key

    def compile(self, value, dtype, ctx, key) -> Step:
        if isinstance(dtype, T.StructType):
            k = self.item_key or dtype.names[0]
            if k not in dtype.names:
                return self._missing_step(value, k)
            out_t = dtype[k].dataType
            return Step(value=value[k], dtype=out_t)
        if isinstance(dtype, T.MapType):
            if self.item_key is None:
                raise CompileError("Item() on a map column requires a key")
            got = F.element_at(value, F.lit(self.item_key))
            inv = got.isNull()
            return Step(
                value=got,
                dtype=dtype.valueType,
                invalid=inv,
                violations=[
                    Violation(
                        inv,
                        F.lit(CODE_MISSING_KEY),
                        F.lit(MSG_MISSING.format(key=self.item_key)),
                    )
                ],
            )
        if isinstance(dtype, T.ArrayType):
            idx = int(self.item_key or 0)
            got = F.element_at(value, idx + 1)
            inv = F.size(value) <= idx
            return Step(
                value=got,
                dtype=dtype.elementType,
                invalid=inv,
                violations=[
                    Violation(
                        inv,
                        F.lit(CODE_MISSING_KEY),
                        F.lit(MSG_MISSING.format(key=idx)),
                    )
                ],
            )
        raise CompileError(f"Item cannot index into column type {dtype}")

    def _missing_step(self, value, k) -> Step:
        inv = F.lit(True)
        return Step(
            value=F.lit(None).cast("string"),
            dtype=T.StringType(),
            invalid=inv,
            violations=[
                Violation(
                    inv,
                    F.lit(CODE_MISSING_KEY),
                    F.lit(MSG_MISSING.format(key=k)),
                )
            ],
        )


class Pick(BaseSpec):
    """Projection copy with only ``keys`` (``simple.py:872-968``); absent
    keys become null fields; disallowed-missing keys emit per-key
    ``missing`` violations."""

    templates = {CODE_MISSING_KEY: MSG_MISSING}

    def __init__(self, keys, allow_missing_keys: bool = True) -> None:
        self.keys = list(keys)
        self.allow_missing_keys = allow_missing_keys

    def _missing_allowed(self, k) -> bool:
        if self.allow_missing_keys is True:
            return True
        if self.allow_missing_keys is False:
            return False
        return k in self.allow_missing_keys

    def compile(self, value, dtype, ctx, key) -> Step:
        if not isinstance(dtype, T.StructType):
            raise CompileError(f"Pick needs a struct column, got {dtype}")
        fields, out_fields, violations = [], [], []
        for k in self.keys:
            if k in dtype.names:
                fields.append(value[k].alias(k))
                out_fields.append(T.StructField(k, dtype[k].dataType))
            else:
                fields.append(F.lit(None).cast("string").alias(k))
                out_fields.append(T.StructField(k, T.StringType()))
                if not self._missing_allowed(k):
                    violations.append(
                        Violation(
                            F.lit(True),
                            F.lit(CODE_MISSING_KEY),
                            F.lit(MSG_MISSING.format(key=k)),
                            key_suffix=F.lit(k),
                        )
                    )
        inv = F.lit(bool(violations))
        return Step(
            value=F.struct(*fields),
            dtype=T.StructType(out_fields),
            invalid=inv if violations else None,
            violations=violations,
            keep_value_on_error=True,
        )


class Omit(BaseSpec):
    """Copy without ``keys`` (``simple.py:736-781``)."""

    def __init__(self, keys) -> None:
        self.keys = set(keys)

    def compile(self, value, dtype, ctx, key) -> Step:
        if not isinstance(dtype, T.StructType):
            raise CompileError(f"Omit needs a struct column, got {dtype}")
        keep = [f for f in dtype.fields if f.name not in self.keys]
        return Step(
            value=F.struct(*[value[f.name].alias(f.name) for f in keep]),
            dtype=T.StructType(keep),
        )


class ByteArray(BaseSpec):
    """Coerce str/bytes/int-sequence → bytes (``simple.py:149-213``).
    Int sequences must be 0..255 (nested ``Int | Min(0) | Max(255)`` in
    the reference, :195-208) — per-index violations preserved."""

    CODE_BAD_ENCODING = "bad_encoding"
    templates = {
        CODE_BAD_ENCODING: "Unable to encode this value using {encoding}."
    }

    def __init__(self, encoding: str = "utf-8") -> None:
        self.encoding = encoding

    def compile(self, value, dtype, ctx, key) -> Step:
        if isinstance(dtype, T.BinaryType):
            return Step(value=value, dtype=dtype)
        if isinstance(dtype, T.StringType):
            return Step(value=F.encode(value, self.encoding), dtype=T.BinaryType())
        if isinstance(dtype, T.ArrayType) and isinstance(
            dtype.elementType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
        ):
            viols = F.filter(
                F.transform(
                    value,
                    lambda x, i: F.when(
                        x < 0,
                        F.struct(
                            F.concat_ws(".", F.lit(key), i.cast("string")).alias("key"),
                            F.lit("too_small").alias("code"),
                            F.lit("Value is too small (must be >= 0).").alias(
                                "message"
                            ),
                        ),
                    ).when(
                        x > 255,
                        F.struct(
                            F.concat_ws(".", F.lit(key), i.cast("string")).alias("key"),
                            F.lit("too_big").alias("code"),
                            F.lit("Value is too large (must be <= 255).").alias(
                                "message"
                            ),
                        ),
                    ),
                ),
                lambda v: v.isNotNull(),
            )
            inv = F.size(viols) > 0
            name = ctx.name("kbytearray")
            pack = scalar_kernel(
                lambda xs: (bytes(int(i) for i in xs), None), T.BinaryType()
            )
            packed = F.col(name)["value"]
            return Step(
                value=F.when(inv, F.lit(None)).otherwise(packed),
                dtype=T.BinaryType(),
                invalid=inv,
                violations_array=viols,
                pre={name: pack(value)},
            )
        raise CompileError(f"ByteArray cannot coerce column type {dtype}")


class Call(BaseSpec):
    """Arbitrary-callable escape hatch (``simple.py:216-254``) — the
    custom-constraint plugin point.

    ``fn`` is a *scalar* function ``x -> cleaned`` (exceptions → invalid
    with the catch-all ``exception`` code, like the reference), executed
    inside one Arrow kernel.  Pass ``out_type`` (Spark DataType) for the
    cleaned value; defaults to the input type.
    """

    def __init__(
        self,
        fn=None,
        *args,
        out_type: T.DataType | None = None,
        callable_=None,
        **kwargs,
    ):
        # `callable_` mirrors the reference keyword (simple.py Call);
        # `fn` is the engine-native name — either works, not both
        if callable_ is not None:
            if fn is not None:
                raise TypeError("Call: pass fn or callable_, not both")
            fn = callable_
        if fn is None:
            raise TypeError("Call: a callable is required")
        self.fn = fn
        self.args = args
        self.kwargs = kwargs
        self.out_type = out_type

    def compile(self, value, dtype, ctx, key) -> Step:
        out_t = self.out_type or dtype
        fn, args, kwargs = self.fn, self.args, self.kwargs
        return _call_kernel_step(self, value, ctx, out_t, fn, args, kwargs)


def _call_kernel_step(spec, value, ctx, out_t, fn, args, kwargs) -> Step:
    name = ctx.name("kcall")
    k = scalar_kernel(lambda x: (fn(x, *args, **kwargs), None), out_t)
    res = F.col(name)
    code = res["code"]
    return Step(
        value=res["value"],
        dtype=out_t,
        invalid=code.isNotNull(),
        violations=[
            Violation(
                code == F.lit(CODE_EXCEPTION),
                F.lit(CODE_EXCEPTION),
                F.lit(MSG_EXCEPTION),
            )
        ],
        pre={name: k(value)},
    )


# -- combinators -------------------------------------------------------------


class FilterSwitch(BaseSpec):
    """Dispatch to one of several chains based on a getter over the value
    (``complex.py:347-390``).  No default → non-matching values are
    invalid with the ``Choice`` code (:377-390)."""

    templates = {"not_valid_choice": "Valid options are: {choices}"}

    def __init__(self, getter, cases: dict, default=None) -> None:
        self.getter = getter  # callable Column -> Column, or struct field name
        self.cases = dict(cases)
        self.default = default

    def compile(self, value, dtype, ctx, key) -> Step:
        disc = (
            self.getter(value)
            if callable(self.getter)
            else value[self.getter]
        )
        results = []
        out_dtype = None
        pre: dict = {}
        for case_key, chain in self.cases.items():
            r = _chain_expr(chain, value, dtype, ctx, key, allow_pre=True)
            if r.pre:
                pre.update(r.pre)
            if out_dtype is None:
                out_dtype = r.dtype
            elif str(out_dtype) != str(r.dtype):
                raise CompileError(
                    "FilterSwitch cases must produce the same output type; "
                    f"got {out_dtype} vs {r.dtype} for case {case_key!r}"
                )
            results.append((case_key, r))
        if self.default is not None:
            default_r = _chain_expr(
                self.default, value, dtype, ctx, key, allow_pre=True
            )
            if default_r.pre:
                pre.update(default_r.pre)
            default_value = default_r.value
            default_viols = default_r.violations
        else:
            choices = str(sorted(map(str, self.cases.keys())))
            default_value = null_of(out_dtype)
            default_viols = F.array(
                F.struct(
                    F.lit(key).alias("key"),
                    F.lit("not_valid_choice").alias("code"),
                    F.lit(
                        self.render("not_valid_choice", choices=choices)
                    ).alias("message"),
                )
            )
        val_expr, viol_expr = None, None
        for case_key, r in results:
            cond = disc == F.lit(case_key)
            val_expr = (
                F.when(cond, r.value)
                if val_expr is None
                else val_expr.when(cond, r.value)
            )
            viol_expr = (
                F.when(cond, r.violations)
                if viol_expr is None
                else viol_expr.when(cond, r.violations)
            )
        val_expr = val_expr.otherwise(default_value)
        viol_expr = viol_expr.otherwise(default_viols)
        return Step(
            value=val_expr,
            dtype=out_dtype,
            invalid=F.size(viol_expr) > 0,
            violations_array=viol_expr,
            pre=pre,
            keep_value_on_error=True,
        )


class FilterRepeater(BaseSpec):
    """Apply one chain to every element of an array (or every value of a
    map); invalid elements become NULL **in place** (``complex.py:113-129``);
    violation keys carry the element index / map key
    (``test/test_filter_repeater.py:44-49``).

    Compiled as ``F.transform`` with the chain in pure-expression form —
    fully JVM-side for column-expressible chains.  Chains containing
    Arrow kernels cannot run inside a lambda; use the explode path
    (``filters_spark.engine.explode_validate``) for those.
    """

    templates = {CODE_EXTRA_KEY: 'Unexpected key "{actual_key}".'}

    def __init__(self, chain=None, restrict_keys=None, filter_chain=None) -> None:
        # `filter_chain` mirrors the reference keyword (complex.py:110)
        if filter_chain is not None:
            if chain is not None:
                raise TypeError(
                    "FilterRepeater: pass chain or filter_chain, not both"
                )
            chain = filter_chain
        if chain is None:
            raise TypeError("FilterRepeater: a filter chain is required")
        self.chain = as_chain(chain)
        self.restrict_keys = set(restrict_keys) if restrict_keys else None

    def compile(self, value, dtype, ctx, key) -> Step:
        if isinstance(dtype, T.ArrayType):
            return self._compile_array(value, dtype, ctx, key)
        if isinstance(dtype, T.MapType):
            return self._compile_map(value, dtype, ctx, key)
        raise CompileError(f"FilterRepeater needs array/map, got {dtype}")

    def _compile_array(self, value, dtype, ctx, key) -> Step:
        elem_t = dtype.elementType
        chain = self.chain
        restrict = self.restrict_keys

        def per_element(x, i):
            elem_key = (
                i.cast("string")
                if key == ""
                else F.concat_ws(".", F.lit(key), i.cast("string"))
            )
            r = _chain_expr(chain, x, elem_t, ctx, elem_key)
            v, w = r.value, r.violations
            if restrict is not None:
                allowed = i.isin([int(k) for k in restrict])
                unexpected = F.array(
                    F.struct(
                        elem_key.alias("key"),
                        F.lit(CODE_EXTRA_KEY).alias("code"),
                        F.format_string(
                            'Unexpected key "%s".', i.cast("string")
                        ).alias("message"),
                    )
                )
                v = F.when(allowed, v)
                w = F.when(allowed, w).otherwise(unexpected)
            return F.struct(v.alias("v"), w.alias("w"))

        res = F.transform(value, per_element)
        values = F.transform(res, lambda s: s["v"])
        viols = F.flatten(F.transform(res, lambda s: s["w"]))
        out_t = T.ArrayType(
            _chain_expr(chain, F.lit(None).cast(elem_t), elem_t, Ctx_probe(), key).dtype
        )
        return Step(
            value=values,
            dtype=out_t,
            invalid=F.size(viols) > 0,
            violations_array=viols,
            keep_value_on_error=True,
        )

    def _compile_map(self, value, dtype, ctx, key) -> Step:
        val_t = dtype.valueType
        chain = self.chain
        restrict = self.restrict_keys

        if restrict is not None:
            # restricted map keys → 'unexpected' violation + key dropped
            # (complex.py:97-112)
            extra = F.filter(
                F.map_keys(value), lambda k: ~k.isin(list(restrict))
            )
            extra_viols = F.transform(
                extra,
                lambda k: F.struct(
                    (
                        k.cast("string")
                        if key == ""
                        else F.concat_ws(".", F.lit(key), k)
                    ).alias("key"),
                    F.lit(CODE_EXTRA_KEY).alias("code"),
                    F.format_string('Unexpected key "%s".', k).alias("message"),
                ),
            )
            value = F.map_filter(value, lambda k, v: k.isin(list(restrict)))
        else:
            extra_viols = _empty_viols()

        entries = F.map_entries(value)

        def per_entry(e):
            entry_key = (
                e["key"].cast("string")
                if key == ""
                else F.concat_ws(".", F.lit(key), e["key"])
            )
            r = _chain_expr(chain, e["value"], val_t, ctx, entry_key)
            return F.struct(
                e["key"].alias("k"), r.value.alias("v"), r.violations.alias("w")
            )

        res = F.transform(entries, per_entry)
        out_elem = _chain_expr(
            chain, F.lit(None).cast(val_t), val_t, Ctx_probe(), key
        ).dtype
        new_map = F.map_from_entries(
            F.transform(res, lambda s: F.struct(s["k"], s["v"]))
        )
        viols = F.concat(
            F.flatten(F.transform(res, lambda s: s["w"])), extra_viols
        )
        return Step(
            value=new_map,
            dtype=T.MapType(dtype.keyType, out_elem),
            invalid=F.size(viols) > 0,
            violations_array=viols,
            keep_value_on_error=True,
        )


def Ctx_probe():
    """Throwaway Ctx for dtype probing (names are never materialised)."""
    from filters_spark.core.spec import Ctx

    return Ctx(prefix="__probe")


class FilterMapper(BaseSpec):
    """Per-key chains over a struct (``complex.py:158-344``).

    Missing/extra-key policy is *static* against the struct schema:

    - missing key, allowed → chain applied to NULL (:263-265);
    - missing key, disallowed → ``missing`` violation, field NULL (:267-273);
    - extra field, allowed → passed through (output order: filter_map
      order first, then extras sorted, :259,275-279);
    - extra field, disallowed → ``unexpected`` violation, field dropped
      (:279-296).

    Violation keys are dotted paths (``test/test_filter_mapper.py:541-542``).
    """

    templates = {CODE_MISSING_KEY: MSG_MISSING, CODE_EXTRA_KEY: MSG_EXTRA}

    def __init__(
        self,
        filter_map: dict,
        allow_missing_keys=True,
        allow_extra_keys=True,
    ) -> None:
        self.filter_map = dict(filter_map)
        self.allow_missing_keys = allow_missing_keys
        self.allow_extra_keys = allow_extra_keys

    def _allowed(self, policy, k) -> bool:
        if policy is True:
            return True
        if policy is False:
            return False
        return k in policy

    def compile(self, value, dtype, ctx, key) -> Step:
        if not isinstance(dtype, T.StructType):
            raise CompileError(f"FilterMapper needs a struct column, got {dtype}")
        out_fields: list[T.StructField] = []
        out_cols: list[Column] = []
        viol_arrays: list[Column] = []
        pre: dict = {}

        for k, chain in self.filter_map.items():
            sub_key = f"{key}.{k}" if key else k
            if k in dtype.names:
                field_t = dtype[k].dataType
                field_v = value[k]
            else:
                if not self._allowed(self.allow_missing_keys, k):
                    viol_arrays.append(
                        F.array(
                            F.struct(
                                F.lit(sub_key).alias("key"),
                                F.lit(CODE_MISSING_KEY).alias("code"),
                                F.lit(MSG_MISSING.format(key=sub_key)).alias(
                                    "message"
                                ),
                            )
                        )
                    )
                    out_cols.append(F.lit(None).cast("string").alias(k))
                    out_fields.append(T.StructField(k, T.StringType()))
                    continue
                # allowed-missing: run the chain on NULL so Required fires
                field_t = T.StringType()
                field_v = F.lit(None).cast("string")
            if chain is None:
                # presence-checked pass-through (complex.py:223-236)
                out_cols.append(field_v.alias(k))
                out_fields.append(T.StructField(k, field_t))
                continue
            r = _chain_expr(chain, field_v, field_t, ctx, sub_key, allow_pre=True)
            if r.pre:
                pre.update(r.pre)
            out_cols.append(r.value.alias(k))
            out_fields.append(T.StructField(k, r.dtype))
            viol_arrays.append(r.violations)

        extras = [n for n in dtype.names if n not in self.filter_map]
        for k in sorted(extras):
            sub_key = f"{key}.{k}" if key else k
            if self._allowed(self.allow_extra_keys, k):
                out_cols.append(value[k].alias(k))
                out_fields.append(T.StructField(k, dtype[k].dataType))
            else:
                viol_arrays.append(
                    F.array(
                        F.struct(
                            F.lit(sub_key).alias("key"),
                            F.lit(CODE_EXTRA_KEY).alias("code"),
                            F.lit(MSG_EXTRA.format(actual_key=k)).alias(
                                "message"
                            ),
                        )
                    )
                )

        viols = (
            F.concat(*viol_arrays) if viol_arrays else _empty_viols()
        )
        return Step(
            value=F.struct(*out_cols),
            dtype=T.StructType(out_fields),
            invalid=F.size(viols) > 0,
            violations_array=viols,
            pre=pre,
            keep_value_on_error=True,
        )


class NamedTuple(BaseSpec):
    """Coerce a struct to an exact field set, then optionally apply a
    ``FilterMapper`` (``complex.py:393-481``).  Field-set exactness is
    static here."""

    def __init__(
        self,
        type_or_fields=None,
        filter_map: dict | None = None,
        type_=None,
    ) -> None:
        # `type_` mirrors the reference keyword (complex.py NamedTuple)
        if type_ is not None:
            if type_or_fields is not None:
                raise TypeError(
                    "NamedTuple: pass type_or_fields or type_, not both"
                )
            type_or_fields = type_
        if type_or_fields is None:
            raise TypeError("NamedTuple: a namedtuple type or field list "
                            "is required")
        if hasattr(type_or_fields, "_fields"):
            self.fields = list(type_or_fields._fields)
        else:
            self.fields = list(type_or_fields)
        self.filter_map = filter_map

    def compile(self, value, dtype, ctx, key) -> Step:
        if not isinstance(dtype, T.StructType):
            raise CompileError(f"NamedTuple needs a struct column, got {dtype}")
        if set(dtype.names) != set(self.fields):
            raise CompileError(
                f"NamedTuple fields {self.fields} != struct fields "
                f"{list(dtype.names)} (exact keys required, complex.py:443-457)"
            )
        ordered = F.struct(*[value[f].alias(f) for f in self.fields])
        ordered_t = T.StructType(
            [T.StructField(f, dtype[f].dataType) for f in self.fields]
        )
        if self.filter_map is None:
            return Step(value=ordered, dtype=ordered_t)
        mapper = FilterMapper(self.filter_map)
        return mapper.compile(ordered, ordered_t, ctx, key)
