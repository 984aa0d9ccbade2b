"""Presence / emptiness specs — the "Required" family.

"Empty" means ``len(value) == 0``; values without a length are never empty
(``False`` and ``0`` are NOT empty) — reference ``simple.py:365-385,
690-733``.  ``Required`` is the only filter that rejects ``None`` by
default (``simple.py:971-984``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from filters_spark.core.spec import BaseSpec, Step, Violation, length_of


class NoOp(BaseSpec):
    """Identity placeholder (``simple.py:681-687``)."""

    def compile(self, value, dtype, ctx, key) -> Step:
        return Step(value=value, dtype=dtype)


class NotEmpty(BaseSpec):
    """Reject zero-length values; ``None`` passes unless
    ``allow_none=False`` (``simple.py:690-733``)."""

    CODE_EMPTY = "empty"
    templates = {CODE_EMPTY: "Non-empty value expected."}

    def __init__(self, allow_none: bool = True) -> None:
        self.allow_none = allow_none

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = length_of(value, dtype)
        empty = (ln == 0) if ln is not None else F.lit(False)
        if self.allow_none:
            inv = value.isNotNull() & empty
            handles_null = False
        else:
            inv = value.isNull() | empty
            handles_null = True
        msg = F.lit(self.render(self.CODE_EMPTY))
        return Step(
            value=value,
            dtype=dtype,
            invalid=inv,
            violations=[Violation(inv, F.lit(self.CODE_EMPTY), msg)],
            handles_null=handles_null,
        )

    def __repr__(self):
        return f"{type(self).__name__}(allow_none={self.allow_none!r})"


class Required(NotEmpty):
    """``NotEmpty`` with ``allow_none`` hard-wired to ``False`` — the only
    exception to the None-passes rule (``simple.py:971-984``)."""

    templates = {NotEmpty.CODE_EMPTY: "This value is required."}

    def __init__(self) -> None:
        super().__init__(allow_none=False)

    def __repr__(self):
        return "Required()"


class Empty(BaseSpec):
    """Require a zero-length value; values without a length are "not
    empty" and therefore invalid (``simple.py:365-385``)."""

    CODE_NOT_EMPTY = "not_empty"
    templates = {CODE_NOT_EMPTY: "Empty value expected."}

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = length_of(value, dtype)
        inv = (ln > 0) if ln is not None else F.lit(True)
        msg = F.lit(self.render(self.CODE_NOT_EMPTY))
        return Step(
            value=value,
            dtype=dtype,
            invalid=inv,
            violations=[Violation(inv, F.lit(self.CODE_NOT_EMPTY), msg)],
        )


class Optional(BaseSpec):
    """Replace empty / null values with a default (``simple.py:784-869``).

    ``call_default=True`` (the reference's per-value factory mode,
    ``simple.py:824-838``) is honoured by calling the factory ONCE at
    config time: the reference calls it per value solely to avoid
    sharing one mutable default object (a fresh ``dict()``/``list()``
    each time), a hazard that cannot exist for immutable column values —
    so one call is semantically equivalent.  Factories with per-call
    side effects or varying output would be nondeterministic across
    executors and are therefore deliberately collapsed to their
    config-time result (use ``Call`` for genuinely computed values).
    """

    def __init__(self, default=None, call_default: bool | None = None) -> None:
        # reference semantics: call_default=None -> auto (call when the
        # default is callable); True -> must be callable; False -> never
        if call_default and not callable(default):
            raise TypeError(
                "Optional: call_default=True requires a callable default"
            )
        if call_default is False and callable(default):
            # the reference would use the FUNCTION OBJECT itself as the
            # replacement value — not representable in a typed column
            raise TypeError(
                "Optional: a callable default with call_default=False has"
                " no columnar representation; drop call_default or pass a"
                " literal"
            )
        if (call_default is None and callable(default)) or call_default:
            default = default()
        self.default = default

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = length_of(value, dtype)
        empty = value.isNull() | (ln == 0) if ln is not None else value.isNull()
        new_value = F.when(empty, F.lit(self.default).cast(dtype)).otherwise(value)
        return Step(value=new_value, dtype=dtype, handles_null=True)

    def __repr__(self):
        return f"Optional(default={self.default!r})"
