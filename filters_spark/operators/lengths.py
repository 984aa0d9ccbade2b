"""Length-constraint specs (``simple.py:451-678``).

Lengths apply to strings (characters), binary (bytes), arrays and maps
(elements).  Applying a length constraint to a length-less column type is
a *compile-time* error here — the static equivalent of the reference's
``Type(Sized)`` runtime check.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from filters_spark.core.spec import (
    BaseSpec,
    CompileError,
    Step,
    Violation,
    length_of,
)

CODE_TOO_LONG = "too_long"
CODE_TOO_SHORT = "too_short"


def _require_length(value, dtype, spec):
    ln = length_of(value, dtype)
    if ln is None:
        raise CompileError(
            f"{type(spec).__name__} needs a sized column type, got {dtype}"
        )
    return ln


class Len(BaseSpec):
    """Unified length constraint (``simple.py:451-552``): ``Len(n)`` exact,
    ``Len(min=m)``, ``Len(max=n)``, ``Len(min=m, max=n)``.  Config errors
    raise ``ValueError`` with the reference's exact messages."""

    templates = {
        CODE_TOO_LONG: "Value is too long (length must be {constraint}).",
        CODE_TOO_SHORT: "Value is too short (length must be {constraint}).",
    }

    def __init__(self, exact=None, *, min=None, max=None):  # noqa: A002
        if exact is not None and (min is not None or max is not None):
            raise ValueError(
                "Cannot specify both exact length and min/max constraints."
            )
        if exact is None and min is None and max is None:
            raise ValueError("Must specify exact, min, or max.")
        for name, val in [("exact", exact), ("min", min), ("max", max)]:
            if val is not None and val < 0:
                raise ValueError(f"{name} must be >= 0, got {val!r}.")
        if min is not None and max is not None and min > max:
            raise ValueError(f"min ({min!r}) must be <= max ({max!r}).")
        self.exact, self.min, self.max = exact, min, max

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = _require_length(value, dtype, self)
        violations = []
        if self.exact is not None:
            constraint = f"exactly {self.exact}"
            too_long = ln > self.exact
            too_short = ln < self.exact
        else:
            too_long = (ln > self.max) if self.max is not None else F.lit(False)
            too_short = (ln < self.min) if self.min is not None else F.lit(False)
        if self.exact is not None or self.max is not None:
            c = constraint if self.exact is not None else f"at most {self.max}"
            violations.append(
                Violation(
                    too_long,
                    F.lit(CODE_TOO_LONG),
                    F.lit(self.render(CODE_TOO_LONG, constraint=c)),
                )
            )
        if self.exact is not None or self.min is not None:
            c = constraint if self.exact is not None else f"at least {self.min}"
            violations.append(
                Violation(
                    # reference checks too_long first; make them exclusive
                    ~too_long & too_short,
                    F.lit(CODE_TOO_SHORT),
                    F.lit(self.render(CODE_TOO_SHORT, constraint=c)),
                )
            )
        inv = too_long | too_short
        return Step(value=value, dtype=dtype, invalid=inv, violations=violations)

    def __repr__(self):
        if self.exact is not None:
            return f"Len({self.exact!r})"
        parts = []
        if self.min is not None:
            parts.append(f"min={self.min!r}")
        if self.max is not None:
            parts.append(f"max={self.max!r}")
        return f"Len({', '.join(parts)})"


class Length(BaseSpec):
    """Exact length (``simple.py:555-597``)."""

    templates = {
        CODE_TOO_LONG: "Value is too long (length must be exactly {expected}).",
        CODE_TOO_SHORT: "Value is too short (length must be exactly {expected}).",
    }

    def __init__(self, length: int) -> None:
        self.length = length

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = _require_length(value, dtype, self)
        too_long, too_short = ln > self.length, ln < self.length
        return Step(
            value=value,
            dtype=dtype,
            invalid=too_long | too_short,
            violations=[
                Violation(
                    too_long,
                    F.lit(CODE_TOO_LONG),
                    F.lit(self.render(CODE_TOO_LONG, expected=self.length)),
                ),
                Violation(
                    ~too_long & too_short,
                    F.lit(CODE_TOO_SHORT),
                    F.lit(self.render(CODE_TOO_SHORT, expected=self.length)),
                ),
            ],
        )

    def __repr__(self):
        return f"Length(length={self.length!r})"


class MaxLength(BaseSpec):
    """Maximum length; optionally truncate instead of rejecting
    (``simple.py:600-639``; truncation is ``value[0:max]`` at :626-628)."""

    templates = {CODE_TOO_LONG: "Value is too long (length must be < {max})."}

    def __init__(self, max_length: int, truncate: bool = False) -> None:
        self.max_length = max_length
        self.truncate = truncate

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = _require_length(value, dtype, self)
        over = ln > self.max_length
        if self.truncate:
            if isinstance(dtype, (T.StringType, T.BinaryType)):
                cut = F.substring(value, 1, self.max_length)
            elif isinstance(dtype, T.ArrayType):
                cut = F.slice(value, 1, self.max_length)
            else:
                raise CompileError(f"cannot truncate column of type {dtype}")
            return Step(
                value=F.when(over, cut).otherwise(value), dtype=dtype
            )
        return Step(
            value=value,
            dtype=dtype,
            invalid=over,
            violations=[
                Violation(
                    over,
                    F.lit(CODE_TOO_LONG),
                    F.lit(self.render(CODE_TOO_LONG, max=self.max_length)),
                )
            ],
        )

    def __repr__(self):
        return f"MaxLength({self.max_length!r})"


class MinLength(BaseSpec):
    """Minimum length; never pads (``simple.py:642-678``)."""

    templates = {CODE_TOO_SHORT: "Value is too short (length must be > {min})."}

    def __init__(self, min_length: int) -> None:
        self.min_length = min_length

    def compile(self, value, dtype, ctx, key) -> Step:
        ln = _require_length(value, dtype, self)
        under = ln < self.min_length
        return Step(
            value=value,
            dtype=dtype,
            invalid=under,
            violations=[
                Violation(
                    under,
                    F.lit(CODE_TOO_SHORT),
                    F.lit(self.render(CODE_TOO_SHORT, min=self.min_length)),
                )
            ],
        )

    def __repr__(self):
        return f"MinLength({self.min_length!r})"
