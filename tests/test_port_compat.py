"""Port-compatibility: every reference constructor keyword either works
with reference semantics or refuses at CONFIG time with guidance — a
user porting reference code must never hit a generic TypeError or a
silently different behaviour.

Driven by an AST audit of every ``__init__`` under
``/root/reference/src/filters/`` (round 5): the gaps closed here are
``Optional(call_default=)``, ``Round(result_type=)``,
``Call(callable_=)``, ``FilterRepeater(filter_chain=)``,
``NamedTuple(type_=)``, ``Array(aliases=)``, ``Decimal(allow_tuples=)``
and the ``JsonDecode(decoder)`` misuse guard.
"""

from __future__ import annotations

import collections
import decimal

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.core.compiler import attach_chain
from filters_spark.core.spec import CompileError


def _apply_one(spark, spec, value, coltype="string"):
    df = spark.createDataFrame([(value,)], f"v {coltype}")
    out, val_col, viol_col = attach_chain(df, "v", spec, key="")
    row = out.select(val_col, viol_col).collect()[0]
    return row[0], sorted(x["code"] for x in row[1])


def test_optional_call_default_factory_semantics(spark):
    """call_default: auto (None) calls a callable default; True requires
    a callable; False with a callable refuses at config time (a function
    object has no columnar representation)."""
    got, codes = _apply_one(spark, fs.Optional(default=lambda: "fb"), None)
    assert (got, codes) == ("fb", [])
    got, _ = _apply_one(
        spark, fs.Optional(default=lambda: "fb", call_default=True), ""
    )
    assert got == "fb"
    # non-empty values pass through untouched
    got, _ = _apply_one(spark, fs.Optional(default=lambda: "fb"), "x")
    assert got == "x"
    with pytest.raises(TypeError, match="callable"):
        fs.Optional(default="lit", call_default=True)
    with pytest.raises(TypeError, match="columnar"):
        fs.Optional(default=dict, call_default=False)
    # literal defaults unchanged by the new kwarg
    got, _ = _apply_one(spark, fs.Optional(default="d", call_default=False), None)
    assert got == "d"


def test_round_result_type(spark):
    """result_type mirrors number.py:264: Decimal keeps the exact
    decimal column; float/str/int cast; int needs an integral grid."""
    dec, _ = _apply_one(spark, fs.Round(to_nearest="0.25"), "2.6")
    assert dec == decimal.Decimal("2.50")
    flt, _ = _apply_one(
        spark, fs.Round(to_nearest="0.25", result_type=float), "2.6"
    )
    assert isinstance(flt, float) and flt == 2.5
    s, _ = _apply_one(
        spark, fs.Round(to_nearest="0.25", result_type=str), "2.6"
    )
    assert s == "2.50"
    i, _ = _apply_one(spark, fs.Round(to_nearest=5, result_type=int), "12")
    assert isinstance(i, int) and i == 10
    with pytest.raises(CompileError, match="integral"):
        fs.Round(to_nearest="0.5", result_type=int)
    with pytest.raises(CompileError, match="result_type"):
        fs.Round(result_type=complex)


def test_reference_keyword_aliases(spark):
    """Reference keyword spellings resolve to the engine-native ones."""
    got, _ = _apply_one(spark, fs.Call(callable_=str.upper), "ab")
    assert got == "AB"
    with pytest.raises(TypeError, match="not both"):
        fs.Call(str.upper, callable_=str.lower)

    rep = fs.FilterRepeater(filter_chain=fs.Strip())
    df = spark.createDataFrame([([" a ", "b "],)], "v array<string>")
    out, val_col, _ = attach_chain(df, "v", rep, key="")
    assert list(out.select(val_col).collect()[0][0]) == ["a", "b"]
    with pytest.raises(TypeError, match="not both"):
        fs.FilterRepeater(fs.Strip(), filter_chain=fs.Strip())
    with pytest.raises(TypeError, match="required"):
        fs.FilterRepeater()

    Point = collections.namedtuple("Point", ["x", "y"])
    nt = fs.NamedTuple(type_=Point)
    assert nt.fields == ["x", "y"]
    with pytest.raises(TypeError, match="not both"):
        fs.NamedTuple(Point, type_=Point)

    # Array(aliases=) forwards to Type's message aliasing
    arr = fs.Array(aliases={list: "sequence"})
    df2 = spark.createDataFrame([([1, 2],)], "v array<int>")
    out2, val_col2, _ = attach_chain(df2, "v", arr, key="")
    assert list(out2.select(val_col2).collect()[0][0]) == [1, 2]


def test_config_time_refusals_carry_guidance(spark):
    """Unsupportable reference options fail LOUDLY at config time with a
    pointer, never a generic error mid-job."""
    import json

    assert fs.Decimal(allow_tuples=False).max_precision is None
    with pytest.raises(CompileError, match="DEVIATIONS"):
        fs.Decimal(allow_tuples=True)
    with pytest.raises(CompileError, match="DEVIATIONS"):
        fs.JsonDecode(json.loads)
