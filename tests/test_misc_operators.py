"""Coverage for the remaining SURVEY §2 operators: Type (static),
NamedTuple, Call (custom-constraint plugin point), filter_macro, and the
extension registry."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.core.spec import CompileError


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [(1, "alpha", 10), (2, "", -3), (3, None, 7)],
        "id long, name string, score int",
    ).cache()


# -- Type (static schema check) ---------------------------------------------


def test_type_matching_is_noop(sdf):
    out = fs.validate(sdf, {"name": fs.Type(str) | fs.NotEmpty()})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["_is_valid"] and not rows[2]["_is_valid"]


def test_type_mismatch_is_compile_error(sdf):
    with pytest.raises(CompileError, match="cannot hold"):
        fs.validate(sdf, {"score": fs.Type(str)})


def test_array_requires_array_column(sdf):
    with pytest.raises(CompileError):
        fs.validate(sdf, {"name": fs.Array()})


# -- NamedTuple --------------------------------------------------------------


Point = collections.namedtuple("Point", ["x", "y"])


@pytest.fixture(scope="module")
def struct_df(spark):
    return spark.createDataFrame(
        [(0, {"y": "2", "x": "1"}), (1, {"y": "oops", "x": "3"})],
        "rid long, p struct<y:string, x:string>",
    ).cache()


def test_namedtuple_reorders_and_filters(struct_df):
    out = fs.validate(
        struct_df,
        {"p": fs.NamedTuple(Point, {"x": fs.Int(), "y": fs.Int()})},
    )
    rows = {r["rid"]: r for r in out.collect()}
    # fields reordered to _fields order and filtered
    assert rows[0]["p"].asDict() == {"x": 1, "y": 2}
    assert rows[1]["p"]["x"] == 3 and rows[1]["p"]["y"] is None
    assert [v["key"] for v in rows[1]["_violations"]] == ["p.y"]


def test_namedtuple_exact_fields(struct_df):
    with pytest.raises(CompileError, match="exact keys"):
        fs.validate(
            struct_df, {"p": fs.NamedTuple(("x", "y", "z"))}
        )


# -- Call (custom constraint via Arrow kernel) -------------------------------


def test_call_custom_function(sdf):
    out = fs.validate(sdf, {"name": fs.Call(lambda s: s.upper())})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["name"] == "ALPHA"
    assert rows[3]["name"] is None  # None passes untouched


def test_call_exception_becomes_violation(sdf):
    def boom(s):
        raise ValueError("nope")

    out = fs.validate(sdf, {"name": fs.Call(boom)})
    rows = {r["id"]: r for r in out.collect()}
    assert not rows[1]["_is_valid"]
    assert rows[1]["_violations"][0]["code"] == "exception"
    assert rows[3]["_is_valid"]  # None never reaches the callable


# -- filter_macro ------------------------------------------------------------


def test_filter_macro_composes(sdf):
    @fs.filter_macro
    def clean_name():
        return fs.Required() | fs.CaseFold() | fs.MaxLength(3, truncate=True)

    out = fs.validate(sdf, {"name": clean_name() | fs.MinLength(1)})
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["name"] == "alp"
    assert not rows[2]["_is_valid"]  # empty fails Required

    # macro usable directly as a rule too
    out2 = fs.validate(sdf, {"name": clean_name()})
    assert {r["id"]: r["name"] for r in out2.collect()}[1] == "alp"


# -- extension registry ------------------------------------------------------


def test_extension_registry_manual_registration(sdf):
    reg = fs.FilterExtensionRegistry(group="filters_spark.test_ext")
    reg.register("Shout", fs.CaseFold)
    assert reg.Shout is fs.CaseFold
    assert dict(iter(reg))["Shout"] is fs.CaseFold
    with pytest.raises(AttributeError):
        _ = reg.Missing
