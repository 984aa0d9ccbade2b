"""Explode-path array validation (kernel chains over array elements)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import filters_spark as fs
from filters_spark.engine import explode_validate


@pytest.fixture(scope="module")
def arr_df(spark):
    schema = T.StructType(
        [
            T.StructField("rid", T.LongType()),
            T.StructField("texts", T.ArrayType(T.StringType())),
        ]
    )
    rows = [
        (0, ["café", "café", "plain"]),  # NFC, NFD, ascii
        (1, ["ok", "", "x\r\ny"]),  # empty elem fails Required
        (2, []),
        (3, None),
        (4, ["only"]),
    ]
    return spark.createDataFrame(rows, schema).cache()


def test_kernel_chain_over_array(arr_df):
    chain = fs.Required() | fs.Unicode()  # Unicode = Arrow kernel
    out, v, w = explode_validate(arr_df, "texts", chain)
    rows = {r["rid"]: r for r in out.collect()}
    # NFD element normalises to the NFC form, in place, order kept
    assert rows[0][v] == ["café", "café", "plain"]
    # CRLF -> LF; empty element nulled in place with per-index key
    assert rows[1][v] == ["ok", None, "x\ny"]
    assert [(x["key"], x["code"]) for x in rows[1][w]] == [
        ("texts.1", "empty")
    ]
    assert rows[2][v] == [] and rows[2][w] == []
    assert rows[3][v] is None and rows[3][w] == []
    assert rows[4][v] == ["only"] and rows[4][w] == []


def test_pure_expression_chain_matches_repeater(arr_df, spark):
    # same chain through both paths must agree where both apply
    df = arr_df.where(F.col("texts").isNotNull())
    chain = fs.MinLength(2)
    out, v, w = explode_validate(df, "texts", chain)
    exploded = {r["rid"]: (r[v], sorted((x["key"], x["code"]) for x in r[w]))
                for r in out.collect()}
    rep = fs.validate(df, {"texts": fs.FilterRepeater(chain)})
    repeater = {
        r["rid"]: (
            r["texts"],
            sorted((x["key"], x["code"]) for x in r["_violations"]),
        )
        for r in rep.collect()
    }
    assert exploded == repeater


def test_rejects_non_array(arr_df):
    from filters_spark.core.spec import CompileError

    with pytest.raises(CompileError):
        explode_validate(arr_df, "rid", fs.Min(0))


def test_single_pass_plan_no_join_no_persist(arr_df):
    """The explode path must be single-lineage: no self-join, no
    InMemoryRelation introduced by explode_validate itself (VERDICT r1
    item 8)."""
    chain = fs.Required() | fs.Unicode()
    out, v, w = explode_validate(arr_df.unpersist(), "texts", chain)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "InMemoryTableScan" not in plan, plan
    arr_df.cache()


def test_chain_break_returns_partial_array(arr_df, spark):
    """A structural combinator that fails mid-chain still returns its
    PARTIAL output (FilterChain._apply breaks and returns the failing
    filter's value, base.py:462-473; test_filter_repeater.py:49)."""
    df = spark.createDataFrame(
        [(0, [1, 5, 2]), (1, [1, 2, 3])], "rid long, arr array<long>"
    )
    res = fs.validate(df, {"arr": fs.FilterRepeater(fs.Max(3)) | fs.MinLength(1)})
    rows = {r["rid"]: r for r in res.collect()}
    # element 5 fails Max(3) -> nulled in place; chain breaks but the
    # partial array survives, and MinLength never fires
    assert rows[0]["arr"] == [1, None, 2]
    assert [(x["key"], x["code"]) for x in rows[0]["_violations"]] == [
        ("arr.1", "too_big")
    ]
    assert rows[1]["arr"] == [1, 2, 3] and rows[1]["_violations"] == []


def test_validate_autoroutes_kernel_repeater(arr_df, spark):
    """validate() with a rule that is exactly FilterRepeater(kernel
    chain) over an array column routes through the explode path instead
    of raising CompileError (UX parity: the reference repeater takes any
    chain)."""
    rules = {"texts": fs.FilterRepeater(fs.Required() | fs.Unicode())}
    out = fs.validate(arr_df, rules)
    rows = {r["rid"]: r for r in out.collect()}
    assert rows[0]["texts"] == ["café", "café", "plain"]
    assert [(x["key"], x["code"]) for x in rows[1]["_violations"]] == [
        ("texts.1", "empty")
    ]
    assert rows[3]["texts"] is None
    assert rows[1]["_is_valid"] is False and rows[4]["_is_valid"] is True
    # pure-expression repeaters must STILL take the transform path
    pure = fs.validate(arr_df, {"texts": fs.FilterRepeater(fs.MinLength(2))})
    plan = pure._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "HashAggregate" not in plan


def test_validate_routes_composed_repeater_chain(arr_df, spark):
    """ADVICE r2: a COMPOSED chain around a kernel-bearing repeater
    (Required() | FilterRepeater(Unicode()) | ...) must compose like the
    reference instead of dying in CompileError, with first-error break
    preserved across the segments."""
    rules = {
        "texts": fs.Required() | fs.FilterRepeater(fs.Required() | fs.Unicode())
    }
    out = fs.validate(arr_df, rules)
    rows = {r["rid"]: r for r in out.collect()}
    # prefix Required fires on the NULL array; repeater suppressed
    assert rows[3]["_is_valid"] is False
    assert [(x["key"], x["code"]) for x in rows[3]["_violations"]] == [
        ("texts", "empty")
    ]
    # clean rows still flow through the kernel repeater
    assert rows[0]["texts"] == ["café", "café", "plain"]
    # element violations intact when the prefix passes
    assert [(x["key"], x["code"]) for x in rows[1]["_violations"]] == [
        ("texts.1", "empty")
    ]
    # ... and a suffix segment runs after the repeater (type-preserving)
    rules2 = {
        "texts": fs.FilterRepeater(fs.Unicode()) | fs.MinLength(2)
    }
    out2 = fs.validate(arr_df, rules2)
    rows2 = {r["rid"]: r for r in out2.collect()}
    assert rows2[0]["_is_valid"] is True
    assert [(x["key"], x["code"]) for x in rows2[4]["_violations"]] == [
        ("texts", "too_short")
    ]
    # empty array: repeater passes, suffix MinLength(2) fires
    assert rows2[2]["_is_valid"] is False


def test_explode_validate_map_values(spark):
    """Map variant: kernel chain over every map VALUE, violation keys
    carry the map key, NULL/empty maps pass through (reference
    FilterRepeater over mappings, complex.py:97-129)."""
    df = spark.createDataFrame(
        [
            (0, {"a": "café", "b": "x\r\ny"}),   # NFD + CRLF normalise
            (1, {"a": "ok", "b": ""}),            # empty value fails Required
            (2, {}),
            (3, None),
        ],
        "rid long, m map<string,string>",
    )
    chain = fs.Required() | fs.Unicode()
    out, v, w = explode_validate(df, "m", chain)
    rows = {r["rid"]: r for r in out.collect()}
    assert rows[0][v] == {"a": "café", "b": "x\ny"}
    assert rows[1][v] == {"a": "ok", "b": None}
    assert [(x["key"], x["code"]) for x in rows[1][w]] == [("m.b", "empty")]
    assert rows[2][v] == {} and rows[2][w] == []
    assert rows[3][v] is None and rows[3][w] == []
    # auto-route through validate() too
    res = fs.validate(df, {"m": fs.FilterRepeater(chain)})
    got = {r["rid"]: r["m"] for r in res.collect()}
    assert got[0] == {"a": "café", "b": "x\ny"} and got[3] is None
