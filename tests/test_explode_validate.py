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
