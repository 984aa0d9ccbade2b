"""Decode golden JSON fixtures and compare Spark results against them."""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import math
from pathlib import Path

from pyspark.sql import Row

GOLDEN_DIR = Path(__file__).resolve().parent / "goldens"


def load_goldens(name: str) -> dict:
    return json.loads((GOLDEN_DIR / f"{name}.json").read_text())


def decode(v):
    """Inverse of scripts/gen_goldens.py:encode."""
    if isinstance(v, dict):
        if "__bytes__" in v:
            return base64.b64decode(v["__bytes__"])
        if "__decimal__" in v:
            return decimal.Decimal(v["__decimal__"])
        if "__ts__" in v:
            return datetime.datetime.fromisoformat(v["__ts__"])
        if "__date__" in v:
            return datetime.date.fromisoformat(v["__date__"])
        if "__uuid__" in v:
            return v["__uuid__"]  # engine canonical form is the string
        if "__dict__" in v:
            return {k: decode(x) for k, x in v["__dict__"].items()}
        if "__list__" in v:
            return [decode(x) for x in v["__list__"]]
    return v


def values_equal(expected, actual) -> bool:
    """Loose-typed, semantics-exact comparison between a decoded golden
    value and a collected Spark value."""
    if expected is None or actual is None:
        return expected is None and actual is None
    if isinstance(expected, decimal.Decimal):
        return decimal.Decimal(str(actual)) == expected
    if isinstance(expected, (bytes, bytearray)):
        return bytes(actual) == bytes(expected)
    if isinstance(expected, datetime.datetime):
        exp = expected
        if exp.tzinfo is not None:
            exp = exp.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return actual == exp
    if isinstance(expected, datetime.date) and not isinstance(
        expected, datetime.datetime
    ):
        return actual == expected
    if isinstance(expected, bool):
        return actual is expected
    if isinstance(expected, int) and not isinstance(expected, bool):
        return int(actual) == expected
    if isinstance(expected, float):
        return math.isclose(float(actual), expected, rel_tol=1e-9)
    if isinstance(expected, dict):
        if isinstance(actual, str):
            # TomlDecode deviation: reference returns a dict, the engine
            # a JSON string (Spark columns need a concrete type)
            import json

            try:
                actual = json.loads(actual)
            except ValueError:
                return False
        if isinstance(actual, Row):
            actual = actual.asDict(recursive=False)
        if not isinstance(actual, dict) or set(actual) != set(expected):
            return False
        return all(values_equal(v, actual[k]) for k, v in expected.items())
    if isinstance(expected, (list, tuple)):
        if actual is None or len(actual) != len(expected):
            return False
        return all(values_equal(e, a) for e, a in zip(expected, actual))
    return expected == actual


def group_violations(viol_rows) -> tuple[dict, dict]:
    """Collected violations array → ({key: [codes]}, {key: [messages]})."""
    codes: dict[str, list] = {}
    msgs: dict[str, list] = {}
    for v in viol_rows or []:
        codes.setdefault(v["key"], []).append(v["code"])
        msgs.setdefault(v["key"], []).append(v["message"])
    return codes, msgs
