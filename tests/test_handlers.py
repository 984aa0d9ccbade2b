"""Handler surface (SURVEY.md §2.8): fail-fast, logging, errors dicts —
semantics mirror ``/root/reference/test/test_handlers.py``."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

import filters_spark as fs


@pytest.fixture(scope="module")
def validated(spark):
    df = spark.createDataFrame(
        [
            (0, "hello", 1),
            (1, "", 2),          # text fails NotEmpty
            (2, "world", -5),    # n fails Min(0)
            (3, None, 3),        # text fails Required
        ],
        "rid long, text string, n long",
    )
    return fs.validate(
        df, {"text": fs.Required() | fs.NotEmpty(), "n": fs.Min(0)}
    )


def test_fail_fast_raises_filter_error(validated):
    """ExceptionHandler raises FilterError with the violation context
    (test_handlers.py:44-64; base.py:525-537)."""
    with pytest.raises(fs.FilterError) as ei:
        fs.fail_fast(validated)
    ctx = ei.value.context
    assert ctx["code"] in {"empty", "too_small"}
    assert ctx["key"] in {"text", "n"}
    assert "row" in ctx and "rid" in ctx["row"]
    assert isinstance(ei.value, ValueError)  # FilterError IS-A ValueError


def test_fail_fast_clean_frame_passes_through(validated):
    clean = validated.where(F.col("_is_valid"))
    out = fs.fail_fast(clean)
    assert out is clean


def test_errors_by_key_shape(validated):
    """FilterRunner.errors dict: key -> [{code, message}]
    (handlers.py:216-245)."""
    errs = fs.errors_by_key(validated)
    assert set(errs) == {"text", "n"}
    # Required rejects empty AND null first (chain short-circuit), with
    # code "empty" and its own message (simple.py:971-984)
    text_msgs = {m["message"] for m in errs["text"]}
    assert text_msgs == {"This value is required."}
    assert all(set(m) == {"code", "message"} for ms in errs.values() for m in ms)
    assert [m["code"] for m in errs["n"]] == ["too_small"]


def test_error_codes(validated):
    assert fs.error_codes(validated) == {
        "text": ["empty"],
        "n": ["too_small"],
    }


def test_errors_by_record_distributed(validated):
    out = fs.errors_by_record(validated)
    rows = {r["rid"]: r["_errors"] for r in out.collect()}
    assert rows[0] == {}
    assert set(rows[1]) == {"text"}
    assert rows[1]["text"][0]["code"] == "empty"
    assert set(rows[2]) == {"n"}
    assert rows[3]["text"][0]["code"] == "empty"


def test_log_violations(validated):
    """LogHandler sends message + context to the logger
    (test_handlers.py:187-209; handlers.py:18-45)."""
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    logger = logging.getLogger("filters_spark.test_log")
    logger.addHandler(Capture())
    logger.setLevel(logging.DEBUG)
    n = fs.log_violations(validated, logger, level=logging.WARNING)
    assert n == 3 == len(records)
    assert all(r.levelno == logging.WARNING for r in records)
    assert {r.context["code"] for r in records} == {"empty", "too_small"}
    # limit caps the stream
    records.clear()
    assert fs.log_violations(validated, logger, limit=1) == 1


def test_filter_runner_facade_matches_reference_api(spark):
    """FilterRunner(chain, value): the reference's scalar entry point
    (handlers.py:155-346) on top of the compiled engine."""
    runner = fs.FilterRunner(fs.Required() | fs.Unicode(), "café")
    assert runner.is_valid()
    assert runner.cleaned_data == "café"  # NFC-composed
    assert runner.errors == {}

    bad = fs.FilterRunner(fs.Required() | fs.Min(0), None, dtype="long")
    assert not bad.is_valid()
    assert bad.error_codes == {"": ["empty"]}
    assert bad.cleaned_data is None
    assert bad.errors[""][0]["message"] == "This value is required."

    # apply() reruns against a new value (handlers.py:193-202)
    bad.apply(5)
    assert bad.is_valid() and bad.cleaned_data == 5

    # aliases for drop-in ports
    assert fs.FilterChain is fs.Chain and fs.BaseFilter is fs.BaseSpec
    chain = fs.FilterChain([fs.Required()]) | fs.CaseFold()
    assert fs.FilterRunner(chain, "ABC").cleaned_data == "abc"
    m = fs.FilterMessage(code="x", message="y")
    assert m.as_dict() == {"code": "x", "message": "y"} and str(m) == "y"
