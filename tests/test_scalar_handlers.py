"""Scalar handler-object facade: ``spec.apply(value)`` /
``set_handler`` and the ``BaseInvalidValueHandler`` hierarchy —
semantics mirror the reference (``base.py:219-249`` for apply,
``base.py:479-537`` + ``handlers.py:18-152`` for the handlers)."""

from __future__ import annotations

import logging

import pytest

import filters_spark as fs


def test_apply_returns_cleaned_value(spark):
    assert fs.Unicode().apply(b"hello") == "hello"
    assert (
        fs.Strip() | fs.MaxChars(3, truncate=True)
    ).apply("  abcdef  ") == "abc"


def test_apply_none_passthrough(spark):
    # base.py:230: None short-circuits every non-presence filter.
    assert fs.Unicode().apply(None) is None


def test_apply_default_handler_raises_filter_error(spark):
    with pytest.raises(fs.FilterError) as exc_info:
        fs.Required().apply(None)
    assert exc_info.value.context.get("code") == "empty"


def test_set_handler_memory_collects_messages(spark):
    handler = fs.MemoryHandler()
    chain = (fs.Required() | fs.MinLength(5)).set_handler(handler)
    assert chain.apply("abc") is None
    assert list(handler.messages) == [""]
    codes = [m.code for m in handler.messages[""]]
    assert codes == ["too_short"]


def test_set_handler_returns_self_for_cascading(spark):
    spec = fs.Required()
    assert spec.set_handler(fs.MemoryHandler()) is spec


def test_log_handler_routes_to_logger(spark, caplog):
    logger = logging.getLogger("filters_spark.test.scalar")
    chain = fs.Int().set_handler(fs.LogHandler(logger))
    with caplog.at_level(logging.ERROR, logger=logger.name):
        assert chain.apply("not-a-number") is None
    assert any("numeric" in r.message.lower() for r in caplog.records)


def test_exception_handler_handle_exception_context(spark):
    err = fs.FilterError("boom")
    err.context = {"key": "k"}
    with pytest.raises(fs.FilterError) as exc_info:
        fs.ExceptionHandler().handle_exception("boom", err)
    assert exc_info.value.context == {"key": "k"}


def test_memory_handler_capture_exc_info(spark):
    handler = fs.MemoryHandler(capture_exc_info=True)
    err = fs.FilterError("boom")
    try:
        raise err
    except fs.FilterError as caught:
        handler.handle_exception("boom", caught)
    assert handler.has_exceptions
    assert len(handler.exc_info) == 1


def test_base_handler_is_abstract(spark):
    with pytest.raises(NotImplementedError):
        fs.BaseInvalidValueHandler().handle_invalid_value("m", False, {})


def test_filter_macro_type_isinstance(spark):
    @fs.filter_macro
    def clean_name():
        return fs.Strip() | fs.NotEmpty()

    assert isinstance(clean_name(), fs.FilterMacroType)
    assert clean_name().apply("  bob ") == "bob"
