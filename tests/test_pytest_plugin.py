"""User-facing pytest plugin parity.

The reference ships a test harness its users build suites on
(``src/filters/pytest.py:101-143``); these tests reproduce its fixture
semantics with cases lifted from the reference's own suite
(``test/test_filter_chain.py:9-58``, ``test/test_choice.py``) running
against the compiled Spark engine via the ``FilterRunner`` façade.
"""

from __future__ import annotations

import pytest

import filters_spark as fs
from filters_spark.pytest_plugin import skip_value_check, unmodified


@pytest.fixture(autouse=True)
def _session(spark):
    """FilterRunner resolves the active SparkSession; make sure the
    shared test session exists before each fixture call."""


def test_implicit_chain(assert_filter_passes, assert_filter_errors):
    # test/test_filter_chain.py:9-16 — class | instance composes a chain
    chain = fs.Int | fs.Max(3)
    assert_filter_passes(chain, "1", 1)
    assert_filter_errors(chain, "4", [fs.Max.CODE_TOO_BIG])


def test_chain_of_chains(assert_filter_passes, assert_filter_errors):
    # test/test_filter_chain.py:32-44
    fc1 = fs.NotEmpty | fs.Choice(choices=("Lucky", "Dusty", "Ned"))
    fc2 = fs.NotEmpty | fs.MinLength(4)
    chain = fc1 | fc2
    assert_filter_passes(chain, "Lucky")
    assert_filter_errors(chain, "El Guapo", [fs.Choice.CODE_INVALID])
    assert_filter_errors(chain, "Ned", [fs.MinLength.CODE_TOO_SHORT])


def test_stop_after_invalid_value(assert_filter_errors):
    # test/test_filter_chain.py:46-58 — first error breaks the chain
    chain = fs.MaxLength(3) | fs.MinLength(8) | fs.Required
    assert_filter_errors(chain, "foobar", [fs.MaxLength.CODE_TOO_LONG])


def test_unmodified_sentinel_default(assert_filter_passes):
    # pytest.py:115 — omitting expected_value asserts the value is
    # returned unchanged
    runner = assert_filter_passes(fs.Strip(), "abc")
    assert runner.cleaned_data == "abc"


def test_skip_value_check_sentinel(assert_filter_passes):
    # pytest.py:41-51 — the caller opts out of the equality check
    runner = assert_filter_passes(
        fs.Unicode() | fs.Strip(), "  x  ", skip_value_check
    )
    assert runner.cleaned_data == "x"


def test_expected_codes_dict_form(assert_filter_errors):
    # pytest.py:81-82 — a list means {"": codes}; dicts pass through
    assert_filter_errors(fs.Required(), None, {"": ["empty"]})


def test_fixture_failure_is_a_test_failure(assert_filter_passes):
    with pytest.raises(pytest.fail.Exception):
        assert_filter_passes(fs.Required(), None)


def test_wrong_expected_value_fails(assert_filter_passes):
    with pytest.raises(AssertionError):
        assert_filter_passes(fs.Strip(), "  x ", "  x ")


def test_runner_reference_positional_signature(spark):
    """FilterRunner(chain, data, capture_exc_info) must not TypeError on
    the reference's third positional (handlers.py:166); exception
    introspection is a documented no-op (DEVIATIONS #11)."""
    r = fs.FilterRunner(fs.Required(), "v", True)
    assert r.is_valid()
    assert r.has_exceptions is False
    assert r.exc_info == []


class TestLegacyUnittestHarness:
    """filters_spark.test.BaseFilterTestCase — the reference's legacy
    unittest harness (test.py:41-207), exercised with reference-style
    cases.  Wrapped in a pytest class so the session fixture exists."""

    @pytest.fixture(autouse=True)
    def _need_spark(self, spark):
        pass

    def _case(self):
        import unittest

        from filters_spark.test import BaseFilterTestCase

        class MinCase(BaseFilterTestCase):
            filter_type = fs.Min
            # TestCase needs a runnable method name
            def runTest(self):
                pass

        return MinCase()

    def test_passes_and_errors(self):
        case = self._case()
        # reference test.py:163-168 example: Min(min_val).apply(value)
        case.assertFilterPasses(case._filter(42, 40))
        runner = case.assertFilterErrors(
            case._filter(3, 40), [fs.Min.CODE_TOO_SMALL]
        )
        assert runner.cleaned_data is None

    def test_typo_protection_and_sentinels(self):
        import unittest

        case = self._case()
        with pytest.raises(unittest.TestCase.failureException):
            case.assertFilterPasses(case._filter(3, 40))
        # skip_value_check sentinel
        case.assertFilterErrors(
            case._filter(3, 40),
            [fs.Min.CODE_TOO_SMALL],
            case.skip_value_check,
        )

    def test_sorted_dict_helper(self):
        from filters_spark.test import sorted_dict

        assert sorted_dict({"b": [{"z": 1, "a": 2}], "a": 0}) == {
            "a": 0,
            "b": [{"a": 2, "z": 1}],
        }


def test_sentinels_importable_like_reference():
    # mirror: from filters.pytest import unmodified, skip_value_check
    from filters_spark.pytest_plugin import (  # noqa: F811
        skip_value_check as s2,
        unmodified as u2,
    )

    assert s2 is skip_value_check and u2 is unmodified
