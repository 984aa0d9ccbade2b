"""Pytest fixtures for users testing their own filter chains.

Reproduces the reference's shipped test harness
(``/root/reference/src/filters/pytest.py:101-143``, registered through
the ``pytest11`` entry point in its ``pyproject.toml:37-38``): the
``assert_filter_passes`` / ``assert_filter_errors`` fixtures compare a
chain's ``error_codes`` dict and cleaned value against expectations,
with the ``unmodified`` / ``skip_value_check`` sentinels
(``pytest.py:32-51``) controlling the value comparison.

Here the fixtures drive :class:`filters_spark.FilterRunner` — the
scalar façade over the compiled columnar engine — so every assertion
exercises the REAL production code path (a 1-row DataFrame through the
same compiled chain tables run through).

Registered via the ``pytest11`` entry point when the package is
installed; in a source checkout add
``pytest_plugins = ["filters_spark.pytest_plugin"]`` to a root
``conftest.py``.

Usage (identical to reference-based suites)::

    def test_my_chain(assert_filter_passes):
        assert_filter_passes(fs.Unicode() | fs.Strip(), "  x  ", "x")

    def test_my_chain_rejects(assert_filter_errors):
        assert_filter_errors(fs.Required(), None, ["empty"])
"""

from __future__ import annotations

import json
from pprint import pformat

import pytest

from filters_spark.runner import FilterRunner

__all__ = [
    "assert_filter_errors",
    "assert_filter_passes",
    "skip_value_check",
    "unmodified",
]


class unmodified:
    """Sentinel: the expected cleaned value is the input value itself
    (default for ``assert_filter_passes`` — ``pytest.py:32-38``)."""


class skip_value_check:
    """Sentinel: don't compare the cleaned value at all; the caller adds
    its own assertions (``pytest.py:41-51``)."""


def _check(chain, value, want_codes, want_value):
    runner = FilterRunner(chain, value, True)
    if runner.has_exceptions:  # vacuous here (DEVIATIONS #11) — kept so
        # suites ported from the reference keep identical failure text
        pytest.fail(
            "Unhandled exceptions occurred while filtering the request "
            "payload:\n\n{tb}\n\nFilter Messages:\n\n{msgs}".format(
                tb=pformat(runner.exc_info),
                msgs=pformat(dict(runner.filter_messages)),
            )
        )
    if isinstance(want_codes, list):
        want_codes = {"": want_codes}
    got = runner.error_codes
    if got != want_codes:
        pytest.fail(
            "Filter generated unexpected error codes (expected "
            "{want}):\n\n{msgs}".format(
                want=json.dumps(want_codes),
                msgs=pformat(dict(runner.filter_messages)),
            )
        )
    if want_value is not skip_value_check:
        expect = value if want_value is unmodified else want_value
        assert runner.cleaned_data == expect
    return runner


@pytest.fixture
def assert_filter_passes():
    """Callable fixture: the chain must accept ``test_value`` with zero
    errors and (unless skipped) produce ``expected_value``
    (``pytest.py:101-118``)."""

    def _passes(filter_instance, test_value, expected_value=unmodified):
        return _check(filter_instance, test_value, {}, expected_value)

    return _passes


@pytest.fixture
def assert_filter_errors():
    """Callable fixture: the chain must reject ``test_value`` with
    exactly ``expected_codes`` (list shorthand means key ``""``) and
    (unless skipped) yield ``expected_value`` as the cleaned result
    (``pytest.py:121-143``)."""

    def _errors(filter_instance, test_value, expected_codes,
                expected_value=None):
        return _check(filter_instance, test_value, expected_codes,
                      expected_value)

    return _errors
