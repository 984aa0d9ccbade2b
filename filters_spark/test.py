"""Legacy ``unittest`` harness: ``BaseFilterTestCase``.

Mirrors the reference's public ``filters.test`` module
(``/root/reference/src/filters/test.py:41-207``): a ``TestCase`` base
with ``assertFilterPasses`` / ``assertFilterErrors`` keyed off a
class-level ``filter_type``, plus the ``unmodified`` /
``skip_value_check`` sentinels as nested classes.  The modern path is
the pytest plugin (:mod:`filters_spark.pytest_plugin`); this exists so
suites written against the reference's unittest harness port without
rewriting.

Assertions drive :class:`filters_spark.FilterRunner` — every check runs
the chain through the real compiled engine on the active SparkSession.
"""

from __future__ import annotations

import json
from collections.abc import Mapping, Sequence
from pprint import pformat
from typing import Any
from unittest import TestCase

from filters_spark.runner import FilterRunner

__all__ = ["BaseFilterTestCase", "sorted_dict"]


def sorted_dict(value):
    """Recursively sort mapping keys so failure output diffs cleanly
    (``test.py:17-38``)."""
    if isinstance(value, Mapping):
        return {k: sorted_dict(value[k]) for k in sorted(value)}
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        return [sorted_dict(v) for v in value]
    return value


class BaseFilterTestCase(TestCase):
    """Set ``filter_type`` on the subclass, then use
    ``assertFilterPasses`` / ``assertFilterErrors``; pass either a
    raw value (run through ``self._filter``) or a prepared
    ``FilterRunner``."""

    filter_type = None

    class unmodified:
        """Sentinel: expect the cleaned value to equal the input."""

    class skip_value_check:
        """Sentinel: don't compare the cleaned value."""

    def assertFilterPasses(self, runner: Any, expected_value: Any = unmodified):
        return self.assertFilterErrors(runner, {}, expected_value)

    def assertFilterErrors(
        self,
        runner: Any,
        expected_codes,
        expected_value: Any = None,
    ) -> FilterRunner:
        if not isinstance(runner, FilterRunner):
            runner = self._filter(runner)

        if runner.has_exceptions:  # vacuous here (DEVIATIONS #11)
            self.fail(
                "Unhandled exceptions occurred while filtering the "
                "request payload:\n\n"
                f"{pformat(runner.exc_info)}\n\n"
                f"Filter Messages:\n\n{pformat(dict(runner.filter_messages))}"
            )

        if isinstance(expected_codes, list):
            expected_codes = {"": expected_codes}

        if runner.error_codes != expected_codes:
            self.fail(
                "Filter generated unexpected error codes (expected "
                f"{json.dumps(sorted_dict(expected_codes))}):\n\n"
                f"{pformat(dict(runner.filter_messages))}"
            )

        if (self.skip_value_check is not True) and (
            expected_value is not self.skip_value_check
        ):
            self._check_filter_value(
                runner.cleaned_data,
                runner.data
                if expected_value is self.unmodified
                else expected_value,
            )
        return runner

    def _filter(self, *args, **kwargs) -> FilterRunner:
        """Apply ``self.filter_type(*ctor_args, **kwargs)`` to the first
        positional (the value) — ``test.py:154-192``."""
        if not callable(self.filter_type):
            self.fail(f"{type(self).__name__}.filter_type is not callable.")
        if not args:
            self.fail(
                f"First argument to {type(self).__name__}._filter must be "
                "the filtered value."
            )
        return FilterRunner(self.filter_type(*args[1:], **kwargs), args[0], True)

    def _check_filter_value(self, cleaned_data, expected) -> None:
        """Override point for suites needing a non-equality comparison."""
        self.assertEqual(cleaned_data, expected)
