"""JSON-friendly type-name aliases for error messages.

Mirrors ``/root/reference/src/filters/aliases.py:10-24``: filters that
name Python types in user-facing messages (:class:`Type`,
:class:`Array`) can mask the Python-specific names with these, so an
API consumer sees "Number is not valid (allowed types: String)" instead
of "int is not valid (allowed types: str)".
"""

from __future__ import annotations

from collections import OrderedDict
from collections.abc import Mapping, Sequence

__all__ = ["JSON_ALIASES"]

JSON_ALIASES: dict[type, str] = {
    # builtins
    bool: "Boolean",
    bytes: "String",
    dict: "Object",
    float: "Number",
    int: "Number",
    list: "Array",
    str: "String",
    # collections
    OrderedDict: "Object",
    # typing / abcs
    Mapping: "Object",
    Sequence: "Array",
}
