"""Macros and extension registry (``macros.py:36-89``,
``extensions.py:21-112``).

``filter_macro`` promotes a function returning a chain into a reusable
spec *type* — compile-time only, so the Spark analogue is trivially a
factory.  The extension registry loads third-party spec factories from
the ``filters_spark.ext`` entry-point group (same mechanism as the
reference's ``filters.ext``).
"""

from __future__ import annotations

from filters_spark.core.spec import BaseSpec, Chain, as_chain


class FilterMacroType(BaseSpec):
    """Common base of every ``filter_macro`` product — reference
    ``macros.py:12-33`` (used there for type hints / isinstance
    checks on macro types)."""

    def expand(self) -> Chain:  # pragma: no cover — overridden per macro
        raise NotImplementedError


def filter_macro(func):
    """Promote ``func() -> chain`` into a chainable factory: the returned
    object can be used like a spec class (``macro | Other()`` or
    ``macro() | Other()``)."""

    class _Macro(FilterMacroType):
        def __init__(self, *args, **kwargs):
            self._chain = as_chain(func(*args, **kwargs))

        def compile(self, value, dtype, ctx, key):
            raise TypeError("macros expand before compilation")

        def __or__(self, other) -> Chain:
            return self._chain | other

        def expand(self) -> Chain:
            return self._chain

    _Macro.__name__ = getattr(func, "__name__", "filter_macro")
    return _Macro


class FilterExtensionRegistry:
    """Entry-point plugin registry (``extensions.py:38-112``)."""

    GROUP = "filters_spark.ext"

    def __init__(self, group: str | None = None) -> None:
        self.group = group or self.GROUP
        self._specs: dict[str, type] = {}
        self._loaded = False

    def register(self, name: str, spec_cls: type) -> None:
        self._specs[name] = spec_cls

    def _load(self) -> None:
        if self._loaded:
            return
        self._loaded = True
        try:
            from importlib.metadata import entry_points

            for ep in entry_points(group=self.group):
                self._specs.setdefault(ep.name, ep.load())
        except Exception:  # pragma: no cover — optional mechanism
            pass

    def __getattr__(self, name: str):
        self._load()
        try:
            return self._specs[name]
        except KeyError:
            raise AttributeError(name) from None

    def __iter__(self):
        self._load()
        return iter(self._specs.items())
