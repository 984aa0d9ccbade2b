"""Generate golden parity fixtures by running the REFERENCE library as the
oracle (SURVEY.md §5.2: "the reference library itself is the oracle
generator").

One-time generator: imports ``filters`` from /root/reference/src (read
only), runs each curated case through ``FilterRunner``, and writes
``tests/goldens/*.json``.  The committed goldens are plain data — the test
suite never imports the reference.

Run:  PYTHONPATH=/root/repo python scripts/gen_goldens.py
"""

from __future__ import annotations

import base64
import datetime
import decimal
import json
import sys
import uuid as uuid_mod
from pathlib import Path

sys.path.insert(0, "/root/reference/src")

# The reference depends on phx-class-registry only for its entry-point
# extension loader, which the goldens never touch; stub it so the oracle
# imports in this sandbox (no pip installs allowed).
import types  # noqa: E402

_cr = types.ModuleType("class_registry")
_ep = types.ModuleType("class_registry.entry_points")


class _FakeEntryPointClassRegistry:  # pragma: no cover
    def __init__(self, *a, **k):
        pass

    def __class_getitem__(cls, item):
        return cls

    def __iter__(self):
        return iter(())


_ep.EntryPointClassRegistry = _FakeEntryPointClassRegistry
_cr.entry_points = _ep
sys.modules.setdefault("class_registry", _cr)
sys.modules.setdefault("class_registry.entry_points", _ep)

import filters as f  # noqa: E402  (the reference library, oracle only)

OUT_DIR = Path(__file__).resolve().parent.parent / "tests" / "goldens"


def encode(v):
    """JSON-encode arbitrary filter inputs/outputs with type tags."""
    if isinstance(v, (bytes, bytearray)):
        return {"__bytes__": base64.b64encode(bytes(v)).decode("ascii")}
    if isinstance(v, decimal.Decimal):
        return {"__decimal__": str(v)}
    if isinstance(v, datetime.datetime):
        return {"__ts__": v.isoformat()}
    if isinstance(v, datetime.date):
        return {"__date__": v.isoformat()}
    if isinstance(v, uuid_mod.UUID):
        return {"__uuid__": str(v)}
    if isinstance(v, dict):
        return {"__dict__": {str(k): encode(x) for k, x in v.items()}}
    if isinstance(v, (list, tuple)):
        return {"__list__": [encode(x) for x in v]}
    return v


def run_case(chain, value):
    runner = f.FilterRunner(chain, value)
    errors = runner.get_errors(with_context=False)
    codes = {k: [e["code"] for e in es] for k, es in errors.items()}
    messages = {k: [e["message"] for e in es] for k, es in errors.items()}
    valid = runner.is_valid()
    # cleaned is recorded for INVALID cases too: the reference's
    # cleaned_data is ``filter_chain.apply(data)`` regardless of
    # validity (handlers.py:344), and failing structural combinators
    # return partial output (test_filter_repeater.py:49)
    cleaned = runner.cleaned_data
    return {
        "input": encode(value),
        "valid": valid,
        "cleaned": encode(cleaned),
        "codes": codes,
        "messages": messages,
    }


# ---------------------------------------------------------------------------
# Curated cases: chain_id -> (reference chain, spark input type ddl, inputs)
# Inputs deliberately avoid documented parity gaps (float binary expansion,
# decimal quantize ties, dateutil exotica) — those are unit-tested as
# deviations instead.
# ---------------------------------------------------------------------------

S = "string"
B = "binary"

GROUPS: dict[str, tuple] = {
    # --- Unicode / text kernels ---
    "unicode": (
        f.Unicode(),
        S,
        [
            "already clean",
            "é combining acute",  # NFD -> NFC
            "é composed",
            "CRLF\r\nline",
            "CR\rline",
            "tab\tand\nnewline stay",
            "bell\x07gone",
            "zero​width",  # Cf char removed
            "emoji \U0001f600 ok",
            "﻿BOM leads",  # BOM is Cf -> stripped
            "",
            None,
        ],
    ),
    "unicode_bytes": (
        f.Unicode(),
        B,
        [
            b"plain ascii",
            "café".encode("utf-8"),
            b"\xff\xfe invalid utf8 \xff",
            b"",
            None,
        ],
    ),
    "casefold": (
        f.CaseFold(),
        S,
        ["FOO Bar", "straße", "Σίσυφος", "", None],
    ),
    "strip": (
        f.Strip(),
        S,
        [
            "  padded  ",
            "\t\ntabs\r\n",
            "\x00\x01ctrl ends\x02",
            "no strip needed",
            "​​zero width ends​",
            "",
            None,
        ],
    ),
    "strip_custom": (
        f.Strip(leading=r"\d+", trailing=r"[xyz]+"),
        S,
        ["123abcxyz", "abc", "999xxx", "", None],
    ),
    "regex_digits": (
        f.Regex(r"\d+"),
        S,
        ["a1b22c333", "42", "no digits here", "", None],
    ),
    "split_csv": (
        f.Split(r",\s*"),
        S,
        ["a, b,c", "one", "", None],
    ),
    "split_keys": (
        f.Split(r":", keys=["h", "m", "s"]),
        S,
        ["10:30:55", "10:30", "1:2:3:4", None],
    ),
    "choice_cs": (
        f.Choice(("Red", "Green", "Blue")),
        S,
        ["Red", "red", "Purple", "", None],
    ),
    "choice_ci": (
        f.Choice(("Red", "Green", "Blue"), case_sensitive=False),
        S,
        ["red", "GREEN", "bLuE", "Purple", None],
    ),
    "maxchars": (
        f.MaxChars(5),
        S,
        ["abc", "abcde", "abcdef", "", None],
    ),
    "maxchars_trunc": (
        f.MaxChars(5, truncate=True, suffix=".."),
        S,
        ["abc", "abcdefgh", "ééééééé", None],
    ),
    "maxbytes": (
        f.MaxBytes(10),
        S,
        ["short", "exactly10!", "this is too long", "café café x", None],
    ),
    "maxbytes_trunc": (
        f.MaxBytes(10, truncate=True),
        S,
        ["short", "this is way too long", "éééééé", None],
    ),
    "maxbytes_trunc_suffix": (
        f.MaxBytes(10, truncate=True, suffix="..."),
        S,
        ["short", "truncate me please", None],
    ),
    # prefix-bearing truncation (string.py:447-511, :573-582) — the
    # least-exercised reference edge (VERDICT r1 next-round #9)
    "maxchars_trunc_prefix": (
        f.MaxChars(6, truncate=True, prefix=">>"),
        S,
        ["abc", "abcdefgh", "ééééééé", "exact6", None],
    ),
    "maxchars_trunc_prefix_suffix": (
        f.MaxChars(8, truncate=True, prefix=">>", suffix=".."),
        S,
        ["tiny", "this one is long", "ééééééééééé", None],
    ),
    "maxchars_trunc_suffix_overflow": (
        # max_chars smaller than the suffix: reference returns
        # suffix[0:max_chars] (string.py:578-581)
        f.MaxChars(2, truncate=True, suffix="...."),
        S,
        ["overflow case", "ab", None],
    ),
    "maxbytes_trunc_prefix": (
        f.MaxBytes(12, truncate=True, prefix="[…]"),
        S,
        ["short", "truncate me please", "ééééééééé", None],
    ),
    "maxbytes_trunc_prefix_suffix": (
        f.MaxBytes(14, truncate=True, prefix="[…]", suffix="…"),
        S,
        ["ok", "a much longer value here", "éééééééééééé", None],
    ),
    "base64": (
        f.Base64Decode(),
        B,
        [
            b"SGVsbG8sIHdvcmxkIQ==",
            b"SGVsbG8sIHdvcmxkIQ",  # missing padding
            b"SGVs bG8s\nIHdv\tcmxkIQ==",  # embedded whitespace
            b"SGVsbG8sIHdvcmxkIQ======",  # excess padding
            b"-_-_",  # url-safe
            b"+/+/",  # std
            b"-_+/",  # mixed dialects -> invalid
            b"not*base64!",
            b"TWFu",
            None,
        ],
    ),
    "ipv4": (
        f.IpAddress(),
        S,
        [
            "127.0.0.1",
            "255.255.255.255",
            "256.1.1.1",
            "1.2.3",
            "01.2.3.4",
            "1.2.3.4.5",
            "::1",
            "",
            None,
        ],
    ),
    "ipv6": (
        f.IpAddress(ipv4=False, ipv6=True),
        S,
        [
            "::1",
            "2001:0db8:0000:0000:0000:ff00:0042:8329",
            "2001:db8::ff00:42:8329",
            "fe80::",
            "127.0.0.1",
            "not an ip",
            None,
        ],
    ),
    "uuid": (
        f.Uuid(),
        S,
        [
            "12345678-1234-5678-1234-567812345678",
            "12345678123456781234567812345678",
            "{12345678-1234-5678-1234-567812345678}",
            "urn:uuid:12345678-1234-5678-1234-567812345678",
            "ABCDEF00-1234-5678-1234-567812345678",
            "not-a-uuid",
            "12345678-1234-5678-1234-56781234567",  # 31 hex
            None,
        ],
    ),
    "uuid_v4": (
        f.Uuid(version=4),
        S,
        [
            "07bfd514-7d04-44f3-8519-4c2e24f5a806",  # v4
            "12345678-1234-5678-1234-567812345678",  # v5 digit
            None,
        ],
    ),
    # --- numbers (string inputs; the common table case) ---
    "int": (
        f.Int(),
        S,
        ["42", "-7", "0", "1.5", "abc", "NaN", "+Inf", "  11  ", "1e2", None],
    ),
    "int_min_max": (
        f.Int() | f.Min(0) | f.Max(10),
        S,
        ["5", "0", "10", "-1", "11", "abc", None],
    ),
    "decimal": (
        f.Decimal(),
        S,
        ["3.1415", "-0.5", "42", "abc", "NaN", "-Inf", "1e3", None],
    ),
    "round_quarter": (
        f.Round(to_nearest="0.25"),
        S,
        ["3.35", "1.0", "0.1", "2.55", "abc", None],
    ),
    # --- presence / length ---
    "required": (f.Required(), S, ["x", "", None]),
    "notempty": (f.NotEmpty(), S, ["x", "", None]),
    "empty": (f.Empty(), S, ["", "x", None]),
    "optional_str": (f.Optional(default="fallback"), S, ["keep", "", None]),
    "len_range": (f.Len(min=2, max=4), S, ["ab", "abcd", "a", "abcde", "", None]),
    "length3": (f.Length(3), S, ["abc", "ab", "abcd", None]),
    "maxlength": (f.MaxLength(4), S, ["abc", "abcd", "abcde", None]),
    "maxlength_trunc": (f.MaxLength(4, truncate=True), S, ["abc", "abcdefg", None]),
    "minlength": (f.MinLength(2), S, ["ab", "a", "", None]),
    # --- temporal (ISO subset = strict-path parity) ---
    "datetime_iso": (
        f.Datetime(),
        S,
        [
            "2024-03-01 12:30:45",
            "2024-03-01T12:30:45",
            "2024-03-01",
            "not a date",
            None,
        ],
    ),
    "datetime_tz5": (
        f.Datetime(timezone=5),
        S,
        ["2024-03-01 12:30:45", None],
    ),
    "date_iso": (
        f.Date(),
        S,
        ["2024-03-01", "2024-12-31", "nope", None],
    ),
    # --- chain semantics ---
    "chain_short_circuit": (
        f.Required() | f.MinLength(3) | f.MaxLength(5),
        S,
        ["abcd", "ab", "abcdef", "", None],
    ),
    "flagship": (
        f.Required() | f.Unicode() | f.Strip() | f.MaxLength(20),
        S,
        [
            "  ok text\r\n",
            "é needs nfc  ",
            "",
            None,
            "x" * 30,
        ],
    ),
    "json_decode": (
        f.JsonDecode(),
        S,
        ['{"a": 1, "b": "x"}', '{"a": 7, "b": "y"}', "not json", None],
    ),
    "toml_decode": (
        f.TomlDecode(),
        S,
        ['a = 1\nb = "x"', "not [ toml", None],
    ),
    "bytestring": (
        f.ByteString(),
        S,
        ["plain", "caf\u00e9", "", None],
    ),
    "noop": (
        f.NoOp(),
        S,
        ["anything", "", None],
    ),
}


# --- nested structural cases (dict inputs -> struct columns) ---------------

NESTED_GROUPS: dict[str, tuple] = {
    "mapper_basic": (
        f.FilterMapper(
            {
                "id": f.Required() | f.Int() | f.Min(1),
                "subject": f.NotEmpty() | f.MaxLength(16),
            }
        ),
        "struct<id:string, subject:string>",
        [
            {"id": "42", "subject": "hello"},
            {"id": "0", "subject": "hello"},
            {"id": None, "subject": "x" * 20},
            {"id": "abc", "subject": ""},
        ],
    ),
    "mapper_extra_disallowed": (
        f.FilterMapper(
            {"id": f.Required() | f.Int()},
            allow_extra_keys=False,
        ),
        "struct<id:string, extra:string>",
        [
            {"id": "1", "extra": "boom"},
        ],
    ),
    "mapper_missing_disallowed": (
        f.FilterMapper(
            {"id": f.Required() | f.Int(), "gone": f.NotEmpty()},
            allow_missing_keys=False,
        ),
        "struct<id:string>",
        [
            {"id": "1"},
        ],
    ),
    "mapper_nested": (
        f.FilterMapper(
            {
                "name": f.Required() | f.Unicode(),
                "attachment": f.FilterMapper(
                    {"type": f.Required() | f.Choice(("image", "video"))}
                ),
            }
        ),
        "struct<name:string, attachment:struct<type:string>>",
        [
            {"name": "ok", "attachment": {"type": "image"}},
            {"name": "ok", "attachment": {"type": "nope"}},
        ],
    ),
    "repeater_int": (
        f.FilterRepeater(f.Required() | f.Int() | f.Max(100)),
        "array<string>",
        [
            ["1", "2", "3"],
            ["1", "abc", "200"],
            [],
            None,
        ],
    ),
    "item_field": (
        f.Item("b"),
        "struct<a:string, b:string>",
        [{"a": "1", "b": "x"}, {"a": "2", "b": None}],
    ),
    "pick_keys": (
        f.Pick(["a", "b"]),
        "struct<a:string, c:string>",
        [{"a": "keep", "c": "drop"}],
    ),
    "omit_keys": (
        f.Omit(["c"]),
        "struct<a:string, b:string, c:string>",
        [{"a": "1", "b": "2", "c": "secret"}],
    ),
    "switch_item": (
        f.FilterSwitch(
            lambda v: v["mode"],
            {"num": f.Item("val") | f.Int()},
        ),
        "struct<mode:string, val:string>",
        [
            {"mode": "num", "val": "42"},
            {"mode": "other", "val": "x"},
        ],
    ),
    "repeater_restrict": (
        f.FilterRepeater(f.Int, restrict_keys=[0, 1]),
        "array<string>",
        [["1", "2"], ["1", "2", "3"]],
    ),
}


def main() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    scalar = {}
    for chain_id, (chain, ddl, inputs) in GROUPS.items():
        scalar[chain_id] = {
            "input_type": ddl,
            "cases": [run_case(chain, v) for v in inputs],
        }
    (OUT_DIR / "scalar.json").write_text(
        json.dumps(scalar, indent=1, ensure_ascii=False)
    )
    nested = {}
    for chain_id, (chain, ddl, inputs) in NESTED_GROUPS.items():
        nested[chain_id] = {
            "input_type": ddl,
            "cases": [run_case(chain, v) for v in inputs],
        }
    (OUT_DIR / "nested.json").write_text(
        json.dumps(nested, indent=1, ensure_ascii=False)
    )
    n = sum(len(g["cases"]) for g in scalar.values()) + sum(
        len(g["cases"]) for g in nested.values()
    )
    print(f"wrote {len(scalar)}+{len(nested)} chain groups, {n} cases -> {OUT_DIR}")


if __name__ == "__main__":
    main()
