"""Golden parity suite: replay reference-generated fixtures through the
Spark engine and byte-match codes, messages, and cleaned values.

Fixtures were generated once from the reference library (the oracle) by
``scripts/gen_goldens.py``; this suite has no dependency on the reference.
"""

from __future__ import annotations

import pytest

import filters_spark as fs
from filters_spark.core.compiler import attach_chain
from tests.golden_utils import (
    decode,
    group_violations,
    load_goldens,
    values_equal,
)

# chain_id -> our compiled-spec chain, mirroring scripts/gen_goldens.py
SPEC_CHAINS = {
    "unicode": lambda: fs.Unicode(),
    "unicode_bytes": lambda: fs.Unicode(),
    "casefold": lambda: fs.CaseFold(),
    "strip": lambda: fs.Strip(),
    "strip_custom": lambda: fs.Strip(leading=r"\d+", trailing=r"[xyz]+"),
    "regex_digits": lambda: fs.Regex(r"\d+"),
    "split_csv": lambda: fs.Split(r",\s*"),
    "split_keys": lambda: fs.Split(r":", keys=["h", "m", "s"]),
    "choice_cs": lambda: fs.Choice(("Red", "Green", "Blue")),
    "choice_ci": lambda: fs.Choice(("Red", "Green", "Blue"), case_sensitive=False),
    "maxchars": lambda: fs.MaxChars(5),
    "maxchars_trunc": lambda: fs.MaxChars(5, truncate=True, suffix=".."),
    "maxbytes": lambda: fs.MaxBytes(10),
    "maxbytes_trunc": lambda: fs.MaxBytes(10, truncate=True),
    "maxbytes_trunc_suffix": lambda: fs.MaxBytes(10, truncate=True, suffix="..."),
    "base64": lambda: fs.Base64Decode(),
    "ipv4": lambda: fs.IpAddress(),
    "ipv6": lambda: fs.IpAddress(ipv4=False, ipv6=True),
    "uuid": lambda: fs.Uuid(),
    "uuid_v4": lambda: fs.Uuid(version=4),
    "int": lambda: fs.Int(),
    "int_min_max": lambda: fs.Int() | fs.Min(0) | fs.Max(10),
    "decimal": lambda: fs.Decimal(),
    "round_quarter": lambda: fs.Round(to_nearest="0.25"),
    "required": lambda: fs.Required(),
    "notempty": lambda: fs.NotEmpty(),
    "empty": lambda: fs.Empty(),
    "optional_str": lambda: fs.Optional(default="fallback"),
    "len_range": lambda: fs.Len(min=2, max=4),
    "length3": lambda: fs.Length(3),
    "maxlength": lambda: fs.MaxLength(4),
    "maxlength_trunc": lambda: fs.MaxLength(4, truncate=True),
    "minlength": lambda: fs.MinLength(2),
    "datetime_iso": lambda: fs.Datetime(),
    "datetime_tz5": lambda: fs.Datetime(timezone=5),
    "date_iso": lambda: fs.Date(),
    "chain_short_circuit": lambda: fs.Required() | fs.MinLength(3) | fs.MaxLength(5),
    "flagship": lambda: fs.Required() | fs.Unicode() | fs.Strip() | fs.MaxLength(20),
    # JSON: declared schema (Spark is schema-first; inputs carry all keys)
    "json_decode": lambda: fs.JsonDecode("a BIGINT, b STRING"),
    # TOML: engine returns the doc as a JSON string (documented deviation,
    # bridged in values_equal)
    "toml_decode": lambda: fs.TomlDecode(),
    "bytestring": lambda: fs.ByteString(),
    "noop": lambda: fs.NoOp(),
}

NESTED_SPEC_CHAINS = {
    "mapper_basic": lambda: fs.FilterMapper(
        {
            "id": fs.Required() | fs.Int() | fs.Min(1),
            "subject": fs.NotEmpty() | fs.MaxLength(16),
        }
    ),
    "mapper_extra_disallowed": lambda: fs.FilterMapper(
        {"id": fs.Required() | fs.Int()}, allow_extra_keys=False
    ),
    "mapper_missing_disallowed": lambda: fs.FilterMapper(
        {"id": fs.Required() | fs.Int(), "gone": fs.NotEmpty()},
        allow_missing_keys=False,
    ),
    "mapper_nested": lambda: fs.FilterMapper(
        {
            "name": fs.Required() | fs.Unicode(),
            "attachment": fs.FilterMapper(
                {"type": fs.Required() | fs.Choice(("image", "video"))}
            ),
        }
    ),
    "repeater_int": lambda: fs.FilterRepeater(
        fs.Required() | fs.Int() | fs.Max(100)
    ),
    "item_field": lambda: fs.Item("b"),
    "pick_keys": lambda: fs.Pick(["a", "b"]),
    "omit_keys": lambda: fs.Omit(["c"]),
    "switch_item": lambda: fs.FilterSwitch(
        "mode", {"num": fs.Item("val") | fs.Int()}
    ),
    "repeater_restrict": lambda: fs.FilterRepeater(
        fs.Int(), restrict_keys=[0, 1]
    ),
}


def _run_group(spark, chain, group):
    input_type = group["input_type"]
    inputs = [decode(c["input"]) for c in group["cases"]]
    rows = [(i, v) for i, v in enumerate(inputs)]
    df = spark.createDataFrame(rows, f"case_idx int, v {input_type}")
    out, val_col, viol_col = attach_chain(df, "v", chain, key="")
    collected = {
        r["case_idx"]: r
        for r in out.select("case_idx", val_col, viol_col).collect()
    }
    return [(collected[i][val_col], collected[i][viol_col]) for i in range(len(inputs))]


def _assert_group(spark, chain, group, chain_id):
    results = _run_group(spark, chain, group)
    for idx, (case, (actual_value, actual_viols)) in enumerate(
        zip(group["cases"], results)
    ):
        codes, msgs = group_violations(actual_viols)
        label = f"{chain_id}[{idx}] input={case['input']!r}"
        assert codes == case["codes"], (
            f"{label}: codes {codes} != expected {case['codes']}"
        )
        assert msgs == case["messages"], (
            f"{label}: messages {msgs} != expected {case['messages']}"
        )
        # cleaned is compared for INVALID cases too: reference
        # cleaned_data = chain.apply(data) regardless of validity
        # (handlers.py:344); scalar failures clean to None, structural
        # combinators return partial output (test_filter_repeater.py:49)
        expected_cleaned = decode(case["cleaned"])
        assert values_equal(expected_cleaned, actual_value), (
            f"{label}: cleaned {actual_value!r} != expected "
            f"{expected_cleaned!r}"
        )


@pytest.mark.parametrize("chain_id", sorted(SPEC_CHAINS))
def test_scalar_golden(spark, chain_id):
    goldens = load_goldens("scalar")
    _assert_group(spark, SPEC_CHAINS[chain_id](), goldens[chain_id], chain_id)


@pytest.mark.parametrize("chain_id", sorted(NESTED_SPEC_CHAINS))
def test_nested_golden(spark, chain_id):
    goldens = load_goldens("nested")
    _assert_group(
        spark, NESTED_SPEC_CHAINS[chain_id](), goldens[chain_id], chain_id
    )
