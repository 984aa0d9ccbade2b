"""Fuzzed parity: hypothesis-generated adversarial text through the
engine AND the live reference library, compared case by case.

The golden suite replays curated reference outputs; this suite generates
fresh inputs every run (deterministic seed) and runs the reference
in-process as the oracle — the strongest statement that the text kernels
(Unicode NFC/strip, CaseFold, Strip, MaxBytes truncation) match on
inputs nobody hand-picked.  Skipped automatically if the reference
tree is unavailable.
"""

from __future__ import annotations

import sys
import types

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402


def _load_reference():
    sys.path.insert(0, "/root/reference/src")
    _cr = types.ModuleType("class_registry")
    _ep = types.ModuleType("class_registry.entry_points")

    class _F:
        def __init__(self, *a, **k):
            pass

        def __class_getitem__(cls, item):
            return cls

        def __iter__(self):
            return iter(())

    _cr.ClassRegistry = _F
    _ep.EntryPointClassRegistry = _F
    _cr.entry_points = _ep
    sys.modules.setdefault("class_registry", _cr)
    sys.modules.setdefault("class_registry.entry_points", _ep)
    import filters as ref

    return ref


try:
    ref = _load_reference()
except Exception:  # pragma: no cover
    ref = None

pytestmark = pytest.mark.skipif(
    ref is None, reason="reference library unavailable"
)

import filters_spark as fs  # noqa: E402
from filters_spark.core.compiler import attach_chain  # noqa: E402

# arbitrary unicode text incl. controls, surrogive-free astral chars,
# combining marks, CR/LF mixes
TEXT = st.text(
    alphabet=st.characters(codec="utf-8"),  # everything UTF-8 encodable
    max_size=60,
)


def _ref_apply(chain, value):
    runner = ref.FilterRunner(chain, value)
    codes = sorted(
        c for cs in runner.error_codes.values() for c in cs
    )
    return runner.cleaned_data, codes


def _engine_apply_batch(spark, spec_chain, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, v string"
    )
    out, val_col, viol_col = attach_chain(df, "v", spec_chain, key="")
    got = {
        r["i"]: (r[val_col], sorted(x["code"] for x in r[viol_col]))
        for r in out.select("i", val_col, viol_col).collect()
    }
    return [got[i] for i in range(len(values))]


PAIRS = [
    ("unicode", lambda: ref.Unicode(), lambda: fs.Unicode()),
    ("casefold", lambda: ref.CaseFold(), lambda: fs.CaseFold()),
    ("strip", lambda: ref.Strip(), lambda: fs.Strip()),
    (
        "maxbytes_trunc",
        lambda: ref.MaxBytes(12, truncate=True),
        lambda: fs.MaxBytes(12, truncate=True),
    ),
    (
        "maxbytes_trunc_suffix",
        lambda: ref.MaxBytes(12, truncate=True, suffix="…"),
        lambda: fs.MaxBytes(12, truncate=True, suffix="…"),
    ),
    ("maxchars_trunc",
     lambda: ref.MaxChars(7, truncate=True, suffix=".."),
     lambda: fs.MaxChars(7, truncate=True, suffix="..")),
    ("regex_digits", lambda: ref.Regex(r"\d+"), lambda: fs.Regex(r"\d+")),
    ("uuid", lambda: ref.Uuid(), lambda: fs.Uuid()),
    ("choice", lambda: ref.Choice(("a", "b", "\xa0")),
     lambda: fs.Choice(("a", "b", "\xa0"))),
    ("length", lambda: ref.Length(3), lambda: fs.Length(3)),
]


@pytest.mark.parametrize("name,ref_chain,spec_chain", PAIRS, ids=[p[0] for p in PAIRS])
@settings(max_examples=12, deadline=None, derandomize=True)
@given(values=st.lists(TEXT, min_size=1, max_size=25))
def test_fuzzed_text_parity(spark, name, ref_chain, spec_chain, values):
    expected = [_ref_apply(ref_chain(), v) for v in values]
    got = _engine_apply_batch(spark, spec_chain(), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"{name}: codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"{name}: cleaned differs for {v!r}: {act_val!r} != {exp_val!r}"
        )


# -- regex-lib fallback (VERDICT r1 next-round #7) --------------------------
#
# Patterns Java's Pattern.compile rejects must route through the Arrow
# kernel running the same `regex` lib as the reference; precompiled
# pattern objects always do (reference accepts them too,
# string.py:636-640).

FALLBACK_CASES = [
    # fuzzy matching is regex-module-only syntax
    ("fuzzy", r"(?:cat){e<=1}"),
    # bare script names are regex-module spelling (Java wants Is-prefix)
    ("script", r"\p{Greek}+"),
]


@pytest.mark.parametrize("name,pattern", FALLBACK_CASES,
                         ids=[c[0] for c in FALLBACK_CASES])
def test_regex_fallback_parity(spark, name, pattern):
    values = ["cat", "cut", "concatenate", "δοκιμή abc", "πp", "", "no"]
    expected = [_ref_apply(ref.Regex(pattern), v) for v in values]
    got = _engine_apply_batch(spark, fs.Regex(pattern), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, f"{name} codes for {v!r}"
        assert act_val == exp_val, f"{name} value for {v!r}"


def test_regex_fallback_uses_kernel_plan(spark):
    """A Java-rejected pattern must plan an ArrowEvalPython stage (the
    kernel), and a Java-accepted one must NOT."""
    df = spark.createDataFrame([("x",)], "v string")
    out, _, _ = attach_chain(df, "v", fs.Regex(r"(?:cat){e<=1}"), key="")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    out2, _, _ = attach_chain(df, "v", fs.Regex(r"\d+"), key="")
    plan2 = out2._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan2


def test_precompiled_pattern_objects(spark):
    import regex as regex_lib

    rx = regex_lib.compile(r"\d+")
    values = ["a1b22", "nope", "33"]
    expected = [_ref_apply(ref.Regex(rx), v) for v in values]
    got = _engine_apply_batch(spark, fs.Regex(rx), values)
    assert got == expected


def test_split_fallback_parity(spark):
    pattern = r"(?:,){e<=0}"  # regex-module-only spelling of a comma
    values = ["a,b,c", "one", "x,y", ""]
    expected = [_ref_apply(ref.Split(pattern), v) for v in values]
    got = _engine_apply_batch(spark, fs.Split(pattern), values)
    assert got == expected


# -- composed-chain fuzz ----------------------------------------------------
#
# Random CHAINS (lead presence op + string transforms + optional
# terminal), not just single filters: exercises first-error
# short-circuit, None-pass, and replacement threading against the live
# reference on arbitrary text.

LEADS = [
    ("req", lambda m: m.Required()),
    ("notempty", lambda m: m.NotEmpty()),
    ("none", None),
]
MIDS = [
    ("unicode", lambda m: m.Unicode()),
    ("strip", lambda m: m.Strip()),
    ("casefold", lambda m: m.CaseFold()),
    ("maxchars", lambda m: m.MaxChars(7, truncate=True)),
    ("maxchars_ps", lambda m: m.MaxChars(9, truncate=True, prefix=">", suffix="..")),
]
TERMS = [
    ("none", None),
    ("len", lambda m: m.Len(min=1, max=30)),
    ("length", lambda m: m.Length(4)),
    ("maxbytes", lambda m: m.MaxBytes(12, truncate=True)),
    ("regex", lambda m: m.Regex(r"[a-z]+")),
    ("split", lambda m: m.Split(r"\s+")),
]


def _build(module, lead_i, mid_is, term_i):
    parts = []
    if LEADS[lead_i][1] is not None:
        parts.append(LEADS[lead_i][1](module))
    for i in mid_is:
        parts.append(MIDS[i][1](module))
    if TERMS[term_i][1] is not None:
        parts.append(TERMS[term_i][1](module))
    if not parts:
        parts = [module.NoOp()]
    chain = parts[0]
    for p in parts[1:]:
        chain = chain | p
    return chain


@settings(max_examples=40, deadline=None, derandomize=True)
@given(
    lead_i=st.integers(0, len(LEADS) - 1),
    mid_is=st.lists(st.integers(0, len(MIDS) - 1), min_size=0, max_size=2),
    term_i=st.integers(0, len(TERMS) - 1),
    values=st.lists(TEXT, min_size=1, max_size=10),
)
def test_fuzzed_chain_parity(spark, lead_i, mid_is, term_i, values):
    import filters_spark as fs_mod

    ref_chain = _build(ref, lead_i, mid_is, term_i)
    spec_chain = _build(fs_mod, lead_i, mid_is, term_i)
    expected = [_ref_apply(ref_chain, v) for v in values]
    got = _engine_apply_batch(spark, spec_chain, values)
    label = (
        LEADS[lead_i][0],
        tuple(MIDS[i][0] for i in mid_is),
        TERMS[term_i][0],
    )
    for v, (exp_val, exp_codes), (act_val, act_codes) in zip(
        values, expected, got
    ):
        assert act_codes == exp_codes, (
            f"{label}: codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        if isinstance(exp_val, bytes) and isinstance(act_val, (bytes, bytearray)):
            act_val = bytes(act_val)
        assert act_val == exp_val, (
            f"{label}: cleaned differs for {v!r}: {act_val!r} != {exp_val!r}"
        )


# -- numeric parity (fuzzed) -------------------------------------------------
# Strings through Int / Decimal / Round / Min / Max chains, reference as
# oracle.  Domain notes: magnitudes stay inside the engine's documented
# 64-bit Int / Decimal(38,18) envelope (DEVIATIONS #4-#6) — the
# deviations are *documented*, so the fuzz asserts parity only where
# parity is claimed.

NUM_TOKENS = st.one_of(
    st.integers(-(2**62), 2**62).map(str),
    st.integers(-(10**6), 10**6).map(lambda n: f"{n}.0"),
    st.integers(-(10**4), 10**4).map(lambda n: f"  {n} "),
    st.integers(-(10**4), 10**4).map(lambda n: f"{n}.25"),
    st.sampled_from(
        [
            "", "abc", "12a", "+7", "-0", "0.5", "7.25", "-3.50",
            "00042", ".5", "5.", "- 5", "1 000", "١٢٣",
        ]
    ),
)

NUM_PAIRS = [
    ("int", lambda: ref.Int(), lambda: fs.Int()),
    (
        "int_minmax",
        lambda: ref.Int() | ref.Min(-5) | ref.Max(1000),
        lambda: fs.Int() | fs.Min(-5) | fs.Max(1000),
    ),
    (
        "round_quarter",
        lambda: ref.Round(to_nearest="0.25"),
        lambda: fs.Round(to_nearest="0.25"),
    ),
    (
        "round_down",
        lambda: ref.Round(to_nearest="10", rounding="ROUND_DOWN"),
        lambda: fs.Round(to_nearest="10", rounding="ROUND_DOWN"),
    ),
]


@pytest.mark.parametrize(
    "name,ref_chain,spec_chain", NUM_PAIRS, ids=[p[0] for p in NUM_PAIRS]
)
@settings(max_examples=10, deadline=None, derandomize=True)
@given(values=st.lists(NUM_TOKENS, min_size=1, max_size=25))
def test_fuzzed_numeric_parity(spark, name, ref_chain, spec_chain, values):
    expected = [_ref_apply(ref_chain(), v) for v in values]
    got = _engine_apply_batch(spark, spec_chain(), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"{name}: codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        if exp_val is None or act_val is None:
            assert act_val == exp_val, (
                f"{name}: cleaned differs for {v!r}: "
                f"{act_val!r} != {exp_val!r}"
            )
        else:
            # numeric equality: Decimal('1E+3') == Decimal('1000')
            assert act_val == exp_val, (
                f"{name}: cleaned differs for {v!r}: "
                f"{act_val!r} != {exp_val!r}"
            )


# -- temporal parity (fuzzed) ------------------------------------------------
# ISO-shaped datetime strings (naive, offset-bearing, date-only,
# fractional seconds) through Datetime/Date, reference as oracle.
# Cleaned values compare as UTC instants (the engine renders the
# reference's always-UTC contract).

_DT = st.datetimes(
    min_value=__import__("datetime").datetime(1905, 1, 2, 0, 0, 0),
    max_value=__import__("datetime").datetime(2099, 12, 30, 23, 59, 59),
)


@st.composite
def _iso_strings(draw):
    dt = draw(_DT).replace(microsecond=draw(st.sampled_from([0, 250000])))
    form = draw(st.sampled_from(["naive", "t", "offset", "date", "junk"]))
    if form == "naive":
        return dt.strftime("%Y-%m-%d %H:%M:%S")
    if form == "t":
        return dt.strftime("%Y-%m-%dT%H:%M:%S")
    if form == "offset":
        off = draw(st.sampled_from(["+00:00", "+05:30", "-08:00"]))
        return dt.strftime("%Y-%m-%dT%H:%M:%S") + off
    if form == "date":
        return dt.strftime("%Y-%m-%d")
    return draw(st.sampled_from(["not a date", "2024-13-45", ""]))


def _ref_dt_apply(chain, value):
    runner = ref.FilterRunner(chain, value)
    codes = sorted(c for cs in runner.error_codes.values() for c in cs)
    return runner.cleaned_data, codes


@settings(max_examples=10, deadline=None, derandomize=True)
@given(values=st.lists(_iso_strings(), min_size=1, max_size=25))
def test_fuzzed_datetime_parity(spark, values):
    import datetime as _d

    expected = [_ref_dt_apply(ref.Datetime(), v) for v in values]
    got = _engine_apply_batch(spark, fs.Datetime(), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"datetime codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        if exp_val is None:
            assert act_val is None, (v, act_val)
        else:
            # reference returns aware UTC; engine returns the same
            # instant as a naive-UTC timestamp under the UTC session
            exp_naive = exp_val.astimezone(_d.timezone.utc).replace(
                tzinfo=None
            )
            assert act_val == exp_naive, (
                f"datetime cleaned differs for {v!r}: "
                f"{act_val!r} != {exp_naive!r}"
            )


@settings(max_examples=10, deadline=None, derandomize=True)
@given(values=st.lists(_iso_strings(), min_size=1, max_size=25))
def test_fuzzed_date_parity(spark, values):
    expected = [_ref_dt_apply(ref.Date(), v) for v in values]
    got = _engine_apply_batch(spark, fs.Date(), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"date codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"date cleaned differs for {v!r}: {act_val!r} != {exp_val!r}"
        )


# -- MaxBytes truncation edges + Base64Decode dialects (VERDICT r3 #7) ------
#
# MaxBytes: inputs biased to multibyte boundaries (2/3/4-byte UTF-8,
# combining marks, an explicit BOM char) with tiny byte budgets and
# every prefix/suffix/encoding combination the reference supports —
# truncation must never orphan a multibyte sequence, and utf-16 budgets
# must account for the BOM exactly like the reference.

MB_CHARS = st.sampled_from(
    ["a", "é", "€", "𝄞", "﻿", "字", " ", "́", "ß"]
)
MB_TEXT = st.lists(MB_CHARS, min_size=0, max_size=10).map("".join)

MAXBYTES_CONFIGS = [
    ("plain", dict(truncate=True)),
    ("reject", dict(truncate=False)),
    ("suffix", dict(truncate=True, suffix="…")),
    ("prefix", dict(truncate=True, prefix=">>")),
    ("prefix_suffix", dict(truncate=True, prefix="[", suffix="..")),
    ("utf16", dict(truncate=True, encoding="utf-16")),
    ("utf16_suffix", dict(truncate=True, encoding="utf-16", suffix="…")),
]


@pytest.mark.parametrize(
    "name,kw", MAXBYTES_CONFIGS, ids=[c[0] for c in MAXBYTES_CONFIGS]
)
@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    values=st.lists(MB_TEXT, min_size=1, max_size=10),
    max_bytes=st.integers(3, 17),
)
def test_fuzzed_maxbytes_edges(spark, name, kw, values, max_bytes):
    expected = [
        _ref_apply(ref.MaxBytes(max_bytes, **kw), v) for v in values
    ]
    got = _engine_apply_batch(spark, fs.MaxBytes(max_bytes, **kw), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        if isinstance(act_val, (bytearray, memoryview)):
            act_val = bytes(act_val)
        assert act_codes == exp_codes, (
            f"{name}/mb={max_bytes}: codes differ for {v!r}: "
            f"{act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"{name}/mb={max_bytes}: value differs for {v!r}: "
            f"{act_val!r} != {exp_val!r}"
        )


# Base64Decode: junk drawn from the base64 alphabet superset (both
# dialects + '=' + whitespace) PLUS genuinely valid encodings of random
# bytes in both dialects — exercises whitespace stripping, the
# alphabet check, mixed-dialect rejection, and re-padding.

import base64 as _b64  # noqa: E402

_B64_JUNK = st.text(
    alphabet="ABCDef0189+/-_= \t\n", max_size=20
).map(lambda s: s.encode("ascii"))
_B64_RAW = st.binary(max_size=12)
B64_INPUT = st.one_of(
    _B64_JUNK,
    _B64_RAW.map(_b64.b64encode),
    _B64_RAW.map(_b64.urlsafe_b64encode),
)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(values=st.lists(B64_INPUT, min_size=1, max_size=15))
def test_fuzzed_base64_parity(spark, values):
    expected = [_ref_apply(ref.Base64Decode(), v) for v in values]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i int, v binary"
    )
    out, val_col, viol_col = attach_chain(df, "v", fs.Base64Decode(), key="")
    got = {
        r["i"]: (r[val_col], sorted(x["code"] for x in r[viol_col]))
        for r in out.select("i", val_col, viol_col).collect()
    }
    for i, v in enumerate(values):
        exp_val, exp_codes = expected[i]
        act_val, act_codes = got[i]
        if isinstance(act_val, (bytearray, memoryview)):
            act_val = bytes(act_val)
        assert act_codes == exp_codes, (
            f"base64: codes differ for {v!r}: {act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"base64: value differs for {v!r}: {act_val!r} != {exp_val!r}"
        )


# -- FilterMapper nested-record fuzz ----------------------------------------
#
# Random per-key chains, missing/extra-key policies, and None-bearing
# records vs the live reference: exercises dotted violation keys, the
# static missing-key model (key absent from the struct schema), extra
# passthrough/drop, and None-pass inside mapped fields.  The golden
# suite replays curated mapper cases; this generates fresh ones.

MAPPER_CHAINS = [
    ("none", None),
    ("req", lambda m: m.Required()),
    ("unicode", lambda m: m.Unicode()),
    ("strip", lambda m: m.Strip()),
    ("casefold", lambda m: m.CaseFold()),
    ("maxchars", lambda m: m.MaxChars(5, truncate=True)),
    ("choice", lambda m: m.Choice(("x", "y"))),
    ("req_strip", lambda m: m.Required() | m.Strip()),
]


@settings(max_examples=25, deadline=None, derandomize=True)
@given(data=st.data())
def test_fuzzed_mapper_parity(spark, data):
    keys = ["a", "b", "c"]
    fmap_idx = {
        k: data.draw(
            st.integers(0, len(MAPPER_CHAINS) - 1), label=f"chain_{k}"
        )
        for k in keys
    }
    allow_missing = data.draw(st.booleans(), label="allow_missing")
    allow_extra = data.draw(st.booleans(), label="allow_extra")
    present = sorted(
        data.draw(
            st.sets(st.sampled_from(keys + ["z"]), min_size=1),
            label="present",
        )
    )
    n_rows = data.draw(st.integers(1, 5), label="n_rows")
    cell = st.one_of(st.none(), st.sampled_from(
        ["", "x", "y", "  x ", "X", "héllo", "longer than five", " y"]
    ))
    rows = [
        tuple(data.draw(cell, label=f"v{r}_{k}") for k in present)
        for r in range(n_rows)
    ]

    def build(m):
        fm = {}
        for k in keys:
            c = MAPPER_CHAINS[fmap_idx[k]][1]
            fm[k] = None if c is None else c(m)
        return m.FilterMapper(
            fm,
            allow_missing_keys=allow_missing,
            allow_extra_keys=allow_extra,
        )

    expected = []
    for r in rows:
        d = dict(zip(present, r))
        runner = ref.FilterRunner(build(ref), d)
        codes = sorted(
            (k2, c)
            for k2, cs in runner.error_codes.items()
            for c in cs
        )
        expected.append((runner.cleaned_data, codes))

    import filters_spark as fs_mod
    from pyspark.sql import functions as F

    schema = "i int, " + ", ".join(f"`{k}` string" for k in present)
    df = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(rows)], schema
    )
    sdf = df.select(
        "i", F.struct(*[F.col(k) for k in present]).alias("v")
    )
    out, val_col, viol_col = attach_chain(sdf, "v", build(fs_mod), key="")
    got = {
        r["i"]: (
            r[val_col],
            sorted((x["key"], x["code"]) for x in r[viol_col]),
        )
        for r in out.select("i", val_col, viol_col).collect()
    }
    label = (
        f"fmap={[MAPPER_CHAINS[fmap_idx[k]][0] for k in keys]} "
        f"missing_ok={allow_missing} extra_ok={allow_extra} "
        f"present={present}"
    )
    for i, (exp_val, exp_codes) in enumerate(expected):
        act_val, act_codes = got[i]
        act_d = act_val.asDict() if act_val is not None else None
        assert act_codes == exp_codes, (
            f"{label}: codes for row {rows[i]!r}: "
            f"{act_codes} != {exp_codes}"
        )
        assert act_d == exp_val, (
            f"{label}: cleaned for row {rows[i]!r}: "
            f"{act_d!r} != {exp_val!r}"
        )


@settings(max_examples=25, deadline=None, derandomize=True)
@given(data=st.data())
def test_fuzzed_repeater_parity(spark, data):
    """FilterRepeater over arrays vs the live reference: per-element
    chains, index-keyed violations, None elements, empty and null
    arrays."""
    from pyspark.sql import functions as F  # noqa: F811

    import filters_spark as fs_mod

    chain_i = data.draw(
        st.integers(1, len(MAPPER_CHAINS) - 1), label="chain"
    )
    n_rows = data.draw(st.integers(1, 5), label="n_rows")
    cell = st.one_of(st.none(), st.sampled_from(
        ["", "x", "y", "  x ", "X", "héllo", "longer than five"]
    ))
    arr = st.one_of(
        st.none(), st.lists(cell, min_size=0, max_size=4)
    )
    rows = [data.draw(arr, label=f"row{r}") for r in range(n_rows)]

    def build(m):
        return m.FilterRepeater(MAPPER_CHAINS[chain_i][1](m))

    expected = []
    for r in rows:
        runner = ref.FilterRunner(build(ref), r)
        codes = sorted(
            (k2, c)
            for k2, cs in runner.error_codes.items()
            for c in cs
        )
        expected.append((runner.cleaned_data, codes))

    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "i int, v array<string>"
    )
    # kernel-bearing chains inside a repeater route through the explode
    # path, which the validate() surface picks automatically
    out = fs_mod.validate(df, {"v": build(fs_mod)})
    got = {
        r["i"]: (
            r["v"],
            sorted(
                # engine keys carry the column prefix ("v.0"); the
                # scalar reference keys are bare element indices
                (x["key"].removeprefix("v."), x["code"])
                for x in r["_violations"]
            ),
        )
        for r in out.collect()
    }
    name = MAPPER_CHAINS[chain_i][0]
    for i, (exp_val, exp_codes) in enumerate(expected):
        act_val, act_codes = got[i]
        act_l = list(act_val) if act_val is not None else None
        exp_l = list(exp_val) if exp_val is not None else None
        assert act_codes == exp_codes, (
            f"repeater[{name}]: codes for {rows[i]!r}: "
            f"{act_codes} != {exp_codes}"
        )
        assert act_l == exp_l, (
            f"repeater[{name}]: cleaned for {rows[i]!r}: "
            f"{act_l!r} != {exp_l!r}"
        )


# -- Uuid / IpAddress targeted fuzz -----------------------------------------
#
# The generic text fuzz almost never generates well-formed UUIDs or IP
# literals, so these surfaces get targeted generators: near-miss
# shapes, alternative spellings Python's constructors accept, and both
# families' canonicalisation.

UUIDISH = st.one_of(
    st.uuids().map(str),
    st.uuids().map(lambda u: str(u).upper()),
    st.uuids().map(lambda u: u.hex),                 # no hyphens
    st.uuids().map(lambda u: "{" + str(u) + "}"),    # braced
    st.uuids().map(lambda u: "urn:uuid:" + str(u)),  # URN form
    st.uuids().map(lambda u: str(u)[:-1]),           # truncated
    st.uuids().map(lambda u: str(u) + "0"),          # too long
    st.sampled_from(["", "not-a-uuid", "123", "g" * 32, "-" * 36]),
)


@pytest.mark.parametrize("version", [None, 4])
@settings(max_examples=15, deadline=None, derandomize=True)
@given(values=st.lists(UUIDISH, min_size=1, max_size=20))
def test_fuzzed_uuid_parity(spark, version, values):
    import uuid as _uuid

    expected = [
        _ref_apply(ref.Uuid(version=version), v) for v in values
    ]
    got = _engine_apply_batch(
        spark, fs.Uuid(version=version), values
    )
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        if isinstance(exp_val, _uuid.UUID):
            exp_val = str(exp_val)  # engine canonicalises to string
        assert act_codes == exp_codes, (
            f"uuid(v={version}): codes for {v!r}: "
            f"{act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"uuid(v={version}): cleaned for {v!r}: "
            f"{act_val!r} != {exp_val!r}"
        )


_IP_OCTET = st.integers(0, 299).map(str)
IPISH = st.one_of(
    st.tuples(_IP_OCTET, _IP_OCTET, _IP_OCTET, _IP_OCTET).map(
        lambda t: ".".join(t)
    ),
    st.sampled_from(
        [
            "1.2.3.4", "01.2.3.4", "1.2.3", "1.2.3.4.5", "255.255.255.255",
            "256.1.1.1", " 1.2.3.4", "1.2.3.4 ", "0.0.0.0",
            "::1", "::", "2001:db8::1", "2001:DB8::1",
            "2001:0db8:0000:0000:0000:0000:0000:0001",
            "::ffff:1.2.3.4", "fe80::1", "1::2::3", "12345::", ":", "",
            "abcd:ef01:2345:6789:abcd:ef01:2345:6789",
        ]
    ),
)


@pytest.mark.parametrize(
    "kw",
    [dict(ipv4=True, ipv6=False), dict(ipv4=False, ipv6=True),
     dict(ipv4=True, ipv6=True)],
    ids=["v4", "v6", "both"],
)
@settings(max_examples=15, deadline=None, derandomize=True)
@given(values=st.lists(IPISH, min_size=1, max_size=20))
def test_fuzzed_ipaddress_parity(spark, kw, values):
    expected = [_ref_apply(ref.IpAddress(**kw), v) for v in values]
    got = _engine_apply_batch(spark, fs.IpAddress(**kw), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"ip{kw}: codes for {v!r}: {act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"ip{kw}: cleaned for {v!r}: {act_val!r} != {exp_val!r}"
        )


# -- ByteString / Split(keys=) fuzz ------------------------------------------

BYTESTRING_CONFIGS = [
    ("raw", dict(normalize=False)),
    ("normalized", dict(normalize=True)),
]


@pytest.mark.parametrize(
    "name,kw", BYTESTRING_CONFIGS, ids=[c[0] for c in BYTESTRING_CONFIGS]
)
@settings(max_examples=12, deadline=None, derandomize=True)
@given(values=st.lists(
    st.one_of(TEXT, st.sampled_from(["a\r\nb", "x\rz", "​зж", "ﬁn"])),
    min_size=1, max_size=20,
))
def test_fuzzed_bytestring_parity(spark, name, kw, values):
    expected = [_ref_apply(ref.ByteString(**kw), v) for v in values]
    got = _engine_apply_batch(spark, fs.ByteString(**kw), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        if isinstance(act_val, (bytearray, memoryview)):
            act_val = bytes(act_val)
        assert act_codes == exp_codes, (
            f"bytestring[{name}]: codes for {v!r}: "
            f"{act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"bytestring[{name}]: cleaned for {v!r}: "
            f"{act_val!r} != {exp_val!r}"
        )


SPLIT_CONFIGS = [
    ("ws_list", r"\s+", None),
    ("comma_keys2", r",", ("a", "b")),
    ("dash_keys4", r"[-:]", ("a", "b", "c", "d")),
]


@pytest.mark.parametrize(
    "name,pattern,keys", SPLIT_CONFIGS, ids=[c[0] for c in SPLIT_CONFIGS]
)
@settings(max_examples=12, deadline=None, derandomize=True)
@given(values=st.lists(
    st.sampled_from(
        ["a,b", "a,b,c", "a", "", "x-y:z", "p q  r", ",", "a,,b",
         "one-two", " lead", "a,b,c,d,e"]
    ),
    min_size=1, max_size=12,
))
def test_fuzzed_split_parity(spark, name, pattern, keys, values):
    expected = [
        _ref_apply(ref.Split(pattern, keys=keys), v) for v in values
    ]
    got = _engine_apply_batch(spark, fs.Split(pattern, keys=keys), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        if act_val is not None and not isinstance(act_val, (dict, list)):
            act_val = list(act_val)
        if isinstance(exp_val, list) and isinstance(act_val, list):
            pass
        assert act_codes == exp_codes, (
            f"split[{name}]: codes for {v!r}: {act_codes} != {exp_codes}"
        )
        assert act_val == exp_val, (
            f"split[{name}]: cleaned for {v!r}: "
            f"{act_val!r} != {exp_val!r}"
        )


# -- Decimal fuzz (within the documented (38,18) bound) ----------------------

DECIMALISH = st.one_of(
    st.decimals(
        min_value=-10**9, max_value=10**9,
        allow_nan=False, allow_infinity=False, places=12,
    ).map(str),
    st.sampled_from(
        ["nan", "NaN", "inf", "-Infinity", "1e3", "-0.00", "1.005",
         "2.675", "abc", "", "+5", " 1 ", "0x10", "1_000", ".5", "5.",
         "１２３", "4_2", "+_5", "\u00a042\u00a0", "１.５", "_1", "1_"]
    ),
)

DECIMAL_CONFIGS = [("free", None), ("quantized2", 2)]


@pytest.mark.parametrize(
    "name,prec", DECIMAL_CONFIGS, ids=[c[0] for c in DECIMAL_CONFIGS]
)
@settings(max_examples=15, deadline=None, derandomize=True)
@given(values=st.lists(DECIMALISH, min_size=1, max_size=20))
def test_fuzzed_decimal_parity(spark, name, prec, values):
    import decimal as _dec

    expected = [
        _ref_apply(ref.Decimal(max_precision=prec), v) for v in values
    ]
    got = _engine_apply_batch(
        spark, fs.Decimal(max_precision=prec), values
    )
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"decimal[{name}]: codes for {v!r}: "
            f"{act_codes} != {exp_codes}"
        )
        if exp_val is None:
            assert act_val is None, f"decimal[{name}]: {v!r} -> {act_val!r}"
        else:
            # engine carries scale-18 decimals; compare numerically
            assert act_val is not None and _dec.Decimal(act_val) == exp_val, (
                f"decimal[{name}]: cleaned for {v!r}: "
                f"{act_val!r} != {exp_val!r}"
            )


# -- Decimal long-fraction fuzz (sticky-truncation guard) --------------------
#
# Strings with >18 fractional digits used to double-round: the bounded
# (38,18) cast HALF_UPs at digit 18 and can manufacture an exact tie the
# HALF_EVEN bround then breaks the wrong way ('1.0149999999999999995'@2
# → 1.02 vs the reference's single unbounded quantize → 1.01).  The
# sticky 18th digit (_sticky_truncate) makes every quantize at scale ≤ 17
# exact; this fuzz hammers tie-adjacent shapes specifically.

_DIGITS = "0123456789"


@st.composite
def _long_fraction(draw):
    sign = draw(st.sampled_from(["", "-", "+"]))
    ipart = draw(st.text(alphabet=_DIGITS, min_size=0, max_size=3))
    shape = draw(st.sampled_from(["tie", "near_tie", "random"]))
    prec = draw(st.integers(min_value=0, max_value=17))
    if shape == "random":
        frac = draw(st.text(alphabet=_DIGITS, min_size=19, max_size=30))
    else:
        head = draw(st.text(alphabet=_DIGITS, min_size=prec, max_size=prec))
        pad = draw(st.integers(min_value=17, max_value=28)) - prec
        if shape == "tie":
            frac = head + "5" + "0" * pad
        else:  # near_tie: a 4/5 boundary digit then a sparse tail
            frac = (
                head
                + draw(st.sampled_from("45"))
                + "0" * pad
                + draw(st.sampled_from(["", "1", "5", "9"]))
            )
    return sign + ipart + "." + frac, prec


@settings(max_examples=60, deadline=None, derandomize=True)
@given(case=_long_fraction())
def test_fuzzed_decimal_long_fraction_parity(spark, case):
    value, prec = case
    import decimal as _dec

    exp_val, exp_codes = _ref_apply(ref.Decimal(max_precision=prec), value)
    (act_val, act_codes), = _engine_apply_batch(
        spark, fs.Decimal(max_precision=prec), [value]
    )
    assert act_codes == exp_codes, (
        f"decimal long-frac codes for {value!r}: {act_codes} != {exp_codes}"
    )
    if exp_val is None:
        assert act_val is None
    else:
        assert act_val is not None and _dec.Decimal(act_val) == exp_val, (
            f"decimal long-frac @{prec} for {value!r}: "
            f"{act_val!r} != {exp_val!r}"
        )


# -- Datetime fuzzy-format fuzz (the dateutil kernel path) -------------------

FUZZY_DT = st.sampled_from(
    [
        # absolute spellings only: relative ones ("10:30", "noon")
        # resolve against the current date in both parsers and would
        # flake across a midnight boundary between the two evaluations
        "Jan 5 2020", "5 Jan 2020 14:30", "May 5, 2020 1:02pm",
        "2020/05/06", "05/06/2020", "6-May-2020", "20200506",
        "Tue, 05 May 2020 10:00:00 GMT",
        "2020-05-06 10:00:00.123456", "Q2 2020",
        "5th of May 2020", "1588732800", "not a date at all",
    ]
)


@settings(max_examples=10, deadline=None, derandomize=True)
@given(values=st.lists(FUZZY_DT, min_size=1, max_size=16))
def test_fuzzed_datetime_fuzzy_formats(spark, values):
    """Non-ISO spellings exercise the dateutil kernel path
    (``strict=False`` — the default strict path is the JVM format
    list, DEVIATIONS #16): the engine runs the SAME parser the
    reference does, so every accepted format and every rejection must
    agree."""
    import datetime as _d

    expected = [_ref_dt_apply(ref.Datetime(), v) for v in values]
    got = _engine_apply_batch(spark, fs.Datetime(strict=False), values)
    for v, exp, act in zip(values, expected, got):
        exp_val, exp_codes = exp
        act_val, act_codes = act
        assert act_codes == exp_codes, (
            f"fuzzy datetime codes differ for {v!r}: "
            f"{act_codes} != {exp_codes}"
        )
        if exp_val is None:
            assert act_val is None, (v, act_val)
        else:
            exp_naive = exp_val.astimezone(_d.timezone.utc).replace(
                tzinfo=None
            )
            assert act_val == exp_naive, (
                f"fuzzy datetime cleaned differs for {v!r}: "
                f"{act_val!r} != {exp_naive!r}"
            )
