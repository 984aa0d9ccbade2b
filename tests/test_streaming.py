"""Structured Streaming tests: file-source micro-batches with
``availableNow`` triggers and memory sinks (deterministic, no clock)."""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import filters_spark as fs
from filters_spark.streaming import (
    conversation_monitor,
    validate_stream,
    windowed_violation_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

ROWS = [
    ("c1", 0, "system", "hello", "2026-01-01 00:00:00"),
    ("c1", 1, "user", "", "2026-01-01 00:00:10"),  # empty text
    ("c1", 3, "assistant", "gap after 1", "2026-01-01 00:00:20"),
    ("c1", 3, "assistant", "dup idx", "2026-01-01 00:00:30"),
    ("c2", 0, "robot", "bad role", "2026-01-01 00:01:00"),
    ("c2", 1, "user", "ok", "2026-01-01 00:01:10"),
    ("c2", 0, "user", "out of order", "2026-01-01 00:01:20"),
]

RULES = {
    "role": fs.Choice(("system", "user", "assistant", "tool")),
    "text": fs.Required(),
}


@pytest.fixture()
def stream_input(spark, tmp_path):
    import datetime

    src = tmp_path / "stream_src"
    full = spark.createDataFrame(
        [
            (c, i, r, t, datetime.datetime.fromisoformat(ts))
            for c, i, r, t, ts in ROWS
        ],
        SCHEMA,
    )
    full.coalesce(1).write.mode("overwrite").parquet(str(src))
    yield str(src)
    shutil.rmtree(src, ignore_errors=True)


def _run_stream(spark, out_df, name: str, mode: str = "append"):
    q = (
        out_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_validate_stream_is_stateless_projection(spark, stream_input):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    assert stream.isStreaming
    out = validate_stream(stream, RULES)
    name = "t_" + uuid.uuid4().hex[:8]
    all_rows = _run_stream(spark, out, name).collect()
    invalid = [r for r in all_rows if not r["_is_valid"]]
    codes = {v["code"] for r in invalid for v in r["_violations"]}
    assert codes == {"empty", "not_valid_choice"}
    assert len(all_rows) == len(ROWS)
    assert len(invalid) == 2


def test_windowed_violation_counts(spark, stream_input):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    out = windowed_violation_counts(
        stream, RULES, ts_col="ts", window="1 minute", watermark="2 minutes"
    )
    name = "t_" + uuid.uuid4().hex[:8]
    # complete mode: a single availableNow batch leaves every window
    # open (watermark trails max event time), append would emit nothing
    got = _run_stream(spark, out, name, mode="complete").collect()
    by = {(r["key"], r["code"]): r["n"] for r in got}
    assert by[("text", "empty")] == 1
    assert by[("role", "not_valid_choice")] == 1
    # windows are aligned tumbling minutes
    assert all(r["window_start"].second == 0 for r in got)


def test_windowed_counts_watermark_advances_past_last_violation(
    spark, tmp_path
):
    """The watermark must track the WHOLE stream's event time: an early
    violation followed by a long violation-free tail still finalises
    (and emits, in append mode) the violation's window.  Before the fix,
    Catalyst pushed the explode's inferred size>0 filter below the
    EventTimeWatermark node, the watermark stalled at the LAST VIOLATION
    minus the delay, and append mode emitted nothing."""
    import datetime
    import shutil

    rows = [("c1", 0, "robot", "bad role", "2026-01-01 00:00:30")] + [
        ("c1", i, "user", "ok", f"2026-01-01 00:{m:02d}:00")
        for i, m in enumerate(range(1, 10), start=1)
    ]
    src = tmp_path / "wm_src"
    spark.createDataFrame(
        [
            (c, i, r, t, datetime.datetime.fromisoformat(ts))
            for c, i, r, t, ts in rows
        ],
        SCHEMA,
    ).coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    out = windowed_violation_counts(
        stream, RULES, ts_col="ts", window="1 minute", watermark="2 minutes"
    )
    name = "t_" + uuid.uuid4().hex[:8]
    got = _run_stream(spark, out, name, mode="append").collect()
    # final watermark = 00:09 - 2min = 00:07 > the violation window's
    # end (00:01), so append mode must emit it — and nothing null-keyed
    assert [(r["key"], r["code"], r["n"]) for r in got] == [
        ("role", "not_valid_choice", 1)
    ]
    shutil.rmtree(src, ignore_errors=True)


def test_conversation_monitor_stateful(spark, stream_input):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    out = conversation_monitor(stream)
    name = "t_" + uuid.uuid4().hex[:8]
    got = _run_stream(spark, out, name).collect()
    by = {r["conv_id"]: r for r in got if not r["closed"]}
    c1, c2 = by["c1"], by["c2"]
    assert c1["n_turns"] == 4
    assert c1["max_idx"] == 3
    assert c1["n_dups"] == 1  # idx 3 twice
    assert c1["n_gaps"] == 1  # 1 -> 3
    assert c2["n_turns"] == 3
    assert c2["n_dups"] == 1  # idx 0 twice (bitmap catches it first)
    assert c2["n_out_of_order"] == 0  # second 0 counted as dup, not ooo


def test_stream_dedup_bounded_state(spark, stream_input):
    """dropDuplicatesWithinWatermark-based dedup: duplicate (conv, idx)
    rows within the watermark collapse to one."""
    from filters_spark.streaming import stream_dedup

    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    deduped = stream_dedup(stream, ["conv_id", "turn_idx"], ts_col="ts",
                           watermark="1 hour")
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(f"select conv_id, turn_idx from {sink}").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert len(keys) == len(set(keys))  # no duplicate keys survive
    assert set(keys) == {("c1", 0), ("c1", 1), ("c1", 3), ("c2", 0), ("c2", 1)}


def test_stream_sessionize_session_windows(spark, stream_input):
    """session_window aggregation: a wide gap merges each entity's
    burst into one session; a tight gap splits every event out."""
    from filters_spark.streaming import stream_sessionize

    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    wide = stream_sessionize(
        stream, entity_col="conv_id", ts_col="ts", gap="1 minute"
    )
    name = "t_" + uuid.uuid4().hex[:8]
    got = _run_stream(spark, wide, name, mode="complete").collect()
    by = {r["conv_id"]: r for r in got}
    assert len(got) == 2  # one merged session per conversation
    assert by["c1"]["n_events"] == 4
    assert by["c2"]["n_events"] == 3
    # session extends gap past the last event
    assert (by["c1"]["session_end"] - by["c1"]["session_start"]).seconds == 90

    stream2 = spark.readStream.schema(SCHEMA).parquet(stream_input)
    tight = stream_sessionize(
        stream2, entity_col="conv_id", ts_col="ts", gap="5 seconds"
    )
    name2 = "t_" + uuid.uuid4().hex[:8]
    got2 = _run_stream(spark, tight, name2, mode="complete").collect()
    assert len(got2) == len(ROWS)  # every event its own session
    assert all(r["n_events"] == 1 for r in got2)


def test_sampling_ops_work_on_streams(spark, stream_input):
    """deterministic_sample / split_assign are stateless row-local
    expressions, so they run unchanged under Structured Streaming and
    select the SAME rows the batch path does (a seeded df.sample could
    not even start: nondeterministic expressions are rejected or
    re-drawn per microbatch)."""
    from filters_spark.pipeline import deterministic_sample, split_assign

    def shape(df):
        return split_assign(
            deterministic_sample(df, 0.6, id_col="conv_id", salt="s"),
            {"train": 1, "test": 1},
            id_col="conv_id",
        ).select("conv_id", "turn_idx", "split")

    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    sink = f"sampled_{uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, shape(stream), sink).collect()
    want = shape(spark.read.schema(SCHEMA).parquet(stream_input)).collect()
    key = lambda r: (r["conv_id"], r["turn_idx"], r["split"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) > 0


def test_curation_prefix_runs_on_streams(spark, tmp_path):
    """The curation pipeline's prefix — quality_score → lang_id →
    quality gate → deterministic split → BPE encode (merges trained on
    the batch corpus, applied as a stateless Arrow projection) — is
    stateless end-to-end, so it runs unchanged under Structured
    Streaming and emits exactly the batch path's rows (VERDICT r3
    stretch item 8)."""
    import uuid as _uuid

    from filters_spark.pipeline import (
        bpe_encode,
        bpe_train,
        lang_id,
        quality_score,
        split_assign,
    )

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = [
        (0, "the quick brown fox jumps over the lazy dog and runs on"),
        (1, "der schnelle braune fuchs springt und der hund ist die"),
        (2, "tiny"),
        (3, "a document with some reasonable amount of the usual text "
            "that is long enough to score well and the tokens repeat"),
        (4, None),
        (5, "the the the and and of of in in is is it it to to a a"),
    ]
    src = tmp_path / "cur_src"
    batch_docs = spark.createDataFrame(docs, doc_schema)
    batch_docs.coalesce(1).write.mode("overwrite").parquet(str(src))

    # tokenizer artifact trained on the BATCH corpus (driver-side
    # model state, shipped into the stream's encode closure)
    merges = bpe_train(spark.read.schema(doc_schema).parquet(str(src)), 12)

    def prefix(df):
        scored = quality_score(df, keep_cols=("text",))
        tagged = lang_id(
            scored, keep_cols=("text", "score"), id_col="id"
        )
        kept = tagged.filter(F.col("score") >= 0.02)
        split = split_assign(
            kept, {"train": 3, "val": 1}, id_col="id"
        )
        return bpe_encode(split, merges).select(
            "id", "lang_pred", "split",
            F.round(F.col("score"), 6).alias("score"),
            F.array_join("tokens", "|").alias("tok_str"),
        )

    stream = spark.readStream.schema(doc_schema).parquet(str(src))
    sink = f"cur_{_uuid.uuid4().hex[:8]}"
    got = _run_stream(spark, prefix(stream), sink).collect()
    want = prefix(spark.read.schema(doc_schema).parquet(str(src))).collect()
    key = lambda r: tuple(r)
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(want) >= 3  # the gate dropped something, not everything
    assert any(r["tok_str"] for r in want)


def test_rule_violations_runs_on_streams(spark, stream_input):
    """engine/rules.py rule_violations is a stateless projection
    (predicates + array-filter + explode): the identical code path
    runs on a stream in append mode with zero state store, and the
    stream output equals the batch output row-for-row."""
    from filters_spark.engine import rule_violations

    rules = {
        "role_known": "role IN ('system','user','assistant','tool')",
        "text_nonempty": "length(text) > 0",
    }
    kwargs = dict(keys=["conv_id", "turn_idx"], capture={"role_known": "role"})
    stream = spark.readStream.schema(SCHEMA).parquet(stream_input)
    out = rule_violations(stream, rules, **kwargs)
    assert out.isStreaming
    name = "t_" + uuid.uuid4().hex[:8]
    got = {tuple(r) for r in _run_stream(spark, out, name).collect()}
    batch = spark.read.schema(SCHEMA).parquet(stream_input)
    want = {tuple(r) for r in rule_violations(batch, rules, **kwargs).collect()}
    assert got == want and len(want) == 2
