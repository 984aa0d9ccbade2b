"""BPE tokenizer (pipeline/tokenize.py): training merges hand-traced on
the classic Sennrich corpus, encoding checked against the known
segmentation, reconstruction invariant over adversarial text."""

import pytest
from pyspark.sql import types as T

from filters_spark.pipeline import bpe_encode, bpe_train, word_freqs
from filters_spark.pipeline.tokenize import END_OF_WORD

_SCHEMA = T.StructType([T.StructField("text", T.StringType())])


def _corpus(spark):
    # the BPE-paper histogram: low×5 lower×2 newest×6 widest×3
    rows = (
        [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6
        + [("widest",)] * 3
    )
    return spark.createDataFrame(rows, _SCHEMA)


def test_word_freqs_histogram(spark):
    df = spark.createDataFrame(
        [("Low low NEWEST",), ("newest  newest\tlow",), (None,)], _SCHEMA
    )
    got = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    assert got == {"low": 3, "newest": 3}
    top1 = word_freqs(df, max_words=1).collect()
    assert len(top1) == 1  # deterministic freq-then-word truncation
    assert top1[0]["word"] == "low"


def test_bpe_train_classic_corpus(spark):
    """First five merges hand-traced from the algorithm (highest pair
    count, lexicographic tie-break): es, es+t, est+</w>, l+o, lo+w."""
    merges = bpe_train(_corpus(spark), n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", END_OF_WORD),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_bpe_encode_known_segmentation(spark):
    merges = bpe_train(_corpus(spark), n_merges=5)
    df = spark.createDataFrame(
        [("lowest",), ("low low",), ("zap",), ("",), (None,)], _SCHEMA
    )
    got = {
        r["text"]: r["tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    # the paper's flagship example: unseen 'lowest' -> low + est</w>
    assert got["lowest"] == ["low", "est" + END_OF_WORD]
    assert got["low low"] == ["low", END_OF_WORD, "low", END_OF_WORD]
    # unseen characters stay singleton symbols
    assert got["zap"] == ["z", "a", "p", END_OF_WORD]
    assert got[""] == []
    assert got[None] is None


def test_tfidf_top_terms_hand_computed(spark):
    """TF-IDF scores against hand-computed smoothed idf; deterministic
    score-then-term ranking; single-pass tf relation (one scan in the
    optimized plan)."""
    import math

    from filters_spark.pipeline import tfidf_top_terms

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (1, "Apple apple, banana!"),
            (2, "banana cherry"),
            (3, "cherry CHERRY cherry date"),
        ],
        schema,
    )
    out = tfidf_top_terms(df, k=2)
    rows = {(r["id"], r["term"]): r for r in out.collect()}

    def idf(dfreq):
        return math.log(4.0 / (dfreq + 1)) + 1.0

    r = rows[(1, "apple")]
    assert (r["tf"], r["doc_freq"], r["rank"]) == (2, 1, 1)
    assert abs(r["score"] - 2 * idf(1)) < 1e-12
    assert rows[(1, "banana")]["rank"] == 2
    assert abs(rows[(1, "banana")]["score"] - idf(2)) < 1e-12
    r3 = rows[(3, "cherry")]
    assert (r3["tf"], r3["rank"]) == (3, 1)
    assert abs(r3["score"] - 3 * idf(2)) < 1e-12
    assert rows[(3, "date")]["rank"] == 2
    # d2: tie between banana and cherry (tf=1, df=2 each) -> term asc
    assert rows[(2, "banana")]["rank"] == 1
    assert rows[(2, "cherry")]["rank"] == 2
    assert len(rows) == 6


def test_tfidf_reuses_tf_exchange(spark):
    """The tf relation has two consumers (doc-frequency agg + scoring
    join); its scan + explode + shuffle must run ONCE via
    ReusedExchange (AQE off shows it statically).  Without the
    tf-consuming predicate in the doc_freq branch, Catalyst rewrites it
    to a distinct-only aggregate and the corpus explodes twice."""
    from filters_spark.pipeline import tfidf_top_terms

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], schema)
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = (
            tfidf_top_terms(df, k=2)._jdf.queryExecution()
            .executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("ReusedExchange") >= 1
    assert plan.count("Generate explode") == 1


def test_bpe_encode_reconstruction_invariant(spark):
    """Whatever the merges, concatenating a word's tokens must
    reconstruct word + sentinel — checked over adversarial text."""
    merges = bpe_train(_corpus(spark), n_merges=5)
    texts = [
        "newest widest lowest lower low",
        "unicode élève 你好",
        "punct!!! ...  mixed123 l o w",
    ]
    df = spark.createDataFrame([(t,) for t in texts], _SCHEMA)
    for r in bpe_encode(df, merges).collect():
        expect = "".join(
            w + END_OF_WORD for w in r["text"].lower().split()
        )
        assert "".join(r["tokens"]) == expect

    # stream-safety: stateless projection, no Exchange in the plan
    plan = (
        bpe_encode(df, merges)._jdf.queryExecution().executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
