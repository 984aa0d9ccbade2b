"""Byte-pair-encoding tokenization: distributed histogram, classic
driver-side merge training, Arrow-batched encode.

Design for 100 TB: BPE training (Sennrich et al. 2016, arXiv:1508.07909)
operates on the WORD-FREQUENCY histogram, not the raw corpus — so the
distributed part is exactly one tokenise-explode-groupBy pass
(:func:`word_freqs`), capped at ``max_words`` distinct types (Zipf: the
top 10^5 types cover ≈anything), and the merge loop runs driver-side on
that bounded table exactly like the reference algorithm.  Re-counting
pairs over 100 TB per merge round — the naive formulation — would be
``n_merges`` full-corpus shuffles; the histogram form is one.

Encoding (:func:`bpe_encode`) is a stateless per-row projection: the
merge ranks broadcast to every worker inside the serialized UDF closure
(a 50k-merge table is ~1 MB), applied per Arrow batch with a per-word
memo cache — no shuffle, works unchanged on Structured Streaming.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["word_freqs", "bpe_train", "bpe_encode", "END_OF_WORD"]

#: end-of-word sentinel appended to every word's symbol sequence
END_OF_WORD = "</w>"


def word_freqs(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 100_000,
) -> DataFrame:
    """Distributed word-frequency histogram: whitespace-split,
    optionally lowercased, truncated to the ``max_words`` most frequent
    types (deterministic frequency-then-word ordering).  One explode +
    one aggregation; this is the ONLY full-corpus pass BPE training
    needs."""
    c = F.col(text_col)
    if lowercase:
        c = F.lower(c)
    words = df.select(
        F.explode(F.split(F.trim(c), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_words)
    )


def _pair_counts(vocab: dict) -> dict:
    counts: dict = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            counts[pair] = counts.get(pair, 0) + freq
    return counts


def _merge_word(syms: tuple, pair: tuple, joined: str) -> tuple:
    out = []
    i = 0
    while i < len(syms):
        if (
            i + 1 < len(syms)
            and syms[i] == pair[0]
            and syms[i + 1] == pair[1]
        ):
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Train BPE merges: one distributed histogram pass, then the
    classic greedy loop on the driver (most-frequent pair wins; ties
    break lexicographically so training is DETERMINISTIC across runs
    and partitionings, unlike dict-order-dependent implementations).
    Returns the ordered merge list — feed it to :func:`bpe_encode` or
    persist it as the tokenizer artifact."""
    rows = word_freqs(
        df, text_col=text_col, lowercase=lowercase, max_words=max_words
    ).collect()
    vocab = {
        tuple(r["word"]) + (END_OF_WORD,): int(r["freq"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic: highest count, then lexicographically smallest
        top = max(counts.values())
        pair = min(p for p, n in counts.items() if n == top)
        joined = pair[0] + pair[1]
        vocab = {
            _merge_word(syms, pair, joined): freq
            for syms, freq in vocab.items()
        }
        merges.append(pair)
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Apply trained BPE merges to a text column → ``array<string>``
    token column.  Pure projection (the merge-rank table rides in the
    UDF closure; a per-word memo amortises repeated types inside each
    batch); no shuffle, stream-safe.

    The inner merge loop is per-word Python inside the Arrow batch —
    which is what every real BPE encoder does (the memo makes repeated
    word types O(1)); a vocabulary trie / aho-corasick pre-split à la
    HuggingFace ``tokenizers`` is the production fast path if encode
    CPU ever dominates, and would slot in here without touching the
    plan shape (still a stateless ``mapInPandas`` projection)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out_field = T.StructField(out_col, T.ArrayType(T.StringType()))
    schema = T.StructType(list(df.schema.fields) + [out_field])

    def encode_word(word: str, memo: dict) -> list:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) > 1:
            best_rank = None
            best_i = -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_i = i
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [
                syms[best_i] + syms[best_i + 1]
            ]
        memo[word] = syms
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                if text is None:
                    toks.append(None)
                    continue
                if lowercase:
                    text = text.lower()
                row: list = []
                for w in text.split():
                    row.extend(encode_word(w, memo))
                toks.append(row)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(run, schema)
