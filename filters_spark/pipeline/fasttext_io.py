"""Pure-Python reader/writer for the public fastText binary model
format, plus a minimal supervised predictor.

The wire format is public (facebookresearch/fastText: ``fasttext.cc
saveModel``, ``args.cc Args::save``, ``dictionary.cc Dictionary::save``,
``densematrix.cc DenseMatrix::save``): little-endian magic/version,
13-field args block, dictionary entries as NUL-terminated words with
int64 counts and an int8 entry type (0=word, 1=label), a quantization
flag byte, then two dense float32 matrices (input: ``nwords+bucket`` ×
``dim``; output: ``nlabels`` × ``dim`` for supervised softmax).

Scope (documented boundary): NON-quantized SUPERVISED models with
``softmax`` loss and no character n-grams (``maxn == 0``) — i.e. the
shape this engine's fixtures and most small language-ID classifiers
use.  Word n-grams (``wordNgrams > 1`` with ``bucket > 0``) ARE
supported, including fastText's FNV-1a token hash and the
``h * 116049371 + h'`` n-gram mixing.  Anything outside that scope
(``.ftz`` product quantization, hierarchical-softmax/ova loss, subword
models) raises with guidance to install the real ``fasttext`` package —
the loader never silently mis-predicts.

This makes :func:`filters_spark.pipeline.lang_id_fasttext` runnable
with no third-party dependency, exercisable by tests, and oracle-able:
prediction is mean-of-word-vectors → output matrix dot → softmax, all
replayable in SQL.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

MAGIC = 793712314
VERSION = 12

#: args block field order (args.cc Args::save): 12 int32 then a double
_ARGS_FIELDS = (
    "dim",
    "ws",
    "epoch",
    "min_count",
    "neg",
    "word_ngrams",
    "loss",
    "model",
    "bucket",
    "minn",
    "maxn",
    "lr_update_rate",
)

LOSS_HS, LOSS_NS, LOSS_SOFTMAX, LOSS_OVA = 1, 2, 3, 4
MODEL_CBOW, MODEL_SG, MODEL_SUP = 1, 2, 3

EOS = "</s>"


def _fnv1a(token: str) -> int:
    """fastText's token hash (dictionary.cc Dictionary::hash): FNV-1a
    over the UTF-8 bytes, 32-bit."""
    h = 2166136261
    for b in token.encode("utf-8"):
        h = (h ^ b) * 16777619 & 0xFFFFFFFF
    return h


@dataclass
class FastTextSupervisedModel:
    """A loaded supervised fastText model (bounded scope, see module
    docstring) with a ``predict`` mirroring the python binding's
    multi-line API: ``predict(list_of_texts, k)`` returns
    ``(labels, probs)`` where ``labels[i]`` is a tuple of
    ``__label__…`` strings and ``probs[i]`` a float array."""

    args: dict
    words: dict  # word -> input-row id (type-0 entries only)
    labels: list  # label strings in output-row order
    input_mat: np.ndarray  # (nwords + bucket, dim) float32
    output_mat: np.ndarray  # (nlabels, dim) float32

    @classmethod
    def load(cls, path: str) -> "FastTextSupervisedModel":
        with open(path, "rb") as f:
            data = f.read()
        off = 0

        def take(fmt: str):
            nonlocal off
            vals = struct.unpack_from("<" + fmt, data, off)
            off += struct.calcsize("<" + fmt)
            return vals

        magic, version = take("ii")
        if magic != MAGIC:
            raise ValueError(
                f"not a fastText model (magic {magic}, expected {MAGIC})"
            )
        if version > VERSION:
            raise ValueError(f"unsupported fastText file version {version}")
        args = dict(zip(_ARGS_FIELDS, take("12i")))
        (args["t"],) = take("d")
        if args["model"] != MODEL_SUP:
            raise ValueError(
                "pure-Python fallback handles SUPERVISED models only; "
                "install the 'fasttext' package for cbow/skipgram"
            )
        if args["loss"] != LOSS_SOFTMAX:
            raise ValueError(
                "pure-Python fallback handles softmax loss only (model "
                f"uses loss={args['loss']}); install the 'fasttext' package"
            )
        if args["maxn"] > 0:
            raise ValueError(
                "pure-Python fallback does not implement character "
                "n-grams (maxn > 0); install the 'fasttext' package"
            )
        size, nwords, nlabels = take("iii")
        _ntokens, pruneidx_size = take("qq")
        if pruneidx_size > 0:
            raise ValueError(
                "pruned dictionaries are unsupported by the pure-Python "
                "fallback; install the 'fasttext' package"
            )
        words: dict[str, int] = {}
        labels: list[str] = []
        for _ in range(size):
            end = data.index(b"\0", off)
            token = data[off:end].decode("utf-8")
            off = end + 1
            _count, etype = take("qb")
            if etype == 0:
                words[token] = len(words)
            else:
                labels.append(token)
        if len(words) != nwords or len(labels) != nlabels:
            raise ValueError("corrupt dictionary section")
        (quant,) = take("b")
        if quant:
            raise ValueError(
                "quantized (.ftz) models are unsupported by the "
                "pure-Python fallback; install the 'fasttext' package"
            )
        m, n = take("qq")
        input_mat = np.frombuffer(
            data, dtype="<f4", count=m * n, offset=off
        ).reshape(m, n)
        off += 4 * m * n
        (_qout,) = take("b")
        m2, n2 = take("qq")
        output_mat = np.frombuffer(
            data, dtype="<f4", count=m2 * n2, offset=off
        ).reshape(m2, n2)
        off += 4 * m2 * n2
        if n != args["dim"] or n2 != args["dim"] or m2 != nlabels:
            raise ValueError("matrix shapes disagree with args/dict")
        return cls(args, words, labels, input_mat, output_mat)

    def _line_ids(self, text: str) -> list[int]:
        """Tokenise the way Dictionary::getLine does for prediction:
        whitespace split, EOS appended (readWord turns the trailing
        newline into EOS), known words keep their id, OOV words are
        dropped (no subwords at maxn=0), then word-ngram bucket ids."""
        tokens = [t for t in text.split() if t] + [EOS]
        ids: list[int] = []
        hashes: list[int] = []
        for tok in tokens:
            wid = self.words.get(tok)
            if wid is not None:
                ids.append(wid)
                hashes.append(_fnv1a(tok))
            elif not tok.startswith("__label__"):
                hashes.append(_fnv1a(tok))
        n, bucket = self.args["word_ngrams"], self.args["bucket"]
        if n > 1 and bucket > 0:
            # fastText stores the FNV hashes in int32_t and widens them
            # to uint64_t via SIGN EXTENSION before mixing — replicate
            # exactly or bucket ids diverge for hashes with the top bit
            # set (model.cc Model::computeHidden / dictionary.cc
            # addWordNgrams).
            def sext(h32: int) -> int:
                return h32 | 0xFFFFFFFF00000000 if h32 >= 1 << 31 else h32

            nwords = len(self.words)
            for i in range(len(hashes)):
                h = sext(hashes[i])
                for j in range(i + 1, min(i + n, len(hashes))):
                    h = (h * 116049371 + sext(hashes[j])) & (2**64 - 1)
                    ids.append(nwords + h % bucket)
        return ids

    def predict_one(self, text: str, k: int = 1):
        ids = self._line_ids(text)
        if not ids:
            return (), np.array([])
        hidden = self.input_mat[ids].astype("f8").mean(axis=0)
        scores = self.output_mat.astype("f8") @ hidden
        e = np.exp(scores - scores.max())
        probs = e / e.sum()
        order = np.argsort(-probs, kind="stable")[:k]
        return (
            tuple(self.labels[i] for i in order),
            probs[order],
        )

    def predict(self, texts, k: int = 1):
        pairs = [self.predict_one(t, k) for t in texts]
        return [p[0] for p in pairs], [p[1] for p in pairs]


def write_supervised_model(
    path: str,
    dim: int,
    words: list,  # [(word, count)] — include EOS ("</s>") explicitly
    labels: list,  # [(label, count)], '__label__' prefix required
    input_rows: np.ndarray,  # (len(words) + bucket, dim)
    output_rows: np.ndarray,  # (len(labels), dim)
    bucket: int = 0,
    word_ngrams: int = 1,
) -> str:
    """Write a NON-quantized supervised softmax model in the public
    fastText binary layout — loadable by the real ``fasttext`` package
    and by :class:`FastTextSupervisedModel` alike (test fixtures)."""
    input_rows = np.asarray(input_rows, dtype="<f4")
    output_rows = np.asarray(output_rows, dtype="<f4")
    if input_rows.shape != (len(words) + bucket, dim):
        raise ValueError("input_rows must be (len(words)+bucket, dim)")
    if output_rows.shape != (len(labels), dim):
        raise ValueError("output_rows must be (len(labels), dim)")
    if any(not lb.startswith("__label__") for lb, _ in labels):
        raise ValueError("labels need the __label__ prefix")
    buf = bytearray()
    buf += struct.pack("<ii", MAGIC, VERSION)
    buf += struct.pack(
        "<12i",
        dim, 5, 5, 1, 5, word_ngrams, LOSS_SOFTMAX, MODEL_SUP,
        bucket, 0, 0, 100,
    )
    buf += struct.pack("<d", 1e-4)
    ntokens = sum(c for _, c in words) + sum(c for _, c in labels)
    buf += struct.pack(
        "<iiiqq", len(words) + len(labels), len(words), len(labels),
        ntokens, -1,
    )
    for word, count in words:
        buf += word.encode("utf-8") + b"\0" + struct.pack("<qb", count, 0)
    for label, count in labels:
        buf += label.encode("utf-8") + b"\0" + struct.pack("<qb", count, 1)
    buf += struct.pack("<b", 0)  # quant_ = false
    buf += struct.pack("<qq", *input_rows.shape) + input_rows.tobytes()
    buf += struct.pack("<b", 0)  # qout = false
    buf += struct.pack("<qq", *output_rows.shape) + output_rows.tobytes()
    with open(path, "wb") as f:
        f.write(bytes(buf))
    return path
