"""Whole-stage-codegen health: the similarity hot paths must actually
COMPILE, not silently fall back to interpreted execution.

Round-1 bench logs carried a swallowed janino ``Code grows beyond 64 KB``
failure (VERDICT r1 "What's wrong" #1): the 3×dim-term unrolled cosine
fused into a BroadcastNestedLoopJoin consume method, and the
planes×dim-term SRP bucket expression inlined into a pushed-down Filter
condition — both contexts where codegen cannot split expressions into
sub-methods.  The fixes (norms below the exchanges; probe restriction as
a broadcast join key instead of an ``isin`` filter) are pinned here by
running with ``spark.sql.codegen.fallback=false``, which turns any
codegen failure into a hard error.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from filters_spark.pipeline.similarity import (
    cosine_topk,
    embedding_near_dups,
    ivf_centroids,
    ivf_topk,
    srp_topk,
)

DIM = 64


@pytest.fixture(scope="module")
def emb64(spark):
    # deterministic dim-64 vectors (md5-derived, no RNG state)
    def vec(i):
        return [
            int(hashlib.md5(f"{i}:{d}".encode()).hexdigest()[:8], 16)
            / float(1 << 31)
            - 1.0
            for d in range(DIM)
        ]

    rows = [(i, [float(x) for x in vec(i)]) for i in range(80)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()


@pytest.fixture()
def no_codegen_fallback(spark):
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield
    spark.conf.set("spark.sql.codegen.fallback", prev)


def test_exact_near_dups_compiles(emb64, no_codegen_fallback):
    out = embedding_near_dups(
        emb64, threshold=0.2, exact=True
    ).collect()
    assert isinstance(out, list)


def test_bucketed_near_dups_compiles(emb64, no_codegen_fallback):
    out = embedding_near_dups(emb64, threshold=0.2, planes=6).collect()
    assert isinstance(out, list)


def test_srp_topk_compiles(emb64, no_codegen_fallback):
    q = emb64.where(F.col("vec_id") == 0).first()["embedding"]
    out = srp_topk(
        emb64, [float(x) for x in q], k=5, planes=6, multiprobe=3
    ).collect()
    assert out and out[0]["vec_id"] == 0


def test_ivf_topk_compiles(emb64, no_codegen_fallback):
    """Pins the three IVF expression-size fixes (scalar-literal
    centroids, per-column score projection instead of one CreateArray,
    non-nullable cell so the inner join infers no isnotnull(cell) that
    pushdown would inline as a 600 KB Filter CASE)."""
    q = emb64.where(F.col("vec_id") == 0).first()["embedding"]
    cents = ivf_centroids(emb64, n_cells=8)
    out = ivf_topk(
        emb64,
        [float(x) for x in q],
        k=5,
        n_cells=8,
        nprobe=2,
        centroids=cents,
    ).collect()
    assert out and out[0]["vec_id"] == 0
    plan = ivf_topk(
        emb64, [float(x) for x in q], k=5, centroids=cents
    )._jdf.queryExecution().optimizedPlan().toString()
    # the giant inlined-filter regression was a ~620 KB plan line
    assert max(len(ln) for ln in plan.splitlines()) < 100_000


def test_cosine_topk_compiles(emb64, no_codegen_fallback):
    q = emb64.where(F.col("vec_id") == 1).first()["embedding"]
    out = cosine_topk(emb64, [float(x) for x in q], k=3).collect()
    assert [r["vec_id"] for r in out][0] == 1
