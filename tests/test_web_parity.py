"""Randomized cross-engine parity for the web-curation regex operators:
the same adversarial strings through Spark's Java-regex path
(:func:`html_strip`, :func:`extract_urls`) and a DuckDB RE2 replay of
the documented patterns.  The driver oracle covers deterministic
synthesised text; this test throws tag fragments, stray ``<``/``>``,
nested entities, userinfo/port/trailing-dot URLs, and half-finished
comments at both engines to pin that every published pattern stays in
the RE2∩Java common subset (the module docstrings' portability claim).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from filters_spark.pipeline import extract_urls, html_strip
from filters_spark.pipeline.curation import (
    HTML_BLOCK_PATTERNS,
    HTML_ENTITIES,
    URL_PATTERN,
)

SEED = 20260818

_PIECES = [
    "word", "tok en", " ", "<p>", "</p>", "<P >", "<script>",
    "</script>", "<style>x{}</style>", "<script>var a=1;</script>",
    "<ScRiPt>if(1>0){x()}</sCrIpT>", "<!--", "-->", "<!-- c -->",
    "<", ">", "<>", "< >", "&amp;", "&lt;", "&amp;lt;", "&nbsp;",
    "&#39;", "&quot;", "&gt;", "&bogus;", "https://", "http://",
    "www.", "Example.COM", "a.b.c.", ":8080", "user:pw@", "/p?q=1#f",
    "'", '"', "\t", "\n", "<div class=\"x y\">", "</div>",
    "<img src='u'>", "ftp://not-a-match", "..", "%20", "https://x.y/z",
    "http://WWW.Host.IO./A.", "<a href=\"https://l.ink/1\">t</a>",
]


def _docs(n: int) -> list[tuple[int, str]]:
    rng = random.Random(SEED)
    out = [(0, ""), (1, "plain"), (2, "<" * 40), (3, ">" * 40)]
    for i in range(4, n):
        out.append(
            (i, "".join(rng.choice(_PIECES) for _ in range(rng.randint(1, 30))))
        )
    return out


def _sql_quote(p: str) -> str:
    return p.replace("'", "''")


@pytest.fixture(scope="module")
def web_docs(spark):
    rows = _docs(300)
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    con.register("docs", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return sdf, con


def test_html_strip_parity_vs_re2(web_docs):
    sdf, con = web_docs
    got = {
        r.id: (r.clean_text, r.n_tags)
        for r in html_strip(sdf).collect()
    }
    blocks = "".join(
        f", '{_sql_quote(p)}', ' ', 'g')" for p in HTML_BLOCK_PATTERNS
    )
    expr = "regexp_replace(" * (len(HTML_BLOCK_PATTERNS) + 1) + "text"
    expr += blocks + r", '(?s)<[^>]*>', ' ', 'g')"
    for ent, repl in HTML_ENTITIES:
        expr = (
            f"replace({expr}, '{_sql_quote(ent)}', '{_sql_quote(repl)}')"
        )
    sql = f"""
      SELECT doc_id,
             trim(regexp_replace({expr}, '\\s+', ' ', 'g')) AS clean_text,
             CAST(len(regexp_extract_all(text, '(?s)<[^>]*>')) AS BIGINT)
               AS n_tags
      FROM docs
    """
    want = {
        int(r[0]): (r[1], int(r[2])) for r in con.sql(sql).fetchall()
    }
    assert got == want


def test_extract_urls_parity_vs_re2(web_docs):
    sdf, con = web_docs
    got = sorted(
        (r.id, r.pos, r.url, r.domain)
        for r in extract_urls(sdf).collect()
    )
    dom = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "lower(regexp_extract(url, 'https?://([^/?#]+)', 1)),"
        " '^[^@]*@', ''), ':[0-9]+$', ''), '\\.$', ''), '^www\\.', '')"
    )
    sql = f"""
      WITH u AS (
        SELECT doc_id,
               regexp_extract_all(text, '{_sql_quote(URL_PATTERN)}') AS l
        FROM docs WHERE text IS NOT NULL
      ), e AS (
        SELECT doc_id, i, l[i] AS url
        FROM u, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS i) s
      )
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, url, {dom} AS domain
      FROM e
    """
    want = sorted(
        (int(r[0]), int(r[1]), r[2], r[3]) for r in con.sql(sql).fetchall()
    )
    assert got == want
