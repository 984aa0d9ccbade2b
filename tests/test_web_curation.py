"""Round-5 web-curation operators: URL extraction / domain census /
blocklist filtering / HTML boilerplate stripping / robust outliers /
dedup survivor selection — small deterministic frames, known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filters_spark.engine import robust_outliers
from filters_spark.pipeline import (
    dedup_resolve,
    domain_counts,
    domain_filter,
    extract_urls,
    html_strip,
)

URL_DOCS = [
    (
        1,
        "see https://www.Example.COM:8080/a?q=1 and "
        "http://user:pw@sub.news.example.org/path then "
        "https://foo.bar/x https://foo.bar/x",
    ),
    (2, "no urls here"),
    (3, "trailing dot https://host.io./z end"),
    (4, "bare http://WWW.Host.IO end"),
]


@pytest.fixture(scope="module")
def url_docs(spark):
    return spark.createDataFrame(URL_DOCS, ["doc_id", "text"]).cache()


def test_extract_urls_positions_and_domains(spark, url_docs):
    rows = {
        (r.id, r.pos): (r.url, r.domain)
        for r in extract_urls(url_docs).collect()
    }
    # authority lowered, port stripped, www. stripped
    assert rows[(1, 0)] == (
        "https://www.Example.COM:8080/a?q=1",
        "example.com",
    )
    # userinfo stripped, subdomain kept (no registrable-suffix list)
    assert rows[(1, 1)][1] == "sub.news.example.org"
    # the SAME url twice -> two rows with distinct positions
    assert rows[(1, 2)][0] == rows[(1, 3)][0] == "https://foo.bar/x"
    # trailing dot stripped
    assert rows[(3, 0)][1] == "host.io"
    # case-folded www. also stripped
    assert rows[(4, 0)][1] == "host.io"
    # doc 2 contributes no rows
    assert not any(k[0] == 2 for k in rows)


def test_domain_counts(spark, url_docs):
    out = {r.domain: (r.n_urls, r.n_docs) for r in domain_counts(url_docs).collect()}
    assert out["foo.bar"] == (2, 1)  # two occurrences, one doc
    assert out["host.io"] == (2, 2)  # once in doc 3, once in doc 4
    assert out["example.com"] == (1, 1)


def test_domain_filter_suffix_semantics(spark, url_docs):
    # blocking the registrable domain blocks the whole subtree
    out = {
        r.id: (r.n_urls, r.n_blocked, r.blocked)
        for r in domain_filter(url_docs, ["example.org", "foo.bar"]).collect()
    }
    assert out[1] == (4, 3, True)  # sub.news.example.org + foo.bar x2
    assert out[2] == (0, 0, False)  # url-free doc still gets a verdict row
    assert out[3] == (1, 0, False)
    assert out[4] == (1, 0, False)
    # a sibling label does NOT block: host.io is not under foo.bar
    out2 = {
        r.id: r.n_blocked
        for r in domain_filter(url_docs, ["o.bar", "oo.bar"]).collect()
    }
    # suffixes are DOT-suffixes, not string suffixes: 'oo.bar' must not
    # match foo.bar
    assert out2[1] == 0


def test_domain_filter_mid_suffix_and_dataframe_blocklist(spark, url_docs):
    # every dot-suffix participates: news.example.org blocks
    # sub.news.example.org
    out = {
        r.id: r.n_blocked
        for r in domain_filter(url_docs, ["news.example.org"]).collect()
    }
    assert out[1] == 1
    # DataFrame blocklist variant is equivalent to the list variant
    bl = spark.createDataFrame([("foo.bar",)], ["domain"])
    a = sorted(
        tuple(r) for r in domain_filter(url_docs, bl).collect()
    )
    b = sorted(
        tuple(r) for r in domain_filter(url_docs, ["foo.bar"]).collect()
    )
    assert a == b


HTML_DOC = (
    "<html><head><style>p {color: red}</style>"
    "<script type='t'>if (1 > 0) { x(); }</script></head>"
    "<body><!-- hidden --><h1>Title</h1>\n"
    "<p class=\"a b\">Hello &amp;lt; &nbsp;world &#39;s &quot;q&quot;</p>"
    "</body></html>"
)


def test_html_strip(spark):
    df = spark.createDataFrame([(1, HTML_DOC)], ["doc_id", "text"])
    row = html_strip(df).first()
    # script body (with its > inside) and style and comment all gone,
    # entities decoded ONE level (&amp;lt; -> &lt;), whitespace collapsed
    assert row.clean_text == "Title Hello &lt; world 's \"q\""
    # tags in the ORIGINAL text: html head style /style script /script
    # /head body comment h1 /h1 p /p /body /html = 15
    assert row.n_tags == 15


def test_html_strip_plain_text_unchanged(spark):
    df = spark.createDataFrame([(1, "just   words  here")], ["doc_id", "text"])
    row = html_strip(df).first()
    assert row.clean_text == "just words here"
    assert row.n_tags == 0


def test_robust_outliers_known_values(spark):
    # group a: values 1..9 plus a wild 1000 -> med 5.5, MAD 2.5
    vals = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    df = spark.createDataFrame(vals, ["id", "g", "v"])
    out = {r.id: r for r in robust_outliers(df, "v", ["g"], ["id"]).collect()}
    assert out[0].med == 5.5 and out[0].mad == 2.5
    z9 = out[9].robust_z
    assert abs(z9 - 0.6745 * (1000 - 5.5) / 2.5) < 1e-9
    assert out[9].is_outlier
    assert not out[0].is_outlier  # z = -1.214...


def test_robust_outliers_zero_mad_and_global(spark):
    # constant group: MAD 0 -> robust_z null, never an outlier
    df = spark.createDataFrame(
        [(i, "c", 7.0) for i in range(5)], ["id", "g", "v"]
    )
    rows = robust_outliers(df, "v", ["g"], ["id"]).collect()
    assert all(r.robust_z is None and not r.is_outlier for r in rows)
    # ungrouped (global) path works and matches the grouped math
    df2 = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 100])], ["id", "v"]
    )
    out = {r.id: r for r in robust_outliers(df2, "v", id_cols=["id"]).collect()}
    assert out[3].med == 2.5 and out[3].mad == 1.0
    assert out[3].is_outlier
    # non-broadcast path returns identical rows
    out2 = {
        r.id: r
        for r in robust_outliers(
            df2, "v", id_cols=["id"], broadcast_stats=False
        ).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in out2.items()
    }
    # the sketch path (exact=False, percentile_approx) returns a DATA
    # ELEMENT rather than the interpolated midpoint, but the verdict on
    # a clear outlier is the same
    out3 = {
        r.id: r
        for r in robust_outliers(
            df2, "v", id_cols=["id"], exact=False
        ).collect()
    }
    assert out3[3].med in (2.0, 3.0) and out3[3].is_outlier
    assert not out3[0].is_outlier


@pytest.fixture(scope="module")
def groups(spark):
    return spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["id", "group_id"],
    )


def test_dedup_resolve_ranked(spark, groups):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 5), (6, 2)],  # 5 missing from df
        ["doc_id", "n_chars"],
    )
    out = {r.id: r.keep for r in dedup_resolve(groups, docs, rank_col="n_chars").collect()}
    # group 1: 2 and 3 tie on rank 30 -> smallest id (2) wins
    assert out == {1: False, 2: True, 3: False, 4: True, 5: False, 6: True}
    # 5 is missing from docs -> null rank -> loses to 6 despite smaller id
    # ascending: keep the SHORTEST (id 1, rank 10)
    out_asc = {
        r.id: r.keep
        for r in dedup_resolve(
            groups, docs, rank_col="n_chars", descending=False
        ).collect()
    }
    assert out_asc[1] and not out_asc[2] and not out_asc[3]


def test_dedup_resolve_unranked_is_projection(spark, groups):
    out = dedup_resolve(groups, None)
    rows = {r.id: r.keep for r in out.collect()}
    assert rows == {1: True, 2: False, 3: False, 4: True, 5: True, 6: False}
    # min-id case is a pure projection: no shuffle in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # exactly one keeper per group in both modes
    kept = (
        dedup_resolve(groups, None)
        .where("keep")
        .groupBy("group_id")
        .count()
        .collect()
    )
    assert all(r["count"] == 1 for r in kept)


def test_text_sanity(spark):
    from filters_spark.pipeline import text_sanity

    rows = [
        (1, "a perfectly normal line"),
        (2, "lossy re-decode scar � here"),
        (3, "bell\x07 and null\x00 controls"),
        (4, "tabs\tand\nnewlines\rare fine"),
        (5, "zero​width‌joiners‍+bom﻿"),
        (6, "   \t  "),  # non-empty whitespace-only
        (7, ""),         # empty: NotEmpty's job, sane here
        (8, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_sanity(df).collect()}
    assert out[1].ok and out[1].n_chars == len(rows[0][1])
    assert not out[2].ok and out[2].n_replacement == 1
    assert not out[3].ok and out[3].n_control == 2
    assert out[4].ok and out[4].n_control == 0  # \t \n \r allowed
    assert not out[5].ok and out[5].n_zero_width == 4
    assert not out[6].ok and out[6].is_blank
    assert out[7].ok and out[7].n_chars == 0 and not out[7].is_blank
    assert not out[8].ok and out[8].n_chars is None
    bad = text_sanity(df, only_violations=True)
    assert {r.doc_id for r in bad.collect()} == {2, 3, 5, 6, 8}


def test_boilerplate_texts(spark):
    import hashlib

    from filters_spark.pipeline import boilerplate_texts

    rows = [
        ("a", "hi there"), ("a", "hi there"),   # repeat inside one conv
        ("b", "hi there"), ("c", "hi there"),
        ("a", "yo"), ("a", "yo"), ("a", "yo"),  # one conv only
        ("b", "rare"), ("c", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = boilerplate_texts(df, min_convs=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.text == "hi there" and r.n_convs == 3 and r.n_rows == 4
    assert r.fp == hashlib.md5(b"hi there").hexdigest()
    # threshold 2 still excludes the single-conversation repeat
    texts = {r.text for r in boilerplate_texts(df, min_convs=2).collect()}
    assert texts == {"hi there"}
    # nothing clears threshold on a clean corpus
    clean = spark.createDataFrame(
        [("a", "x"), ("b", "y")], "conv_id string, text string"
    )
    assert boilerplate_texts(clean, min_convs=2).count() == 0
