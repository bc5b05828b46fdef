"""Direct unit tests for the column-expression scorer (F9) and filter (F10/
F11/F17) APIs — the library surface mirroring the reference's
URLScorer/URLFilter plug-ins as whole-stage-codegen predicates."""

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators import scoring as S
from crawl4ai_spark.operators import urlfilters as UF

URLS = [
    "https://www.docs.example.com/2023/guide/index.html",
    "https://blog.example.com/2019/post.php",
    "https://cdn.example.com/assets/app.min.js",
    "https://shop.other.org/products",
    "http://bad",
    "mailto:someone@example.com",
    "https://www.example.com/archive/1998/item.pdf",
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], ["url"]).cache()


def _vals(df, col):
    return {r.url: r.v for r in df.select("url", col.alias("v")).collect()}


def test_keyword_score(urls_df):
    v = _vals(urls_df, S.keyword_score(F.col("url"), ["guide", "docs"]))
    assert v[URLS[0]] == pytest.approx(1.0)   # both keywords
    assert v[URLS[3]] == pytest.approx(0.0)


def test_path_depth_score(urls_df):
    v = _vals(urls_df, S.path_depth_score(F.col("url"), optimal_depth=3))
    assert v[URLS[0]] == pytest.approx(1.0)   # /2023/guide/index.html = 3 segs
    assert v[URLS[3]] == pytest.approx(1.0 / 3)  # 1 seg → 1/(1+2)


def test_content_type_score(urls_df):
    # reference semantics: extension = alnum run after the LAST dot anywhere
    # in the url (so a path-less page yields "org"/"com"), miss -> 0.0
    v = _vals(urls_df, S.content_type_score(F.col("url")))
    assert v[URLS[0]] == pytest.approx(1.0)       # .html
    assert v[URLS[6]] == pytest.approx(0.5)       # .pdf
    assert v[URLS[3]] == pytest.approx(0.0)       # ext "org/products" -> org


def test_freshness_score(urls_df):
    v = _vals(urls_df, S.freshness_score(F.col("url"), current_year=2024))
    assert v[URLS[0]] == pytest.approx(0.9)   # 2023 → age 1
    assert v[URLS[1]] == pytest.approx(0.5)   # 2019 → age 5
    assert v[URLS[6]] == pytest.approx(0.1)   # 1998 → max(0.1, 1-0.1*26)
    assert v[URLS[3]] == pytest.approx(0.5)   # no year


def test_domain_authority_and_composite(urls_df):
    # reference default: EXACT host match; subdomain inheritance is opt-in
    exact = _vals(urls_df, S.domain_authority_score(
        F.col("url"), {"www.docs.example.com": 0.9}))
    assert exact[URLS[0]] == pytest.approx(0.9)
    assert exact[URLS[3]] == pytest.approx(0.5)   # unknown -> default
    da = S.domain_authority_score(
        F.col("url"), {"docs.example.com": 0.9, "other.org": 0.2},
        inherit_subdomains=True)
    v = _vals(urls_df, da)
    assert v[URLS[0]] == pytest.approx(0.9)
    assert v[URLS[3]] == pytest.approx(0.2)   # subdomain suffix match
    comp = _vals(urls_df, S.composite_score(
        [S.freshness_score(F.col("url")), da]))
    assert comp[URLS[0]] == pytest.approx((0.9 + 0.9) / 2)


def test_pattern_and_domain_filters(urls_df):
    keep = urls_df.filter(UF.url_pattern_filter(F.col("url"), ["*example.com/*"]))
    assert {r.url for r in keep.collect()} == {URLS[0], URLS[1], URLS[2], URLS[6]}
    dom = urls_df.filter(UF.domain_filter(F.col("url"), allowed=["example.com"],
                                          blocked=["cdn.example.com"]))
    assert URLS[2] not in {r.url for r in dom.collect()}
    assert URLS[0] in {r.url for r in dom.collect()}


def test_content_type_filter(urls_df):
    keep = urls_df.filter(UF.content_type_filter(F.col("url"), ["html", "php"]))
    got = {r.url for r in keep.collect()}
    assert URLS[0] in got and URLS[1] in got
    assert URLS[2] not in got and URLS[6] not in got
    assert URLS[3] in got  # extensionless allowed


def test_valid_and_nonsense(urls_df):
    valid = {r.url for r in urls_df.filter(UF.valid_url(F.col("url"))).collect()}
    assert URLS[4] not in valid and URLS[5] not in valid
    junk = {r.url for r in urls_df.filter(UF.nonsense_url(F.col("url"))).collect()}
    assert URLS[2] in junk and URLS[5] in junk
    assert URLS[0] not in junk


def test_filter_chain_conjunction(urls_df):
    chain = UF.filter_chain(F.col("url"), [
        UF.valid_url(F.col("url")),
        ~UF.nonsense_url(F.col("url")),
        UF.domain_filter(F.col("url"), allowed=["example.com"]),
    ])
    got = {r.url for r in urls_df.filter(chain).collect()}
    assert got == {URLS[0], URLS[1], URLS[6]}
