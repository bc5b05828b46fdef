"""RFC 9309 wildcard robots matching (ops/scheduling.py
rfc9309_decision) — from-spec matcher parity on the oracled synthesis
plus targeted precedence cases from the RFC's own examples."""

import re

from crawl4ai_spark.ops.scheduling import q_robots_wildcards, rfc9309_decision

SF = "/root/testdata/sf0.001"


def _spec_match(path: str, pattern: str) -> bool:
    rx = re.escape(pattern).replace(r"\*", ".*")
    if rx.endswith(r"\$"):
        rx = rx[:-2] + "$"
    return re.match(rx, path) is not None


def _spec_decide(path: str, rules):
    best = None
    for pattern, allow in rules:
        if _spec_match(path, pattern):
            key = (len(pattern), allow)
            if best is None or key > (len(best[0]), best[1]):
                best = (pattern, allow)
    if best is None:
        return "", True
    return best


def test_matches_from_spec_on_synthesis(spark):
    rules_of = {
        0: [("/a1*", False), ("/a1/p*", True), ("*.pdf$", False)],
        1: [("*", False), ("/a2*", True)],
        2: [],
    }
    rows = q_robots_wildcards(spark, SF).collect()
    assert len(rows) == 500
    verdicts = set()
    for r in rows:
        h = int(r.host.split(".")[0][1:]) % 3
        path = r.url.split(".example")[1]
        pat, allow = _spec_decide(path, rules_of[h])
        assert (r.matched_pattern, r.allow) == (pat, allow), r.url
        verdicts.add((h, r.allow, r.matched_pattern != ""))
    # coverage: blocked + wildcard-allowed + default-allow all occur
    assert (0, False, True) in verdicts      # *.pdf$ or /a1* blocks
    assert (1, False, True) in verdicts      # '*' blocks
    assert (1, True, True) in verdicts       # /a2* overrides '*'
    assert (2, True, False) in verdicts      # no rules -> default allow


def test_rfc_precedence_cases(spark):
    """The RFC's precedence semantics on hand-built rules: longest match
    wins; equal length -> allow wins; '$' anchors; '*' spans '/'."""
    urls = spark.createDataFrame(
        [("h", "/page", "u1"), ("h", "/folder/page", "u2"),
         ("h", "/page.htm", "u3"), ("h", "/x/deep/file.pdf", "u4"),
         ("h", "/pages.html", "u5")],
        "host string, path string, url string")
    rules = spark.createDataFrame(
        [("h", "/p", True), ("h", "/", False),          # longest: /p allows
         ("h", "/folder", False), ("h", "/folder/", True),
         ("h", "/page.htm$", False),
         ("h", "*.pdf$", False),
         ("h", "/pages", False), ("h", "/page*", True)],  # tie? no: /pages=6 > /page*=6 tie -> allow wins
        "host string, pattern string, allow boolean")
    got = {r.url: (r.allow, r.matched_pattern)
           for r in rfc9309_decision(urls, rules).collect()}
    assert got["u1"] == (True, "/page*")      # /page* (6) beats /p, tie-allow
    assert got["u2"] == (True, "/folder/")    # longer allow wins
    assert got["u3"][0] is False              # exact $ anchor blocks
    assert got["u4"] == (False, "*.pdf$")     # '*' spans directories
    assert got["u5"] == (True, "/page*")      # tie length 6 -> allow wins


def test_dollar_only_anchors_at_end():
    assert _spec_match("/a.pdf", "*.pdf$")
    assert not _spec_match("/a.pdfx", "*.pdf$")
    assert _spec_match("/a.pdfx", "*.pdf")  # unanchored prefix-ish match


def test_compile_rules_groups_and_wildcards(spark):
    from crawl4ai_spark.operators.politeness import compile_rfc9309_rules

    robots = spark.createDataFrame([
        ("a.example",
         "# banner\nUser-agent: otherbot\nDisallow: /secret\n\n"
         "User-agent: *\nDisallow: /a1*\nAllow: /a1/p*\n"
         "Disallow: *.pdf$\nDisallow:\n"),
        ("b.example", "User-agent: c4bot\nAllow: /only\nDisallow: *\n\n"
                      "User-agent: *\nDisallow: /other\n"),
        ("c.example", None),
    ], "host string, rules string")
    got = {(r.host, r.pattern, r.allow)
           for r in compile_rfc9309_rules(
               robots, user_agent="c4bot").collect()}
    assert got == {
        ("a.example", "/a1*", False),
        ("a.example", "/a1/p*", True),
        ("a.example", "*.pdf$", False),     # wildcard survives compile
        ("b.example", "/only", True),       # specific group beats *
        ("b.example", "*", False),
    }


def test_engine_rfc9309_dialect_blocks_wildcards(spark, tmp_path):
    """Behavioral difference the dialect exists for: a '*.pdf$' Disallow
    blocks pdf urls under rfc9309 but not under stdlib prefix matching;
    on wildcard-free robots the two dialects agree exactly."""
    import datetime

    from pyspark.sql import functions as F

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_robots,
        generate_seeds,
    )

    ts = datetime.datetime(2025, 1, 1)
    host = "www.w.example"
    mk = lambda b: f"<html><body>{b}</body></html>".encode()
    pages = spark.createDataFrame([
        (f"https://{host}/", ts,
         mk('<a href="/doc.pdf">p</a><a href="/doc.html">h</a>'),
         "root", "en"),
        (f"https://{host}/doc.pdf", ts, mk("pdf body"), "pdf", "en"),
        (f"https://{host}/doc.html", ts, mk("html body"), "html", "en"),
    ], "url string, warc_ts timestamp, html binary, text string,"
       " lang string")
    seeds = spark.createDataFrame([(f"https://{host}/", 0.0)],
                                  ["url", "priority"])
    robots = spark.createDataFrame(
        [(host, "User-agent: *\nDisallow: *.pdf$\n", 1735689600, "h")],
        ["host", "rules", "fetch_time", "hash"])

    def run(dialect, store):
        eng = SparkWebEngine(spark, str(tmp_path / store))
        eng.run(pages, seeds, robots=robots,
                config=CrawlConfig(max_depth=2, max_pages=20,
                                   robots_dialect=dialect))
        return {r.url: r.status_code for r in
                eng.results().select("url", "status_code").collect()}

    std = run("robotparser", "s_std")
    rfc = run("rfc9309", "s_rfc")
    # stdlib treats '*' literally -> no match -> pdf fetched
    assert std[f"https://{host}/doc.pdf"] == 200
    # rfc9309 blocks it with the robots 403 path
    assert rfc[f"https://{host}/doc.pdf"] == 403
    assert rfc[f"https://{host}/doc.html"] == 200

    # wildcard-free fixtures: dialects agree result-for-result
    p2 = generate_pages(spark, 3, 8)
    s2 = generate_seeds(spark, 3)
    r2 = generate_robots(spark, 3)

    def run2(dialect, store):
        eng = SparkWebEngine(spark, str(tmp_path / store))
        eng.run(p2, s2, robots=r2,
                config=CrawlConfig(max_depth=2, max_pages=30,
                                   robots_dialect=dialect))
        return {(r.url, r.status_code) for r in
                eng.results().select("url", "status_code").collect()}

    assert run2("robotparser", "t_std") == run2("rfc9309", "t_rfc")
