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
