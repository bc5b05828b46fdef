"""DUST rule mining (ops/dustq.py) — from-spec parity, engineered
verdicts, and the application safety property (a rewrite never merges
two URLs observed with different content).
"""

from collections import defaultdict

from pyspark.sql import functions as F

from crawl4ai_spark.ops.dustq import (
    MIN_SUPPORT,
    _variants,
    apply_dust_rules,
    mine_dust_rules,
    q_url_dust_rules,
)

SF = "/root/testdata/sf0.001"


def _spec_mine(rows):
    """Independent from-spec miner over (host, url, param, digest)."""
    base = {u: d for h, u, p, d in rows if p == ""}
    agg = defaultdict(lambda: [0, 0, 0])  # (host,param) -> [sup, vio, n]
    for h, u, p, d in rows:
        if p == "":
            continue
        bd = base.get(u.split("?", 1)[0])
        if bd is None:
            continue
        cell = agg[(h, p)]
        cell[0] += d == bd
        cell[1] += d != bd
        cell[2] += 1
    return {
        k: (sup, vio, n, vio == 0 and sup >= MIN_SUPPORT)
        for k, (sup, vio, n) in agg.items()
    }


def test_miner_matches_from_spec(spark):
    rows = [(r.host, r.url, r.param, r.digest)
            for r in _variants(spark, SF).collect()]
    want = _spec_mine(rows)
    got = {(r.host, r.param): (r.support, r.violations, r.n_urls, r.valid)
           for r in q_url_dust_rules(spark, SF).collect()}
    assert got == want and got


def test_engineered_verdicts(spark):
    rules = q_url_dust_rules(spark, SF).collect()
    by_param = defaultdict(list)
    for r in rules:
        by_param[r.param].append(r)
    # sess/theme: content-irrelevant on every host where seen
    assert by_param["sess"] and all(r.valid for r in by_param["sess"])
    assert by_param["theme"] and all(
        r.valid or r.support < MIN_SUPPORT for r in by_param["theme"])
    # page: always changes content — rejected purely by violations
    assert by_param["page"] and all(
        not r.valid and r.support == 0 and r.violations > 0
        for r in by_param["page"])
    # v: MIXED evidence — the case a support-only miner gets wrong
    mixed = [r for r in by_param["v"] if r.support > 0 and r.violations > 0]
    assert mixed, "synthesis should produce mixed-evidence cells for 'v'"
    assert all(not r.valid for r in by_param["v"] if r.violations > 0)


def test_apply_collapses_only_safe_params(spark):
    v = _variants(spark, SF)
    rules = mine_dust_rules(v)
    out = apply_dust_rules(v, rules)
    got = out.select("url", "url_dust", "digest").collect()
    valid = {(r.host, r.param) for r in rules.collect() if r.valid}

    # every rewritten-url group carries EXACTLY ONE digest (no merge of
    # differing content), and rewrites only strip learned params
    by_target = defaultdict(set)
    for r in got:
        by_target[r.url_dust].add(r.digest)
        if r.url != r.url_dust:
            assert r.url.split("?", 1)[0] == r.url_dust.split("?", 1)[0]
    assert all(len(s) == 1 for s in by_target.values())

    # sess variants collapse onto their base; page variants never do
    for r in got:
        if "?sess=" in r.url:
            host = r.url.split("/")[2]
            if (host, "sess") in valid:
                assert r.url_dust == r.url.split("?", 1)[0]
        if "?page=" in r.url:
            assert r.url_dust == r.url

    # distinct URL count shrinks (the point of DUST at frontier scale)
    assert (out.select("url_dust").distinct().count()
            < out.select("url").distinct().count())


def test_apply_preserves_other_params(spark):
    """Multi-param URLs: only the learned key is dropped, order kept."""
    rules = spark.createDataFrame(
        [("h.example", "sess", 10, 0, 10, True),
         ("h.example", "page", 0, 5, 5, False)],
        "host string, param string, support long, violations long,"
        " n_urls long, valid boolean")
    urls = spark.createDataFrame(
        [("h.example", "https://h.example/x?a=1&sess=9&page=2"),
         ("h.example", "https://h.example/x?sess=9"),
         ("other.example", "https://other.example/x?sess=9")],
        "host string, url string")
    got = {r.url: r.url_dust
           for r in apply_dust_rules(urls, rules).collect()}
    assert got["https://h.example/x?a=1&sess=9&page=2"] == \
        "https://h.example/x?a=1&page=2"
    assert got["https://h.example/x?sess=9"] == "https://h.example/x"
    # rules are host-local: other.example keeps its sess param
    assert got["https://other.example/x?sess=9"] == \
        "https://other.example/x?sess=9"


def test_plan_has_no_python_and_no_cartesian(spark):
    plan = q_url_dust_rules(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def _dust_site(spark):
    """Hand-built site: the root links to /p1 and /p2 only through
    sess-variant URLs; the base pages exist, the variants do not."""
    import datetime

    ts = datetime.datetime(2025, 1, 1)
    host = "www.d.example"
    root = f"https://{host}/"
    mk = lambda body: f"<html><body>{body}</body></html>".encode()
    rows = [
        (root, ts, mk('<a href="/p1?sess=a">a</a>'
                      '<a href="/p1?sess=b">b</a>'
                      '<a href="/p2?sess=c">c</a>'
                      '<a href="/p2">d</a>'), "root", "en"),
        (f"https://{host}/p1", ts, mk("page one"), "one", "en"),
        (f"https://{host}/p2", ts, mk("page two"), "two", "en"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary,"
        " text string, lang string")
    seeds = spark.createDataFrame([(root, 0.0)], ["url", "priority"])
    return host, pages, seeds


def test_engine_dust_rules_collapse_frontier(spark, tmp_path):
    from pyspark.sql import functions as F

    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine

    host, pages, seeds = _dust_site(spark)

    # without rules: sess variants are distinct frontier rows that 404
    eng0 = SparkWebEngine(spark, str(tmp_path / "s0"))
    eng0.run(pages, seeds, config=CrawlConfig(max_depth=2, max_pages=30))
    r0 = {(r.url, r.status_code) for r in
          eng0.results().select("url", "status_code").collect()}
    assert (f"https://{host}/p1?sess=a", 404) in r0
    assert (f"https://{host}/p1?sess=b", 404) in r0

    # with a learned (host, sess) rule: variants collapse to the base
    # page BEFORE the frontier — no 404s, full coverage, fewer rows
    rules = spark.createDataFrame(
        [(host, "sess", 10, 0, 10, True)],
        "host string, param string, support long, violations long,"
        " n_urls long, valid boolean")
    eng1 = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng1.run(pages, seeds,
             config=CrawlConfig(max_depth=2, max_pages=30,
                                dust_rules=rules))
    r1 = {(r.url, r.status_code) for r in
          eng1.results().select("url", "status_code").collect()}
    assert r1 == {(f"https://{host}/", 200),
                  (f"https://{host}/p1", 200),
                  (f"https://{host}/p2", 200)}
    assert len(r1) < len(r0)
