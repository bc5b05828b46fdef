"""r4 native robots gate: compile-once rules + expression-only matching
must agree with the stdlib-robotparser pUDF gate decision-for-decision.
(politeness.py compile_robots_rules / robots_allowed_col_native / _fast
vs robots_allowed_col — reference semantics utils.py:313-365.)"""

import urllib.robotparser

import pytest

from pyspark.sql import functions as F

from crawl4ai_spark.operators.politeness import (
    compile_robots_rules,
    robots_allowed_col,
    robots_allowed_col_fast,
    robots_allowed_col_native,
)

RULESETS = {
    "h-simple.com": "User-agent: *\nDisallow: /private\nAllow: /public\n",
    # first-match-wins ordering: Disallow shadows the later Allow
    "h-order.com": "User-agent: *\nDisallow: /private\nAllow: /private/ok\n",
    # reverse ordering: Allow rescues the subtree
    "h-rescue.com": "User-agent: *\nAllow: /private/ok\nDisallow: /private\n",
    "h-all.com": "User-agent: *\nDisallow: /\n",
    "h-none.com": "User-agent: *\nDisallow:\n",
    "h-empty.com": "",
    # agent-specific entry beats the catch-all for our agent
    "h-agent.com": ("User-agent: specialbot\nDisallow: /\n\n"
                    "User-agent: *\nDisallow: /only-star\n"),
    # rule path with characters quote() escapes
    "h-quoted.com": "User-agent: *\nDisallow: /a b\nDisallow: /q?x\n",
    "h-star.com": "User-agent: *\nDisallow: *\n",
}

PATHS = ["/", "/private", "/private/ok", "/private/no", "/public/x",
         "/only-star", "/other", "/a b/c", "/a%20b/c", "/q?x=1", "/q",
         "/café", "/p;param", "/p#frag", ""]


def _cases():
    return [(f"https://{h}{p}", h) for h in RULESETS for p in PATHS] + [
        ("https://h-missing.com/anything", "h-missing.com"),  # no rules row
    ]


@pytest.fixture(scope="module")
def tables(spark):
    robots = spark.createDataFrame(
        [(h, r) for h, r in RULESETS.items()], "host string, rules string")
    batch = spark.createDataFrame(_cases(), "url string, host string")
    return robots, batch


@pytest.mark.parametrize("agent", ["*", "specialbot", "SpecialBot/1.0"])
def test_fast_gate_matches_pudf_gate(spark, tables, agent):
    robots, batch = tables
    compiled = compile_robots_rules(robots, user_agent=agent)
    fast = {r.url: r.robots_allowed
            for r in robots_allowed_col_fast(
                batch, robots, compiled, user_agent=agent).collect()}
    pudf = {r.url: r.robots_allowed
            for r in robots_allowed_col(
                batch, robots, user_agent=agent).collect()}
    assert fast == pudf


def test_fast_gate_matches_stdlib_directly(spark, tables):
    robots, batch = tables
    compiled = compile_robots_rules(robots, user_agent="*")
    got = {r.url: r.robots_allowed
           for r in robots_allowed_col_fast(
               batch, robots, compiled, user_agent="*").collect()}
    for url, host in _cases():
        rules = RULESETS.get(host)
        if rules is None:
            expect = True  # fail-open
        else:
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(rules.splitlines())
            expect = rp.can_fetch("*", url)
        assert got[url] == expect, (url, got[url], expect)


def test_native_abstains_only_outside_parity_domain(spark, tables):
    robots, batch = tables
    compiled = compile_robots_rules(robots, user_agent="*")
    rows = robots_allowed_col_native(batch, compiled).collect()
    for r in rows:
        ascii_pct_free = r.url.isascii() and "%" not in r.url
        if ascii_pct_free:
            assert r.robots_allowed is not None, r.url
        else:
            assert r.robots_allowed is None, r.url


def test_compiled_rules_shape(spark, tables):
    robots, _ = tables
    rules = {d["host"]: d["__robots_rules"] for d in
             (r.asDict() for r in
              compile_robots_rules(robots, user_agent="*").collect())}
    assert rules["h-order.com"][0].prefix == "/private"
    assert rules["h-order.com"][0].allow is False
    assert rules["h-order.com"][1].allow is True
    # 'Disallow:' empty value means allow-all (robotparser RuleLine:219-221)
    assert [(x.prefix, x.allow) for x in rules["h-none.com"]] == [("", True)]
    # quote()-escaped rule paths survive compilation verbatim
    assert any(x.prefix == "/a%20b" for x in rules["h-quoted.com"])
