"""Host-template boilerplate detection (ops/cleanq.py
q_host_template_lines / strip_host_templates) — from-spec parity on the
injected chrome, threshold behavior, and the removal transform."""

from collections import defaultdict

from crawl4ai_spark.ops.cleanq import (
    TEMPLATE_FRAC_E6,
    TEMPLATE_MIN_PAGES,
    _host_lines,
    q_host_template_lines,
    strip_host_templates,
)

SF = "/root/testdata/sf0.001"


def test_injected_chrome_classified_correctly(spark):
    rows = q_host_template_lines(spark, SF).collect()
    assert rows
    by_host = defaultdict(dict)
    for r in rows:
        by_host[r.host][r.line] = r

    for host, lines in by_host.items():
        nav = lines.get(f"nav home about h{host}")
        assert nav is not None and nav.is_template   # on every page
        assert nav.n_pages == nav.host_pages
        promo = lines.get(f"promo banner h{host}")
        if promo is not None:
            # ~1/3 of pages — must sit BELOW the 60% threshold
            assert not promo.is_template
            assert promo.n_pages * 1_000_000 \
                < TEMPLATE_FRAC_E6 * promo.host_pages


def test_verdict_matches_from_spec(spark):
    lines = [(r.host, r.doc_id, r.line)
             for r in _host_lines(spark, SF).collect()]
    pages_of = defaultdict(set)
    docs_of = defaultdict(set)
    for host, doc_id, line in lines:
        pages_of[host].add(doc_id)
        docs_of[(host, line)].add(doc_id)
    got = {(r.host, r.line): (r.n_pages, r.host_pages, r.is_template)
           for r in q_host_template_lines(spark, SF).collect()}
    want = {}
    for (host, line), docs in docs_of.items():
        if len(docs) < 2:
            continue
        hp = len(pages_of[host])
        want[(host, line)] = (
            len(docs), hp,
            len(docs) * 1_000_000 >= TEMPLATE_FRAC_E6 * hp
            and hp >= TEMPLATE_MIN_PAGES)
    assert got == want


def test_strip_removes_exactly_templates(spark):
    lines = _host_lines(spark, SF)
    templates = q_host_template_lines(spark, SF)
    kept = strip_host_templates(lines, templates)
    tset = {(r.host, r.line) for r in templates.collect() if r.is_template}
    assert tset
    kept_rows = {(r.host, r.line) for r in kept.collect()}
    all_rows = {(r.host, r.line) for r in lines.collect()}
    assert kept_rows == all_rows - tset
    # every nav line is gone; document bodies survive
    assert not any(l.startswith("nav home about") for _, l in kept_rows)
    assert any(l.startswith("promo banner") for _, l in kept_rows)
