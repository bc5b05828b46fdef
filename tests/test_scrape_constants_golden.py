"""Scrape-layer decision constants vs the REFERENCE's frozen values.

Byte-level scrape parity is blocked in this sandbox (the reference's
LXMLWebScrapingStrategy / PruningContentFilter need lxml/bs4, which are not
installed) — but the decisions those classes make are constant-driven, and
the constants ast-extract cleanly. scripts/gen_scrape_constants.py freezes
them read-only from the reference into tests/goldens/scrape_constants.json;
these tests pin our from-scratch implementations to the same values, so any
upstream drift or local divergence shows up as a diff against real reference
data, not a self-oracle. (VERDICT r02 next-round #6.)

The ready-to-run byte-parity generator (scripts/gen_scrape_goldens.py) stays
dormant until a container ships lxml — see test_byte_parity_generator_dormant.
"""

import importlib.util
import json
import os
import subprocess
import sys

import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "scrape_constants.json")

with open(GOLDEN) as f:
    G = json.load(f)


def test_config_thresholds_match():
    from crawl4ai_spark.html import scraper
    assert scraper.MIN_WORD_THRESHOLD == G["config"]["MIN_WORD_THRESHOLD"]
    assert scraper.IMAGE_SCORE_THRESHOLD == G["config"]["IMAGE_SCORE_THRESHOLD"]


def test_important_attrs_superset():
    """Ours keeps the reference's six IMPORTANT_ATTRS (plus class/id, which
    the pruning filter needs downstream — documented superset)."""
    from crawl4ai_spark.html import scraper
    assert set(G["config"]["IMPORTANT_ATTRS"]) <= set(scraper.IMPORTANT_ATTRS)


def test_pruning_weights_match():
    from crawl4ai_spark.html import content_filter as cf
    assert cf._TAG_WEIGHTS == G["pruning"]["tag_weights"]
    assert cf._TAG_IMPORTANCE == G["pruning"]["tag_importance"]
    assert cf._METRIC_WEIGHTS == G["pruning"]["metric_weights"]
    assert G["pruning"]["__init_defaults__"]["threshold"] == 0.48
    # our PruningContentFilter default must equal the reference default
    import inspect
    sig = inspect.signature(cf.PruningContentFilter.__init__)
    assert sig.parameters["threshold"].default == \
        G["pruning"]["__init_defaults__"]["threshold"]


def test_image_score_constants_match():
    from crawl4ai_spark.html import scraper
    assert scraper.IMG_DIM_THRESHOLD_PX == G["image_score"]["dim_threshold_px"]
    assert set(G["image_score"]["image_formats"]) == set(scraper.IMG_FORMATS)
    # every reference chrome marker is covered by our bad-image pattern
    for marker in G["image_score"]["chrome_markers"]:
        assert scraper._BAD_IMG_RE.search(f"/{marker}-x.png"), marker


def test_generator_reproduces_golden():
    """Regenerating from the reference sources yields the committed golden —
    i.e. the golden is live, not hand-edited."""
    out = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "gen_scrape_constants.py")],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    with open(GOLDEN) as f:
        assert json.load(f) == G


def test_byte_parity_generator_dormant():
    """The scrape byte-parity generator is landed and runnable the moment a
    container ships lxml; without lxml it must exit 0 reporting dormancy."""
    gen = os.path.join(os.path.dirname(__file__), "..", "scripts",
                       "gen_scrape_goldens.py")
    assert os.path.exists(gen)
    if importlib.util.find_spec("lxml") is None:
        out = subprocess.run([sys.executable, gen], capture_output=True,
                             text=True)
        assert out.returncode == 0
        assert "dormant" in out.stdout.lower()
    else:  # pragma: no cover — future container with lxml
        out = subprocess.run([sys.executable, gen], capture_output=True,
                             text=True)
        assert out.returncode == 0
