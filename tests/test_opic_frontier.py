"""opic_frontier_scores (ops/analytics.py) → engine score_overrides: the
two-phase importance-first crawl — a discovery crawl builds the link
graph, OPIC ranks it, a best-first crawl spends its budget on importance.
Asserts the bridge's contract (coverage, score mapping) AND that the
overrides actually drive scheduling: the highest-OPIC seed child is
crawled in generation 1 of the override run."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.ops.analytics import opic_frontier_scores
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds

N_HOSTS, PPH = 3, 10


def test_opic_frontier_two_phase(spark, tmp_path):
    pages = generate_pages(spark, N_HOSTS, PPH)
    seeds = generate_seeds(spark, N_HOSTS)

    # phase 1: discovery crawl builds the graph
    r1 = SparkWebEngine(spark, str(tmp_path / "s1")).run(
        pages, seeds,
        config=CrawlConfig(max_depth=3, max_pages=40,
                           check_robots_txt=False))
    ov = opic_frontier_scores(r1).cache()

    # bridge contract: every crawled url scored, scores positive; link
    # targets outside the crawled set are scored too (they hold cash)
    crawled = {r.url for r in r1.select("url").collect()}
    scored = {r.url: r.score for r in ov.collect()}
    assert crawled <= set(scored)
    assert all(s > 0 for s in scored.values())

    # phase 2: best-first crawl under OPIC overrides
    eng2 = SparkWebEngine(spark, str(tmp_path / "s2"))
    r2 = eng2.run(pages, seeds,
                  config=CrawlConfig(policy="best_first", max_depth=3,
                                     max_pages=40, check_robots_txt=False),
                  score_overrides=ov)
    gen_of = {r.url: r.generation for r in
              eng2.results().select("url", "generation").collect()}

    # the highest-OPIC child of any seed must be crawled in generation 1:
    # best-first pops top scores and the override IS its score now
    seed_urls = {r.url for r in seeds.collect()}
    children = {
        r.dst for r in
        r1.filter(F.col("url").isin(list(seed_urls)))
        .select(F.explode("links.internal").alias("l"))
        .select(F.col("l.href").alias("dst")).collect()
        if r.dst not in seed_urls}
    top_child = max(children, key=lambda u: scored.get(u, 0.0))
    assert gen_of[top_child] == 1

    # coverage invariance: overrides re-order, never drop
    assert {r.url for r in r2.select("url").collect()} == crawled
