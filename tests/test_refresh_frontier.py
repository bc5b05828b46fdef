"""refresh_frontier_scores (ops/refreshq.py) → engine score_overrides:
the freshness twin of the OPIC two-phase crawl — N validator-carrying
crawls build per-URL change history, the Cho–Garcia-Molina λ̂ × age
priority ranks it, and a best-first re-crawl schedules the hot page
first. Asserts the estimator against the integer table AND that the
overrides actually drive generation order."""

from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.ops.refreshq import LAMBDA_E6, refresh_frontier_scores
from crawl4ai_spark.sources.pagesgen import generate_pages, generate_seeds

N_HOSTS, PPH = 3, 10
HOT = "https://www.host0.com/p2"   # a seed child (p0 links to it), mutated


def _mutate(pages, epoch: int):
    """New body for HOT each epoch; every other page byte-stable."""
    return pages.withColumn(
        "html",
        F.when(F.col("url") == HOT,
               F.concat(F.col("html"),
                        F.lit(f"<!-- rev {epoch} -->"))).otherwise(
            F.col("html")))


def test_refresh_scores_and_engine_priority(spark, tmp_path):
    pages = generate_pages(spark, N_HOSTS, PPH).cache()
    seeds = generate_seeds(spark, N_HOSTS)
    cfg = CrawlConfig(max_depth=3, max_pages=40, check_robots_txt=False,
                      store_validators=True)

    epochs, full_sets = [], []
    for i in range(4):
        r = SparkWebEngine(spark, str(tmp_path / f"e{i}")).run(
            _mutate(pages, i), seeds, config=cfg)
        full_sets.append({x.url for x in r.select("url").collect()})
        epochs.append(r.filter(F.col("success")).cache())
        epochs[-1].count()

    ov = refresh_frontier_scores(epochs).cache()
    scored = {r.url: r.score for r in ov.collect()}

    # the mutating page changed on all 3 transitions: λ̂(4,3), age 1;
    # stable pages sit at λ̂(4,0) = 0 changes
    assert scored[HOT] == LAMBDA_E6[(4, 3)] / 1e6
    stable = [u for u in scored if u != HOT]
    assert stable and all(
        scored[u] == LAMBDA_E6[(4, 0)] / 1e6 for u in stable)
    assert scored[HOT] > max(scored[u] for u in stable)

    # best-first re-crawl under freshness overrides with per_host_quota=1:
    # generation 1 fetches ONE host0 page, and the override forces it to
    # be HOT (its stable sibling p1 would tie or win otherwise)
    eng = SparkWebEngine(spark, str(tmp_path / "re"))
    eng.run(pages, seeds,
            config=CrawlConfig(policy="best_first", max_depth=3,
                               max_pages=40, check_robots_txt=False,
                               per_host_quota=1),
            score_overrides=ov, max_generations=2)
    gen_of = {r.url: r.generation for r in
              eng.results().select("url", "generation").collect()}
    assert gen_of[HOT] == 1
    assert gen_of.get("https://www.host0.com/p1", 99) >= 2

    # coverage invariance: a full-drain override run still crawls the
    # exact epoch URL set — overrides re-order, never drop
    eng2 = SparkWebEngine(spark, str(tmp_path / "re_full"))
    r2 = eng2.run(pages, seeds,
                  config=CrawlConfig(policy="best_first", max_depth=3,
                                     max_pages=40, check_robots_txt=False),
                  score_overrides=ov)
    assert {r.url for r in r2.select("url").collect()} == full_sets[0]


def test_refresh_scores_short_history_is_cold():
    """Fewer than MIN_VISITS epochs -> the λ table's ELSE 0 branch: no
    history, no priority (pure-python check of the table domain)."""
    assert (2, 1) not in LAMBDA_E6
    assert LAMBDA_E6[(3, 0)] < LAMBDA_E6[(3, 3)]
