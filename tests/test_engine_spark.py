"""Spark integration tests: byte-identity (T1), BFS ordering parity vs the
single-process oracle (T2), Bloom FP-safety (T3), snapshot resume (T4),
politeness quota + robots gate."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
from crawl4ai_spark.functions.udfs import process_page, process_pages
from crawl4ai_spark.operators.bloom import build_bloom, filter_unseen, merge_blooms
from crawl4ai_spark.operators.politeness import schedule_batch
from crawl4ai_spark.sources.pagesgen import (
    gen_page,
    generate_pages,
    generate_robots,
    generate_seeds,
)
from crawl4ai_spark.sources.snapshots import SnapshotStore

from oracle_crawler import oracle_bfs

N_HOSTS, PPH = 4, 15


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages(spark, n_hosts=N_HOSTS, pages_per_host=PPH).cache()
    df.count()
    return df


# ---------------------------------------------------------------- T1 --------
def test_byte_identity_text_column(spark, pages):
    """Spark pipeline text == the oracle text stored at generation time."""
    res = process_pages(pages)
    bad = (
        res.alias("r").join(pages.alias("p"), "url")
        .filter("r.text != p.text").count()
    )
    assert bad == 0


def test_byte_identity_full_record(spark, pages):
    """Every output column byte-equal to the pure single-process pipeline."""
    rows = process_pages(pages).orderBy("url").limit(10).collect()
    for r in rows:
        h, p = r.url.split("host")[1].split(".com/p")
        golden = process_page(r.url, bytes(
            gen_page(int(h), int(p), N_HOSTS, PPH)["html"]).decode())
        assert r.cleaned_html == golden["cleaned_html"]
        assert r.markdown.raw_markdown == golden["markdown"]["raw_markdown"]
        assert r.markdown.markdown_with_citations == golden["markdown"]["markdown_with_citations"]
        assert r.markdown.fit_markdown == golden["markdown"]["fit_markdown"]
        assert r.metadata == golden["metadata"]
        assert [l.href for l in r.links.internal] == [l["href"] for l in golden["links"]["internal"]]


# ---------------------------------------------------------------- T2 --------
def test_bfs_parity_with_oracle(spark, pages, tmp_store):
    cfg = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10, policy="bfs")
    eng = SparkWebEngine(spark, tmp_store)
    robots = generate_robots(spark, n_hosts=N_HOSTS)
    res = eng.run(pages, generate_seeds(spark, n_hosts=N_HOSTS),
                  robots=robots, config=cfg)

    oracle = oracle_bfs(N_HOSTS, PPH, max_depth=3, max_pages=500, per_host_quota=10)
    got = {
        int(r["generation"]): set(r["urls"])
        for r in res.groupBy("generation")
        .agg(F.collect_set("url").alias("urls")).collect()
    }
    assert len(got) == len(oracle), (sorted(got), len(oracle))
    for g in oracle:
        assert got[g["generation"]] == g["scheduled"], f"gen {g['generation']}"

    # completed/blocked split matches too
    comp = {
        int(r["generation"]): set(r["urls"])
        for r in res.filter("success").groupBy("generation")
        .agg(F.collect_set("url").alias("urls")).collect()
    }
    for g in oracle:
        assert comp.get(g["generation"], set()) == g["completed"]


# ---------------------------------------------------------------- T3 --------
def test_bloom_no_false_negatives(spark):
    seen = spark.range(5000).selectExpr("concat('https://h', id % 50, '.com/p', id) as url")
    bloom = build_bloom(seen, n_shards=8, capacity_per_shard=2000, fp_rate=0.01).cache()
    # every seen url must be filtered out (no false negatives)
    out = filter_unseen(seen, bloom, n_shards=8, capacity_per_shard=2000, fp_rate=0.01)
    assert out.count() == 0
    # fresh urls: FP rate bounded (generous 5x margin on 1%)
    fresh = spark.range(5000).selectExpr(
        "concat('https://fresh', id % 50, '.org/q', id) as url")
    kept = filter_unseen(fresh, bloom, n_shards=8, capacity_per_shard=2000, fp_rate=0.01)
    fp = 5000 - kept.count()
    assert fp <= 5000 * 0.05, f"false positive rate too high: {fp}/5000"


def test_bloom_merge(spark):
    a = spark.range(100).selectExpr("concat('https://a.com/', id) as url")
    b = spark.range(100, 200).selectExpr("concat('https://a.com/', id) as url")
    ba = build_bloom(a, n_shards=4, capacity_per_shard=1000)
    bb = build_bloom(b, n_shards=4, capacity_per_shard=1000)
    merged = merge_blooms(ba, bb).cache()
    both = a.union(b)
    assert filter_unseen(both, merged, n_shards=4, capacity_per_shard=1000).count() == 0
    assert merged.agg(F.sum("n_items")).collect()[0][0] == 200


# ---------------------------------------------------------------- T4 --------
def test_resume_equals_uninterrupted(spark, pages, tmp_store):
    import os

    robots = generate_robots(spark, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    cfg = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10)

    full_root = os.path.join(tmp_store, "full")
    res_full = SparkWebEngine(spark, full_root).run(pages, seeds, robots=robots, config=cfg)
    full = {(r.url, r.generation, r.status_code) for r in res_full.collect()}

    part_root = os.path.join(tmp_store, "part")
    eng = SparkWebEngine(spark, part_root)
    eng.run(pages, seeds, robots=robots, config=cfg, max_generations=2)
    eng2 = SparkWebEngine(spark, part_root)  # "crash", new engine, same store
    res2 = eng2.run(pages, seeds, robots=robots, config=cfg, resume=True)
    resumed = {(r.url, r.generation, r.status_code) for r in res2.collect()}
    assert resumed == full


def test_resume_heals_orphan_results_commit(spark, pages, tmp_store):
    """commit_unified crash window (ADVICE r03 #3): results manifest
    published, frontier manifest NOT. Resume must roll the orphan results
    snapshot back before re-running the generation — otherwise the re-run
    appends duplicate result rows."""
    import os

    robots = generate_robots(spark, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    cfg = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10)

    full_root = os.path.join(tmp_store, "full_heal")
    res_full = SparkWebEngine(spark, full_root).run(pages, seeds, robots=robots, config=cfg)
    full = sorted((r.url, r.generation, r.status_code) for r in res_full.collect())

    part_root = os.path.join(tmp_store, "part_heal")
    eng = SparkWebEngine(spark, part_root)
    eng.run(pages, seeds, robots=robots, config=cfg, max_generations=2)
    # simulate the crash: drop the LAST frontier manifest so the results
    # table is one generation ahead of the frontier table
    eng.store.drop_latest("frontier")
    assert int(eng.store.meta("results")["generation"]) \
        > int(eng.store.meta("frontier")["generation"])

    eng2 = SparkWebEngine(spark, part_root)
    res2 = eng2.run(pages, seeds, robots=robots, config=cfg, resume=True)
    resumed = sorted((r.url, r.generation, r.status_code) for r in res2.collect())
    assert resumed == full  # sorted WITH duplicates: re-run appended none


def test_resume_rebuilds_stale_seen_filter(spark, pages, tmp_store):
    """r4: the unified publish order is results → frontier → url_seen, so a
    crash can leave the seen filter one generation behind. Resume must
    rebuild it from the frontier (full-scan bootstrap) — otherwise stale-
    filter re-admission enqueues duplicate QUEUED rows."""
    import os

    seeds = generate_seeds(spark, N_HOSTS)
    cfg = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10,
                      check_robots_txt=False, use_bloom=True,
                      bloom_shards=4, bloom_capacity_per_shard=4096)

    full_root = os.path.join(tmp_store, "bloom_full")
    res_full = SparkWebEngine(spark, full_root).run(pages, seeds, config=cfg)
    full = sorted((r.url, r.generation) for r in res_full.collect())

    part_root = os.path.join(tmp_store, "bloom_part")
    eng = SparkWebEngine(spark, part_root)
    eng.run(pages, seeds, config=cfg, max_generations=2)
    # simulate the crash window: frontier published, url_seen not
    eng.store.drop_latest("url_seen")
    assert int(eng.store.meta("url_seen")["generation"]) \
        < int(eng.store.meta("frontier")["generation"])

    eng2 = SparkWebEngine(spark, part_root)
    res2 = eng2.run(pages, seeds, config=cfg, resume=True)
    assert any(eng2.store.meta("url_seen", sid).get("rebuilt_on_resume")
               for sid in eng2.store.snapshot_ids("url_seen"))
    resumed = sorted((r.url, r.generation) for r in res2.collect())
    assert resumed == full  # sorted WITH duplicates — none were re-crawled


# ----------------------------------------------------- politeness/robots ----
def test_per_host_quota_enforced(spark):
    cand = spark.range(1000).selectExpr(
        "concat('https://h', id % 3, '.com/p', id) as url",
        "concat('h', id % 3, '.com') as host",
        "cast(id % 7 as double) as score",
        "cast(1 as int) as depth",
    )
    out = schedule_batch(cand, per_host_quota=5, n_salts=4)
    counts = out.groupBy("host").count().collect()
    assert all(r["count"] <= 5 for r in counts)
    # picks the highest scores per host
    top = out.filter("host = 'h0.com'").agg(F.min("score")).collect()[0][0]
    assert top == 6.0  # all five picked rows have the max score 6


def test_schedule_deterministic(spark):
    cand = spark.range(500).selectExpr(
        "concat('https://h', id % 5, '.com/p', id) as url",
        "concat('h', id % 5, '.com') as host",
        "cast(id % 3 as double) as score",
        "cast(1 as int) as depth",
    )
    a = sorted(r.url for r in schedule_batch(cand, per_host_quota=4).collect())
    b = sorted(r.url for r in schedule_batch(cand, per_host_quota=4).collect())
    assert a == b


def test_robots_gate_blocks_and_fails_open(spark, pages, tmp_store):
    robots = generate_robots(spark, n_hosts=N_HOSTS)
    eng = SparkWebEngine(spark, tmp_store)
    res = eng.run(pages, generate_seeds(spark, n_hosts=N_HOSTS), robots=robots,
                  config=CrawlConfig(max_depth=2, max_pages=300, per_host_quota=30))
    # host3 (last) fully disallowed → all its rows 403
    h3 = res.filter(F.col("url").contains("host3.com")).select("status_code").collect()
    assert h3 and all(r.status_code == 403 for r in h3)
    # host1 ≡ 1 mod 7 → no robots row → fail-open, pages crawl fine
    h1_ok = res.filter(F.col("url").contains("host1.com") & F.col("success")).count()
    assert h1_ok > 0
    # host0 (0 mod 3): /p3 subtree blocked
    blocked = res.filter(F.col("url") == "https://www.host0.com/p3").collect()
    if blocked:
        assert blocked[0].status_code == 403


# ----------------------------------------------------------- snapshots ------
def test_snapshot_store_time_travel(spark, tmp_store):
    store = SnapshotStore(tmp_store)
    df1 = spark.range(3).selectExpr("id as x")
    df2 = spark.range(10, 15).selectExpr("id as x")
    s0 = store.commit("t", df1, meta={"k": 1})
    s1 = store.commit("t", df2, mode="append")
    assert store.read(spark, "t", s0).count() == 3
    assert store.read(spark, "t", s1).count() == 8
    assert store.read(spark, "t").count() == 8
    assert store.latest_id("t") == s1
    assert store.meta("t", s0) == {"k": 1}


# ------------------------------------------------- T2: other policies -------
def test_bestfirst_parity_with_oracle(spark, pages, tmp_store):
    import os
    from oracle_crawler import oracle_policy

    cfg = CrawlConfig(max_depth=2, max_pages=120, per_host_quota=6,
                      policy="best_first", batch_size=10,
                      check_robots_txt=False)
    eng = SparkWebEngine(spark, os.path.join(tmp_store, "bff"))
    res = eng.run(pages, generate_seeds(spark, n_hosts=N_HOSTS), config=cfg)
    oracle = oracle_policy(N_HOSTS, PPH, policy="best_first", max_depth=2,
                           max_pages=120, per_host_quota=6, batch_size=10)
    got = {
        int(r["generation"]): set(r["urls"])
        for r in res.groupBy("generation")
        .agg(F.collect_set("url").alias("urls")).collect()
    }
    assert len(got) == len(oracle)
    for g in oracle:
        assert got[g["generation"]] == g["scheduled"], f"gen {g['generation']}"


def test_dfs_parity_with_oracle(spark, pages, tmp_store):
    import os
    from oracle_crawler import oracle_policy

    cfg = CrawlConfig(max_depth=2, max_pages=150, per_host_quota=8,
                      policy="dfs", check_robots_txt=False)
    eng = SparkWebEngine(spark, os.path.join(tmp_store, "dfs"))
    res = eng.run(pages, generate_seeds(spark, n_hosts=N_HOSTS), config=cfg)
    oracle = oracle_policy(N_HOSTS, PPH, policy="dfs", max_depth=2,
                           max_pages=150, per_host_quota=8)
    got = {
        int(r["generation"]): set(r["urls"])
        for r in res.groupBy("generation")
        .agg(F.collect_set("url").alias("urls")).collect()
    }
    assert len(got) == len(oracle)
    for g in oracle:
        assert got[g["generation"]] == g["scheduled"], f"gen {g['generation']}"


def test_lineage_and_metrics_tables(spark, pages, tmp_store):
    import os
    eng = SparkWebEngine(spark, os.path.join(tmp_store, "lin"))
    res = eng.run(pages, generate_seeds(spark, n_hosts=N_HOSTS),
                  config=CrawlConfig(max_depth=2, max_pages=60,
                                     check_robots_txt=False))
    n = res.count()
    lin = eng.lineage()
    assert lin is not None
    # every successful row is attributed to exactly one partition
    assert lin.agg(F.sum("n_rows")).collect()[0][0] >= n - \
        res.filter("part_id is null").count()
    m = eng.metrics()
    assert m is not None and m.count() > 0
    gens = {r.generation for r in m.select("generation").distinct().collect()}
    assert 0 in gens


def test_head_filters_gate_candidates(spark, pages, tmp_store):
    """F10 tail in the crawl path: with relevance_query set, discovered
    candidates whose page head fails the BM25-lite gate never enter the
    frontier (ref ContentRelevanceFilter in the deep-crawl filter chain)."""
    import os
    eng = SparkWebEngine(spark, os.path.join(tmp_store, "headf"))
    res = eng.run(
        pages, generate_seeds(spark, N_HOSTS),
        config=CrawlConfig(max_depth=2, max_pages=60, check_robots_txt=False,
                           relevance_query="host0", relevance_threshold=0.5),
    )
    got = res.filter(F.col("success")).select("host", "depth").collect()
    # every crawled page beyond the seeds belongs to host0 (its titles are
    # "host0 page<p> <word>" — the only heads matching the query)
    deep = [r for r in got if r["depth"] > 0]
    assert deep, "filter should still admit matching candidates"
    assert all(r["host"] == "www.host0.com" for r in deep)
    # seeds themselves are never head-filtered
    assert {r["host"] for r in got if r["depth"] == 0} == {
        f"www.host{h}.com" for h in range(N_HOSTS)}


def test_host_bucketed_pages_prune_and_match(spark, pages, tmp_store, tmp_path_factory):
    """100 TB scan design: pages stored partitioned by host hash-bucket; the
    fetch join keys on (url, hb) so dynamic partition pruning restricts the
    scan to the scheduled hosts' buckets — and results are identical to the
    unpartitioned path."""
    import os

    from crawl4ai_spark.sources.pagesgen import (
        host_bucket_col,
        write_pages_partitioned,
    )

    pdir = str(tmp_path_factory.mktemp("pages_hb"))
    write_pages_partitioned(pages, pdir)
    pages_hb = spark.read.parquet(pdir)
    assert "hb" in pages_hb.columns

    cfg = CrawlConfig(max_depth=2, max_pages=60, check_robots_txt=False)
    eng_a = SparkWebEngine(spark, os.path.join(tmp_store, "hb_part"))
    res_a = eng_a.run(pages_hb, generate_seeds(spark, N_HOSTS), config=cfg)
    eng_b = SparkWebEngine(spark, os.path.join(tmp_store, "hb_plain"))
    res_b = eng_b.run(pages, generate_seeds(spark, N_HOSTS), config=cfg)
    a = {(r["url"], r["success"]) for r in res_a.select("url", "success").collect()}
    b = {(r["url"], r["success"]) for r in res_b.select("url", "success").collect()}
    assert a == b

    # the engine's pruned-scan shape: a static hb IN (...) partition filter
    # reaches the file scan (deterministic pruning, no optimizer heuristics)
    pruned = pages_hb.filter(F.col("hb").isin([3, 7]))
    plan = pruned.join(
        F.broadcast(pages_hb.select("url").limit(5)), on="url"
    )._jdf.queryExecution().executedPlan().toString()
    import re as _re
    m = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert m and _re.search(r"hb.* IN \(3,7\)|hb.*IN \(3, ?7\)", m[0]), m


def test_robots_ttl_expires_to_fail_open(spark, pages, tmp_store):
    """S9 TTL: stale robots rows (fetch_time older than the ttl) are treated
    as missing → fail-open, mirroring the reference's 7-day cache expiry."""
    import os

    from crawl4ai_spark.sources.pagesgen import generate_robots, generate_seeds

    # robots stamped far in the past (generate_robots default = 2025-01-01)
    robots = generate_robots(spark, N_HOSTS)
    seeds = generate_seeds(spark, N_HOSTS)
    base = CrawlConfig(max_depth=1, max_pages=40, check_robots_txt=True)

    eng1 = SparkWebEngine(spark, os.path.join(tmp_store, "ttl_on"))
    res1 = eng1.run(pages, seeds, robots=robots, config=base)
    n_blocked = res1.filter(F.col("status_code") == 403).count()
    assert n_blocked > 0  # fresh-enough rules do block

    stale_cfg = CrawlConfig(max_depth=1, max_pages=40, check_robots_txt=True,
                            robots_ttl_s=60)  # everything is older than 60s
    eng2 = SparkWebEngine(spark, os.path.join(tmp_store, "ttl_stale"))
    res2 = eng2.run(pages, seeds, robots=robots, config=stale_cfg)
    assert res2.filter(F.col("status_code") == 403).count() == 0  # fail-open


def test_run_many_and_run_one(spark, pages, tmp_store):
    """arun/arun_many analogs: explicit url lists crawl as flat batches —
    every url processed, no link discovery."""
    import os

    from crawl4ai_spark.sources.pagesgen import page_url

    urls = [page_url(0, p) for p in range(5)] + [page_url(1, 0)]
    eng = SparkWebEngine(spark, os.path.join(tmp_store, "many"))
    res = eng.run_many(pages, urls, config=CrawlConfig(check_robots_txt=False))
    got = {r["url"] for r in res.select("url").collect()}
    assert got == set(urls)          # exactly the requested urls, nothing else
    assert res.filter(F.col("depth") > 0).count() == 0

    eng1 = SparkWebEngine(spark, os.path.join(tmp_store, "one"))
    one = eng1.run_one(pages, page_url(0, 3),
                       config=CrawlConfig(check_robots_txt=False))
    rows = one.collect()
    assert len(rows) == 1 and rows[0]["success"]
    assert len(rows[0]["markdown"]["raw_markdown"]) > 0


def test_snapshot_compaction_preserves_rows_and_history(spark, pages, tmp_store):
    """Offline compaction folds an append-heavy table's dirs into one while
    keeping rows identical and history (time travel) intact."""
    import os

    eng = SparkWebEngine(spark, os.path.join(tmp_store, "compact"))
    eng.run(pages, generate_seeds(spark, N_HOSTS),
            config=CrawlConfig(max_depth=2, max_pages=60, check_robots_txt=False))
    store = eng.store
    before_sid = store.latest_id("frontier")
    before_dirs = len(store._read_manifest("frontier", before_sid)["dirs"])
    assert before_dirs > 1  # append log accumulated per-generation dirs
    before_rows = sorted(r["url"] + r["status"] + str(r["retry_count"])
                         for r in store.read(spark, "frontier").collect())

    new_sid = store.compact(spark, "frontier", target_partitions=2)
    assert new_sid == before_sid + 1
    assert len(store._read_manifest("frontier", new_sid)["dirs"]) == 1
    after_rows = sorted(r["url"] + r["status"] + str(r["retry_count"])
                        for r in store.read(spark, "frontier").collect())
    assert after_rows == before_rows
    # time travel to the pre-compaction snapshot still works
    assert store.read(spark, "frontier", before_sid).count() == len(before_rows)
    assert store.meta("frontier")["compacted_from"] == before_sid


def test_auto_compaction_invariant_and_resumable(spark, pages, tmp_store):
    """Engine-driven semantic compaction (compact_every): the run's results
    and final frontier view are identical to an uncompacted run, the log
    folds to ≤1 row per (url, retry_count), and resume across a compacted
    store reproduces the uninterrupted crawl."""
    import os

    robots = generate_robots(spark, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    base = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10)

    ref_root = os.path.join(tmp_store, "nocompact")
    from dataclasses import replace
    res_ref = SparkWebEngine(spark, ref_root).run(
        pages, seeds, robots=robots, config=replace(base, compact_every=0))
    ref = {(r.url, r.generation, r.status_code) for r in res_ref.collect()}

    ac_root = os.path.join(tmp_store, "autocompact")
    eng = SparkWebEngine(spark, ac_root)
    res_ac = eng.run(pages, seeds, robots=robots,
                     config=replace(base, compact_every=2))
    got = {(r.url, r.generation, r.status_code) for r in res_ac.collect()}
    assert got == ref

    # the log actually folded: at most one row per (url, retry_count), and
    # the manifest was reset to few dirs (compaction ran at least once)
    fr = eng.store.read(spark, "frontier")
    dup_keys = (fr.groupBy("url", "retry_count").count()
                .filter(F.col("count") > 1).count())
    assert dup_keys == 0
    assert eng.store.meta("frontier").get("compacted_at_gen") is not None or \
        eng.store.n_dirs("frontier") < 2
    ref_eng = SparkWebEngine(spark, ref_root)
    assert eng.store.n_dirs("frontier") < ref_eng.store.n_dirs("frontier")

    # frontier merge-on-read view matches the uncompacted run's view
    v_ref = {(r.url, r.retry_count, r.status)
             for r in ref_eng.frontier().collect()}
    v_ac = {(r.url, r.retry_count, r.status) for r in eng.frontier().collect()}
    assert v_ac == v_ref

    # resume across a compaction boundary reproduces the full crawl
    part_root = os.path.join(tmp_store, "autocompact_part")
    eng_p = SparkWebEngine(spark, part_root)
    eng_p.run(pages, seeds, robots=robots,
              config=replace(base, compact_every=2), max_generations=3)
    eng_p2 = SparkWebEngine(spark, part_root)
    res_p = eng_p2.run(pages, seeds, robots=robots,
                       config=replace(base, compact_every=2), resume=True)
    resumed = {(r.url, r.generation, r.status_code) for r in res_p.collect()}
    assert resumed == ref


def test_unbounded_max_pages_drains_without_takeordered(spark, pages, tmp_store):
    """Regression (r3 sf1 soak find): an effectively-unbounded max_pages
    sentinel (1<<30) used to flow into orderBy().limit(k) — Spark's
    TakeOrdered preallocates a k-entry priority queue per partition, OOMing
    the JVM before any row flows. Above the threshold the per-generation
    cap must drop out of the plan entirely and the crawl still drains."""
    import os

    eng = SparkWebEngine(spark, os.path.join(tmp_store, "unbounded"))
    res = eng.run(pages, generate_seeds(spark, N_HOSTS),
                  config=CrawlConfig(max_depth=3, max_pages=1 << 30,
                                     per_host_quota=31,
                                     check_robots_txt=False))
    n = res.count()
    assert n > 0
    # every reachable page was drained (4 hosts x 15 pages incl. 404 edges)
    assert res.filter(F.col("success")).count() > 0


# ---------------------------------------------------------------- T16 -------
def test_restart_on_dirty_store_equals_fresh(spark, pages, tmp_store):
    """A NON-resume run over a store that already holds a finished crawl:
    run-scoped state (host_state backoff, url_seen filter) must NOT bleed
    from the previous crawl — the store reset() guards that — while the
    results table deliberately accumulates (it IS the CacheMode cross-run
    cache). Contract: the returned attempt log covers exactly the fresh
    result set, and the only multiset growth is re-attempts of FAILED
    urls (failures are never cache hits, so they re-fetch)."""
    import os
    from collections import Counter

    robots = generate_robots(spark, n_hosts=N_HOSTS)
    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    cfg = CrawlConfig(max_depth=3, max_pages=500, per_host_quota=10)

    root = os.path.join(tmp_store, "restart")
    res1 = SparkWebEngine(spark, root).run(pages, seeds, robots=robots,
                                           config=cfg)
    first = [(r.url, r.generation, r.status_code, r.success)
             for r in res1.collect()]

    eng2 = SparkWebEngine(spark, root)  # same store, resume NOT requested
    res2 = eng2.run(pages, seeds, robots=robots, config=cfg)
    second = [(r.url, r.generation, r.status_code, r.success)
              for r in res2.collect()]
    assert set(second) == set(first)  # same coverage, no stale-state rows
    extra = Counter(second) - Counter(first)
    # every extra row is a re-attempt of a url that FAILED in run 1
    # (cache serves successes only); none may be a success duplicate
    failed_urls = {u for (u, _g, _s, ok) in first if not ok}
    assert all(u in failed_urls and not ok
               for (u, _g, _s, ok) in extra)
    # the restart must also have truncated the backoff table: a fresh
    # crawl on this corpus tracks hosts only from its OWN 429/503s
    assert int(eng2.store.meta("frontier").get("generation", -2)) >= 0


# ---------------------------------------------------------------- T17 -------
def test_restart_does_not_mix_generations_into_backoff(spark, pages,
                                                       tmp_store):
    """Generation numbering restarts at 0 on a fresh (non-resume) run
    while the results table keeps the previous crawl's dirs, so the
    host_state fold's filter(generation == g) would merge the OLD crawl's
    same-numbered rows back in — unless the fold reads only this run's
    delta (store.read_since). Run 1 rate-limits host0; run 2 (same store,
    bypass cache so everything refetches) rate-limits host1 only: the
    rebuilt backoff table must track host1 and NEVER host0."""
    import os

    seeds = generate_seeds(spark, n_hosts=N_HOSTS)
    root = os.path.join(tmp_store, "restart_hs")

    cfg1 = CrawlConfig(max_depth=2, max_pages=60, check_robots_txt=False,
                       cache_mode="bypass", simulate_503_hosts="host0")
    SparkWebEngine(spark, root).run(pages, seeds, config=cfg1)

    cfg2 = CrawlConfig(max_depth=2, max_pages=60, check_robots_txt=False,
                       cache_mode="bypass", simulate_503_hosts="host1")
    eng2 = SparkWebEngine(spark, root)
    eng2.run(pages, seeds, config=cfg2)

    hs = eng2.store.read(spark, "host_state")
    assert hs is not None
    limited = {r.host for r in
               hs.filter(F.col("fail_count") > 0).collect()}
    assert any("host1" in h for h in limited)
    assert not any("host0" in h for h in limited), (
        "previous run's generation rows leaked into the backoff fold")
