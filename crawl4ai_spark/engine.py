"""SparkWebEngine — the crawl-and-extract orchestrator.

API surface mirrors the reference's AsyncWebCrawler
(/root/reference/crawl4ai/async_webcrawler.py:204,665 + DeepCrawlStrategy
deep_crawling/base_strategy.py:99-105), DataFrame-in/DataFrame-out:

    engine = SparkWebEngine(spark, store_root)
    results = engine.run(pages, seeds, robots=robots, config=CrawlConfig(...))

One *generation* = one deterministic Spark job:
    scheduled ← frontier.filter(status='QUEUED')         (+ policy ORDER BY,
                per-host quota via salted rank window, robots broadcast gate)
    fetched   ← scheduled ⋈ pages (equi-join on url — the "fetch")
    results   ← fetched.mapInPandas(scrape+markdown+extract)   one Arrow stage
    newlinks  ← explode(links) → normalize → URL-seen dedup (anti-join or
                partitioned Bloom) → enqueue depth+1
    frontier' ← status updates ∪ new rows  → snapshot commit (checkpoint)

The driver loop crosses the driver↔executor boundary once per generation
(one count()); everything else is lazy DataFrame lineage. Resumable: pass
``resume=True`` and the loop continues from the latest committed snapshots.
Per-generation metrics (urls scheduled/fetched/failed, per-host counts) land
in a ``metrics`` snapshot table — the CrawlerTaskResult analog
(ref models.py:22-37).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.functions.udfs import process_pages
from crawl4ai_spark.operators import dispatch as DSP
from crawl4ai_spark.operators import frontier as FR
from crawl4ai_spark.operators import politeness as POL
from crawl4ai_spark.operators.bloom import build_bloom, filter_unseen, merge_blooms
from crawl4ai_spark.sources.snapshots import SnapshotStore


@dataclass
class CrawlConfig:
    """Subset of the reference's CrawlerRunConfig that matters on Spark."""
    max_depth: int = 3                 # ref bfs_strategy.py max_depth
    max_pages: int = 1_000             # ref max_pages cap
    policy: str = "bfs"                # bfs | dfs | best_first
    per_host_quota: int = 10           # politeness budget per generation
    batch_size: int | None = None      # global cap per generation (best_first: 10)
    score_threshold: float | None = None
    include_external: bool = False
    check_robots_txt: bool = True
    # S9 TTL (ref utils.py:252-311 — 7-day robots cache): when set, robots
    # rows with fetch_time older than now-ttl are treated as missing →
    # fail-open, exactly like the reference's expired-cache refetch path
    # degraded to a table-only world. None disables the cutoff.
    robots_ttl_s: int | None = None
    # REP Crawl-delay (operators/politeness.py crawl_delay_table): when
    # true, a host's advertised delay becomes a per-generation quota —
    # clamp(crawl_delay_window_s div delay, 1, per_host_quota) — merged
    # (min) with the 429/503 backoff quota. Off by default: the default
    # path stays byte-identical.
    respect_crawl_delay: bool = False
    crawl_delay_window_s: int = 20
    # Robots matching dialect: "robotparser" (stdlib prefix semantics —
    # reference parity, the default) or "rfc9309" (modern REP: '*'/'$'
    # wildcards, longest-match precedence, Allow wins ties — rules
    # compiled once per run, gate is the native max-struct fold in
    # ops/scheduling.rfc9309_decision). Identical on wildcard-free
    # robots files (tested).
    robots_dialect: str = "robotparser"
    # Registrable-domain budget sharing (ops/scheduling.py politeness_pld
    # shape): when set, each generation splits this budget across the
    # queued hosts of every registrable domain — a 5-subdomain farm gets
    # pld_budget div 5 per host instead of 5 full budgets. Merged
    # min-wise with backoff + Crawl-delay quotas. None = off.
    pld_budget: int | None = None
    # DUST rewrite rules (ops/dustq.py mine_dust_rules output): learned
    # content-irrelevant params are stripped from DISCOVERED links right
    # after normalization, so variant URLs collapse to one frontier row
    # before URL-seen/scheduling ever see them. None = off (default path
    # byte-identical).
    dust_rules: DataFrame | None = None
    user_agent: str = "*"
    use_bloom: bool = False            # F5 fast path (exact anti-join is default)
    seen_backend: str = "bloom"        # "bloom" | "cuckoo" (cuckoo: deletable)
    bloom_shards: int = 16
    bloom_capacity_per_shard: int = 1_000_000
    bloom_fp_rate: float = 0.01
    word_count_threshold: int = 1
    excluded_tags: list | None = None
    extraction_schema: dict | None = None
    cosine_extraction: dict | None = None   # CosineClusterExtraction kwargs
    llm_extraction: dict | None = None      # LLMExtractionStrategy kwargs
                                            # (+ "provider" callable)
    # F13/F14 dispatcher analogs (operators/dispatch.py): admission control
    # over the GENERATION batch size. "memory_adaptive" shrinks/defers the
    # batch under memory pressure and folds the reference's fairness/aging
    # priority into scheduling; "semaphore" pins a fixed batch. None (the
    # default) leaves admission to max_pages/batch_size alone.
    dispatcher: str | None = None
    dispatcher_opts: dict = field(default_factory=dict)
    content_filter: str = "pruning"    # pruning | bm25
    bm25_query: str | None = None
    n_salts: int = 8
    # auto-compaction cadence for the frontier event log (VERDICT r02
    # "what's wrong" #5): once the log accumulates this many append dirs
    # (≈ generations), the engine folds it to ONE row per (url, retry_count)
    # event key — departure events override their enqueue events — and
    # publishes the fold as a fresh snapshot. Keeps the per-generation
    # `queued` reconstruction scan proportional to the LIVE set (+1 row per
    # ever-seen url, which the exact URL-seen anti-join requires), not to
    # run history. 0 disables.
    compact_every: int = 16
    # CacheMode analog (ref cache_context.py:23-92 + async_webcrawler.py:267):
    # "enabled"    = read + write (skip urls already crawled successfully)
    # "read_only"  = serve cache hits, but rows written now are NOT hits later
    # "write_only" = ignore existing cache, rows written now ARE hits later
    # "bypass"/"disabled" = neither (always fetch+reprocess; rows not hits)
    # read path = left anti-join vs successful cached rows (SURVEY §2 S7);
    # "write" here means the result rows carry cached=true — the results
    # table itself is always persisted (it IS the output).
    cache_mode: str = "enabled"
    # deterministic rate-limit injection for tests/benchmarks: hosts matching
    # this regex answer 503 on their FIRST attempt (retry_count=0), exercising
    # the requeue (F16) + exponential backoff + quota-shrink (F12) loop
    simulate_503_hosts: str | None = None
    # F20 link preview: when set, discovered candidates join the pages head
    # metadata and re-score 0.7·intrinsic + 0.3·contextual(query)·10
    link_preview_query: str | None = None
    # F10 head-content filters (ref deep_crawling/filters.py:509-698):
    # candidates whose page-head fails the gate never enter the frontier.
    # Like the reference, a candidate with NO head data is rejected when a
    # head filter is active (ContentRelevanceFilter.apply returns False on
    # missing head content).
    relevance_query: str | None = None       # BM25-lite vs title/desc/keywords
    relevance_threshold: float = 1.0
    seo_threshold: float | None = None       # ref SEOFilter default is 0.65
    seo_keywords: list | None = None
    # S12 write side: sink="warc" makes run() export the crawl's result set
    # as WARC/1.0 segments under sink_dir once the loop completes (one
    # segment per host bucket, html/warc.py writer; pages_from_warc reads
    # them back byte-identically). sink_date pins WARC-Date so segments are
    # deterministic.
    sink: str | None = None
    sink_dir: str | None = None
    sink_buckets: int = 8
    sink_date: str = "2026-01-01T00:00:00Z"
    # Driver-side commit pipelining (VERDICT r04 next-round #8): when True,
    # generation g's unified commit runs in a worker thread while
    # generation g+1's schedule + fetch actions execute — the store commit
    # stays the ordering barrier (commit g always completes before commit
    # g+1 starts, so crash-consistency and resume semantics are unchanged;
    # the next schedule reads committed-≤g-1 manifests unioned with g's
    # in-memory delta). Trade-off: the host-backoff fold for generation g
    # runs one iteration later, so 429/503 backoff windows START one
    # generation late (requeues themselves ride the frontier delta and are
    # unaffected; a full drain crawls the same result set — asserted by
    # test). Default off; bench A/B decides where it pays.
    pipeline_commits: bool = False
    # CrawlResult.ssl_certificate analog (ref async_configs.py:1298
    # `fetch_ssl_certificate`, ssl_certificate.py:62-134 field set,
    # models.py:149): when True and a `certs` table is passed to run(),
    # the RETURNED results carry an `ssl` struct broadcast-joined on host
    # (null where the handshake "failed" = no certs row). The stored
    # results table is unchanged — the cert is response enrichment, like
    # the reference attaching it to CrawlResult, so resume/schema are
    # unaffected.
    fetch_ssl_certificate: bool = False
    # CrawlResult.redirected_url analog (ref models.py:151): a RESOLVED
    # redirect map DataFrame (src_url, dst_url) — e.g. the output of
    # ops/redirectq.resolve_redirects over a raw 3xx edge set, so chains
    # are already collapsed and cycles dropped. When set, scheduled URLs
    # with a map entry fetch the TARGET's content (each distinct target
    # fetched once, then fanned back to its originals), results keep the
    # ORIGINAL url and carry `redirected_url` = landing URL; targets
    # missing from pages 404 under the original url. None (default)
    # leaves the fetch path byte-identical — no extra column, no join.
    redirects: object | None = None
    # Crawl-trap pattern block-list (the ops/trapq.q_trap_detect
    # composition — Mercator-style pattern budgeting applied as a
    # scheduler gate): (host, pattern) rows where pattern is the URL
    # digit-template regexp_replace(url, '[0-9]+', '#'). Queued candidates
    # whose (host, template) matches are dropped BEFORE ranking, so a
    # flagged calendar/faceted explosion never spends quota again. The
    # table is O(#flagged patterns) — broadcast, one left-anti join.
    # Build it from a finished discovery crawl with
    # ops/trapq.trap_patterns_from_results(results). None (default)
    # leaves the schedule path byte-identical — no column, no join.
    blocked_patterns: object | None = None
    # HTTP revalidation (the conditional-GET fleet that
    # ops/refreshq.q_revisit_economics prices): ``store_validators`` makes
    # result rows carry ``content_md5`` — the strong validator (hex md5 of
    # the raw fetched bytes), hashed inside the scrape Arrow pass at zero
    # extra scan cost. ``revalidate`` turns a re-crawl into the conditional
    # fleet: scheduled urls are NOT cache-skipped (the seeds/refresh policy
    # decides what to re-check); instead each fetched body's JVM-native
    # F.md5 is compared against the stored validators, and urls whose
    # (url, md5) pair is already cached short-circuit to a 304 row that
    # REUSES the cached processed columns — unchanged bodies never enter
    # the python scrape stage, so a re-crawl where 95% of the web is
    # unchanged pays python for only the 5% delta. Fresh/changed rows flow
    # the normal path (and store their validator, so chains of re-crawls
    # work). Both default False: the default path stays byte-identical —
    # no extra column, no join.
    store_validators: bool = False
    revalidate: bool = False
    # Robots Exclusion Protocol meta-tag gate (<meta name="robots">):
    # when True, result rows carry noindex/nofollow booleans parsed inside
    # the scrape Arrow pass (order-agnostic, multiple tags OR'd, "none" =
    # both), and the engine ENFORCES them the way a polite indexer does —
    # links discovered on a nofollow page never enter the frontier, and
    # noindex pages are excluded from the WET text-corpus export while
    # STAYING in results and WARC (archive-complete, index-clean: the
    # Common-Crawl position). Default False: no columns, byte-identical
    # default path.
    respect_meta_robots: bool = False
    extra: dict = field(default_factory=dict)


class SparkWebEngine:
    def __init__(self, spark: SparkSession, store_root: str):
        self.spark = spark
        self.store = SnapshotStore(store_root)
        # per-generation stage breakdown, appended by run() — driver-side
        # clocks only (schedule / fetch+extract / commit / compact /
        # host_state), for soak drain-tail attribution
        self.gen_profile: list[dict] = []

    def _read_frontier(self) -> DataFrame | None:
        """Frontier log projected to its own schema. The unified event
        commit stores frontier rows beside result rows in a shared parquet
        dir, so a raw read carries merge-schema'd result columns (nested
        markdown/links structs, null for frontier rows) — besides being
        waste, feeding those null structs into a pandas-UDF's Arrow
        conversion segfaults pyarrow. Projecting here keeps every frontier
        consumer on the narrow columns (and lets parquet prune the rest)."""
        fr = self.store.read(self.spark, "frontier")
        if fr is None:
            return None
        return fr.select([f.name for f in FR.FRONTIER_SCHEMA.fields])

    # ------------------------------------------------------------------ run
    def run(self, pages: DataFrame, seeds: DataFrame, *,
            robots: DataFrame | None = None,
            certs: DataFrame | None = None,
            config: CrawlConfig | None = None,
            resume: bool = False,
            max_generations: int | None = None,
            score_overrides: DataFrame | None = None) -> DataFrame:
        """``score_overrides`` ((url, score) rows, best_first only): queued
        frontier rows matching a url take the overridden score for THIS
        run's scheduling — the hook the adaptive embedding strategy uses to
        re-rank pending links by semantic gap-fill (reference
        EmbeddingStrategy.rank_links, adaptive_crawler.py:1067-1096).
        Broadcast-joined; rows without an override keep their stored score."""
        cfg = config or CrawlConfig()
        spark = self.spark
        self._pages = pages  # used by F20 link-preview enrichment
        self._score_overrides = score_overrides

        # Frontier = ONE append-only delta log (the 10^10-URL design): every
        # row is an EVENT — status QUEUED when a url enters the queue,
        # COMPLETED/FAILED when it leaves. queued = QUEUED rows anti-join
        # non-QUEUED (url, retry_count) keys. A generation appends O(delta)
        # rows in a SINGLE commit — it never rewrites the frontier (an
        # Iceberg MERGE-on-read layout; compaction is an offline concern).
        # resume continues the generation numbering, so its fold reads may
        # (must) see the whole table; fresh starts scope to their own delta
        self._results_base: int | None = None
        if resume and self.store.latest_id("frontier") is not None:
            # Heal the commit_unified crash window: if a crash landed between
            # the results manifest rename and the frontier one, the results
            # table carries generations the frontier never committed — the
            # resumed loop would re-run them and append duplicates. Roll the
            # orphans back (their data dirs stay, unreferenced).
            f_gen = int(self.store.meta("frontier").get("generation", 0))
            while (self.store.latest_id("results") is not None
                   and int(self.store.meta("results")
                           .get("generation", -(1 << 30))) > f_gen):
                self.store.drop_latest("results")
            # seen-filter staleness heal: the unified publish order is
            # results → frontier → url_seen, so a crash can leave the filter
            # one generation behind the frontier. A stale filter re-admits
            # already-queued URLs (duplicate QUEUED rows); rebuild it from
            # the frontier — the same full-scan bootstrap the first
            # filter-enabled generation uses — restoring the "covers every
            # url ever enqueued" invariant.
            if cfg.use_bloom and self.store.latest_id("url_seen") is not None \
                    and int(self.store.meta("url_seen")
                            .get("generation", -(1 << 30))) < f_gen:
                build_f, _ = self._seen_backend(cfg)
                self.store.commit(
                    "url_seen", build_f(self._read_frontier().select("url")),
                    meta={"generation": f_gen, "rebuilt_on_resume": True})
            frontier = self._read_frontier()
            start_gen = int(self.store.meta("frontier").get("generation", 0)) + 1
            pages_done = int(self.store.meta("frontier").get("pages_done", 0))
        else:
            # Fresh start over a possibly-dirty store: truncate the
            # RUN-SCOPED state tables. Without this, update_host_state
            # seeds the new run with the previous crawl's backoff state
            # (observed: +1 phantom retry row on a restarted store) and a
            # stale seen-filter mislabels this run's URLs. results /
            # metrics / lineage deliberately accumulate across runs — the
            # results table IS the CacheMode cross-run cache (ref
            # cache_context semantics; test_cache_mode) and the logs are
            # the store's audit trail.
            for t in ("host_state", "url_seen"):
                if self.store.latest_id(t) is not None:
                    self.store.reset(t)
            # generation numbering restarts at 0 while the results table
            # keeps the previous crawl's dirs (the CacheMode cache), so
            # generation-filtered fold reads must see only THIS run's
            # rows: remember the pre-run snapshot as the delta base
            self._results_base = self.store.latest_id("results")
            frontier = FR.seeds_to_frontier(seeds)
            self.store.commit("frontier", frontier, meta={"generation": -1, "pages_done": 0})
            frontier = self._read_frontier()
            start_gen = 0
            pages_done = 0

        gen = start_gen
        gen_stats: list[tuple[int, int, float]] = []
        # whether any host is under backoff tracking (drives the conditional
        # host_state fold below); on resume, trust the last commit's meta
        hosts_tracked = int(self.store.meta("host_state").get("n_hosts", 0)) > 0
        # run until the frontier drains (max_depth/max_pages bound the loop);
        # max_generations is for tests / partial runs
        max_gens = max_generations if max_generations is not None else 1 << 20

        # F13/F14: generation-batch admission controller. Base batch = the
        # configured cap (or the remaining budget when uncapped).
        controller = None
        check_interval = 1.0
        if cfg.dispatcher:
            opts = dict(cfg.dispatcher_opts)
            check_interval = float(opts.pop("check_interval", 1.0))
            opts.pop("fairness_timeout_gens", None)  # scheduling knob, below
            controller = DSP.make_controller(
                cfg.dispatcher,
                cfg.batch_size if cfg.batch_size is not None
                else min(cfg.max_pages, 1 << 19),
                opts)

        # commit-pipelining state (cfg.pipeline_commits): the in-flight
        # commit of the previous generation, joined before the next commit
        # (ordering barrier) and before anything reads its manifests.
        import threading as _th

        pending: dict | None = None

        def _join_pending() -> float:
            """Barrier on the in-flight commit; runs the deferred
            host-backoff fold for that generation. Returns seconds waited."""
            nonlocal pending, hosts_tracked
            if pending is None:
                return 0.0
            tj = time.time()
            pending["thread"].join()
            if pending.get("err") is not None:
                raise pending["err"]
            n_lim = int(pending["obs"].get.get("n_limited") or 0)
            pending["results"].unpersist()
            pending["batch"].unpersist()
            pgen = pending["gen"]
            pending = None
            if n_lim > 0 or hosts_tracked:
                prev_hs = self.store.read(spark, "host_state")
                gen_res = self.store.read_since(spark, "results",
                                                self._results_base) \
                              .filter(F.col("generation") == pgen)
                hs = POL.update_host_state(
                    prev_hs, gen_res.select("host", "status_code"), pgen)
                hobs = Observation(f"hs{pgen}")
                hs = hs.observe(hobs, F.count(F.lit(1)).alias("n_hosts"))
                sid = self.store.commit("host_state", hs,
                                        meta={"generation": pgen})
                n_hosts = int(hobs.get.get("n_hosts") or 0)
                self.store.amend_meta("host_state", sid, {"n_hosts": n_hosts})
                hosts_tracked = n_hosts > 0
            return time.time() - tj

        iters = 0
        while iters < max_gens and pages_done < cfg.max_pages:
            iters += 1  # deferred generations consume an iteration too
            t0 = time.time()
            batch_cap = None
            if controller is not None:
                batch_cap = controller.admit()
                if batch_cap == 0:
                    # critical memory pressure: defer the generation —
                    # queued rows simply stay queued (the requeue analog of
                    # async_dispatcher.py:288-315). The controller's
                    # pressure timer keeps running, so persistent pressure
                    # raises MemoryError like the reference's wait timeout.
                    time.sleep(check_interval)
                    continue
            left = frontier.filter(F.col("status") != "QUEUED") \
                           .select("url", "retry_count")
            queued = frontier.filter(F.col("status") == "QUEUED") \
                             .join(left, on=["url", "retry_count"], how="left_anti")
            batch, known_empty = self._schedule(
                queued, robots, cfg, pages_budget=cfg.max_pages - pages_done,
                gen=gen, batch_cap=batch_cap)
            if known_empty:
                break
            # the batch feeds fetch, 404-detection, robots-403 rows and the
            # frontier advance — cache AND materialize it up front (the
            # count) so the schedule windows + robots pUDF run exactly once.
            # r4 re-measured the tempting "fold this count into the results
            # job" variant with per-stage clocks: _fetch_and_process reads
            # the batch through THREE plan branches (allowed/blocked/
            # missing), so a lazily-cached batch recomputes concurrently
            # inside the results job — fetch stage 1.4 s → 4.1 s at the
            # 1.1k-row generation, net e2e LOSS despite one fewer job. The
            # eager count stays (same conclusion as NOTES r03, now with
            # stage-level evidence).
            batch = batch.cache()
            n_sched = batch.count()
            t_sched = time.time()
            if n_sched == 0:
                batch.unpersist()
                break

            results = self._fetch_and_process(batch, pages, cfg, gen)
            results = results.withColumn(
                "cached", F.lit(cfg.cache_mode in ("enabled", "write_only")))
            # the frontier delta derives from the result rows (outcome
            # statuses, discovered links, requeues). Persist AND materialize
            # (count) before the unified write: its union branches read
            # `results` up to 4× (result rows, outcomes, links, requeues),
            # and with a lazy cache those branches RACE to compute the
            # scrape pUDF concurrently — measured 4× generation wall at
            # drain-scale batches. The count is one cheap extra action that
            # pins the Arrow pass to exactly once.
            results = results.persist()
            n_results = results.count()
            t_fetch = time.time()
            if cfg.pipeline_commits:
                # ---- pipelined path: the previous generation's commit has
                # been absorbing this generation's schedule/fetch wall.
                # Barrier it now (manifests become deterministically ≤ gen-1)
                # before building this generation's delta or compacting.
                _join_pending()
                if cfg.compact_every and \
                        self.store.n_dirs("frontier") >= cfg.compact_every:
                    self._compact_frontier(gen=gen - 1, pages_done=pages_done)
                fr_committed = self._read_frontier()
                frontier_delta, seen_merged = self._advance_frontier(
                    fr_committed, batch, results, cfg, gen)
                # localCheckpoint cuts the delta's lineage to a LogicalRDD:
                # without it the next generation's frontier plan nests this
                # one's (which nests the previous one's, each through
                # multiple union branches) and the tree grows exponentially
                # with generations — OOM in plan construction by gen ~6.
                # The eager checkpoint is one small job over the persisted
                # results; the commit thread reuses the materialized rows.
                _cols = [f.name for f in FR.FRONTIER_SCHEMA.fields]
                frontier_delta = frontier_delta.select(_cols) \
                    .localCheckpoint(eager=True)
            else:
                frontier_delta, seen_merged = self._advance_frontier(
                    frontier, batch, results, cfg, gen)

            # ONE Spark action commits result rows AND the frontier-log
            # delta (NOTES r02 #3 / VERDICT r02 next-round #7): the tagged
            # union lands in a shared data dir; two filtered manifests
            # publish it as both tables. The rate-limit counter piggybacks
            # on the same write (zero extra job) — it decides whether
            # host_state needs folding.
            ev = results.withColumn("event_type", F.lit("result")).unionByName(
                frontier_delta.withColumn("event_type", F.lit("frontier")),
                allowMissingColumns=True)
            specs = [
                ("results", "append",
                 "event_type IS NULL OR event_type = 'result'",
                 {"generation": gen}),
                ("frontier", "append",
                 "event_type IS NULL OR event_type = 'frontier'",
                 {"generation": gen, "pages_done": pages_done + n_sched}),
            ]
            if seen_merged is not None:
                # the merged URL-seen filter rides the same write (r4: the
                # last separate per-generation commit folded in). Overwrite
                # semantics: its manifest references ONLY the shared dir, so
                # the filter is a plain equality (no legacy-NULL branch).
                ev = ev.unionByName(
                    seen_merged.withColumn("event_type", F.lit("seen")),
                    allowMissingColumns=True)
                specs.append(("url_seen", "overwrite",
                              "event_type = 'seen'", {"generation": gen}))
            obs = Observation(f"gen{gen}")
            ev = ev.observe(
                obs, F.sum(F.when((F.col("event_type") == "result")
                                  & F.col("status_code").isin(429, 503), 1)
                           .otherwise(0)).alias("n_limited"))

            if cfg.pipeline_commits:
                # launch this generation's commit in a worker thread; the
                # next generation schedules from committed-≤gen-1 ∪ the
                # in-memory delta (batch/results stay persisted until the
                # join so the thread's action never recomputes the pUDF).
                holder = {"thread": None, "obs": obs, "results": results,
                          "batch": batch, "gen": gen, "err": None}

                def _commit_bg(ev=ev, specs=specs, holder=holder):
                    try:
                        self.store.commit_unified(ev, specs)
                    except BaseException as e:   # surfaced at the join
                        holder["err"] = e

                th = _th.Thread(target=_commit_bg, daemon=True)
                holder["thread"] = th
                th.start()
                pending = holder
                cols = [f.name for f in FR.FRONTIER_SCHEMA.fields]
                frontier = fr_committed.select(cols).unionByName(
                    frontier_delta)   # delta already projected+checkpointed
                t_commit = time.time()
                t_compact = t_commit
                t_end = time.time()
                self.gen_profile.append({
                    "gen": gen, "n_sched": n_sched, "n_results": n_results,
                    "schedule_s": round(t_sched - t0, 3),
                    "fetch_extract_s": round(t_fetch - t_sched, 3),
                    "commit_s": round(t_commit - t_fetch, 3),  # launch only
                    "compact_s": 0.0, "host_state_s": 0.0,
                    "total_s": round(t_end - t0, 3),
                })
                gen_stats.append((gen, n_sched, float(time.time() - t0)))
                pages_done += n_sched
                gen += 1
                continue

            self.store.commit_unified(ev, specs)
            t_commit = time.time()
            n_limited = int(obs.get.get("n_limited") or 0)
            results.unpersist()
            frontier = self._read_frontier()
            if cfg.compact_every and \
                    self.store.n_dirs("frontier") >= cfg.compact_every:
                frontier = self._compact_frontier(
                    gen=gen, pages_done=pages_done + n_sched)
            t_compact = time.time()

            # host_state folds ONLY when there is backoff state to create or
            # decay — a clean generation (no 429/503, nothing tracked) skips
            # the job entirely
            if n_limited > 0 or hosts_tracked:
                prev_hs = self.store.read(spark, "host_state")
                gen_res = self.store.read_since(spark, "results",
                                                self._results_base) \
                              .filter(F.col("generation") == gen)
                hs = POL.update_host_state(
                    prev_hs, gen_res.select("host", "status_code"), gen
                )
                hobs = Observation(f"hs{gen}")
                hs = hs.observe(hobs, F.count(F.lit(1)).alias("n_hosts"))
                sid = self.store.commit("host_state", hs, meta={"generation": gen})
                n_hosts = int(hobs.get.get("n_hosts") or 0)
                # stamp the count into the manifest for resume
                self.store.amend_meta("host_state", sid, {"n_hosts": n_hosts})
                hosts_tracked = n_hosts > 0

            # driver-side stat only — metrics/lineage tables are committed
            # ONCE after the loop (folding ~2 Spark jobs out of every
            # generation's fixed cost, VERDICT r01 next-round #9)
            t_end = time.time()
            # per-stage breakdown (r4, VERDICT r03 #8: drain-tail
            # instrumentation) — pure driver-side clocks, zero Spark cost
            self.gen_profile.append({
                "gen": gen, "n_sched": n_sched, "n_results": n_results,
                "schedule_s": round(t_sched - t0, 3),
                "fetch_extract_s": round(t_fetch - t_sched, 3),
                "commit_s": round(t_commit - t_fetch, 3),
                "compact_s": round(t_compact - t_commit, 3),
                "host_state_s": round(t_end - t_compact, 3),
                "total_s": round(t_end - t0, 3),
            })
            gen_stats.append((gen, n_sched, float(time.time() - t0)))
            batch.unpersist()
            pages_done += n_sched
            gen += 1

        _join_pending()   # barrier the last in-flight commit (no-op unless
        #                   pipeline_commits; required before any final read)
        if gen_stats:
            self._commit_metrics_bulk(gen_stats)
        if cfg.sink == "warc":
            assert cfg.sink_dir, "sink='warc' requires sink_dir"
            self.export_warc(cfg.sink_dir, pages=pages,
                             n_buckets=cfg.sink_buckets, date=cfg.sink_date)
        elif cfg.sink == "wet":
            assert cfg.sink_dir, "sink='wet' requires sink_dir"
            self.export_wet(cfg.sink_dir, n_buckets=cfg.sink_buckets,
                            date=cfg.sink_date)
        elif cfg.sink == "sitemap":
            assert cfg.sink_dir, "sink='sitemap' requires sink_dir"
            self.export_sitemaps(cfg.sink_dir,
                                 lastmod=cfg.sink_date[:10])
        out = self.store.read(spark, "results")
        if out is None:
            return spark.createDataFrame([], FR.FRONTIER_SCHEMA)
        if cfg.fetch_ssl_certificate and certs is not None:
            out = self.attach_ssl(out, certs)
        return out

    # ----------------------------------------------------------- internals
    def _schedule(self, frontier: DataFrame, robots: DataFrame | None,
                  cfg: CrawlConfig, pages_budget: int,
                  gen: int = 0, batch_cap: int | None = None
                  ) -> tuple[DataFrame, bool | None]:
        """Build the scheduled batch. Returns (batch, known_empty):
        known_empty stays None for every policy now that the BFS/DFS depth
        gate is an in-plan broadcast aggregate — emptiness is answered by
        the caller's batch count (which it needs anyway)."""
        known_empty: bool | None = None
        cand = frontier.filter(F.col("status") == "QUEUED") \
                       .filter(F.col("retry_count") <= POL.MAX_RETRIES)
        if cfg.cache_mode in ("enabled", "read_only") and not cfg.revalidate:
            # revalidate mode: cached successes are NOT skipped — they are
            # re-checked against their stored validator in the fetch stage
            prior = self.store.read(self.spark, "results")
            if prior is not None:
                # cache read path: successfully-crawled urls never reschedule
                # (failed attempts are not cache hits — ref async_database.py
                # aget_cached_url returns only stored successes). Rows written
                # under write-suppressing modes carry cached=false and are
                # not hits either (ref CacheContext.should_write,
                # cache_context.py:23-92).
                hit = prior.filter(F.col("success"))
                if "cached" in prior.columns:
                    hit = hit.filter(F.coalesce(F.col("cached"), F.lit(True)))
                cand = cand.join(hit.select("url").distinct(),
                                 on="url", how="left_anti")
        if cfg.score_threshold is not None:
            cand = cand.filter(
                (F.col("depth") == 0) | (F.col("score") >= cfg.score_threshold)
            )
        if cfg.blocked_patterns is not None:
            # trap gate: drop candidates whose (host, digit-template)
            # is on the block-list — a broadcast left-anti join, the
            # domain_gate composition shape
            bp = cfg.blocked_patterns.select(
                "host", F.col("pattern").alias("__tpl"))
            cand = (
                cand.withColumn(
                    "__tpl", F.regexp_replace("url", "[0-9]+", "#"))
                .join(F.broadcast(bp), ["host", "__tpl"], "left_anti")
                .drop("__tpl"))
        if cfg.policy in ("bfs", "dfs"):
            # level-synchronous: only the shallowest (BFS) / deepest (DFS)
            # queued depth runs. The depth gate is a one-row broadcast-joined
            # aggregate INSIDE the batch plan, not a driver-side collect —
            # that probe used to cost a whole Spark action per generation,
            # the dominant fixed cost at small batch sizes (NOTES r02 #3);
            # emptiness now falls out of the batch count instead.
            agg_f = F.min("depth") if cfg.policy == "bfs" else F.max("depth")
            gate = cand.agg(agg_f.alias("__gate_depth"))
            cand = cand.join(F.broadcast(gate),
                             on=F.col("depth") == F.col("__gate_depth")) \
                       .drop("__gate_depth")
        # best_first: no depth gate — global (score, depth, url) order

        global_limit = min(
            pages_budget,
            cfg.batch_size if cfg.batch_size is not None else pages_budget,
            batch_cap if batch_cap is not None else pages_budget,
        )
        # an effectively-unbounded budget must NOT reach TakeOrdered:
        # orderBy().limit(k) preallocates a bounded priority queue of
        # capacity k per partition, so a "no limit please" sentinel like
        # max_pages=1<<30 OOMs the JVM before a single row flows (found by
        # the r3 sf1 drain soak). Above the threshold the per-generation cap
        # is dropped entirely — the run loop's pages_done check still bounds
        # the crawl, with overshoot of at most one generation's batch.
        if global_limit is not None and global_limit >= (1 << 20):
            global_limit = None
        # backoff-aware per-host quota (F12): hosts with recent 429/503 get
        # their budget halved per failure (floor 1) until the state decays
        hs = self.store.read(self.spark, "host_state")
        host_quota = None
        if hs is not None:
            host_quota = hs.filter(F.col("fail_count") > 0).select(
                "host",
                F.expr(f"greatest(1, shiftright({cfg.per_host_quota}, "
                       "cast(least(fail_count, 3) as int)))").alias("quota"),
            )
        if cfg.respect_crawl_delay and robots is not None:
            # Crawl-delay quota: parsed ONCE per run (the robots dim is
            # constant across generations) and collected — a bounded
            # #hosts-row dim-table read, then broadcast each generation
            cd = getattr(self, "_cd_quota", None)
            if cd is None:
                rows = (POL.crawl_delay_table(
                            robots, user_agent=cfg.user_agent,
                            window_s=cfg.crawl_delay_window_s,
                            default_quota=cfg.per_host_quota)
                        .filter(F.col("quota") < cfg.per_host_quota)
                        .select("host", "quota").collect())
                cd = (self.spark.createDataFrame(
                          rows, "host string, quota long")
                      if rows else False)
                self._cd_quota = cd
            if cd is not False:
                if host_quota is None:
                    host_quota = cd
                else:
                    # a host under BOTH backoff and Crawl-delay gets the
                    # stricter budget
                    host_quota = (host_quota.unionByName(cd)
                                  .groupBy("host")
                                  .agg(F.min("quota").alias("quota")))
        if cfg.pld_budget is not None:
            # registrable-domain budget split over THIS generation's
            # queued hosts (the farm membership is frontier state, so it
            # is recomputed per generation): one host aggregate + one pld
            # aggregate over the candidate host dim — tiny both ways
            from crawl4ai_spark.urls import base_domain
            bd = F.udf(base_domain, "string")
            hosts = (cand.select("host").distinct()
                     .withColumn("__pld",
                                 bd(F.concat(F.lit("https://"),
                                             F.col("host"), F.lit("/")))))
            npld = hosts.groupBy("__pld").agg(
                F.count("*").alias("__n"))
            pq = (hosts.join(F.broadcast(npld), "__pld")
                  .select("host", F.expr(
                      f"greatest(CAST(1 AS BIGINT),"
                      f" CAST({cfg.pld_budget} AS BIGINT) div __n)")
                      .alias("quota")))
            host_quota = pq if host_quota is None else (
                host_quota.unionByName(pq).groupBy("host")
                .agg(F.min("quota").alias("quota")))
        # F13 fairness/aging (async_dispatcher.py:217-226) as a column in
        # the scheduling rank — starved URLs jump the queue, retried URLs
        # are demoted — instead of the reference's drain-and-reheap of the
        # whole PriorityQueue each cycle (:470-520)
        priority = None
        if cfg.dispatcher == "memory_adaptive":
            priority = DSP.priority_score(
                (F.lit(gen) - F.col("generation")).cast("double"),
                F.col("retry_count"),
                fairness_timeout_gens=int(
                    cfg.dispatcher_opts.get("fairness_timeout_gens", 3)),
            )
        ov = getattr(self, "_score_overrides", None)
        if ov is not None and cfg.policy == "best_first":
            # adaptive re-rank hook: a bounded (url, score) table broadcast
            # over the queued set; unmatched rows keep their stored score
            cand = (cand.join(
                F.broadcast(ov.select("url",
                                      F.col("score").alias("__ov"))),
                "url", "left")
                .withColumn("score",
                            F.coalesce(F.col("__ov"), F.col("score")))
                .drop("__ov"))
        batch = POL.schedule_batch(
            cand, per_host_quota=cfg.per_host_quota,
            global_limit=global_limit, n_salts=cfg.n_salts,
            host_quota=host_quota, priority=priority,
        )
        if cfg.check_robots_txt and robots is not None:
            # the Arrow robotparser gate, deliberately: a compile-once
            # expression gate (POL.robots_allowed_col_fast) was built and
            # A/B-measured — pUDF won at the 2k e2e shape (~85 vs ~80
            # urls/s, 6/6 interleaved pairs) and tied at 1M rows, because
            # robotparser itself is ~1.5 µs/row while the native form pays
            # an extra broadcast join + a 30-replace quote() chain in front
            # of the same Arrow stage (BASELINE.md "robots gate A/B"). The
            # native gate stays available as a library operator with
            # equivalence tests (tests/test_robots_native.py).
            rb = robots
            if cfg.robots_ttl_s is not None and "fetch_time" in robots.columns:
                cutoff = time.time() - cfg.robots_ttl_s
                rb = robots.filter(F.col("fetch_time") >= F.lit(cutoff))
            if cfg.robots_dialect == "rfc9309":
                # modern REP gate: wildcard rules compiled ONCE per run
                # (bounded per-host dim), decision = native broadcast
                # join + max-struct precedence fold — no per-row python
                from crawl4ai_spark.ops.scheduling import rfc9309_decision
                rules = getattr(self, "_rfc_rules", None)
                if rules is None:
                    rows = POL.compile_rfc9309_rules(
                        rb, user_agent=cfg.user_agent).collect()
                    rules = self.spark.createDataFrame(
                        rows, "host string, pattern string, allow boolean"
                    ) if rows else self.spark.createDataFrame(
                        [], "host string, pattern string, allow boolean")
                    self._rfc_rules = rules
                batch = (rfc9309_decision(
                    batch.withColumn("path", F.expr(
                        "coalesce(nullif(regexp_replace(url,"
                        " '^[A-Za-z]+://[^/]*', ''), ''), '/')")), rules)
                    .withColumnRenamed("allow", "robots_allowed")
                    .drop("matched_pattern", "path"))
            else:
                batch = POL.robots_allowed_col(
                    batch, rb, user_agent=cfg.user_agent
                )
        else:
            batch = batch.withColumn("robots_allowed", F.lit(True))
        return batch, known_empty

    def _fetch_and_process(self, batch: DataFrame, pages: DataFrame,
                           cfg: CrawlConfig, gen: int) -> DataFrame:
        allowed = batch.filter(F.col("robots_allowed"))
        blocked = batch.filter(~F.col("robots_allowed"))
        limited = None
        if cfg.simulate_503_hosts:
            hit = (F.col("host").rlike(cfg.simulate_503_hosts)
                   & (F.col("retry_count") == 0))
            limited = allowed.filter(hit)
            allowed = allowed.filter(~hit)

        # redirect map (CrawlConfig.redirects): rewrite scheduled URLs to
        # their resolved landing URL before the fetch join. _fetch_url is
        # the page actually fetched; url stays the ORIGINAL for results.
        redirected = cfg.redirects is not None
        if redirected:
            rmap = cfg.redirects.select(
                F.col("src_url").alias("url"), F.col("dst_url"))
            allowed = (
                allowed.join(F.broadcast(rmap), "url", "left")
                .withColumn("_fetch_url", F.coalesce("dst_url", "url"))
                .drop("dst_url"))
        fetch_url = F.col("_fetch_url") if redirected else F.col("url")

        # the "fetch": equi-join the scheduled batch against the pages table.
        # batch is small (quota-bounded) → broadcast it to avoid shuffling
        # the page bodies (at 100 TB the html column must never shuffle).
        # When pages carries the host-bucket partition column (hb), the scan
        # is PARTITION-PRUNED to the buckets containing this generation's
        # hosts: the batch is already cached+materialized, so collecting its
        # ≤ n_buckets distinct bucket ids is a trivial cached scan, and the
        # resulting static `hb IN (...)` filter prunes deterministically
        # (no optimizer heuristics — the Iceberg bucket(host) analog; see
        # sources/pagesgen.write_pages_partitioned).
        page_probe = pages.select("url")
        if "hb" in pages.columns:
            from crawl4ai_spark.sources.pagesgen import host_bucket_col
            hb = host_bucket_col(F.coalesce(
                F.try_parse_url(fetch_url, F.lit("HOST")), F.lit("")))
            hbs = [r[0] for r in
                   allowed.select(hb.alias("hb")).distinct().collect()]
            pages = pages.filter(F.col("hb").isin(hbs))
            page_probe = pages.select("url")
        if redirected:
            # fetch each distinct landing page ONCE, fan back to originals
            # after processing (two originals may share a target)
            fetched = pages.join(
                F.broadcast(allowed.select(fetch_url.alias("url")).distinct()),
                on="url", how="inner")
        else:
            fetched = pages.join(
                F.broadcast(allowed.select("url", "host", "depth")),
                on="url", how="inner")
        # conditional-GET gate (CrawlConfig.revalidate): compare each
        # fetched body's JVM-native md5 against the stored validator set
        # {(url, content_md5) → processed columns}. Hits become 304 rows
        # reusing the cached content — those bodies NEVER enter the python
        # scrape stage below (the whole point at re-crawl scale); misses
        # (changed or never-validated) flow the normal path. Both the
        # validator set and the current batch are pruned to the scheduled
        # urls via the broadcast probe before anything joins.
        want_validator = cfg.store_validators or cfg.revalidate
        unchanged = None
        if cfg.revalidate:
            prior = self.store.read(self.spark, "results")
            if prior is not None and "content_md5" in prior.columns:
                from pyspark.sql import Window as _W
                content_cols = ["cleaned_html", "text", "markdown",
                                "extracted_content", "links", "media",
                                "tables", "metadata"]
                # content-derived flags ride the cache too (a 304 page's
                # meta robots are by definition unchanged)
                content_cols += [c for c in ("noindex", "nofollow")
                                 if c in prior.columns]
                probe = allowed.select(fetch_url.alias("url")).distinct()
                vc = (prior.filter(F.col("success")
                                   & F.col("content_md5").isNotNull())
                      .join(F.broadcast(probe), "url", "inner")
                      .select("url", "content_md5", "generation",
                              "status_code", *content_cols))
                # one cached copy per (url, validator): every row sharing
                # the key holds the same FETCHED bytes by construction, but
                # runs with different processing configs may have derived
                # different content columns — pick deterministically
                # (freshest generation, then 200s before 304s, then a
                # content hash as total order)
                wv = _W.partitionBy("url", "content_md5").orderBy(
                    F.desc("generation"), "status_code",
                    F.md5(F.to_json(F.struct(*content_cols))))
                vc = (vc.withColumn("_rn", F.row_number().over(wv))
                      .filter(F.col("_rn") == 1)
                      .drop("_rn", "generation", "status_code"))
                cur = fetched.withColumn("content_md5", F.md5("html"))
                unchanged = (
                    cur.select("url", "content_md5")
                    .join(vc, ["url", "content_md5"], "inner")
                    .withColumn("status_code", F.lit(304))
                    .withColumn("success", F.lit(True))
                    .withColumn("error_message",
                                F.lit(None).cast("string")))
                fetched = cur.join(vc.select("url", "content_md5"),
                                   ["url", "content_md5"], "left_anti") \
                             .drop("content_md5")
        processed = process_pages(
            fetched,
            extraction_schema=cfg.extraction_schema,
            content_filter=cfg.content_filter,
            bm25_query=cfg.bm25_query,
            word_count_threshold=cfg.word_count_threshold,
            excluded_tags=cfg.excluded_tags,
            cosine_config=cfg.cosine_extraction,
            llm_extraction=cfg.llm_extraction,
            with_validator=want_validator,
            with_meta_robots=cfg.respect_meta_robots,
        )
        if unchanged is not None:
            processed = processed.unionByName(
                unchanged, allowMissingColumns=True)
        # re-attach host/depth (processed keeps url) + 404s for scheduled
        # urls missing from pages
        if redirected:
            # processed is keyed by the LANDING url; fan back to originals,
            # report the original as `url` + the landing as `redirected_url`
            meta_cols = allowed.select(
                F.col("_fetch_url").alias("url"),
                F.col("url").alias("_orig_url"), "host", "depth")
            processed = (
                processed.join(meta_cols, on="url", how="inner")
                .withColumn(
                    "redirected_url",
                    F.when(F.col("url") != F.col("_orig_url"), F.col("url")))
                .drop("url")
                .withColumnRenamed("_orig_url", "url"))
            missing = (
                allowed.select(F.col("_fetch_url").alias("_fu"),
                               "url", "host", "depth")
                .join(page_probe.select(F.col("url").alias("_fu")),
                      on="_fu", how="left_anti")
                .drop("_fu")
                .withColumn("status_code", F.lit(404))
                .withColumn("success", F.lit(False))
                .withColumn("error_message", F.lit("not in pages table"))
            )
        else:
            meta_cols = allowed.select("url", "host", "depth")
            processed = processed.join(meta_cols, on="url", how="inner")

            missing = (
                allowed.select("url", "host", "depth")
                .join(page_probe, on="url", how="left_anti")
                .withColumn("status_code", F.lit(404))
                .withColumn("success", F.lit(False))
                .withColumn("error_message", F.lit("not in pages table"))
            )
        blocked403 = blocked.select("url", "host", "depth") \
            .withColumn("status_code", F.lit(403)) \
            .withColumn("success", F.lit(False)) \
            .withColumn("error_message", F.lit("Access denied by robots.txt"))
            # parity: ref async_webcrawler.py:318-331

        # per-partition lineage: record which executor partition produced
        # each row (CrawlerTaskResult analog, ref models.py:22-37) — the
        # lineage table aggregates these per (generation, partition)
        processed = processed.withColumn("part_id", F.spark_partition_id())
        base = processed.withColumn("generation", F.lit(gen))
        extras = missing.unionByName(blocked403)
        if limited is not None:
            l503 = limited.select("url", "host", "depth") \
                .withColumn("status_code", F.lit(503)) \
                .withColumn("success", F.lit(False)) \
                .withColumn("error_message", F.lit("rate limited (simulated 503)"))
            extras = extras.unionByName(l503)
        extras = extras.withColumn("generation", F.lit(gen))
        return base.unionByName(extras, allowMissingColumns=True)

    def _advance_frontier(self, frontier: DataFrame, batch: DataFrame,
                          results: DataFrame, cfg: CrawlConfig, gen: int
                          ) -> DataFrame:
        """Return this generation's frontier-log delta as ONE DataFrame
        (single append commit): departure events (every scheduled row with
        its final COMPLETED/FAILED status), freshly discovered QUEUED rows
        at depth+1, and 429/503 requeue rows at retry_count+1."""
        # 1. batch rows leave the queue with their outcome (full-schema
        # event rows — same (url, retry_count) key, non-QUEUED status)
        outcome = results.select(
            "url",
            F.when(F.col("success"), "COMPLETED").otherwise("FAILED").alias("__st"),
        )
        done_delta = (
            batch.select([f.name for f in FR.FRONTIER_SCHEMA.fields])
            .drop("status", "generation")
            .join(outcome, on="url", how="left")
            .withColumn("status", F.coalesce(F.col("__st"), F.lit("FAILED")))
            .drop("__st")
            .withColumn("generation", F.lit(gen))
            .select([f.name for f in FR.FRONTIER_SCHEMA.fields])
        )

        # 2. discover + enqueue new links from successful pages
        ok = results.filter(F.col("success"))
        if cfg.respect_meta_robots and "nofollow" in results.columns:
            # REP meta gate: a nofollow page contributes NO outlinks
            ok = ok.filter(~F.coalesce(F.col("nofollow"), F.lit(False)))
        links = FR.explode_links(ok, include_external=cfg.include_external)
        cand = FR.normalize_candidates(links)
        if cfg.dust_rules is not None:
            # learned host-local param strips (Bar-Yossef DUST): variants
            # collapse deterministically — best score survives, smallest
            # parent kept — BEFORE the seen-filter, so the frontier never
            # stores session-id aliases at all
            from crawl4ai_spark.ops.dustq import apply_dust_rules
            cand = (
                apply_dust_rules(cand, cfg.dust_rules)
                .withColumn("url", F.col("url_dust")).drop("url_dust")
                .groupBy("url", "host", "surt_host")
                .agg(F.max("score").alias("score"),
                     F.min("parent_url").alias("parent_url"))
                .select("url", "host", "surt_host", "parent_url", "score"))
        if cfg.link_preview_query:
            from crawl4ai_spark.operators.linkpreview import enrich_candidates, extract_heads
            cand = enrich_candidates(
                cand, extract_heads(self._pages), cfg.link_preview_query
            ).drop("contextual_score")
        if cfg.relevance_query or cfg.seo_threshold is not None:
            cand = self._head_filter_candidates(cand, cfg)
        if cfg.score_threshold is not None:
            cand = cand.filter(F.col("score") >= cfg.score_threshold)

        if cfg.use_bloom:
            # O(delta) invariant: the persisted seen-filter always covers
            # every url ever enqueued. Bootstrap it from the full frontier
            # ONCE (first filter-enabled generation / resume from an
            # exact-path run); afterwards only this generation's new rows
            # are hashed in (the r01 version re-hashed the whole frontier
            # every generation — VERDICT r01 "what's wrong" #5). Backend is
            # Bloom (OR-merge) or cuckoo (fingerprint re-insert, deletable).
            build_f, test_f = self._seen_backend(cfg)
            seen = self._read_seen(cfg)
            if seen is None:
                seen = build_f(frontier.select("url"))
                self.store.commit("url_seen", seen, meta={"generation": gen})
                seen = self._read_seen(cfg)
            fresh = test_f(cand, seen).dropDuplicates(["url"])
        else:
            fresh = FR.dedup_new_candidates(cand, frontier)

        # depth bookkeeping: children of this generation's pages
        parent_depth = results.select(F.col("url").alias("parent_url"),
                                      F.col("depth").alias("__pd"))
        fresh = (
            fresh.join(parent_depth, on="parent_url", how="left")
            .withColumn("__pd", F.coalesce(F.col("__pd"), F.lit(gen)))
        )
        new_rows = (
            fresh.filter(F.col("__pd") + 1 <= cfg.max_depth)
            .withColumn("depth", (F.col("__pd") + 1).cast("int"))
            .drop("__pd")
            .withColumn("status", F.lit("QUEUED"))
            .withColumn("retry_count", F.lit(0))
            .withColumn("generation", F.lit(gen + 1))
            .select([f.name for f in FR.FRONTIER_SCHEMA.fields])
        )

        # 3. requeue rate-limited rows (F16): a 429/503 attempt re-enters the
        # queue with retry_count+1 (dropped after MAX_RETRIES, ref
        # async_dispatcher.py:65-85) — another O(delta) append
        rate_limited = results.filter(F.col("status_code").isin(429, 503)) \
                              .select("url")
        requeue = (
            batch.join(rate_limited, on="url", how="inner")
            .filter(F.col("retry_count") < POL.MAX_RETRIES)
            .withColumn("retry_count", (F.col("retry_count") + 1).cast("int"))
            .withColumn("status", F.lit("QUEUED"))
            .withColumn("generation", F.lit(gen + 1))
            .select([f.name for f in FR.FRONTIER_SCHEMA.fields])
        )

        seen_merged = None
        if cfg.use_bloom:
            # fold ONLY the freshly-enqueued urls into the seen-filter
            # (requeued urls are already members); keeps the per-generation
            # filter cost proportional to the delta, not the frontier. The
            # merged filter is RETURNED, not committed — the run loop folds
            # it into the same unified commit as the results + frontier
            # delta (one write action per generation, not two).
            build_f, _ = self._seen_backend(cfg)
            merge_f = self._seen_merge(cfg)
            delta = build_f(new_rows.select("url"))
            seen_merged = merge_f(self._read_seen(cfg), delta)

        return (done_delta.unionByName(new_rows).unionByName(requeue),
                seen_merged)

    def _compact_frontier(self, *, gen: int, pages_done: int) -> DataFrame:
        """Semantic event-log compaction (the Iceberg rewrite-with-MERGE
        analog): fold to one row per (url, retry_count), preferring the
        departure (non-QUEUED) event, latest generation as tie-break. Every
        downstream read is invariant under the fold —
          · `queued` = QUEUED anti-join non-QUEUED on (url, retry_count)
          · exact URL-seen = anti-join on url (all urls retained)
          · `frontier()` merge-on-read view
        — while the log shrinks from ~2 rows per processed url (enqueue +
        departure) to 1, and the append-dir count resets to a single dir.
        History stays: old snapshots still reference the old dirs."""
        from pyspark.sql.window import Window
        fr = self._read_frontier()
        w = Window.partitionBy("url", "retry_count").orderBy(
            F.when(F.col("status") == "QUEUED", 1).otherwise(0).asc(),
            F.col("generation").desc(),
        )
        folded = (fr.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn"))
        self.store.commit(
            "frontier", folded, mode="overwrite",
            meta={"generation": gen, "pages_done": pages_done,
                  "compacted_at_gen": gen})
        return self._read_frontier()

    def _read_seen(self, cfg: CrawlConfig) -> DataFrame | None:
        """url_seen read pruned to the backend's own columns — when the
        filter rides the unified tagged-union write (r4), the raw read
        carries the union's other columns as nulls, which would break the
        backends' unionByName merges."""
        seen = self.store.read(self.spark, "url_seen")
        if seen is None:
            return None
        if cfg.seen_backend == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import CUCKOO_SCHEMA as S
        else:
            from crawl4ai_spark.operators.bloom import BLOOM_SCHEMA as S
        return seen.select(*[f.name for f in S.fields])

    def _seen_backend(self, cfg: CrawlConfig):
        """(build, filter_unseen) callables for the configured F5 fast path."""
        if cfg.seen_backend == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import (
                build_cuckoo,
                filter_unseen_cuckoo,
            )
            kw = dict(n_shards=cfg.bloom_shards,
                      capacity_per_shard=cfg.bloom_capacity_per_shard)
            return (lambda df: build_cuckoo(df, **kw),
                    lambda cand, seen: filter_unseen_cuckoo(cand, seen, **kw))
        kw = dict(n_shards=cfg.bloom_shards,
                  capacity_per_shard=cfg.bloom_capacity_per_shard,
                  fp_rate=cfg.bloom_fp_rate)
        return (lambda df: build_bloom(df, **kw),
                lambda cand, seen: filter_unseen(cand, seen, **kw))

    def _seen_merge(self, cfg: CrawlConfig):
        if cfg.seen_backend == "cuckoo":
            from crawl4ai_spark.operators.cuckoo import merge_cuckoos
            return lambda a, b: merge_cuckoos(
                a, b, capacity_per_shard=cfg.bloom_capacity_per_shard)
        return merge_blooms

    def _commit_metrics_bulk(self, gen_stats: list[tuple[int, int, float]]
                             ) -> None:
        """One metrics + one lineage commit for the WHOLE run: both tables
        are pure aggregations of the (already-committed) results table joined
        with the driver's tiny per-generation stats, so deferring them costs
        nothing and removes two Spark jobs from every generation."""
        gens = [g for g, _, _ in gen_stats]
        results = self.store.read(self.spark, "results")
        if results is None:
            return
        run_results = results.filter(F.col("generation").isin(gens))
        stats = self.spark.createDataFrame(
            [(g, n, w) for g, n, w in gen_stats],
            "generation int, n_scheduled int, wall_secs double",
        )
        m = (
            run_results.groupBy("generation", "host").agg(
                F.count("*").alias("n_urls"),
                F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("n_ok"),
                F.sum(F.when(~F.col("success"), 1).otherwise(0)).alias("n_failed"),
            )
            .join(F.broadcast(stats), on="generation")
            .select("host", "n_urls", "n_ok", "n_failed", "generation",
                    "n_scheduled", "wall_secs")
        )
        self.store.commit("metrics", m, mode="append",
                          meta={"generation": gens[-1]})

        if "part_id" in run_results.columns:
            lin = run_results.groupBy("generation", "part_id").agg(
                F.count("*").alias("n_rows"),
                F.sum(F.when(F.col("success"), 1).otherwise(0)).alias("n_ok"),
                F.countDistinct("host").alias("n_hosts"),
            ).select("part_id", "n_rows", "n_ok", "n_hosts", "generation")
            self.store.commit("lineage", lin, mode="append",
                              meta={"generation": gens[-1]})

    def _head_filter_candidates(self, cand: DataFrame,
                                cfg: CrawlConfig) -> DataFrame:
        """Head-content gate on discovered candidates (F10 tail): join the
        pages head fields (no live fetch — the corpus IS the head peek) and
        keep only candidates passing ContentRelevance / SEO thresholds.
        Unknown urls (no head) are rejected, matching the reference's
        missing-head-content → False behavior (filters.py:533-537,622-626)."""
        import re as _re

        from crawl4ai_spark.operators.linkpreview import extract_heads
        from crawl4ai_spark.operators.urlfilters import (
            head_relevance_score,
            seo_score,
        )

        heads = extract_heads(self._pages)
        joined = cand.join(heads, on="url", how="left")
        keep = F.col("head_title").isNotNull()
        if cfg.relevance_query:
            terms = _re.findall("[a-z0-9]+", cfg.relevance_query.lower())
            doc = F.concat_ws(
                " ", "head_title", "head_title", "head_title",
                "head_description", "head_description", "head_keywords")
            keep = keep & (head_relevance_score(doc, terms)
                           >= cfg.relevance_threshold)
        if cfg.seo_threshold is not None:
            s = seo_score(F.col("url"), F.col("head_title"),
                          F.col("head_description"), F.col("head_canonical"),
                          F.col("head_robots"), F.col("head_has_ldjson"),
                          keywords=cfg.seo_keywords)
            keep = keep & (s >= cfg.seo_threshold)
        return joined.filter(keep).select(cand.columns)

    def run_many(self, pages: DataFrame, urls: list[str] | DataFrame, *,
                 robots: DataFrame | None = None,
                 certs: DataFrame | None = None,
                 config: CrawlConfig | None = None) -> DataFrame:
        """``arun_many`` analog (ref async_webcrawler.py:665): crawl+process
        an explicit url list as ONE batch — no link discovery, no frontier
        iteration (max_depth=0 over a seeds frame built from the list)."""
        spark = self.spark
        if isinstance(urls, list):
            seeds = spark.createDataFrame([(u, 1.0) for u in urls],
                                          "url string, priority double")
        else:
            seeds = urls
        cfg = config or CrawlConfig()
        from dataclasses import replace
        cfg = replace(cfg, max_depth=0, max_pages=max(cfg.max_pages, 1 << 20))
        return self.run(pages, seeds, robots=robots, certs=certs, config=cfg)

    def run_one(self, pages: DataFrame, url: str, *,
                robots: DataFrame | None = None,
                certs: DataFrame | None = None,
                config: CrawlConfig | None = None) -> DataFrame:
        """``arun`` analog (ref async_webcrawler.py:204): one url through
        the full pipeline; returns its (single-row) results DataFrame."""
        out = self.run_many(pages, [url], robots=robots, certs=certs,
                            config=config)
        return out.filter(F.col("url") == url)

    def enqueue_seeds(self, seeds: DataFrame) -> None:
        """Append newly-arriving seeds to the frontier log (anti-joined
        against every url ever enqueued) WITHOUT starting a run.

        The streaming path calls this before ``run(resume=True)`` so seeds
        from micro-batch N>0 are not silently dropped — resume reads the
        frontier from the snapshot store and never looks at the ``seeds``
        argument (ADVICE r01 #1)."""
        fr = self._read_frontier()
        rows = FR.seeds_to_frontier(seeds)
        if fr is not None:
            rows = rows.join(fr.select("url").distinct(),
                             on="url", how="left_anti")
            meta = self.store.meta("frontier")
        else:
            meta = {"generation": -1, "pages_done": 0}
        self.store.commit("frontier", rows,
                          mode="append" if fr is not None else "overwrite",
                          meta=meta)

    # convenience accessors ------------------------------------------------
    @staticmethod
    def attach_ssl(results: DataFrame, certs: DataFrame) -> DataFrame:
        """Enrich results with the per-host certificate as ONE nested
        ``ssl`` struct (the reference's CrawlResult.ssl_certificate dict,
        ssl_certificate.py:91-134: subject/issuer components, version,
        serial, validity window, fingerprint, signature algorithm, SAN,
        base64 raw). Certs is a per-host dim table → broadcast hash join;
        hosts without a row (failed handshake) get ssl = NULL, matching
        ``from_url`` returning None."""
        ssl_struct = F.struct(
            F.struct(F.col("subject_cn").alias("CN"),
                     F.col("subject_o").alias("O")).alias("subject"),
            F.struct(F.col("issuer_cn").alias("CN"),
                     F.col("issuer_o").alias("O")).alias("issuer"),
            F.col("version"),
            F.col("serial_number"),
            F.col("not_before"),
            F.col("not_after"),
            F.col("fingerprint"),
            F.col("signature_algorithm"),
            F.col("san"),
            F.col("raw_cert"),
        ).alias("ssl")
        cert_rows = certs.select("host", ssl_struct)
        return results.join(F.broadcast(cert_rows), "host", "left")

    def export_warc(self, out_dir: str, *, pages: DataFrame | None = None,
                    n_buckets: int = 8,
                    date: str = "2026-01-01T00:00:00Z",
                    results: DataFrame | None = None,
                    cdx: bool = False,
                    gzip_segments: bool = False) -> DataFrame:
        """S12 write side: archive the crawl's visited set as WARC/1.0
        segments (html/warc.py writer), one segment per host bucket.

        Record set = result urls whose body exists in the fetched corpus
        (inner join) — exactly the archive a re-crawl needs to reproduce
        this run: urls the crawl 404'd stay absent (a reader re-404s them),
        robots-blocked urls keep their body (a reader with the same robots
        table re-blocks them), and link discovery replays byte-identically
        because the payloads do. ``pages_from_warc`` (sources/rawpages.py)
        is the matching read side; tests prove crawl → segments → re-crawl
        yields the identical result set.

        Scale shape: bodies stay distributed end-to-end — one shuffle on
        the host-bucket key, then each ``applyInPandas`` group streams its
        sorted records through ``build_warc`` and writes ONE segment file
        from the executor (local-FS semantics here; point ``out_dir`` at a
        shared filesystem on a cluster). The returned manifest (bucket,
        path, n_records, n_bytes, sha) is the only thing that crosses the
        wire.

        Pass ``results`` to archive a specific result set (e.g. ONE
        re-crawl's rows — the store accumulates every run, so a url can
        carry several statuses across runs). Rows with ``status_code ==
        304`` (the revalidation path's not-modified verdict) become ISO
        28500 *revisit* records: the unchanged payload is never
        re-written — only a WARC-Refers-To pointer at the base segment's
        deterministic response id plus the payload digest, which is how
        Common Crawl dedups unchanged content across monthly snapshots.

        ``cdx=True`` additionally publishes a ``.cdx.jsonl`` index sidecar
        per segment (urlkey/timestamp/digest + MEASURED byte offset and
        record length from the framing walk) — the file the CC-index
        seeder's ``parse_cc_index_blobs`` consumes, closing the publish →
        re-seed loop against our own read path (tested).

        ``gzip_segments=True`` publishes ``.warc.gz`` segments in the
        member-per-record layout Common Crawl actually ships — the CDX
        sidecar then carries COMPRESSED member offsets/lengths, so a
        reader range-fetches one gz member per record (tested); the
        ``pages_from_warc`` reader gunzips transparently."""
        import hashlib as _hl
        import os as _os

        import pandas as _pd

        from crawl4ai_spark.html.warc import build_warc

        results = results if results is not None else self.results()
        assert results is not None, "no results to export"
        pages = pages if pages is not None else self._pages
        rows = (
            results.select("url", "status_code", "host")
            .dropDuplicates(["url"])
            .join(pages.select("url", "html"), "url", "inner")
            .withColumn("bucket",
                        F.pmod(F.xxhash64("host"), F.lit(n_buckets))
                        .cast("int"))
        )
        _os.makedirs(out_dir, exist_ok=True)
        man_schema = ("bucket int, path string, n_records long, "
                      "n_bytes long, sha256 string")

        def write_segment(pdf: _pd.DataFrame) -> _pd.DataFrame:
            pdf = pdf.sort_values("url", kind="mergesort")
            recs = []
            for u, s, h in zip(pdf["url"], pdf["status_code"],
                               pdf["html"]):
                body = h.encode("utf-8") if isinstance(h, str) else bytes(h)
                if int(s) == 304:
                    recs.append({
                        "uri": u, "revisit": True,
                        "payload_digest": _hl.md5(body).hexdigest()})
                else:
                    recs.append({"uri": u, "body": body, "status": int(s),
                                 "content_type": "text/html"})
            bucket = int(pdf["bucket"].iloc[0])
            blob = build_warc(recs, date=date, gzip_members=gzip_segments)
            ext = "warc.gz" if gzip_segments else "warc"
            path = _os.path.join(out_dir, f"segment-{bucket:04d}.{ext}")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            _os.replace(tmp, path)   # atomic publish, crash-safe
            if cdx:
                from crawl4ai_spark.html.warc import build_cdx, cdx_jsonl
                idx = cdx_jsonl(build_cdx(blob, _os.path.basename(path)))
                ipath = path + ".cdx.jsonl"
                with open(ipath + ".tmp", "w", encoding="utf-8") as fh:
                    fh.write(idx)
                _os.replace(ipath + ".tmp", ipath)
            return _pd.DataFrame([{
                "bucket": bucket, "path": path, "n_records": len(recs),
                "n_bytes": len(blob),
                "sha256": _hl.sha256(blob).hexdigest(),
            }])

        manifest = rows.groupBy("bucket").applyInPandas(
            write_segment, man_schema)
        # materialize: applyInPandas is lazy — the write IS the effect
        manifest = manifest.cache()
        manifest.count()
        return manifest

    def export_wet(self, out_dir: str, *, n_buckets: int = 8,
                   date: str = "2026-01-01T00:00:00Z") -> DataFrame:
        """WET sibling of :meth:`export_warc`: archive the crawl's
        EXTRACTED TEXT as conversion-record segments — the format most
        corpus pipelines consume from Common Crawl. No pages join needed
        (text lives in results); same one-shuffle host-bucket shape,
        ``texts_from_wet`` (sources/rawpages.py) is the matching reader
        and the roundtrip is byte-identical per url (tested)."""
        import hashlib as _hl
        import os as _os

        import pandas as _pd

        from crawl4ai_spark.html.warc import build_wet

        results = self.results()
        assert results is not None, "no results to export"
        rows = results.filter(F.col("success") & F.col("text").isNotNull())
        if "noindex" in rows.columns:
            # REP meta gate (CrawlConfig.respect_meta_robots): noindex
            # pages stay in results and WARC (archive-complete) but are
            # excluded from the text-corpus export (index-clean)
            rows = rows.filter(~F.coalesce(F.col("noindex"), F.lit(False)))
        rows = (
            rows.select("url", "text", "host")
            .dropDuplicates(["url"])
            .withColumn("bucket",
                        F.pmod(F.xxhash64("host"), F.lit(n_buckets))
                        .cast("int"))
        )
        _os.makedirs(out_dir, exist_ok=True)
        man_schema = ("bucket int, path string, n_records long, "
                      "n_bytes long, sha256 string")

        def write_segment(pdf: _pd.DataFrame) -> _pd.DataFrame:
            pdf = pdf.sort_values("url", kind="mergesort")
            recs = [{"uri": u, "text": t}
                    for u, t in zip(pdf["url"], pdf["text"])]
            bucket = int(pdf["bucket"].iloc[0])
            blob = build_wet(recs, date=date)
            path = _os.path.join(out_dir, f"segment-{bucket:04d}.warc.wet")
            tmp = path + ".tmp"
            with open(tmp, "wb") as fh:
                fh.write(blob)
            _os.replace(tmp, path)   # atomic publish, crash-safe
            return _pd.DataFrame([{
                "bucket": bucket, "path": path, "n_records": len(recs),
                "n_bytes": len(blob),
                "sha256": _hl.sha256(blob).hexdigest(),
            }])

        manifest = rows.groupBy("bucket").applyInPandas(
            write_segment, man_schema)
        manifest = manifest.cache()
        manifest.count()
        return manifest

    def export_sitemaps(self, out_dir: str, *,
                        shard_size: int = 50_000,
                        lastmod: str = "2026-01-01") -> DataFrame:
        """Publish the crawl's successfully-fetched URL set as canonical
        per-host sitemaps (html/sitemap.py) — the re-seed artifact the
        reference's AsyncUrlSeeder consumes but never produces. Hosts over
        ``shard_size`` URLs (protocol cap 50k) get sharded urlsets linked
        from a ``sitemap.xml`` index; smaller hosts get the urlset at
        ``sitemap.xml`` directly, so the seeder's /sitemap.xml convention
        probe (sources/seeder.py seed_from_sitemaps) finds either form.

        Scale shape: one shuffle on host (the natural sitemap partition
        key — each host's file set is independent), each ``applyInPandas``
        group writes its own files executor-side; only the per-file
        manifest (host, url, path, kind, n_urls, n_bytes, sha256) crosses
        the wire. Roundtrip tested: crawl → export → seed_from_sitemaps
        over the emitted blobs == the crawl's successful URL set."""
        import hashlib as _hl
        import os as _os

        import pandas as _pd

        from crawl4ai_spark.html.sitemap import build_sitemap_index, build_urlset

        results = self.results()
        assert results is not None, "no results to export"
        rows = (
            results.filter(F.col("success"))
            .select("url", "host").dropDuplicates(["url"])
        )
        _os.makedirs(out_dir, exist_ok=True)
        man_schema = ("host string, url string, path string, kind string, "
                      "n_urls long, n_bytes long, sha256 string")

        def write_host(pdf: _pd.DataFrame) -> _pd.DataFrame:
            host = pdf["host"].iloc[0]
            locs = sorted(pdf["url"])
            hdir = _os.path.join(out_dir, host)
            _os.makedirs(hdir, exist_ok=True)

            def publish(fname: str, blob: bytes, kind: str, n: int) -> dict:
                path = _os.path.join(hdir, fname)
                tmp = path + ".tmp"
                with open(tmp, "wb") as fh:
                    fh.write(blob)
                _os.replace(tmp, path)   # atomic publish, crash-safe
                return {"host": host, "url": f"https://{host}/{fname}",
                        "path": path, "kind": kind, "n_urls": n,
                        "n_bytes": len(blob),
                        "sha256": _hl.sha256(blob).hexdigest()}

            out = []
            if len(locs) <= shard_size:
                out.append(publish(
                    "sitemap.xml", build_urlset(locs, lastmod=lastmod),
                    "urlset", len(locs)))
            else:
                shard_urls = []
                for k in range(0, len(locs), shard_size):
                    chunk = locs[k:k + shard_size]
                    fname = f"sitemap-{k // shard_size:04d}.xml"
                    out.append(publish(
                        fname, build_urlset(chunk, lastmod=lastmod),
                        "urlset", len(chunk)))
                    shard_urls.append(f"https://{host}/{fname}")
                out.append(publish(
                    "sitemap.xml", build_sitemap_index(shard_urls),
                    "sitemapindex", len(shard_urls)))
            return _pd.DataFrame(out)

        manifest = rows.groupBy("host").applyInPandas(write_host, man_schema)
        manifest = manifest.cache()
        manifest.count()   # applyInPandas is lazy — the write IS the effect
        return manifest

    def results(self) -> DataFrame | None:
        return self.store.read(self.spark, "results")

    def frontier(self) -> DataFrame | None:
        """Reconstructed current frontier view: every enqueued row with its
        latest status (merge-on-read over the single append-only event log:
        a departure event with the same (url, retry_count) key overrides
        the QUEUED enqueue event). Expressed as the same fold
        ``_compact_frontier`` applies, so the view is invariant to whether
        (and when) the log was compacted — a departure row carries the
        enqueue row's url/depth/parent/score columns by construction."""
        from pyspark.sql.window import Window
        fr = self._read_frontier()
        if fr is None:
            return None
        w = Window.partitionBy("url", "retry_count").orderBy(
            F.when(F.col("status") == "QUEUED", 1).otherwise(0).asc(),
            F.col("generation").desc(),
        )
        return (fr.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1).drop("__rn"))

    def report(self) -> DataFrame | None:
        """Per-host operational crawl card — the run's observability
        rollup over the stored results + current frontier view: crawl
        counts by outcome class (ok / robots-403 / other-http-error),
        depth and generation reach, retry volume, link yield, and what's
        still queued. One host-keyed aggregate per table + one host
        equi-join — O(#hosts) output, scan-bounded at 10^10 rows (the
        corpus datacard's discipline applied to the crawl itself)."""
        results = self.results()
        if results is None:
            return None
        res = results.groupBy("host").agg(
            F.count("*").cast("long").alias("n_crawled"),
            F.sum(F.col("success").cast("long")).cast("long").alias("n_ok"),
            F.sum((F.col("status_code") == 403).cast("long")).cast("long")
            .alias("n_robots_blocked"),
            F.sum(((~F.col("success")) & (F.col("status_code") != 403))
                  .cast("long")).cast("long").alias("n_http_error"),
            F.max("depth").cast("long").alias("max_depth"),
            F.max("generation").cast("long").alias("n_generations"),
            F.sum("retry_count").cast("long").alias("n_retries"),
            F.sum(F.when(F.col("success"),
                         F.size("links.internal")).otherwise(0))
            .cast("long").alias("n_internal_links"),
        )
        fr = self.frontier()
        queued = (
            fr.filter(F.col("status") == "QUEUED")
            .groupBy("host").agg(F.count("*").cast("long")
                                 .alias("n_queued"))
            if fr is not None else None)
        out = res
        if queued is not None:
            out = res.join(queued, "host", "left")
        return out.withColumn(
            "n_queued", F.coalesce(F.col("n_queued"), F.lit(0)))

    def metrics(self) -> DataFrame | None:
        return self.store.read(self.spark, "metrics")

    def lineage(self) -> DataFrame | None:
        return self.store.read(self.spark, "lineage")
