"""Crawl-semantics operators expressed over the driver testdata, each with a
DuckDB oracle: URL canonicalization (ref normalize_url, utils.py:2229-2386),
frontier scheduling windows (bff_strategy.py:130-215), per-host politeness
quota + backoff (async_dispatcher.py:28-85), robots prefix gate
(utils.py:313-365), URL scorers (deep_crawling/scorers.py), URL filter chain
(deep_crawling/filters.py), URL-seen anti-join (bfs_strategy.py:111-127) and
level-synchronous BFS reachability (bfs_strategy.py:148-198 — oracle'd by a
recursive CTE).

URLs are synthesized deterministically from the ``events`` table (same
expression in both engines): messy scheme/host case, tracking params,
unsorted query keys, trailing slashes and fragments — exactly the mess
normalize_url exists to collapse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import e6, tbl

TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|ref|ref_src)="


# ---------------------------------------------------------------- url synth
def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    hid = F.col("user_id") % 20
    m6 = F.col("event_id") % 6
    url = F.concat(
        F.when(F.col("event_id") % 5 == 0,
               F.concat(F.lit("HTTPS://WWW.Host"), hid, F.lit(".COM")))
        .otherwise(F.concat(F.lit("https://www.host"), hid, F.lit(".com"))),
        F.lit("/"), F.lit(2018) + F.col("event_id") % 8,
        F.lit("/"), F.col("event_type"),
        F.lit("/p"), F.col("event_id") % 97,
        F.when(m6 == 0, ".html").when(m6 == 1, ".pdf").when(m6 == 2, ".jpg")
        .when(m6 == 3, "").when(m6 == 4, "/index.php").otherwise(".xml"),
        F.when(F.col("event_id") % 7 == 0, "/").otherwise(""),
        F.when(F.col("event_id") % 3 == 0, "?utm_source=feed&b=2&a=1")
        .when(F.col("event_id") % 3 == 1, "?z=9&a=1&utm_campaign=x&gclid=abc")
        .otherwise(""),
        F.when(F.col("event_id") % 4 == 0, "#frag").otherwise(""),
    )
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.concat(F.lit("www.host"), hid, F.lit(".com")).alias("host"),
        url.alias("url"),
    )


_SQL_URLS = """
  SELECT event_id, user_id, event_type, value,
         'www.host' || (user_id % 20) || '.com' AS host,
         (CASE WHEN event_id % 5 = 0
               THEN 'HTTPS://WWW.Host' || (user_id % 20) || '.COM'
               ELSE 'https://www.host' || (user_id % 20) || '.com' END)
         || '/' || (2018 + event_id % 8) || '/' || event_type || '/p' || (event_id % 97)
         || (CASE event_id % 6 WHEN 0 THEN '.html' WHEN 1 THEN '.pdf' WHEN 2 THEN '.jpg'
                               WHEN 3 THEN '' WHEN 4 THEN '/index.php' ELSE '.xml' END)
         || (CASE WHEN event_id % 7 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN event_id % 3 = 0 THEN '?utm_source=feed&b=2&a=1'
                  WHEN event_id % 3 = 1 THEN '?z=9&a=1&utm_campaign=x&gclid=abc'
                  ELSE '' END)
         || (CASE WHEN event_id % 4 = 0 THEN '#frag' ELSE '' END) AS url
  FROM events
"""


# ----------------------------------------------------------- normalization
def _normalize(df: DataFrame) -> DataFrame:
    """RFC-3986-style canonicalization, all native expressions (parity target:
    ref normalize_url_for_deep_crawl utils.py:2330-2386 — lowercase
    scheme+host, strip fragment, drop tracking params, sort query keys,
    strip trailing slash)."""
    return (
        df.withColumn("__nofrag", F.expr("regexp_replace(url, '#.*$', '')"))
        .withColumn("__q", F.expr(
            "CASE WHEN instr(__nofrag, '?') > 0"
            " THEN substring(__nofrag, instr(__nofrag, '?') + 1)"
            " ELSE '' END"))
        .withColumn("__base", F.expr(
            "CASE WHEN instr(__nofrag, '?') > 0"
            " THEN substring(__nofrag, 1, instr(__nofrag, '?') - 1)"
            " ELSE __nofrag END"))
        .withColumn("__sh", F.expr("regexp_extract(__base, '^([A-Za-z]+://[^/]+)', 1)"))
        .withColumn("__path", F.expr("substring(__base, length(__sh) + 1)"))
        .withColumn("__path2", F.expr(
            "CASE WHEN __path = '' THEN '/'"
            " WHEN __path <> '/' AND __path LIKE '%/'"
            " THEN substring(__path, 1, length(__path) - 1)"
            " ELSE __path END"))
        .withColumn("__params", F.expr(
            f"array_sort(filter(split(__q, '&'),"
            f" x -> x <> '' AND NOT x rlike '{TRACKING_RE}'))"))
        .withColumn("url_norm", F.expr(
            "concat(lower(__sh), __path2,"
            " CASE WHEN size(__params) > 0"
            " THEN concat('?', array_join(__params, '&')) ELSE '' END)"))
        .withColumn("path", F.col("__path2"))
        .drop("__nofrag", "__q", "__base", "__sh", "__path", "__path2", "__params")
    )


_SQL_NORM = f"""
  SELECT u.*, lower(sh) || path2 ||
         (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END) AS url_norm,
         path2 AS path
  FROM (
    SELECT *,
      CASE WHEN pth = '' THEN '/'
           WHEN pth <> '/' AND pth LIKE '%/' THEN substr(pth, 1, length(pth) - 1)
           ELSE pth END AS path2,
      list_sort(list_filter(string_split(q, '&'),
        x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}'))) AS params
    FROM (
      SELECT *,
        regexp_extract(base, '^([A-Za-z]+://[^/]+)', 1) AS sh,
        substr(base, length(regexp_extract(base, '^([A-Za-z]+://[^/]+)', 1)) + 1) AS pth
      FROM (
        SELECT *,
          CASE WHEN instr(nofrag, '?') > 0 THEN substr(nofrag, 1, instr(nofrag, '?') - 1) ELSE nofrag END AS base,
          CASE WHEN instr(nofrag, '?') > 0 THEN substr(nofrag, instr(nofrag, '?') + 1) ELSE '' END AS q
        FROM (SELECT *, regexp_replace(url, '#.*$', '') AS nofrag FROM ({_SQL_URLS}) ) t0
      ) t1
    ) t2
  ) u
"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _normalize(_urls(spark, sf_dir)).select("event_id", "url", "url_norm")


SQL_URL_NORMALIZE = f"SELECT event_id, url, url_norm FROM ({_SQL_NORM})"


def q_url_canonical_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization collapse rate: distinct raw urls per canonical url."""
    n = _normalize(_urls(spark, sf_dir))
    return n.groupBy("url_norm").agg(
        F.count("*").cast("long").alias("n_raw"),
        F.countDistinct("url").cast("long").alias("n_distinct_raw"),
    )


SQL_URL_CANONICAL_GROUPS = f"""
SELECT url_norm, CAST(count(*) AS BIGINT) AS n_raw,
       CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw
FROM ({_SQL_NORM}) GROUP BY url_norm
"""


# ------------------------------------------------------- frontier candidates
def _frontier(df_norm: DataFrame) -> DataFrame:
    """Distinct canonical candidates with deterministic score/depth."""
    return df_norm.groupBy("host", "url_norm").agg(
        F.sum(e6(F.col("value"))).cast("long").alias("score_e6"),
        F.min("event_id").cast("long").alias("first_event"),
        (F.min("event_id") % 4).cast("int").alias("depth"),
    )


_SQL_FRONTIER = f"""
  SELECT host, url_norm,
         CAST(sum(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS score_e6,
         CAST(min(event_id) AS BIGINT) AS first_event,
         CAST(min(event_id) % 4 AS INT) AS depth
  FROM ({_SQL_NORM}) GROUP BY host, url_norm
"""


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scheduling generation: per-host politeness quota (3/host) via a
    rank window, then global budget 100 by priority — the window-ranked
    snapshot that realizes the reference's PriorityQueue (F8+F12)."""
    fr = _frontier(_normalize(_urls(spark, sf_dir)))
    wh = Window.partitionBy("host").orderBy(F.desc("score_e6"), F.asc("url_norm"))
    picked = fr.withColumn("host_rank", F.row_number().over(wh).cast("long")) \
               .filter(F.col("host_rank") <= 3)
    # global budget: distributed TakeOrdered (orderBy+limit), THEN rank the
    # tiny survivor set — never a single-partition window over the frontier
    top = picked.orderBy(F.desc("score_e6"), F.asc("url_norm")).limit(100)
    wg = Window.orderBy(F.desc("score_e6"), F.asc("url_norm"))
    return (
        top.withColumn("global_rank", F.row_number().over(wg).cast("long"))
        .select("host", "url_norm", "score_e6", "host_rank", "global_rank")
    )


SQL_FRONTIER_SCHEDULE = f"""
WITH fr AS ({_SQL_FRONTIER}),
picked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY host ORDER BY score_e6 DESC, url_norm ASC) AS BIGINT) AS host_rank
  FROM fr
)
SELECT host, url_norm, score_e6, host_rank, global_rank
FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score_e6 DESC, url_norm ASC) AS BIGINT) AS global_rank
  FROM picked WHERE host_rank <= 3
) WHERE global_rank <= 100
"""


def q_politeness_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host rate-limiter state: exponential backoff on failures, capped
    at 60 s (ref RateLimiter async_dispatcher.py:28-85, deterministic —
    jitter elided)."""
    u = _urls(spark, sf_dir)
    agg = u.groupBy("host").agg(
        F.count("*").cast("long").alias("n_requests"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long").alias("n_fails"),
    )
    delay = F.least(F.lit(1.5) * F.pow(F.lit(2.0), F.least(F.col("n_fails"), F.lit(6)).cast("double")), F.lit(60.0))
    return agg.select(
        "host", "n_requests", "n_fails",
        e6(delay).alias("delay_e6"),
        F.least(F.lit(10), F.greatest(F.lit(1), F.lit(10) - F.expr("n_fails div 4")))
        .cast("long").alias("quota"),
    )


SQL_POLITENESS_BACKOFF = f"""
WITH agg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_requests,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_fails
  FROM ({_SQL_URLS}) GROUP BY host
)
SELECT host, n_requests, n_fails,
       CAST(ROUND(least(1.5 * pow(2.0, CAST(least(n_fails, 6) AS DOUBLE)), 60.0) * 1e6) AS BIGINT) AS delay_e6,
       CAST(least(10, greatest(1, 10 - n_fails // 4)) AS BIGINT) AS quota
FROM agg
"""


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-rule robots gate: blocked rows get 403 exactly like the
    reference (async_webcrawler.py:318-331). Rules derive from the host id;
    the frontier joins rules broadcast on host."""
    fr = _frontier(_normalize(_urls(spark, sf_dir))).withColumn(
        "path", F.expr("substring(url_norm, length(regexp_extract(url_norm, '^([a-z]+://[^/]+)', 1)) + 1)")
    )
    hid = F.regexp_extract("host", r"www\.host(\d+)\.com", 1).cast("int")
    rules = fr.select("host").distinct().withColumn(
        "disallow",
        F.when(hid % 3 == 0, "/2018").when(hid % 3 == 1, "/2019").otherwise(""),
    )
    out = fr.join(F.broadcast(rules), "host").withColumn(
        "allowed",
        (F.col("disallow") == "") | ~F.col("path").startswith(F.col("disallow")),
    )
    return out.select(
        "host", "url_norm", "allowed",
        F.when(F.col("allowed"), 200).otherwise(403).cast("int").alias("status_code"),
    )


SQL_ROBOTS_GATE = f"""
WITH fr AS ({_SQL_FRONTIER}),
p AS (
  SELECT *, substr(url_norm, length(regexp_extract(url_norm, '^([a-z]+://[^/]+)', 1)) + 1) AS path,
         CAST(regexp_extract(host, 'www\\.host(\\d+)\\.com', 1) AS INT) AS hid
  FROM fr
),
rules AS (
  SELECT host, CASE WHEN hid % 3 = 0 THEN '/2018' WHEN hid % 3 = 1 THEN '/2019' ELSE '' END AS disallow
  FROM (SELECT DISTINCT host, hid FROM p)
)
SELECT p.host, p.url_norm,
       (rules.disallow = '' OR NOT starts_with(p.path, rules.disallow)) AS allowed,
       CAST(CASE WHEN rules.disallow = '' OR NOT starts_with(p.path, rules.disallow)
                 THEN 200 ELSE 403 END AS INT) AS status_code
FROM p JOIN rules ON p.host = rules.host
"""


def q_url_scorers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite URL scorer (ref deep_crawling/scorers.py): freshness year,
    path-depth optimum, content-type weight, keyword fraction — weighted sum,
    as pure column expressions."""
    n = _normalize(_urls(spark, sf_dir)).select("url_norm", "path").distinct()
    year = F.regexp_extract("url_norm", r"/(20[0-9]{2})/", 1)
    age = F.lit(2024) - year.cast("int")
    fresh = (
        F.when(year == "", 0.5)
        .when(age <= 0, 1.0).when(age == 1, 0.9).when(age == 2, 0.8)
        .when(age == 3, 0.7).when(age == 4, 0.6).when(age == 5, 0.5)
        .otherwise(0.3)
    )
    depth = F.length(F.regexp_replace("path", "[^/]", "")).cast("int")
    depth_score = F.lit(1.0) / (F.lit(1.0) + F.abs(depth - F.lit(3)))
    ctype = (
        F.when(F.col("path").endswith(".html"), 1.0)
        .when(F.col("path").endswith(".php"), 0.8)
        .when(F.col("path").endswith(".xml"), 0.6)
        .when(F.col("path").endswith(".pdf"), 0.4)
        .when(F.col("path").endswith(".jpg"), 0.2)
        .otherwise(0.7)
    )
    kw = (
        F.when(F.col("url_norm").contains("purchase"), 1).otherwise(0)
        + F.when(F.col("url_norm").contains("signup"), 1).otherwise(0)
    ).cast("double") / 2
    comp = F.lit(0.3) * fresh + F.lit(0.2) * depth_score + F.lit(0.2) * ctype + F.lit(0.3) * kw
    return n.select(
        "url_norm",
        e6(fresh).alias("freshness_e6"),
        e6(depth_score).alias("depth_score_e6"),
        e6(ctype).alias("ctype_score_e6"),
        e6(kw).alias("keyword_score_e6"),
        e6(comp).alias("composite_e6"),
    )


SQL_URL_SCORERS = f"""
WITH n AS (SELECT DISTINCT url_norm, path FROM ({_SQL_NORM})),
s AS (
  SELECT url_norm,
    CASE WHEN regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) = '' THEN 0.5
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) <= 0 THEN 1.0
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) = 1 THEN 0.9
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) = 2 THEN 0.8
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) = 3 THEN 0.7
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) = 4 THEN 0.6
         WHEN 2024 - CAST(regexp_extract(url_norm, '/(20[0-9]{{2}})/', 1) AS INT) = 5 THEN 0.5
         ELSE 0.3 END AS fresh,
    1.0 / (1.0 + abs(length(regexp_replace(path, '[^/]', '', 'g')) - 3)) AS depth_score,
    CASE WHEN path LIKE '%.html' THEN 1.0 WHEN path LIKE '%.php' THEN 0.8
         WHEN path LIKE '%.xml' THEN 0.6 WHEN path LIKE '%.pdf' THEN 0.4
         WHEN path LIKE '%.jpg' THEN 0.2 ELSE 0.7 END AS ctype,
    (CAST(contains(url_norm, 'purchase') AS INT) + CAST(contains(url_norm, 'signup') AS INT)) / 2.0 AS kw
  FROM n
)
SELECT url_norm,
       CAST(ROUND(fresh * 1e6) AS BIGINT) AS freshness_e6,
       CAST(ROUND(depth_score * 1e6) AS BIGINT) AS depth_score_e6,
       CAST(ROUND(ctype * 1e6) AS BIGINT) AS ctype_score_e6,
       CAST(ROUND(kw * 1e6) AS BIGINT) AS keyword_score_e6,
       CAST(ROUND((0.3 * fresh + 0.2 * depth_score + 0.2 * ctype + 0.3 * kw) * 1e6) AS BIGINT) AS composite_e6
FROM s
"""


def q_url_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-exit AND filter chain (ref FilterChain filters.py:69-116):
    URL pattern + domain allowlist + content-type — cheap predicates first,
    all pushable to the scan."""
    # dedup RAW urls before normalizing — normalize once per distinct URL
    # (the scale-correct order), and the post-shuffle stage references the
    # materialized `url` column instead of re-inlining the synth expression
    # into every normalization step (which blew whole-stage codegen past
    # the JVM 64 KB method limit and fell back to interpreted eval)
    raw = _urls(spark, sf_dir).select("host", "url").distinct()
    n = _normalize(raw).select("host", "url_norm", "path").distinct()
    hid = F.regexp_extract("host", r"www\.host(\d+)\.com", 1).cast("int")
    return (
        n.filter(hid < 15)                                   # DomainFilter allowlist
        .filter(~F.col("path").rlike(r"\.(jpg|pdf)$"))       # ContentTypeFilter
        .filter(F.col("path").rlike("/(purchase|view|click|signup)/"))  # URLPatternFilter
        .select("host", "url_norm")
    )


SQL_URL_FILTERS = f"""
SELECT host, url_norm FROM (
  SELECT DISTINCT host, url_norm, path,
         CAST(regexp_extract(host, 'www\\.host(\\d+)\\.com', 1) AS INT) AS hid
  FROM ({_SQL_NORM})
)
WHERE hid < 15 AND NOT regexp_matches(path, '\\.(jpg|pdf)$')
  AND regexp_matches(path, '/(purchase|view|click|signup)/')
"""


def q_bestfirst_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-first global ordering: rank by (-score, depth, url) and take the
    top 50 — the reference's PriorityQueue tuple (bff_strategy.py:19,130-215)
    as one window."""
    fr = _frontier(_normalize(_urls(spark, sf_dir)))
    top = fr.orderBy(F.desc("score_e6"), F.asc("depth"), F.asc("url_norm")).limit(50)
    w = Window.orderBy(F.desc("score_e6"), F.asc("depth"), F.asc("url_norm"))
    return (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .select("url_norm", "score_e6", "depth", "rk")
    )


SQL_BESTFIRST_ORDER = f"""
WITH fr AS ({_SQL_FRONTIER})
SELECT url_norm, score_e6, depth, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY score_e6 DESC, depth ASC, url_norm ASC) AS BIGINT) AS rk
  FROM fr
) WHERE rk <= 50
"""


def q_url_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-seen exact path: candidates anti-joined against the seen set
    (ref visited-set check bfs_strategy.py:111-127; the Bloom fast path is
    exercised in pytest, this is its correctness oracle)."""
    n = _normalize(_urls(spark, sf_dir))
    cand = n.select("url_norm").distinct()
    seen = n.filter(F.col("event_id") % 2 == 0).select("url_norm").distinct()
    return cand.join(seen, "url_norm", "left_anti")


SQL_URL_SEEN_ANTIJOIN = f"""
WITH n AS ({_SQL_NORM}),
cand AS (SELECT DISTINCT url_norm FROM n),
seen AS (SELECT DISTINCT url_norm FROM n WHERE event_id % 2 = 0)
SELECT url_norm FROM cand WHERE url_norm NOT IN (SELECT url_norm FROM seen)
"""


def q_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-synchronous BFS min-depth over a deterministic link graph built
    on documents doc_ids (tree edges i→2i+1, 2i+2 plus cross edges
    i→(7i+3) mod N for i≡0 mod 10), from seed 0, max depth 6 — the Spark
    side runs the real frontier iteration (one job per level, new-URLs-only
    like the engine's dedup_new_candidates); the oracle is a recursive CTE."""
    d = tbl(spark, sf_dir, "documents").select(F.col("doc_id").alias("node"))
    n_docs = d.count()
    e1 = d.select("node", (F.col("node") * 2 + 1).alias("dst"))
    e2 = d.select("node", (F.col("node") * 2 + 2).alias("dst"))
    e3 = d.filter(F.col("node") % 10 == 0).select(
        "node", ((F.col("node") * 7 + 3) % n_docs).alias("dst"))
    edges = (
        e1.unionByName(e2).unionByName(e3)
        .filter(F.col("dst") < n_docs)
        .withColumnRenamed("node", "src")
    ).cache()

    dist = d.sparkSession.createDataFrame([(0, 0)], ["node", "min_depth"])
    frontier = dist
    for depth in range(6):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"), F.lit(depth + 1).alias("min_depth"))
            .distinct()
            .join(dist.select("node"), "node", "left_anti")
        )
        nxt = nxt.cache()
        if nxt.count() == 0:
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist.select(F.col("node").cast("long"), F.col("min_depth").cast("long"))


SQL_BFS_REACHABILITY = """
WITH RECURSIVE
n AS (SELECT count(*) AS c FROM documents),
edges AS (
  SELECT doc_id AS src, doc_id * 2 + 1 AS dst FROM documents
  UNION ALL SELECT doc_id, doc_id * 2 + 2 FROM documents
  UNION ALL SELECT doc_id, (doc_id * 7 + 3) % (SELECT c FROM n) FROM documents WHERE doc_id % 10 = 0
),
walk(node, d) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION ALL
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.d < 6 AND e.dst < (SELECT c FROM n)
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(d) AS BIGINT) AS min_depth
FROM walk GROUP BY node
"""


def q_dispatch_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 dispatcher fairness/aging rank (ref async_dispatcher.py:217-226)
    as data: items waiting longer than the fairness window jump the queue
    with priority -wait (longest wait first), others rank by retry_count;
    per-host admission order = (priority ASC, score DESC, id ASC), top-5
    admitted per host."""
    from crawl4ai_spark.operators.dispatch import priority_score

    ev = tbl(spark, sf_dir, "events")
    base = ev.select(
        (F.col("user_id") % 10).cast("long").alias("host_id"),
        F.col("event_id").cast("long").alias("item_id"),
        (F.col("event_id") % 9).cast("double").alias("wait_gens"),
        (F.col("user_id") % 5).cast("int").alias("retry_count"),
        (F.col("event_id") % 100).cast("double").alias("score"),
    )
    ranked = base.withColumn(
        "priority", priority_score(F.col("wait_gens"), F.col("retry_count")),
    ).withColumn(
        "rk", F.row_number().over(
            Window.partitionBy("host_id").orderBy(
                F.col("priority").asc(), F.col("score").desc(),
                F.col("item_id").asc())),
    )
    return ranked.filter(F.col("rk") <= 5).select(
        "host_id", "item_id",
        F.col("priority").cast("long").alias("priority"),
        F.col("rk").cast("long").alias("rk"))


SQL_DISPATCH_PRIORITY = """
WITH base AS (
  SELECT user_id % 10 AS host_id, event_id AS item_id,
         CAST(event_id % 9 AS DOUBLE) AS wait_gens,
         user_id % 5 AS retry_count,
         CAST(event_id % 100 AS DOUBLE) AS score
  FROM events
), p AS (
  SELECT host_id, item_id, score,
         CASE WHEN wait_gens > 3 THEN -wait_gens
              ELSE CAST(retry_count AS DOUBLE) END AS priority
  FROM base
), r AS (
  SELECT host_id, item_id, priority,
         row_number() OVER (PARTITION BY host_id
                            ORDER BY priority ASC, score DESC, item_id ASC) AS rk
  FROM p
)
SELECT CAST(host_id AS BIGINT) AS host_id, CAST(item_id AS BIGINT) AS item_id,
       CAST(priority AS BIGINT) AS priority, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 5
"""


# ------------------------------------------------------- AIMD rate control
# Adaptive per-host crawl-delay from observed fetch outcomes — the TCP
# congestion-control discipline (additive-increase / multiplicative-
# decrease) applied to politeness: a success raises the host's request
# rate by AIMD_A, a failure (429/503/timeout) halves it. The reference's
# dispatcher has a FIXED delay + backoff quota (async_dispatcher.py:28-85,
# covered by politeness_backoff); AIMD is the feedback controller a
# 10^10-URL fleet runs so each host converges to its real capacity.
#
# Exactness scheme (what makes this a WINDOW instead of a sequential
# fold): flooring is DEFERRED to evaluation. With F_t = #failures among
# the host's first t observations and S_t = sum over successful i<=t of
# 2^{F_i}, the controller state is exactly
#     rate_t = clamp((AIMD_R0 + AIMD_A * S_t) div 2^{F_t})
# — the halvings distribute over the increments, so both cumulants are
# plain prefix sums. F is bounded by AIMD_MAXV (first 16 observations per
# host), so 2^F and S fit comfortably in BIGINT and both engines agree
# bit-for-bit. Scale shape: ONE host-keyed shuffle feeding three windows
# on the same partitioning (rank gate, F cumsum, S cumsum); no join, no
# python — at 10^10 observations this is the identical plan.

# 2-nibble md5 draw shared VERBATIM by both engines (the _HEX10 pattern)
_HEX2 = ("(CAST(instr('0123456789abcdef', substring({h}, 1, 1)) - 1"
         " AS BIGINT) * 16"
         " + CAST(instr('0123456789abcdef', substring({h}, 2, 1)) - 1"
         " AS BIGINT))")

AIMD_R0 = 8_000       # initial rate (milli-requests/s)
AIMD_A = 1_000        # additive increase per success
AIMD_MIN = 500        # clamp floor (never fully starve a host)
AIMD_MAX = 64_000     # clamp ceiling (politeness upper bound)
AIMD_MAXV = 16        # observations folded per host (bounds 2^F)


def q_politeness_aimd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    host = F.expr("user_id % 40")
    # deterministic 25%-failure outcome draw from the event id
    fail = F.expr(
        _HEX2.format(h="md5(CAST(event_id AS STRING))") + " < 64")
    d = ev.select(F.col("event_id"), host.alias("host_id"),
                  fail.cast("int").alias("fail"))
    w = Window.partitionBy("host_id").orderBy("event_id")
    d = (d.withColumn("rn", F.row_number().over(w))
          .filter(F.col("rn") <= AIMD_MAXV)
          .withColumn("f_cum", F.sum("fail").over(w))
          .withColumn("s_term", F.expr(
              "CASE WHEN fail = 1 THEN CAST(0 AS BIGINT)"
              " ELSE shiftleft(CAST(1 AS BIGINT), f_cum) END"))
          .withColumn("s_cum", F.sum("s_term").over(w))
          .withColumn("rate", F.expr(
              f"greatest(CAST({AIMD_MIN} AS BIGINT),"
              f" least(CAST({AIMD_MAX} AS BIGINT),"
              f" ({AIMD_R0} + {AIMD_A} * s_cum)"
              " div shiftleft(CAST(1 AS BIGINT), f_cum)))")))
    return d.select(
        F.expr("CAST(host_id AS BIGINT)").alias("host_id"),
        F.expr("CAST(event_id AS BIGINT)").alias("event_id"),
        F.expr("CAST(rn AS BIGINT)").alias("visit"),
        F.expr("CAST(fail AS BIGINT)").alias("fail"),
        F.expr("CAST(f_cum AS BIGINT)").alias("n_failures"),
        "rate",
        F.expr("CAST(1000000 div greatest(rate, 1) AS BIGINT)")
        .alias("delay_ms"))


SQL_POLITENESS_AIMD = f"""
WITH d AS (
  SELECT event_id, user_id % 40 AS host_id,
         CASE WHEN {_HEX2.format(h="md5(CAST(event_id AS VARCHAR))")} < 64
              THEN 1 ELSE 0 END AS fail
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY host_id ORDER BY event_id)
            AS rn
  FROM d
),
c AS (
  SELECT *,
         sum(fail) OVER (PARTITION BY host_id ORDER BY event_id) AS f_cum
  FROM r WHERE rn <= {AIMD_MAXV}
),
s AS (
  SELECT *,
         sum(CASE WHEN fail = 1 THEN CAST(0 AS BIGINT)
                  ELSE (CAST(1 AS BIGINT) << f_cum) END)
           OVER (PARTITION BY host_id ORDER BY event_id) AS s_cum
  FROM c
),
f AS (
  SELECT *, greatest(CAST({AIMD_MIN} AS BIGINT),
                     least(CAST({AIMD_MAX} AS BIGINT),
                           ({AIMD_R0} + {AIMD_A} * s_cum)
                             // (CAST(1 AS BIGINT) << f_cum))) AS rate
  FROM s
)
SELECT CAST(host_id AS BIGINT) AS host_id,
       CAST(event_id AS BIGINT) AS event_id,
       CAST(rn AS BIGINT) AS visit, CAST(fail AS BIGINT) AS fail,
       CAST(f_cum AS BIGINT) AS n_failures, rate,
       CAST(1000000 // greatest(rate, 1) AS BIGINT) AS delay_ms
FROM f
"""


# ------------------------------------------------------ Crawl-delay parse
# REP Crawl-delay → scheduling quota (operators/politeness.py
# crawl_delay_table): construction-derived oracle — the synthesis
# controls which robots UA group applies, so the oracle recomputes the
# expected delay from the construction while the Spark side parses the
# REAL robots bodies through stdlib robotparser. Four classes per host:
# plain * delay; * delay behind a non-matching specific group; no
# directive (NULL → default quota); OUR specific group overriding *.

CD_HOSTS = 60
CD_WINDOW_S = 20
CD_DEFAULT_QUOTA = 10
CD_AGENT = "crawl4ai-spark"


def _cd_robots_body(h: int) -> str:
    if h % 4 == 0:
        return (f"User-agent: *\nCrawl-delay: {1 + h % 7}\n"
                "Disallow: /private\n")
    if h % 4 == 1:
        return ("User-agent: otherbot\nCrawl-delay: 99\n\n"
                f"User-agent: *\nCrawl-delay: {2 + h % 5}\n")
    if h % 4 == 2:
        return "User-agent: *\nDisallow: /x\n"
    return (f"User-agent: {CD_AGENT}\nCrawl-delay: {1 + h % 3}\n\n"
            "User-agent: *\nCrawl-delay: 77\n")


def q_robots_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawl4ai_spark.operators.politeness import crawl_delay_table

    hosts = (tbl(spark, sf_dir, "documents")
             .select(F.expr(f"doc_id % {CD_HOSTS}").alias("h")).distinct())
    body = F.udf(_cd_robots_body, "string")  # synthesis only, #hosts rows
    robots = hosts.select(
        F.expr("concat('cd', h, '.example')").alias("host"),
        body(F.col("h")).alias("rules"))
    out = crawl_delay_table(robots, user_agent=CD_AGENT,
                            window_s=CD_WINDOW_S,
                            default_quota=CD_DEFAULT_QUOTA)
    return out.select("host", "crawl_delay", "quota")


SQL_ROBOTS_CRAWL_DELAY = f"""
WITH h AS (
  SELECT DISTINCT doc_id % {CD_HOSTS} AS h FROM documents
),
d AS (
  SELECT 'cd' || h || '.example' AS host,
         CASE WHEN h % 4 = 0 THEN 1 + h % 7
              WHEN h % 4 = 1 THEN 2 + h % 5
              WHEN h % 4 = 3 THEN 1 + h % 3
              ELSE NULL END AS crawl_delay
  FROM h
)
SELECT host, CAST(crawl_delay AS BIGINT) AS crawl_delay,
       CAST(CASE WHEN crawl_delay IS NULL THEN {CD_DEFAULT_QUOTA}
            ELSE greatest(1, least({CD_DEFAULT_QUOTA},
                                   {CD_WINDOW_S} // crawl_delay)) END
            AS BIGINT) AS quota
FROM d
"""


# ------------------------------------------------ RFC 9309 wildcard robots
# The modern Robots Exclusion Protocol (RFC 9309 §2.2.2-2.2.3, the
# Google-documented dialect): path patterns may contain '*' (any
# substring) and a trailing '$' (end anchor); the applicable rule is the
# LONGEST matching pattern, ties broken in favor of Allow; no match →
# allow. stdlib robotparser — and therefore the reference's gate
# (utils.py:313-365) — ignores wildcards entirely, so this is the
# conformance layer a modern crawler adds on top.
#
# Decision shape: rules are a tiny per-host dim (broadcast); each URL
# joins its host's rules, keeps the matching ones via a NATIVE regex
# translated from the pattern (escape '.', expand '*' → '.*', honor a
# trailing '$'; '^' anchors the prefix), and the verdict is ONE
# max-struct fold over (pattern_len, allow, pattern) — longest-match +
# allow-wins falls out of lexicographic struct ordering, no window.

RFC_HOSTS = 12


def _rfc9309_regex(pat_col: str) -> str:
    """Pattern → regex, identical text in both engines: escape dots,
    expand stars, honor a trailing '$' anchor."""
    esc = f"replace(replace({pat_col}, '.', '[.]'), '*', '.*')"
    return (f"CASE WHEN {pat_col} LIKE '%$'"
            f" THEN concat('^', substring({esc}, 1, length({esc}) - 1), '$')"
            f" ELSE concat('^', {esc}) END")


def rfc9309_decision(urls: DataFrame, rules: DataFrame) -> DataFrame:
    """``urls``: (url, host, path); ``rules``: (host, pattern, allow).
    Adds ``allow`` + ``matched_pattern`` per url (RFC 9309 precedence)."""
    r = rules.withColumn("__rx", F.expr(_rfc9309_regex("pattern")))
    m = (urls.join(F.broadcast(r), "host")
         .filter(F.expr("path rlike __rx"))
         .groupBy("url")
         .agg(F.max(F.struct(
             F.length("pattern").alias("plen"),
             F.col("allow").cast("int").alias("al"),
             F.col("pattern"))).alias("best")))
    return (urls.join(m, "url", "left")
            .withColumn("allow", F.expr(
                "coalesce(best.al = 1, true)"))
            .withColumn("matched_pattern",
                        F.expr("coalesce(best.pattern, '')"))
            .drop("best"))


def q_robots_wildcards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    urls = d.select(
        F.expr(f"concat('h', doc_id % {RFC_HOSTS}, '.rep.example')")
        .alias("host"),
        F.expr("concat('/a', doc_id % 5, '/p', doc_id,"
               " CASE doc_id % 4 WHEN 0 THEN '.html' WHEN 1 THEN '.pdf'"
               " WHEN 2 THEN '' ELSE '/index.php' END)").alias("path"))
    urls = urls.withColumn("url", F.expr("concat('https://', host, path)"))
    hosts = urls.select("host").distinct()
    rules = hosts.select("host", F.explode(F.expr("""
        CASE CAST(regexp_extract(host, '^h([0-9]+)', 1) AS INT) % 3
        WHEN 0 THEN array(
            named_struct('pattern', '/a1*', 'allow', false),
            named_struct('pattern', '/a1/p*', 'allow', true),
            named_struct('pattern', '*.pdf$', 'allow', false))
        WHEN 1 THEN array(
            named_struct('pattern', '*', 'allow', false),
            named_struct('pattern', '/a2*', 'allow', true))
        ELSE array()
        END""")).alias("r")) \
        .select("host", F.col("r.pattern").alias("pattern"),
                F.col("r.allow").alias("allow"))
    out = rfc9309_decision(urls, rules)
    return out.select("url", "host", "matched_pattern", "allow")


SQL_ROBOTS_WILDCARDS = f"""
WITH u AS (
  SELECT 'h' || (doc_id % {RFC_HOSTS}) || '.rep.example' AS host,
         '/a' || (doc_id % 5) || '/p' || doc_id ||
           (CASE doc_id % 4 WHEN 0 THEN '.html' WHEN 1 THEN '.pdf'
                 WHEN 2 THEN '' ELSE '/index.php' END) AS path
  FROM documents
),
urls AS (SELECT *, 'https://' || host || path AS url FROM u),
hosts AS (SELECT DISTINCT host FROM urls),
rules AS (
  SELECT host, r.pattern, r.allow
  FROM hosts, unnest(
    CASE CAST(regexp_extract(host, '^h([0-9]+)', 1) AS INT) % 3
    WHEN 0 THEN [
        {{'pattern': '/a1*', 'allow': false}},
        {{'pattern': '/a1/p*', 'allow': true}},
        {{'pattern': '*.pdf$', 'allow': false}}]
    WHEN 1 THEN [
        {{'pattern': '*', 'allow': false}},
        {{'pattern': '/a2*', 'allow': true}}]
    ELSE CAST([] AS STRUCT(pattern VARCHAR, allow BOOLEAN)[])
    END) AS t(r)
),
rx AS (
  SELECT host, pattern, allow,
         CASE WHEN pattern LIKE '%$'
              THEN '^' || substr(replace(replace(pattern, '.', '[.]'),
                                         '*', '.*'), 1,
                     length(replace(replace(pattern, '.', '[.]'),
                                    '*', '.*')) - 1) || '$'
              ELSE '^' || replace(replace(pattern, '.', '[.]'), '*', '.*')
              END AS rxp
  FROM rules
),
m AS (
  SELECT u.url,
         max(struct_pack(plen := length(r.pattern),
                         al := CAST(r.allow AS INT),
                         pattern := r.pattern)) AS best
  FROM urls u JOIN rx r ON r.host = u.host
  WHERE regexp_matches(u.path, r.rxp)
  GROUP BY u.url
)
SELECT u.url, u.host,
       COALESCE(m.best.pattern, '') AS matched_pattern,
       COALESCE(m.best.al = 1, TRUE) AS allow
FROM urls u LEFT JOIN m ON m.url = u.url
"""


# --------------------------------------------------- PLD politeness groups
# Registrable-domain (pay-level-domain) budget sharing: per-HOST politeness
# lets a subdomain farm (blog1..blogN.farm.com) multiply its crawl budget
# N-fold — production crawlers therefore bucket politeness by the
# REGISTRABLE domain and split the budget across its live hosts. PLD
# extraction mirrors urls.base_domain (strip www., keep 3 labels for
# co.uk-style second-level TLDs) as native expressions; python parity with
# the goldened base_domain() is pytest-asserted.
# Scale shape: one host aggregate, one pld aggregate, one broadcast join
# back — no window, no python; at 10^10 URLs the host list is the dim.

PLD_BUDGET = 12
_PLD_SL = ("'co','com','org','gov','edu','net','mil','int','ac','ad',"
           "'ae','af','ag'")


def _pld_expr(host_col: str) -> str:
    return f"""
    CASE WHEN size(split(h_, '[.]')) > 2
              AND element_at(split(h_, '[.]'), -2) IN ({_PLD_SL})
         THEN array_join(slice(split(h_, '[.]'), -3, 3), '.')
         ELSE array_join(slice(split(h_, '[.]'),
                               greatest(-2, -size(split(h_, '[.]'))),
                               2), '.') END
    """.replace("h_", f"(CASE WHEN {host_col} LIKE 'www.%'"
                f" THEN substring({host_col}, 5) ELSE {host_col} END)")


def q_politeness_pld(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    host = F.expr(
        "CASE WHEN user_id % 3 = 0"
        " THEN concat('www.site', user_id % 8, '.com')"
        " WHEN user_id % 3 = 1"
        " THEN concat('blog', user_id, '.bigfarm.com')"
        " ELSE concat('shop', user_id % 10, '.stores', user_id % 2,"
        " '.co.uk') END")
    per_host = (ev.select(host.alias("host"))
                .groupBy("host")
                .agg(F.count("*").cast("long").alias("n_queued"))
                .withColumn("pld", F.expr(_pld_expr("host"))))
    per_pld = (per_host.groupBy("pld")
               .agg(F.count("*").cast("long").alias("n_hosts"),
                    F.sum("n_queued").cast("long").alias("pld_queued")))
    return (per_host.join(F.broadcast(per_pld), "pld")
            .withColumn("host_quota", F.expr(
                f"greatest(CAST(1 AS BIGINT),"
                f" CAST({PLD_BUDGET} AS BIGINT) div n_hosts)"))
            .select("host", "pld", "n_queued", "n_hosts", "pld_queued",
                    "host_quota"))


def _pld_sql_expr(host_col: str) -> str:
    h = (f"(CASE WHEN {host_col} LIKE 'www.%'"
         f" THEN substr({host_col}, 5) ELSE {host_col} END)")
    return f"""
    CASE WHEN len(string_split({h}, '.')) > 2
              AND string_split({h}, '.')[-2] IN ({_PLD_SL})
         THEN array_to_string(list_slice(string_split({h}, '.'), -3, -1), '.')
         ELSE array_to_string(
                list_slice(string_split({h}, '.'),
                           CASE WHEN len(string_split({h}, '.')) < 2
                                THEN -len(string_split({h}, '.'))
                                ELSE -2 END, -1), '.') END
    """


SQL_POLITENESS_PLD = f"""
WITH hosts AS (
  SELECT CASE WHEN user_id % 3 = 0
              THEN 'www.site' || (user_id % 8) || '.com'
              WHEN user_id % 3 = 1
              THEN 'blog' || user_id || '.bigfarm.com'
              ELSE 'shop' || (user_id % 10) || '.stores' || (user_id % 2)
                   || '.co.uk' END AS host
  FROM events
),
per_host AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_queued,
         {_pld_sql_expr('host')} AS pld
  FROM hosts GROUP BY host
),
per_pld AS (
  SELECT pld, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(n_queued) AS BIGINT) AS pld_queued
  FROM per_host GROUP BY pld
)
SELECT h.host, h.pld, h.n_queued, p.n_hosts, p.pld_queued,
       greatest(CAST(1 AS BIGINT), {PLD_BUDGET} // p.n_hosts) AS host_quota
FROM per_host h JOIN per_pld p USING (pld)
"""




# --------------------------------------------------- capacity planning
# Frontier capacity model: how many politeness-bound generations does
# each host need to drain its queue, and which host is the crawl's
# BOTTLENECK? Composes two oracled operators — per-host queue depth and
# the AIMD controller's final converged rate (politeness_aimd) — into
# the planning query an operator runs before a drain: quota_h =
# clamp(final_rate div 1000), gens_h = ceil(queue/quota), bottleneck =
# argmax gens. Scale shape: one host aggregate + the AIMD windows +
# a max-struct fold for the final rate + a 1-row global-max broadcast.

CAP_QUOTA_MAX = 16


def q_crawl_capacity_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events")
    queue = (ev.select(F.expr("user_id % 40").alias("host_id"))
             .groupBy("host_id")
             .agg(F.count("*").cast("long").alias("n_queued")))
    aimd = q_politeness_aimd(spark, sf_dir)
    final = (aimd.groupBy("host_id")
             .agg(F.max(F.struct("visit", "rate")).alias("__last"))
             .select("host_id", F.col("__last.rate").alias("final_rate")))
    j = (queue.join(final, "host_id")
         .withColumn("quota", F.expr(
             f"greatest(CAST(1 AS BIGINT),"
             f" least(CAST({CAP_QUOTA_MAX} AS BIGINT),"
             f" final_rate div 1000))"))
         .withColumn("gens_to_drain",
                     F.expr("(n_queued + quota - 1) div quota")))
    worst = j.agg(F.max("gens_to_drain").alias("__worst"))
    return (j.join(F.broadcast(worst))
            .withColumn("is_bottleneck",
                        F.expr("gens_to_drain = __worst"))
            .select("host_id", "n_queued", "final_rate", "quota",
                    "gens_to_drain", "is_bottleneck"))


SQL_CRAWL_CAPACITY_PLAN = f"""
WITH aimd AS ({SQL_POLITENESS_AIMD}),
queue AS (
  SELECT user_id % 40 AS host_id, CAST(count(*) AS BIGINT) AS n_queued
  FROM events GROUP BY user_id % 40
),
fin AS (
  SELECT host_id,
         max(struct_pack(visit := visit, rate := rate)).rate AS final_rate
  FROM aimd GROUP BY host_id
),
j AS (
  SELECT q.host_id, q.n_queued, f.final_rate,
         greatest(CAST(1 AS BIGINT),
                  least(CAST({CAP_QUOTA_MAX} AS BIGINT),
                        f.final_rate // 1000)) AS quota
  FROM queue q JOIN fin f USING (host_id)
),
g AS (
  SELECT *, (n_queued + quota - 1) // quota AS gens_to_drain FROM j
),
w AS (SELECT max(gens_to_drain) AS worst FROM g)
SELECT g.host_id, g.n_queued, g.final_rate, g.quota, g.gens_to_drain,
       g.gens_to_drain = w.worst AS is_bottleneck
FROM g, w
"""


QUERIES = {
    "url_normalize": q_url_normalize,
    "url_canonical_groups": q_url_canonical_groups,
    "frontier_schedule": q_frontier_schedule,
    "politeness_backoff": q_politeness_backoff,
    "robots_gate": q_robots_gate,
    "url_scorers": q_url_scorers,
    "url_filters": q_url_filters,
    "bestfirst_order": q_bestfirst_order,
    "url_seen_antijoin": q_url_seen_antijoin,
    "bfs_reachability": q_bfs_reachability,
    "dispatch_priority": q_dispatch_priority,
    "politeness_aimd": q_politeness_aimd,
    "robots_crawl_delay": q_robots_crawl_delay,
    "politeness_pld": q_politeness_pld,
    "robots_wildcards": q_robots_wildcards,
    "crawl_capacity_plan": q_crawl_capacity_plan,
}
ORACLES = {
    "url_normalize": SQL_URL_NORMALIZE,
    "url_canonical_groups": SQL_URL_CANONICAL_GROUPS,
    "frontier_schedule": SQL_FRONTIER_SCHEDULE,
    "politeness_backoff": SQL_POLITENESS_BACKOFF,
    "robots_gate": SQL_ROBOTS_GATE,
    "url_scorers": SQL_URL_SCORERS,
    "url_filters": SQL_URL_FILTERS,
    "bestfirst_order": SQL_BESTFIRST_ORDER,
    "url_seen_antijoin": SQL_URL_SEEN_ANTIJOIN,
    "bfs_reachability": SQL_BFS_REACHABILITY,
    "dispatch_priority": SQL_DISPATCH_PRIORITY,
    "politeness_aimd": SQL_POLITENESS_AIMD,
    "robots_crawl_delay": SQL_ROBOTS_CRAWL_DELAY,
    "politeness_pld": SQL_POLITENESS_PLD,
    "robots_wildcards": SQL_ROBOTS_WILDCARDS,
    "crawl_capacity_plan": SQL_CRAWL_CAPACITY_PLAN,
}
