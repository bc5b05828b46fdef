"""Crawl-trap detection: infinite URL spaces flagged by pattern fan-out.

A 10^10-URL frontier dies on URL spaces that grow without bound — calendar
pages, faceted search, pagination explosions — which canonicalization can't
collapse (the URLs are genuinely distinct) but which contribute almost no
distinct content. The standard defense (Heydon & Najork's Mercator notes
this; every production crawler ships a variant) is PATTERN-level budgeting:
collapse each URL to its template (digit runs → '#'), then per (host,
pattern) compare the URL fan-out against the distinct-content count and
stop scheduling patterns whose fan-out is large but content diversity is
tiny. The reference has per-URL filters only (`deep_crawling/filters.py`) —
nothing pattern-level; this is the operator that protects its BFS at scale.

Inputs are synthesized deterministically from the documents table (the
``refreshq`` convention): four URL families per doc_id — article pages
(distinct content), a calendar trap (many URLs, content cycling through 7
variants), a paginated listing (mild reuse), and a tiny static family.

Verdict per (host, pattern): n_urls, n_contents (distinct content hashes),
fanout_e6 = n_urls·1e6 div n_contents, and trap = n_urls ≥ TRAP_MIN_URLS
AND n_contents · TRAP_DIVERSITY_X ≤ n_urls. All native expressions; ONE
(host, pattern) aggregate whose distinct-count rides the same shuffle key —
at 10^10 URLs this is the same single partial-aggregated pass, and the
resulting pattern table is tiny enough to broadcast back into the
scheduler as a block-list (the `domain_gate` composition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

TRAP_MIN_URLS = 8       # a pattern this wide gets audited
TRAP_DIVERSITY_X = 4    # trap iff n_urls >= 4 x n_distinct_contents


def _trap_urls(d: DataFrame) -> DataFrame:
    """(doc_id) -> (host, url, content_key): the deterministic URL corpus.
    Family by doc_id % 4: 0 = /article/<id> (content distinct), 1 =
    /cal/<year>/<month> (trap: content cycles mod 7), 2 = /list/page/<n>
    (content cycles mod 5 — reuse, but narrow), 3 = /about (one URL)."""
    fam = F.col("doc_id") % 4
    host = F.concat(F.lit("www.site"), (F.col("doc_id") % 3).cast("string"),
                    F.lit(".com"))
    # host (mod 3) x family (mod 4) pins doc_id mod 12 (CRT), so every
    # URL component must derive from q = doc_id div 12 or it degenerates
    # to a handful of values per (host, family) cell
    q = F.expr("doc_id div 12")
    url = (
        F.when(fam == 0, F.concat(F.lit("/article/"),
                                  F.col("doc_id").cast("string")))
        .when(fam == 1, F.concat(F.lit("/cal/"),
                                 (F.lit(2000) + q % 30).cast("string"),
                                 F.lit("/"),
                                 (F.lit(1) + F.expr("(doc_id div 12) div 30")
                                  % 12).cast("string")))
        .when(fam == 2, F.concat(F.lit("/list/page/"),
                                 (q % 40).cast("string")))
        .otherwise(F.lit("/about"))
    )
    content = (
        F.when(fam == 0, F.md5(F.concat(F.lit("a"),
                                        F.col("doc_id").cast("string"))))
        .when(fam == 1, F.md5(F.concat(F.lit("c"), (q % 7).cast("string"))))
        .when(fam == 2, F.md5(F.concat(F.lit("l"), (q % 5).cast("string"))))
        .otherwise(F.md5(F.lit("about")))
    )
    return d.select(host.alias("host"), url.alias("url"),
                    content.alias("content_key"))


def q_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    urls = _trap_urls(tbl(spark, sf_dir, "documents").select("doc_id"))
    pat = urls.select(
        "host",
        F.regexp_replace("url", "[0-9]+", "#").alias("pattern"),
        "url", "content_key")
    agg = pat.groupBy("host", "pattern").agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("content_key").alias("n_contents"))
    return agg.select(
        "host", "pattern",
        F.col("n_urls").cast("long"),
        F.col("n_contents").cast("long"),
        F.expr("n_urls * 1000000 div n_contents").cast("long")
        .alias("fanout_e6"),
        ((F.col("n_urls") >= TRAP_MIN_URLS)
         & (F.col("n_contents") * TRAP_DIVERSITY_X <= F.col("n_urls")))
        .alias("trap"))


SQL_TRAP_DETECT = f"""
WITH urls AS (
  SELECT concat('www.site', CAST(doc_id % 3 AS VARCHAR), '.com') AS host,
         CASE doc_id % 4
           WHEN 0 THEN concat('/article/', CAST(doc_id AS VARCHAR))
           WHEN 1 THEN concat('/cal/',
                              CAST(2000 + (doc_id // 12) % 30 AS VARCHAR),
                              '/',
                              CAST(1 + ((doc_id // 12) // 30) % 12
                                   AS VARCHAR))
           WHEN 2 THEN concat('/list/page/',
                              CAST((doc_id // 12) % 40 AS VARCHAR))
           ELSE '/about' END AS url,
         CASE doc_id % 4
           WHEN 0 THEN md5(concat('a', CAST(doc_id AS VARCHAR)))
           WHEN 1 THEN md5(concat('c', CAST((doc_id // 12) % 7 AS VARCHAR)))
           WHEN 2 THEN md5(concat('l', CAST((doc_id // 12) % 5 AS VARCHAR)))
           ELSE md5('about') END AS content_key
  FROM documents
), agg AS (
  SELECT host, regexp_replace(url, '[0-9]+', '#', 'g') AS pattern,
         count(DISTINCT url) AS n_urls,
         count(DISTINCT content_key) AS n_contents
  FROM urls GROUP BY 1, 2
)
SELECT host, pattern,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(n_contents AS BIGINT) AS n_contents,
       CAST(n_urls * 1000000 // n_contents AS BIGINT) AS fanout_e6,
       (n_urls >= {TRAP_MIN_URLS}
        AND n_contents * {TRAP_DIVERSITY_X} <= n_urls) AS trap
FROM agg
"""


# ---------------------------------------------------------------------------
# Soft-404 detection (Bar-Yossef, Broder, Kumar & Tomkins, "Sic Transit
# Gloria Telae", WWW 2004): hosts that answer missing URLs with HTTP 200 +
# an error page poison a corpus with near-identical junk documents the
# status-code gate never sees. The standard detector probes each host with
# a known-nonsense URL, takes that response as the host's ERROR SIGNATURE,
# and flags any page whose content is near-identical to the signature.
# The reference trusts status codes alone (async_crawler_strategy.py's
# response handling); this is the content-level defense a 10^10-page crawl
# needs.
#
# Deterministic synthesis from the documents table (the refreshq
# convention): host = doc_id % SOFT404_HOST_MOD; 2 in SOFT404_RATE_MOD
# docs "serve" the host's error template plus a tiny per-doc variant (the
# echoed-URL part of a real soft 404) instead of their own text. The probe
# corpus is one pure-template row per host — the nonsense-URL fetch.
# Verdict: 60-bit SimHash hamming(page, host probe) ≤ SOFT404_HAM_T.
# Template-plus-variant pages land at hamming ~7 (the variant token only
# flips bits the template leaves tied), real documents at ~30 (independent
# signatures) — the threshold sits in a wide deterministic gap.
#
# Scale shape: both signature passes are zero-shuffle mapInPandas stages
# (simhash_signatures); the host is re-derived from doc_id AFTER signing,
# so page rows never shuffle at all — the only join is the O(#hosts) probe
# table broadcast onto the signature stream. At 100 TB: one pass over the
# pages, one trivial probe fetch per host.
# ---------------------------------------------------------------------------

SOFT404_HOST_MOD = 40
SOFT404_RATE_MOD = 10   # doc_id % 10 < 2 → the page serves the error template
SOFT404_HAM_T = 15
_S404_TMPL = ("error 404 page not found the requested resource does not "
              "exist on this server host ")


def q_soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from crawl4ai_spark.ops.dedup import simhash_signatures

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    host = F.concat(F.lit("err"),
                    (F.col("doc_id") % SOFT404_HOST_MOD).cast("string"),
                    F.lit(".example"))
    tmpl = F.concat(F.lit(_S404_TMPL), host)
    pages = d.select(
        "doc_id",
        F.when(F.col("doc_id") % SOFT404_RATE_MOD < 2,
               F.concat(tmpl, F.lit(" v"), F.col("doc_id").cast("string")))
        .otherwise(F.col("text")).alias("text"))
    probes = (
        d.select(host.alias("host")).distinct()
        .select("host", F.concat(F.lit(_S404_TMPL), F.col("host"))
                .alias("text")))
    sig_p = simhash_signatures(pages).withColumn(
        "host", F.concat(F.lit("err"),
                         (F.col("doc_id") % SOFT404_HOST_MOD).cast("string"),
                         F.lit(".example")))
    sig_q = (simhash_signatures(probes, "host", "string")
             .withColumnRenamed("simhash60", "probe_sig"))
    return (
        sig_p.join(F.broadcast(sig_q), "host")
        .select(
            F.col("doc_id").cast("long"), "host",
            F.bit_count(F.col("simhash60").bitwiseXOR(F.col("probe_sig")))
            .cast("long").alias("hamming"))
        .withColumn("is_soft404", F.col("hamming") <= SOFT404_HAM_T)
    )


def trap_patterns_from_results(results: DataFrame,
                               min_urls: int = TRAP_MIN_URLS,
                               diversity_x: int = TRAP_DIVERSITY_X
                               ) -> DataFrame:
    """The engine bridge: q_trap_detect's verdict computed over a finished
    crawl's OWN results → the (host, pattern) block-list
    ``CrawlConfig(blocked_patterns=...)`` consumes. Two-phase trap
    defense, the OPIC discovery-crawl pattern: a budgeted discovery crawl
    surfaces the fan-out, the main crawl stops scheduling it. Content key
    = md5 of the extracted text (the crawl's own content signal). One
    (host, pattern) aggregate; output is O(#flagged patterns)."""
    base = results.filter(F.col("success") & F.col("text").isNotNull())
    pat = base.select(
        "host", F.regexp_replace("url", "[0-9]+", "#").alias("pattern"),
        "url", F.md5(F.col("text")).alias("content_key"))
    agg = pat.groupBy("host", "pattern").agg(
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("content_key").alias("n_contents"))
    return (agg.filter((F.col("n_urls") >= min_urls)
                       & (F.col("n_contents") * diversity_x
                          <= F.col("n_urls")))
            .select("host", "pattern"))


def soft404_probe_signatures(spark: SparkSession, sf_dir: str) -> dict:
    """The batch-calibration half for the streaming gate: one probe fetch
    per host (the nonsense-URL round) → {host: simhash60}. O(#hosts) —
    small enough to broadcast into a stream as a literal map."""
    from crawl4ai_spark.ops.dedup import simhash_signatures

    d = tbl(spark, sf_dir, "documents").select(
        F.concat(F.lit("err"),
                 (F.col("doc_id") % SOFT404_HOST_MOD).cast("string"),
                 F.lit(".example")).alias("host")).distinct()
    probes = d.select(
        "host", F.concat(F.lit(_S404_TMPL), F.col("host")).alias("text"))
    return {r.host: r.simhash60
            for r in simhash_signatures(probes, "host", "string").collect()}


def _sql_simhash_ctes(prefix: str, src: str, key: str) -> str:
    """DuckDB CTE chain computing the 60-bit SimHash scheme of
    dedup.SQL_DEDUP_SIMHASH over ``src`` (columns: key, text), emitting
    ``{prefix}sig(key, simhash60)``. Shares the global ``bits`` CTE."""
    return f"""
{prefix}toks AS (
  SELECT {key}, md5(t.tok) AS m
  FROM {src}, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(tok)
), {prefix}contrib AS (
  SELECT {key}, bi,
         sum(2 * ((instr('0123456789abcdef', substr(m, pos + 1, 1)) - 1 >> b)
                  & 1) - 1) AS s
  FROM {prefix}toks CROSS JOIN bits GROUP BY {key}, bi
), {prefix}sig AS (
  SELECT {key},
         CAST(sum((CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT << bi)
              AS BIGINT) AS simhash60
  FROM {prefix}contrib GROUP BY {key}
)"""


SQL_SOFT404_DETECT = f"""
WITH pages AS (
  SELECT doc_id,
         'err' || (doc_id % {SOFT404_HOST_MOD}) || '.example' AS host,
         CASE WHEN doc_id % {SOFT404_RATE_MOD} < 2
              THEN '{_S404_TMPL}' || 'err' || (doc_id % {SOFT404_HOST_MOD})
                   || '.example' || ' v' || CAST(doc_id AS VARCHAR)
              ELSE text END AS text
  FROM documents
), probes AS (
  SELECT DISTINCT host, '{_S404_TMPL}' || host AS text FROM pages
), bits AS (
  SELECT CAST(i // 4 AS INT) AS pos, CAST(i % 4 AS INT) AS b,
         CAST(i AS INT) AS bi
  FROM range(60) r(i)
),{_sql_simhash_ctes("p", "pages", "doc_id")},{
    _sql_simhash_ctes("q", "probes", "host")}
SELECT CAST(g.doc_id AS BIGINT) AS doc_id, g.host,
       CAST(bit_count(xor(p.simhash60, q.simhash60)) AS BIGINT) AS hamming,
       bit_count(xor(p.simhash60, q.simhash60)) <= {SOFT404_HAM_T}
         AS is_soft404
FROM (SELECT doc_id, host FROM pages) g
JOIN psig p ON p.doc_id = g.doc_id
JOIN qsig q ON q.host = g.host
"""


QUERIES = {
    "trap_detect": q_trap_detect,
    "soft404_detect": q_soft404_detect,
}
ORACLES = {
    "trap_detect": SQL_TRAP_DETECT,
    "soft404_detect": SQL_SOFT404_DETECT,
}
