"""Head-content URL filters (the F10 tail) as an oracle-checked query.

Parity targets: ContentRelevanceFilter (reference deep_crawling/
filters.py:509-585 — BM25-lite of query terms against a weighted
title/description/keywords head document, simplified idf) and SEOFilter
(:588-698 — weighted title-length / keyword / meta-description / canonical /
robots-noindex / schema.org / url-quality score).

The head fields are synthesized deterministically from the ``documents``
table (same expressions on both engines — the established pattern for URL
queries, see ops/scheduling._urls), so the whole computation is
oracle-checkable in DuckDB. One deliberate deviation from the reference:
the weighted document joins its title×3 / description×2 repetitions with
spaces (the reference's ``"title"*3`` string-multiplication merges the last
token of one copy into the first of the next — an artifact, not semantics).

Scale shape: both scores are pure column expressions over one row per URL —
no shuffle at all beyond the head join the engine path does anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.operators.urlfilters import head_relevance_score, seo_score
from crawl4ai_spark.ops.common import tbl

QUERY_TERMS = ["spark", "join", "window"]
SEO_KEYWORDS = ["spark", "data"]
RELEVANCE_T_E6 = 1_000_000    # BM25-lite threshold 1.0
SEO_T_E6 = 650_000            # ref SEOFilter default threshold 0.65


def _heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    sid = F.col("doc_id") % 10
    m4 = F.col("doc_id") % 4
    path = (
        F.when(m4 == 0, F.concat(F.lit("/a_b/page"), F.col("doc_id")))
        .when(m4 == 1, F.concat(F.lit("/archive/2021/p"), F.col("doc_id")))
        .when(m4 == 2, F.concat(F.lit("/p"), F.col("doc_id"), F.lit("?q=1")))
        .otherwise(F.concat(F.lit("/"), F.repeat(F.lit("seg/"), 21),
                            F.lit("p"), F.col("doc_id")))
    )
    url = F.concat(F.lit("https://www.site"), sid, F.lit(".com"), path)
    return d.select(
        "doc_id",
        url.alias("url"),
        F.expr("substr(text, 1, 30 + (doc_id % 5) * 12)").alias("title"),
        F.expr("substr(text, 10, 100 + (doc_id % 4) * 30)").alias("description"),
        F.expr("substr(text, 5, 40)").alias("keywords"),
        F.when(F.col("doc_id") % 3 == 0, url)
        .when(F.col("doc_id") % 3 == 1, F.lit("https://canon.example/c"))
        .otherwise(F.lit(None).cast("string")).alias("canonical"),
        F.when(F.col("doc_id") % 7 == 0, "noindex,follow")
        .otherwise("index,follow").alias("robots_meta"),
        (F.col("doc_id") % 4 == 0).alias("has_ldjson"),
    )


def q_url_filters_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _heads(spark, sf_dir)
    doc = F.concat_ws(" ", "title", "title", "title",
                      "description", "description", "keywords")
    rel = head_relevance_score(doc, QUERY_TERMS)
    seo = seo_score(F.col("url"), F.col("title"), F.col("description"),
                    F.col("canonical"), F.col("robots_meta"),
                    F.col("has_ldjson"), keywords=SEO_KEYWORDS)
    return h.select(
        F.col("doc_id").cast("long"),
        "url",
        F.round(rel * 1e6).cast("long").alias("relevance_e6"),
        F.round(seo * 1e6).cast("long").alias("seo_e6"),
    ).withColumn("relevance_pass", F.col("relevance_e6") >= RELEVANCE_T_E6) \
     .withColumn("seo_pass", F.col("seo_e6") >= SEO_T_E6)


def _sql_term(term: str) -> str:
    # mirrors head_relevance_score's expression shape exactly (operation
    # order matters for float-identical results)
    return (
        f"ln(2.0 / (tf_{term} + 0.5) + 1.0) * (tf_{term} * 2.2)"
        f" / (tf_{term} + 1.2 * (0.25 + (0.75 * dl) / 1000))"
    )


SQL_URL_FILTERS_HEAD = f"""
WITH h AS (
  SELECT doc_id,
         'https://www.site' || (doc_id % 10) || '.com' ||
         (CASE WHEN doc_id % 4 = 0 THEN '/a_b/page' || doc_id
               WHEN doc_id % 4 = 1 THEN '/archive/2021/p' || doc_id
               WHEN doc_id % 4 = 2 THEN '/p' || doc_id || '?q=1'
               ELSE '/' || repeat('seg/', 21) || 'p' || doc_id END) AS url,
         substr(text, 1, CAST(30 + (doc_id % 5) * 12 AS INT)) AS title,
         substr(text, 10, CAST(100 + (doc_id % 4) * 30 AS INT)) AS description,
         substr(text, 5, 40) AS keywords,
         CASE WHEN doc_id % 3 = 0 THEN
                'https://www.site' || (doc_id % 10) || '.com' ||
                (CASE WHEN doc_id % 4 = 0 THEN '/a_b/page' || doc_id
                      WHEN doc_id % 4 = 1 THEN '/archive/2021/p' || doc_id
                      WHEN doc_id % 4 = 2 THEN '/p' || doc_id || '?q=1'
                      ELSE '/' || repeat('seg/', 21) || 'p' || doc_id END)
              WHEN doc_id % 3 = 1 THEN 'https://canon.example/c'
              ELSE NULL END AS canonical,
         CASE WHEN doc_id % 7 = 0 THEN 'noindex,follow'
              ELSE 'index,follow' END AS robots_meta,
         doc_id % 4 = 0 AS has_ldjson
  FROM documents
),
toks AS (
  SELECT *,
         string_split(trim(regexp_replace(lower(
           concat_ws(' ', title, title, title, description, description, keywords)
         ), '\\s+', ' ', 'g')), ' ') AS tk
  FROM h
),
tf AS (
  SELECT *,
         CAST(len(tk) AS DOUBLE) AS dl,
         {", ".join(f"CAST(len(list_filter(tk, t -> t = '{t}')) AS DOUBLE) AS tf_{t}"
                    for t in QUERY_TERMS)}
  FROM toks
),
scored AS (
  SELECT *,
         0.0 + {" + ".join(_sql_term(t) for t in QUERY_TERMS)} AS rel,
         0.15 * (CASE WHEN length(coalesce(title,'')) BETWEEN 50 AND 60 THEN 1.0
                      WHEN (length(coalesce(title,'')) BETWEEN 40 AND 49)
                        OR (length(coalesce(title,'')) BETWEEN 61 AND 70) THEN 0.7
                      ELSE 0.3 END)
         + 0.18 * least(CAST(len(regexp_extract_all(coalesce(title,''),
                         '(?i)\\b(spark|data)\\b')) AS DOUBLE) * 0.3, 1.0)
         + 0.12 * (CASE WHEN length(coalesce(description,'')) BETWEEN 140 AND 160 THEN 1.0
                        WHEN length(coalesce(description,'')) BETWEEN 120 AND 200 THEN 0.5
                        ELSE 0.2 END)
         + 0.10 * (CASE WHEN canonical IS NULL OR canonical = '' THEN 0.5
                        WHEN canonical = url THEN 1.0 ELSE 0.2 END)
         + 0.20 * (CASE WHEN contains(coalesce(robots_meta,''), 'noindex') THEN 0.0
                        ELSE 1.0 END)
         + 0.10 * (CASE WHEN has_ldjson THEN 1.0 ELSE 0.0 END)
         + 0.15 * (1.0
             * (CASE WHEN length(lower(coalesce(nullif(regexp_extract(url,
                  'https?://[^/]+(/[^?#]*)', 1), ''), ''))) > 80 THEN 0.7 ELSE 1.0 END)
             * (CASE WHEN regexp_matches(lower(coalesce(nullif(regexp_extract(url,
                  'https?://[^/]+(/[^?#]*)', 1), ''), '')), '\\d{{4}}') THEN 0.8 ELSE 1.0 END)
             * (CASE WHEN coalesce(nullif(regexp_extract(url, '\\?([^#]*)', 1), ''), '') != ''
                  THEN 0.6 ELSE 1.0 END)
             * (CASE WHEN contains(lower(coalesce(nullif(regexp_extract(url,
                  'https?://[^/]+(/[^?#]*)', 1), ''), '')), '_') THEN 0.9 ELSE 1.0 END))
         AS seo
  FROM tf
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, url,
       CAST(ROUND(rel * 1e6) AS BIGINT) AS relevance_e6,
       CAST(ROUND(seo * 1e6) AS BIGINT) AS seo_e6,
       CAST(ROUND(rel * 1e6) AS BIGINT) >= {RELEVANCE_T_E6} AS relevance_pass,
       CAST(ROUND(seo * 1e6) AS BIGINT) >= {SEO_T_E6} AS seo_pass
FROM scored
"""


# ---------------------------------------------------------------------------
# JSON-LD structured-data extraction (late r5): the reference's seeder
# parses <script type="application/ld+json"> blocks into head info
# (async_url_seeder.py:123-129 lxml path, :146-153 regex fallback —
# json.loads each block, SKIP invalid, append in document order). Spark
# realization: native regexp_extract_all over the html (the reference's
# regex-fallback discipline, JVM-side), posexplode for in-document block
# order, validity + field access through get_json_object (JVM JSON parser
# — no python anywhere), object and array-of-objects payloads both
# handled (coalesce of $ and $[0] paths, like real consumers).
#
# The page corpus is synthesized in-query from events (SQL-reconstructible,
# the scheduling._urls pattern) and exercises: malformed JSON (skipped),
# top-level arrays, multiple blocks per page, five schema.org types. The
# DuckDB oracle NEVER sees the HTML — it rebuilds the ground-truth blocks
# from the same construction and extracts via its own json functions, so
# any drift in the Spark-side regex framing or JSON pathing breaks the
# value hash.
#
# Scale shape: pure per-row expressions + one posexplode — zero shuffles,
# zero python; runs at corpus-scan cost.
# ---------------------------------------------------------------------------

_LD_RX = (r'(?is)<script[^>]+type=["\']application/ld\+json["\'][^>]*>'
          r'(.*?)</script>')


def extract_jsonld(pages: DataFrame, html_col: str = "html_str") -> DataFrame:
    """(url, ld_idx, ld_type, ld_name) for every VALID ld+json block, in
    document order (invalid blocks keep their index gap, matching the
    reference's append-on-success over an enumerated scan)."""
    blocks = pages.select(
        "url",
        F.posexplode(F.regexp_extract_all(html_col, F.lit(_LD_RX), 1))
        .alias("ld_idx", "payload"))
    obj = F.get_json_object("payload", "$")
    return (
        blocks.filter(obj.isNotNull())
        .select(
            "url", F.col("ld_idx").cast("long"),
            F.coalesce(F.get_json_object("payload", "$['@type']"),
                       F.get_json_object("payload", "$[0]['@type']"))
            .alias("ld_type"),
            F.coalesce(F.get_json_object("payload", "$['name']"),
                       F.get_json_object("payload", "$[0]['name']"))
            .alias("ld_name"))
    )


def q_head_jsonld(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select("event_id", "user_id")
    m5 = F.col("event_id") % 5
    typ = (F.when(m5 == 0, "Product").when(m5 == 1, "Article")
           .when(m5 == 2, "Organization").when(m5 == 3, "WebPage")
           .otherwise("Event"))
    block0 = (
        F.when(F.col("event_id") % 7 == 0,
               F.lit('{"@type":"Broken","name":'))      # malformed → skip
        .when(F.col("event_id") % 7 == 1, F.concat(
            F.lit('[{"@type":"Article","name":"a'), F.col("event_id"),
            F.lit('"},{"@type":"Person","name":"x"}]')))
        .otherwise(F.concat(
            F.lit('{"@type":"'), typ, F.lit('","name":"n'),
            F.col("event_id"), F.lit('","sku":'),
            F.col("event_id") % 500, F.lit("}")))
    )
    html = F.concat(
        F.lit('<html><head><title>t</title>'
              '<script type="application/ld+json">'),
        block0, F.lit("</script>"),
        F.when(F.col("event_id") % 3 == 0, F.concat(
            F.lit('<script  type="application/ld+json">'
                  '{"@type":"BreadcrumbList","name":"bc'),
            F.col("event_id"), F.lit('"}</script>')))
        .otherwise(F.lit("")),
        F.lit("</head><body><p>x</p></body></html>"))
    pages = ev.select(
        F.concat(F.lit("https://www.host"), F.col("user_id") % 20,
                 F.lit(".com/ld/p"), F.col("event_id")).alias("url"),
        html.alias("html_str"))
    return extract_jsonld(pages)


SQL_HEAD_JSONLD = """
WITH ev AS (
  SELECT event_id, user_id,
         'https://www.host' || (user_id % 20) || '.com/ld/p' || event_id
           AS url
  FROM events
),
b0 AS (
  SELECT url, 0 AS ld_idx,
         CASE WHEN event_id % 7 = 0 THEN '{"@type":"Broken","name":'
              WHEN event_id % 7 = 1 THEN
                '[{"@type":"Article","name":"a' || event_id
                || '"},{"@type":"Person","name":"x"}]'
              ELSE '{"@type":"'
                || (CASE event_id % 5 WHEN 0 THEN 'Product'
                    WHEN 1 THEN 'Article' WHEN 2 THEN 'Organization'
                    WHEN 3 THEN 'WebPage' ELSE 'Event' END)
                || '","name":"n' || event_id || '","sku":'
                || (event_id % 500) || '}'
         END AS payload
  FROM ev
),
b1 AS (
  SELECT url, 1 AS ld_idx,
         '{"@type":"BreadcrumbList","name":"bc' || event_id || '"}'
           AS payload
  FROM ev WHERE event_id % 3 = 0
),
blocks AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1)
SELECT url, CAST(ld_idx AS BIGINT) AS ld_idx,
       COALESCE(json_extract_string(payload, '$."@type"'),
                json_extract_string(payload, '$[0]."@type"')) AS ld_type,
       COALESCE(json_extract_string(payload, '$.name'),
                json_extract_string(payload, '$[0].name')) AS ld_name
FROM blocks
WHERE json_valid(payload)
"""


# ---------------------------------------------------------------------------
# rel="canonical" election — the head signal a dedup pipeline consults
# BEFORE hashing content: publishers mark parameterized/mirrored URLs with a
# canonical link, and the indexer collapses each page onto its elected
# canonical target. Canonical links form CHAINS (a → b while b → c) and
# occasionally LOOPS (a ↔ b); election = pointer-doubling over the (url →
# canonical) edge set — O(log chain) self-join rounds, the redirectq engine
# shape over string keys — with loops falling back to self-canonical (the
# hint is discarded, which is what production indexers do with canonical
# cycles). One native regexp parse, zero python anywhere.
# ---------------------------------------------------------------------------

_CANON_RX = r'<link\s+rel="canonical"\s+href="([^"]+)"'
_CANON_ROUNDS = 6          # covers chains up to 2^6 hops


def canonical_edges(pages: DataFrame, html_col: str = "html_str"
                    ) -> DataFrame:
    """(url, canonical_href) for pages whose head declares a canonical
    target other than themselves. Native regexp — pushes to the scan."""
    href = F.regexp_extract(F.col(html_col), _CANON_RX, 1)
    return (pages.select("url", href.alias("dst"))
            .filter((F.col("dst") != "") & (F.col("dst") != F.col("url")))
            .select(F.col("url").alias("src"), "dst"))


def elect_canonical(urls: DataFrame, edges: DataFrame,
                    rounds: int = _CANON_ROUNDS) -> DataFrame:
    """urls(url) + edges(src, dst) → (url, canonical_url, hops, is_cycle).

    Pointer doubling: after J rounds every chain ≤ 2^J hops is collapsed.
    A url whose walk never leaves the edge set (dst still has an outgoing
    edge after the rounds) sits on a canonical LOOP: flagged and elected
    as itself, hops 0 — the hint is contradictory, so it is ignored."""
    m = edges.select("src", "dst", F.lit(1).cast("long").alias("hops"))
    for _ in range(rounds):
        n = m.select(F.col("src").alias("n_src"),
                     F.col("dst").alias("n_dst"),
                     F.col("hops").alias("n_hops"))
        m = (m.join(n, m["dst"] == n["n_src"], "left")
             .select("src", F.coalesce("n_dst", "dst").alias("dst"),
                     (F.col("hops") + F.coalesce("n_hops", F.lit(0)))
                     .alias("hops")))
    outgoing = edges.select(F.col("src").alias("o_src")).distinct()
    resolved = (
        m.join(outgoing, m["dst"] == outgoing["o_src"], "left")
        .select(F.col("src").alias("url"),
                F.col("o_src").isNotNull().alias("is_cycle"),
                F.col("dst").alias("_fin"), F.col("hops").alias("_fh")))
    return (
        urls.join(resolved, "url", "left")
        .select(
            "url",
            F.when(F.col("is_cycle").isNull() | F.col("is_cycle"),
                   F.col("url")).otherwise(F.col("_fin"))
            .alias("canonical_url"),
            F.when(F.col("is_cycle").isNull() | F.col("is_cycle"),
                   F.lit(0)).otherwise(F.col("_fh"))
            .cast("long").alias("hops"),
            F.coalesce("is_cycle", F.lit(False)).alias("is_cycle")))


def _canon_url(col):
    return F.concat(F.lit("https://www.site"), col % 10,
                    F.lit(".com/p"), col)


def q_head_canonical_elect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic head corpus over ``documents``: doc_id % 4 = 0 →
    self-canonical, 1 → canonicalizes to the group head (1 hop), 2 → to
    the %4=1 sibling (a 2-hop CHAIN through it), 3 → no link — except the
    %12 ∈ {3, 7} pairs, which canonicalize to EACH OTHER (a 2-loop).
    Output: (url, canonical_url, hops, is_cycle, group_size)."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    i = F.col("doc_id")
    url = _canon_url(i)
    target = (
        F.when(i % 4 == 0, url)
        .when(i % 4 == 1, _canon_url(i - 1))
        .when(i % 4 == 2, _canon_url(i - 1))
        .when(i % 12 == 3, _canon_url(i + 4))
        .when(i % 12 == 7, _canon_url(i - 4)))
    html = F.concat(
        F.lit("<html><head><title>t</title>"),
        F.when(target.isNotNull(),
               F.concat(F.lit('<link rel="canonical" href="'), target,
                        F.lit('">'))).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"))
    pages = d.select(url.alias("url"), html.alias("html_str"))
    elected = elect_canonical(pages.select("url"), canonical_edges(pages))
    sizes = elected.groupBy(F.col("canonical_url").alias("cu")) \
                   .agg(F.count(F.lit(1)).alias("group_size"))
    return (elected.join(sizes, elected.canonical_url == sizes.cu, "left")
            .select("url", "canonical_url", "hops", "is_cycle",
                    "group_size"))


SQL_HEAD_CANONICAL_ELECT = """
WITH d AS (SELECT doc_id FROM documents),
u AS (
  SELECT doc_id,
         'https://www.site' || (doc_id % 10) || '.com/p' || doc_id AS url,
         CASE WHEN doc_id % 4 IN (1, 2)
              THEN doc_id - (doc_id % 4) ELSE doc_id END AS fin_id,
         CASE doc_id % 4 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 0 END AS hops,
         -- the %12 in (3,7) pair is a loop only when BOTH partners exist
         (doc_id % 12 = 3 AND EXISTS (
            SELECT 1 FROM d p WHERE p.doc_id = u0.doc_id + 4))
         OR (doc_id % 12 = 7 AND EXISTS (
            SELECT 1 FROM d p WHERE p.doc_id = u0.doc_id - 4)) AS both_in
  FROM d u0
),
e AS (
  SELECT doc_id, url,
         CASE WHEN doc_id % 12 = 3 AND NOT both_in THEN
              'https://www.site' || ((doc_id + 4) % 10) || '.com/p'
                || (doc_id + 4)
         ELSE
              'https://www.site' || (fin_id % 10) || '.com/p' || fin_id
         END AS canonical_url,
         CASE WHEN doc_id % 12 = 3 AND NOT both_in THEN 1 ELSE hops END
           AS hops,
         (doc_id % 12 IN (3, 7) AND both_in) AS is_cycle
  FROM u
)
SELECT url, canonical_url, CAST(hops AS BIGINT) AS hops, is_cycle,
       (SELECT count(*) FROM e x
        WHERE x.canonical_url = e.canonical_url) AS group_size
FROM e
"""


# ---------------------------------------------------------------------------
# hreflang alternate-language clusters — `<link rel="alternate"
# hreflang=... href=...>` declarations link the language versions of a
# page; publishers rarely list the full clique (each version typically
# points at a subset), so recovering the version GROUP is a connected-
# components problem over the alternate graph. Reuses the large-star/
# small-star engine directly on URL-string node ids (O(log n) rounds at
# web scale); the cluster id is the lexicographically smallest member —
# exactly SQL's min(url) per group, which keeps the oracle exact.
# ---------------------------------------------------------------------------

_HREFLANG_RX = r'<link\s+rel="alternate"\s+hreflang="([a-z-]+)"\s+href="([^"]+)"'


def hreflang_links(pages: DataFrame, html_col: str = "html_str"
                   ) -> DataFrame:
    """(url, hreflang, href) per alternate declaration — two native
    regexp_extract_all passes zipped positionally (same match set, so the
    arrays align by construction)."""
    langs = F.regexp_extract_all(F.col(html_col), F.lit(_HREFLANG_RX), 1)
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(_HREFLANG_RX), 2)
    return (pages.select("url",
                         F.explode(F.arrays_zip(langs.alias("hreflang"),
                                                hrefs.alias("href")))
                         .alias("z"))
            .select("url", F.col("z.hreflang").alias("hreflang"),
                    F.col("z.href").alias("href")))


def q_head_hreflang_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus: consecutive doc_id triplets are en/de/fr
    versions of one page; each head declares itself plus ONLY the next
    member (a path, not a clique — min-label propagation alone would need
    O(cluster) rounds on long paths; CC closes it). Output: (url,
    hreflang, cluster_id = min url in the component, n_members)."""
    from crawl4ai_spark.ops.clusterq import connected_components_bigstar

    d = tbl(spark, sf_dir, "documents").select("doc_id")
    mx = d.agg(F.max("doc_id").alias("mx"))
    i = F.col("doc_id")
    url = _canon_url(i)
    lang = F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                        (i % 3 + 1).cast("int"))
    nxt_lang = F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                            ((i + 1) % 3 + 1).cast("int"))
    has_next = (i % 3 < 2) & (i < F.col("mx"))
    html = F.concat(
        F.lit("<html><head>"),
        F.concat(F.lit('<link rel="alternate" hreflang="'), lang,
                 F.lit('" href="'), url, F.lit('">')),
        F.when(has_next,
               F.concat(F.lit('<link rel="alternate" hreflang="'),
                        nxt_lang, F.lit('" href="'), _canon_url(i + 1),
                        F.lit('">'))).otherwise(F.lit("")),
        F.lit("</head><body>x</body></html>"))
    pages = d.join(F.broadcast(mx)).select(url.alias("url"),
                                           lang.alias("hreflang"),
                                           html.alias("html_str"))
    links = hreflang_links(pages)
    edges = (links.filter(F.col("href") != F.col("url"))
             .select(F.col("url").alias("v1"), F.col("href").alias("v2")))
    cc = connected_components_bigstar(
        pages.select(F.col("url").alias("node")), edges, cast_long=False)
    return (pages.select("url", "hreflang")
            .join(cc.withColumnRenamed("vec_id", "url"), "url")
            .select("url", "hreflang", "cluster_id",
                    F.col("cluster_size").alias("n_members")))


SQL_HEAD_HREFLANG_CLUSTERS = """
WITH d AS (SELECT doc_id FROM documents),
u AS (
  SELECT doc_id,
         'https://www.site' || (doc_id % 10) || '.com/p' || doc_id AS url,
         CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
              ELSE 'fr' END AS hreflang,
         doc_id - (doc_id % 3) AS grp
  FROM d
)
SELECT url, hreflang,
       (SELECT min(x.url) FROM u x WHERE x.grp = u.grp) AS cluster_id,
       (SELECT count(*) FROM u x WHERE x.grp = u.grp) AS n_members
FROM u
"""


QUERIES = {"url_filters_head": q_url_filters_head,
           "head_jsonld": q_head_jsonld,
           "head_canonical_elect": q_head_canonical_elect,
           "head_hreflang_clusters": q_head_hreflang_clusters}
ORACLES = {"url_filters_head": SQL_URL_FILTERS_HEAD,
           "head_jsonld": SQL_HEAD_JSONLD,
           "head_canonical_elect": SQL_HEAD_CANONICAL_ELECT,
           "head_hreflang_clusters": SQL_HEAD_HREFLANG_CLUSTERS}
