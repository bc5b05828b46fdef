"""Corpus cleaning transforms: CCNet line-level dedup + FineWeb PII redaction.

Two classic webtext-pipeline stages the crawl output feeds, complementing the
document-level (dedup.py) and substring-level (q_dedup_spans) families:

1. **Line-level dedup** (Wenzek et al. 2020 §4.1 — CCNet drops every line
   whose normalized hash appears more than once across the corpus; it is the
   step that strips boilerplate headers/footers/nav chrome that document-level
   dedup can't see). The corpus has no newlines, so the "line" unit is derived
   deterministically as fixed-width LINE_W-word windows of the token stream —
   the same synthesize-inside-the-query convention as q_decontaminate's eval
   holdout (no external data allowed).

   Exactness scheme (the q_dedup_spans discipline, ops/dedup.py): the
   corpus-wide duplicate count groups on ``xxhash64(line)`` — an 8-byte
   shuffle key, never the line bytes — then the surviving candidate
   occurrences (a small fraction; they already carry their line string)
   re-count on the real string, so a 2^-64 hash collision cannot fabricate a
   duplicate: for any line, either all its occurrences are candidates or
   none, hence the within-candidate distinct-doc count equals the corpus
   count and the verify is exact.

2. **PII redaction** (Penedo et al. 2024 — FineWeb anonymizes emails and
   public IPs before release; phones added per the common extension). PII is
   injected deterministically from doc_id (same convention as above: the
   synthetic corpus carries none), then scrubbed by regexp_replace with
   patterns restricted to the Java-regex ∩ RE2 common dialect so Spark and
   DuckDB agree byte-for-byte. Counts are taken per class before replacement.

Scale shape (100 TB): pii_redact is pure per-row expressions — zero
shuffles, whole-stage codegen end-to-end. Line dedup shuffles (a) 8-byte
hashes once over all lines, (b) line strings over candidates only, and
(c) kept lines once keyed by doc_id for reassembly — ≈1× corpus bytes total,
versus the 40× a substring-window key costs (the r4 lesson).

Reference parity target: crawl4ai has no corpus-level cleaning (its filters
are per-page, html/content_filter.py) — this is beyond-reference
training-data surface required by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

LINE_W = 4  # words per derived "line" (the corpus is single-space tokenized)

# Java-regex ∩ RE2 common dialect only (no lookaround, no backrefs):
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ln, line): the token stream cut into LINE_W-word windows;
    ln is the 0-based line index. In-row only — no shuffle."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.expr(f"""
              posexplode(transform(
                sequence(0L, CAST((size(split(text, ' ')) - 1)
                                  div {LINE_W} AS BIGINT)),
                i -> array_join(slice(split(text, ' '),
                                      CAST(i * {LINE_W} + 1 AS INT),
                                      {LINE_W}), ' ')))
              AS (ln, line)"""))
        .select("doc_id", F.col("ln").cast("long").alias("ln"), "line")
    )


def _dup_candidates(spark: SparkSession, sf_dir: str
                    ) -> tuple[DataFrame, DataFrame]:
    """(all lines, candidate occurrences of corpus-duplicated lines) — the
    hash-then-verify plan described in the module docstring."""
    lines = _lines(spark, sf_dir)
    lh = lines.withColumn("hk", F.xxhash64("line"))
    duph = (lh.groupBy("hk")
            .agg(F.countDistinct("doc_id").alias("ndh"))
            .filter(F.col("ndh") >= 2).select("hk"))
    cand = lh.join(duph, "hk").select("doc_id", "ln", "line")
    return lines, cand


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detection half: every line duplicated across >= 2 documents,
    with its distinct-doc and total-occurrence counts."""
    _, cand = _dup_candidates(spark, sf_dir)
    return (
        cand.groupBy("line")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"),
             F.count("*").cast("long").alias("n_occ"))
        .filter(F.col("n_docs") >= 2)
        .select("line", "n_docs", "n_occ")
    )


def q_clean_dup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The transform half: drop ALL occurrences of every corpus-duplicated
    line (CCNet's rule — the hash count is over the whole corpus, so every
    copy goes) and reassemble the remainder in line order."""
    lines, cand = _dup_candidates(spark, sf_dir)
    dup = (cand.groupBy("line")
           .agg(F.countDistinct("doc_id").alias("nd"))
           .filter(F.col("nd") >= 2).select("line"))
    drop = cand.join(dup, "line").select("doc_id", "ln")
    kept = (
        lines.join(drop, ["doc_id", "ln"], "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_kept"),
             F.expr("array_join(transform("
                    "array_sort(collect_list(struct(ln, line))),"
                    " x -> x.line), ' ')").alias("clean_text"))
    )
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select("doc_id",
                 F.expr(f"CAST((size(split(text, ' ')) - 1) div {LINE_W}"
                        f" + 1 AS BIGINT)").alias("n_lines"))
        .join(kept, "doc_id", "left")
        .select(
            "doc_id", "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long").alias("n_dup_lines"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )


# DuckDB oracle shares the line construction: list_slice clamps like Spark's
# slice, and (len-1)//W + 1 windows == Spark's sequence bound.
_SQL_LINES = f"""
toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
), lines AS (
  SELECT doc_id, CAST(i AS BIGINT) AS ln,
         array_to_string(
           list_slice(tk, CAST(i * {LINE_W} + 1 AS BIGINT),
                      CAST((i + 1) * {LINE_W} AS BIGINT)), ' ') AS line
  FROM toks, unnest(range((len(tk) - 1) // {LINE_W} + 1)) p(i)
)"""

SQL_DEDUP_LINES = f"""
WITH {_SQL_LINES}
SELECT line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occ
FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 2
"""

SQL_CLEAN_DUP_LINES = f"""
WITH {_SQL_LINES},
dup AS (
  SELECT line FROM lines GROUP BY line HAVING count(DISTINCT doc_id) >= 2
), kept AS (
  SELECT l.doc_id, l.ln, l.line
  FROM lines l LEFT JOIN dup USING (line) WHERE dup.line IS NULL
), agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(line, ' ' ORDER BY ln) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST((len(string_split(d.text, ' ')) - 1) // {LINE_W} + 1 AS BIGINT)
         AS n_lines,
       CAST((len(string_split(d.text, ' ')) - 1) // {LINE_W} + 1
            - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dup_lines,
       COALESCE(a.clean_text, '') AS clean_text
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def _pii_text_spark() -> str:
    """The deterministic PII-bearing column (doc_id-keyed injection; the
    synthetic corpus carries no real PII — q_decontaminate convention)."""
    return """
      concat(text, CASE CAST(doc_id % 7 AS INT)
        WHEN 3 THEN concat(' contact user', CAST(doc_id AS STRING),
                           '@mail', CAST(doc_id % 5 AS STRING),
                           '.example.com')
        WHEN 5 THEN concat(' origin 10.', CAST(doc_id % 256 AS STRING),
                           '.', CAST((doc_id div 256) % 256 AS STRING),
                           '.', CAST(1 + doc_id % 254 AS STRING))
        WHEN 1 THEN concat(' call 555-', CAST(100 + doc_id % 900 AS STRING),
                           '-', CAST(1000 + doc_id % 9000 AS STRING))
        ELSE '' END)"""


_PII_TEXT_SQL = """
  d.text || CASE CAST(doc_id % 7 AS INT)
    WHEN 3 THEN ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
    WHEN 5 THEN ' origin 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                || '.' || CAST(1 + doc_id % 254 AS VARCHAR)
    WHEN 1 THEN ' call 555-' || CAST(100 + doc_id % 900 AS VARCHAR)
                || '-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
    ELSE '' END"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class PII counts + the scrubbed text. Replacement order
    email → ip → phone is fixed (and non-overlapping by construction);
    counts are taken on the pre-redaction text. Pure per-row expressions —
    zero shuffles, stays in whole-stage codegen."""
    d = tbl(spark, sf_dir, "documents")
    pii = d.select("doc_id", F.expr(_pii_text_spark()).alias("pii_text"))
    out = pii
    for name, pat in [("n_emails", EMAIL_RE), ("n_ips", IP_RE),
                      ("n_phones", PHONE_RE)]:
        out = out.withColumn(name, F.size(F.regexp_extract_all(
            "pii_text", F.lit(pat), 0)).cast("long"))
    return (
        out.withColumn(
            "redacted",
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("pii_text", EMAIL_RE, "<EMAIL>"),
                    IP_RE, "<IP>"),
                PHONE_RE, "<PHONE>"))
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
    )


SQL_PII_REDACT = f"""
WITH pii AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS pii_text FROM documents d
)
SELECT doc_id,
       CAST(len(regexp_extract_all(pii_text, '{EMAIL_RE}')) AS BIGINT)
         AS n_emails,
       CAST(len(regexp_extract_all(pii_text, '{IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(pii_text, '{PHONE_RE}')) AS BIGINT)
         AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(pii_text, '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{IP_RE}', '<IP>', 'g'),
         '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM pii
"""


def q_corpus_clean_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning verdict: domain gate × Gopher quality gate
    cohorts, with per-cohort duplicate-line and PII totals — the summary
    card a cleaning run ships alongside the cleaned corpus. Every join is
    doc-keyed; the output is 4 cohort rows. Composes the already-oracled
    stages exactly as `corpus_ledger_full` composes the r4 pipeline."""
    from crawl4ai_spark.ops.domainq import q_domain_gate
    from crawl4ai_spark.ops.pipelineq import q_gopher_filter

    dom = q_domain_gate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("dom_keep"))
    gq = q_gopher_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("quality_keep"))
    lines = q_clean_dup_lines(spark, sf_dir).select("doc_id", "n_dup_lines")
    pii = q_pii_redact(spark, sf_dir).select(
        "doc_id",
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones"))
        .alias("pii"))
    return (
        dom.join(gq, "doc_id").join(lines, "doc_id").join(pii, "doc_id")
        .groupBy("dom_keep", "quality_keep")
        .agg(F.count("*").cast("long").alias("n_docs"),
             F.sum("n_dup_lines").cast("long").alias("n_dup_lines"),
             F.sum("pii").cast("long").alias("n_pii"))
        .select("dom_keep", "quality_keep", "n_docs", "n_dup_lines",
                "n_pii")
    )


def _sql_clean_card() -> str:
    """Composed from the stage oracles verbatim, each as a derived table —
    the oracle mirrors the composition, not a re-derivation."""
    from crawl4ai_spark.ops.pipelineq import SQL_GOPHER_FILTER
    from crawl4ai_spark.ops.domainq import SQL_DOMAIN_GATE
    return f"""
SELECT g.keep AS dom_keep, q.keep AS quality_keep,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(l.n_dup_lines) AS BIGINT) AS n_dup_lines,
       CAST(sum(p.n_emails + p.n_ips + p.n_phones) AS BIGINT) AS n_pii
FROM ({SQL_DOMAIN_GATE}) g
JOIN ({SQL_GOPHER_FILTER}) q USING (doc_id)
JOIN ({SQL_CLEAN_DUP_LINES}) l USING (doc_id)
JOIN ({SQL_PII_REDACT}) p USING (doc_id)
GROUP BY g.keep, q.keep
"""


# ---------------------------------------------------------------- C4 rules
# C4 heuristic cleaning (Raffel et al. 2020, §2.2 — the canonical webtext
# baseline next to the Gopher gate in ops/pipelineq.py): line-level, keep
# only lines that end in terminal punctuation, have enough words, and do
# not carry the "javascript" boilerplate token; document-level, drop any
# page containing "lorem ipsum" or "{" and any page with fewer than
# C4_MIN_SENTS surviving sentences. The synthetic corpus is a bare token
# stream, so sentence structure and hazards are INJECTED deterministically
# per (doc, line) from md5 draws (the pii_redact inject-then-filter
# convention) — the machinery under test is the filter, and every rule
# fires on a known construction-derived subset. Thresholds adapted to the
# 6-word synthetic lines (C4 uses >=5 words on natural text).
# Scale shape: one bounded explode + per-row expressions + one doc-keyed
# aggregate — no join, no window, no python.

C4_LINE_W = 6
C4_MIN_WORDS = 4
C4_MIN_SENTS = 3

_C4H2 = ("(CAST(instr('0123456789abcdef', substring({h}, {a}, 1)) - 1"
         " AS BIGINT) * 16"
         " + CAST(instr('0123456789abcdef', substring({h}, {b}, 1)) - 1"
         " AS BIGINT))")


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    md = "md5(concat(CAST(doc_id AS STRING), ':', CAST(ln AS STRING)))"
    t2 = _C4H2.format(h=md, a=1, b=2)
    j2 = _C4H2.format(h=md, a=3, b=4)
    lines = (
        d.select("doc_id", F.expr("split(text, ' ')").alias("tk"))
        .select("doc_id", "tk", F.explode(F.expr(
            f"sequence(CAST(0 AS BIGINT),"
            f" (size(tk) - 1) div {C4_LINE_W})")).alias("ln"))
        .withColumn("line0", F.expr(
            f"array_join(slice(tk, CAST(ln * {C4_LINE_W} + 1 AS INT),"
            f" {C4_LINE_W}), ' ')"))
        .withColumn("line1", F.expr(
            "CASE WHEN doc_id % 97 = 0 AND ln = 0"
            " THEN concat(line0, ' lorem ipsum')"
            " WHEN doc_id % 89 = 0 AND ln = 1"
            " THEN concat(line0, ' {') ELSE line0 END"))
        .withColumn("line2", F.expr(
            f"CASE WHEN {j2} < 8 THEN concat(line1, ' javascript')"
            " ELSE line1 END"))
        .withColumn("line", F.expr(
            f"concat(line2, CASE WHEN {t2} < 154 THEN '.'"
            f" WHEN {t2} < 180 THEN '?' ELSE '' END)"))
        .withColumn("kept", F.expr(
            f"line rlike '[.?]$' AND size(split(line, ' '))"
            f" >= {C4_MIN_WORDS} AND NOT line LIKE '%javascript%'"))
    )
    return (
        lines.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_lines"),
             F.sum(F.expr("CAST(kept AS INT)")).cast("long")
             .alias("n_kept"),
             F.expr("bool_or(line LIKE '%lorem ipsum%')").alias("has_lorem"),
             F.expr("bool_or(line LIKE '%{%')").alias("has_brace"),
             F.expr("array_join(transform(array_sort(collect_list("
                    "CASE WHEN kept THEN struct(ln, line) END)),"
                    " x -> x.line), ' ')").alias("clean_text"))
        .withColumn("keep", F.expr(
            f"NOT has_lorem AND NOT has_brace AND n_kept >= {C4_MIN_SENTS}"))
        .select("doc_id", "n_lines", "n_kept", "has_lorem", "has_brace",
                "keep", F.expr("md5(clean_text)").alias("clean_md5"))
    )


def _c4_sql() -> str:
    md = "md5(doc_id || ':' || ln)"
    t2 = _C4H2.format(h=md, a=1, b=2)
    j2 = _C4H2.format(h=md, a=3, b=4)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
l0 AS (
  SELECT doc_id, CAST(i AS BIGINT) AS ln,
         array_to_string(
           list_slice(tk, CAST(i * {C4_LINE_W} + 1 AS BIGINT),
                      CAST((i + 1) * {C4_LINE_W} AS BIGINT)), ' ') AS line0
  FROM toks, unnest(range((len(tk) - 1) // {C4_LINE_W} + 1)) p(i)
),
l1 AS (
  SELECT doc_id, ln,
         CASE WHEN doc_id % 97 = 0 AND ln = 0
              THEN line0 || ' lorem ipsum'
              WHEN doc_id % 89 = 0 AND ln = 1
              THEN line0 || ' {{' ELSE line0 END AS line1
  FROM l0
),
l2 AS (
  SELECT doc_id, ln,
         CASE WHEN {j2} < 8 THEN line1 || ' javascript'
              ELSE line1 END AS line2
  FROM l1
),
l3 AS (
  SELECT doc_id, ln,
         line2 || CASE WHEN {t2} < 154 THEN '.'
                       WHEN {t2} < 180 THEN '?' ELSE '' END AS line
  FROM l2
),
k AS (
  SELECT *, regexp_matches(line, '[.?]$')
            AND len(string_split(line, ' ')) >= {C4_MIN_WORDS}
            AND line NOT LIKE '%javascript%' AS kept
  FROM l3
),
a AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         bool_or(line LIKE '%lorem ipsum%') AS has_lorem,
         bool_or(line LIKE '%{{%') AS has_brace,
         array_to_string(
           apply(list_sort(list({{'ln': ln, 'line': line}})
                             FILTER (WHERE kept)),
                 x -> x.line), ' ') AS clean_text
  FROM k GROUP BY doc_id
)
SELECT doc_id, n_lines, n_kept, has_lorem, has_brace,
       (NOT has_lorem AND NOT has_brace AND n_kept >= {C4_MIN_SENTS})
         AS keep,
       md5(coalesce(clean_text, '')) AS clean_md5
FROM a
"""


# ------------------------------------------------------ host templates
# Host-conditioned boilerplate detection: a line appearing on most of
# ONE HOST's pages is chrome (nav/footer/banner) even when it is globally
# rare — the complement of CCNet's corpus-global line dedup above, and
# the DOM-free template removal big crawl pipelines run per site.
# Rule: template iff the line occurs on >= TEMPLATE_FRAC of the host's
# pages (integer cross-multiplied, no float) and the host has >=
# TEMPLATE_MIN_PAGES pages. Boilerplate is INJECTED deterministically
# (the pii convention): every page of a host carries its nav line; a
# third of pages carry a promo line that must stay BELOW the threshold.
# Scale shape: one (host, line) partial aggregate + a broadcast host-size
# dim — never a window; the removal transform is one left-anti join.

TEMPLATE_HOSTS = 15
TEMPLATE_FRAC_E6 = 600_000
TEMPLATE_MIN_PAGES = 5


def _host_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    d = d.withColumn("host", F.expr(f"doc_id % {TEMPLATE_HOSTS}"))
    body = (
        d.select("doc_id", "host", F.expr("split(text, ' ')").alias("tk"))
        .select("doc_id", "host", "tk", F.explode(F.expr(
            f"sequence(CAST(0 AS BIGINT),"
            f" (size(tk) - 1) div {LINE_W})")).alias("i"))
        .select("doc_id", "host", (F.col("i") + 2).alias("ln"),
                F.expr(
                    f"array_join(slice(tk, CAST(i * {LINE_W} + 1 AS INT),"
                    f" {LINE_W}), ' ')").alias("line")))
    nav = d.select("doc_id", "host", F.lit(0).cast("long").alias("ln"),
                   F.expr("concat('nav home about h', host)").alias("line"))
    promo = (d.filter(F.expr(f"(doc_id div {TEMPLATE_HOSTS}) % 3 = 0"))
             .select("doc_id", "host", F.lit(1).cast("long").alias("ln"),
                     F.expr("concat('promo banner h', host)").alias("line")))
    return nav.unionByName(promo).unionByName(body)


_SQL_HOST_LINES = f"""
  SELECT doc_id, doc_id % {TEMPLATE_HOSTS} AS host,
         CAST(0 AS BIGINT) AS ln,
         'nav home about h' || (doc_id % {TEMPLATE_HOSTS}) AS line
  FROM documents
  UNION ALL
  SELECT doc_id, doc_id % {TEMPLATE_HOSTS}, CAST(1 AS BIGINT),
         'promo banner h' || (doc_id % {TEMPLATE_HOSTS})
  FROM documents WHERE (doc_id // {TEMPLATE_HOSTS}) % 3 = 0
  UNION ALL
  SELECT doc_id, doc_id % {TEMPLATE_HOSTS}, CAST(i + 2 AS BIGINT),
         array_to_string(
           list_slice(string_split(text, ' '),
                      CAST(i * {LINE_W} + 1 AS BIGINT),
                      CAST((i + 1) * {LINE_W} AS BIGINT)), ' ')
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk
        FROM documents),
       unnest(range((len(tk) - 1) // {LINE_W} + 1)) p(i)
"""


def q_host_template_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection half: per (host, line) page counts + the template
    verdict, restricted to lines on >= 2 pages (bounds the output)."""
    lines = _host_lines(spark, sf_dir)
    host_pages = lines.groupBy("host").agg(
        F.countDistinct("doc_id").alias("host_pages"))
    per = (lines.groupBy("host", "line")
           .agg(F.countDistinct("doc_id").cast("long").alias("n_pages"))
           .filter(F.col("n_pages") >= 2))
    return (per.join(F.broadcast(host_pages), "host")
            .withColumn("is_template", F.expr(
                f"n_pages * 1000000 >= {TEMPLATE_FRAC_E6} * host_pages"
                f" AND host_pages >= {TEMPLATE_MIN_PAGES}"))
            .select(F.col("host").cast("long"), "line", "n_pages",
                    F.col("host_pages").cast("long").alias("host_pages"),
                    "is_template"))


SQL_HOST_TEMPLATE_LINES = f"""
WITH l AS ({_SQL_HOST_LINES}),
hp AS (SELECT host, count(DISTINCT doc_id) AS host_pages FROM l
       GROUP BY host),
per AS (
  SELECT host, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
  FROM l GROUP BY host, line HAVING count(DISTINCT doc_id) >= 2
)
SELECT CAST(per.host AS BIGINT) AS host, per.line, per.n_pages,
       CAST(hp.host_pages AS BIGINT) AS host_pages,
       (per.n_pages * 1000000 >= {TEMPLATE_FRAC_E6} * hp.host_pages
        AND hp.host_pages >= {TEMPLATE_MIN_PAGES}) AS is_template
FROM per JOIN hp USING (host)
"""


def strip_host_templates(lines: DataFrame, templates: DataFrame) -> DataFrame:
    """Removal half: drop every (host, line) flagged template — one
    left-anti join; reassembly stays with the caller (line order is the
    ln column)."""
    t = templates.filter("is_template").select("host", "line")
    return lines.join(t, ["host", "line"], "left_anti")


QUERIES = {
    "dedup_lines": q_dedup_lines,
    "clean_dup_lines": q_clean_dup_lines,
    "pii_redact": q_pii_redact,
    "corpus_clean_card": q_corpus_clean_card,
    "c4_clean": q_c4_clean,
    "host_template_lines": q_host_template_lines,
}
ORACLES = {
    "dedup_lines": SQL_DEDUP_LINES,
    "clean_dup_lines": SQL_CLEAN_DUP_LINES,
    "pii_redact": SQL_PII_REDACT,
    "corpus_clean_card": _sql_clean_card(),
    "c4_clean": _c4_sql(),
    "host_template_lines": SQL_HOST_TEMPLATE_LINES,
}
