"""Search-index construction operators: positional phrase match and
postings-list compression sizing — the inverted-index half of a web
search stack (BM25 ranking lives in ``ops/ranking.py``; the link signal
in ``ops/analytics.py`` PageRank/HITS and the anchor-text table).

No direct reference counterpart (crawl4ai feeds downstream indexers);
these are the queries the corpus a crawl produces exists to serve.

Scale shape:
- ``index_phrase_match``: the positional index is the posexplode of the
  token array; each phrase term filters it to a SMALL postings stream
  (filter pushed below the join), and the phrase is an equi-join on
  (doc_id, base_position) — k-1 hash joins for a k-term phrase, never a
  cross join, never a per-doc window. At 100 TB the streams co-partition
  on doc_id so all joins share one exchange.
- ``index_postings_size``: postings build is the standard shape — one
  distinct + shuffle on term, in-partition sort by doc_id, delta-gap +
  varint cost folded per term. Document ids enter the window already
  term-partitioned; a skewed (stop-word) term degrades to one partition's
  sort, which is why real indexers shard hot terms — noted, not needed at
  this vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import tbl

# 2-term phrase: at the synthetic corpus' document length (~55 tokens)
# specific trigrams are absent at some scales (vacuous 0-row results);
# every bigram over the 31-token vocabulary has df >= 10 at sf0.001/0.01/0.1
PHRASE = ["spark", "join"]
TOP_TERMS = 20


def _postoks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    arr = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0)).alias("arr"),
    )
    return arr.select("doc_id", F.posexplode("arr").alias("pos", "tok")) \
              .withColumn("pos", F.col("pos").cast("long"))


_SQL_POSTOKS = """
  SELECT doc_id,
         CAST(generate_subscripts(m, 1) - 1 AS BIGINT) AS pos,
         m[generate_subscripts(m, 1)] AS tok
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS m
        FROM documents)
"""


def q_index_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval for the fixed query phrase via positional
    postings intersection: term k's postings join the match set on
    (doc_id, pos - k), the document-at-a-time plan every positional
    inverted index executes."""
    toks = _postoks(spark, sf_dir)
    m = None
    for k, term in enumerate(PHRASE):
        p = (toks.filter(F.col("tok") == term)
                 .select("doc_id", (F.col("pos") - F.lit(k)).alias("base")))
        m = p if m is None else m.join(p, ["doc_id", "base"])
    return (m.groupBy("doc_id")
             .agg(F.count("*").cast("long").alias("n_matches"),
                  F.min("base").alias("first_pos"),
                  F.max("base").alias("last_pos"))
             .select(F.col("doc_id").cast("long"), "n_matches",
                     "first_pos", "last_pos"))


_PHRASE_JOINS = "\n".join(
    f"  JOIN toks p{k} ON p{k}.doc_id = p0.doc_id"
    f" AND p{k}.pos = p0.pos + {k} AND p{k}.tok = '{t}'"
    for k, t in enumerate(PHRASE) if k > 0
)

SQL_INDEX_PHRASE_MATCH = f"""
WITH toks AS ({_SQL_POSTOKS}),
m AS (
  SELECT p0.doc_id, p0.pos AS base
  FROM toks p0
{_PHRASE_JOINS}
  WHERE p0.tok = '{PHRASE[0]}'
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       min(base) AS first_pos, max(base) AS last_pos
FROM m GROUP BY doc_id
"""


def q_index_postings_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index sizing for the TOP_TERMS highest-df terms: build
    each term's document postings list, delta-encode the sorted doc-id
    gaps (first gap = doc_id + 1, i.e. the delta from sentinel -1, so
    every gap ≥ 1), and cost it in varint (7-data-bits-per-byte) bytes —
    the d-gap + vbyte estimate every postings compressor starts from.
    Integer-exact in both engines: bit length via length(bin(gap)), no
    floating log."""
    post = _postoks(spark, sf_dir).select("doc_id", "tok").distinct()
    df_ = post.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    top = df_.orderBy(F.desc("df"), F.asc("tok")).limit(TOP_TERMS)
    w = Window.partitionBy("tok").orderBy("doc_id")
    gaps = (post.join(F.broadcast(top), "tok")
                .withColumn("prev", F.lag("doc_id").over(w))
                .withColumn("gap", F.coalesce(
                    F.col("doc_id") - F.col("prev"),
                    F.col("doc_id") + F.lit(1)))
                .withColumn("vb", F.expr("1 + (length(bin(gap)) - 1) div 7")))
    return (gaps.groupBy("tok", "df")
                .agg(F.sum("vb").cast("long").alias("vbyte_bytes"))
                .withColumn("fixed_bytes", (F.col("df") * F.lit(8)).cast("long"))
                .select("tok", "df", "vbyte_bytes", "fixed_bytes"))


SQL_INDEX_POSTINGS_SIZE = f"""
WITH post AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_POSTOKS})),
top AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df
  FROM post GROUP BY tok
  ORDER BY df DESC, tok ASC LIMIT {TOP_TERMS}
),
gaps AS (
  SELECT p.tok, top.df,
         coalesce(p.doc_id - lag(p.doc_id) OVER
                    (PARTITION BY p.tok ORDER BY p.doc_id),
                  p.doc_id + 1) AS gap
  FROM post p JOIN top USING (tok)
)
SELECT tok, df,
       CAST(sum(1 + (length(bin(gap)) - 1) // 7) AS BIGINT) AS vbyte_bytes,
       CAST(df * 8 AS BIGINT) AS fixed_bytes
FROM gaps GROUP BY tok, df
"""


# ------------------------------------------------------- block-max metadata
# Block-Max WAND index structure (Ding & Suel, SIGIR 2011): per-term
# postings are cut into fixed-size blocks and each block stores the MAX
# score any of its postings can contribute — the skip structure that lets
# a top-k query jump whole blocks whose ceiling cannot beat the current
# threshold. We store the max of BM25's TF-NORMALIZATION component
#     tfn = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
# because the term's idf is a per-term CONSTANT — applying it at query
# time keeps the stored ceilings exact without any ln in either engine.
# With k1 = 6/5, b = 3/4 the fraction clears to a single exact integer
# division (multiply through by 20 * total_tokens):
#     tfn_e6 = 44*tf*T*1e6 div (20*tf*T + 6*T + 18*dl*N)
# where T = total corpus tokens, N = corpus docs (avgdl = T/N never
# materializes as a float).
# Scale shape: one (tok,doc) partial-agg for tf, one doc-keyed dl agg,
# scalars on a 1-row broadcast, ONE term-partitioned window for block
# numbering, one (tok,block) aggregate — the standard index-build plan.

BLOCK = 64


def q_index_blockmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _postoks(spark, sf_dir)
    tf = toks.groupBy("tok", "doc_id").agg(
        F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    scal = toks.agg(F.count("*").cast("long").alias("t_tot"),
                    F.countDistinct("doc_id").cast("long").alias("n_docs"))
    post = (tf.join(dl, "doc_id").join(F.broadcast(scal))
            .withColumn("tfn_e6", F.expr(
                "44 * tf * t_tot * 1000000 div"
                " (20 * tf * t_tot + 6 * t_tot + 18 * dl * n_docs)")))
    blocks = (post
              .withColumn("blk", F.expr(
                  f"(row_number() OVER (PARTITION BY tok ORDER BY doc_id)"
                  f" - 1) div {BLOCK}"))
              .groupBy("tok", "blk")
              .agg(F.max("tfn_e6").alias("block_max_tfn_e6"),
                   F.count("*").cast("long").alias("n_postings"),
                   F.min("doc_id").alias("doc_lo"),
                   F.max("doc_id").alias("doc_hi")))
    wt = Window.partitionBy("tok")
    return (blocks
            .withColumn("term_max_tfn_e6",
                        F.max("block_max_tfn_e6").over(wt))
            .select("tok", F.col("blk").cast("long").alias("blk"),
                    "block_max_tfn_e6", "n_postings", "doc_lo", "doc_hi",
                    "term_max_tfn_e6"))


SQL_INDEX_BLOCKMAX = f"""
WITH toks AS ({_SQL_POSTOKS}),
tf AS (
  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY tok, doc_id
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
scal AS (
  SELECT CAST(count(*) AS BIGINT) AS t_tot,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM toks
),
post AS (
  SELECT tf.tok, tf.doc_id,
         44 * tf.tf * s.t_tot * 1000000
           // (20 * tf.tf * s.t_tot + 6 * s.t_tot + 18 * dl.dl * s.n_docs)
           AS tfn_e6
  FROM tf JOIN dl USING (doc_id), scal s
),
nb AS (
  SELECT *, (row_number() OVER (PARTITION BY tok ORDER BY doc_id) - 1)
              // {BLOCK} AS blk
  FROM post
),
b AS (
  SELECT tok, CAST(blk AS BIGINT) AS blk,
         max(tfn_e6) AS block_max_tfn_e6,
         CAST(count(*) AS BIGINT) AS n_postings,
         min(doc_id) AS doc_lo, max(doc_id) AS doc_hi
  FROM nb GROUP BY tok, blk
)
SELECT tok, blk, block_max_tfn_e6, n_postings, doc_lo, doc_hi,
       max(block_max_tfn_e6) OVER (PARTITION BY tok) AS term_max_tfn_e6
FROM b
"""


# ------------------------------------------------- Elias-Fano postings size
# Quasi-succinct postings sizing (Vigna, WSDM 2013) next to the d-gap codes:
# for a term with df monotone doc-ids in universe U = max(doc_id)+1, EF
# stores df low halves of l = floor(log2(U/df)) bits plus a unary upper-bit
# vector of df ones and (U >> l) zeros:
#     ef_bits = df*l + df + (U >> l)    (<= df * (2 + ceil(log2(U/df))))
# Elias gamma/delta cost the same gap stream the vbyte estimate uses:
#     gamma(g) = 2*floor(log2 g) + 1
#     delta(g) = floor(log2 g) + 2*floor(log2(floor(log2 g)+1)) + 1
# Every term is integer-exact cross-engine via length(bin(x))-1 ==
# floor(log2 x) (and floor(log2(U/df)) == floor(log2(U div df)) because
# 2^(k+1) is an integer — no float log anywhere). This is the sizing table
# an index planner reads to pick the postings codec per term: EF wins on
# dense lists (gaps ~ U/df uniform), gamma on tiny-gap runs, vbyte never by
# much — the comparison IS the point of the query.
#
# Scale shape: identical to index_postings_size (one distinct + term-keyed
# window over the top-df terms) plus a 1-row universe aggregate broadcast
# onto the term table (the HITS norm-constant shape). Nothing doc-sized
# shuffles beyond the postings build itself.
# ---------------------------------------------------------------------------


def q_index_ef_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term postings size in Elias-Fano vs gamma vs delta vs vbyte
    bits for the TOP_TERMS highest-df terms — the codec-selection table of
    a postings compressor (all integer-exact, no float log)."""
    post = _postoks(spark, sf_dir).select("doc_id", "tok").distinct()
    uni = post.agg((F.max("doc_id") + F.lit(1)).cast("long").alias("u"))
    df_ = post.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    top = df_.orderBy(F.desc("df"), F.asc("tok")).limit(TOP_TERMS)
    w = Window.partitionBy("tok").orderBy("doc_id")
    gaps = (post.join(F.broadcast(top), "tok")
                .withColumn("prev", F.lag("doc_id").over(w))
                .withColumn("gap", F.coalesce(
                    F.col("doc_id") - F.col("prev"),
                    F.col("doc_id") + F.lit(1)))
                .withColumn("lg", F.expr("length(bin(gap)) - 1"))
                .withColumn("gamma_b", F.expr("2 * lg + 1"))
                .withColumn("delta_b", F.expr(
                    "lg + 2 * (length(bin(lg + 1)) - 1) + 1"))
                .withColumn("vb", F.expr("8 * (1 + lg div 7)")))
    per_term = (gaps.groupBy("tok", "df")
                .agg(F.sum("gamma_b").cast("long").alias("gamma_bits"),
                     F.sum("delta_b").cast("long").alias("delta_bits"),
                     F.sum("vb").cast("long").alias("vbyte_bits")))
    return (per_term.join(F.broadcast(uni))
            .withColumn("l", F.expr("length(bin(u div df)) - 1"))
            .withColumn("ef_bits", F.expr(
                "df * l + df + shiftright(u, cast(l as int))").cast("long"))
            .select("tok", "df", "ef_bits", "gamma_bits", "delta_bits",
                    "vbyte_bits"))


SQL_INDEX_EF_SIZE = f"""
WITH post AS (SELECT DISTINCT doc_id, tok FROM ({_SQL_POSTOKS})),
uni AS (SELECT CAST(max(doc_id) + 1 AS BIGINT) AS u FROM post),
top AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS df
  FROM post GROUP BY tok
  ORDER BY df DESC, tok ASC LIMIT {TOP_TERMS}
),
gaps AS (
  SELECT p.tok, top.df,
         length(bin(coalesce(p.doc_id - lag(p.doc_id) OVER
                               (PARTITION BY p.tok ORDER BY p.doc_id),
                             p.doc_id + 1))) - 1 AS lg
  FROM post p JOIN top USING (tok)
),
per_term AS (
  SELECT tok, df,
         CAST(sum(2 * lg + 1) AS BIGINT) AS gamma_bits,
         CAST(sum(lg + 2 * (length(bin(lg + 1)) - 1) + 1) AS BIGINT)
           AS delta_bits,
         CAST(sum(8 * (1 + lg // 7)) AS BIGINT) AS vbyte_bits
  FROM gaps GROUP BY tok, df
)
SELECT tok, df,
       CAST(df * (length(bin(u.u // df)) - 1) + df
            + (u.u >> CAST(length(bin(u.u // df)) - 1 AS INT)) AS BIGINT)
         AS ef_bits,
       gamma_bits, delta_bits, vbyte_bits
FROM per_term, uni u
"""


# --------------------------------------------- block-max pruned top-k query
# The EXECUTION half of the Block-Max structure: a disjunctive multi-term
# top-k that uses the (tok, blk) ceilings to skip postings, with the
# algorithm-independent contract "pruned result == brute-force top-k".
#
# Batch WAND analogue (Ding & Suel 2011, document-at-a-time recast as one
# plan over the whole query batch):
#   1. seed θ: exact-score only the docs of each term's single
#      best-ceiling block (≤ BLOCK docs/term) and take the K-th best —
#      a valid lower bound because seed scores are exact.
#   2. prune: a doc's score is bounded by the sum of its terms' block
#      ceilings (each doc sits in exactly one block per term); drop docs
#      with ub < θ BEFORE the scoring join. Metadata-only: the bound
#      needs (tok, blk) ceilings + each posting's block id, both already
#      in the index — never the tf arithmetic or the dl join.
#   3. exact-score survivors ∪ seeds, deterministic top-K by
#      (score DESC, doc_id ASC).
# Scoring is the per-term BM25 tf-normalization sum (Σ_t tfn_e6): each
# term's idf is a per-term CONSTANT multiplier, which scales that term's
# ceilings and contributions identically, so the pruning logic and the
# integer exactness carry over unchanged to idf-weighted scores (see
# index_blockmax on why no ln is ever stored).
#
# On this corpus the 31-token vocabulary makes nearly every doc a
# candidate (pruning is structural, not observable here); the pruning
# effectiveness claim is guarded in tests/test_indexq.py on a synthetic
# skewed postings set where the candidate count measurably collapses.
# Scale shape: block metadata is O(df/BLOCK) rows — broadcast-sized for
# any query; θ comes from ≤ BLOCK*|terms| seed docs; the survivor filter
# is a broadcast semi-join on doc_id before the only doc-sized work.
# ---------------------------------------------------------------------------

QUERY_TERMS = ["spark", "join", "dup"]
TOPK = 10


def _query_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, doc_id, tfn_e6, blk) for the query terms — the decoded
    postings slice a DAAT engine walks, with block ids."""
    toks = _postoks(spark, sf_dir)
    tf = toks.groupBy("tok", "doc_id").agg(
        F.count("*").cast("long").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    scal = toks.agg(F.count("*").cast("long").alias("t_tot"),
                    F.countDistinct("doc_id").cast("long").alias("n_docs"))
    return (tf.filter(F.col("tok").isin(QUERY_TERMS))
            .join(dl, "doc_id").join(F.broadcast(scal))
            .withColumn("tfn_e6", F.expr(
                "44 * tf * t_tot * 1000000 div"
                " (20 * tf * t_tot + 6 * t_tot + 18 * dl * n_docs)"))
            .withColumn("blk", F.expr(
                f"(row_number() OVER (PARTITION BY tok ORDER BY doc_id)"
                f" - 1) div {BLOCK}"))
            .select("tok", "doc_id", "tfn_e6", "blk"))


def q_index_blockmax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    post = _query_postings(spark, sf_dir)
    ceil_ = (post.groupBy("tok", "blk")
             .agg(F.max("tfn_e6").alias("bmax")))
    # 1. θ from the best block per term, exact-scored
    wb = Window.partitionBy("tok").orderBy(F.desc("bmax"), F.asc("blk"))
    best_blk = (ceil_.withColumn("rn", F.row_number().over(wb))
                .filter(F.col("rn") == 1).select("tok", "blk"))
    seed_docs = post.join(F.broadcast(best_blk), ["tok", "blk"]) \
                    .select("doc_id").distinct()
    scores = post.groupBy("doc_id").agg(
        F.sum("tfn_e6").cast("long").alias("score_e6"))
    seed_scores = scores.join(F.broadcast(seed_docs), "doc_id")
    theta = (seed_scores
             .orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(TOPK)
             .agg(F.when(F.count("*") >= TOPK, F.min("score_e6"))
                  .otherwise(F.lit(0)).cast("long").alias("theta")))
    # 2. metadata upper bound per doc; prune below θ
    ub = (post.join(F.broadcast(ceil_), ["tok", "blk"])
          .groupBy("doc_id").agg(F.sum("bmax").cast("long").alias("ub")))
    survivors = ub.crossJoin(F.broadcast(theta)) \
                  .filter(F.col("ub") >= F.col("theta")).select("doc_id")
    cand = survivors.union(seed_docs).distinct()
    # 3. exact top-K over the pruned candidate set
    return (scores.join(cand, "doc_id")
            .orderBy(F.desc("score_e6"), F.asc("doc_id")).limit(TOPK)
            .select(F.col("doc_id").cast("long"), "score_e6"))


_QT = ", ".join(f"'{t}'" for t in QUERY_TERMS)

# Oracle: brute-force top-K (algorithm-independent contract — any pruning
# bug that changes the result set fails parity).
SQL_INDEX_BLOCKMAX_TOPK = f"""
WITH toks AS ({_SQL_POSTOKS}),
tf AS (
  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY tok, doc_id
),
dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
),
scal AS (
  SELECT CAST(count(*) AS BIGINT) AS t_tot,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM toks
),
post AS (
  SELECT tf.tok, tf.doc_id,
         44 * tf.tf * s.t_tot * 1000000
           // (20 * tf.tf * s.t_tot + 6 * s.t_tot + 18 * dl.dl * s.n_docs)
           AS tfn_e6
  FROM tf JOIN dl USING (doc_id), scal s
  WHERE tf.tok IN ({_QT})
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(sum(tfn_e6) AS BIGINT) AS score_e6
FROM post GROUP BY doc_id
ORDER BY score_e6 DESC, doc_id ASC LIMIT {TOPK}
"""


# ------------------------------------------------------------- KWIC snippets
# Query-biased snippet extraction (the result-page half of the search
# stack): for every document matching the fixed phrase, emit the
# keyword-in-context window — SNIP_CTX tokens either side of the FIRST
# match. Pure composition: the phrase-match plan supplies first_pos, the
# token array supplies the window via one slice — no second scan of the
# text, no python. Window bounds are clamped identically in both engines
# (1-based slice, greatest/least), so the snippet strings are byte-exact.
# Scale shape: the snippet join is doc-keyed against the ALREADY-FILTERED
# match set (a few rows per million docs), so the token arrays of
# non-matching documents are never materialized past the match filter.
# ---------------------------------------------------------------------------

SNIP_CTX = 3


def q_index_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = q_index_phrase_match(spark, sf_dir).select("doc_id", "first_pos")
    d = tbl(spark, sf_dir, "documents")
    arr = d.select(
        "doc_id",
        F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"),
                             F.lit(0)).alias("arr"))
    k = len(PHRASE)
    return (arr.join(m, "doc_id")
            .select(F.col("doc_id").cast("long"),
                    F.col("first_pos").cast("long"),
                    F.expr(
                        f"array_join(slice(arr,"
                        f" CAST(greatest(1, first_pos + 1 - {SNIP_CTX}) AS INT),"
                        f" CAST(first_pos + 1 - greatest(1, first_pos + 1 - {SNIP_CTX})"
                        f" + {k + SNIP_CTX} AS INT)), ' ')").alias("snippet")))


SQL_INDEX_SNIPPETS = f"""
WITH toks AS ({_SQL_POSTOKS}),
m AS (
  SELECT p0.doc_id, p0.pos AS base
  FROM toks p0
{_PHRASE_JOINS}
  WHERE p0.tok = '{PHRASE[0]}'
),
fm AS (
  SELECT doc_id, min(base) AS first_pos FROM m GROUP BY doc_id
),
arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS a
  FROM documents
)
SELECT CAST(fm.doc_id AS BIGINT) AS doc_id,
       CAST(fm.first_pos AS BIGINT) AS first_pos,
       array_to_string(
         list_slice(arr.a,
                    greatest(1, fm.first_pos + 1 - {SNIP_CTX}),
                    fm.first_pos + {len(PHRASE) + SNIP_CTX}), ' ')
         AS snippet
FROM fm JOIN arr USING (doc_id)
"""


QUERIES = {
    "index_phrase_match": q_index_phrase_match,
    "index_postings_size": q_index_postings_size,
    "index_blockmax": q_index_blockmax,
    "index_ef_size": q_index_ef_size,
    "index_blockmax_topk": q_index_blockmax_topk,
    "index_snippets": q_index_snippets,
}
ORACLES = {
    "index_phrase_match": SQL_INDEX_PHRASE_MATCH,
    "index_postings_size": SQL_INDEX_POSTINGS_SIZE,
    "index_blockmax": SQL_INDEX_BLOCKMAX,
    "index_ef_size": SQL_INDEX_EF_SIZE,
    "index_blockmax_topk": SQL_INDEX_BLOCKMAX_TOPK,
    "index_snippets": SQL_INDEX_SNIPPETS,
}
