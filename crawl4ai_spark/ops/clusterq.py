"""CosineStrategy (E14) clustering queries — the extraction side of
``/root/reference/crawl4ai/extraction_strategy.py:135-492`` re-expressed
relationally, plus corpus-level near-dup clustering over the embeddings
table.

Reference pipeline (CosineStrategy.extract, :404-492): split into chunks →
(optional) semantic-filter pre-filter (:244-296) → hierarchical clustering
at ``max_dist`` (:354-377) → group by label in order → drop clusters under
``word_count_threshold`` words (:379-402) → ordered cluster list.

Spark-first mapping, designed for the 100 TB shape:

- ``cosine_cluster_chunks``: single-linkage variant (``linkage_method`` is a
  reference parameter; 'single' at threshold t == connected components of
  the ≤t cosine graph). All per-doc: the chunk-pair join and the component
  fold shuffle ONLY on doc_id, so work per key is bounded by document
  length, never corpus size. DuckDB oracle = recursive-CTE transitive
  closure — the reason this variant carries the oracle while Ward cannot.
- ``cosine_cluster_ward``: the reference's DEFAULT linkage, from-scratch
  Lance-Williams in one ``applyInPandas`` stage (functions/cluster.py);
  rows-only for the driver (agglomerative merge order is not expressible in
  SQL), pytest-verified against an independent naive implementation.
- ``cosine_prefilter``: ``filter_documents_embeddings`` semantics exactly —
  keep sim ≥ threshold in corpus order, backfill the remainder by sim rank
  to ``at_least_k``, cap at ``at_least_k`` (:270-296 incl. the n<k halving).
- ``cluster_embeddings``: connected components over the LSH-verified
  near-dup pairs (sim_lsh_verified) — iterative min-label propagation, the
  standard scale algorithm (each round is one self-equi-join on vec ids; at
  10^10 nodes you'd switch to large-star/small-star, same join shape).

Embeddings are deterministic md5 feature hashing (no model in sandbox —
same scheme as functions/cluster.feature_hash_embed, bit-identical across
the pure-Python, Arrow, and SQL paths because every value is a dyadic
rational sum).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crawl4ai_spark.ops.common import tbl
from crawl4ai_spark.ops.extractq import CHUNK_SIZE
from crawl4ai_spark.ops.similarity import (
    SQL_SIM_LSH_VERIFIED,
    q_sim_lsh_verified,
)

HDIM = 16                 # feature-hash embedding dims (chunk/doc/query)
COS_T_E6 = 600_000        # single-linkage edge threshold (cos ≥ 0.6)
WORD_T = 10               # reference word_count_threshold default
AT_LEAST_K = 20           # reference filter_documents_embeddings at_least_k
WARD_MAX_DIST = 0.7       # cut height for the hash-embedding value range
                          # (reference default 0.2 assumes model embeddings)
PREFILTER_QUERY = "hash join merge sort scan"
PREFILTER_THRESHOLDS_E6 = {0: 300_000, 1: 700_000}   # fid → sim threshold

_HEXVAL = "(instr('0123456789abcdef', {c}) - 1)"


# ---------------------------------------------------------------------------
# shared relational pieces: tokens → chunks → hash-embedding elements
# ---------------------------------------------------------------------------

def _chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
            ).alias("pos", "tok"),
        )
        .withColumn("chunk_id", F.expr(f"pos div {CHUNK_SIZE}"))
    )


def _chunk_elements(spark: SparkSession, toks: DataFrame) -> DataFrame:
    """(doc_id, chunk_id, i, x): dim-i feature-hash sum over chunk tokens."""
    dims = spark.range(HDIM).select(F.col("id").cast("int").alias("i"))
    w = (
        F.instr(F.lit("0123456789abcdef"),
                F.substring(F.md5(F.concat_ws("_", "tok", "i")), 1, 1))
        - F.lit(1) - F.lit(7.5)
    )
    return (
        toks.crossJoin(F.broadcast(dims))
        .groupBy("doc_id", "chunk_id", "i")
        .agg(F.sum(w).alias("x"))
    )


_SQL_CHUNK_TOKS = f"""
  SELECT doc_id,
         CAST(generate_subscripts(m, 1) - 1 AS BIGINT) AS pos,
         m[generate_subscripts(m, 1)] AS tok,
         (generate_subscripts(m, 1) - 1) // {CHUNK_SIZE} AS chunk_id
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS m FROM documents)
"""

_SQL_CHUNK_EL = f"""
  SELECT doc_id, chunk_id, CAST(i AS INT) AS i,
         sum({_HEXVAL.format(c="substr(md5(tok || '_' || i), 1, 1)")} - 7.5) AS x
  FROM ({_SQL_CHUNK_TOKS}) t, range({HDIM}) r(i)
  GROUP BY 1, 2, 3
"""

_SQL_CHUNKS = f"""
  SELECT doc_id, chunk_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         string_agg(tok, ' ' ORDER BY pos) AS chunk_text
  FROM ({_SQL_CHUNK_TOKS}) GROUP BY 1, 2
"""

_SQL_CHUNK_EDGES = f"""
  WITH el AS ({_SQL_CHUNK_EL}),
  nrm AS (SELECT doc_id, chunk_id, sqrt(sum(x * x)) AS n FROM el GROUP BY 1, 2),
  dots AS (
    SELECT a.doc_id, a.chunk_id AS c1, b.chunk_id AS c2, sum(a.x * b.x) AS dot
    FROM el a JOIN el b ON a.doc_id = b.doc_id AND a.i = b.i
                       AND a.chunk_id < b.chunk_id
    GROUP BY 1, 2, 3
  )
  SELECT d.doc_id, d.c1, d.c2,
         CAST(ROUND(d.dot / (n1.n * n2.n) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d
  JOIN nrm n1 ON n1.doc_id = d.doc_id AND n1.chunk_id = d.c1
  JOIN nrm n2 ON n2.doc_id = d.doc_id AND n2.chunk_id = d.c2
"""


def _chunk_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc chunk pairs with quantized cosine — join key is doc_id."""
    toks = _chunk_tokens(spark, sf_dir)
    el = _chunk_elements(spark, toks)
    nrm = el.groupBy("doc_id", "chunk_id").agg(
        F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n"))
    a, b = el.alias("a"), el.alias("b")
    dots = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id"))
               & (F.col("a.i") == F.col("b.i"))
               & (F.col("a.chunk_id") < F.col("b.chunk_id")))
        .groupBy(F.col("a.doc_id").alias("doc_id"),
                 F.col("a.chunk_id").alias("c1"),
                 F.col("b.chunk_id").alias("c2"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).alias("dot"))
    )
    n1 = nrm.select(F.col("doc_id"), F.col("chunk_id").alias("c1"),
                    F.col("n").alias("nrm1"))
    n2 = nrm.select(F.col("doc_id"), F.col("chunk_id").alias("c2"),
                    F.col("n").alias("nrm2"))
    return (
        dots.join(n1, ["doc_id", "c1"]).join(n2, ["doc_id", "c2"])
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")) * 1e6)
                    .cast("long"))
        .select("doc_id", "c1", "c2", "cos_e6")
    )


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _chunk_tokens(spark, sf_dir)
    return (
        toks.groupBy("doc_id", "chunk_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ), " ",
            ).alias("chunk_text"),
        )
    )


# ---------------------------------------------------------------------------
# cosine_cluster_chunks — per-doc single-linkage clusters + word-count filter
# ---------------------------------------------------------------------------

_CLUSTER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("cluster_idx", T.LongType()),
    T.StructField("n_chunks", T.LongType()),
    T.StructField("n_words", T.LongType()),
    T.StructField("content", T.StringType()),
])


def _components_fold(chunks_pdf: pd.DataFrame,
                     edges_pdf: pd.DataFrame,
                     labeler) -> pd.DataFrame:
    """Shared per-doc fold: label chunks via ``labeler``, aggregate clusters
    in chunk order, apply the word-count filter."""
    out = []
    cp = chunks_pdf.sort_values("chunk_id").reset_index(drop=True)
    idx_of = {int(c): k for k, c in enumerate(cp["chunk_id"])}
    labels = labeler(cp, edges_pdf, idx_of)
    cp = cp.assign(lbl=[int(cp["chunk_id"].iloc[l]) for l in labels])
    for lbl, grp in cp.groupby("lbl"):
        n_words = int(grp["n_tokens"].sum())
        if n_words < WORD_T:
            continue
        out.append((int(grp["doc_id"].iloc[0]), int(lbl), len(grp), n_words,
                    " ".join(grp["chunk_text"])))
    return pd.DataFrame(out, columns=[f.name for f in _CLUSTER_SCHEMA.fields])


def q_cosine_cluster_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CosineStrategy with linkage='single': per-doc connected components of
    the cos ≥ 0.6 chunk graph, clusters under 10 words dropped, content =
    member chunks joined in document order (reference :470-476)."""
    from crawl4ai_spark.functions.cluster import single_linkage_components

    chunks = _chunks(spark, sf_dir)
    edges = _chunk_edges(spark, sf_dir).filter(F.col("cos_e6") >= COS_T_E6)

    def labeler(cp, edges_pdf, idx_of):
        e = [(idx_of[int(a)], idx_of[int(b)])
             for a, b in zip(edges_pdf["c1"], edges_pdf["c2"])]
        return single_linkage_components(len(cp), e)

    def fold(chunks_pdf, edges_pdf):
        if chunks_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in _CLUSTER_SCHEMA.fields])
        return _components_fold(chunks_pdf, edges_pdf, labeler)

    return (
        chunks.groupBy("doc_id")
        .cogroup(edges.groupBy("doc_id"))
        .applyInPandas(fold, _CLUSTER_SCHEMA)
    )


SQL_COSINE_CLUSTER_CHUNKS = f"""
WITH RECURSIVE
chunks AS ({_SQL_CHUNKS}),
cosedges AS ({_SQL_CHUNK_EDGES}),
edges AS (
  SELECT doc_id, c1 AS src, c2 AS dst FROM cosedges WHERE cos_e6 >= {COS_T_E6}
  UNION ALL
  SELECT doc_id, c2, c1 FROM cosedges WHERE cos_e6 >= {COS_T_E6}
),
reach(doc_id, node, lbl) AS (
  SELECT doc_id, chunk_id, chunk_id FROM chunks
  UNION
  SELECT e.doc_id, e.dst, r.lbl
  FROM reach r JOIN edges e ON e.doc_id = r.doc_id AND e.src = r.node
),
lab AS (
  SELECT doc_id, node AS chunk_id, min(lbl) AS cluster_idx
  FROM reach GROUP BY 1, 2
)
SELECT c.doc_id,
       CAST(l.cluster_idx AS BIGINT) AS cluster_idx,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(c.n_tokens) AS BIGINT) AS n_words,
       string_agg(c.chunk_text, ' ' ORDER BY c.chunk_id) AS content
FROM chunks c JOIN lab l ON l.doc_id = c.doc_id AND l.chunk_id = c.chunk_id
GROUP BY 1, 2
HAVING CAST(sum(c.n_tokens) AS BIGINT) >= {WORD_T}
"""


# ---------------------------------------------------------------------------
# cosine_cluster_ward — the reference's default linkage, Arrow stage
# ---------------------------------------------------------------------------

def q_cosine_cluster_ward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CosineStrategy default path (linkage='ward', fcluster by distance):
    Lance-Williams agglomerative per doc inside one applyInPandas stage.
    Rows-only for the driver (merge recursion is not ANSI-SQL-expressible);
    tests/test_clusterq.py checks it against an independent naive
    implementation and against the single-linkage component invariant."""
    import numpy as np

    from crawl4ai_spark.functions.cluster import (
        cosine_distance_matrix, cut_by_distance, ward_linkage)

    chunks = _chunks(spark, sf_dir)
    el = _chunk_elements(spark, _chunk_tokens(spark, sf_dir))

    def labeler(cp, el_pdf, idx_of):
        n = len(cp)
        X = np.zeros((n, HDIM), dtype=np.float64)
        for cid, i, x in zip(el_pdf["chunk_id"], el_pdf["i"], el_pdf["x"]):
            X[idx_of[int(cid)], int(i)] = x
        merges = ward_linkage(cosine_distance_matrix(X))
        return cut_by_distance(n, merges, WARD_MAX_DIST)

    def fold(chunks_pdf, el_pdf):
        if chunks_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in _CLUSTER_SCHEMA.fields])
        return _components_fold(chunks_pdf, el_pdf, labeler)

    return (
        chunks.groupBy("doc_id")
        .cogroup(el.groupBy("doc_id"))
        .applyInPandas(fold, _CLUSTER_SCHEMA)
    )


# ---------------------------------------------------------------------------
# cosine_prefilter — filter_documents_embeddings semantics
# ---------------------------------------------------------------------------

def _query_embedding() -> list[float]:
    """Feature-hash embedding of the semantic-filter string, precomputed to
    literals (pure function of constants — identical on both engines)."""
    toks = PREFILTER_QUERY.split()
    hexd = "0123456789abcdef"
    return [
        sum(hexd.index(hashlib.md5(f"{t}_{i}".encode()).hexdigest()[0]) - 7.5
            for t in toks)
        for i in range(HDIM)
    ]


def q_cosine_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_documents_embeddings (reference :244-296): docs with sim ≥
    threshold keep corpus (doc_id) order; if fewer than at_least_k pass, the
    remainder backfills by sim rank; output capped at at_least_k. Two filter
    rows exercise both branches (thr 0.3 → cap path, 0.7 → backfill path)."""
    d = tbl(spark, sf_dir, "documents")
    qe = _query_embedding()
    qn = sum(v * v for v in qe) ** 0.5
    toks = d.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    dims = spark.range(HDIM).select(F.col("id").cast("int").alias("i"))
    w = (
        F.instr(F.lit("0123456789abcdef"),
                F.substring(F.md5(F.concat_ws("_", "tok", "i")), 1, 1))
        - F.lit(1) - F.lit(7.5)
    )
    el = (
        toks.crossJoin(F.broadcast(dims))
        .groupBy("doc_id", "i")
        .agg(F.sum(w).alias("x"))
    )
    qcol = F.element_at(F.array(*[F.lit(v) for v in qe]), F.col("i") + 1)
    per_doc = (
        el.withColumn("qx", qcol)
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("qx")).alias("dot"),
             F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("nrm") * F.lit(qn)) * 1e6)
                    .cast("long"))
        .select("doc_id", "cos_e6")
    )
    n_docs = d.count()
    k_eff = n_docs // 2 if n_docs < AT_LEAST_K else AT_LEAST_K

    filters = spark.createDataFrame(
        [(fid, thr) for fid, thr in sorted(PREFILTER_THRESHOLDS_E6.items())],
        "fid long, thr long")
    scored = per_doc.crossJoin(F.broadcast(filters)).withColumn(
        "passed", (F.col("cos_e6") >= F.col("thr")).cast("int"))
    from pyspark.sql.window import Window
    w_pass = Window.partitionBy("fid", "passed").orderBy("doc_id")
    w_fill = Window.partitionBy("fid", "passed").orderBy(
        F.desc("cos_e6"), F.asc("doc_id"))
    w_np = Window.partitionBy("fid")
    ranked = (
        scored
        .withColumn("rn_pass", F.row_number().over(w_pass))
        .withColumn("rn_fill", F.row_number().over(w_fill))
        .withColumn("n_pass", F.sum("passed").over(w_np))
        .withColumn(
            "rank",
            F.when(F.col("passed") == 1, F.col("rn_pass"))
             .otherwise(F.col("rn_fill") + F.col("n_pass")).cast("long"))
        .filter(F.col("rank") <= F.lit(k_eff))
    )
    return ranked.select(
        F.col("fid").cast("long"), "rank",
        F.col("doc_id").cast("long"), "cos_e6",
        F.col("passed").cast("long"))


def _sql_query_embedding_values() -> str:
    return ", ".join(f"({i}, {v!r})" for i, v in enumerate(_query_embedding()))


SQL_COSINE_PREFILTER = f"""
WITH qel(i, qx) AS (VALUES {{qvals}}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
el AS (
  SELECT doc_id, CAST(i AS INT) AS i,
         sum({_HEXVAL.format(c="substr(md5(tok || '_' || i), 1, 1)")} - 7.5) AS x
  FROM toks, range({HDIM}) r(i) GROUP BY 1, 2
),
qn AS (SELECT sqrt(sum(qx * qx)) AS n FROM qel),
per_doc AS (
  SELECT el.doc_id,
         CAST(ROUND(sum(el.x * q.qx)
              / (sqrt(sum(el.x * el.x)) * (SELECT n FROM qn)) * 1e6) AS BIGINT)
           AS cos_e6
  FROM el JOIN qel q ON el.i = q.i
  GROUP BY 1
),
keff AS (
  SELECT CASE WHEN count(*) < {AT_LEAST_K} THEN count(*) // 2
              ELSE {AT_LEAST_K} END AS k
  FROM documents
),
scored AS (
  SELECT f.fid, p.doc_id, p.cos_e6,
         CASE WHEN p.cos_e6 >= f.thr THEN 1 ELSE 0 END AS passed
  FROM per_doc p, (VALUES {{fvals}}) f(fid, thr)
),
ranked AS (
  SELECT fid, doc_id, cos_e6, passed,
         row_number() OVER (PARTITION BY fid, passed ORDER BY doc_id) AS rn_pass,
         row_number() OVER (PARTITION BY fid, passed
                            ORDER BY cos_e6 DESC, doc_id) AS rn_fill,
         sum(passed) OVER (PARTITION BY fid) AS n_pass
  FROM scored
)
SELECT CAST(fid AS BIGINT) AS fid,
       CAST(CASE WHEN passed = 1 THEN rn_pass ELSE rn_fill + n_pass END AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, cos_e6,
       CAST(passed AS BIGINT) AS passed
FROM ranked
WHERE (CASE WHEN passed = 1 THEN rn_pass ELSE rn_fill + n_pass END)
      <= (SELECT k FROM keff)
""".replace("{qvals}", _sql_query_embedding_values()).replace(
    "{fvals}",
    ", ".join(f"({fid}, {thr})"
              for fid, thr in sorted(PREFILTER_THRESHOLDS_E6.items())))


# ---------------------------------------------------------------------------
# cluster_embeddings — corpus-level near-dup components (embeddings table)
# ---------------------------------------------------------------------------

def q_cluster_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters over the embeddings table: connected components of
    the LSH-verified pair graph (sim_lsh_verified, cos ≥ 0.2), label = min
    vec_id. Iterative min-label propagation — each round one equi-join on
    vec id; near-dup components are shallow so rounds ≈ log(diameter).
    (At 10^10 nodes / chain-heavy graphs, use q_cluster_embeddings_bigstar
    below — large-star/small-star, O(log n) rounds, same oracle.)"""
    emb = tbl(spark, sf_dir, "embeddings")
    pairs = q_sim_lsh_verified(spark, sf_dir).select("v1", "v2")
    edges = (
        pairs.select(F.col("v1").alias("src"), F.col("v2").alias("dst"))
        .unionByName(
            pairs.select(F.col("v2").alias("src"), F.col("v1").alias("dst")))
    )
    # localCheckpoint truncates the logical plan each round — without it the
    # nested-iteration plan makes Catalyst re-analysis the dominant cost
    # (measured: round wall grows 6s → 53s by round 4 with cache() alone).
    # On a real cluster this is checkpoint-to-storage; same role.
    edges = edges.localCheckpoint(eager=True)
    labels = emb.select(F.col("vec_id").alias("node"),
                        F.col("vec_id").alias("lbl")).localCheckpoint(eager=True)
    for _ in range(30):
        nbr = (
            labels.join(edges, labels.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        nxt = (
            labels.join(nbr, "node", "left")
            .withColumn("new_lbl", F.least("lbl", F.coalesce("nbr_lbl", "lbl")))
            .localCheckpoint(eager=True)
        )
        changed = nxt.filter(F.col("new_lbl") < F.col("lbl")).count()
        labels = nxt.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    sizes = labels.groupBy("lbl").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        labels.join(sizes, "lbl")
        .select(F.col("node").cast("long").alias("vec_id"),
                F.col("lbl").cast("long").alias("cluster_id"),
                "cluster_size")
    )


SQL_CLUSTER_EMBEDDINGS = f"""
WITH RECURSIVE
verified AS ({SQL_SIM_LSH_VERIFIED}),
edges AS (
  SELECT v1 AS src, v2 AS dst FROM verified
  UNION ALL
  SELECT v2, v1 FROM verified
),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
lab AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT CAST(l.node AS BIGINT) AS vec_id,
       CAST(l.cluster_id AS BIGINT) AS cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size
FROM lab l
JOIN (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY 1) s
  ON s.cluster_id = l.cluster_id
"""


def q_cluster_embeddings_bigstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the 10^10-edge production shape q_cluster_embeddings'
    docstring points at: min-label propagation needs O(diameter) rounds,
    large/small-star converges in O(log n) with the SAME per-round shape
    (groupBy min + equi-join), so chain-heavy graphs stop being the worst
    case. Same output and same DuckDB oracle as q_cluster_embeddings;
    pytest asserts row-for-row equality between the two.

    large-star(u): m = min(N(u) ∪ {u}); for v ∈ N(u), v > u → edge (v, m)
    small-star(u): over edges keyed by their larger endpoint,
                   m = min(N(u)); for v ∈ N(u) ∪ {u}, v ≠ m → edge (v, m)
    Converged when small-star's canonical edge set stops changing; the
    remaining edges form stars (node → component root)."""
    emb = tbl(spark, sf_dir, "embeddings")
    pairs = q_sim_lsh_verified(spark, sf_dir).select("v1", "v2")
    return connected_components_bigstar(
        emb.select(F.col("vec_id").alias("node")), pairs)


def connected_components_bigstar(nodes: DataFrame, pairs: DataFrame,
                                 max_rounds: int = 30,
                                 cast_long: bool = True) -> DataFrame:
    """Core large-star/small-star loop over an arbitrary (nodes, v1/v2
    pairs) graph — unit-testable on synthetic chains where min-label
    propagation would need O(n) rounds.

    ``cast_long=False`` keeps the node/label types as given (the loop's
    least/greatest/min work on any orderable type, e.g. URL strings —
    the headq hreflang clustering path); labels are then the
    lexicographically smallest member."""
    edges = pairs.filter(F.col("v1") != F.col("v2")) \
                 .select(F.least("v1", "v2").alias("a"),
                         F.greatest("v1", "v2").alias("b")) \
                 .distinct().localCheckpoint(eager=True)
    prev_sig = None
    for _ in range(max_rounds):
        # large-star: key every edge on BOTH endpoints
        nbrs = edges.select(F.col("a").alias("u"), F.col("b").alias("v")) \
                    .unionByName(edges.select(F.col("b").alias("u"),
                                              F.col("a").alias("v")))
        mins = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least("u", "mn").alias("m"))
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.least("v", "m").alias("a"),
                    F.greatest("v", "m").alias("b"))
            .filter(F.col("a") != F.col("b")).distinct()
        )
        # small-star: key on the larger endpoint (a < b by construction)
        smins = large.groupBy(F.col("b").alias("u")) \
                     .agg(F.min("a").alias("m"))
        small = (
            large.join(smins, large.b == smins.u)
            .select(F.col("a").alias("v"), "m")
            .unionByName(smins.select(F.col("u").alias("v"), "m"))
            .filter(F.col("v") != F.col("m"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .distinct().localCheckpoint(eager=True)  # plan truncation, as above
        )
        sig = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(a, b))").alias("h")).collect()[0]
        edges = small
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    # stars: b → a is node → root; isolated nodes label themselves. The
    # min-agg keeps the result well-formed even if the 30-round cap fires
    # before a perfect fixed point (a node then still takes its smallest
    # root candidate — one row per node either way).
    labels = nodes \
                .join(edges.select(F.col("b").alias("node"),
                                   F.col("a").alias("root")), "node", "left") \
                .groupBy("node") \
                .agg(F.min(F.coalesce("root", "node")).alias("lbl"))
    sizes = labels.groupBy("lbl").agg(F.count("*").cast("long").alias("cluster_size"))
    node_c = F.col("node").cast("long") if cast_long else F.col("node")
    lbl_c = F.col("lbl").cast("long") if cast_long else F.col("lbl")
    return (
        labels.join(sizes, "lbl")
        .select(node_c.alias("vec_id"), lbl_c.alias("cluster_id"),
                "cluster_size")
    )


QUERIES = {
    "cluster_embeddings": q_cluster_embeddings,
    "cluster_embeddings_bigstar": q_cluster_embeddings_bigstar,
    "cosine_cluster_chunks": q_cosine_cluster_chunks,
    "cosine_cluster_ward": q_cosine_cluster_ward,
    "cosine_prefilter": q_cosine_prefilter,
}
ORACLES = {
    "cluster_embeddings": SQL_CLUSTER_EMBEDDINGS,
    "cluster_embeddings_bigstar": SQL_CLUSTER_EMBEDDINGS,
    "cosine_cluster_chunks": SQL_COSINE_CLUSTER_CHUNKS,
    "cosine_prefilter": SQL_COSINE_PREFILTER,
}
