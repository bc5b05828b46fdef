"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the LSH (random
hyperplane) bucketing and IVF (coarse centroid) assignment are the scale
paths — at 10^9 vectors only vectors sharing a bucket/cell ever meet, so the
shuffle key is the bucket id, never a vector pair.

Two implementations of the dot product:
- oracle-parity queries use posexplode + join-on-position + quantized sums
  (expressible identically in DuckDB);
- ``ann_topk_pandas`` is the production fast path — a ``mapInPandas`` stage
  with the (small) query matrix broadcast, doing the whole top-k with numpy
  matrix multiply per Arrow batch. tests assert it matches the exploded plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import tbl

DIM = 64
N_QUERIES = 5       # query set = vec_id < 5
N_PLANES = 8        # LSH hyperplanes
N_CENTROIDS = 8     # IVF coarse cells (centroids = vec_id < 8)


def _elements(df: DataFrame, id_out: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_out),
        F.posexplode(F.col("embedding")).alias("pos", "x"),
    ).withColumn("x", F.col("x").cast("double"))


def _norms(df: DataFrame, id_out: str) -> DataFrame:
    return (
        _elements(df, id_out)
        .groupBy(id_out)
        .agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
    )


_SQL_ELEMS = """
  SELECT vec_id, CAST(i AS INT) AS pos, CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS x
  FROM embeddings, range({dim}) r(i)
"""
_SQL_NORMS = f"""
  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM ({_SQL_ELEMS.format(dim=DIM)}) GROUP BY vec_id
"""


def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query vector (queries = vec_id < 5)."""
    emb = tbl(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    qe = _elements(q, "qid").withColumnRenamed("x", "qx")
    te = _elements(emb, "tid").withColumnRenamed("x", "tx")
    dots = (
        qe.join(te, "pos")
        .groupBy("qid", "tid")
        .agg(F.sum(F.col("qx") * F.col("tx")).alias("dot"))
    )
    qn = _norms(q, "qid").withColumnRenamed("nrm", "qn")
    tn = _norms(emb, "tid").withColumnRenamed("nrm", "tn")
    cos = (
        dots.join(qn, "qid").join(tn, "tid")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("qn") * F.col("tn")) * 1e6).cast("long"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"), F.asc("tid"))
    return (
        cos.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"), "cos_e6", "rk")
    )


SQL_SIM_COSINE_TOPK = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
dots AS (
  SELECT q.vec_id AS qid, t.vec_id AS tid, sum(q.x * t.x) AS dot
  FROM el q JOIN el t ON q.pos = t.pos
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY 1, 2
),
cos AS (
  SELECT d.qid, d.tid,
         CAST(ROUND(d.dot / (nq.nrm * nt.nrm) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d JOIN norms nq ON d.qid = nq.vec_id JOIN norms nt ON d.tid = nt.vec_id
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(tid AS BIGINT) AS tid, cos_e6, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, tid ASC) AS BIGINT) AS rk
  FROM cos
) WHERE rk <= 10
"""


def q_sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: 8 signed projections → 8-bit bucket id.
    Hyperplane weights derive from md5 hex digits (deterministic, identical
    in both engines): w(j,i) = hexval(md5('hp{j}_{i}')[0]) - 7.5."""
    emb = tbl(spark, sf_dir, "embeddings")
    el = _elements(emb, "vid")
    planes = (
        spark.range(0, N_PLANES).select(F.col("id").alias("j"))
        .crossJoin(spark.range(0, DIM).select(F.col("id").alias("pos")))
        .withColumn(
            "w",
            F.instr(F.lit("0123456789abcdef"),
                    F.substring(F.md5(F.concat_ws("_", F.concat(F.lit("hp"), F.col("j")), F.col("pos"))), 1, 1))
            - F.lit(1) - F.lit(7.5),
        )
    )
    proj = (
        el.join(planes, "pos")
        .groupBy("vid", "j")
        .agg(F.round(F.sum(F.col("x") * F.col("w")) * 1e6).cast("long").alias("p_e6"))
    )
    return (
        proj.withColumn("bit", F.when(F.col("p_e6") > 0, 1).otherwise(0).cast("long"))
        .groupBy("vid")
        .agg(F.sum(F.expr("shiftleft(bit, cast(j as int))")).cast("long").alias("bucket"))
        .select(F.col("vid").cast("long").alias("vec_id"), "bucket")
    )


SQL_SIM_LSH_BUCKETS = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
planes AS (
  SELECT j.j, p.pos,
         instr('0123456789abcdef', substr(md5('hp' || j.j || '_' || p.pos), 1, 1)) - 1 - 7.5 AS w
  FROM (SELECT i AS j FROM range({N_PLANES}) t(i)) j,
       (SELECT CAST(i AS INT) AS pos FROM range({DIM}) t(i)) p
),
proj AS (
  SELECT el.vec_id AS vid, pl.j,
         CAST(ROUND(sum(el.x * pl.w) * 1e6) AS BIGINT) AS p_e6
  FROM el JOIN planes pl ON el.pos = pl.pos
  GROUP BY 1, 2
)
SELECT CAST(vid AS BIGINT) AS vec_id,
       CAST(sum((CASE WHEN p_e6 > 0 THEN 1 ELSE 0 END)::BIGINT << CAST(j AS INT)) AS BIGINT) AS bucket
FROM proj GROUP BY vid
"""


def q_sim_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs = vectors sharing an LSH bucket (the scale path:
    join key is the bucket id, pair blowup only within buckets)."""
    b = q_sim_lsh_buckets(spark, sf_dir).cache()
    a = b.alias("a")
    c = b.alias("c")
    return (
        a.join(c, (F.col("a.bucket") == F.col("c.bucket"))
               & (F.col("a.vec_id") < F.col("c.vec_id")))
        .select(F.col("a.vec_id").cast("long").alias("v1"),
                F.col("c.vec_id").cast("long").alias("v2"),
                F.col("a.bucket").alias("bucket"))
    )


SQL_SIM_LSH_CANDIDATES = f"""
WITH b AS ({SQL_SIM_LSH_BUCKETS})
SELECT CAST(a.vec_id AS BIGINT) AS v1, CAST(c.vec_id AS BIGINT) AS v2, a.bucket
FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
"""


def q_sim_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest (cosine)
    of 8 centroids (centroids = vec_id < 8). At scale: centroids broadcast,
    one pass, shuffle key = cell id."""
    emb = tbl(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS)
    ce = _elements(cent, "cid").withColumnRenamed("x", "cx")
    te = _elements(emb, "vid").withColumnRenamed("x", "tx")
    dots = (
        te.join(ce, "pos")
        .groupBy("vid", "cid")
        .agg(F.sum(F.col("tx") * F.col("cx")).alias("dot"))
    )
    cn = _norms(cent, "cid").withColumnRenamed("nrm", "cn")
    tn = _norms(emb, "vid").withColumnRenamed("nrm", "tn")
    cos = (
        dots.join(cn, "cid").join(tn, "vid")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("cn") * F.col("tn")) * 1e6).cast("long"))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cos_e6"), F.asc("cid"))
    return (
        cos.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(F.col("vid").cast("long").alias("vec_id"),
                F.col("cid").cast("long").alias("centroid_id"), "cos_e6")
    )


SQL_SIM_IVF_ASSIGN = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
dots AS (
  SELECT t.vec_id AS vid, c.vec_id AS cid, sum(t.x * c.x) AS dot
  FROM el t JOIN el c ON t.pos = c.pos
  WHERE c.vec_id < {N_CENTROIDS}
  GROUP BY 1, 2
),
cos AS (
  SELECT d.vid, d.cid,
         CAST(ROUND(d.dot / (nc.nrm * nt.nrm) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d JOIN norms nc ON d.cid = nc.vec_id JOIN norms nt ON d.vid = nt.vec_id
)
SELECT CAST(vid AS BIGINT) AS vec_id, CAST(cid AS BIGINT) AS centroid_id, cos_e6
FROM (
  SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cos_e6 DESC, cid ASC) AS rk
  FROM cos
) WHERE rk = 1
"""


# ------------------------------------------------------------------ fast path
_ANN_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType()),
    T.StructField("tid", T.LongType()),
    T.StructField("cos_e6", T.LongType()),
])


def ann_topk_pandas(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Production brute-force ANN: numpy matmul per Arrow batch with the
    query matrix broadcast, then PARTIAL TOP-K PER BATCH (np.lexsort prune
    by the exact global ordering (cos_e6 desc, tid asc)) so each batch
    yields at most n_queries × k rows. The final per-query window therefore
    ranks only n_batches × k candidates per query — not the corpus (the r01
    version shipped every (query, target) score into the global window,
    VERDICT r01 "what's wrong" #4). Identical results to q_sim_cosine_topk."""
    import numpy as np

    emb = tbl(spark, sf_dir, "embeddings")
    qrows = emb.filter(F.col("vec_id") < N_QUERIES).collect()  # tiny query set
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_nrm))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, nrm = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t = np.array(list(pdf["embedding"]), dtype=np.float64)
            tn = np.sqrt((t * t).sum(axis=1))
            tids = pdf["vec_id"].values.astype(np.int64)
            cos_e6 = np.round((mat @ t.T) / (nrm[:, None] * tn[None, :]) * 1e6
                              ).astype(np.int64)
            out_q, out_t, out_c = [], [], []
            for qi in range(len(ids)):
                # batch-local prune under the exact final ordering; keeps
                # every candidate that could survive the global window
                keep = np.lexsort((tids, -cos_e6[qi]))[:k]
                out_q.append(np.full(len(keep), ids[qi], dtype=np.int64))
                out_t.append(tids[keep])
                out_c.append(cos_e6[qi][keep])
            yield pd.DataFrame({
                "qid": np.concatenate(out_q),
                "tid": np.concatenate(out_t),
                "cos_e6": np.concatenate(out_c),
            })

    scored = emb.select("vec_id", "embedding").mapInPandas(score, _ANN_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"), F.asc("tid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


def q_sim_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, the scale path end-to-end: LSH bucket candidates
    → exact cosine verification on candidates only (never all pairs)."""
    emb = tbl(spark, sf_dir, "embeddings")
    cand = q_sim_lsh_candidates(spark, sf_dir).select("v1", "v2")
    e1 = _elements(emb, "v1").withColumnRenamed("x", "x1")
    e2 = _elements(emb, "v2").withColumnRenamed("x", "x2")
    dots = (
        cand.join(e1, "v1").join(e2, ["v2", "pos"])
        .groupBy("v1", "v2")
        .agg(F.sum(F.col("x1") * F.col("x2")).alias("dot"))
    )
    n1 = _norms(emb, "v1").withColumnRenamed("nrm", "nrm1")
    n2 = _norms(emb, "v2").withColumnRenamed("nrm", "nrm2")
    return (
        dots.join(n1, "v1").join(n2, "v2")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")) * 1e6).cast("long"))
        .filter(F.col("cos_e6") >= 200_000)
        .select(F.col("v1").cast("long"), F.col("v2").cast("long"), "cos_e6")
    )


SQL_SIM_LSH_VERIFIED = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
b AS ({SQL_SIM_LSH_BUCKETS}),
cand AS (
  SELECT a.vec_id AS v1, c.vec_id AS v2
  FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
),
dots AS (
  SELECT cand.v1, cand.v2, sum(e1.x * e2.x) AS dot
  FROM cand JOIN el e1 ON e1.vec_id = cand.v1
            JOIN el e2 ON e2.vec_id = cand.v2 AND e2.pos = e1.pos
  GROUP BY cand.v1, cand.v2
)
SELECT CAST(d.v1 AS BIGINT) AS v1, CAST(d.v2 AS BIGINT) AS v2,
       CAST(ROUND(d.dot / (n1.nrm * n2.nrm) * 1e6) AS BIGINT) AS cos_e6
FROM dots d JOIN norms n1 ON n1.vec_id = d.v1 JOIN norms n2 ON n2.vec_id = d.v2
WHERE CAST(ROUND(d.dot / (n1.nrm * n2.nrm) * 1e6) AS BIGINT) >= 200000
"""


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage IVF search: queries (vec_id < 5) probe ONLY their own coarse
    cell — the candidate set is the cell, not the corpus. Top-5 per query."""
    assign = q_sim_ivf_assign(spark, sf_dir).select("vec_id", "centroid_id").cache()
    emb = tbl(spark, sf_dir, "embeddings")
    q_assign = assign.filter(F.col("vec_id") < N_QUERIES) \
                     .select(F.col("vec_id").alias("qid"), "centroid_id")
    t_assign = assign.select(F.col("vec_id").alias("tid"), "centroid_id")
    cand = q_assign.join(t_assign, "centroid_id")
    qe = _elements(emb.filter(F.col("vec_id") < N_QUERIES), "qid").withColumnRenamed("x", "qx")
    te = _elements(emb, "tid").withColumnRenamed("x", "tx")
    dots = (
        cand.join(qe, "qid").join(te, ["tid", "pos"])
        .groupBy("qid", "tid", "centroid_id")
        .agg(F.sum(F.col("qx") * F.col("tx")).alias("dot"))
    )
    qn = _norms(emb, "qid").withColumnRenamed("nrm", "qn")
    tn = _norms(emb, "tid").withColumnRenamed("nrm", "tn")
    cos = (
        dots.join(qn, "qid").join(tn, "tid")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("qn") * F.col("tn")) * 1e6).cast("long"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"), F.asc("tid"))
    return (
        cos.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"),
                F.col("centroid_id").cast("long"), "cos_e6", "rk")
    )


SQL_SIM_IVF_TOPK = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
assign AS ({SQL_SIM_IVF_ASSIGN.replace('cos_e6', 'acos_e6')}),
cand AS (
  SELECT q.vec_id AS qid, t.vec_id AS tid, q.centroid_id
  FROM assign q JOIN assign t ON q.centroid_id = t.centroid_id
  WHERE q.vec_id < {N_QUERIES}
),
dots AS (
  SELECT cand.qid, cand.tid, cand.centroid_id, sum(e1.x * e2.x) AS dot
  FROM cand JOIN el e1 ON e1.vec_id = cand.qid
            JOIN el e2 ON e2.vec_id = cand.tid AND e2.pos = e1.pos
  GROUP BY cand.qid, cand.tid, cand.centroid_id
),
cos AS (
  SELECT d.qid, d.tid, d.centroid_id,
         CAST(ROUND(d.dot / (nq.nrm * nt.nrm) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nt ON nt.vec_id = d.tid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(tid AS BIGINT) AS tid,
       CAST(centroid_id AS BIGINT) AS centroid_id, cos_e6, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, tid ASC) AS BIGINT) AS rk
  FROM cos
) WHERE rk <= 5
"""


def q_sim_ivf_topk_mprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF (r3): queries probe their TOP-2 coarse cells instead
    of one — the standard recall fix for query vectors near a cell boundary
    (FAISS nprobe semantics). Targets keep their rk=1 assignment; the
    candidate set is the union of the probed cells, deduped per (q, t)
    before exact scoring. Same plan shape as single-probe: centroid scoring
    broadcasts, candidates shuffle on cell id, exact cosine runs on
    candidates only."""
    emb = tbl(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS)
    ce = _elements(cent, "cid").withColumnRenamed("x", "cx")
    te = _elements(emb, "vid").withColumnRenamed("x", "tx")
    dots0 = (
        te.join(ce, "pos")
        .groupBy("vid", "cid")
        .agg(F.sum(F.col("tx") * F.col("cx")).alias("dot"))
    )
    cn = _norms(cent, "cid").withColumnRenamed("nrm", "cn")
    vn = _norms(emb, "vid").withColumnRenamed("nrm", "vn")
    cells = (
        dots0.join(cn, "cid").join(vn, "vid")
        .withColumn("acos_e6",
                    F.round(F.col("dot") / (F.col("cn") * F.col("vn")) * 1e6)
                    .cast("long"))
    )
    w0 = Window.partitionBy("vid").orderBy(F.desc("acos_e6"), F.asc("cid"))
    ranked = cells.withColumn("crk", F.row_number().over(w0)).cache()
    probes = ranked.filter((F.col("vid") < N_QUERIES) & (F.col("crk") <= 2)) \
                   .select(F.col("vid").alias("qid"), F.col("cid"))
    t_assign = ranked.filter(F.col("crk") == 1) \
                     .select(F.col("vid").alias("tid"), F.col("cid"))
    cand = probes.join(t_assign, "cid").select("qid", "tid").distinct()

    qe = _elements(emb.filter(F.col("vec_id") < N_QUERIES), "qid") \
        .withColumnRenamed("x", "qx")
    te2 = _elements(emb, "tid").withColumnRenamed("x", "tx")
    dots = (
        cand.join(qe, "qid").join(te2, ["tid", "pos"])
        .groupBy("qid", "tid")
        .agg(F.sum(F.col("qx") * F.col("tx")).alias("dot"))
    )
    qn = _norms(emb, "qid").withColumnRenamed("nrm", "qn")
    tn = _norms(emb, "tid").withColumnRenamed("nrm", "tn")
    cos = (
        dots.join(qn, "qid").join(tn, "tid")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("qn") * F.col("tn")) * 1e6)
                    .cast("long"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"), F.asc("tid"))
    return (
        cos.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"),
                "cos_e6", "rk")
    )


SQL_SIM_IVF_TOPK_MPROBE = f"""
WITH el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
cdots AS (
  SELECT t.vec_id AS vid, c.vec_id AS cid, sum(t.x * c.x) AS dot
  FROM el t JOIN el c ON t.pos = c.pos
  WHERE c.vec_id < {N_CENTROIDS}
  GROUP BY 1, 2
),
cells AS (
  SELECT d.vid, d.cid,
         CAST(ROUND(d.dot / (nc.nrm * nv.nrm) * 1e6) AS BIGINT) AS acos_e6
  FROM cdots d JOIN norms nc ON nc.vec_id = d.cid
               JOIN norms nv ON nv.vec_id = d.vid
),
ranked AS (
  SELECT vid, cid,
         row_number() OVER (PARTITION BY vid ORDER BY acos_e6 DESC, cid ASC) AS crk
  FROM cells
),
cand AS (
  SELECT DISTINCT q.vid AS qid, t.vid AS tid
  FROM ranked q JOIN ranked t ON q.cid = t.cid AND t.crk = 1
  WHERE q.vid < {N_QUERIES} AND q.crk <= 2
),
dots AS (
  SELECT cand.qid, cand.tid, sum(e1.x * e2.x) AS dot
  FROM cand JOIN el e1 ON e1.vec_id = cand.qid
            JOIN el e2 ON e2.vec_id = cand.tid AND e2.pos = e1.pos
  GROUP BY cand.qid, cand.tid
),
cos AS (
  SELECT d.qid, d.tid,
         CAST(ROUND(d.dot / (nq.nrm * nt.nrm) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid
              JOIN norms nt ON nt.vec_id = d.tid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(tid AS BIGINT) AS tid, cos_e6, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, tid ASC) AS BIGINT) AS rk
  FROM cos
) WHERE rk <= 5
"""


# ------------------------------------------------------------ PQ (r3)
# Product quantization: DIM=64 splits into M=4 subspaces of 16 dims; the
# per-subspace codebook is the first N_CODES vectors' subvectors (the same
# deterministic-codebook trick as IVF centroids = vec_id < 8). Assignment
# is argmin squared L2 per subspace; search is asymmetric distance
# computation (ADC): a per-query lookup table of partial distances to each
# codeword, summed over the target's M codes. Partial distances quantize
# to e6 BEFORE the cross-subspace sum so both engines add exact integers.
# Scale shape: codebook and LUT are tiny broadcasts; each vector carries M
# small codes (64 floats → 4 bytes, the whole point of PQ); the only
# shuffle is the final top-k.
PQ_M = 4
PQ_SUBDIM = DIM // PQ_M
N_CODES = 8


def _pq_elements(df: DataFrame, id_out: str, x_out: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_out),
        F.posexplode(F.col("embedding")).alias("pos", x_out),
    ).select(
        id_out,
        (F.col("pos") / PQ_SUBDIM).cast("int").alias("m"),
        F.pmod(F.col("pos"), F.lit(PQ_SUBDIM)).alias("sp"),
        F.col(x_out).cast("double").alias(x_out),
    )


def _pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    cw = _pq_elements(emb.filter(F.col("vec_id") < N_CODES), "code", "cx")
    ve = _pq_elements(emb, "vid", "vx")
    d2 = (
        ve.join(F.broadcast(cw), ["m", "sp"])
        .groupBy("vid", "m", "code")
        .agg(F.round(F.sum(F.pow(F.col("vx") - F.col("cx"), 2)) * 1e6)
             .cast("long").alias("d2_e6"))
    )
    w = Window.partitionBy("vid", "m").orderBy(F.asc("d2_e6"), F.asc("code"))
    return d2.withColumn("crk", F.row_number().over(w)) \
             .filter(F.col("crk") == 1).select("vid", "m", "code", "d2_e6")


def q_sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding: every vector compresses to M=4 subspace code ids."""
    return _pq_codes(spark, sf_dir).select(
        F.col("vid").cast("long").alias("vec_id"),
        F.col("m").cast("long").alias("m"),
        F.col("code").cast("long").alias("code"), "d2_e6")


def q_sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ search via ADC: per-query LUT of partial distances to every
    (subspace, codeword), summed over each target's codes; top-5 nearest
    per query (approx distance ASC, tid ASC)."""
    emb = tbl(spark, sf_dir, "embeddings")
    codes = _pq_codes(spark, sf_dir).select(
        F.col("vid").alias("tid"), "m", "code")
    cw = _pq_elements(emb.filter(F.col("vec_id") < N_CODES), "code", "cx")
    qe = _pq_elements(emb.filter(F.col("vec_id") < N_QUERIES), "qid", "qx")
    lut = (
        qe.join(F.broadcast(cw), ["m", "sp"])
        .groupBy("qid", "m", "code")
        .agg(F.round(F.sum(F.pow(F.col("qx") - F.col("cx"), 2)) * 1e6)
             .cast("long").alias("pd_e6"))
    )
    dist = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("qid", "tid")
        .agg(F.sum("pd_e6").alias("adist_e6"))
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adist_e6"), F.asc("tid"))
    return (
        dist.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"),
                F.col("adist_e6").cast("long").alias("adist_e6"), "rk")
    )


_SQL_PQ_ELEMS = f"""
  SELECT vec_id, CAST(i // {PQ_SUBDIM} AS INT) AS m, i % {PQ_SUBDIM} AS sp,
         CAST(embedding[CAST(i + 1 AS INT)] AS DOUBLE) AS x
  FROM embeddings, range({DIM}) r(i)
"""

_SQL_PQ_CODES = f"""
  SELECT vid, m, code, d2_e6 FROM (
    SELECT v.vec_id AS vid, v.m, c.vec_id AS code,
           CAST(ROUND(sum((v.x - c.x) * (v.x - c.x)) * 1e6) AS BIGINT) AS d2_e6,
           row_number() OVER (
             PARTITION BY v.vec_id, v.m
             ORDER BY CAST(ROUND(sum((v.x - c.x) * (v.x - c.x)) * 1e6) AS BIGINT) ASC,
                      c.vec_id ASC) AS crk
    FROM pe v JOIN pe c ON v.m = c.m AND v.sp = c.sp AND c.vec_id < {N_CODES}
    GROUP BY v.vec_id, v.m, c.vec_id
  ) WHERE crk = 1
"""

SQL_SIM_PQ_CODES = f"""
WITH pe AS ({_SQL_PQ_ELEMS})
SELECT CAST(vid AS BIGINT) AS vec_id, CAST(m AS BIGINT) AS m,
       CAST(code AS BIGINT) AS code, d2_e6
FROM ({_SQL_PQ_CODES})
"""

SQL_SIM_PQ_ADC_TOPK = f"""
WITH pe AS ({_SQL_PQ_ELEMS}),
codes AS ({_SQL_PQ_CODES}),
lut AS (
  SELECT q.vec_id AS qid, q.m, c.vec_id AS code,
         CAST(ROUND(sum((q.x - c.x) * (q.x - c.x)) * 1e6) AS BIGINT) AS pd_e6
  FROM pe q JOIN pe c ON q.m = c.m AND q.sp = c.sp AND c.vec_id < {N_CODES}
  WHERE q.vec_id < {N_QUERIES}
  GROUP BY q.vec_id, q.m, c.vec_id
),
dist AS (
  SELECT lut.qid, codes.vid AS tid, SUM(lut.pd_e6) AS adist_e6
  FROM codes JOIN lut ON codes.m = lut.m AND codes.code = lut.code
  GROUP BY lut.qid, codes.vid
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(tid AS BIGINT) AS tid,
       CAST(adist_e6 AS BIGINT) AS adist_e6, rk
FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY adist_e6 ASC, tid ASC) AS BIGINT) AS rk
  FROM dist
) WHERE rk <= 5
"""


# ---------------------------------------------------- Arrow fast paths (r4)
# The element-exploded mprobe/ADC forms above are oracle-exact and have the
# right JOIN shape, but they inflate every vector into 64 rows through two
# shuffles (VERDICT r03 "what's wrong" #3). These are the production
# variants — the mh2 discipline applied to ANN: everything small (centroids,
# queries, per-query LUT) broadcasts into ONE mapInPandas numpy scorer with
# batch-local top-k pruning, so the only post-scan movement is the final
# window over n_batches × k rows. Same names on the driver surface, same
# oracles; the exploded forms stay registered as `_exploded` pytest-parity
# variants, and tests assert fast == exploded row-for-row.

def _round_half_away(x):
    """F.round / DuckDB ROUND semantics (half away from zero) — np.round is
    banker's rounding; a .5 divergence here would flip a code assignment and
    cascade, so the fast paths must match the oracles' rounding exactly."""
    import numpy as np
    return np.copysign(np.floor(np.abs(x) + 0.5), x).astype(np.int64)


def q_sim_ivf_topk_mprobe_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF, production path: centroids (8×64) and queries (5×64
    + their top-2 probe cells, computed driver-side) broadcast; one Arrow
    stage assigns each target its rk=1 cell with numpy and exact-scores it
    against exactly the queries probing that cell, pruning to top-5 per
    query per batch. Identical output to q_sim_ivf_topk_mprobe."""
    import numpy as np

    emb = tbl(spark, sf_dir, "embeddings")
    head = emb.filter(F.col("vec_id") < max(N_CENTROIDS, N_QUERIES)).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in head}
    c_mat = np.stack([vecs[i] for i in range(N_CENTROIDS)])        # (8, 64)
    c_nrm = np.sqrt((c_mat * c_mat).sum(axis=1))
    q_ids = np.arange(N_QUERIES, dtype=np.int64)
    q_mat = np.stack([vecs[i] for i in range(N_QUERIES)])          # (5, 64)
    q_nrm = np.sqrt((q_mat * q_mat).sum(axis=1))
    # per-query probe set: top-2 cells by (acos_e6 desc, cid asc)
    q_acos = _round_half_away((q_mat @ c_mat.T)
                              / (q_nrm[:, None] * c_nrm[None, :]) * 1e6)
    probes = np.stack([np.lexsort((np.arange(N_CENTROIDS), -q_acos[qi]))[:2]
                       for qi in range(N_QUERIES)])                # (5, 2)
    bq = spark.sparkContext.broadcast((c_mat, c_nrm, q_ids, q_mat, q_nrm, probes))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        c_mat, c_nrm, q_ids, q_mat, q_nrm, probes = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t = np.array(list(pdf["embedding"]), dtype=np.float64)
            tids = pdf["vec_id"].values.astype(np.int64)
            tn = np.sqrt((t * t).sum(axis=1))
            # rk=1 cell per target: max acos_e6, ties to smallest cid
            # (argmax returns the first max — exactly the asc-cid tie-break)
            acos = _round_half_away((t @ c_mat.T)
                                    / (tn[:, None] * c_nrm[None, :]) * 1e6)
            cell = acos.argmax(axis=1)
            cos_e6 = _round_half_away((q_mat @ t.T)
                                      / (q_nrm[:, None] * tn[None, :]) * 1e6)
            out_q, out_t, out_c = [], [], []
            for qi in range(len(q_ids)):
                mask = np.isin(cell, probes[qi])
                if not mask.any():
                    continue
                cand_t, cand_c = tids[mask], cos_e6[qi][mask]
                keep = np.lexsort((cand_t, -cand_c))[:5]
                out_q.append(np.full(len(keep), q_ids[qi], dtype=np.int64))
                out_t.append(cand_t[keep])
                out_c.append(cand_c[keep])
            if not out_q:
                continue
            yield pd.DataFrame({"qid": np.concatenate(out_q),
                                "tid": np.concatenate(out_t),
                                "cos_e6": np.concatenate(out_c)})

    scored = emb.select("vec_id", "embedding").mapInPandas(score, _ANN_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("cos_e6"), F.asc("tid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"),
                "cos_e6", "rk")
    )


_ADC_SCHEMA = T.StructType([
    T.StructField("qid", T.LongType()),
    T.StructField("tid", T.LongType()),
    T.StructField("adist_e6", T.LongType()),
])


def q_sim_pq_adc_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC search, production path: the codebook (4 subspaces × 8 codes
    × 16 dims) and the per-query partial-distance LUT (5×4×8 int64, built
    driver-side) broadcast; one Arrow stage PQ-encodes each target batch
    with numpy (argmin over quantized d2, ties to smallest code — matching
    the exploded window's order) and sums exact int64 LUT entries, pruning
    to top-5 per query per batch. Identical output to q_sim_pq_adc_topk —
    this is the FAISS IndexPQ search shape without the 64× row inflation."""
    import numpy as np

    emb = tbl(spark, sf_dir, "embeddings")
    head = emb.filter(F.col("vec_id") < max(N_CODES, N_QUERIES)).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in head}
    # codebook[m, c, :] = subvector m of vector c
    cb = np.stack([np.stack([vecs[c][m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
                             for c in range(N_CODES)])
                   for m in range(PQ_M)])                          # (4, 8, 16)
    q_sub = np.stack([np.stack([vecs[q][m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
                                for m in range(PQ_M)])
                      for q in range(N_QUERIES)])                  # (5, 4, 16)
    # LUT[q, m, c] = round(||q_sub - codeword||^2 * 1e6): exact ints summed
    # across subspaces, same quantize-before-sum rule as the oracle
    lut = _round_half_away(
        ((q_sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3) * 1e6)
    bq = spark.sparkContext.broadcast((cb, lut))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        cb, lut = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            t = np.array(list(pdf["embedding"]), dtype=np.float64)
            tids = pdf["vec_id"].values.astype(np.int64)
            n = len(tids)
            t_sub = t.reshape(n, PQ_M, PQ_SUBDIM)
            # encode: d2_e6[n, m, c] quantized BEFORE argmin; argmin's
            # first-minimum rule == the exploded window's asc-code tie-break
            d2 = _round_half_away(
                ((t_sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3) * 1e6)
            codes = d2.argmin(axis=2)                              # (n, 4)
            # adist[q, n] = sum_m LUT[q, m, codes[n, m]]
            adist = lut[:, np.arange(PQ_M)[None, :], codes].sum(axis=2)
            out_q, out_t, out_d = [], [], []
            for qi in range(lut.shape[0]):
                keep = np.lexsort((tids, adist[qi]))[:5]
                out_q.append(np.full(len(keep), qi, dtype=np.int64))
                out_t.append(tids[keep])
                out_d.append(adist[qi][keep])
            yield pd.DataFrame({"qid": np.concatenate(out_q),
                                "tid": np.concatenate(out_t),
                                "adist_e6": np.concatenate(out_d)})

    scored = emb.select("vec_id", "embedding").mapInPandas(score, _ADC_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.asc("adist_e6"), F.asc("tid"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(F.col("qid").cast("long"), F.col("tid").cast("long"),
                F.col("adist_e6").cast("long").alias("adist_e6"), "rk")
    )


# ---------------------------------------------------------------------------
# k-means training (r4): the IVF "train" step the assign/search family
# presumes. Distributed Lloyd iterations in the treeAggregate shape —
# centroids broadcast into ONE Arrow stage per round that emits per-batch
# partial (count, sum-vector) rows, folded by a K-row native aggregate; the
# per-vector data is never shuffled. All arithmetic is integer e6
# (inputs quantized once; new centroid = sum div count, truncating — both
# engines truncate toward zero), so the DuckDB oracle (Lloyd unrolled
# KMEANS_ITERS times as CTEs) is exact, not approximate. Init = the first
# K vectors by vec_id; ties in assignment break to the smaller centroid
# id; an emptied cluster keeps its previous centroid.
# ---------------------------------------------------------------------------

KMEANS_ITERS = 3

_KMEANS_PARTIAL_SCHEMA = T.StructType([
    T.StructField("cid", T.LongType()),
    T.StructField("n", T.LongType()),
    T.StructField("s", T.ArrayType(T.LongType())),
])


def _trunc_div(s, n):
    """Truncate-toward-zero integer division (numpy int64), matching
    Spark's `div` and DuckDB's `//` (both -7/2 -> -3; python // floors)."""
    import numpy as np
    return np.sign(s) * (np.abs(s) // n)


def q_sim_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embeddings (K = N_CENTROIDS, KMEANS_ITERS
    rounds). Returns one row per (centroid_id, pos): the trained centroid
    coordinates in e6 plus the final member count. Scale shape per round:
    centroids (K x DIM ints) broadcast into a mapInPandas scorer that emits
    K partial-sum rows per Arrow batch; the only shuffle is the K-row fold
    (groupBy cid over <= K x n_partitions rows) — vectors themselves never
    move, which is the property that survives 10^9 rows."""
    import numpy as np

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(round(v * 1e6) as bigint))")
        .alias("xe"))
    # init: first K by vec_id — K x DIM ints, a bounded collect by design
    init = emb.filter(F.col("vec_id") < N_CENTROIDS) \
              .orderBy("vec_id").collect()
    cents = np.array([r.xe for r in init], dtype=np.int64)

    members = None
    for _ in range(KMEANS_ITERS):
        c_bc = cents.copy()

        def partials(batches: Iterator[pd.DataFrame],
                     _c=c_bc) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                x = np.array(pdf["xe"].tolist(), dtype=np.int64)
                # argmin squared L2; ties -> smallest cid (np.argmin takes
                # the first max/min, and cids are in index order)
                d = ((x[:, None, :] - _c[None, :, :]) ** 2).sum(axis=2)
                a = d.argmin(axis=1)
                rows = [(int(c), int((a == c).sum()),
                         x[a == c].sum(axis=0).tolist())
                        for c in range(len(_c)) if (a == c).any()]
                yield pd.DataFrame(rows, columns=["cid", "n", "s"])

        folded = (
            emb.mapInPandas(partials, _KMEANS_PARTIAL_SCHEMA)
            .groupBy("cid")
            .agg(F.sum("n").alias("n"),
                 F.array(*[F.sum(F.element_at("s", i + 1))
                           for i in range(DIM)]).alias("s"))
            .collect()  # <= K rows
        )
        members = {r.cid: r.n for r in folded}
        new = cents.copy()  # emptied cluster keeps its previous centroid
        for r in folded:
            new[r.cid] = _trunc_div(np.array(r.s, dtype=np.int64), r.n)
        cents = new

    out = [(int(c), int(p), int(cents[c, p]), int(members.get(c, 0)))
           for c in range(N_CENTROIDS) for p in range(DIM)]
    return spark.createDataFrame(
        out, "centroid_id long, pos long, val_e6 long, n_members long")


def _sql_kmeans_round(prev: str, cur: str, a: str) -> str:
    """One unrolled Lloyd round: assignment CTE `a` against centroids
    `prev`, then centroid update CTE `cur` (sum // count, truncating;
    emptied cluster keeps prev)."""
    return f"""
{a} AS (
  SELECT vid, cid FROM (
    SELECT vid, cid,
           row_number() OVER (PARTITION BY vid ORDER BY dist ASC, cid ASC) AS rk
    FROM (
      SELECT x.vec_id AS vid, c.cid,
             sum((x.v - c.v) * (x.v - c.v)) AS dist
      FROM xe x JOIN {prev} c USING (pos)
      GROUP BY x.vec_id, c.cid
    )
  ) WHERE rk = 1
),
{cur} AS (
  SELECT p.cid, p.pos,
         CASE WHEN agg.n IS NULL THEN p.v ELSE agg.sv // agg.n END AS v
  FROM {prev} p
  LEFT JOIN (
    SELECT a.cid, x.pos, sum(x.v) AS sv, count(*) AS n
    FROM {a} a JOIN xe x ON x.vec_id = a.vid
    GROUP BY a.cid, x.pos
  ) agg ON agg.cid = p.cid AND agg.pos = p.pos
)"""


SQL_SIM_KMEANS_TRAIN = f"""
WITH xe AS (
  SELECT vec_id, CAST(i AS INT) AS pos,
         CAST(ROUND(embedding[CAST(i + 1 AS INT)] * 1e6) AS BIGINT) AS v
  FROM embeddings, range({DIM}) r(i)
),
c0 AS (
  SELECT vec_id AS cid, pos, v FROM xe WHERE vec_id < {N_CENTROIDS}
),{",".join(_sql_kmeans_round(f"c{i}", f"c{i + 1}", f"a{i + 1}")
            for i in range(KMEANS_ITERS))}
SELECT c.cid AS centroid_id, CAST(c.pos AS BIGINT) AS pos,
       CAST(c.v AS BIGINT) AS val_e6,
       CAST(COALESCE(m.n, 0) AS BIGINT) AS n_members
FROM c{KMEANS_ITERS} c
LEFT JOIN (SELECT cid, count(*) AS n FROM a{KMEANS_ITERS} GROUP BY cid) m
  USING (cid)
"""


_ASSIGN_TRAINED_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("centroid_id", T.LongType()),
    T.StructField("dist", T.LongType()),
])


def q_sim_ivf_assign_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train→index composition: every vector assigned to its nearest
    TRAINED centroid (q_sim_kmeans_train output, not the raw first-K init
    that `sim_ivf_assign` uses), squared-L2 in exact e6 integers. Scale
    shape: the trained codebook is K x DIM ints — collected once (bounded
    by construction) and broadcast into a single Arrow argmin pass; shuffle
    key downstream is the cell id, same as `sim_ivf_assign`."""
    import numpy as np

    trained = q_sim_kmeans_train(spark, sf_dir).collect()
    cents = np.zeros((N_CENTROIDS, DIM), dtype=np.int64)
    for r in trained:
        cents[r.centroid_id, r.pos] = r.val_e6

    emb = tbl(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, v -> cast(round(v * 1e6) as bigint))")
        .alias("xe"))

    def assign(batches: Iterator[pd.DataFrame],
               _c=cents) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["xe"].tolist(), dtype=np.int64)
            d = ((x[:, None, :] - _c[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # first min = smallest cid on ties
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "centroid_id": a.astype("int64"),
                "dist": d[np.arange(len(a)), a],
            })

    return emb.mapInPandas(assign, _ASSIGN_TRAINED_SCHEMA)


SQL_SIM_IVF_ASSIGN_TRAINED = f"""
WITH trained AS ({SQL_SIM_KMEANS_TRAIN}),
xe2 AS (
  SELECT vec_id, CAST(i AS INT) AS pos,
         CAST(ROUND(embedding[CAST(i + 1 AS INT)] * 1e6) AS BIGINT) AS v
  FROM embeddings, range({DIM}) r(i)
)
SELECT vec_id, centroid_id, dist FROM (
  SELECT x.vec_id, t.centroid_id,
         sum((x.v - t.val_e6) * (x.v - t.val_e6)) AS dist,
         row_number() OVER (
           PARTITION BY x.vec_id
           ORDER BY sum((x.v - t.val_e6) * (x.v - t.val_e6)) ASC,
                    t.centroid_id ASC) AS rk
  FROM xe2 x JOIN trained t ON x.pos = t.pos
  GROUP BY x.vec_id, t.centroid_id
) WHERE rk = 1
"""


# ---------------------------------------------------------------------------
# Semantic dedup (r4): SemDeDup (Abbas et al. 2023) — pairwise cosine is
# computed ONLY within a k-means cluster (the paper's core trick: cluster
# first so the quadratic step is bounded by cell size, never corpus
# size), and within each pair the higher vec_id is dropped when
# cos >= SEMDEDUP_T_E6. Composes the r4 trainer: cells come from
# q_sim_ivf_assign_trained (Lloyd centroids), the pair join is keyed on
# centroid_id then (v1, v2) — the bucketed-candidates discipline every
# dedup path in this repo follows. Threshold 0.35: the synthetic
# embeddings carry no engineered near-identical pairs (measured max
# within-cell cos 0.51 at sf0.01), so the paper's ~0.95 eps would be
# degenerate here; the operator takes the threshold as a constant the
# same way LSH verification pins 0.2.
# ---------------------------------------------------------------------------

SEMDEDUP_T_E6 = 350_000


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings")
    cells = q_sim_ivf_assign_trained(spark, sf_dir) \
        .select("vec_id", "centroid_id")
    a1 = cells.select(F.col("vec_id").alias("v1"), "centroid_id")
    a2 = cells.select(F.col("vec_id").alias("v2"), "centroid_id")
    cand = a1.join(a2, "centroid_id").filter(F.col("v1") < F.col("v2"))
    e1 = _elements(emb, "v1").withColumnRenamed("x", "x1")
    e2 = _elements(emb, "v2").withColumnRenamed("x", "x2")
    dots = (cand.join(e1, "v1").join(e2, ["v2", "pos"])
            .groupBy("v1", "v2")
            .agg(F.sum(F.col("x1") * F.col("x2")).alias("dot")))
    n1 = _norms(emb, "v1").withColumnRenamed("nrm", "nrm1")
    n2 = _norms(emb, "v2").withColumnRenamed("nrm", "nrm2")
    close = (
        dots.join(n1, "v1").join(n2, "v2")
        .withColumn("cos_e6",
                    F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2"))
                            * 1e6).cast("long"))
        .filter(F.col("cos_e6") >= SEMDEDUP_T_E6)
    )
    dropped = close.groupBy(F.col("v2").alias("vec_id")) \
        .agg(F.count("*").cast("long").alias("n_dups_lower"))
    return (
        cells.join(dropped, "vec_id", "left")
        .select("vec_id", "centroid_id",
                F.coalesce("n_dups_lower", F.lit(0)).alias("n_dups_lower"),
                (F.coalesce("n_dups_lower", F.lit(0)) == 0).alias("keep"))
    )


SQL_DEDUP_SEMANTIC = f"""
WITH cells AS ({SQL_SIM_IVF_ASSIGN_TRAINED}),
el AS ({_SQL_ELEMS.format(dim=DIM)}),
norms AS ({_SQL_NORMS}),
cand AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2
  FROM cells a JOIN cells b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
),
dots AS (
  SELECT cand.v1, cand.v2, sum(e1.x * e2.x) AS dot
  FROM cand JOIN el e1 ON e1.vec_id = cand.v1
            JOIN el e2 ON e2.vec_id = cand.v2 AND e2.pos = e1.pos
  GROUP BY cand.v1, cand.v2
),
close AS (
  SELECT d.v2,
         CAST(ROUND(d.dot / (n1.nrm * n2.nrm) * 1e6) AS BIGINT) AS cos_e6
  FROM dots d JOIN norms n1 ON d.v1 = n1.vec_id
              JOIN norms n2 ON d.v2 = n2.vec_id
  WHERE CAST(ROUND(d.dot / (n1.nrm * n2.nrm) * 1e6) AS BIGINT)
        >= {SEMDEDUP_T_E6}
),
dropped AS (
  SELECT v2 AS vec_id, CAST(count(*) AS BIGINT) AS n_dups_lower
  FROM close GROUP BY v2
)
SELECT c.vec_id, c.centroid_id,
       COALESCE(dr.n_dups_lower, 0) AS n_dups_lower,
       COALESCE(dr.n_dups_lower, 0) = 0 AS keep
FROM cells c LEFT JOIN dropped dr USING (vec_id)
"""


# ---------------------------------------------------------------------------
# SemDeDup production form (r5, VERDICT r4 "what's wrong #2"): the pinned-K
# exploded q_dedup_semantic above is the ORACLE-parity variant (exact
# integers, DuckDB-expressible) but ships the quadratic shape — at fixed
# K=8 the within-cell pair join is O(N^2/K). This variant implements the
# paper's actual scaling contract:
#   - K derived from N (cell size ~ SEMDEDUP_TARGET_CELL, bounded);
#   - centroids trained locally on a bounded deterministic sample
#     (stride over vec_id, <= SEMDEDUP_TRAIN_MAX vectors — the
#     faiss-on-a-subsample practice of Abbas et al. 2023);
#   - assignment = ONE broadcast-centroid Arrow argmin pass (the
#     q_sim_ivf_topk_mprobe_pandas discipline);
#   - within-cell cosine = ONE numpy gram matrix per cell via
#     applyInPandas — no element explode, no pair join;
#   - skew guard: cells larger than SEMDEDUP_MAX_CELL split by
#     vec_id % n_sub (pairs across sub-cells are skipped — the same
#     bounded approximation the paper's fixed-K clustering already makes;
#     n_sub comes from the K-row cell-size aggregate, broadcast back).
# Guarded by a from-spec numpy reimplementation in pytest (float32
# arithmetic is bit-identical driver vs executor); joins the 10x scale
# probe, which the pinned-K form could not (NOTES r4 #5).
# ---------------------------------------------------------------------------

SEMDEDUP_TARGET_CELL = 512   # K = ceil(N / this): mean cell size, bounded
SEMDEDUP_TRAIN_MAX = 65536   # centroid-training sample cap (bounded collect)
SEMDEDUP_MAX_CELL = 4096     # hard per-group bound (gram matrix <= 67 MB)
SEMDEDUP_AUTO_ITERS = 5
SEMDEDUP_AUTO_T = 0.35       # same threshold rationale as SEMDEDUP_T_E6

_SEMDEDUP_AUTO_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cell", T.LongType()),
    T.StructField("n_dups_lower", T.LongType()),
    T.StructField("keep", T.BooleanType()),
])


def _lloyd_local(x, k: int, iters: int):
    """Plain Lloyd on the driver over the bounded training sample
    (float32; init = first k sample rows; empty cell keeps its centroid;
    argmin ties -> smallest cell id via np.argmin first-hit)."""
    import numpy as np

    c = x[:k].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                c[j] = x[m].mean(axis=0, dtype=np.float32)
    return c


def semdedup_auto(spark: SparkSession, emb: DataFrame,
                  threshold: float = SEMDEDUP_AUTO_T) -> DataFrame:
    """SemDeDup over any (vec_id, embedding) frame; see block comment."""
    import numpy as np

    n = emb.count()
    k = min(SEMDEDUP_TRAIN_MAX // 8,
            max(8, -(-n // SEMDEDUP_TARGET_CELL)))
    stride = max(1, n // SEMDEDUP_TRAIN_MAX)
    sample = (emb.filter(F.col("vec_id") % stride == 0)
              .orderBy("vec_id").limit(SEMDEDUP_TRAIN_MAX).collect())
    x = np.array([r.embedding for r in sample], dtype=np.float32)
    cents = _lloyd_local(x, min(k, len(x)), SEMDEDUP_AUTO_ITERS)

    def assign(batches: Iterator[pd.DataFrame],
               _c=cents) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            xb = np.array(pdf["embedding"].tolist(), dtype=np.float32)
            # argmin ||x-c||^2 = argmin -2xC^T + ||c||^2 (BLAS, not the
            # B x K x D broadcast cube — K grows with N here)
            d = (-2.0 * (xb @ _c.T)
                 + (_c * _c).sum(axis=1, dtype=np.float32)[None, :])
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"].astype("int64"),
                "cell": d.argmin(axis=1).astype("int64")})

    assigned = emb.mapInPandas(assign, "vec_id long, cell long")
    sizes = assigned.groupBy("cell").agg(
        F.ceil(F.count("*") / SEMDEDUP_MAX_CELL).cast("long").alias("n_sub"))
    sub = (assigned.join(F.broadcast(sizes), "cell")
           .withColumn("sub", F.col("vec_id") % F.greatest("n_sub", F.lit(1)))
           .join(emb, "vec_id")
           .select("vec_id", "cell", "sub", "embedding"))

    def score(pdf: pd.DataFrame, _t=np.float32(threshold)) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id")
        xb = np.array(pdf["embedding"].tolist(), dtype=np.float32)
        xn = xb / np.linalg.norm(xb, axis=1, keepdims=True).astype(np.float32)
        g = xn @ xn.T
        lower = np.tril(g >= _t, k=-1).sum(axis=1)  # rows sorted by vec_id
        return pd.DataFrame({
            "vec_id": pdf["vec_id"].astype("int64").to_numpy(),
            "cell": pdf["cell"].astype("int64").to_numpy(),
            "n_dups_lower": lower.astype("int64"),
            "keep": lower == 0})

    return (sub.groupBy("cell", "sub")
            .applyInPandas(lambda key, pdf: score(pdf),
                           _SEMDEDUP_AUTO_SCHEMA))


def q_dedup_semantic_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = tbl(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semdedup_auto(spark, emb)


QUERIES = {
    "sim_cosine_topk": q_sim_cosine_topk,
    "sim_lsh_verified": q_sim_lsh_verified,
    "sim_ivf_topk": q_sim_ivf_topk,
    "dedup_semantic": q_dedup_semantic,
    # production SemDeDup (K from N, Arrow gram scorer) — no SQL oracle
    # (float32 path); guarded by the from-spec numpy parity test
    "dedup_semantic_auto": q_dedup_semantic_auto,
    # driver-surface names point at the Arrow fast paths (r4); the exploded
    # oracle-shape forms stay as pytest-parity variants
    "sim_ivf_topk_mprobe": q_sim_ivf_topk_mprobe_pandas,
    "sim_ivf_topk_mprobe_exploded": q_sim_ivf_topk_mprobe,
    "sim_pq_codes": q_sim_pq_codes,
    "sim_pq_adc_topk": q_sim_pq_adc_pandas,
    "sim_pq_adc_topk_exploded": q_sim_pq_adc_topk,
    "sim_lsh_buckets": q_sim_lsh_buckets,
    "sim_lsh_candidates": q_sim_lsh_candidates,
    "sim_ivf_assign": q_sim_ivf_assign,
    "sim_ann_topk_pandas": lambda spark, sf_dir: ann_topk_pandas(spark, sf_dir),
    "sim_kmeans_train": q_sim_kmeans_train,
    "sim_ivf_assign_trained": q_sim_ivf_assign_trained,
}
ORACLES = {
    "sim_cosine_topk": SQL_SIM_COSINE_TOPK,
    "sim_lsh_verified": SQL_SIM_LSH_VERIFIED,
    "sim_ivf_topk": SQL_SIM_IVF_TOPK,
    "sim_ivf_topk_mprobe": SQL_SIM_IVF_TOPK_MPROBE,
    "sim_ivf_topk_mprobe_exploded": SQL_SIM_IVF_TOPK_MPROBE,
    "sim_pq_codes": SQL_SIM_PQ_CODES,
    "sim_pq_adc_topk": SQL_SIM_PQ_ADC_TOPK,
    "sim_pq_adc_topk_exploded": SQL_SIM_PQ_ADC_TOPK,
    "sim_lsh_buckets": SQL_SIM_LSH_BUCKETS,
    "sim_lsh_candidates": SQL_SIM_LSH_CANDIDATES,
    "sim_ivf_assign": SQL_SIM_IVF_ASSIGN,
    # the pandas fast path answers the same question as sim_cosine_topk
    "sim_ann_topk_pandas": SQL_SIM_COSINE_TOPK.replace("rk <= 10", "rk <= 10"),
    "sim_kmeans_train": SQL_SIM_KMEANS_TRAIN,
    "dedup_semantic": SQL_DEDUP_SEMANTIC,
    "sim_ivf_assign_trained": SQL_SIM_IVF_ASSIGN_TRAINED,
}
