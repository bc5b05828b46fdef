"""Corpus mixture planning — water-filling per-language sampling rates
against a TARGET mixture under an epoch cap: the data-recipe step every
large-model corpus build runs between raw counts and the sampling draw
(temperature resampling, ops/pipelineq.py, reweights by corpus-derived
sqrt weights; this operator hits EXPLICIT target shares instead — the
"data mixture" knob of published pretraining recipes).

Semantics (exact, all integer e6 arithmetic so both engines agree
bit-for-bit): classical monotone water-filling over the CAP SET.
Round k recomputes, as a pure function of the current cap set C,
  Gc  = sum over C of CAP * avail_s div 1e6        (capped grants)
  Wu  = sum of target weights outside C
  rate_s = CAP                                  if s in C
         = min(CAP, ((B - Gc) * w_s div Wu) * 1e6 div avail_s) otherwise
then C grows by every stratum whose rate hit CAP. The cap set grows
MONOTONICALLY (removing a capped stratum's weight and budget raises
everyone else's share), so once it stops growing the rates are exactly
reproduced — an integer fixpoint, not an asymptote. Three rounds are
exact whenever at most two cap events cascade; the pytest guard runs
the from-spec planner to convergence and proves round 3 IS the
fixpoint on this corpus. A stratum at the cap can absorb no more
(upsampling a low-resource language beyond CAP epochs just replays the
same tokens); the freed budget flows to the rest.

Scale shape: ONE per-lang partial aggregate over the corpus (map-side
combine) — the only stage that touches data; planning then runs on the
#langs-row table with 1-row scalar broadcasts (the HITS/OPIC
norm-constant shape). ``apply_mixture_plan`` realizes the plan
deterministically: floor(rate/1e6) full copies per doc plus one
fractional copy admitted by the md5 draw — no RNG, replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

CAP_E6 = 2_000_000           # at most 2 epochs over any stratum
# target mixture (e6 shares, sum exactly 1e6): fr deliberately ~2.3-2.9x
# its availability so the cap + redistribution path is exercised at both
# test scales without cascading a second cap
MIX_WEIGHTS = {"en": 240_000, "fr": 400_000, "zh": 120_000,
               "es": 120_000, "de": 120_000}


def q_corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(F.sum("n_chars").alias("avail"))
    w = spark.createDataFrame(
        [(k, v) for k, v in sorted(MIX_WEIGHTS.items())],
        "lang string, w_e6 long")
    a = avail.join(F.broadcast(w), "lang", "inner")
    tot = a.agg(F.sum("avail").alias("budget"))

    cur = (a.join(F.broadcast(tot))
           .withColumn("capped", F.lit(False)))
    for _ in range(3):
        caps = cur.agg(
            F.expr(f"sum(CASE WHEN capped THEN {CAP_E6} * avail"
                   " div 1000000 ELSE 0 END)").alias("gc"),
            F.expr("sum(CASE WHEN capped THEN 0 ELSE w_e6 END)")
            .alias("wu"))
        cur = (cur.drop("gc", "wu").join(F.broadcast(caps))
               .withColumn("rate_e6", F.expr(
                   f"CASE WHEN capped OR wu = 0 THEN CAST({CAP_E6} AS BIGINT)"
                   f" ELSE least(CAST({CAP_E6} AS BIGINT),"
                   " ((budget - gc) * w_e6 div wu) * 1000000 div avail)"
                   " END"))
               .withColumn("capped", F.expr(f"rate_e6 >= {CAP_E6}")))
    return cur.select(
        "lang", F.col("avail").alias("avail_tokens"),
        F.col("w_e6").alias("weight_e6"), "budget", "rate_e6",
        F.expr("rate_e6 * avail div 1000000").alias("granted_tokens"),
        "capped")


def _sql_weights() -> str:
    return " UNION ALL ".join(
        f"SELECT '{k}' AS lang, CAST({v} AS BIGINT) AS w_e6"
        for k, v in sorted(MIX_WEIGHTS.items()))


def _sql_round(prev: str, k: int) -> str:
    """One cap-set round as two chained CTEs over the previous round."""
    return f"""
caps{k} AS (
  SELECT sum(CASE WHEN capped THEN {CAP_E6} * avail // 1000000
             ELSE 0 END) AS gc,
         sum(CASE WHEN capped THEN 0 ELSE w_e6 END) AS wu
  FROM {prev}
),
r{k} AS (
  SELECT p.lang, p.avail, p.w_e6, p.budget,
         CASE WHEN p.capped OR c.wu = 0 THEN CAST({CAP_E6} AS BIGINT)
              ELSE least(CAST({CAP_E6} AS BIGINT),
                         ((p.budget - c.gc) * p.w_e6 // c.wu)
                           * 1000000 // p.avail) END AS rate_e6,
         CASE WHEN p.capped OR c.wu = 0 THEN TRUE
              ELSE least(CAST({CAP_E6} AS BIGINT),
                         ((p.budget - c.gc) * p.w_e6 // c.wu)
                           * 1000000 // p.avail) >= {CAP_E6} END AS capped
  FROM {prev} p, caps{k} c
)"""


SQL_CORPUS_MIXTURE_PLAN = f"""
WITH w AS ({_sql_weights()}),
a AS (
  SELECT d.lang, CAST(sum(d.n_chars) AS BIGINT) AS avail, w.w_e6
  FROM documents d JOIN w USING (lang) GROUP BY d.lang, w.w_e6
),
tot AS (SELECT sum(avail) AS budget FROM a),
r0 AS (
  SELECT a.*, tot.budget, FALSE AS capped FROM a, tot
),
{_sql_round('r0', 1)},
{_sql_round('r1', 2)},
{_sql_round('r2', 3)}
SELECT lang, avail AS avail_tokens, w_e6 AS weight_e6, budget, rate_e6,
       rate_e6 * avail // 1000000 AS granted_tokens, capped
FROM r3
"""


# 40-bit uniform draw from md5 hex (the resample_temperature scheme —
# ops/pipelineq.py): first 10 hex nibbles as a BIGINT
_HEX10 = "+ (CAST(conv(substring({h}, 1, 10), 16, 10) AS BIGINT))"


def apply_mixture_plan(docs: DataFrame, plan: DataFrame) -> DataFrame:
    """Realize a mixture plan deterministically: each doc yields
    floor(rate/1e6) full copies plus one extra copy admitted iff its
    40-bit md5 draw falls under the fractional part — zero RNG, so a
    resumed run replays the identical corpus. Output carries ``copy``
    (0-based replica index). One broadcast join + one bounded explode;
    docs never shuffle."""
    rates = F.broadcast(plan.select("lang", "rate_e6"))
    draw = F.expr("0 " + _HEX10.format(h="md5(CAST(doc_id AS STRING))"))
    return (docs.join(rates, "lang", "inner")
            .withColumn("__u40", draw)
            .withColumn("__full", F.expr("CAST(rate_e6 div 1000000 AS INT)"))
            .withColumn("__frac", F.expr("rate_e6 % 1000000"))
            .withColumn("__n", F.expr(
                "__full + CAST(__u40 * 1000000 < __frac * 1099511627776"
                " AS INT)"))
            .filter(F.expr("__n > 0"))
            .withColumn("copy", F.explode(F.expr("sequence(0, __n - 1)")))
            .drop("__u40", "__full", "__frac", "__n"))


QUERIES = {"corpus_mixture_plan": q_corpus_mixture_plan}
ORACLES = {"corpus_mixture_plan": SQL_CORPUS_MIXTURE_PLAN}
