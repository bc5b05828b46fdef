"""Distributed BPE merge training (Sennrich et al. 2016; the GPT-2 tokenizer
family) — the vocabulary-construction step a training-data pipeline runs
after cleaning.

Algorithm (the standard one): words become character-symbol sequences with
a </w> end marker; each round counts adjacent symbol pairs weighted by word
frequency, merges the most frequent pair (tie → lexicographically smallest)
everywhere greedily left-to-right, and repeats. The repo's trained artifact
is the merge table itself — exactly what a BPE tokenizer ships.

Scale shape (how real BPE trainers distribute): the corpus collapses to the
WORD-FREQUENCY table in one shuffle (size = |word vocabulary| ≪ corpus
bytes, the classic trick), and every round after that touches only that
table — pair counts are one map-side-combinable aggregate over in-row
bigrams; applying a merge is an in-row literal replace. The per-round
argmax is a 1-row collect (the k-means-centroid pattern, documented).

Exactness design (no regex, no lookarounds — RE2/Java parity): symbol
sequences are encoded with DOUBLE-space separators and padding
(``␣␣s1␣␣s2␣␣``), so merging pair (a,b) is the plain literal
``replace(sym, ' a  b ', ' ab ')``: each match consumes one space of each
neighboring double-space, the replacement restores them, and scanning
continues AFTER the replacement — byte-for-byte the greedy left-to-right
non-overlapping application BPE specifies ("a a a a" → "aa aa",
"a a a" → "aa a"), with identical semantics in Spark's ``replace`` and
DuckDB's ``replace``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawl4ai_spark.ops.common import tbl

BPE_MERGES = 10


_SYM0 = (
    "concat('  ', array_join(transform(sequence(1, length(word)),"
    " i -> substring(word, i, 1)), '  '), '  </w>  ')"
)

# in-row adjacent pairs of the double-space encoding; syms[0] is the empty
# leading pad token, syms[last] the trailing one — slice them off
_PAIRS = (
    "transform(sequence(1, size(syms) - 1),"
    " i -> concat(element_at(syms, i), ' ', element_at(syms, i + 1)))"
)


def _words0(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.expr(
        "regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("word"))
    return (toks.groupBy("word").agg(F.count("*").alias("freq"))
            .withColumn("sym", F.expr(_SYM0)))


def _pair_counts(words: DataFrame) -> DataFrame:
    syms = words.withColumn(
        "syms", F.expr("filter(split(sym, '  '), s -> s <> '')"))
    return (
        syms.select("freq", F.explode(F.expr(_PAIRS)).alias("pair"))
        .groupBy("pair").agg(F.sum("freq").alias("cnt"))
    )


def train_bpe(spark: SparkSession, sf_dir: str,
              n_merges: int = BPE_MERGES) -> list[dict]:
    """Run the merge loop; returns the merge table rows. Per round: one
    aggregate over the word-frequency table + a 1-row argmax collect."""
    words = _words0(spark, sf_dir).persist()
    words.count()
    merges: list[dict] = []
    for rnd in range(1, n_merges + 1):
        top = (_pair_counts(words)
               .orderBy(F.desc("cnt"), F.asc("pair")).limit(1).collect())
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        left, right = pair.split(" ")
        merged = left + right
        pat = f" {left}  {right} "
        rep = f" {merged} "
        nxt = words.withColumn(
            "sym", F.expr(f"replace(sym, '{pat}', '{rep}')")).persist()
        n_after = int(nxt.select(F.sum(
            F.col("freq") *
            F.expr("size(filter(split(sym, '  '), s -> s <> ''))")
        ).alias("n")).collect()[0]["n"])
        words.unpersist()
        words = nxt
        merges.append({"round": rnd, "left": left, "right": right,
                       "merged": merged, "cnt": cnt,
                       "corpus_symbols_after": n_after})
    words.unpersist()
    return merges


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = train_bpe(spark, sf_dir)
    return spark.createDataFrame(
        [(r["round"], r["left"], r["right"], r["merged"], r["cnt"],
          r["corpus_symbols_after"]) for r in rows],
        "round long, lhs string, rhs string, merged string, "
        "cnt long, corpus_symbols_after long")


def bpe_word_symbols(spark: SparkSession, sf_dir: str,
                     n_merges: int = BPE_MERGES) -> DataFrame:
    """The trained tokenizer as a word → BPE-symbol-count table (r5): train
    the merges, then replay them as one chained literal-replace expression
    over the word-frequency vocabulary. This is the artifact the datacard's
    token accounting broadcasts — corpus tokenized size = Σ per-word counts
    via a broadcast join, so corpus bytes never shuffle for tokenization."""
    merges = train_bpe(spark, sf_dir, n_merges)
    expr = "sym"
    for m in merges:
        expr = (f"replace({expr}, ' {m['left']}  {m['right']} ',"
                f" ' {m['merged']} ')")
    return _words0(spark, sf_dir).select(
        "word",
        F.expr(f"size(filter(split({expr}, '  '), s -> s <> ''))")
        .cast("long").alias("n_syms"))


def _sql_bpe_ctes(n_merges: int = BPE_MERGES, with_out: bool = True) -> str:
    """Chained-CTE oracle: each round's argmax + literal-replace application
    recomputed entirely in SQL (the pattern/replacement strings come from
    scalar subqueries over that round's best-pair CTE). Every CTE is
    MATERIALIZED — DuckDB inlines CTEs by default, and with each round
    referencing the previous twice the inlined tree (and its parquet
    opens) grows exponentially with rounds."""
    parts = ["""
WITH w0 AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq,
         '  ' || array_to_string(
             list_transform(range(length(word)),
                            i -> substring(word, CAST(i AS INT) + 1, 1)),
             '  ') || '  </w>  ' AS sym
  FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
    FROM documents
  ) GROUP BY word
)"""]
    for r in range(1, n_merges + 1):
        p = r - 1
        parts.append(f""",
pc{r} AS MATERIALIZED (
  SELECT syms[CAST(i AS BIGINT) + 1] || ' ' || syms[CAST(i AS BIGINT) + 2]
           AS pair,
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq,
               list_filter(string_split(sym, '  '), s -> s <> '') AS syms
        FROM w{p}),
       unnest(range(len(syms) - 1)) t(i)
  GROUP BY pair
),
best{r} AS MATERIALIZED (
  SELECT pair, cnt,
         split_part(pair, ' ', 1) AS l, split_part(pair, ' ', 2) AS r
  FROM pc{r} ORDER BY cnt DESC, pair ASC LIMIT 1
),
w{r} AS MATERIALIZED (
  SELECT word, freq,
         replace(sym,
                 ' ' || (SELECT l FROM best{r}) || '  '
                     || (SELECT r FROM best{r}) || ' ',
                 ' ' || (SELECT l FROM best{r})
                     || (SELECT r FROM best{r}) || ' ') AS sym
  FROM w{p}
)""")
        if with_out:
            parts.append(f""",
out{r} AS (
  SELECT {r} AS round, b.l AS left_s, b.r AS right_s, b.l || b.r AS merged,
         b.cnt,
         (SELECT CAST(sum(freq * len(list_filter(string_split(sym, '  '),
                                                 s -> s <> ''))) AS BIGINT)
          FROM w{r}) AS corpus_symbols_after
  FROM best{r} b
)""")
    return "".join(parts)


def _sql_bpe() -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT CAST(round AS BIGINT) AS round, left_s AS lhs,"
        f" right_s AS rhs, merged, cnt, corpus_symbols_after FROM out{r}"
        for r in range(1, BPE_MERGES + 1))
    return _sql_bpe_ctes() + "\n" + sel


def sql_bpe_word_symbols(n_merges: int = BPE_MERGES) -> str:
    """The oracle twin of bpe_word_symbols: retrain the merges in chained
    CTEs, then read the final word table's symbol counts."""
    return _sql_bpe_ctes(n_merges, with_out=False) + f"""
SELECT word,
       CAST(len(list_filter(string_split(sym, '  '), s -> s <> ''))
            AS BIGINT) AS n_syms
FROM w{n_merges}
"""


QUERIES = {
    "bpe_merges": q_bpe_merges,
}
ORACLES = {
    "bpe_merges": _sql_bpe(),
}
