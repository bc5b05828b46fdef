"""BPE merge training: from-spec pure-python reimplementation parity (the
textbook Sennrich et al. algorithm, written independently of the Spark
code) plus the greedy-application edge cases the double-space literal
replace encoding must honor."""

import re
from collections import Counter

import duckdb

from crawl4ai_spark.ops.bpeq import BPE_MERGES, q_bpe_merges, train_bpe

SF = "/root/testdata/sf0.001"


def _spec_bpe(texts, n_merges):
    """Independent reimplementation: dict-of-tuples word table, pair
    Counter, greedy left-to-right merge application."""
    words = Counter()
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            words[w] += 1
    table = {w: tuple(list(w) + ["</w>"]) for w in words}
    merges = []
    for rnd in range(1, n_merges + 1):
        pairs = Counter()
        for w, syms in table.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # max count, tie -> lexicographically smallest "a b" string
        best = min(pairs.items(), key=lambda kv: (-kv[1],
                                                  f"{kv[0][0]} {kv[0][1]}"))
        (l, r), cnt = best
        merged = l + r
        for w, syms in table.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            table[w] = tuple(out)
        n_after = sum(words[w] * len(syms) for w, syms in table.items())
        merges.append((rnd, l, r, merged, cnt, n_after))
    return merges


def test_bpe_matches_from_spec(spark):
    texts = [r[0] for r in duckdb.connect().execute(
        f"SELECT text FROM read_parquet('{SF}/documents.parquet')"
    ).fetchall()]
    exp = _spec_bpe(texts, BPE_MERGES)
    got = [(r["round"], r["left"], r["right"], r["merged"], r["cnt"],
            r["corpus_symbols_after"]) for r in train_bpe(spark, SF)]
    assert got == exp
    # query surface carries the same rows
    q = [(r.round, r.lhs, r.rhs, r.merged, r.cnt, r.corpus_symbols_after)
         for r in q_bpe_merges(spark, SF).orderBy("round").collect()]
    assert q == exp


def test_bpe_greedy_application_edge_cases(spark):
    """The double-space literal-replace encoding must equal greedy
    left-to-right merging: 'a a a a' -> 'aa aa', 'a a a' -> 'aa a'."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("  a  a  a  a  ",), ("  a  a  a  ",), ("  b  a  a  c  ",)],
        "sym string")
    out = [r.s for r in df.select(
        F.expr("replace(sym, ' a  a ', ' aa ')").alias("s")).collect()]
    assert out == ["  aa  aa  ", "  aa  a  ", "  b  aa  c  "]
    # DuckDB replace agrees byte-for-byte
    duck = [duckdb.connect().execute(
        "SELECT replace(?, ' a  a ', ' aa ')", [s]).fetchone()[0]
        for s in ["  a  a  a  a  ", "  a  a  a  ", "  b  a  a  c  "]]
    assert duck == out
