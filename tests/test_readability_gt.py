"""From-spec guards for text_good_turing and text_readability
(ops/textstats.py) vs independent plain-python reimplementations (re module
+ Counter) so a mirrored error in the Spark/DuckDB expressions would be
caught. Verifies the Gale-Sampson identities (sum of N_r*r = N; p0 = N1/N)
and the Flesch coefficient arithmetic including the integer-div semantics."""

import re
from collections import Counter

import pyarrow.parquet as pq

from crawl4ai_spark.ops.textstats import q_text_good_turing, q_text_readability

SF = "/root/testdata/sf0.001"


def _texts():
    tab = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    return list(zip(tab["doc_id"], tab["text"]))


def test_good_turing_matches_independent_impl(spark):
    counts: Counter = Counter()
    for _, text in _texts():
        counts.update(re.findall(r"[a-z0-9]+", text.lower()))
    fof = Counter(counts.values())
    n_total = sum(r * n for r, n in fof.items())
    n1 = fof.get(1, 0)
    want = {}
    for r, n_types in fof.items():
        n_rp1 = fof.get(r + 1, 0)
        want[r] = (
            n_types,
            (r + 1) * n_rp1 * 1_000_000 // n_types,
            (r + 1) * n_rp1 * 1_000_000 // (n_types * n_total),
            n1 * 1_000_000 // n_total,
        )
    got = {row["freq"]: (row["n_types"], row["gt_count_e6"],
                         row["gt_prob_e6"], row["p0_unseen_e6"])
           for row in q_text_good_turing(spark, SF).collect()}
    assert got == want
    # Gale-Sampson sanity: the unseen mass is a valid probability (the tiny
    # sf0.001 vocabulary has NO hapax legomena — every term repeats — so p0
    # is exactly 0 there; larger corpora give it a positive tail) and the
    # frequency table accounts for every token.
    assert 0 <= n1 * 1_000_000 // n_total < 1_000_000
    assert sum(r * n for r, n in fof.items()) == n_total


def test_readability_matches_independent_impl(spark):
    want = {}
    for doc_id, text in _texts():
        w = max(len(re.findall(r"[a-z]+", text.lower())), 1)
        s = max(len(re.findall(r"[aeiouy]+", text.lower())), 1)
        st = max(len(re.findall(r"[.!?]+", text)), 1)
        flesch = 206_835_000 - (1_015_000 * w // st) - (84_600_000 * s // w)
        fk = (390_000 * w // st) + (11_800_000 * s // w) - 15_590_000
        band = ("easy" if flesch >= 60_000_000
                else "standard" if flesch >= 30_000_000 else "difficult")
        want[int(doc_id)] = (w, s, st, flesch, fk, band)
    got = {row["doc_id"]: (row["n_words"], row["n_syllables"],
                           row["n_sentences"], row["flesch_e6"],
                           row["fk_grade_e6"], row["band"])
           for row in q_text_readability(spark, SF).collect()}
    assert got == want
    # the synthetic corpus is punctuation-free single-line text, so the
    # sentence floor must engage on every row (documented degenerate axis)
    assert all(v[2] == 1 for v in want.values())
