"""Hand-computed cases for the Gopher-style repetition signals
(ops/textstats.py q_text_dup_lines / q_text_top_ngram / q_text_dup_ngrams).
The DuckDB oracle parity runs in test_ops_parity; these pin the SPEC with
values worked out by hand, so an error mirrored into both engines still
fails somewhere."""

import pytest


@pytest.fixture(scope="module")
def sf_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("repdocs"))
    rows = [
        # doc 1: lines ["a b", "a b", "c"] -> 2/3 lines dup, 6/7 chars dup
        (1, "a b\na b\nc\n", "en"),
        # doc 2: no duplicate lines at all
        (2, "alpha\nbeta\ngamma", "en"),
        # doc 3: words x y x y x z -> top-2gram "x y" (ties with "y x",
        # lexicographic wins), top-3gram "x y x"
        (3, "x y x y x z", "en"),
        # doc 4: 15 words of period 5 -> all 11 5-grams duplicated
        (4, "a b c d e a b c d e a b c d e", "en"),
        # doc 5: 5 distinct words -> single 5-gram, nothing duplicated
        (5, "p q r s t", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
         .write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_dup_lines_hand_values(spark, sf_dir):
    from crawl4ai_spark.ops.textstats import q_text_dup_lines
    got = {r.doc_id: r for r in q_text_dup_lines(spark, sf_dir).collect()}
    r1 = got[1]
    assert r1.n_lines == 3
    assert r1.dup_line_frac_e6 == 2 * 1_000_000 // 3   # 666666
    assert r1.dup_char_frac_e6 == 6 * 1_000_000 // 7   # 857142
    r2 = got[2]
    assert (r2.n_lines, r2.dup_line_frac_e6, r2.dup_char_frac_e6) == (3, 0, 0)


def test_top_ngram_hand_values(spark, sf_dir):
    from crawl4ai_spark.ops.textstats import q_text_top_ngram
    got = {r.doc_id: r for r in q_text_top_ngram(spark, sf_dir).collect()}
    r3 = got[3]  # tok_chars = 6
    assert (r3.top2_gram, r3.top2_count) == ("x y", 2)  # tie vs "y x"
    assert r3.top2_char_frac_e6 == 2 * 2 * 1_000_000 // 6   # 666666
    assert (r3.top3_gram, r3.top3_count) == ("x y x", 2)
    assert r3.top3_char_frac_e6 == 2 * 3 * 1_000_000 // 6   # 1000000
    assert 2 in got and 4 in got and 5 in got  # every doc has >= 3 words


def test_top_ngram_all_distinct_doc(spark, sf_dir):
    from crawl4ai_spark.ops.textstats import q_text_top_ngram
    got = {r.doc_id: r for r in q_text_top_ngram(spark, sf_dir).collect()}
    r5 = got[5]  # every gram unique -> count 1, lexicographic smallest gram
    assert r5.top2_count == 1 and r5.top2_gram == "p q"
    assert r5.top3_count == 1 and r5.top3_gram == "p q r"


def test_dup_ngrams_hand_values(spark, sf_dir):
    from crawl4ai_spark.ops.textstats import q_text_dup_ngrams
    got = {r.doc_id: r for r in q_text_dup_ngrams(spark, sf_dir).collect()}
    r4 = got[4]
    assert r4.n_grams == 11
    assert r4.dup_5gram_frac_e6 == 1_000_000  # every 5-gram value repeats
    r5 = got[5]
    assert (r5.n_grams, r5.dup_5gram_frac_e6) == (1, 0)
    r3 = got[3]  # 6 words -> grams "x y x y x" and "y x y x z", both unique
    assert (r3.n_grams, r3.dup_5gram_frac_e6) == (2, 0)
    assert 2 not in got  # "alpha beta gamma": only 3 words
