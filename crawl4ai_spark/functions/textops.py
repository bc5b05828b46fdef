"""Large-scale training-data pipeline operators over a documents table.

These are the web-text curation ops a 100 TB corpus pipeline needs, each
expressed with native Spark column expressions (JVM-side, whole-stage
codegen) — no Python in the hot path:

- exact dedup            (hash-groupBy on md5(text))
- MinHash + LSH near-dup (shingle → K minhashes → bands → bucket self-join
                          → Jaccard verify; the classic Broder scheme)
- SimHash                (token-hash bit-vote fingerprint, Charikar)
- n-gram Jaccard pairs   (banded to avoid O(n²))
- language-ID heuristic  (stopword-marker ratio)
- quality scoring        (length/punct/stopword ratios)
- token counting         (whitespace + BPE-ish regex)
- document fingerprint   (normalized md5)

Every function returns a DataFrame and has an exactly-matching ANSI-SQL
oracle in __spark_entry__.oracle_sql() — the cross-engine hash
``conv(substr(md5(x),1,15),16,10)`` ≡ DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``
keeps minhash/simhash bit-identical between Spark and the DuckDB oracle.

Scale notes: every self-join is band-bucketed (LSH) so candidate pairs stay
~linear; shingle explosion is the only row-multiplying stage and it feeds a
partial-aggregated groupBy (map-side combine), so the shuffle carries only
(doc_id, K minhashes), never the shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# cross-engine stable 60-bit hash
def hash60(col, salt: str | None = None):
    x = F.concat(col, F.lit("#" + salt)) if salt else col
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("long")


def words_col(text_col):
    return F.split(F.trim(text_col), r"\s+")


# ---------------------------------------------------------------- exact ----
def dedup_exact(docs: DataFrame) -> DataFrame:
    """Duplicate-text groups: (text_hash, n_docs, keep_doc_id)."""
    return (
        docs.select(F.col("doc_id"), F.md5("text").alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_docs") > 1)
    )


# -------------------------------------------------------------- shingles ----
def shingles(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) — n-word shingles, distinct per doc."""
    w = docs.select("doc_id", words_col(F.col("text")).alias("w"))
    idx = F.explode(F.sequence(F.lit(1), F.greatest(F.size("w") - (n - 1), F.lit(0))))
    parts = [F.element_at("w", F.col("i") + j) for j in range(n)]
    return (
        w.select("doc_id", idx.alias("i"), "w")
        .select("doc_id", F.concat_ws(" ", *parts).alias("shingle"))
        .distinct()
    )


# -------------------------------------------------------------- minhash ----
def minhash_signatures(docs: DataFrame, *, n_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(doc_id, mh_0..mh_{K-1}) via K salted min-hashes over shingles.
    The groupBy partial-aggregates map-side: shuffle = K longs per doc."""
    sh = shingles(docs, shingle_n)
    aggs = [
        F.min(hash60(F.col("shingle"), salt=str(s))).alias(f"mh_{s}")
        for s in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(docs: DataFrame, *, n_hashes: int = 8, bands: int = 4,
                      shingle_n: int = 3, jaccard_threshold: float = 0.5) -> DataFrame:
    """Near-duplicate pairs (doc_a, doc_b, jaccard) — banded LSH candidates,
    exact Jaccard verification on the shingle sets."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, n_hashes=n_hashes, shingle_n=shingle_n)
    band_cols = []
    for b in range(bands):
        cs = [F.col(f"mh_{b * rows_per_band + r}").cast("string")
              for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"),
                                  F.concat_ws("_", *cs).alias("key")))
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = shingles(docs, shingle_n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sh.alias("sb"), (F.col("doc_b") == F.col("sb.doc_id"))
              & (F.col("sa.shingle") == F.col("sb.shingle")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    )
    out = (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_common")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_common")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
    return out


# --------------------------------------------------------------- simhash ----
def simhash(docs: DataFrame, *, n_bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — Charikar bit-vote over token hashes (distinct
    tokens; each bit b is sign(Σ ±1)). Shuffle carries (doc_id, token_hash)."""
    tok = (
        docs.select("doc_id", F.explode(words_col(F.col("text"))).alias("t"))
        .filter(F.col("t") != "")
        .distinct()
        .select("doc_id", hash60(F.col("t")).alias("h"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(n_bits)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = None
    for b in range(n_bits):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else (sim + bit)
    return agg.select("doc_id", sim.alias("simhash"))


# ------------------------------------------------------------ ngram pairs ----
def ngram_jaccard_pairs(docs: DataFrame, *, shingle_n: int = 3,
                        threshold: float = 0.3, bucket_col: str = "source") -> DataFrame:
    """Exact shingle-Jaccard for pairs within the same bucket column —
    bucketing bounds the pair blow-up (the LSH variant above is the
    unbucketed scale path)."""
    sh = shingles(docs, shingle_n).join(
        docs.select("doc_id", F.col(bucket_col).alias("bk")), "doc_id"
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.bk") == F.col("b.bk"))
               & (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a", "doc_b",
            F.round(F.col("n_common") / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_common")), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- text stats ----
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "les", "et", "des"],
    "es": ["el", "los", "las", "una", "pero"],
}

_STOPWORDS_SQL = ("the", "and", "of", "to", "in", "a", "is", "for", "on", "with")


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language guess: argmax of marker-word hit count (ties → the
    lexically first language; 'und' = undetermined when zero hits)."""
    w = words_col(F.lower(F.col("text")))
    hit_cols = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        hits = F.size(F.array_intersect(F.array_distinct(w), arr))
        hit_cols.append((lang, hits))
    best = F.greatest(*[h for _, h in hit_cols])
    guess = F.lit("und")
    for lang, hits in reversed(hit_cols):
        guess = F.when((best > 0) & (hits == best), F.lit(lang)).otherwise(guess)
    return docs.select("doc_id", guess.alias("lang_guess"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_chars, stopword_ratio, punct_ratio, quality) —
    the classic cheap web-text quality gates."""
    text = F.col("text")
    w = words_col(text)
    n_words = F.size(w)
    n_chars = F.length(text)
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS_SQL])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    stop_ratio = F.round(n_stop / n_words, 4)
    punct_ratio = F.round(n_punct / n_chars, 4)
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    quality = F.round(
        F.lit(0.5) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
        4,
    )
    return docs.select(
        "doc_id", n_words.alias("n_words"), n_chars.alias("n_chars"),
        stop_ratio.alias("stopword_ratio"), punct_ratio.alias("punct_ratio"),
        quality.alias("quality"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (alnum runs + punct)."""
    ws = F.size(words_col(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]{1,4}|[^\sA-Za-z0-9]"), 0))
    return docs.select("doc_id", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized md5 fingerprint + 60-bit numeric form."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        hash60(norm).alias("fp60"),
    )
