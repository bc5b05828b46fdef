"""E14 clustering: ward linkage vs an independent naive oracle, cut/partition
properties, the cross-engine feature-hash anchor, and the
CosineClusterExtraction strategy surface.

The distributed queries (cluster_embeddings / cosine_cluster_chunks /
cosine_prefilter) are oracle-checked in test_ops_parity via the registry;
cosine_cluster_ward is rows-only there, so its algorithmic core gets the
heavy treatment here.
"""

import numpy as np
import pytest

from crawl4ai_spark.functions.cluster import (
    cosine_distance_matrix,
    cut_by_distance,
    feature_hash_embed,
    single_linkage_components,
    tokenize,
    ward_linkage,
)
from crawl4ai_spark.html.cosine_extract import DEL, CosineClusterExtraction


# --------------------------------------------------------------------------
# independent naive Ward implementation (dict-of-frozensets, no numpy):
# same Lance-Williams recurrence, structurally different code
# --------------------------------------------------------------------------

def naive_ward(dist):
    n = len(dist)
    ids = {i: frozenset([i]) for i in range(n)}          # cluster id -> members
    d2 = {}
    for i in range(n):
        for j in range(i + 1, n):
            d2[(i, j)] = float(dist[i][j]) ** 2

    def get(a, b):
        return d2[(min(a, b), max(a, b))]

    merges = []
    next_id = n
    while len(ids) > 1:
        live = sorted(ids)
        best = None
        for x in range(len(live)):
            for y in range(x + 1, len(live)):
                a, b = live[x], live[y]
                key = (get(a, b), a, b)
                if best is None or key < best:
                    best = key
        h2, a, b = best
        merges.append((a, b, h2 ** 0.5))
        na, nb = len(ids[a]), len(ids[b])
        for c in live:
            if c in (a, b):
                continue
            nc = len(ids[c])
            nd = ((na + nc) * get(a, c) + (nb + nc) * get(b, c)
                  - nc * h2) / (na + nb + nc)
            d2[(min(c, next_id), max(c, next_id))] = nd
        ids[next_id] = ids.pop(a) | ids.pop(b)
        next_id += 1
    return merges


@pytest.mark.parametrize("seed", [0, 1, 7, 42])
@pytest.mark.parametrize("n", [2, 5, 12])
def test_ward_matches_naive(seed, n):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 6))
    d = cosine_distance_matrix(X)
    fast = ward_linkage(d)
    slow = naive_ward(d.tolist())
    assert len(fast) == len(slow) == n - 1
    for (a1, b1, h1), (a2, b2, h2) in zip(fast, slow):
        assert (a1, b1) == (a2, b2)
        assert h1 == pytest.approx(h2, abs=1e-9)


@pytest.mark.parametrize("seed", range(6))
def test_ward_heights_monotone(seed):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(10, 5))
    hs = [h for _, _, h in ward_linkage(cosine_distance_matrix(X))]
    assert all(hs[i] <= hs[i + 1] + 1e-9 for i in range(len(hs) - 1))


def test_cut_extremes_and_partition():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(9, 4))
    d = cosine_distance_matrix(X)
    merges = ward_linkage(d)
    assert list(cut_by_distance(9, merges, -1.0)) == list(range(9))  # singletons
    assert set(cut_by_distance(9, merges, 1e9)) == {0}               # one cluster
    lab = cut_by_distance(9, merges, float(np.median([h for *_, h in merges])))
    # labels form a partition keyed by min member index
    for i, l in enumerate(lab):
        assert l <= i and lab[l] == l


def test_single_linkage_label_is_min_member():
    lab = single_linkage_components(6, [(5, 3), (3, 1), (0, 4)])
    assert list(lab) == [0, 1, 2, 1, 0, 1]


def test_feature_hash_matches_sql_definition():
    """The exact expression the DuckDB oracles compute: per-dim sum of
    hexval(md5(tok || '_' || i)[0]) - 7.5 over tokens."""
    import duckdb
    toks = tokenize("Hash JOIN hash")
    v = feature_hash_embed(toks, 4)
    con = duckdb.connect()
    got = con.execute(
        """
        SELECT i, sum(instr('0123456789abcdef', substr(md5(tok || '_' || i), 1, 1)) - 1 - 7.5)
        FROM (SELECT unnest(['hash','join','hash']) AS tok), range(4) r(i)
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [x for _, x in got] == pytest.approx(list(v))


# --------------------------------------------------------------------------
# CosineClusterExtraction surface
# --------------------------------------------------------------------------

def _mk_text(*chunks):
    return DEL.join(chunks)


def test_extract_groups_near_duplicate_chunks():
    # two near-identical chunks (shared tokens) + one disjoint-vocab chunk;
    # threshold generous enough that the twins always merge
    a = "spark shuffle partition join broadcast hash spark shuffle"
    b = "spark shuffle partition join broadcast hash spark merge"
    c = "zebra quokka wombat lemur capuchin macaw iguana gecko"
    s = CosineClusterExtraction(max_dist=0.4, word_count_threshold=3)
    out = s.extract("u", _mk_text(a, b, c))
    assert len(out) == 2
    assert out[0]["index"] == 0 and a in out[0]["content"] and b in out[0]["content"]
    assert out[1]["content"] == c
    assert out[0]["tags"] == []


def test_extract_word_count_filter_drops_small_clusters():
    s = CosineClusterExtraction(max_dist=0.0, word_count_threshold=10)
    out = s.extract("u", _mk_text("tiny chunk", "a b c d e f g h i j k"))
    assert [o["content"] for o in out] == ["a b c d e f g h i j k"]


def test_extract_single_linkage_variant_agrees_on_clean_split():
    a = "alpha beta gamma delta alpha beta gamma delta"
    b = "alpha beta gamma delta alpha beta gamma epsilon"
    c = "one two three four five six seven eight"
    w = CosineClusterExtraction(max_dist=0.4, word_count_threshold=1,
                                linkage_method="ward")
    sl = CosineClusterExtraction(max_dist=0.4, word_count_threshold=1,
                                 linkage_method="single")
    t = _mk_text(a, b, c)
    assert [o["content"] for o in w.extract("u", t)] == \
           [o["content"] for o in sl.extract("u", t)]


def test_prefilter_backfill_and_cap():
    # filter matches chunk vocab 'hash join'; 3 chunks < at_least_k=4 so
    # k = 3//2 = 1 → only the best survives (reference halving rule :260-261)
    s = CosineClusterExtraction(semantic_filter="hash join",
                                sim_threshold=0.99, at_least_k=4,
                                word_count_threshold=1)
    chunks = ["hash join hash join", "merge sort", "zebra quokka"]
    kept = s._prefilter(chunks)
    assert kept == ["hash join hash join"]


def test_model_embedder_is_declared_stub():
    with pytest.raises(NotImplementedError):
        CosineClusterExtraction(embedder="model")


def test_run_joins_sections_like_reference():
    s = CosineClusterExtraction(word_count_threshold=1)
    a = "alpha beta gamma delta"
    b = "zebra quokka wombat lemur"
    assert s.run("u", [a, b]) == s.extract("u", _mk_text(a, b))


def test_cosine_extraction_through_page_pipeline(spark):
    """Engine surface: cosine_config on process_pages produces the cluster
    JSON in extracted_content (markdown input, \\n\\n-chunked — the
    reference's default input_format + RegexChunking path)."""
    import json

    from crawl4ai_spark.functions.udfs import process_page, process_pages

    html = ("<html><body>"
            "<p>spark shuffle partition join broadcast hash spark shuffle</p>"
            "<p>spark shuffle partition join broadcast hash spark merge</p>"
            "<p>zebra quokka wombat lemur capuchin macaw iguana gecko</p>"
            "</body></html>")
    # single_line_break markdown (reference default) has no blank lines, so
    # split per line — the RegexChunking(patterns=[...]) analog
    cfg = {"max_dist": 0.4, "word_count_threshold": 3,
           "chunk_patterns": ["\n"]}
    pure = process_page("http://t.example/", html, cosine_config=cfg)
    clusters = json.loads(pure["extracted_content"])
    assert len(clusters) >= 2
    assert all(set(c) == {"index", "tags", "content"} for c in clusters)

    pages = spark.createDataFrame(
        [("http://t.example/", html.encode())], "url string, html binary")
    row = process_pages(pages, cosine_config=cfg).collect()[0]
    assert row.extracted_content == pure["extracted_content"]


# ---------------------------------------------- large-star/small-star (r4)

def test_bigstar_chain_converges_logarithmically(spark):
    """A 200-node path graph is min-label propagation's worst case
    (O(n) rounds to drag label 0 down the chain); large-star/small-star
    must collapse it to one component rooted at 0 within the 30-round cap
    (O(log n) — the Kiveris et al. convergence bound)."""
    from pyspark.sql import functions as F

    from crawl4ai_spark.ops.clusterq import connected_components_bigstar

    n = 200
    nodes = spark.range(n).select(F.col("id").alias("node"))
    pairs = spark.range(n - 1).select(
        F.col("id").alias("v1"), (F.col("id") + 1).alias("v2"))
    out = connected_components_bigstar(nodes, pairs).collect()
    assert len(out) == n
    assert all(r.cluster_id == 0 and r.cluster_size == n for r in out)


def test_bigstar_isolated_and_multi_component(spark):
    from pyspark.sql import functions as F

    from crawl4ai_spark.ops.clusterq import connected_components_bigstar

    nodes = spark.range(10).select(F.col("id").alias("node"))
    # components: {0,1,2}, {5,6}, isolated 3,4,7,8,9
    pairs = spark.createDataFrame(
        [(1, 0), (2, 1), (6, 5)], "v1 long, v2 long")
    rows = {r.vec_id: (r.cluster_id, r.cluster_size)
            for r in connected_components_bigstar(nodes, pairs).collect()}
    assert rows[0] == (0, 3) and rows[1] == (0, 3) and rows[2] == (0, 3)
    assert rows[5] == (5, 2) and rows[6] == (5, 2)
    for iso in (3, 4, 7, 8, 9):
        assert rows[iso] == (iso, 1)
