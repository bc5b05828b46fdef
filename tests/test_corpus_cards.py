"""domain_gini (ops/domainq.py), events_assortativity (ops/graphq.py),
index_snippets (ops/indexq.py) vs naive from-spec reimplementations at
sf0.001. DuckDB parity runs in test_ops_parity; these pin the statistics
independently of both engines."""

import json
import re

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _domains():
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()

    def dom(i):
        i = int(i)
        if i % 4 == 0:
            return "dom0"
        if i % 4 == 1:
            return f"dom{1 + i % 3}"
        return f"dom{4 + i % 149}"

    df["domain"] = df["doc_id"].map(dom)
    return df


def _gini(xs):
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    return (2 * sum((i + 1) * x for i, x in enumerate(xs))
            - (n + 1) * s) * 1_000_000 // (n * s)


def test_domain_gini_naive_parity(spark):
    from crawl4ai_spark.ops.domainq import q_domain_gini
    df = _domains()
    g = df.groupby("domain").agg(n_docs=("doc_id", "count"),
                                 n_chars=("n_chars", "sum"))
    r = q_domain_gini(spark, SF).collect()[0]
    assert r.n_domains == len(g)
    assert r.total_docs == len(df)
    assert r.gini_docs_e6 == _gini(list(g["n_docs"]))
    assert r.gini_chars_e6 == _gini(list(g["n_chars"]))
    assert r.top_share_e6 == int(g["n_docs"].max()) * 1_000_000 // len(df)
    # the synthetic domain skew (dom0 owns a quarter of the corpus) must
    # register as real inequality
    assert r.gini_docs_e6 > 500_000


def _click_edges():
    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    df["k"] = df["props"].map(lambda p: int(json.loads(p)["k"]))
    und = set()
    for _, g in df.groupby("user_id"):
        ks = g.sort_values(["ts", "event_id"])["k"].tolist()
        for a, b in zip(ks, ks[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    return und


def test_assortativity_naive_parity(spark):
    from crawl4ai_spark.ops.graphq import q_events_assortativity
    und = _click_edges()
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    arcs = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    m = len(arcs)
    sj = sum(deg[a] for a, _ in arcs)
    sj2 = sum(deg[a] ** 2 for a, _ in arcs)
    sjk = sum(deg[a] * deg[b] for a, b in arcs)
    num = m * sjk - sj * sj
    var = m * sj2 - sj * sj
    want_r = (num * 1_000_000 + 2_000_000 * var) // var - 2_000_000
    r = q_events_assortativity(spark, SF).collect()[0]
    assert (r.m_arcs, r.sum_jk, r.sum_j, r.sum_j2) == (m, sjk, sj, sj2)
    assert (r.num, r.var_j, r.r_e6) == (num, var, want_r)
    assert -1_000_000 <= r.r_e6 <= 1_000_000


def test_snippets_naive_parity(spark):
    from crawl4ai_spark.ops.indexq import PHRASE, SNIP_CTX, q_index_snippets
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    k = len(PHRASE)
    want = {}
    for d, t in zip(df["doc_id"], df["text"]):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        hits = [i for i in range(len(toks) - k + 1)
                if toks[i:i + k] == PHRASE]
        if hits:
            fp = hits[0]
            lo = max(0, fp - SNIP_CTX)
            want[int(d)] = (fp, " ".join(toks[lo:fp + k + SNIP_CTX]))
    got = {r.doc_id: (r.first_pos, r.snippet)
           for r in q_index_snippets(spark, SF).collect()}
    assert got == want
    assert got  # phrase occurs: a 0-row pass is vacuous
    # every snippet must contain the phrase itself
    needle = " ".join(PHRASE)
    assert all(needle in s for _, s in got.values())


def test_chao1_naive_parity(spark):
    """vocab_chao1 vs a from-spec trigram tally: bias-corrected Chao1 and
    the Good-Turing unseen mass, exact integers."""
    from collections import Counter

    from crawl4ai_spark.ops.textstats import q_vocab_chao1
    df = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    c: Counter = Counter()
    for t in df["text"]:
        toks = re.findall(r"[a-z0-9]+", t.lower())
        for i in range(len(toks) - 2):
            c[" ".join(toks[i:i + 3])] += 1
    v, n = len(c), sum(c.values())
    f1 = sum(1 for x in c.values() if x == 1)
    f2 = sum(1 for x in c.values() if x == 2)
    r = q_vocab_chao1(spark, SF).collect()[0]
    assert (r.v_obs, r.n_instances, r.f1, r.f2) == (v, n, f1, f2)
    assert r.chao1_e6 == v * 1_000_000 + f1 * (f1 - 1) * 1_000_000 \
        // (2 * (f2 + 1))
    assert r.p0_e6 == f1 * 1_000_000 // n
    # richness must exceed the observed vocabulary (a live singleton tail)
    assert r.f1 > 0 and r.chao1_e6 > v * 1_000_000
