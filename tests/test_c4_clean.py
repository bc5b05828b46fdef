"""C4 heuristic cleaning (ops/cleanq.py q_c4_clean) — from-spec parity
and per-rule firing coverage on the injected hazards."""

import hashlib
from collections import defaultdict

from crawl4ai_spark.ops.cleanq import (
    C4_LINE_W,
    C4_MIN_SENTS,
    C4_MIN_WORDS,
    q_c4_clean,
)

SF = "/root/testdata/sf0.001"


def _h2(key: str, a: int) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[a:a + 2], 16)


def _spec_clean(doc_id: int, text: str):
    toks = text.split(" ")
    n_lines = (len(toks) - 1) // C4_LINE_W + 1
    kept_lines = []
    has_lorem = has_brace = False
    for ln in range(n_lines):
        line = " ".join(toks[ln * C4_LINE_W:(ln + 1) * C4_LINE_W])
        if doc_id % 97 == 0 and ln == 0:
            line += " lorem ipsum"
        elif doc_id % 89 == 0 and ln == 1:
            line += " {"
        key = f"{doc_id}:{ln}"
        if _h2(key, 2) < 8:
            line += " javascript"
        t = _h2(key, 0)
        line += "." if t < 154 else "?" if t < 180 else ""
        has_lorem |= "lorem ipsum" in line
        has_brace |= "{" in line
        kept = (line[-1:] in ".?"
                and len(line.split(" ")) >= C4_MIN_WORDS
                and "javascript" not in line)
        if kept:
            kept_lines.append(line)
    keep = (not has_lorem and not has_brace
            and len(kept_lines) >= C4_MIN_SENTS)
    return (n_lines, len(kept_lines), has_lorem, has_brace, keep,
            hashlib.md5(" ".join(kept_lines).encode()).hexdigest())


def test_matches_from_spec(spark):
    from crawl4ai_spark.ops.common import tbl

    docs = {r.doc_id: r.text for r in
            tbl(spark, SF, "documents").select("doc_id", "text").collect()}
    got = {r.doc_id: (r.n_lines, r.n_kept, r.has_lorem, r.has_brace,
                      r.keep, r.clean_md5)
           for r in q_c4_clean(spark, SF).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        assert got[doc_id] == _spec_clean(doc_id, text), doc_id


def test_every_rule_fires(spark):
    rows = q_c4_clean(spark, SF).collect()
    stats = defaultdict(int)
    for r in rows:
        if r.has_lorem:
            stats["lorem"] += 1
            assert not r.keep
        if r.has_brace:
            stats["brace"] += 1
            assert not r.keep
        if r.n_kept < r.n_lines:
            stats["line_dropped"] += 1
        if not r.keep and not r.has_lorem and not r.has_brace:
            stats["too_few_sents"] += 1
            assert r.n_kept < C4_MIN_SENTS
        if r.keep:
            stats["kept"] += 1
    # the construction makes every rule class non-empty
    assert all(stats[k] for k in
               ("lorem", "brace", "line_dropped", "too_few_sents", "kept")), \
        dict(stats)
    # hazard docs are rare by construction (1/97, 1/89) — the gate keeps
    # the bulk of the corpus
    assert stats["kept"] > len(rows) * 0.5


def test_stream_c4_gate_matches_batch(spark, tmp_path):
    """Streamed C4 verdicts across >=2 micro-batch files equal the batch
    query's per-doc keep set (stateless row-local gate)."""
    from crawl4ai_spark.streaming.stream import (
        run_stream_to_memory,
        stream_c4_gate,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d_dir = tmp_path / "docs"
    docs.filter("doc_id % 2 = 0").write.parquet(str(d_dir / "b0"))
    docs.filter("doc_id % 2 = 1").write.parquet(str(d_dir / "b1"))

    out = stream_c4_gate(spark, str(d_dir / "*" / "*.parquet"))
    run_stream_to_memory(out, "stream_c4_t")
    got = {r.doc_id: r.keep for r in
           spark.sql("SELECT * FROM stream_c4_t").collect()}
    want = {r.doc_id: r.keep for r in q_c4_clean(spark, SF).collect()}
    assert got == want and got
