"""layout_zorder_prune (ops/layoutq.py) vs a from-spec python
reimplementation (independent Morton interleave via int bit ops, plain
sorts, Counter-free manifest), plus the semantic safety property that makes
min/max pruning sound: a file whose stats reject the probe box (hit=False)
must contain ZERO in-box rows."""

from collections import defaultdict

import duckdb

from crawl4ai_spark.ops.layoutq import (
    ROWS_PER_FILE, TB_HI, TB_LO, UB_HI, UB_LO, q_layout_zorder_prune)

SF = "/root/testdata/sf0.001"


def _dims():
    rows = duckdb.sql(f"""
      SELECT event_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 10800 % 256 AS tb,
             user_id % 256 AS ub
      FROM '{SF}/events.parquet'""").fetchall()
    return [(int(e), int(tb), int(ub)) for e, tb, ub in rows]


def _morton(ub: int, tb: int) -> int:
    z = 0
    for i in range(8):
        z |= ((ub >> i) & 1) << (2 * i + 1)
        z |= ((tb >> i) & 1) << (2 * i)
    return z


def _manifest(rows, keyfn, layout):
    files = defaultdict(list)
    for rank, (e, tb, ub) in enumerate(sorted(rows, key=keyfn)):
        files[rank // ROWS_PER_FILE].append((ub, tb))
    out = {}
    for fid, dims in files.items():
        ubs = [u for u, _ in dims]
        tbs = [t for _, t in dims]
        in_box = sum(1 for u, t in dims
                     if UB_LO <= u <= UB_HI and TB_LO <= t <= TB_HI)
        hit = not (max(ubs) < UB_LO or min(ubs) > UB_HI
                   or max(tbs) < TB_LO or min(tbs) > TB_HI)
        out[(layout, fid)] = (min(ubs), max(ubs), min(tbs), max(tbs),
                              len(dims), in_box, hit)
    return out


def test_layout_zorder_matches_independent_impl(spark):
    rows = _dims()
    want = {}
    want.update(_manifest(rows, lambda r: (r[0],), "ingest"))
    want.update(_manifest(rows, lambda r: (r[2], r[1], r[0]), "lex"))
    want.update(_manifest(rows, lambda r: (_morton(r[2], r[1]), r[0]),
                          "zorder"))
    got = {(r["layout"], r["file_id"]):
           (r["min_ub"], r["max_ub"], r["min_tb"], r["max_tb"],
            r["n_rows"], r["rows_in_box"], r["hit"])
           for r in q_layout_zorder_prune(spark, SF).collect()}
    assert got == want
    # pruning soundness: a skipped file has zero in-box rows, and every
    # layout accounts for the identical in-box total
    assert all(v[5] == 0 for v in got.values() if not v[6])
    totals = defaultdict(int)
    for (layout, _), v in got.items():
        totals[layout] += v[5]
    assert len(set(totals.values())) == 1
