"""SnapshotStore unit coverage (r4): manifest-recorded schemas, unified
commits, and the crash-window heal primitives — exercised directly, not
just through the engine e2e paths."""

import json
import os

import pytest

from pyspark.sql import functions as F

from crawl4ai_spark.sources.snapshots import SnapshotStore


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "store"))


def test_manifest_records_schema_and_read_skips_mergeschema(spark, store):
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("x"))
    sid = store.commit("t", df)
    m = store._read_manifest("t", sid)
    assert "schema" in m
    names = [f["name"] for f in json.loads(m["schema"])["fields"]]
    assert names == ["id", "x"]
    out = store.read(spark, "t")
    assert out.columns == ["id", "x"] and out.count() == 5


def test_append_with_wider_schema_nullfills_older_dirs(spark, store):
    store.commit("t", spark.range(3).select("id"))
    wider = spark.range(3, 6).select("id", F.lit("v").alias("extra"))
    store.commit("t", wider, mode="append")
    out = store.read(spark, "t")
    assert set(out.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in out.collect()}
    assert rows[0] is None and rows[4] == "v"  # old files null-fill
    assert len(rows) == 6


def test_read_with_narrower_recorded_schema_prunes_extras(spark, store):
    # files carry MORE columns than the recorded schema → pruned on read
    wide = spark.range(4).select("id", F.lit(1).alias("junk"))
    sid = store.commit("t", wide)
    m = store._read_manifest("t", sid)
    schema = json.loads(m["schema"])
    schema["fields"] = [f for f in schema["fields"] if f["name"] == "id"]
    m["schema"] = json.dumps(schema)
    with open(store._manifest_path("t", sid), "w") as f:
        json.dump(m, f)
    out = store.read(spark, "t")
    assert out.columns == ["id"] and out.count() == 4


def test_legacy_manifest_without_schema_falls_back(spark, store):
    sid = store.commit("t", spark.range(3))
    m = store._read_manifest("t", sid)
    del m["schema"]
    with open(store._manifest_path("t", sid), "w") as f:
        json.dump(m, f)
    assert store.read(spark, "t").count() == 3  # mergeSchema fallback


def test_commit_unified_filters_and_schemas(spark, store):
    a = spark.range(3).select(F.col("id"), F.lit("r").alias("event_type"))
    b = spark.range(10, 12).select(F.col("id"), F.lit("f").alias("event_type"))
    sids = store.commit_unified(a.unionByName(b), [
        ("res", "append", "event_type IS NULL OR event_type = 'r'", {"generation": 0}),
        ("fro", "append", "event_type IS NULL OR event_type = 'f'", {"generation": 0}),
    ])
    assert sids == {"res": 0, "fro": 0}
    assert {r.id for r in store.read(spark, "res").collect()} == {0, 1, 2}
    assert {r.id for r in store.read(spark, "fro").collect()} == {10, 11}
    # event_type is dropped after the filter
    assert store.read(spark, "res").columns == ["id"]


def test_drop_latest_rolls_back_one_snapshot(spark, store):
    store.commit("t", spark.range(2), meta={"generation": 0})
    store.commit("t", spark.range(5), meta={"generation": 1})
    assert int(store.meta("t")["generation"]) == 1
    dropped = store.drop_latest("t")
    assert dropped == 1
    assert int(store.meta("t")["generation"]) == 0
    assert store.read(spark, "t").count() == 2
    assert store.drop_latest("missing") is None


def test_expire_snapshots_retention(spark, store):
    for k in range(5):
        store.commit("t", spark.range(k, k + 3).select("id"),
                     mode="append")
    assert store.snapshot_ids("t") == [0, 1, 2, 3, 4]
    rows_latest = {r.id for r in store.read(spark, "t").collect()}

    expired = store.expire_snapshots("t", keep_last=2, protect={0})
    assert expired == [1, 2]
    assert store.snapshot_ids("t") == [0, 3, 4]
    # latest snapshot unchanged; time travel to retained ids still works
    assert {r.id for r in store.read(spark, "t").collect()} == rows_latest
    assert store.read(spark, "t", snapshot_id=0).count() == 3
    # expired ids are gone cleanly
    with pytest.raises(FileNotFoundError):
        store.read(spark, "t", snapshot_id=2)


def test_vacuum_reclaims_only_unreferenced_dirs(spark, store):
    for k in range(4):
        store.commit("t", spark.range(k, k + 2).select("id"),
                     mode="append")
    data_root = os.path.join(store._tdir("t"), "data")
    assert len(os.listdir(data_root)) == 4

    # nothing unreferenced yet — vacuum is a no-op
    assert store.vacuum("t") == []

    # append history: snapshot 3 references ALL four dirs, so expiring
    # 0..2 frees nothing until compaction rewrites the live snapshot
    store.expire_snapshots("t", keep_last=1)
    assert store.vacuum("t") == []
    rows = {r.id for r in store.read(spark, "t").collect()}

    store.compact(spark, "t")            # rewrite live rows into one dir
    store.expire_snapshots("t", keep_last=1)
    removed = store.vacuum("t")
    assert len(removed) == 4             # the four pre-compaction dirs
    assert len(os.listdir(data_root)) == 1
    assert {r.id for r in store.read(spark, "t").collect()} == rows


def test_vacuum_reclaims_drop_latest_orphans(spark, store):
    store.commit("t", spark.range(3).select("id"))
    store.commit("t", spark.range(9).select("id"), mode="overwrite")
    store.drop_latest("t")               # rollback leaves dir 1 orphaned
    removed = store.vacuum("t")
    assert len(removed) == 1
    assert store.read(spark, "t").count() == 3


def test_maintenance_trilogy_preserves_engine_resume(spark, tmp_path):
    """compact -> expire -> vacuum on a real crawl store must leave the
    latest checkpoint resumable with an identical result set."""
    from crawl4ai_spark.engine import CrawlConfig, SparkWebEngine
    from crawl4ai_spark.sources.pagesgen import (
        generate_pages,
        generate_seeds,
    )

    pages = generate_pages(spark, 2, 8)
    seeds = generate_seeds(spark, 2)
    eng = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng.run(pages, seeds, config=CrawlConfig(max_depth=2, max_pages=30))
    before = {(r.url, r.status_code) for r in
              eng.results().select("url", "status_code").collect()}

    st = eng.store
    for table in ("results", "frontier"):
        if st.latest_id(table) is None:
            continue
        st.compact(spark, table)
        st.expire_snapshots(table, keep_last=1)
        st.vacuum(table)

    eng2 = SparkWebEngine(spark, str(tmp_path / "s1"))
    eng2.run(pages, seeds, config=CrawlConfig(max_depth=2, max_pages=30),
             resume=True)
    after = {(r.url, r.status_code) for r in
             eng2.results().select("url", "status_code").collect()}
    assert after == before and before
