"""Snapshot-versioned table store (Iceberg-style semantics over parquet).

The north rule calls for Iceberg tables; no Iceberg runtime jar ships in this
sandbox, so this module provides the same *operational contract* behind one
small API that an Iceberg catalog could replace 1:1:

- every commit is atomic (data files written first, then a manifest JSON
  renamed into place — readers never see partial data);
- every table keeps its full snapshot history → time travel + resume from any
  snapshot id (the reference's CacheMode/CrawlState.save-load analog,
  /root/reference/crawl4ai/adaptive_crawler.py:53-131);
- append commits reference prior data files instead of rewriting them.

A crawl generation commits frontier/results/host_state/url_seen snapshots
with the same ``generation`` number — that tuple is the checkpoint.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- helpers -------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_dir(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_snapshots")

    def _manifest_path(self, table: str, sid: int) -> str:
        return os.path.join(self._manifest_dir(table), f"{sid:08d}.json")

    def snapshot_ids(self, table: str) -> list[int]:
        d = self._manifest_dir(table)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
        )

    def latest_id(self, table: str) -> int | None:
        ids = self.snapshot_ids(table)
        return ids[-1] if ids else None

    def _read_manifest(self, table: str, sid: int) -> dict:
        with open(self._manifest_path(table, sid)) as f:
            return json.load(f)

    # -- write ----------------------------------------------------------------
    def commit(self, table: str, df: DataFrame, *, mode: str = "overwrite",
               snapshot_id: int | None = None, meta: dict | None = None) -> int:
        """Write ``df`` as a new snapshot of ``table``. ``mode='append'``
        carries forward the previous snapshot's data dirs."""
        prev = self.latest_id(table)
        sid = snapshot_id if snapshot_id is not None else (0 if prev is None else prev + 1)
        data_dir = os.path.join(self._tdir(table), "data", f"s{sid:08d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(data_dir)

        dirs = [data_dir]
        if mode == "append" and prev is not None:
            dirs = self._read_manifest(table, prev)["dirs"] + dirs

        os.makedirs(self._manifest_dir(table), exist_ok=True)
        # the manifest records the table schema (Iceberg-style): readers
        # apply it explicitly instead of running a mergeSchema footer-scan
        # job over every data dir — at small batch sizes that inference job
        # per read per generation IS the fixed-cost floor
        manifest = {"id": sid, "dirs": dirs, "meta": meta or {},
                    "schema": df.schema.json()}
        tmp = self._manifest_path(table, sid) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table, sid))  # atomic publish
        return sid

    def commit_unified(self, df: DataFrame,
                       specs: list[tuple[str, str, str, dict]]) -> dict[str, int]:
        """ONE parquet write serving several tables: ``df`` (a tagged union)
        lands in a single shared data dir, then each ``(table, mode,
        filter_expr, meta)`` spec publishes a snapshot manifest referencing
        that dir with a row filter. This is how a crawl generation commits
        its result rows AND its frontier-log delta in one Spark action (the
        Iceberg single-commit-multiple-table-branch analog): the per-
        generation driver↔cluster round trips drop by one, which is the
        entire cost floor at small batch sizes. ``read`` applies the filter,
        so mixed manifests (legacy unfiltered dirs + shared tagged dirs)
        stay correct — filters must be written as
        ``col IS NULL OR col = 'tag'`` for that reason.

        Atomicity contract: the DATA lands in one atomic write, but the
        per-table manifests publish via N sequential renames, so a crash
        mid-publish can leave a prefix of ``specs`` committed (e.g. results
        without the matching frontier delta). All tmp manifests are staged
        BEFORE the first rename to narrow that window, and the engine heals
        the remainder at resume by rolling back manifests whose ``meta
        generation`` exceeds the frontier's (see ``drop_latest``)."""
        shared = os.path.join(self.root, "_unified",
                              f"u{uuid.uuid4().hex[:12]}")
        df.write.mode("overwrite").parquet(shared)
        staged: list[tuple[str, str, int]] = []  # (tmp, final, sid) per table
        for table, mode, filter_expr, meta in specs:
            prev = self.latest_id(table)
            sid = 0 if prev is None else prev + 1
            dirs = [shared]
            if mode == "append" and prev is not None:
                dirs = self._read_manifest(table, prev)["dirs"] + dirs
            os.makedirs(self._manifest_dir(table), exist_ok=True)
            manifest = {"id": sid, "dirs": dirs, "meta": meta or {},
                        "filter": filter_expr, "schema": df.schema.json()}
            final = self._manifest_path(table, sid)
            tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            staged.append((tmp, final, sid))
        sids: dict[str, int] = {}
        for (tmp, final, sid), (table, *_rest) in zip(staged, specs):
            os.replace(tmp, final)  # atomic per-table publish
            sids[table] = sid
        return sids

    def drop_latest(self, table: str) -> int | None:
        """Roll back the latest snapshot by removing its manifest (data dirs
        stay on disk — unreferenced, harmless). Used to heal the
        ``commit_unified`` crash window where a prefix of the per-table
        manifests published: the engine drops result snapshots whose
        generation exceeds the frontier's before resuming, so the re-run
        generation cannot append duplicate result rows. Returns the dropped
        snapshot id (None if the table has no snapshots)."""
        sid = self.latest_id(table)
        if sid is None:
            return None
        os.remove(self._manifest_path(table, sid))
        return sid

    def compact(self, spark: SparkSession, table: str,
                target_partitions: int | None = None) -> int | None:
        """Offline compaction: rewrite the CURRENT snapshot's (possibly many)
        append-accumulated data dirs into one dir and publish it as a new
        snapshot with identical rows — the Iceberg rewrite_data_files analog.
        History stays intact (older snapshots still reference the old dirs).
        Returns the new snapshot id, or None if the table doesn't exist."""
        sid = self.latest_id(table)
        if sid is None:
            return None
        df = self.read(spark, table)
        if target_partitions:
            df = df.repartition(target_partitions)
        return self.commit(table, df, mode="overwrite",
                           meta={**self.meta(table), "compacted_from": sid})

    def n_dirs(self, table: str) -> int:
        """Data-dir count of the current snapshot — the driver-side (zero
        Spark jobs) signal for append-accumulation: each append commit adds
        one dir, so this ≈ generations since the last compaction."""
        sid = self.latest_id(table)
        if sid is None:
            return 0
        return len(self._read_manifest(table, sid)["dirs"])

    def expire_snapshots(self, table: str, *, keep_last: int = 2,
                         protect: set[int] | None = None) -> list[int]:
        """Retention: drop the manifests of all but the most recent
        ``keep_last`` snapshots (the Iceberg ``expire_snapshots`` analog —
        completes the maintenance trilogy with :meth:`compact` and
        :meth:`vacuum`). Data files are NOT touched here: a file referenced
        by any retained snapshot must survive, and unreferenced files are
        reclaimed separately by :meth:`vacuum` — the same split Iceberg
        makes, so a crash between the two steps only leaves harmless
        orphans, never a broken reader. ``protect`` pins extra snapshot ids
        (e.g. a tagged release). Returns the expired ids."""
        ids = self.snapshot_ids(table)
        keep = set(ids[-max(keep_last, 1):]) | (protect or set())
        expired = [sid for sid in ids if sid not in keep]
        for sid in expired:
            os.remove(self._manifest_path(table, sid))
        return expired

    def vacuum(self, table: str) -> list[str]:
        """Garbage-collect data dirs referenced by NO remaining manifest —
        reclaims expired snapshots' exclusive files plus orphans from
        ``drop_latest`` rollbacks and crashed commits. Safe by
        construction: a dir with no manifest reference is invisible to
        every reader. Returns the removed dirs."""
        import shutil

        data_root = os.path.join(self._tdir(table), "data")
        if not os.path.isdir(data_root):
            return []
        live: set[str] = set()
        for sid in self.snapshot_ids(table):
            live.update(os.path.basename(d)
                        for d in self._read_manifest(table, sid)["dirs"])
        removed = []
        for name in sorted(os.listdir(data_root)):
            if name not in live:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(os.path.join(data_root, name))
        return removed

    def amend_meta(self, table: str, snapshot_id: int, extra: dict) -> None:
        """Merge extra keys into an existing snapshot's meta (driver-side
        bookkeeping discovered during/after the write, e.g. observed row
        counts). Same atomic rename discipline as commit."""
        path = self._manifest_path(table, snapshot_id)
        manifest = self._read_manifest(table, snapshot_id)
        manifest["meta"] = {**manifest.get("meta", {}), **extra}
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)

    # -- read ------------------------------------------------------------------
    def reset(self, table: str) -> int:
        """Publish an EMPTY snapshot (no data dirs): the table reads as
        absent again, but its history stays on disk for vacuum/audit. This
        is how a non-resume run over a dirty store truncates state tables —
        without it, append-mode commits would carry the previous crawl's
        dirs forward and a restarted crawl would silently merge stale
        results/backoff state into the new one."""
        prev = self.latest_id(table)
        sid = 0 if prev is None else prev + 1
        os.makedirs(self._manifest_dir(table), exist_ok=True)
        manifest = {"id": sid, "dirs": [], "meta": {}, "schema": None}
        tmp = self._manifest_path(table, sid) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table, sid))
        return sid

    def read_since(self, spark: SparkSession, table: str,
                   base_sid: int | None) -> DataFrame | None:
        """Read only the data dirs added AFTER snapshot ``base_sid`` (None
        → everything). This is how a restarted (non-resume) run scopes
        generation-filtered reads to ITS OWN rows: generation numbering
        restarts at 0 on a fresh start while the results table keeps the
        previous crawl's dirs (they are the CacheMode cache), so a plain
        read + filter(generation == g) would merge the old crawl's
        same-numbered rows back in."""
        sid = self.latest_id(table)
        if sid is None:
            return None
        m = self._read_manifest(table, sid)
        dirs = m["dirs"]
        if base_sid is not None:
            base = self._read_manifest(table, base_sid)
            old = set(base["dirs"])
            dirs = [d for d in dirs if d not in old]
        if not dirs:
            return None
        if m.get("schema"):
            from pyspark.sql.types import StructType
            df = spark.read.schema(
                StructType.fromJson(json.loads(m["schema"]))).parquet(*dirs)
        else:
            df = spark.read.option("mergeSchema", "true").parquet(*dirs)
        if m.get("filter"):
            df = df.filter(m["filter"])
            if "event_type" in df.columns:
                df = df.drop("event_type")
        return df

    def read(self, spark: SparkSession, table: str,
             snapshot_id: int | None = None) -> DataFrame | None:
        sid = snapshot_id if snapshot_id is not None else self.latest_id(table)
        if sid is None:
            return None
        m = self._read_manifest(table, sid)
        if not m["dirs"]:  # reset marker — the table reads as absent
            return None
        if m.get("schema"):
            # manifest-recorded schema (see commit): no footer-scan
            # inference job; files missing newer columns null-fill, files
            # with extra columns prune — both directions of the tagged-union
            # layout
            from pyspark.sql.types import StructType
            df = spark.read.schema(
                StructType.fromJson(json.loads(m["schema"]))).parquet(*m["dirs"])
        else:
            df = spark.read.option("mergeSchema", "true").parquet(*m["dirs"])
        if m.get("filter"):
            df = df.filter(m["filter"])
            if "event_type" in df.columns:
                df = df.drop("event_type")
        return df

    def meta(self, table: str, snapshot_id: int | None = None) -> dict:
        sid = snapshot_id if snapshot_id is not None else self.latest_id(table)
        if sid is None:
            return {}
        return self._read_manifest(table, sid).get("meta", {})
