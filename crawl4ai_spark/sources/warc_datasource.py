"""WARC as a first-class Spark data source (Spark 4 Python DataSource
API): ``spark.read.format("warc").load("/segments/*.warc")`` — the
idiomatic-Spark face of the S12 read path, next to the mapInPandas
helper ``sources.rawpages.pages_from_warc`` (same parser, same output
schema, byte-identical rows — tested).

Why a DataSource and not just the helper: the format registers into
Spark's planner, so a WARC directory composes with everything that
expects ``spark.read`` — schema is declared once, partition planning is
explicit (ONE partition per segment file, the natural Common-Crawl unit:
segments are independently parseable ~1 GB archives), and the reader
runs on executors with no driver-side byte movement. Column pruning
happens naturally downstream (html is the only wide column and Spark
drops it right after the scan when unreferenced).

Scale shape: partitions() enumerates segment paths driver-side (cheap —
paths only); read() parses one segment per task via the from-scratch
framing parser (``html/warc.py``), which walks plain and
member-per-record ``.warc.gz`` layouts transparently. Parsing never
shuffles; a 1000-executor cluster gets file-level parallelism for free.
"""

from __future__ import annotations

import datetime as _dt
import glob as _glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

PAGES_DDL = ("url string, warc_ts timestamp, html binary,"
             " text string, lang string")


class WarcSegmentPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("format('warc') needs .load(<path or glob>)")
        if os.path.isdir(path):
            path = os.path.join(path, "*")
        self.files = sorted(
            p for p in _glob.glob(path)
            if os.path.isfile(p))
        if not self.files:
            raise ValueError(f"no WARC segments match {path!r}")

    def partitions(self):
        # one partition per segment file — the Common-Crawl work unit
        return [WarcSegmentPartition(p) for p in self.files]

    def read(self, partition: WarcSegmentPartition):
        # executor-side: parse ONE segment, yield pages rows
        from crawl4ai_spark.html.warc import parse_warc

        with open(partition.path, "rb") as f:
            data = f.read()
        for r in parse_warc(data):
            if r["warc_type"] != "response":
                continue
            ts = _dt.datetime.strptime(
                r["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=_dt.timezone.utc)
            yield (r["uri"], ts, r["payload"], None, None)


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` →
    ``spark.read.format("warc").load(glob)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return PAGES_DDL

    def reader(self, schema) -> WarcDataSourceReader:
        return WarcDataSourceReader(self.options)


WET_DDL = "url string, warc_ts timestamp, text string"


class WetDataSourceReader(WarcDataSourceReader):
    def read(self, partition: WarcSegmentPartition):
        from crawl4ai_spark.html.warc import parse_warc

        with open(partition.path, "rb") as f:
            data = f.read()
        for r in parse_warc(data):
            if r["warc_type"] != "conversion":
                continue
            ts = _dt.datetime.strptime(
                r["date"], "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=_dt.timezone.utc)
            yield (r["uri"], ts, r["payload"].decode("utf-8"))


class WetDataSource(DataSource):
    """``spark.read.format("wet")`` — extracted-text segments, the table
    most corpus pipelines actually start from (they never touch the WARC
    html at all)."""

    @classmethod
    def name(cls) -> str:
        return "wet"

    def schema(self) -> str:
        return WET_DDL

    def reader(self, schema) -> WetDataSourceReader:
        return WetDataSourceReader(self.options)


# ----------------------------------------------------------- streaming read
# ``spark.readStream.format("warc")`` — segment-granular exactly-once
# streaming: the offset is an index into the SORTED segment listing, so
# each micro-batch claims the files that appeared since the last one
# (CC-style drops land as whole new segment files; a file is the atomic
# publish unit, exactly like Spark's built-in file source). partitions()
# hands each claimed file to its own task — the batch reader's
# partition-per-segment shape carried into Structured Streaming.


class _WarcStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("format('warc') needs .load(<path or glob>)")
        if os.path.isdir(path):
            path = os.path.join(path, "*")
        self.glob = path

    def _listing(self) -> list[str]:
        return sorted(
            p for p in _glob.glob(self.glob) if os.path.isfile(p))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def latestOffset(self) -> dict:
        return {"idx": len(self._listing())}

    def partitions(self, start: dict, end: dict):
        files = self._listing()
        return [WarcSegmentPartition(p)
                for p in files[start["idx"]:end["idx"]]]

    def read(self, partition: WarcSegmentPartition):
        return WarcDataSourceReader.read(self, partition)  # same rows

    def commit(self, end: dict) -> None:
        pass


class WarcStreamingDataSource(WarcDataSource):
    def streamReader(self, schema) -> _WarcStreamReader:
        return _WarcStreamReader(self.options)


def register_warc_datasource(spark) -> None:
    spark.dataSource.register(WarcStreamingDataSource)
    spark.dataSource.register(WetDataSource)
