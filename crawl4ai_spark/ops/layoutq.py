"""Data-layout operators: Z-order clustering + min-max file pruning.

The 100 TB story the other operators lean on ("filters reach the parquet
scan") depends on HOW the table was laid out when it was written: parquet /
Iceberg scans skip a file when the query's predicate cannot intersect the
file's min/max column stats, and a file only has tight min/max ranges if
the writer CLUSTERED rows before splitting them into files. For the crawl
store's two natural probe dimensions — who (user/host bucket) and when
(time bucket) — a lexicographic sort clusters only the leading dimension;
interleaving the dimensions' bits (Morton / Z-order, the layout
`OPTIMIZE ... ZORDER BY` computes in Delta/Iceberg) keeps BOTH ranges tight
in every file, so a 2-D box probe skips most of the table no matter which
dimension it constrains.

``layout_zorder_prune`` measures exactly that, end to end and exactly:
three layouts of the same events table — ``ingest`` (as-arrived order, the
no-clustering baseline), ``lex`` (sort by user bucket then time bucket),
``zorder`` (sort by the interleaved Morton code) — split into fixed-size
files; per file the manifest row carries the min/max of both dimensions
(exactly the stats an Iceberg manifest records), whether a fixed 2-D probe
box can skip the file (``hit``), and the exact number of in-box rows, so
the output proves skipped files never contain matching rows.

Scale: the per-layout global rank uses the two-phase distributed pattern
(range-repartition by key → per-partition row_number → broadcast prefix
offsets — the q_shuffle_epoch discipline), so no single-partition global
window touches the corpus-sized input; the manifest aggregate is keyed by
file_id. The Morton code itself is 16 pure-arithmetic terms (div/mod by
powers of two — no engine-specific bit operators), identical in Spark and
DuckDB, exact integers throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from crawl4ai_spark.ops.common import tbl

ZBITS = 8                 # bits per dimension (z fits 16 bits)
ROWS_PER_FILE = 125       # demo file size: 8 files at sf0.001, 800 at sf0.1
# fixed probe box: users 0-63, 3-hour buckets 64-127 (days 8-16 of the month)
UB_LO, UB_HI = 0, 63
TB_LO, TB_HI = 64, 127

# dimension definitions shared by both engines (pure integer arithmetic):
#   ub = user_id mod 256; tb = (epoch seconds div 10800) mod 256
_EPOCH_SPARK = ("CAST(timestampdiff(SECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) AS BIGINT)")
_EPOCH_DUCK = "CAST(floor(epoch(ts)) AS BIGINT)"


def _morton(ub: str, tb: str, idiv: str) -> str:
    """Bit-interleave expression: z = sum_i bit_i(ub)*2*4^i + bit_i(tb)*4^i,
    using only div/mod so the same arithmetic runs in Spark (`div`) and
    DuckDB (`//`)."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(({ub}) {idiv} {1 << i}) % 2 * {2 * 4 ** i}")
        terms.append(f"(({tb}) {idiv} {1 << i}) % 2 * {4 ** i}")
    return " + ".join(terms)


N_BUCKETS = 16


def _ranked(df: DataFrame, key, layout: str) -> DataFrame:
    """Exact global rank by (key, event_id) without a global window: value-
    range buckets (key div bucket-width, width from a broadcast max-key
    scalar), per-bucket row_number, broadcast prefix-sum offsets.

    The bucket is a DETERMINISTIC function of the key value — unlike
    spark_partition_id() after repartitionByRange, whose pid→row mapping
    can differ between the two evaluations of this subtree (the offsets
    branch and the join branch) when AQE coalesces one of them differently,
    silently corrupting the offsets (observed: file sizes of 184/250 in the
    3-layout union while the standalone query ranked perfectly). Value
    buckets make both evaluations agree by construction. Skew note: bucket
    widths are uniform in key space, not row space — fine for these dims
    (event ids, 16-bit Morton codes); a production writer would sample
    boundaries once on the driver and inline them the same way."""
    keyed = df.withColumn("k", key.cast("long"))
    mx = keyed.agg(F.max("k").alias("mxk"))
    keyed = keyed.join(F.broadcast(mx))
    keyed = keyed.withColumn(
        "bucket", F.expr(f"k div ((mxk + {N_BUCKETS}) div {N_BUCKETS})"))
    w_local = Window.partitionBy("bucket").orderBy("k", "event_id")
    local = keyed.withColumn("r_local", F.row_number().over(w_local))
    counts = local.groupBy("bucket").agg(F.count("*").alias("cnt"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)))
    return (local.join(F.broadcast(offsets.select("bucket", "offset")),
                       "bucket")
            .withColumn("file_id", F.expr(
                f"CAST((r_local - 1 + offset) div {ROWS_PER_FILE}"
                " AS BIGINT)"))
            .withColumn("layout", F.lit(layout)))


def _manifest(ranked: DataFrame) -> DataFrame:
    in_box = ((F.col("ub") >= UB_LO) & (F.col("ub") <= UB_HI)
              & (F.col("tb") >= TB_LO) & (F.col("tb") <= TB_HI))
    return ranked.groupBy("layout", "file_id").agg(
        F.min("ub").cast("long").alias("min_ub"),
        F.max("ub").cast("long").alias("max_ub"),
        F.min("tb").cast("long").alias("min_tb"),
        F.max("tb").cast("long").alias("max_tb"),
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("long")
        .alias("rows_in_box"),
    )


def q_layout_zorder_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tbl(spark, sf_dir, "events").select(
        "event_id",
        F.expr(f"({_EPOCH_SPARK}) div 10800 % 256").cast("long").alias("tb"),
        F.expr("user_id % 256").cast("long").alias("ub"),
    )
    ev = ev.withColumn(
        "z", F.expr(_morton("ub", "tb", "div")).cast("long"))
    # every layout reduces to ONE bigint sort key (lex (ub, tb) == the
    # composite ub*256+tb since tb < 256), so the ranker is shared
    layouts = [
        _ranked(ev, F.col("event_id"), "ingest"),
        _ranked(ev, F.expr("ub * 256 + tb"), "lex"),
        _ranked(ev, F.col("z"), "zorder"),
    ]
    man = _manifest(layouts[0])
    for r in layouts[1:]:
        man = man.unionByName(_manifest(r))
    hit = ~((F.col("max_ub") < UB_LO) | (F.col("min_ub") > UB_HI)
            | (F.col("max_tb") < TB_LO) | (F.col("min_tb") > TB_HI))
    return man.select(
        "layout", "file_id", "min_ub", "max_ub", "min_tb", "max_tb",
        "n_rows", "rows_in_box", hit.alias("hit"))


def _sql_layout(key: str, layout: str) -> str:
    return f"""
  SELECT '{layout}' AS layout,
         CAST((row_number() OVER (ORDER BY {key}, event_id) - 1)
              // {ROWS_PER_FILE} AS BIGINT) AS file_id,
         ub, tb
  FROM dims"""


SQL_LAYOUT_ZORDER_PRUNE = f"""
WITH dims AS (
  SELECT event_id,
         CAST(({_EPOCH_DUCK}) // 10800 % 256 AS BIGINT) AS tb,
         CAST(user_id % 256 AS BIGINT) AS ub,
         CAST({_morton('user_id % 256',
                       f'({_EPOCH_DUCK}) // 10800 % 256', '//')}
              AS BIGINT) AS z
  FROM events
),
ranked AS ({_sql_layout('event_id', 'ingest')}
  UNION ALL {_sql_layout('ub, tb', 'lex')}
  UNION ALL {_sql_layout('z', 'zorder')}
)
SELECT layout, file_id,
       CAST(min(ub) AS BIGINT) AS min_ub, CAST(max(ub) AS BIGINT) AS max_ub,
       CAST(min(tb) AS BIGINT) AS min_tb, CAST(max(tb) AS BIGINT) AS max_tb,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN ub BETWEEN {UB_LO} AND {UB_HI}
                      AND tb BETWEEN {TB_LO} AND {TB_HI}
                     THEN 1 ELSE 0 END) AS BIGINT) AS rows_in_box,
       NOT (max(ub) < {UB_LO} OR min(ub) > {UB_HI}
            OR max(tb) < {TB_LO} OR min(tb) > {TB_HI}) AS hit
FROM ranked
GROUP BY layout, file_id
"""


QUERIES = {
    "layout_zorder_prune": q_layout_zorder_prune,
}
ORACLES = {
    "layout_zorder_prune": SQL_LAYOUT_ZORDER_PRUNE,
}
