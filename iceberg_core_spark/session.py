"""SparkSession factory with scale-aware defaults.

Defaults are tuned so the SAME code runs on local[32] for tests and on a
1000-executor cluster unchanged: AQE handles runtime re-planning (skew
joins, partition coalescing), shuffle-partition counts come from config
not code, and all I/O settings are expressed as sizes, not file counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for 100 TB readiness:
# - AQE on: runtime coalescing + skew-join splitting replaces hand-tuned
#   partition counts when data volume changes by 1000x.
# - 128 MiB scan partitions: matches Parquet row-group targets so one task
#   reads one row group; at 100 TB this yields ~800k tasks, which Spark's
#   scheduler handles, and AQE coalesces downstream.
# - broadcast threshold 64 MiB: dimension tables (region/nation/part/
#   supplier at any SF that fits) broadcast instead of shuffling the fact.
# - UTC session timezone: deterministic timestamp semantics everywhere.
_SCALE_DEFAULTS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.parquet.compression.codec": "snappy",
    # INT96 is deprecated and reads back as ns, confusing type probes.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
}


def get_spark(
    app_name: str = "iceberg-core-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    for this container; on a real cluster callers pass their own master /
    rely on spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_SCALE_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _nanos_columns(path: str) -> list[str]:
    """timestamp[ns] column names of a parquet file OR directory (reads
    one footer — schema is uniform across a table's files)."""
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        for dirpath, _dirs, names in os.walk(path):
            hit = next((n for n in sorted(names) if n.endswith(".parquet")), None)
            if hit:
                probe = os.path.join(dirpath, hit)
                break
        else:
            return []
    # Detect true INT64 TIMESTAMP(NANOS) columns from parquet metadata:
    # the arrow view alone also reports legacy INT96 as timestamp[ns],
    # which Spark reads fine and must NOT be nanos-long-converted.
    schema = pq.ParquetFile(probe).metadata.schema
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        if (col.physical_type == "INT64"
                and "nanoseconds" in str(col.logical_type)):
            out.append(col.name)
    return out


def load_table_raw(spark: SparkSession, sf_dir: str, name: str):
    """Read a table WITHOUT ns→µs timestamp conversion: nanos columns
    stay as raw longs. Use when a range predicate must push down to the
    parquet scan — a filter on the CONVERTED column sits above a
    computed expression and cannot push (full scan); a filter on the
    raw nanos long pushes to row-group skipping. Bound mapping for a
    µs-semantics range [lo, hi]:  raw_ns ∈ [lo_µs·1000, hi_µs·1000+999]
    (matches the truncation both load_table and DuckDB apply). Returns
    (df, nanos_cols)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(path), nanos_cols


_SIZE_SUFFIXES = {
    "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40,
}


def _size_bytes(val: str | int, default: int) -> int:
    """Parse a Spark byte-size config value. Spark accepts both plain
    longs and suffixed strings ('128m', '128MB', '4g'); sessions not
    built by get_spark can legitimately carry the suffixed form, so a
    bare int() would crash every spread() call in such a session."""
    try:
        s = str(val).strip().lower()
        for suf, mult in sorted(_SIZE_SUFFIXES.items(),
                                key=lambda kv: -len(kv[0])):
            if s.endswith(suf):
                return int(float(s[: -len(suf)]) * mult)
        return int(s)
    except (ValueError, TypeError):
        return default


def scan_partition_estimate(df) -> int:
    """Estimate a frame's SCAN partition count from file metadata alone
    — Spark's FilePartition formula (maxSplitBytes = min(maxPartitionBytes,
    max(openCostInBytes, totalPadded / defaultParallelism)); each file
    padded by the open cost) — without ``df.rdd.getNumPartitions()``,
    which forces an RDD conversion of the analyzed plan on every call
    (driver-side planning cost per query).

    Frames with NO input files (in-memory / post-shuffle / streaming)
    fall back to the RDD partition count — the only truth source there;
    a genuinely single-partition in-memory frame must not be reported
    as "already spread". Streaming frames (no RDD either) report
    defaultParallelism."""
    from urllib.parse import unquote, urlparse

    spark = df.sparkSession
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if not files:
        try:
            return df.rdd.getNumPartitions()
        except Exception:  # streaming frames have no RDD view
            return spark.sparkContext.defaultParallelism
    maxpb = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes",
                       str(128 * 1024 * 1024)),
        128 * 1024 * 1024)
    open_cost = _size_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes",
                       str(4 * 1024 * 1024)),
        4 * 1024 * 1024)
    total = 0
    for uri in files:
        p = unquote(urlparse(uri).path) if "://" in uri else uri
        try:
            total += os.path.getsize(p) + open_cost
        except OSError:
            total += maxpb  # unknown size: count as one full partition
    bytes_per_core = total // max(1, spark.sparkContext.defaultParallelism)
    split = min(maxpb, max(open_cost, bytes_per_core))
    return max(1, -(-total // split))


def spread(df, min_factor: int = 2):
    """Ensure enough partitions for CPU-bound per-row work.

    Small single-row-group parquet files scan as ONE task, serializing
    expression-heavy pipelines (hashing, tokenization) on one core. When
    the scan has fewer partitions than half the cluster's parallelism,
    round-robin repartition to full parallelism — the input is tiny by
    definition, so the shuffle costs ~nothing. At real scale the input
    already has >= parallelism partitions and this is a no-op (no
    shuffle inserted), so it is safe to leave in 100 TB paths.
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if scan_partition_estimate(df) < max(1, target // min_factor):
        return df.repartition(target)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-generated parquet table from an sf directory.

    Handles TIMESTAMP(NANOS) parquet columns (e.g. ``events.ts``), which
    Spark's reader rejects by default: reads them as raw nanos longs
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncates to
    microsecond TimestampType — the same ns→µs truncation DuckDB applies,
    so oracle comparisons see identical values.

    TIMESTAMP_NTZ columns (current driver datasets store ``events.ts``
    as TIMESTAMP(MICROS, isAdjustedToUTC=false)) are normalized to
    session-timezone TimestampType: streaming watermarks/windows accept
    only TIMESTAMP, and with the engine's pinned UTC session timezone
    the wall-clock values are unchanged — DuckDB sees the identical
    naive values either way.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_columns(path)
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    for f in df.schema.fields:
        if isinstance(f.dataType, TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df
