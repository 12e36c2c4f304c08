"""SparkSession factory.

Pattern follows the reference's session bootstrap (reference
``distributor.py:92-121``: reuse ``getActiveSession`` else build a local
session), but with scale-oriented defaults: AQE on (skewed document shards —
page counts vary wildly), Arrow enabled for every Python boundary, UTC
session timezone so results are comparable with a DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "doc2dataset_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Reuse the active session if one exists, else build one.

    Defaults are tuned for local[N] testing but every knob is the one you
    would set on a real cluster too (AQE, skew join, Arrow batching).
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound the JVM<->Python Arrow batch size: plays the role of the
        # reference's Semaphore(2*threads) backpressure (downloader.py:274-283)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS) which Spark has no native
        # type for; read as raw nanos and convert in load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    # Scale-dependent overrides without code edits: semicolon-separated
    # key=value pairs (e.g. a cluster profile raising
    # advisoryPartitionSizeInBytes, or the optimization-round A/B harness
    # toggling one conf per session). Applied last so they win over both
    # the defaults above and extra_conf.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        if k and v:
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def compute_parallelism(spark: SparkSession) -> int:
    """The session's effective parallelism, for sizing explicit repartitions
    of tiny inputs (a single small parquet file arrives as ONE partition and
    would serialize CPU-heavy downstream work). min(defaultParallelism,
    shuffle partitions): defaultParallelism tracks actual cores (the right
    scale for spreading a SMALL input), capped by the shuffle conf where an
    operator tuned it lower. Taking the shuffle conf alone is a trap — a
    VANILLA session (the round driver hands us one) carries the stock 200,
    and REPARTITION_BY_NUM is exempt from AQE coalescing, so tiny gate
    queries would pay 200-task scheduling overhead. Never a hardcoded core
    count: the same code must size itself correctly on an 8-core laptop
    and a 1000-executor cluster."""
    dp = spark.sparkContext.defaultParallelism
    try:
        return min(dp, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        return dp


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_ts(df, col: str = "ts"):
    """Normalize the events timestamp column to a session-TZ TimestampType
    regardless of how the parquet encoded it: TIMESTAMP(NANOS) read as raw
    nanos (legacy.parquet.nanosAsLong) becomes µs via integer DIV (never
    float division, which loses precision above 2^53); a µs file without
    the UTC annotation reads as TIMESTAMP_NTZ and is cast (session TZ is
    pinned UTC, so the cast is value-preserving). Shared by the batch
    loader and the streaming reader so the two can never diverge."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get(col)
    if ts_type == "bigint":
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one synthetic table (TESTDATA.md layout).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark cannot represent;
    it is read as raw nanos (legacy.parquet.nanosAsLong) and converted to a
    microsecond TimestampType here (integer DIV — never float division, which
    loses precision above 2^53).
    """
    # the caller may hand us a vanilla session (the driver does): pin the
    # runtime-settable confs our queries depend on
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
