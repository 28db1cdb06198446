"""SparkSession construction + table loading.

Scale notes (100 TB design):

- AQE is enabled: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast conversion replace hand-tuned
  ``spark.sql.shuffle.partitions`` at cluster scale.
- ``shuffle.partitions`` default here (32) matches local[32]; on a real
  cluster this is set to 2-3x total cores and AQE coalesces down.
  Override locally with ``SPARK_GRAFT_SHUFFLE_PARTITIONS`` (the scale
  probe's ``--shuffle-partitions=`` uses it to demonstrate that x1000
  spills are rig artifacts: same plan, cluster-shaped partition count
  and heap, zero spill — SCALE.md).
- Arrow is enabled for every pandas-UDF boundary.
- Parquet readers are vectorized by default; filters/column pruning push
  into the scan (verify with ``plans.describe.explain_str``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

#: dimension-sized tables that should always be broadcast in joins
DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "confluent-kafka-streams-examples-spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for local[N] testing but with
    configs that carry to a multi-executor cluster unchanged."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # shuffle/spill files on tmpfs when available: this host's block
    # device is slow enough to dominate small-shuffle latency (measured
    # 25x on a 260k-row distinct); on a real cluster spark.local.dir is
    # provisioned NVMe and this branch is a no-op
    local_dir = None
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.shuffle.spill.compress", "true")
        # driver testdata stores events.ts as INT64 TIMESTAMP(NANOS), which
        # the vectorized reader rejects; read as long and convert in
        # load_table (integer ns -> us, no precision loss)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if not os.environ.get("MASTER") and not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    # getOrCreate IGNORES builder configs when a session already lives
    # in this process; shuffle.partitions is runtime-settable, so apply
    # the override on the live session too — otherwise the probe knob
    # silently no-ops and a spill comparison measures the default
    shuffle_override = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if shuffle_override:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle_override)
    return spark


def _resolved_schema(spark: SparkSession, path: str, stamp_path: str | None = None):
    """Parquet schema for ``path``, resolved ONCE per (session, file
    version) and cached on the session object.

    ``spark.read.parquet`` with an inferred schema costs 60-90 ms of
    driver-side work per call (file listing + footer read + relation
    construction via py4j) — pure fixed overhead that a registry of
    138 queries pays 1-4x per query per run.  Supplying the cached
    schema explicitly (``spark.read.schema(s).parquet``) skips the
    inference and drops the call to ~12 ms, exactly the
    schemas-from-a-catalog shape a production metastore provides.

    The cache key carries the file's mtime+size, so a regenerated
    table re-infers instead of reading stale metadata.  ``stamp_path``
    substitutes a different file for the staleness stamp — artifact
    directories use their write-once manifest, because the directory's
    own mtime is touched on every read-refresh.  Only the SCHEMA is
    cached, never a DataFrame handle: every call still builds a fresh
    relation with fresh attribute ids, so self-joins of two load_table
    calls resolve exactly as before."""
    try:
        st = os.stat(stamp_path if stamp_path is not None else path)
        stamp = (st.st_mtime_ns, st.st_size)
    except OSError:
        stamp = None
    cache = getattr(spark, "_ckse_schema_cache", None)
    if cache is None:
        cache = {}
        spark._ckse_schema_cache = cache
    key = (path, stamp)
    schema = cache.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        cache[key] = schema
    return schema


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one driver-generated parquet table.

    Reads via ``spark.read.schema(...).parquet`` (schema resolved once
    per session — see ``_resolved_schema``) so predicate pushdown /
    column pruning reach the scan; callers should ``.select`` only
    needed columns.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Driver testdata has shipped timestamps in three physical forms across
    # rounds: INT64 TIMESTAMP(NANOS), TIMESTAMP(MICROS, UTC-adjusted) and
    # TIMESTAMP(MICROS, NTZ).  Both confs below are dynamic, so set them here
    # so the engine works under ANY caller-provided SparkSession (driver
    # contract), not just sessions built by get_spark().  UTC pins the
    # NTZ->LTZ cast so integer-microsecond time arithmetic matches DuckDB's
    # epoch_us over the same naive parquet values.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _resolved_schema(spark, path)
    df = spark.read.schema(schema).parquet(path)
    for field in schema.fields:
        if field.name != "ts":
            continue
        if field.dataType.typeName() == "long":
            # TIMESTAMP(NANOS) read as long ns -> integer-divide to us
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.dataType.typeName() == "timestamp_ntz":
            # NTZ -> LTZ at UTC (exact: same micros DuckDB sees)
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load all tables as a dict (lazy — no IO until an action)."""
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


#: byte-unit suffixes accepted by Spark conf values (JavaUtils.byteStringAs);
#: bare integers are bytes, per spark.sql.files.maxPartitionBytes docs
_BYTE_SUFFIXES = {
    "b": 1,
    "k": 1024, "kb": 1024,
    "m": 1024 ** 2, "mb": 1024 ** 2,
    "g": 1024 ** 3, "gb": 1024 ** 3,
    "t": 1024 ** 4, "tb": 1024 ** 4,
    "p": 1024 ** 5, "pb": 1024 ** 5,
}


def _parse_byte_string(raw: str, default: int) -> int:
    """Parse a Spark byte-string conf value ('134217728', '128m', '1g')
    with JavaUtils.byteStringAsBytes semantics.  Stripping non-digits —
    the previous implementation — turned '128m' into 128 BYTES, which
    inflated the estimated partition count ~10^6x and silently disabled
    the fan-out guard (fails safe, but defeats the optimization)."""
    s = raw.strip().lower()
    i = len(s)
    while i > 0 and not s[i - 1].isdigit():
        i -= 1
    num, suffix = s[:i], s[i:].strip()
    if not num or not num.isdigit():
        return default
    mult = _BYTE_SUFFIXES.get(suffix, 1 if suffix == "" else None)
    if mult is None:
        return default
    return int(num) * mult


def fan_out_small_scan(df: DataFrame, narrow: DataFrame) -> DataFrame:
    """Parallelism guard for row-amplifying projections (the profiler
    stack x explode multiplies each scanned row ~30x INSIDE the scan
    stage): when the source's file metadata says the scan will produce
    fewer partitions than the cluster has cores, repartition the
    NARROW derived frame so the amplified work fans out; otherwise
    return it untouched.

    The decision is driver-side metadata only (file list + sizes vs
    ``spark.sql.files.maxPartitionBytes``) — no job runs.  At real
    scale a table has orders of magnitude more files than cores, the
    estimate exceeds the core count, and this is a NO-OP: the shuffle
    exists only in the small-file rig regime (one ~50 MB parquet file
    = one scan partition = one core hashing a 30x explosion, measured
    4x the whole-query cost at sf0.1), where shuffling the narrow rows
    costs far less than serializing the amplified stage."""
    import urllib.parse

    spark = df.sparkSession
    try:
        files = [
            urllib.parse.urlparse(f).path for f in df.inputFiles()
        ]
        total = sum(os.stat(f).st_size for f in files)
    except Exception:
        return narrow
    if not files:
        return narrow
    maxpb_raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    maxpb = _parse_byte_string(str(maxpb_raw), default=134217728)
    est_partitions = max(len(files), total // maxpb + 1)
    cores = spark.sparkContext.defaultParallelism
    if est_partitions * 2 < cores:
        return narrow.repartition(cores)
    return narrow


def release_caches(spark: SparkSession) -> None:
    """Registry-level cache teardown.

    Several queries ``persist()`` an intermediate (MinHash signatures,
    IVF bucket assignments, shared-shingle counts, ...) because the plan
    reuses it on two branches.  The persist is scoped to the QUERY, not
    the session: a long-lived session running many registered queries
    must release those blocks after each result is consumed, or the
    executor storage pool accumulates one cache per persisting query.

    ``Catalog.clearCache`` drains Spark's CacheManager, which owns every
    ``DataFrame.persist``/``cache`` entry as well as cached tables, so a
    single call releases everything a query pinned.  ``bench.py`` calls
    this after every rep; external harnesses that collect query results
    should do the same between queries.
    """
    spark.catalog.clearCache()


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so users can drive the engine
    through ``spark.sql(...)`` — Catalyst produces the same plans as the
    DataFrame API, so the whole SQL surface comes free."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
