"""Skew and co-location tooling for 100 TB shuffles.

- salted_aggregate: two-phase aggregation for hot keys — phase 1 spreads
  each key over N salt buckets (partial aggregate per (key, salt)),
  phase 2 merges the N partials.  Turns one straggler reducer into N
  parallel ones at the cost of a second (tiny) shuffle.
- salted_join: replicate the small side N times, salt the big side —
  an explicit fallback for when AQE's skew-join splitting isn't enough
  (or AQE is off, e.g. inside streaming queries where it's disabled).
- write_bucketed / bucketed_table: persist a table hash-bucketed by its
  join key so later joins/aggregations on that key are exchange-free.

AQE (enabled in session.get_spark) already splits skewed sort-merge
partitions at runtime; these helpers are for the cases it can't see —
aggregations (AQE only splits join partitions) and pre-planned layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (kind, input column), kind in
    {"sum", "count", "count*", "min", "max"} — the mergeable
    aggregates (avg is sum/count composed by the caller).  ``count``
    follows SQL count(col) semantics (NULLs skipped); ``count*`` is
    count(*) — every row, input column ignored (pass None).  Example::

        salted_aggregate(ev, ["user_id"], {"total": ("sum", "value"),
                                           "n": ("count*", None)})
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1_aggs = []
    phase2_aggs = []
    for out, (kind, col) in aggs.items():
        if kind == "count*":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif kind == "count":
            phase1_aggs.append(F.count(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif kind == "sum":
            phase1_aggs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.sum(f"_p_{out}").alias(out))
        elif kind == "min":
            phase1_aggs.append(F.min(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.min(f"_p_{out}").alias(out))
        elif kind == "max":
            phase1_aggs.append(F.max(col).alias(f"_p_{out}"))
            phase2_aggs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-mergeable aggregate kind {kind!r}")
    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side with rand(N), explode the
    small side N ways, join on (key, salt).  The hot key's rows land in
    N different reducers instead of one.

    Only ``inner`` and ``left`` (big-side-preserving) joins are valid:
    the small side is replicated per salt bucket, so a right/full join
    would emit each unmatched small-side row once PER BUCKET."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "the replicated small side would duplicate unmatched rows "
            "under right/full semantics"
        )
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    small_exploded = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_salted.join(small_exploded, [key, "_salt"], how).drop("_salt")


#: Per-task budget of PLAN-STATS bytes for an un-spillable
#: shuffle-hash build.  Parquet encoding is ~5-10x denser than the
#: UnsafeRow hashed relation, so 1 MB of stats bytes per task caps
#: each task's build map at ~5-10 MB regardless of corpus size.
STATS_BYTES_PER_TASK = 1 << 20

#: Any plan-stats estimate at or past this (1 PiB) is Catalyst's
#: defaultSizeInBytes PLACEHOLDER, not a measurement — sources with
#: no real stats (in-memory LogicalRDD, i.e. every createDataFrame
#: input) report ~Long.MaxValue.
_STATS_UNKNOWN_FLOOR = 1 << 50


def stats_sized_partitions(
    build: DataFrame,
    budget: int = STATS_BYTES_PER_TASK,
    ceiling: int = 65536,
) -> int:
    """Shuffle-partition count that keeps a shuffle-hash BUILD side's
    per-task hashed relation bounded as the corpus grows.

    A shuffle-hash build cannot spill, so inheriting the session's
    fixed shuffle-partition count makes per-task build memory
    corpus-LINEAR — a latent executor OOM at every scale jump.  The
    x1000-density band-join probe (100M events, 32 inherited
    partitions = 3.1M build rows/task) hit exactly that: ``Can't
    acquire 134217728 bytes memory to build hash relation``.
    Partition count, not per-task state, must carry the scale.

    The count derives from the build side's Catalyst plan-stats bytes
    (parquet-derived, free — no extra scan) at ``budget`` stats bytes
    per task.  Estimates >= 1 PiB are the no-stats placeholder
    (defaultSizeInBytes ~= Long.MaxValue for in-memory inputs) and are
    treated as unknown — otherwise a 4-row createDataFrame input slams
    the ceiling and schedules 65k no-op tasks.  Lower clamp
    (defaultParallelism) keeps every core busy at small scale; upper
    clamp bounds scheduler overhead — a corpus past it should band-join
    a time slice, not the whole stream."""
    stats_bytes = int(
        str(
            build._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    )
    if stats_bytes >= _STATS_UNKNOWN_FLOOR:
        stats_bytes = 0
    return min(
        max(
            build.sparkSession.sparkContext.defaultParallelism,
            -(-stats_bytes // budget),
        ),
        ceiling,
    )


def keyless_band_pairs(
    df: DataFrame,
    id_col: str,
    t_col: str,
    window: int,
    cell: int | None = None,
    salt_buckets: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """(a_id, a_t, b_id, b_t) pairs with ``|a_t - b_t| <= window`` over
    a KEYLESS stream — the time-band self-join decomposed into an
    equi-join on quantized time cells (cell size = ``window`` unless
    overridden): the probe side replicates into its cell and both
    neighbors (3x), the exact ``|dt|`` predicate is a post-filter.
    Exact with no dedup pass: the build row has exactly ONE cell, so
    every qualifying pair meets in exactly one bucket (and, salted,
    exactly one (bucket, salt)) — the output needs no DISTINCT.

    ``salt_buckets=S`` is the HOT-CELL (thundering-herd second) guard:
    the build side gets a deterministic salt ``pmod(xxhash64(id), S)``
    appended to the join key, the probe side replicates over all S
    salts (3*S total).  Any single cell's build rows then split across
    S reducers, bounding the largest join task at ~n_hot/S build rows —
    the explicit fallback for when the runtime can't see the skew (AQE
    splits sort-merge partitions, but only after the straggler
    materializes; pre-salting avoids planning it at all).  Cost: S x
    probe replication, so use it when one cell dwarfs the mean, not by
    default.  Results are salt-invariant (asserted in tests/test_skew.py
    against a thundering-herd fixture).

    ``cell`` may only be >= ``window``: with a narrower cell a pair's
    endpoints can sit 2+ cells apart and the 3-cell probe replication
    would silently miss it, so that configuration raises instead of
    returning incomplete results.

    ``partitions`` sizes the join's co-partitioning; the default
    (None) derives it from the build side's Catalyst plan-stats bytes
    so the per-task hashed relation stays BOUNDED as the corpus grows
    — a shuffle-hash build cannot spill, so inheriting the session's
    fixed shuffle-partition count makes per-task build memory
    corpus-LINEAR, which is a latent OOM at every scale jump.  The
    x1000-density probe (100M events, 32 inherited partitions = 3.1M
    build rows/task) hit exactly that: `Can't acquire 134217728 bytes
    memory to build hash relation`.  Partition count, not per-task
    state, must carry the scale (same rule the streaming state ops
    follow).  Both sides repartition to the SAME N on the join keys,
    so the join itself adds no further exchange — the explicit
    repartition IS the join shuffle, just correctly sized."""
    if cell is not None and cell < window:
        raise ValueError(
            f"cell ({cell}) must be >= window ({window}): a narrower cell "
            "lets qualifying pairs land 2+ cells apart, outside the 3-cell "
            "probe replication — the join would silently drop them"
        )
    cell_size = cell or window
    e = df.select(F.col(id_col), F.col(t_col))
    cell_of = F.floor(F.col(t_col) / F.lit(cell_size)).cast("long")
    probe_cells = F.explode(F.array(cell_of - 1, cell_of, cell_of + 1))
    build = e.select(
        F.col(id_col).alias("b_id"),
        F.col(t_col).alias("b_t"),
        cell_of.alias("_bucket"),
    )
    probe = e.select(
        F.col(id_col).alias("a_id"),
        F.col(t_col).alias("a_t"),
        probe_cells.alias("_bucket"),
    )
    join_keys = ["_bucket"]
    if salt_buckets is not None:
        build = build.withColumn(
            "_salt", F.pmod(F.xxhash64("b_id"), F.lit(salt_buckets))
        )
        probe = probe.withColumn(
            "_salt",
            F.explode(F.array(*[F.lit(s) for s in range(salt_buckets)])),
        )
        join_keys.append("_salt")
    if partitions is None:
        partitions = stats_sized_partitions(build)
    build = build.repartition(partitions, *join_keys)
    probe = probe.repartition(partitions, *join_keys)
    # the build side is pinned SHUFFLE-HASH: both sides of a keyless
    # band join are the full event stream — corpus-linear by
    # construction, never a broadcast candidate.  Left unpinned, AQE
    # converts the build side to broadcast when its COMPRESSED shuffle
    # bytes dip under the threshold, and the in-memory hashed relation
    # (~10x the compressed size) OOMs the driver — measured at the
    # 100x-density probe (10M events: compressed ~60 MB, relation
    # ~1 GB; scripts/scale_probe.py).  Shuffle-hash builds only the
    # per-partition cell slice, which the cell decomposition bounds.
    return (
        probe.join(build.hint("shuffle_hash"), join_keys)
        .filter(
            (F.abs(F.col("a_t") - F.col("b_t")) <= window)
            & (F.col("a_id") != F.col("b_id"))
        )
        .select("a_id", "a_t", "b_id", "b_t")
    )


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 32
) -> None:
    """Persist hash-bucketed by the join key: subsequent joins or
    aggregations on ``key`` between bucketed tables are planned without
    an Exchange (the 100 TB answer to repeated joins on the same key).

    The pre-write ``repartition(buckets, key)`` aligns the shuffle with
    the bucket function (both are murmur3(key) mod buckets), so every
    task holds exactly one bucket and writes exactly one file — without
    it each of P input partitions writes a file per bucket it touches,
    a P x buckets small-file explosion at cluster scale.  One file per
    bucket is also what lets later sort-merge reads skip the per-bucket
    Sort.

    Overwrite is made re-entrant ACROSS sessions: a managed-table
    location left by a previous session's crash (or an in-memory
    catalog that forgot the table) would otherwise fail the write with
    LOCATION_ALREADY_EXISTS, so both the catalog entry and any orphaned
    location are dropped first (Hadoop FS API — works for any storage
    scheme, not just local disk).

    The orphan location is resolved through the SESSION CATALOG's own
    placement function (``defaultTablePath`` — the very API the write
    path uses to place a managed table), so the cleanup targets exactly
    the directory the subsequent ``saveAsTable`` will claim, for any
    current database and any metastore; string-building
    ``{warehouse.dir}/{name.lower()}`` remains only as a fallback for
    catalogs that do not expose the API.

    ``table_name`` must be UNQUALIFIED: a ``db.table`` name would need
    identifier parsing the cleanup does not do, so it is rejected."""
    if "." in table_name:
        raise ValueError(
            f"write_bucketed requires an unqualified table name, got "
            f"{table_name!r}: the orphan-location cleanup does not "
            "parse qualified identifiers and would target the wrong "
            "directory"
        )
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    sc = spark.sparkContext
    jvm = sc._jvm  # type: ignore[attr-defined]
    try:
        jcat = spark._jsparkSession.sessionState().catalog()  # type: ignore[attr-defined]
        ident = jvm.org.apache.spark.sql.catalyst.TableIdentifier.apply(
            table_name
        )
        loc = jvm.org.apache.hadoop.fs.Path(jcat.defaultTablePath(ident))
    except Exception:  # catalog without the API: derive the default layout
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(f"{wh}/{table_name.lower()}")
    fs = loc.getFileSystem(sc._jsc.hadoopConfiguration())  # type: ignore[attr-defined]
    fs.delete(loc, True)
    (
        df.repartition(buckets, key)
        .write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
