"""Approximate / mergeable aggregation surface — the 100 TB cardinality
and quantile toolkit.

Exact distinct counts and exact percentiles both require a shuffle of
every distinct value (or a full sort); at 100 TB the sketch versions
are the default and the exact forms the exception:

- ``approx_count_distinct``: HyperLogLog++, fixed-size state per
  group, map-side mergeable (relative error ~ 1.04/sqrt(2^p)).
- ``hll_sketch_agg`` / ``hll_union_agg`` (Apache DataSketches HLL):
  the PERSISTABLE variant — write per-partition/per-day sketch blobs,
  union them later for any rollup window without rescanning the data.
  This is the pattern for "distinct users per day / week / all-time"
  over an append-only 100 TB event log: sketch once at ingest,
  merge-at-read forever after.
- ``approx_percentile``: one-pass quantiles (KLL-style bounded
  state) vs the exact sort-based ``percentile``.

(Spark also has ``F.count_min_sketch`` for frequency state, but no
SQL-side estimator to query the blob, so heavy hitters are served by
exact ``groupBy.count`` + ``orderBy.limit`` — Catalyst compiles that
to partial-agg + TakeOrderedAndProject, no full sort.)

None of these are DuckDB-hash-comparable (approximate results differ
per implementation), so they are verified by pytest error-bound and
merge-associativity assertions instead of driver oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_estimate(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.02
) -> DataFrame:
    """Per-group HLL++ distinct estimate (fixed state, mergeable)."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("distinct_est")
    )


def sketch_column(df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12) -> DataFrame:
    """Materialize a DataSketches-HLL blob per group — the writable
    artifact for sketch-once / merge-forever rollups."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def merge_sketches(df: DataFrame, group_cols: list[str], sketch_col: str = "hll_sketch") -> DataFrame:
    """Union previously-materialized sketches up to a coarser grouping
    (day → month, partition → table) and estimate the union distinct."""
    merged = df.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias("hll_sketch")
    )
    return merged.withColumn(
        "distinct_est", F.hll_sketch_estimate("hll_sketch").cast("long")
    )


def quantile_estimates(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float],
    accuracy: int = 10000,
) -> DataFrame:
    """One-pass approximate quantiles per group."""
    return df.groupBy(*group_cols).agg(
        F.approx_percentile(
            value_col, F.array(*[F.lit(q) for q in quantiles]), F.lit(accuracy)
        ).alias("quantiles")
    )
