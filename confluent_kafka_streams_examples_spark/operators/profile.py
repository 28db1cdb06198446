"""One-scan table profiling — the first thing a platform points at a
new dataset: per column, row count, null count, and a portable-HLL
distinct estimate, computed the only way that holds at 100 TB.

Shape (see `queries_extra.events_profile` for the oracle-checked demo):
the caller's columns STACK into (col_name, val) rows inside the scan
projection — each value canonicalized to a string with integer-portable
casts so the md5-derived registers are engine-checkable — and ONE
two-level aggregation computes null/row counts and the HLL registers
together (nulls park in register -1), so the exchange carries at most
tasks x n_cols x 257 partials regardless of corpus size and the table
is read exactly once.  No per-column countDistinct (Spark would Expand
the scan once per distinct aggregate), no second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.operators.sketches import (
    HLL_DEN,
    HLL_M,
    HLL_NUM,
    HLL_RHO_SQL,
    hll_est_sql,
)


def canonical(col: Column) -> Column:
    """Default canonicalizer: cast to string (exact for integer and
    string columns).  Timestamps and floats need an explicit
    integer-portable expression instead — e.g.
    ``F.unix_micros(c).cast("string")`` for timestamps,
    ``F.floor(c * 100 + 0.5).cast("bigint").cast("string")`` for
    money-like doubles — because engines disagree on float/timestamp
    TEXT rendering, not on the values."""
    return col.cast("string")


def profile_table(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Profile ``cols`` (name -> canonicalized string Column) in one
    scan: (col_name, n_rows, n_null, distinct_est, zero_registers).

    ``distinct_est`` is the portable-HLL estimate (~6.5% sigma at
    m=256) with the small-range linear-counting correction m*ln(m/V)
    applied when the raw estimate <= 2.5m and V > 0 — so
    low-cardinality columns (enums, flags: the most common real-table
    case) come out near-exact instead of biased.  ``zero_registers``
    still exposes the regime (V > 0 = linear-counting range).
    """
    pairs: list[Column] = []
    for name, col in cols.items():
        pairs += [F.lit(name), col]
    stacked = df.select(
        F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val")
    )
    h = stacked.select("col_name", F.md5("val").alias("h"))
    parts = h.select(
        "col_name",
        F.when(F.col("h").isNull(), F.lit(-1))
        .otherwise(F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
        .alias("j"),
        F.substring("h", 3, 15).alias("tail"),
    )
    rho = F.expr(HLL_RHO_SQL.format(G=", 0"))
    lvl1 = (
        parts.select("col_name", "j", rho.alias("rho"))
        .groupBy("col_name", "j")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("rho").alias("R"))
    )
    prof = lvl1.groupBy("col_name").agg(
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("j") == -1, F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_null"),
        F.sum(
            F.when(
                F.col("j") >= 0,
                F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), 62 - R) AS DECIMAL(38,0))"
                ),
            )
        ).alias("S_present"),
        F.sum((F.col("j") >= 0).cast("long")).alias("n_present"),
    )
    raw = prof.select(
        "col_name",
        "n_rows",
        "n_null",
        F.expr(
            f"CAST(CAST('{HLL_NUM}' AS DECIMAL(38,0))"
            f" div (CAST({HLL_DEN} AS DECIMAL(38,0))"
            f" * (coalesce(S_present, CAST(0 AS DECIMAL(38,0)))"
            f" + CAST(({HLL_M} - n_present) AS DECIMAL(38,0))"
            f" * CAST(shiftleft(CAST(1 AS BIGINT), 62) AS DECIMAL(38,0))))"
            f" AS BIGINT)"
        ).alias("raw_est"),
        F.expr(f"CAST({HLL_M} - n_present AS BIGINT)").alias("zero_registers"),
    )
    return raw.select(
        "col_name",
        "n_rows",
        "n_null",
        F.expr(hll_est_sql("raw_est", "zero_registers", "div")).alias(
            "distinct_est"
        ),
        "zero_registers",
    )
