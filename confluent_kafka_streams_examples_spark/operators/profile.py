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

from confluent_kafka_streams_examples_spark.session import fan_out_small_scan
from confluent_kafka_streams_examples_spark.operators.sketches import (
    CMS_ROWS,
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
    stacked = fan_out_small_scan(
        df, df.select(F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val"))
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


def profile_table_extended(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """The full day-one "describe extended", still in ONE scan: per
    column, row/null counts, corrected portable-HLL distinct estimate,
    numeric min/max, integer-exact average length (centi-chars), and a
    portable-CMS heavy-hitter estimate ``top_freq_est`` — the CMS
    upper bound on the modal value's count (min over hash rows of that
    row's max cell), the number a platform reads to decide salt
    factors and max_df caps before running anything else.

    Range stats are NUMERIC (``try_cast(val AS BIGINT)`` — exact for
    every integer-canonicalized column: ids, epoch micros, quantized
    cents; null for free-text columns), not lexicographic string
    min/max.  That is a hard scale constraint, not a shortcut: Spark
    executes min/max over STRING buffers as SortAggregate (hash
    aggregation requires fixed-width mutable buffers), which sorts the
    full exploded input per task — measured 18 GiB of spill at the
    x100 probe for this one pair of aggregates, vs zero with numeric
    buffers (and '10' < '9' lexicographically, so string ranges of
    numeric columns were misleading anyway).

    Shape: every stacked (col_name, val) row explodes into 1 HLL row
    (kind=-1, register index, rho tail, and the value stats — counted
    ONCE per source row) plus CMS_ROWS CMS rows (kind=r, bucket), and
    a three-level aggregation cascade collapses them: (col, kind, idx)
    -> (col, kind) -> (col).  Only the first aggregation sees data
    volume, and its partial-agg exchange carries at most
    tasks x n_cols x (257 + CMS_ROWS x 256 + CMS_ROWS) partials
    regardless of corpus size; levels two and three aggregate a few
    thousand rows.  The table is read exactly once (plan-asserted in
    tests).

    FUSED sketch layout — one md5 per value serves both sketches: the
    HLL register/rho read hex chars 1-17 as always, and CMS row r's
    bucket is the hex PAIR at chars 18+2r (18-25 overall) — bytes 9-12
    of the same digest, independent uniform bits md5 already paid for.
    (cms_portable_cells' row-keyed spec hashes md5('r:key') per row —
    right for a standalone additive sketch that must merge across
    engines/streams, but 4 extra md5 invocations per value; measured
    ~5x the profiler's per-value hash cost at sf0.1.)  The fused
    layout is bit-specified here and hash-checked end-to-end by the
    events_profile_extended oracle.
    """
    pairs: list[Column] = []
    for name, col in cols.items():
        pairs += [F.lit(name), col]
    stacked = fan_out_small_scan(
        df, df.select(F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val"))
    )
    h = stacked.select("col_name", "val", F.md5("val").alias("h"))
    kinds = [
        F.struct(
            F.lit(-1).alias("kind"),
            F.when(F.col("h").isNull(), F.lit(-1))
            .otherwise(F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
            .alias("idx"),
            F.substring("h", 3, 15).alias("tail"),
        )
    ]
    for r in range(CMS_ROWS):
        # fused layout: CMS row r's bucket = hex pair at chars 18+2r of
        # the SAME md5 the HLL already computed (see module docstring)
        kinds.append(
            F.struct(
                F.lit(r).alias("kind"),
                F.conv(F.substring("h", 18 + 2 * r, 2), 16, 10)
                .cast("int")
                .alias("idx"),
                F.lit(None).cast("string").alias("tail"),
            )
        )
    ex = (
        h.select("col_name", "val", F.explode(F.array(*kinds)).alias("k"))
        .select("col_name", "val", "k.kind", "k.idx", "k.tail")
        # null values carry no CMS rows (frequency of actual values);
        # they still ride the HLL row at idx=-1 for the null count
        .filter(~((F.col("kind") >= 0) & F.col("idx").isNull()))
    )
    is_hll = F.col("kind") == -1
    rho = F.when(
        is_hll & (F.col("idx") >= 0), F.expr(HLL_RHO_SQL.format(G=", 0"))
    )
    # numeric-only aggregation buffers (see docstring): try_cast keeps
    # the whole cascade inside HashAggregate / whole-stage codegen
    lvl1 = (
        ex.select(
            "col_name",
            "kind",
            "idx",
            rho.alias("rho"),
            F.when(is_hll, F.expr("try_cast(val AS BIGINT)")).alias("nval"),
            F.when(is_hll, F.length("val")).alias("vlen"),
        )
        .groupBy("col_name", "kind", "idx")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.max("rho").alias("R"),
            F.min("nval").alias("mn"),
            F.max("nval").alias("mx"),
            F.sum("vlen").alias("slen"),
        )
    )
    lvl2 = lvl1.groupBy("col_name", "kind").agg(
        F.sum("cnt").alias("n_rows_k"),
        F.sum(F.when(F.col("idx") == -1, F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_null_k"
        ),
        F.sum(
            F.when(
                F.col("idx") >= 0,
                F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), 62 - R) AS DECIMAL(38,0))"
                ),
            )
        ).alias("S_k"),
        F.sum((F.col("idx") >= 0).cast("long")).alias("n_present_k"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
        F.sum("slen").alias("slen_k"),
        F.max("cnt").alias("mx_cnt"),  # per-CMS-row max cell count
    )
    is_hll2 = F.col("kind") == -1
    prof = lvl2.groupBy("col_name").agg(
        F.sum(F.when(is_hll2, F.col("n_rows_k"))).cast("bigint").alias("n_rows"),
        F.sum(F.when(is_hll2, F.col("n_null_k"))).cast("bigint").alias("n_null"),
        F.sum(F.when(is_hll2, F.col("S_k"))).alias("S_present"),
        F.sum(F.when(is_hll2, F.col("n_present_k"))).alias("n_present"),
        F.min(F.when(is_hll2, F.col("mn"))).alias("min_num"),
        F.max(F.when(is_hll2, F.col("mx"))).alias("max_num"),
        F.sum(F.when(is_hll2, F.col("slen_k"))).cast("bigint").alias("sum_len"),
        F.min(F.when(~is_hll2, F.col("mx_cnt"))).cast("bigint").alias(
            "top_freq_est"
        ),
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
        "min_num",
        "max_num",
        # DECIMAL(38,0) guard: sum_len x 100 as BIGINT would overflow
        # past ~9.2e16 total chars (~92 PB of one column's text) —
        # inside the design envelope, so the multiply must be exact
        # arbitrary-precision (DuckDB's sum() already promotes to
        # HUGEINT, giving the oracle the same guard for free)
        F.expr(
            "CASE WHEN n_rows - n_null > 0 THEN"
            " CAST((CAST(sum_len AS DECIMAL(38,0)) * 100)"
            " div (n_rows - n_null) AS BIGINT) END"
        ).alias("avg_len_e2"),
        "top_freq_est",
    )
    return raw.select(
        "col_name",
        "n_rows",
        "n_null",
        F.expr(hll_est_sql("raw_est", "zero_registers", "div")).alias(
            "distinct_est"
        ),
        "zero_registers",
        "min_num",
        "max_num",
        "avg_len_e2",
        "top_freq_est",
    )
