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
    HLL_RHO_FROM_T_SQL,
    HLL_TAIL_TRIM_EXPR,
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


def _hashed_parts(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """(col_name, j, tail): the stacked + md5-split register rows both
    the batch profiler and its streaming twin aggregate.  Nulls park
    in register -1 with a NULL tail (they carry the null count)."""
    pairs: list[Column] = []
    for name, col in cols.items():
        pairs += [F.lit(name), col]
    stacked = fan_out_small_scan(
        df, df.select(F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val"))
    )
    h = stacked.select("col_name", F.md5("val").alias("h"))
    return h.select(
        "col_name",
        F.when(F.col("h").isNull(), F.lit(-1))
        .otherwise(F.conv(F.substring("h", 1, 2), 16, 10).cast("int"))
        .alias("j"),
        F.substring("h", 3, 15).alias("tail"),
    ).withColumn("t", F.expr(HLL_TAIL_TRIM_EXPR))


def profile_registers(df: DataFrame, cols: dict[str, Column]) -> DataFrame:
    """Level-1 profiler state: (col_name, j, cnt, R) — per-register
    row count and rho maximum.  ONE built-in aggregation, so it runs
    IDENTICALLY on a streaming DataFrame (count refines additively,
    max monotonically — update-mode state is fixed at
    n_cols x 257 rows regardless of stream length): this is the
    profiler's streaming twin (VERDICT r10 #7), same pattern as
    `hll_portable_registers`.  Feed the (latest) register rows to
    :func:`profile_from_registers` for the finished profile."""
    # rho over the pre-trimmed tail (one ltrim vs three regexp_extract
    # per value; register-identical — see sketches.HLL_RHO_FROM_T_SQL)
    rho = F.expr(HLL_RHO_FROM_T_SQL)
    return (
        _hashed_parts(df, cols)
        .select("col_name", "j", rho.alias("rho"))
        .groupBy("col_name", "j")
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("rho").alias("R"))
    )


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
    return profile_from_registers(profile_registers(df, cols))


def profile_from_registers(lvl1: DataFrame) -> DataFrame:
    """Fold a (col_name, j, cnt, R) register table — the batch lvl1 or
    a streaming twin's final state — into the profile rows
    (col_name, n_rows, n_null, distinct_est, zero_registers).  A few
    hundred input rows: cost-free, and the batch/streaming paths share
    every estimate expression by construction."""
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


def profile_table_extended(
    df: DataFrame,
    cols: dict[str, Column],
    quantile_ranges: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
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

    QUANTILES (p50/p95/p99, VERDICT r10 #3) ride the same scan as one
    more row kind (-2): each numeric value lands in an integer-exact
    histogram bucket, so any engine reproduces it bit-for-bit.  Two
    bucket layouts, chosen per column:

    - default, no prior knowledge: sign-aware 1/16-octave LOG buckets

          a      = abs(greatest(v, -(2^63 - 1)))      -- magnitude
          bl     = length of a's binary digits        -- a=0 -> 1
          sub    = (a >> max(bl - 5, 0)) & 15         -- top 4 bits
          bucket = sign(v) * (bl * 16 + sub)

      monotone in v, at most ~2080 buckets span all of int64,
      relative error <= 1/16 octave (~4.4%).  The failure regime is
      VISIBLE in the output: a column whose whole range fits inside
      one bucket (epoch timestamps: a month is ~0.2% of the epoch
      offset) reports p50 == p95 == p99 == min_num — read that as
      "narrow relative range, pass a range hint".

    - ``quantile_ranges[name] = (lo, hi)``: LINEAR 101 buckets over
      the caller's prior (the natural profiler input for timestamps
      and bounded metrics — "this drop should be 2024" is knowledge a
      platform has before scanning):

          w      = (hi - lo) div 101 + 1
          bucket = (clamp(v, lo, hi) - lo) div w      -- 0..100

      absolute error <= (hi - lo)/101; out-of-range values clamp into
      the edge buckets (their exact min still reported).

    Every bucket's COUNT and exact MIN fall out of the same level-1
    aggregation that already computes per-register counts.  Level 2
    collapses each column's buckets into one sorted array (a few
    hundred structs — the one object-buffer aggregate in the cascade,
    over kilobytes), and the final projection walks it with an
    ``aggregate`` fold: pXX_num = the exact min of the first bucket
    where the cumulative count reaches ceil(q x n_num) — a REAL data
    value <= the true quantile, bracketed by the bucket.  Columns
    whose canonical form is not numeric (free text, JSON) report
    NULL, same contract as min_num/max_num.
    """
    pairs: list[Column] = []
    for name, col in cols.items():
        pairs += [F.lit(name), col]
    stacked = fan_out_small_scan(
        df, df.select(F.stack(F.lit(len(cols)), *pairs).alias("col_name", "val"))
    )
    h = stacked.select(
        "col_name",
        "val",
        F.md5("val").alias("h"),
        F.expr("try_cast(val AS BIGINT)").alias("nval"),
    ).withColumns(
        {
            # quantile-histogram bucket pieces (see docstring): clamp
            # guards the -2^63 negation edge; conv-to-binary LENGTH is
            # the integer-exact bit length both engines agree on
            "qmag": F.expr(
                "abs(greatest(nval, CAST(-9223372036854775807 AS BIGINT)))"
            ),
        }
    ).withColumn("qbl", F.length(F.conv(F.col("qmag"), 10, 2)))
    log_bucket = (
        F.when(F.col("nval") >= 0, F.lit(1)).otherwise(F.lit(-1))
        * (
            F.col("qbl") * 16
            + F.expr(
                "shiftright(qmag,"
                " CASE WHEN qbl > 5 THEN qbl - 5 ELSE 0 END) & 15"
            )
        )
    ).cast("int")
    bucket_expr = log_bucket
    for qname, (lo, hi) in (quantile_ranges or {}).items():
        # linear 101-bucket layout over the caller's [lo, hi] prior;
        # width computed driver-side so no in-plan division by range
        w = (int(hi) - int(lo)) // 101 + 1
        bucket_expr = F.when(
            F.col("col_name") == F.lit(qname),
            F.expr(
                f"CAST((greatest(least(nval, CAST({int(hi)} AS BIGINT)),"
                f" CAST({int(lo)} AS BIGINT)) - CAST({int(lo)} AS BIGINT))"
                f" div CAST({w} AS BIGINT) AS INT)"
            ),
        ).otherwise(bucket_expr)
    qbucket = F.when(F.col("nval").isNotNull(), bucket_expr)
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
    # quantile-histogram rows: one per NUMERIC value, idx = log bucket
    kinds.append(
        F.struct(
            F.lit(-2).alias("kind"),
            qbucket.alias("idx"),
            F.lit(None).cast("string").alias("tail"),
        )
    )
    ex = (
        h.select(
            "col_name", "val", "nval", F.explode(F.array(*kinds)).alias("k")
        )
        .select("col_name", "val", "nval", "k.kind", "k.idx", "k.tail")
        # null values carry no CMS rows (frequency of actual values) and
        # non-numeric values no histogram rows; nulls still ride the
        # HLL row at idx=-1 for the null count
        .filter(~((F.col("kind") != -1) & F.col("idx").isNull()))
        # pre-trim once per exploded row (NULL tail on non-HLL rows is
        # a no-op) so rho is one ltrim, not three regexp_extract
        .withColumn("t", F.expr(HLL_TAIL_TRIM_EXPR))
    )
    is_hll = F.col("kind") == -1
    rho = F.when(
        is_hll & (F.col("idx") >= 0), F.expr(HLL_RHO_FROM_T_SQL)
    )
    # numeric-only aggregation buffers (see docstring): try_cast keeps
    # the whole cascade inside HashAggregate / whole-stage codegen
    lvl1 = (
        ex.select(
            "col_name",
            "kind",
            "idx",
            rho.alias("rho"),
            # numeric value feeds min/max on the HLL row AND the
            # per-bucket exact min on the histogram rows
            F.when(is_hll | (F.col("kind") == -2), F.col("nval")).alias(
                "nval"
            ),
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
        # the quantile histogram, collapsed to one ordered array per
        # column (kind=-2 rows only; <= ~2080 structs of 3 ints — the
        # single object-buffer aggregate in the cascade, over KB-scale
        # level-1 output, so HashAggregate->ObjectHashAggregate here
        # costs nothing and the data-volume level-1 stays codegen'd)
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("kind") == -2,
                    F.struct(
                        F.col("idx").alias("b"),
                        F.col("cnt").alias("c"),
                        F.col("mn").alias("m"),
                    ),
                )
            )
        ).alias("hist"),
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
        F.min(F.when(F.col("kind") >= 0, F.col("mx_cnt"))).cast("bigint").alias(
            "top_freq_est"
        ),
        # exactly one kind=-2 row exists per column, so flattening the
        # collected singletons is deterministic; collect_list (not
        # max) keeps this ObjectHashAggregate — an array max has no
        # mutable hash buffer and would regress the whole level to
        # SortAggregate
        F.flatten(
            F.collect_list(F.when(F.col("kind") == -2, F.col("hist")))
        ).alias("hist"),
        F.sum(F.when(F.col("kind") == -2, F.col("n_rows_k")))
        .cast("bigint")
        .alias("n_num"),
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
        "hist",
        "n_num",
    )

    def q(p: int) -> Column:
        # walk the ordered bucket array once: pXX = exact min of the
        # first bucket whose cumulative count reaches ceil(p% x n_num)
        return F.expr(
            f"CASE WHEN n_num > 0 THEN aggregate(hist,"
            f" named_struct('cum', CAST(0 AS BIGINT),"
            f"              'ans', CAST(NULL AS BIGINT)),"
            f" (acc, x) -> named_struct("
            f"   'cum', acc.cum + x.c,"
            f"   'ans', coalesce(acc.ans, CASE WHEN acc.cum + x.c >="
            f"     (n_num * {p} + 99) div 100 THEN x.m END)),"
            f" acc -> acc.ans) END"
        ).alias(f"p{p}_num")

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
        q(50),
        q(95),
        q(99),
    )
